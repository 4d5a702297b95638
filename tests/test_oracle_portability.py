"""Cross-engine portability of the signature kernels on a randomized
corpus — the driver gate compares Spark vs DuckDB only on the fixed
testdata fixtures; this sweeps a seeded adversarial corpus (empty
strings, whitespace runs, punctuation, unicode, long texts, hash-prefix
landmines) through the SAME kernel pair: Spark operator vs the exact
oracle SQL fragment used in entry_queries."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators import dedup as dd
from biocypher_metta_spark.operators import text as tx


def _corpus():
    rng = random.Random(20260816)
    alphabet = string.ascii_letters + string.digits + " .,;:!?()-'\"\\"
    docs = []
    for i in range(160):
        n = rng.choice([0, 1, 3, 8, 40, 200])
        docs.append((i, " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            for _ in range(n))))
    docs += [
        (1000, ""), (1001, "   "), (1002, "\tتجربة 試験 प्रयोग\t"),
        (1003, "a" * 5000), (1004, "the the the the the"),
        (1005, "x " * 300),
    ]
    return docs


@pytest.fixture(scope="module")
def engines(spark):
    docs = _corpus()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    return sdf, con


def test_simhash_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_SIMHASH_SQL

    sdf, con = engines
    got = {r.doc_id: r.simhash for r in dd.simhash(sdf).collect()}
    want = dict(con.execute(DOC_SIMHASH_SQL).fetchall())
    assert got == want


def test_minhash_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_MINHASH_SQL

    sdf, con = engines
    got = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3)
           for r in dd.minhash_signatures(sdf, num_perm=4).collect()}
    want = {r[0]: tuple(r[1:]) for r in con.execute(DOC_MINHASH_SQL).fetchall()}
    assert got == want


def test_fingerprint_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_FINGERPRINT_SQL

    sdf, con = engines
    out = tx.fingerprint(sdf)
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in con.execute(DOC_FINGERPRINT_SQL).fetchall()}
    assert got == want


def test_portable_hash_matches_duckdb(engines):
    sdf, con = engines
    got = {r.doc_id: r.h for r in sdf.select(
        "doc_id", tx.portable_hash(F.col("text")).alias("h")).collect()}
    want = dict(con.execute(
        "SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT "
        "FROM documents").fetchall())
    assert got == want


def test_quality_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_QUALITY_SQL

    sdf, con = engines
    got = {tuple(r) for r in tx.quality_score(sdf).collect()}
    want = {tuple(r) for r in con.execute(DOC_QUALITY_SQL).fetchall()}
    assert got == want


def test_token_stats_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_TOKEN_STATS_SQL

    sdf, con = engines
    got = {tuple(r) for r in tx.token_stats(sdf).collect()}
    want = {tuple(r) for r in con.execute(DOC_TOKEN_STATS_SQL).fetchall()}
    assert got == want


def test_lang_id_portability(engines):
    from biocypher_metta_spark.entry_queries import DOC_LANG_ID_SQL

    sdf, con = engines
    got = {tuple(r) for r in tx.lang_id(sdf).collect()}
    want = {tuple(r) for r in con.execute(DOC_LANG_ID_SQL).fetchall()}
    assert got == want
