"""Round-5w operators: asymmetric containment join
(operators/dedup.py) and binary sign-pack + Hamming top-k retrieval
(operators/similarity.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.dedup import (
    containment_join,
    containment_join_sql,
)
from biocypher_metta_spark.operators.similarity import (
    hamming_topk,
    sign_pack,
)

# -------------------------------------------------------------- containment

DOC_SCHEMA = "doc_id long, text string"


def _cj(spark, docs, tau):
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    return {(r["id_a"], r["id_b"]): (r["n_a"], r["n_common"],
                                     r["containment_permille"])
            for r in containment_join(df, tau).collect()}


def test_containment_hand_truth(spark):
    docs = [
        (1, "aa bb cc"),                 # A: 3 tokens
        (2, "aa bb cc dd ee ff gg hh"),  # superset of A
        (3, "xx yy zz"),                 # disjoint
        (4, "aa bb qq"),                 # 2/3 of A
    ]
    out = _cj(spark, docs, tau=900)
    # A fully inside B: C(1->2) = 1.0; B only 3/8 inside A
    assert out[(1, 2)] == (3, 3, 1000)
    assert (2, 1) not in out
    assert (1, 3) not in out and (3, 1) not in out
    # 2/3 = 666 permille < 900
    assert (1, 4) not in out
    out2 = _cj(spark, docs, tau=600)
    assert out2[(1, 4)] == (3, 2, 666)
    assert out2[(4, 1)] == (3, 2, 666)


def test_containment_asymmetry(spark):
    # the defining case: tiny doc inside a huge one — Jaccard is
    # 3/103 but containment(A->B) = 1.0
    big = " ".join(f"w{i}" for i in range(100)) + " aa bb cc"
    docs = [(1, "aa bb cc"), (2, big)]
    out = _cj(spark, docs, tau=1000)
    assert out == {(1, 2): (3, 3, 1000)}


def test_containment_duplicate_tokens_are_sets(spark):
    # repetition inside a doc must not inflate counts
    docs = [(1, "aa aa aa bb"), (2, "aa bb cc")]
    out = _cj(spark, docs, tau=900)
    assert out[(1, 2)] == (2, 2, 1000)


def test_containment_validation(spark):
    df = spark.createDataFrame([(1, "x")], DOC_SCHEMA)
    with pytest.raises(ValueError):
        containment_join(df, 0)
    with pytest.raises(ValueError):
        containment_join_sql("SELECT 1", 1001)


def test_containment_duckdb_twin_agrees(spark):
    # randomized corpus; the twin is brute-force all-pairs, so
    # agreement also certifies the pigeonhole prefix pruning
    rng = random.Random(47)
    vocab = [f"t{i}" for i in range(30)]
    docs = [(i, " ".join(rng.sample(vocab, rng.randrange(3, 12))))
            for i in range(40)]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    spark_rows = {tuple(r) for r in
                  containment_join(df, 700).collect()}
    duck_rows = set(map(tuple, con.execute(containment_join_sql(
        "SELECT doc_id, text FROM d", 700)).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# ------------------------------------------------------- sign-pack/hamming

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _pack_py(vec):
    words = []
    for w in range((len(vec) + 31) // 32):
        word = 0
        for i in range(min(32, len(vec) - w * 32)):
            if vec[w * 32 + i] > 0:
                word |= 1 << i
        words.append(word)
    return words


def test_sign_pack_hand_truth(spark):
    vec = [1.0, -1.0, 0.0, 2.5] + [0.0] * 28 + [3.0] + [0.0] * 31
    df = spark.createDataFrame([(1, vec)], EMB_SCHEMA)
    row = sign_pack(df, dim=64).collect()[0]
    # bits 0 and 3 in word 0 (zero is NOT a set bit), bit 0 in word 1
    assert list(row["words"]) == [0b1001, 1]
    assert list(row["words"]) == _pack_py(vec)


def test_sign_pack_non_multiple_dim(spark):
    vec = [1.0] * 40  # 40 dims -> words of 32 and 8 bits
    df = spark.createDataFrame([(1, vec)], EMB_SCHEMA)
    row = sign_pack(df, dim=40).collect()[0]
    assert list(row["words"]) == [(1 << 32) - 1, (1 << 8) - 1]


def test_sign_pack_dim_mismatch_raises(spark):
    df = spark.createDataFrame([(1, [1.0] * 16)], EMB_SCHEMA)
    with pytest.raises(Exception, match="non-64-dim"):
        sign_pack(df, dim=64).collect()


def test_hamming_topk_hand_truth(spark):
    rng = random.Random(53)
    vecs = [(i, [rng.choice([-1.0, 1.0]) for _ in range(64)])
            for i in range(30)]
    q = vecs[0][1]
    df = spark.createDataFrame(vecs[1:], EMB_SCHEMA)
    got = [(r["vec_id"], r["hamming"]) for r in
           hamming_topk(sign_pack(df, 64), _pack_py(q), k=5).collect()]
    brute = sorted(
        (sum(1 for a, b in zip(v, q) if (a > 0) != (b > 0)), i)
        for i, v in vecs[1:])
    assert got == [(i, d) for d, i in brute[:5]]


def test_hamming_topk_validation(spark):
    df = spark.createDataFrame([(1, [1.0] * 64)], EMB_SCHEMA)
    packed = sign_pack(df, 64)
    with pytest.raises(ValueError):
        hamming_topk(packed, [0, 0], k=0)
    with pytest.raises(ValueError):
        hamming_topk(packed, [-1, 0], k=3)
    with pytest.raises(Exception, match="not 3 words"):
        hamming_topk(packed, [0, 0, 0], k=3).collect()
