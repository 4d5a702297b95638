"""Round-5x operators: local clustering coefficient
(operators/graph.py) and skip-gram co-occurrence counts
(operators/text.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    clustering_coefficient,
    clustering_coefficient_sql,
)
from biocypher_metta_spark.operators.text import (
    skipgram_counts,
    skipgram_counts_sql,
)

# ------------------------------------------------------------ clustering

EDGE_SCHEMA = "src long, dst long"


def _cc(spark, edges):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {r["id"]: (r["deg"], r["triangles"], r["cc_permille"])
            for r in clustering_coefficient(df).collect()}


def test_cc_hand_truth(spark):
    # K3 on {0,1,2} plus pendant 3-0: node 0 has deg 3, 1 triangle
    # -> cc = 2/(3*2) = 333; nodes 1,2 deg 2, 1 tri -> 1000;
    # node 3 deg 1 -> 0
    out = _cc(spark, [(0, 1), (1, 2), (2, 0), (3, 0)])
    assert out[0] == (3, 1, 333)
    assert out[1] == (2, 1, 1000)
    assert out[2] == (2, 1, 1000)
    assert out[3] == (1, 0, 0)


def test_cc_star_is_zero(spark):
    out = _cc(spark, [(0, i) for i in range(1, 6)])
    assert out[0] == (5, 0, 0)
    assert all(out[i] == (1, 0, 0) for i in range(1, 6))


def test_cc_multigraph_and_selfloop_collapse(spark):
    # duplicate and reversed edges and self-loops must not change cc
    base = [(0, 1), (1, 2), (2, 0)]
    noisy = base + [(1, 0), (2, 2), (0, 1), (2, 1)]
    assert _cc(spark, base) == _cc(spark, noisy)


def test_cc_duckdb_twin_agrees(spark):
    rng = random.Random(59)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(70)})
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    spark_rows = {tuple(r) for r in
                  clustering_coefficient(df).collect()}
    duck_rows = set(map(tuple, con.execute(clustering_coefficient_sql(
        "SELECT src, dst FROM e")).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# -------------------------------------------------------------- skipgrams

DOC_SCHEMA = "doc_id long, text string"


def _sg(spark, docs, window, min_count=1):
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    return {(r["center"], r["context"]): r["n"]
            for r in skipgram_counts(df, window, min_count).collect()}


def test_skipgram_hand_truth(spark):
    out = _sg(spark, [(1, "a b c")], window=2)
    # pairs within distance 2 of "a b c", both directions
    assert out == {("a", "b"): 1, ("b", "a"): 1,
                   ("b", "c"): 1, ("c", "b"): 1,
                   ("a", "c"): 1, ("c", "a"): 1}


def test_skipgram_window_1_is_bigrams(spark):
    # "a b a b" adjacencies: (a,b), (b,a), (a,b) -> forward a->b: 2,
    # b->a: 1; symmetric emission sums both: n(a,b) = n(b,a) = 3
    out = _sg(spark, [(1, "a b a b")], window=1)
    assert out == {("a", "b"): 3, ("b", "a"): 3}


def test_skipgram_symmetry_and_min_count(spark):
    docs = [(1, "x y z x y"), (2, "y x q q")]
    out = _sg(spark, docs, window=2)
    assert all(out[(a, b)] == out[(b, a)] for a, b in out)
    pruned = _sg(spark, docs, window=2, min_count=3)
    assert all(n >= 3 for n in pruned.values())
    assert set(pruned) == {(a, b) for (a, b), n in out.items() if n >= 3}


def test_skipgram_short_and_empty_docs(spark):
    assert _sg(spark, [(1, "solo"), (2, "  "), (3, "")], window=2) == {}


def test_skipgram_validation(spark):
    df = spark.createDataFrame([(1, "a b")], DOC_SCHEMA)
    with pytest.raises(ValueError):
        skipgram_counts(df, window=0)
    with pytest.raises(ValueError):
        skipgram_counts(df, window=2, min_count=0)


def test_skipgram_duckdb_twin_agrees(spark):
    rng = random.Random(61)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 25))))
            for i in range(30)]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    spark_rows = {tuple(r) for r in
                  skipgram_counts(df, window=3, min_count=2).collect()}
    duck_rows = set(map(tuple, con.execute(skipgram_counts_sql(
        "SELECT doc_id, text FROM d", window=3,
        min_count=2)).fetchall()))
    assert spark_rows == duck_rows and spark_rows
