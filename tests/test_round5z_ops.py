"""Round-5z operators: distributed minimum spanning forest
(operators/graph.boruvka_mst — Boruvka contraction with (w, a, b)
tie-breaking) against a brute-force Kruskal union-find and the
independent cut-property DuckDB twin."""

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    boruvka_mst,
    boruvka_mst_sql,
)

SCHEMA = "src long, dst long, weight long"


def _mst(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["a"], r["b"], r["w"])
            for r in boruvka_mst(df, **kw).collect()}


def _brute_kruskal(rows):
    """Union-find Kruskal under the same (w, a, b) total order."""
    best = {}
    for s, d, w in rows:
        if s is None or d is None or w is None or s == d:
            continue
        a, b = min(s, d), max(s, d)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_mst_path_and_cycle(spark):
    # triangle: the heaviest edge (2,3,w=9) must be dropped
    rows = [(1, 2, 4), (2, 3, 9), (1, 3, 5)]
    assert _mst(spark, rows) == {(1, 2, 4), (1, 3, 5)}


def test_mst_forest_and_parallel_edges(spark):
    # two components; parallel (1,2) edges collapse to min weight;
    # self loop and null endpoint dropped
    rows = [(1, 2, 7), (2, 1, 3), (1, 1, 1), (None, 2, 1),
            (10, 11, 2), (11, 12, 2), (10, 12, 2)]
    got = _mst(spark, rows)
    assert (1, 2, 3) in got
    # equal-weight triangle: (w,a,b) order keeps (10,11) and (10,12)
    assert got == {(1, 2, 3), (10, 11, 2), (10, 12, 2)}


def test_mst_multi_round_path_matches_kruskal(spark):
    # 24-node path with sawtooth weights -> several contraction rounds
    rows = [(i, i + 1, (i * 7) % 11 + 1) for i in range(24)]
    assert _mst(spark, rows) == _brute_kruskal(rows)


def test_mst_random_graph_matches_kruskal_and_twin(spark):
    import random
    rng = random.Random(11)
    rows = [(rng.randrange(0, 30), rng.randrange(0, 30),
             rng.randrange(1, 40)) for _ in range(120)]
    got = _mst(spark, rows)
    assert got == _brute_kruskal(rows)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (src BIGINT, dst BIGINT, weight BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    duck = set(map(tuple, con.execute(
        boruvka_mst_sql("SELECT src, dst, weight FROM t")).fetchall()))
    assert got == duck


def test_mst_edge_count_invariant(spark):
    # spanning forest: |MSF| = V - #components (13 nodes, 4 comps)
    rows = [(i % 13, (i * 5 + 1) % 13, i % 17 + 1) for i in range(60)]
    got = _mst(spark, rows)
    assert len(got) == 13 - 4
    assert got == _brute_kruskal(rows)


def test_mst_empty_and_validation(spark):
    assert _mst(spark, [(1, 1, 5), (None, 2, 1)]) == set()
    df = spark.createDataFrame([(1, 2, 3)], SCHEMA)
    with pytest.raises(ValueError):
        boruvka_mst(df, max_rounds=0)
