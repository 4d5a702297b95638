"""Round-5ac operator: single-linkage clustering at a distance
threshold (operators/graph.single_linkage_clusters — MSF cut +
hash-min components) against a brute-force union-find over the
filtered ORIGINAL edges and the independent reachability twin."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    single_linkage_clusters,
    single_linkage_clusters_sql,
)

SCHEMA = "src long, dst long, weight long"


def _clusters(spark, rows, t, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["id"], r["cluster"])
            for r in single_linkage_clusters(df, t, **kw).collect()}


def _brute(rows, t):
    nodes = set()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, w in rows:
        if s is None or d is None or w is None or s == d:
            continue
        nodes |= {s, d}
        if w <= t:
            parent[find(s)] = find(d)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = set()
    for members in comp.values():
        m = min(members)
        for n in members:
            out.add((n, m))
    return out


def test_threshold_cut_and_singletons(spark):
    # chain 1-2-3-4 with weights 5, 20, 5: t=10 splits at the middle
    rows = [(1, 2, 5), (2, 3, 20), (3, 4, 5), (9, 9, 1)]
    got = _clusters(spark, rows, 10)
    assert got == {(1, 1), (2, 1), (3, 3), (4, 3)}
    # t=20 (inclusive) merges everything
    assert _clusters(spark, rows, 20) == {(1, 1), (2, 1), (3, 1), (4, 1)}
    # t below every weight: all singletons, every endpoint present
    assert _clusters(spark, rows, 1) == {(n, n) for n in (1, 2, 3, 4)}


def test_cut_property_cluster_equivalence(spark):
    # dense graph where many sub-threshold edges are NOT in the MSF:
    # clustering via the MSF must still equal direct reachability
    rng = random.Random(13)
    rows = [(rng.randrange(0, 20), rng.randrange(0, 20),
             rng.randrange(1, 50)) for _ in range(150)]
    for t in (5, 15, 30):
        assert _clusters(spark, rows, t) == _brute(rows, t)


def test_randomized_matches_twin(spark):
    rng = random.Random(29)
    rows = [(rng.randrange(0, 25), rng.randrange(0, 25),
             rng.randrange(1, 40)) for _ in range(100)]
    t = 12
    got = _clusters(spark, rows, t)
    assert got == _brute(rows, t)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (src BIGINT, dst BIGINT, weight BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    duck = set(map(tuple, con.execute(single_linkage_clusters_sql(
        "SELECT src, dst, weight FROM t", t)).fetchall()))
    assert got == duck


def test_null_and_selfloop_handling(spark):
    rows = [(1, 1, 1), (None, 2, 1), (3, None, 1), (4, 5, None),
            (6, 7, 3)]
    # 4,5 appear only on a null-weight edge -> dropped entirely
    assert _clusters(spark, rows, 10) == {(6, 6), (7, 6)}
