"""Round-5o operator: sampled-source betweenness centrality
(operators/graph.py — Brandes forward sigma + quantized backward
dependency accumulation)."""

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    betweenness,
    betweenness_sql,
)

SCALE = 1_000_000


def _run(spark, edges, srcs, depth):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in srcs], "node long")
    return {r["node"]: r["bc_scaled"]
            for r in betweenness(e, s, depth).collect()}


def _twin(edges, srcs, depth):
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE srcs (node BIGINT)")
    con.executemany("INSERT INTO srcs VALUES (?)", [(x,) for x in srcs])
    sql = betweenness_sql("SELECT src, dst FROM e",
                          "SELECT node FROM srcs", depth)
    return {n: b for n, b in con.execute(sql).fetchall()}


def test_betweenness_path(spark):
    # 1->2->3->4 from 1: delta(3)=scale, delta(2)=2*scale; the source
    # itself is excluded and the sink (no successors) is absent (bc 0)
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], [1], 3)
    assert got == {2: 2 * SCALE, 3: SCALE}


def test_betweenness_diamond_split(spark):
    # 1->{2,3}->4: sigma(4)=2, each middle carries half — the
    # fractional dependency that forces the quantization contract
    got = _run(spark, [(1, 2), (1, 3), (2, 4), (3, 4)], [1], 3)
    assert got == {2: SCALE // 2, 3: SCALE // 2}


def test_betweenness_multi_source_sums(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], [1, 2], 3)
    # from 1: {2: 2s, 3: s}; from 2: {3: s}; source rows excluded
    assert got == {2: 2 * SCALE, 3: 2 * SCALE}


def test_betweenness_cycle_terminates(spark):
    got = _run(spark, [(1, 2), (2, 1), (2, 3)], [1], 3)
    assert got == {2: SCALE}


def test_betweenness_depth_bound_is_semantics(spark):
    # depth 1 sees no interior nodes at all -> empty result
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], [1], 1)
    assert got == {}
    with pytest.raises(ValueError, match="max_depth"):
        betweenness(
            spark.createDataFrame([(1, 2)], "src long, dst long"),
            spark.createDataFrame([(1,)], "node long"), 0)


def test_betweenness_randomized_twin(spark):
    # pseudorandom out-degree-2 cyclic graph, 60 nodes, 3 sources:
    # engine vs the independent walk-enumeration twin, full dict
    n = 60
    edges = []
    for i in range(n):
        edges.append((i, (i * 7 + 3) % n))
        edges.append((i, (i * 3 + 1) % n))
    srcs = [0, 1, 2]
    got = _run(spark, edges, srcs, 4)
    want = _twin(edges, srcs, 4)
    assert got == want
    assert len(got) > 5  # non-trivial interior
