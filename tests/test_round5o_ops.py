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


from biocypher_metta_spark.operators.stats import cusum, cusum_sql  # noqa: E402


def _cusum_rows(spark, rows, target, slack, h):
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = cusum(df, ["g"], "t", "v", target, slack, h)
    return sorted((r["g"], r["t"], r["value"], r["cusum_pos"],
                   r["cusum_neg"], r["alarm"]) for r in out.collect())


def test_cusum_upward_shift(spark):
    rows = [("a", i + 1, v)
            for i, v in enumerate([10, 10, 10, 20, 20])]
    got = _cusum_rows(spark, rows, target=10, slack=2, h=5)
    # k=12: P = -2,-4,-6,2,10; S+ = 0,0,0,8,16; k'=8: P'=2,4,6,18,30
    # rises monotonically so S- = 0 throughout
    assert got == [("a", 1, 10, 0, 0, 0), ("a", 2, 10, 0, 0, 0),
                   ("a", 3, 10, 0, 0, 0), ("a", 4, 20, 8, 0, 1),
                   ("a", 5, 20, 16, 0, 1)]


def test_cusum_downward_mirror(spark):
    rows = [("a", i + 1, v)
            for i, v in enumerate([10, 10, 10, 0, 0])]
    got = _cusum_rows(spark, rows, target=10, slack=2, h=5)
    assert [r[4] for r in got] == [0, 0, 0, 8, 16]  # cusum_neg
    assert [r[3] for r in got] == [0, 0, 0, 0, 0]   # cusum_pos
    assert [r[5] for r in got] == [0, 0, 0, 1, 1]


def test_cusum_restarts_from_zero(spark):
    # a dip below target drains S+ to 0 and it restarts — the max(0,.)
    # semantics the running-min closed form must reproduce
    rows = [("a", i + 1, v)
            for i, v in enumerate([20, 0, 0, 20, 20])]
    got = _cusum_rows(spark, rows, target=10, slack=0, h=100)
    # P = 10, 0, -10, 0, 10; runmin(0,.) = 0,0,-10,-10,-10
    assert [r[3] for r in got] == [10, 0, 0, 10, 20]


def test_cusum_nulls_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, None), ("a", 3, 10)],
        "g string, t long, v long")
    assert cusum(df, ["g"], "t", "v", 10, 0, 5).count() == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="slack"):
        cusum(df, ["g"], "t", "v", 10, -1, 5)
    with _pt.raises(ValueError, match="h must"):
        cusum(df, ["g"], "t", "v", 10, 0, 0)


def test_cusum_randomized_twin(spark):
    rows = [(f"g{i % 3}", i // 3, ((i * 37 + 11) % 50) + (10 if i > 60 else 0))
            for i in range(90)]
    got = _cusum_rows(spark, rows, target=25, slack=3, h=40)
    con = duckdb.connect()
    con.execute("CREATE TABLE src (g VARCHAR, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", rows)
    sql = cusum_sql("SELECT g, t, v FROM src", ["g"], "t", "v",
                    target=25, slack=3, h=40)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    assert any(r[5] == 1 for r in got)  # the planted shift alarms


from biocypher_metta_spark.operators.graph import (  # noqa: E402
    harmonic_closeness,
    harmonic_closeness_sql,
)


def _hc(spark, edges, srcs, depth):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in srcs], "node long")
    return {r["node"]: (r["h_scaled"], r["n_seen"])
            for r in harmonic_closeness(e, s, depth).collect()}


def test_harmonic_closeness_path(spark):
    # 1->2->3->4 from 1: d=1,2,3 -> 1e6, 5e5, 333333; source itself
    # (d=0) excluded
    got = _hc(spark, [(1, 2), (2, 3), (3, 4)], [1], 3)
    assert got == {2: (1_000_000, 1), 3: (500_000, 1),
                   4: (333_333, 1)}


def test_harmonic_closeness_multi_source_and_unreachable(spark):
    # two sources; node 4 unreachable within depth 1 contributes 0
    # rows (harmonic semantics: absent, not poisoned)
    got = _hc(spark, [(1, 2), (2, 3), (3, 4)], [1, 3], 1)
    assert got == {2: (1_000_000, 1), 4: (1_000_000, 1)}


def test_harmonic_closeness_randomized_twin(spark):
    n = 60
    edges = []
    for i in range(n):
        edges.append((i, (i * 7 + 3) % n))
        edges.append((i, (i * 3 + 1) % n))
    srcs = [0, 1, 2]
    got = _hc(spark, edges, srcs, 4)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.execute("CREATE TABLE srcs (node BIGINT)")
    con.executemany("INSERT INTO srcs VALUES (?)", [(x,) for x in srcs])
    sql = harmonic_closeness_sql("SELECT src, dst FROM e",
                                 "SELECT node FROM srcs", 4)
    want = {n_: (h, c) for n_, h, c in con.execute(sql).fetchall()}
    assert got == want
    with pytest.raises(ValueError, match="max_depth"):
        harmonic_closeness(
            spark.createDataFrame([(1, 2)], "src long, dst long"),
            spark.createDataFrame([(1,)], "node long"), 0)
