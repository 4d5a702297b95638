"""Round-5d operators: bounded multi-source BFS distances.

Twin-match is randomized (Spark frontier-settled loop vs DuckDB
recursive-CTE enumeration — two different evaluation strategies for
the same definition), plus the semantic invariants that the twin
cannot witness: early exit, depth boundedness on cycles, and source
precedence.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    bfs_distances,
    bfs_distances_sql,
)


def _values_sql(pairs, cols):
    rows = ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in p) + ")"
        for p in pairs)
    names = ", ".join(cols)
    inner = ", ".join(f"c{i} AS {c}" for i, c in enumerate(cols))
    tcols = ", ".join(f"c{i}" for i in range(len(cols)))
    return f"SELECT {inner} FROM (VALUES {rows}) t({tcols})"


def _run_twin(edges, sources, max_depth):
    con = duckdb.connect()
    sql = bfs_distances_sql(
        _values_sql(edges, ["src", "dst"]),
        _values_sql([(s,) for s in sources], ["node"]), max_depth)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_bfs_matches_duckdb_twin_randomized(spark):
    rng = random.Random(41)
    for trial in range(3):
        n = 200 + trial * 150
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(4 * n)]
        edges += [(7, 7), (None, 1), (1, None)]  # self-loop + null guard
        sources = rng.sample(range(n), 4)
        e = spark.createDataFrame(edges, "src: int, dst: int")
        s = spark.createDataFrame([(x,) for x in sources], "node: int")
        got = sorted(tuple(r)
                     for r in bfs_distances(e, s, max_depth=6).collect())
        assert got == _run_twin(edges, sources, 6)


def test_bfs_hand_graph_and_source_precedence(spark):
    # 0 -> 1 -> 2 -> 3, plus 3 -> 1 back-edge; source 2 is ALSO
    # reachable from 0 at dist 2 but must stay dist 0.
    edges = [(0, 1), (1, 2), (2, 3), (3, 1)]
    e = spark.createDataFrame(edges, "src: int, dst: int")
    s = spark.createDataFrame([(0,), (2,)], "node: int")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e, s, max_depth=10).collect()}
    assert got == {0: 0, 2: 0, 1: 1, 3: 1}


def test_bfs_depth_bound_is_total_on_cycles(spark):
    # pure 3-cycle: without the bound the frontier loop would exit by
    # settling; with max_depth=1 only one hop is taken.
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src: int, dst: int")
    s = spark.createDataFrame([(0,)], "node: int")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e, s, max_depth=1).collect()}
    assert got == {0: 0, 1: 1}
    full = {r["node"]: r["dist"]
            for r in bfs_distances(e, s, max_depth=50).collect()}
    assert full == {0: 0, 1: 1, 2: 2}


def test_bfs_isolated_source_and_depth_zero(spark):
    e = spark.createDataFrame([(10, 11)], "src: int, dst: int")
    s = spark.createDataFrame([(99,)], "node: int")
    assert [tuple(r) for r in bfs_distances(e, s, 5).collect()] == [(99, 0)]
    s2 = spark.createDataFrame([(10,)], "node: int")
    assert [tuple(r)
            for r in bfs_distances(e, s2, 0).collect()] == [(10, 0)]


def test_bfs_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src: int, dst: int")
    s = spark.createDataFrame([(0,)], "node: int")
    with pytest.raises(ValueError, match="max_depth"):
        bfs_distances(e, s, max_depth=-1)


# ---------------------------------------------------------------------------
# ewma (operators/temporal.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.temporal import (  # noqa: E402
    ewma,
    ewma_sql,
)


def _ewma_twin(rows, lookback):
    con = duckdb.connect()
    vals = ", ".join(
        f"({a}, {b}, {'NULL' if c is None else c})" for a, b, c in rows)
    src = f"SELECT c0 AS k, c1 AS t, c2 AS v FROM (VALUES {vals}) x(c0,c1,c2)"
    return sorted(tuple(r) for r in con.execute(
        ewma_sql(src, "k", "t", "v", lookback=lookback)).fetchall())


def test_ewma_matches_duckdb_twin_randomized(spark):
    rng = random.Random(11)
    rows = []
    for k in range(6):
        for t in range(rng.randrange(1, 70)):
            v = rng.randrange(-50_000_000, 50_000_000)
            rows.append((k, t, None if rng.random() < 0.05 else v))
    df = spark.createDataFrame(rows, "k: int, t: int, v: long")
    for lookback in (32, 4, 1):
        got = sorted(tuple(r) for r in
                     ewma(df, "k", "t", "v", lookback=lookback).collect())
        assert got == _ewma_twin(rows, lookback)


def test_ewma_hand_values(spark):
    # constant series -> ewma equals the constant at every point;
    # a step 0 -> 1200 decays halfway each later step
    rows = [(1, t, 1000) for t in range(5)]
    df = spark.createDataFrame(rows, "k: int, t: int, v: long")
    out = {r["t"]: r["ewma"] for r in ewma(df, "k", "t", "v").collect()}
    assert out == {t: 1000 for t in range(5)}
    step = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 1200), (1, 2, 1200)], "k: int, t: int, v: long")
    got = {r["t"]: r["ewma"] for r in ewma(step, "k", "t", "v").collect()}
    # t=1: (1200*2 + 0*1)/3 = 800; t=2: (1200*4 + 1200*2 + 0)/7 = 1028
    assert got == {0: 0, 1: 800, 2: 1028}


def test_ewma_negative_floor_and_nulls(spark):
    # floor on a negative average must round DOWN on both engines
    rows = [(1, 0, -5), (1, 1, None), (1, 2, -6)]
    df = spark.createDataFrame(rows, "k: int, t: int, v: long")
    got = sorted(tuple(r) for r in ewma(df, "k", "t", "v").collect())
    assert got == _ewma_twin(rows, 32)
    # null row is excluded from output AND from the weighting frame
    assert [g[1] for g in got] == [0, 2]
    # t=2 frame is (-5, -6): (-6*2 + -5)/3 = -17/3 -> floor -6
    assert dict((g[1], g[3]) for g in got)[2] == -6


def test_ewma_validation():
    with pytest.raises(ValueError, match="lookback"):
        ewma_sql("SELECT 1", "k", "t", "v", lookback=0)


# ---------------------------------------------------------------------------
# survivorship_merge (canonicalize.py)
# ---------------------------------------------------------------------------

from biocypher_metta_spark.canonicalize import (  # noqa: E402
    survivorship_merge,
    survivorship_merge_sql,
)

_SV_SCHEMA = "cluster: int, src_rank: int, rid: int, name: string, score: long"


def test_survivorship_per_field_independence(spark):
    # best-rank record has name but NULL score; score must come from
    # the SECOND-best record, not travel with the winner row
    rows = [(1, 0, 10, "best", None),
            (1, 1, 11, "worse", 500),
            (1, 2, 12, None, 900)]
    df = spark.createDataFrame(rows, _SV_SCHEMA)
    out = survivorship_merge(df, "cluster", ["src_rank", "rid"],
                             ["name", "score"]).collect()
    assert [tuple(r) for r in out] == [(1, 3, "best", 500)]


def test_survivorship_all_null_field_and_tiebreak(spark):
    rows = [(1, 0, 10, None, None), (1, 0, 9, None, None),
            (2, 5, 20, "only", 7)]
    df = spark.createDataFrame(rows, _SV_SCHEMA)
    got = sorted(tuple(r) for r in survivorship_merge(
        df, "cluster", ["src_rank", "rid"], ["name", "score"]).collect())
    assert got == [(1, 2, None, None), (2, 1, "only", 7)]


def test_survivorship_matches_duckdb_twin_randomized(spark):
    rng = random.Random(23)
    rows, rid = [], 0
    for c in range(60):
        for _ in range(rng.randrange(1, 6)):
            rid += 1
            rows.append((c, rng.randrange(3), rid,
                         None if rng.random() < 0.4
                         else f"n{rng.randrange(5)}",
                         None if rng.random() < 0.4
                         else rng.randrange(1000)))
    df = spark.createDataFrame(rows, _SV_SCHEMA)
    got = sorted(tuple(r) for r in survivorship_merge(
        df, "cluster", ["src_rank", "rid"], ["name", "score"]).collect())
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None
                        else (f"'{v}'" if isinstance(v, str) else str(v))
                        for v in r) + ")" for r in rows)
    src = (f"SELECT c0 AS cluster, c1 AS src_rank, c2 AS rid, "
           f"c3 AS name, c4 AS score FROM (VALUES {vals}) t(c0,c1,c2,c3,c4)")
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(survivorship_merge_sql(
        src, "cluster", ["src_rank", "rid"], ["name", "score"])).fetchall())
    assert got == want


def test_survivorship_validation(spark):
    df = spark.createDataFrame([(1, 0, 1, "a", 1)], _SV_SCHEMA)
    with pytest.raises(ValueError, match="non-empty"):
        survivorship_merge(df, "cluster", ["src_rank"], [])
    with pytest.raises(ValueError, match="overlap"):
        survivorship_merge(df, "cluster", ["src_rank"], ["src_rank"])
