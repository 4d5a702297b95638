"""Round-5i operators: interval peak concurrency (sweep-line)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.temporal import interval_peak


def _peaks(spark, rows):
    df = spark.createDataFrame(rows, "k long, s long, e long")
    return sorted(tuple(r) for r in
                  interval_peak(df, "k", "s", "e").collect())


def test_interval_peak_hand_cases(spark):
    got = _peaks(spark, [
        # chained overlaps: all three cover t=10 (inclusive ends)
        (1, 0, 10), (1, 5, 15), (1, 10, 20),
        # duplicate point intervals both count
        (2, 0, 0), (2, 0, 0),
        # exactly adjacent ([0,4] then [5,9]) never overlap
        (4, 0, 4), (4, 5, 9),
        # first-attainment tie-break: peak 2 hit at t=3 and again at
        # t=30 after a dip — must report the EARLIEST
        (5, 0, 5), (5, 3, 8), (5, 30, 40), (5, 30, 40),
    ])
    assert got == [(1, 3, 10), (2, 2, 0), (4, 1, 0), (5, 2, 3)]


def test_interval_peak_randomized_vs_quadratic(spark):
    rng = random.Random(11)
    rows = []
    for _ in range(500):
        k = rng.randrange(6)
        s = rng.randrange(-50, 100)  # negative ticks must work too
        rows.append((k, s, s + rng.randrange(0, 25)))
    got = _peaks(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE iv (k BIGINT, s BIGINT, e BIGINT)")
    con.executemany("INSERT INTO iv VALUES (?,?,?)", rows)
    oracle = sorted(tuple(r) for r in con.execute("""
        WITH cand AS (SELECT DISTINCT k, s AS t FROM iv),
        conc AS (SELECT c.k, c.t, COUNT(*) AS n
                 FROM cand c
                 JOIN iv ON iv.k=c.k AND iv.s<=c.t AND c.t<=iv.e
                 GROUP BY 1,2),
        mx AS (SELECT k, t, n, MAX(n) OVER (PARTITION BY k) AS peak
               FROM conc)
        SELECT k, peak, MIN(t) FROM mx WHERE n = peak
        GROUP BY k, peak""").fetchall())
    assert got == oracle


def test_interval_peak_validation(spark):
    df = spark.createDataFrame([(1, 5, 2)], "k long, s long, e long")
    with pytest.raises(Exception, match="interval end < start"):
        interval_peak(df, "k", "s", "e", validate=True).collect()
    # default trusts the producer: no raise
    interval_peak(df, "k", "s", "e").collect()
    bad = spark.createDataFrame([(1, 2, 3)], "k long, _t long, e long")
    with pytest.raises(ValueError, match="reserved"):
        interval_peak(bad, "k", "_t", "e")


# ---------------------------------------------------------------- skyline
from biocypher_metta_spark.operators.skyline import skyline  # noqa: E402


def test_skyline_hand_case(spark):
    rows = [
        ("g", 1, 1, 10),   # frontier
        ("g", 2, 2, 12),   # frontier (worse a, better b)
        ("g", 3, 2, 12),   # duplicate criteria of id 2 -> BOTH kept
        ("g", 4, 3, 11),   # dominated by id 2
        ("g", 5, 1, 10),   # duplicate of id 1 -> kept
        ("g", 6, 1, 9),    # dominated by id 1 (tie on a, worse b)
        ("h", 7, 9, 1),    # alone in its group
    ]
    df = spark.createDataFrame(rows, "grp string, id long, a long, b long")
    got = sorted(r.id for r in skyline(df, ["grp"], ["a"], ["b"]).collect())
    assert got == [1, 2, 3, 5, 7]


def test_skyline_randomized_vs_quadratic(spark):
    import random

    import duckdb

    rng = random.Random(13)
    rows = [(str(rng.randrange(4)), i, rng.randrange(20),
             rng.randrange(20), rng.randrange(20)) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "grp string, id long, a long, b long, c long").repartition(7)
    # small chunk exercises the chunked frontier sweep across blocks
    got = sorted(r.id for r in
                 skyline(df, ["grp"], ["a", "b"], ["c"], chunk=64).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, id BIGINT, a BIGINT, "
                "b BIGINT, c BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    want = sorted(r[0] for r in con.execute("""
        SELECT id FROM t y WHERE NOT EXISTS (
          SELECT 1 FROM t x WHERE x.grp = y.grp
            AND x.a <= y.a AND x.b <= y.b AND x.c >= y.c
            AND (x.a < y.a OR x.b < y.b OR x.c > y.c))""").fetchall())
    assert got == want

    # global (ungrouped) variant finishes on one coalesced task
    got_g = sorted(r.id for r in skyline(df, [], ["a", "b"], ["c"]).collect())
    want_g = sorted(r[0] for r in con.execute("""
        SELECT id FROM t y WHERE NOT EXISTS (
          SELECT 1 FROM t x
          WHERE x.a <= y.a AND x.b <= y.b AND x.c >= y.c
            AND (x.a < y.a OR x.b < y.b OR x.c > y.c))""").fetchall())
    assert got_g == want_g


def test_skyline_validation(spark):
    import pytest as pt

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pt.raises(ValueError, match="at least one criterion"):
        skyline(df, [], [], [])
    with pt.raises(ValueError, match="not in frame"):
        skyline(df, [], ["a"], ["zzz"])


# ------------------------------------------------------- asof directions
from biocypher_metta_spark.operators.temporal import asof_join  # noqa: E402


def _asof(spark, direction):
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 14), (1, 15), (1, 16), (1, 25), (2, 7)],
        "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, "s10"), (1, 20, "s20")], "k long, ts long, state string")
    out = asof_join(left, right, "k", direction=direction)
    return {(r.k, r.ts): r.state_asof for r in out.collect()}


def test_asof_forward_and_nearest(spark):
    assert _asof(spark, "forward") == {
        (1, 5): "s10", (1, 10): "s10",  # at-snapshot ts is inclusive
        (1, 14): "s20", (1, 15): "s20", (1, 16): "s20",
        (1, 25): None,                  # nothing later: left-join null
        (2, 7): None}
    assert _asof(spark, "nearest") == {
        (1, 5): "s10", (1, 10): "s10", (1, 14): "s10",
        (1, 15): "s10",                 # EXACT tie (5 both ways) -> backward
        (1, 16): "s20", (1, 25): "s20", (2, 7): None}


def test_asof_direction_validation(spark):
    left = spark.createDataFrame([(1, 5)], "k long, ts long")
    right = spark.createDataFrame([(1, 1, 2)], "k long, ts long, v long")
    import pytest as pt
    with pt.raises(ValueError, match="direction"):
        asof_join(left, right, "k", direction="sideways")
    with pt.raises(ValueError, match="bucket"):
        asof_join(left, right, "k", direction="nearest",
                  bucket=lambda c: c)
    bad = right.withColumnRenamed("v", "_snap")
    with pt.raises(ValueError, match="_snap"):
        asof_join(left, bad, "k", direction="nearest")
