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
