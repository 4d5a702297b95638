"""Round-5k operators: lag-k autocorrelation (operators/stats.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.stats import autocorr, autocorr_sql


def _ac(spark, rows, lags=(1, 2, 3)):
    df = spark.createDataFrame(rows, "g long, t long, v long")
    out = autocorr(df, ["g"], "t", "v", lags=lags)
    return sorted(tuple(r) for r in out.collect())


def test_autocorr_alternating_series(spark):
    # x_t alternates 0/1 on a dense tick grid: lag-1 pairs are exact
    # anti-correlation (-1000), lag-2 pairs exact correlation (+1000).
    # Clamped at the -1000 bound; +1 correlation may quantize to 999
    # when the float sqrt pair undershoots (sqrt(d)*sqrt(d) < d).
    rows = [(7, t, t % 2) for t in range(40)]
    got = dict(((g, lag), (m, ac)) for g, lag, m, ac in _ac(spark, rows))
    assert got[(7, 1)] == (39, -1000)
    assert got[(7, 2)][0] == 38 and got[(7, 2)][1] in (999, 1000)


def test_autocorr_calendar_gaps_drop_pairs(spark):
    # Ticks 0,1,3,4: lag-1 pairs (0,1) and (3,4) only — the 1->3 jump
    # is NOT bridged; lag-2 has the single pair (1,3); lag-3 has (0,3)
    # and (1,4). Single-pair and constant groups yield NULL ac (zero
    # variance on a 1-point cloud).
    rows = [(1, 0, 10), (1, 1, 30), (1, 3, 20), (1, 4, 50)]
    got = {(g, lag): (m, ac) for g, lag, m, ac in _ac(spark, rows)}
    assert got[(1, 1)][0] == 2
    assert got[(1, 2)] == (1, None)
    assert got[(1, 3)][0] == 2


def test_autocorr_constant_series_null(spark):
    rows = [(2, t, 5) for t in range(10)]
    got = _ac(spark, rows, lags=(1,))
    assert got == [(2, 1, 9, None)]


def test_autocorr_matches_duckdb_twin_randomized(spark):
    rng = random.Random(5051)
    rows = []
    for g in range(6):
        t = 0
        for _ in range(120):
            t += rng.choice([1, 1, 1, 2, 3])  # gappy calendar
            rows.append((g, t, rng.randrange(-500, 5000)))
    got = _ac(spark, rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE base_t (g BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO base_t VALUES (?,?,?)", rows)
    sql = autocorr_sql("SELECT * FROM base_t", ["g"], "t", "v")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_autocorr_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], "g long, t long, v long")
    with pytest.raises(ValueError):
        autocorr(df, ["g"], "t", "v", lags=())
    with pytest.raises(ValueError):
        autocorr(df, ["g"], "t", "v", lags=(0,))
