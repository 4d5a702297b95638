"""Round-5v operators: Benjamini-Hochberg FDR and additive seasonal
decomposition (operators/stats.py), and video scene-cut profiles
(operators/multimodal.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.avi import avi_encode
from biocypher_metta_spark.operators.multimodal import video_scene_cuts
from biocypher_metta_spark.operators.stats import (
    bh_fdr,
    bh_fdr_sql,
    seasonal_decompose,
    seasonal_decompose_sql,
)

# ------------------------------------------------------------------ BH FDR

BH_SCHEMA = "grp long, hid long, p long"


def _bh(spark, rows, alpha):
    df = spark.createDataFrame(rows, BH_SCHEMA)
    return {(r["grp"], r["id"]): (r["rank"], r["reject"])
            for r in bh_fdr(df, ["grp"], "hid", "p", alpha).collect()}


def test_bh_hand_truth(spark):
    # m=4, alpha=0.05: sorted p_ppm = 10000, 20000, 40000, 900000.
    # thresholds alpha*i/m: 12500, 25000, 37500, 50000 ->
    # hits at i=1,2 (40000*4=160000 > 50000*3=150000) -> k=2
    rows = [(1, 1, 10_000), (1, 2, 20_000), (1, 3, 40_000),
            (1, 4, 900_000)]
    out = _bh(spark, rows, alpha=50_000)
    assert out[(1, 1)] == (1, True)
    assert out[(1, 2)] == (2, True)
    assert out[(1, 3)] == (3, False)
    assert out[(1, 4)] == (4, False)


def test_bh_step_up_rescues_earlier_miss(spark):
    # the step-up property: p_(1) fails its own threshold but a later
    # rank passes, which rejects everything before it too.
    # m=2, alpha=0.5: p = 300000 (th 250000, fail), 900000 (th
    # 1000000? no: alpha*2/2 = 500000, fail) -> pick p2 = 450000:
    # 450000 <= 500000 -> k=2 rejects BOTH including the failing p1.
    rows = [(1, 1, 300_000), (1, 2, 450_000)]
    out = _bh(spark, rows, alpha=500_000)
    assert out[(1, 1)] == (1, True)
    assert out[(1, 2)] == (2, True)


def test_bh_nothing_rejected_and_null_drop(spark):
    rows = [(1, 1, 800_000), (1, 2, 900_000), (1, 3, None)]
    out = _bh(spark, rows, alpha=50_000)
    assert out == {(1, 1): (1, False), (1, 2): (2, False)}


def test_bh_validation(spark):
    df = spark.createDataFrame([(1, 1, 5)], BH_SCHEMA)
    with pytest.raises(ValueError):
        bh_fdr(df, [], "hid", "p", 1000)
    with pytest.raises(ValueError):
        bh_fdr(df, ["grp"], "hid", "p", 0)


def test_bh_duckdb_twin_agrees(spark):
    rng = random.Random(37)
    rows = [(rng.randrange(3), i,
             rng.choice([None, rng.randrange(1_000_000),
                         rng.randrange(2000)]))
            for i in range(300)]
    df = spark.createDataFrame(rows, BH_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, hid BIGINT, p BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    spark_rows = {tuple(r) for r in
                  bh_fdr(df, ["grp"], "hid", "p", 50_000).collect()}
    duck_rows = set(map(tuple, con.execute(bh_fdr_sql(
        "SELECT grp, hid, p FROM t", ["grp"], "hid", "p",
        50_000)).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# ---------------------------------------------------------------- seasonal

SD_SCHEMA = "grp long, t long, v long"


def _sd(spark, rows, period):
    df = spark.createDataFrame(rows, SD_SCHEMA)
    return {(r["grp"], r["t"]): (r["trend"], r["seasonal"],
                                 r["remainder"])
            for r in seasonal_decompose(df, ["grp"], "t", "v",
                                        period).collect()}


def test_seasonal_pure_wave_zero_remainder(spark):
    # period 2, series 10,20,10,20,...: a window centered on an even t
    # holds two 20s (20+10+20 = 50 -> trend 16, detrended -6), on an
    # odd t two 10s (10+20+10 = 40 -> trend 13, detrended +7); each
    # phase's detrended values are constant, so the phase means absorb
    # them exactly -> remainder identically 0
    rows = [(1, t, 10 if t % 2 == 0 else 20) for t in range(8)]
    out = _sd(spark, rows, period=2)
    assert set(out) == {(1, t) for t in range(1, 7)}  # full windows only
    for (_, t), (tr, se, rem) in out.items():
        assert rem == 0
        assert (tr, se) == ((16, -6) if t % 2 == 0 else (13, 7))


def test_seasonal_trend_plus_wave(spark):
    # v = 10*t + (0 if even else 6), period 2: windows of 3 around t
    # average to 10*t + floor((6 or 12)/3)... verify via brute
    def brute(rows, period):
        h = period // 2
        win = 2 * h + 1
        pts = {t: v for _, t, v in rows}
        trend = {}
        for t in pts:
            w = [pts.get(t + d) for d in range(-h, h + 1)]
            if all(x is not None for x in w):
                s = sum(w)
                trend[t] = (s - (s % win + win) % win) // win
        detr = {t: pts[t] - tr for t, tr in trend.items()}
        seas = {}
        for ph in range(period):
            vals = [d for t, d in detr.items() if t % period == ph]
            if vals:
                s = sum(vals)
                seas[ph] = (s - (s % len(vals) + len(vals))
                            % len(vals)) // len(vals)
        return {t: (trend[t], seas[t % period],
                    detr[t] - seas[t % period]) for t in trend}

    rows = [(1, t, 10 * t + (6 if t % 2 else 0)) for t in range(12)]
    out = _sd(spark, rows, period=2)
    expect = {(1, t): v for t, v in brute(rows, 2).items()}
    assert out == expect


def test_seasonal_gap_yields_no_trend_row(spark):
    # t=3 missing -> windows centered at 2,3,4 incomplete
    rows = [(1, t, 5) for t in (0, 1, 2, 4, 5, 6)]
    out = _sd(spark, rows, period=2)
    assert set(out) == {(1, 1), (1, 5)}


def test_seasonal_validation(spark):
    df = spark.createDataFrame([(1, 1, 1)], SD_SCHEMA)
    with pytest.raises(ValueError):
        seasonal_decompose(df, [], "t", "v", 2)
    with pytest.raises(ValueError):
        seasonal_decompose(df, ["grp"], "t", "v", 1)


def test_seasonal_duckdb_twin_agrees(spark):
    rng = random.Random(43)
    rows = [(g, t, rng.randrange(-50, 100))
            for g in range(2) for t in range(60)]
    df = spark.createDataFrame(rows, SD_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    spark_rows = {tuple(r) for r in
                  seasonal_decompose(df, ["grp"], "t", "v", 7)
                  .collect()}
    duck_rows = set(map(tuple, con.execute(seasonal_decompose_sql(
        "SELECT grp, t, v FROM t", ["grp"], "t", "v", 7)).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# -------------------------------------------------------------- scene cuts

def _video(spark, frame_sets, w, h):
    return spark.createDataFrame(
        [(f"avi://{i}", "video",
          bytearray(avi_encode([bytes(f) for f in frames], w, h)))
         for i, frames in enumerate(frame_sets)],
        "media_ref string, kind string, content binary")


def test_scene_cuts_hand_truth(spark):
    # 2x1 RGB frames: f0 = f1 (static), f2 jumps by +10 per byte
    f0 = [100, 100, 100, 50, 50, 50]
    f2 = [110, 110, 110, 60, 60, 60]
    media = _video(spark, [[f0, f0, f2]], w=2, h=1)
    rows = {(r["f_prev"], r["f_next"]): r for r in
            video_scene_cuts(media, stride=1).collect()}
    assert rows[(0, 1)]["diff_abs"] == 0
    assert rows[(0, 1)]["diff_sq"] == 0
    assert rows[(1, 2)]["diff_abs"] == 60
    assert rows[(1, 2)]["diff_sq"] == 600
    assert rows[(1, 2)]["n_px_bytes"] == 6


def test_scene_cuts_stride_pairs_sampled_indices(spark):
    frames = [[v] * 6 for v in (0, 10, 20, 30, 40)]
    media = _video(spark, [frames], w=2, h=1)
    rows = {(r["f_prev"], r["f_next"]): r["diff_abs"] for r in
            video_scene_cuts(media, stride=2).collect()}
    # sampled 0, 2, 4 -> pairs (0,2), (2,4), each |20| * 6 bytes
    assert rows == {(0, 2): 120, (2, 4): 120}


def test_scene_cuts_short_and_corrupt(spark):
    one = _video(spark, [[[1] * 6]], w=2, h=1)
    assert video_scene_cuts(one, stride=1).count() == 0
    corrupt = spark.createDataFrame(
        [("x://0", "video", bytearray(b"RIFFnope"))],
        "media_ref string, kind string, content binary")
    rows = video_scene_cuts(corrupt).collect()
    assert len(rows) == 1 and rows[0]["f_prev"] is None
