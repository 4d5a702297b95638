"""Round-5t operators: Kaplan-Meier survival (operators/stats.py),
per-node effective radius (operators/graph.py), and frame-level audio
features (operators/multimodal.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import (
    effective_radius,
    effective_radius_sql,
)
from biocypher_metta_spark.operators.multimodal import (
    audio_frame_features,
)
from biocypher_metta_spark.operators.stats import (
    kaplan_meier,
    kaplan_meier_sql,
)
from biocypher_metta_spark.operators.wav import wav_encode

# ------------------------------------------------------------ kaplan-meier

KM_SCHEMA = "grp long, dur long, ev long"


def _km(spark, rows):
    df = spark.createDataFrame(rows, KM_SCHEMA)
    return {(r["grp"], r["t"]): (r["n_risk"], r["d_events"],
                                 r["surv_ppm"])
            for r in kaplan_meier(df, ["grp"], "dur", "ev").collect()}


def _brute_km(subjects):
    """(dur, ev) subjects -> {t: (n_risk, d, surv_ppm)} via the ppm
    floor recurrence."""
    subjects = [(t, e) for t, e in subjects
                if t is not None and e is not None]
    out, s = {}, 1_000_000
    for t in sorted({t for t, e in subjects if e == 1}):
        n = sum(1 for u, _ in subjects if u >= t)
        d = sum(1 for u, e in subjects if u == t and e == 1)
        s = (s * (n - d)) // n
        out[t] = (n, d, s)
    return out


def test_km_hand_truth(spark):
    # grp 1: 4 subjects, events at t=1 (1 of 4) and t=3 (1 of 2),
    # censored at t=2 -> S(1) = 750000, S(3) = floor(750000/2) = 375000
    rows = [(1, 1, 1), (1, 2, 0), (1, 3, 1), (1, 3, 0)]
    out = _km(spark, rows)
    assert out[(1, 1)] == (4, 1, 750_000)
    assert out[(1, 3)] == (2, 1, 375_000)
    assert (1, 2) not in out  # censor-only times create no step


def test_km_all_censored_empty(spark):
    assert _km(spark, [(1, 5, 0), (1, 9, 0)]) == {}


def test_km_everyone_dies(spark):
    # 3 events at the same time: S = floor(1e6 * 0 / 3) = 0
    out = _km(spark, [(1, 7, 1)] * 3)
    assert out[(1, 7)] == (3, 3, 0)


def test_km_null_drop_and_validation(spark):
    out = _km(spark, [(1, 1, 1), (1, None, 1), (1, 2, None)])
    assert out == {(1, 1): (1, 1, 0)}
    df = spark.createDataFrame([(1, 1, 1)], KM_SCHEMA)
    with pytest.raises(ValueError):
        kaplan_meier(df, [], "dur", "ev")
    with pytest.raises(ValueError):
        kaplan_meier(df.withColumnRenamed("ev", "surv_ppm"),
                     ["grp"], "dur", "surv_ppm")


def test_km_matches_brute(spark):
    rng = random.Random(13)
    subjects = [(rng.randrange(20), rng.randrange(2))
                for _ in range(200)]
    rows = [(1, t, e) for t, e in subjects]
    expect = {(1, t): v for t, v in _brute_km(subjects).items()}
    assert _km(spark, rows) == expect


def test_km_duckdb_twin_agrees(spark):
    rng = random.Random(17)
    rows = [(rng.randrange(3), rng.randrange(15),
             rng.choice([None, 0, 1, 1]))
            for _ in range(300)]
    df = spark.createDataFrame(rows, KM_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, dur BIGINT, ev BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    spark_rows = {tuple(r) for r in
                  kaplan_meier(df, ["grp"], "dur", "ev").collect()}
    duck_rows = set(map(tuple, con.execute(kaplan_meier_sql(
        "SELECT grp, dur, ev FROM t", ["grp"], "dur",
        "ev")).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# -------------------------------------------------------- effective radius

EDGE_SCHEMA = "src long, dst long"


def _er(spark, edges, max_hops, q):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {r["node"]: (r["eff_radius"], r["reach_est"])
            for r in effective_radius(df, max_hops, k=64,
                                      q_permille=q).collect()}


def test_effective_radius_chain(spark):
    # 0 -> 1 -> 2 -> 3: node 0 reaches {0,1,2,3} by hop 3; at q=900
    # it needs >= 3.6 -> all 4 -> radius 3. Node 2 reaches {2,3} at
    # hop 1 already -> radius 1. Node 3 only itself -> radius 1.
    out = _er(spark, [(0, 1), (1, 2), (2, 3)], 3, 900)
    assert out[0] == (3, 4)
    assert out[1] == (2, 3)
    assert out[2] == (1, 2)
    assert out[3] == (1, 1)


def test_effective_radius_q_threshold(spark):
    # at q=500 node 0 needs >= 2 of its 4 -> hop 1 ({0,1}) suffices
    out = _er(spark, [(0, 1), (1, 2), (2, 3)], 3, 500)
    assert out[0] == (1, 4)


def test_effective_radius_validation(spark):
    df = spark.createDataFrame([(0, 1)], EDGE_SCHEMA)
    with pytest.raises(ValueError):
        effective_radius(df, 3, q_permille=0)
    with pytest.raises(ValueError):
        effective_radius(df, 3, q_permille=1001)


def test_effective_radius_duckdb_twin_agrees(spark):
    rng = random.Random(5)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(60)})
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    spark_rows = {tuple(r) for r in
                  effective_radius(df, 3, k=64, q_permille=900)
                  .collect()}
    duck_rows = set(map(tuple, con.execute(effective_radius_sql(
        "SELECT src, dst FROM e", 3, q_permille=900)).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# ------------------------------------------------------ audio frame feats

def _media(spark, wavs):
    return spark.createDataFrame(
        [(f"wav://{i}", "audio", bytearray(b))
         for i, b in enumerate(wavs)],
        "media_ref string, kind string, content binary")


def test_audio_frames_hand_truth(spark):
    # 10 samples framed at 4: frames of 4, 4, 2
    samples = [3, -2, 0, 5, -1, -1, 2, -4, 6, 0]
    media = _media(spark, [wav_encode(samples, bits=8)])
    rows = {r["frame_idx"]: r for r in
            audio_frame_features(media, frame_len=4).collect()}
    assert len(rows) == 3
    # frame 0 = [3,-2,0,5]: crossings at (3,-2) only — (-2,0),(0,5)
    # touch zero and are NOT strict crossings
    assert (rows[0]["n"], rows[0]["energy"], rows[0]["peak_abs"],
            rows[0]["zero_crossings"]) == (4, 38, 5, 1)
    # frame 1 = [-1,-1,2,-4]: crossings (-1,2),(2,-4)
    assert (rows[1]["n"], rows[1]["energy"], rows[1]["peak_abs"],
            rows[1]["zero_crossings"]) == (4, 22, 4, 2)
    # frame 2 = [6,0]: partial tail, zero touch is no crossing
    assert (rows[2]["n"], rows[2]["energy"], rows[2]["peak_abs"],
            rows[2]["zero_crossings"]) == (2, 36, 6, 0)


def test_audio_frames_no_cross_frame_pairing(spark):
    # sign flip exactly at the frame boundary must NOT count:
    # frames [1,1] and [-1,-1] have zero crossings each
    media = _media(spark, [wav_encode([1, 1, -1, -1], bits=8)])
    rows = audio_frame_features(media, frame_len=2).collect()
    assert sorted((r["frame_idx"], r["zero_crossings"]) for r in rows) \
        == [(0, 0), (1, 0)]


def test_audio_frames_corrupt_null_row(spark):
    media = _media(spark, [b"\x00not a wav"])
    rows = audio_frame_features(media, frame_len=4).collect()
    assert len(rows) == 1 and rows[0]["frame_idx"] is None


def test_audio_frames_validation(spark):
    media = _media(spark, [wav_encode([1, 2], bits=8)])
    with pytest.raises(ValueError):
        audio_frame_features(media, frame_len=1)


def test_audio_frames_sum_matches_audio_stats(spark):
    # frame energies sum to audio_stats' whole-stream sum_sq
    from biocypher_metta_spark.operators.multimodal import audio_stats

    rng = random.Random(9)
    samples = [rng.randrange(-128, 128) for _ in range(101)]
    media = _media(spark, [wav_encode(samples, bits=8)])
    frames = audio_frame_features(media, frame_len=16).collect()
    whole = audio_stats(media).collect()[0]
    assert sum(r["energy"] for r in frames) == whole["sum_sq"]
    assert max(r["peak_abs"] for r in frames) == whole["peak_abs"]
    assert sum(r["n"] for r in frames) == whole["n_samples"]


def test_effective_radius_range_input(spark):
    # spark.range-built self-union edges used to break the per-round
    # localCheckpoint inside neighborhood_function ("key not found:
    # node#N" from LogicalRDD.fromDataset) until the sketch union put
    # the checkpointed frame first — pin the fix with the exact
    # triggering input shape
    from pyspark.sql import functions as F

    i = F.col("id")
    n = 200
    edges = (spark.range(n)
             .select(i.alias("src"), ((i * 7 + 3) % n).alias("dst"))
             .unionAll(spark.range(n).select(
                 i.alias("src"), ((i * 3 + 1) % n).alias("dst"))))
    out = effective_radius(edges, max_hops=2, k=8, q_permille=900)
    assert out.count() == n
