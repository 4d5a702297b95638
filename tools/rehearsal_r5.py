"""10x scale rehearsal for the round-5 operators: session windows,
histogram quantile sketch, streaming dedup, AVI frame sampling.

Same contract as tools/scale_rehearsal.py: each op runs at N and 10N in
one JVM; a plan survives the scale-up iff time grows ~linearly (ratio
~10 for row-bound ops) with no driver collects or state blow-ups.
Sizes differ per op class: the batch aggs run 10M -> 100M events, the
streaming dedup 2M -> 20M (state ~ one entry per key), the
Python-kernel frame sampler 200k -> 2M media rows (the per-byte Python
cost is the documented pluggable-decoder seam, as for the image
codecs).

Prints ONE JSON line {"runs": {...}, "ratios": {...}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def synth_events(spark, n: int):
    """50 events/user, deterministic scattered timestamps (xor-folded so
    session boundaries are data-dependent, not a fixed cadence)."""
    uid = (F.col("id") % F.lit(max(n // 50, 1))).alias("user_id")
    secs = ((F.col("id") * 2654435761).bitwiseXOR(F.col("id") * 40503)
            % (86400 * 30))
    return spark.range(n).select(
        F.col("id").alias("event_id"), uid,
        (F.timestamp_seconds(F.lit(1700000000) + secs)).alias("ts"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        ((F.col("id") * 7919 % 20000) / 100.0).alias("value"))


def run_sessions(spark, n: int) -> dict:
    from biocypher_metta_spark.streaming.windowed import session_event_stats

    t0 = time.time()
    cnt = session_event_stats(synth_events(spark, n)).count()
    return {"rows_in": n, "sessions": cnt, "sec": round(time.time() - t0, 2)}


def run_histogram(spark, n: int) -> dict:
    from biocypher_metta_spark.operators import sketch as sk

    e = synth_events(spark, n).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("c"))
    t0 = time.time()
    cnt = sk.quantiles_from_histogram(
        sk.histogram_by(e, ["event_type"], "c", 1000),
        ["event_type"], [500, 900, 990], 1000).count()
    return {"rows_in": n, "rows_out": cnt, "sec": round(time.time() - t0, 2)}


def run_streaming_dedup(spark, n: int) -> dict:
    from biocypher_metta_spark.streaming.dedup import run_dedup_stream

    base = Path(f"/tmp/bcm_rehearse_dedup_{n}")
    shutil.rmtree(base, ignore_errors=True)
    ev = synth_events(spark, n)
    dup = ev.filter(F.col("event_id") % 10 == 0)
    ev.unionByName(dup).write.parquet(str(base / "in"))
    t0 = time.time()
    run_dedup_stream(
        spark.readStream.schema(ev.schema).parquet(str(base / "in")),
        ["event_id"], str(base / "out"), str(base / "ck"),
        delay="3650 days")
    out = spark.read.parquet(str(base / "out")).count()
    sec = round(time.time() - t0, 2)
    shutil.rmtree(base, ignore_errors=True)
    return {"rows_in": n + n // 10, "rows_out": out, "sec": sec}


def run_frame_sample(spark, n: int) -> dict:
    from biocypher_metta_spark.entry_queries import _AVI_VARIANTS
    from biocypher_metta_spark.operators import multimodal as mm

    variants = F.array(*[F.lit(bytearray(b)) for b in _AVI_VARIANTS])
    media = spark.range(n).select(
        F.concat(F.lit("avi://"), F.col("id").cast("string")).alias("media_ref"),
        F.lit("video").alias("kind"),
        F.element_at(variants, (F.col("id") % 5 + 1).cast("int")).alias("content"))
    t0 = time.time()
    cnt = mm.video_frame_stats(media, stride=2).count()
    return {"rows_in": n, "frames_out": cnt, "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {
        "session_windows": (run_sessions, 10_000_000),
        "histogram_quantiles": (run_histogram, 10_000_000),
        "streaming_dedup": (run_streaming_dedup, 2_000_000),
        "avi_frame_sample": (run_frame_sample, 200_000),
    }
    runs, ratios = {}, {}
    for name, (fn, n) in ops.items():
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    print(json.dumps({"runs": runs, "ratios": ratios}))


if __name__ == "__main__":
    main()
