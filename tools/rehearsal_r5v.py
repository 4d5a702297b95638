"""Scale rehearsal for the round-5v operators: Benjamini-Hochberg FDR
and seasonal decomposition (stats.*), and video scene-cut profiles
(multimodal.video_scene_cuts).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  bh_fdr      — one key exchange + one in-partition sort feeding two
                windows: ~n log n in rows;
  seasonal    — one RANGE window + a (keys, phase)-sized groupBy and
                join back: ~linear in points;
  scene_cuts  — map-only mapInPandas AVI decode + pairwise diff:
                ~linear in videos (pure-Python DIB CPU regime).

Writes tools/rehearsal_r5v.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def run_bh(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import bh_fdr

    i = F.col("id")
    rows = spark.range(n).select(
        (i % 64).alias("grp"), i.alias("hid"),
        (F.when(i % 50 == 0, (i * 7919) % 1000)
         .otherwise((i * 2654435761) % 1_000_000)).alias("p"))
    t0 = time.time()
    ck = bh_fdr(rows, ["grp"], "hid", "p", 50_000).agg(
        F.sum(F.col("reject").cast("long")),
        F.sum("rank")).collect()[0]
    return {"rows": n, "rejected": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_seasonal(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import seasonal_decompose

    i = F.col("id")
    # 64 series of n/64 hourly points each: trend + daily wave + noise
    rows = spark.range(n).select(
        (i % 64).alias("grp"),
        F.floor(i / 64).cast("long").alias("t"),
        (F.floor(i / 640) + ((F.floor(i / 64) % 24) * 10)
         + ((i * 40503) % 7)).cast("long").alias("v"))
    t0 = time.time()
    ck = seasonal_decompose(rows, ["grp"], "t", "v", period=24).agg(
        F.count(F.lit(1)), F.sum("remainder")).collect()[0]
    return {"rows": n, "out": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_scene_cuts(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.avi import avi_encode
    from biocypher_metta_spark.operators.multimodal import (
        video_scene_cuts,
    )

    w, h = 8, 6
    frames = [bytes(((x + f * 31) % 256)
                    for x in range(w * h * 3)) for f in range(6)]
    blob = bytearray(avi_encode(frames, w, h))
    media = spark.range(n_docs).select(
        F.concat(F.lit("avi://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("video").alias("kind"),
        F.lit(blob).alias("content"))
    t0 = time.time()
    ck = video_scene_cuts(media, stride=1, max_frames=8).agg(
        F.count(F.lit(1)), F.sum("diff_abs")).collect()[0]
    return {"docs": n_docs, "pairs": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5v")
    spark.sparkContext.setLogLevel("ERROR")
    run_bh(spark, 100_000)                 # warmup, excluded
    run_seasonal(spark, 100_000)
    run_scene_cuts(spark, 5_000)
    runs = {
        "bh_fdr": {"n": run_bh(spark, 5_000_000),
                   "10n": run_bh(spark, 50_000_000)},
        "seasonal": {"n": run_seasonal(spark, 2_000_000),
                     "10n": run_seasonal(spark, 20_000_000)},
        "scene_cuts": {"n": run_scene_cuts(spark, 50_000),
                       "10n": run_scene_cuts(spark, 500_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5v.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
