"""Scale rehearsal for the round-5t operators: Kaplan-Meier survival
(stats.kaplan_meier), effective radius (graph.effective_radius), and
frame-level audio features (multimodal.audio_frame_features).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  kaplan_meier  — one (keys, t) groupBy + a steps-sized window + the
                  per-group ordered fold: ~linear in rows at a fixed
                  (bounded) time grid;
  eff_radius    — inherits ANF's per-hop join/merge rounds + one
                  node-keyed self-join: ~linear in edges at fixed
                  hops/degree;
  audio_frames  — map-only mapInPandas decode + frame explode:
                  ~linear in docs (pure-Python codec CPU regime).

Writes tools/rehearsal_r5t.json.
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


def run_km(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import kaplan_meier

    i = F.col("id")
    # 64 groups, durations on a 365-day grid, ~1/3 events
    rows = spark.range(n).select(
        (i % 64).alias("grp"),
        ((i * 2654435761) % 365).alias("dur"),
        (((i * 40503) % 3) == 0).cast("long").alias("ev"))
    t0 = time.time()
    ck = kaplan_meier(rows, ["grp"], "dur", "ev").agg(
        F.count(F.lit(1)), F.sum("surv_ppm")).collect()[0]
    return {"rows": n, "steps": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_eff_radius(spark, n_nodes: int) -> dict:
    from biocypher_metta_spark.operators.graph import effective_radius

    i = F.col("id")
    edges = spark.range(n_nodes).select(
        i.alias("src"), ((i * 7 + 3) % n_nodes).alias("dst")).unionAll(
        spark.range(n_nodes).select(
            i.alias("src"), ((i * 3 + 1) % n_nodes).alias("dst")))
    t0 = time.time()
    ck = effective_radius(edges, max_hops=3, k=16, q_permille=900).agg(
        F.count(F.lit(1)), F.sum("eff_radius")).collect()[0]
    return {"nodes": n_nodes, "rows": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_audio_frames(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.multimodal import (
        audio_frame_features,
    )
    from biocypher_metta_spark.operators.wav import wav_encode

    samples = [((j * 523 + 7) % 65536) - 32768 for j in range(320)]
    blob = bytearray(wav_encode(samples, bits=16))
    media = spark.range(n_docs).select(
        F.concat(F.lit("wav://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("audio").alias("kind"),
        F.lit(blob).alias("content"))
    t0 = time.time()
    ck = audio_frame_features(media, frame_len=160).agg(
        F.count(F.lit(1)), F.sum("energy")).collect()[0]
    return {"docs": n_docs, "frames": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5t")
    spark.sparkContext.setLogLevel("ERROR")
    run_km(spark, 100_000)                 # warmup, excluded
    run_eff_radius(spark, 10_000)
    run_audio_frames(spark, 10_000)
    runs = {
        "kaplan_meier": {"n": run_km(spark, 5_000_000),
                         "10n": run_km(spark, 50_000_000)},
        "eff_radius": {"n": run_eff_radius(spark, 100_000),
                       "10n": run_eff_radius(spark, 1_000_000)},
        "audio_frames": {"n": run_audio_frames(spark, 100_000),
                         "10n": run_audio_frames(spark, 1_000_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5t.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
