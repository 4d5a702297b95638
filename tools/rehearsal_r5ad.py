"""Scale rehearsal for the round-5ad operator: IMA ADPCM decode
(wav.py tag 17) through audio_stats at N -> 10N docs.

Map-only Python codec CPU regime (the ulaw shape) — expect ~linear.

Writes tools/rehearsal_r5ad.json.
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


def run_adpcm(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.multimodal import audio_stats
    from biocypher_metta_spark.operators.wav import wav_encode_adpcm

    samples = [((i * 1103 + 7) % 65536) - 32768 for i in range(800)]
    blob = bytearray(wav_encode_adpcm(samples, 8000, block_align=64))
    media = spark.range(n_docs).select(
        F.concat(F.lit("adpcm://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("audio").alias("kind"), F.lit(blob).alias("content"))
    t0 = time.time()
    ck = audio_stats(media).agg(
        F.count(F.lit(1)), F.sum("sum_sq")).collect()[0]
    return {"docs": n_docs, "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5ad")
    spark.sparkContext.setLogLevel("ERROR")
    run_adpcm(spark, 5_000)                # warmup, excluded
    runs = {
        "adpcm": {"n": run_adpcm(spark, 50_000),
                  "10n": run_adpcm(spark, 500_000)},
    }
    for name, r in runs.items():
        r["ratio_10n_over_n"] = round(r["10n"]["sec"] / r["n"]["sec"], 2)
    out = REPO / "tools" / "rehearsal_r5ad.json"
    out.write_text(json.dumps(runs, indent=1) + "\n")
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
