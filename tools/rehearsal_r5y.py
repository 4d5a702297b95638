"""Scale rehearsal for the round-5y operators: BMP decode (bmp.py via
the sniff chain), G.711 mu-law WAV decode (wav.py tag 7), and sitemap
parsing (web.sitemap_urls).

All three are map-only (mapInPandas codecs / regexp extraction), so the
claimed shape is ~linear in docs at N -> 10N (pure-Python codec CPU
regime for the two decoders; JVM regex for the sitemap).

Writes tools/rehearsal_r5y.json.
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


def run_bmp(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.bmp import bmp_encode
    from biocypher_metta_spark.operators.multimodal import image_stats

    w, h = 17, 12
    rgb = bytes(((x * 7 + 3) % 256) for x in range(w * h * 3))
    blob = bytearray(bmp_encode(w, h, rgb))
    media = spark.range(n_docs).select(
        F.concat(F.lit("bmp://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("image").alias("kind"), F.lit(blob).alias("content"))
    t0 = time.time()
    ck = image_stats(media).agg(
        F.count(F.lit(1)), F.sum("pix_sum")).collect()[0]
    return {"docs": n_docs, "ck": int(ck[1]), "sec": round(time.time() - t0, 2)}


def run_ulaw(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.multimodal import audio_stats
    from biocypher_metta_spark.operators.wav import wav_encode_ulaw

    samples = [((i * 1103 + 7) % 65536) - 32768 for i in range(320)]
    blob = bytearray(wav_encode_ulaw(samples))
    media = spark.range(n_docs).select(
        F.concat(F.lit("ulaw://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("audio").alias("kind"), F.lit(blob).alias("content"))
    t0 = time.time()
    ck = audio_stats(media).agg(
        F.count(F.lit(1)), F.sum("sum_sq")).collect()[0]
    return {"docs": n_docs, "ck": int(ck[1]), "sec": round(time.time() - t0, 2)}


def run_sitemap(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.web import sitemap_urls

    i = F.col("id")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://s"), (i % 50).cast("string"),
        F.lit(".example/p/"), i.cast("string"),
        F.lit("</loc><lastmod>2024-01-01</lastmod></url>"
              "<url><loc>https://x.example/q</loc></url></urlset>"))
    docs = spark.range(n_docs).select(i.alias("doc_id"),
                                      xml.alias("text"))
    t0 = time.time()
    ck = sitemap_urls(docs).agg(
        F.count(F.lit(1)),
        F.sum(F.length("loc"))).collect()[0]
    return {"docs": n_docs, "rows": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5y")
    spark.sparkContext.setLogLevel("ERROR")
    run_bmp(spark, 5_000)                  # warmup, excluded
    run_ulaw(spark, 5_000)
    run_sitemap(spark, 20_000)
    runs = {
        "bmp": {"n": run_bmp(spark, 50_000),
                "10n": run_bmp(spark, 500_000)},
        "ulaw": {"n": run_ulaw(spark, 50_000),
                 "10n": run_ulaw(spark, 500_000)},
        "sitemap": {"n": run_sitemap(spark, 500_000),
                    "10n": run_sitemap(spark, 5_000_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5y.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
