"""Scale rehearsal for the round-5u operators: DAG longest-path depth
(graph.dag_depth) and perceptual image dHash (multimodal.image_dhash).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  dag_depth  — max-plus path doubling: ceil(log2 depth) self-join
               rounds over the length table (O(reachable pairs));
               the /2-/3 parent DAG keeps ancestor sets ~log n, so
               ~linearithmic in nodes;
  dhash      — map-only mapInPandas PNG decode + integer downsample:
               ~linear in docs (pure-Python codec CPU regime).

Writes tools/rehearsal_r5u.json.
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


def run_dag_depth(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import dag_depth

    i = F.col("id")
    edges = (spark.range(1, n).select(
        i.alias("src"), F.floor(i / 2).cast("long").alias("dst"))
        .unionAll(spark.range(1, n).select(
            i.alias("src"), F.floor(i / 3).cast("long").alias("dst"))))
    t0 = time.time()
    ck = dag_depth(edges, max_iter=10).agg(
        F.count(F.lit(1)), F.sum("depth"), F.max("depth")).collect()[0]
    return {"nodes": n, "rows": int(ck[0]), "ck": int(ck[1]),
            "max_depth": int(ck[2]), "sec": round(time.time() - t0, 2)}


def run_dhash(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.multimodal import image_dhash
    from biocypher_metta_spark.operators.png import png_encode

    w, h, c = 24, 16, 3
    pix = bytes(((x * 7 + y * 13 + ch * 29) % 256)
                for y in range(h) for x in range(w) for ch in range(c))
    blob = bytearray(png_encode(w, h, c, pix, filter_type=2))
    media = spark.range(n_docs).select(
        F.concat(F.lit("png://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("image").alias("kind"),
        F.lit(blob).alias("content"))
    t0 = time.time()
    # dhash spans the full signed-64 range: sum mod a prime, not raw
    ck = image_dhash(media).agg(
        F.count(F.lit(1)),
        F.sum(F.pmod(F.col("dhash"), F.lit(1_000_003)))).collect()[0]
    return {"docs": n_docs, "rows": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5u")
    spark.sparkContext.setLogLevel("ERROR")
    run_dag_depth(spark, 10_000)           # warmup, excluded
    run_dhash(spark, 5_000)
    runs = {
        # length-table volume is O(nodes * ancestor-set) — ~70-90
        # ancestors per node under /2-/3 here, so 300k nodes is already
        # a ~25M-pair closure self-joined per round inside one 8g JVM;
        # the documented quadratic-output caveat, not a shuffle flaw
        "dag_depth": {"n": run_dag_depth(spark, 30_000),
                      "10n": run_dag_depth(spark, 300_000)},
        "dhash": {"n": run_dhash(spark, 50_000),
                  "10n": run_dhash(spark, 500_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5u.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
