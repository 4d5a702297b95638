"""Scale rehearsal for the round-5z operator: minimum spanning forest
(graph.boruvka_mst) at N -> 10N edges.

Expected shape: each Boruvka round is two hash joins + one
min(struct) groupBy over the surviving cross edges, and the component
count at least halves per round, so cost ~ E * rounds with rounds
growing only as log2(V) — near-linear in E with a small logarithmic
factor (10x edges with 10x nodes adds ~3 extra rounds).

Writes tools/rehearsal_r5z.json.
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


def run_mst(spark, n_edges: int) -> dict:
    from biocypher_metta_spark.operators.graph import boruvka_mst

    n_nodes = max(n_edges // 4, 16)
    i = F.col("id")
    # connected backbone (ring) + hashed chords: cycles at every scale
    ring = spark.range(n_nodes).select(
        i.alias("src"), ((i + 1) % n_nodes).alias("dst"))
    chords = spark.range(n_edges - n_nodes).select(
        ((i * 2654435761) % n_nodes).alias("src"),
        ((i * 40503 + 2531011) % n_nodes).alias("dst"))
    edges = (ring.unionAll(chords)
             .withColumn("weight",
                         (F.least("src", "dst") * 73
                          + F.greatest("src", "dst") * 131
                          + (F.least("src", "dst")
                             * F.greatest("src", "dst")) % 7919)
                         % 1_000_003 + 1))
    t0 = time.time()
    msf = boruvka_mst(edges)
    row = msf.agg(F.count(F.lit(1)), F.sum("w")).collect()[0]
    return {"edges": n_edges, "nodes": n_nodes, "msf_edges": int(row[0]),
            "msf_weight": int(row[1]), "sec": round(time.time() - t0, 2)}


def run_gif(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.gif import gif_encode
    from biocypher_metta_spark.operators.multimodal import image_stats

    w, h = 24, 16
    pal = [((i * 11) % 256, (i * 57) % 256, (i * 199) % 256)
           for i in range(64)]
    rgb = b"".join(bytes(pal[(x * 7 + y * 13) % 64])
                   for y in range(h) for x in range(w))
    blob = bytearray(gif_encode(w, h, rgb))
    media = spark.range(n_docs).select(
        F.concat(F.lit("gif://"), F.col("id").cast("string"))
        .alias("media_ref"),
        F.lit("image").alias("kind"), F.lit(blob).alias("content"))
    t0 = time.time()
    ck = image_stats(media).agg(
        F.count(F.lit(1)), F.sum("pix_sum")).collect()[0]
    return {"docs": n_docs, "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5z")
    spark.sparkContext.setLogLevel("ERROR")
    run_mst(spark, 20_000)                 # warmup, excluded
    run_gif(spark, 5_000)
    runs = {
        "mst": {"n": run_mst(spark, 200_000),
                "10n": run_mst(spark, 2_000_000)},
        "gif": {"n": run_gif(spark, 50_000),
                "10n": run_gif(spark, 500_000)},
    }
    for name, r in runs.items():
        r["ratio_10n_over_n"] = round(r["10n"]["sec"] / r["n"]["sec"], 2)
    out = REPO / "tools" / "rehearsal_r5z.json"
    out.write_text(json.dumps(runs, indent=1) + "\n")
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
