"""Scale rehearsal for the round-5x operators: local clustering
coefficient (graph.clustering_coefficient) and skip-gram counts
(text.skipgram_counts).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  clustering — degree-oriented triangle enumeration O(m^1.5) +
               degree join: hub-proof, ~linearithmic in edges at
               fixed density;
  skipgrams  — map-only slice-zip explode + one mergeable groupBy:
               ~linear in corpus tokens; stopword hot keys absorbed
               by partial aggregation.

Writes tools/rehearsal_r5x.json.
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


def run_cc(spark, n_nodes: int) -> dict:
    from biocypher_metta_spark.operators.graph import (
        clustering_coefficient,
    )

    i = F.col("id")
    m = i % n_nodes
    edges = (spark.range(3 * n_nodes).select(
        m.alias("src"), ((m * m + 1) % n_nodes).alias("dst"))
        .unionAll(spark.range(3 * n_nodes).select(
            m.alias("src"), ((m * 5 + 2) % n_nodes).alias("dst")))
        .unionAll(spark.range(3 * n_nodes).select(
            m.alias("src"), ((m * 7 + 11) % n_nodes).alias("dst"))))
    t0 = time.time()
    ck = clustering_coefficient(edges).agg(
        F.count(F.lit(1)), F.sum("cc_permille"),
        F.sum("triangles")).collect()[0]
    return {"nodes": n_nodes, "rows": int(ck[0]), "ck": int(ck[1]),
            "tri": int(ck[2]), "sec": round(time.time() - t0, 2)}


def run_skipgrams(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.text import skipgram_counts

    i = F.col("id")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda k: F.concat(F.lit("w"),
                           ((i * 2654435761 + k * 97) % 500)
                           .cast("string")))
    docs = spark.range(n_docs).select(
        i.alias("doc_id"), F.array_join(words, " ").alias("text"))
    t0 = time.time()
    ck = skipgram_counts(docs, window=2, min_count=2).agg(
        F.count(F.lit(1)), F.sum("n")).collect()[0]
    return {"docs": n_docs, "rows": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5x")
    spark.sparkContext.setLogLevel("ERROR")
    run_cc(spark, 10_000)                  # warmup, excluded
    run_skipgrams(spark, 10_000)
    runs = {
        "clustering": {"n": run_cc(spark, 200_000),
                       "10n": run_cc(spark, 2_000_000)},
        "skipgrams": {"n": run_skipgrams(spark, 100_000),
                      "10n": run_skipgrams(spark, 1_000_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5x.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
