"""Scale rehearsal for the round-5aa operators: locally-dominant
greedy matching and fixed-priority Luby MIS at N -> 10N edges.

Expected shape: both are round-based with per-round groupBy +
anti/semi joins on uniform node keys; round count is O(log) on
hash-priority / formula-weight graphs, so cost ~ E * log with the
working set shrinking as nodes retire — near-linear in E.

Writes tools/rehearsal_r5aa.json.
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


def _edges(spark, n_edges: int, weighted: bool):
    n_nodes = max(n_edges // 4, 16)
    i = F.col("id")
    e = spark.range(n_edges).select(
        ((i * 2654435761) % n_nodes).alias("src"),
        ((i * 40503 + 2531011) % n_nodes).alias("dst"))
    if weighted:
        e = e.withColumn(
            "weight",
            (F.least("src", "dst") * 73 + F.greatest("src", "dst") * 131
             + (F.col("src") * F.col("dst")) % 7919) % 1_000_003 + 1)
    return e


def run_matching(spark, n_edges: int) -> dict:
    from biocypher_metta_spark.operators.graph import dominant_matching

    t0 = time.time()
    m = dominant_matching(_edges(spark, n_edges, True))
    row = m.agg(F.count(F.lit(1)), F.sum("w")).collect()[0]
    return {"edges": n_edges, "matched": int(row[0]),
            "weight": int(row[1]), "sec": round(time.time() - t0, 2)}


def run_mis(spark, n_edges: int) -> dict:
    from biocypher_metta_spark.operators.graph import greedy_mis

    t0 = time.time()
    m = greedy_mis(_edges(spark, n_edges, False))
    row = m.agg(F.count(F.lit(1)),
                F.sum(F.col("h") % 1_000_003)).collect()[0]
    return {"edges": n_edges, "mis": int(row[0]), "hsum": int(row[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5aa")
    spark.sparkContext.setLogLevel("ERROR")
    run_matching(spark, 20_000)            # warmup, excluded
    run_mis(spark, 20_000)
    runs = {
        "matching": {"n": run_matching(spark, 200_000),
                     "10n": run_matching(spark, 2_000_000)},
        "mis": {"n": run_mis(spark, 200_000),
                "10n": run_mis(spark, 2_000_000)},
    }
    for name, r in runs.items():
        r["ratio_10n_over_n"] = round(r["10n"]["sec"] / r["n"]["sec"], 2)
    out = REPO / "tools" / "rehearsal_r5aa.json"
    out.write_text(json.dumps(runs, indent=1) + "\n")
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
