"""Scale rehearsal for the round-5ab operators: annotation
up-propagation and Resnik MICA at N -> 10N annotations against a
FIXED ontology (the realistic shape: the ontology is a dimension, the
annotation corpus grows).

Expected: up-propagation is one broadcast join + distinct — linear in
annotations; MICA cost is pair-list bound (fixed here), so its growth
comes only from the count-table rebuild — sublinear.

Writes tools/rehearsal_r5ab.json.
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

N_TERMS = 20_000      # ontology-sized dimension (GO is ~45k terms)


def _closure(spark):
    from biocypher_metta_spark.canonicalize import transitive_closure

    i = F.col("id")
    edges = spark.range(1, N_TERMS).select(
        F.concat(F.lit("C"), i.cast("string")).alias("src"),
        F.concat(F.lit("C"), F.floor(i / 2).cast("long").cast("string"))
        .alias("dst"))
    return transitive_closure(edges).select(
        F.col("src").alias("cls"), F.col("dst").alias("ancestor"))


def run_upprop(spark, clo, n_ann: int) -> dict:
    from biocypher_metta_spark.operators.ontology_sim import (
        annotation_uppropagate,
    )

    i = F.col("id")
    ann = spark.range(n_ann).select(
        F.concat(F.lit("G"), (i % (n_ann // 8)).cast("string"))
        .alias("item"),
        F.concat(F.lit("C"), ((i * 2654435761) % (N_TERMS - 1) + 1)
                 .cast("string")).alias("term"))
    t0 = time.time()
    up = annotation_uppropagate(ann, clo)
    n = up.count()
    return {"annotations": n_ann, "up_rows": n,
            "sec": round(time.time() - t0, 2)}


def run_mica(spark, clo, n_ann: int) -> dict:
    from biocypher_metta_spark.operators.ontology_sim import resnik_mica

    i = F.col("id")
    ann = spark.range(n_ann).select(
        F.concat(F.lit("G"), (i % (n_ann // 8)).cast("string"))
        .alias("item"),
        F.concat(F.lit("C"), ((i * 2654435761) % (N_TERMS - 1) + 1)
                 .cast("string")).alias("term"))
    pairs = spark.range(5_000).select(
        F.concat(F.lit("C"), (i % 9000 + 1000).cast("string"))
        .alias("t1"),
        F.concat(F.lit("C"), ((i * 13) % 9000 + 1000).cast("string"))
        .alias("t2"))
    t0 = time.time()
    m = resnik_mica(pairs, ann, clo)
    row = m.agg(F.count(F.lit(1)), F.sum("n_ann")).collect()[0]
    return {"annotations": n_ann, "pairs": int(row[0]),
            "nsum": int(row[1]), "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5ab")
    spark.sparkContext.setLogLevel("ERROR")
    clo = _closure(spark).localCheckpoint()
    run_upprop(spark, clo, 50_000)         # warmup, excluded
    runs = {
        "upprop": {"n": run_upprop(spark, clo, 500_000),
                   "10n": run_upprop(spark, clo, 5_000_000)},
        "mica": {"n": run_mica(spark, clo, 500_000),
                 "10n": run_mica(spark, clo, 5_000_000)},
    }
    for name, r in runs.items():
        r["ratio_10n_over_n"] = round(r["10n"]["sec"] / r["n"]["sec"], 2)
    out = REPO / "tools" / "rehearsal_r5ab.json"
    out.write_text(json.dumps(runs, indent=1) + "\n")
    print(json.dumps(runs, indent=1))


if __name__ == "__main__":
    main()
