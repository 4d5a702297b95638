"""Scale rehearsal for the round-5r operators: k-anonymity audit
(privacy.k_anonymity), Cohen's kappa (stats.cohens_kappa), and the
Rocchio nearest-centroid classifier (classify.*).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  k_anonymity — one mergeable groupBy (count + two-phase distinct):
                ~linear in rows;
  kappa       — three mergeable groupBys over one key shuffle + a
                marginal-sized join: ~linear in rows;
  rocchio     — explode + two groupBys to train, broadcast-model join
                + tf shuffle + per-doc argmax window to score:
                ~linear in corpus tokens at fixed vocabulary.

Writes tools/rehearsal_r5r.json.
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


def run_k_anonymity(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.privacy import k_anonymity

    i = F.col("id")
    # ~n/20 equivalence classes, sensitive domain of 5 -> a mixed bag
    # of clean and violating classes at every scale. The reduction mod
    # a large prime BEFORE the class modulus keeps class sizes
    # Poisson-ish: without it, i%7 can become a deterministic function
    # of the class key (when 7 divides n//20+1) and every class gets
    # exactly the same size — zero violations by arithmetic accident.
    rows = spark.range(n).select(
        (((i * 2654435761) % 1_000_000_007)
         % (n // 20 + 1)).alias("qi_a"),
        (i % 7).alias("qi_b"),
        ((i * 40503) % 5).alias("sens"))
    t0 = time.time()
    out = k_anonymity(rows, ["qi_a", "qi_b"], "sens",
                      k_min=3, l_min=2)
    ck = out.agg(F.count(F.lit(1)),
                 F.sum(F.col("k_size") + F.col("l_distinct"))
                 ).collect()[0]
    return {"rows": n, "violations": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_kappa(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import cohens_kappa

    i = F.col("id")
    rows = spark.range(n).select(
        (i % 64).alias("grp"),
        ((i * 2654435761) % 9).cast("string").alias("a"),
        (F.when(i % 3 == 0, (i * 40503) % 9)
         .otherwise((i * 2654435761) % 9)).cast("string").alias("b"))
    t0 = time.time()
    ck = cohens_kappa(rows, ["grp"], "a", "b").agg(
        F.sum(F.col("n_agree") + F.col("kappa_ppm"))).collect()[0][0]
    return {"rows": n, "ck": int(ck), "sec": round(time.time() - t0, 2)}


def run_rocchio(spark, n_docs: int) -> dict:
    from biocypher_metta_spark.operators.classify import (
        rocchio_centroids,
        rocchio_classify,
    )

    i = F.col("id")
    # 200-word vocabulary, 24 tokens/doc, 8 classes; class-correlated
    # token choice so the centroids are non-degenerate
    words = F.transform(
        F.sequence(F.lit(1), F.lit(24)),
        lambda k: F.concat(F.lit("w"),
                           ((i * 2654435761 + k * 97 + (i % 8) * 31)
                            % 200).cast("string")))
    docs = spark.range(n_docs).select(
        i.alias("doc_id"),
        F.array_join(words, " ").alias("text"),
        F.concat(F.lit("c"), (i % 8).cast("string")).alias("label"))
    train = docs.filter(i % 5 != 0).select("text", "label")
    test = docs.filter(i % 5 == 0).select("doc_id", "text")
    t0 = time.time()
    out = rocchio_classify(rocchio_centroids(train), test)
    ck = out.agg(F.count(F.lit(1)),
                 F.sum("score_ppb")).collect()[0]
    return {"docs": n_docs, "predicted": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5r")
    spark.sparkContext.setLogLevel("ERROR")
    run_k_anonymity(spark, 100_000)        # warmup, excluded
    run_kappa(spark, 100_000)
    run_rocchio(spark, 10_000)
    runs = {
        "k_anonymity": {"n": run_k_anonymity(spark, 5_000_000),
                        "10n": run_k_anonymity(spark, 50_000_000)},
        "kappa": {"n": run_kappa(spark, 5_000_000),
                  "10n": run_kappa(spark, 50_000_000)},
        "rocchio": {"n": run_rocchio(spark, 200_000),
                    "10n": run_rocchio(spark, 2_000_000)},
    }
    ratios = {
        "k_anonymity_10x": round(
            runs["k_anonymity"]["10n"]["sec"]
            / max(runs["k_anonymity"]["n"]["sec"], 0.01), 2),
        "kappa_10x": round(runs["kappa"]["10n"]["sec"]
                           / max(runs["kappa"]["n"]["sec"], 0.01), 2),
        "rocchio_10x": round(runs["rocchio"]["10n"]["sec"]
                             / max(runs["rocchio"]["n"]["sec"], 0.01),
                             2),
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5r.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
