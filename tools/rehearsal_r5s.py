"""Scale rehearsal for the round-5s operators: Spearman rank
correlation and Theil-Sen median slope (stats.*), and the t-closeness
ordered-EMD privacy audit (privacy.t_closeness).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  spearman     — one key exchange, two in-partition rank sorts, one
                 mergeable moments groupBy: ~n log n in rows;
  theil_sen    — pairs = sum over groups of n_g^2/2 BY DESIGN (the
                 operator contract is bounded group size); rehearsed
                 at fixed series length with 10x more groups, so the
                 honest expectation is ~linear in total pairs;
  t_closeness  — two mergeable groupBys on the QI key + a classes*m
                 literal grid window: ~linear in rows at fixed m.

Writes tools/rehearsal_r5s.json.
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


def run_spearman(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import spearman

    i = F.col("id")
    # 64 groups, x with heavy ties (mod 50), y rank-correlated with x
    # plus hash noise so rho is neither 0 nor 1e6
    rows = spark.range(n).select(
        (i % 64).alias("grp"),
        (i % 50).alias("x"),
        ((i % 50) * 10 + ((i * 2654435761) % 97)).alias("y"))
    t0 = time.time()
    ck = spearman(rows, ["grp"], "x", "y").agg(
        F.sum(F.col("n_obs") + F.col("rho_ppm"))).collect()[0][0]
    return {"rows": n, "ck": int(ck), "sec": round(time.time() - t0, 2)}


def run_theil_sen(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import theil_sen

    i = F.col("id")
    # fixed series length 100 (the bounded-group contract), n/100
    # groups -> total pairs = 49.5 * n grows linearly with n
    rows = spark.range(n).select(
        F.floor(i / 100).alias("grp"),
        (i % 100).alias("x"),
        ((i % 100) * 3 + ((i * 40503) % 23)).alias("y"))
    t0 = time.time()
    ck = theil_sen(rows, ["grp"], "x", "y").agg(
        F.count(F.lit(1)), F.sum("slope_ppm")).collect()[0]
    return {"rows": n, "groups": int(ck[0]), "ck": int(ck[1]),
            "sec": round(time.time() - t0, 2)}


def run_t_closeness(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.privacy import t_closeness

    i = F.col("id")
    # ~n/200 QI classes, ordinal domain m = 8; the class key leaks
    # into the band for every 3rd row so a stable subset violates
    rows = spark.range(n).select(
        (((i * 2654435761) % 1_000_000_007) % (n // 200 + 1))
        .alias("qi"),
        (F.when(i % 3 == 0, (((i * 2654435761) % 1_000_000_007)
                             % (n // 200 + 1)) % 8)
         .otherwise((i * 40503) % 8)).alias("band"))
    t0 = time.time()
    out = t_closeness(rows, ["qi"], "band", t_ppm=150_000)
    ck = out.agg(F.count(F.lit(1)), F.sum("emd_ppm")).collect()[0]
    return {"rows": n, "violations": int(ck[0]),
            "ck": int(ck[1] or 0), "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5s")
    spark.sparkContext.setLogLevel("ERROR")
    run_spearman(spark, 100_000)           # warmup, excluded
    run_theil_sen(spark, 20_000)
    run_t_closeness(spark, 100_000)
    runs = {
        "spearman": {"n": run_spearman(spark, 5_000_000),
                     "10n": run_spearman(spark, 50_000_000)},
        "theil_sen": {"n": run_theil_sen(spark, 100_000),
                      "10n": run_theil_sen(spark, 1_000_000)},
        "t_closeness": {"n": run_t_closeness(spark, 5_000_000),
                        "10n": run_t_closeness(spark, 50_000_000)},
    }
    ratios = {
        f"{k}_10x": round(v["10n"]["sec"] / max(v["n"]["sec"], 0.01), 2)
        for k, v in runs.items()
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5s.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
