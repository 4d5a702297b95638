"""10x scale rehearsal for the round-5n operator: exact heavy hitters
(per-partition Misra-Gries candidates + exact rescan, sketch.py).

Same contract as rehearsal_r5b..r5m: the op runs at N and 10N rows in
one JVM (warmup excluded). Claimed shape: pass 1 is map-only (state
bounded to `capacity` per task, zero shuffle); pass 2 shuffles only
rows matching the <= n_partitions*capacity candidates. The generator
plants 8 heavy values over a LARGE singleton tail (the regime the
operator exists for: tail keys must never reach a shuffle as groupBy
keys) — output count is constant at both sizes while the tail grows
10x, so wall-clock should track the two scans, ~linear.

Prints ONE JSON line per size and writes tools/rehearsal_r5n.json.
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


def run_hh(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.sketch import heavy_hitters

    # 60% of rows hit one of 8 heavy values (7.5% each), 40% are
    # distinct singletons — a domain whose distinct-key count scales
    # with n (the naive-groupBy worst case).
    i = F.col("id")
    df = spark.range(n).select(
        F.when(i % 10 < 6, F.concat(F.lit("h"), (i % 8).cast("string")))
        .otherwise(F.concat(F.lit("t"), i.cast("string"))).alias("v"))
    t0 = time.time()
    out = heavy_hitters(df, "v", min_freq_permille=50,
                        capacity=64).count()
    return {"rows": n, "out": out, "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5n")
    spark.sparkContext.setLogLevel("ERROR")
    run_hh(spark, 100_000)  # warmup, excluded
    a = run_hh(spark, 5_000_000)
    b = run_hh(spark, 50_000_000)
    runs = {"heavy_hitters": {"n": a, "10n": b}}
    print(json.dumps(runs))
    ratios = {"heavy_hitters": round(b["sec"] / max(a["sec"], 0.01), 2)}
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5n.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps({"ratios": ratios}))


if __name__ == "__main__":
    main()
