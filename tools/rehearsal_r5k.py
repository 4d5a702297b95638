"""10x scale rehearsal for the round-5k operators: lag-k autocorr,
lagged crosscorr, multi-touch attribution, degree assortativity,
k-truss, Benford MAD, readability.

Same contract as rehearsal_r5b..r5h: each op runs at N and 10N in one
JVM (warmup excluded); the claimed shapes are

* autocorr / crosscorr — one key shuffle + one WindowExec carrying
  all lag frames + one co-partitioned moment groupBy: ~linear in
  rows (per-key series length fixed at 200 ticks as keys scale);
* attribution — one user-key equi-join with in-window filter in the
  projection + one conv-id window + channels-sized groupBy: ~linear
  when per-user activity is bounded (it is, by construction here);
* assortativity — distinct + degree agg + two joins + ONE single-row
  moment aggregate: ~linear in edges;
* ktruss — per-round degree-oriented triangle enumeration is
  O(m^1.5) worst-case but wedge-bounded on this synthetic (regularish
  degrees): expect ~linear-ish on fixed peel depth;
* benford — map-only digit extraction + one groupBy of conditional
  sums: ~linear;
* readability — map-only: ~linear.

Prints ONE JSON line per op and writes tools/rehearsal_r5k.json.
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


def _series(spark, n):
    # fixed 200-tick series per key, every 7th tick missing (gaps)
    i = F.col("id")
    return (spark.range(n)
            .select((i / 200).cast("long").alias("g"),
                    (i % 200).alias("t"),
                    ((i * 37 + 11) % 1000).alias("x"),
                    ((i * 53 + 29) % 1000).alias("y"))
            .filter((F.col("t") % 7) != 3))


def run_autocorr(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import autocorr

    df = _series(spark, n)
    t0 = time.time()
    rows = autocorr(df, ["g"], "t", "x", lags=(1, 2, 3)).count()
    return {"rows": n, "out": rows, "sec": round(time.time() - t0, 2)}


def run_crosscorr(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import crosscorr

    df = _series(spark, n)
    t0 = time.time()
    rows = crosscorr(df, ["g"], "t", "x", "y",
                     lags=(-2, -1, 0, 1, 2)).count()
    return {"rows": n, "out": rows, "sec": round(time.time() - t0, 2)}


def run_attribution(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.attribution import (
        attribution_credits,
    )

    i = F.col("id")
    users = n // 100  # bounded per-user activity as n scales
    touches = spark.range(n).select(
        (i % users).alias("u"), ((i * 17 + 5) % 5000).alias("ts"),
        F.concat(F.lit("ch"), i % 6).alias("ch"))
    convs = spark.range(n // 10).select(
        (i % users).alias("u"), i.alias("cid"),
        ((i * 13 + 7) % 5000).alias("cts"))
    t0 = time.time()
    rows = attribution_credits(touches, convs, "u", "ts", "ch",
                               "cid", "cts", model="linear",
                               lookback_s=300).count()
    return {"touches": n, "out": rows,
            "sec": round(time.time() - t0, 2)}


def run_assortativity(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import (
        degree_assortativity,
    )

    i = F.col("id")
    v = n // 10
    edges = spark.range(n).select(
        (i % v).alias("src"), ((i * 7 + 3) % v).alias("dst"))
    t0 = time.time()
    rows = degree_assortativity(edges).count()
    return {"edges": n, "out": rows, "sec": round(time.time() - t0, 2)}


def run_ktruss(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import ktruss

    i = F.col("id")
    v = n // 10
    edges = (spark.range(n).select(
        (i % v).alias("src"), ((i * 7 + 3) % v).alias("dst"))
        .unionAll(spark.range(n).select(
            (i % v).alias("src"), ((i * 3 + 1) % v).alias("dst"))))
    t0 = time.time()
    rows = ktruss(edges, k=3).count()
    return {"edges": 2 * n, "out": rows,
            "sec": round(time.time() - t0, 2)}


def run_benford(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import benford_mad

    i = F.col("id")
    df = spark.range(n).select(
        (i % 64).alias("g"),
        ((i * i + 17 * i + 3) % 999_983 + 1).alias("v"))
    t0 = time.time()
    rows = benford_mad(df, ["g"], "v").count()
    return {"rows": n, "out": rows, "sec": round(time.time() - t0, 2)}


def run_readability(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.text import readability

    i = F.col("id")
    words = F.array(F.lit("the"), F.lit("difficulty"), F.lit("of"),
                    F.lit("extraordinary"), F.lit("comprehension"),
                    F.lit("rhythm."))
    txt = F.concat_ws(
        " ", *[F.element_at(words, ((i * (3 + k) + k) % 6 + 1)
                            .cast("int")) for k in range(24)])
    df = spark.range(n).select(i.alias("doc_id"), txt.alias("text"))
    t0 = time.time()
    rows = readability(df).count()
    return {"docs": n, "out": rows, "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5k", master="local[32]",
                      extra_confs={"spark.sql.shuffle.partitions": "32"})
    ops = {"autocorr": (run_autocorr, 2_000_000),
           "crosscorr": (run_crosscorr, 2_000_000),
           "attribution": (run_attribution, 1_000_000),
           "assortativity": (run_assortativity, 2_000_000),
           "ktruss": (run_ktruss, 300_000),
           "benford": (run_benford, 5_000_000),
           "readability": (run_readability, 500_000)}
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5k.json"
    prev = json.loads(art.read_text()) if art.exists() else {}
    runs = prev.get("runs", {})
    ratios = prev.get("ratios", {})
    for name, (fn, n) in ops.items():
        if only and name not in only:
            continue
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    out = {"runs": runs, "ratios": ratios}
    art.write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
