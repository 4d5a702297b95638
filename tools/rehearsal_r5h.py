"""10x scale rehearsal for the round-5h operators: KMV set-operation
estimates, bounded weighted shortest paths, deterministic random
walks, DSIR importance scoring, WL color refinement,
temporal reachability, personalized PageRank.

Same contract as rehearsal_r5b/c/e/f/g: each op runs at N and 10N in
one JVM (warmup excluded); the claimed shapes are

* kmv_setops — two distinct-hash shuffles + TakeOrdered sketch builds,
  everything after on <= 2k rows: ~linear in corpus rows;
* sssp — frontier relaxation from 5 seeds over an out-degree-2 graph:
  the frontier is walk-shaped (small), each round joins it to the
  edge table, so cost ~ rounds x edge-scan: ~linear in edges;
* random_walks — walks start at EVERY node, two 1:1 equi-joins per
  step: ~linear in nodes x walk_len (output volume itself is the
  work);
* wl — per round two equi-joins + two bounded-state sums:
  ~linear in edges;
* treach — sssp's frontier shape over contact edges (frontier
  stays seed-bounded): ~linear in contacts;
* ppr — pagerank's per-round shape (two data-sized shuffles):
  ~linear in edges;
* dsir — model state bounded by `buckets` regardless of corpus (two
  groupBys into <= 256 rows), scoring map-only + one per-doc groupBy:
  ~linear in docs.

Prints ONE JSON line per op and writes tools/rehearsal_r5h.json.
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


def run_kmv_setops(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.sketch import kmv_set_estimate

    a = spark.range(n).select(
        F.concat(F.lit("v"), (F.col("id") % (2 * n // 3)))
        .alias("x"))
    b = spark.range(n).select(
        F.concat(F.lit("v"), (F.col("id") % (2 * n // 3))
                 + F.lit(n // 3)).alias("x"))
    t0 = time.time()
    row = kmv_set_estimate(a, "x", b, "x", k=256).collect()[0]
    return {"rows_per_side": n, "union_est": int(row["union_est"]),
            "inter_est": int(row["inter_est"]),
            "sec": round(time.time() - t0, 2)}


def run_sssp(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import sssp_bounded

    m = F.col("id") % n
    edges = (spark.range(n)
             .select(m.alias("src"), ((m * 7 + 3) % n).alias("dst"),
                     (1 + (m * 3 + 1) % 7).alias("w"))
             .unionAll(spark.range(n).select(
                 m.alias("src"), ((m * 3 + 1) % n).alias("dst"),
                 (1 + (m * 5 + 2) % 7).alias("w"))))
    sources = spark.range(5).select(F.col("id").alias("node"))
    t0 = time.time()
    rows = sssp_bounded(edges, sources, rounds=6).count()
    return {"edges": 2 * n, "rows": rows,
            "sec": round(time.time() - t0, 2)}


def run_walks(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import random_walks

    m = F.col("id") % n
    edges = (spark.range(n)
             .select(m.alias("src"), ((m * 7 + 3) % n).alias("dst"))
             .unionAll(spark.range(n).select(
                 m.alias("src"), ((m * 3 + 1) % n).alias("dst"))))
    t0 = time.time()
    rows = random_walks(edges, walk_len=4, reps=1).count()
    return {"nodes": n, "rows": rows, "sec": round(time.time() - t0, 2)}


_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _docs(spark, n: int):
    # 12-word docs with id-varied vocabulary (no stride collapse:
    # word index mixes id and position nonlinearly)
    w = ", ".join(
        f"element_at(array({', '.join(repr(x) for x in _WORDS)}), "
        f"CAST((id * 31 + {j} * {j} * 7 + id % {j + 2}) % 20 AS INT) + 1)"
        for j in range(12))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', {w})").alias("text"),
        (F.when(F.col("id") % 3 == 0, "en").otherwise("de"))
        .alias("lang"))


def run_dsir(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.text import dsir_scores

    d = _docs(spark, n)
    t0 = time.time()
    rows = (dsir_scores(d, d.filter(F.col("lang") == "en"),
                        buckets=256).count())
    return {"docs": n, "rows": rows, "sec": round(time.time() - t0, 2)}


def run_wl(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import wl_colors

    m = F.col("id") % n
    edges = (spark.range(n)
             .select(m.alias("src"), ((m * 7 + 3) % n).alias("dst"))
             .unionAll(spark.range(n).select(
                 m.alias("src"), ((m * 3 + 1) % n).alias("dst"))))
    t0 = time.time()
    rows = wl_colors(edges, rounds=2).count()
    return {"nodes": n, "rows": rows, "sec": round(time.time() - t0, 2)}


def run_treach(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import temporal_reachability

    m = F.col("id") % (n // 10)
    edges = spark.range(n).select(
        m.alias("src"), ((m * 7 + 3) % (n // 10)).alias("dst"),
        ((F.col("id") * 13 + 5) % 100000).alias("ts"))
    sources = spark.range(5).select(F.col("id").alias("node"),
                                    F.lit(0).alias("t0"))
    t0 = time.time()
    rows = temporal_reachability(edges, sources, max_hops=5).count()
    return {"contacts": n, "rows": rows,
            "sec": round(time.time() - t0, 2)}


def run_ppr(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import personalized_pagerank

    m = F.col("id") % n
    edges = (spark.range(n)
             .select(m.alias("src"), ((m * 7 + 3) % n).alias("dst"))
             .unionAll(spark.range(n).select(
                 m.alias("src"), ((m * 3 + 1) % n).alias("dst"))))
    seeds = spark.range(5).select(F.col("id"))
    t0 = time.time()
    rows = personalized_pagerank(edges, seeds, iterations=3).count()
    return {"nodes": n, "rows": rows, "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5h", master="local[32]",
                      extra_confs={"spark.sql.shuffle.partitions": "32"})
    ops = {"kmv_setops": (run_kmv_setops, 2_000_000),
           "sssp": (run_sssp, 500_000),
           "walks": (run_walks, 100_000),
           "dsir": (run_dsir, 100_000),
           "wl": (run_wl, 500_000),
           "treach": (run_treach, 1_000_000),
           "ppr": (run_ppr, 500_000)}
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5h.json"
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
