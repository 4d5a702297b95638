"""Scale rehearsal for the round-5o operator: sampled-source
betweenness (graph.betweenness).

Claimed shape: forward = bfs-style frontier joins keyed by
(source, node) — each of the max_depth rounds joins the frontier
against the full edge table, so wall-clock tracks edges x rounds;
everything downstream (pred DAG, backward rounds) is linear in
|sources| x reachable-set. Two axes, one JVM, warmup excluded:

  A: edges 2M -> 20M at fixed 1000 sources (edge-scan bound);
  B: sources 1k -> 10k at fixed 2M edges (linear-in-sources bound).

Prints ONE JSON line per run and writes tools/rehearsal_r5o.json.
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


def run_bw(spark, n_edges: int, n_sources: int) -> dict:
    from biocypher_metta_spark.operators.graph import betweenness

    n_nodes = n_edges // 2
    i = F.col("id")
    m = i % n_nodes
    half = spark.range(n_edges // 2)
    edges = (half.select(m.alias("src"),
                         ((m * 7 + 3) % n_nodes).alias("dst"))
             .unionAll(half.select(m.alias("src"),
                                   ((m * 3 + 1) % n_nodes).alias("dst"))))
    sources = spark.range(n_sources).select(F.col("id").alias("node"))
    t0 = time.time()
    out = betweenness(edges, sources, max_depth=5).count()
    return {"edges": n_edges, "sources": n_sources, "out": out,
            "sec": round(time.time() - t0, 2)}


def run_hc(spark, n_edges: int, n_sources: int) -> dict:
    """harmonic_closeness claim: the betweenness forward pass without
    sigma — linear in |sources| at fixed edges."""
    from biocypher_metta_spark.operators.graph import harmonic_closeness

    n_nodes = n_edges // 2
    m = F.col("id") % n_nodes
    half = spark.range(n_edges // 2)
    edges = (half.select(m.alias("src"),
                         ((m * 7 + 3) % n_nodes).alias("dst"))
             .unionAll(half.select(m.alias("src"),
                                   ((m * 3 + 1) % n_nodes).alias("dst"))))
    sources = spark.range(n_sources).select(F.col("id").alias("node"))
    t0 = time.time()
    out = harmonic_closeness(edges, sources, max_depth=5).count()
    return {"edges": n_edges, "sources": n_sources, "out": out,
            "sec": round(time.time() - t0, 2)}


def run_cusum(spark, n: int) -> dict:
    """cusum claim: the sequential Page recurrence distributes as two
    stacked windows on one key shuffle — ~linear in rows while groups
    stay sortable (64 groups here, the winsorize regime)."""
    from biocypher_metta_spark.operators.stats import cusum

    i = F.col("id")
    df = spark.range(n).select(
        (i % 64).alias("grp"), (i / 64).cast("long").alias("t"),
        (((i * 37 + 11) % 1000)
         + F.when(i > n * 3 / 4, 200).otherwise(0)).alias("v"))
    t0 = time.time()
    out = (cusum(df, ["grp"], "t", "v", target=500, slack=50,
                 h=100_000)
           .filter(F.col("alarm") == 1).count())
    return {"rows": n, "alarms": out,
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5o")
    spark.sparkContext.setLogLevel("ERROR")
    run_bw(spark, 100_000, 100)  # warmup, excluded
    a1 = run_bw(spark, 2_000_000, 1000)
    a2 = run_bw(spark, 20_000_000, 1000)
    b2 = run_bw(spark, 2_000_000, 10_000)
    run_cusum(spark, 100_000)  # warmup, excluded
    c1 = run_cusum(spark, 5_000_000)
    c2 = run_cusum(spark, 50_000_000)
    h1 = run_hc(spark, 2_000_000, 1000)
    h2 = run_hc(spark, 2_000_000, 10_000)
    runs = {"edges_axis": {"n": a1, "10n": a2},
            "sources_axis": {"n": a1, "10n": b2},
            "cusum": {"n": c1, "10n": c2},
            "closeness_sources": {"n": h1, "10n": h2}}
    print(json.dumps(runs))
    ratios = {"edges_10x": round(a2["sec"] / max(a1["sec"], 0.01), 2),
              "sources_10x": round(b2["sec"] / max(a1["sec"], 0.01), 2),
              "cusum_10x": round(c2["sec"] / max(c1["sec"], 0.01), 2),
              "closeness_sources_10x": round(
                  h2["sec"] / max(h1["sec"], 0.01), 2)}
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5o.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps({"ratios": ratios}))


if __name__ == "__main__":
    main()
