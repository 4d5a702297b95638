"""Scale rehearsal for the round-5q operators: exact rank statistics
(stats.ks_test / stats.mannwhitney), partition modularity
(graph.modularity), and WebDataset tar shard explosion
(shards.tar_members).

Claimed shapes, measured at N -> 10N in one JVM (warmup excluded):

  ks/mwu   — one key shuffle + per-group sort: wall-clock should track
             the sort, ~linear with a log factor;
  modularity — two mergeable groupBys + label map equi-joins on the
             edge list: ~linear in edges;
  tar      — map-only mapInPandas explode: ~linear in shard bytes.

Writes tools/rehearsal_r5q.json.
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


def run_rankstats(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import ks_test, mannwhitney

    i = F.col("id")
    obs = spark.range(n).select(
        (i % 64).alias("grp"),
        F.when((i % 3) == 0, "a").otherwise("b").alias("s"),
        ((i * 2654435761) % 100_000).alias("v"))
    # force the window/rank work: a checksum over the output columns
    # cannot be column-pruned away the way count() can
    t0 = time.time()
    ks_sum = ks_test(obs, ["grp"], "s", "v", "a", "b").agg(
        F.sum(F.col("d_scaled") + F.col("d_ppm"))).collect()[0][0]
    t_ks = time.time() - t0
    t0 = time.time()
    mw_sum = mannwhitney(obs, ["grp"], "s", "v", "a", "b").agg(
        F.sum(F.col("u_a_x2") + F.col("auc_ppm"))).collect()[0][0]
    t_mw = time.time() - t0
    return {"rows": n, "ks_sum": int(ks_sum), "ks_sec": round(t_ks, 2),
            "mw_sum": int(mw_sum), "mw_sec": round(t_mw, 2)}


def run_modularity(spark, n_edges: int, n_nodes: int,
                   n_comm: int) -> dict:
    from biocypher_metta_spark.operators.graph import modularity

    i = F.col("id")
    edges = spark.range(n_edges).select(
        ((i * 2654435761) % n_nodes).alias("src"),
        ((i * 40503 + 7) % n_nodes).alias("dst"))
    labels = spark.range(n_nodes).select(
        i.alias("id"), (i % n_comm).alias("label"))
    t0 = time.time()
    out = modularity(edges, labels).agg(
        F.sum(F.col("e_in") + F.col("contrib_ppm"))).collect()[0][0]
    return {"edges": n_edges, "nodes": n_nodes, "out": int(out),
            "sec": round(time.time() - t0, 2)}


def run_tar(spark, n_shards: int) -> dict:
    from biocypher_metta_spark.entry_queries import _TAR_VARIANTS
    from biocypher_metta_spark.operators.shards import tar_members

    i = F.col("id")
    variants = F.array(*[F.lit(bytearray(b)) for b in _TAR_VARIANTS])
    shards = spark.range(n_shards).select(
        i.cast("string").alias("media_ref"),
        F.element_at(variants, (i % 3 + 1).cast("int")).alias("content"))
    t0 = time.time()
    out = tar_members(shards).count()
    return {"shards": n_shards, "out": out,
            "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark("rehearsal-r5q")
    spark.sparkContext.setLogLevel("ERROR")
    run_rankstats(spark, 100_000)          # warmup, excluded
    run_tar(spark, 10_000)
    run_modularity(spark, 100_000, 10_000, 16)
    runs = {
        "rankstats": {"n": run_rankstats(spark, 5_000_000),
                      "10n": run_rankstats(spark, 50_000_000)},
        "modularity": {"n": run_modularity(spark, 2_000_000,
                                           200_000, 64),
                       "10n": run_modularity(spark, 20_000_000,
                                             2_000_000, 64)},
        "tar": {"n": run_tar(spark, 200_000),
                "10n": run_tar(spark, 2_000_000)},
    }
    ratios = {
        "ks_10x": round(runs["rankstats"]["10n"]["ks_sec"]
                        / max(runs["rankstats"]["n"]["ks_sec"], 0.01), 2),
        "mw_10x": round(runs["rankstats"]["10n"]["mw_sec"]
                        / max(runs["rankstats"]["n"]["mw_sec"], 0.01), 2),
        "modularity_10x": round(runs["modularity"]["10n"]["sec"]
                                / max(runs["modularity"]["n"]["sec"],
                                      0.01), 2),
        "tar_10x": round(runs["tar"]["10n"]["sec"]
                         / max(runs["tar"]["n"]["sec"], 0.01), 2),
    }
    out = {"runs": runs, "ratios": ratios}
    (Path(__file__).parent / "rehearsal_r5q.json").write_text(
        json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
