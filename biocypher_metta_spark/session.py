"""SparkSession factory with scale-oriented defaults.

Tuned for the north rule: AQE on (runtime re-plan + skew-join splitting),
Arrow enabled for every pandas UDF crossing, shuffle partitions sized for
local[N] testing but overridable for cluster runs via env/conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Adaptive execution: runtime coalescing, broadcast promotion, skew-join
    # splitting (north-rule requirement for hub-entity skew).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDFs / toPandas — the A+B axes contract.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast threshold: generous enough for every real dimension
    # (alias maps, tissue maps — single-digit MB), but NOT so high that
    # AQE promotes corpus-sized intermediates. 256MB here was measured to
    # wedge the driver: at 2M docs line-dedup's first-occurrence side
    # (~10M rows) estimated under 256MB of shuffle bytes, AQE promoted
    # it, and the in-heap hash relation (5-10x the wire size) sent an 8g
    # heap into a broadcast-build spill-retry loop (threads stuck
    # recursing in TaskMemoryManager.allocatePage). 32MB keeps dimension
    # joins broadcast and bounds any relation build to a few hundred MB.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Sane local default; cluster runs override via spark-submit --conf.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # ParallelGC beats G1 by ~35% on this allocation-heavy rendering
    # workload (measured: 2M-doc KG build 19.9s G1 -> 14.6s ParallelGC at
    # local[32]); a modest heap also wins — 32g was 3x SLOWER than 8g
    # (GC young-gen blowout defeats cache locality). AlwaysPreTouch
    # pre-faults the heap at JVM start (one-time ~1s/8g): without it,
    # concurrent executor JVMs on one host collapse to ~0.3x each on
    # first-touch page-fault storms (measured: 4 concurrent 8-thread JVMs
    # 54s -> 25s per JVM on the same job). Cluster submissions should also
    # set -XX:ActiveProcessorCount=<executor cores> when the JVM can't see
    # a cgroup CPU limit — 4 JVMs each sizing ParallelGC to all 32 host
    # cores (128 GC threads) measured 25s -> 18s per JVM when capped.
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
    "spark.executor.extraJavaOptions": "-XX:+UseParallelGC -XX:+AlwaysPreTouch",
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app_name: str = "biocypher-metta-spark",
              master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session. `master` defaults to local[$SPARK_GRAFT_CPUS]."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Local-mode Python workers resolve imports through the env the JVM
    # was launched with: without this, mapInPandas closures referencing
    # this package only deserialize when the driver's cwd happens to be
    # the repo root (ModuleNotFoundError otherwise). Real clusters ship
    # the package via --py-files / a wheel instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (f"{pkg_root}{os.pathsep}{pp}" if pp
                                    else pkg_root)
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
