"""Engine-portable cardinality sketch: K-Minimum-Values (KMV).

Spark's native approx_count_distinct and DuckDB's are both HLL — but
DIFFERENT HLLs, so their estimates can never hash-match in a
cross-engine gate. KMV (Bar-Yossef et al. 2002) is the sketch whose
every intermediate is deterministic given a deterministic hash: keep
the k smallest 60-bit portable md5 hashes of the distinct values; the
kth minimum h_k estimates density, distinct ~= (k-1) * 2^60 / h_k.
Same hashes -> same k-minima -> same integer estimate in any engine.

Scale shape: one shuffle on the (uniform) hash for distinct, then a
global k-smallest via orderBy+limit — Spark plans TakeOrdered (per
partition top-k, tiny driver merge), never a full sort. The k-minima
set is mergeable (union two sketches, keep the k smallest), which is
what makes KMV a rollup-friendly sketch: per-partition/per-day sketch
rows can reaggregate like the hypertable rollup does for sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import portable_hash

HASH_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row DataFrame (k, n_sketch, h_k, estimate) estimating the
    number of distinct `col` values. When fewer than k distinct values
    exist the sketch is exact (estimate = n_sketch). The estimate is
    floor((k-1) * (2^60 / h_k)) with the division in double — both
    engines convert int64 -> double with IEEE round-to-nearest, so the
    arithmetic is bit-identical cross-engine."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # NULL values hash to NULL; Spark sorts NULLs FIRST ascending, so an
    # unfiltered NULL would occupy a k-minima slot (inflating n_sketch
    # while F.max ignores it) and diverge from engines that sort NULLs
    # last — a sketch counts distinct VALUES, so drop NULL explicitly.
    kmin = (df.select(portable_hash(F.col(col)).alias("h"))
            .filter(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k))
    agg = kmin.agg(F.count("*").alias("n_sketch"),
                   F.max("h").alias("h_k"))
    return agg.select(
        F.lit(k).alias("k"),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.col("h_k").cast("long").alias("h_k"),
        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
        .otherwise(F.floor((k - 1)
                           * (F.lit(HASH_SPACE) / F.col("h_k"))))
        .cast("long").alias("estimate"))
