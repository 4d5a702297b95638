"""Bucketed-table layout: the shuffle-free co-located join.

At 100 TB the dominant recurring cost of the KG build is re-shuffling
the same fact tables on the same keys every run (orders x customer on
custkey, triples x dimension on id, ...). Spark's answer is BUCKETED
TABLES: write each side hash-partitioned into N buckets on the join
key (optionally sorted within buckets), and every later equi-join on
that key reads bucket i against bucket i directly — SortMergeJoin
with NO Exchange on either side, and with sortBy not even a Sort.
The shuffle is paid ONCE at write time and amortized over every
subsequent join, which is exactly the economics a nightly 100-TB
pipeline wants (the same reasoning as Iceberg's bucket partition
transform; parquet `bucketBy` tables are the sandbox stand-in, same
as lineage.py's partition story).

Bucket-count discipline: both sides must use the SAME n_buckets (or
one a multiple of the other with spark.sql.bucketing.coalesceBucketsInJoin
enabled); n_buckets sets per-bucket file size (target 128 MB-1 GB at
scale) AND the join's parallelism floor, so size it from table bytes,
not row counts. Filters on the bucket column also prune buckets at
scan time (SelectedBucketsCount in the plan) — point lookups touch
1/N of the files.

Everything here is exercised by tests/test_bucketing.py, which
asserts the zero-Exchange join plan, the bucket-pruned scan, and
result parity with the plain shuffle join; gate `rel_bucketed_join`
cross-checks values against the DuckDB plain-join oracle (bucketing
must change LAYOUT, never results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Materialize `df` as a bucketed (optionally sorted) parquet
    table in the session catalog, replacing any previous version.
    `path` makes it external (useful for tests / temp dirs); the
    catalog entry is what carries the bucket spec — reading the
    parquet files directly would silently lose it."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("need at least one bucket column")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (the bucket spec
    lives there, not in the files)."""
    return spark.table(table)
