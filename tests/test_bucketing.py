"""Bucketed-table layout: zero-Exchange co-located joins, bucket
pruning, and result parity with the plain shuffle join."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark import bucketing


@pytest.fixture()
def bucketed_pair(spark):
    left = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("lv"))
    right = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("rv"))
    tmp = tempfile.mkdtemp(prefix="bcm_bkt_test_")
    # one shuffle partition per bucket -> one file per bucket, the
    # layout a production writer targets (bucket file = task output)
    bucketing.write_bucketed(left.repartition(8, "k"), "t_bkt_left",
                             ["k"], 8, sort_cols=["k"], path=f"{tmp}/l")
    bucketing.write_bucketed(right.repartition(8, "k"), "t_bkt_right",
                             ["k"], 8, sort_cols=["k"], path=f"{tmp}/r")
    yield left, right
    spark.sql("DROP TABLE IF EXISTS t_bkt_left")
    spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb = bucketing.bucketed(spark, "t_bkt_left")
        rb = bucketing.bucketed(spark, "t_bkt_right")
        j = lb.join(rb, "k")
        plan = _physical_plan(j)
        # the whole point: both sides scan co-located buckets, the
        # SortMergeJoin needs no shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    left, right = bucketed_pair
    lb = bucketing.bucketed(spark, "t_bkt_left")
    rb = bucketing.bucketed(spark, "t_bkt_right")
    got = {tuple(r) for r in lb.join(rb, "k").collect()}
    want = {tuple(r) for r in left.join(right, "k").collect()}
    assert got == want


def test_bucket_pruning_on_point_filter(spark, bucketed_pair):
    # autoBucketedScan (on by default) demotes a filter-only query to
    # a plain parquet scan because nothing downstream needs the
    # bucketed partitioning; keep the bucketed scan to show pruning
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        lb = bucketing.bucketed(spark, "t_bkt_left")
        plan = _physical_plan(lb.filter(F.col("k") == 42))
        # a literal filter on the bucket column scans 1 of the 8 buckets
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert lb.filter(F.col("k") == 42).count() == 1
    finally:
        spark.conf.set(conf, old)


def test_write_bucketed_validation(spark):
    d = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bucketing.write_bucketed(d, "t_bad", ["k"], 0)
    with pytest.raises(ValueError):
        bucketing.write_bucketed(d, "t_bad", [], 4)
