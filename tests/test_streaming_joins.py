"""Stream-stream interval join: bound semantics (batch twin plan),
name-collision validation, and cross-increment state retention."""

from __future__ import annotations

import shutil
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.streaming.joins import (interval_join,
                                                   run_interval_join_stream)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "l1"),
         (2, _ts("2024-01-01 11:00:00"), "l2")],
        ["k", "lts", "lpay"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "exact-start"),
         (1, _ts("2024-01-01 10:02:00"), "exact-horizon"),
         (1, _ts("2024-01-01 10:02:01"), "past-horizon"),
         (1, _ts("2024-01-01 09:59:59"), "before-left"),
         (2, _ts("2024-01-01 11:01:00"), "mid"),
         (3, _ts("2024-01-01 10:01:00"), "no-left-key")],
        ["k", "rts", "rpay"])
    return left, right


def test_interval_join_inclusive_bounds_batch(spark):
    left, right = _frames(spark)
    out = {(r.k, r.rpay) for r in
           interval_join(left, right, "k", "lts", "rts",
                         horizon="2 minutes").collect()}
    assert out == {(1, "exact-start"), (1, "exact-horizon"), (2, "mid")}


def test_interval_join_rejects_column_overlap(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="rename"):
        interval_join(left, right.withColumnRenamed("rpay", "lpay"),
                      "k", "lts", "rts")


def test_interval_join_cross_increment_state(spark, tmp_path):
    """A right row arriving in increment 2 must still match the left
    row buffered (checkpointed) in increment 1."""
    left, right = _frames(spark)
    base = str(tmp_path / "ssj")
    shutil.rmtree(base, ignore_errors=True)
    ldir, rdir = f"{base}/l", f"{base}/r"
    odir, ck = f"{base}/o", f"{base}/ck"
    left.write.parquet(ldir)
    right.filter(F.col("rpay") == "exact-start").write.parquet(rdir)

    def _run():
        run_interval_join_stream(
            spark.readStream.schema(left.schema).parquet(ldir),
            spark.readStream.schema(right.schema).parquet(rdir),
            "k", "lts", "rts", odir, ck,
            horizon="2 minutes", delay="3650 days")

    _run()
    first = {(r.k, r.rpay) for r in spark.read.parquet(odir).collect()}
    assert first == {(1, "exact-start")}
    right.filter(F.col("rpay") != "exact-start") \
        .write.mode("append").parquet(rdir)
    _run()
    both = {(r.k, r.rpay) for r in spark.read.parquet(odir).collect()}
    assert both == {(1, "exact-start"), (1, "exact-horizon"), (2, "mid")}


def test_interval_join_left_outer_batch(spark):
    left, right = _frames(spark)
    out = {(r.k, r.lpay, r.rpay) for r in
           interval_join(left, right, "k", "lts", "rts",
                         horizon="2 minutes", how="left_outer").collect()}
    assert (2, "l2", "mid") in out
    # l1 has matches, so no null row for it; a left row with NO match
    # must appear exactly once, null-padded
    left3 = left.unionByName(spark.createDataFrame(
        [(9, _ts("2024-01-01 12:00:00"), "l9")], left.schema))
    out3 = [(r.k, r.rpay) for r in
            interval_join(left3, right, "k", "lts", "rts",
                          horizon="2 minutes", how="left_outer").collect()]
    assert out3.count((9, None)) == 1


def test_interval_join_how_validation(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="left_outer"):
        interval_join(left, right, "k", "lts", "rts", how="full_outer")


def test_interval_join_left_outer_streaming_null_emission(spark, tmp_path):
    """Streaming left-outer: the null row for a never-matched left row
    emits only once the watermark passes left_time + horizon + delay —
    advanced here by a right-side sentinel in increment 2 (right
    non-matching rows are themselves dropped in a left-outer join)."""
    base = str(tmp_path / "ssjo")
    ldir, rdir = f"{base}/l", f"{base}/r"
    odir, ck = f"{base}/o", f"{base}/ck"
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "unclicked")],
        ["k", "lts", "lpay"])
    left.write.parquet(ldir)
    r_schema = "k long, rts timestamp, rpay string"
    spark.createDataFrame([], r_schema).write.parquet(rdir)

    def _run():
        q = (interval_join(
            spark.readStream.schema(left.schema).parquet(ldir),
            spark.readStream.schema(
                spark.read.parquet(rdir).schema).parquet(rdir),
            "k", "lts", "rts", horizon="2 minutes", delay="1 minute",
            how="left_outer")
            .writeStream.format("parquet")
            .option("path", odir).option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    _run()
    assert spark.read.parquet(odir).count() == 0  # watermark still open
    # the GLOBAL watermark is the MIN across both streams
    # (multipleWatermarkPolicy=min), so sentinels must advance BOTH
    # sides past lts + horizon + delay to close the left row's fate
    spark.createDataFrame(
        [(97, _ts("2024-01-01 13:00:00"), "lsentinel")], left.schema
    ).write.mode("append").parquet(ldir)
    spark.createDataFrame(
        [(99, _ts("2024-01-01 13:00:00"), "sentinel")], r_schema
    ).write.mode("append").parquet(rdir)
    _run()
    # the null row flushes in the batch AFTER the watermark advance is
    # committed — and availableNow fires NO batch without new input, so
    # a further sentinel drives the flush batch (the window gate's
    # two-sentinel protocol); the left sentinel itself stays in state
    # (its own horizon is still open) and must NOT emit
    spark.createDataFrame(
        [(98, _ts("2024-01-01 13:00:01"), "sentinel2")], r_schema
    ).write.mode("append").parquet(rdir)
    _run()
    rows = [(r.k, r.lpay, r.rpay) for r in
            spark.read.parquet(odir).collect()]
    assert rows == [(1, "unclicked", None)]
