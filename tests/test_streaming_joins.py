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
