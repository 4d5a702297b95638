"""CDC compaction operators: changelog -> snapshot, changelog -> SCD2
intervals, and the skew-salted join (operators/cdc.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators import cdc


def _log(spark):
    # key 1: upsert v1, upsert v2 (same ts, later seq), delete v3
    # key 2: delete then upsert (resurrection) — must SURVIVE
    # key 3: single upsert
    rows = [
        (1, 10, 1, "upsert", 100),
        (1, 10, 2, "upsert", 200),
        (1, 11, 1, "delete", 0),
        (2, 10, 1, "delete", 0),
        (2, 12, 1, "upsert", 777),
        (3, 10, 1, "upsert", 5),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "seq", "op", "val"])


# ---------------------------------------------------------- compaction

def test_changelog_compact_semantics(spark):
    out = cdc.changelog_compact(_log(spark), ["k"], ["ts", "seq"],
                                op_col="op")
    got = {r.k: (r.ts, r.seq, r.val) for r in out.collect()}
    # key 1's latest is a delete -> gone; key 2 resurrected; key 3 kept
    assert got == {2: (12, 1, 777), 3: (10, 1, 5)}


def test_changelog_compact_no_op_col_keeps_all_keys(spark):
    out = cdc.changelog_compact(_log(spark), ["k"], ["ts", "seq"])
    got = {r.k: r.val for r in out.collect()}
    assert got == {1: 0, 2: 777, 3: 5}  # latest version, deletes kept


def test_changelog_compact_tiebreak_within_ts(spark):
    # same ts, higher seq wins (lexicographic tuple order)
    out = cdc.changelog_compact(_log(spark).filter("k = 1 AND ts = 10"),
                                ["k"], ["ts", "seq"])
    assert out.collect()[0].val == 200


def test_changelog_compact_matches_duckdb_twin(spark):
    rows = [(i % 17, (i * 7) % 23, i, "upsert" if i % 5 else "delete",
             i * i) for i in range(300)]
    d = spark.createDataFrame(rows, ["k", "ts", "seq", "op", "val"])
    got = {tuple(r) for r in
           cdc.changelog_compact(d, ["k"], ["ts", "seq"],
                                 op_col="op").collect()}
    con = duckdb.connect()
    con.register("log", d.toPandas())
    sql = cdc.changelog_compact_sql(
        "SELECT * FROM log", ["k"], ["ts", "seq"],
        ["k", "ts", "seq", "op", "val"], op_col="op")
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_changelog_compact_validation(spark):
    d = _log(spark)
    with pytest.raises(ValueError):
        cdc.changelog_compact(d, ["k"], ["nope"])
    with pytest.raises(ValueError):
        cdc.changelog_compact(d, ["k"], ["k", "ts"])  # overlap


# ---------------------------------------------------------- SCD2

def test_scd2_intervals_semantics(spark):
    out = cdc.scd2_intervals(_log(spark).drop("op"), ["k"], ["ts", "seq"])
    got = {(r.k, r.ts, r.seq): (r.valid_from, r.valid_to, r.is_current)
           for r in out.collect()}
    assert got[(1, 10, 1)] == (10, 10, False)  # next version same ts
    assert got[(1, 10, 2)] == (10, 11, False)
    assert got[(1, 11, 1)] == (11, None, True)
    assert got[(3, 10, 1)] == (10, None, True)


def test_scd2_matches_duckdb_twin(spark):
    rows = [(i % 11, (i * 3) % 19, i, i * 2) for i in range(200)]
    d = spark.createDataFrame(rows, ["k", "ts", "seq", "val"])
    got = {tuple(r) for r in
           cdc.scd2_intervals(d, ["k"], ["ts", "seq"]).collect()}
    con = duckdb.connect()
    con.register("log", d.toPandas())
    sql = cdc.scd2_intervals_sql("SELECT * FROM log", ["k"],
                                 ["ts", "seq"], ["k", "ts", "seq", "val"])
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_scd2_feeds_asof_join(spark):
    # the documented composition: SCD2 output drives an as-of lookup
    from biocypher_metta_spark.operators.temporal import asof_join

    hist = cdc.scd2_intervals(
        _log(spark).drop("op").filter("NOT (ts = 10 AND seq = 1)"),
        ["k"], ["ts", "seq"])
    right = hist.select(F.col("k").alias("key"),
                        F.col("valid_from").alias("ts"),
                        F.col("val").alias("state"))
    left = spark.createDataFrame([(1, 12), (2, 13), (3, 9)],
                                 ["key", "ts"])
    got = {r.key: r.state_asof
           for r in asof_join(left, right, key="key").collect()}
    assert got == {1: 0, 2: 777, 3: None}  # latest <= ts / none yet


def test_scd2_validation(spark):
    d = _log(spark).withColumnRenamed("val", "valid_to")
    with pytest.raises(ValueError):
        cdc.scd2_intervals(d, ["k"], ["ts", "seq"])
    with pytest.raises(ValueError):
        cdc.scd2_intervals_sql("SELECT 1", ["k"], [], ["k"])


# ---------------------------------------------------------- salted join

def test_salted_join_equals_plain_inner(spark):
    left = spark.createDataFrame(
        [(i % 5, i) for i in range(200)], ["key", "lv"])
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(4)], ["key", "rv"])
    got = sorted(tuple(r) for r in
                 cdc.salted_join(left, right, ["key"], n_salts=7)
                 .collect())
    want = sorted(tuple(r) for r in left.join(right, "key").collect())
    assert got == want


def test_salted_join_left_semantics(spark):
    left = spark.createDataFrame([(1, "a"), (9, "b")], ["key", "lv"])
    right = spark.createDataFrame([(1, "x")], ["key", "rv"])
    got = sorted(tuple(r) for r in
                 cdc.salted_join(left, right, ["key"], n_salts=5,
                                 how="left").collect())
    assert got == [(1, "a", "x"), (9, "b", None)]  # unmatched once


def test_salted_join_planted_hot_key(spark):
    # one key holds 90% of the left side — counts must still be exact
    left = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 10)
        .alias("key"), F.col("id").alias("lv"))
    right = spark.createDataFrame([(0, "hot"), (3, "cold")],
                                  ["key", "rv"])
    got = {r.key: r.n for r in
           cdc.salted_join(left, right, ["key"], n_salts=16)
           .groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {r.key: r.n for r in
            left.join(right, "key")
            .groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_salted_join_validation(spark):
    d = spark.createDataFrame([(1, 2)], ["key", "v"])
    with pytest.raises(ValueError):
        cdc.salted_join(d, d, ["key"], how="full")
    with pytest.raises(ValueError):
        cdc.salted_join(d, d, ["key"], n_salts=0)
    with pytest.raises(ValueError):
        cdc.salted_join(d.withColumn("_salt", F.lit(1)), d, ["key"])


def test_streaming_upsert_tombstones_and_resurrection(spark, tmp_path):
    from biocypher_metta_spark.streaming.upsert import (
        latest_state_version, read_state, run_upsert_stream)

    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    schema = "k: long, ts: long, op: string, v: long"
    batch1 = spark.createDataFrame(
        [(1, 10, "upsert", 100), (1, 11, "upsert", 101),
         (2, 10, "upsert", 200), (3, 10, "upsert", 300),
         (3, 12, "delete", 0)], schema)
    batch1.write.parquet(in_dir)
    batch2 = spark.createDataFrame(
        [(2, 20, "delete", 0),          # delete an existing key
         (3, 20, "upsert", 333),        # resurrect a tombstoned key
         (4, 20, "upsert", 400)], schema)
    for i in range(2):
        stream = spark.readStream.schema(batch1.schema).parquet(in_dir)
        run_upsert_stream(stream, ["k"], ["ts"], state, ck, op_col="op")
        if i == 0:
            batch2.write.mode("append").parquet(in_dir)
    got = {(r.k, r.ts, r.v) for r in read_state(spark, state).collect()}
    # 1 keeps its latest version; 2 deleted ACROSS batches; 3
    # resurrected after an in-batch tombstone; 4 inserted late
    assert got == {(1, 11, 101), (3, 20, 333), (4, 20, 400)}
    assert latest_state_version(state) == 1
    # version 0 (pre-second-increment) is still readable history
    v0 = {(r.k, r.ts, r.v) for r in
          spark.read.parquet(f"{state}/v=0").collect()}
    assert v0 == {(1, 11, 101), (2, 10, 200)}
