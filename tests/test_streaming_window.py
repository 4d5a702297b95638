"""Watermarked windowed streaming aggregation (streaming/windowed.py).

Deterministic two-increment scenario with a fixed epoch base: append
mode must emit each finalized (window, event_type) row exactly once,
drop a late row whose window the watermark already closed, and never
emit the flush sentinels' own (unfinalized) window.
"""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.streaming.windowed import (
    run_windowed, windowed_event_counts)

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")
# hour-aligned fixed base so window starts are predictable
BASE = datetime(2023, 11, 14, 22, 0, 0)


def _ts(seconds):
    return BASE + timedelta(seconds=seconds)


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ck"))


def test_windowed_late_drop_and_exactly_once(spark, dirs):
    in_dir, out_dir, ck = dirs
    rows1 = [
        (1, _ts(60), 1, "a", 1.00, "{}"),     # hour 0
        (2, _ts(120), 1, "b", 2.50, "{}"),    # hour 0
        (3, _ts(3660), 1, "a", 3.00, "{}"),   # hour 1
        # flush sentinel: watermark -> s1 - 30min, past both real windows
        (-1, _ts(3600 * 24 * 30), -1, "_sentinel", 0.0, "{}"),
    ]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(in_dir)
    run_windowed(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)

    # increment 2: a LATE hour-0 row (tripwire value) that must be
    # dropped + a second sentinel inside sentinel-1's window
    rows2 = [
        (-2, _ts(300), -2, "a", 999999.0, "{}"),
        (-3, _ts(3600 * 24 * 30 + 60), -3, "_sentinel", 0.0, "{}"),
    ]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(in_dir)
    run_windowed(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)

    got = {(r.hour, r.event_type): (r.n_events, r.sum_value_c)
           for r in spark.read.parquet(out_dir).collect()}
    h0 = BASE.strftime("%Y-%m-%d %H:%M:%S")
    h1 = (BASE + timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S")
    assert got == {
        (h0, "a"): (1, 100),   # late 999999 row NOT re-aggregated
        (h0, "b"): (1, 250),
        (h1, "a"): (1, 300),
        # no ("_sentinel", ...) rows: their window never finalizes
    }
    # exactly-once: no duplicate (hour, type) rows survived both runs
    n_rows = spark.read.parquet(out_dir).count()
    assert n_rows == len(got) == 3


def test_windowed_batch_twin_shape(spark):
    """windowed_event_counts on a BATCH frame (no watermark semantics)
    must produce exactly rel_events_hourly's rows — the shared plan the
    kg_streaming_window gate's oracle relies on."""
    rows = [(1, _ts(10), 1, "a", 1.29, "{}"),
            (2, _ts(70), 2, "a", -0.50, "{}"),
            (3, _ts(3601), 1, "b", 2.00, "{}")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.hour, r.event_type): (r.n_events, r.sum_value_c)
           for r in windowed_event_counts(df).collect()}
    h0 = BASE.strftime("%Y-%m-%d %H:%M:%S")
    h1 = (BASE + timedelta(hours=1)).strftime("%Y-%m-%d %H:%M:%S")
    # floor(-0.5*100) = -50 (floor, not truncation); floor(1.29*100) =
    # 129 — the double nearest 1.29 is ABOVE it, so *100 = 129.000...03
    # (DuckDB's identical double math is why the oracle still matches)
    assert got == {(h0, "a"): (2, 129 - 50), (h1, "b"): (1, 200)}
