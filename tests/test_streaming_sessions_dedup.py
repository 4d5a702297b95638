"""Session windows (streaming/windowed.session_event_stats) and
watermarked streaming dedup (streaming/dedup.py).

The session tests pin the merge semantics the DuckDB islands oracle
mirrors — in particular the exact-gap tie rule — on hand-built rows
where every boundary is chosen deliberately. The dedup test drives the
two-increment at-least-once-redelivery scenario end-to-end.
"""

from datetime import datetime, timedelta

import pytest

from biocypher_metta_spark.streaming.dedup import run_dedup_stream
from biocypher_metta_spark.streaming.windowed import session_event_stats

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")
BASE = datetime(2023, 11, 14, 22, 0, 0)
GAP = 30 * 60  # seconds, matches gap="30 minutes"


def _ts(seconds):
    return BASE + timedelta(seconds=seconds)


def _fmt(seconds):
    return _ts(seconds).strftime("%Y-%m-%d %H:%M:%S")


def _sessions(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.user_id, r.session_start): (r.session_end, r.n_events,
                                           r.sum_value_c)
            for r in session_event_stats(df).collect()}


def test_session_merge_and_exact_gap_tie(spark):
    rows = [
        # user 1: three events chained within the gap -> ONE session;
        # the chain matters: event 3 is > gap from event 1 but < gap
        # from event 2 (sessions extend transitively)
        (1, _ts(0), 1, "a", 1.00, "{}"),
        (2, _ts(GAP - 60), 1, "a", 2.00, "{}"),
        (3, _ts(2 * GAP - 120), 1, "a", 3.00, "{}"),
        # user 1: next event 1s MORE than gap after the last -> new
        (4, _ts(3 * GAP - 119), 1, "b", 4.00, "{}"),
        # user 2: exact-gap tie — second event at ts1 + gap precisely.
        # Spark session_window MERGES the tie (inclusive boundary);
        # the oracle's `<= INTERVAL` mirrors it
        (5, _ts(0), 2, "a", 5.00, "{}"),
        (6, _ts(GAP), 2, "a", 6.00, "{}"),
    ]
    got = _sessions(spark, rows)
    assert got == {
        (1, _fmt(0)): (_fmt(2 * GAP - 120 + GAP), 3, 600),
        (1, _fmt(3 * GAP - 119)): (_fmt(4 * GAP - 119), 1, 400),
        (2, _fmt(0)): (_fmt(2 * GAP), 2, 1100),
    }


def test_session_single_event_and_negative_values(spark):
    rows = [(1, _ts(0), 7, "a", -0.50, "{}")]
    got = _sessions(spark, rows)
    # floor(-0.5*100) = -50; session end = ts + gap
    assert got == {(7, _fmt(0)): (_fmt(GAP), 1, -50)}


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ck"))


def test_streaming_dedup_two_increments(spark, dirs):
    in_dir, out_dir, ck = dirs
    rows1 = [
        (1, _ts(0), 1, "a", 1.00, "{}"),
        (1, _ts(0), 1, "a", 1.00, "{}"),   # in-batch duplicate
        (2, _ts(60), 1, "b", 2.00, "{}"),
    ]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(in_dir)
    run_dedup_stream(spark.readStream.schema(SCHEMA).parquet(in_dir),
                     ["event_id"], out_dir, ck, delay="3650 days")
    # redelivery in a later increment: same keys, still in horizon
    rows2 = [
        (1, _ts(0), 1, "a", 1.00, "{}"),
        (2, _ts(60), 1, "b", 2.00, "{}"),
        (3, _ts(120), 2, "a", 3.00, "{}"),  # genuinely new
    ]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(in_dir)
    run_dedup_stream(spark.readStream.schema(SCHEMA).parquet(in_dir),
                     ["event_id"], out_dir, ck, delay="3650 days")

    got = sorted((r.event_id, r.user_id, r.event_type)
                 for r in spark.read.parquet(out_dir).collect())
    assert got == [(1, 1, "a"), (2, 1, "b"), (3, 2, "a")]
