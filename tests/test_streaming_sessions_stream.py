"""Streaming session windows (streaming/windowed.run_sessions).

The batch semantics of session_event_stats are pinned by
test_streaming_sessions_dedup; these tests drive the STREAMING route —
the merging-sessions state store — and pin what only it can get wrong:
a partial session persisted in state across micro-batches must MERGE
with a later event that extends it (one emitted session, not two), a
row older than the watermark must be dropped on input, and append mode
must emit each finalized session exactly once across increments.
"""

from datetime import datetime, timedelta

import pytest

from biocypher_metta_spark.streaming.windowed import run_sessions

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")
BASE = datetime(2023, 11, 14, 22, 0, 0)
GAP = timedelta(minutes=30)


def _ts(seconds):
    return BASE + timedelta(seconds=seconds)


def _fmt(dt):
    return dt.strftime("%Y-%m-%d %H:%M:%S")


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ck"))


def test_session_merges_across_micro_batches(spark, dirs):
    """A session left open in the state store by increment 1 must merge
    with an extending event in increment 2 and emit ONCE, as one
    session spanning both increments."""
    in_dir, out_dir, ck = dirs
    # increment 1: two chained events, NO sentinel -> watermark stays
    # below the session end, nothing finalizes, state holds a partial
    # session (BASE .. t60+gap)
    rows1 = [(1, _ts(0), 1, "a", 1.00, "{}"),
             (2, _ts(60), 1, "a", 2.00, "{}")]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(in_dir)
    run_sessions(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)
    assert spark.read.parquet(out_dir).count() == 0  # still open

    # increment 2: an event within the gap of the stored session (must
    # MERGE, extending the end) + a far-future sentinel on its own key
    # so the watermark passes the merged session's end
    rows2 = [(3, _ts(120), 1, "a", 4.00, "{}"),
             (-1, _ts(3600 * 24 * 30), -1, "_sentinel", 0.0, "{}")]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(in_dir)
    run_sessions(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)

    got = [(r.user_id, r.session_start, r.session_end, r.n_events,
            r.sum_value_c)
           for r in spark.read.parquet(out_dir).collect()]
    # ONE merged session: start = first event, end = last event + gap
    assert got == [(1, _fmt(_ts(0)), _fmt(_ts(120) + GAP), 3, 700)]


def test_session_late_row_dropped_and_exactly_once(spark, dirs):
    """A row older than the watermark must be dropped on input (its
    session already finalized), and no session may be re-emitted."""
    in_dir, out_dir, ck = dirs
    rows1 = [(1, _ts(0), 1, "a", 1.00, "{}"),
             (2, _ts(7200), 1, "a", 2.00, "{}"),  # separate session
             (-1, _ts(3600 * 24 * 30), -1, "_sentinel", 0.0, "{}")]
    spark.createDataFrame(rows1, SCHEMA).write.parquet(in_dir)
    run_sessions(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)

    # increment 2: a late tripwire row inside the first (closed)
    # session + a second sentinel to advance/flush
    rows2 = [(-2, _ts(30), 1, "a", 999999.0, "{}"),
             (-3, _ts(3600 * 24 * 30 + 60), -3, "_sentinel", 0.0, "{}")]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(in_dir)
    run_sessions(spark.readStream.schema(SCHEMA).parquet(in_dir),
                 out_dir, ck)

    got = sorted((r.user_id, r.session_start, r.n_events, r.sum_value_c)
                 for r in spark.read.parquet(out_dir).collect())
    # two distinct sessions (7200s > gap), tripwire absent, no dupes,
    # sentinel sessions never finalize
    assert got == [(1, _fmt(_ts(0)), 1, 100),
                   (1, _fmt(_ts(7200)), 1, 200)]
