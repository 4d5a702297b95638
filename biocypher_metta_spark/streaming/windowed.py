"""Watermarked event-time window aggregation (Structured Streaming).

Completes the streaming capability set next to incremental.py (stateless
exactly-once extraction) and stateful.py (applyInPandasWithState):
tumbling event-time windows whose results are emitted exactly once, in
append mode, when the watermark passes the window end — and late rows
that arrive after their window closed are DROPPED, never double-counted.

The batch twin is entry_queries.rel_events_hourly (same grouping, same
floor(value*100) cent quantization), so the kg_streaming_window gate can
hold the streaming output against the identical DuckDB oracle while the
gate itself plants a late row and proves it was discarded.

Scale notes: window state is partitioned by (window, event_type) in the
state store; the watermark bounds state size to (#types x windows within
the lateness horizon), so state is O(active windows), not O(history).
The aggregation itself is the ordinary partial-agg shuffle — hot event
types within one window are map-side combined before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame,
                          window_duration: str = "1 hour",
                          watermark_delay: str = "30 minutes",
                          time_col: str = "ts") -> DataFrame:
    """Streaming events (ts, event_type, value, ...) -> per-window
    per-type counts and cent sums, finalized by watermark.

    Use outputMode('append'): a (window, event_type) row is emitted
    exactly once, after the watermark (max event time seen minus
    `watermark_delay`) passes the window end; rows older than the
    watermark whose window already closed are dropped on input. Output
    columns match the batch twin rel_events_hourly: hour (window start,
    'yyyy-MM-dd HH:mm:ss'), event_type, n_events, sum_value_c.
    """
    return (events
            .withWatermark(time_col, watermark_delay)
            .groupBy(F.window(F.col(time_col), window_duration).alias("win"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .alias("sum_value_c"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("hour"),
                    "event_type", "n_events", "sum_value_c"))


def session_event_stats(events: DataFrame,
                        gap: str = "30 minutes",
                        key_col: str = "user_id",
                        time_col: str = "ts") -> DataFrame:
    """Gap-based sessionization via F.session_window — the dynamic-size
    complement to the tumbling window above. Two events of one key fall
    in the same session iff the later one starts at or before the
    earlier one's ts + gap (the exact-gap tie MERGES — measured, and
    pinned by test_session_merge_and_exact_gap_tie); the emitted
    session end is last-event ts + gap (Spark's window.end for session
    windows). Output per (key, session): session_start / session_end
    ('yyyy-MM-dd HH:mm:ss'), n_events, sum_value_c (floor-cent
    quantization, the portable form).

    The same plan runs batch (groupBy session_window = one shuffle on
    the key, sessions assembled by Spark's session-merge aggregation)
    and streaming (add withWatermark upstream; append emits a session
    once the watermark passes its end). The DuckDB twin is the classic
    islands formulation — lag diff >= gap starts a new island — an
    independent implementation of the same semantics, which is exactly
    what makes it oracle-worthy.

    Scale: sessionization shuffles once on key_col; per-key state is
    bounded by the gap horizon in streaming. A mega-hot key serializes
    its session-merge like any per-key op — the asof_join bucket=
    pre-pass pattern (operators/temporal.py) is the escape hatch."""
    return (events
            .groupBy(F.session_window(F.col(time_col), gap).alias("win"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.floor(F.col("value") * 100).cast("long"))
                 .alias("sum_value_c"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("win.end", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    key_col, "n_events", "sum_value_c"))


def run_sessions(events_stream: DataFrame, output_path: str,
                 checkpoint_path: str, gap: str = "30 minutes",
                 watermark_delay: str = "1 minute",
                 key_col: str = "user_id", time_col: str = "ts"):
    """Run gap-based sessionization as one AvailableNow increment and
    block until it drains. This exercises Spark's streaming session
    state path (merging-sessions store) — a genuinely different
    execution route from the batch session_window aggregation: partial
    sessions live in the state store keyed by (key, session) and merge
    as new events extend them; append mode emits a session exactly once
    when the watermark passes its end (last event ts + gap), and input
    rows older than the watermark are dropped.

    Scale: state is bounded by (#active keys x sessions within the
    lateness horizon); a session only occupies state until the
    watermark closes it, so steady-state memory tracks the gap + delay
    horizon, not history."""
    out = session_event_stats(
        events_stream.withWatermark(time_col, watermark_delay),
        gap=gap, key_col=key_col, time_col=time_col)
    q = (out.writeStream
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def run_windowed(events_stream: DataFrame, output_path: str,
                 checkpoint_path: str, **kwargs):
    """Run the windowed aggregation as one AvailableNow increment and
    block until it drains. Append mode: only watermark-finalized windows
    reach the sink, so re-running after new files land emits exactly the
    newly closed windows."""
    out = windowed_event_counts(events_stream, **kwargs)
    q = (out.writeStream
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
