"""Watermarked stream-stream interval join (Structured Streaming).

Completes the streaming surface next to incremental.py (stateless
extraction), windowed.py (event-time aggregation + sessionization),
stateful.py (applyInPandasWithState) and dedup.py (bounded-state
dedup): joining TWO live streams — the impression-click / order-payment
/ span-annotation shape — where each side must buffer unmatched rows in
the state store until the other side's matching row arrives or the
watermark proves it never will.

Semantics: inner join on an equality key PLUS a time-interval bound
(right event time in [left event time, left event time + horizon]).
Matches emit as soon as both rows have arrived (inner-join append mode
does not wait for the watermark); the watermark + interval bound are
what let Spark EVICT state — a left row is dropped from the buffer once
the watermark passes its event time + horizon (no future right row
could match), a right row once the watermark passes its event time.
Without the interval condition Spark must buffer both sides forever —
the unbounded-state trap this operator exists to avoid.

Scale notes: state is hash-partitioned on the join key across the
state-store partitions; size is bounded by (ingest rate x (horizon +
watermark delay)) per side, not history. The join itself shuffles both
streams on the key — a hot key (one mega-user) concentrates its state
in one partition, the same hot-key caveat as the as-of join, and the
same mitigation applies (salt the key upstream when a profile shows
it). Batch frames pass through the identical plan for twin-testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_time: str, right_time: str,
                  horizon: str = "2 minutes",
                  delay: str = "30 minutes",
                  how: str = "inner") -> DataFrame:
    """Join `right` rows onto `left` rows with the same `key` whose
    `right_time` falls in [left_time, left_time + horizon] (both ends
    inclusive).

    how='inner' emits matches only; how='left_outer' additionally
    emits a null-padded row for a left row once the watermark proves no
    match can arrive (streaming: the null row appears only AFTER the
    watermark passes left_time + horizon + delay, typically in a later
    micro-batch — the attribution "never clicked" shape; batch frames
    degrade to a plain left join). NB the GLOBAL watermark is the MIN
    across both input streams (multipleWatermarkPolicy=min), so null
    emission requires event time to advance on BOTH sides — a stalled
    right stream holds every unmatched left row in state, by design
    (measured in test_interval_join_left_outer_streaming_null_emission).
    Right/full outer are not offered: this operator drops the
    right-side key column, which a right-outer null-left row would
    need.

    Both inputs must carry event-time timestamp columns; all non-key
    column names must be disjoint across the two sides (rename before
    calling — the gate's impression/click naming is the template).
    `delay` is the shared watermark lateness allowance; it bounds the
    state buffers, it does not change which rows match."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}; "
            "rename before joining (state-store output would be ambiguous)")
    lw = left.withWatermark(left_time, delay)
    rw = right.withWatermark(right_time, delay)
    cond = ((lw[key] == rw[key])
            & (rw[right_time] >= lw[left_time])
            & (rw[right_time] <= lw[left_time]
               + F.expr(f"INTERVAL {horizon}")))
    return lw.join(rw, cond, how).drop(rw[key])


def run_interval_join_stream(left_stream: DataFrame,
                             right_stream: DataFrame, key: str,
                             left_time: str, right_time: str,
                             output_path: str, checkpoint_path: str,
                             horizon: str = "2 minutes",
                             delay: str = "30 minutes"):
    """One AvailableNow increment of the watermarked stream-stream
    join, drained. Unmatched rows inside the horizon persist in the
    checkpointed state store, so a later increment that delivers the
    other side's row still produces the match — the cross-restart
    retention the gate exercises."""
    out = interval_join(left_stream, right_stream, key, left_time,
                        right_time, horizon=horizon, delay=delay)
    q = (out.writeStream
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
