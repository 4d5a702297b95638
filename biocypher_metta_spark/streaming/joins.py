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
                  delay: str = "30 minutes") -> DataFrame:
    """Inner-join `right` rows onto `left` rows with the same `key`
    whose `right_time` falls in [left_time, left_time + horizon]
    (both ends inclusive).

    Both inputs must carry event-time timestamp columns; all non-key
    column names must be disjoint across the two sides (rename before
    calling — the gate's impression/click naming is the template).
    `delay` is the shared watermark lateness allowance; it bounds the
    state buffers, it does not change which rows match."""
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
    return lw.join(rw, cond, "inner").drop(rw[key])


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
