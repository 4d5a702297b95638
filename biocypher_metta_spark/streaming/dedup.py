"""Streaming deduplication with bounded state (dropDuplicatesWithinWatermark).

The batch dedup family (operators/dedup.py) keeps one row per key with a
groupBy; its streaming analog must bound state, because "all keys ever
seen" is unbounded at 10^12 events. Spark's dropDuplicatesWithinWatermark
keeps a key's state only while the watermark has not passed its event
time + delay: duplicates that arrive within the horizon are dropped
exactly once, and state older than the horizon is evicted. That is the
semantics a 100 TB ingest wants — at-least-once upstream (Kafka, file
landing zones, retried batch jobs) deduplicated to effectively-once
downstream, with state proportional to the dedup horizon, not history.

Scale notes: the operator is a stateful FILTER, not an aggregation — no
shuffle beyond the hash partitioning on the dedup key that routes each
key to one state-store partition; rows stream through append-mode with
no finalization wait. Horizon sizing is the one knob: state ~ (ingest
rate x delay), so a 24h horizon at 10^9 events/day holds ~10^9 keys
spread over the state-store partitions (RocksDB-backed in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           delay: str = "1 hour",
                           time_col: str = "ts") -> DataFrame:
    """First row per key wins; later copies arriving within `delay` of
    the watermark are dropped. Works on a streaming frame (bounded
    state) and degrades to plain dropDuplicates semantics in tests when
    every duplicate lands inside the horizon."""
    return (events
            .withWatermark(time_col, delay)
            .dropDuplicatesWithinWatermark(keys))


def run_dedup_stream(events_stream: DataFrame, keys: list[str],
                     output_path: str, checkpoint_path: str,
                     delay: str = "1 hour", **kwargs):
    """One AvailableNow increment of watermarked dedup, drained. Append
    mode emits surviving rows as they pass the state-store filter, so
    re-running after new files land processes exactly the new files and
    drops any of their rows whose key is still inside the horizon."""
    out = dedup_within_watermark(events_stream, keys, delay=delay,
                                 **kwargs)
    q = (out.writeStream
         .format("parquet")
         .option("path", output_path)
         .option("checkpointLocation", checkpoint_path)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
