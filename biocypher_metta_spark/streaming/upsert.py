"""Streaming CDC upsert: a changelog stream maintains a keyed state
table via foreachBatch merge — the lakehouse MERGE INTO pattern
(Delta/Iceberg upsert) expressed on parquet with versioned snapshot
dirs, the streaming complement of operators/cdc.changelog_compact
(which IS the per-merge kernel, so batch and streaming cannot drift).

Per micro-batch: current state rows re-enter as changelog entries
alongside the batch's changes, and changelog_compact picks the latest
version per key with tombstones dropping keys. The state snapshot is
written to `state_dir/v=<batch_id>` — a DETERMINISTIC function of the
processed prefix, so a failed-and-retried batch rewrites the same
content into the same version dir (idempotent resume, the same story
as lineage.write_partitioned).

Ordering contract (inherited from changelog_compact and standard for
CDC feeds): the order_cols tuple is unique per key and monotone
ACROSS batches for any one key — a version that arrives after its
key's tombstone resurrects the key, exactly like batch compaction of
the concatenated log. A gate proves the equivalence: two streamed
increments end in the same state as ONE batch compact over the full
log (the DuckDB window twin).

Scale shape: each merge is changelog_compact's single key shuffle
with max_by partial aggregation over state+batch; state is read once
per merge. On a real lakehouse the snapshot write is an Iceberg/Delta
MERGE with file-level pruning — the versioned-dir stand-in keeps the
semantics (and the resume story) identical in this sandbox, same as
lineage.py's partition-overwrite stand-in.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def latest_state_version(state_dir: str) -> int | None:
    """Highest committed snapshot version under state_dir, or None."""
    root = Path(state_dir)
    if not root.exists():
        return None
    versions = [int(m.group(1)) for p in root.iterdir()
                if (m := re.fullmatch(r"v=(\d+)", p.name))]
    return max(versions, default=None)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    v = latest_state_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(f"{state_dir}/v={v}")


def run_upsert_stream(changes: DataFrame, key_cols: list,
                      order_cols: list, state_dir: str,
                      checkpoint_dir: str, op_col: str | None = None,
                      delete_op: str = "delete") -> None:
    """Drain `changes` (a streaming DataFrame) with availableNow,
    merging each micro-batch into the keyed state snapshot."""
    from biocypher_metta_spark.operators.cdc import changelog_compact

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = read_state(spark, state_dir)
        log = batch_df if cur is None else cur.unionByName(batch_df)
        new = changelog_compact(log, key_cols, order_cols,
                                op_col=op_col, delete_op=delete_op)
        new.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")

    q = (changes.writeStream
         .foreachBatch(merge)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
