"""Incremental KG construction with Structured Streaming.

The reference is strictly batch (SURVEY §2.6: no streaming anywhere) and
not idempotent across re-runs. This module adds the optional incremental
path: new document files landing in the input directory are extracted
exactly once (checkpointed offsets), with `Trigger.AvailableNow` for
catch-up-then-stop semantics — the batch job and the stream share the
SAME extraction plan because every adapter stage here is stateless
(map/filter/broadcast-join), which Structured Streaming supports without
watermarks.

Stateful extensions (e.g. cross-batch exact dedup) use
`dropDuplicatesWithinWatermark` or applyInPandasWithState; exact-once
dedup across all history belongs to a periodic batch compaction instead
(cheaper than unbounded state at 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from biocypher_metta_spark.sources.documents import DOCUMENTS_SCHEMA


def read_documents_stream(spark: SparkSession, input_path: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(input_path)


def run_incremental(docs_stream: DataFrame, transform,
                    output_path: str, checkpoint_path: str,
                    available_now: bool = True):
    """transform: docs DataFrame -> output DataFrame (stateless plan).
    Returns the query after awaiting termination (AvailableNow mode)."""
    out = transform(docs_stream)
    writer = (out.writeStream
              .format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def doc_stat_triples(docs: DataFrame) -> DataFrame:
    """Stateless per-document stat triples — the parity transform the
    kg_streaming_parity gate streams: subj '(document <id>)', preds
    n_chars / n_tokens / fingerprint (min 5-gram portable hash, same
    recurrence as operators.text.fingerprint). Pure map/explode, so the
    IDENTICAL plan runs batch and streaming; null objs (docs with < 5
    tokens have no fingerprint) are dropped like node_prop_triples."""
    from pyspark.sql import functions as F

    from biocypher_metta_spark.operators.text import (
        portable_hash, shingles, tokens)

    fp = F.array_min(F.transform(shingles(F.col("text"), 5), portable_hash))
    subj = F.concat(F.lit("(document "), F.col("doc_id").cast("string"),
                    F.lit(")"))
    props = F.array(
        F.struct(F.lit("n_chars").alias("pred"),
                 F.length("text").cast("string").alias("obj")),
        F.struct(F.lit("n_tokens").alias("pred"),
                 F.size(tokens(F.col("text"))).cast("string").alias("obj")),
        F.struct(F.lit("fingerprint").alias("pred"),
                 fp.cast("string").alias("obj")))
    return (docs.select(subj.alias("subj"), F.explode(props).alias("p"))
            .select("subj", F.col("p.pred").alias("pred"),
                    F.col("p.obj").alias("obj"))
            .filter(F.col("obj").isNotNull()))
