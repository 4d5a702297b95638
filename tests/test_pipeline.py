"""End-to-end pipeline + streaming incremental tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from biocypher_metta_spark import pipeline
from biocypher_metta_spark.schema import load_default_registry
from biocypher_metta_spark.sources.documents import span_lines
from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf
from biocypher_metta_spark.sources.synth import spans_from_files, synth_gtf_documents
from biocypher_metta_spark.streaming.incremental import (
    read_documents_stream,
    run_incremental,
)

GTF = "/root/reference/samples/gencode_sample.gtf.gz"
REGISTRY = load_default_registry()

CONFIG = [
    {"adapter": "gencode_gene"},
    {"adapter": "gencode_transcript"},
    {"adapter": "gencode_exon"},
    {"adapter": "transcribed_to"},
    {"adapter": "transcribed_from"},
]


def test_pipeline_end_to_end(spark, tmp_path):
    docs = spans_from_files(spark, {"gtf": GTF})
    ctx = pipeline.PipelineContext(spark, docs, REGISTRY)
    result = pipeline.build(ctx, CONFIG)
    manifests = pipeline.materialize(result, str(tmp_path / "out"), REGISTRY)

    nodes = spark.read.parquet(str(tmp_path / "out/nodes"))
    edges = spark.read.parquet(str(tmp_path / "out/edges"))
    assert nodes.filter("label = 'gene'").count() == 52
    assert edges.count() > 0
    # node dedup happened: (label, id) unique
    assert nodes.count() == nodes.select("label", "id").distinct().count()
    # probe query 2 over the materialized table (partition-pruned scan)
    win = nodes.filter("label = 'gene' AND chr_part = 'chr20' "
                       "AND start > 9000000 AND end < 10000000")
    assert win.count() == 4
    # .metta shards exist and type_defs was compiled
    metta = spark.read.text(str(tmp_path / "out/metta"))
    assert metta.count() > nodes.count()
    tdefs = (tmp_path / "out/type_defs.metta").read_text()
    assert "(: gene (-> $x GENE))" in tdefs
    assert "(: transcribed_to (-> GENE TRANSCRIPT TRANSCRIBED_TO))" in tdefs
    assert manifests["nodes"]


def test_streaming_incremental(spark, tmp_path):
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    synth_gtf_documents(spark, 100).write.mode("append").parquet(inp)

    def transform(docs):
        gtf = parse_gtf(span_lines(docs, "gtf"), keys=GENE_KEYS)
        from biocypher_metta_spark.adapters import gencode

        typed, _ = gencode.gene_nodes(gtf)
        return typed.drop("synonyms")

    run_incremental(read_documents_stream(spark, inp), transform, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    # new batch of docs arrives -> only the delta is processed
    synth_gtf_documents(spark, 50).select(
        F.concat(F.lit("late-"), F.col("doc_id")).alias("doc_id"), "spans"
    ).write.mode("append").parquet(inp)
    run_incremental(read_documents_stream(spark, inp), transform, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 == 150


def test_reference_config_translation():
    """The reference's own adapters_config_sample.yaml translates fully
    into this engine's registry (config-compat for switching users)."""
    cfg = pipeline.translate_reference_config(
        "/root/reference/config/adapters_config_sample.yaml")
    assert len(cfg) == 46
    names = {c["adapter"] for c in cfg}
    assert names <= set(pipeline.PIPELINE_REGISTRY)
    topld = [c for c in cfg if c["adapter"] == "topld"][0]
    assert topld["args"]["chr"] == "chr16" and topld["args"]["ancestry"] == "EUR"


def test_streaming_stateful_dedup(spark, tmp_path):
    """Stateful streaming: dropDuplicatesWithinWatermark removes
    cross-microbatch duplicate doc_ids arriving within the watermark
    (the streaming arm of the exact-dedup operator)."""
    inp = str(tmp_path / "dup_in")
    out = str(tmp_path / "dup_out")
    ckpt = str(tmp_path / "dup_ckpt")

    base = synth_gtf_documents(spark, 40).withColumn(
        "event_time", F.timestamp_seconds(F.lit(1_700_000_000)))
    dup = base.limit(15)  # duplicates of the first 15 docs
    base.unionByName(dup).write.mode("append").parquet(inp)

    from biocypher_metta_spark.sources.documents import DOCUMENTS_SCHEMA
    from pyspark.sql.types import StructType, StructField, TimestampType

    schema = StructType(list(DOCUMENTS_SCHEMA.fields)
                        + [StructField("event_time", TimestampType())])
    stream = spark.readStream.schema(schema).parquet(inp)

    def transform(docs):
        return (docs.withWatermark("event_time", "1 hour")
                .dropDuplicatesWithinWatermark(["doc_id"])
                .select("doc_id"))

    run_incremental(stream, transform, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert got.select("doc_id").distinct().count() == 40


def test_streaming_stateful_entity_counts(spark, tmp_path):
    """applyInPandasWithState custom operator: per-entity totals must
    accumulate ACROSS micro-batches through the state store (two input
    files x maxFilesPerTrigger=1 = two micro-batches)."""
    from biocypher_metta_spark.streaming import stateful

    inp = str(tmp_path / "linked_in")
    rows1 = [("d1", "spark", "TOOL:spark", 1.0),
             ("d2", "spark", "TOOL:spark", 0.8),
             ("d2", "join", "OP:join", 1.0)]
    rows2 = [("d3", "spark", "TOOL:spark", 1.0),
             ("d4", "table", "OBJ:table", 0.6)]
    schema = "doc_id string, mention string, entity string, score double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(inp))
    out = stateful.running_entity_counts(stream)
    q = (out.writeStream.format("memory").queryName("ent_totals")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # the LAST update per entity carries the cross-batch running total
    import pyspark.sql.functions as SF
    rows = (spark.table("ent_totals")
            .groupBy("entity").agg(SF.max("n_mentions").alias("n"),
                                   SF.max("score_sum").alias("s"))
            .collect())
    got = {r.entity: (r.n, round(r.s, 3)) for r in rows}
    assert got["TOOL:spark"] == (3, 2.8)
    assert got["OP:join"] == (1, 1.0)
    assert got["OBJ:table"] == (1, 0.6)


def test_materialize_empty_result(spark, tmp_path):
    """A window matching nothing must materialize cleanly with empty
    manifests, not crash on schema inference over a _SUCCESS-only dir."""
    from biocypher_metta_spark import pipeline
    from biocypher_metta_spark.schema import load_default_registry
    from biocypher_metta_spark.sources.synth import synth_gtf_documents

    docs = synth_gtf_documents(spark, 50)
    ctx = pipeline.PipelineContext(spark, docs)
    res = pipeline.build(ctx, [{"adapter": "gencode_gene",
                                "args": {"chr": "chrNOPE"}}])
    m = pipeline.materialize(res, str(tmp_path / "kg"), load_default_registry())
    assert m["nodes"] == []
