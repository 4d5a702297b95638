"""Sinks: MeTTa text shards, Prolog facts, Neo4j-style CSV, and the
queryable triple table.

Reference: metta_writer.py:91-126 (append-mode text files),
prolog_writer.py:47-120 (alternate rendering — proves the sink is
pluggable), biocypher_config.yaml:8-12 (neo4j CSV with tab delimiter and
skip_duplicate_nodes).

Spark-first: atoms are rendered upstream as columns; sinks only decide
layout. `.metta` shard content is made deterministic with
sortWithinPartitions before write (SURVEY §3.4: the reference's output
order is incidental; ours is reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.schema import SchemaRegistry
from biocypher_metta_spark.serializer import escape_str


def write_metta_text(atoms: DataFrame, path: str, atom_col: str = "atom",
                     mode: str = "overwrite") -> None:
    """Deterministic .metta shards: sorted within partitions, one atom
    per line. Repartition count inherits from upstream — callers set it
    via repartition(chr/label) for pruning-friendly layout."""
    (atoms.select(F.col(atom_col).alias("value"))
     .sortWithinPartitions("value")
     .write.mode(mode).text(path))


def write_triple_table(nodes: DataFrame | None, edges: DataFrame | None,
                       path: str, mode: str = "overwrite") -> None:
    """Unified queryable triple table, partitioned by kind+label —
    partition pruning serves both probe patterns (subject-centric fetch
    and label+range scans, scripts/metta_space_import.py:73-92)."""
    spark_conf_key = "spark.sql.sources.partitionOverwriteMode"
    parts = []
    if nodes is not None:
        parts.append(nodes.select(
            F.lit("node").alias("kind"), F.col("label"),
            F.col("id").alias("subj"), F.lit(None).cast("string").alias("obj")))
    if edges is not None:
        parts.append(edges.select(
            F.lit("edge").alias("kind"), F.col("label"),
            F.col("src").alias("subj"), F.col("tgt").alias("obj")))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.sparkSession.conf.set(spark_conf_key, "dynamic")
    df.write.mode(mode).partitionBy("kind", "label").parquet(path)


# ---------------------------------------------------------------------------
# Prolog rendering (prolog_writer.py:82-131): node fact 'label(id).' with
# lowercased label+id; edge fact 'label(src_t(src), tgt_t(tgt)).'; scalar
# property fact 'k(def_out, v).' with the same space/paren escaping as
# MeTTa. (The reference's own edge path crashes on a missing
# 'output_label' key, prolog_writer.py:98 — we implement the evident
# intent: output_label rewriting as in the MeTTa writer.)
# ---------------------------------------------------------------------------


def prolog_node_facts(nodes: DataFrame, prop_cols: list[str] | None = None) -> DataFrame:
    def_out = F.concat(F.lower(F.col("label")), F.lit("("),
                       F.lower(F.col("id")), F.lit(")"))
    facts = [F.concat(def_out, F.lit("."))]
    for c in (prop_cols or []):
        v = escape_str(F.col(c).cast("string"))
        facts.append(F.when(v.isNull() | (v == ""), F.lit(None)).otherwise(
            F.concat(F.lit(f"{c}("), def_out, F.lit(", "), v, F.lit(")."))))
    return nodes.select(F.explode(F.array_compact(F.array(*facts))).alias("fact"))


def prolog_edge_facts(edges: DataFrame, registry: SchemaRegistry,
                      label: str) -> DataFrame:
    final, src_t, tgt_t = registry.edge_out(label.lower())
    def_out = F.concat(F.lit(f"{final}({src_t}("), F.lower(F.col("src")),
                       F.lit(f"), {tgt_t}("), F.lower(F.col("tgt")), F.lit("))"))
    return edges.select(F.concat(def_out, F.lit(".")).alias("fact"))


# ---------------------------------------------------------------------------
# Neo4j-style CSV export (K7): tab-delimited, array_delimiter '|',
# skip_duplicate_nodes via dropDuplicates
# ---------------------------------------------------------------------------


def neo4j_rows(nodes: DataFrame,
               array_cols: list[str] | None = None) -> DataFrame:
    """The transformation write_neo4j_csv applies before writing:
    skip_duplicate_nodes semantics (dropDuplicates on label+id) and
    '|'-joined array columns. Exposed so the driver gate can value-check
    the dedup-on-write path without a filesystem round-trip."""
    df = nodes.dropDuplicates(["label", "id"])
    for c in (array_cols or []):
        if c in df.columns:
            df = df.withColumn(c, F.array_join(F.col(c), "|"))
    return df


def write_neo4j_csv(nodes: DataFrame, path: str,
                    array_cols: list[str] | None = None,
                    mode: str = "overwrite") -> None:
    df = neo4j_rows(nodes, array_cols)
    df.write.mode(mode).option("sep", "\t").option("header", True).csv(path)
