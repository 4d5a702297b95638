"""Config-driven KG construction pipeline — the Spark twin of
create_knowledge_graph.py:15-72.

The reference reflects adapter classes out of a YAML config and pulls
their generators through the writer one at a time, re-reading shared
files per entry (e.g. the GENCODE GTF 3-5x). Here each config entry
contributes a DataFrame fragment to ONE logical plan:

    documents spans ──┬─ span_lines(kind) ─ parse ─ extract ─┐
    dimensions ───────┴────── broadcast joins ───────────────┤
                                                   union ────┴─ canonicalize
                                                         ├─ triple table (partitioned, manifest)
                                                         └─ .metta shards + type_defs

Shared scans are cached once; Catalyst dedups the rest. Outputs are
written with dynamic partition overwrite + lineage manifests (resume).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biocypher_metta_spark import lineage, sinks
from biocypher_metta_spark.canonicalize import dedup_nodes
from biocypher_metta_spark.schema import SchemaRegistry, load_default_registry
from biocypher_metta_spark.sources.documents import span_lines
from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf


@dataclass
class PipelineContext:
    spark: SparkSession
    docs: DataFrame
    registry: SchemaRegistry = field(default_factory=load_default_registry)
    dims: dict[str, DataFrame] = field(default_factory=dict)
    _cache: dict = field(default_factory=dict)

    def gtf(self, kind: str = "gtf", keys=None) -> DataFrame:
        """Parsed GTF lines for a span kind — cached so gene/transcript/
        exon/edge outputs share ONE scan (the reference re-reads the file
        per config entry; SURVEY §4)."""
        k = (kind, tuple(keys or GENE_KEYS))
        if k not in self._cache:
            df = parse_gtf(span_lines(self.docs, kind), keys=list(k[1])).cache()
            self._cache[k] = df
        return self._cache[k]

    def lines(self, kind: str) -> DataFrame:
        return span_lines(self.docs, kind)


# entry name -> callable(ctx, **args) -> (typed_df, atoms_df, is_edge)


def _gencode_gene(ctx: PipelineContext, **args):
    from biocypher_metta_spark.adapters import gencode

    typed, atoms = gencode.gene_nodes(
        ctx.gtf(), alias_df=ctx.dims.get("gene_alias"), **args)
    return typed, atoms, False


def _gencode_transcript(ctx: PipelineContext, **args):
    from biocypher_metta_spark.adapters import gencode

    typed, atoms = gencode.transcript_nodes(ctx.gtf(), **args)
    return typed, atoms, False


def _gencode_exon(ctx: PipelineContext, **args):
    from biocypher_metta_spark.adapters import gencode
    from biocypher_metta_spark.sources.gtf import EXON_KEYS

    typed, atoms = gencode.exon_nodes(
        ctx.gtf(keys=GENE_KEYS + ["exon_number", "exon_id"]), **args)
    return typed, atoms, False


def _transcribed(direction):
    def run(ctx: PipelineContext, **args):
        from biocypher_metta_spark.adapters import gencode

        typed, atoms = gencode.transcribed_edges(
            ctx.gtf(), ctx.registry, direction, **args)
        return typed, atoms, True

    return run


def _dbsnp(ctx: PipelineContext, **args):
    from biocypher_metta_spark.adapters import variants

    typed, atoms = variants.dbsnp_nodes(ctx.lines("vcf"), **args)
    return typed, atoms, False


PIPELINE_REGISTRY = {
    "gencode_gene": _gencode_gene,
    "gencode_transcript": _gencode_transcript,
    "gencode_exon": _gencode_exon,
    "transcribed_to": _transcribed("to"),
    "transcribed_from": _transcribed("from"),
    "dbsnp": _dbsnp,
}


@dataclass
class PipelineResult:
    nodes: DataFrame | None
    edges: DataFrame | None
    atoms: DataFrame


def build(ctx: PipelineContext, config: list[dict]) -> PipelineResult:
    """config entries: {adapter: <registry name>, args: {...}} — ordered
    like adapters_config.yaml; order only affects nothing (set-semantics
    outputs), unlike the reference's append files."""
    node_parts: list[DataFrame] = []
    edge_parts: list[DataFrame] = []
    atom_parts: list[DataFrame] = []
    for entry in config:
        fn = PIPELINE_REGISTRY[entry["adapter"]]
        typed, atoms, is_edge = fn(ctx, **entry.get("args", {}))
        atom_parts.append(atoms)
        if is_edge:
            edge_parts.append(typed.select("src", "tgt", "label"))
        else:
            cols = ["id", "label"]
            opt = [c for c in ("chr", "start", "end") if c in typed.columns]
            node_parts.append(typed.select(*cols, *opt))
    nodes = None
    if node_parts:
        nodes = node_parts[0]
        for p in node_parts[1:]:
            nodes = nodes.unionByName(p, allowMissingColumns=True)
        nodes = dedup_nodes(nodes)
    edges = None
    if edge_parts:
        edges = edge_parts[0]
        for p in edge_parts[1:]:
            edges = edges.unionByName(p, allowMissingColumns=True)
    atoms = atom_parts[0]
    for p in atom_parts[1:]:
        atoms = atoms.unionByName(p)
    return PipelineResult(nodes, edges, atoms)


def materialize(result: PipelineResult, out_dir: str, registry: SchemaRegistry,
                run_id: str = "run") -> dict:
    """Write all outputs + lineage manifests; returns the manifest dict."""
    out = Path(out_dir)
    manifests = {}
    if result.nodes is not None:
        ndf = result.nodes.withColumn(
            "chr_part", F.coalesce(F.col("chr"), F.lit("none"))) \
            if "chr" in result.nodes.columns else \
            result.nodes.withColumn("chr_part", F.lit("none"))
        lineage.write_partitioned(ndf, str(out / "nodes"), ["label", "chr_part"])
        manifests["nodes"] = lineage.partition_manifest(ndf, ["label", "chr_part"])
    if result.edges is not None:
        lineage.write_partitioned(result.edges.withColumn("label_part", F.col("label")),
                                  str(out / "edges"), ["label_part"])
        manifests["edges"] = lineage.partition_manifest(
            result.edges.withColumn("label_part", F.col("label")), ["label_part"])
    sinks.write_metta_text(result.atoms, str(out / "metta"))
    (out / "type_defs.metta").parent.mkdir(parents=True, exist_ok=True)
    (out / "type_defs.metta").write_text(registry.type_defs_text())
    for name, rows in manifests.items():
        lineage.write_manifest(rows, str(out / f"_lineage/{name}.json"), run_id)
    return manifests
