"""Head-to-head single-node throughput: the REFERENCE adapter+writer
(pure Python generators, one thread — its only execution mode) vs this
engine, on the SAME synthetic GTF corpus.

Writes the comparison into BENCH.md (appended section).

Usage: python tools/reference_throughput.py [n_genes]
"""

from __future__ import annotations

import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def synth_gtf_file(path: str, n: int) -> None:
    """Same arithmetic corpus as sources/synth.py, as a .gtf.gz file."""
    types = ["protein_coding", "lncRNA", "miRNA"]
    with gzip.open(path, "wt") as f:
        for i in range(n):
            chrom = f"chr{1 + i % 22}"
            start = 1 + (i * 9973) % 100000000
            end = start + 100 + (i % 5000)
            num = str(i % 100000).zfill(11)
            ver = 1 + i % 9
            f.write(
                f"{chrom}\tHAVANA\tgene\t{start}\t{end}\t.\t+\t.\t"
                f'gene_id "ENSG{num}.{ver}"; gene_type "{types[i % 3]}"; '
                f'gene_name "G{num}";\n'
            )


def run_reference(gtf_path: str, n: int) -> dict:
    """Reference GencodeGeneAdapter.get_nodes + MeTTaWriter.write_node,
    exactly its execution model: one thread, generator -> writer loop."""
    from reference_shim import load_ref
    from golden import make_ref_writer

    mod = load_ref("biocypher_metta.adapters.gencode_gene_adapter")
    # empty alias file (alias join adds dict lookups either way)
    alias = tempfile.NamedTemporaryFile(suffix=".gz", delete=False)
    with gzip.open(alias.name, "wt") as f:
        f.write("header\n")
    ad = mod.GencodeGeneAdapter(write_properties=True, add_provenance=True,
                                filepath=gtf_path,
                                gene_alias_file_path=alias.name)
    w = make_ref_writer()
    t0 = time.time()
    n_atoms = 0
    for node in ad.get_nodes():
        n_atoms += len(w.write_node(node))
    dt = time.time() - t0
    return dict(n_atoms=n_atoms, seconds=dt, atoms_per_sec=n_atoms / dt)


ENGINE_CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from biocypher_metta_spark.session import get_spark
from biocypher_metta_spark.adapters import gencode
from biocypher_metta_spark.sources.documents import span_lines
from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf
from biocypher_metta_spark.sources.synth import synth_gtf_documents
spark = get_spark("ref-compare")
spark.sparkContext.setLogLevel("ERROR")
n = {n}
# materialize the spans table once (the reference likewise reads a
# pre-built file); timed region = read -> parse -> extract -> render
path = tempfile.mkdtemp(prefix="refcmp_") + "/docs"
synth_gtf_documents(spark, n).write.mode("overwrite").parquet(path)
docs = spark.read.parquet(path)
def once():
    # production pattern (pipeline.PipelineContext.gtf): the parsed frame
    # is cached so the render stage reads computed columns instead of
    # re-inlining the parse expressions into every atom column
    gtf = parse_gtf(span_lines(docs, "gtf"), keys=GENE_KEYS).cache()
    try:
        _, atoms = gencode.gene_nodes(gtf)
        return atoms.count()
    finally:
        gtf.unpersist()
once()
t0 = time.time(); n_atoms = once(); dt = time.time() - t0
print(json.dumps(dict(n_atoms=n_atoms, seconds=dt, atoms_per_sec=n_atoms/dt)))
"""


def run_engine(n: int, cpus: str) -> dict:
    """Fresh subprocess per parallelism level (getOrCreate would silently
    reuse the first session's master)."""
    import os
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_SHUFFLE=str(max(int(cpus), 8)))
    code = ENGINE_CHILD.format(repo=str(REPO), n=n)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tmp = tempfile.mkdtemp(prefix="refbench_")
    gtf_path = f"{tmp}/synth.gtf.gz"
    synth_gtf_file(gtf_path, n)
    ref = run_reference(gtf_path, n)
    eng1 = run_engine(n, "1")
    eng32 = run_engine(n, "32")
    result = dict(
        n_genes=n,
        reference_single_thread={k: round(v, 2) for k, v in ref.items()},
        engine_local1={k: round(v, 2) for k, v in eng1.items()},
        engine_local32={k: round(v, 2) for k, v in eng32.items()},
        speedup_single_core=round(eng1["atoms_per_sec"] / ref["atoms_per_sec"], 2),
        speedup_32_core=round(eng32["atoms_per_sec"] / ref["atoms_per_sec"], 2),
    )
    print(json.dumps(result))

    md = f"""

## Head-to-head vs the reference (same corpus, gene nodes + atoms)

The reference runs one Python thread (its only mode: generator -> writer
loop, create_knowledge_graph.py:49-72). Same {n:,}-gene synthetic GTF:

| system | atoms | seconds | atoms/sec |
|---|---|---|---|
| reference (1 thread, Python) | {ref['n_atoms']:,} | {ref['seconds']:.1f} | {ref['atoms_per_sec']:,.0f} |
| this engine, local[1] | {eng1['n_atoms']:,} | {eng1['seconds']:.1f} | {eng1['atoms_per_sec']:,.0f} |
| this engine, local[32] | {eng32['n_atoms']:,} | {eng32['seconds']:.1f} | {eng32['atoms_per_sec']:,.0f} |

Single-core speedup: **{result['speedup_single_core']}x**; at local[32]:
**{result['speedup_32_core']}x** (and the reference cannot use more cores).
Both sides read pre-built input (parquet span table vs gzip file) and
run read -> parse -> extract -> render to completion. The engine's span
table also carries a transcript line + media span per doc that the scan
reads past. Reproduce: `python tools/reference_throughput.py {n}`.
"""
    with open(REPO / "BENCH.md", "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
