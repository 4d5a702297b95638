"""Scaling-efficiency evidence (north rule: throughput scaling >= 0.8
from N to 4N executors; sandbox proxy = local[8] vs local[32] on the
SAME input — see BASELINE.md).

Runs the KG-construction job in fresh subprocesses (one JVM per
parallelism level), measures steady-state throughput (warmup pass first,
then the timed pass inside one JVM), writes BENCH.md.

Usage: python bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from biocypher_metta_spark import get_spark
from biocypher_metta_spark.adapters import gencode
from biocypher_metta_spark.schema import load_default_registry
from biocypher_metta_spark.sources.documents import span_lines
from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf
from biocypher_metta_spark.sources.synth import synth_gtf_documents

n_docs = {n_docs}
spark = get_spark("bcm-scaling")
spark.sparkContext.setLogLevel("ERROR")
reg = load_default_registry()

def run_once(n):
    docs = synth_gtf_documents(spark, n)
    gtf = parse_gtf(span_lines(docs, "gtf"), keys=GENE_KEYS)
    _, a1 = gencode.gene_nodes(gtf)
    _, a2 = gencode.transcript_nodes(gtf)
    _, a3 = gencode.transcribed_edges(gtf, reg, "to")
    return a1.unionByName(a2).unionByName(a3).count()

run_once(max(n_docs // 20, 1000))  # JVM/codegen warmup, excluded
t0 = time.time()
n_atoms = run_once(n_docs)
dt = time.time() - t0
print(json.dumps(dict(n_atoms=n_atoms, seconds=dt,
                      triples_per_sec=n_atoms / dt)))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SHUFFLE=str(max(cpus, 8)))
    code = CHILD.format(repo=str(REPO), n_docs=n_docs)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    r8 = run_level(8, n_docs)
    r32 = run_level(32, n_docs)
    eff = (r32["triples_per_sec"] / r8["triples_per_sec"]) / 4
    result = {
        "n_docs": n_docs,
        "n_atoms": r32["n_atoms"],
        "local8": {k: round(v, 2) for k, v in r8.items()},
        "local32": {k: round(v, 2) for k, v in r32.items()},
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH — measured numbers (this engine)

## KG construction throughput + N->4N scaling (north rule)

Job: interleaved documents spans -> GTF parse -> gene/transcript nodes +
transcribed_to edges -> MeTTa atoms (count materialization). Same input
at two parallelism levels, one fresh JVM each, warmup pass excluded.
Sandbox proxy for cluster sizes per BASELINE.md: local[8] = N,
local[32] = 4N.

| parallelism | docs | atoms | seconds | triples/sec |
|---|---|---|---|---|
| local[8] (N) | {n_docs:,} | {r8['n_atoms']:,} | {r8['seconds']:.2f} | {r8['triples_per_sec']:,.0f} |
| local[32] (4N) | {n_docs:,} | {r32['n_atoms']:,} | {r32['seconds']:.2f} | {r32['triples_per_sec']:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Caveat: local[8] vs local[32] shares one machine's memory bandwidth and
JVM; on a real cluster the 4N level adds memory bandwidth and I/O
parallelism that this proxy cannot, so the proxy UNDERSTATES true
multi-node scaling for this shuffle-light, map-dominated job.

Reproduce: `python bench_scaling.py {n_docs}`; per-round operator
timings: `python bench.py` (BENCH_r{{N}}.json).
"""
    (REPO / "BENCH.md").write_text(md)


if __name__ == "__main__":
    main()
