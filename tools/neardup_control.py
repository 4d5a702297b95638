"""Near-dup realistic-dimension control for the round-3 scale rehearsal.

The core rehearsal's 8-dim md5-derived embeddings SATURATE the cosine
space: 34.3M true >=0.95 pairs at 2M rows, 1.99B at 20M — so the verify
stage's wall-clock ratio (24x for 10x rows) measures output volume, not
candidate generation. At dim=16 a random >=0.95-cosine pair is
vanishingly rare, output collapses to ~the planted duplicates
(id % 1000 == 1 copies its predecessor), and the 2M->20M ratio isolates
the sketch + bucket-join path the operator actually ships.

Prints ONE JSON line mirroring scale_rehearsal's shape.
Env: SPARK_REHEARSAL_NS (default "2000000,20000000"), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from biocypher_metta_spark.session import get_spark  # noqa: E402


def run_at(spark, n: int, dim: int = 16) -> dict:
    from biocypher_metta_spark.operators import dedup as dd
    from tools.scale_rehearsal import synth_embeddings

    n_planes = 16 if n <= 2_000_000 else 24
    emb = synth_embeddings(spark, n, dim=dim)
    t0 = time.time()
    pairs = dd.embedding_near_dup_pairs(
        emb, dim=dim, threshold_millis=950, n_planes=n_planes,
        quant_scale=100).count()
    return {"n_docs": n, "dim": dim, "near_dup_planes": n_planes,
            "emb_near_dup_pairs": pairs,
            "emb_near_dup_sec": round(time.time() - t0, 2)}


def main() -> None:
    ns = [int(x) for x in os.environ.get(
        "SPARK_REHEARSAL_NS", "2000000,20000000").split(",")]
    spark = get_spark("bcm-neardup-control")
    spark.sparkContext.setLogLevel("ERROR")
    run_at(spark, 50_000)  # warmup, not reported
    runs = {str(n): run_at(spark, n) for n in ns}
    ratios = {}
    if len(ns) == 2:
        a, b = runs[str(ns[0])], runs[str(ns[1])]
        ratios["emb_near_dup_sec"] = round(
            b["emb_near_dup_sec"] / max(a["emb_near_dup_sec"], 1e-9), 2)
    print(json.dumps({"runs": runs, "ratios": ratios,
                      "scale_factor": ns[-1] / ns[0] if len(ns) > 1 else 1}))


if __name__ == "__main__":
    main()
