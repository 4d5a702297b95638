"""10x scale rehearsal for the round-5g operators: HITS, z-order
layout, RRF fusion, MMR re-ranking.

Same contract as rehearsal_r5b/c/e/f: each op runs at N and 10N in
one JVM (warmup excluded); the claimed shapes are

* hits — per round two edge equi-joins + two groupBys, so ~linear in
  edges (the normalization pull is one row/round regardless of N);
* zorder_layout — one range exchange + in-partition sort, ~linear
  (sort is n log n but IO-dominated at these sizes);
* rrf_fuse — bounded by construction (legs are top-R LISTS); the
  honest scale axis is R, so the legs grow 20k -> 200k rows and time
  must stay ~linear in legs*R, never corpus-shaped;
* mmr_rerank — bounded by construction (candidate list); scale axis
  is the list length R at fixed k, k*R int64 dots in one Arrow batch,
  so ~linear in R (driver never sees the list, one task computes it —
  that is the documented semantics, not a scaling defect).

Prints ONE JSON line per op and writes tools/rehearsal_r5g.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402

_DIM = 16


def _vecs(spark, n: int):
    # rehearsal_r5f's deterministic embeddings: varied per id and per
    # coord (no stride collapse), range [-1, 1]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {_DIM - 1}), "
            f"j -> CAST(((id * 31 + j * j * 17) % 201 - 100) "
            f"AS DOUBLE) / 100.0)").alias("embedding"))


def run_hits(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import hits

    # hub-heavy directed graph: n edges over ~n/20 nodes, skewed the
    # way link graphs are (low ids collect most in-links)
    edges = spark.range(n).select(
        (F.col("id") % (n // 20 + 7)).alias("src"),
        ((F.col("id") * F.col("id") + 3) % (n // 40 + 11)).alias("dst"))
    t0 = time.time()
    rows = hits(edges, iterations=3).count()
    return {"edges": n, "rows": rows, "sec": round(time.time() - t0, 2)}


def run_zorder(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.zorder import zorder_layout

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 4096).alias("x"),
        ((F.col("id") * 7 + 13) % 4096).alias("y"))
    t0 = time.time()
    rows = zorder_layout(df, ["x", "y"], bits=12).count()
    return {"rows_in": n, "rows": rows, "sec": round(time.time() - t0, 2)}


def run_rrf(spark, r: int) -> dict:
    from biocypher_metta_spark.operators.retrieval import rrf_fuse

    # two synthetic top-R legs over a shared id space with different
    # orders — the fuse's own cost axis (corpus cost lives upstream)
    leg1 = spark.range(r).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 31 + 7) % (4 * r)).alias("score"))
    leg2 = spark.range(r).select(
        ((F.col("id") * 3 + 1) % (2 * r)).alias("doc_id"),
        ((F.col("id") * 17 + 5) % (4 * r)).alias("score"))
    t0 = time.time()
    rows = rrf_fuse([(leg1, "doc_id", "score", True),
                     (leg2, "doc_id", "score", True)],
                    topk=100, max_candidates=10 * r).count()
    return {"leg_rows": r, "rows": rows, "sec": round(time.time() - t0, 2)}


def run_mmr(spark, r: int) -> dict:
    from biocypher_metta_spark.operators.mmr import mmr_rerank

    cands = _vecs(spark, r)
    query = [((i * 37) % 19 - 9) / 10.0 for i in range(_DIM)]
    t0 = time.time()
    rows = mmr_rerank(cands, query, k=15, dim=_DIM,
                      max_candidates=r).count()
    return {"candidates": r, "rows": rows,
            "sec": round(time.time() - t0, 2)}


def run_scc(spark, n: int) -> dict:
    from biocypher_metta_spark.canonicalize import strongly_connected

    # the kg_scc gate shape scaled: n/6 six-node cycles + n/2 tails;
    # closure stays linear (6 ancestors per cycle node, 7 per tail)
    blocks = (n // 6) * 6
    c = F.col("id") % blocks
    cyc = spark.range(n).select(
        c.alias("src"), ((c - c % 6) + (c % 6 + 1) % 6).alias("dst"))
    t = F.col("id") % (n // 2) + blocks
    tail = spark.range(n).select(t.alias("src"), (t - blocks).alias("dst"))
    t0 = time.time()
    rows = strongly_connected(cyc.unionByName(tail)).count()
    return {"edge_rows": 2 * n, "rows": rows,
            "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5g")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {"scc": (run_scc, 600_000),
           "hits": (run_hits, 2_000_000),
           "zorder": (run_zorder, 2_000_000),
           "rrf": (run_rrf, 20_000),
           "mmr": (run_mmr, 10_000)}
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5g.json"
    prev = json.loads(art.read_text()) if art.exists() else {}
    runs = prev.get("runs", {})
    ratios = prev.get("ratios", {})
    for name, (fn, n) in ops.items():
        if only and name not in only:
            continue
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    out = {"runs": runs, "ratios": ratios}
    art.write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
