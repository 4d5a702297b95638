"""MMR diverse re-ranking — the selection step after retrieval.

Maximal Marginal Relevance [Carbonell & Goldstein, SIGIR'98]: from a
candidate list, greedily pick the item maximizing

    lambda * rel(d)  -  (1000 - lambda) * max_{s in selected} sim(d, s)

(lambda in permille) — relevance traded against redundancy with what
is already chosen.  This is the diversity knob a training-data
pipeline needs on top of pure similarity search (a near-dup-heavy
corpus returns k copies of one document from plain top-k; MMR returns
one copy plus k-1 genuinely different neighbors), and the natural
third stage of the retrieval ladder here: bm25/dot/pq top-R ->
rrf_fuse -> mmr_rerank.

Cross-engine exactness: rel and sim are BOTH exact integer dot
products of quant_scale-quantized vectors (commensurate by
construction — classic MMR's [0,1]-normalized scores need float
cosines), ties break to the lower id at every step, so the greedy
trajectory is fully deterministic and an unrolled-CTE DuckDB twin
(mmr_rerank_sql) reproduces the exact selection order.

Scale shape: MMR is inherently SEQUENTIAL (step i depends on the
selected set of step i-1) over a candidate LIST that is bounded by
retrieval semantics (the top-R of an upstream leg, like rrf_fuse's
inputs — enforced by the same max_candidates guard).  The greedy runs
as ONE vectorized Arrow batch (applyInPandas over the single bounded
group, int64 numpy throughout — the sanctioned Python seam for
genuinely iterative logic built-ins cannot express); everything
upstream (scoring, top-R cut) stays distributed in the caller.  k * R
dot products at R <= 10^5 is millions of int64 multiply-adds — numpy
territory, not a shuffle problem.

Overflow bound: |dot| <= dim * (quant_scale * max|v|)^2 and the
objective multiplies by <= 1000 — at the defaults (dim 16, scale 100,
|v| <= 1) that is ~2.6e9, ~33 bits of headroom under int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _validate(k: int, dim: int, lambda_permille: int) -> None:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if not 0 <= lambda_permille <= 1000:
        raise ValueError(f"lambda_permille must be in [0, 1000], "
                         f"got {lambda_permille}")


def mmr_rerank(cands: DataFrame, query: list[float], k: int, dim: int,
               lambda_permille: int = 700, id_col: str = "vec_id",
               vec_col: str = "embedding", quant_scale: int = 100,
               max_candidates: int = 100_000) -> DataFrame:
    """Greedy MMR selection of k items from a bounded candidate list.

    Returns (id_col, mmr_rank 1..k, mmr_score) in selection order;
    mmr_score is the integer objective at selection time (step 1 has
    no redundancy term).  Rows with a NULL or short vector raise —
    silently dropping candidates would corrupt the selection."""
    _validate(k, dim, lambda_permille)
    if len(query) < dim:
        raise ValueError(f"query has {len(query)} coords, need {dim}")
    n = cands.limit(max_candidates + 1).count()
    if n > max_candidates:
        raise ValueError(
            f"candidate list exceeds max_candidates={max_candidates}; "
            f"MMR re-ranks a bounded top-R list — cut upstream first")
    qq = [int(round(float(x) * quant_scale)) for x in query[:dim]]
    lam, mu = lambda_permille, 1000 - lambda_permille

    quant = F.array(*[
        F.round(F.element_at(F.col(vec_col), j + 1).cast("double")
                * quant_scale).cast("long") for j in range(dim)])
    prepared = cands.select(
        F.col(id_col).cast("long").alias("_id"),
        F.when(F.col(vec_col).isNull() | (F.size(vec_col) < dim),
               F.raise_error(F.concat(
                   F.lit(f"mmr_rerank: NULL or <{dim}-dim vector at "
                         f"{id_col}="), F.col(id_col).cast("string"))))
        .otherwise(quant).alias("_q"))

    out_schema = StructType([
        StructField(id_col, LongType()),
        StructField("mmr_rank", LongType()),
        StructField("mmr_score", LongType())])

    def _greedy(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) == 0:
            return pd.DataFrame({id_col: [], "mmr_rank": [],
                                 "mmr_score": []})
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        vecs = np.array(pdf["_q"].tolist(), dtype=np.int64)
        qv = np.array(qq, dtype=np.int64)
        rel = vecs @ qv
        n_rows = len(ids)
        take = min(k, n_rows)
        max_sim = np.full(n_rows, np.iinfo(np.int64).min, dtype=np.int64)
        alive = np.ones(n_rows, dtype=bool)
        sel_ids, sel_ranks, sel_scores = [], [], []
        for step in range(take):
            if step == 0:
                obj = lam * rel
            else:
                obj = lam * rel - mu * max_sim
            obj = np.where(alive, obj, np.iinfo(np.int64).min)
            best = int(np.argmax(obj))  # ids ascending -> lowest id wins ties
            sel_ids.append(int(ids[best]))
            sel_ranks.append(step + 1)
            sel_scores.append(int(obj[best]))
            alive[best] = False
            sims = vecs @ vecs[best]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame({id_col: sel_ids, "mmr_rank": sel_ranks,
                             "mmr_score": sel_scores})

    return (prepared.groupBy(F.lit(1).alias("_g"))
            .applyInPandas(_greedy, out_schema))


def mmr_rerank_sql(cands_sql: str, query: list[float], k: int, dim: int,
                   lambda_permille: int = 700, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   quant_scale: int = 100) -> str:
    """DuckDB twin of mmr_rerank: the k greedy steps UNROLLED as CTEs
    (the kmeans/pagerank twin pattern) — step i cross-joins the i-1
    one-row selected CTEs, computes the redundancy term as
    greatest() over per-coordinate-generated dot products, and picks
    the arg-max row by (score DESC, id ASC).  A different mechanism
    (SQL window argmax per step) than the engine's numpy fold.

    Every mmr_sel{i} is MATERIALIZED: step i references ALL previous
    selections, so letting the planner inline them re-evaluates step
    j once per downstream reference — exponential blowup that hangs
    already at k=15 (observed; materialization makes it k linear
    one-row scans).

    If the candidate list has fewer than k rows the trailing CTEs are
    empty and the output simply stops early (same as the engine)."""
    _validate(k, dim, lambda_permille)
    if len(query) < dim:
        raise ValueError(f"query has {len(query)} coords, need {dim}")
    qq = [int(round(float(x) * quant_scale)) for x in query[:dim]]
    lam, mu = lambda_permille, 1000 - lambda_permille

    qcols = ", ".join(
        f"CAST(round(CAST({vec_col}[{j + 1}] AS DOUBLE) * {quant_scale})"
        f" AS BIGINT) AS q{j}" for j in range(dim))
    rel = " + ".join(f"q{j} * {qq[j]}" for j in range(dim))
    parts = [f"""WITH mmr_cand AS MATERIALIZED (
  SELECT CAST({id_col} AS BIGINT) AS id, {qcols}
  FROM ({cands_sql.strip()}) AS mmr_in
), mmr_scored AS (
  SELECT id, {", ".join(f"q{j}" for j in range(dim))},
         CAST({rel} AS BIGINT) AS rel
  FROM mmr_cand
), mmr_sel1 AS MATERIALIZED (
  SELECT id, {", ".join(f"q{j}" for j in range(dim))}, rel,
         CAST({lam} * rel AS BIGINT) AS score
  FROM mmr_scored ORDER BY {lam} * rel DESC, id ASC LIMIT 1
)"""]
    for i in range(2, k + 1):
        sims = []
        for j in range(1, i):
            dot = " + ".join(f"c.q{x} * s{j}.q{x}" for x in range(dim))
            sims.append(f"({dot})")
        msim = sims[0] if len(sims) == 1 else f"greatest({', '.join(sims)})"
        joins = "".join(f" CROSS JOIN mmr_sel{j} AS s{j}"
                        for j in range(1, i))
        excl = " AND ".join(f"c.id != s{j}.id" for j in range(1, i))
        parts.append(f""", mmr_sel{i} AS MATERIALIZED (
  SELECT c.id, {", ".join(f"c.q{j} AS q{j}" for j in range(dim))},
         c.rel,
         CAST({lam} * c.rel - {mu} * ({msim}) AS BIGINT) AS score
  FROM mmr_scored AS c{joins}
  WHERE {excl}
  ORDER BY {lam} * c.rel - {mu} * ({msim}) DESC, c.id ASC
  LIMIT 1
)""")
    sel = "\n  UNION ALL\n  ".join(
        f"SELECT id, CAST({i} AS BIGINT) AS mmr_rank, score "
        f"FROM mmr_sel{i}" for i in range(1, k + 1))
    parts.append(f"""
SELECT id AS {id_col}, mmr_rank, score AS mmr_score
FROM ({sel}) AS mmr_all
ORDER BY mmr_rank""")
    return "".join(parts)
