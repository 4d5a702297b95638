"""Deterministic integer k-means (Lloyd's algorithm), cross-engine exact.

Completes the iterative-algorithm family (PageRank: stationary
importance; transitive closure / connected components: reachability;
SuSiE: iterative regression) with the classic clustering op — and,
unlike `similarity.ivf_index`'s float Lloyd refinement (which exists to
build an ANN index and never crosses an engine boundary), this variant
is ENGINE-EXACT: vectors quantize to int64, distances are integer sums
of squares, centroid updates are floor(sum/count) — one int64/int64
IEEE divide + floor per coordinate, identical in Spark and DuckDB — and
ties in the argmin break to the lowest cluster id.  A DuckDB twin
generated from the same recipe (kmeans_sql) reproduces every assignment
bit-for-bit, which no RNG-seeded float k-means can.

Initialization is deterministic: centroid i starts as the quantized
vector of the row with the i-th smallest id (no RNG — resumable and
twin-reproducible; k-means++ would trade twin-exactness for seeding
quality, the wrong trade for a correctness-gated op).

Scale shape: each iteration is ONE corpus scan — a map-only argmin
against the k centroids folded into the projection as literals
(centroids are the model: k*dim ints, a few KB fetched to the driver
per round exactly like similarity.ivf_index's centroid pull), then a
groupBy on the cluster id (k keys, full map-side combine) for the
per-dimension sums.  No joins, no skew exposure beyond k-way
aggregation; iterations * one-scan is the textbook distributed-k-means
cost model.  Overflow: per-coordinate diff <= 2*max|v|*scale, squared
and summed over dim must fit int64 — dim * (2*max|v|*scale)^2 < 2^63,
far looser than the near-dup norm-product bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quant(vec_col: str, dim: int, scale: int):
    return F.transform(
        F.slice(F.col(vec_col), 1, dim),
        lambda x: F.round(x.cast("double") * scale).cast("long"))


def kmeans_assign(emb: DataFrame, k: int = 4, dim: int = 8,
                  iterations: int = 3, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  quant_scale: int = 100) -> DataFrame:
    """(id_col, cluster) after `iterations` Lloyd rounds over the first
    `dim` coordinates of `vec_col`, quantized by `quant_scale`.

    Empty clusters keep their previous centroid (deterministic, and
    what the unrolled SQL twin's LEFT JOIN + coalesce does)."""
    assign_df, _cents = kmeans_fit(emb, k, dim, iterations, id_col,
                                   vec_col, quant_scale)
    return assign_df


def kmeans_fit(emb: DataFrame, k: int = 4, dim: int = 8,
               iterations: int = 3, id_col: str = "vec_id",
               vec_col: str = "embedding",
               quant_scale: int = 100):
    """kmeans_assign plus the fitted MODEL: returns (assignments,
    centroids) where centroids is the k x dim list of final integer
    centroids — the few-KB driver-side artifact an IVF-style consumer
    (pq.ivfpq_topk's coarse quantizer) ranks cells with."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    q = emb.select(F.col(id_col), _quant(vec_col, dim, quant_scale)
                   .alias("_q"))
    q = q.localCheckpoint(eager=True)  # every round rescans this

    # deterministic init: the k rows with the smallest ids, in id order
    seed_rows = (q.orderBy(id_col).limit(k).collect())
    cents = [list(r["_q"]) for r in seed_rows]

    def assign(cents_now):
        dists = F.array(*[
            F.aggregate(
                F.zip_with(F.col("_q"),
                           F.array(*[F.lit(int(c)).cast("long")
                                     for c in cent]),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, v: acc + v)
            for cent in cents_now])
        # first index of the minimum = lowest cluster id on ties
        return (F.array_position(dists, F.array_min(dists)) - 1
                ).cast("long").alias("cluster")

    for _ in range(iterations):
        a = q.select(id_col, "_q", assign(cents))
        sums = (a.groupBy("cluster")
                .agg(F.count("*").cast("long").alias("_n"),
                     *[F.sum(F.element_at("_q", j + 1)).cast("long")
                       .alias(f"_s{j}") for j in range(dim)]))
        got = {int(r["cluster"]): r for r in sums.collect()}  # k rows
        cents = [
            [int(F_floor_div(got[c][f"_s{j}"], got[c]["_n"]))
             for j in range(dim)] if c in got else cents[c]
            for c in range(k)]
    return q.select(F.col(id_col), assign(cents)), cents


def F_floor_div(s: int, n: int) -> int:
    """floor(s / n) via the same IEEE double divide both engines use
    (operands < 2^53 by the overflow bound, so the double is exact
    enough to round identically everywhere)."""
    import math
    return math.floor(s / n)


def kmeans_sql(k: int = 4, dim: int = 8, iterations: int = 3,
               table: str = "embeddings", id_col: str = "vec_id",
               vec_col: str = "embedding",
               quant_scale: int = 100, emit: str = "assign") -> str:
    """DuckDB twin of kmeans_assign with the Lloyd rounds UNROLLED as
    CTEs, GENERATED from the same recipe (init = k smallest ids,
    integer distances, lowest-id tie-break, floor(sum/count) update,
    empty cluster keeps previous centroid).

    emit="assign" (default) selects the per-row assignments (the
    kmeans_assign twin); emit="centroids" selects the final model
    table (cl, d0..d{dim-1}) instead — the kmeans_fit twin an
    IVF-style consumer ranks cells against."""
    if emit not in ("assign", "centroids"):
        raise ValueError(f"emit must be 'assign' or 'centroids', "
                         f"got {emit!r}")
    dcols = ", ".join(f"CAST(floor(coalesce(s.s{j} / s.n, p.d{j})) "
                      f"AS BIGINT) AS d{j}" for j in range(dim))
    scols = ", ".join(f"sum(q[{j + 1}]) AS s{j}" for j in range(dim))
    dist = " + ".join(f"(q[{j + 1}] - c.d{j}) * (q[{j + 1}] - c.d{j})"
                      for j in range(dim))
    init_cols = ", ".join(f"q[{j + 1}] AS d{j}" for j in range(dim))
    parts = [f"""WITH km_q AS (
  SELECT {id_col} AS id,
         list_transform({vec_col}[1:{dim}],
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant_scale})
                                  AS BIGINT)) AS q
  FROM {table}
), km_c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cl, {init_cols}
  FROM (SELECT id, q FROM km_q ORDER BY id LIMIT {k})
)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", km_a{i} AS (
  SELECT id, q, cl FROM (
    SELECT km_q.id, km_q.q, c.cl,
           row_number() OVER (PARTITION BY km_q.id
                              ORDER BY {dist}, c.cl) AS rn
    FROM km_q, km_c{p} AS c
  ) WHERE rn = 1
), km_c{i} AS (
  SELECT p.cl, {dcols}
  FROM km_c{p} AS p LEFT JOIN (
    SELECT cl, CAST(count(*) AS BIGINT) AS n, {scols}
    FROM km_a{i} GROUP BY cl
  ) AS s ON p.cl = s.cl
)""")
    final = iterations
    if emit == "centroids":
        cent_cols = ", ".join(f"d{j}" for j in range(dim))
        parts.append(f"""
SELECT cl, {cent_cols} FROM km_c{final}""")
        return "".join(parts)
    parts.append(f""", km_out AS (
  SELECT id, cl FROM (
    SELECT km_q.id, c.cl,
           row_number() OVER (PARTITION BY km_q.id
                              ORDER BY {dist}, c.cl) AS rn
    FROM km_q, km_c{final} AS c
  ) WHERE rn = 1
)
SELECT id AS {id_col}, CAST(cl AS BIGINT) AS cluster FROM km_out""")
    return "".join(parts)
