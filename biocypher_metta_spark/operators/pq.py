"""Product quantization (PQ) — compressed-domain ANN, cross-engine exact.

Completes the vector-search ladder (similarity.py: brute-force cosine
-> sign-LSH blocking -> IVF partition pruning) with the compression
member [Jégou et al., PAMI'11]: split each vector into `m` subspaces,
train an integer k-means codebook per subspace (the same
deterministic Lloyd recipe as operators/kmeans.py — quantize to
int64, integer squared distances, lowest-id tie-break,
floor(sum/count) centroid update, init from the k smallest-id rows),
and store each vector as `m` small codes.  A query then scans CODES,
not vectors: per subspace a k-entry lookup table of
query-to-centroid distances is computed once, and the asymmetric
distance (ADC) of a vector is the sum of its m table entries.

Scale shape: training is `iterations` map-only corpus scans — the
per-subspace argmin folds the current codebooks into the projection
as literals — plus ONE (subspace, cluster) aggregation per round
(m*k groups, full map-side combine; the model is m*k*d ints pulled
to the driver per round, the same bounded pull as
similarity.ivf_index's centroids).  Encoding is one map-only scan.
The ADC query path never touches the original vectors: it scans the
codes table (m bytes/vector at k <= 256 vs 4*dim floats — 16-64x
less IO at real sizes), adds m array lookups against broadcast
literal LUTs, and TakeOrdered-s the top k — no shuffle except the
bounded top-k.  Honest accuracy note: ADC is an ESTIMATE (distance
to the assigned centroid, not the vector); production recall comes
from re-ranking the ADC top-R with exact distances (R >> k), which
is `similarity.dot_topk` over the ADC survivors — composable here by
construction.  The gate checks the PQ machinery itself bit-for-bit
against an independently trained SQL twin, not a recall claim.

Sizing rule (measured, BENCH.md round-5 PQ table): codebook capacity
is the whole game — at 10^6 uniform rows, gate-sized m=4 x k=16 is
recall@10 0.18 even with rerank-50, while m=8 x k=64 reaches 0.995;
production sizes are m=8-16, k=256.  Regime rule: a clustered corpus
queried from OFF-cluster is PQ's adversarial case (capacity is spent
within clusters; 0.44 recall even at 8 x 64) — prefer IVF partition
pruning or exact quantized_dot_topk there.

Overflow bound (same as kmeans.py): per-coordinate diff <=
2*max|v|*quant_scale, squared and summed over dim/m coords must fit
int64; the ADC sum adds log2(m) bits on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.kmeans import F_floor_div, _quant


def _validate(m: int, k: int, dim: int, iterations: int) -> int:
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if dim < 1 or dim % m != 0:
        raise ValueError(f"dim must be a positive multiple of m, "
                         f"got dim={dim}, m={m}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    return dim // m


def _sub(col, s: int, d: int):
    """Subvector of quantized array column `col` for subspace s."""
    return F.slice(col, s * d + 1, d)


def _argmin(elems, cents) -> F.Column:
    """Index (0-based, lowest on ties) of the nearest centroid in
    `cents` (list of d-int lists) to the point given by `elems` (d
    long columns).  The distance sums are UNROLLED plain column
    arithmetic — zip_with/aggregate higher-order functions are
    evaluated interpreted per element and measured 4x slower on the
    2M-vector rehearsal leg; element arithmetic stays inside
    whole-stage codegen."""
    dists = []
    for cent in cents:
        t = None
        for e, cj in zip(elems, cent):
            diff = e - F.lit(int(cj)).cast("long")
            sq = diff * diff
            t = sq if t is None else t + sq
        dists.append(t)
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("long")


def pq_train(emb: DataFrame, m: int, k: int, dim: int,
             iterations: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding",
             quant_scale: int = 100) -> list[list[list[int]]]:
    """codebooks[s][c] = centroid (d ints) of cluster c in subspace s,
    after `iterations` Lloyd rounds per subspace.  All m subspaces
    train in the SAME corpus scans: one pass assigns every subspace,
    one (subspace, cluster) groupBy aggregates every codebook's sums.

    Empty clusters keep their previous centroid (deterministic; the
    SQL twin's LEFT JOIN + coalesce does the same)."""
    d = _validate(m, k, dim, iterations)
    q = emb.select(F.col(id_col).alias("_id"),
                   _quant(vec_col, dim, quant_scale).alias("_q"))
    q = q.localCheckpoint(eager=True)  # every round rescans this

    seed_rows = q.orderBy("_id").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(seed_rows)}")
    books = [[list(r["_q"])[s * d:(s + 1) * d] for r in seed_rows]
             for s in range(m)]

    for _ in range(iterations):
        stacked = q.select(F.explode(F.array(*[
            F.struct(F.lit(s).alias("_s"),
                     _argmin([F.element_at(F.col("_q"), s * d + j + 1)
                              for j in range(d)], books[s])
                     .alias("_cl"),
                     _sub(F.col("_q"), s, d).alias("_v"))
            for s in range(m)])).alias("_e"))
        sums = (stacked
                .groupBy(F.col("_e._s").alias("_s"),
                         F.col("_e._cl").alias("_cl"))
                .agg(F.count("*").cast("long").alias("_n"),
                     *[F.sum(F.element_at("_e._v", j + 1)).cast("long")
                       .alias(f"_s{j}") for j in range(d)]))
        got = {(int(r["_s"]), int(r["_cl"])): r
               for r in sums.collect()}  # <= m*k rows
        books = [
            [[F_floor_div(got[(s, c)][f"_s{j}"], got[(s, c)]["_n"])
              for j in range(d)] if (s, c) in got else books[s][c]
             for c in range(k)]
            for s in range(m)]
    return books


def pq_encode(emb: DataFrame, codebooks: list[list[list[int]]],
              dim: int, id_col: str = "vec_id",
              vec_col: str = "embedding",
              quant_scale: int = 100) -> DataFrame:
    """(id_col, codes: array<long> of length m) — each vector reduced
    to its per-subspace nearest-codeword indices.  Map-only."""
    m = len(codebooks)
    d = _validate(m, len(codebooks[0]), dim, 1)
    # quantize each needed element directly (round(element*scale)) —
    # building the transformed array and slicing it back out would put
    # an interpreted higher-order transform in the hot scan
    elems = [F.round(F.element_at(F.col(vec_col), j + 1).cast("double")
                     * quant_scale).cast("long") for j in range(dim)]
    return emb.select(
        F.col(id_col),
        F.array(*[_argmin(elems[s * d:(s + 1) * d], codebooks[s])
                  for s in range(m)]).alias("codes"))


def pq_adc_topk(codes: DataFrame, query: list[float],
                codebooks: list[list[list[int]]], topk: int,
                id_col: str = "vec_id",
                quant_scale: int = 100) -> DataFrame:
    """Asymmetric-distance top-k over an encoded corpus: the query is
    quantized driver-side, one k-entry LUT of integer squared
    distances is built per subspace, and every row's ADC distance is
    m literal-array lookups summed — a map-only scan of the codes
    table followed by a bounded TakeOrdered (ties break to the lower
    id, so the cut is deterministic cross-engine).

    Output: (id_col, adc_dist), ascending."""
    m = len(codebooks)
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    d = len(codebooks[0][0])
    if len(query) < m * d:
        raise ValueError(f"query has {len(query)} coords, "
                         f"codebooks need {m * d}")
    qq = [round(float(x) * quant_scale) for x in query[:m * d]]
    luts = [[sum((qq[s * d + j] - cent[j]) ** 2 for j in range(d))
             for cent in codebooks[s]] for s in range(m)]
    adc = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(int(v)).cast("long") for v in luts[s]]),
            (F.element_at("codes", s + 1) + 1).cast("int"))
        adc = term if adc is None else adc + term
    return (codes
            .select(F.col(id_col), adc.alias("adc_dist"))
            .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
            .limit(topk))


def pq_topk(emb: DataFrame, query: list[float], m: int, k: int,
            dim: int, topk: int, iterations: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            quant_scale: int = 100) -> DataFrame:
    """train -> encode -> ADC top-k, one call."""
    books = pq_train(emb, m, k, dim, iterations, id_col, vec_col,
                     quant_scale)
    codes = pq_encode(emb, books, dim, id_col, vec_col, quant_scale)
    return pq_adc_topk(codes, query, books, topk, id_col, quant_scale)


def pq_topk_sql(query: list[float], m: int, k: int, dim: int,
                topk: int, iterations: int = 2,
                table: str = "embeddings", id_col: str = "vec_id",
                vec_col: str = "embedding",
                quant_scale: int = 100,
                restrict_sql: str | None = None) -> str:
    """DuckDB twin of pq_topk, GENERATED from the same recipe but
    trained and evaluated entirely in SQL: per subspace the Lloyd
    rounds are unrolled as CTEs (operators/kmeans.kmeans_sql's
    pattern with a coordinate offset), the final assignment is each
    vector's code, the LUT is a query-literal-to-centroid distance
    per (subspace, cluster), and the ADC is the m-way join of codes
    to LUTs.  Nothing crosses from the Spark side — a green gate
    means two independent engines trained the same codebooks and cut
    the same top-k.

    restrict_sql (the IVF-PQ hook): a query yielding one `id` column;
    when given, the final ADC cut considers only those ids — training
    still sees the FULL table, mirroring ivfpq_topk's global
    codebooks + coarse-pruned scan."""
    d = _validate(m, k, dim, iterations)
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if len(query) < m * d:
        raise ValueError(f"query has {len(query)} coords, "
                         f"codebooks need {m * d}")
    qq = [round(float(x) * quant_scale) for x in query[:m * d]]

    parts = [f"""WITH pq_q AS MATERIALIZED (
  SELECT {id_col} AS id,
         list_transform({vec_col}[1:{dim}],
                        x -> CAST(round(CAST(x AS DOUBLE) * {quant_scale})
                                  AS BIGINT)) AS q
  FROM {table}
)"""]
    for s in range(m):
        o = s * d
        init_cols = ", ".join(f"q[{o + j + 1}] AS d{j}"
                              for j in range(d))
        dist = " + ".join(
            f"(q[{o + j + 1}] - c.d{j}) * (q[{o + j + 1}] - c.d{j})"
            for j in range(d))
        dcols = ", ".join(f"CAST(floor(coalesce(s.s{j} / s.n, p.d{j})) "
                          f"AS BIGINT) AS d{j}" for j in range(d))
        scols = ", ".join(f"sum(q[{o + j + 1}]) AS s{j}"
                          for j in range(d))
        parts.append(f""", pq{s}_c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cl, {init_cols}
  FROM (SELECT id, q FROM pq_q ORDER BY id LIMIT {k})
)""")
        for i in range(1, iterations + 1):
            p = i - 1
            parts.append(f""", pq{s}_a{i} AS (
  SELECT id, q, cl FROM (
    SELECT pq_q.id, pq_q.q, c.cl,
           row_number() OVER (PARTITION BY pq_q.id
                              ORDER BY {dist}, c.cl) AS rn
    FROM pq_q, pq{s}_c{p} AS c
  ) WHERE rn = 1
), pq{s}_c{i} AS (
  SELECT p.cl, {dcols}
  FROM pq{s}_c{p} AS p LEFT JOIN (
    SELECT cl, CAST(count(*) AS BIGINT) AS n, {scols}
    FROM pq{s}_a{i} GROUP BY cl
  ) AS s ON p.cl = s.cl
)""")
        qdist = " + ".join(
            f"({qq[o + j]} - d{j}) * ({qq[o + j]} - d{j})"
            for j in range(d))
        parts.append(f""", pq{s}_code AS (
  SELECT id, cl FROM (
    SELECT pq_q.id, c.cl,
           row_number() OVER (PARTITION BY pq_q.id
                              ORDER BY {dist}, c.cl) AS rn
    FROM pq_q, pq{s}_c{iterations} AS c
  ) WHERE rn = 1
), pq{s}_lut AS (
  SELECT cl, CAST({qdist} AS BIGINT) AS ld FROM pq{s}_c{iterations}
)""")
    joins = "\n".join(
        f"JOIN pq{s}_code AS c{s} ON c0.id = c{s}.id\n"
        f"JOIN pq{s}_lut AS l{s} ON c{s}.cl = l{s}.cl"
        for s in range(1, m))
    first = f"JOIN pq0_lut AS l0 ON c0.cl = l0.cl"
    total = " + ".join(f"l{s}.ld" for s in range(m))
    where = (f"\nWHERE c0.id IN (SELECT id FROM ({restrict_sql.strip()})"
             f" AS pq_restrict)" if restrict_sql else "")
    parts.append(f"""
SELECT c0.id AS {id_col}, CAST({total} AS BIGINT) AS adc_dist
FROM pq0_code AS c0
{first}
{joins}{where}
ORDER BY adc_dist ASC, c0.id ASC
LIMIT {topk}""")
    return "".join(parts)


def ivfpq_topk(emb: DataFrame, query: list[float], n_cells: int,
               m: int, k: int, dim: int, topk: int, n_probe: int = 2,
               coarse_iterations: int = 2, pq_iterations: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               quant_scale: int = 100) -> DataFrame:
    """IVF-PQ: the canonical big-corpus ANN architecture [Jégou et al.,
    PAMI'11] — a coarse quantizer prunes the corpus to n_probe cells,
    PQ ADC scans only the survivors.  Both stages are the engine's
    existing exact-integer operators composed: coarse = operators/
    kmeans.kmeans_fit (deterministic integer Lloyd, n_cells), fine =
    global pq_train/pq_encode/pq_adc_topk over the pruned candidate
    set.  Codebooks are GLOBAL (raw vectors, not residuals — the
    residual variant needs per-cell float recentering that would
    forfeit twin-exactness; at these codebook sizes raw-vector ADC is
    the same recipe FAISS calls IVFx,PQy with by_residual=false).

    Query-side cell ranking is driver arithmetic on the few-KB model:
    integer L2 of the quantized query to each centroid, ties to the
    lower cell id — exactly the twin's ORDER BY dist, cl LIMIT
    n_probe.

    Scale shape: coarse fit is iterations map-only scans + n_cells-way
    aggs; the probe cut joins the corpus to the assignment ids (the
    assignment side reuses kmeans_fit's checkpointed quantized table,
    so the argmin is evaluated once, not rebuilt) and prunes to
    ~n_probe/n_cells of the corpus BEFORE encode + ADC; ADC adds m LUT
    lookups/row and a bounded TakeOrdered.  A zero-shuffle alternative
    — folding the assignment argmin into an inline corpus filter — was
    implemented and REJECTED on measurement (candidate-stage solo at
    sf0.01: join 0.23s vs inline filter 1.4-2.1s; full gate 3.9s vs
    6.0-7.2s): the inline expression re-quantizes per (cell, coord)
    term, 128 duplicated subexpressions/row here, while the join's
    build side is the already-materialized few-columns id list.  At a
    cell-partitioned corpus layout the right scale move is partition
    pruning on a stored cell key (see rel_zorder_key for the layout
    recipe), not re-deriving cells in the filter."""
    from biocypher_metta_spark.operators.kmeans import kmeans_fit

    if n_probe < 1 or n_probe > n_cells:
        raise ValueError(f"n_probe must be in [1, n_cells], "
                         f"got n_probe={n_probe}, n_cells={n_cells}")
    d = _validate(m, k, dim, pq_iterations)
    if len(query) < m * d:
        raise ValueError(f"query has {len(query)} coords, "
                         f"codebooks need {m * d}")
    assign, cents = kmeans_fit(emb, k=n_cells, dim=dim,
                               iterations=coarse_iterations,
                               id_col=id_col, vec_col=vec_col,
                               quant_scale=quant_scale)
    qq = [round(float(x) * quant_scale) for x in query[:dim]]
    probe = sorted(range(len(cents)),
                   key=lambda c: (sum((qq[j] - cents[c][j]) ** 2
                                      for j in range(dim)), c))[:n_probe]
    cand_ids = assign.filter(F.col("cluster").isin([int(p) for p in probe]))
    cand = emb.join(cand_ids.select(F.col(id_col)), id_col)
    books = pq_train(emb, m, k, dim, pq_iterations, id_col, vec_col,
                     quant_scale)
    codes = pq_encode(cand, books, dim, id_col, vec_col, quant_scale)
    return pq_adc_topk(codes, query, books, topk, id_col, quant_scale)


def ivfpq_topk_sql(query: list[float], n_cells: int, m: int, k: int,
                   dim: int, topk: int, n_probe: int = 2,
                   coarse_iterations: int = 2, pq_iterations: int = 2,
                   table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   quant_scale: int = 100) -> str:
    """DuckDB twin of ivfpq_topk: the kmeans twin emitted twice (cell
    assignments + the centroid model, each a self-contained unrolled-
    CTE query), cells ranked by the same integer distance to the query
    literal, and the PQ twin's restrict_sql hook pinning the ADC cut
    to the probed ids — four generated twins composing, zero shared
    state with the engine."""
    from biocypher_metta_spark.operators.kmeans import kmeans_sql

    if n_probe < 1 or n_probe > n_cells:
        raise ValueError(f"n_probe must be in [1, n_cells], "
                         f"got n_probe={n_probe}, n_cells={n_cells}")
    d = _validate(m, k, dim, pq_iterations)
    if len(query) < m * d:
        raise ValueError(f"query has {len(query)} coords, "
                         f"codebooks need {m * d}")
    qq = [round(float(x) * quant_scale) for x in query[:dim]]
    assign_sql = kmeans_sql(k=n_cells, dim=dim,
                            iterations=coarse_iterations, table=table,
                            id_col=id_col, vec_col=vec_col,
                            quant_scale=quant_scale)
    cent_sql = kmeans_sql(k=n_cells, dim=dim,
                          iterations=coarse_iterations, table=table,
                          id_col=id_col, vec_col=vec_col,
                          quant_scale=quant_scale, emit="centroids")
    qdist = " + ".join(f"({qq[j]} - d{j}) * ({qq[j]} - d{j})"
                       for j in range(dim))
    restrict = f"""SELECT CAST(a.{id_col} AS BIGINT) AS id
FROM ({assign_sql}) AS a
JOIN (
  SELECT cl FROM ({cent_sql}) AS ivf_cents
  ORDER BY {qdist}, cl LIMIT {n_probe}
) AS ivf_probe ON a.cluster = ivf_probe.cl"""
    return pq_topk_sql(query, m, k, dim, topk, pq_iterations, table,
                       id_col, vec_col, quant_scale,
                       restrict_sql=restrict)
