"""Similarity search over embedding columns (array<float>).

* quantized_dot_topk — exact-integer dot product against a broadcast
  query vector (engine-portable: same result in DuckDB oracles).
* cosine_topk — double-precision brute-force baseline (bench path).
* lsh_bucketed_topk — scale path: deterministic hyperplane LSH buckets
  shrink the candidate set before exact scoring; the bucket join shuffles
  on uniform sketch keys instead of broadcasting the full corpus.

All built-in expressions (F.zip_with / F.aggregate); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1000  # fixed-point scale for portable integer math


def quantize(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<bigint> via round(x*scale)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantized_dot_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Top-k by exact integer dot product with a constant query vector.
    Map-only scoring + a single global top-k (sort spilled safely); ties
    broken by id for determinism.

    Rows whose vector length differs from the query raise: zip_with
    NULL-pads the shorter side, so a silent mismatch turns every dot
    NULL and the "top-k" degenerates to first-k-by-id (observed with a
    16-dim query on a 64-dim table) — slice the table upstream
    (F.slice) when scoring a prefix is intended."""
    # quantize the query with F.round too (Python round is banker's —
    # would diverge from SQL HALF_UP on exact .5)
    q = quantize(F.array(*[F.lit(float(v)) for v in query_vec]))
    dim = len(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.when(F.col(vec_col).isNull() | (F.size(vec_col) != dim),
               F.raise_error(F.concat(
                   F.lit(f"quantized_dot_topk: NULL or non-{dim}-dim "
                         f"vector at {id_col}="),
                   F.col(id_col).cast("string"))))
        .otherwise(int_dot(quantize(F.col(vec_col)), q)).alias("dot"),
    )
    return scored.orderBy(F.col("dot").desc(), F.col(id_col)).limit(k)


def dot_double(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    sim = dot_double(v, q) / (F.sqrt(dot_double(v, v)) * F.lit(qn))
    return (
        emb.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, seed: int) -> list[int]:
    """Deterministic ±1 hyperplane from a seed (no RNG — resumability)."""
    out = []
    x = seed * 2654435761 % (1 << 32)
    for _ in range(dim):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(1 if (x >> 16) & 1 else -1)
    return out


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-sketch bucket id: n_planes-bit signature of the vector."""
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p + 1)
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(w)) for w in plane]),
                       lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("int")


def query_buckets(query_vec: list[float], n_planes: int = 6,
                  probe_adjacent: bool = True) -> list[int]:
    """The sign-sketch bucket of a query vector plus (optionally) its
    1-bit-flip neighbors — tiny driver-side arithmetic, no Spark."""
    dim = len(query_vec)
    qb = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, p + 1)
        proj = sum(float(v) * w for v, w in zip(query_vec, plane))
        qb += 1 << p if proj >= 0 else 0
    buckets = {qb}
    if probe_adjacent:
        for p in range(n_planes):
            buckets.add(qb ^ (1 << p))
    return sorted(buckets)


def lsh_bucketed_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 6, probe_adjacent: bool = True) -> DataFrame:
    """ANN: score only vectors whose sign-sketch matches the query's
    bucket (optionally 1-bit-flip neighbors). Computes buckets on the fly
    — one full scan per query; see write_embeddings_bucketed +
    lsh_bucketed_topk_from_table for the pruned-read layout at scale."""
    dim = len(query_vec)
    buckets = query_buckets(query_vec, n_planes, probe_adjacent)
    cand = emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes)) \
              .filter(F.col("_bucket").isin(buckets))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def knn_join(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
             n_planes: int = 6, quant_scale: int = 100,
             q_id: str = "q_id", c_id: str = "vec_id",
             vec_col: str = "embedding",
             probe_adjacent: bool = True,
             probe_bits: int | None = None) -> DataFrame:
    """Distributed batch k-NN join — an operator Spark has no native
    form of: for EVERY query row, the top-k corpus rows by exact integer
    dot product, candidates limited to the query's sign-sketch bucket
    plus (multi-probe) its 1-bit-flip neighbors. Returns
    (q_id, vec_id, dot, rank), rank deterministic via (dot DESC, id).

    Scale shape: both sides sketch map-side with the same quantized
    integer arithmetic as embedding_near_dup_pairs (a SQL oracle can
    reproduce the exact candidate set); queries explode into
    (1 + n_planes) probe rows; the join shuffles on the bucket key —
    2^n_planes roughly-uniform cells, NEVER a cross join; the per-query
    top-k windows on q_id, which is uniform. SIZE n_planes to the
    corpus: expected candidates per query are
    (1 + n_planes) * N / 2^n_planes — at 10^9 rows use 24+ planes (and
    probe more flips to recover recall), but never more planes than the
    embedding DIMENSION: k hyperplanes in d dims realize only
    2*sum_{i<d} C(k-1, i) sign patterns (all 2^k iff k <= d), so excess
    planes add probe cost without adding blocking power (see
    dedup.embedding_near_dup_pairs for the measured blowup). Recall is approximate by
    construction; the brute-force twin is quantized_dot_topk per query.

    probe_bits widens multi-probe: 0 = own bucket only, 1 = + all 1-bit
    flips (the probe_adjacent=True default), 2 = + all 2-bit flips
    (n_planes*(n_planes+1)/2 + 1 probe rows per query — recall recovery
    for high n_planes; measured sweep in BENCH.md / tools/knn_recall.py).
    The 10^6-row sweep (BENCH.md r5): sign-LSH holds 0.83-0.94 recall on
    clustered corpora at 16-24 planes but collapses on uniform geometry
    (0.15 at 16 planes) — for uniform/unknown corpora use ivf_knn_join,
    which dominates on recall per candidate in both regimes.
    probe_adjacent is the legacy boolean form and is only consulted when
    probe_bits is None.
    """
    if probe_bits is None:
        probe_bits = 1 if probe_adjacent else 0
    if not 0 <= probe_bits <= 2:
        raise ValueError("probe_bits must be 0, 1, or 2")
    def sketch(df, id_name):
        from biocypher_metta_spark.operators.dedup import _compute_once

        qv = F.transform(F.col(vec_col),
                         lambda x: F.round(x.cast("double") * quant_scale)
                         .cast("long"))
        # Generate barrier: the n_planes projection aggregates below each
        # reference _q, and CollapseProject would otherwise re-inline the
        # 64-element quantize transform into every one of them
        out = (_compute_once(df.select(F.col(id_name), F.col(vec_col)),
                             qv, "_q")
               .select(F.col(id_name), F.col("_q")))
        bucket = F.lit(0)
        for p in range(n_planes):
            plane = F.array(*[F.lit(w).cast("long")
                              for w in _hyperplane(dim, p + 1)])
            proj = F.aggregate(
                F.zip_with(F.col("_q"), plane, lambda x, w: x * w),
                F.lit(0).cast("long"), lambda acc, v: acc + v)
            bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        return out.withColumn("_bkt", bucket.cast("int"))

    cand_c = sketch(corpus, c_id)
    qb = sketch(queries, q_id)
    if probe_bits >= 1:
        masks = [1 << p for p in range(n_planes)]
        if probe_bits >= 2:
            masks += [(1 << p) | (1 << r) for p in range(n_planes)
                      for r in range(p + 1, n_planes)]
        probes = F.array(F.col("_bkt"),
                         *[F.col("_bkt").bitwiseXOR(F.lit(m))
                           for m in masks])
        qb = (qb.select(q_id, "_q", F.explode(probes).alias("_bkt")))
    joined = qb.alias("q").join(cand_c.alias("c"), "_bkt").select(
        F.col(f"q.{q_id}"), F.col(f"c.{c_id}"),
        int_dot(F.col("q._q"), F.col("c._q")).alias("dot"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id).orderBy(F.col("dot").desc(), F.col(c_id))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def write_embeddings_bucketed(emb: DataFrame, path: str, dim: int,
                              n_planes: int = 6,
                              vec_col: str = "embedding",
                              mode: str = "overwrite") -> None:
    """Materialize the embeddings table partitioned by the LSH sign-sketch
    bucket — the scale layout lsh_bucketed_topk assumes: each query then
    reads only its (1 + n_planes) probe buckets out of 2^n_planes via
    partition pruning instead of scanning the corpus. The bucket is a
    deterministic function of the vector (no RNG), so incremental appends
    land in the same partitions and the layout survives resume."""
    out = emb.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    out.write.mode(mode).partitionBy("_bucket").parquet(path)


def build_ivf_centroids(emb: DataFrame, dim: int, n_planes: int = 4,
                        lloyd_iters: int = 2,
                        vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic IVF centroid build: initial cells are the LSH
    sign-sketch buckets (no RNG — resumable/reproducible), refined with a
    bounded number of Lloyd iterations. Every step is a groupBy-mean over
    the corpus (map-side partial agg); centroids (<= 2^n_planes) come back
    to the driver — they are the index, a few KB.

    At 100 TB this is the standard ANN index path: one full scan per
    Lloyd iteration, then assignment is a broadcast argmin and queries
    probe n_probe cells instead of the corpus."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cur = emb.select(v.alias("_v"),
                     lsh_bucket(F.col(vec_col), dim, n_planes).alias("_cell"))
    mean_vec = F.array(*[F.avg(F.element_at("_v", j + 1)).alias(f"c{j}")
                         for j in range(dim)])
    cents = [list(r.c) for r in
             cur.groupBy("_cell").agg(mean_vec.alias("c")).collect()]
    for _ in range(lloyd_iters):
        assigned = emb.select(v.alias("_v")).withColumn(
            "_cell", _nearest_centroid(F.col("_v"), cents))
        cents = [list(r.c) for r in
                 assigned.groupBy("_cell").agg(mean_vec.alias("c")).collect()]
    return sorted(cents)


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_k squared-distance(vec, centroid_k) as a pure expression
    (centroids are plan literals — broadcast by construction). Flat
    array_min over (distance, idx) structs: each distance appears ONCE
    in the tree. The previous when/least fold referenced the running
    best twice per centroid — an expression tree doubling per cell
    (2^256 nodes at 256 cells = executor OOM during codegen)."""
    ds = []
    for k, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(F.zip_with(vec, carr, lambda x, w: (x - w) * (x - w)),
                        F.lit(0.0), lambda acc, val: acc + val)
        ds.append(F.struct(d.alias("d"), F.lit(k).alias("c")))
    return F.array_min(F.array(*ds))["c"]


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Tag each vector with its IVF cell (broadcast argmin — map-only)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.withColumn("_cell", _nearest_centroid(v, centroids))


def ivf_topk(emb: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF probe: rank cells by centroid distance to the query (driver
    arithmetic — the index is tiny), exact-score only the n_probe nearest
    cells. Written `partitionBy(_cell)` (same pattern as
    write_embeddings_bucketed) the probe becomes a pruned partition read."""
    def d2(c):
        return sum((float(a) - float(b)) ** 2 for a, b in zip(c, query_vec))

    order = sorted(range(len(centroids)), key=lambda i: d2(centroids[i]))
    probe = order[:n_probe]
    cand = ivf_assign(emb, centroids, vec_col).filter(F.col("_cell").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_bucketed_topk_from_table(spark, path: str, query_vec: list[float],
                                 k: int = 10, id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 n_planes: int = 6,
                                 probe_adjacent: bool = True) -> DataFrame:
    """ANN over a write_embeddings_bucketed layout: the `_bucket IN (...)`
    predicate hits the partition column, so the scan reads only the probe
    buckets (plan-tested: PartitionFilters carries _bucket)."""
    emb = spark.read.parquet(path)
    buckets = query_buckets(query_vec, n_planes, probe_adjacent)
    cand = emb.filter(F.col("_bucket").isin(buckets))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def expected_candidates(corpus_n: int, n_planes: int,
                        probe_bits: int) -> float:
    """Expected candidate rows per query under uniform bucket load —
    the sizing rule knn_join's docstring states: probes(probe_bits) *
    corpus_n / 2^n_planes. Size n_planes so this stays ~10^3-10^4:
    too few planes floods the rescorer (candidates ~ corpus), too many
    starves recall (empty probe buckets). At 10^9 rows, probe_bits=2:
    16 planes -> ~2.1M candidates (flood); 24 -> ~18k (right); hence
    the 'at 10^9 rows use 24+ planes' rule."""
    probes = 1
    if probe_bits >= 1:
        probes += n_planes
    if probe_bits >= 2:
        probes += n_planes * (n_planes - 1) // 2
    return probes * corpus_n / float(1 << n_planes)


def ivf_knn_join(queries: DataFrame, corpus: DataFrame,
                 centroids: list[list[float]], k: int = 5,
                 n_probe: int = 2, quant_scale: int = 100,
                 q_id: str = "q_id", c_id: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Batch k-NN join through an IVF index — the recommended blocking
    for UNIFORM corpora, where sign-LSH recall is weak (hyperplane
    sketches only separate what geometry clusters; measured sweep in
    BENCH.md). Corpus rows get their nearest-centroid cell (map-only
    broadcast argmin over the literal centroid list), each query
    explodes into its n_probe nearest cells, candidates equi-join on
    the cell id — never a cross join — and the exact quantized dot
    rescores per-query top-k. Candidates/query ~ n_probe * N / n_cells,
    tunable independent of recall via lloyd_iters/centroid count."""
    if not centroids:
        raise ValueError("empty centroid list")
    if not 1 <= n_probe <= len(centroids):
        raise ValueError("n_probe must be in [1, n_centroids]")
    quant = F.transform(F.col(vec_col),
                        lambda x: F.round(x * quant_scale).cast("long"))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = corpus.select(F.col(c_id), quant.alias("_cvec"),
                      _nearest_centroid(v, centroids).alias("_cell"))
    # per-query n_probe nearest cells: literal distance per centroid,
    # array_sort on (distance, cell) structs, slice, explode
    dists = []
    for idx, cent in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(v, carr, lambda x, w: (x - w) * (x - w)),
            F.lit(0.0), lambda acc, val: acc + val)
        dists.append(F.struct(d.alias("d"), F.lit(idx).alias("c")))
    probe = F.slice(F.array_sort(F.array(*dists)), 1, n_probe)
    q = (queries.select(F.col(q_id), quant.alias("_qvec"),
                        F.explode(probe).alias("_p"))
         .select(q_id, "_qvec", F.col("_p.c").alias("_cell")))
    joined = q.join(c, "_cell").select(
        q_id, c_id, int_dot(F.col("_qvec"), F.col("_cvec")).alias("dot"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id).orderBy(F.col("dot").desc(), F.col(c_id))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, c_id, "dot", "rank"))


def projection_coefficients(dim: int, out_dim: int,
                            seed: int = 7) -> list[list[int]]:
    """Deterministic sparse Achlioptas coefficients [Achlioptas,
    JCSS'03]: entry (j, i) is +1 / -1 / 0 with probability 1/6, 1/6,
    2/3 — the database-friendly Johnson-Lindenstrauss matrix (2/3 of
    the multiply-adds vanish; distances are preserved in expectation
    up to the constant sqrt(3)/sqrt(out_dim), which rank/threshold
    consumers never need).  Generated by the same pure-Python LCG as
    _hyperplane — engine-independent by construction, so the Spark
    projection and its SQL twin share ONE literal matrix and cannot
    drift."""
    if dim < 1 or out_dim < 1:
        raise ValueError(f"dim and out_dim must be >= 1, "
                         f"got dim={dim}, out_dim={out_dim}")
    coefs = []
    x = (seed * 2654435761) % (1 << 32)
    for _ in range(out_dim):
        row = []
        for _ in range(dim):
            x = (x * 1103515245 + 12345) % (1 << 31)
            r = (x >> 16) % 6
            row.append(1 if r == 0 else (-1 if r == 1 else 0))
        coefs.append(row)
    return coefs


def random_projection(emb: DataFrame, dim: int, out_dim: int,
                      seed: int = 7, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      quant_scale: int = QUANT_SCALE) -> DataFrame:
    """Johnson-Lindenstrauss reduction of an embedding column to
    out_dim integer components (id_col, p0..p{out_dim-1}): p_j =
    sum_i coef[j][i] * round(v_i * quant_scale) over the sparse
    {-1,0,+1} Achlioptas matrix — EXACT integer arithmetic, so the
    SQL twin matches bit-for-bit and downstream blocking (LSH on the
    reduced vectors, dedup sketches, cheap pre-filters before exact
    rescoring) is reproducible across engines.

    Map-only: the coefficients fold into the projection as literals
    (~dim/3 add/subtract terms per output, whole-stage codegen, no
    shuffle, no UDF).  Rows with a NULL or short vector raise — the
    quantized_dot_topk contract; slice upstream to project a prefix.

    Overflow: |p_j| <= dim * quant_scale * max|v| — at dim 4096,
    scale 1000, |v| <= 1 that is ~4e6, vast int64 headroom.

    Codegen note: the quantized array is hoisted into ONE guarded
    intermediate column and the outputs read it via element_at —
    inlining round(element*scale) into every signed term (~out_dim/3
    uses per coord, further duplicated by downstream hashing) was measured
    to blow the generated projection method past janino's limits
    (12.5k-line method, compile failure, interpreted fallback)."""
    coefs = projection_coefficients(dim, out_dim, seed)
    quant = F.transform(
        F.slice(F.col(vec_col), 1, dim),
        lambda x: F.round(x.cast("double") * quant_scale).cast("long"))
    prepared = emb.select(
        F.col(id_col),
        F.when(F.col(vec_col).isNull() | (F.size(vec_col) < dim),
               F.raise_error(F.concat(
                   F.lit(f"random_projection: NULL or <{dim}-dim "
                         f"vector at {id_col}="),
                   F.col(id_col).cast("string"))))
        .otherwise(quant).alias("_q"))
    cols = []
    for j, row in enumerate(coefs):
        terms = [F.element_at("_q", i + 1) if c == 1
                 else (-F.element_at("_q", i + 1))
                 for i, c in enumerate(row) if c]
        expr = terms[0] if terms else F.lit(0).cast("long")
        for t in terms[1:]:
            expr = expr + t
        cols.append(expr.alias(f"p{j}"))
    return prepared.select(F.col(id_col), *cols)


def random_projection_sql(table_sql: str, dim: int, out_dim: int,
                          seed: int = 7, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          quant_scale: int = QUANT_SCALE) -> str:
    """DuckDB twin of random_projection — the SAME literal coefficient
    matrix (shared generator), the same quantize-then-signed-sum, as
    one flat SELECT (1-based list indexing on the DuckDB side)."""
    coefs = projection_coefficients(dim, out_dim, seed)
    qs = [f"CAST(round(CAST({vec_col}[{i + 1}] AS DOUBLE) "
          f"* {quant_scale}) AS BIGINT)" for i in range(dim)]
    outs = []
    for j, row in enumerate(coefs):
        terms = [(f"+ {qs[i]}" if c == 1 else f"- {qs[i]}")
                 for i, c in enumerate(row) if c]
        body = " ".join(terms).lstrip("+ ") if terms else "0"
        outs.append(f"CAST({body} AS BIGINT) AS p{j}")
    return (f"SELECT {id_col}, {', '.join(outs)} "
            f"FROM ({table_sql.strip()}) AS rp_in")


def sign_pack(emb: DataFrame, dim: int, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Binary sign quantization of an embedding column — the 32x
    storage compression step (64 float32 -> 8 bytes) behind
    Hamming-space retrieval: bit i of word w is (e[32w+i] > 0),
    packed into ceil(dim/32) NON-NEGATIVE longs (32 bits per word,
    deliberately not 64: the sign bit never enters play, so the OR-
    fold, XOR and popcount are portably identical in Spark and
    DuckDB with zero two's-complement casework).

    Output (id_col, words: array<long>). Strict-positive is the bit
    (zero and negative are 0) — pinned so both engines agree on
    exact-zero components. Dimension mismatches raise like
    quantized_dot_topk (zip semantics would silently zero-pad).

    Map-only; pure expressions (sequence + aggregate OR-fold inside
    whole-stage codegen). The packed table is what a 100-TB corpus
    PERSISTS for reranking pipelines: hamming_topk scans words
    instead of float arrays, and hamming-banded blocking
    (dedup.hamming_near_pairs on any single word) gives the self-join
    path."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    n_words = (dim + 31) // 32
    # literal shifts, one term per dimension; bit positions are
    # disjoint so the sum IS the OR and each word stays < 2^32
    words = F.array(*[
        sum((F.when(F.element_at(F.col(vec_col), w * 32 + i + 1)
                    > F.lit(0.0).cast("float"),
                    F.lit(1 << i).cast("long"))
             .otherwise(F.lit(0).cast("long"))
             for i in range(min(32, dim - w * 32))),
            start=F.lit(0).cast("long"))
        for w in range(n_words)
    ])
    return emb.select(
        F.col(id_col),
        F.when(F.col(vec_col).isNull() | (F.size(vec_col) != dim),
               F.raise_error(F.concat(
                   F.lit(f"sign_pack: NULL or non-{dim}-dim vector at id "),
                   F.col(id_col).cast("string"))))
        .otherwise(words).alias("words"))


def hamming_topk(packed: DataFrame, query_words: list[int], k: int = 10,
                 id_col: str = "vec_id") -> DataFrame:
    """Top-k nearest neighbors in Hamming space over sign_pack
    signatures: distance = popcount of the per-word XOR against the
    broadcast query signature, ties broken by id — the binary-
    quantized counterpart of quantized_dot_topk (sign-Hamming
    approximates angular distance; Charikar 2002). Map-only scoring
    over 8-byte words + one global top-k; at corpus scale the scan
    reads the packed table only, never the float vectors."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if any(w < 0 or w >= (1 << 32) for w in query_words):
        raise ValueError("query_words must be 32-bit non-negative "
                         "(sign_pack output)")
    q = F.array(*[F.lit(w).cast("long") for w in query_words])
    nw = len(query_words)
    dist = F.aggregate(
        F.zip_with(F.col("words"), q,
                   lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = packed.select(
        F.col(id_col),
        F.when(F.size("words") != nw,
               F.raise_error(F.lit(
                   f"hamming_topk: signature is not {nw} words")))
        .otherwise(dist).alias("hamming"))
    return (scored.orderBy(F.col("hamming").asc(), F.col(id_col).asc())
            .limit(k))
