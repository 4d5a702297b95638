"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (100 TB):
* exact dedup is a hash-shuffle groupBy on a 16-byte digest — with AQE
  the skew (empty/boilerplate docs collapsing to one key) is split
  automatically; keep the digest, not the text, in the shuffle.
* MinHash/LSH: signatures are computed scan-side (map-only); the only
  shuffle is the band-bucket join, whose keys are uniform by
  construction. Candidate verification re-reads only candidate pairs.
* SimHash: 64-bit signature via per-token hashes; near-dup = hamming
  distance <= k over banded prefixes.

Portability: the shingle hash is the 60-bit md5 prefix (operators.text.
portable_hash) so DuckDB oracles can reproduce signatures exactly.
MinHash permutations are (a*h + b) mod p with fixed constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import portable_hash, shingles

MERSENNE_P = (1 << 61) - 1
# fixed, engine-portable permutation constants. a < 2^15 and H < 2^48
# keep a*H+b inside signed-64 range, so the permutations run in plain
# LONG codegen arithmetic (the earlier decimal(38,0) variant was the
# dominant cost of signature computation).
MINHASH_AS = [32749, 28657, 24593, 17977, 16411, 15373, 14221, 13007]
MINHASH_BS = [12345, 54321, 98765, 13579, 24680, 111111, 222222, 333333]


def _compute_once(df: DataFrame, expr, name: str) -> DataFrame:
    """Materialize an expression as a column behind a Generate barrier.

    Catalyst's CollapseProject re-inlines a projected expression into
    every downstream reference — e.g. the shingle-md5 array would be
    recomputed once PER permutation (4-8x) in minhash and once per bit
    position (~120x) in simhash. explode(array(e)) is row-preserving but
    sits in a Generate node, which projection collapse does not cross, so
    `expr` is evaluated exactly once per row (measured 4x+ on signature
    stages). No caching/checkpoint — still a pure streaming plan."""
    return df.select("*", F.explode(F.array(expr)).alias(name))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical text; digest-only
    shuffle."""
    h = F.md5(F.col(text_col)).alias("digest")
    return (
        df.select(F.col(id_col), h)
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Cross-corpus line-level dedup (the C4 recipe): every line keeps
    only its FIRST occurrence ordered by (doc_id, line_no); docs are
    reassembled from their surviving lines, and docs whose every line was
    seen earlier drop out entirely.

    Returns (doc_id, n_lines, n_kept, text) where n_lines counts the
    doc's original non-blank lines and text is the surviving lines
    re-joined by `sep` in original order.

    Scale shape: first-occurrence is a groupBy-min on md5(line) — NOT a
    window. Boilerplate lines ("all rights reserved") are mega-hot keys
    at corpus scale; a row_number window puts an entire hot key on one
    reducer with no combiner, while min(struct) gets map-side partial
    aggregation for free. The join back (exploded lines x one row per
    distinct line) is skewed on the same hot keys on the probe side —
    AQE skew-join splits those partitions; the reassembly groupBy keys on
    doc_id, which is uniform."""
    parts = F.split(F.col(text_col), sep)
    nonblank = F.filter(parts, lambda x: F.length(F.trim(x)) > 0)
    # split+filter once per row behind a Generate barrier — the projection
    # below references it twice (size + posexplode) and would otherwise
    # re-split the document for each
    src = _compute_once(df, nonblank, "_lines")
    lines = src.select(
        F.col(id_col), F.size("_lines").alias("n_lines"),
        F.posexplode("_lines").alias("line_no", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    firsts = lines.groupBy("lh").agg(
        F.min(F.struct(F.col(id_col).alias("d"),
                       F.col("line_no").alias("p"))).alias("first"))
    # merge hint: `firsts` has one row per DISTINCT LINE — it scales with
    # the corpus, so it must never be promoted to a broadcast build side
    # no matter what the size estimate says (a 10M-row promotion under a
    # generous threshold was measured wedging an 8g heap in a broadcast
    # spill-retry loop). Sort-merge keeps AQE's skew split for hot lines.
    kept = (lines.join(firsts.hint("merge"), "lh")
            .filter((F.col(id_col) == F.col("first.d"))
                    & (F.col("line_no") == F.col("first.p"))))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("line_no", "line"))),
        lambda s: s["line"])
    return (kept.groupBy(id_col, "n_lines")
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(ordered, sep).alias("text")))


# Karp-Rabin constants for the CDC boundary hash, shared (one-source)
# with the DuckDB twin emitted by cdc_boundary_sql(). Base/modulus are
# chosen so every intermediate stays inside signed-64 in BOTH engines
# without wraparound: h < MOD (2^31-1), h*BASE ~ 2.1e15, + codepoint
# (<= 0x10FFFF) — no overflow, no engine-specific wrap semantics.
CDC_BASE = 1_000_003
CDC_MOD = (1 << 31) - 1


def _cdc_window_hash(codes: Column, i, window: int) -> Column:
    """Polynomial hash of the `window` codepoints ending at 1-based
    position i: h = ((c1*B + c2) % M)*B + c3 ... — `window` integer
    multiply-adds per position, no string slicing, no md5."""
    h = F.element_at(codes, i - (window - 1))
    for k in range(1, window):
        h = (h * F.lit(CDC_BASE)
             + F.element_at(codes, i - (window - 1) + k)) % F.lit(CDC_MOD)
    return h


def cdc_boundary_sql(window: int = 8, mask_bits: int = 6,
                     s: str = "s") -> str:
    """DuckDB twin of the boundary predicate — generated from the SAME
    recurrence and constants as _cdc_window_hash, so the oracle cannot
    drift from the engine (`i` is the lambda variable of a
    list_filter(range(window, n+1), ...) call site)."""
    h = (f"CAST(ord(substr({s}, CAST(i - {window - 1} AS INT), 1))"
         f" AS BIGINT)")
    for k in range(1, window):
        h = (f"(({h}) * {CDC_BASE} + "
             f"ord(substr({s}, CAST(i - {window - 1 - k} AS INT), 1)))"
             f" % {CDC_MOD}")
    return f"({h}) % {1 << mask_bits} = 0"


def cdc_chunks(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", window: int = 8,
               mask_bits: int = 6) -> DataFrame:
    """Content-defined chunking (the sub-document granularity fuzzy
    dedup uses): a boundary falls after position i wherever the
    Karp-Rabin polynomial hash of the trailing `window` characters is
    0 mod 2^mask_bits, so expected chunk length is 2^mask_bits chars
    and — the CDC property — boundaries survive insertions/deletions
    elsewhere in the document, unlike fixed-width chunks. Emits one row
    per non-empty chunk: (doc_id, chunk_no, chunk_len, chunk_hash).

    Pure expressions, map-only. The codepoint array is materialized
    once per row behind a Generate barrier (_compute_once — Catalyst
    would otherwise re-split the string per element_at), then each
    position costs `window` integer multiply-adds: ~an order of
    magnitude cheaper per byte than the r3 md5-per-position form (md5
    allocates + hashes a fresh substring per char). Chunk hashes feed
    the exact_dedup/groupBy machinery for corpus-level chunk dedup.

    Caveat (documented, shared with the oracle): Spark's split('')
    yields UTF-16 code units, so non-BMP codepoints (outside the
    corpus' charset) would diverge from DuckDB's codepoint ord()."""
    s = F.col(text_col)
    n = F.length(s)
    pre = _compute_once(
        df, F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long")),
        "_codes")
    codes = F.col("_codes")
    pos = F.when(n >= window, F.sequence(F.lit(window), n)) \
        .otherwise(F.array().cast("array<int>"))
    bnds = F.filter(pos, lambda i: _cdc_window_hash(codes, i, window)
                    % F.lit(1 << mask_bits) == 0)
    # chunk edges: 0, each boundary, n — dedup'd (a boundary AT n would
    # otherwise create an empty trailing chunk) and n>0 guarded.
    # Materialized behind its own Generate barrier: the chunk lambda
    # below references bounds 3x per chunk via element_at, and codegen
    # CSE does not dedupe across lambda invocations — without the
    # barrier the whole boundary scan re-ran ~15x per doc (measured
    # 2.1s -> this fix targets the chunk stage, not the hash).
    pre = _compute_once(pre, F.array_distinct(F.concat(
        F.array(F.lit(0)), bnds, F.when(n > 0, F.array(n))
        .otherwise(F.array().cast("array<int>")))), "_bounds")
    bounds = F.col("_bounds")
    chunks = F.transform(
        F.when(F.size(bounds) >= 2, F.sequence(F.lit(1), F.size(bounds) - 1))
        .otherwise(F.array().cast("array<int>")),
        lambda j: F.struct(
            (j - 1).alias("chunk_no"),
            (F.element_at(bounds, j + 1) - F.element_at(bounds, j))
            .alias("chunk_len"),
            F.substring(s, F.element_at(bounds, j) + 1,
                        F.element_at(bounds, j + 1) - F.element_at(bounds, j))
            .alias("chunk")))
    ex = _compute_once(pre, chunks, "_ch") \
        .select(F.col(id_col), F.explode("_ch").alias("c"))
    return ex.select(
        id_col, F.col("c.chunk_no").alias("chunk_no"),
        F.col("c.chunk_len").cast("long").alias("chunk_len"),
        portable_hash(F.col("c.chunk")).alias("chunk_hash"))


def contamination_hits(train: DataFrame, eval_df: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n: int = 8, broadcast_eval: bool = True) -> DataFrame:
    """Eval-set decontamination (the pretraining hygiene step): per
    training doc, the number of DISTINCT word n-grams it shares with
    the eval corpus. Returns (doc_id, n_hits) for docs with >= 1 hit —
    the docs a decontaminated training run must drop or scrub.

    Scale shape: the eval side reduces to a distinct n-gram-hash set —
    benchmarks are tiny relative to a training corpus, so it broadcasts
    (set broadcast_eval=False for giant eval suites and AQE picks the
    join). The training side explodes per-doc DISTINCT shingle hashes
    map-side; the only shuffle is the per-doc count groupBy on uniform
    doc ids. Hash = the portable 60-bit md5 prefix, so SQL oracles
    reproduce the exact hit counts."""
    ev = (eval_df
          .select(F.explode(shingles(F.col(text_col), n)).alias("g"))
          .select(portable_hash(F.col("g")).alias("gh"))
          .distinct())
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = (train.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g"))
        .select(id_col, portable_hash(F.col("g")).alias("gh")))
    return (tr.join(ev, "gh")
            .groupBy(id_col).agg(F.count("*").alias("n_hits")))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 8,
                       shingle_n: int = 5) -> DataFrame:
    """doc -> minhash signature array<bigint> (num_perm values).

    h_i(doc) = min over shingles s of (a_i * H(s) + b_i) mod p, where
    H = 48-bit md5 prefix. Map-only; no shuffle; pure long codegen.
    """
    sh = shingles(F.col(text_col), shingle_n)
    # 48-bit md5 prefix: small enough for overflow-free long permutations.
    # Computed ONCE per row behind a Generate barrier — the md5 pass is
    # the expensive part and must not be re-inlined per permutation.
    hs = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long"))
    hashed = _compute_once(df, hs, "_hs")
    def _perm(a, b):
        return lambda h: (h * a + b) % F.lit(MERSENNE_P)

    sig_cols = []
    for i in range(num_perm):
        a, b = MINHASH_AS[i % len(MINHASH_AS)], MINHASH_BS[i % len(MINHASH_BS)]
        sig_cols.append(F.array_min(F.transform(F.col("_hs"), _perm(a, b)))
                        .cast("long").alias(f"mh_{i}"))
    return hashed.select(F.col(id_col), *sig_cols)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 4, rows_per_band: int = 2,
                        persist: bool = True) -> DataFrame:
    """Band the signature, bucket-join on (band, band-values): docs
    sharing any band become candidate pairs. The self-join shuffles on
    uniform minhash-value keys (no hub keys); output is (id_a < id_b)
    pairs, distinct because a pair can collide in several bands.

    `persist` materializes the signatures once before the self-join —
    without it each join side recomputes the full shingle+minhash
    pipeline (measured 3-4x wall-clock on the bench corpus). Lazy
    checkpoint (eager=False): both join sides share ONE checkpointed RDD,
    so signatures still compute once per action, and merely constructing
    the plan doesn't fire a Spark job. At 100TB the signatures would live
    in their own table anyway. The band
    key is the raw value array (array<long> joins hash natively) — no
    md5-over-concat per band per doc, and 16-byte keys instead of 32-char
    hash strings in the shuffle."""
    if persist:
        sigs = sigs.localCheckpoint(eager=False)
    # docs shorter than the shingle width have NULL signatures (array_min
    # of an empty shingle set) — they cannot be near-dup candidates, and
    # keeping them would bucket-join them together: Spark's array
    # equality compares [null, null] = [null, null] as TRUE (ordering
    # semantics), unlike SQL NULL join keys.
    sigs = sigs.filter(F.col("mh_0").isNotNull())
    band_cols = []
    for b in range(bands):
        vals = F.array(*[F.col(f"mh_{b * rows_per_band + r}")
                         for r in range(rows_per_band)])
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  vals.alias("bv")))
    banded = sigs.select(F.col(id_col),
                         F.explode(F.array(*band_cols)).alias("bb")) \
                 .select(id_col, "bb.band", "bb.bv")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage).
    Emits similarity as exact permille (intersection*1000/union)."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    a = sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b")
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a", "id_b",
        F.floor(inter * 1000.0 / F.greatest(union, F.lit(1))).cast("long")
        .alias("jaccard_permille"),
    )


def embedding_near_dup_pairs(emb: DataFrame, dim: int,
                             threshold_millis: int = 950,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 8,
                             quant_scale: int = 100) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: deterministic sign-sketch
    LSH blocking + exact cosine verification of bucket-mates only.

    Scale shape: the sketch is map-only; the self-join shuffles on the
    bucket id (2^n_planes uniform-ish keys), candidate volume is
    per-bucket quadratic — the LSH contract — never corpus-quadratic.
    SIZE n_planes TO THE CORPUS: expected bucket size is ~N/2^n_planes,
    and per-bucket work is its square — at 10^9+ rows use 24-32 planes
    (with multi-probe on the query side) or band several independent
    sketches like lsh_candidate_pairs; the default 8 is for
    million-row-scale inputs and tests.  CONSTRAINT: n_planes <= dim.
    k hyperplanes in d-dim space realize only 2*sum_{i<d} C(k-1, i)
    sign patterns (all 2^k iff k <= d), so planes beyond the embedding
    dimension add zero blocking power while the formula above keeps
    promising smaller buckets — measured as a quadratic blowup on a
    synthetic 8-dim corpus at 16 planes (tools/rehearsal_r5b.py).
    Engine-portable arithmetic throughout: vectors quantize to longs
    (round(x*scale)), hyperplanes are +-1 integers from the seeded LCG
    (similarity._hyperplane), and the emitted cos_millis is
    floor(1000*dot/sqrt(na*nb)) — integer dot/norms with one
    OVERFLOW BOUND: the norm product na*nb must fit int64, i.e.
    dim * (max|v| * quant_scale)^2 < 2^31.5 ~ 3.0e9 — at dim 64 with
    values in [-1, 1], quant_scale up to ~6800 is safe; unit-norm
    embeddings (|v_i| ~ 1/sqrt(dim)) allow ~scale*sqrt(dim) more.
    Both engines fail loudly (ANSI long overflow) rather than wrap, so
    a mis-sized scale is an error, not silent corruption — with one
    correctly-rounded IEEE sqrt, so a DuckDB oracle reproduces the exact
    pair set and values. Returns (id_a, id_b, cos_millis >= threshold).
    """
    from biocypher_metta_spark.operators.similarity import _hyperplane

    if n_planes > dim:
        raise ValueError(
            f"n_planes ({n_planes}) > dim ({dim}): only 2*sum_(i<dim) "
            "C(n_planes-1, i) sign patterns are geometrically realizable, "
            "so excess planes add no blocking power — buckets overload "
            "quadratically. Use n_planes <= dim.")
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * quant_scale).cast("long"))
    qdf = _compute_once(emb, q, "_q")
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(w).cast("long") for w in _hyperplane(dim, p + 1)])
        proj = F.aggregate(F.zip_with(F.col("_q"), plane, lambda x, w: x * w),
                           F.lit(0).cast("long"), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    norm = F.aggregate(F.col("_q"), F.lit(0).cast("long"),
                       lambda acc, v: acc + v * v)
    blocked = (qdf.select(F.col(id_col), F.col("_q"),
                          bucket.alias("_bkt"), norm.alias("_n"))
               .filter(F.col("_n") > 0))
    a, b = blocked.alias("a"), blocked.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a._q"), F.col("b._q"),
                                 lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    cos_millis = F.floor(F.lit(1000.0) * dot /
                         F.sqrt((F.col("a._n") * F.col("b._n")).cast("double")))
    return (
        a.join(b, (F.col("a._bkt") == F.col("b._bkt"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                cos_millis.cast("long").alias("cos_millis"))
        .filter(F.col("cos_millis") >= threshold_millis)
    )


def semantic_dedup(emb: DataFrame, dim: int,
                   threshold_millis: int = 950,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   n_planes: int = 8,
                   quant_scale: int = 100,
                   max_iter: int = 10) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    collapse groups of semantically near-identical items to ONE
    representative each (Abbas et al. 2023 prune web corpora ~50% this
    way with no quality loss — the single highest-leverage curation op
    after exact dedup).

    Composition of two already-oracled primitives: near-dup pairs from
    `embedding_near_dup_pairs` (sign-LSH blocking + exact quantized
    cosine >= threshold), closed transitively with
    `canonicalize.connected_components` so that chains a~b~c collapse
    to one survivor even when cos(a, c) < threshold (pair-local
    dropping would keep a and c — two mutually-near dups — whenever b
    is the only bridge). Representative = min id per component
    (deterministic, engine-portable).

    Returns every input id: (id_col, rep_id, keep) with rep_id = the
    component minimum (itself for singletons) and keep = (id ==
    rep_id). Survivor corpus = filter(keep); dedup map = (id, rep_id)
    for downstream reference rewriting.

    Scale shape: inherits the pair stage's LSH contract (bucket-
    quadratic, never corpus-quadratic — size n_planes to the corpus
    per embedding_near_dup_pairs' rule) plus log-diameter label
    propagation rounds over only the PAIRED nodes; the final left join
    maps results back over the full corpus on the uniform id key.
    Near-dup components are tiny by construction (near-identical
    content), so label propagation converges in 2-3 rounds."""
    from biocypher_metta_spark.canonicalize import connected_components

    pairs = embedding_near_dup_pairs(
        emb, dim, threshold_millis=threshold_millis, id_col=id_col,
        vec_col=vec_col, n_planes=n_planes, quant_scale=quant_scale)
    comp = connected_components(pairs, src="id_a", dst="id_b",
                                max_iter=max_iter)
    return (emb.select(F.col(id_col))
            .join(comp.withColumnRenamed("id", id_col), id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("component"), F.col(id_col))
                .alias("rep_id"),
                (F.coalesce(F.col("component"), F.col(id_col))
                 == F.col(id_col)).alias("keep")))


def excise_repeated_ngrams(df: DataFrame, n: int = 8, min_dup: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide repeated-substring removal at word-n-gram
    granularity — the practical Spark shape of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better")
    ExactSubstr dedup: any token covered by an n-gram that occurs >=
    min_dup times ACROSS THE CORPUS (multiplicities counted, so heavy
    in-doc repetition triggers too) is excised from the text; the rest
    of the document survives.  Complements doc-level dedup: boilerplate
    headers/footers/licenses repeat across millions of otherwise-unique
    pages, and doc-level dedup never touches them.

    A true distributed suffix array resolves arbitrary-length repeats;
    fixing the granularity at n tokens makes every stage a linear scan
    + uniform-key shuffle (the suffix-array sort is superlinear and its
    longest-match semantics are not cross-engine reproducible).  A
    length-L repeat still excises completely as its L-n+1 overlapping
    n-grams are each repeated.

    Returns (id_col, clean_text, n_tokens, n_removed) for EVERY input
    doc; clean_text is the surviving tokens joined by single spaces
    (whitespace is canonicalized — the same convention as the tokens()
    family).  Docs shorter than n tokens pass through untouched.

    Scale shape: all shuffles on uniform keys — (1) n-gram hash groupBy
    for corpus frequencies (map-side combine), (2) hash join of
    positions to repeated hashes, (3) (doc, token-pos) distinct +
    doc-keyed left_anti + ordered collect_list regroup.  Everything is
    linear in total token count, which is the floor for any operator
    that must rewrite every document.  No driver state, no arrays of
    corpus-sized data per row (removed positions stay ROW-granular
    until the final per-doc regroup)."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_dup < 2:
        raise ValueError(f"min_dup must be >= 2, got {min_dup}")
    from biocypher_metta_spark.operators.text import (portable_hash,
                                                      shingles, tokens)

    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))

    # shingles() tokenizes with the same tokens() split, so shingle
    # position p covers token positions p..p+n-1 of _toks exactly
    pos = (df.select(
        F.col(id_col),
        F.posexplode(shingles(F.col(text_col), n)).alias("_p", "_g"))
        .select(id_col, "_p", portable_hash(F.col("_g")).alias("_gh")))
    rep = (pos.groupBy("_gh").agg(F.count("*").alias("_c"))
           .filter(F.col("_c") >= min_dup).select("_gh"))
    removed = (pos.join(rep, "_gh")
               .select(F.col(id_col),
                       F.explode(F.sequence(F.col("_p"),
                                            F.col("_p") + (n - 1)))
                       .alias("_t"))
               .distinct())

    tok = base.select(F.col(id_col),
                      F.posexplode(F.col("_toks")).alias("_t", "_w"))
    kept = tok.join(removed, [id_col, "_t"], "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("_t"), F.col("_w")))),
                       lambda s: s["_w"]), " ").alias("clean_text"),
                    F.count("*").cast("long").alias("_n_kept")))
    n_rem = removed.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_n_rem"))
    return (base.select(F.col(id_col),
                        F.size("_toks").cast("long").alias("n_tokens"))
            .join(rebuilt, id_col, "left")
            .join(n_rem, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("clean_text"), F.lit(""))
                .alias("clean_text"),
                F.col("n_tokens"),
                F.coalesce(F.col("_n_rem"), F.lit(0)).cast("long")
                .alias("n_removed")))


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """SimHash over whitespace tokens: majority-vote of per-token hash
    bits. Pure expression work (aggregate over bit positions).

    Default 60 bits: the token hash is the engine-portable 60-bit md5
    prefix (operators.text.portable_hash), so a DuckDB oracle reproduces
    the signature exactly, and 60 splits evenly into the 4 blocks that
    hamming_near_pairs bands on (pigeonhole guarantee for dist<=3).

    Plan shape, measured (round 3, 500k x 80-token docs, local[32],
    identical signatures all variants): this 60x size(filter(...)) form
    7.2-9.7s; a single F.aggregate pass accumulating a 60-wide count
    array 17-19s (two 60-elem array allocations PER TOKEN in
    transform+zip_with dominate); 60 allocation-free per-bit
    F.aggregate sums 8.7-10.4s. The filter form stays — Catalyst keeps
    the whole loop in whole-stage codegen and the per-bit filtered
    array is cheaper than per-token accumulator churn."""
    if bits > 62:
        # 1 << 63 overflows a positive long literal (the sign bit); keep
        # the error actionable instead of a plan-build assertion
        raise ValueError(f"bits={bits} > 62 not supported (long sign bit)")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # hash tokens ONCE behind a Generate barrier — without it projection
    # collapse re-inlines the md5 token-hash array into every one of the
    # ~2*bits references below (measured: the whole signature stage is
    # md5-bound when inlined)
    hashed = _compute_once(df, F.transform(toks, portable_hash), "_th")
    th = F.col("_th")
    # for each bit position, count tokens with that bit set vs total
    def _bit_set(mask):
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_exprs = []
    for i in range(bits):
        mask = 1 << i
        ones = F.size(F.filter(th, _bit_set(mask)))
        bit = F.when(ones * 2 > F.size(th), F.lit(1)).otherwise(F.lit(0))
        bit_exprs.append(bit.cast("long") * F.lit(mask))
    sig = bit_exprs[0]
    for e in bit_exprs[1:]:
        sig = sig + e
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def hamming_near_pairs(sims: DataFrame, id_col: str = "doc_id",
                       max_dist: int = 3, bits: int = 60) -> DataFrame:
    """Near-dup pairs by SimHash: multi-block banding + exact popcount.

    The signature is cut into (max_dist + 1) disjoint blocks; a pair at
    hamming distance <= max_dist differs in at most max_dist blocks, so
    by pigeonhole it shares at least one block verbatim — blocking on
    EVERY block (explode + bucket self-join on (block_idx, block_val))
    therefore has recall 1.0, unlike a single-prefix block which misses
    pairs whose differing bits fall inside the prefix. The join keys are
    uniform token-hash material (no hub keys) and the candidate set is
    LSH-sized, never all-pairs. At extreme corpus sizes the block width
    (bits/(max_dist+1), 15 here) caps the key space at 2^15 per table —
    per-block population grows linearly with N and per-block work with
    its square, so beyond ~10^9 rows first collapse EXACT duplicates
    (group by full simhash) and/or widen bits via a longer signature;
    the pigeonhole guarantee holds for any width >= max_dist+1 split."""
    n_blocks = max_dist + 1
    width = bits // n_blocks
    if width * n_blocks != bits:
        raise ValueError(f"bits={bits} not divisible into {n_blocks} blocks")
    block_mask = (1 << width) - 1
    blocks = F.array(*[
        F.struct(
            F.lit(k).alias("blk"),
            F.shiftrightunsigned(F.col("simhash"), k * width)
             .bitwiseAND(F.lit(block_mask)).alias("bv"),
        )
        for k in range(n_blocks)
    ])
    blocked = (sims.select(F.col(id_col), F.col("simhash"),
                           F.explode(blocks).alias("bb"))
               .select(id_col, "simhash", "bb.blk", "bb.bv"))
    a, b = blocked.alias("a"), blocked.alias("b")
    xor = F.expr("a.simhash ^ b.simhash")
    dist = F.bit_count(xor)
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                dist.alias("hamming"))
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )


def set_similarity_join(df: DataFrame, tau_permille: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """EXACT all-pairs set-similarity join above a Jaccard threshold
    — the prefix-filtering algorithm (AllPairs / PPJoin family
    [Bayardo et al. WWW'07; Xiao et al. WWW'08]), the exact
    counterpart to the MinHash-LSH path above: LSH trades recall for
    speed; this returns EVERY pair with token-set Jaccard >=
    tau_permille/1000, no misses, no false positives. Output:
    (id_a < id_b, n_common, jaccard_permille).

    The pruning theorem: order every document's token set by ONE
    global total order and keep only a PREFIX of it; two sets can
    reach Jaccard tau only if their prefixes share a token. So
    candidates come from an equi-join on prefix tokens — never all
    pairs — and the exact verify runs only on them. The join is
    ASYMMETRIC (AllPairs indexing): every unordered pair is generated
    exactly once with the (n, key)-larger set PROBING and the smaller
    set INDEXED, so the two sides prune with different overlap lower
    bounds — probe o_p = ceil(tau*n) (J >= tau forces overlap >=
    tau*|union| >= tau*n), index o_i = ceil(2*tau/(1+tau) * n) (valid
    because the indexed side is the smaller one, so overlap >=
    tau/(1+tau)*(n_a+n_b) >= 2*tau/(1+tau)*n_b) — and each side keeps
    only its first n - o + 1 tokens. Disjoint prefixes of lengths
    n - o_p + 1 and n - o_i + 1 cap the true overlap at
    min(o_p, o_i) - 1 < the required overlap (pigeonhole on the
    global order), so no qualifying pair is dropped; the shorter
    index prefix cuts candidate collisions by ~pp/ip per set.

    The global order is (token frequency ASC, token ASC): rarest
    first, so prefixes are built from the least-common tokens and the
    candidate join collides as little as the corpus allows (a
    stopword in a prefix would pair half the corpus). The order is
    realized WITHOUT a global rank window: per doc we sort an array
    of (freq, token) structs — Spark's struct ordering IS the total
    order — so nothing ever funnels through one partition; the only
    shuffles are the token-frequency groupBy, the per-doc collect,
    the prefix-token candidate join, and the verify join of two
    bounded arrays (array_intersect is hash-based, O(|A|+|B|)).

    Scale shape vs LSH: prefix filtering is output-and-
    collision-bound — on corpora where near-dups are rare and tokens
    are Zipf, prefixes are rare tokens and the candidate join is
    tiny; on adversarial corpora (every doc shares its rarest token)
    it degrades toward the true pair count, which is the honest
    lower bound for an EXACT join. Use the LSH path when approximate
    recall is acceptable and the corpus is adversarial."""
    if not 1 <= tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in [1, 1000], "
                         f"got {tau_permille}")
    from biocypher_metta_spark.operators.text import tokens

    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct())
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_f"))
    per_doc = (toks.join(freq, "tok")
               .groupBy("id")
               .agg(F.sort_array(F.collect_list(
                   F.struct(F.col("_f"), F.col("tok")))).alias("_ord"),
                   F.count(F.lit(1)).cast("long").alias("_n")))
    # Boilerplate collapse (templated/near-dup corpora): docs with an
    # IDENTICAL token set verify against each other trivially
    # (Jaccard = 1000), so group by the set first — the quadratic
    # prefix join then runs once per DISTINCT SET, and same-set pairs
    # are emitted directly (output-bound: they are all true pairs at
    # any tau). On diverse corpora this costs one extra cheap groupBy.
    sets = (per_doc
            .groupBy("_ord", "_n")
            .agg(F.collect_list("id").alias("_ids")))
    # The set key is its MINIMUM member id — unique (every id belongs
    # to exactly one distinct-set row) and as compact as the id type,
    # so the candidate dedup below shuffles narrow keys instead of the
    # md5-of-token-list strings an earlier version used (measured 2x
    # on the gate corpus: the distinct was byte-bound, not row-bound).
    # Probe prefix o_p = ceil(tau*n); index prefix o_i =
    # ceil(2*tau/(1+tau) * n) — both in exact integer arithmetic.
    pp_len = (F.col("_n")
              - ((F.col("_n") * tau_permille + 999) / 1000)
              .cast("long") + 1)
    ip_len = (F.col("_n")
              - ((F.col("_n") * 2 * tau_permille
                  + (1000 + tau_permille - 1))
                 / (1000 + tau_permille))
              .cast("long") + 1)
    ord_toks = F.transform("_ord", lambda x: x["tok"])
    docs = sets.select(
        F.array_min("_ids").alias("_k"), "_n", "_ids",
        ord_toks.alias("_toks"),
        F.slice(ord_toks, F.lit(1), pp_len).alias("_pp"),
        F.slice(ord_toks, F.lit(1), ip_len).alias("_ip"))
    gid = docs.select("_k", "_n", F.explode("_ids").alias("id"))
    same = (gid.select("_k", F.col("id").alias("id_a"),
                       F.col("_n").alias("n_common"))
            .join(gid.select("_k", F.col("id").alias("id_b")), "_k")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "n_common",
                    F.lit(1000).cast("long").alias("jaccard_permille")))
    pa = docs.select(F.col("_k").alias("_ka"),
                     F.col("_n").alias("_pna"),
                     F.explode("_pp").alias("tok"))
    pb = docs.select(F.col("_k").alias("_kb"),
                     F.col("_n").alias("_pnb"),
                     F.explode("_ip").alias("tok"))
    # The (n, key) struct order makes "b strictly before a" total, so
    # each unordered pair is generated once, always with the smaller
    # set on the index side (the o_i bound's precondition). PPJoin
    # length filter: J >= tau forces n_b >= tau*n_a; the opposite
    # direction is implied by n_a >= n_b. Applied IN the candidate
    # join, before the pair dedup and the array verify.
    cand = (pa.join(pb, "tok")
            .filter(F.struct(F.col("_pnb"), F.col("_kb"))
                    < F.struct(F.col("_pna"), F.col("_ka")))
            .filter(F.lit(1000) * F.col("_pnb")
                    >= F.lit(tau_permille) * F.col("_pna"))
            .select("_ka", "_kb").distinct())
    j = (cand
         .join(docs.select(F.col("_k").alias("_ka"),
                           F.col("_toks").alias("_ta"),
                           F.col("_n").alias("_na")), "_ka")
         .join(docs.select(F.col("_k").alias("_kb"),
                           F.col("_toks").alias("_tb"),
                           F.col("_n").alias("_nb")), "_kb"))
    inter = F.size(F.array_intersect("_ta", "_tb")).cast("long")
    setp = (j.select("_ka", "_kb", inter.alias("n_common"),
                     (F.col("_na") + F.col("_nb") - inter).alias("_u"))
            .filter(F.lit(1000) * F.col("n_common")
                    >= F.lit(tau_permille) * F.col("_u")))
    cross = (setp
             .join(gid.select(F.col("_k").alias("_ka"),
                              F.col("id").alias("_ia")), "_ka")
             .join(gid.select(F.col("_k").alias("_kb"),
                              F.col("id").alias("_ib")), "_kb")
             .select(F.least("_ia", "_ib").alias("id_a"),
                     F.greatest("_ia", "_ib").alias("id_b"),
                     "n_common",
                     F.floor(F.lit(1000) * F.col("n_common")
                             / F.col("_u"))
                     .cast("long").alias("jaccard_permille")))
    return same.unionByName(cross)


def set_similarity_join_sql(docs_sql: str, tau_permille: int,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    """DuckDB twin of set_similarity_join: the BRUTE-FORCE
    formulation (token equi-join over ALL pairs sharing any token,
    then the exact integer threshold) — a completely independent
    plan with no prefix logic, so a green gate proves the pruning
    theorem dropped nothing. Gate-size only by construction."""
    if not 1 <= tau_permille <= 1000:
        raise ValueError("tau_permille must be in [1, 1000]")
    return rf"""WITH ssj_tk AS MATERIALIZED (
  SELECT DISTINCT {id_col} AS id, tok FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array(trim({text_col}), '\s+')) AS tok
    FROM (
{docs_sql.strip()}
    )
  ) WHERE tok <> ''
), ssj_sz AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS n FROM ssj_tk GROUP BY 1
), ssj_i AS MATERIALIZED (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_common
  FROM ssj_tk a JOIN ssj_tk b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       CAST(floor(1000.0 * n_common
                  / (na.n + nb.n - n_common)) AS BIGINT)
         AS jaccard_permille
FROM ssj_i
JOIN ssj_sz na ON id_a = na.id
JOIN ssj_sz nb ON id_b = nb.id
WHERE 1000 * n_common >= {tau_permille} * (na.n + nb.n - n_common)"""


def edit_distance_join(df: DataFrame, max_dist: int,
                       str_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """EXACT all-pairs edit-distance join: every pair of rows whose
    strings are within Levenshtein distance `max_dist` — the PassJoin
    partition scheme [Li et al., VLDB'11], the string-metric sibling
    of set_similarity_join above. No misses, no false positives.

    The pruning lemma: split every string into d+1 contiguous
    segments. Each of the d edits touches at most one segment (indels
    SHIFT later segments but do not edit them), so for A within
    distance d of B at least one of A's segments survives UNEDITED
    and appears in B verbatim, shifted by at most the net indels
    (<= d). Candidates therefore come from an equi-join between A's
    (segment value, slot, |A|) triples and B's enumerated substrings
    at compatible (slot, partner-length, +-d position window) — the
    exact verify is a length filter plus levenshtein on survivors.

    Why segments and not q-gram prefixes (the Ed-Join alternative):
    on low-entropy alphabets (numeric ids, codes) the 2-gram space
    has ~100 values, so at corpus scale every "rare" gram still
    collides tens of thousands of times and the candidate join
    explodes — measured running a 32-thread box out of shuffle disk
    at 300k digit strings. Segment values are length-L/(d+1)
    substrings: their selectivity GROWS with string length instead of
    saturating with the alphabet.

    Operating envelope: candidate volume is the product of segment-
    bucket collision rates, so a corpus where a LITERAL SHARED PREFIX
    occupies a whole segment slot ("Customer#0000...", "rec...")
    degrades that slot to alphabet-of-the-remainder entropy — at
    millions of rows the slot-0 bucket join dominates (measured: OOM
    at 1M strings sharing a 3-char literal prefix). Strip shared
    boilerplate prefixes first (they carry no distance information)
    or fall back to the LSH/set-similarity path; this is the exact-
    join analogue of stopwords poisoning prefix filtering.

    Strings too short to carry d+1 non-degenerate segments
    (len <= 2d) take a dedicated complete path over their BOUNDED
    distinct values (length-band equi-join + exact verify, expanded
    back to ids); identical short values pair by a self-join on the
    value. Long/short mixed pairs are covered by the substring
    enumeration spanning partner lengths down to len-d. Everything
    unions and dedups.

    Output: (id_a < id_b, dist), output-bound on true pairs plus
    segment collisions.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    d = max_dist
    k = d + 1  # number of segments
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(str_col).alias("s"))
            .filter(F.col("s").isNotNull()))
    slen = F.length("s")

    # ---- long path: PassJoin segment <-> substring join -----------
    longs = base.filter(slen > 2 * d)
    # even split: slot j (0-based) of a length-L string starts at
    # 1 + j*floor(L/k) + min(j, L mod k) and has length
    # floor(L/k) + (1 if j < L mod k else 0)
    jj = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    segs = longs.select("id", slen.alias("_la"), "s", jj)
    seg_start = (F.lit(1) + F.col("j") * (F.col("_la") / k).cast("long")
                 + F.least(F.col("j"), F.col("_la") % k))
    seg_len = ((F.col("_la") / k).cast("long")
               + F.when(F.col("j") < F.col("_la") % k, 1).otherwise(0))
    segs = segs.select(
        "id", "_la", "j",
        F.col("s").substr(seg_start.cast("int"),
                          seg_len.cast("int")).alias("val"))
    # probe side: for every string B, every partner length la in
    # [len-d, len+d] (capped below at the long-path floor), every
    # slot, every start within +-d of the slot's position in la
    la = F.explode(F.sequence(slen - d, slen + d)).alias("_la")
    probe = (base.select("id", F.col("s"), slen.alias("_lb"))
             .select("id", "s", "_lb", la)
             .filter(F.col("_la") > 2 * d)
             .select("id", "s", "_lb", "_la",
                     F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
                     .alias("j")))
    p_start = (F.lit(1) + F.col("j") * (F.col("_la") / k).cast("long")
               + F.least(F.col("j"), F.col("_la") % k))
    p_len = ((F.col("_la") / k).cast("long")
             + F.when(F.col("j") < F.col("_la") % k, 1).otherwise(0))
    # Spark's sequence(a, b) DESCENDS when a > b — guard the window
    # to hi >= lo before exploding, or empty windows emit garbage
    lo = F.greatest(p_start - d, F.lit(1))
    hi = F.least(p_start + d, F.col("_lb") - p_len + 1)
    probe = (probe
             .select("id", "s", "_la", "j", p_len.alias("_pl"),
                     lo.alias("_lo"), hi.alias("_hi"))
             .filter(F.col("_hi") >= F.col("_lo"))
             .select("id", "s", "_la", "j", "_pl",
                     F.explode(F.sequence("_lo", "_hi")).alias("_st"))
             .select("id", "_la", "j",
                     F.col("s").substr(F.col("_st").cast("int"),
                                       F.col("_pl").cast("int"))
                     .alias("val")))
    # merge hint: BOTH sides of the segment join scale with the
    # corpus (segs ~ (d+1) rows/string, probe ~ O(d^2) rows/string) —
    # a size misestimate promoting either to a broadcast build blows
    # the heap (same failure mode line_dedup documents for `firsts`)
    cand_long = (segs.select(F.col("id").alias("_ida"), "_la", "j", "val")
                 .hint("merge")
                 .join(probe.select(F.col("id").alias("_idb"),
                                    "_la", "j", "val"),
                       ["val", "j", "_la"])
                 .filter(F.col("_ida") != F.col("_idb"))
                 .select(F.least("_ida", "_idb").alias("_ida"),
                         F.greatest("_ida", "_idb").alias("_idb"))
                 .distinct())

    # ---- short path: bounded distinct values, complete ------------
    shorts = base.filter(slen <= 2 * d)
    sv = shorts.select("s").distinct()
    sv_probe = sv.select(
        "s", F.explode(F.sequence(F.length("s"),
                                  F.length("s") + d)).alias("_lk"))
    # probing covers pairs ordered by LENGTH (shorter side probes up);
    # canonicalize by value afterwards — requiring s < _s2 here would
    # drop pairs where the shorter string sorts lexicographically
    # higher (caught by the randomized twin in development)
    vp = (sv_probe
          .join(sv.select(F.col("s").alias("_s2"),
                          F.length("s").alias("_lk")), "_lk")
          .filter(F.col("s") != F.col("_s2"))
          .filter(F.levenshtein("s", "_s2") <= d)
          .select(F.least("s", "_s2").alias("s"),
                  F.greatest("s", "_s2").alias("_s2")).distinct())
    ids_of = shorts.groupBy("s").agg(F.collect_list("id").alias("_ids"))
    cand_sv = (vp.join(ids_of, "s")
               .join(ids_of.select(F.col("s").alias("_s2"),
                                   F.col("_ids").alias("_ids2")), "_s2")
               .select(F.explode("_ids").alias("_ia"), "_ids2")
               .select("_ia", F.explode("_ids2").alias("_ib")))
    same_v = (shorts.select("s", F.col("id").alias("_ia"))
              .join(shorts.select("s", F.col("id").alias("_ib")), "s")
              .filter(F.col("_ia") < F.col("_ib"))
              .select("_ia", "_ib"))
    # short x long pairs: a short A (len <= 2d) within d of a long B
    # (len > 2d) forces len(B) <= len(A) + d <= 3d — join the bounded
    # short values against the bounded-length longs by length band
    nearlong = (base.filter((slen > 2 * d) & (slen <= 3 * d))
                .select(F.col("id").alias("_ib"),
                        F.col("s").alias("_s2"),
                        F.length("s").alias("_ll")))
    mixed = (sv_probe
             .join(nearlong, sv_probe["_lk"] == nearlong["_ll"])
             .filter(F.levenshtein("s", "_s2") <= d)
             .join(ids_of, "s")
             .select(F.explode("_ids").alias("_ia"), "_ib"))
    cand_short = (cand_sv.union(same_v).union(mixed)
                  .select(F.least("_ia", "_ib").alias("_ida"),
                          F.greatest("_ia", "_ib").alias("_idb"))
                  .distinct())

    # ---- verify + union --------------------------------------------
    cand = cand_long.union(cand_short).distinct()
    j = (cand
         .hint("merge")
         .join(base.select(F.col("id").alias("_ida"),
                           F.col("s").alias("_sa")), "_ida")
         .join(base.select(F.col("id").alias("_idb"),
                           F.col("s").alias("_sb")), "_idb"))
    dist = F.levenshtein("_sa", "_sb")
    return (j.filter(
        (F.abs(F.length("_sa") - F.length("_sb")) <= d)
        & (dist <= d))
        .select(F.col("_ida").alias("id_a"),
                F.col("_idb").alias("id_b"),
                dist.cast("long").alias("dist")))


def edit_distance_join_sql(docs_sql: str, max_dist: int,
                           str_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """DuckDB twin of edit_distance_join: BRUTE-FORCE all pairs with a
    plain levenshtein threshold — zero gram logic, so a green gate
    proves the Ed-Join prefix lemma dropped nothing. Gate-size inputs
    only by construction."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    return f"""WITH edj AS MATERIALIZED (
  SELECT {id_col} AS id, {str_col} AS s FROM (
{docs_sql.strip()}
  ) WHERE {str_col} IS NOT NULL
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM edj a JOIN edj b ON a.id < b.id
WHERE abs(length(a.s) - length(b.s)) <= {max_dist}
  AND levenshtein(a.s, b.s) <= {max_dist}"""


def containment_join(df: DataFrame, tau_permille: int,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """EXACT asymmetric containment join: every ORDERED pair (A, B)
    with |A∩B| / |A| >= tau_permille/1000 over distinct token sets —
    the near-SUPERSET screen Jaccard misses entirely: a page embedded
    verbatim inside a longer aggregator page has containment ~1 but
    Jaccard |A|/|B| (arbitrarily small), so symmetric dedup keeps
    both and the training set still carries the duplicated text
    [Lee et al. 2021's motivation for substring-level dedup; this is
    the set-level form].

    Prefix-filter pruning, containment-shaped: C(A->B) >= tau forces
    |A∩B| >= ceil(tau*n_a), i.e. B misses AT MOST n_a - ceil(tau*n_a)
    of A's tokens — so by pigeonhole B contains one of A's FIRST
    n_a - ceil(tau*n_a) + 1 tokens under any global total order
    (rarest-first here: (corpus frequency ASC, token ASC), realized
    per doc by sorting (freq, token) structs — no global rank
    window). Only the PROBE side prunes: containment puts no
    constraint on |B|, so the index side carries every token — the
    asymmetry that distinguishes this from set_similarity_join's
    two-sided prefixes. Candidates come from the (probe prefix token
    = index token) equi-join; the exact verify intersects the two
    bounded token arrays (hash-based, O(|A|+|B|)). No false drops
    (pigeonhole), no false keeps (verify is exact).

    Output (id_a, id_b, n_a, n_common, containment_permille) with the
    permille floored; ordered pairs, id_a != id_b.

    Scale shape: token-frequency groupBy, per-doc collect, the
    prefix-vs-all candidate join, two id-keyed joins back for the
    verify arrays. Probe prefixes are built from each doc's RAREST
    tokens, so candidate volume tracks true-pair volume on Zipf
    corpora; the index side's stopword keys are harmless because the
    probe side never emits stopwords unless a doc is so small (or tau
    so low) that its prefix reaches them — at tau 0.5 a 10-token doc
    probes 6 tokens; the honest degradation is toward the true pair
    count, the lower bound for an EXACT join."""
    if not 1 <= tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in [1, 1000], "
                         f"got {tau_permille}")
    from biocypher_metta_spark.operators.text import tokens

    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != "")
            .distinct())
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_f"))
    per_doc = (toks.join(freq, "tok")
               .groupBy("id")
               .agg(F.transform(
                   F.sort_array(F.collect_list(
                       F.struct(F.col("_f"), F.col("tok")))),
                   lambda s: s["tok"]).alias("_ord"),
                   F.count(F.lit(1)).cast("long").alias("_n")))
    # ceil(tau*n/1000) without floats; prefix = n - ceil + 1
    ceil_ov = F.floor((F.lit(tau_permille) * F.col("_n")
                       + F.lit(999)) / F.lit(1000)).cast("long")
    probe = (per_doc
             .select(F.col("id").alias("id_a"),
                     F.explode(F.slice(
                         F.col("_ord"), F.lit(1),
                         (F.col("_n") - ceil_ov + F.lit(1))
                         .cast("int"))).alias("tok")))
    cand = (probe.join(toks.select(F.col("id").alias("id_b"), "tok"),
                       "tok")
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())
    a_side = per_doc.select(F.col("id").alias("id_a"),
                            F.col("_ord").alias("_sa"),
                            F.col("_n").alias("n_a"))
    b_side = per_doc.select(F.col("id").alias("id_b"),
                            F.col("_ord").alias("_sb"))
    common = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    return (cand.join(a_side, "id_a").join(b_side, "id_b")
            .withColumn("n_common", common.cast("long"))
            .filter(F.lit(1000) * F.col("n_common")
                    >= F.lit(tau_permille) * F.col("n_a"))
            .select("id_a", "id_b", "n_a", "n_common",
                    F.floor(F.lit(1000) * F.col("n_common")
                            / F.col("n_a")).cast("long")
                    .alias("containment_permille")))


def containment_join_sql(docs_sql: str, tau_permille: int,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """Oracle twin of containment_join: BRUTE-FORCE all-pairs via the
    full token equi-join, no prefix pruning — an independent spelling
    whose agreement also certifies the pigeonhole pruning theorem
    (any pair the prefix filter dropped would show up here)."""
    if not 1 <= tau_permille <= 1000:
        raise ValueError(f"tau_permille must be in [1, 1000], "
                         f"got {tau_permille}")
    return rf"""WITH cj_t AS MATERIALIZED (
  SELECT DISTINCT id, tok FROM (
    SELECT {id_col} AS id,
           unnest(regexp_split_to_array(trim({text_col}), '\s+')) AS tok
    FROM (
{docs_sql.strip()}
    )
  ) WHERE tok <> ''
), cj_n AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n FROM cj_t GROUP BY id
), cj_c AS (
  SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS c
  FROM cj_t a JOIN cj_t b ON a.tok = b.tok AND a.id <> b.id
  GROUP BY a.id, b.id
)
SELECT cj_c.id_a, cj_c.id_b, cj_n.n AS n_a, cj_c.c AS n_common,
       (1000 * cj_c.c) // cj_n.n AS containment_permille
FROM cj_c JOIN cj_n ON cj_n.id = cj_c.id_a
WHERE 1000 * cj_c.c >= {tau_permille} * cj_n.n"""
