"""Engine-portable cardinality sketch: K-Minimum-Values (KMV).

Spark's native approx_count_distinct and DuckDB's are both HLL — but
DIFFERENT HLLs, so their estimates can never hash-match in a
cross-engine gate. KMV (Bar-Yossef et al. 2002) is the sketch whose
every intermediate is deterministic given a deterministic hash: keep
the k smallest 60-bit portable md5 hashes of the distinct values; the
kth minimum h_k estimates density, distinct ~= (k-1) * 2^60 / h_k.
Same hashes -> same k-minima -> same integer estimate in any engine.

Scale shape: one shuffle on the (uniform) hash for distinct, then a
global k-smallest via orderBy+limit — Spark plans TakeOrdered (per
partition top-k, tiny driver merge), never a full sort. The k-minima
set is mergeable (union two sketches, keep the k smallest), which is
what makes KMV a rollup-friendly sketch: per-partition/per-day sketch
rows can reaggregate like the hypertable rollup does for sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import portable_hash

HASH_SPACE = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row DataFrame (k, n_sketch, h_k, estimate) estimating the
    number of distinct `col` values. When fewer than k distinct values
    exist the sketch is exact (estimate = n_sketch). The estimate is
    floor((k-1) * (2^60 / h_k)) with the division in double — both
    engines convert int64 -> double with IEEE round-to-nearest, so the
    arithmetic is bit-identical cross-engine."""
    if k < 2:
        raise ValueError("k must be >= 2")
    # NULL values hash to NULL; Spark sorts NULLs FIRST ascending, so an
    # unfiltered NULL would occupy a k-minima slot (inflating n_sketch
    # while F.max ignores it) and diverge from engines that sort NULLs
    # last — a sketch counts distinct VALUES, so drop NULL explicitly.
    kmin = (df.select(portable_hash(F.col(col)).alias("h"))
            .filter(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k))
    agg = kmin.agg(F.count("*").alias("n_sketch"),
                   F.max("h").alias("h_k"))
    return agg.select(
        F.lit(k).alias("k"),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.col("h_k").cast("long").alias("h_k"),
        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
        .otherwise(F.floor((k - 1)
                           * (F.lit(HASH_SPACE) / F.col("h_k"))))
        .cast("long").alias("estimate"))


def kmv_minima_by(df: DataFrame, group_cols: list, col: str,
                  k: int = 64, salt_buckets: int = 8) -> DataFrame:
    """Per-group KMV sketch STATE: (group..., h) rows holding each
    group's k smallest distinct hashes — the mergeable representation
    (union two groups' rows, keep the k smallest, and you have the
    sketch of the union, same as hypertable_rollup reaggregates sums).

    Scale shape: min-k per group cannot use collect_set (unbounded agg
    state for a high-cardinality group) or a single per-group window
    (one task sorts the whole group — the as-of hot-key problem). Two
    stages instead: (1) distinct on (group, h) — one shuffle, uniform
    keys; (2) top-k within (group, h % salt_buckets) — any single
    task sorts ~1/salt_buckets of the group; (3) top-k over the
    <= salt_buckets*k survivors per group — trivially small. Size
    salt_buckets to the hottest group (n_distinct / buckets rows per
    task)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    from pyspark.sql import Window

    d = (df.select(*group_cols, portable_hash(F.col(col)).alias("h"))
         .filter(F.col("h").isNotNull())
         .distinct())
    w1 = (Window.partitionBy(*group_cols, F.pmod(F.col("h"),
                                                 F.lit(salt_buckets)))
          .orderBy("h"))
    cand = (d.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k).drop("_rn"))
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (cand.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k).drop("_rn"))


def _estimate_from_minima(minima: DataFrame, group_cols: list,
                          k: int) -> DataFrame:
    agg = minima.groupBy(*group_cols).agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("h_k"))
    return agg.select(
        *group_cols,
        F.lit(k).alias("k"),
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.col("h_k").cast("long").alias("h_k"),
        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
        .otherwise(F.floor((k - 1) * (F.lit(HASH_SPACE) / F.col("h_k"))))
        .cast("long").alias("estimate"))


def kmv_distinct_by(df: DataFrame, group_cols: list, col: str,
                    k: int = 64, salt_buckets: int = 8) -> DataFrame:
    """Per-group KMV estimates: one row (group..., k, n_sketch, h_k,
    estimate) per group, exact below k distinct. Same estimator as the
    global kmv_distinct; grouping via kmv_minima_by's two-stage top-k."""
    return _estimate_from_minima(
        kmv_minima_by(df, group_cols, col, k, salt_buckets),
        group_cols, k)


def histogram_by(df: DataFrame, group_cols: list, col: str,
                 bin_width: int) -> DataFrame:
    """Fixed-bin histogram sketch: (group..., bin, n) with bin =
    floor(col / bin_width). The OTHER mergeable sketch family member
    (KMV above merges by k-minima union; histograms merge by summing n
    per bin — the hypertable-rollup property), and the deterministic
    cross-engine alternative to t-digest/approx_percentile for
    distribution stats: every intermediate is an integer, so a DuckDB
    twin hash-matches exactly, which no randomized/centroid sketch can.

    Scale shape: one shuffle on (group, bin) with map-side combine; the
    sketch size is bounded by value-range / bin_width per group — it
    scales with the DOMAIN, not the row count. floor-division (via
    double floor, both engines round-to-nearest then floor identically
    for |v| < 2^52) keeps negative values in the right bin."""
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")
    b = F.floor(F.col(col) / F.lit(float(bin_width)))
    return (df.filter(F.col(col).isNotNull())
            .groupBy(*group_cols, b.cast("long").alias("bin"))
            .agg(F.count("*").cast("long").alias("n")))


def quantiles_from_histogram(hist: DataFrame, group_cols: list,
                             quantiles_permille: list,
                             bin_width: int) -> DataFrame:
    """Per-group quantiles from histogram state: for each q (permille),
    the smallest bin whose cumulative count reaches ceil(q * total /
    1000) — i.e. the bin CONTAINING the q-quantile; q_lo = bin *
    bin_width is its lower edge (estimate error <= bin_width, the
    standard fixed-bin guarantee). Output: (group..., q_permille, q_lo,
    n_rows). All-integer thresholds so the DuckDB twin is exact.

    Scale shape: the window runs over SKETCH rows (bins per group —
    domain-bounded, typically tens), not data rows; the quantile
    explode multiplies bins x #quantiles then filters map-side. Raw
    data is never re-scanned — this is the two-stage sketch contract
    (hist once, query many)."""
    from pyspark.sql import Window

    wc = (Window.partitionBy(*group_cols).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(*group_cols)
    c = (hist
         .withColumn("cum", F.sum("n").over(wc))
         .withColumn("total", F.sum("n").over(wt)))
    q = c.select(
        *group_cols, "bin", "n", "cum", "total",
        F.explode(F.array(*[F.lit(int(p)) for p in quantiles_permille]))
        .alias("q_permille"))
    thresh = F.floor((F.col("q_permille") * F.col("total") + 999)
                     / F.lit(1000.0))
    return (q.filter((F.col("cum") >= thresh)
                     & (F.col("cum") - F.col("n") < thresh))
            .select(*group_cols,
                    F.col("q_permille").cast("int").alias("q_permille"),
                    (F.col("bin") * bin_width).cast("long").alias("q_lo"),
                    F.col("total").cast("long").alias("n_rows")))


def cms_build(df: DataFrame, col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Count-min sketch state: (d, w, n) counter rows, one per occupied
    cell of a depth x width counter grid — row d counts occurrences in
    bucket w = portable_hash('cms<d>:' || value) % width. The THIRD
    mergeable sketch family member (KMV: distinct counts; histogram:
    quantiles; CMS: per-item FREQUENCIES): merge = sum n per (d, w)
    cell, exactly the hypertable-rollup property, so per-day/partition
    sketch rows reaggregate without rescanning raw data. Point lookups
    (cms_lookup) take min over the depth rows — an overestimate with
    the standard (Cormode-Muthukrishnan 2005) guarantee: err <=
    e/width * total_count with prob 1 - e^-depth. Deterministic given
    the portable hash, so a DuckDB twin hash-matches exactly — which
    no native randomized sketch can.

    Scale shape: one depth-way map-side explode then a groupBy on
    (d, w) — at most depth*width output rows regardless of input size
    (sketch scales with the GRID, not the data), uniform keys by
    construction (that is what the hash rows are for), full map-side
    combine. NULLs are dropped: a frequency sketch counts values."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    if width < 2:
        raise ValueError("width must be >= 2")
    v = F.col(col).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(portable_hash(F.concat(F.lit(f"cms{d}:"), v)),
                   F.lit(width)).alias("w"))
        for d in range(depth)])
    return (df.filter(F.col(col).isNotNull())
            .select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.d").cast("int").alias("d"),
                     F.col("c.w").cast("long").alias("w"))
            .agg(F.count("*").cast("long").alias("n")))


def cms_lookup(cms: DataFrame, values: list, depth: int,
               width: int) -> DataFrame:
    """Point-frequency estimates from CMS state: one row (value,
    estimate) per probe value, estimate = min over d of the (d, h_d(v))
    cell (0 when every cell is absent — value never seen, modulo
    collisions). The probe set is small by contract (it's a lookup,
    not a scan), so the plan is a broadcast join of the <= depth*width
    sketch rows against the exploded probes — no shuffle of anything
    data-sized."""
    spark = cms.sparkSession
    probes = spark.createDataFrame([(str(v),) for v in values],
                                   ["value"])
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(portable_hash(F.concat(F.lit(f"cms{d}:"),
                                          F.col("value"))),
                   F.lit(width)).alias("w"))
        for d in range(depth)])
    pr = (probes.select("value", F.explode(cells).alias("c"))
          .select("value", F.col("c.d").alias("d"),
                  F.col("c.w").alias("w")))
    joined = pr.join(F.broadcast(cms), ["d", "w"], "left")
    return (joined.groupBy("value")
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0)))
                 .cast("long").alias("estimate")))


def cms_sql(values: list, depth: int, width: int,
            source_sql: str, col: str = "value") -> str:
    """DuckDB twin of cms_build + cms_lookup over `source_sql` (a query
    yielding one row per occurrence with column `col`), GENERATED from
    the same salt/width constants so both sides share one source of
    truth. Probe estimates only (the grid itself is an intermediate)."""
    probe_rows = ", ".join(f"('{v}')" for v in values)
    d_rows = ", ".join(f"({d})" for d in range(depth))
    return f"""
WITH src AS (
{source_sql.strip()}
), cms AS (
  SELECT d.d AS d,
         ('0x' || substr(md5('cms' || d.d || ':' || CAST({col} AS VARCHAR)),
          1, 15))::BIGINT % {width} AS w,
         CAST(count(*) AS BIGINT) AS n
  FROM src, (VALUES {d_rows}) AS d(d)
  WHERE {col} IS NOT NULL
  GROUP BY 1, 2
), probes AS (
  SELECT p.value, d.d AS d,
         ('0x' || substr(md5('cms' || d.d || ':' || p.value), 1,
          15))::BIGINT % {width} AS w
  FROM (VALUES {probe_rows}) AS p(value), (VALUES {d_rows}) AS d(d)
)
SELECT probes.value AS value,
       CAST(min(coalesce(cms.n, 0)) AS BIGINT) AS estimate
FROM probes LEFT JOIN cms USING (d, w)
GROUP BY probes.value
"""


def kmv_merge_minima(minima: DataFrame, group_cols: list,
                     k: int) -> DataFrame:
    """Merge sketch-state rows (e.g. per-day sketches) down to coarser
    groups: keep the k smallest hashes per surviving group. Input rows
    are already <= k per finer group, so any single merge task handles
    (finer_groups_per_coarse * k) rows — the reaggregation is always
    cheaper than resketching raw data."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (minima.select(*group_cols, "h").distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


# ---------------------------------------------------------------- Bloom

def _bloom_hashes(col: str, m_bits: int):
    """(h1m, h2m) column pair for double hashing [Kirsch-Mitzenmacher]:
    probe_i = (h1m + i*h2m) % m_bits. Both are reduced mod m_bits BEFORE
    any addition so no intermediate can overflow int64; h2m is forced
    odd (| 1) so the stride is coprime with the power-of-two m_bits and
    the k probes never collapse onto one position."""
    v = F.col(col).cast("string")
    h1 = portable_hash(v)
    h2 = portable_hash(F.concat(v, F.lit("\x1fB")))
    return h1 % m_bits, (h2 % m_bits).bitwiseOR(1)


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 16,
                k: int = 4) -> DataFrame:
    """Build a Bloom filter over the distinct non-NULL values of `col`
    as a (word_idx, bits) word table: 32 filter bits per int64 word
    (bits 32..63 stay zero, so shifts are overflow-free in any engine).

    Cross-engine determinism is the design driver (same reason KMV
    replaces HLL above): positions come from the portable 60-bit md5
    hash via double hashing, so Spark and the DuckDB twin set — and
    later probe — EXACTLY the same bits; even false positives agree.

    Scale shape: one explode to k position rows per input value, one
    groupBy word_idx with map-side bit_or combine — output is bounded
    by m_bits/32 rows REGARDLESS of input size (the CMS/KMV property).
    Word tables from disjoint inputs merge by bit_or on word_idx."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    h1m, h2m = _bloom_hashes(col, m_bits)
    pos = (df.filter(F.col(col).isNotNull())
           .select(h1m.alias("_h1"), h2m.alias("_h2"))
           .select(F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
                   "_h1", "_h2")
           .select(((F.col("_h1") + F.col("_i") * F.col("_h2")) % m_bits)
                   .alias("_p")))
    # F.shiftleft takes a Python-int shift amount only; the SQL form
    # accepts a column.
    return (pos.groupBy((F.col("_p") / 32).cast("long").alias("word_idx"))
            .agg(F.bit_or(F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))"))
                 .alias("bits"))
            .select("word_idx", F.col("bits").cast("long").alias("bits")))


_BLOOM_LITERAL_WORDS_MAX = 1024  # literal int64-array path above this


def bloom_prefilter(probe: DataFrame, words: DataFrame, col: str,
                    m_bits: int = 1 << 16, k: int = 4) -> DataFrame:
    """Keep the probe rows whose `col` MAY be in the set the word table
    was built over (NULL never passes). The classic shuffle-avoidance
    pattern for joining a 100-TB fact table against a selective build
    side: the filter is m_bits/32 int64s BY CONSTRUCTION, so it rides
    to every task as a literal and the probe stays MAP-ONLY — no
    shuffle, no broadcast-join hash relation, false-positive rows only
    (deterministic ones, given the portable hash) leak through to the
    real join afterwards.

    Two lookup encodings, same bits: small filters ship as a literal
    int64 array + element_at; past _BLOOM_LITERAL_WORDS_MAX words the
    table ships as ONE BinaryType literal (4 big-endian bytes per
    32-bit word) sliced with substring and decoded via hex+conv. The
    split exists because a CreateArray literal has one Catalyst child
    PER WORD — at m_bits=2^24 (512k words) every optimizer rule walks
    512k children and the probe spent ~1700s in planning/codegen
    before touching a row (measured, rehearsal_r5b). The big side must
    be BINARY, not a hex STRING: substring on a string walks bytes to
    count codepoints (O(offset) per probe — measured minutes-per-stage
    at 2^24), while substring on binary is an O(4) arraycopy. The
    literal appears ONLY inside the filter condition, never as a
    projected column, so no row ever carries the blob.

    The bounded `words.collect()` here is the same legitimacy class as
    the IVF centroid pull (similarity.py): <= m_bits/32 rows, fixed by
    the operator's own parameter, never by data volume."""
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64, got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_words = m_bits // 32
    dense = [0] * n_words
    for r in words.collect():
        w = int(r["word_idx"])
        if not 0 <= w < n_words:
            raise ValueError(f"word_idx {w} out of range for m_bits={m_bits}")
        dense[w] |= int(r["bits"])
    if n_words <= _BLOOM_LITERAL_WORDS_MAX:
        arr = F.array([F.lit(w).cast("long") for w in dense])

        def word_at(pc: str):
            return F.element_at(arr, (F.col(pc) / 32).cast("int") + 1)
    else:
        blob = F.lit(b"".join(w.to_bytes(4, "big") for w in dense))

        def word_at(pc: str):
            idx = (F.col(pc) / 32).cast("int")
            return F.conv(
                F.hex(F.substring(blob, idx * 4 + 1, F.lit(4))),
                16, 10).cast("long")
    h1m, h2m = _bloom_hashes(col, m_bits)
    p = probe.withColumn("_h1", h1m).withColumn("_h2", h2m)
    tmp = ["_h1", "_h2"]
    cond = F.col(col).isNotNull()
    for i in range(k):
        pc = f"_pos{i}"
        tmp.append(pc)
        p = p.withColumn(pc, (F.col("_h1") + i * F.col("_h2")) % m_bits)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({pc} % 32 AS INT))")
        cond = cond & (word_at(pc).bitwiseAND(mask) != 0)
    return p.filter(cond).drop(*tmp)


def bloom_prefilter_sql(build_sql: str, probe_sql: str, build_col: str,
                        probe_col: str, probe_cols: list,
                        m_bits: int = 1 << 16, k: int = 4) -> str:
    """DuckDB twin of bloom_build + bloom_prefilter, generated from the
    same double-hashing recipe (one source of truth). Deliberately a
    DIFFERENT formulation — k unrolled joins against the word table
    instead of a literal-array map — so the gate cross-checks the math,
    not the plan. CTE names carry a bf_ prefix."""
    hexpr = (
        "('0x' || substr(md5(CAST({v} AS VARCHAR)), 1, 15))::BIGINT"
        " % {m} AS h1, "
        "((('0x' || substr(md5(CAST({v} AS VARCHAR) || chr(31) || 'B'),"
        " 1, 15))::BIGINT % {m}) | 1) AS h2")
    joins, conds = [], []
    for i in range(k):
        joins.append(
            f"JOIN bf_words w{i} ON w{i}.word_idx = "
            f"((p.h1 + {i} * p.h2) % {m_bits}) // 32")
        conds.append(
            f"(w{i}.bits & (CAST(1 AS BIGINT) << "
            f"CAST((p.h1 + {i} * p.h2) % {m_bits} % 32 AS INT))) <> 0")
    cols = ", ".join(f"p.\"{c}\"" for c in probe_cols)
    return f"""WITH bf_raw AS (
{build_sql.strip()}
), bf_h AS (
  SELECT {hexpr.format(v=f'"{build_col}"', m=m_bits)}
  FROM bf_raw WHERE "{build_col}" IS NOT NULL
), bf_pos AS (
  SELECT (h.h1 + t.i * h.h2) % {m_bits} AS p
  FROM bf_h h, (SELECT unnest(range({k})) AS i) t
), bf_words AS (
  SELECT p // 32 AS word_idx,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS BIGINT)
           AS bits
  FROM bf_pos GROUP BY 1
), bf_probe AS (
  SELECT pr.*, {hexpr.format(v=f'"{probe_col}"', m=m_bits)}
  FROM (
{probe_sql.strip()}
  ) pr WHERE "{probe_col}" IS NOT NULL
)
SELECT {cols}
FROM bf_probe p
{chr(10).join(joins)}
WHERE {" AND ".join(conds)}"""


def _kmv_minima(df: DataFrame, col: str, k: int) -> DataFrame:
    """The k smallest distinct portable hashes of `col` — the KMV
    sketch STATE (same recipe as kmv_distinct's kmin stage)."""
    return (df.select(portable_hash(F.col(col)).alias("h"))
            .filter(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k))


def kmv_set_estimate(df_a: DataFrame, col_a: str,
                     df_b: DataFrame, col_b: str,
                     k: int = 64) -> DataFrame:
    """Union / intersection cardinality estimates from two KMV
    sketches [Beyer et al., SIGMOD'07] — the set-operation face of the
    mergeable-sketch contract kmv_distinct documents: the k smallest
    hashes of (minima_A UNION minima_B) ARE the KMV sketch of A UNION B
    (any hash below the merged threshold survives both cuts), and the
    fraction of those union minima present in BOTH input sketches
    estimates the Jaccard, so intersection = fraction * union_estimate.

    One row: (k, n_union_k, theta, union_est, n_inter_k, inter_est).
    Exact regime: when the merged sketch holds fewer than k hashes both
    input sketches were exhaustive, so union_est AND inter_est are
    exact distinct counts, not estimates.

    Cross-engine exactness: every value is an integer except the two
    IEEE-double divides (2^60/theta, shared with kmv_distinct, and
    union_est/k for the intersection scale-down), identical
    round-to-nearest in both engines; operands < 2^53 for any real
    estimate.

    Scale shape: each sketch is a TakeOrdered over a distinct-hash
    shuffle (per-partition top-k, tiny driver merge — the kmv_distinct
    plan); everything after operates on <= 2k rows (the merged minima),
    joined hash-to-hash — broadcast by size, never data-shaped. The
    sketch states are reusable: feed kmv_minima_by rows per day/shard
    and the same merge estimates any pair of groups without rescanning
    raw data."""
    if k < 2:
        raise ValueError("k must be >= 2")
    ma = _kmv_minima(df_a, col_a, k)
    mb = _kmv_minima(df_b, col_b, k)
    # merged union sketch: k smallest of the two minima sets
    u = (ma.unionByName(mb).distinct().orderBy("h").limit(k))
    # membership flags via equi-joins on h, ONE final aggregate — a
    # two-single-row-agg join would plan the BroadcastNestedLoopJoin
    # the plan audit forbids
    flagged = (u.join(ma.withColumn("_ina", F.lit(1)), "h", "left")
               .join(mb.withColumn("_inb", F.lit(1)), "h", "left"))
    est = flagged.agg(
        F.count("*").alias("n_union_k"),
        F.max("h").alias("theta"),
        F.sum(F.when(F.col("_ina").isNotNull()
                     & F.col("_inb").isNotNull(), 1).otherwise(0))
        .alias("n_inter_k"))
    union_est = (F.when(F.col("n_union_k") < k, F.col("n_union_k"))
                 .otherwise(F.floor((k - 1) * (F.lit(HASH_SPACE)
                                               / F.col("theta"))))
                 .cast("long"))
    out = est.select(
        F.lit(k).alias("k"),
        F.col("n_union_k").cast("long").alias("n_union_k"),
        F.col("theta").cast("long").alias("theta"),
        union_est.alias("union_est"),
        F.col("n_inter_k").cast("long").alias("n_inter_k"))
    return out.select(
        "k", "n_union_k", "theta", "union_est", "n_inter_k",
        F.when(F.col("n_union_k") < k, F.col("n_inter_k"))
        .otherwise(F.floor(F.col("n_inter_k")
                           * (F.col("union_est") / F.lit(float(k)))))
        .cast("long").alias("inter_est"))


def kmv_set_sql(a_sql: str, b_sql: str, k: int = 64) -> str:
    """DuckDB twin of kmv_set_estimate, GENERATED from the same
    recipe: `a_sql` / `b_sql` each select one column named `v`."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = "CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT)"
    return f"""
WITH ma AS (
  SELECT DISTINCT {h} AS h FROM ({a_sql.strip()})
  WHERE v IS NOT NULL ORDER BY h LIMIT {k}
), mb AS (
  SELECT DISTINCT {h} AS h FROM ({b_sql.strip()})
  WHERE v IS NOT NULL ORDER BY h LIMIT {k}
), u AS (
  SELECT DISTINCT h FROM (SELECT h FROM ma UNION ALL SELECT h FROM mb)
  ORDER BY h LIMIT {k}
), agg AS (
  SELECT (SELECT count(*) FROM u) AS n_union_k,
         (SELECT max(h) FROM u) AS theta,
         (SELECT count(*) FROM u
          JOIN ma USING (h) JOIN mb USING (h)) AS n_inter_k
), est AS (
  SELECT n_union_k, theta, n_inter_k,
         CASE WHEN n_union_k < {k} THEN n_union_k
              ELSE CAST(floor({k - 1} *
                   (CAST(1152921504606846976 AS DOUBLE)
                    / CAST(theta AS DOUBLE))) AS BIGINT) END AS union_est
  FROM agg
)
SELECT CAST({k} AS INTEGER) AS k,
       CAST(n_union_k AS BIGINT) AS n_union_k,
       CAST(theta AS BIGINT) AS theta,
       CAST(union_est AS BIGINT) AS union_est,
       CAST(n_inter_k AS BIGINT) AS n_inter_k,
       CAST(CASE WHEN n_union_k < {k} THEN n_inter_k
                 ELSE floor(n_inter_k * (CAST(union_est AS DOUBLE)
                                         / {float(k)})) END
            AS BIGINT) AS inter_est
FROM est
"""


# ===========================================================================
# HyperLogLog with engine-portable registers
# ===========================================================================
#
# Spark's approx_count_distinct and DuckDB's are both HLL but with
# incompatible hash/bucket layouts, so (like KMV above) a cross-engine
# gate needs its own registers. Built from the same 60-bit portable
# md5 hash: bucket = h % m from the LOW bits, rank from the remaining
# 54-bit word w = h // m as rho = (leading zeros of w in 54 bits) + 1
# = 55 - length(bin(w)) — bin() exists with identical semantics in
# Spark and DuckDB, so the register values are bit-identical in both
# engines. rho is capped at HLL_RHO_CAP so the harmonic denominator
# S = sum_j 2^(RHO_CAP - M_j) stays exact int64 (m * 2^40 <= 2^46):
# the whole estimator floor(ALPHA_M2 * 2^RHO_CAP / S) is INTEGER
# arithmetic — no float harmonic mean whose summation order could
# diverge between engines. Raw Flajolet estimator on purpose: the
# small-range linear-counting correction needs ln() (float, libm-
# dependent); below ~2.5*m use kmv_distinct instead, which is exact
# below k. Registers are max-mergeable, same rollup story as
# kmv_minima_by.
#
# Scale shape: one groupBy (group, bucket) with map-side combine —
# aggregate state is bounded by m rows per group regardless of input
# size (the defining sketch property); the estimate pass reuses the
# same partitioning for its groupBy(group).

HLL_M = 64          # buckets; relative error ~ 1.04/sqrt(64) = 13%
HLL_RHO_CAP = 40    # register ceiling: m * 2^40 = 2^46 << int64
HLL_ALPHA_M2 = 2904  # floor(alpha_64 * 64^2), alpha_64 = 0.709


def hll_registers_by(df: DataFrame, group_cols: list,
                     col: str) -> DataFrame:
    """Per-group HLL register state: (group..., bucket, m) — at most
    HLL_M rows per group, max-mergeable (union two groups' register
    rows and take max(m) per bucket = the registers of the union)."""
    h = portable_hash(F.col(col))
    rb = (df.select(*group_cols, h.alias("h"))
          .filter(F.col("h").isNotNull())
          .select(*group_cols,
                  F.pmod(F.col("h"), F.lit(HLL_M)).cast("long")
                  .alias("bucket"),
                  F.least(F.lit(55) - F.length(F.bin(
                      F.floor(F.col("h") / HLL_M).cast("long"))),
                      F.lit(HLL_RHO_CAP)).cast("long").alias("rho")))
    return (rb.groupBy(*group_cols, "bucket")
            .agg(F.max("rho").cast("long").alias("m")))


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: list) -> DataFrame:
    """(group..., n_zero, s, est_fp) from register rows; absent buckets
    count as empty registers (m = 0, contributing 2^RHO_CAP to S)."""
    s_present = F.sum(F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RHO_CAP} - m AS INT))"))
    agg = regs.groupBy(*group_cols).agg(
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("n_zero"),
        s_present.cast("long").alias("_sp"))
    s = (F.col("_sp")
         + F.col("n_zero") * F.lit(1 << HLL_RHO_CAP).cast("long"))
    return agg.select(
        *group_cols, "n_zero", s.cast("long").alias("s"),
        F.floor(F.lit(HLL_ALPHA_M2 * (1 << HLL_RHO_CAP)).cast("long")
                / s).cast("long").alias("est_fp"))


def hll_distinct_by(df: DataFrame, group_cols: list,
                    col: str) -> DataFrame:
    """Per-group raw-HLL distinct estimates (see module notes: exact
    integer estimator, no small-range correction — prefer KMV below
    ~2.5*HLL_M distinct)."""
    return hll_estimate_from_registers(
        hll_registers_by(df, group_cols, col), group_cols)


# ===========================================================================
# Exact heavy hitters via Misra-Gries candidates + exact rescan
# ===========================================================================

HH_SUMMARY_SCHEMA = "value string, cnt long"


def _mg_summarize(col: str, capacity: int):
    """mapInPandas generator factory: one Misra-Gries summary per
    PARTITION (the generator sees every Arrow batch of its partition,
    so the dict persists across batches). Merging a batch is the
    Agarwal et al. (PODS'12) mergeable-summaries reduction: add the
    batch's exact value_counts into the dict, then — if over capacity —
    subtract the (capacity+1)-th largest count from everything and
    drop the non-positives. Each reduction removes >= (capacity+1)*t
    mass, so the cumulative undercount of any surviving item is
    <= N_part/(capacity+1): every item with partition frequency above
    that bound is guaranteed to survive as a candidate. Emits the
    candidate rows plus one (NULL, partition_total) row so the caller
    can recover exact N without another scan."""
    def gen(batches):
        import pandas as pd

        counts: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            total += int(vc.sum())
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > capacity:
                t = sorted(counts.values(), reverse=True)[capacity]
                counts = {k: c - t for k, c in counts.items() if c > t}
        out = pd.DataFrame(
            {"value": list(counts.keys()) + [None],
             "cnt": list(counts.values()) + [total]})
        yield out.astype({"cnt": "int64"})

    return gen


def heavy_hitters(df: DataFrame, col: str, min_freq_permille: int = 20,
                  capacity: int = 256) -> DataFrame:
    """EXACT (value, cnt) rows for every value of `col` whose frequency
    is >= ceil(total * min_freq_permille / 1000) — the two-pass
    candidate/rescan pattern that finds heavy hitters WITHOUT shuffling
    the full key domain:

      pass 1 (map-only, zero shuffle): a Misra-Gries summary per
        partition bounds state to `capacity` rows per task regardless
        of how many distinct values the partition holds;
      pass 2: only rows matching the <= n_partitions*capacity
        candidates (broadcast semi-join, pushed to the scan) are
        grouped — the shuffle carries at most the candidate keys.

    A plain groupBy+HAVING shuffles one record per distinct key per
    partition after map-side combine — fine for small vocabularies,
    the bottleneck when the domain is URLs/user-ids with 10^9+ distinct
    values. Here the shuffle is bounded by the operator's parameters.

    Correctness is parameter-checked, not hoped for: the MG guarantee
    covers any item with global frequency > N/(capacity+1) (averaging:
    such an item beats the bound in at least one partition), so the
    constructor raises unless threshold > N/(capacity+1). The output is
    therefore the EXACT heavy-hitter set with EXACT counts — candidates
    below the threshold are discarded by the rescan, so partition
    order / MG internals never leak into the result (what makes the
    cross-engine oracle a plain GROUP BY ... HAVING).

    The summaries are localCheckpoint'ed (tiny: <= partitions*capacity
    + 1 rows each) and the one-row total pull is the same bounded
    legitimacy class as bloom_prefilter's word collect."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if not 1 <= min_freq_permille <= 1000:
        raise ValueError("min_freq_permille must be in [1, 1000]")
    src = (df.filter(F.col(col).isNotNull())
           .select(F.col(col).cast("string").alias("_v")))
    summ = src.mapInPandas(_mg_summarize("_v", capacity),
                           schema=HH_SUMMARY_SCHEMA)
    summ = summ.localCheckpoint(eager=True)
    n_total = (summ.filter(F.col("value").isNull())
               .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n"))
               .first()["n"])
    threshold = (n_total * min_freq_permille + 999) // 1000
    if n_total and threshold * (capacity + 1) <= n_total:
        raise ValueError(
            f"guarantee void: threshold {threshold} <= N/(capacity+1) "
            f"= {n_total}/{capacity + 1} — raise capacity above "
            f"{n_total // max(threshold, 1)} or the permille cutoff")
    cand = summ.filter(F.col("value").isNotNull()).select("value").distinct()
    return (src.join(F.broadcast(cand), src["_v"] == cand["value"],
                     "left_semi")
            .groupBy(F.col("_v").alias("value"))
            .agg(F.count("*").cast("long").alias("cnt"))
            .filter(F.col("cnt") >= threshold))


def heavy_hitters_sql(source_sql: str, col: str = "value",
                      min_freq_permille: int = 20) -> str:
    """DuckDB twin of heavy_hitters: the exact GROUP BY ... HAVING the
    two-pass engine path is provably equal to (same integer ceil
    threshold). `source_sql` yields one row per occurrence."""
    return f"""
WITH hh_src AS (
  SELECT CAST("{col}" AS VARCHAR) AS value
  FROM ({source_sql.strip()})
  WHERE "{col}" IS NOT NULL
), hh_tot AS (
  SELECT count(*) AS n FROM hh_src
)
SELECT value, CAST(count(*) AS BIGINT) AS cnt
FROM hh_src, hh_tot
GROUP BY value, hh_tot.n
HAVING count(*) >= (hh_tot.n * {min_freq_permille} + 999) // 1000
"""
