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
