"""Statistical anomaly detection, integer-exact across engines.

The z-score test |x - mean| > z * stddev is float-laden in its
textbook form; multiplied through by n^2 it is pure integer
arithmetic:

    (n*x - S)^2 * 1_000_000  >  z_permille^2 * (n*Q - S^2)

with S = sum(x), Q = sum(x^2) per group — both exact integers. The
squares overflow int64 on large groups, so every term is computed in
DECIMAL(38,0) on the Spark side and HUGEINT on the DuckDB side: both
are exact integer arithmetic, so the engines agree bit-for-bit.
Caller contract: |value| * rows_per_group <= ~3*10^15 (documented
headroom below the 38-digit ceiling); quantize wider data first.

Scale shape: one groupBy for the per-key moments (mergeable sums —
map-side combine absorbs hot keys), one co-partitioned join back (the
moments side is one row per key), flags evaluated row-wise. No
window, no second shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def outlier_flags(df: DataFrame, key_cols: list[str], value_col: str,
                  z_permille: int = 3000) -> DataFrame:
    """Rows whose value deviates from its group mean by more than
    z_permille/1000 group standard deviations. Output: the input
    columns plus n_grp (group size); NULL values never flag and do
    not enter the moments.

    n = 1 groups and constant groups have zero variance and zero
    deviation — never flagged (0 > 0 is false), no special casing.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if z_permille < 1:
        raise ValueError(f"z_permille must be >= 1, got {z_permille}")
    for c in ("n_grp", "_S", "_Q"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    x = F.col(value_col).cast(_DEC)
    stats = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*key_cols)
             .agg(F.count(F.lit(1)).cast(_DEC).alias("n_grp"),
                  F.sum(x).alias("_S"),
                  F.sum(x * x).alias("_Q")))
    j = df.join(stats, key_cols)
    dev = F.col("n_grp") * x - F.col("_S")
    var_n2 = (F.col("n_grp") * F.col("_Q")
              - F.col("_S") * F.col("_S"))
    keep = (F.col(value_col).isNotNull()
            & (dev * dev * F.lit(1_000_000).cast(_DEC)
               > F.lit(z_permille * z_permille).cast(_DEC) * var_n2))
    return (j.filter(keep)
            .select(*df.columns, F.col("n_grp").cast("long")
                    .alias("n_grp")))


def outlier_flags_sql(input_sql: str, key_cols: list[str],
                      value_col: str, out_cols: list[str],
                      z_permille: int = 3000) -> str:
    """DuckDB twin of outlier_flags: the WINDOW spelling (moments via
    sum() OVER (PARTITION BY key) instead of groupBy + join), HUGEINT
    throughout."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if z_permille < 1:
        raise ValueError("z_permille must be >= 1")
    keys = ", ".join(key_cols)
    cols = ", ".join(out_cols)
    v = value_col
    return f"""WITH of_in AS MATERIALIZED (
  SELECT * FROM (
{input_sql.strip()}
  )
), of_w AS (
  SELECT *,
    CAST(count({v}) OVER w AS HUGEINT) AS n_g,
    CAST(sum(CAST({v} AS HUGEINT)) OVER w AS HUGEINT) AS s_g,
    CAST(sum(CAST({v} AS HUGEINT) * CAST({v} AS HUGEINT)) OVER w
         AS HUGEINT) AS q_g
  FROM of_in
  WINDOW w AS (PARTITION BY {keys})
)
SELECT {cols}, CAST(n_g AS BIGINT) AS n_grp
FROM of_w
WHERE {v} IS NOT NULL
  AND (n_g * CAST({v} AS HUGEINT) - s_g)
      * (n_g * CAST({v} AS HUGEINT) - s_g) * 1000000::HUGEINT
      > {z_permille * z_permille}::HUGEINT * (n_g * q_g - s_g * s_g)"""


def autocorr(df: DataFrame, key_cols: list[str], t_col: str,
             value_col: str, lags: tuple = (1, 2, 3),
             scale: int = 1000) -> DataFrame:
    """Lag-k autocorrelation per key over an integer time series:
    (key..., lag, m, ac_milli) with ac_milli = floor(scale * pearson)
    over the pairs (x_t, x_{t+k}) — CALENDAR lag: a pair exists only
    when both ticks t and t+k are observed (gaps drop the pair, they
    are not bridged; run gapfill_locf first for the bridged variant).

    Cross-engine exactness follows the expr_gene_corr recipe: all
    moments are exact integers (DECIMAL(38,0), the outlier_flags
    overflow posture — caller quantizes values so |x| * rows fits
    ~10^18 per moment, squares then stay inside 38 digits), and the
    only floats are IEEE-correctly-rounded sqrt/division of those
    exact integers, which every engine rounds identically.

    Scale shape and exactness: see stats_corr.lagged_corr — autocorr
    is the x == y instance of the shared lagged-correlation core
    (crosscorr is the two-column instance)."""
    from biocypher_metta_spark.operators.stats_corr import lagged_corr

    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be >= 1")
    return lagged_corr(df, key_cols, t_col, value_col, value_col,
                       lags, scale, "ac_milli")


def autocorr_sql(input_sql: str, key_cols: list[str], t_col: str,
                 value_col: str, lags: tuple = (1, 2, 3),
                 scale: int = 1000) -> str:
    """DuckDB twin of autocorr (HUGEINT moments, same float tail)."""
    from biocypher_metta_spark.operators.stats_corr import lagged_corr_sql

    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be >= 1")
    return lagged_corr_sql(input_sql, key_cols, t_col, value_col,
                           value_col, lags, scale, "ac_milli")


def crosscorr(df: DataFrame, key_cols: list[str], t_col: str,
              x_col: str, y_col: str, lags: tuple = (-2, -1, 0, 1, 2),
              scale: int = 1000) -> DataFrame:
    """Lagged cross-correlation between two aligned integer series
    per key: (key..., lag, m, xc_milli) over the pairs
    (x_t, y_{t+k}) — the lead/lag diagnostic (positive lag peak:
    x LEADS y by k ticks). Lags may be negative (y leads x) or zero
    (contemporaneous). Calendar-lag semantics, NULL on either side
    drops the pair; exactness and scale shape per
    stats_corr.lagged_corr (the shared core with autocorr)."""
    from biocypher_metta_spark.operators.stats_corr import lagged_corr

    if not lags:
        raise ValueError("lags must be non-empty")
    return lagged_corr(df, key_cols, t_col, x_col, y_col,
                       lags, scale, "xc_milli")


def crosscorr_sql(input_sql: str, key_cols: list[str], t_col: str,
                  x_col: str, y_col: str,
                  lags: tuple = (-2, -1, 0, 1, 2),
                  scale: int = 1000) -> str:
    """DuckDB twin of crosscorr."""
    from biocypher_metta_spark.operators.stats_corr import lagged_corr_sql

    if not lags:
        raise ValueError("lags must be non-empty")
    return lagged_corr_sql(input_sql, key_cols, t_col, x_col, y_col,
                           lags, scale, "xc_milli")


# floor(10^6 * log10(1 + 1/d)) for d = 1..9 — hardcoded literals, not
# computed, so no libm/log10 call can diverge between environments
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181,
               66947, 57992, 51153, 45757)


def benford_mad(df: DataFrame, key_cols: list[str],
                value_col: str) -> DataFrame:
    """Benford first-digit conformity per key: (key..., n_obs,
    mad_ppm) where mad_ppm is Nigrini's mean-absolute-deviation test
    statistic in parts-per-million — the standard fraud /
    fabricated-data / unit-mixup screen for financial and measured
    quantities (genuine multiplicative data conforms; invented or
    truncated data does not).

    PURE integer arithmetic: the first digit comes from the decimal
    STRING of |value| (no float log10, whose rounding at exact powers
    of ten is platform lore), observed shares are floor(10^6 * n_d /
    n) by integer division, expectations are hardcoded ppm literals,
    and mad_ppm = floor(sum_d |obs_d - exp_d| / 9) — zero-count
    digits included (their deviation IS the expectation). Zero and
    NULL values are excluded from n_obs.

    Scale shape: map-only digit extraction + ONE groupBy producing
    the nine digit counts as conditional sums (no explode, no second
    shuffle); output is one row per key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    v = F.col(value_col)
    d1 = F.substring(F.abs(v).cast("decimal(38,0)").cast("string"),
                     1, 1).cast("int")
    base = (df.filter(v.isNotNull() & (v != 0))
            .select(*key_cols, d1.alias("_d")))
    agg = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        *[F.sum(F.when(F.col("_d") == d, 1).otherwise(0)).cast("long")
          .alias(f"_n{d}") for d in range(1, 10)])
    # `div` = exact integer division (all terms non-negative, so
    # trunc == floor) — no double-division quotient to reason about
    dev = None
    for d in range(1, 10):
        obs = F.expr(f"(1000000 * _n{d}) div n_obs")
        term = F.abs(obs - F.lit(BENFORD_PPM[d - 1]))
        dev = term if dev is None else dev + term
    return (agg.select(*key_cols, "n_obs", dev.alias("_s"))
            .select(*key_cols, "n_obs",
                    F.expr("_s div 9").cast("long").alias("mad_ppm")))


def benford_mad_sql(input_sql: str, key_cols: list[str],
                    value_col: str) -> str:
    """DuckDB twin of benford_mad (same string-digit extraction,
    same integer divisions, same literals)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    counts = ",\n         ".join(
        f"CAST(sum(CASE WHEN d = {d} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{d}" for d in range(1, 10))
    terms = " + ".join(
        f"abs((1000000 * n{d}) // n_obs - {BENFORD_PPM[d - 1]})"
        for d in range(1, 10))
    return f"""WITH bf_in AS (
  SELECT {keys},
         CAST(substr(CAST(CAST(abs({value_col}) AS HUGEINT)
                          AS VARCHAR), 1, 1) AS INT) AS d
  FROM (
{input_sql.strip()}
  ) WHERE {value_col} IS NOT NULL AND {value_col} <> 0
), bf_agg AS (
  SELECT {keys}, CAST(count(*) AS BIGINT) AS n_obs,
         {counts}
  FROM bf_in GROUP BY {keys}
)
SELECT {keys}, n_obs,
       CAST(({terms}) // 9 AS BIGINT) AS mad_ppm
FROM bf_agg"""


def gini(df: DataFrame, key_cols: list[str],
         value_col: str) -> DataFrame:
    """Per-group Gini concentration index in parts-per-million —
    the inequality screen in the data-quality family next to
    benford_mad and outlier_flags (is spend concentrated on a few
    orders? is one domain dominating a crawl shard?).

    Rank form on ascending-sorted values (1-indexed ranks i):

        G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))

    sum(i*x_i) is invariant to how ties are ordered (equal x share
    any permutation of their rank block), so row_number needs no
    tie-break for cross-engine agreement. All terms DECIMAL(38,0)
    (HUGEINT in the oracle); the ppm result is the exact pmod floor.
    Caller contract: values are NON-NEGATIVE integers (quantize
    first, e.g. cents) with n*sum(x)*1e6 inside 38 digits; NULLs are
    dropped; all-zero / empty groups emit gini_ppm = 0.

    Scale shape: one shuffle on the group key, per-group rank sort,
    then a mergeable moment groupBy. A mega-hot group serializes its
    sort on one task (the as-of-join hot-key shape, temporal.py:17);
    the escape hatch is the value-histogram form — groupBy
    (key, x) counts, prefix-sum over the per-key DISTINCT-value rows
    — which bounds any task at the distinct-value count. Build it
    when a profile shows a group too big to sort; the rank form is
    exact and single-pass for every realistic key split."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_i", "_v", "n_obs", "sum_v", "gini_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    from pyspark.sql.window import Window

    ranked = (df.filter(F.col(value_col).isNotNull())
              .select(*key_cols, F.col(value_col).cast(_DEC).alias("_v"))
              .withColumn("_i", F.row_number().over(
                  Window.partitionBy(*key_cols).orderBy(F.col("_v")))
                  .cast(_DEC)))
    agg = (ranked.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).cast(_DEC).alias("_n"),
                F.sum("_v").alias("_s"),
                F.sum(F.col("_i") * F.col("_v")).alias("_t")))
    num = ((F.lit(2).cast(_DEC) * F.col("_t")
            - (F.col("_n") + F.lit(1).cast(_DEC)) * F.col("_s"))
           * F.lit(1_000_000).cast(_DEC))
    den = F.col("_n") * F.col("_s")
    ppm = (num - ((num % den) + den) % den) / den
    return agg.select(
        *key_cols,
        F.col("_n").cast("long").alias("n_obs"),
        F.col("_s").cast("long").alias("sum_v"),
        F.when(den == F.lit(0).cast(_DEC), F.lit(0))
        .otherwise(ppm).cast("long").alias("gini_ppm"))


def gini_sql(input_sql: str, key_cols: list[str],
             value_col: str) -> str:
    """DuckDB twin of gini: same rank recurrence, HUGEINT terms,
    same pmod floor and all-zero guard."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    v = value_col
    return f"""WITH gn_in AS MATERIALIZED (
  SELECT * FROM (
{input_sql.strip()}
  ) WHERE {v} IS NOT NULL
), gn_r AS (
  SELECT {keys}, CAST({v} AS HUGEINT) AS v,
         CAST(row_number() OVER (PARTITION BY {keys} ORDER BY {v})
              AS HUGEINT) AS i
  FROM gn_in
), gn_a AS (
  SELECT {keys}, CAST(count(*) AS HUGEINT) AS n,
         sum(v) AS s, sum(i * v) AS t
  FROM gn_r GROUP BY {keys}
), gn_d AS (
  SELECT {keys}, n, s,
         (2::HUGEINT * t - (n + 1::HUGEINT) * s) * 1000000::HUGEINT
           AS num,
         n * s AS den
  FROM gn_a
)
SELECT {keys}, CAST(n AS BIGINT) AS n_obs, CAST(s AS BIGINT) AS sum_v,
       CASE WHEN den = 0 THEN 0
            ELSE CAST((num - (((num % den) + den) % den)) // den
                      AS BIGINT) END AS gini_ppm
FROM gn_d"""


def linreg(df: DataFrame, key_cols: list[str], x_col: str,
           y_col: str) -> DataFrame:
    """Per-group OLS trend line, ppm-exact — the drift detector of
    the stats family (is spend trending per segment? is latency
    creeping per host?).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) from the five moment
    sums, all DECIMAL(38,0) (HUGEINT in the oracle); slope_ppm is
    the exact pmod floor (numerator may be negative), and
    intercept_ppm = floor((1e6*Sy - slope_ppm*Sx) / n) reuses the
    ALREADY-FLOORED slope so both engines quantize identically.
    Zero-x-variance groups (vertical fit undefined) emit NULL
    slope/intercept. Rows with a NULL x or y are dropped. Caller
    contract: integer inputs with n * |x| * |y| * 1e6 inside 38
    digits (quantize wider data first).

    Scale shape: ONE mergeable moment groupBy — map-side combine
    absorbs hot keys; no window, no join, no second shuffle."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("n_obs", "slope_ppm", "intercept_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    agg = (df.filter(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
           .groupBy(*key_cols)
           .agg(F.count(F.lit(1)).cast(_DEC).alias("_n"),
                F.sum(x).alias("_sx"), F.sum(y).alias("_sy"),
                F.sum(x * y).alias("_sxy"),
                F.sum(x * x).alias("_sxx")))
    num = ((F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
           * F.lit(1_000_000).cast(_DEC))
    den = (F.col("_n") * F.col("_sxx")
           - F.col("_sx") * F.col("_sx"))
    slope = (num - ((num % den) + den) % den) / den
    inum = (F.lit(1_000_000).cast(_DEC) * F.col("_sy")
            - slope * F.col("_sx"))
    iden = F.col("_n")
    intercept = (inum - ((inum % iden) + iden) % iden) / iden
    zero_var = den == F.lit(0).cast(_DEC)
    return agg.select(
        *key_cols,
        F.col("_n").cast("long").alias("n_obs"),
        F.when(zero_var, F.lit(None)).otherwise(slope)
        .cast("long").alias("slope_ppm"),
        F.when(zero_var, F.lit(None)).otherwise(intercept)
        .cast("long").alias("intercept_ppm"))


def linreg_sql(input_sql: str, key_cols: list[str], x_col: str,
               y_col: str) -> str:
    """DuckDB twin of linreg: same moments, HUGEINT, same staged
    pmod floors (slope first, intercept from the floored slope)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    xc, yc = x_col, y_col
    return f"""WITH lr_in AS (
  SELECT * FROM (
{input_sql.strip()}
  ) WHERE {xc} IS NOT NULL AND {yc} IS NOT NULL
), lr_a AS (
  SELECT {keys}, CAST(count(*) AS HUGEINT) AS n,
         sum(CAST({xc} AS HUGEINT)) AS sx,
         sum(CAST({yc} AS HUGEINT)) AS sy,
         sum(CAST({xc} AS HUGEINT) * CAST({yc} AS HUGEINT)) AS sxy,
         sum(CAST({xc} AS HUGEINT) * CAST({xc} AS HUGEINT)) AS sxx
  FROM lr_in GROUP BY {keys}
), lr_s AS (
  SELECT {keys}, n,
         (n * sxy - sx * sy) * 1000000::HUGEINT AS num,
         n * sxx - sx * sx AS den, sx, sy
  FROM lr_a
), lr_f AS (
  SELECT {keys}, n, den, sx, sy,
         CASE WHEN den = 0 THEN NULL
              ELSE (num - (((num % den) + den) % den)) // den
         END AS slope
  FROM lr_s
)
SELECT {keys}, CAST(n AS BIGINT) AS n_obs,
       CAST(slope AS BIGINT) AS slope_ppm,
       CAST(CASE WHEN den = 0 THEN NULL ELSE
         ((1000000::HUGEINT * sy - slope * sx)
          - ((((1000000::HUGEINT * sy - slope * sx) % n) + n) % n))
         // n END AS BIGINT) AS intercept_ppm
FROM lr_f"""


def chisq(df: DataFrame, key_cols: list[str], a_col: str,
          b_col: str) -> DataFrame:
    """Per-group chi-square independence statistic for two
    categorical columns, ppm-exact — the drift / association screen
    next to benford_mad and gini (did the label mix shift per shard?
    are format and language independent per crawl?).

    chi2 = sum over ALL grid cells of (O - E)^2 / E with
    E = r*c/N. Unobserved cells (O=0) contribute E = r*c/N each, and
    sum over the full grid of r*c/N is exactly N, so the statistic
    needs ONLY the observed cells — no dense grid, no cross join:

        chi2 = sum_obs (O*N - r*c)^2 / (N*r*c)
               + N - sum_obs r*c/N

    Each term is an exact pmod-floored ppm integer computed
    identically in both engines (per-cell quantization is part of
    the operator's definition). NULL categories are dropped. Caller
    contract: per-group N with N^4 * 1e6 inside 38 digits (N up to
    ~10^7 rows per group; pre-aggregate bigger groups).

    Scale shape: one groupBy to the (key, a, b) cell table —
    map-side combine absorbs the raw rows — then windows PARTITIONED
    OVER THE AGGREGATED CELLS (|A|x|B| rows per key, never the
    corpus) for the row/col/grand totals, and one final mergeable
    groupBy back to one row per key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("n_obs", "n_cells", "dof", "chi2_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    from pyspark.sql.window import Window

    cells = (df.filter(F.col(a_col).isNotNull()
                       & F.col(b_col).isNotNull())
             .groupBy(*key_cols, a_col, b_col)
             .agg(F.count(F.lit(1)).cast(_DEC).alias("_o")))
    wk = Window.partitionBy(*key_cols)
    r = F.sum("_o").over(Window.partitionBy(*key_cols, a_col))
    c = F.sum("_o").over(Window.partitionBy(*key_cols, b_col))
    n = F.sum("_o").over(wk)
    tnum = ((F.col("_o") * n - r * c) * (F.col("_o") * n - r * c)
            * F.lit(1_000_000).cast(_DEC))
    tden = n * r * c
    term = (tnum - ((tnum % tden) + tden) % tden) / tden
    anum = r * c * F.lit(1_000_000).cast(_DEC)
    adj = (anum - ((anum % n) + n) % n) / n
    scored = cells.select(*key_cols, F.col(a_col).alias("_a"),
                          F.col(b_col).alias("_b"), "_o",
                          n.alias("_n"), term.alias("_term"),
                          adj.alias("_adj"))
    return (scored.groupBy(*key_cols)
            .agg(F.max("_n").cast("long").alias("n_obs"),
                 F.count(F.lit(1)).cast("long").alias("n_cells"),
                 ((F.countDistinct("_a") - 1)
                  * (F.countDistinct("_b") - 1)).cast("long")
                 .alias("dof"),
                 (F.sum("_term")
                  + F.max("_n") * F.lit(1_000_000).cast(_DEC)
                  - F.sum("_adj")).cast("long").alias("chi2_ppm")))


def chisq_sql(input_sql: str, key_cols: list[str], a_col: str,
              b_col: str) -> str:
    """DuckDB twin of chisq: same observed-cell identity, HUGEINT,
    same per-cell pmod floors."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    a, b = a_col, b_col
    return f"""WITH x2_in AS (
  SELECT * FROM (
{input_sql.strip()}
  ) WHERE {a} IS NOT NULL AND {b} IS NOT NULL
), x2_c AS (
  SELECT {keys}, {a}, {b}, CAST(count(*) AS HUGEINT) AS o
  FROM x2_in GROUP BY {keys}, {a}, {b}
), x2_w AS (
  SELECT {keys}, {a}, {b}, o,
         sum(o) OVER (PARTITION BY {keys}, {a}) AS r,
         sum(o) OVER (PARTITION BY {keys}, {b}) AS c,
         sum(o) OVER (PARTITION BY {keys}) AS n
  FROM x2_c
), x2_t AS (
  SELECT {keys}, {a}, {b}, o, n,
         ((o * n - r * c) * (o * n - r * c) * 1000000::HUGEINT
          - ((((o * n - r * c) * (o * n - r * c) * 1000000::HUGEINT)
              % (n * r * c) + (n * r * c)) % (n * r * c)))
           // (n * r * c) AS term,
         (r * c * 1000000::HUGEINT
          - (((r * c * 1000000::HUGEINT) % n + n) % n)) // n AS adj
  FROM x2_w
)
SELECT {keys}, CAST(max(n) AS BIGINT) AS n_obs,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((count(DISTINCT {a}) - 1) * (count(DISTINCT {b}) - 1)
            AS BIGINT) AS dof,
       CAST(sum(term) + max(n) * 1000000::HUGEINT - sum(adj)
            AS BIGINT) AS chi2_ppm
FROM x2_t GROUP BY {keys}"""


def winsorize(df: DataFrame, key_cols: list[str], value_col: str,
              p_permille: int = 10) -> DataFrame:
    """Per-group winsorization: clamp each value into its group's
    [p, 1000-p] permille band — the standard heavy-tail taming pass
    before moment-based stats (outlier_flags and linreg are both
    mean-driven; one fat-fingered 10^9 entry drags every flag and
    slope with it).

    Exact rank quantiles, no interpolation: on the ascending sort
    x_(1..n), lo = x_(max(1, ceil(n*p/1000))) and
    hi = x_(n+1-max(1, ceil(n*p/1000))) — ceil spelled as integer
    (n*p + 999) div 1000, so both engines pick the identical order
    statistic (a permille band narrower than 1/n clamps to the
    min/max, i.e. nothing). Output: input columns with the value
    REPLACED by its clamped form, plus is_clamped. NULL values pass
    through unclamped (is_clamped false), never entering the ranks.

    Scale shape: one shuffle on the group key for the rank window
    (hot-group caveat as gini — the histogram form is the escape
    hatch), a two-row-per-group bounds aggregate, and one
    co-partitioned join back (bounds side is one row per key)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 0 < p_permille < 500:
        raise ValueError("p_permille must be in (0, 500), got "
                         f"{p_permille}")
    for c in ("is_clamped", "_rn", "_lo", "_hi"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    from pyspark.sql.window import Window

    vals = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*key_cols).orderBy(F.col("_v"))
    wk = Window.partitionBy(*key_cols)
    # the count window rides the same key partitioning as the rank —
    # one shuffle serves both
    ranked = (vals.select(*key_cols, F.col(value_col).alias("_v"))
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(wk)))
    cut = F.greatest(
        F.expr(f"(_n * {p_permille} + 999) div 1000"), F.lit(1))
    bounds = (ranked.groupBy(*key_cols)
              .agg(F.min(F.when(F.col("_rn") >= cut, F.col("_v")))
                   .alias("_lo"),
                   F.max(F.when(F.col("_rn") <= F.col("_n") - cut + 1,
                                F.col("_v"))).alias("_hi")))
    j = df.join(bounds, key_cols, "left")
    v = F.col(value_col)
    clamped = F.when(v.isNull(), v) \
        .when(v < F.col("_lo"), F.col("_lo")) \
        .when(v > F.col("_hi"), F.col("_hi")) \
        .otherwise(v)
    return j.select(
        *[clamped.alias(c) if c == value_col else F.col(c)
          for c in df.columns],
        (v.isNotNull() & ((v < F.col("_lo")) | (v > F.col("_hi"))))
        .alias("is_clamped"))


def winsorize_sql(input_sql: str, key_cols: list[str],
                  value_col: str, out_cols: list[str],
                  p_permille: int = 10) -> str:
    """DuckDB twin of winsorize: same rank recurrence and integer
    ceil, window spelling for the bounds."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 0 < p_permille < 500:
        raise ValueError("p_permille must be in (0, 500)")
    keys = ", ".join(key_cols)
    v = value_col
    cols = ", ".join(
        (f"CASE WHEN {v} IS NULL THEN {v} "
         f"WHEN {v} < b.lo THEN b.lo "
         f"WHEN {v} > b.hi THEN b.hi ELSE {v} END AS {v}")
        if c == v else c for c in out_cols)
    return f"""WITH wz_in AS MATERIALIZED (
  SELECT * FROM (
{input_sql.strip()}
  )
), wz_r AS (
  SELECT {keys}, {v} AS vv,
         row_number() OVER (PARTITION BY {keys} ORDER BY {v}) AS rn,
         count(*) OVER (PARTITION BY {keys}) AS n
  FROM wz_in WHERE {v} IS NOT NULL
), wz_b AS (
  SELECT {keys},
         min(CASE WHEN rn >= greatest((n * {p_permille} + 999)
                                      // 1000, 1)
                  THEN vv END) AS lo,
         max(CASE WHEN rn <= n - greatest((n * {p_permille} + 999)
                                          // 1000, 1) + 1
                  THEN vv END) AS hi
  FROM wz_r GROUP BY {keys}
)
SELECT {cols},
       ({v} IS NOT NULL AND ({v} < b.lo OR {v} > b.hi))
         AS is_clamped
FROM wz_in LEFT JOIN wz_b b USING ({keys})"""


def decile_lift(df: DataFrame, score_col: str, label_col: str,
                buckets: int = 10) -> DataFrame:
    """Gains/lift table: rank rows by score DESC into `buckets`
    bands and report each band's response rate and cumulative lift
    vs the base rate — THE model-evaluation readout for any scoring
    pipeline (does the top decile really convert more?).

    Scale-true decile assignment: ntile() needs a global row order —
    a single-partition sort over the FULL input. Instead deciles are
    VALUE-TIED (percentile_disc-style, documented semantics): rows
    aggregate per distinct score first, the cumulative count runs
    over the AGGREGATED value rows (score-cardinality-sized, the
    only single-partition step), and a tie block lands wholly in the
    bucket of its first element: bucket = (cum_before * B) div N.
    Identical formula both engines, so ties can never straddle
    differently. label is 0/1 (NULL label counts as 0; NULL scores
    dropped).

    rate_ppm = floor(1e6 * conv / n) per bucket;
    cum_lift_ppm = floor(1e6 * cum_conv * N / (cum_n * C)) — exact
    integer floors (IEEE-stable division of exact ints), lift > 1e6
    means the top bands beat the base rate. All-zero-conversion
    inputs (C = 0) emit NULL lift rather than dividing by zero."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    for c in ("bucket", "n", "conv", "rate_ppm", "cum_lift_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    from pyspark.sql.window import Window

    # NB: totals are _nt/_ct, NOT _N/_C — Spark resolves column names
    # case-insensitively by default, so withColumn("_N", ...) would
    # silently REPLACE "_n"
    per_v = (df.filter(F.col(score_col).isNotNull())
             .groupBy(F.col(score_col).alias("_s"))
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(F.coalesce(F.col(label_col), F.lit(0)))
                  .alias("_c")))
    wall = Window.partitionBy()
    wcum = (Window.partitionBy().orderBy(F.col("_s").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    v = (per_v
         .withColumn("_nt", F.sum("_n").over(wall))
         .withColumn("_ct", F.sum("_c").over(wall))
         .withColumn("_cum", F.sum("_n").over(wcum)))
    v = v.withColumn(
        "bucket",
        F.expr(f"(( _cum - _n) * {buckets}) div _nt").cast("long"))
    agg = (v.groupBy("bucket")
           .agg(F.sum("_n").cast("long").alias("n"),
                F.sum("_c").cast("long").alias("conv"),
                F.max("_nt").alias("_nt"), F.max("_ct").alias("_ct")))
    wb = (Window.partitionBy().orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    agg = (agg.withColumn("_cn", F.sum("n").over(wb))
           .withColumn("_cc", F.sum("conv").over(wb)))
    return agg.select(
        "bucket", "n", "conv",
        F.floor(F.col("conv") * 1_000_000.0 / F.col("n"))
        .cast("long").alias("rate_ppm"),
        F.when(F.col("_ct") == 0, F.lit(None)).otherwise(
            F.floor(F.col("_cc") * 1_000_000.0 * F.col("_nt")
                    / (F.col("_cn") * F.col("_ct"))))
        .cast("long").alias("cum_lift_ppm"))


def decile_lift_sql(input_sql: str, score_col: str, label_col: str,
                    buckets: int = 10) -> str:
    """DuckDB twin of decile_lift: same value-tied bucket formula,
    same integer floors."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    s, lb = score_col, label_col
    return f"""WITH dl_v AS (
  SELECT {s} AS sv, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(coalesce({lb}, 0)) AS BIGINT) AS c
  FROM (
{input_sql.strip()}
  ) WHERE {s} IS NOT NULL
  GROUP BY {s}
), dl_c AS (
  SELECT sv, n, c,
         sum(n) OVER () AS nn, sum(c) OVER () AS cc,
         sum(n) OVER (ORDER BY sv DESC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM dl_v
), dl_b AS (
  SELECT ((cum - n) * {buckets}) // nn AS bucket, n, c, nn, cc
  FROM dl_c
), dl_a AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS conv,
         max(nn) AS nn, max(cc) AS cc
  FROM dl_b GROUP BY bucket
), dl_w AS (
  SELECT *, sum(n) OVER (ORDER BY bucket
                         ROWS UNBOUNDED PRECEDING) AS cn,
            sum(conv) OVER (ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS ccum
  FROM dl_a
)
SELECT CAST(bucket AS BIGINT) AS bucket, n, conv,
       CAST(floor(conv * 1000000.0 / n) AS BIGINT) AS rate_ppm,
       CASE WHEN cc = 0 THEN NULL
            ELSE CAST(floor(ccum * 1000000.0 * nn / (cn * cc))
                      AS BIGINT) END AS cum_lift_ppm
FROM dl_w"""


def cusum(df: DataFrame, key_cols: list[str], ts_col: str,
          value_col: str, target: int, slack: int,
          h: int) -> DataFrame:
    """Two-sided CUSUM changepoint detection [Page 1954] per key:
    (key..., ts, value, cusum_pos, cusum_neg, alarm) where
    cusum_pos_t = max(0-prefix form) of the classic recurrence
    S+_t = max(0, S+_{t-1} + x_t - (target + slack)) and cusum_neg is
    its downward mirror with k' = target - slack; alarm = 1 when
    either side exceeds `h`. The mean-DRIFT detector completing the
    time-series family next to outlier_flags (point deviations),
    autocorr/crosscorr (dependence) and ewma (smoothing): a slow creep
    that never individually z-flags still accumulates here.

    The recurrence looks inherently sequential, but it has the exact
    running-extremum closed form
        S+_t = P_t - min(0, min_{j<=t} P_j),   P_t = prefix sum of
                                                (x - target - slack)
        S-_t = max(0, max_{j<=t} P'_j) - P'_t,  P' with k' = target
                                                - slack
    (the min(0, ...) term is the empty prefix: S+ restarts from 0), so
    it distributes as TWO stacked window passes over ONE key shuffle
    and one sort — prefix sums first, running extrema over them second,
    identical window spec so no second exchange. All arithmetic is
    int64 on pre-quantized integer values (the ewma caller contract:
    unique (key, ts) pairs — ties would make the frame order
    engine-dependent — and NULL values are dropped).

    Oracle twin (cusum_sql) is the same closed form spelled as DuckDB
    windows — the cross-engine check would be impossible for a
    row-at-a-time recurrence, which is exactly why the closed form is
    the operator definition."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if slack < 0:
        raise ValueError(f"slack must be >= 0, got {slack}")
    if h <= 0:
        raise ValueError(f"h must be > 0, got {h}")
    for c in ("_pp", "_pm", "value", "cusum_pos", "cusum_neg", "alarm"):
        if c in key_cols or c == ts_col:
            raise ValueError(f"reserved output column name {c!r}")
    x = F.col(value_col).cast("long")
    w = (Window.partitionBy(*key_cols).orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    p = (df.filter(F.col(value_col).isNotNull())
         .select(*key_cols, F.col(ts_col),
                 x.alias("value"),
                 F.sum(x - F.lit(target + slack)).over(w).alias("_pp"),
                 F.sum(x - F.lit(target - slack)).over(w).alias("_pm")))
    s_pos = (F.col("_pp")
             - F.least(F.lit(0).cast("long"), F.min("_pp").over(w)))
    s_neg = (F.greatest(F.lit(0).cast("long"), F.max("_pm").over(w))
             - F.col("_pm"))
    return (p.select(*key_cols, ts_col, "value",
                     s_pos.cast("long").alias("cusum_pos"),
                     s_neg.cast("long").alias("cusum_neg"))
            .withColumn("alarm",
                        ((F.col("cusum_pos") > h)
                         | (F.col("cusum_neg") > h))
                        .cast("int")))


def cusum_sql(input_sql: str, key_cols: list[str], ts_col: str,
              value_col: str, target: int, slack: int, h: int) -> str:
    """DuckDB twin of cusum: the same running-extremum closed form as
    two stacked window CTEs."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH cs_in AS MATERIALIZED (
  SELECT * FROM (
{input_sql.strip()}
  ) WHERE {value_col} IS NOT NULL
), cs_p AS (
  SELECT {keys}, {ts_col},
         CAST({value_col} AS BIGINT) AS value,
         sum(CAST({value_col} AS BIGINT) - {target + slack}) OVER w
           AS pp,
         sum(CAST({value_col} AS BIGINT) - {target - slack}) OVER w
           AS pm
  FROM cs_in
  WINDOW w AS (PARTITION BY {keys} ORDER BY {ts_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT {keys}, {ts_col}, value,
       CAST(pp - least(0, min(pp) OVER w) AS BIGINT) AS cusum_pos,
       CAST(greatest(0, max(pm) OVER w) - pm AS BIGINT) AS cusum_neg,
       CAST(CASE WHEN pp - least(0, min(pp) OVER w) > {h}
                   OR greatest(0, max(pm) OVER w) - pm > {h}
                 THEN 1 ELSE 0 END AS INTEGER) AS alarm
FROM cs_p
WINDOW w AS (PARTITION BY {keys} ORDER BY {ts_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def ks_test(df: DataFrame, key_cols: list[str], sample_col: str,
            value_col: str, a_label, b_label) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov distance, exact in
    integers — the distribution-drift screen in the quality family
    (did this shard's score distribution shift vs the control
    shard? are 'click' and 'view' value profiles the same?).

    The textbook D = sup_v |F_a(v) - F_b(v)| multiplied through by
    n_a * n_b is pure counting:

        d_scaled = max over rows of |c_a(v) * n_b - c_b(v) * n_a|

    with c_s(v) = #{x in s : x <= v} evaluated AFTER the full tie
    block (RANGE frame, not ROWS), so tied values contribute one
    common step and the statistic is invariant to tie order —
    cross-engine exact with no tie-break column. d_ppm is the exact
    floor of d_scaled * 1e6 / (n_a * n_b) (DECIMAL / HUGEINT).

    Rows whose sample label is neither a_label nor b_label and NULL
    values are dropped; groups missing one sample entirely emit
    d_scaled = d_ppm = 0 (nothing to compare). Caller contract:
    integer-quantized values (the RANGE frame needs a numeric sort
    key); per-group counts fit int64 products (n_a, n_b <= ~3e9).

    Scale shape: ONE shuffle on the group key — the cumulative
    counts and the per-group totals are two frames over the same
    (keys, value) sort, then a mergeable groupBy max. A mega-hot
    group serializes its sort on one task (the documented rank-op
    shape, see gini); the histogram escape hatch (groupBy
    (keys, value) counts first) bounds tasks at the distinct-value
    count when a profile demands it."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_fa", "_fb", "_ca", "_cb", "_na", "_nb", "n_a", "n_b",
              "d_scaled", "d_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(value_col).isNotNull()
                      & F.col(sample_col).isin(a_label, b_label))
            .select(*key_cols, F.col(value_col).alias("_v"),
                    F.when(F.col(sample_col) == a_label, 1)
                    .otherwise(0).cast("long").alias("_fa")))
    w_cum = (Window.partitionBy(*key_cols).orderBy("_v")
             .rangeBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(*key_cols)
    stepped = base.select(
        *key_cols,
        F.sum("_fa").over(w_cum).alias("_ca"),
        F.sum(F.lit(1) - F.col("_fa")).over(w_cum).alias("_cb"),
        F.sum("_fa").over(w_all).alias("_na"),
        F.sum(F.lit(1) - F.col("_fa")).over(w_all).alias("_nb"))
    agg = (stepped.groupBy(*key_cols)
           .agg(F.max("_na").alias("n_a"), F.max("_nb").alias("n_b"),
                F.max(F.abs(F.col("_ca") * F.col("_nb")
                            - F.col("_cb") * F.col("_na")))
                .alias("d_scaled")))
    num = F.col("d_scaled").cast(_DEC) * F.lit(1_000_000).cast(_DEC)
    den = (F.col("n_a").cast(_DEC) * F.col("n_b").cast(_DEC))
    return agg.select(
        *key_cols, "n_a", "n_b",
        F.col("d_scaled").cast("long").alias("d_scaled"),
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(0))
        .otherwise((num - num % den) / den)
        .cast("long").alias("d_ppm"))


def ks_test_sql(input_sql: str, key_cols: list[str], sample_col: str,
                value_col: str, a_label: str, b_label: str) -> str:
    """DuckDB twin of ks_test: same RANGE-frame step counts, HUGEINT
    ppm floor. Labels are embedded as SQL string literals."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH ks_in AS MATERIALIZED (
  SELECT {keys}, {value_col} AS v,
         CASE WHEN {sample_col} = '{a_label}' THEN 1 ELSE 0 END
           ::BIGINT AS fa
  FROM (
{input_sql.strip()}
  ) WHERE {value_col} IS NOT NULL
    AND {sample_col} IN ('{a_label}', '{b_label}')
), ks_c AS (
  SELECT {keys},
         sum(fa) OVER wc AS ca, sum(1 - fa) OVER wc AS cb,
         sum(fa) OVER wa AS na, sum(1 - fa) OVER wa AS nb
  FROM ks_in
  WINDOW wc AS (PARTITION BY {keys} ORDER BY v
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY {keys})
), ks_a AS (
  SELECT {keys}, max(na) AS n_a, max(nb) AS n_b,
         max(abs(ca * nb - cb * na)) AS d_scaled
  FROM ks_c GROUP BY {keys}
)
SELECT {keys}, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(d_scaled AS BIGINT) AS d_scaled,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0
            ELSE CAST((d_scaled::HUGEINT * 1000000)
                      // (n_a::HUGEINT * n_b::HUGEINT) AS BIGINT)
       END AS d_ppm
FROM ks_a"""


def mannwhitney(df: DataFrame, key_cols: list[str], sample_col: str,
                value_col: str, a_label, b_label) -> DataFrame:
    """Per-group Mann-Whitney U (rank-sum) with exact tie handling —
    the nonparametric A-vs-B location test next to ks_test (KS asks
    'same distribution?', U asks 'does sample a stochastically
    dominate?'), and u_a / (n_a*n_b) IS the AUC of the label-vs-score
    separability, which is how training pipelines read it.

    Tie-averaged ranks are kept integral by doubling: a tie block
    starting at min-rank r with t members has average rank
    r + (t-1)/2, so

        r2 = 2*rank() + tie_count - 1          (exact integer)
        2*U_a = sum(r2 over sample a) - 2 * n_a*(n_a+1)/2

    rank() (min rank) and the tie count are the same (keys, value)
    sort — tie-order invariant, no tie-break column, cross-engine
    exact. auc_ppm = floor(2*U_a * 1e6 / (2 * n_a * n_b)) in
    DECIMAL/HUGEINT. Same drop rules and one-shuffle scale shape as
    ks_test; groups missing a sample emit u_a_x2 = auc_ppm = 0."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_fa", "_r2", "n_a", "n_b", "u_a_x2", "auc_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(value_col).isNotNull()
                      & F.col(sample_col).isin(a_label, b_label))
            .select(*key_cols, F.col(value_col).alias("_v"),
                    F.when(F.col(sample_col) == a_label, 1)
                    .otherwise(0).cast("long").alias("_fa")))
    w_ord = Window.partitionBy(*key_cols).orderBy("_v")
    w_tie = (Window.partitionBy(*key_cols).orderBy("_v")
             .rangeBetween(0, 0))
    ranked = base.select(
        *key_cols, "_fa",
        (F.lit(2) * F.rank().over(w_ord).cast("long")
         + F.count(F.lit(1)).over(w_tie) - F.lit(1)).alias("_r2"))
    agg = (ranked.groupBy(*key_cols)
           .agg(F.sum("_fa").alias("n_a"),
                F.sum(F.lit(1) - F.col("_fa")).alias("n_b"),
                F.sum(F.col("_fa") * F.col("_r2")).alias("_ra2")))
    u2 = F.col("_ra2") - F.col("n_a") * (F.col("n_a") + 1)
    num = u2.cast(_DEC) * F.lit(1_000_000).cast(_DEC)
    den = (F.lit(2).cast(_DEC) * F.col("n_a").cast(_DEC)
           * F.col("n_b").cast(_DEC))
    return agg.select(
        *key_cols, "n_a", "n_b",
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(0))
        .otherwise(u2).cast("long").alias("u_a_x2"),
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(0))
        .otherwise((num - num % den) / den)
        .cast("long").alias("auc_ppm"))


def mannwhitney_sql(input_sql: str, key_cols: list[str],
                    sample_col: str, value_col: str,
                    a_label: str, b_label: str) -> str:
    """DuckDB twin of mannwhitney: same doubled tie-averaged ranks,
    HUGEINT ppm floor."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH mw_in AS MATERIALIZED (
  SELECT {keys}, {value_col} AS v,
         CASE WHEN {sample_col} = '{a_label}' THEN 1 ELSE 0 END
           ::BIGINT AS fa
  FROM (
{input_sql.strip()}
  ) WHERE {value_col} IS NOT NULL
    AND {sample_col} IN ('{a_label}', '{b_label}')
), mw_r AS (
  SELECT {keys}, fa,
         2 * rank() OVER (PARTITION BY {keys} ORDER BY v)
           + count(*) OVER (PARTITION BY {keys} ORDER BY v
                            RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
           - 1 AS r2
  FROM mw_in
), mw_a AS (
  SELECT {keys}, sum(fa) AS n_a, sum(1 - fa) AS n_b,
         sum(fa * r2) - sum(fa) * (sum(fa) + 1) AS u2
  FROM mw_r GROUP BY {keys}
)
SELECT {keys}, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0
            ELSE CAST(u2 AS BIGINT) END AS u_a_x2,
       CASE WHEN n_a = 0 OR n_b = 0 THEN 0
            ELSE CAST((u2::HUGEINT * 1000000)
                      // (2::HUGEINT * n_a::HUGEINT * n_b::HUGEINT)
                      AS BIGINT)
       END AS auc_ppm
FROM mw_a"""


def cohens_kappa(df: DataFrame, key_cols: list[str], a_col: str,
                 b_col: str) -> DataFrame:
    """Per-group Cohen's kappa in parts-per-million — chance-corrected
    agreement between two categorical annotators (a rater column and a
    model prediction, two labeling runs, heuristic-vs-LLM tags). The
    inter-annotator screen a labeled-training-data pipeline runs before
    trusting a label column, next to ks_test/mannwhitney in the
    two-sample family.

    Multiplying po = D/N and pe = S/N^2 through by N^2 removes every
    division until the final floor:

        kappa = (N*D - S) / (N^2 - S)

    with N = rows, D = agreements (a = b), S = sum over categories of
    row-marginal * column-marginal. All exact integers in
    DECIMAL(38,0) / HUGEINT; kappa_ppm is the pmod floor of the ratio
    * 1e6 (negative kappas — worse than chance — floor consistently in
    both engines by the same pmod identity). Degenerate groups where
    pe = 1 (both raters constant on the same category; then N^2 = S)
    emit 1e6 when D = N else 0. Rows where either label is NULL are
    dropped. Caller contract: N^2 * 1e6 inside 38 digits (N up to
    ~10^15 — any real annotation set).

    Scale shape: three mergeable groupBys (totals, row marginals,
    column marginals) over the same shuffled key — AQE coalesces them
    onto one exchange of the base projection — then a marginal-side
    join that is one row per (key, category), never row-volume. No
    windows, no collect; hot groups are absorbed by partial
    aggregation since every term is a sum.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    reserved = {"n_obs", "n_agree", "kappa_ppm", "_cat", "_na", "_nb",
                "_a", "_b", "_n", "_d", "_s"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input must not already have columns {clash}")
    base = (df.filter(F.col(a_col).isNotNull()
                      & F.col(b_col).isNotNull())
            .select(*key_cols, F.col(a_col).alias("_a"),
                    F.col(b_col).alias("_b")))
    tot = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("_n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long"))
        .cast(_DEC).alias("_d"))
    ra = (base.groupBy(*key_cols, F.col("_a").alias("_cat"))
          .agg(F.count(F.lit(1)).cast(_DEC).alias("_na")))
    cb = (base.groupBy(*key_cols, F.col("_b").alias("_cat"))
          .agg(F.count(F.lit(1)).cast(_DEC).alias("_nb")))
    # categories missing from either marginal contribute 0 to S, so the
    # inner join on (key, category) is exact.
    s = (ra.join(cb, [*key_cols, "_cat"])
         .groupBy(*key_cols)
         .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_s")))
    j = tot.join(s, key_cols, "left").withColumn(
        "_s", F.coalesce(F.col("_s"), F.lit(0).cast(_DEC)))
    num = (F.col("_n") * F.col("_d") - F.col("_s")) \
        * F.lit(1_000_000).cast(_DEC)
    den = F.col("_n") * F.col("_n") - F.col("_s")
    ppm = (num - ((num % den) + den) % den) / den
    return j.select(
        *key_cols,
        F.col("_n").cast("long").alias("n_obs"),
        F.col("_d").cast("long").alias("n_agree"),
        F.when(den == F.lit(0).cast(_DEC),
               F.when(F.col("_d") == F.col("_n"), F.lit(1_000_000))
               .otherwise(F.lit(0)))
        .otherwise(ppm).cast("long").alias("kappa_ppm"))


def cohens_kappa_sql(input_sql: str, key_cols: list[str], a_col: str,
                     b_col: str) -> str:
    """DuckDB twin of cohens_kappa: same N^2-scaled integer identity,
    HUGEINT terms, same pmod floor and pe=1 guard."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH ck_in AS MATERIALIZED (
  SELECT {keys}, {a_col} AS a, {b_col} AS b FROM (
{input_sql.strip()}
  ) WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
), ck_tot AS (
  SELECT {keys}, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT) AS d
  FROM ck_in GROUP BY {keys}
), ck_ra AS (
  SELECT {keys}, a AS cat, CAST(count(*) AS HUGEINT) AS na
  FROM ck_in GROUP BY {keys}, a
), ck_cb AS (
  SELECT {keys}, b AS cat, CAST(count(*) AS HUGEINT) AS nb
  FROM ck_in GROUP BY {keys}, b
), ck_s AS (
  SELECT {", ".join("ck_ra." + k for k in key_cols)},
         sum(na * nb) AS s
  FROM ck_ra JOIN ck_cb
    ON {" AND ".join(f"ck_ra.{k} = ck_cb.{k}" for k in key_cols)}
   AND ck_ra.cat = ck_cb.cat
  GROUP BY {", ".join("ck_ra." + k for k in key_cols)}
), ck_j AS (
  SELECT ck_tot.*, coalesce(ck_s.s, 0::HUGEINT) AS s
  FROM ck_tot LEFT JOIN ck_s USING ({keys})
), ck_d AS (
  SELECT {keys}, n, d,
         (n * d - s) * 1000000::HUGEINT AS num,
         n * n - s AS den
  FROM ck_j
)
SELECT {keys}, CAST(n AS BIGINT) AS n_obs, CAST(d AS BIGINT) AS n_agree,
       CASE WHEN den = 0 THEN (CASE WHEN d = n THEN 1000000 ELSE 0 END)
            ELSE CAST((num - (((num % den) + den) % den)) // den
                      AS BIGINT) END AS kappa_ppm
FROM ck_d"""


def spearman(df: DataFrame, key_cols: list[str], x_col: str,
             y_col: str) -> DataFrame:
    """Per-group Spearman rank correlation in ppm — the monotone-
    association screen next to linreg (which is slope-of-values) and
    mannwhitney (which is two-sample): does y rise with x at all,
    robust to outliers and any monotone rescaling? A curation pipeline
    runs it between quality signals (e.g. doc length vs dedup cluster
    size) before trusting one as a proxy for the other.

    Exactness: Spearman is Pearson over ranks. Tie-averaged ranks stay
    integral by the mannwhitney doubling (r2 = 2*rank() + tie_count -
    1, tie-order invariant), and Pearson over integer ranks has exact
    integer moments in DECIMAL(38,0)/HUGEINT:

        num = n*Sxy - Sx*Sy,  dx = n*Sxx - Sx^2,  dy = n*Syy - Sy^2

    rho_ppm = floor(1e6 * num / (sqrt(dx)*sqrt(dy))) with the division
    in doubles — every step (int->double cast, sqrt, *, /) is
    correctly rounded under IEEE 754, so both engines hit the same
    bits (the expression.gene_corr_topk pattern). Zero-variance groups
    (dx or dy = 0, incl. n = 1) emit rho_ppm = 0. Rows with a NULL x
    or y drop. Caller contract: group size <= ~10^8 (doubled ranks
    ~2n, so n*Sxx ~ 4n^4 must sit inside 38 digits).

    Scale shape: both rank windows partition on the same keys — one
    exchange, two in-partition sorts — then a single mergeable
    groupBy on the already-partitioned keys. A mega-hot group
    serializes its sort on one task like every per-group ranking (the
    mannwhitney/ks_test family caveat); pre-bucket the keys if a
    profile shows it.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_x", "_y", "_rx", "_ry", "n_obs", "rho_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .select(*key_cols, F.col(x_col).alias("_x"),
                    F.col(y_col).alias("_y")))

    def _r2(col):
        w_ord = Window.partitionBy(*key_cols).orderBy(col)
        w_tie = (Window.partitionBy(*key_cols).orderBy(col)
                 .rangeBetween(0, 0))
        return (F.lit(2) * F.rank().over(w_ord).cast("long")
                + F.count(F.lit(1)).over(w_tie) - F.lit(1)).cast(_DEC)

    ranked = base.select(*key_cols, _r2("_x").alias("_rx"),
                         _r2("_y").alias("_ry"))
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("_n"),
        F.sum("_rx").alias("_sx"), F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"))
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = F.floor(F.lit(1000000.0) * num.cast("double")
                  / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))))
    return agg.select(
        *key_cols, F.col("_n").cast("long").alias("n_obs"),
        F.when((dx == F.lit(0).cast(_DEC)) | (dy == F.lit(0).cast(_DEC)),
               F.lit(0))
        .otherwise(rho).cast("long").alias("rho_ppm"))


def spearman_sql(input_sql: str, key_cols: list[str], x_col: str,
                 y_col: str) -> str:
    """DuckDB twin of spearman: same doubled tie-averaged ranks,
    HUGEINT moments, identical double expression for the final ratio
    (correctly-rounded ops -> bit-equal across engines)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH sp_in AS MATERIALIZED (
  SELECT {keys}, {x_col} AS x, {y_col} AS y FROM (
{input_sql.strip()}
  ) WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
), sp_r AS (
  SELECT {keys},
         CAST(2 * rank() OVER (PARTITION BY {keys} ORDER BY x)
              + count(*) OVER (PARTITION BY {keys} ORDER BY x
                               RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
              - 1 AS HUGEINT) AS rx,
         CAST(2 * rank() OVER (PARTITION BY {keys} ORDER BY y)
              + count(*) OVER (PARTITION BY {keys} ORDER BY y
                               RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
              - 1 AS HUGEINT) AS ry
  FROM sp_in
), sp_a AS (
  SELECT {keys}, CAST(count(*) AS HUGEINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
         sum(rx * ry) AS sxy
  FROM sp_r GROUP BY {keys}
), sp_d AS (
  SELECT {keys}, n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS dx,
         n * syy - sy * sy AS dy
  FROM sp_a
)
SELECT {keys}, CAST(n AS BIGINT) AS n_obs,
       CASE WHEN dx = 0 OR dy = 0 THEN 0
            ELSE CAST(floor(1000000.0 * CAST(num AS DOUBLE)
                            / (sqrt(CAST(dx AS DOUBLE))
                               * sqrt(CAST(dy AS DOUBLE))))
                 AS BIGINT) END AS rho_ppm
FROM sp_d"""


def theil_sen(df: DataFrame, key_cols: list[str], x_col: str,
              y_col: str) -> DataFrame:
    """Per-group Theil-Sen trend: the MEDIAN of all pairwise slopes
    (y2-y1)/(x2-x1) over x1 < x2 — the robust counterpart of linreg's
    least-squares slope (one wild day in a daily-volume series drags
    OLS arbitrarily; the slope median ignores up to ~29% corruption).

    Exactness: x and y must arrive integer-valued (caller quantizes —
    the repo contract shared by linreg/cusum). Each pairwise slope is
    the pmod floor of 1e6*(y2-y1) over the strictly positive dx, an
    exact integer; the median of integers is an exact rank selection:
    row_number ordered by slope = (m+1) DIV 2 (lower median —
    deterministic both engines; equal slope values make the tie order
    irrelevant to the selected VALUE). Pairs with x1 = x2 have no
    slope and drop, the Theil-Sen convention. Groups with no valid
    pair emit nothing.

    Scale shape: the pair generator is an equi-join on the group keys
    with the x1 < x2 inequality as a post-join filter — never a
    cartesian — so work is sum over groups of n_g^2/2. That is the
    operator's honest cost (Theil-Sen IS quadratic); the caller
    contract is bounded group size, e.g. a per-entity DAILY series
    pre-aggregated from raw events (the gate's shape: 10^3 days =
    ~5*10^5 pairs per key, trivial; raw un-aggregated events would
    not be). Median selection is one more window sort on the same
    keys.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_x1", "_y1", "_x2", "_y2", "_s", "_m", "_rn",
              "n_pairs", "slope_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
            .select(*key_cols, F.col(x_col).cast("long").alias("_x1"),
                    F.col(y_col).cast("long").alias("_y1")))
    right = base.select(*key_cols, F.col("_x1").alias("_x2"),
                        F.col("_y1").alias("_y2"))
    pairs = (base.join(right, key_cols)
             .filter(F.col("_x1") < F.col("_x2")))
    num = ((F.col("_y2") - F.col("_y1")).cast(_DEC)
           * F.lit(1_000_000).cast(_DEC))
    den = (F.col("_x2") - F.col("_x1")).cast(_DEC)
    slope = (num - ((num % den) + den) % den) / den
    slopes = pairs.select(*key_cols, slope.cast("long").alias("_s"))
    w_ord = Window.partitionBy(*key_cols).orderBy("_s")
    w_all = Window.partitionBy(*key_cols)
    ranked = slopes.select(
        *key_cols, "_s",
        F.row_number().over(w_ord).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_m"))
    return (ranked
            .filter(F.col("_rn")
                    == F.floor((F.col("_m") + F.lit(1)) / F.lit(2)))
            .select(*key_cols, F.col("_m").alias("n_pairs"),
                    F.col("_s").alias("slope_ppm")))


def theil_sen_sql(input_sql: str, key_cols: list[str], x_col: str,
                  y_col: str) -> str:
    """DuckDB twin of theil_sen: same equi-join pair generator, pmod
    slope floor, and lower-median row_number selection."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    a_keys = ", ".join(f"a.{k}" for k in key_cols)
    on = " AND ".join(f"a.{k} = b.{k}" for k in key_cols)
    return f"""WITH ts_in AS MATERIALIZED (
  SELECT {keys}, CAST({x_col} AS BIGINT) AS x, CAST({y_col} AS BIGINT) AS y
  FROM (
{input_sql.strip()}
  ) WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
), ts_p AS (
  SELECT {a_keys},
         CAST(b.y - a.y AS HUGEINT) * 1000000::HUGEINT AS num,
         CAST(b.x - a.x AS HUGEINT) AS den
  FROM ts_in a JOIN ts_in b ON {on} AND a.x < b.x
), ts_s AS (
  SELECT {keys},
         CAST((num - (((num % den) + den) % den)) // den AS BIGINT) AS s
  FROM ts_p
), ts_r AS (
  SELECT {keys}, s,
         row_number() OVER (PARTITION BY {keys} ORDER BY s) AS rn,
         count(*) OVER (PARTITION BY {keys}) AS m
  FROM ts_s
)
SELECT {keys}, CAST(m AS BIGINT) AS n_pairs, s AS slope_ppm
FROM ts_r WHERE rn = (m + 1) // 2"""


def kaplan_meier(df: DataFrame, key_cols: list[str], t_col: str,
                 event_col: str) -> DataFrame:
    """Per-group Kaplan-Meier survival curve with right censoring —
    'how long do documents survive in the corpus before a dedup or
    quality pass removes them' is a survival question (removal =
    event, still-present-at-snapshot = censored), as is user/session
    retention; the classic estimator is

        S(t_i) = prod_{j <= i} (1 - d_j / n_j)

    over EVENT times t_j (d_j = events at t_j, n_j = at-risk count =
    rows with t >= t_j; censored rows leave the risk set but never
    create a step). The product is made engine-portable by carrying
    it in ppm with a floor at EVERY step:

        s_0 = 1e6;  s_i = floor(s_{i-1} * (n_i - d_i) / n_i)

    — the identical integer recurrence on both sides (the doc_cdc
    shared-recurrence rationale), so no float product ever diverges.
    Bias from flooring is < 1 ppm per step, one-sided, and identical
    cross-engine. Output one row per (group, event time): keys, t,
    n_risk, d_events, surv_ppm. NULL t or event drops.

    Scale shape: one groupBy to (keys, t) step counts, the at-risk
    reverse cumsum as a window on the step rows (steps, not raw
    rows), then the sequential recurrence runs inside ONE
    sort_array(collect_list) + F.aggregate per group — the ordered-
    PWM-collect pattern (SURVEY A1): per-group state is bounded by
    DISTINCT EVENT TIMES, the caller contract (a daily/hourly
    time grid, not raw microsecond stamps — pre-bucket t first).
    Events land exactly; s stays <= 1e6 so the widest intermediate is
    1e6 * n in DECIMAL(38,0)/HUGEINT.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    for c in ("_t", "_e", "_a", "_d", "_n", "_st", "_steps", "t",
              "n_risk", "d_events", "surv_ppm"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(t_col).isNotNull()
                      & F.col(event_col).isNotNull())
            .select(*key_cols, F.col(t_col).cast("long").alias("_t"),
                    F.col(event_col).cast("long").alias("_e")))
    per_t = base.groupBy(*key_cols, "_t").agg(
        F.count(F.lit(1)).cast("long").alias("_a"),
        F.sum("_e").cast("long").alias("_d"))
    w = (Window.partitionBy(*key_cols).orderBy(F.col("_t").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    steps = per_t.select(*key_cols, "_t", "_d",
                         F.sum("_a").over(w).cast("long").alias("_n"))
    ev = (steps.filter(F.col("_d") > 0)
          .select(*key_cols,
                  F.struct(F.col("_t").alias("t"),
                           F.col("_n").alias("n"),
                           F.col("_d").alias("d")).alias("_st")))
    grp = ev.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list("_st")).alias("_steps"))
    out_t = ("array<struct<t:bigint,n_risk:bigint,"
             "d_events:bigint,surv_ppm:bigint>>")
    zero = F.struct(
        F.lit(1_000_000).cast("long").alias("s"),
        F.expr(f"CAST(array() AS {out_t})").alias("o"))

    def merge(acc, x):
        num = (acc["s"] * (x["n"] - x["d"])).cast(_DEC)
        den = x["n"].cast(_DEC)
        s2 = ((num - num % den) / den).cast("long")
        row = F.struct(x["t"].alias("t"), x["n"].alias("n_risk"),
                       x["d"].alias("d_events"), s2.alias("surv_ppm"))
        return F.struct(s2.alias("s"),
                        F.concat(acc["o"], F.array(row)).alias("o"))

    curve = grp.select(*key_cols,
                       F.aggregate("_steps", zero, merge)["o"]
                       .alias("_curve"))
    return (curve.select(*key_cols, F.explode("_curve").alias("_r"))
            .select(*key_cols, F.col("_r.t").alias("t"),
                    F.col("_r.n_risk").alias("n_risk"),
                    F.col("_r.d_events").alias("d_events"),
                    F.col("_r.surv_ppm").alias("surv_ppm")))


def kaplan_meier_sql(input_sql: str, key_cols: list[str], t_col: str,
                     event_col: str) -> str:
    """DuckDB twin of kaplan_meier: same per-step ppm floor
    recurrence, spelled as a recursive CTE over row_number-indexed
    event steps (HUGEINT throughout; num >= 0 so // IS the pmod
    floor)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    e_keys = ", ".join(f"e.{k}" for k in key_cols)
    on = " AND ".join(f"e.{k} = r.{k}" for k in key_cols)
    return f"""WITH RECURSIVE km_in AS MATERIALIZED (
  SELECT {keys}, CAST({t_col} AS BIGINT) AS t,
         CAST({event_col} AS BIGINT) AS e
  FROM (
{input_sql.strip()}
  ) WHERE {t_col} IS NOT NULL AND {event_col} IS NOT NULL
), km_t AS (
  SELECT {keys}, t, CAST(count(*) AS BIGINT) AS a,
         CAST(sum(e) AS BIGINT) AS d
  FROM km_in GROUP BY {keys}, t
), km_s AS (
  SELECT {keys}, t, d,
         sum(a) OVER (PARTITION BY {keys} ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n
  FROM km_t
), km_e AS (
  SELECT {keys}, t, d, n,
         row_number() OVER (PARTITION BY {keys} ORDER BY t) AS idx
  FROM km_s WHERE d > 0
), km_r AS (
  SELECT {keys}, idx, t, n, d,
         (1000000::HUGEINT * (n - d)::HUGEINT) // n::HUGEINT AS s
  FROM km_e WHERE idx = 1
  UNION ALL
  SELECT {e_keys}, e.idx, e.t, e.n, e.d,
         (r.s * (e.n - e.d)::HUGEINT) // e.n::HUGEINT
  FROM km_e e JOIN km_r r ON {on} AND e.idx = r.idx + 1
)
SELECT {keys}, t, CAST(n AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d_events, CAST(s AS BIGINT) AS surv_ppm
FROM km_r"""


def bh_fdr(df: DataFrame, key_cols: list[str], id_col: str,
           p_col: str, alpha_ppm: int) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control per group — the
    multiple-testing gate downstream of any per-hypothesis screen
    (GWAS leads, per-feature chisq/linreg batteries): with m
    hypotheses sorted by p ascending, reject ranks 1..k where k is
    the LARGEST i with p_(i) <= alpha * i / m.

    Exactness: p-values arrive as integer ppm (the repo contract —
    produce them with any of the integer-exact tests above); the BH
    condition clears its denominators to p_ppm * m <= alpha_ppm * i,
    pure int64. The rejection SET is tie-order invariant: if
    p_(k+1) = p_(k) at the maximal k, then p_(k+1) <= alpha*k/m <=
    alpha*(k+1)/m would extend k — contradiction — so a tie can
    never straddle the cutoff and row_number's (p, id) tie-break
    only names ranks, never changes who rejects.

    Output: every input row as (keys, id, p_ppm, rank, m, reject).
    NULL p drops.

    Scale shape: one key exchange, one in-partition sort feeding
    both windows (rank and the group max of satisfied ranks), no
    joins. The per-group sort serializes on a mega-hot group like
    every ranking (ks_test-family caveat).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if alpha_ppm < 1:
        raise ValueError(f"alpha_ppm must be >= 1, got {alpha_ppm}")
    for c in ("p_ppm", "rank", "m", "reject", "_hit", "_k"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    base = (df.filter(F.col(p_col).isNotNull())
            .select(*key_cols, F.col(id_col).alias("id"),
                    F.col(p_col).cast("long").alias("p_ppm")))
    w_ord = Window.partitionBy(*key_cols).orderBy("p_ppm", "id")
    w_all = Window.partitionBy(*key_cols)
    ranked = base.select(
        *key_cols, "id", "p_ppm",
        F.row_number().over(w_ord).cast("long").alias("rank"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("m"))
    hit = F.when(F.col("p_ppm") * F.col("m")
                 <= F.lit(alpha_ppm) * F.col("rank"),
                 F.col("rank")).otherwise(F.lit(0))
    return (ranked
            .withColumn("_k", F.max(hit).over(w_all))
            .select(*key_cols, "id", "p_ppm", "rank", "m",
                    (F.col("rank") <= F.col("_k")).alias("reject")))


def bh_fdr_sql(input_sql: str, key_cols: list[str], id_col: str,
               p_col: str, alpha_ppm: int) -> str:
    """DuckDB twin of bh_fdr: same cleared-denominator step-up rule,
    same (p, id) rank naming."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH bh_in AS MATERIALIZED (
  SELECT {keys}, {id_col} AS id, CAST({p_col} AS BIGINT) AS p_ppm
  FROM (
{input_sql.strip()}
  ) WHERE {p_col} IS NOT NULL
), bh_r AS (
  SELECT {keys}, id, p_ppm,
         CAST(row_number() OVER (PARTITION BY {keys}
                                 ORDER BY p_ppm, id) AS BIGINT) AS rank,
         CAST(count(*) OVER (PARTITION BY {keys}) AS BIGINT) AS m
  FROM bh_in
), bh_k AS (
  SELECT {keys}, id, p_ppm, rank, m,
         max(CASE WHEN p_ppm * m <= {alpha_ppm} * rank
                  THEN rank ELSE 0 END)
           OVER (PARTITION BY {keys}) AS k
  FROM bh_r
)
SELECT {keys}, id, p_ppm, rank, m, rank <= k AS reject
FROM bh_k"""


def seasonal_decompose(df: DataFrame, key_cols: list[str], t_col: str,
                       value_col: str, period: int) -> DataFrame:
    """Classical additive seasonal decomposition per group — the
    weekly/daily-rhythm splitter a volume-monitoring pipeline runs
    before calling a dip an anomaly (cusum/outlier_flags fire on the
    REMAINDER, not the raw series): value = trend + seasonal +
    remainder.

    Integer recipe, exact cross-engine: the series is integer-valued
    on a REGULAR integer grid t (caller contract: gap-fill first —
    rel_gapfill_locf is the repo's tool); trend is the centered
    moving average over the odd window 2*(period//2)+1 as the pmod
    floor of sum/window (emitted only where the full window exists —
    RANGE frame over t, row count checked, so any gap simply yields
    no trend row rather than a wrong one); detrended = value - trend;
    seasonal_j = pmod floor of the per-phase (t mod period) mean of
    the detrended values; remainder = detrended - seasonal. Output
    one row per input point that has a full trend window: (keys, t,
    value, trend, seasonal, remainder).

    Scale shape: one key exchange feeds the RANGE window; the phase
    means are a (keys, phase)-sized mergeable groupBy joined back on
    its composite key (never row-volume on the build side). Floors
    bias each component < 1 unit one-sided, identically both
    engines."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    for c in ("_t", "_v", "_w", "_s", "_n", "trend", "_detr",
              "_phase", "seasonal", "remainder", "_sn", "_sd"):
        if c in df.columns:
            raise ValueError(f"input must not already have column {c!r}")
    h = period // 2
    win = 2 * h + 1
    base = (df.filter(F.col(t_col).isNotNull()
                      & F.col(value_col).isNotNull())
            .select(*key_cols, F.col(t_col).cast("long").alias("_t"),
                    F.col(value_col).cast("long").alias("_v")))
    w = (Window.partitionBy(*key_cols).orderBy("_t")
         .rangeBetween(-h, h))
    num = F.sum("_v").over(w).cast(_DEC)
    den = F.lit(win).cast(_DEC)
    trend = ((num - ((num % den) + den) % den) / den).cast("long")
    trended = (base
               .withColumn("_n", F.count(F.lit(1)).over(w))
               .withColumn("trend", trend)
               .filter(F.col("_n") == win)
               .drop("_n")
               .withColumn("_detr", F.col("_v") - F.col("trend"))
               .withColumn("_phase", F.pmod(F.col("_t"),
                                            F.lit(period))))
    sn = F.sum("_detr").cast(_DEC)
    sd = F.count(F.lit(1)).cast(_DEC)
    seas = (trended.groupBy(*key_cols, "_phase")
            .agg(((sn - ((sn % sd) + sd) % sd) / sd).cast("long")
                 .alias("seasonal")))
    return (trended.join(seas, [*key_cols, "_phase"])
            .select(*key_cols, F.col("_t").alias("t"),
                    F.col("_v").alias("value"), "trend", "seasonal",
                    (F.col("_detr") - F.col("seasonal"))
                    .alias("remainder")))


def seasonal_decompose_sql(input_sql: str, key_cols: list[str],
                           t_col: str, value_col: str,
                           period: int) -> str:
    """DuckDB twin of seasonal_decompose: same RANGE-frame centered
    average, same pmod floors, same phase-mean join."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    h = period // 2
    win = 2 * h + 1
    keys = ", ".join(key_cols)
    on = " AND ".join(f"sd_t.{k} = sd_s.{k}" for k in key_cols)
    t_keys = ", ".join(f"sd_t.{k}" for k in key_cols)
    return f"""WITH sd_in AS MATERIALIZED (
  SELECT {keys}, CAST({t_col} AS BIGINT) AS t,
         CAST({value_col} AS BIGINT) AS v
  FROM (
{input_sql.strip()}
  ) WHERE {t_col} IS NOT NULL AND {value_col} IS NOT NULL
), sd_w AS (
  SELECT {keys}, t, v,
         sum(v) OVER w AS s, count(*) OVER w AS n
  FROM sd_in
  WINDOW w AS (PARTITION BY {keys} ORDER BY t
               RANGE BETWEEN {h} PRECEDING AND {h} FOLLOWING)
), sd_t AS (
  SELECT {keys}, t, v,
         CAST((s::HUGEINT - (((s::HUGEINT % {win}) + {win}) % {win}))
              // {win} AS BIGINT) AS trend,
         ((t % {period}) + {period}) % {period} AS phase
  FROM sd_w WHERE n = {win}
), sd_s AS (
  SELECT {keys}, phase,
         CAST((sum(v - trend)::HUGEINT
               - (((sum(v - trend)::HUGEINT % count(*))
                   + count(*)) % count(*)))
              // count(*) AS BIGINT) AS seasonal
  FROM sd_t GROUP BY {keys}, phase
)
SELECT {t_keys}, sd_t.t, sd_t.v AS value, sd_t.trend, sd_s.seasonal,
       sd_t.v - sd_t.trend - sd_s.seasonal AS remainder
FROM sd_t JOIN sd_s ON {on} AND sd_t.phase = sd_s.phase"""
