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

from pyspark.sql import DataFrame
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

    Scale shape: ONE shuffle on the key for the ordered window; all
    |lags| RANGE-frame columns ride in that single window pass,
    stacked map-side into (lag, x, y) rows; the moment groupBy on
    (key, lag) reuses the key partitioning. Per-key series length is
    the window task bound — keys are entities (groups, tickers,
    pages), so ticks/key is bounded by retention, not corpus size."""
    from pyspark.sql import Window

    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be >= 1")
    x = F.col(value_col).cast("long")
    # Calendar lag = RANGE frame [k, k] on the tick column: picks the
    # value at exactly tick t+k whether or not intermediate ticks are
    # observed (a row-offset lead() would demand a dense run). max()
    # over the 1-point frame is exact under the unique-tick contract.
    # Window expressions cannot sit inside a generator: materialize
    # the per-lag columns in one projection (same partition + order
    # for every arm -> one shuffle, one WindowExec), THEN explode.
    def frame(k):
        return (Window.partitionBy(*key_cols)
                .orderBy(F.col(t_col).cast("long"))
                .rangeBetween(k, k))

    leads = (df.select(
        *key_cols, x.alias("_x"),
        *[F.max(x).over(frame(k)).alias(f"_y{k}") for k in lags]))
    arms = [F.struct(F.lit(k).cast("long").alias("lag"),
                     F.col("_x").alias("x"),
                     F.col(f"_y{k}").alias("y")) for k in lags]
    stacked = (leads.select(*key_cols,
                            F.explode(F.array(*arms)).alias("p"))
               .select(*key_cols, "p.lag", "p.x", "p.y")
               .filter(F.col("y").isNotNull()))
    d = lambda c: c.cast(_DEC)  # noqa: E731
    agg = (stacked.groupBy(*key_cols, "lag")
           .agg(F.count(F.lit(1)).cast("long").alias("m"),
                F.sum(d(F.col("x"))).alias("sx"),
                F.sum(d(F.col("y"))).alias("sy"),
                F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
                F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
                F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy")))
    m = d(F.col("m"))
    num = m * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = m * F.col("syy") - F.col("sy") * F.col("sy")
    # Clamp: at exact |corr| = 1 the float sqrt pair can overshoot
    # (sqrt(d)*sqrt(d) > d) and floor lands at ±(scale+1); both
    # engines overshoot identically, but ±scale is the honest bound.
    q = F.floor(F.lit(scale) * num.cast("double")
                / (F.sqrt(denx.cast("double"))
                   * F.sqrt(deny.cast("double"))))
    return (agg.select(
        *key_cols, "lag", "m",
        F.when((denx > 0) & (deny > 0),
               F.greatest(F.lit(-scale), F.least(F.lit(scale), q)))
        .cast("long").alias("ac_milli")))


def autocorr_sql(input_sql: str, key_cols: list[str], t_col: str,
                 value_col: str, lags: tuple = (1, 2, 3),
                 scale: int = 1000) -> str:
    """DuckDB twin of autocorr (HUGEINT moments, same float tail)."""
    keys = ", ".join(key_cols)
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT {keys}, CAST({k} AS BIGINT) AS lag,
         CAST({value_col} AS BIGINT) AS x,
         max(CAST({value_col} AS BIGINT)) OVER
           (PARTITION BY {keys} ORDER BY {t_col}
            RANGE BETWEEN {k} FOLLOWING AND {k} FOLLOWING) AS y
  FROM base"""
        for k in lags)
    return f"""WITH base AS (
{input_sql.strip()}
), stacked AS (
{arms}
), agg AS (
  SELECT {keys}, lag, CAST(count(*) AS BIGINT) AS m,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM stacked WHERE y IS NOT NULL
  GROUP BY {keys}, lag
)
SELECT {keys}, lag, m,
       CAST(CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
            THEN greatest(-{scale}, least({scale},
                 floor({scale} * CAST(m * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))))
       END AS BIGINT) AS ac_milli
FROM agg"""
