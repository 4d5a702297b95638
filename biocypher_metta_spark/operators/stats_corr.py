"""Shared lagged-correlation core for autocorr / crosscorr.

Split out of stats.py so both operators provably run the same
recurrence; the SQL-twin generators mirror this module line for line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,0)"


def lagged_corr(df: DataFrame, key_cols: list[str], t_col: str,
                x_col: str, y_col: str, lags: tuple, scale: int,
                out_col: str) -> DataFrame:
    """floor(scale * pearson) over the pairs (x_t, y_{t+k}) per key
    and lag — CALENDAR lag via a RANGE [k, k] frame (a row-offset
    lead() would demand a dense run of ticks); gaps and NULL values
    drop the pair on EITHER side (null value = unobserved tick).

    Cross-engine exactness is the expr_gene_corr recipe: moments are
    exact integers (DECIMAL(38,0); caller quantizes so |v| * rows
    fits ~10^18 per moment), floats appear only in the final
    IEEE-identical sqrt/divide, and the result is clamped to ±scale
    (at exact |corr| = 1 the float sqrt pair can overshoot by one
    milli — identically in both engines, but ±scale is the honest
    bound).

    Scale shape: ONE shuffle on the key for the ordered window; all
    |lags| RANGE-frame columns ride in that single window pass,
    stacked map-side into (lag, x, y) rows; the moment groupBy on
    (key, lag) reuses the key partitioning. Per-key series length is
    the window task bound — keys are entities (groups, tickers,
    pages), so ticks/key is bounded by retention, not corpus size."""
    if not lags:
        raise ValueError("lags must be non-empty")
    x = F.col(x_col).cast("long")
    y_src = F.col(y_col).cast("long")

    # Window expressions cannot sit inside a generator: materialize
    # the per-lag columns in one projection (same partition + order
    # for every arm -> one shuffle, one WindowExec), THEN explode.
    def frame(k):
        return (Window.partitionBy(*key_cols)
                .orderBy(F.col(t_col).cast("long"))
                .rangeBetween(k, k))

    leads = (df.select(
        *key_cols, x.alias("_x"),
        *[F.max(y_src).over(frame(k)).alias(f"_y{k}") for k in lags]))
    arms = [F.struct(F.lit(k).cast("long").alias("lag"),
                     F.col("_x").alias("x"),
                     F.col(f"_y{k}").alias("y")) for k in lags]
    stacked = (leads.select(*key_cols,
                            F.explode(F.array(*arms)).alias("p"))
               .select(*key_cols, "p.lag", "p.x", "p.y")
               .filter(F.col("x").isNotNull()
                       & F.col("y").isNotNull()))
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
    q = F.floor(F.lit(scale) * num.cast("double")
                / (F.sqrt(denx.cast("double"))
                   * F.sqrt(deny.cast("double"))))
    return (agg.select(
        *key_cols, "lag", "m",
        F.when((denx > 0) & (deny > 0),
               F.greatest(F.lit(-scale), F.least(F.lit(scale), q)))
        .cast("long").alias(out_col)))


def _frame_sql(k: int) -> str:
    if k > 0:
        return f"RANGE BETWEEN {k} FOLLOWING AND {k} FOLLOWING"
    if k < 0:
        return f"RANGE BETWEEN {-k} PRECEDING AND {-k} PRECEDING"
    return "RANGE BETWEEN CURRENT ROW AND CURRENT ROW"


def lagged_corr_sql(input_sql: str, key_cols: list[str], t_col: str,
                    x_col: str, y_col: str, lags: tuple, scale: int,
                    out_col: str) -> str:
    """DuckDB twin of lagged_corr (HUGEINT moments, same float tail,
    same clamp)."""
    if not lags:
        raise ValueError("lags must be non-empty")
    keys = ", ".join(key_cols)
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT {keys}, CAST({k} AS BIGINT) AS lag,
         CAST({x_col} AS BIGINT) AS x,
         max(CAST({y_col} AS BIGINT)) OVER
           (PARTITION BY {keys} ORDER BY {t_col}
            {_frame_sql(k)}) AS y
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
  FROM stacked WHERE x IS NOT NULL AND y IS NOT NULL
  GROUP BY {keys}, lag
)
SELECT {keys}, lag, m,
       CAST(CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
            THEN greatest(-{scale}, least({scale},
                 floor({scale} * CAST(m * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE))))))
       END AS BIGINT) AS {out_col}
FROM agg"""
