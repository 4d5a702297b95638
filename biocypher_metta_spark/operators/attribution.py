"""Multi-touch marketing attribution, integer-exact across engines.

Assigns each conversion's credit (an integer budget of `scale`
milli-units) to the channel touchpoints that preceded it inside a
lookback window — the standard analytics families:

  first    — the earliest in-window touch takes the whole budget
  last     — the latest in-window touch takes it
  linear   — floor(scale/n) per touch, remainder to the LAST touch
  position — U-shape: 40%/40% to the first and last touch, the
             middle pool split evenly with remainder to the last
             middle touch (n=1 -> all; n=2 -> ceil/floor halves)

Credits are integers by construction: every division is a floor with
the remainder pinned to a named position, so per-channel sums are
exact in any engine and the per-conversion total is always `scale`.

Tie discipline: touches are ordered by (ts, channel) inside each
conversion. With equal timestamps the channel breaks the tie; exact
(ts, channel) duplicates may swap positions, but any swap exchanges
credit between identical channels, so per-channel sums stay
deterministic.

Scale shape: one user-key equi-join (touches x conversions, both
sides shuffled once on the key users are already bucketed by in a
real pipeline), the in-window filter applied inside the join
projection so fanout is per-user activity x per-user conversions —
bounded by retention, not corpus size. Position/count ride a single
(conv_id) window on the join output; the final credit groupBy is a
bounded channels-sized aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MODELS = ("first", "last", "linear", "position")


def attribution_credits(touches: DataFrame, convs: DataFrame,
                        user_col: str, ts_col: str, channel_col: str,
                        conv_id_col: str, conv_ts_col: str,
                        model: str = "linear",
                        lookback_s: int = 86400,
                        scale: int = 1000) -> DataFrame:
    """Per-channel attributed credit: (channel, n_touches,
    credit_milli). A touch is in-window when
    conv_ts - lookback_s < ts <= conv_ts. Conversions with no
    in-window touch contribute nothing (unattributable — surface
    them with an anti-join if needed; they are not silently assigned
    to a fake 'direct' channel here)."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}, got {model!r}")
    if lookback_s <= 0:
        raise ValueError(f"lookback_s must be > 0, got {lookback_s}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    t = touches.select(F.col(user_col).alias("_u"),
                       F.col(ts_col).cast("long").alias("_ts"),
                       F.col(channel_col).alias("_ch"))
    c = convs.select(F.col(user_col).alias("_u"),
                     F.col(conv_id_col).alias("_cid"),
                     F.col(conv_ts_col).cast("long").alias("_cts"))
    j = (t.join(c, "_u")
         .filter((F.col("_ts") <= F.col("_cts"))
                 & (F.col("_ts") > F.col("_cts") - lookback_s)))
    w = Window.partitionBy("_cid").orderBy("_ts", "_ch")
    wall = Window.partitionBy("_cid")
    j = j.select("_cid", "_ch",
                 F.row_number().over(w).alias("_rn"),
                 F.count(F.lit(1)).over(wall).alias("_n"))

    rn, n = F.col("_rn"), F.col("_n")
    s = F.lit(scale)
    if model == "first":
        credit = F.when(rn == 1, s).otherwise(F.lit(0))
    elif model == "last":
        credit = F.when(rn == n, s).otherwise(F.lit(0))
    elif model == "linear":
        base = F.floor(s / n)
        credit = base + F.when(rn == n, s - n * base).otherwise(F.lit(0))
    else:  # position (U-shape 40/20/40)
        end_w = F.lit(scale * 400 // 1000)
        pool = s - 2 * end_w
        mid = F.floor(pool / (n - 2))
        credit = (
            F.when(n == 1, s)
            .when(n == 2, F.when(rn == 1, s - F.floor(s / 2))
                  .otherwise(F.floor(s / 2)))
            .when((rn == 1) | (rn == n), end_w)
            .otherwise(mid + F.when(rn == n - 1,
                                    pool - (n - 2) * mid)
                       .otherwise(F.lit(0))))

    return (j.groupBy(F.col("_ch").alias("channel"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_touches"),
                 F.sum(credit).cast("long").alias("credit_milli")))


def attribution_sql(touch_sql: str, conv_sql: str, user_col: str,
                    ts_col: str, channel_col: str, conv_id_col: str,
                    conv_ts_col: str, model: str = "linear",
                    lookback_s: int = 86400, scale: int = 1000) -> str:
    """DuckDB twin of attribution_credits: the same join + window
    recurrence with the same floor/remainder pinning."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}, got {model!r}")
    end_w = scale * 400 // 1000
    credit = {
        "first": "CASE WHEN rn = 1 THEN {s} ELSE 0 END",
        "last": "CASE WHEN rn = n THEN {s} ELSE 0 END",
        "linear": ("({s} // n) + CASE WHEN rn = n"
                   " THEN {s} - n * ({s} // n) ELSE 0 END"),
        "position": (
            "CASE WHEN n = 1 THEN {s}"
            " WHEN n = 2 THEN CASE WHEN rn = 1"
            "   THEN {s} - {s} // 2 ELSE {s} // 2 END"
            f" WHEN rn = 1 OR rn = n THEN {end_w}"
            f" ELSE ({{s}} - 2*{end_w}) // (n - 2)"
            f"   + CASE WHEN rn = n - 1 THEN ({{s}} - 2*{end_w})"
            f"     - (n - 2) * (({{s}} - 2*{end_w}) // (n - 2))"
            "     ELSE 0 END END"),
    }[model].format(s=scale)
    return f"""WITH att_t AS (
{touch_sql.strip()}
), att_c AS (
{conv_sql.strip()}
), att_j AS (
  SELECT c.{conv_id_col} AS cid, t.{channel_col} AS ch,
         CAST(row_number() OVER (PARTITION BY c.{conv_id_col}
              ORDER BY t.{ts_col}, t.{channel_col}) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY c.{conv_id_col}) AS BIGINT)
           AS n
  FROM att_t t JOIN att_c c ON t.{user_col} = c.{user_col}
   AND t.{ts_col} <= c.{conv_ts_col}
   AND t.{ts_col} > c.{conv_ts_col} - {lookback_s}
)
SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum({credit}) AS BIGINT) AS credit_milli
FROM att_j GROUP BY ch"""
