"""Planar proximity join: all point pairs within radius r, grid-cell
blocked — the 2D sibling of the 1D bucketed range joins
(functions/genomic.py) and the spatial member of the blocking-join
family (LSH banding, sign-sketch buckets, interval buckets, now grid
cells). Coordinates are pre-quantized integers (the house contract:
scale your meters/degrees to ints upstream), so the distance filter
dx^2 + dy^2 <= r^2 is exact int64 arithmetic in any engine — no
haversine floats whose libm could diverge cross-engine.

Why not a join on the distance predicate directly: that is an
inequality join — a cross product at the planner level. Grid blocking
makes it an EQUI-join: with cell size = r, any qualifying pair lies
within one cell step in each dimension, so joining side A on its own
cell against side B exploded to its 3x3 cell neighborhood finds every
qualifying pair EXACTLY once (the 9 expanded cells are distinct, so at
most one cell can equal A's) — no distinct/dedup step, the
canonical-bucket-emission argument from interval_overlap_join in 2D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cell(col: str, r: int):
    # floor division via double floor — exact for |coord| < 2^52 and
    # correct (toward -inf) for negative coordinates, the same
    # spelling as the 1D genomic buckets
    return F.floor(F.col(col) / F.lit(float(r))).cast("long")


def proximity_join(points: DataFrame, r: int, id_col: str = "id",
                   x_col: str = "x", y_col: str = "y") -> DataFrame:
    """All unordered point pairs within Euclidean distance r:
    (id_a, id_b, dist_sq) with id_a < id_b and dist_sq = dx^2 + dy^2
    <= r^2 (integer-exact; boundary INclusive). NULL ids/coords drop.

    Scale shape: one equi-join on (cell_x, cell_y) — side A keyed by
    its own cell, side B exploded 9x to its neighborhood — so shuffle
    volume is 10x the points, NEVER a cross product; each unordered
    pair meets exactly twice (A/B roles swapped) and the id_a < id_b
    filter keeps one. Candidate volume per cell is density-bound:
    points per r x r cell squared — the operator's honest cost is the
    output-volume bound, same as interval_overlap's 10x rehearsal. A
    mega-dense cell is a hot join key; AQE's skew split applies, and
    shrinking r (finer cells + a post-filter at the caller's true
    radius) is the documented escape hatch. Caller contract:
    |coordinate| < 2^31 keeps dx^2 + dy^2 inside int64.

    Oracle twin (proximity_join_sql) is the direct inequality-join
    spelling — the plan this operator exists to avoid, which is
    exactly what makes it an independent check of the math."""
    if r < 1:
        raise ValueError(f"r must be >= 1, got {r}")
    p = (points.select(F.col(id_col).alias("_pid"),
                       F.col(x_col).cast("long").alias("_px"),
                       F.col(y_col).cast("long").alias("_py"))
         .filter(F.col("_pid").isNotNull() & F.col("_px").isNotNull()
                 & F.col("_py").isNotNull()))
    a = p.select(F.col("_pid").alias("id_a"),
                 F.col("_px").alias("_ax"), F.col("_py").alias("_ay"),
                 _cell("_px", r).alias("_cx"),
                 _cell("_py", r).alias("_cy"))
    offs = F.array(*[F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
                     for dx, dy in _NEIGHBOR_OFFSETS])
    b = (p.select(F.col("_pid").alias("id_b"),
                  F.col("_px").alias("_bx"), F.col("_py").alias("_by"),
                  _cell("_px", r).alias("_bcx"),
                  _cell("_py", r).alias("_bcy"),
                  F.explode(offs).alias("_o"))
         .select("id_b", "_bx", "_by",
                 (F.col("_bcx") + F.col("_o.ox")).alias("_cx"),
                 (F.col("_bcy") + F.col("_o.oy")).alias("_cy")))
    dsq = ((F.col("_ax") - F.col("_bx")) * (F.col("_ax") - F.col("_bx"))
           + (F.col("_ay") - F.col("_by")) * (F.col("_ay") - F.col("_by")))
    return (a.join(b, ["_cx", "_cy"])
            .filter((F.col("id_a") < F.col("id_b"))
                    & (dsq <= F.lit(r) * F.lit(r)))
            .select("id_a", "id_b", dsq.cast("long").alias("dist_sq")))


def proximity_join_sql(points_sql: str, r: int, id_col: str = "id",
                       x_col: str = "x", y_col: str = "y") -> str:
    """DuckDB twin of proximity_join: the direct inequality-join
    spelling over the same integer coordinates."""
    if r < 1:
        raise ValueError(f"r must be >= 1, got {r}")
    return f"""WITH px_pts AS MATERIALIZED (
  SELECT {id_col} AS id, CAST({x_col} AS BIGINT) AS x,
         CAST({y_col} AS BIGINT) AS y
  FROM (
{points_sql.strip()}
  ) WHERE {id_col} IS NOT NULL AND {x_col} IS NOT NULL
    AND {y_col} IS NOT NULL
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
FROM px_pts a JOIN px_pts b
  ON a.id < b.id
 AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
     <= {r * r}"""
