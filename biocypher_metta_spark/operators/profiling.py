"""Data-quality profiling: the admission control of a 100 TB pipeline.

Before a new source lands in the KG build (reference: every adapter in
biocypher-metta trusts its TSV/GTF/VCF blindly — samples/*.py iterate
and throw on surprise), a profile pass answers the questions that
otherwise surface as mid-job stage failures: null rates, distinct
cardinalities, empty strings, value ranges, and foreign-key orphans.

Two operators:

- profile_columns: one row of metrics per profiled column, computed in
  a SINGLE aggregate pass over the table (Spark plans the multiple
  exact count(DISTINCT) via Expand — one shuffle carrying k copies of
  the projected columns, the textbook plan; at extreme k split the
  call). Metrics are integer-exact (counts, summed lengths) or
  string-cast min/max so the DuckDB twin can compare byte-for-byte —
  no floats anywhere.

- fk_violations: orphan child rows whose foreign key has no parent —
  a LEFT ANTI join, null-safe on the child side (a NULL fk is not an
  orphan, it is a n_null finding for profile_columns).

Both are metric-shaped (output rows ~ #columns or #orphans), so the
driver-side cost is nil regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column quality metrics in ONE aggregate pass.

    Output (one row per profiled column):
      col_name, n_rows, n_null, n_distinct (exact, nulls excluded —
      both engines' count(DISTINCT) semantics), n_empty (strings:
      trim = ''; NULL for ints), total_len (strings: sum(length);
      NULL for ints), min_v / max_v (string-cast).

    Column types are restricted to string + integral — the types
    whose min/max stringify identically across engines. Profile a
    double by quantizing it to a BIGINT first; a timestamp by casting
    to epoch micros. That restriction is what keeps every metric
    exact rather than approximately comparable.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    dtypes = dict(df.dtypes)
    structs = []
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"column {c!r} not in DataFrame")
        dt = dtypes[c]
        if dt != "string" and dt not in _INT_TYPES:
            raise ValueError(
                f"column {c!r} has type {dt}; profile_columns takes "
                "string/integral columns (quantize doubles, epoch-cast "
                "timestamps)")
        is_str = dt == "string"
        null_big = F.lit(None).cast("long")
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).cast("long")
            .alias("n_null"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            (F.sum((F.trim(F.col(c)) == "").cast("long")).cast("long")
             if is_str else null_big).alias("n_empty"),
            (F.sum(F.length(F.col(c))).cast("long")
             if is_str else null_big).alias("total_len"),
            F.min(F.col(c)).cast("string").alias("min_v"),
            F.max(F.col(c)).cast("string").alias("max_v"),
        ).alias(f"_m_{c}"))
    wide = df.agg(*structs)
    return (wide
            .select(F.explode(F.array(*[F.col(f"`_m_{c}`") for c in cols]))
                    .alias("m"))
            .select("m.*"))


def profile_columns_sql(input_sql: str, cols_types: list[tuple[str, str]],
                        ) -> str:
    """DuckDB twin of profile_columns: one SELECT per column glued by
    UNION ALL (per-column scans — the opposite plan of Spark's
    single-pass Expand aggregate). cols_types = [(name, 'string' |
    'int')]."""
    if not cols_types:
        raise ValueError("cols_types must be non-empty")
    parts = []
    for c, t in cols_types:
        if t == "string":
            n_empty = (f"CAST(sum(CASE WHEN trim({c}) = '' THEN 1 "
                       f"ELSE 0 END) AS BIGINT)")
            total_len = f"CAST(sum(length({c})) AS BIGINT)"
        elif t == "int":
            n_empty = "CAST(NULL AS BIGINT)"
            total_len = "CAST(NULL AS BIGINT)"
        else:
            raise ValueError(f"type for {c!r} must be 'string' or 'int'")
        parts.append(f"""SELECT '{c}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  {n_empty} AS n_empty,
  {total_len} AS total_len,
  CAST(min({c}) AS VARCHAR) AS min_v,
  CAST(max({c}) AS VARCHAR) AS max_v
FROM dq_in""")
    body = "\nUNION ALL\n".join(parts)
    return (f"WITH dq_in AS MATERIALIZED (\n  SELECT * FROM (\n"
            f"{input_sql.strip()}\n  )\n)\n{body}")


def fk_violations(child: DataFrame, fk_col: str, parent: DataFrame,
                  pk_col: str) -> DataFrame:
    """Child rows whose non-null foreign key has no matching parent —
    LEFT ANTI join on the key (broadcast when the parent is a
    dimension; Catalyst/AQE decides). NULL fks are excluded: a null
    is a completeness finding (profile_columns n_null), not a
    referential one."""
    return (child
            .filter(F.col(fk_col).isNotNull())
            .join(parent.select(F.col(pk_col).alias(fk_col)).distinct(),
                  fk_col, "left_anti"))


def fk_violations_sql(child_sql: str, fk_col: str, parent_sql: str,
                      pk_col: str, out_cols: list[str]) -> str:
    """DuckDB twin of fk_violations: NOT EXISTS spelling."""
    cols = ", ".join(out_cols)
    return f"""WITH fk_c AS MATERIALIZED (
  SELECT * FROM (
{child_sql.strip()}
  ) WHERE {fk_col} IS NOT NULL
), fk_p AS MATERIALIZED (
  SELECT DISTINCT {pk_col} AS k FROM (
{parent_sql.strip()}
  )
)
SELECT {cols} FROM fk_c
WHERE NOT EXISTS (SELECT 1 FROM fk_p WHERE fk_p.k = fk_c.{fk_col})"""
