"""Privacy-audit operators for training-data release: k-anonymity and
l-diversity over quasi-identifier (QI) columns.

A record is k-anonymous when at least k rows share its full QI tuple
(the "equivalence class"); the class is l-diverse when the sensitive
attribute takes at least l distinct values inside it. Releasing a
corpus whose metadata sidecar carries (site, date-bucket, region)-like
columns needs exactly this screen before the sidecar ships — the same
groupBy shape as a data-quality profile, so it lives next to
dq_profile/benford in the audit family.

Both metrics are pure counting — exactly portable across engines with
no quantization at all. The operator returns only the VIOLATING
equivalence classes (k < k_min or l < l_min), so output volume is
bounded by the number of risky classes, not the input row count.

Scale shape: one shuffle on the QI key with map-side combine for the
class size; the distinct-sensitive count is the standard two-phase
aggregate (dedup on (QI, sensitive) then count), still a single
logical groupBy pipeline — no joins, no windows, no driver collect. A
mega-hot QI class (one tuple covering most rows) is absorbed by the
partial aggregation, because both count and count-distinct are
mergeable. NULL sensitive values do not count toward diversity
(count(DISTINCT x) excludes NULL in Spark and DuckDB alike — the
conservative reading for an auditor); NULL QI values form their own
class via the null-safe grouping both engines share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(df: DataFrame, qi_cols: list[str], sensitive_col: str,
                k_min: int, l_min: int) -> DataFrame:
    """Violating equivalence classes under k-anonymity / l-diversity.

    Returns one row per QI class with k_size < k_min OR l_distinct <
    l_min: the QI columns plus k_size (class row count), l_distinct
    (distinct non-NULL sensitive values) and the two 0/1 violation
    flags. A clean table returns zero rows — cheap to assert in a
    release gate.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    reserved = {"k_size", "l_distinct", "k_violation", "l_violation"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input must not already have columns {clash}")
    if sensitive_col in qi_cols:
        raise ValueError("sensitive_col cannot be a QI column")
    classes = (df.groupBy(*qi_cols)
               .agg(F.count(F.lit(1)).cast("long").alias("k_size"),
                    F.count_distinct(F.col(sensitive_col))
                    .cast("long").alias("l_distinct")))
    return (classes
            .withColumn("k_violation",
                        (F.col("k_size") < k_min).cast("int"))
            .withColumn("l_violation",
                        (F.col("l_distinct") < l_min).cast("int"))
            .filter((F.col("k_violation") == 1)
                    | (F.col("l_violation") == 1)))


def k_anonymity_sql(input_sql: str, qi_cols: list[str],
                    sensitive_col: str, k_min: int, l_min: int) -> str:
    """DuckDB twin of k_anonymity: same groupBy counts, same flags."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    keys = ", ".join(qi_cols)
    return f"""WITH ka_in AS MATERIALIZED (
{input_sql.strip()}
), ka_cls AS (
  SELECT {keys}, CAST(count(*) AS BIGINT) AS k_size,
         CAST(count(DISTINCT {sensitive_col}) AS BIGINT) AS l_distinct
  FROM ka_in GROUP BY {keys}
)
SELECT {keys}, k_size, l_distinct,
       CAST(k_size < {k_min} AS INT) AS k_violation,
       CAST(l_distinct < {l_min} AS INT) AS l_violation
FROM ka_cls
WHERE k_size < {k_min} OR l_distinct < {l_min}"""
