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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


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


def t_closeness(df: DataFrame, qi_cols: list[str], sensitive_col: str,
                t_ppm: int) -> DataFrame:
    """Violating equivalence classes under t-closeness for an ORDERED
    sensitive attribute — the third privacy screen after k-anonymity
    and l-diversity: a class can be large and diverse yet still leak
    (e.g. every row in it sits in the top income band). t-closeness
    bounds the Earth Mover's Distance between the class's sensitive
    distribution and the whole table's.

    For an ordinal attribute with m distinct values at unit spacing,
    EMD has the closed prefix form (Li, Li & Venkatasubramanian,
    ICDE 2007):

        D(Q, P) = (1/(m-1)) * sum_j | sum_{i<=j} (q_i - p_i) |

    Multiplying through by N (table rows) and G (class rows) clears
    both denominators: with cg_j / cn_j the class / global cumulative
    counts up to the j-th value,

        violation  <=>  1e6 * sum_j |cg_j*N - cn_j*G|  >  t_ppm * N*G*(m-1)

    — every term an exact integer in DECIMAL(38,0)/HUGEINT, so no
    quantization beyond the reported emd_ppm floor. NULL sensitive
    values drop (consistent with l-diversity's count-distinct). m = 1
    degenerates to EMD 0 (the guard divides by max(m-1, 1)).

    Returns only violating classes: QI columns, k_size, emd_ppm.

    Scale shape: per-(QI, value) counts and per-QI totals are two
    mergeable groupBys on the QI key (one exchange, hot classes
    absorbed map-side). The global value histogram is BOUNDED by the
    attribute's cardinality — the caller contract is an ordinal with
    small m (bands, scores, deciles), so it is fetched once to the
    driver (the IVF-centroid legitimacy class) and re-enters the plan
    as an exploded literal array: every class gets exactly m grid
    rows with no cross join (a crossJoin(broadcast(1-row)) would plan
    the forbidden BroadcastNestedLoopJoin). Cumulative sums are one
    window over the m-row-per-class grid — grid volume is classes*m,
    never input rows.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if sensitive_col in qi_cols:
        raise ValueError("sensitive_col cannot be a QI column")
    reserved = {"k_size", "emd_ppm", "_v", "_g", "_nv", "_cg", "_cn",
                "_s", "_gv"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input must not already have columns {clash}")
    if t_ppm < 0:
        raise ValueError(f"t_ppm must be >= 0, got {t_ppm}")
    base = (df.filter(F.col(sensitive_col).isNotNull())
            .select(*qi_cols, F.col(sensitive_col).alias("_v")))
    gv = base.groupBy(*qi_cols, "_v").agg(
        F.count(F.lit(1)).cast(_DEC).alias("_g"))
    classes = gv.groupBy(*qi_cols).agg(
        F.sum("_g").alias("k_size"))
    # global value histogram: bounded by the ordinal's cardinality
    vals = sorted((r["_v"], r["cnt"]) for r in
                  base.groupBy("_v").agg(F.count(F.lit(1)).alias("cnt"))
                  .collect())
    if not vals:
        return classes.select(
            *qi_cols, F.col("k_size").cast("long"),
            F.lit(0).cast("long").alias("emd_ppm")).limit(0)
    n_total = sum(n for _, n in vals)
    m = len(vals)
    grid = classes.select(
        *qi_cols, "k_size",
        F.explode(F.array(*[
            F.struct(F.lit(v).alias("_v"),
                     F.lit(n).cast(_DEC).alias("_nv"))
            for v, n in vals])).alias("_gv"))
    grid = grid.select(*qi_cols, "k_size",
                       F.col("_gv._v").alias("_v"),
                       F.col("_gv._nv").alias("_nv"))
    joined = (grid.join(gv, [*qi_cols, "_v"], "left")
              .withColumn("_g", F.coalesce(F.col("_g"),
                                           F.lit(0).cast(_DEC))))
    w = (Window.partitionBy(*qi_cols).orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = joined.select(
        *qi_cols, "k_size",
        F.sum("_g").over(w).alias("_cg"),
        F.sum("_nv").over(w).alias("_cn"))
    nt = F.lit(n_total).cast(_DEC)
    s = cum.groupBy(*qi_cols, "k_size").agg(
        F.sum(F.abs(F.col("_cg") * nt - F.col("_cn") * F.col("k_size")))
        .alias("_s"))
    den = nt * F.col("k_size") * F.lit(max(m - 1, 1)).cast(_DEC)
    num = F.lit(1_000_000).cast(_DEC) * F.col("_s")
    return (s.filter(num > F.lit(t_ppm).cast(_DEC) * den)
            .select(*qi_cols, F.col("k_size").cast("long").alias("k_size"),
                    ((num - num % den) / den).cast("long").alias("emd_ppm")))


def t_closeness_sql(input_sql: str, qi_cols: list[str],
                    sensitive_col: str, t_ppm: int) -> str:
    """DuckDB twin of t_closeness: same cleared-denominator prefix
    identity in HUGEINT; the grid comes from a CROSS JOIN against the
    m-row global histogram (fine in a single-node oracle — the Spark
    side avoids it only because of the BNLJ plan rule)."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    keys = ", ".join(qi_cols)
    c_keys = ", ".join(f"tc_cl.{k}" for k in qi_cols)
    on = " AND ".join(f"tc_grid.{k} = tc_gv.{k}" for k in qi_cols)
    return f"""WITH tc_in AS MATERIALIZED (
  SELECT {keys}, {sensitive_col} AS v FROM (
{input_sql.strip()}
  ) WHERE {sensitive_col} IS NOT NULL
), tc_gv AS (
  SELECT {keys}, v, CAST(count(*) AS HUGEINT) AS g
  FROM tc_in GROUP BY {keys}, v
), tc_cl AS (
  SELECT {keys}, sum(g) AS k_size FROM tc_gv GROUP BY {keys}
), tc_vals AS (
  SELECT v, CAST(count(*) AS HUGEINT) AS nv FROM tc_in GROUP BY v
), tc_tot AS (
  SELECT sum(nv) AS nt, CAST(count(*) AS HUGEINT) AS m FROM tc_vals
), tc_grid AS (
  SELECT {c_keys}, tc_cl.k_size, tc_vals.v, tc_vals.nv
  FROM tc_cl CROSS JOIN tc_vals
), tc_j AS (
  SELECT {", ".join("tc_grid." + k for k in qi_cols)},
         tc_grid.k_size, tc_grid.v, tc_grid.nv,
         coalesce(tc_gv.g, 0::HUGEINT) AS g
  FROM tc_grid LEFT JOIN tc_gv ON {on} AND tc_grid.v = tc_gv.v
), tc_c AS (
  SELECT {keys}, k_size, nv, v,
         sum(g) OVER (PARTITION BY {keys} ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cg,
         sum(nv) OVER (PARTITION BY {keys} ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cn
  FROM tc_j
), tc_s AS (
  SELECT {keys}, k_size,
         sum(abs(cg * nt - cn * k_size)) AS s,
         max(nt) AS nt, max(m) AS m
  FROM tc_c CROSS JOIN tc_tot GROUP BY {keys}, k_size
)
SELECT {keys}, CAST(k_size AS BIGINT) AS k_size,
       CAST((1000000::HUGEINT * s)
            // (nt * k_size * (CASE WHEN m > 1 THEN m - 1 ELSE 1 END))
            AS BIGINT) AS emd_ppm
FROM tc_s
WHERE 1000000::HUGEINT * s
      > {t_ppm}::HUGEINT * nt * k_size
        * (CASE WHEN m > 1 THEN m - 1 ELSE 1 END)"""
