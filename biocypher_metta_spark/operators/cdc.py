"""Change-data-capture compaction operators: changelog -> snapshot
(latest state per key) and changelog -> SCD2 validity intervals.

A 100-TB lakehouse ingests mutation streams, not static tables: entity
updates from upstream crawls, KG node re-annotations, CDC feeds from
the operational stores.  Two canonical reductions cover almost every
consumer: the *snapshot* (current state per key, deletes applied) that
feeds batch jobs, and the *SCD2 history* (one validity interval per
version) that feeds as-of queries (operators/temporal.asof_join reads
exactly this shape).  The reference engine
(Habush/biocypher-metta) rebuilds its whole space from scratch each
run (metta_space loads, no incremental path); these operators are the
incremental-ingest complement, same family as lineage.py's
resume story.

Scale shape
-----------
`changelog_compact` is ONE key shuffle with map-side partial
aggregation: `max_by(payload_struct, order_struct)` combines inside
each map task, so a key with 10^9 updates ships one candidate row per
input partition to the reducer — never the full history (the window
formulation row_number()+filter would sort the full history per key;
that is deliberately only the DuckDB twin's plan).  `scd2_intervals`
is the classic one-shuffle-per-key windowed lead(); its per-key sort
is bounded by versions-per-key, which in CDC feeds is the small
dimension.  Neither touches the driver.

Cross-engine exactness: ordering is the lexicographic comparison of
the `order_cols` tuple — identical in Spark struct comparison and the
twin's `ORDER BY ... DESC` / tuple-inequality predicates — so with the
documented uniqueness contract both engines pick the same version
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _check_cols(df_cols: list, wanted: list, what: str) -> None:
    missing = [c for c in wanted if c not in df_cols]
    if missing:
        raise ValueError(f"{what} column(s) {missing} not in {df_cols}")


def changelog_compact(log: DataFrame, key_cols: list, order_cols: list,
                      op_col: str | None = None,
                      delete_op: str = "delete") -> DataFrame:
    """Latest-state snapshot of a changelog: one row per key — the one
    with the lexicographically greatest `order_cols` tuple — with keys
    whose latest operation is `delete_op` dropped entirely (the CDC
    tombstone rule).  Output keeps every input column.

    Contract: the `order_cols` tuple must be non-NULL and unique per
    key (a CDC feed's (commit_ts, seq) always is); under ties the
    winner would be engine-dependent, so the contract is documented
    rather than silently broken.
    """
    _check_cols(log.columns, key_cols + order_cols
                + ([op_col] if op_col else []), "key/order/op")
    overlap = set(key_cols) & set(order_cols)
    if overlap:
        raise ValueError(f"key and order columns overlap: {sorted(overlap)}")
    payload = [c for c in log.columns if c not in key_cols]
    ordc = F.struct(*[F.col(c) for c in order_cols])
    latest = (log.groupBy(*key_cols)
              .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), ordc)
                   .alias("_v")))
    out = latest.select(*key_cols,
                        *[F.col(f"_v.{c}").alias(c) for c in payload])
    if op_col:
        out = out.filter(F.col(op_col) != delete_op)
    return out


def changelog_compact_sql(log_sql: str, key_cols: list, order_cols: list,
                          out_cols: list, op_col: str | None = None,
                          delete_op: str = "delete") -> str:
    """DuckDB twin of changelog_compact() — deliberately the WINDOW
    formulation (row_number over key ordered by the tuple DESC) so the
    gate cross-checks the semantics against a different plan shape."""
    part = ", ".join(f'"{c}"' for c in key_cols)
    order = ", ".join(f'"{c}" DESC' for c in order_cols)
    cols = ", ".join(f'"{c}"' for c in out_cols)
    where = "cc_rn = 1"
    if op_col:
        where += f" AND \"{op_col}\" <> '{delete_op}'"
    return f"""WITH cc_log AS (
{log_sql.strip()}
), cc_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {order})
         AS cc_rn
  FROM cc_log
)
SELECT {cols} FROM cc_ranked WHERE {where}"""


def scd2_intervals(log: DataFrame, key_cols: list, order_cols: list,
                   ts_col: str | None = None) -> DataFrame:
    """Slowly-changing-dimension type-2 history: every changelog row
    becomes a version with `valid_from` (its own timestamp),
    `valid_to` (the NEXT version's timestamp per key, NULL while
    current) and `is_current` — the exact input shape
    operators/temporal.asof_join consumes.  `ts_col` defaults to
    order_cols[0]; versions are ordered by the full `order_cols` tuple
    (same uniqueness contract as changelog_compact).
    """
    _check_cols(log.columns, key_cols + order_cols, "key/order")
    ts_col = ts_col or order_cols[0]
    _check_cols(log.columns, [ts_col], "ts")
    for c in ("valid_from", "valid_to", "is_current"):
        if c in log.columns:
            raise ValueError(f"input already has a column named {c!r}")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols])
    nxt = F.lead(F.col(ts_col)).over(w)
    return (log
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", nxt)
            .withColumn("is_current", nxt.isNull()))


def scd2_intervals_sql(log_sql: str, key_cols: list, order_cols: list,
                       out_cols: list, ts_col: str | None = None) -> str:
    """DuckDB twin of scd2_intervals() — deliberately the CORRELATED
    SUBQUERY formulation (min ts over strictly-later versions of the
    same key) instead of lead(): a different plan computing the same
    interval bounds.  The strictly-later predicate is the expanded
    lexicographic comparison of the full order tuple."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    ts_col = ts_col or order_cols[0]
    keys_eq = " AND ".join(f'r."{c}" = l."{c}"' for c in key_cols)
    alts = []
    for i, c in enumerate(order_cols):
        eqs = [f'r."{p}" = l."{p}"' for p in order_cols[:i]]
        alts.append(" AND ".join(eqs + [f'r."{c}" > l."{c}"']))
    later = "(" + " OR ".join(f"({a})" for a in alts) + ")"
    nxt = (f'(SELECT min(r."{ts_col}") FROM s2_log r '
           f"WHERE {keys_eq} AND {later})")
    cols = ", ".join(f'l."{c}"' for c in out_cols
                     if c not in ("valid_from", "valid_to", "is_current"))
    return f"""WITH s2_log AS (
{log_sql.strip()}
)
SELECT {cols},
       l."{ts_col}" AS valid_from,
       {nxt} AS valid_to,
       ({nxt} IS NULL) AS is_current
FROM s2_log l"""


def salted_join(left: DataFrame, right: DataFrame, on: list,
                n_salts: int = 16, how: str = "inner",
                seed: int = 0x5A17) -> DataFrame:
    """Skew-safe equi-join: the classic salting pattern for a hot key
    too large for one reducer but a right side too large to broadcast.
    The left side gets a uniform per-row salt in [0, n_salts); the
    right side is replicated n_salts times; the join key becomes
    (key, salt), splitting a mega-key's rows across n_salts reducers.
    Results are EXACTLY those of the plain join (the salt only touches
    routing), which is what the oracle gate asserts.

    Only inner/left survive salting unchanged (each left row carries
    exactly one salt, so unmatched-left semantics are preserved);
    right/full would see unmatched RIGHT rows n_salts times and are
    refused.  AQE's skew-join split handles moderate skew without
    this; salting is the explicit tool for the 10^9-rows-on-one-key
    regime, where a single post-shuffle partition exceeds what AQE
    can re-split (it can only split existing shuffle files it sees).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    clash = {"_salt"} & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError("input already has a column named '_salt'")
    l = left.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, on + ["_salt"], how).drop("_salt")


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list,
                  value_cols: list) -> DataFrame:
    """Keyed diff of two table versions — the nightly-build
    regression primitive (what changed between yesterday's KG and
    today's?): one row per key present in either snapshot whose
    state differs, tagged 'added' / 'removed' / 'changed'; unchanged
    keys are filtered OUT before materialization, so the output is
    sized by churn, not by table. Output columns: key_cols,
    `change`, and each value column twice (`<c>_old`, `<c>_new`;
    the absent side is NULL for added/removed).

    Requires one row per key in each snapshot (a snapshot IS a keyed
    state table — changelog_compact above produces exactly this
    shape); duplicate keys would cross-multiply in the join in any
    engine.

    Scale shape: one full outer join on the key (two key shuffles),
    value comparison via null-safe struct equality INSIDE the join
    projection — no second pass, no collect. At 100 TB both
    snapshots are bucketed on the key (bucketing.write_bucketed) and
    the diff becomes exchange-free."""
    _check_cols(old.columns, key_cols + value_cols, "old")
    _check_cols(new.columns, key_cols + value_cols, "new")
    o = old.select(*key_cols,
                   F.struct(*[F.col(c) for c in value_cols]).alias("_vo"))
    n = new.select(*key_cols,
                   F.struct(*[F.col(c) for c in value_cols]).alias("_vn"))
    j = o.join(n, key_cols, "full_outer")
    change = (F.when(F.col("_vo").isNull(), "added")
              .when(F.col("_vn").isNull(), "removed")
              .when(~F.col("_vo").eqNullSafe(F.col("_vn")), "changed"))
    out_vals = []
    for c in value_cols:
        out_vals.append(F.col(f"_vo.{c}").alias(f"{c}_old"))
        out_vals.append(F.col(f"_vn.{c}").alias(f"{c}_new"))
    return (j.withColumn("change", change)
            .filter(F.col("change").isNotNull())
            .select(*key_cols, "change", *out_vals))


def snapshot_diff_sql(old_sql: str, new_sql: str, key_cols: list,
                      value_cols: list) -> str:
    """DuckDB twin of snapshot_diff: FULL OUTER JOIN with per-column
    IS DISTINCT FROM — an independent spelling of the null-safe
    struct comparison."""
    keys = ", ".join(key_cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    key_sel = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}"
                        for k in key_cols)
    any_k_old = f"o.{key_cols[0]}"
    any_k_new = f"n.{key_cols[0]}"
    differs = " OR ".join(f"o.{c} IS DISTINCT FROM n.{c}"
                          for c in value_cols)
    outer_vals = ", ".join(f"sd_o_{c} AS {c}_old, sd_n_{c} AS {c}_new"
                           for c in value_cols)
    return f"""WITH sd_old AS MATERIALIZED (
{old_sql.strip()}
), sd_new AS MATERIALIZED (
{new_sql.strip()}
)
SELECT {keys}, change, {outer_vals}
FROM (
  SELECT {key_sel},
    CASE WHEN {any_k_old} IS NULL THEN 'added'
         WHEN {any_k_new} IS NULL THEN 'removed'
         WHEN {differs} THEN 'changed' END AS change,
    {', '.join(f'o.{c} AS sd_o_{c}, n.{c} AS sd_n_{c}' for c in value_cols)}
  FROM sd_old o FULL OUTER JOIN sd_new n ON {on}
)
WHERE change IS NOT NULL"""
