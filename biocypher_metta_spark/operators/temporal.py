"""Temporal operators Spark has no native form of: as-of join.

The classic event-enrichment primitive (every fact row picks the most
recent dimension snapshot at-or-before its timestamp — pandas
merge_asof / DuckDB ASOF JOIN / kdb aj). Spark offers only equi- and
range-joins, so this composes the standard union-and-carry plan:

    tag both sides -> union -> window per key ordered by (ts, side) ->
    last(payload, ignorenulls) carries the latest right row forward ->
    keep left rows.

One shuffle on the key, one ordered window — the same cost envelope as
any per-key window. The right payload is packed into a single STRUCT
before the carry so multi-column snapshots stay atomic (per-column
last(ignorenulls) could mix rows when snapshots contain nulls).

Skew note (100 TB): the window is per-key sequential; a mega-hot key
(one user with 10^9 events) serializes on one task. As-of semantics
need the full per-key ordering, so the mitigation is time-bucketing
the key: carry the last snapshot per bucket in a cheap pre-pass over
BUCKET-level rows (10^9 events/key at hourly buckets = ~10^4 carry
rows), then window inside (key, bucket) — parallel across buckets.
That path ships behind the `bucket=` knob; the plain form stays the
default because the extra shuffles only pay off when a key is hot.

The DuckDB oracle twin is the NATIVE `ASOF LEFT JOIN`
(entry_queries.rel_asof_join) — an independent implementation of the
same semantics, which is exactly what a correctness gate wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              suffix: str = "_asof", bucket=None,
              direction: str = "backward") -> DataFrame:
    """As-of join: every left row gains one right row for the same key,
    chosen by `direction` (the pandas merge_asof surface):

      - 'backward' (default): greatest right_ts <= left_ts (ties: the
        snapshot AT the event time counts);
      - 'forward': smallest right_ts >= left_ts (inclusive);
      - 'nearest': whichever of the two is closer in time; an exact
        tie takes the BACKWARD snapshot (documented, test-pinned).

    Right columns other than key/timestamp come back suffixed; left
    rows with no match in the chosen direction keep nulls (left-join
    semantics). 'forward' is the mirrored one-window plan; 'nearest'
    runs both carries over the SAME key partitioning (one shuffle, two
    sorts) and picks per row by absolute time distance — the snapshot
    timestamp rides inside the packed payload struct so the distance
    and the pick can never come from different rows.

    `bucket` (hot-key escape hatch): a MONOTONE Column function of the
    timestamp (e.g. ``lambda c: F.floor(c / 3600)`` for numeric ts, or
    ``lambda c: F.floor(F.unix_timestamp(c) / 3600)`` for timestamps —
    all ts in bucket b must sort >= all ts in buckets < b). With it,
    the ordered window runs within (key, bucket) so a mega-hot key
    parallelizes across its time buckets; a bucket-level carry pre-pass
    (max_by per (key, bucket), then one per-key window over the tiny
    bucket-row table) supplies the snapshot carried in from earlier
    buckets. Same semantics as the plain form (property-tested); costs
    two extra small shuffles, so keep the default for uniform keys."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    if bucket is not None and direction != "backward":
        raise ValueError(
            "bucket= (hot-key carry) supports direction='backward' only; "
            "the forward carry is its mirror — build it when a profile "
            "shows a hot key under forward/nearest semantics")
    payload_cols = [c for c in right.columns if c not in (key, right_ts)]
    if not payload_cols:
        raise ValueError("right side has no payload columns")
    if "_snap" in payload_cols:
        raise ValueError("right column '_snap' is reserved")
    reserved = {"_ts", "_is_right", "_payload", "_carried",
                "_bucket", "_bucket_last", "_carry_in"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"reserved column names in use: {sorted(clash)}")
    out_clash = {f"{c}{suffix}" for c in payload_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            "suffixed right payload columns would overwrite left columns: "
            f"{sorted(out_clash)} (pick a different suffix)")
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.struct(F.col(right_ts).cast("double").alias("_snap"),
                 *[F.col(c) for c in payload_cols]).alias("_payload"))
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"))
    u = l.unionByName(r, allowMissingColumns=True)

    if bucket is None:
        # backward: right rows sort BEFORE left rows at equal ts;
        # forward: right rows sort AFTER at equal ts — both make the
        # at-event-time snapshot an inclusive match
        wb = (Window.partitionBy(key)
              .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.partitionBy(key)
              .orderBy(F.col("_ts").asc(), F.col("_is_right").asc())
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        if direction == "backward":
            pick = F.last("_payload", ignorenulls=True).over(wb)
        elif direction == "forward":
            pick = F.first("_payload", ignorenulls=True).over(wf)
        else:
            b = F.last("_payload", ignorenulls=True).over(wb)
            f = F.first("_payload", ignorenulls=True).over(wf)
            lts = F.col("_ts").cast("double")
            pick = (F.when(b.isNull(), f)
                    .when(f.isNull(), b)
                    .when(lts - b.getField("_snap")
                          <= f.getField("_snap") - lts, b)
                    .otherwise(f))
        carried = u.withColumn("_carried", pick)
        out = carried.filter(F.col("_is_right") == 0)
    else:
        # --- bucket-level carry pre-pass (rows = distinct (key,bucket),
        # NOT events; this is what breaks the hot-key serialization) ---
        rb = (r.withColumn("_bucket", bucket(F.col("_ts")))
              .groupBy(key, "_bucket")
              .agg(F.max_by("_payload", "_ts").alias("_bucket_last")))
        lb = l.select(key, bucket(F.col("_ts")).alias("_bucket")).distinct()
        allb = lb.unionByName(rb.select(key, "_bucket")).distinct()
        w_carry = (Window.partitionBy(key).orderBy("_bucket")
                   .rowsBetween(Window.unboundedPreceding, -1))
        carry = (allb.join(rb, [key, "_bucket"], "left")
                 .withColumn("_carry_in",
                             F.last("_bucket_last", ignorenulls=True)
                             .over(w_carry))
                 .select(key, "_bucket", "_carry_in"))
        # --- main pass: the ordered window now parallelizes across
        # (key, bucket); earlier-bucket matches come from the carry ---
        ub = u.withColumn("_bucket", bucket(F.col("_ts")))
        w = (Window.partitionBy(key, "_bucket")
             .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = (ub.withColumn(
            "_carried", F.last("_payload", ignorenulls=True).over(w))
            .filter(F.col("_is_right") == 0)
            .join(carry, [key, "_bucket"], "left")
            .withColumn("_carried",
                        F.coalesce(F.col("_carried"), F.col("_carry_in")))
            .drop("_bucket", "_carry_in"))
        out = carried

    for c in payload_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_carried.{c}"))
    return out.drop("_ts", "_is_right", "_payload", "_carried")


def hypertable_rollup(events: DataFrame, ts_col: str = "ts",
                      value_col: str = "value",
                      levels: tuple = ("minute", "hour", "day")) -> dict:
    """Multi-resolution continuous aggregates (the TimescaleDB
    hypertable-rollup pattern): per time bucket, (n, total, vmin, vmax)
    at each level, where every COARSER level reaggregates the finer
    rollup instead of the raw table — count/sum/min/max are mergeable,
    so the day level reads 24 hourly rows per key, not 86400 seconds of
    raw events. That reaggregation chain is the whole point at 100 TB:
    the raw scan happens once, every further resolution is a
    ~60x-smaller shuffle. avg is served as total/n downstream (avg
    itself is not mergeable; its parts are).

    Values aggregate as floor(value*100) longs — a deterministic integer
    quantization, not exact cents (double arithmetic can make e.g.
    0.29*100 floor to 28); both engines apply the identical recurrence,
    so cross-engine oracles hash-match. Returns {level: DataFrame} with
    columns (bucket, n, total, vmin, vmax)."""
    if not levels:
        raise ValueError("need at least one rollup level")
    v = F.floor(F.col(value_col) * 100).cast("long")
    cur = (events
           .groupBy(F.date_trunc(levels[0], F.col(ts_col)).alias("bucket"))
           .agg(F.count("*").alias("n"), F.sum(v).alias("total"),
                F.min(v).alias("vmin"), F.max(v).alias("vmax")))
    out = {levels[0]: cur}
    for lv in levels[1:]:
        cur = (cur
               .groupBy(F.date_trunc(lv, F.col("bucket")).alias("bucket"))
               .agg(F.sum("n").alias("n"), F.sum("total").alias("total"),
                    F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")))
        out[lv] = cur
    return out


def gapfill_locf(obs: DataFrame, key: str, ts_col: str,
                 value_cols: list, step: int,
                 max_grid_per_key: int = 10_000_000) -> DataFrame:
    """Time-series gap fill + last-observation-carried-forward (the
    TimescaleDB time_bucket_gapfill/locf pair, the other half of the
    hypertable family above): for each key, emit a DENSE integer
    timestamp grid from that key's min to max observation at `step`,
    and fill each value column on grid rows (and on observed NULLs)
    with the latest earlier non-null observation for the same key.
    Output: (key, ts, *value_cols, is_gap) — is_gap marks rows the
    grid synthesized. Earliest rows stay NULL when nothing precedes
    them (LOCF has nothing to carry).

    Timestamps are INTEGERS (epoch seconds/millis — caller's choice);
    integer grids are the cross-engine-exact form (date arithmetic
    rounds differently across engines) and what sequence()/
    generate_series both speak natively.

    Contract: one observation row per (key, ts) — duplicates would
    fan out the grid join in BOTH engines identically, but the result
    stops being a time series; pre-aggregate first.

    Scale shape: per-key bounds come from one groupBy (map-side
    combine), the grid is a map-side sequence()+explode over those
    BOUND rows (never a driver loop, never a global range crossed
    with keys), the observation attach is one equi-join on
    (key, ts), and the carry is one per-key ordered window. A key's
    grid is range/step rows — `max_grid_per_key` guards the
    pathological key whose [min,max] span would explode the grid
    (a 10-year key at 1s step = 3*10^8 rows ON ONE KEY before any
    window runs); such keys raise loudly rather than OOM a task,
    and the caller picks a coarser step. The window serializes per
    key like any LOCF; the asof_join bucket= pre-pass above is the
    template if a profiled hot key ever needs splitting."""
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")
    if not value_cols:
        raise ValueError("need at least one value column")
    reserved = {"_tmin", "_tmax", "is_gap"}
    clash = reserved & set(obs.columns)
    if clash:
        raise ValueError(f"reserved column names in use: {sorted(clash)}")
    o = obs.filter(F.col(ts_col).isNotNull() & F.col(key).isNotNull())
    bounds = (o.groupBy(key)
              .agg(F.min(ts_col).alias("_tmin"), F.max(ts_col).alias("_tmax")))
    # loud guard, evaluated inside the explode projection: raise_error
    # is a row expression, so the check distributes with the data
    span_ok = ((F.col("_tmax") - F.col("_tmin")) / step
               < F.lit(max_grid_per_key))
    grid = bounds.select(
        key,
        F.explode(F.when(span_ok, F.sequence(
            F.col("_tmin"), F.col("_tmax"), F.lit(step)))
            .otherwise(F.raise_error(F.concat(
                F.lit("gapfill_locf: key "), F.col(key).cast("string"),
                F.lit(f" spans more than max_grid_per_key={max_grid_per_key}"
                      f" grid rows at step={step}"))))).alias(ts_col))
    joined = grid.join(
        o.select(key, ts_col, *value_cols,
                 F.lit(False).alias("is_gap")),
        [key, ts_col], "left")
    w = (Window.partitionBy(key).orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = joined.withColumn("is_gap", F.coalesce("is_gap", F.lit(True)))
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def gapfill_locf_sql(obs_sql: str, key: str, ts_col: str,
                     value_cols: list, step: int) -> str:
    """DuckDB twin of gapfill_locf(): generate_series per key bounds
    + LEFT JOIN + last_value(... IGNORE NULLS) — the independent
    spelling of sequence/explode + last(ignorenulls)."""
    locf = ",\n       ".join(
        f"last_value(o.{c} IGNORE NULLS) OVER w AS {c}"
        for c in value_cols)
    ocols = ", ".join(f"o.{c}" for c in value_cols)
    return f"""WITH gf_obs AS MATERIALIZED (
  SELECT * FROM (
{obs_sql.strip()}
  ) WHERE {ts_col} IS NOT NULL AND {key} IS NOT NULL
), gf_bounds AS MATERIALIZED (
  SELECT {key}, min({ts_col}) AS tmin, max({ts_col}) AS tmax
  FROM gf_obs GROUP BY 1
), gf_grid AS MATERIALIZED (
  SELECT {key}, unnest(generate_series(tmin, tmax, {step})) AS {ts_col}
  FROM gf_bounds
)
SELECT g.{key}, g.{ts_col},
       {locf},
       o.{ts_col} IS NULL AS is_gap
FROM gf_grid g
LEFT JOIN gf_obs o
  ON g.{key} = o.{key} AND g.{ts_col} = o.{ts_col}
WINDOW w AS (PARTITION BY g.{key} ORDER BY g.{ts_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def ewma(df: DataFrame, key: str, ts_col: str, value_col: str,
         lookback: int = 32) -> DataFrame:
    """Exponentially weighted moving average per key, integer-exact
    across engines — the time-series smoothing primitive the
    hypertable/gapfill family lacks (trend lines over metric streams,
    burn-rate monitors, decayed popularity scores for retrieval).

    Cross-engine exactness is the design constraint, and it dictates
    the two non-obvious choices:
      * decay is FIXED at 1/2 per step, so every weight 2^(L-1-d) is
        an exact int64 power of two — no float weight ever exists;
      * the window is TRUNCATED at `lookback` = L rows (default 32):
        dropped terms carry weight < 2^-31 of the newest row, and the
        truncation is replicated verbatim in the twin, so it is
        deterministic quantization, not drift.
    For each row t (rows ordered by ts_col within key, n = number of
    rows in the frame, m = min(n, L)):
        ewma_num = sum_{d=0..m-1} value[t-d] * 2^(L-1-d)   (int64)
        wsum     = 2^L - 2^(L-m)                            (int64)
        ewma     = floor(ewma_num / wsum)   -- the normalized average,
    floor-division spelled sign-correctly on both sides (pmod form
    here, native floor // in DuckDB). Caller contract: |value| *
    2^lookback must fit int64 (cents-scale inputs with L=32 leave 20
    bits of headroom) and (key, ts_col) pairs are unique — ties would
    make the rows-frame engine-dependent.

    Scale shape: ONE key shuffle, one ordered rows-frame window on it
    (collect of <= L (ts, value) structs per row, sort_array so the
    result never depends on collect order), all arithmetic in
    zip_with/aggregate built-ins — map-side, no second exchange, no
    Python. Skew = rows per key, same profile as every per-key window
    here; the asof_join bucket trick applies if one key dominates."""
    if not 1 <= lookback <= 62:
        raise ValueError(f"lookback must be in [1, 62], got {lookback}")
    w = (Window.partitionBy(key).orderBy(ts_col)
         .rowsBetween(-(lookback - 1), 0))
    lst = F.sort_array(F.collect_list(
        F.struct(F.col(ts_col).alias("t"),
                 F.col(value_col).cast("long").alias("v"))).over(w))
    vals = F.transform(lst, lambda s: s["v"])
    n = F.size(vals)
    # literal weight tables (powers of two are exact int64 literals):
    # weight for the d-th newest row is 2^(L-1-d); a frame of n rows
    # has total weight 2^L - 2^(L-n)
    wts = F.array(*[F.lit(1 << (lookback - 1 - d)).cast("long")
                    for d in range(lookback)])
    wsums = F.array(*[F.lit((1 << lookback) - (1 << (lookback - m)))
                      .cast("long") for m in range(1, lookback + 1)])
    terms = F.zip_with(
        vals, F.sequence(F.lit(1), n),
        lambda x, i: x * F.element_at(wts, (n - i + 1).cast("int")))
    num = F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)
    wsum = F.element_at(wsums, n.cast("int"))
    out = (df.filter(F.col(value_col).isNotNull())
           .select(key, ts_col,
                   num.alias("ewma_num"), wsum.alias("_w")))
    # floor division valid for negative numerators too: pmod >= 0, and
    # (num - pmod) is exactly divisible so integer `div` IS the floor —
    # a float `/` here would round once ewma_num exceeds 2^53
    return out.select(
        key, ts_col, "ewma_num",
        F.expr("(ewma_num - pmod(ewma_num, _w)) div _w").alias("ewma"))


def ewma_sql(input_sql: str, key: str, ts_col: str, value_col: str,
             lookback: int = 32) -> str:
    """DuckDB twin of ewma — the self-join spelling: pair each row
    with its <= lookback predecessors by row_number distance and sum
    value * (1 << (L-1-distance)). Floor division is spelled with the
    same non-negative-mod trick as the Spark side (DuckDB's // and %
    truncate toward zero on negatives, unlike pmod). Independent of
    the window-frame + zip_with fold on the Spark side."""
    if not 1 <= lookback <= 62:
        raise ValueError(f"lookback must be in [1, 62], got {lookback}")
    L = lookback
    return f"""WITH ew_agg AS MATERIALIZED (
  SELECT a.{key} AS {key}, a.{ts_col} AS {ts_col},
    CAST(sum(b.v * (CAST(1 AS BIGINT) << ({L - 1} - (a.rn - b.rn))))
         AS BIGINT) AS ewma_num,
    (CAST(1 AS BIGINT) << {L}) -
      (CAST(1 AS BIGINT) << ({L} - CAST(count(*) AS INT))) AS wsum
  FROM (
    SELECT {key}, {ts_col}, CAST({value_col} AS BIGINT) AS v,
           row_number() OVER (PARTITION BY {key} ORDER BY {ts_col}) AS rn
    FROM (
{input_sql.strip()}
    ) WHERE {value_col} IS NOT NULL
  ) a JOIN (
    SELECT {key}, CAST({value_col} AS BIGINT) AS v,
           row_number() OVER (PARTITION BY {key} ORDER BY {ts_col}) AS rn
    FROM (
{input_sql.strip()}
    ) WHERE {value_col} IS NOT NULL
  ) b
    ON a.{key} = b.{key} AND b.rn BETWEEN a.rn - {L - 1} AND a.rn
  GROUP BY 1, 2
)
SELECT {key}, {ts_col}, ewma_num,
  CAST((ewma_num - (((ewma_num % wsum) + wsum) % wsum)) // wsum
       AS BIGINT) AS ewma
FROM ew_agg"""


def funnel_stages(events: DataFrame, user_col: str, ts_col: str,
                  step_col: str, steps: list[str]) -> DataFrame:
    """Ordered-funnel analysis: per user, the length of the longest
    prefix of `steps` completable by that user's events in
    non-decreasing timestamp order (the product-analytics funnel —
    ClickHouse windowFunnel / Amplitude funnels — which the events
    table of any large pipeline eventually needs). Output:
    (user_col, stage) with stage in [1, len(steps)], one row per user
    whose earliest `steps[0]` event exists; users who never enter the
    funnel emit nothing.

    Semantics: step k+1 may fire at the SAME timestamp as step k
    (>=); at equal timestamps earlier steps match first (the
    (ts, step_index) sort below — replicated by the twin's `t >=
    prev` joins). `steps` must be distinct, else one event could be
    asked to satisfy two stages.

    Scale shape: ONE shuffle. The step->index map is applied map-side
    and non-funnel events are dropped BEFORE the groupBy, so the
    per-user collected array is bounded by the user's funnel events,
    not their total activity; the greedy prefix scan runs inside
    F.aggregate (JVM codegen, no Python). Greedy-earliest is exact
    for unconstrained ordered funnels: taking the earliest event that
    extends the current prefix never forecloses a longer prefix
    (exchange argument — any completion can be rewritten to use the
    earliest candidates). A per-key mega-hot user costs one task its
    array, bounded by that user's funnel events.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    idx = F.element_at(
        F.create_map(*[F.lit(x) for s, i in
                       ((s, i) for i, s in enumerate(steps))
                       for x in (s, i)]),
        F.col(step_col))
    ev = (events
          .select(F.col(user_col).alias("_u"),
                  F.col(ts_col).alias("_t"), idx.alias("_si"))
          .filter(F.col("_si").isNotNull())
          .filter(F.col("_t").isNotNull()))
    per = ev.groupBy("_u").agg(
        F.sort_array(F.collect_list(F.struct("_t", "_si"))).alias("_evs"))
    stage = F.aggregate(
        "_evs", F.lit(0),
        lambda acc, x: F.when(x["_si"] == acc, acc + 1).otherwise(acc))
    return (per.select(F.col("_u").alias(user_col),
                       stage.cast("int").alias("stage"))
            .filter(F.col("stage") >= 1))


def funnel_stages_sql(events_sql: str, user_col: str, ts_col: str,
                      step_col: str, steps: list[str]) -> str:
    """DuckDB twin of funnel_stages: the ITERATIVE min-timestamp
    spelling — t0 = min ts of steps[0] per user, t_{k} = min ts of a
    steps[k] event at-or-after t_{k-1} — chained left joins, a
    completely different plan from the one-shuffle array-greedy scan
    on the Spark side."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    for s in steps:
        if not s.replace("_", "").replace("-", "").isalnum():
            raise ValueError(f"step name {s!r} must be alphanumeric")
    ctes = [f"""fn_ev AS MATERIALIZED (
  SELECT {user_col} AS u, {ts_col} AS t, {step_col} AS s FROM (
{events_sql.strip()}
  ) WHERE {ts_col} IS NOT NULL
)""",
            f"""fn_t0 AS (
  SELECT u, min(t) AS t0 FROM fn_ev WHERE s = '{steps[0]}' GROUP BY 1
)"""]
    for i in range(1, len(steps)):
        ctes.append(f"""fn_t{i} AS (
  SELECT e.u, min(e.t) AS t{i}
  FROM fn_ev e JOIN fn_t{i - 1} p ON e.u = p.u
  WHERE e.s = '{steps[i]}' AND e.t >= p.t{i - 1}
  GROUP BY 1
)""")
    cases = " ".join(
        f"WHEN t{i} IS NOT NULL THEN {i + 1}"
        for i in range(len(steps) - 1, 0, -1))
    joins = "\n".join(f"LEFT JOIN fn_t{i} USING (u)"
                      for i in range(1, len(steps)))
    case = f"CASE {cases} ELSE 1 END" if cases else "1"
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT u AS {user_col}, CAST({case} AS INT) AS stage\n"
            f"FROM fn_t0\n{joins}")


def retention_cohorts(events: DataFrame, user_col: str, ts_col: str,
                      period_days: int = 7) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    activity, counted in every later period they return (the
    product-analytics retention triangle; period = `period_days`
    buckets of days since epoch, integer-exact in both engines).

    Output: (cohort, offset_p, n_users) — n_users distinct users from
    cohort `cohort` active `offset_p` periods later; offset 0 is the
    cohort size itself.

    Scale shape: dedup to (user, period) first — the map-side
    distinct collapses each user's in-period activity before anything
    shuffles — then ONE groupBy(user) for the cohort anchor, a
    co-partitioned self-join on user (both sides hash on the same
    key; no second shuffle of the big side), and a final count per
    (cohort, offset) where rows are already distinct users. No
    count(DISTINCT) anywhere — the early dedup makes plain count()
    exact."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    p = F.floor(
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01"))
        / period_days).cast("long")
    ev = (events.select(F.col(user_col).alias("_u"), p.alias("_p"))
          .filter(F.col("_p").isNotNull())
          .distinct())
    first = ev.groupBy("_u").agg(F.min("_p").alias("_c"))
    return (ev.join(first, "_u")
            .groupBy(F.col("_c").alias("cohort"),
                     (F.col("_p") - F.col("_c")).alias("offset_p"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users")))


def retention_cohorts_sql(events_sql: str, user_col: str, ts_col: str,
                          period_days: int = 7) -> str:
    """DuckDB twin of retention_cohorts: the WINDOW spelling —
    min(period) OVER (PARTITION BY user) instead of groupBy + join."""
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    return f"""WITH rc_ev AS MATERIALIZED (
  SELECT DISTINCT {user_col} AS u,
         CAST(floor(date_diff('day', DATE '1970-01-01',
                              CAST({ts_col} AS DATE))
                    / {period_days}) AS BIGINT) AS p
  FROM (
{events_sql.strip()}
  ) WHERE {ts_col} IS NOT NULL
), rc_w AS (
  SELECT u, p, min(p) OVER (PARTITION BY u) AS c FROM rc_ev
)
SELECT c AS cohort, p - c AS offset_p,
       CAST(count(*) AS BIGINT) AS n_users
FROM rc_w GROUP BY 1, 2"""


def event_transitions(events: DataFrame, user_col: str, ts_col: str,
                      step_col: str) -> DataFrame:
    """First-order journey graph: counts of (from_step -> to_step)
    transitions between CONSECUTIVE events per user (the Markov /
    Sankey input of product analytics). Ties on timestamp order by
    step value so the sequence — and therefore the counts — is a
    total order both engines agree on.

    Output: (from_step, to_step, n). One key shuffle + one ordered
    window (lead), then a bounded-cardinality groupBy (|steps|^2
    rows at most) with map-side combine."""
    w = Window.partitionBy("_u").orderBy("_t", "_s")
    ev = (events.select(F.col(user_col).alias("_u"),
                        F.col(ts_col).alias("_t"),
                        F.col(step_col).alias("_s"))
          .filter(F.col("_t").isNotNull() & F.col("_s").isNotNull()))
    return (ev.withColumn("_nxt", F.lead("_s").over(w))
            .filter(F.col("_nxt").isNotNull())
            .groupBy(F.col("_s").alias("from_step"),
                     F.col("_nxt").alias("to_step"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def event_transitions_sql(events_sql: str, user_col: str, ts_col: str,
                          step_col: str) -> str:
    """DuckDB twin of event_transitions — same lead-window recurrence
    (the independence here is the engine, not the plan: there is only
    one sensible spelling of a lag-1 transition count)."""
    return f"""WITH et_in AS MATERIALIZED (
  SELECT {user_col} AS u, {ts_col} AS t, {step_col} AS s FROM (
{events_sql.strip()}
  ) WHERE {ts_col} IS NOT NULL AND {step_col} IS NOT NULL
), et_n AS (
  SELECT s, lead(s) OVER (PARTITION BY u ORDER BY t, s) AS nxt
  FROM et_in
)
SELECT s AS from_step, nxt AS to_step, CAST(count(*) AS BIGINT) AS n
FROM et_n WHERE nxt IS NOT NULL GROUP BY 1, 2"""


def time_weighted_avg(obs: DataFrame, key_cols: list[str], ts_col: str,
                      value_col: str, end_ts) -> DataFrame:
    """Duration-weighted average per key (TWAP): each observation
    holds its value until the next one; the last holds until
    `end_ts` (a literal or Column). Integer-exact: value * seconds
    summed as DECIMAL(38,0), floor-divided at the end; rows at or
    after end_ts contribute zero duration.

    Output: (key..., twap, dur_total). One key shuffle + one ordered
    lead window + one mergeable groupBy on the same key — the second
    agg re-uses the window's partitioning (no extra exchange)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    end = end_ts if isinstance(end_ts, Column) else F.lit(end_ts)
    # ties on timestamp order by value too — otherwise WHICH of two
    # same-instant observations carries the interval is engine-
    # dependent (one gets zero duration, the other the full span)
    w = Window.partitionBy(*key_cols).orderBy(ts_col, value_col)
    nxt = F.coalesce(F.lead(ts_col).over(w), end.cast("timestamp"))
    dur = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col(ts_col)))
    dur = F.greatest(dur, F.lit(0)).cast("decimal(38,0)")
    wsum = (obs.filter(F.col(value_col).isNotNull()
                       & F.col(ts_col).isNotNull())
            .withColumn("_dur", dur)
            .groupBy(*key_cols)
            .agg(F.sum(F.col(value_col).cast("decimal(38,0)")
                       * F.col("_dur")).alias("_vd"),
                 F.sum("_dur").alias("_d")))
    quot = (F.col("_vd") - ((F.col("_vd") % F.col("_d"))
                            + F.col("_d")) % F.col("_d")) / F.col("_d")
    return (wsum.filter(F.col("_d") > 0)
            .select(*key_cols,
                    quot.cast("long").alias("twap"),
                    F.col("_d").cast("long").alias("dur_total")))


def time_weighted_avg_sql(obs_sql: str, key_cols: list[str],
                          ts_col: str, value_col: str,
                          end_ts: str) -> str:
    """DuckDB twin of time_weighted_avg: same lead recurrence in
    HUGEINT, floor division via the same non-negative-mod form
    (DuckDB // truncates toward zero; the pmod correction makes it
    floor, matching Spark's decimal divide + floor cast)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    keys = ", ".join(key_cols)
    return f"""WITH twa_in AS MATERIALIZED (
  SELECT * FROM (
{obs_sql.strip()}
  ) WHERE {value_col} IS NOT NULL AND {ts_col} IS NOT NULL
), twa_d AS (
  SELECT {keys},
    CAST(greatest(date_diff('second', {ts_col},
      coalesce(lead({ts_col}) OVER (PARTITION BY {keys}
                                    ORDER BY {ts_col}, {value_col}),
               TIMESTAMP '{end_ts}')), 0) AS HUGEINT) AS dur,
    CAST({value_col} AS HUGEINT) AS v
  FROM twa_in
), twa_s AS (
  SELECT {keys}, CAST(sum(v * dur) AS HUGEINT) AS vd,
         CAST(sum(dur) AS HUGEINT) AS d
  FROM twa_d GROUP BY {keys}
)
SELECT {keys},
  CAST((vd - (((vd % d) + d) % d)) // d AS BIGINT) AS twap,
  CAST(d AS BIGINT) AS dur_total
FROM twa_s WHERE d > 0"""


def funnel_stages_windowed(events: DataFrame, user_col: str,
                           ts_col: str, step_col: str,
                           steps: list[str],
                           within_seconds: int) -> DataFrame:
    """Windowed ordered funnel (the ClickHouse windowFunnel
    semantics): per user, the longest prefix of `steps` completable
    in timestamp order with EVERY step inside `within_seconds` of
    the chain's FIRST step. Greedy-earliest is NOT exact here (a
    later first-step event can open a better window), so this runs
    the exact DP: scanning events in (ts, step_index) order, keep
    for each level the LATEST chain-start timestamp that reaches it
    — a later start dominates (strictly more window left), so one
    long per level is a complete state. The scan is an F.aggregate
    fold over the per-user sorted array (JVM codegen), accumulator =
    array of k start-timestamps.

    Output: (user_col, stage), stage in [1, len(steps)], rows only
    for users whose steps[0] occurs. Same one-shuffle scale shape as
    funnel_stages: non-funnel events drop map-side.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    if within_seconds < 0:
        raise ValueError(f"within_seconds must be >= 0, "
                         f"got {within_seconds}")
    k = len(steps)
    t_win = within_seconds * 1_000_000  # epoch micros
    idx = F.element_at(
        F.create_map(*[F.lit(x) for s, i in
                       ((s, i) for i, s in enumerate(steps))
                       for x in (s, i)]),
        F.col(step_col))
    # cast NTZ -> LTZ first: the session tz is pinned UTC
    # (session.py), so naive parquet timestamps read as UTC micros —
    # exactly DuckDB's epoch_us() on the same naive value
    ev = (events
          .select(F.col(user_col).alias("_u"),
                  F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
                  .alias("_t"),
                  idx.alias("_si"))
          .filter(F.col("_si").isNotNull() & F.col("_t").isNotNull()))
    per = ev.groupBy("_u").agg(
        F.sort_array(F.collect_list(F.struct("_t", "_si"))).alias("_evs"))

    def step_fn(acc, x):
        def upd(s, l):
            prev = F.element_at(acc, l)  # 1-based: acc[l-1]
            return (F.when(x["_si"] == l,
                           F.when(l == F.lit(0),
                                  F.greatest(s, x["_t"]))
                           .otherwise(F.when(
                               prev.isNotNull()
                               & (prev >= x["_t"] - F.lit(t_win)),
                               F.greatest(s, prev)).otherwise(s)))
                    .otherwise(s))
        return F.transform(acc, upd)

    stage = F.aggregate(
        "_evs",
        F.array_repeat(F.lit(None).cast("long"), k),
        step_fn,
        lambda acc: F.size(F.filter(acc, lambda s: s.isNotNull())))
    return (per.select(F.col("_u").alias(user_col),
                       stage.cast("int").alias("stage"))
            .filter(F.col("stage") >= 1))


def funnel_stages_windowed_sql(events_sql: str, user_col: str,
                               ts_col: str, step_col: str,
                               steps: list[str],
                               within_seconds: int) -> str:
    """DuckDB twin of funnel_stages_windowed: the CANDIDATE-START
    spelling — every steps[0] event opens a chain keyed (user, t0);
    for a FIXED start, taking the minimal next timestamp at each
    level is optimal, so each level is one grouped min-join; stage =
    the deepest level any start reaches. A completely different
    mechanism from the per-user DP fold."""
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    if within_seconds < 0:
        raise ValueError("within_seconds must be >= 0")
    for s in steps:
        if not s.replace("_", "").replace("-", "").isalnum():
            raise ValueError(f"step name {s!r} must be alphanumeric")
    w_us = within_seconds * 1_000_000
    ctes = [f"""wf_ev AS MATERIALIZED (
  SELECT {user_col} AS u, epoch_us({ts_col}) AS t, {step_col} AS s
  FROM (
{events_sql.strip()}
  ) WHERE {ts_col} IS NOT NULL
)""",
            f"""wf_c0 AS (
  SELECT u, t AS t0, t AS tp FROM wf_ev WHERE s = '{steps[0]}'
)"""]
    for i in range(1, len(steps)):
        ctes.append(f"""wf_c{i} AS (
  SELECT e.u, p.t0, min(e.t) AS tp
  FROM wf_ev e JOIN wf_c{i - 1} p
    ON e.u = p.u AND e.t >= p.tp AND e.t <= p.t0 + {w_us}
  WHERE e.s = '{steps[i]}'
  GROUP BY 1, 2
)""")
    cases = " ".join(
        f"""WHEN EXISTS (SELECT 1 FROM wf_c{i} c
             WHERE c.u = wf_u.u) THEN {i + 1}"""
        for i in range(len(steps) - 1, 0, -1))
    case = f"CASE {cases} ELSE 1 END" if cases else "1"
    return (f"WITH {', '.join(ctes)},\n"
            f"wf_u AS (SELECT DISTINCT u FROM wf_c0)\n"
            f"SELECT u AS {user_col}, CAST({case} AS INT) AS stage\n"
            f"FROM wf_u")


def interval_peak(intervals: DataFrame, key: str, start_col: str,
                  end_col: str, validate: bool = False) -> DataFrame:
    """Peak concurrency per key: the maximum number of intervals
    [start, end] (both endpoints INCLUSIVE, long ticks) that overlap at
    any single tick, plus the first tick at which that peak is reached.
    The classic sweep-line reformulated as one Spark window: each
    interval contributes +1 at start and -1 at end+1, the running sum
    ordered by (tick, delta asc) is the live concurrency, and its max
    is the peak. Ordering the -1s before the +1s at an equal tick means
    intermediate running values can only UNDERSHOOT the true
    concurrency (never overshoot), so the row-level max is exact
    without a per-tick pre-aggregation — the whole operator is one
    shuffle on the key; the final per-key max reuses the window's
    partitioning (no second exchange). Output: (key, peak, peak_t).

    A new maximum can only be created by a +1, so the first tick
    attaining the peak is always some interval's start — which is what
    makes the independent quadratic oracle (count intervals covering
    each distinct start, per key) equivalent.

    Scale: rows-per-key bounds the window task; a mega-hot key (10^9
    concurrent-interval events on one key) serializes its sweep like
    any per-key ordered op — the asof_join time-bucket carry pattern
    applies if a profile shows it (carry the running sum per bucket).

    validate=True raises on an interval with end < start (the check is
    folded into the emitted start tick so column pruning cannot
    eliminate it); the default keeps the scan codegen-only and trusts
    the producer.
    """
    reserved = {"_t", "_d", "_run"}
    if reserved & set(intervals.columns):
        raise ValueError(f"reserved column names in use: "
                         f"{sorted(reserved & set(intervals.columns))}")
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    if validate:
        s = F.when(e >= s, s).otherwise(
            F.raise_error("interval end < start"))
    deltas = (intervals.select(F.col(key), s.alias("_t"),
                               F.lit(1).alias("_d"))
              .unionByName(
                  intervals.select(F.col(key), (e + 1).alias("_t"),
                                   F.lit(-1).alias("_d"))))
    w = (Window.partitionBy(key)
         .orderBy(F.col("_t").asc(), F.col("_d").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = deltas.withColumn("_run", F.sum("_d").over(w))
    best = (run.groupBy(key)
            .agg(F.max(F.struct(F.col("_run").alias("peak"),
                                (-F.col("_t")).alias("negt"))).alias("_b"))
            .select(key,
                    F.col("_b.peak").alias("peak"),
                    (-F.col("_b.negt")).alias("peak_t")))
    return best
