"""Deterministic corpus sampling operators.

A 100-TB training-data pipeline samples constantly — held-out eval
draws, per-stratum balancing (so one mega-language doesn't drown the
mixture), quick-look QA subsets — and at that scale a sample must be
(a) reproducible across reruns and engines (else the eval set drifts
between ingestion runs), (b) computable without a global sort or a
driver-side RNG, and (c) unbiased.  Both operators here get all three
from the same primitive the split/dedup family already uses: the
portable 60-bit md5 prefix hash (`text.portable_hash`), salted so two
experiments draw independent samples from the same corpus.

Spark's own `df.sample()` fails (a): it draws from a per-partition RNG
seeded by (seed, partition index), so any repartition or input-split
change reassigns the sample — and no other engine can reproduce it.
Hash-threshold sampling is the standard fix (the same trick A/B
bucketing systems use).

Scale shape
-----------
`hash_sample` is map-only: a filter on a hash of the id, no shuffle,
no state; Catalyst keeps it inside the scan's WholeStageCodegen and
it composes with partition pruning.  `stratified_sample` keeps the
n smallest salted hashes per stratum — a uniform without-replacement
draw — via one shuffle on the stratum key + a per-stratum top-n
window.  Strata are things like language or source (tens..thousands of
groups), so the shuffle is low-cardinality but potentially SKEWED (en
>> mt).  For mega-strata the window's per-key sort is the bound; the
`prefilter_permille` knob bounds it: a map-side hash filter keeps only
the smallest `prefilter_permille`/1000 of each stratum BEFORE the
shuffle, which preserves the exact result as long as the kept prefix
still contains >= n rows (the filter keeps h below a magnitude cut —
a PREFIX of the hash space — so the n smallest hashes survive
whenever at least n rows do).  Sizing rule:
prefilter_permille >= ceil(1000 * n / min_stratum_size) * safety(4x).
With it, a 10^9-row English stratum sends ~10^6 rows through the sort
instead of 10^9.  (No reference counterpart — the reference engine
(Habush/biocypher-metta) has no sampling surface at all.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from biocypher_metta_spark.operators.text import portable_hash


def _salted_hash(id_col: str, salt: str) -> Column:
    return portable_hash(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))


def hash_sample(df: DataFrame, rate_permille: int,
                id_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    """Keep each row iff hash(salt:id) % 1000 < rate_permille.

    Map-only Bernoulli(rate_permille/1000) sample, reproducible across
    runs, partitionings, and engines.  Salting keys the draw to the
    experiment: disjoint salts give independent samples; the SAME salt
    at a smaller rate gives a strict subset (nested samples — handy for
    scaling-law ladders where each rung must contain the previous)."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError(f"rate_permille must be in [0, 1000], "
                         f"got {rate_permille}")
    return df.filter(_salted_hash(id_col, salt) % 1000 < rate_permille)


def stratified_sample(df: DataFrame, strata_cols: list, n: int,
                      id_col: str = "doc_id", salt: str = "strat",
                      prefilter_permille: int | None = None) -> DataFrame:
    """Uniform without-replacement sample of up to n rows per stratum.

    Keeps the n rows with the smallest salted hash within each stratum
    (ties on the 60-bit hash broken by id — exact duplicates of a
    (salt, id) pair hash identically, so the tie-break only matters for
    duplicate ids).  Because the hash is uniform and independent of the
    data, the n smallest hashes are a uniform without-replacement draw.
    Adds `sample_rank` (1-based draw order — row k of a size-j sample
    is itself a uniform j-choose-k prefix, so downstream can shrink the
    sample without redrawing).

    `prefilter_permille` (optional) applies a map-side hash band filter
    before the shuffle to bound the per-stratum sort; see the module
    docstring for the sizing rule.  Raises upstream nothing — if the
    band was sized too tight a stratum silently yields < n rows, so
    callers that must guarantee n should verify counts (the gate's
    pytest does)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = _salted_hash(id_col, salt).alias("_strat_h")
    out = df.select("*", h)
    if prefilter_permille is not None:
        if not 0 < prefilter_permille <= 1000:
            raise ValueError(f"prefilter_permille must be in (0, 1000], "
                             f"got {prefilter_permille}")
        # magnitude threshold, NOT a modulus band: the kept rows must be
        # a PREFIX of the per-stratum sort order (smallest hashes) for
        # the top-n result to be preserved exactly; h is uniform on
        # [0, 2^60) so this keeps ~permille/1000 of each stratum.
        cut = (prefilter_permille * (1 << 60)) // 1000
        out = out.filter(F.col("_strat_h") < cut)
    w = (Window.partitionBy(*strata_cols)
         .orderBy(F.col("_strat_h"), F.col(id_col)))
    return (out.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n)
            .drop("_strat_h"))


def weighted_sample(df: DataFrame, n: int, weight_col: str,
                    strata_cols: list | None = None,
                    id_col: str = "doc_id",
                    salt: str = "wsamp") -> DataFrame:
    """Weighted without-replacement sample of up to n rows (per
    stratum when `strata_cols` is given, else global): priority
    sampling [Duffield-Lund-Thorup] — each row draws u = (h+1)/2^60
    from its salted portable hash and the n rows with the largest
    priority w/u win, giving inclusion probability min(1, w/tau)
    proportional to weight. The heavier a row, the more certain its
    inclusion; a weight-1 corpus degrades exactly to
    stratified_sample's uniform draw.

    Determinism across engines is why the priority is w/(h+1) and not
    the Efraimidis-Spirakis u^(1/w) key: exp/log are NOT correctly
    rounded by IEEE 754 (libm results differ across engines/platforms,
    enough to swap near-tied ranks), while double DIVISION is — both
    Spark and the DuckDB twin compute bit-identical priorities from
    the same 60-bit hash. Ties (same priority, e.g. duplicate ids)
    break by id.

    Rows with NULL or non-positive weight are excluded (a zero weight
    has priority 0 in any engine; a negative one would invert the
    order nonsensically).

    Scale shape: the global form is orderBy+limit — Spark plans
    TakeOrdered(n), a map-side per-partition top-n then an n-row
    driver merge, NO global sort shuffle. The stratified form is the
    stratified_sample window plan: one shuffle on the stratum key +
    per-stratum top-n; for mega-strata, bound the sort with a
    map-side priority floor the same way prefilter_permille bounds
    the uniform draw (not built until a profile needs it — the
    uniform band trick needs a weight-dependent threshold here)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("double")
    pri = (w / (_salted_hash(id_col, salt) + F.lit(1).cast("long")))
    out = (df.filter(F.col(weight_col).isNotNull() & (w > 0))
           .select("*", pri.alias("_pri")))
    if strata_cols:
        win = (Window.partitionBy(*strata_cols)
               .orderBy(F.col("_pri").desc(), F.col(id_col)))
        return (out.withColumn("sample_rank", F.row_number().over(win))
                .filter(F.col("sample_rank") <= n)
                .drop("_pri"))
    top = out.orderBy(F.col("_pri").desc(), F.col(id_col)).limit(n)
    win = Window.orderBy(F.col("_pri").desc(), F.col(id_col))
    # the rank window runs over <= n already-collected rows, not data
    return (top.withColumn("sample_rank", F.row_number().over(win))
            .drop("_pri"))
