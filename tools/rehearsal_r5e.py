"""10x scale rehearsal for the round-5e operators: survivorship merge,
entity resolution, ordered funnel, dq profiling, FK check, cohort
retention, and BPE train/encode.

Same contract as rehearsal_r5b/c: each op runs at N and 10N in one JVM
(warmup excluded); the plan survives the scale-up iff time grows
~linearly for row-bound ops (fixed overhead amortizing to < 10x) with
no driver collects or state blow-ups. Op-specific notes:

* survivorship: pure groupBy with per-field min(struct) — mergeable,
  so a planted mega-cluster (10% of rows in ONE cluster) must cost
  the same as uniform clusters (map-side combine absorbs it).
* entity_resolution: bounded cluster SIZE (id div 20) with count
  scaling — the design rule the gate encodes; candidate pairs grow
  linearly with clusters, not quadratically with rows.
* funnel: step events filtered map-side; per-user arrays bounded by
  planted activity (~200 events/user), one shuffle.
* bpe_train: the vocab-collapse claim measured directly — docs grow
  10x but the word vocabulary is CAPPED (synthetic 30k words), so
  per-round cost must stay flat and only the round-0 word count
  scales. Expect ratio well under 10.
* retention / dq_profile / fk_check: single-pass shapes; expect ~10
  or less.

Prints ONE JSON line per op and writes tools/rehearsal_r5e.json
(incremental-merge on partial reruns).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def run_survivorship(spark, n: int) -> dict:
    from biocypher_metta_spark.canonicalize import survivorship_merge

    # 10% of rows land in cluster 0 (mega); the rest in n/10-sized
    # uniform clusters of ~10
    d = spark.range(n).select(
        F.when((F.col("id") * 2654435761) % 10 == 0, F.lit(0))
        .otherwise(F.col("id") % (n // 10)).alias("cluster"),
        (F.col("id") % 3).alias("src_rank"),
        F.col("id").alias("rid"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("n"), (F.col("id") % 1000)
                            .cast("string"))).alias("name"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 100_000).alias("v"))
    t0 = time.time()
    out = survivorship_merge(d, "cluster", ["src_rank", "rid"],
                             ["name", "v"]).count()
    return {"rows_in": n, "clusters_out": out,
            "sec": round(time.time() - t0, 2)}


def run_entity_resolution(spark, n: int) -> dict:
    from biocypher_metta_spark.er import resolve_entities

    e = F.expr("id div 20")
    d = spark.range(n).select(
        F.col("id").alias("rid"),
        F.concat_ws(
            " ",
            F.concat(F.lit("ent"), e.cast("string")),
            F.concat(F.lit("id"), e.cast("string")),
            F.when(F.col("id") % 5 != 0,
                   F.concat(F.lit("grp"), (e % 97).cast("string"))),
            F.concat(F.lit("v"), e.cast("string"), F.lit("_"),
                     (F.col("id") % 3).cast("string"))).alias("mname"),
        (F.col("id") % 3).alias("src_rank"),
        F.concat(F.lit("nm"), F.col("id").cast("string")).alias("name"))
    t0 = time.time()
    out = resolve_entities(d, "rid", "mname", ["src_rank", "rid"],
                           ["name"], tau_permille=600).count()
    return {"records_in": n, "entities_out": out,
            "sec": round(time.time() - t0, 2)}


def run_funnel(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import funnel_stages

    users = max(n // 200, 10)
    d = spark.range(n).select(
        (F.col("id") % users).alias("u"),
        F.timestamp_seconds((F.col("id") * 2654435761) % 10_000_000)
        .alias("t"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ["s0", "s1", "s2", "s3", "zz", "yy"]]),
            (((F.col("id") * 40503) % 6) + 1).cast("int")).alias("s"))
    t0 = time.time()
    out = funnel_stages(d, "u", "t", "s", ["s0", "s1", "s2", "s3"])
    rows = out.count()
    return {"events_in": n, "users_out": rows,
            "sec": round(time.time() - t0, 2)}


def run_dq_profile(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.profiling import profile_columns

    d = spark.range(n).select(
        F.when(F.col("id") % 9 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 50_000)
                            .cast("string"))).alias("s"),
        (F.col("id") % 1_000_003).alias("k"),
        F.when(F.col("id") % 4 == 0, F.lit("")).otherwise(F.lit("xx"))
        .alias("e"))
    t0 = time.time()
    rows = profile_columns(d, ["s", "k", "e"]).count()
    return {"rows_in": n, "metric_rows": rows,
            "sec": round(time.time() - t0, 2)}


def run_fk_check(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.profiling import fk_violations

    child = spark.range(n).select(
        F.col("id").alias("ck"),
        F.when(F.col("id") % 97 == 0, F.col("id") + 10 * n)
        .otherwise(F.col("id") % (n // 10)).alias("fk"))
    parent = spark.range(n // 10).select(F.col("id").alias("pk"))
    t0 = time.time()
    out = fk_violations(child, "fk", parent, "pk").count()
    return {"children_in": n, "orphans_out": out,
            "sec": round(time.time() - t0, 2)}


def run_retention(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import retention_cohorts

    users = max(n // 500, 10)
    d = spark.range(n).select(
        (F.col("id") % users).alias("u"),
        F.timestamp_seconds(((F.col("id") * 2654435761)
                             % (100 * 7 * 86400))).alias("t"))
    t0 = time.time()
    out = retention_cohorts(d, "u", "t", 7).count()
    return {"events_in": n, "cells_out": out,
            "sec": round(time.time() - t0, 2)}


_BPE_WORDS = 30_000


def _bpe_docs(spark, n: int):
    # n "docs" of 8 words each from a CAPPED 30k-word vocabulary —
    # word text derives deterministically from the word id
    word = (F.col("wid") % _BPE_WORDS)
    spell = F.concat(
        F.lit("w"),
        F.translate(word.cast("string"),
                    "0123456789", "abcdefghij"))
    return (spark.range(n)
            .select(F.col("id").alias("doc"),
                    F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"))
            .select("doc", ((F.col("doc") * 8 + F.col("j"))
                            * 2654435761 % _BPE_WORDS).alias("wid"))
            .select("doc", spell.alias("w"))
            .groupBy("doc")
            .agg(F.concat_ws(" ", F.collect_list("w")).alias("text")))


def run_bpe_train(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.bpe import train_bpe

    d = _bpe_docs(spark, n).localCheckpoint()
    t0 = time.time()
    out = train_bpe(d, "text", 6).count()
    return {"docs_in": n, "merges_out": out,
            "sec": round(time.time() - t0, 2)}


def run_bpe_encode(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.bpe import bpe_encode_tokens

    d = _bpe_docs(spark, n).localCheckpoint()
    merges = [("a", "b"), ("c", "d"), ("w", "ab"), ("e", "f"),
              ("wab", "cd"), ("g", "h")]
    t0 = time.time()
    out = bpe_encode_tokens(d, "text", merges).count()
    return {"docs_in": n, "tokens_out": out,
            "sec": round(time.time() - t0, 2)}


def run_outlier_flags(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.stats import outlier_flags

    d = spark.range(n).select(
        (F.col("id") % 2000).alias("g"),
        F.col("id").alias("rid"),
        (((F.col("id") * 2654435761) % 1000)
         * F.when(F.col("id") % 997 == 0, 500).otherwise(1))
        .alias("v"))
    t0 = time.time()
    out = outlier_flags(d, ["g"], "v", 3000).count()
    return {"rows_in": n, "flags_out": out,
            "sec": round(time.time() - t0, 2)}


def run_transitions(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import event_transitions

    users = max(n // 300, 10)
    d = spark.range(n).select(
        (F.col("id") % users).alias("u"),
        F.timestamp_seconds((F.col("id") * 2654435761) % 10_000_000)
        .alias("t"),
        F.concat(F.lit("e"), ((F.col("id") * 40503) % 8).cast("string"))
        .alias("s"))
    t0 = time.time()
    out = event_transitions(d, "u", "t", "s").count()
    return {"events_in": n, "pairs_out": out,
            "sec": round(time.time() - t0, 2)}


def run_twap(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import time_weighted_avg

    keys = max(n // 500, 10)
    d = spark.range(n).select(
        (F.col("id") % keys).alias("k"),
        F.timestamp_seconds((F.col("id") * 2654435761) % 10_000_000)
        .alias("t"),
        ((F.col("id") * 48271) % 100_000).alias("v"))
    t0 = time.time()
    out = time_weighted_avg(d, ["k"], "t", "v",
                            "2024-12-31 00:00:00").count()
    return {"obs_in": n, "keys_out": out,
            "sec": round(time.time() - t0, 2)}


def run_funnel_windowed(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import (
        funnel_stages_windowed,
    )

    users = max(n // 200, 10)
    d = spark.range(n).select(
        (F.col("id") % users).alias("u"),
        F.timestamp_seconds((F.col("id") * 2654435761) % 10_000_000)
        .alias("t"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ["s0", "s1", "s2", "s3", "zz", "yy"]]),
            (((F.col("id") * 40503) % 6) + 1).cast("int")).alias("s"))
    t0 = time.time()
    out = funnel_stages_windowed(d, "u", "t", "s",
                                 ["s0", "s1", "s2", "s3"],
                                 24 * 3600).count()
    return {"events_in": n, "users_out": out,
            "sec": round(time.time() - t0, 2)}


def run_fuzzy_join(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.dedup import edit_distance_join

    # entity-structured names (id div 8 shares a stem; the last char
    # varies) — near-dup pairs grow with entity COUNT, never n^2.
    # Two corpus-design lessons are baked in, both measured the hard
    # way in earlier drafts of this leg: (1) sequential numeric stems
    # put every entity within distance 2 of hundreds of neighbors
    # (dense near-neighbor space -> output explosion, disk-full at
    # 10N); (2) a literal shared prefix ("rec") makes segment slot 0
    # low-entropy and its bucket join quadratic (heap OOM at 1M) —
    # the operator docstring now documents that envelope. Stems here
    # are hash-scattered LETTERS with no shared literal prefix.
    e = F.expr("(id div 8) * 2654435761 % 1000000000000")
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.translate(F.lpad(e.cast("string"), 12, "0"),
                             "0123456789", "qwertyuiopa"),
                 F.lit("x"), (F.col("id") % 8).cast("string"))
        .alias("text"))
    t0 = time.time()
    out = edit_distance_join(d, 2).count()
    return {"strings_in": n, "pairs_out": out,
            "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5e")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {
        "survivorship": (run_survivorship, 20_000_000),
        "entity_resolution": (run_entity_resolution, 1_000_000),
        "funnel": (run_funnel, 10_000_000),
        "dq_profile": (run_dq_profile, 20_000_000),
        "fk_check": (run_fk_check, 20_000_000),
        "retention": (run_retention, 20_000_000),
        "bpe_train": (run_bpe_train, 300_000),
        "bpe_encode": (run_bpe_encode, 300_000),
        "outlier_flags": (run_outlier_flags, 20_000_000),
        "transitions": (run_transitions, 20_000_000),
        "twap": (run_twap, 20_000_000),
        "funnel_windowed": (run_funnel_windowed, 10_000_000),
        "fuzzy_join": (run_fuzzy_join, 100_000),
    }
    only = set(sys.argv[1:])
    art = REPO / "tools" / "rehearsal_r5e.json"
    prev = json.loads(art.read_text()) if art.exists() else {}
    runs = prev.get("runs", {})
    ratios = prev.get("ratios", {})
    for name, (fn, n) in ops.items():
        if only and name not in only:
            continue
        fn(spark, max(n // 100, 1000))          # warmup, excluded
        small = fn(spark, n)
        big = fn(spark, n * 10)
        runs[name] = {"n": small, "10n": big}
        ratios[name] = round(big["sec"] / max(small["sec"], 1e-9), 2)
        print(json.dumps({name: runs[name], "ratio": ratios[name]}),
              flush=True)
    out = {"runs": runs, "ratios": ratios}
    art.write_text(json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
