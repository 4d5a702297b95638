"""10x scale rehearsal (round 3): run the headline KG build and the
heavy document operators at 2M and 20M docs in one JVM and report
throughput ratios — the sandbox stand-in for "does the plan survive a
scale-up" (no cluster here; the knobs that matter are shuffle volume,
partition sizing, and whether anything collects to the driver).

Prints ONE JSON line:
{"runs": {"2000000": {...}, "20000000": {...}}, "ratios": {...}}

Notes on operator selection at 20M:
* lsh_candidate_pairs bands on 60-bit minhash values — uniform keys,
  bucket sizes stay O(duplicate cluster), so it runs at any N.
* hamming_near_pairs with the default 15-bit blocks is sized for <=10^7
  rows per its docstring (block-key population grows linearly, per-key
  work quadratically); the rehearsal runs it at 2M only and records the
  documented reason rather than burning an hour proving the docstring.
* embedding_near_dup_pairs scales via n_planes: 8 planes (256 buckets)
  is for test corpora; 20M vectors use 24 planes (16M buckets) exactly
  as the operator's sizing note prescribes.

Env: SPARK_GRAFT_CPUS (default all), SPARK_REHEARSAL_NS (comma list,
default "2000000,20000000").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def synth_text_corpus(spark, n: int):
    """~50-token synthetic docs, fully distributed, deterministic, with
    exact duplicates planted every 97th doc. Tokens are a NON-LINEAR
    (xor-folded) function of (doc, position): a first draft used an
    arithmetic progression, which made every doc a shifted window of one
    cyclic token sequence — 50%+ of random doc pairs shared 5-gram runs
    and the near-dup stages blew up quadratically on structure a real
    corpus doesn't have."""
    base = F.when((F.col("id") % 97 == 0) & (F.col("id") > 0),
                  F.col("id") - 1).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda j: F.concat(
            F.lit("w"),
            ((base * 2654435761).bitwiseXOR(j.cast("long") * 40503 + 7)
             % 999983).cast("string")))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", toks).alias("text"))


def synth_embeddings(spark, n: int, dim: int = 8):
    """md5-derived near-orthogonal vectors; every id with id % 1000 == 1
    duplicates its predecessor so the verify stage has planted hits."""
    base = F.when(F.col("id") % 1000 == 1, F.col("id") - 1).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.conv(F.substring(F.md5(F.concat(
            base.cast("string"), F.lit("_"), j.cast("string"))), 1, 2),
            16, 10).cast("int") - 128).cast("double"))
    return spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))


def run_at(spark, n: int) -> dict:
    from biocypher_metta_spark.adapters import gencode
    from biocypher_metta_spark.operators import dedup as dd
    from biocypher_metta_spark.operators import text as tx
    from biocypher_metta_spark.schema import load_default_registry
    from biocypher_metta_spark.sources.documents import span_lines
    from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf
    from biocypher_metta_spark.sources.synth import synth_gtf_documents

    registry = load_default_registry()
    out: dict = {"n_docs": n}

    # headline KG build (same pipeline as bench.py, uncached corpus)
    t0 = time.time()
    docs = synth_gtf_documents(spark, n)
    gtf = parse_gtf(span_lines(docs, "gtf"), keys=GENE_KEYS).cache()
    _, gene_atoms = gencode.gene_nodes(gtf)
    _, tx_atoms = gencode.transcript_nodes(gtf)
    _, edge_atoms = gencode.transcribed_edges(gtf, registry, "to")
    n_atoms = gene_atoms.unionByName(tx_atoms).unionByName(edge_atoms).count()
    out["kg_construct_sec"] = round(time.time() - t0, 2)
    out["n_atoms"] = n_atoms
    out["triples_per_sec"] = round(n_atoms / out["kg_construct_sec"], 1)
    gtf.unpersist()

    corpus = synth_text_corpus(spark, n)

    t0 = time.time()
    out["exact_dedup_groups"] = dd.exact_dedup(corpus).count()
    out["exact_dedup_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    sigs = dd.minhash_signatures(corpus)
    pairs = dd.lsh_candidate_pairs(sigs)
    out["lsh_pairs"] = pairs.count()
    out["lsh_pairs_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["simhash_rows"] = dd.simhash(corpus).count()
    out["simhash_sec"] = round(time.time() - t0, 2)

    if n <= 2_000_000:
        t0 = time.time()
        out["hamming_pairs"] = dd.hamming_near_pairs(dd.simhash(corpus)).count()
        out["hamming_sec"] = round(time.time() - t0, 2)
    else:
        out["hamming_pairs"] = "skipped: 15-bit blocks sized for <=10^7 rows (operator docstring); widen bits/collapse dups first"

    t0 = time.time()
    emb = synth_embeddings(spark, n)
    n_planes = 16 if n <= 2_000_000 else 24
    out["near_dup_planes"] = n_planes
    out["emb_near_dup_pairs"] = dd.embedding_near_dup_pairs(
        emb, dim=8, threshold_millis=950, n_planes=n_planes,
        quant_scale=100).count()
    out["emb_near_dup_sec"] = round(time.time() - t0, 2)

    # corpus-clean composition: dedup -> quality -> lang over survivors
    t0 = time.time()
    keep = dd.exact_dedup(corpus).select(F.col("keep_id").alias("doc_id"))
    survivors = corpus.join(keep, "doc_id")
    q = tx.quality_score(survivors).filter(F.col("quality_score") >= 500)
    lang = tx.lang_id(survivors.join(q.select("doc_id"), "doc_id"))
    out["corpus_clean_rows"] = lang.groupBy("lang_pred").count().count()
    out["corpus_clean_sec"] = round(time.time() - t0, 2)
    return out


def synth_lined_corpus(spark, n: int):
    """synth_text_corpus re-shaped into 5 lines x 10 tokens per doc (for
    the line-dedup rehearsal); same xor-folded tokens, same planted
    whole-doc duplicates every 97th doc (whose lines all dedup away)."""
    base = F.when((F.col("id") % 97 == 0) & (F.col("id") > 0),
                  F.col("id") - 1).otherwise(F.col("id"))
    line = lambda r: F.concat_ws(" ", F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(9)),
        lambda j: F.concat(
            F.lit("w"),
            ((base * 2654435761).bitwiseXOR(
                (j.cast("long") + r * 10) * 40503 + 7)
             % 999983).cast("string"))))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", *[line(r) for r in range(5)]).alias("text"))


def run_text2_at(spark, n: int) -> dict:
    """Round-3b shuffle-heavy text operators: cross-corpus line dedup,
    tf-idf top-k, repetition stats, near-dup clustering. These shuffle on
    md5(line), (doc_id, token), token and doc_id — all uniform keys — so
    the 10x check is about shuffle volume, not key skew."""
    from biocypher_metta_spark.canonicalize import connected_components
    from biocypher_metta_spark.operators import dedup as dd
    from biocypher_metta_spark.operators import text as tx

    # SIZE SHUFFLE PARTITIONS TO THE DATA: tf-idf explodes ~50 tokens/doc
    # (1G rows at 20M docs) and then windows per doc_id. At the local
    # default of 32 partitions that is ~31M rows per partition sort —
    # measured GC-overhead OOM on an 8g heap. ~100k docs (≈5M exploded
    # rows) per partition keeps every per-task buffer modest; AQE
    # coalesces whatever ends up small. This is the deployment rule the
    # 100TB notes call for, exercised rather than just stated.
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, n // 100_000)))

    out: dict = {"n_docs": n}

    t0 = time.time()
    lined = synth_lined_corpus(spark, n)
    out["line_dedup_docs"] = dd.line_dedup(lined).count()
    out["line_dedup_sec"] = round(time.time() - t0, 2)

    corpus = synth_text_corpus(spark, n)

    t0 = time.time()
    out["tfidf_rows"] = tx.tfidf_topk(corpus, k=3).count()
    out["tfidf_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["repetition_rows"] = tx.repetition_stats(corpus).count()
    out["repetition_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["pack_rows"] = tx.pack_sequential(corpus, budget=4096).count()
    out["pack_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    sigs = dd.minhash_signatures(corpus)
    pairs = dd.lsh_candidate_pairs(sigs)
    cc = connected_components(pairs, "id_a", "id_b")
    out["dup_clusters"] = cc.select("component").distinct().count()
    out["dup_clusters_sec"] = round(time.time() - t0, 2)
    return out


def run_r4_at(spark, n: int) -> dict:
    """Round-4 rewritten/new operators: Karp-Rabin CDC chunking (the
    r3->r4 md5-per-char -> polynomial-hash rewrite — map-only, so the
    10x check is about the per-char constant, not shuffle), 14-language
    trigram ID (42 InSet passes over the trigram array), and the
    streaming-parity stat-triple melt (map+explode)."""
    from biocypher_metta_spark.operators import dedup as dd
    from biocypher_metta_spark.operators import text as tx
    from biocypher_metta_spark.streaming.incremental import doc_stat_triples

    corpus = synth_text_corpus(spark, n)
    out: dict = {"n_docs": n}
    t0 = time.time()
    out["cdc_rows"] = dd.cdc_chunks(corpus).count()
    out["cdc_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["lang_rows"] = tx.lang_id_trigram(corpus).count()
    out["lang_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    out["stat_triples"] = doc_stat_triples(corpus).count()
    out["stat_triples_sec"] = round(time.time() - t0, 2)
    return out


def run_r4b_at(spark, n: int) -> dict:
    """Round-4b custom operators over synthetic event/interval tables:
    as-of join (key shuffle + per-key ordered window), bucketed range
    join (uniform composite-key equi-join), hypertable rollup
    (reaggregation chain), KMV sketch (distinct + TakeOrdered). Key
    cardinality scales with n, so per-key work stays constant — the
    10x check verifies no hidden per-key blowup."""
    from pyspark.sql import functions as F

    from biocypher_metta_spark.operators.sketch import kmv_distinct
    from biocypher_metta_spark.operators.temporal import (
        asof_join, hypertable_rollup)
    from biocypher_metta_spark.functions.genomic import interval_point_join

    out: dict = {"n_rows": n}
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % (n // 100)).alias("user_id"),
        (F.lit(1704067200) + (F.col("id") * 37) % 2_592_000)
        .cast("timestamp").alias("ts"),
        ((F.col("id") * 13) % 10_000 / 100.0).alias("value"))

    t0 = time.time()
    snaps = (events.select("user_id").distinct()
             .select("user_id",
                     F.explode(F.sequence(F.lit(0), F.lit(23))).alias("k"))
             .select("user_id",
                     (F.lit(1704067200) + F.col("k") * 86_400)
                     .cast("timestamp").alias("snap_ts"),
                     (F.col("user_id") * 100 + F.col("k")).alias("state")))
    out["asof_rows"] = asof_join(events, snaps, key="user_id",
                                 left_ts="ts",
                                 right_ts="snap_ts").count()
    out["asof_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    iv = spark.range(n // 10).select(
        F.col("id").alias("iid"),
        F.concat(F.lit("chr"), (F.col("id") % 23).cast("string"))
        .alias("chrom"),
        ((F.col("id") * 37) % 100_000_000).alias("start"))
    iv = iv.withColumn("end", F.col("start") + 50 + (F.col("iid") * 13) % 5000)
    pt = spark.range(n).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("chr"), ((F.col("id") * 7) % 23).cast("string"))
        .alias("chrom"),
        ((F.col("id") * 91) % 100_000_000).alias("pos"))
    out["range_rows"] = interval_point_join(iv, pt, bucket=10_000).count()
    out["range_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    rolled = hypertable_rollup(events)
    out["rollup_rows"] = sum(df.count() for df in rolled.values())
    out["rollup_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    toks = events.select(F.concat(F.lit("u"), ((F.col("event_id") * 31)
                         % (n // 3)).cast("string")).alias("tok"))
    out["kmv_est"] = kmv_distinct(toks, "tok").collect()[0].estimate
    out["kmv_sec"] = round(time.time() - t0, 2)
    return out


OP_SETS = {
    "core": (run_at, ["kg_construct_sec", "exact_dedup_sec", "lsh_pairs_sec",
                      "simhash_sec", "emb_near_dup_sec", "corpus_clean_sec"]),
    "text2": (run_text2_at, ["line_dedup_sec", "tfidf_sec",
                             "repetition_sec", "pack_sec",
                             "dup_clusters_sec"]),
    "r4": (run_r4_at, ["cdc_sec", "lang_sec", "stat_triples_sec"]),
    "r4b": (run_r4b_at, ["asof_sec", "range_sec", "rollup_sec", "kmv_sec"]),
}


def main() -> None:
    ns = [int(x) for x in os.environ.get(
        "SPARK_REHEARSAL_NS", "2000000,20000000").split(",")]
    runner, ratio_keys = OP_SETS[os.environ.get("SPARK_REHEARSAL_OPS", "core")]
    spark = get_spark("bcm-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    runner(spark, 50_000)  # JVM/codegen warmup, not reported
    runs = {}
    for n in ns:
        runs[str(n)] = runner(spark, n)
    ratios = {}
    if len(ns) == 2 and all(str(n) in runs for n in ns):
        a, b = runs[str(ns[0])], runs[str(ns[1])]
        for k in ratio_keys:
            if isinstance(a.get(k), (int, float)) and isinstance(b.get(k), (int, float)):
                ratios[k] = round(b[k] / max(a[k], 1e-9), 2)
        if "triples_per_sec" in a:
            ratios["triples_per_sec_ratio"] = round(
                b["triples_per_sec"] / a["triples_per_sec"], 3)
    print(json.dumps({"runs": runs, "ratios": ratios,
                      "scale_factor": ns[-1] / ns[0] if len(ns) > 1 else 1}))


if __name__ == "__main__":
    main()
