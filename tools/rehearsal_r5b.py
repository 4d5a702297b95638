"""10x scale rehearsal for the round-5b operators: deterministic
sampling (+ the prefilter knob), domain caps under planted host skew,
BM25 scoring, count-min sketch, semantic dedup, PageRank.

Same contract as tools/scale_rehearsal.py / rehearsal_r5.py: each op
runs at N and 10N in one JVM; a plan survives the scale-up iff time
grows ~linearly for row-bound ops (ratio ~10, well under at the small
end where fixed JVM/stage overhead dominates) with no driver collects
or state blow-ups.  Op-specific expectations:

* hash_sample / cms: map-only or map+tiny-groupBy — ratio ~10 or less.
* stratified_sample / domain_cap run WITH the prefilter band sized by
  the 4x rule, so the per-stratum sort sees only the kept band; the
  mega-host in the domain-cap corpus (20% of all rows on one host)
  is exactly the skew the knob exists for.
* bm25: two passes over the corpus (merged-scalar-subquery stats +
  scoring) — ratio ~10.
* semantic_dedup: n_planes steps 14 -> 17 with corpus size per the
  embedding_near_dup_pairs sizing rule (buckets ~ corpus/expected
  bucket size); components stay tiny (planted groups of 10).  The
  rehearsal vectors are 32-dim because sign-LSH bucket count SATURATES
  at the number of geometrically realizable sign patterns — 2*sum_{i<d}
  C(k-1, i) cells for k planes in d dims, i.e. only ~2^12.7 of the
  2^16 patterns exist for k=16, d=8 — so planes beyond dim add NO
  blocking power and buckets overload quadratically (measured: an
  8-dim first draft ground >20 min at 5M rows; planes <= dim gives the
  full 2^k).  Real embedding corpora are 64-1024-dim, where the
  operator's plane-count rule applies unconstrained.
* pagerank: 3 rounds of join+groupBy over edges — ratio ~10 in edge
  count at fixed round count.

Prints ONE JSON line {"runs": {...}, "ratios": {...}} and writes
tools/rehearsal_r5b.json.
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
from tools.scale_rehearsal import synth_text_corpus  # noqa: E402


def run_hash_sample(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.sampling import hash_sample

    d = spark.range(n).select(F.col("id").alias("doc_id"))
    t0 = time.time()
    kept = hash_sample(d, 250, salt="rehearse").count()
    return {"rows_in": n, "kept": kept, "sec": round(time.time() - t0, 2)}


def run_stratified(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.sampling import stratified_sample

    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("string").alias("lang"))
    # stratum ~ n/100 rows, keep 100: 4x rule => ceil(1e5 * 100/n)*4
    pf = min(1000, max(1, (100 * 1000 * 100 * 4) // n))
    t0 = time.time()
    cnt = stratified_sample(d, ["lang"], 100, salt="rehearse",
                            prefilter_permille=pf).count()
    return {"rows_in": n, "rows_out": cnt, "prefilter_permille": pf,
            "sec": round(time.time() - t0, 2)}


def run_domain_cap(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.web import domain_cap

    # 20% of all rows on ONE mega-host, the rest over 1000 uniform hosts
    host = F.when(F.col("id") % 5 == 0, F.lit("mega"))\
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 1000).cast("string")))
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://www."), host, F.lit(".com/p/"),
                 F.col("id").cast("string")).alias("url"))
    # min uniform host ~ 0.8n/1000 rows, keep 100: 4x rule (clamped at
    # the no-op band for warmup-sized corpora)
    pf = min(1000, max(1, (100 * 1000 * 1000 * 4) // (n * 8 // 10)))
    t0 = time.time()
    cnt = domain_cap(d, 100, salt="rehearse",
                     prefilter_permille=pf).count()
    return {"rows_in": n, "rows_out": cnt, "prefilter_permille": pf,
            "sec": round(time.time() - t0, 2)}


def run_bm25(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.retrieval import bm25_topk

    d = synth_text_corpus(spark, n)
    t0 = time.time()
    rows = bm25_topk(d, ["w1", "w2", "w3"], k=20).count()
    return {"rows_in": n, "topk": rows, "sec": round(time.time() - t0, 2)}


def run_cms(spark, n: int) -> dict:
    from biocypher_metta_spark.operators import sketch as sk

    d = spark.range(n).select(
        F.concat(F.lit("v"), (F.col("id") % 100000).cast("string"))
        .alias("value"))
    t0 = time.time()
    cms = sk.cms_build(d, "value", depth=3, width=8192)
    est = sk.cms_lookup(cms, ["v0", "v1", "v99999"],
                        depth=3, width=8192).count()
    return {"rows_in": n, "probes": est, "sec": round(time.time() - t0, 2)}


def run_semantic_dedup(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.dedup import semantic_dedup

    # planted groups of 10 near-identical 32-dim vectors (the gate
    # recipe at rehearsal scale and realistic dimensionality — see the
    # module docstring on why dim must be >= n_planes); n_planes sized
    # up with the corpus per the embedding_near_dup_pairs sizing rule
    n_groups = max(n // 10, 1)
    vec = (
        "transform(sequence(0, 31), j -> CAST("
        "CAST(conv(substring(md5(concat(cast(id % {g} as string), '_', "
        "cast(j as string))), 1, 2), 16, 10) AS INT) - 128 "
        "+ (CASE WHEN j = CAST(id % 32 AS INT) THEN (id div {g}) % 3 "
        "ELSE 0 END) AS DOUBLE))").format(g=n_groups)
    emb = spark.range(n).select(F.col("id").alias("vec_id"),
                                F.expr(vec).alias("embedding"))
    n_planes = 14 if n <= 1_000_000 else 17
    t0 = time.time()
    # quant_scale 25: raw values are [-128, 127], so the operator's
    # norm-product bound dim*(vmax*scale)^2 < 2^31.5 caps scale at ~18
    # per unit of |v| — 25 * 128 = 3200, 32 * 3200^2 = 3.3e8, safe
    out = semantic_dedup(emb, dim=32, threshold_millis=950,
                         n_planes=n_planes, quant_scale=25)
    survivors = out.filter("keep").count()
    return {"rows_in": n, "survivors": survivors, "n_planes": n_planes,
            "sec": round(time.time() - t0, 2)}


def run_pagerank(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import pagerank

    n_nodes = n // 10
    e = spark.range(n).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 2654435761) % n_nodes).alias("dst"))
    t0 = time.time()
    cnt = pagerank(e, iterations=3).count()
    return {"edges_in": n, "nodes_out": cnt,
            "sec": round(time.time() - t0, 2)}


def run_bm25_join(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.retrieval import bm25_score_join

    d = synth_text_corpus(spark, n)
    q = spark.createDataFrame(
        [(i, f"w{(i * 37) % 999983}") for i in range(40)],
        ["query_id", "token"])
    t0 = time.time()
    rows = bm25_score_join(d, q, k=20).count()
    return {"rows_in": n, "matches": rows,
            "sec": round(time.time() - t0, 2)}


def run_ngram_excise(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.dedup import excise_repeated_ngrams

    d = synth_text_corpus(spark, n)  # plants a dup every 97th doc
    t0 = time.time()
    out = excise_repeated_ngrams(d, n=8)
    removed = out.agg(F.sum("n_removed")).first()[0]
    return {"rows_in": n, "tokens_removed": int(removed),
            "sec": round(time.time() - t0, 2)}


def run_chunk(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.text import chunk_tokens

    d = synth_text_corpus(spark, n)
    t0 = time.time()
    c = chunk_tokens(d, chunk_size=32, overlap=8).count()
    return {"rows_in": n, "chunks": c, "sec": round(time.time() - t0, 2)}


def run_canonical_url(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.web import canonical_url

    d = spark.range(n).select(F.concat(
        F.lit("HTTPS://WWW.h"), (F.col("id") % 1000).cast("string"),
        F.lit(".com:443/p/"), F.col("id").cast("string"),
        F.lit("/?utm_source=x&b=2&a="), F.col("id").cast("string"),
        F.lit("#f")).alias("url"))
    t0 = time.time()
    c = (d.select(canonical_url(F.col("url")).alias("c"))
         .filter(F.col("c").startswith("https://h")).count())
    return {"rows_in": n, "rows_out": c, "sec": round(time.time() - t0, 2)}


def run_kmeans(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.kmeans import kmeans_assign

    vec = ("transform(sequence(0, 7), j -> CAST(("
           "CAST(conv(substring(md5(concat(cast(id as string), '_', "
           "cast(j as string))), 1, 2), 16, 10) AS INT) - 128) / 64.0 "
           "+ 3.0 * CAST(id % 8 = CAST(j AS BIGINT) AS INT) AS DOUBLE))")
    emb = spark.range(n).select(F.col("id").alias("vec_id"),
                                F.expr(vec).alias("embedding"))
    t0 = time.time()
    out = kmeans_assign(emb, k=8, dim=8, iterations=3)
    c = out.groupBy("cluster").count().count()
    return {"rows_in": n, "clusters": c, "sec": round(time.time() - t0, 2)}


def run_triangles(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import triangle_count

    # fixed average degree (~40): nodes scale with edges so wedge
    # volume — the operator's real cost, O(sum C(outdeg,2)) — grows
    # linearly with n and the ratio stays ~10. The two endpoint mixes
    # must be INDEPENDENT of each other: (id % v, (id*c) % v) is a
    # functional graph (dst is a function of src — zero triangles);
    # (id % v, (id // 7) % v) mixes id two different ways.
    v = max(n // 20, 100)
    d = spark.range(n).select(
        (F.col("id") % v).alias("src"),
        ((F.col("id") / 7).cast("long") % v).alias("dst"))
    t0 = time.time()
    out = triangle_count(d)
    total = out.agg(F.sum("triangles")).first()[0]
    return {"edges_in": n, "nodes": v, "tri3x": int(total),
            "sec": round(time.time() - t0, 2)}


def run_lpa(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.graph import label_propagation

    # 50 disjoint blocks of v/50 nodes, random chords inside a block,
    # no cross edges — labels plateau inside blocks (3 rounds is not
    # full convergence for a 200-node block and doesn't need to be);
    # what's under measure is 3 rounds of join+vote-groupBy in edge count
    v = max(n // 10, 1000)
    block = v // 50
    d = spark.range(n).select(
        (F.col("id") % v).alias("node"),
        (F.col("id") * 2654435761).alias("h"))
    edges = d.select(
        F.col("node").alias("src"),
        ((F.col("node") / block).cast("long") * block
         + (F.col("node") + F.col("h") % (block - 1) + 1) % block)
        .alias("dst"))
    t0 = time.time()
    labels = label_propagation(edges, rounds=3)
    n_nodes = labels.count()
    n_comm = labels.select("label").distinct().count()
    return {"edges_in": n, "nodes": n_nodes, "communities": n_comm,
            "sec": round(time.time() - t0, 2)}


def run_gapfill(spark, n: int) -> dict:
    from biocypher_metta_spark.operators.temporal import gapfill_locf

    # ~1000 observations per key with ~40% of SLOTS knocked out (the
    # keep predicate must vary with the slot, not the key — a linear
    # id-hash with multiplier ===1 mod 10 silently dropped whole keys
    # and produced zero gaps) -> real gaps at step=7; value nulls
    # every 11th row exercise the observed-null carry
    k = max(n // 1000, 10)
    slot = (F.col("id") / k).cast("long")
    obs = (spark.range(n).select(
        (F.col("id") % k).alias("key"),
        (slot * 7).alias("ts"),
        F.when(F.col("id") % 11 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 1000).alias("v"))
        .filter((slot * slot + F.col("id") % k) % 10 < 6))
    t0 = time.time()
    out = gapfill_locf(obs, "key", "ts", ["v"], step=7)
    rows = out.count()
    gaps = out.filter("is_gap").count()
    return {"obs_in": n, "rows_out": rows, "gap_rows": gaps,
            "sec": round(time.time() - t0, 2)}


def run_bloom(spark, n: int) -> dict:
    from biocypher_metta_spark.operators import sketch as sk

    # FIXED build side (1M keys into 2^24 bits, fp ~0.2%): the scale
    # claim under test is the MAP-ONLY probe, so only the probe grows
    # with n — a build scaled with n would just saturate the filter
    # (measured: 2M keys in 2^20 bits passed 99.8% of rows).
    m_bits, k = 1 << 24, 4
    build = spark.range(1_000_000).select(
        (F.col("id") * 7).cast("string").alias("bk"))
    probe = spark.range(n).select(
        F.col("id").alias("pk"),
        (F.col("id") % 7_000_000).cast("string").alias("fk"))
    t0 = time.time()
    words = sk.bloom_build(build, "bk", m_bits=m_bits, k=k)
    kept = sk.bloom_prefilter(probe, words, "fk",
                              m_bits=m_bits, k=k).count()
    return {"rows_in": n, "kept": kept,
            "sec": round(time.time() - t0, 2)}


def main():
    spark = get_spark("rehearsal-r5b")
    spark.sparkContext.setLogLevel("ERROR")
    ops = {
        "hash_sample": (run_hash_sample, 20_000_000),
        "stratified_sample": (run_stratified, 10_000_000),
        "domain_cap": (run_domain_cap, 10_000_000),
        "bm25_topk": (run_bm25, 2_000_000),
        "cms": (run_cms, 10_000_000),
        "semantic_dedup": (run_semantic_dedup, 500_000),
        "pagerank": (run_pagerank, 2_000_000),
        "bm25_join": (run_bm25_join, 2_000_000),
        "ngram_excise": (run_ngram_excise, 1_000_000),
        "chunk_fixed": (run_chunk, 2_000_000),
        "canonical_url": (run_canonical_url, 20_000_000),
        "kmeans": (run_kmeans, 1_000_000),
        "triangles": (run_triangles, 1_000_000),
        "bloom_prefilter": (run_bloom, 20_000_000),
        "lpa": (run_lpa, 2_000_000),
        "gapfill_locf": (run_gapfill, 5_000_000),
    }
    only = set(sys.argv[1:])
    # incremental: merge this invocation's ops into the artifact so a
    # partial rerun (e.g. after fixing one op) keeps the others' numbers
    art = REPO / "tools" / "rehearsal_r5b.json"
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
