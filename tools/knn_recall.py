"""Honest recall@k measurement for knn_join's multi-probe LSH blocking
(round-3 verdict item 5).

Sweeps dim x probe_bits against an EXACT brute-force top-k computed
with the SAME quantized integer dot product (so any miss is purely a
candidate-coverage miss, never a scoring difference). Corpus and
queries are deterministic hash-derived vectors — fully distributed
generation, no driver data, reproducible across runs/engines.

Usage: python tools/knn_recall.py [corpus_n] [n_queries] [planes] [dims]
  planes: comma list of n_planes to sweep (default "6,8"; the r5
          corpus-sized run uses "16,24" at corpus_n=10^6, probe_bits 2)
  dims:   comma list of dims (default "16,32")
Prints one JSON line per cell, including the measured mean candidate
count per query next to the expected_candidates formula; also one IVF
row per (dist, dim) — the recommended fallback for uniform corpora.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from biocypher_metta_spark import get_spark
from biocypher_metta_spark.operators.similarity import (
    build_ivf_centroids, expected_candidates, int_dot, ivf_knn_join,
    knn_join)

K = 10
QUANT = 100


def synth_vectors(spark, n: int, dim: int, id_name: str, salt: str):
    """Deterministic pseudo-random vectors in [-1, 1]: component j of
    row i is a function of xxhash64(salt, i, j) — distributed, seedless,
    identical on every run."""
    return spark.range(n).select(
        F.col("id").alias(id_name),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: ((F.xxhash64(F.lit(salt), F.col("id"), j)
                        % 1001) / 1000.0).cast("double"),
        ).alias("embedding"))


def synth_clustered(spark, n: int, dim: int, id_name: str, salt: str,
                    n_clusters: int = 256, noise: float = 0.15):
    """Clustered vectors (the realistic embedding-corpus shape): row i
    belongs to cluster i % n_clusters; vector = unit-ish centroid
    (hash of cluster id) + small hash noise. True neighbors are
    overwhelmingly same-cluster, which is the regime LSH blocking is
    designed for — report this alongside the uniform worst case."""
    cl = F.col("id") % n_clusters
    return spark.range(n).select(
        F.col("id").alias(id_name),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (((F.xxhash64(F.lit("ctr"), cl, j) % 1001) / 1000.0)
                       + noise * ((F.xxhash64(F.lit(salt), F.col("id"), j)
                                   % 1001) / 1000.0)).cast("double"),
        ).alias("embedding"))


def brute_topk(queries, corpus, k: int):
    """Exact top-k per query over the full corpus with knn_join's
    quantized integer dot — the ground truth (a broadcast nested-loop
    over the small query side; only viable because this is a
    measurement harness, not the production path)."""
    quant = F.transform(F.col("embedding"),
                        lambda x: F.round(x * QUANT).cast("long"))
    q = queries.select("q_id", quant.alias("_q"))
    c = corpus.select("vec_id", quant.alias("_c"))
    joined = q.crossJoin(c).select(
        "q_id", "vec_id", int_dot(F.col("_q"), F.col("_c")).alias("dot"))
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def count_candidates(queries, corpus, dim, n_planes, probe_bits):
    """Measured mean candidate rows per query (the pre-rescore join
    volume — what the sizing rule bounds)."""
    from biocypher_metta_spark.operators.similarity import lsh_bucket

    c = corpus.select(
        lsh_bucket(F.col("embedding"), dim, n_planes).alias("_b"))
    probes = 1
    if probe_bits >= 1:
        probes += n_planes
    if probe_bits >= 2:
        probes += n_planes * (n_planes - 1) // 2
    q = queries.select(
        "q_id", lsh_bucket(F.col("embedding"), dim, n_planes).alias("_b"))
    # uniform-probe approximation: probes * per-bucket corpus load of
    # the query's own bucket neighborhood, measured exactly via join
    load = c.groupBy("_b").count()
    own = q.join(load, "_b", "left").agg(
        F.avg(F.coalesce(F.col("count"), F.lit(0)))).collect()[0][0]
    return probes * (own or 0.0)


def pq_recall(spark, corpus, dim: int, corpus_n: int, dist: str,
              n_q: int = 20, rerank_r: int = 50, m: int = 0,
              book_k: int = 16):
    """Recall@k of the PQ path, measured against PQ's OWN metric —
    exact quantized L2 over the full corpus (ADC estimates distance to
    the assigned centroid, so measuring it against dot-product truth
    would conflate metric mismatch with quantization loss).  Two rows:
    ADC top-k alone (the compressed-domain floor) and ADC top-R +
    exact rerank (the documented production recipe)."""
    from biocypher_metta_spark.operators.pq import (
        pq_adc_topk, pq_encode, pq_train)

    m = m or (4 if dim % 4 == 0 else 2)
    t0 = time.time()
    books = pq_train(corpus, m=m, k=book_k, dim=dim, iterations=2)
    codes = pq_encode(corpus, books, dim=dim).cache()
    codes.count()
    t_build = time.time() - t0
    qrows = synth_vectors(spark, n_q, dim, "q_id", "pq_q").collect()

    def _l2_topk(q, k):
        qq = [round(float(x) * QUANT) for x in q]
        # Spark SQL bracket indexing is 0-based (element_at is the
        # 1-based one) — embedding[dim] would throw INVALID_ARRAY_INDEX
        terms = " + ".join(
            f"(CAST(round(CAST(embedding[{j}] AS DOUBLE) * {QUANT}) "
            f"AS BIGINT) - ({qq[j]})) * "
            f"(CAST(round(CAST(embedding[{j}] AS DOUBLE) * {QUANT}) "
            f"AS BIGINT) - ({qq[j]}))" for j in range(dim))
        return (corpus.select("vec_id", F.expr(terms).alias("_d"))
                .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
                .limit(k))

    hit_adc = hit_rr = total = 0
    t0 = time.time()
    for r in qrows:
        q = [float(x) for x in r["embedding"]]
        truth = {x["vec_id"] for x in _l2_topk(q, K).collect()}
        adc = pq_adc_topk(codes, q, books, topk=K)
        got_adc = {x["vec_id"] for x in adc.collect()}
        cand = pq_adc_topk(codes, q, books, topk=rerank_r)
        rr = (_l2_topk(q, corpus_n)  # exact distances...
              .join(cand.select("vec_id"), "vec_id")  # ...on survivors
              .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
              .limit(K))
        got_rr = {x["vec_id"] for x in rr.collect()}
        hit_adc += len(got_adc & truth)
        hit_rr += len(got_rr & truth)
        total += len(truth)
    codes.unpersist()
    for label, hits in (("pq_adc", hit_adc),
                        (f"pq_adc{rerank_r}_rerank", hit_rr)):
        print(json.dumps({
            "dist": dist, "corpus": corpus_n, "queries": n_q,
            "dim": dim, "index": label, "m": m, "codebook_k": book_k,
            "k": K, "recall": round(hits / total, 4),
            "build_sec": round(t_build, 2),
            "sec": round(time.time() - t0, 2)}), flush=True)


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    planes = [int(x) for x in
              (sys.argv[3] if len(sys.argv) > 3 else "6,8").split(",")]
    dims = [int(x) for x in
            (sys.argv[4] if len(sys.argv) > 4 else "16,32").split(",")]
    # "pq" = gate-sized codebooks (m auto, k=16); "pq:M:K" overrides —
    # the sweep's knob for showing recall scale with codebook capacity
    pq_only, pq_m, pq_k = False, 0, 16
    for a in sys.argv[5:]:
        if a == "pq" or a.startswith("pq:"):
            pq_only = True
            if ":" in a:
                _, m_s, k_s = a.split(":")
                pq_m, pq_k = int(m_s), int(k_s)
    probe_sweep = [2] if max(planes) >= 16 else [0, 1, 2]
    spark = get_spark("knn-recall", master="local[32]")
    if pq_only:
        for dist in ("uniform", "clustered"):
            gen = synth_vectors if dist == "uniform" else synth_clustered
            for dim in dims:
                corpus = gen(spark, corpus_n, dim, "vec_id", "c").cache()
                pq_recall(spark, corpus, dim, corpus_n, dist,
                          m=pq_m, book_k=pq_k)
                corpus.unpersist()
        spark.stop()
        return
    for dist in ("uniform", "clustered"):
        gen = synth_vectors if dist == "uniform" else synth_clustered
        for dim in dims:
            corpus = gen(spark, corpus_n, dim, "vec_id", "c").cache()
            queries = gen(spark, n_queries, dim, "q_id", "q").cache()
            truth = {(r.q_id, r.vec_id)
                     for r in brute_topk(queries, corpus, K).collect()}
            for n_planes in planes:
                for probe_bits in probe_sweep:
                    t0 = time.time()
                    got = {(r.q_id, r.vec_id) for r in
                           knn_join(queries, corpus, dim=dim, k=K,
                                    n_planes=n_planes, quant_scale=QUANT,
                                    probe_bits=probe_bits).collect()}
                    recall = len(got & truth) / len(truth)
                    cand = count_candidates(queries, corpus, dim,
                                            n_planes, probe_bits)
                    print(json.dumps({
                        "dist": dist, "corpus": corpus_n,
                        "queries": n_queries, "dim": dim,
                        "n_planes": n_planes, "probe_bits": probe_bits,
                        "k": K, "recall": round(recall, 4),
                        "cand_per_q": round(cand, 1),
                        "cand_formula": round(expected_candidates(
                            corpus_n, n_planes, probe_bits), 1),
                        "sec": round(time.time() - t0, 2)}), flush=True)
            # IVF path: centroids from one corpus pass + 1 Lloyd round,
            # 256 cells, probe 8 -> candidates ~ corpus/32
            t0 = time.time()
            cents = build_ivf_centroids(corpus, dim=dim, n_planes=8,
                                        lloyd_iters=1)
            got = {(r.q_id, r.vec_id) for r in
                   ivf_knn_join(queries, corpus, cents, k=K, n_probe=8,
                                quant_scale=QUANT).collect()}
            recall = len(got & truth) / len(truth)
            print(json.dumps({
                "dist": dist, "corpus": corpus_n, "queries": n_queries,
                "dim": dim, "index": "ivf256_probe8", "k": K,
                "recall": round(recall, 4),
                "cand_per_q": round(corpus_n * 8 / len(cents), 1),
                "sec": round(time.time() - t0, 2)}), flush=True)
            corpus.unpersist()
            queries.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
