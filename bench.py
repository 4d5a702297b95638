"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "triples_per_sec": ..., "n_docs": ...}

Headline: full KG construction (span synth -> parse -> gene/transcript
nodes + transcribed_to edges -> MeTTa atoms) over an arithmetic
interleaved documents corpus sized ~SF, plus the reference's two probe
queries (metta_space_import.py:73-92) and the relational/doc operator
suite on the driver testdata.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_DOCS (corpus override).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from biocypher_metta_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_DOCS", str(int(2_000_000 * sf_num / 0.1))))

    spark = get_spark("bcm-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from biocypher_metta_spark.adapters import gencode
    from biocypher_metta_spark.entry_queries import QUERIES, REGISTRY
    from biocypher_metta_spark.sources.documents import span_lines
    from biocypher_metta_spark.sources.gtf import GENE_KEYS, parse_gtf
    from biocypher_metta_spark.sources.synth import synth_gtf_documents

    timings: dict[str, float] = {}
    t_all = time.time()

    # ---- headline: KG construction throughput --------------------------
    # JVM/codegen warmup pass (excluded, same protocol as bench_scaling):
    # the headline measures steady-state throughput, not JIT ramp
    wdocs = synth_gtf_documents(spark, max(n_docs // 20, 1000))
    wgtf = parse_gtf(span_lines(wdocs, "gtf"), keys=GENE_KEYS)
    _, w_atoms = gencode.gene_nodes(wgtf)
    w_atoms.count()

    t0 = time.time()
    docs = synth_gtf_documents(spark, n_docs)
    # one shared scan+parse feeds all outputs (vs the reference re-reading
    # the GTF once per config entry)
    gtf = parse_gtf(span_lines(docs, "gtf"), keys=GENE_KEYS).cache()
    _, gene_atoms = gencode.gene_nodes(gtf)
    _, tx_atoms = gencode.transcript_nodes(gtf)
    _, edge_atoms = gencode.transcribed_edges(gtf, REGISTRY, "to")
    n_atoms = (
        gene_atoms.unionByName(tx_atoms).unionByName(edge_atoms)
    ).count()
    timings["kg_construct"] = time.time() - t0
    triples_per_sec = n_atoms / timings["kg_construct"]

    # ---- probe queries (reference metta_space_import.py:73-92) over the
    # MATERIALIZED partitioned store (pruned scans, the real read path) --
    import tempfile

    from biocypher_metta_spark import lineage as _lineage

    typed, _ = gencode.gene_nodes(gtf)
    out_dir = tempfile.mkdtemp(prefix="bcm_bench_")
    t0 = time.time()
    ndf = typed.drop("synonyms").withColumn("chr_part", F.col("chr"))
    _lineage.write_partitioned(ndf, f"{out_dir}/nodes", ["label", "chr_part"])
    timings["materialize_nodes"] = time.time() - t0
    stored = spark.read.parquet(f"{out_dir}/nodes")
    t0 = time.time()
    stored.filter("label = 'gene' AND chr_part = 'chr16' AND "
                  "start > 53000000 AND end < 56000000").count()
    timings["probe_gene_window"] = time.time() - t0
    t0 = time.time()
    stored.filter(F.col("id") == "ENSG00000000000042").collect()
    timings["probe_node_props"] = time.time() - t0
    gtf.unpersist()

    # ---- operator suite on the driver testdata -------------------------
    # INTERLEAVED median-of-N (round 3 protocol): this host shows up to
    # 2.7x wall-clock noise between measurement windows (BENCH.md), which
    # made single-shot per-query numbers unattributable across rounds.
    # Running the whole suite N times round-robin spreads any noisy window
    # across all queries instead of landing on one, and the median of the
    # per-query samples is reported (full samples included for spread).
    suite = ["rel_pricing_summary", "rel_shuffle_join_agg",
             "rel_collect_ordered", "rel_window_rank", "doc_quality",
             "doc_minhash", "doc_lsh_pairs", "doc_simhash",
             "doc_token_stats", "emb_dot_topk", "kg_gtf_gene_nodes",
             "kg_vcf_snp_nodes", "kg_mention_link_counts",
             "kg_pattern_match", "kg_connected_components",
             "kg_alias_dimension", "kg_peregrine_edges",
             "emb_near_dup", "doc_corpus_clean", "doc_lang_trigram",
             "kg_liftover", "multimodal_png_decode", "kg_join_chains",
             "doc_line_dedup", "doc_tfidf_topk", "doc_dup_clusters",
             "multimodal_wav_decode", "doc_pack", "emb_knn_join",
             "doc_scrub", "doc_contamination", "multimodal_resize",
             "doc_pipeline", "doc_cdc", "multimodal_jpeg_decode",
             "doc_perplexity", "doc_c4_filter", "rel_asof_join",
             "rel_range_join", "rel_interval_overlap",
             "rel_hypertable_rollup", "doc_distinct_sketch",
             "rel_session_window", "multimodal_frame_sample",
             "doc_hash_sample", "doc_stratified_sample",
             "web_domain_cap", "doc_bm25_topk", "doc_cms_topfreq",
             "kg_pagerank", "emb_semantic_dedup", "doc_bm25_join",
             "doc_ngram_excise", "rel_grouping_sets", "doc_chunk_fixed",
             "web_canonical_url", "emb_kmeans", "emb_pq_topk",
             "kg_triangles",
             "rel_bloom_prefilter", "rel_changelog_compact",
             "rel_scd2_intervals", "rel_salted_join", "kg_kcore",
             "kg_lpa", "rel_gapfill_locf", "rel_pivot",
             "kg_cooccurrence", "doc_weighted_sample", "rel_bucketed_join",
             "doc_strip_markup", "web_link_edges", "rel_interval_merge",
             "rel_snapshot_diff", "kg_jaccard_links", "doc_lm_train",
             "doc_set_similarity", "kg_bfs", "rel_ewma",
             "kg_survivorship", "kg_entity_resolution", "rel_funnel",
             "rel_dq_profile", "rel_fk_check", "rel_retention",
             "doc_bpe_train", "doc_bpe_encode", "rel_outlier_flags",
             "rel_fuzzy_join", "rel_event_transitions", "rel_twap",
             "rel_funnel_windowed", "doc_rrf_fusion", "kg_hits",
             "rel_zorder_key", "emb_mmr_rerank", "doc_retrieval_ladder",
             "kg_scc", "emb_random_projection", "emb_ivfpq_topk",
             "rel_sketch_setops", "kg_sssp", "kg_random_walks",
             "doc_dsir_scores", "kg_wl_colors", "kg_temporal_reach",
             "kg_ppr", "kg_schema_validate", "kg_ntriples",
             "rel_interval_stab", "rel_skyline", "rel_asof_directions",
             "rel_itemsets", "rel_hll_sketch", "kg_link_predict",
             "doc_winnowing", "web_anchor_text", "rel_autocorr",
             "rel_attribution", "kg_assortativity", "rel_crosscorr",
             "kg_ktruss", "rel_benford", "doc_readability",
             "rel_gini", "doc_pmi_collocations", "rel_linreg",
             "rel_chisq", "kg_four_cycles", "kg_collab_weight",
             "doc_rake_keyphrases", "rel_winsorize",
             "rel_decile_lift", "doc_ngram_novelty",
             "doc_heavy_tokens", "kg_betweenness", "kg_closeness",
             "rel_cusum", "rel_ks_test", "rel_mannwhitney",
             "rel_proximity_join", "kg_modularity",
             "multimodal_tar_members", "multimodal_samples",
             "kg_anf", "web_robots_filter", "kg_finemap",
             "rel_k_anonymity", "rel_cohens_kappa", "doc_rocchio",
             "rel_spearman", "rel_theil_sen", "rel_t_closeness",
             "rel_kaplan_meier", "kg_eff_radius",
             "multimodal_audio_frames", "kg_dag_depth",
             "multimodal_dhash", "rel_bh_fdr", "rel_seasonal",
             "multimodal_scene_cuts", "doc_containment",
             "emb_hamming_topk", "kg_clustering_coef",
             "doc_skipgrams", "multimodal_bmp_decode",
             "multimodal_ulaw_decode", "web_sitemap", "kg_mst",
             "multimodal_gif_decode", "kg_matching", "kg_mis",
             "kg_go_upprop", "kg_resnik_mica", "kg_single_linkage",
             "multimodal_adpcm_decode", "multimodal_vtt_cues",
             "multimodal_vtt_align", "web_cidr_filter",
             "multimodal_tiff_decode", "doc_script_detect",
             "rel_hilbert_key", "multimodal_id3_tags"]
    rounds = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in suite}
    for _ in range(rounds):
        for name in suite:
            fn, _sql = QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples[name].append(round(time.time() - t0, 3))
    from statistics import median
    for name, ss in samples.items():
        timings[name] = median(ss)

    total = time.time() - t_all
    # full per-sample spread on its own line; the FINAL line stays compact
    # because the driver captures only a bounded tail of stdout (r3's
    # capture truncated a single fat line to "parsed": null)
    print(json.dumps({"query_samples": samples, "suite_rounds": rounds}))
    final = json.dumps({
        "metric": "kg_construct+operator_suite",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf_num,
        "n_docs": n_docs,
        "n_atoms": n_atoms,
        "triples_per_sec": round(triples_per_sec, 1),
        "queries": {k: round(v, 3) for k, v in timings.items()},
    })
    # the driver parses the final stdout line from a bounded tail buffer
    # that truncated it in r3 (and cosmetically in r4); persist the same
    # line to a file so the canonical result never depends on tail luck
    (REPO / "BENCH_LAST.json").write_text(final + "\n")
    print(final)


if __name__ == "__main__":
    main()
