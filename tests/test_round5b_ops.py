"""Round-5b operators: sampling, domain caps, BM25, count-min sketch,
semantic dedup, PageRank — unit semantics plus DuckDB cross-engine
drift checks (the same arithmetic the driver gates rely on)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators import retrieval, sampling, web
from biocypher_metta_spark.operators import sketch as sk
from biocypher_metta_spark.operators.dedup import semantic_dedup
from biocypher_metta_spark.operators.graph import (
    pagerank, pagerank_sql, triangle_count, triangle_count_sql)


# ---------------------------------------------------------------- sampling

def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string"))
        .alias("lang"))


def test_hash_sample_deterministic_and_nested(spark):
    d = _docs(spark)
    a = {r.doc_id for r in
         sampling.hash_sample(d, 300).select("doc_id").collect()}
    b = {r.doc_id for r in
         sampling.hash_sample(d, 300).select("doc_id").collect()}
    assert a == b
    small = {r.doc_id for r in
             sampling.hash_sample(d, 100).select("doc_id").collect()}
    assert small < a  # same salt, lower rate => strict subset
    # rough rate sanity (uniform hash): 300 permille of 400 ~ 120
    assert 80 <= len(a) <= 160
    other = {r.doc_id for r in
             sampling.hash_sample(d, 300, salt="x").select("doc_id")
             .collect()}
    assert other != a  # different salt draws a different sample


def test_hash_sample_rate_bounds(spark):
    d = _docs(spark, 10)
    assert sampling.hash_sample(d, 0).count() == 0
    assert sampling.hash_sample(d, 1000).count() == 10
    with pytest.raises(ValueError):
        sampling.hash_sample(d, 1001)


def test_stratified_sample_exact_n_and_rank_prefix(spark):
    d = _docs(spark)  # 5 strata x 80 rows
    s = sampling.stratified_sample(d, ["lang"], 7).collect()
    by = {}
    for r in s:
        by.setdefault(r.lang, []).append(r)
    assert set(by) == {f"s{i}" for i in range(5)}
    for rows in by.values():
        assert sorted(r.sample_rank for r in rows) == list(range(1, 8))
    # rank prefix of a larger draw == the smaller draw (nested samples)
    s3 = {(r.lang, r.doc_id) for r in
          sampling.stratified_sample(d, ["lang"], 3).collect()}
    pref = {(r.lang, r.doc_id) for r in s if r.sample_rank <= 3}
    assert s3 == pref


def test_stratified_prefilter_preserves_result(spark):
    d = _docs(spark)
    base = {(r.lang, r.doc_id, r.sample_rank) for r in
            sampling.stratified_sample(d, ["lang"], 5).collect()}
    # 5 of 80 per stratum => 63 permille; 400 permille is a wide band
    pre = {(r.lang, r.doc_id, r.sample_rank) for r in
           sampling.stratified_sample(
               d, ["lang"], 5, prefilter_permille=400).collect()}
    assert pre == base


# ---------------------------------------------------------------- web caps

def test_extract_host_cases(spark):
    rows = spark.createDataFrame(
        [("https://www.Example.com/a/b",),
         ("http://sub.site.org:8080/x?q=1",),
         ("ftp://user:pw@files.net/z",),
         ("https://www.www.dbl.io/",),
         ("not a url",),
         ("//schemeless/path",)],
        ["url"]).select(web.extract_host(F.col("url")).alias("h"))
    assert [r.h for r in rows.collect()] == [
        "example.com", "sub.site.org", "files.net", "www.dbl.io",
        "", ""]


def test_domain_cap_caps_and_passthrough(spark):
    rows = [(i, f"https://www.big.com/p{i}") for i in range(20)]
    rows += [(100 + i, f"http://small.net/p{i}") for i in range(2)]
    rows += [(200, "garbage"), (201, "/relative")]
    d = spark.createDataFrame(rows, ["doc_id", "url"])
    out = web.domain_cap(d, 5).collect()
    by = {}
    for r in out:
        by.setdefault(r.host, []).append(r)
    assert len(by["big.com"]) == 5
    assert len(by["small.net"]) == 2
    assert len(by[""]) == 2 and all(r.sample_rank == 0 for r in by[""])
    # deterministic winner set
    again = {r.doc_id for r in web.domain_cap(d, 5).collect()}
    assert again == {r.doc_id for r in out}


# ---------------------------------------------------------------- BM25

def _corpus(spark):
    return spark.createDataFrame(
        [(1, "spark shuffle join spark spark"),
         (2, "spark row"),
         (3, "sort merge join sort row row row row row row"),
         (4, "completely unrelated words here"),
         (5, "spark join")],
        ["doc_id", "text"])


def test_bm25_ranking_semantics(spark):
    out = retrieval.bm25_topk(_corpus(spark), ["spark", "join"], k=5)
    rows = out.collect()
    got = {r.doc_id: r for r in rows}
    assert 4 not in got  # no query token => excluded
    ranks = {r.doc_id: r.rank for r in rows}
    # hand-computed integer BM25 (idf_scale 1e6): d5 "spark join"
    # (dl=2, both terms) 1300770 beats d1 (tf(spark)=3 but dl=5)
    # 1254165 — tf saturation + length norm working as specified;
    # both beat single-term d2 650385; long d3 penalized to 337783.
    assert [ranks[i] for i in (5, 1, 2, 3)] == [1, 2, 3, 4]
    assert got[5].score == 1300770 and got[1].score == 1254165
    assert got[2].score == 650385 and got[3].score == 337783
    assert [r.rank for r in
            sorted(rows, key=lambda r: r.rank)] == list(
                range(1, len(rows) + 1))


def test_bm25_validation(spark):
    c = _corpus(spark)
    with pytest.raises(ValueError):
        retrieval.bm25_topk(c, [])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(c, ["a", "a"])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(c, ["a"], k=0)


def test_bm25_matches_duckdb_twin(spark):
    pdf = _corpus(spark).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = retrieval.bm25_topk_sql(["spark", "join"], k=5,
                                  idf_scale=1000)
    want = {(r[0], r[1], r[2]) for r in con.execute(sql).fetchall()}
    got = {(r.doc_id, r.score, r.rank) for r in
           retrieval.bm25_topk(_corpus(spark), ["spark", "join"], k=5,
                               idf_scale=1000).collect()}
    assert got == want and len(got) == 4


# ---------------------------------------------------------------- CMS

def test_cms_overcounts_never_undercounts(spark):
    vals = (["alpha"] * 50 + ["beta"] * 20 + ["gamma"] * 7
            + [f"noise{i}" for i in range(200)])
    d = spark.createDataFrame([(v,) for v in vals], ["tok"])
    cms = sk.cms_build(d, "tok", depth=3, width=64)
    est = {r.value: r.estimate for r in
           sk.cms_lookup(cms, ["alpha", "beta", "gamma", "absent"],
                         depth=3, width=64).collect()}
    assert est["alpha"] >= 50 and est["beta"] >= 20
    assert est["gamma"] >= 7 and est["absent"] >= 0
    # wide grid => few collisions => near-exact on the heavy hitters
    wide = sk.cms_build(d, "tok", depth=4, width=4096)
    est_w = {r.value: r.estimate for r in
             sk.cms_lookup(wide, ["alpha", "beta", "absent"],
                           depth=4, width=4096).collect()}
    assert est_w["alpha"] == 50 and est_w["beta"] == 20
    assert est_w["absent"] == 0


def test_cms_merge_is_cell_sum(spark):
    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, ["tok"])
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, ["tok"])
    merged = (sk.cms_build(a, "tok", depth=2, width=32)
              .unionByName(sk.cms_build(b, "tok", depth=2, width=32))
              .groupBy("d", "w").agg(F.sum("n").cast("long").alias("n")))
    direct = sk.cms_build(a.unionByName(b), "tok", depth=2, width=32)
    assert ({(r.d, r.w, r.n) for r in merged.collect()}
            == {(r.d, r.w, r.n) for r in direct.collect()})


def test_cms_matches_duckdb_twin(spark):
    vals = [("t%d" % (i % 11),) for i in range(300)]
    d = spark.createDataFrame(vals, ["tok"])
    cms = sk.cms_build(d, "tok", depth=3, width=128)
    got = {(r.value, r.estimate) for r in
           sk.cms_lookup(cms, ["t0", "t5", "zz"], depth=3,
                         width=128).collect()}
    con = duckdb.connect()
    con.register("toks", d.toPandas())
    sql = sk.cms_sql(["t0", "t5", "zz"], depth=3, width=128,
                     source_sql="SELECT tok AS value FROM toks")
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_cms_validation(spark):
    d = spark.createDataFrame([("a",)], ["tok"])
    with pytest.raises(ValueError):
        sk.cms_build(d, "tok", depth=0)
    with pytest.raises(ValueError):
        sk.cms_build(d, "tok", width=1)


# ------------------------------------------------------- semantic dedup

def test_semantic_dedup_collapses_chains(spark):
    # 4-dim toy corpus: 1~2~3 a chain of near-dups (1 and 3 only close
    # via 2), 4 isolated.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.995, 0.0999, 0.0, 0.0]),   # ~1 and ~3
        (3, [0.98, 0.198, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in
           semantic_dedup(d, dim=4, threshold_millis=990,
                          n_planes=2, quant_scale=1000).collect()}
    assert out[1].keep and out[1].rep_id == 1
    assert not out[2].keep and out[2].rep_id == 1
    assert not out[3].keep and out[3].rep_id == 1  # via the 2-bridge
    assert out[4].keep and out[4].rep_id == 4
    assert len(out) == 4  # every input id present exactly once


# ---------------------------------------------------------------- pagerank

def _py_pagerank(edges, iterations=5, dp=850, scale=10 ** 12):
    """Independent driver-side reference with the same integer rules."""
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    deg = {}
    for a, _ in e:
        deg[a] = deg.get(a, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for a, b in e:
            s[b] += r[a] // deg[a]
        dang = sum(r[v] for v in nodes if v not in deg)
        r = {v: ((1000 - dp) * scale) // (1000 * n)
             + (dp * s[v]) // 1000
             + (dp * dang) // (1000 * n)
             for v in nodes}
    return r


def test_pagerank_matches_integer_reference(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 3), (5, 3), (3, 6)]
    # node 6 dangles; 3 is the hub
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.rank_fp for r in pagerank(d, iterations=4).collect()}
    want = _py_pagerank(edges, iterations=4)
    assert got == want
    assert got[3] == max(got.values())  # hub outranks everyone
    total = sum(got.values())
    assert abs(total - 10 ** 12) < 100  # mass conserved modulo floors


def test_pagerank_matches_duckdb_twin(spark):
    edges = [(i, (i * 7) % 23) for i in range(60)] + [(3, 5), (3, 5)]
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.id, r.rank_fp) for r in pagerank(d, iterations=3).collect()}
    con = duckdb.connect()
    con.register("e", d.toPandas())
    sql = pagerank_sql("SELECT src, dst FROM e", iterations=3)
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want


def test_pagerank_validation(spark):
    d = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(d, iterations=0)
    with pytest.raises(ValueError):
        pagerank(d, damping_permille=1000)


# ------------------------------------------------------ n-gram excision

def test_excise_repeated_ngrams_semantics(spark):
    # docs 1 and 2 share the 3-gram "a b c" (plus its shifted windows);
    # doc 3 is clean; doc 4 repeats a 3-gram INSIDE itself (multiplicity
    # counts, so it triggers too); doc 5 is shorter than n.
    rows = [
        (1, "x a b c y"),
        (2, "p q a b c"),
        (3, "u v w z k"),
        (4, "m n o m n o"),
        (5, "s t"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    from biocypher_metta_spark.operators.dedup import excise_repeated_ngrams

    out = {r.doc_id: r for r in excise_repeated_ngrams(d, n=3).collect()}
    assert out[1].clean_text == "x y" and out[1].n_removed == 3
    assert out[2].clean_text == "p q" and out[2].n_removed == 3
    assert out[3].clean_text == "u v w z k" and out[3].n_removed == 0
    # doc 4: "m n o" occurs at positions 0 and 3 -> all 6 tokens covered
    assert out[4].clean_text == "" and out[4].n_removed == 6
    assert out[5].clean_text == "s t" and out[5].n_tokens == 2
    assert all(out[i].n_tokens - out[i].n_removed
               == (len(out[i].clean_text.split())
                   if out[i].clean_text else 0) for i in (1, 2, 3, 4))


def test_excise_validation(spark):
    from biocypher_metta_spark.operators.dedup import excise_repeated_ngrams

    d = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        excise_repeated_ngrams(d, n=1)
    with pytest.raises(ValueError):
        excise_repeated_ngrams(d, min_dup=1)


def test_excise_matches_duckdb_twin(spark):
    # word soup from a tiny vocab so repeated 5-grams actually occur
    vocab = ["a", "b", "c", "d"]
    rows = [(i, " ".join(vocab[(i * 7 + j * 3) % 4] for j in range(12)))
            for i in range(40)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    from biocypher_metta_spark.entry_queries import DOC_NGRAM_EXCISE_SQL
    from biocypher_metta_spark.operators.dedup import excise_repeated_ngrams

    got = {(r.doc_id, r.clean_text, r.n_tokens, r.n_removed)
           for r in excise_repeated_ngrams(d, n=5).collect()}
    con = duckdb.connect()
    con.register("documents", d.toPandas())
    want = set(map(tuple, con.execute(DOC_NGRAM_EXCISE_SQL).fetchall()))
    assert got == want and len(got) == 40
    assert any(r[3] > 0 for r in got)  # the corpus must exercise removal


# -------------------------------------------------------- batch BM25 join

def test_bm25_join_matches_single_query_scan(spark):
    """The posting-join path and the one-shot scan path must agree
    exactly on the same query (same _bm25_term, different plans)."""
    c = _corpus(spark)
    q = spark.createDataFrame(
        [(7, "spark"), (7, "join")], ["query_id", "token"])
    joined = {(r.doc_id, r.score, r.rank) for r in
              retrieval.bm25_score_join(c, q, k=5).collect()}
    scan = {(r.doc_id, r.score, r.rank) for r in
            retrieval.bm25_topk(c, ["spark", "join"], k=5).collect()}
    assert joined == scan


def test_bm25_join_multi_query_and_twin(spark):
    c = _corpus(spark)
    qrows = [(1, "spark"), (1, "join"), (2, "row"), (3, "nope")]
    q = spark.createDataFrame(qrows, ["query_id", "token"])
    out = retrieval.bm25_score_join(c, q, k=3)
    got = {(r.query_id, r.doc_id, r.score, r.rank) for r in out.collect()}
    assert not any(r[0] == 3 for r in got)  # absent token -> no rows
    assert max(r[3] for r in got) <= 3
    con = duckdb.connect()
    con.register("documents", c.toPandas())
    sql = retrieval.bm25_join_sql(qrows, k=3)
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want
    with pytest.raises(ValueError):
        retrieval.bm25_score_join(c, q, k=0)


# ------------------------------------------------------- fixed chunking

def test_chunk_tokens_emission_rule(spark):
    from biocypher_metta_spark.operators.text import chunk_tokens

    def chunks(text, size, ov):
        d = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        return [(r.chunk_no, r.n_chunk_tokens, r.chunk_text) for r in
                chunk_tokens(d, size, ov).orderBy("chunk_no").collect()]

    ten = " ".join(f"t{i}" for i in range(10))
    # short doc -> exactly one chunk
    assert chunks(ten, 64, 16) == [(0, 10, ten)]
    # size 4, overlap 1, stride 3: starts 0,3,6,9; s=9: 9+1 >= 10 ->
    # dropped (chunk at 6 covers 6..9 already)
    got = chunks(ten, 4, 1)
    assert [(c[0], c[1]) for c in got] == [(0, 4), (1, 4), (2, 4)]
    assert got[1][2] == "t3 t4 t5 t6"
    assert got[2][2] == "t6 t7 t8 t9"  # clamped end
    # zero overlap = disjoint windows incl. short tail
    got0 = chunks(ten, 4, 0)
    assert [(c[0], c[1]) for c in got0] == [(0, 4), (1, 4), (2, 2)]
    # every token appears in some chunk (coverage)
    covered = set(" ".join(c[2] for c in got).split())
    assert covered == set(ten.split())


def test_chunk_tokens_validation(spark):
    from biocypher_metta_spark.operators.text import chunk_tokens

    d = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_tokens(d, 0)
    with pytest.raises(ValueError):
        chunk_tokens(d, 4, 4)


def test_chunk_tokens_matches_duckdb_twin(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range((i * 13) % 60)))
            for i in range(30)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    from biocypher_metta_spark.entry_queries import DOC_CHUNK_FIXED_SQL
    from biocypher_metta_spark.operators.text import chunk_tokens

    got = {tuple(r) for r in
           chunk_tokens(d, chunk_size=32, overlap=8).collect()}
    con = duckdb.connect()
    con.register("documents", d.toPandas())
    want = set(map(tuple, con.execute(DOC_CHUNK_FIXED_SQL).fetchall()))
    assert got == want and len(got) >= 30


# -------------------------------------------------- url canonicalization

def test_canonical_url_cases(spark):
    cases = [
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&q=1#f",
         "https://ex.com/a/b?q=1"),
        ("http://ex.com:80/path/", "http://ex.com/path"),
        ("http://u:p@ex.com/x?b=2&a=1", "http://ex.com/x?a=1&b=2"),
        ("https://ex.com/", "https://ex.com"),
        ("https://ex.com", "https://ex.com"),
        ("ftp://ex.com:21/f", "ftp://ex.com:21/f"),   # non-http port kept
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),
        ("https://www.www.ex.com/x?fbclid=a", "https://www.ex.com/x"),
        ("http://ex.com/x?gclid=1&utm_campaign=z", "http://ex.com/x"),
        ("  not a url 7  ", "not a url 7"),
        ("http://ex.com/x///", "http://ex.com/x"),
    ]
    d = spark.createDataFrame(cases, ["url", "want"])
    rows = d.select("url", "want",
                    web.canonical_url(F.col("url")).alias("got")).collect()
    for r in rows:
        assert r.got == r.want, (r.url, r.got, r.want)


def test_canonical_url_idempotent(spark):
    urls = [("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&q=1#f",),
            ("http://u:p@ex.com/x?b=2&a=1",), ("garbage",)]
    d = spark.createDataFrame(urls, ["url"])
    once = d.select(web.canonical_url(F.col("url")).alias("c1"))
    twice = once.select("c1",
                        web.canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r.c1 == r.c2


# ------------------------------------------------------- integer k-means

def _km(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_recovers_planted_clusters(spark):
    from biocypher_metta_spark.operators.kmeans import kmeans_assign

    # two tight 2-d blobs; ids 0 and 1 (the seeds) land in different
    # blobs so Lloyd converges to the planted split in one round
    rows = ([(0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.1])]
            + [(1, [5.0, 5.0]), (3, [5.1, 5.0]), (5, [5.0, 5.1])])
    out = {r.vec_id: r.cluster for r in
           kmeans_assign(_km(spark, rows), k=2, dim=2,
                         iterations=2).collect()}
    assert out[0] == out[2] == out[4] == 0
    assert out[1] == out[3] == out[5] == 1


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from biocypher_metta_spark.operators.kmeans import kmeans_assign

    # seed 1 = [10,10] attracts nothing after round 1 (every point is
    # nearer blob 0's mean) -> cluster 1 keeps its centroid and the
    # far outlier still assigns to it deterministically
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.2, 0.0]),
            (3, [0.0, 0.2]), (4, [9.9, 9.9])]
    out = {r.vec_id: r.cluster for r in
           kmeans_assign(_km(spark, rows), k=2, dim=2,
                         iterations=3).collect()}
    assert out[1] == out[4] == 1 and out[0] == out[2] == out[3] == 0


def test_kmeans_matches_duckdb_twin(spark):
    from biocypher_metta_spark.operators.kmeans import (kmeans_assign,
                                                        kmeans_sql)

    rows = [(i, [((i * 13 + j * 7) % 29 - 14) / 10.0 for j in range(6)])
            for i in range(120)]
    d = _km(spark, rows)
    got = {(r.vec_id, r.cluster) for r in
           kmeans_assign(d, k=3, dim=6, iterations=3).collect()}
    con = duckdb.connect()
    con.register("embeddings", d.toPandas())
    want = set(map(tuple, con.execute(
        kmeans_sql(k=3, dim=6, iterations=3)).fetchall()))
    assert got == want and len(got) == 120
    assert len({c for _, c in got}) == 3


def test_kmeans_validation(spark):
    from biocypher_metta_spark.operators.kmeans import kmeans_assign

    d = _km(spark, [(0, [0.0])])
    with pytest.raises(ValueError):
        kmeans_assign(d, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(d, iterations=0)


# ------------------------------------------------------ triangle counting

def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4}: each vertex is in C(3,2)=3 triangles; vertex 5
    # hangs off 1 (zero triangles); parallel/reversed/self edges are
    # noise the canonicalization must absorb.
    edges = ([(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
             + [(1, 5), (5, 1), (2, 2)])
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.triangles for r in triangle_count(d).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_matches_duckdb_twin(spark):
    edges = [(i % 13, (i // 3) % 13) for i in range(120)]
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.id, r.triangles) for r in triangle_count(d).collect()}
    con = duckdb.connect()
    con.register("e", d.toPandas())
    sql = triangle_count_sql("SELECT src, dst FROM e")
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want
    assert sum(t for _, t in got) > 0  # graph actually has triangles


def test_triangle_count_brute_force(spark):
    import itertools

    edges = [(i % 11, (i // 5) % 11) for i in range(70)]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {v for e in und for v in e}
    want = dict.fromkeys(nodes, 0)
    for t in itertools.combinations(sorted(nodes), 3):
        if all((min(p), max(p)) in und
               for p in itertools.combinations(t, 2)):
            for v in t:
                want[v] += 1
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.triangles for r in triangle_count(d).collect()}
    assert got == want


# ------------------------------------------------------ Bloom prefilter

def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["v"])
    words = sk.bloom_build(build, "v", m_bits=1 << 12, k=4)
    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(300)] + [(None,)], ["v"])
    kept = {r.v for r in
            sk.bloom_prefilter(probe, words, "v",
                               m_bits=1 << 12, k=4).collect()}
    assert {f"k{i}" for i in range(200)} <= kept  # every member kept
    assert None not in kept                       # NULL never passes


def test_bloom_matches_duckdb_twin(spark):
    import duckdb

    build = spark.createDataFrame([(i * 3,) for i in range(150)], ["bk"])
    probe = spark.createDataFrame([(i, i % 500) for i in range(2000)],
                                  ["pk", "fk"])
    words = sk.bloom_build(build, "bk", m_bits=1 << 10, k=3)
    got = {(r.pk, r.fk) for r in
           sk.bloom_prefilter(probe, words, "fk",
                              m_bits=1 << 10, k=3).collect()}
    con = duckdb.connect()
    con.register("b", build.toPandas())
    con.register("p", probe.toPandas())
    sql = sk.bloom_prefilter_sql(
        "SELECT bk FROM b", "SELECT pk, fk FROM p",
        build_col="bk", probe_col="fk", probe_cols=["pk", "fk"],
        m_bits=1 << 10, k=3)
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want
    members = {i * 3 for i in range(150)}
    fps = {fk for _, fk in got} - members
    assert fps  # small filter chosen so FPs exist — and both agreed


def test_bloom_word_table_bounded_and_mergeable(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], ["v"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], ["v"])
    m = 1 << 10
    wa, wb = (sk.bloom_build(d, "v", m_bits=m, k=4) for d in (a, b))
    assert wa.count() <= m // 32  # bounded by construction
    merged = (wa.unionByName(wb).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    direct = sk.bloom_build(a.unionByName(b), "v", m_bits=m, k=4)
    assert ({(r.word_idx, r.bits) for r in merged.collect()}
            == {(r.word_idx, r.bits) for r in direct.collect()})


def test_bloom_binary_blob_path_matches_twin(spark):
    # m_bits = 2^16 -> 2048 words > _BLOOM_LITERAL_WORDS_MAX: exercises
    # the binary-blob lookup encoding (the literal-array path has one
    # Catalyst child per word and melts down at large m_bits); the
    # DuckDB twin is the JOIN formulation, so agreement here checks the
    # substring+hex+conv decode bit-for-bit, false positives included.
    import duckdb

    m = 1 << 16
    assert m // 32 > sk._BLOOM_LITERAL_WORDS_MAX
    build = spark.createDataFrame([(i * 3,) for i in range(150)], ["bk"])
    probe = spark.createDataFrame([(i, i % 500) for i in range(2000)],
                                  ["pk", "fk"])
    words = sk.bloom_build(build, "bk", m_bits=m, k=3)
    got = {(r.pk, r.fk) for r in
           sk.bloom_prefilter(probe, words, "fk",
                              m_bits=m, k=3).collect()}
    con = duckdb.connect()
    con.register("b", build.toPandas())
    con.register("p", probe.toPandas())
    sql = sk.bloom_prefilter_sql(
        "SELECT bk FROM b", "SELECT pk, fk FROM p",
        build_col="bk", probe_col="fk", probe_cols=["pk", "fk"],
        m_bits=m, k=3)
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want
    assert {i * 3 for i in range(150)} & {fk for _, fk in got}


def test_bloom_validation(spark):
    d = spark.createDataFrame([("x",)], ["v"])
    with pytest.raises(ValueError):
        sk.bloom_build(d, "v", m_bits=1000)  # not a power of two
    with pytest.raises(ValueError):
        sk.bloom_build(d, "v", m_bits=1 << 10, k=0)
    with pytest.raises(ValueError):
        sk.bloom_prefilter(d, sk.bloom_build(d, "v"), "v", m_bits=48)


# ---------------------------------------------------------------- k-core

def _kcore_brute(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, c in deg.items() if c >= k}
        nxt = {(a, b) for a, b in und if a in keep and b in keep}
        if nxt == und:
            return {v: deg[v] for v in keep}
        und = nxt


def test_kcore_triangle_with_tail(spark):
    from biocypher_metta_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.core_deg for r in kcore(d, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # tail peeled, triangle stays


def test_kcore_deep_peeling_path(spark):
    from biocypher_metta_spark.operators.graph import kcore

    # path 0-1-2-...-9: 2-core empty, peeled one shell per round from
    # both ends — exercises the multi-round loop + empty fixpoint
    edges = [(i, i + 1) for i in range(9)]
    d = spark.createDataFrame(edges, ["src", "dst"])
    assert kcore(d, k=2).count() == 0


def test_kcore_convergence_guard(spark):
    from biocypher_metta_spark.operators.graph import kcore

    edges = [(i, i + 1) for i in range(9)]
    d = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError):
        kcore(d, k=2, max_rounds=1).collect()


def test_kcore_brute_force_and_twin(spark):
    import duckdb

    from biocypher_metta_spark.operators.graph import kcore, kcore_sql

    edges = [(i % 13, (i // 3) % 13) for i in range(120)] + [
        (100 + i, i % 13) for i in range(10)]  # pendant fringe
    d = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.id, r.core_deg) for r in kcore(d, k=4).collect()}
    want = set(_kcore_brute(edges, 4).items())
    assert got == want and got  # non-empty core
    con = duckdb.connect()
    con.register("e", d.toPandas())
    sql = kcore_sql("SELECT src, dst FROM e", k=4, rounds=6)
    assert {(r[0], r[1]) for r in con.execute(sql).fetchall()} == want


def test_kcore_validation(spark):
    from biocypher_metta_spark.operators.graph import kcore, kcore_sql

    d = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        kcore(d, k=0)
    with pytest.raises(ValueError):
        kcore(d, k=1, max_rounds=0)
    with pytest.raises(ValueError):
        kcore_sql("SELECT 1", k=0, rounds=1)
