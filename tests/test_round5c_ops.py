"""Round-5c operators: label-propagation communities, time-series
gap fill + LOCF, and the PIVOT gate — unit semantics plus DuckDB
cross-engine drift checks (the same arithmetic the driver gates rely
on)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.canonicalize import connected_components
from biocypher_metta_spark.operators.graph import (
    label_propagation, label_propagation_sql)
from biocypher_metta_spark.operators.temporal import (
    gapfill_locf, gapfill_locf_sql)


# ------------------------------------------------------ label propagation

def _two_cliques_with_bridge():
    edges = []
    for base in (0, 100):
        for i in range(8):
            for j in range(i + 1, 8):
                edges.append((base + i, base + j))
    edges.append((3, 103))  # single bridge edge
    return edges


def test_lpa_matches_duckdb_twin(spark):
    edges = _two_cliques_with_bridge()
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.id, r.label)
           for r in label_propagation(e, rounds=3).collect()}
    con = duckdb.connect()
    con.register("edf", pd.DataFrame(edges, columns=["src", "dst"]))
    want = {tuple(r) for r in con.execute(
        label_propagation_sql("SELECT src, dst FROM edf",
                              rounds=3)).fetchall()}
    assert got == want


def test_lpa_separates_communities_where_cc_merges(spark):
    edges = _two_cliques_with_bridge()
    e = spark.createDataFrame(edges, ["src", "dst"])
    labels = label_propagation(e, rounds=3).collect()
    by_label: dict = {}
    for r in labels:
        by_label.setdefault(r.label, set()).add(r.id)
    # vote counts hold each 8-clique on its own label across the
    # single bridge edge -> exactly two communities of 8
    assert sorted(len(v) for v in by_label.values()) == [8, 8]
    assert {frozenset(v) for v in by_label.values()} == {
        frozenset(range(8)), frozenset(range(100, 108))}
    # the contrast that makes LPA a different operator from CC:
    # connected_components floods the bridge into ONE component
    cc = connected_components(e, "src", "dst")
    assert cc.select("component").distinct().count() == 1


def test_lpa_ignores_self_loops_nulls_and_direction(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 2), (None, 3), (3, None), (2, 3), (3, 1)],
        "src: long, dst: long")
    got = {(r.id, r.label)
           for r in label_propagation(e, rounds=2).collect()}
    # triangle {1,2,3}: self-loop/nulls dropped, (1,2)+(2,1) dedup to
    # one undirected edge, and the vote settles on the minimum label
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_lpa_validation(spark):
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        label_propagation(e, rounds=0)


# ------------------------------------------------------- gapfill + locf

def test_gapfill_locf_semantics(spark):
    obs = [(1, 10, 5.0), (1, 25, None), (1, 40, 7.0), (2, 100, 1.5)]
    o = spark.createDataFrame(obs, "k: long, ts: long, v: double")
    got = {(r.k, r.ts, r.v, r.is_gap)
           for r in gapfill_locf(o, "k", "ts", ["v"], step=5).collect()}
    assert (1, 15, 5.0, True) in got      # synthesized gap row filled
    assert (1, 25, 5.0, False) in got     # observed NULL carried over
    assert (1, 40, 7.0, False) in got     # observed value wins
    assert (2, 100, 1.5, False) in got    # single-obs key: grid of one
    assert len(got) == 8                  # key 1: 10..40 step 5; key 2: 1
    assert len({t for t in got if t[0] == 2}) == 1


def test_gapfill_locf_matches_duckdb_twin_randomized(spark):
    rng = random.Random(20260818)
    rows = []
    for k in range(6):
        for ts in sorted(rng.sample(range(0, 400, 3), rng.randint(1, 25))):
            rows.append((k, ts,
                         None if rng.random() < 0.3
                         else float(rng.randint(-50, 50))))
    o = spark.createDataFrame(rows, "k: long, ts: long, v: double")
    got = {(r.k, r.ts, r.v, r.is_gap)
           for r in gapfill_locf(o, "k", "ts", ["v"], step=4).collect()}
    con = duckdb.connect()
    con.register("odf", pd.DataFrame(rows, columns=["k", "ts", "v"]))
    want = {tuple(r) for r in con.execute(gapfill_locf_sql(
        "SELECT k, ts, v FROM odf", "k", "ts", ["v"], 4)).fetchall()}
    assert got == want


def test_gapfill_locf_multiple_value_columns_fill_independently(spark):
    obs = [(1, 0, 1.0, None), (1, 20, None, 9.0)]
    o = spark.createDataFrame(obs, "k: long, ts: long, a: double, b: double")
    out = {(r.ts): (r.a, r.b)
           for r in gapfill_locf(o, "k", "ts", ["a", "b"],
                                 step=10).collect()}
    assert out[0] == (1.0, None)    # nothing earlier to carry into b
    assert out[10] == (1.0, None)   # gap row: a carried, b still empty
    assert out[20] == (1.0, 9.0)    # observed NULL in a carried over


def test_gapfill_locf_validation(spark):
    o = spark.createDataFrame([(1, 1, 1.0)], "k: long, ts: long, v: double")
    with pytest.raises(ValueError):
        gapfill_locf(o, "k", "ts", ["v"], step=0)
    with pytest.raises(ValueError):
        gapfill_locf(o, "k", "ts", [], step=1)
    bad = o.withColumn("is_gap", F.lit(False))
    with pytest.raises(ValueError):
        gapfill_locf(bad, "k", "ts", ["v"], step=1)


def test_gapfill_locf_giant_span_raises_loudly(spark):
    o = spark.createDataFrame([(1, 0, 1.0), (1, 10_000, 2.0)],
                              "k: long, ts: long, v: double")
    with pytest.raises(Exception, match="max_grid_per_key"):
        gapfill_locf(o, "k", "ts", ["v"], step=1,
                     max_grid_per_key=1000).collect()


# ---------------------------------------------------- weighted sampling

def test_weighted_sample_prefers_heavy_rows(spark):
    from biocypher_metta_spark.operators.sampling import weighted_sample

    rows = [(i, 1_000_000 if i < 10 else 1) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id: long, wt: long")
    got = {r.doc_id for r in
           weighted_sample(d, 5, "wt", id_col="doc_id").collect()}
    # 10 rows carry 99.998% of the mass; the draw is deterministic
    # given the salt, and a uniform draw would pick ~0.25 heavy rows
    assert len(got) == 5
    assert len(got & set(range(10))) >= 4
    again = {r.doc_id for r in
             weighted_sample(d, 5, "wt", id_col="doc_id").collect()}
    assert got == again


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from biocypher_metta_spark.operators.sampling import weighted_sample

    d = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (5, 2)],
        "doc_id: long, wt: long")
    got = {r.doc_id for r in
           weighted_sample(d, 10, "wt", id_col="doc_id").collect()}
    assert got == {1, 5}


def test_weighted_sample_global_matches_duckdb_twin(spark):
    from biocypher_metta_spark.operators.sampling import weighted_sample

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id: long, wt: long")
    got = {(r.doc_id, r.sample_rank) for r in
           weighted_sample(d, 20, "wt", id_col="doc_id",
                           salt="tw").collect()}
    con = duckdb.connect()
    con.register("ddf", pd.DataFrame(rows, columns=["doc_id", "wt"]))
    want = {tuple(r) for r in con.execute("""
        SELECT doc_id, sample_rank FROM (
          SELECT doc_id, row_number() OVER (
            ORDER BY CAST(wt AS DOUBLE) / (h + 1) DESC, doc_id
          ) AS sample_rank
          FROM (SELECT doc_id, wt,
                ('0x' || substr(md5('tw:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT AS h
                FROM ddf) WHERE wt > 0
        ) WHERE sample_rank <= 20""").fetchall()}
    assert got == want


def test_weighted_sample_strata_and_validation(spark):
    from biocypher_metta_spark.operators.sampling import weighted_sample

    rows = [(i, "s%d" % (i % 3), i % 7 + 1) for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id: long, g: string, wt: long")
    out = weighted_sample(d, 4, "wt", strata_cols=["g"], id_col="doc_id")
    per = {r.g: r.n for r in
           out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    assert out.filter("sample_rank < 1 OR sample_rank > 4").count() == 0
    with pytest.raises(ValueError):
        weighted_sample(d, 0, "wt")


def test_weighted_sample_global_plan_is_take_ordered(spark):
    from biocypher_metta_spark.operators.sampling import weighted_sample

    d = spark.range(1000).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 9 + 1).alias("wt"))
    plan = (weighted_sample(d, 5, "wt", id_col="doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- co-occurrence edges

def _memberships(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "a"),   # dup membership
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"), (3, "d"),
            (4, "d"), (None, "x"), (4, None)]
    return spark.createDataFrame(rows, "doc: long, tok: string")


def test_cooccurrence_hand_counts(spark):
    from biocypher_metta_spark.operators.graph import cooccurrence_edges

    got = {(r.item_a, r.item_b): r.n_docs
           for r in cooccurrence_edges(_memberships(spark), "doc",
                                       "tok").collect()}
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1,
                   ("a", "d"): 1, ("b", "d"): 1}


def test_cooccurrence_min_count_prunes(spark):
    from biocypher_metta_spark.operators.graph import cooccurrence_edges

    got = {(r.item_a, r.item_b)
           for r in cooccurrence_edges(_memberships(spark), "doc", "tok",
                                       min_count=2).collect()}
    assert got == {("a", "b")}


def test_cooccurrence_cap_matches_twin_and_subsets(spark):
    from biocypher_metta_spark.operators.graph import (
        cooccurrence_edges, cooccurrence_edges_sql)

    rng = random.Random(7)
    rows = [(d, "t%02d" % rng.randint(0, 30))
            for d in range(40) for _ in range(rng.randint(1, 25))]
    df = spark.createDataFrame(rows, "doc: long, tok: string")
    capped = {(r.item_a, r.item_b, r.n_docs)
              for r in cooccurrence_edges(df, "doc", "tok",
                                          max_items_per_doc=5).collect()}
    con = duckdb.connect()
    con.register("mdf", pd.DataFrame(rows, columns=["doc", "tok"]))
    want = {tuple(r) for r in con.execute(cooccurrence_edges_sql(
        "SELECT doc, tok FROM mdf", "doc", "tok",
        max_items_per_doc=5)).fetchall()}
    assert capped == want
    # capped pair set is a subset of the uncapped projection's pairs
    full = {(r.item_a, r.item_b)
            for r in cooccurrence_edges(df, "doc", "tok").collect()}
    assert {(a, b) for a, b, _ in capped} <= full


def test_cooccurrence_validation(spark):
    from biocypher_metta_spark.operators.graph import cooccurrence_edges

    d = _memberships(spark)
    with pytest.raises(ValueError):
        cooccurrence_edges(d, "doc", "tok", min_count=0)
    with pytest.raises(ValueError):
        cooccurrence_edges(d, "doc", "tok", max_items_per_doc=1)


# ------------------------------------------------------ markup stripping

def test_strip_markup_semantics(spark):
    from biocypher_metta_spark.operators.text import strip_markup

    rows = [
        (1, '<html><body><p>Hello <b>world</b></p></body></html>'),
        (2, '<script>var x = 1 < 2;</script>real text<style>p{}</style>'),
        (3, 'before<!-- hidden comment -->after'),
        (4, 'escaped &lt;fin&gt; stays &amp; so do &quot;quotes&quot;'),
        (5, None),
        (6, '   lots\t\nof   space   '),
        (7, 'line one\n\n\nline two'),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.clean_text for r in strip_markup(d).collect()}
    assert got[1] == "Hello world"
    assert got[2] == "real text"
    assert got[3] == "before after"
    # escaped markup is CONTENT: decoded after tag removal, not stripped
    assert got[4] == 'escaped <fin> stays & so do "quotes"'
    assert got[5] is None
    # newlines survive (line-based filters downstream need them);
    # horizontal runs and newline runs each collapse to one
    assert got[6] == "lots\nof space"
    assert got[7] == "line one\nline two"


def test_strip_markup_matches_duckdb_twin(spark):
    from biocypher_metta_spark.operators.text import (
        strip_markup, strip_markup_sql)

    rng = random.Random(5)
    frags = ["plain words", "<p>tag</p>", "&amp;", "<script>x<y</script>",
             "a < b still text", "<!-- c -->", "&lt;esc&gt;", "  sp  "]
    rows = [(i, " ".join(rng.choice(frags)
                         for _ in range(rng.randint(0, 6))))
            for i in range(120)]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r.doc_id, r.clean_text) for r in strip_markup(d).collect()}
    con = duckdb.connect()
    con.register("tdf", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {tuple(r) for r in con.execute(
        f"SELECT doc_id, {strip_markup_sql('text')} AS c FROM tdf"
    ).fetchall()}
    assert got == want


# ------------------------------------------------------ link extraction

def test_extract_links_semantics(spark):
    from biocypher_metta_spark.operators.web import extract_links

    rows = [
        (1, '<a href="https://a.com/x">1</a> <a href="https://a.com/x">'
            'again</a> plain text'),
        (2, "<A HREF='HTTP://B.ORG/P'>upper scheme+attr</A>"),
        (3, '<a href="/relative">r</a> <a href="#f">f</a> '
            '<a href="javascript:void(0)">j</a> no links survive'),
        (4, 'no markup at all'),
        (5, '<a href="https://c.net/p?utm_source=x&q=1#z">tracked</a>'),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {(r.doc, r.url, r.n_links)
           for r in extract_links(d).collect()}
    assert (1, "https://a.com/x", 2) in got          # dedup counted
    # scheme+host case-fold; PATH case is semantic and preserved
    assert (2, "http://b.org/P", 1) in got
    assert (5, "https://c.net/p?q=1", 1) in got      # tracking stripped
    assert {t[0] for t in got} == {1, 2, 5}          # 3 and 4 emit nothing


def test_extract_links_base_url_reserved(spark):
    from biocypher_metta_spark.operators.web import extract_links

    d = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(NotImplementedError):
        extract_links(d, base_url_col="base")


# ---------------------------------------------------- interval merge

def test_merge_intervals_semantics(spark):
    from biocypher_metta_spark.functions.genomic import merge_intervals

    rows = [("a", 0, 10), ("a", 5, 12), ("a", 12, 14),  # chain -> one
            ("a", 20, 25),                               # gap -> new
            ("a", 40, 40),                               # point
            ("b", 0, 1), ("b", 100, 101),
            ("b", None, 5), ("b", 7, None), ("b", 9, 3)]  # dropped
    d = spark.createDataFrame(rows, "grp: string, start: long, end: long")
    got = {(r.grp, r.start, r.end, r.n_merged)
           for r in merge_intervals(d, ["grp"]).collect()}
    assert got == {("a", 0, 14, 3), ("a", 20, 25, 1), ("a", 40, 40, 1),
                   ("b", 0, 1, 1), ("b", 100, 101, 1)}


def test_merge_intervals_slack_bridges_gaps(spark):
    from biocypher_metta_spark.functions.genomic import merge_intervals

    rows = [("a", 0, 10), ("a", 12, 20), ("a", 25, 30)]
    d = spark.createDataFrame(rows, "grp: string, start: long, end: long")
    tight = merge_intervals(d, ["grp"], slack=0).count()
    loose = {(r.start, r.end, r.n_merged)
             for r in merge_intervals(d, ["grp"], slack=2).collect()}
    assert tight == 3
    assert loose == {(0, 20, 2), (25, 30, 1)}  # slack=2 bridges gap 10->12


def test_merge_intervals_matches_duckdb_twin_randomized(spark):
    from biocypher_metta_spark.functions.genomic import (
        interval_merge_sql, merge_intervals)

    rng = random.Random(99)
    rows = []
    for g in range(8):
        for _ in range(rng.randint(0, 40)):
            s = rng.randint(0, 300)
            rows.append((g, s, s + rng.randint(0, 25)))
    d = spark.createDataFrame(rows, "grp: long, start: long, end: long")
    got = {(r.grp, r.start, r.end, r.n_merged)
           for r in merge_intervals(d, ["grp"], slack=1).collect()}
    con = duckdb.connect()
    con.register("ivd", pd.DataFrame(rows, columns=["grp", "start", "end"]))
    want = {tuple(r) for r in con.execute(interval_merge_sql(
        'SELECT grp, start, "end" FROM ivd', ["grp"],
        "start", '"end"', slack=1)).fetchall()}
    assert got == want


def test_merge_intervals_validation(spark):
    from biocypher_metta_spark.functions.genomic import merge_intervals

    d = spark.createDataFrame([("a", 1, 2)],
                              "grp: string, start: long, end: long")
    with pytest.raises(ValueError):
        merge_intervals(d, ["grp"], slack=-1)
    with pytest.raises(ValueError):
        merge_intervals(d, [])


# ---------------------------------------------------- snapshot diff

def test_snapshot_diff_classes(spark):
    from biocypher_metta_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)],
        "k: long, s: string, v: long")
    new = spark.createDataFrame(
        [(2, "y", 20), (3, "z", 31), (4, None, 40), (5, "w", 50)],
        "k: long, s: string, v: long")
    got = {(r.k, r.change, r.v_old, r.v_new)
           for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    # k=2 unchanged (absent), k=4 unchanged incl. null-safe compare
    assert got == {(1, "removed", 10, None),
                   (3, "changed", 30, 31),
                   (5, "added", None, 50)}


def test_snapshot_diff_null_transitions_are_changes(spark):
    from biocypher_metta_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, 5)], "k: long, v: long")
    new = spark.createDataFrame([(1, 7), (2, None)], "k: long, v: long")
    got = {(r.k, r.change) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {(1, "changed"), (2, "changed")}


def test_snapshot_diff_missing_column_raises(spark):
    from biocypher_metta_spark.operators.cdc import snapshot_diff

    d = spark.createDataFrame([(1, 2)], "k: long, v: long")
    with pytest.raises(ValueError):
        snapshot_diff(d, d, ["k"], ["nope"])


# ------------------------------------------------ neighborhood jaccard

def test_neighborhood_jaccard_hand_example(spark):
    from biocypher_metta_spark.operators.graph import neighborhood_jaccard

    # 1 and 2 share neighbors {3,4}; N(1)={3,4}, N(2)={3,4,5}
    # -> n_common=2, union=3, jaccard = floor(2000/3) = 666
    e = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3), (2, 4), (2, 5)], ["src", "dst"])
    got = {(r.node_a, r.node_b, r.n_common, r.jaccard_permille)
           for r in neighborhood_jaccard(e, min_common=2).collect()}
    assert (1, 2, 2, 666) in got
    # 3 and 4 share {1,2} with N(3)=N(4)={1,2} -> 1000 permille
    assert (3, 4, 2, 1000) in got


def test_neighborhood_jaccard_bridge_pairs_absent(spark):
    from biocypher_metta_spark.operators.graph import neighborhood_jaccard

    edges = _two_cliques_with_bridge()
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = neighborhood_jaccard(e, min_common=2)
    rows = out.collect()
    # no pair straddles the bridge: nucleus A ids < 100 <= nucleus B
    assert rows and all((r.node_a < 100) == (r.node_b < 100)
                        for r in rows)
    assert all(1 <= r.jaccard_permille <= 1000 for r in rows)


def test_neighborhood_jaccard_matches_duckdb_twin(spark):
    from biocypher_metta_spark.operators.graph import (
        neighborhood_jaccard, neighborhood_jaccard_sql)

    rng = random.Random(21)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(400)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {tuple(r) for r in neighborhood_jaccard(e, min_common=2)
           .collect()}
    con = duckdb.connect()
    con.register("edf2", pd.DataFrame(edges, columns=["src", "dst"]))
    want = {tuple(r) for r in con.execute(neighborhood_jaccard_sql(
        "SELECT src, dst FROM edf2", min_common=2)).fetchall()}
    assert got == want


# ------------------------------------------------ char-bigram LM train

def test_lm_training_reproduces_builtin_table(spark):
    from biocypher_metta_spark.operators.text import (
        LANG_TRIGRAM_SNIPPETS, LM_BIGRAM_NLL, bigram_nll_from_counts,
        train_char_bigram_lm)

    d = spark.createDataFrame([(1, LANG_TRIGRAM_SNIPPETS["en"])],
                              "doc_id: long, text: string")
    rows = [r.asDict() for r in train_char_bigram_lm(d).collect()]
    model = bigram_nll_from_counts(rows)
    # the distributed count path + driver model build reproduce the
    # import-time snippet-trained table bit-for-bit
    assert model == LM_BIGRAM_NLL


def test_lm_trained_table_composes_with_perplexity(spark):
    from biocypher_metta_spark.operators.text import (
        bigram_nll_from_counts, lm_perplexity, train_char_bigram_lm)

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog ran to the house")
         for i in range(20)], "doc_id: long, text: string")
    rows = [r.asDict() for r in train_char_bigram_lm(corpus).collect()]
    model = bigram_nll_from_counts(rows)
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zqxv kjwq pzzkx vqxjz")],
        "doc_id: long, text: string")
    out = {r.doc_id: r.nll_per_bigram
           for r in lm_perplexity(probe, table=model).collect()}
    assert out[1] < out[2]  # in-domain scores lower than gibberish


def test_lm_train_empty_and_null_docs(spark):
    from biocypher_metta_spark.operators.text import train_char_bigram_lm

    d = spark.createDataFrame([(1, ""), (2, None), (3, "ab")],
                              "doc_id: long, text: string")
    got = {r.bigram: r.n for r in train_char_bigram_lm(d).collect()}
    # "" normalizes to '  ' (1 bigram); None drops; "ab" -> ' ab '
    assert got == {"  ": 1, " a": 1, "ab": 1, "b ": 1}


# --------------------------------------- merge_intervals property tests

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 3),          # key
                          st.integers(0, 80),         # start
                          st.integers(0, 25)),        # length
                min_size=1, max_size=60),
       st.integers(0, 4))                             # slack
def test_merge_intervals_invariants(spark, raw, slack):
    from biocypher_metta_spark.functions.genomic import merge_intervals

    rows = [(k, s, s + ln) for k, s, ln in raw]
    d = spark.createDataFrame(rows, "grp: long, start: long, end: long")
    out = merge_intervals(d, ["grp"], slack=slack).collect()
    # (1) conservation: every input interval lands in exactly one block
    assert sum(r.n_merged for r in out) == len(rows)
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.grp, []).append((r.start, r.end))
    for k, blocks in by_key.items():
        blocks.sort()
        ins = sorted((s, e) for g, s, e in rows if g == k)
        # (2) blocks are disjoint with gaps STRICTLY wider than slack
        for (s1, e1), (s2, e2) in zip(blocks, blocks[1:]):
            assert s2 > e1 + slack
        # (3) every input interval is contained in some block
        for s, e in ins:
            assert any(bs <= s and e <= be for bs, be in blocks)
        # (4) block bounds are realized by inputs (no invented space)
        starts = {s for s, _ in ins}
        ends = {e for _, e in ins}
        assert all(bs in starts and be in ends for bs, be in blocks)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 2),           # key
                          st.integers(0, 30),          # slot
                          st.one_of(st.none(),
                                    st.integers(-9, 9))),
                min_size=1, max_size=40),
       st.integers(1, 5))                              # step
def test_gapfill_locf_invariants(spark, raw, step):
    # one obs per (key, slot): last write wins in the generator so the
    # operator's uniqueness contract holds
    obs = {}
    for k, slot, v in raw:
        obs[(k, slot * step)] = v
    rows = [(k, ts, float(v) if v is not None else None)
            for (k, ts), v in obs.items()]
    d = spark.createDataFrame(rows, "k: long, ts: long, v: double")
    out = gapfill_locf(d, "k", "ts", ["v"], step=step).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r.k, {})[r.ts] = (r.v, r.is_gap)
    ins: dict = {}
    for k, ts, v in rows:
        ins.setdefault(k, {})[ts] = v
    assert set(by_key) == set(ins)
    for k, grid in by_key.items():
        lo, hi = min(ins[k]), max(ins[k])
        # (1) the grid is exactly lo..hi at step
        assert sorted(grid) == list(range(lo, hi + 1, step))
        # (2) is_gap marks exactly the non-observed slots; (3) values
        # are the pure-Python LOCF of the observations
        carry = None
        for ts in sorted(grid):
            observed = ts in ins[k]
            if observed and ins[k][ts] is not None:
                carry = ins[k][ts]
            v, is_gap = grid[ts]
            assert is_gap == (not observed)
            assert v == carry


def test_neighborhood_jaccard_max_degree_caps_hub(spark):
    from biocypher_metta_spark.operators.graph import neighborhood_jaccard

    # one hub (0) connected to 40 spokes; no other edges
    e = spark.createDataFrame([(0, i) for i in range(1, 41)],
                              ["src", "dst"])
    full = neighborhood_jaccard(e, min_common=1)
    # uncapped: every spoke pair shares the hub -> C(40,2) pairs
    assert full.count() == 40 * 39 // 2
    capped = neighborhood_jaccard(e, min_common=1, max_degree=5)
    # the hub votes with 5 members -> C(5,2) pairs, a strict subset
    assert capped.count() == 5 * 4 // 2
    fp = {(r.node_a, r.node_b) for r in full.collect()}
    cp = {(r.node_a, r.node_b) for r in capped.collect()}
    assert cp < fp
    # degrees (and so denominators) stay exact under the cap: each
    # spoke has degree 1, so union = 1 + 1 - 1 and permille = 1000
    for r in neighborhood_jaccard(e, min_common=1,
                                  max_degree=5).collect():
        assert r.n_common == 1 and r.jaccard_permille == 1000


# ----------------------------------------------- exact set-sim join

def test_set_similarity_exact_vs_brute_force(spark):
    from biocypher_metta_spark.operators.dedup import (
        set_similarity_join, set_similarity_join_sql)

    rng = random.Random(11)
    vocab = ["w%02d" % i for i in range(60)]
    rows = []
    for i in range(120):
        base = rng.sample(vocab, rng.randint(3, 15))
        rows.append((i, " ".join(base)))
        if rng.random() < 0.3:              # planted near-dup
            twin = base[:-1] if len(base) > 4 else base
            rows.append((1000 + i, " ".join(twin)))
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    for tau in (600, 800, 1000):
        got = {tuple(r) for r in set_similarity_join(d, tau).collect()}
        con = duckdb.connect()
        con.register("ssd", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = {tuple(r) for r in con.execute(set_similarity_join_sql(
            "SELECT doc_id, text FROM ssd", tau)).fetchall()}
        # prefix filtering is EXACT: nothing missed, nothing extra
        assert got == want, tau
        assert all(r[3] >= tau for r in got)


def test_set_similarity_identical_and_disjoint_docs(spark):
    from biocypher_metta_spark.operators.dedup import set_similarity_join

    d = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a a"), (3, "x y z"), (4, "")],
        "doc_id: long, text: string")
    got = {tuple(r) for r in set_similarity_join(d, 1000).collect()}
    # duplicate tokens and order don't matter; disjoint/empty emit nothing
    assert got == {(1, 2, 3, 1000)}
    with pytest.raises(ValueError):
        set_similarity_join(d, 0)
