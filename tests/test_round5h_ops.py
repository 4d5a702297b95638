"""Round-5h operators: KMV set-operation estimates
(operators/sketch.kmv_set_estimate) — union/intersection cardinality
from two mergeable k-minima sketch states [Beyer et al. SIGMOD'07]."""

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.sketch import (
    kmv_set_estimate,
    kmv_set_sql,
)


def _strings(spark, lo, hi, prefix="v"):
    return (spark.range(lo, hi)
            .select(F.concat(F.lit(prefix), F.col("id")).alias("x")))


def _duck(a_lo, a_hi, b_lo, b_hi, k, prefix="v"):
    sql = kmv_set_sql(
        f"SELECT '{prefix}' || CAST(range AS VARCHAR) AS v "
        f"FROM range({a_lo}, {a_hi})",
        f"SELECT '{prefix}' || CAST(range AS VARCHAR) AS v "
        f"FROM range({b_lo}, {b_hi})", k=k)
    return duckdb.connect().execute(sql).fetchall()[0]


def test_exact_regime_below_k(spark):
    # |A u B| = 20 < k: the merged sketch is exhaustive, so union AND
    # intersection are exact counts, not estimates
    a, b = _strings(spark, 0, 10, "e"), _strings(spark, 5, 20, "e")
    row = tuple(kmv_set_estimate(a, "x", b, "x", k=64).collect()[0])
    assert row[1] == 20 and row[3] == 20        # n_union_k == union_est
    assert row[4] == 5 and row[5] == 5          # n_inter_k == inter_est
    assert row == _duck(0, 10, 5, 20, 64, "e")


def test_estimate_regime_matches_twin_and_is_close(spark):
    a, b = _strings(spark, 0, 400), _strings(spark, 200, 700)
    row = tuple(kmv_set_estimate(a, "x", b, "x", k=64).collect()[0])
    assert row == _duck(0, 400, 200, 700, 64)
    # true union 700, inter 200; k=64 KMV standard error ~ 1/sqrt(k)
    assert abs(row[3] - 700) < 700 * 0.5
    assert abs(row[5] - 200) < 200 * 1.0 + 64


def test_disjoint_sets_estimate_zero_intersection(spark):
    a, b = _strings(spark, 0, 300, "a"), _strings(spark, 0, 300, "b")
    row = kmv_set_estimate(a, "x", b, "x", k=32).collect()[0]
    # disjoint domains: few/no shared minima survive the union cut
    assert row["inter_est"] <= row["union_est"] * 0.2


def test_identical_sets_estimate_equals_union(spark):
    a, b = _strings(spark, 0, 500), _strings(spark, 0, 500)
    row = kmv_set_estimate(a, "x", b, "x", k=64).collect()[0]
    # identical inputs: every union minimum is in both sketches
    assert row["n_inter_k"] == row["n_union_k"]
    assert row["inter_est"] == row["union_est"]


def test_merge_law_union_sketch_equals_direct(spark):
    # the k smallest of (minima_A u minima_B) == the KMV sketch of
    # A u B built directly — the Beyer merge law the estimator rests on
    from biocypher_metta_spark.operators.sketch import _kmv_minima

    a, b = _strings(spark, 0, 400), _strings(spark, 200, 700)
    merged = sorted(
        r["h"] for r in (_kmv_minima(a, "x", 64)
                         .unionByName(_kmv_minima(b, "x", 64))
                         .distinct().orderBy("h").limit(64).collect()))
    direct = sorted(
        r["h"] for r in _kmv_minima(a.unionByName(b), "x", 64)
        .collect())
    assert merged == direct


def test_nulls_ignored(spark):
    a = spark.createDataFrame(
        [("p1",), (None,), ("p2",), (None,)], "x: string")
    b = spark.createDataFrame([("p2",), (None,)], "x: string")
    row = tuple(kmv_set_estimate(a, "x", b, "x", k=8).collect()[0])
    assert row[1] == 2 and row[3] == 2 and row[5] == 1


def test_k_validation():
    with pytest.raises(ValueError):
        kmv_set_sql("SELECT 1 AS v", "SELECT 2 AS v", k=1)


# ---------------------------------------------------------------------------
# sssp_bounded (operators/graph.py): bounded weighted shortest paths
# ---------------------------------------------------------------------------

import random

from biocypher_metta_spark.operators.graph import (
    sssp_bounded,
    sssp_bounded_sql,
)


def _sssp_duck(edges, sources, rounds):
    ev = ", ".join(f"({a},{b},{w})" for a, b, w in edges)
    sv = ", ".join(f"({s})" for s in sources)
    sql = sssp_bounded_sql(
        f"SELECT * FROM (VALUES {ev}) t(src,dst,w)",
        f"SELECT * FROM (VALUES {sv}) t(node)", rounds)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _sssp_spark(spark, edges, sources, rounds):
    e = spark.createDataFrame(edges, "src: long, dst: long, w: long")
    s = spark.createDataFrame([(x,) for x in sources], "node: long")
    return sorted(tuple(r) for r in sssp_bounded(e, s, rounds).collect())


def test_sssp_weighted_shortcut_beats_fewer_hops(spark):
    # 1->3 direct costs 25; 1->2->3 costs 20; the 3->4->2 back-path
    # does NOT improve 2 (21+1 > 10) — relaxation must min-combine
    e = [(1, 2, 10), (2, 3, 10), (1, 3, 25), (3, 4, 1), (4, 2, 1)]
    got = _sssp_spark(spark, e, [1], 4)
    assert got == [(1, 0), (2, 10), (3, 20), (4, 21)]
    assert got == _sssp_duck(e, [1], 4)


def test_sssp_hop_bound_is_the_semantics(spark):
    # rounds=1: only direct edges; the cheaper 2-hop route to 3 is
    # out of budget, so the direct w=25 edge wins
    e = [(1, 2, 10), (2, 3, 10), (1, 3, 25)]
    got = _sssp_spark(spark, e, [1], 1)
    assert got == [(1, 0), (2, 10), (3, 25)]
    assert got == _sssp_duck(e, [1], 1)


def test_sssp_negative_edge(spark):
    # negative weight on an acyclic stretch: "cheapest <= R-hop path"
    # stays well-defined and both engines agree
    e = [(1, 2, 5), (2, 3, -3), (1, 3, 4)]
    got = _sssp_spark(spark, e, [1], 3)
    assert got == [(1, 0), (2, 5), (3, 2)]
    assert got == _sssp_duck(e, [1], 3)


def test_sssp_parallel_edges_min_collapse(spark):
    e = [(1, 2, 9), (1, 2, 4), (1, 2, 7)]
    got = _sssp_spark(spark, e, [1], 2)
    assert got == [(1, 0), (2, 4)]
    assert got == _sssp_duck(e, [1], 2)


def test_sssp_multi_source_and_cycles_randomized(spark):
    random.seed(11)
    e = [(random.randrange(25), random.randrange(25),
          random.randrange(1, 9)) for _ in range(70)]
    got = _sssp_spark(spark, e, [0, 1, 2], 5)
    assert got == _sssp_duck(e, [0, 1, 2], 5)
    # sources cost 0 even when reachable by longer paths
    costs = dict(got)
    assert costs[0] == 0 and costs[1] == 0 and costs[2] == 0


def test_sssp_rounds_zero_returns_sources_only(spark):
    e = [(1, 2, 3)]
    assert _sssp_spark(spark, e, [1], 0) == [(1, 0)]


def test_sssp_rounds_validation():
    with pytest.raises(ValueError):
        sssp_bounded_sql("SELECT 1 AS src, 2 AS dst, 1 AS w",
                         "SELECT 1 AS node", -1)


# ---------------------------------------------------------------------------
# random_walks (operators/graph.py): deterministic walk corpus
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (
    random_walks,
    random_walks_sql,
)


def _rw_duck(edges, walk_len, reps=1):
    ev = ", ".join(f"({a},{b})" for a, b in edges)
    sql = random_walks_sql(
        f"SELECT * FROM (VALUES {ev}) t(src,dst)", walk_len, reps)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _rw_spark(spark, edges, walk_len, reps=1):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    return sorted(tuple(r)
                  for r in random_walks(e, walk_len, reps).collect())


def test_rw_hand_case_matches_twin(spark):
    e = [(1, 2), (1, 3), (2, 3), (3, 1)]
    got = _rw_spark(spark, e, 3)
    assert got == _rw_duck(e, 3)
    # every node with an out-edge starts one walk at step 0 = itself
    assert {(r[0], r[3]) for r in got if r[2] == 0} == {(1, 1), (2, 2),
                                                        (3, 3)}


def test_rw_walk_is_contiguous_and_follows_edges(spark):
    e = [(i, (i * 5 + 1) % 16) for i in range(16)] + \
        [(i, (i * 3 + 7) % 16) for i in range(16)]
    got = _rw_spark(spark, e, 4, reps=2)
    assert got == _rw_duck(e, 4, reps=2)
    eset = set(e)
    byw = {}
    for start, rep, step, node in got:
        byw.setdefault((start, rep), {})[step] = node
    for path in byw.values():
        assert sorted(path) == list(range(len(path)))  # contiguous
        for t in range(1, len(path)):
            assert (path[t - 1], path[t]) in eset      # real edges


def test_rw_sink_stops_walk_early(spark):
    e = [(1, 2)]  # 2 has no out-edges
    got = _rw_spark(spark, e, 5)
    assert got == [(1, 0, 0, 1), (1, 0, 1, 2)]
    assert got == _rw_duck(e, 5)


def test_rw_reps_give_distinct_deterministic_paths(spark):
    e = [(i, j) for i in range(8) for j in range(8) if i != j]
    got = _rw_spark(spark, e, 3, reps=4)
    assert got == _rw_duck(e, 3, reps=4)
    # determinism: rerun is identical
    assert got == _rw_spark(spark, e, 3, reps=4)
    # with full out-degree 7 the 4 reps should not all walk one path
    paths = {}
    for start, rep, step, node in got:
        paths.setdefault((start, rep), []).append((step, node))
    per_start = {}
    for (start, rep), p in paths.items():
        per_start.setdefault(start, set()).add(tuple(sorted(p)))
    assert any(len(v) > 1 for v in per_start.values())


def test_rw_validation():
    with pytest.raises(ValueError):
        random_walks_sql("SELECT 1 AS src, 2 AS dst", -1)
    with pytest.raises(ValueError):
        random_walks_sql("SELECT 1 AS src, 2 AS dst", 2, reps=0)


# ---------------------------------------------------------------------------
# dsir_scores (operators/text.py): DSIR-style importance scoring
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.text import dsir_scores, dsir_sql

_DSIR_RAW = [
    (0, "the cat sat on the mat"),
    (1, "der hund lief im park herum"),
    (2, "the dog ran in the park"),
    (3, "el gato grande duerme mucho hoy"),
    (4, "a cat and a dog in the house"),
    (5, "word"),
]
_DSIR_TGT = [(100, "the cat and the dog sat"),
             (101, "a dog ran to the house"),
             (102, "the mat in the house")]


def _dsir_vals(docs):
    return ("SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in docs)
            + ") t(doc_id, text)")


def _dsir_spark(spark, raw, tgt, **kw):
    r = spark.createDataFrame(raw, "doc_id: long, text: string")
    t = spark.createDataFrame(tgt, "doc_id: long, text: string")
    return sorted(tuple(x) for x in dsir_scores(r, t, **kw).collect())


def _dsir_duck(raw, tgt, **kw):
    sql = dsir_sql(_dsir_vals(raw), _dsir_vals(tgt), **kw)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def test_dsir_cross_engine_exact(spark):
    got = _dsir_spark(spark, _DSIR_RAW, _DSIR_TGT, buckets=64)
    assert got == _dsir_duck(_DSIR_RAW, _DSIR_TGT, buckets=64)
    # every raw doc scored, single-token doc has 1 gram (no bigram)
    assert len(got) == len(_DSIR_RAW)
    assert dict((r[0], r[1]) for r in got)[5] == 1


def test_dsir_english_target_prefers_english_docs(spark):
    got = _dsir_spark(spark, _DSIR_RAW, _DSIR_TGT, buckets=64)
    spg = {r[0]: r[3] for r in got}
    assert min(spg[0], spg[2], spg[4]) > max(spg[1], spg[3])


def test_dsir_identical_corpora_score_near_scale(spark):
    # raw == target: every ratio is ~1, so per-gram scores sit at
    # ~scale (floor effects only)
    got = _dsir_spark(spark, _DSIR_TGT, _DSIR_TGT, buckets=32,
                      scale=1000)
    for _, _, _, spg in got:
        assert 500 <= spg <= 2000


def test_dsir_validation():
    with pytest.raises(ValueError):
        dsir_sql("SELECT 1 AS doc_id, 'a' AS text",
                 "SELECT 1 AS doc_id, 'a' AS text", buckets=1)
    with pytest.raises(ValueError):
        dsir_sql("SELECT 1 AS doc_id, 'a' AS text",
                 "SELECT 1 AS doc_id, 'a' AS text", scale=0)


# ---------------------------------------------------------------------------
# wl_colors (operators/graph.py): Weisfeiler-Leman structural signatures
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import wl_colors, wl_colors_sql


def _wl_duck(edges, rounds):
    ev = ", ".join(f"({a},{b})" for a, b in edges)
    sql = wl_colors_sql(
        f"SELECT * FROM (VALUES {ev}) t(src,dst)", rounds)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _wl_spark(spark, edges, rounds):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    return sorted(tuple(r) for r in wl_colors(e, rounds).collect())


def test_wl_isomorphic_components_share_colors(spark):
    # two disjoint directed triangles are isomorphic: their nodes must
    # land on ONE color; the 2-path splits into distinct roles
    e = [(1, 2), (2, 3), (3, 1),
         (11, 12), (12, 13), (13, 11),
         (21, 22), (22, 23)]
    got = _wl_spark(spark, e, 2)
    assert got == _wl_duck(e, 2)
    c = dict(got)
    assert len({c[1], c[2], c[3], c[11], c[12], c[13]}) == 1
    assert len({c[21], c[22], c[23]}) == 3
    assert c[1] != c[21]


def test_wl_star_hub_differs_from_leaves(spark):
    e = [(0, 1), (0, 2), (0, 3), (0, 4)]
    got = _wl_spark(spark, e, 2)
    assert got == _wl_duck(e, 2)
    c = dict(got)
    assert len({c[1], c[2], c[3], c[4]}) == 1 and c[0] != c[1]


def test_wl_round_zero_is_degree_classes(spark):
    # rounds=0: color = (out-deg, in-deg) hash only — 1 and 2 both
    # (1 out, 0 in) collapse; refinement at rounds>=1 separates them
    # because their successors differ structurally
    e = [(1, 3), (2, 4), (4, 5)]
    c0 = dict(_wl_spark(spark, e, 0))
    assert c0[1] == c0[2]
    assert _wl_spark(spark, e, 0) == _wl_duck(e, 0)
    c1 = dict(_wl_spark(spark, e, 1))
    assert c1[1] != c1[2]


def test_wl_refinement_never_splits_true_automorphism(spark):
    # a 4-cycle is vertex-transitive: every node keeps one shared
    # color at any depth
    e = [(1, 2), (2, 3), (3, 4), (4, 1)]
    for r in (0, 1, 3):
        got = _wl_spark(spark, e, r)
        assert got == _wl_duck(e, r)
        assert len({c for _, c in got}) == 1


def test_wl_randomized_cross_engine(spark):
    random.seed(19)
    e = list({(random.randrange(30), random.randrange(30))
              for _ in range(90)})
    assert _wl_spark(spark, e, 3) == _wl_duck(e, 3)


def test_wl_validation():
    with pytest.raises(ValueError):
        wl_colors_sql("SELECT 1 AS src, 2 AS dst", -1)


# ---------------------------------------------------------------------------
# temporal_reachability (operators/graph.py): earliest-arrival paths
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (
    temporal_reachability,
    temporal_reachability_sql,
)


def _tr_duck(edges, sources, hops):
    ev = ", ".join(f"({a},{b},{t})" for a, b, t in edges)
    sv = ", ".join(f"({n},{t})" for n, t in sources)
    sql = temporal_reachability_sql(
        f"SELECT * FROM (VALUES {ev}) t(src,dst,ts)",
        f"SELECT * FROM (VALUES {sv}) t(node,t0)", hops)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _tr_spark(spark, edges, sources, hops):
    e = spark.createDataFrame(edges, "src: long, dst: long, ts: long")
    s = spark.createDataFrame(sources, "node: long, t0: long")
    return sorted(tuple(r)
                  for r in temporal_reachability(e, s, hops).collect())


def test_tr_edge_order_matters(spark):
    # 2-(t3)->3 happened BEFORE information reached 2 at t5: a static
    # path that carries nothing; only the t8 contact delivers
    e = [(1, 2, 5), (2, 3, 3), (2, 3, 8)]
    got = _tr_spark(spark, e, [(1, 0)], 3)
    assert got == [(1, 0), (2, 5), (3, 8)]
    assert got == _tr_duck(e, [(1, 0)], 3)


def test_tr_start_time_gates_first_hop(spark):
    e = [(1, 2, 5), (2, 3, 8)]
    got = _tr_spark(spark, e, [(1, 6)], 3)
    assert got == [(1, 6)]  # the t5 contact predates the release
    assert got == _tr_duck(e, [(1, 6)], 3)


def test_tr_multi_source_takes_min_arrival(spark):
    e = [(1, 3, 10), (2, 3, 4), (3, 4, 6)]
    got = _tr_spark(spark, e, [(1, 0), (2, 0)], 3)
    assert got == [(1, 0), (2, 0), (3, 4), (4, 6)]
    assert got == _tr_duck(e, [(1, 0), (2, 0)], 3)


def test_tr_randomized_contacts(spark):
    random.seed(29)
    e = [(random.randrange(18), random.randrange(18),
          random.randrange(100)) for _ in range(120)]
    srcs = [(0, 10), (5, 0)]
    assert _tr_spark(spark, e, srcs, 4) == _tr_duck(e, srcs, 4)


def test_tr_hops_zero_is_sources_only(spark):
    e = [(1, 2, 3)]
    assert _tr_spark(spark, e, [(1, 0)], 0) == [(1, 0)]


def test_tr_validation():
    with pytest.raises(ValueError):
        temporal_reachability_sql(
            "SELECT 1 AS src, 2 AS dst, 3 AS ts",
            "SELECT 1 AS node, 0 AS t0", -1)


# ---------------------------------------------------------------------------
# personalized_pagerank (operators/graph.py): seed-teleport PageRank
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (
    personalized_pagerank,
    personalized_pagerank_sql,
)


def _ppr_duck(edges, seeds, it=4):
    ev = ", ".join(f"({a},{b})" for a, b in edges)
    sv = ", ".join(f"({s})" for s in seeds)
    sql = personalized_pagerank_sql(
        f"SELECT * FROM (VALUES {ev}) t(src,dst)",
        f"SELECT * FROM (VALUES {sv}) t(id)", iterations=it)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _ppr_spark(spark, edges, seeds, it=4):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    s = spark.createDataFrame([(x,) for x in seeds], "id: long")
    return sorted(tuple(r) for r in
                  personalized_pagerank(e, s, iterations=it).collect())


def test_ppr_unreached_component_holds_zero(spark):
    e = [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10)]
    got = _ppr_spark(spark, e, [1])
    assert got == _ppr_duck(e, [1])
    r = dict(got)
    assert r[10] == 0 and r[11] == 0
    assert min(r[1], r[2], r[3]) > 0


def test_ppr_seed_outranks_downstream_leaf(spark):
    e = [(1, 2), (2, 1), (2, 3)]
    r = dict(_ppr_spark(spark, e, [1]))
    assert r[1] > r[3]


def test_ppr_randomized_cross_engine(spark):
    random.seed(31)
    e = list({(random.randrange(25), random.randrange(25))
              for _ in range(80)})
    assert _ppr_spark(spark, e, [0, 3, 7], it=5) == \
        _ppr_duck(e, [0, 3, 7], it=5)


def test_ppr_seed_absent_from_graph_raises(spark):
    with pytest.raises(ValueError):
        _ppr_spark(spark, [(1, 2)], [99])


def test_ppr_validation():
    with pytest.raises(ValueError):
        personalized_pagerank_sql("SELECT 1 AS src, 2 AS dst",
                                  "SELECT 1 AS id", iterations=0)
    with pytest.raises(ValueError):
        personalized_pagerank_sql("SELECT 1 AS src, 2 AS dst",
                                  "SELECT 1 AS id",
                                  damping_permille=1000)


# ---------------------------------------------------------------------------
# validate_triples (operators/validate.py): schema-driven validation
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.validate import (
    validate_triples,
    validate_triples_sql,
)

_VT_NODES = [("g1", "gene"), ("g2", "ncrna"), ("t1", "transcript"),
             ("p1", "protein"), ("x1", "pathway")]
_VT_CONS = [("transcribed_to", "gene", "transcript"),
            ("translates_to", "transcript", "protein"),
            ("member_of", "protein", "pathway")]
_VT_ISA = [("ncrna", "gene")]


def _vt_q(rows, cols):
    return ("SELECT * FROM (VALUES "
            + ", ".join("(" + ", ".join(f"'{x}'" for x in r) + ")"
                        for r in rows) + f") t({cols})")


def _vt_spark(spark, edges, isa=_VT_ISA):
    n = spark.createDataFrame(_VT_NODES, "id: string, label: string")
    e = spark.createDataFrame(edges, "src: string, tgt: string, "
                                     "label: string")
    c = spark.createDataFrame(_VT_CONS, "edge_label: string, "
                              "src_label: string, tgt_label: string")
    i = (spark.createDataFrame(isa, "child: string, parent: string")
         if isa else None)
    return sorted(tuple(r)
                  for r in validate_triples(n, e, c, i).collect())


def _vt_duck(edges, isa=_VT_ISA):
    sql = validate_triples_sql(
        _vt_q(_VT_NODES, "id, label"), _vt_q(edges, "src, tgt, label"),
        _vt_q(_VT_CONS, "edge_label, src_label, tgt_label"),
        _vt_q(isa, "child, parent") if isa else None)
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def test_vt_every_rule_fires_once(spark):
    edges = [("g1", "t1", "transcribed_to"),   # valid
             ("t1", "p1", "translates_to"),    # valid
             ("p1", "x1", "member_of"),        # valid
             ("p1", "x1", "member_of"),        # duplicate
             ("t1", "g1", "transcribed_to"),   # src_type + tgt_type
             ("g1", "zz", "transcribed_to"),   # dangling_tgt
             ("zz", "t1", "transcribed_to"),   # dangling_src
             ("g1", "t1", "regulates")]        # unknown label
    got = _vt_spark(spark, edges)
    assert got == _vt_duck(edges)
    assert sorted(r[0] for r in got) == [
        "dangling_src", "dangling_tgt", "duplicate_edge", "src_type",
        "tgt_type", "unknown_edge_label"]


def test_vt_subtype_passes_via_isa_hierarchy(spark):
    edges = [("g2", "t1", "transcribed_to")]  # ncrna is_a gene
    assert _vt_spark(spark, edges) == []
    assert _vt_duck(edges) == []
    # without the hierarchy the same edge is a src_type violation
    got = _vt_spark(spark, edges, isa=[])
    assert [r[0] for r in got] == ["src_type"]
    assert got == _vt_duck(edges, isa=[])


def test_vt_valid_kg_emits_nothing(spark):
    edges = [("g1", "t1", "transcribed_to"),
             ("t1", "p1", "translates_to"),
             ("p1", "x1", "member_of")]
    assert _vt_spark(spark, edges) == []
    assert _vt_duck(edges) == []


# ---------------------------------------------------------------------------
# N-Triples sink (sinks.py): rdf export lines
# ---------------------------------------------------------------------------

import re

from biocypher_metta_spark import sinks


def test_ntriples_escaping_and_shape(spark):
    nodes = spark.createDataFrame(
        [("ENSG1", "Gene", "chr16"),
         ('we"ird id', "Gene", None),
         ("P|1{x}", "Protein", 'tab\there "q" \\ end')],
        "id: string, label: string, chr: string")
    lines = sorted(r["line"] for r in
                   sinks.ntriples_node_lines(nodes, ["chr"]).collect())
    # 3 type lines + 2 non-null property lines
    assert len(lines) == 5
    for l in lines:
        assert l.endswith(" .")
        for iri in re.findall(r"<([^>]*)>", l):
            assert not any(c in iri for c in ' <"{}|\\^`'), iri
    assert ('<http://biocypher.example/gene/ensg1> '
            '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
            '<http://biocypher.example/class/gene> .') in lines
    # ECHAR escapes in the literal line
    lit = [l for l in lines if "prop/chr" in l and "tab" in l][0]
    assert '"tab\\there \\"q\\" \\\\ end"' in lit


def test_ntriples_edge_line(spark):
    edges = spark.createDataFrame(
        [("ENSG1", "ENST9", "Transcribed_To")],
        "src: string, tgt: string, label: string")
    got = sinks.ntriples_edge_lines(edges, "gene", "transcript") \
        .collect()[0]["line"]
    assert got == ('<http://biocypher.example/gene/ensg1> '
                   '<http://biocypher.example/rel/transcribed_to> '
                   '<http://biocypher.example/transcript/enst9> .')


def test_ntriples_write_roundtrip(spark, tmp_path):
    nodes = spark.createDataFrame([("a", "gene", "chr1")],
                                  "id: string, label: string, chr: string")
    lines = sinks.ntriples_node_lines(nodes, ["chr"])
    out = str(tmp_path / "nt")
    sinks.write_ntriples(lines, out)
    back = sorted(r["value"] for r in spark.read.text(out).collect())
    assert back == sorted(r["line"] for r in lines.collect())
