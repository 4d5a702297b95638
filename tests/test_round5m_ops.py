"""Round-5m operators: per-group Gini concentration (operators/
stats.py) and PMI bigram collocations (operators/text.py)."""

import duckdb
import pytest

from biocypher_metta_spark.operators.stats import gini, gini_sql
from biocypher_metta_spark.operators.text import (
    pmi_collocations,
    pmi_collocations_sql,
)


def _gini(spark, rows):
    df = spark.createDataFrame(rows, "g string, v long")
    out = gini(df, ["g"], "v")
    return {r["g"]: (r["n_obs"], r["sum_v"], r["gini_ppm"])
            for r in out.collect()}


def test_gini_known_values(spark):
    # one holder of everything among 4: G = (2*4*10 - 5*10)/(4*10)
    # = 30/40 = 0.75; perfect equality: G = 0; all-zero group: 0 by
    # the den=0 guard, not a crash.
    rows = ([("a", 0)] * 3 + [("a", 10)]
            + [("b", 5), ("b", 5)]
            + [("z", 0), ("z", 0)])
    got = _gini(spark, rows)
    assert got["a"] == (4, 10, 750000)
    assert got["b"] == (2, 10, 0)
    assert got["z"] == (2, 0, 0)


def test_gini_nulls_dropped_and_tie_invariance(spark):
    # NULL values never enter the moments; heavy ties still agree
    # with the hand formula because sum(i*x_i) over a tie block is
    # permutation-invariant.
    df = spark.createDataFrame(
        [("g", 1), ("g", 1), ("g", 1), ("g", None), ("g", 6)],
        "g string, v long")
    r = gini(df, ["g"], "v").collect()[0]
    # sorted 1,1,1,6: T = 1+2+3+24 = 30; num = 60 - 5*9 = 15; den 36
    assert (r["n_obs"], r["sum_v"], r["gini_ppm"]) == (4, 9, 416666)


def test_gini_matches_duckdb_twin(spark):
    rows = [(f"g{i % 3}", (i * 37 + 11) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(tuple(r) for r in gini(df, ["g"], "v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(con.execute(
        gini_sql("SELECT g, v FROM t", ["g"], "v")).fetchall())
    assert got == want


def test_gini_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "g string, n_obs long")
    with pytest.raises(ValueError):
        gini(df, [], "n_obs")
    with pytest.raises(ValueError):
        gini(df, ["g"], "n_obs")


def _pmi_corpus(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string")


def test_pmi_ranks_planted_collocation_first(spark):
    # N = 36 tokens. "new york" is exclusive (c_xy=c_x=c_y=6):
    # 6*36/36 = 6.0 -> 6_000_000 ppm. "the"/"cat" also occur apart
    # (c=9 each): 6*36/81 -> floor(216e6/81) = 2_666_666 ppm. Exact
    # integers, no floats; the exclusive pair ranks first.
    docs = _pmi_corpus(spark, ["new york the cat"] * 6
                       + ["the dog"] * 3 + ["a cat"] * 3)
    out = pmi_collocations(docs, min_count=2, k=10).collect()
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi_ratio_ppm"])
           for r in out}
    assert got[("new", "york")] == (6, 6_000_000)
    assert got[("the", "cat")] == (6, 2_666_666)
    assert (out[0]["w1"], out[0]["w2"]) == ("new", "york")


def test_pmi_min_count_and_short_docs(spark):
    # one-token and empty docs emit no bigrams (the size<2 guard, not
    # a sequence(1,0) descending surprise); rare pairs fall below
    # min_count.
    docs = _pmi_corpus(spark, ["solo", "", "  ", "rare pair",
                               "hot pot", "hot pot", "hot pot"])
    out = pmi_collocations(docs, min_count=3, k=10).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("hot", "pot")]


def test_pmi_matches_duckdb_twin(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(words[(i * 7 + j) % 5] for j in range(20))
             for i in range(40)]
    docs = _pmi_corpus(spark, texts)
    got = sorted(tuple(r) for r in
                 pmi_collocations(docs, min_count=2, k=50).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(str(i), t) for i, t in enumerate(texts)])
    want = sorted(con.execute(
        pmi_collocations_sql("documents", min_count=2, k=50))
        .fetchall())
    assert got == want


from biocypher_metta_spark.operators.stats import (  # noqa: E402
    chisq,
    chisq_sql,
    linreg,
    linreg_sql,
)


def test_linreg_exact_line_and_degenerate(spark):
    # y = 2x + 1 recovers (2_000_000, 1_000_000) exactly; a
    # zero-x-variance group emits NULL slope/intercept; NULL rows
    # are dropped from the moments.
    df = spark.createDataFrame(
        [("a", x, 2 * x + 1) for x in range(5)]
        + [("a", None, 99), ("a", 4, None)]
        + [("c", 3, 7), ("c", 3, 9)],
        "g string, x long, y long")
    got = {r["g"]: (r["n_obs"], r["slope_ppm"], r["intercept_ppm"])
           for r in linreg(df, ["g"], "x", "y").collect()}
    assert got["a"] == (5, 2_000_000, 1_000_000)
    assert got["c"] == (2, None, None)


def test_linreg_matches_duckdb_twin(spark):
    rows = [(f"g{i % 4}", i % 50, (i * 37 + 11) % 1000)
            for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = sorted(tuple(r) for r in linreg(df, ["g"], "x", "y").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(con.execute(
        linreg_sql("SELECT g, x, y FROM t", ["g"], "x", "y"))
        .fetchall())
    assert got == want


def test_chisq_independent_and_diagonal(spark):
    # perfectly independent 2x2 (uniform 25/25/25/25) -> chi2 = 0;
    # a==b always on 2 categories (2 observed + 2 unobserved cells)
    # -> chi2 = N exactly, via the observed-cell identity.
    ind = spark.createDataFrame(
        [("g", i % 2, (i // 2) % 2) for i in range(100)],
        "g string, a long, b long")
    r = chisq(ind, ["g"], "a", "b").collect()[0]
    assert (r["n_obs"], r["n_cells"], r["dof"], r["chi2_ppm"]) \
        == (100, 4, 1, 0)
    diag = spark.createDataFrame(
        [("g", i % 2, i % 2) for i in range(60)],
        "g string, a long, b long")
    r = chisq(diag, ["g"], "a", "b").collect()[0]
    assert (r["n_obs"], r["n_cells"], r["chi2_ppm"]) \
        == (60, 2, 60_000_000)


def test_chisq_matches_duckdb_twin(spark):
    rows = [(f"g{i % 3}", f"a{(i * 7) % 4}", f"b{(i * 11) % 3}")
            for i in range(500)]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = sorted(tuple(r) for r in chisq(df, ["g"], "a", "b").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(con.execute(
        chisq_sql("SELECT g, a, b FROM t", ["g"], "a", "b"))
        .fetchall())
    assert got == want


def test_linreg_chisq_reject_bad_args(spark):
    df = spark.createDataFrame([("a", 1, 2)], "g string, x long, n_obs long")
    with pytest.raises(ValueError):
        linreg(df, [], "x", "n_obs")
    with pytest.raises(ValueError):
        linreg(df, ["g"], "x", "n_obs")
    with pytest.raises(ValueError):
        chisq(df, [], "g", "x")
    with pytest.raises(ValueError):
        chisq(df, ["g"], "x", "n_obs")


from biocypher_metta_spark.operators.graph import (  # noqa: E402
    collab_weight_edges,
    collab_weight_edges_sql,
    four_cycles,
    four_cycles_sql,
)


def test_four_cycles_hand_graphs(spark):
    # single square: every node on 1 cycle; K4: all 3 cycles at each
    # node; triangle: none; K(2,3): left nodes on all C(3,2)=3,
    # right nodes on the 2 cycles using them (total/4 = 3 cycles).
    sq = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)],
                               "src long, dst long")
    assert {r["id"]: r["c4"] for r in four_cycles(sq).collect()} \
        == {1: 1, 2: 1, 3: 1, 4: 1}
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long")
    assert {r["id"]: r["c4"] for r in four_cycles(k4).collect()} \
        == {0: 3, 1: 3, 2: 3, 3: 3}
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                                "src long, dst long")
    assert four_cycles(tri).count() == 0
    k23 = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)],
        "src long, dst long")
    assert {r["id"]: r["c4"] for r in four_cycles(k23).collect()} \
        == {1: 3, 2: 3, 10: 2, 11: 2, 12: 2}


def test_four_cycles_grid_matches_duckdb(spark):
    # 5x5 grid: 16 unit squares are ALL its 4-cycles; corner nodes
    # on 1, border on 2, interior on 4; sum = 64.
    edges = []
    for r in range(5):
        for c in range(5):
            n = r * 5 + c
            if c < 4:
                edges.append((n, n + 1))
            if r < 4:
                edges.append((n, n + 5))
    g = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["c4"] for r in four_cycles(g).collect()}
    assert got[0] == 1 and got[1] == 2 and got[6] == 4
    assert sum(got.values()) == 64
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = dict(con.execute(
        four_cycles_sql("SELECT src, dst FROM e")).fetchall())
    assert got == want


def test_collab_weight_hand_and_twin(spark):
    # doc A{1,2}: term floor(1e6/1) = 1_000_000; doc B{1,2,3}: term
    # floor(1e6/2) = 500_000; singleton doc C emits nothing.
    mem = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 1), ("B", 2), ("B", 3), ("C", 9)],
        "d string, it long")
    got = {(r["item_a"], r["item_b"]): (r["n_docs"], r["w_ppm"])
           for r in collab_weight_edges(mem, "d", "it").collect()}
    assert got == {(1, 2): (2, 1_500_000), (1, 3): (1, 500_000),
                   (2, 3): (1, 500_000)}
    rows = [(f"d{(i * 3) % 40}", (i * 7 + 1) % 25) for i in range(300)]
    df = spark.createDataFrame(rows, "d string, it long")
    got = sorted(tuple(r) for r in
                 collab_weight_edges(df, "d", "it").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE m (d VARCHAR, it BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?)", rows)
    want = sorted(con.execute(collab_weight_edges_sql(
        "SELECT d, it FROM m", "d", "it")).fetchall())
    assert got == want


def test_collab_weight_cap_is_deterministic_subset(spark):
    # capping a 6-item doc at 3: terms become floor(1e6/2) over
    # C(3,2) pairs — the capped SIZE drives the weight, consistent
    # with the pairs actually emitted; rerun gives the same subset.
    mem = spark.createDataFrame([("D", i) for i in range(6)],
                                "d string, it long")
    out1 = sorted(tuple(r) for r in collab_weight_edges(
        mem, "d", "it", max_items_per_doc=3).collect())
    out2 = sorted(tuple(r) for r in collab_weight_edges(
        mem, "d", "it", max_items_per_doc=3).collect())
    assert out1 == out2 and len(out1) == 3
    assert all(w == 500_000 for (_, _, _, w) in out1)
    with pytest.raises(ValueError):
        collab_weight_edges(mem, "d", "it", max_items_per_doc=1)
    with pytest.raises(ValueError):
        collab_weight_edges(mem, "d", "it", min_count=0)


from biocypher_metta_spark.operators.text import (  # noqa: E402
    rake_keyphrases,
    rake_keyphrases_sql,
)


def test_rake_hand_scores(spark):
    # phrases: "deep learning", "deep sea" (of/the are boundaries),
    # "deep learning works". freq/deg: deep 3/7, learning 2/5,
    # sea 1/2, works 1/3 -> word scores 2333333/2500000/2000000/
    # 3000000; phrase scores are their sums of FLOORED terms.
    hand = spark.createDataFrame(
        [("1", "Deep learning of the deep sea"),
         ("2", "deep learning works")],
        "doc_id string, text string")
    out = {r["phrase"]: (r["n_words"], r["n_occ"], r["score_ppm"])
           for r in rake_keyphrases(hand, k=20).collect()}
    assert out == {"deep learning": (2, 1, 4_833_333),
                   "deep sea": (2, 1, 4_333_333),
                   "deep learning works": (3, 1, 7_833_333)}


def test_rake_boundaries_and_max_words(spark):
    # punctuation-bearing and non-alpha tokens are boundaries; runs
    # longer than max_words are dropped, not truncated; all-stopword
    # docs emit nothing.
    docs = spark.createDataFrame(
        [("1", "alpha beta. gamma"), ("2", "the of and to"),
         ("3", "one two three four five"), ("4", "x9 mixed")],
        "doc_id string, text string")
    out = {r["phrase"] for r in rake_keyphrases(docs, k=50).collect()}
    assert "alpha beta." not in out and "gamma" in out
    assert "one two three four five" not in out
    assert "mixed" in out and "x9" not in out


def test_rake_matches_duckdb_twin(spark):
    words = ["spark", "engine", "the", "fast", "query", "of", "plan"]
    texts = [" ".join(words[(i * 5 + j) % 7] for j in range(15))
             for i in range(60)]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string")
    got = sorted(tuple(r) for r in rake_keyphrases(docs, k=80).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(str(i), t) for i, t in enumerate(texts)])
    want = sorted(con.execute(
        rake_keyphrases_sql("documents", k=80)).fetchall())
    assert got == want


from biocypher_metta_spark.operators.stats import (  # noqa: E402
    winsorize,
    winsorize_sql,
)


def test_winsorize_hand_band_and_nulls(spark):
    # 1..100 at p=50: cut = ceil(100*50/1000) = 5, band [x_5, x_96]
    # = [5, 96]; 8 rows clamp (1-4, 97-100); the NULL row passes
    # through unclamped with is_clamped FALSE (not NULL).
    df = spark.createDataFrame(
        [("g", i) for i in range(1, 101)] + [("g", None)],
        "g string, v long")
    out = winsorize(df, ["g"], "v", p_permille=50).collect()
    vals = sorted(r["v"] for r in out if r["v"] is not None)
    assert vals[0] == 5 and vals[-1] == 96
    assert sum(1 for r in out if r["is_clamped"]) == 8
    assert [r for r in out if r["v"] is None][0]["is_clamped"] is False


def test_winsorize_tiny_group_clamps_nothing(spark):
    # n=3 at p=10: cut = ceil(0.03) = 1 -> band [min, max], nothing
    # clamps; a band narrower than 1/n degrades to the identity.
    df = spark.createDataFrame([("g", 1), ("g", 50), ("g", 99)],
                               "g string, v long")
    out = winsorize(df, ["g"], "v", p_permille=10).collect()
    assert sorted(r["v"] for r in out) == [1, 50, 99]
    assert not any(r["is_clamped"] for r in out)


def test_winsorize_matches_duckdb_twin(spark):
    rows = [(f"g{i % 3}", i, (i * 37 + 11) % 10007) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    got = sorted(tuple(r) for r in
                 winsorize(df, ["g"], "v", 25).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, k BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(winsorize_sql(
        "SELECT g, k, v FROM t", ["g"], "v", ["g", "k", "v"], 25))
        .fetchall())
    assert got == want


def test_winsorize_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "g string, is_clamped long")
    with pytest.raises(ValueError):
        winsorize(df, [], "is_clamped")
    with pytest.raises(ValueError):
        winsorize(df, ["g"], "is_clamped")
    df2 = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        winsorize(df2, ["g"], "v", p_permille=0)
    with pytest.raises(ValueError):
        winsorize(df2, ["g"], "v", p_permille=500)


from biocypher_metta_spark.operators.stats import (  # noqa: E402
    decile_lift,
    decile_lift_sql,
)
from biocypher_metta_spark.operators.text import (  # noqa: E402
    ngram_novelty,
    ngram_novelty_sql,
)


def test_decile_lift_hand_and_zero_conv(spark):
    # unique scores 1..100, top 20 convert: buckets 0/1 fully
    # convert (rate 1e6, cum lift 5x base), bucket 2 dilutes the
    # cumulative to 20/30 over base 0.2 -> 3333333.
    df = spark.createDataFrame(
        [(i, 1 if i > 80 else 0) for i in range(1, 101)],
        "s long, y long")
    out = {r["bucket"]: (r["n"], r["conv"], r["rate_ppm"],
                         r["cum_lift_ppm"])
           for r in decile_lift(df, "s", "y").collect()}
    assert out[0] == (10, 10, 1_000_000, 5_000_000)
    assert out[1] == (10, 10, 1_000_000, 5_000_000)
    assert out[2] == (10, 0, 0, 3_333_333)
    assert out[9][1] == 0
    # zero conversions anywhere: lift NULL, not a crash
    z = spark.createDataFrame([(i, 0) for i in range(50)],
                              "s long, y long")
    zo = decile_lift(z, "s", "y").collect()
    assert all(r["cum_lift_ppm"] is None for r in zo)


def test_decile_lift_tie_block_stays_whole(spark):
    # 90 rows score=5 and 10 rows score=9: the tie block lands
    # WHOLLY in the bucket of its first element (value-tied
    # semantics) — buckets are {1: the 10 nines}, {1..9 would have
    # split under ntile}: here (cum_before=10)*10 div 100 = 1.
    df = spark.createDataFrame(
        [(9, 1)] * 10 + [(5, 0)] * 90, "s long, y long")
    out = {r["bucket"]: (r["n"], r["conv"])
           for r in decile_lift(df, "s", "y").collect()}
    assert out == {0: (10, 10), 1: (90, 0)}


def test_decile_lift_matches_duckdb_twin(spark):
    rows = [((i * 37) % 97, 1 if (i * 11) % 5 == 0 else 0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "s long, y long")
    got = sorted(tuple(r) for r in decile_lift(df, "s", "y").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(con.execute(
        decile_lift_sql("SELECT s, y FROM t", "s", "y")).fetchall())
    assert got == want


def test_ngram_novelty_hand_cases(spark):
    # doc1's single 5-gram is shared with doc2; doc2's second gram
    # is unique; doc3 fully novel; doc4 too short (0 grams, NULL);
    # a gram repeated WITHIN one doc only is not shared.
    docs = spark.createDataFrame(
        [("1", "a b c d e"), ("2", "a b c d e f"),
         ("3", "one two three four five six"), ("4", "tiny doc"),
         ("5", "x y z w x y z w x y z w")],
        "doc_id string, text string")
    out = {r["doc_id"]: (r["n_grams"], r["n_shared"],
                         r["novelty_ppm"])
           for r in ngram_novelty(docs).collect()}
    assert out["1"] == (1, 1, 0)
    assert out["2"] == (2, 1, 500_000)
    assert out["3"] == (2, 0, 1_000_000)
    assert out["4"] == (0, 0, None)
    assert out["5"] == (8, 0, 1_000_000)  # self-repeats not shared


def test_ngram_novelty_matches_duckdb_twin(spark):
    words = ["red", "blue", "green", "gold", "gray", "pink"]
    texts = [" ".join(words[(i * 5 + j) % 6] for j in range(12))
             for i in range(40)] + ["one two"]
    docs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string")
    got = sorted(tuple(r) for r in ngram_novelty(docs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(str(i), t) for i, t in enumerate(texts)])
    want = sorted(con.execute(ngram_novelty_sql()).fetchall())
    assert got == want
