"""Round-5r operators: k-anonymity/l-diversity audit
(operators/privacy.py), Cohen's kappa (operators/stats.py), and the
nearest-centroid Rocchio text classifier (operators/classify.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.classify import (
    rocchio_centroids,
    rocchio_classify,
    rocchio_sql,
)
from biocypher_metta_spark.operators.privacy import (
    k_anonymity,
    k_anonymity_sql,
)
from biocypher_metta_spark.operators.stats import (
    cohens_kappa,
    cohens_kappa_sql,
)

# ---------------------------------------------------------------- privacy

KA_SCHEMA = "zip string, yr long, diag string"


def _ka(spark, rows, k_min, l_min):
    df = spark.createDataFrame(rows, KA_SCHEMA)
    return {(r["zip"], r["yr"]):
            (r["k_size"], r["l_distinct"],
             r["k_violation"], r["l_violation"])
            for r in k_anonymity(df, ["zip", "yr"], "diag",
                                 k_min, l_min).collect()}


def test_k_anonymity_hand_truth(spark):
    rows = (
        # class (a, 1): k=3, l=2 -> clean at k_min=3/l_min=2
        [("a", 1, "flu"), ("a", 1, "flu"), ("a", 1, "cold")]
        # class (b, 1): k=2 -> k violation
        + [("b", 1, "flu"), ("b", 1, "cold")]
        # class (c, 1): k=4 but single diagnosis -> l violation
        + [("c", 1, "flu")] * 4
        # class (d, 1): k=1 and l=1 -> both violations
        + [("d", 1, "cold")]
        # class (e, 1): NULL sensitive values don't count toward l
        + [("e", 1, "flu"), ("e", 1, None), ("e", 1, None)]
    )
    out = _ka(spark, rows, k_min=3, l_min=2)
    assert ("a", 1) not in out
    assert out[("b", 1)] == (2, 2, 1, 0)
    assert out[("c", 1)] == (4, 1, 0, 1)
    assert out[("d", 1)] == (1, 1, 1, 1)
    assert out[("e", 1)] == (3, 1, 0, 1)


def test_k_anonymity_clean_table_empty(spark):
    rows = [("a", 1, d) for d in ("x", "y", "z")] * 2
    assert _ka(spark, rows, k_min=3, l_min=2) == {}


def test_k_anonymity_validation(spark):
    df = spark.createDataFrame([("a", 1, "x", 9)],
                               "zip string, yr long, diag string, "
                               "k_size long")
    with pytest.raises(ValueError):
        k_anonymity(df, ["zip"], "diag", 2, 2)
    with pytest.raises(ValueError):
        k_anonymity(df.drop("k_size"), [], "diag", 2, 2)
    with pytest.raises(ValueError):
        k_anonymity(df.drop("k_size"), ["zip", "diag"], "diag", 2, 2)


def test_k_anonymity_duckdb_twin_agrees(spark):
    rng = random.Random(11)
    rows = [(f"z{rng.randrange(6)}", rng.randrange(2),
             rng.choice(["flu", "cold", None]))
            for _ in range(300)]
    df = spark.createDataFrame(rows, KA_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (zip VARCHAR, yr BIGINT, diag VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    spark_rows = {tuple(r) for r in
                  k_anonymity(df, ["zip", "yr"], "diag", 30, 2)
                  .select("zip", "yr", "k_size", "l_distinct",
                          "k_violation", "l_violation").collect()}
    duck_rows = set(map(tuple, con.execute(k_anonymity_sql(
        "SELECT zip, yr, diag FROM t", ["zip", "yr"], "diag",
        30, 2)).fetchall()))
    assert spark_rows == duck_rows and spark_rows


# ------------------------------------------------------------------ kappa

CK_SCHEMA = "grp long, a string, b string"


def _kappa(spark, rows):
    df = spark.createDataFrame(rows, CK_SCHEMA)
    return {r["grp"]: (r["n_obs"], r["n_agree"], r["kappa_ppm"])
            for r in cohens_kappa(df, ["grp"], "a", "b").collect()}


def _brute_kappa(pairs):
    pairs = [(a, b) for a, b in pairs if a is not None and b is not None]
    n = len(pairs)
    d = sum(1 for a, b in pairs if a == b)
    cats = {c for p in pairs for c in p}
    s = sum(sum(1 for a, _ in pairs if a == c)
            * sum(1 for _, b in pairs if b == c) for c in cats)
    num, den = 1_000_000 * (n * d - s), n * n - s
    if den == 0:
        return n, d, 1_000_000 if d == n else 0
    return n, d, num // den  # python // is the floor pmod emulates


def test_kappa_hand_truth(spark):
    rows = (
        # grp 1: perfect agreement -> kappa = 1e6
        [(1, "x", "x"), (1, "y", "y"), (1, "x", "x")]
        # grp 2: a 2x2 table — po=0.70, pe=0.52, kappa=0.18/0.48=0.375
        + [(2, "y", "y")] * 25 + [(2, "y", "n")] * 15
        + [(2, "n", "y")] * 15 + [(2, "n", "n")] * 45
        # grp 3: degenerate — both raters constant and equal (pe=1)
        + [(3, "x", "x")] * 4
        # grp 4: NULLs dropped before counting
        + [(4, "x", "x"), (4, None, "x"), (4, "x", None)]
    )
    out = _kappa(spark, rows)
    assert out[1] == (3, 3, 1_000_000)
    assert out[2] == (100, 70, 375_000)
    assert out[3] == (4, 4, 1_000_000)
    assert out[4] == (1, 1, 1_000_000)


def test_kappa_worse_than_chance_floor(spark):
    # total disagreement on a symmetric 2x2 -> kappa = -1 exactly
    rows = [(1, "x", "y")] * 5 + [(1, "y", "x")] * 5
    assert _kappa(spark, rows)[1] == (10, 0, -1_000_000)


def test_kappa_matches_brute_force(spark):
    rng = random.Random(5)
    cats = ["p", "q", "r", None]
    rows = [(i % 3, rng.choice(cats), rng.choice(cats))
            for i in range(600)]
    out = _kappa(spark, rows)
    for g in (0, 1, 2):
        assert out[g] == _brute_kappa(
            [(a, b) for gg, a, b in rows if gg == g])


def test_kappa_duckdb_twin_agrees(spark):
    rng = random.Random(17)
    rows = [(i % 4, rng.choice("pqr"), rng.choice("pqrs"))
            for i in range(500)]
    df = spark.createDataFrame(rows, CK_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    spark_rows = {tuple(r) for r in cohens_kappa(df, ["grp"], "a", "b")
                  .select("grp", "n_obs", "n_agree", "kappa_ppm")
                  .collect()}
    duck_rows = set(map(tuple, con.execute(cohens_kappa_sql(
        "SELECT grp, a, b FROM t", ["grp"], "a", "b")).fetchall()))
    assert spark_rows == duck_rows and spark_rows


def test_kappa_column_clash_raises(spark):
    df = spark.createDataFrame([(1, "x", "y", 0)],
                               "grp long, a string, b string, "
                               "kappa_ppm long")
    with pytest.raises(ValueError):
        cohens_kappa(df, ["grp"], "a", "b")


# ---------------------------------------------------------------- rocchio

TRAIN_SCHEMA = "text string, label string"
TEST_SCHEMA = "doc_id long, text string"


def _classify(spark, train_rows, test_rows):
    model = rocchio_centroids(
        spark.createDataFrame(train_rows, TRAIN_SCHEMA))
    out = rocchio_classify(
        model, spark.createDataFrame(test_rows, TEST_SCHEMA))
    return {r["doc_id"]: (r["pred_label"], r["score_ppb"])
            for r in out.collect()}


TRAIN = [
    ("cat cat dog", "pets"),
    ("cat fish", "pets"),
    ("stock bond stock", "finance"),
    ("bond yield", "finance"),
]


def test_rocchio_hand_truth(spark):
    out = _classify(spark, TRAIN, [
        (1, "cat cat"),        # pets: tf 2 * cnt 3 = 6 of total 5
        (2, "bond bond bond"),  # finance: 3 * 2 = 6 of total 5
        (3, "dog yield"),       # 1/5 each side -> tie -> 'finance'<'pets'
        (4, "quantum"),         # no vocabulary overlap -> absent
    ])
    assert out[1] == ("pets", 6 * 1_000_000_000 // 5)
    assert out[2] == ("finance", 6 * 1_000_000_000 // 5)
    assert out[3] == ("finance", 1 * 1_000_000_000 // 5)
    assert 4 not in out


def test_rocchio_class_size_normalizer(spark):
    # 'big' has 10x the tokens; raw dot product would always pick it
    train = [("a " * 10 + "b " * 10, "big"), ("a b", "small")]
    out = _classify(spark, [(t.strip(), l) for t, l in train],
                    [(1, "a b")])
    # big: (10+10)/20 = 1e9; small: (1+1)/2 = 1e9 -> tie -> 'big'<'small'
    assert out[1] == ("big", 1_000_000_000)


def test_rocchio_separates_synthetic_langs(spark):
    rng = random.Random(3)
    vocab = {"aa": ["der", "und", "ist", "das"],
             "bb": ["the", "and", "is", "that"]}
    train = [(" ".join(rng.choice(vocab[l]) for _ in range(12)), l)
             for l in vocab for _ in range(20)]
    test = [(i, " ".join(rng.choice(vocab["aa" if i % 2 else "bb"])
                         for _ in range(8)))
            for i in range(40)]
    out = _classify(spark, train, test)
    acc = sum(out[i][0] == ("aa" if i % 2 else "bb")
              for i in range(40))
    assert acc == 40  # disjoint vocabularies -> perfect routing


def test_rocchio_duckdb_twin_agrees(spark):
    rng = random.Random(23)
    words = ["cat", "dog", "fish", "stock", "bond", "yield", "tax"]
    train_rows = [(" ".join(rng.choice(words) for _ in range(9)),
                   rng.choice(["u", "v", "w"])) for _ in range(60)]
    test_rows = [(i, " ".join(rng.choice(words) for _ in range(6)))
                 for i in range(30)]
    out = _classify(spark, train_rows, test_rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE tr (text VARCHAR, label VARCHAR)")
    con.execute("CREATE TABLE te (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?)", train_rows)
    con.executemany("INSERT INTO te VALUES (?, ?)", test_rows)
    duck = {r[0]: (r[1], r[2]) for r in con.execute(rocchio_sql(
        "SELECT text, label FROM tr",
        "SELECT doc_id, text FROM te")).fetchall()}
    assert out == duck and len(out) == 30
