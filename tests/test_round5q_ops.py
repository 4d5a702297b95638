"""Round-5q operators: exact rank statistics (operators/stats.py —
two-sample Kolmogorov-Smirnov and Mann-Whitney U with integral
tie-averaged ranks)."""


import duckdb
import pytest

from biocypher_metta_spark.operators.stats import (
    ks_test,
    ks_test_sql,
    mannwhitney,
    mannwhitney_sql,
)

SCHEMA = "grp long, s string, v long"


def _ks(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["grp"]: (r["n_a"], r["n_b"], r["d_scaled"], r["d_ppm"])
            for r in ks_test(df, ["grp"], "s", "v", "a", "b").collect()}


def _mw(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["grp"]: (r["n_a"], r["n_b"], r["u_a_x2"], r["auc_ppm"])
            for r in mannwhitney(df, ["grp"], "s", "v", "a", "b")
            .collect()}


def _brute_ks(pairs):
    a = sorted(v for s, v in pairs if s == "a")
    b = sorted(v for s, v in pairs if s == "b")
    na, nb = len(a), len(b)
    d = 0
    for v in sorted(set(a + b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = max(d, abs(ca * nb - cb * na))
    ppm = 0 if na == 0 or nb == 0 else d * 1_000_000 // (na * nb)
    return na, nb, d, ppm


def _brute_mw(pairs):
    a = [v for s, v in pairs if s == "a"]
    b = [v for s, v in pairs if s == "b"]
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return na, nb, 0, 0
    # 2*U_a = 2 * sum over (x in a, y in b) of [x>y] + [x==y]*0.5 * 2
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    return na, nb, u2, u2 * 1_000_000 // (2 * na * nb)


def test_ks_identical_and_disjoint(spark):
    rows = ([(1, "a", v) for v in (1, 2, 3)]
            + [(1, "b", v) for v in (1, 2, 3)]     # identical -> D=0
            + [(2, "a", v) for v in (1, 2)]
            + [(2, "b", v) for v in (10, 11)])     # disjoint -> D=1
    got = _ks(spark, rows)
    assert got[1] == (3, 3, 0, 0)
    assert got[2] == (2, 2, 4, 1_000_000)


def test_ks_ties_match_brute_force(spark):
    pairs = [("a", v) for v in (1, 1, 2, 5, 5, 5, 9)] + \
            [("b", v) for v in (1, 2, 2, 5, 7, 9, 9, 9)]
    rows = [(1, s, v) for s, v in pairs]
    assert _ks(spark, rows)[1] == _brute_ks(pairs)


def test_ks_missing_sample_and_label_filter(spark):
    rows = [(1, "a", 5), (1, "a", 7),           # no b sample
            (2, "a", 1), (2, "b", 2), (2, "c", 99),  # c dropped
            (2, "a", None)]                     # null dropped
    got = _ks(spark, rows)
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (1, 1, 1, 1_000_000)


def test_mw_dominance_and_symmetry(spark):
    rows = ([(1, "a", v) for v in (10, 11, 12)]
            + [(1, "b", v) for v in (1, 2, 3)])  # a fully above b
    got = _mw(spark, rows)
    assert got[1] == (3, 3, 18, 1_000_000)      # AUC = 1


def test_mw_ties_match_brute_force(spark):
    pairs = [("a", v) for v in (1, 3, 3, 3, 8)] + \
            [("b", v) for v in (1, 1, 3, 5, 8, 8)]
    rows = [(1, s, v) for s, v in pairs]
    assert _mw(spark, rows)[1] == _brute_mw(pairs)


def test_mw_tie_order_invariance(spark):
    # shuffling the input (hence tie order) never changes the result
    pairs = [("a", 2), ("b", 2), ("a", 2), ("b", 5), ("a", 5)]
    rows = [(1, s, v) for s, v in pairs]
    assert (_mw(spark, rows)[1] == _mw(spark, rows[::-1])[1]
            == _brute_mw(pairs))


def test_rankstats_duckdb_twins_agree(spark):
    import random
    rng = random.Random(7)
    rows = [(i % 4, rng.choice("ab"), rng.randrange(0, 12))
            for i in range(400)]
    df = spark.createDataFrame(rows, SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp BIGINT, s VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    base = "SELECT grp, s, v FROM t"
    for fn, sql_fn, cols in [
        (ks_test, ks_test_sql, ["n_a", "n_b", "d_scaled", "d_ppm"]),
        (mannwhitney, mannwhitney_sql,
         ["n_a", "n_b", "u_a_x2", "auc_ppm"]),
    ]:
        spark_rows = {tuple(r[c] for c in ["grp"] + cols)
                      for r in fn(df, ["grp"], "s", "v", "a", "b")
                      .collect()}
        duck_rows = set(map(tuple, con.execute(
            sql_fn(base, ["grp"], "s", "v", "a", "b")).fetchall()))
        assert spark_rows == duck_rows


def test_rankstats_column_clash_raises(spark):
    df = spark.createDataFrame([(1, "a", 2, 3)],
                               "grp long, s string, v long, n_a long")
    with pytest.raises(ValueError):
        ks_test(df, ["grp"], "s", "v", "a", "b")
    with pytest.raises(ValueError):
        mannwhitney(df, ["grp"], "s", "v", "a", "b")
    with pytest.raises(ValueError):
        ks_test(df.drop("n_a"), [], "s", "v", "a", "b")
