"""Round-5n operator: exact heavy hitters via per-partition
Misra-Gries candidates + exact rescan (operators/sketch.py)."""

import duckdb
import pytest

from biocypher_metta_spark.operators.sketch import (
    heavy_hitters,
    heavy_hitters_sql,
)


def _rows(n_a, n_b, n_c, n_tail):
    # a/b/c are the designed heavies; the tail is n_tail singletons
    rows = ([("a",)] * n_a + [("b",)] * n_b + [("c",)] * n_c
            + [(f"t{i}",) for i in range(n_tail)])
    return rows


def test_heavy_hitters_exact_counts(spark):
    # 100 rows: a=40, b=25, c=5, 30 singletons. At 200 permille the
    # threshold is 20 -> exactly {a, b} with their EXACT counts.
    df = spark.createDataFrame(_rows(40, 25, 5, 30), "v string")
    out = {r["value"]: r["cnt"]
           for r in heavy_hitters(df, "v", min_freq_permille=200,
                                  capacity=16).collect()}
    assert out == {"a": 40, "b": 25}


def test_heavy_hitters_partitioning_invariant(spark):
    # MG internals depend on row order per partition; the rescan must
    # erase that — identical output at 1 and 7 partitions.
    base = spark.createDataFrame(_rows(40, 25, 5, 30), "v string")
    a = {(r["value"], r["cnt"])
         for r in heavy_hitters(base.repartition(1), "v", 200,
                                capacity=16).collect()}
    b = {(r["value"], r["cnt"])
         for r in heavy_hitters(base.repartition(7), "v", 200,
                                capacity=16).collect()}
    assert a == b == {("a", 40), ("b", 25)}


def test_heavy_hitters_guarantee_guard(spark):
    # threshold <= N/(capacity+1) voids the MG superset guarantee and
    # must raise, not silently return a maybe-incomplete set:
    # N=100, permille=10 -> threshold 1; capacity 16 -> N/17 = 5.9.
    df = spark.createDataFrame(_rows(40, 25, 5, 30), "v string")
    with pytest.raises(ValueError, match="guarantee void"):
        heavy_hitters(df, "v", min_freq_permille=10, capacity=16)


def test_heavy_hitters_nulls_and_empty(spark):
    # NULLs never count toward N or the candidates; an all-NULL input
    # yields an empty result, not a divide-by-zero.
    df = spark.createDataFrame([(None,), (None,)], "v string")
    assert heavy_hitters(df, "v", 200, capacity=4).count() == 0
    df2 = spark.createDataFrame(
        [("x",), (None,), ("x",), ("y",)], "v string")
    out = {r["value"]: r["cnt"]
           for r in heavy_hitters(df2, "v", 500, capacity=4).collect()}
    # N=3 (nulls dropped), threshold ceil(1.5)=2 -> only x
    assert out == {"x": 2}


def test_heavy_hitters_sql_twin_matches(spark, tmp_path):
    rows = _rows(40, 25, 12, 23)
    df = spark.createDataFrame(rows, "v string")
    got = {(r["value"], r["cnt"])
           for r in heavy_hitters(df, "v", min_freq_permille=100,
                                  capacity=16).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE src (v VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?)", rows)
    sql = heavy_hitters_sql("SELECT v FROM src", col="v",
                            min_freq_permille=100)
    want = {(v, c) for v, c in con.execute(sql).fetchall()}
    assert got == want
    assert ("a", 40) in got and ("c", 12) in got
