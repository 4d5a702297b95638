"""Round-5p operator: planar proximity join (operators/spatial.py —
grid-cell blocked radius join, canonical-cell emission)."""

import duckdb
import pytest

from biocypher_metta_spark.operators.spatial import (
    proximity_join,
    proximity_join_sql,
)


def _run(spark, pts, r):
    df = spark.createDataFrame(pts, "id long, x long, y long")
    return {(row["id_a"], row["id_b"], row["dist_sq"])
            for row in proximity_join(df, r).collect()}


def _brute(pts, r):
    out = set()
    for i, xi, yi in pts:
        for j, xj, yj in pts:
            d = (xi - xj) ** 2 + (yi - yj) ** 2
            if i < j and d <= r * r:
                out.add((i, j, d))
    return out


def test_proximity_hand_cases(spark):
    pts = [(1, 0, 0), (2, 3, 4), (3, 100, 100), (4, 0, 5)]
    got = _run(spark, pts, 5)
    # 1-2 at d^2=25 (boundary inclusive), 1-4 at 25, 2-4 at 10
    assert got == {(1, 2, 25), (1, 4, 25), (2, 4, 10)}


def test_proximity_cell_boundaries_and_negatives(spark):
    # points straddling cell boundaries and the origin: the 3x3
    # neighborhood + floor-toward-minus-inf cells must still pair them
    pts = [(1, -1, -1), (2, 0, 0), (3, 14, 0), (4, 15, 0), (5, 16, 0)]
    got = _run(spark, pts, 15)
    assert got == _brute(pts, 15)
    assert (3, 4, 1) in got and (1, 2, 2) in got


def test_proximity_each_pair_once(spark):
    # a dense clique inside one cell: every pair exactly once, no
    # duplicate rows from the 9x expansion
    pts = [(i, i, 0) for i in range(10)]
    rows = proximity_join(
        spark.createDataFrame(pts, "id long, x long, y long"),
        100).collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows}) == 45


def test_proximity_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, None, 0), (None, 1, 1), (3, 1, 1)],
        "id long, x long, y long")
    got = {(r["id_a"], r["id_b"]) for r in proximity_join(df, 5).collect()}
    assert got == {(1, 3)}
    with pytest.raises(ValueError, match="r must"):
        proximity_join(df, 0)


def test_proximity_randomized_twin(spark):
    pts = [(i, (i * 37 + 5) % 200 - 100, (i * 91 + 3) % 200 - 100)
           for i in range(250)]
    got = _run(spark, pts, 12)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (id BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", pts)
    want = {tuple(t) for t in con.execute(
        proximity_join_sql("SELECT id, x, y FROM pts", 12)).fetchall()}
    assert got == want == _brute(pts, 12)
    assert len(got) > 50
