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
