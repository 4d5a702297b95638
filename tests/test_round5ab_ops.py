"""Round-5ab operators: ontology annotation up-propagation (true-path
rule) and Resnik MICA similarity (operators/ontology_sim) against
brute-force set math and the composed DuckDB twins."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.ontology_sim import (
    annotation_uppropagate,
    annotation_uppropagate_sql,
    resnik_mica,
    resnik_mica_sql,
)

ANN_SCHEMA = "item string, term string"
CLO_SCHEMA = "cls string, ancestor string"
PAIR_SCHEMA = "t1 string, t2 string"

# a small DAG (diamond + chain):  e -> c -> a, e -> d -> a, c -> b
#  closure rows are the TRANSITIVE closure (as transitive_closure emits)
EDGES = {"e": {"c", "d"}, "c": {"a", "b"}, "d": {"a"}}


def _closure_rows():
    anc = {}

    def walk(t):
        if t in anc:
            return anc[t]
        out = set()
        for p in EDGES.get(t, ()):
            out |= {p} | walk(p)
        anc[t] = out
        return out

    return [(t, a) for t in set(EDGES) | {x for v in EDGES.values()
                                          for x in v}
            for a in walk(t)]


def _brute_up(ann):
    clo = {}
    for c, a in _closure_rows():
        clo.setdefault(c, set()).add(a)
    out = set()
    for item, term in ann:
        out.add((item, term))
        for a in clo.get(term, ()):
            out.add((item, a))
    return out


def _brute_mica(pairs, ann):
    up = _brute_up(ann)
    counts = {}
    for _, t in up:
        counts[t] = counts.get(t, 0) + 1
    clo = {}
    for c, a in _closure_rows():
        clo.setdefault(c, set()).add(a)
    terms = set(clo) | {a for v in clo.values() for a in v}
    out = {}
    for t1, t2 in pairs:
        if t1 not in terms or t2 not in terms:
            continue
        common = (clo.get(t1, set()) | {t1}) & (clo.get(t2, set()) | {t2})
        scored = [(counts[c], c) for c in common if c in counts]
        if scored:
            n, mica = min(scored)
            out[(t1, t2)] = (mica, n)
    return out


def test_uppropagate_true_path(spark):
    ann = [("g1", "e"), ("g2", "c"), ("g3", "a")]
    df = annotation_uppropagate(
        spark.createDataFrame(ann, ANN_SCHEMA),
        spark.createDataFrame(_closure_rows(), CLO_SCHEMA))
    got = {(r["item"], r["term"]) for r in df.collect()}
    assert got == _brute_up(ann)
    assert ("g1", "a") in got and ("g1", "b") in got   # via e->c->{a,b}
    assert ("g3", "b") not in got                      # a has no parents


def test_uppropagate_nulls_and_dupes(spark):
    ann = [("g1", "e"), ("g1", "e"), (None, "c"), ("g2", None)]
    df = annotation_uppropagate(
        spark.createDataFrame(ann, ANN_SCHEMA),
        spark.createDataFrame(_closure_rows(), CLO_SCHEMA))
    got = {(r["item"], r["term"]) for r in df.collect()}
    assert got == _brute_up([("g1", "e")])


def test_mica_diamond(spark):
    # c and d share ancestor a only; e under both -> MICA logic
    ann = [("g1", "c"), ("g2", "d"), ("g3", "e"), ("g4", "b")]
    pairs = [("c", "d"), ("c", "b"), ("b", "d"), ("e", "e")]
    df = resnik_mica(
        spark.createDataFrame(pairs, PAIR_SCHEMA),
        spark.createDataFrame(ann, ANN_SCHEMA),
        spark.createDataFrame(_closure_rows(), CLO_SCHEMA))
    got = {(r["t1"], r["t2"]): (r["mica"], r["n_ann"])
           for r in df.collect()}
    assert got == _brute_mica(pairs, ann)
    # c-d: the only common ancestor is a (annotated by everyone)
    assert got[("c", "d")][0] == "a"
    # b is a ROOT (no parents): b-d share nothing -> absent
    assert ("b", "d") not in got
    # e-e: MICA of a term with itself is the rarest of its own chain
    assert got[("e", "e")] == ("e", 1)


def test_mica_randomized_vs_brute_and_twin(spark):
    rng = random.Random(7)
    items = [f"g{i}" for i in range(25)]
    terms = list("abcde")
    ann = [(rng.choice(items), rng.choice(terms)) for _ in range(60)]
    pairs = [(rng.choice(terms), rng.choice(terms)) for _ in range(15)]
    got_df = resnik_mica(
        spark.createDataFrame(pairs, PAIR_SCHEMA),
        spark.createDataFrame(ann, ANN_SCHEMA),
        spark.createDataFrame(_closure_rows(), CLO_SCHEMA))
    got = {(r["t1"], r["t2"]): (r["mica"], r["n_ann"])
           for r in got_df.collect()}
    assert got == _brute_mica(set(pairs), set(ann) and ann)

    con = duckdb.connect()
    con.execute("CREATE TABLE ann (item VARCHAR, term VARCHAR)")
    con.executemany("INSERT INTO ann VALUES (?, ?)", ann)
    con.execute("CREATE TABLE clo (cls VARCHAR, ancestor VARCHAR)")
    con.executemany("INSERT INTO clo VALUES (?, ?)", _closure_rows())
    con.execute("CREATE TABLE p (t1 VARCHAR, t2 VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    duck_up = set(map(tuple, con.execute(annotation_uppropagate_sql(
        "SELECT item, term FROM ann",
        "SELECT cls, ancestor FROM clo")).fetchall()))
    spark_up = {(r["item"], r["term"]) for r in annotation_uppropagate(
        spark.createDataFrame(ann, ANN_SCHEMA),
        spark.createDataFrame(_closure_rows(), CLO_SCHEMA)).collect()}
    assert duck_up == spark_up
    duck_mica = {(a, b): (m, n) for a, b, m, n in con.execute(
        resnik_mica_sql("SELECT t1, t2 FROM p",
                        "SELECT item, term FROM ann",
                        "SELECT cls, ancestor FROM clo")).fetchall()}
    assert duck_mica == got
