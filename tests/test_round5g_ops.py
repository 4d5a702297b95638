"""Round-5g operators: strongly connected components
(canonicalize.strongly_connected) — SCC labels via mutual
reachability over the path-doubled closure, the KG cycle detector."""

import random

import duckdb
import pytest

from biocypher_metta_spark.canonicalize import (
    strongly_connected,
    strongly_connected_sql,
)


def _duck(edges):
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    sql = strongly_connected_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)")
    return sorted(tuple(r) for r in duckdb.connect().execute(sql)
                  .fetchall())


def _spark(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return sorted(tuple(r) for r in strongly_connected(df).collect())


def test_scc_hand_case(spark):
    # cycle 1->2->3->1 labels to its min 1; tail 4 and chain 5->6 are
    # trivial (self-labeled)
    e = [(1, 2), (2, 3), (3, 1), (4, 1), (5, 6)]
    got = _spark(spark, e)
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 6)]
    assert got == _duck(e)


def test_scc_interlocking_cycles_merge(spark):
    # 10<->11 and 11<->12 are ONE SCC {10,11,12} (mutual through 11)
    e = [(10, 11), (11, 10), (11, 12), (12, 11)]
    got = _spark(spark, e)
    assert got == [(10, 10), (11, 10), (12, 10)]
    assert got == _duck(e)


def test_scc_self_loop_is_trivial(spark):
    # a self-loop adds no mutual PAIR (closure drops s=d): the node
    # self-labels, same as the twin
    e = [(7, 7), (7, 8)]
    got = _spark(spark, e)
    assert got == [(7, 7), (8, 8)]
    assert got == _duck(e)


def test_scc_randomized_twin(spark):
    rng = random.Random(23)
    for trial in range(3):
        n = rng.randint(5, 25)
        e = sorted({(rng.randint(0, n), rng.randint(0, n))
                    for _ in range(rng.randint(5, 40))})
        got = _spark(spark, e)
        assert got == _duck(e), (trial, e)


def test_scc_planted_blocks(spark):
    # the kg_scc gate shape: blocks of 6 forming cycles + tails — every
    # cycle node labels to its block minimum, every tail to itself
    edges = []
    for c in range(24):
        edges.append((c, (c - c % 6) + (c % 6 + 1) % 6))
    for t in range(24, 36):
        edges.append((t, t - 24))
    got = dict(_spark(spark, edges))
    for c in range(24):
        assert got[c] == c - c % 6
    for t in range(24, 36):
        assert got[t] == t


def test_scc_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(9)] + [(9, 0)],
                               "src: long, dst: long")
    with pytest.raises(RuntimeError, match="fixed point"):
        strongly_connected(df, max_iter=2)
