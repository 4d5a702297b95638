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


# ------------------------------------------------- random projection

from biocypher_metta_spark.operators.similarity import (  # noqa: E402
    projection_coefficients,
    random_projection,
    random_projection_sql,
)

_VEC = "vec_id: long, embedding: array<float>"


def test_projection_hand_and_twin(spark):
    rng = random.Random(3)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(10)])
            for i in range(30)]
    df = spark.createDataFrame(rows, _VEC)
    got = sorted(tuple(r) for r in
                 random_projection(df, dim=10, out_dim=4).collect())
    vals = ", ".join(
        f"({i}, ARRAY[{', '.join(repr(float(x)) for x in v)}]::FLOAT[])"
        for i, v in rows)
    sql = random_projection_sql(
        f"SELECT * FROM (VALUES {vals}) t(vec_id, embedding)",
        dim=10, out_dim=4)
    assert got == sorted(tuple(r) for r in
                         duckdb.connect().execute(sql).fetchall())
    # hand-fold row 0 through the shared coefficient matrix
    co = projection_coefficients(10, 4)
    i, v = rows[0]
    q = [round(float(x) * 1000) for x in v]
    assert got[0] == tuple(
        [i] + [sum(c * q[x] for x, c in enumerate(row)) for row in co])


def test_projection_linearity_and_prefix(spark):
    # exact-integer linearity on exactly-representable values, and
    # prefix semantics for vectors longer than dim
    co = projection_coefficients(6, 3)
    df = spark.createDataFrame(
        [(1, [0.5] * 6), (2, [1.0] * 6), (3, [0.25] * 8)], _VEC)
    got = {r["vec_id"]: tuple(r)[1:] for r in
           random_projection(df, dim=6, out_dim=3).collect()}
    assert got[1] == tuple(sum(c * 500 for c in row) for row in co)
    assert got[2] == tuple(2 * x for x in got[1])
    assert got[3] == tuple(sum(c * 250 for c in row) for row in co)


def test_projection_sparsity_is_achlioptas(spark):
    # ~1/3 of entries nonzero, both signs present, deterministic
    co = projection_coefficients(300, 4)
    flat = [c for row in co for c in row]
    nz = sum(1 for c in flat if c)
    assert 0.25 < nz / len(flat) < 0.42
    assert {1, -1} <= set(flat)
    assert co == projection_coefficients(300, 4)
    assert co != projection_coefficients(300, 4, seed=11)


def test_projection_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, None)], _VEC)
    with pytest.raises(Exception, match="NULL or"):
        random_projection(df, dim=2, out_dim=2).collect()
    with pytest.raises(ValueError, match=">= 1"):
        projection_coefficients(0, 3)
    with pytest.raises(ValueError, match=">= 1"):
        random_projection_sql("SELECT 1", dim=4, out_dim=0)


# ------------------------------------------------------------ IVF-PQ

from biocypher_metta_spark.operators.pq import (  # noqa: E402
    ivfpq_topk,
    ivfpq_topk_sql,
    pq_topk,
)


def _ivfpq_duck(rows, query, **kw):
    vals = ", ".join(
        f"({i}, ARRAY[{', '.join(repr(float(x)) for x in v)}]::FLOAT[])"
        for i, v in rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"(VALUES {vals}) t(vec_id, embedding)")
    return [tuple(r) for r in
            con.execute(ivfpq_topk_sql(query, **kw)).fetchall()]


def test_ivfpq_randomized_twin(spark):
    rng = random.Random(41)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(80)]
    df = spark.createDataFrame(rows, _VEC)
    q = [round(rng.uniform(-1, 1), 3) for _ in range(8)]
    for n_cells, n_probe, m, k in [(4, 2, 2, 3), (6, 3, 4, 2)]:
        got = [tuple(r) for r in ivfpq_topk(
            df, q, n_cells=n_cells, m=m, k=k, dim=8, topk=12,
            n_probe=n_probe).collect()]
        exp = _ivfpq_duck(rows, q, n_cells=n_cells, m=m, k=k, dim=8,
                          topk=12, n_probe=n_probe)
        assert got == exp, (n_cells, n_probe, m, k)


def test_ivfpq_probe_all_equals_plain_pq(spark):
    rng = random.Random(43)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(50)]
    df = spark.createDataFrame(rows, _VEC)
    q = [round(rng.uniform(-1, 1), 3) for _ in range(8)]
    full = [tuple(r) for r in ivfpq_topk(
        df, q, n_cells=5, m=2, k=3, dim=8, topk=10,
        n_probe=5).collect()]
    plain = [tuple(r) for r in pq_topk(
        df, q, m=2, k=3, dim=8, topk=10).collect()]
    assert full == plain


def test_ivfpq_pruning_is_real(spark):
    # two far-apart blobs; probing 1 of 2 cells must exclude the far
    # blob entirely even though plain PQ would rank some of it
    near = [(i, [0.1 * (i % 3), 0.1]) for i in range(10)]
    far = [(100 + i, [50.0 + 0.1 * (i % 3), 50.0]) for i in range(10)]
    df = spark.createDataFrame(near + far, _VEC)
    got = [r[0] for r in ivfpq_topk(
        df, [0.0, 0.0], n_cells=2, m=2, k=2, dim=2, topk=20,
        n_probe=1, coarse_iterations=3).collect()]
    assert got and all(i < 100 for i in got)
    assert got == [r[0] for r in _ivfpq_duck(
        near + far, [0.0, 0.0], n_cells=2, m=2, k=2, dim=2, topk=20,
        n_probe=1, coarse_iterations=3)]


def test_ivfpq_validation(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], _VEC)
    with pytest.raises(ValueError, match="n_probe"):
        ivfpq_topk(df, [0.0, 0.0], n_cells=2, m=2, k=2, dim=2,
                   topk=5, n_probe=3)
    with pytest.raises(ValueError, match="n_probe"):
        ivfpq_topk_sql([0.0, 0.0], n_cells=2, m=2, k=2, dim=2,
                       topk=5, n_probe=0)
    with pytest.raises(ValueError, match="coords"):
        ivfpq_topk_sql([0.0], n_cells=2, m=2, k=2, dim=2, topk=5)
