"""Round-5f operators: product quantization (operators/pq.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_topk,
    pq_topk_sql,
    pq_train,
)

_EMB_SCHEMA = "vec_id: long, embedding: array<float>"


def _duck(rows, query, m, k, dim, topk, iterations):
    vals = ", ".join(
        f"({rid}, ARRAY[{', '.join(repr(float(x)) for x in vec)}]"
        f"::FLOAT[])" for rid, vec in rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"(VALUES {vals}) t(vec_id, embedding)")
    sql = pq_topk_sql(query, m=m, k=k, dim=dim, topk=topk,
                      iterations=iterations)
    return [tuple(r) for r in con.execute(sql).fetchall()]


def _spark_run(spark, rows, query, m, k, dim, topk, iterations):
    df = spark.createDataFrame(rows, _EMB_SCHEMA)
    return [tuple(r) for r in pq_topk(
        df, query, m=m, k=k, dim=dim, topk=topk,
        iterations=iterations).collect()]


def test_pq_hand_case(spark):
    # m=2 subspaces of 1 coord, k=2, 1 round. Seeds = rows 0, 1 =
    # (0, 0) and (1000, 1000) quantized; both subspaces split the
    # values {0, 10} | {990, 1000}.
    rows = [(0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.1, 9.9]),
            (3, [9.9, 0.1]),
            (4, [10.0, 0.0])]
    df = spark.createDataFrame(rows, _EMB_SCHEMA)
    books = pq_train(df, m=2, k=2, dim=2, iterations=1)
    # sub 0 values [0,1000,10,990,1000]: c0={0,10} -> floor(10/2)=5,
    # c1={1000,990,1000} -> floor(2990/3)=996
    assert books[0] == [[5], [996]]
    # sub 1 values [0,1000,990,10,0]: c0={0,10,0} -> floor(10/3)=3,
    # c1={1000,990} -> floor(1990/2)=995
    assert books[1] == [[3], [995]]
    codes = {r["vec_id"]: list(r["codes"])
             for r in pq_encode(df, books, dim=2).collect()}
    assert codes == {0: [0, 0], 1: [1, 1], 2: [0, 1],
                     3: [1, 0], 4: [1, 0]}
    # query (0, 0): LUT0 = [25, 992016], LUT1 = [9, 990025]
    top = pq_adc_topk(pq_encode(df, books, dim=2), [0.0, 0.0],
                      books, topk=5).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in top] == [
        (0, 25 + 9), (2, 25 + 990025),
        (3, 992016 + 9), (4, 992016 + 9),
        (1, 992016 + 990025)]


def test_pq_randomized_twin(spark):
    rng = random.Random(57)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(12)])
            for i in range(60)]
    query = [round(rng.uniform(-1, 1), 3) for _ in range(12)]
    for m, k, it in [(3, 4, 2), (4, 2, 3), (2, 5, 1)]:
        got = _spark_run(spark, rows, query, m, k, 12, 15, it)
        exp = _duck(rows, query, m, k, 12, 15, it)
        assert got == exp, (m, k, it)


def test_pq_exact_when_codebook_covers(spark):
    # k >= number of distinct vectors: every vector becomes its own
    # codeword after enough rounds, so ADC == exact quantized
    # distance for all rows.
    rows = [(0, [1.0, 2.0]), (1, [5.0, 6.0]), (2, [-3.0, 0.5]),
            (3, [8.0, -2.0])]
    df = spark.createDataFrame(rows, _EMB_SCHEMA)
    q = [0.0, 0.0]
    got = {r["vec_id"]: r["adc_dist"]
           for r in pq_topk(df, q, m=1, k=4, dim=2, topk=4,
                            iterations=3).collect()}
    exact = {rid: sum(round(x * 100) ** 2 for x in vec)
             for rid, vec in rows}
    assert got == exact


def test_pq_codes_shape_and_determinism(spark):
    rng = random.Random(11)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, _EMB_SCHEMA)
    books = pq_train(df, m=4, k=3, dim=8, iterations=2)
    assert len(books) == 4 and all(len(b) == 3 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    codes = pq_encode(df, books, dim=8)
    rows1 = sorted(tuple(r) for r in codes.collect())
    rows2 = sorted(tuple(r) for r in codes.collect())
    assert rows1 == rows2
    assert all(0 <= c < 3 for _, cs in rows1 for c in cs)
    assert pq_train(df, m=4, k=3, dim=8, iterations=2) == books


def test_pq_validation():
    import pyspark.sql  # noqa: F401  (no session needed for raises)

    with pytest.raises(ValueError, match="multiple of m"):
        pq_topk_sql([0.0] * 8, m=3, k=2, dim=8, topk=5)
    with pytest.raises(ValueError, match="k must be"):
        pq_topk_sql([0.0] * 8, m=2, k=0, dim=8, topk=5)
    with pytest.raises(ValueError, match="topk"):
        pq_topk_sql([0.0] * 8, m=2, k=2, dim=8, topk=0)
    with pytest.raises(ValueError, match="coords"):
        pq_topk_sql([0.0] * 4, m=2, k=2, dim=8, topk=5)
    with pytest.raises(ValueError, match="iterations"):
        pq_topk_sql([0.0] * 8, m=2, k=2, dim=8, topk=5, iterations=0)


def test_pq_train_needs_k_rows(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])], _EMB_SCHEMA)
    with pytest.raises(ValueError, match="at least k"):
        pq_train(df, m=1, k=3, dim=2, iterations=1)


# ---------------------------------------------------------------- RRF

from biocypher_metta_spark.operators.retrieval import (  # noqa: E402
    rrf_fuse,
    rrf_fuse_sql,
)


def _rrf_duck(legs, topk, k, scale=10 ** 9):
    """legs: list of (rows, id_name, score_name, desc)."""
    con = duckdb.connect()
    sqls = []
    for rows, idn, sn, desc in legs:
        vals = ", ".join(f"({i}, {s})" for i, s in rows)
        sqls.append((f"SELECT * FROM (VALUES {vals}) t({idn}, {sn})",
                     idn, sn, desc))
    sql = rrf_fuse_sql(sqls, topk=topk, k=k, scale=scale)
    return [tuple(r) for r in con.execute(sql).fetchall()]


def test_rrf_hand_case(spark):
    # leg A desc: ranks 1..4 = docs 1,2,3,4 (tie 90 breaks to lower id)
    # leg B asc:  ranks 1..4 = docs 2,1,5,4 (tie 7 breaks to lower id)
    a = [(1, 100), (2, 90), (3, 90), (4, 10)]
    b = [(2, 5), (5, 7), (1, 7), (4, 20)]
    dfa = spark.createDataFrame(a, "doc_id: long, score: long")
    dfb = spark.createDataFrame(b, "doc_id: long, dist: long")
    got = [tuple(r) for r in rrf_fuse(
        [(dfa, "doc_id", "score", True), (dfb, "doc_id", "dist", False)],
        topk=10, k=3, scale=1000).collect()]
    # contributions 1000 div (3 + rank): 250, 200, 166, 142
    assert got == [(1, 450), (2, 450), (4, 284), (3, 166), (5, 166)]
    exp = _rrf_duck([(a, "doc_id", "score", True),
                     (b, "doc_id", "dist", False)], topk=10, k=3,
                    scale=1000)
    assert got == exp


def test_rrf_randomized_twin(spark):
    rng = random.Random(91)
    for trial in range(3):
        legs = []
        for _ in range(rng.randint(2, 4)):
            n = rng.randint(5, 30)
            ids = rng.sample(range(100), n)
            rows = [(i, rng.randint(-50, 50)) for i in ids]
            legs.append((rows, "id", "s", rng.random() < 0.5))
        dfs = [(spark.createDataFrame(rows, "id: long, s: long"),
                "id", "s", desc) for rows, _, _, desc in legs]
        topk, k = rng.randint(1, 40), rng.randint(0, 100)
        got = [tuple(r) for r in
               rrf_fuse(dfs, topk=topk, k=k).collect()]
        exp = _rrf_duck(legs, topk=topk, k=k)
        assert got == exp, trial


def test_rrf_validation(spark):
    df = spark.createDataFrame([(1, 2)], "id: long, s: long")
    with pytest.raises(ValueError, match="topk"):
        rrf_fuse([(df, "id", "s", True)], topk=0)
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([(df, "id", "s", True)], topk=5, k=-1)
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], topk=5)
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse_sql([], topk=5)
    with pytest.raises(ValueError, match="candidate"):
        big = spark.range(20).selectExpr("id", "id AS s")
        rrf_fuse([(big, "id", "s", True)], topk=5, max_candidates=10)


# --------------------------------------------------------------- HITS

from biocypher_metta_spark.operators.graph import hits, hits_sql  # noqa: E402


def _hits_duck(edges, iterations, scale=10 ** 6):
    vals = ", ".join(f"({s},{d})" for s, d in edges)
    con = duckdb.connect()
    sql = hits_sql(f"SELECT * FROM (VALUES {vals}) t(src, dst)",
                   iterations=iterations, scale=scale)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_hits_star(spark):
    # 0 -> {1,2,3}: node 0 is the pure hub, 1-3 pure authorities;
    # stable from round 1 (max-normalization pins both at scale).
    df = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                               "src: long, dst: long")
    got = sorted(tuple(r) for r in hits(df, iterations=2).collect())
    s = 10 ** 6
    assert got == [(0, s, 0), (1, 0, s), (2, 0, s), (3, 0, s)]
    assert got == _hits_duck([(0, 1), (0, 2), (0, 3)], 2)


def test_hits_bipartite_weighting(spark):
    # hubs 0,1 -> authority 10; hub 1 also -> 11. Authority 10 has two
    # in-hubs so a[10] = max; hub 1 covers both authorities so h[1] = max.
    edges = [(0, 10), (1, 10), (1, 11)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    byid = {r[0]: (r[1], r[2])
            for r in hits(df, iterations=3).collect()}
    s = 10 ** 6
    assert byid[10][1] == s and byid[11][1] < s  # authority order
    assert byid[1][0] == s and byid[0][0] < s    # hub order
    got = sorted((i, h, a) for i, (h, a) in byid.items())
    assert got == _hits_duck(edges, 3)


def test_hits_randomized_twin(spark):
    rng = random.Random(37)
    for trial in range(4):
        edges = list({(rng.randrange(15), rng.randrange(15))
                      for _ in range(rng.randint(4, 60))})
        it = rng.randint(1, 4)
        df = spark.createDataFrame(edges, "src: long, dst: long")
        got = sorted(tuple(r) for r in hits(df, iterations=it).collect())
        assert got == _hits_duck(edges, it), trial


def test_hits_self_loop_and_nulls(spark):
    # self-loop node is both its own hub and authority; null-endpoint
    # EDGES drop entirely (their other endpoint never enters the node set)
    df = spark.createDataFrame([(5, 5), (None, 1), (2, None)],
                               "src: long, dst: long")
    got = sorted(tuple(r) for r in hits(df, iterations=2).collect())
    s = 10 ** 6
    assert got == [(5, s, s)]


def test_hits_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    with pytest.raises(ValueError, match="iterations"):
        hits(df, iterations=0)
    with pytest.raises(ValueError, match="scale"):
        hits(df, scale=0)
    with pytest.raises(ValueError, match="iterations"):
        hits_sql("SELECT 1 AS src, 2 AS dst", iterations=0)


# ------------------------------------------------------------- zorder

from biocypher_metta_spark.operators.zorder import (  # noqa: E402
    zorder_key,
    zorder_key_sql,
    zorder_layout,
)


def _ref_z(vals, bits):
    z = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_matches_reference_and_twin(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", zorder_key(["x", "y"], bits=3).alias("z")).collect()}
    assert got == {(x, y): _ref_z([x, y], 3) for x, y in rows}
    con = duckdb.connect()
    vals = ", ".join(f"({x},{y})" for x, y in rows)
    expr = zorder_key_sql(["x", "y"], bits=3)
    exp = {(x, y): z for x, y, z in con.execute(
        f"SELECT x, y, {expr} FROM (VALUES {vals}) t(x,y)").fetchall()}
    assert got == exp


def test_zorder_three_dims(spark):
    rows = [(x, y, w) for x in range(4) for y in range(4)
            for w in range(4)]
    df = spark.createDataFrame(rows, "x: long, y: long, w: long")
    got = sorted(r["z"] for r in df.select(
        zorder_key(["x", "y", "w"], bits=2).alias("z")).collect())
    assert got == list(range(64))  # 3x2-bit morton is a bijection


def test_zorder_locality_blocks():
    # the property the layout exists for: on a 64x64 grid, every
    # 64-point chunk of the z-sorted order is an EXACT 8x8 block —
    # both dims bounded at 8, vs 64 on one dim for row-major order
    pts = sorted(((x, y) for x in range(64) for y in range(64)),
                 key=lambda p: _ref_z(list(p), 6))
    for c in range(64):
        chunk = pts[c * 64:(c + 1) * 64]
        xs = [p[0] for p in chunk]
        ys = [p[1] for p in chunk]
        assert max(xs) - min(xs) == 7 and max(ys) - min(ys) == 7


def test_zorder_range_guard_and_validation(spark):
    df = spark.createDataFrame([(9, 1)], "x: long, y: long")
    with pytest.raises(Exception, match="out of"):
        df.select(zorder_key(["x", "y"], bits=3)).collect()
    # negative values also refused
    dfn = spark.createDataFrame([(-1, 1)], "x: long, y: long")
    with pytest.raises(Exception, match="out of"):
        dfn.select(zorder_key(["x", "y"], bits=3)).collect()
    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b"], bits=32)
    with pytest.raises(ValueError, match="non-empty"):
        zorder_key_sql([], bits=4)
    with pytest.raises(ValueError, match="bits"):
        zorder_key(["a"], bits=0)
    with pytest.raises(ValueError, match="n_chunks"):
        zorder_layout(df, ["x"], bits=3, n_chunks=0)


def test_zorder_layout_sorted_within_partitions(spark):
    rows = [((i * 29) % 32, (i * 13) % 32) for i in range(200)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    out = zorder_layout(df, ["x", "y"], bits=5, n_chunks=4)
    assert set(out.columns) == {"x", "y"}
    assert out.count() == 200
    # every partition's rows are ordered by the morton key
    from pyspark.sql import functions as F
    chk = out.select("x", "y", F.spark_partition_id().alias("p")).collect()
    by_p = {}
    for r in chk:
        by_p.setdefault(r["p"], []).append(_ref_z([r["x"], r["y"]], 5))
    for p, zs in by_p.items():
        assert zs == sorted(zs), p


# ---------------------------------------------------------------- MMR

from biocypher_metta_spark.operators.mmr import (  # noqa: E402
    mmr_rerank,
    mmr_rerank_sql,
)

_VEC_SCHEMA = "vec_id: long, embedding: array<float>"


def _mmr_duck(rows, query, k, dim, lam):
    vals = ", ".join(
        f"({i}, ARRAY[{', '.join(repr(float(x)) for x in v)}]::FLOAT[])"
        for i, v in rows)
    con = duckdb.connect()
    sql = mmr_rerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(vec_id, embedding)",
        query, k=k, dim=dim, lambda_permille=lam)
    return [tuple(r) for r in con.execute(sql).fetchall()]


def test_mmr_prefers_diversity(spark):
    # near-dup of the best hit is DEMOTED below an orthogonal doc:
    # plain top-3 for q=(1,0) is [1, 2, 3]; MMR at lambda=0.5 is
    # [1, 2-vs-3 tie -> 2, 3] with the dup's objective crushed to 0
    rows = [(1, [1.0, 0.0]), (2, [0.99, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, _VEC_SCHEMA)
    got = [tuple(r) for r in mmr_rerank(
        df, [1.0, 0.0], k=3, dim=2, lambda_permille=500).collect()]
    assert got[0] == (1, 1, 500 * 10000)
    assert [g[0] for g in got] == [1, 2, 3]
    # dup's step-2 objective is rel-sim = 0, not ~rel
    assert got[1][2] == 0
    assert got == _mmr_duck(rows, [1.0, 0.0], 3, 2, 500)


def test_mmr_lambda_extremes(spark):
    rows = [(i, [round(((i * 7 + j) % 11 - 5) / 5.0, 2)
                 for j in range(4)]) for i in range(20)]
    df = spark.createDataFrame(rows, _VEC_SCHEMA)
    q = [0.5, -0.2, 0.8, 0.1]
    # lambda=1000: pure relevance — equals dot-product order
    got = [r[0] for r in mmr_rerank(
        df, q, k=6, dim=4, lambda_permille=1000).collect()]
    qq = [round(x * 100) for x in q]
    rel = {i: sum(round(v[j] * 100) * qq[j] for j in range(4))
           for i, v in rows}
    exp = [i for i, _ in sorted(rel.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:6]]
    assert got == exp
    # both extremes match the twin
    for lam in (0, 1000):
        g = [tuple(r) for r in mmr_rerank(
            df, q, k=5, dim=4, lambda_permille=lam).collect()]
        assert g == _mmr_duck(rows, q, 5, 4, lam), lam


def test_mmr_randomized_twin(spark):
    rng = random.Random(19)
    for trial in range(3):
        n = rng.randint(3, 35)
        rows = [(i, [round(rng.uniform(-1, 1), 2) for _ in range(5)])
                for i in range(n)]
        q = [round(rng.uniform(-1, 1), 2) for _ in range(5)]
        k, lam = rng.randint(1, 10), rng.randint(0, 1000)
        df = spark.createDataFrame(rows, _VEC_SCHEMA)
        got = [tuple(r) for r in mmr_rerank(
            df, q, k=k, dim=5, lambda_permille=lam).collect()]
        assert got == _mmr_duck(rows, q, k, dim=5, lam=lam), trial


def test_mmr_k_exceeds_candidates(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, _VEC_SCHEMA)
    got = mmr_rerank(df, [1.0, 1.0], k=10, dim=2).collect()
    assert len(got) == 2  # stops at the list, same as the twin
    assert got == [tuple(r) for r in got]  # smoke shape
    assert len(_mmr_duck(rows, [1.0, 1.0], 10, 2, 700)) == 2


def test_mmr_validation_and_null_vector(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], _VEC_SCHEMA)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(df, [1.0, 0.0], k=0, dim=2)
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(df, [1.0, 0.0], k=1, dim=2, lambda_permille=1001)
    with pytest.raises(ValueError, match="coords"):
        mmr_rerank(df, [1.0], k=1, dim=2)
    with pytest.raises(ValueError, match="max_candidates"):
        big = spark.range(30).selectExpr(
            "id AS vec_id", "array(1.0f, 2.0f) AS embedding")
        mmr_rerank(big, [1.0, 0.0], k=1, dim=2, max_candidates=10)
    bad = spark.createDataFrame([(1, [1.0, 0.0]), (2, None)], _VEC_SCHEMA)
    with pytest.raises(Exception, match="NULL or"):
        mmr_rerank(bad, [1.0, 0.0], k=2, dim=2).collect()
    with pytest.raises(ValueError, match="dim"):
        mmr_rerank_sql("SELECT 1", [1.0], k=1, dim=0)


def test_mmr_wider_table_vectors_sliced(spark):
    # table vectors LONGER than dim: mmr scores the first dim coords
    # (the pq_topk dim= convention) — the extra coords, which would
    # flip the order if counted, must not leak into rel or sim
    rows = [(1, [1.0, 0.0, -9.0, -9.0]), (2, [0.99, 0.0, 9.0, 9.0]),
            (3, [0.0, 1.0, 9.0, -9.0])]
    df = spark.createDataFrame(rows, _VEC_SCHEMA)
    # lambda=400 makes the near-dup's redundancy outweigh relevance:
    # [1, 3, 2] on the 2-dim prefix; counting the planted wide coords
    # would instead rank 2 or 3 first (their tails dominate)
    got = [tuple(r) for r in mmr_rerank(
        df, [1.0, 0.0], k=3, dim=2, lambda_permille=400).collect()]
    assert [g[0] for g in got] == [1, 3, 2]
    two = [(i, v[:2]) for i, v in rows]
    assert got == _mmr_duck(two, [1.0, 0.0], 3, 2, 400)


def test_quantized_dot_topk_dim_mismatch_raises(spark):
    # regression: zip_with NULL-pads a length mismatch, silently
    # turning every dot NULL and the top-k into first-k-by-id — the
    # emb_mmr_rerank gate shipped exactly this bug (16-dim query on
    # the 64-dim table) before the guard
    from biocypher_metta_spark.operators.similarity import (
        quantized_dot_topk)

    wide = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5, 0.5, 0.5, 0.5])],
        _VEC_SCHEMA)
    with pytest.raises(Exception, match="non-2-dim"):
        quantized_dot_topk(wide, [1.0, 0.0], k=2).collect()
    nulled = spark.createDataFrame([(1, [1.0, 0.0]), (2, None)],
                                   _VEC_SCHEMA)
    with pytest.raises(Exception, match="NULL or"):
        quantized_dot_topk(nulled, [1.0, 0.0], k=2).collect()


def test_retrieval_ladder_gate_matches_twin(spark):
    # the 3-stage composition (bm25 + PQ -> RRF -> MMR) end-to-end vs
    # the chained SQL twins — the trajectory, not just the final set
    from biocypher_metta_spark import entry_queries as eq

    sf = "/root/testdata/sf0.001"
    fn, sql = eq.QUERIES["doc_retrieval_ladder"]
    got = sorted(tuple(r) for r in fn(spark, sf).collect())
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf}/{t}.parquet'")
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp
    assert len(got) == 10
    assert {r[1] for r in got} == set(range(1, 11))
