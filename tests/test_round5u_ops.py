"""Round-5u operators: perceptual image dHash (operators/multimodal.py)
and DAG longest-path depth (operators/graph.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.graph import dag_depth, dag_depth_sql
from biocypher_metta_spark.operators.multimodal import image_dhash
from biocypher_metta_spark.operators.png import png_encode

# ---------------------------------------------------------------- dhash


def _img(spark, pixel_sets, w, h, c=1):
    return spark.createDataFrame(
        [(f"png://{i}", "image",
          bytearray(png_encode(w, h, c, bytes(p))))
         for i, p in enumerate(pixel_sets)],
        "media_ref string, kind string, content binary")


def _brute_dhash(pix, w, h, c, gw, gh):
    gray = [sum(pix[(y * w + x) * c + k] for k in range(c)) // c
            for y in range(h) for x in range(w)]
    bits = 0
    k = 0
    for gy in range(gh):
        y0, y1 = gy * h // gh, (gy + 1) * h // gh
        cells = []
        for gx in range(gw):
            x0, x1 = gx * w // gw, (gx + 1) * w // gw
            s = sum(gray[y * w + x]
                    for y in range(y0, y1) for x in range(x0, x1))
            cells.append(s // ((y1 - y0) * (x1 - x0)))
        for gx in range(gw - 1):
            if cells[gx] > cells[gx + 1]:
                bits |= 1 << k
            k += 1
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def test_dhash_hand_truth(spark):
    # 4x2 gray image, 2x2 grid -> cells are 2x1 column pairs;
    # pixels: row0 = 10,10,200,200 / row1 = 30,30,0,0
    # grid cells (avg): gy0: (10+10+30+30)/4=20 | (200+200+0+0)/4=100
    #                   -> 2x2 grid on h=2 means gh=2 rows of height 1:
    # gy0: [10, 200]... recompute with brute; assert equality + sign
    pix = [10, 10, 200, 200, 30, 30, 0, 0]
    media = _img(spark, [pix], w=4, h=2)
    row = image_dhash(media, grid_w=2, grid_h=2).collect()[0]
    assert row["width"] == 4 and row["height"] == 2
    # gy0 cells: avg(10,10)=10, avg(200,200)=200 -> 10 > 200 false, bit0=0
    # gy1 cells: avg(30,30)=30, avg(0,0)=0 -> 30 > 0 true, bit1=1
    assert row["dhash"] == 2
    assert row["dhash"] == _brute_dhash(pix, 4, 2, 1, 2, 2)


def test_dhash_matches_brute_random(spark):
    rng = random.Random(19)
    w, h, c = 11, 9, 3
    pix = [rng.randrange(256) for _ in range(w * h * c)]
    media = _img(spark, [pix], w=w, h=h, c=c)
    row = image_dhash(media, grid_w=4, grid_h=3).collect()[0]
    assert row["dhash"] == _brute_dhash(pix, w, h, c, 4, 3)


def test_dhash_full_64_bits_sign(spark):
    # strictly decreasing rows force EVERY bit set -> hash -1 (all
    # 64 bits in two's complement)
    w, h = 9, 8
    pix = [255 - x * 28 for y in range(h) for x in range(w)]
    media = _img(spark, [pix], w=w, h=h)
    row = image_dhash(media).collect()[0]  # default 9x8 -> 64 bits
    assert row["dhash"] == -1


def test_dhash_too_small_and_corrupt(spark):
    small = _img(spark, [[1, 2, 3, 4]], w=2, h=2)
    row = image_dhash(small, grid_w=4, grid_h=3).collect()[0]
    assert (row["width"], row["height"], row["dhash"]) == (2, 2, None)
    corrupt = spark.createDataFrame(
        [("x://0", "image", bytearray(b"nope"))],
        "media_ref string, kind string, content binary")
    row = image_dhash(corrupt).collect()[0]
    assert row["width"] is None and row["dhash"] is None


def test_dhash_validation(spark):
    media = _img(spark, [[0]], w=1, h=1)
    with pytest.raises(ValueError):
        image_dhash(media, grid_w=1, grid_h=8)
    with pytest.raises(ValueError):
        image_dhash(media, grid_w=10, grid_h=8)  # 72 bits > 64


def test_dhash_near_dup_composition(spark):
    # re-encoding with one slightly brightened pixel keeps the hash
    # within a couple of bits; an unrelated image does not pair.
    from biocypher_metta_spark.operators.dedup import hamming_near_pairs
    from pyspark.sql import functions as F

    rng = random.Random(23)
    w, h = 9, 8
    base = [rng.randrange(256) for _ in range(w * h)]
    near = list(base)
    near[0] = min(255, near[0] + 3)  # sub-cell perturbation
    other = [rng.randrange(256) for _ in range(w * h)]
    media = _img(spark, [base, near, other], w=w, h=h)
    sims = (image_dhash(media)
            .select(F.col("media_ref").alias("doc_id"),
                    F.col("dhash").alias("simhash")))
    pairs = hamming_near_pairs(sims, max_dist=3, bits=64).collect()
    pair_ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("png://0", "png://1") in pair_ids
    assert all("png://2" not in p for p in pair_ids)


# ------------------------------------------------------------- dag depth

EDGE_SCHEMA = "src long, dst long"


def _dd(spark, edges, **kw):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {r["node"]: r["depth"]
            for r in dag_depth(df, **kw).collect()}


def test_dag_depth_chain_and_diamond(spark):
    # chain 3->2->1->0 plus shortcut 3->1: depth(3) = 3 (long way)
    out = _dd(spark, [(3, 2), (2, 1), (1, 0), (3, 1)])
    assert out == {3: 3, 2: 2, 1: 1, 0: 0}


def test_dag_depth_forest_roots_zero(spark):
    out = _dd(spark, [(1, 0), (2, 0), (5, 4)])
    assert out == {1: 1, 2: 1, 0: 0, 5: 1, 4: 0}


def test_dag_depth_cycle_raises(spark):
    with pytest.raises(ValueError, match="cycle"):
        _dd(spark, [(0, 1), (1, 2), (2, 0)])
    with pytest.raises(ValueError, match="self-loop"):
        _dd(spark, [(0, 0)])


def test_dag_depth_deep_chain_needs_doubling(spark):
    # depth 33 > 2^5: proves multiple doubling rounds compose lengths
    edges = [(i, i - 1) for i in range(1, 34)]
    out = _dd(spark, edges)
    assert out[33] == 33 and out[0] == 0


def test_dag_depth_exhaustion_raises(spark):
    edges = [(i, i - 1) for i in range(1, 10)]
    with pytest.raises(RuntimeError, match="fixed point"):
        _dd(spark, edges, max_iter=2)  # covers depth 4 < 9


def test_dag_depth_duckdb_twin_agrees(spark):
    rng = random.Random(29)
    # random DAG: edges always point from higher to lower ids
    edges = list({(b, a) for a, b in
                  ((rng.randrange(25), rng.randrange(25))
                   for _ in range(80)) if a < b})
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    spark_rows = {tuple(r) for r in dag_depth(df).collect()}
    duck_rows = set(map(tuple, con.execute(
        dag_depth_sql("SELECT src, dst FROM e")).fetchall()))
    assert spark_rows == duck_rows and spark_rows
