"""Round-5y operators: stdlib BMP codec (operators/bmp.py), G.711
mu-law WAV (operators/wav.py), and sitemap-protocol parsing
(operators/web.py)."""

import random

import duckdb
import pytest

from biocypher_metta_spark.operators.bmp import bmp_decode, bmp_encode
from biocypher_metta_spark.operators.multimodal import sniff_image_decode
from biocypher_metta_spark.operators.wav import (
    ulaw_decode_sample,
    ulaw_encode_sample,
    ulaw_quantize_sql,
    wav_decode,
    wav_encode_ulaw,
)
from biocypher_metta_spark.operators.web import sitemap_urls

# -------------------------------------------------------------------- bmp


def test_bmp_roundtrip_all_pad_widths():
    rng = random.Random(3)
    for w in range(1, 9):  # stride pads 0..3 all covered
        h = 3
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        ww, hh, c, out = bmp_decode(bmp_encode(w, h, rgb))
        assert (ww, hh, c) == (w, h, 3)
        assert out == rgb


def test_bmp_sniff_chain_routes():
    rgb = bytes(range(5 * 4 * 3 % 256 or 1)) * 0 + bytes(
        (i * 11) % 256 for i in range(5 * 4 * 3))
    blob = bmp_encode(5, 4, rgb)
    assert sniff_image_decode(blob) == (5, 4, 3, rgb)


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        bmp_decode(b"notabmp")
    good = bytearray(bmp_encode(4, 4, bytes(48)))
    good[28] = 8  # bpp 8 (paletted) unsupported
    with pytest.raises(ValueError, match="24-bit"):
        bmp_decode(bytes(good))
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(bmp_encode(4, 4, bytes(48))[:-5])
    with pytest.raises(ValueError):
        bmp_encode(2, 2, bytes(5))  # wrong byte count


# ------------------------------------------------------------------ mu-law


def test_ulaw_byte_roundtrip():
    # encode(decode(b)) == b for every byte except the negative-zero
    # degeneracy (0x7F decodes to 0, which re-encodes positive)
    for b in range(256):
        if b == 0x7F:
            assert ulaw_decode_sample(b) == 0
            continue
        assert ulaw_encode_sample(ulaw_decode_sample(b)) == b


def test_ulaw_known_values():
    assert ulaw_decode_sample(0xFF) == 0          # positive zero
    assert ulaw_decode_sample(0x80) == 32124      # positive max
    assert ulaw_decode_sample(0x00) == -32124     # negative max
    assert ulaw_encode_sample(0) == 0xFF
    assert ulaw_encode_sample(32767) == 0x80
    assert ulaw_encode_sample(-32768) == 0x00


def test_ulaw_quantization_error_bound():
    rng = random.Random(7)
    for _ in range(2000):
        s = rng.randint(-32635, 32635)
        q = ulaw_decode_sample(ulaw_encode_sample(s))
        # segment width at |s| is at most 2^(e+3) with e <= 7
        assert abs(q - s) <= 1024
        assert (q >= 0) == (s >= 0) or q == 0


def test_ulaw_wav_roundtrip_and_reject():
    rng = random.Random(11)
    samples = [rng.randint(-32768, 32767) for _ in range(64)]
    ch, rate, bits, dec = wav_decode(wav_encode_ulaw(samples, 11025, 2))
    assert (ch, rate, bits) == (2, 11025, 8)
    assert dec == [ulaw_decode_sample(ulaw_encode_sample(s))
                   for s in samples]
    with pytest.raises(ValueError):
        wav_encode_ulaw([1, 2, 3], n_channels=2)


def test_ulaw_sql_twin_matches_kernel():
    con = duckdb.connect()
    rng = random.Random(13)
    vals = ([rng.randint(-32768, 32767) for _ in range(3000)]
            + [0, 1, -1, 131, 132, -132, 32635, -32635, 32767, -32768])
    con.execute("CREATE TABLE t (s BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    rows = con.execute(
        f"SELECT s, {ulaw_quantize_sql('s')} FROM t").fetchall()
    for s, got in rows:
        assert got == ulaw_decode_sample(ulaw_encode_sample(s)), s


# ----------------------------------------------------------------- sitemap

DOC_SCHEMA = "doc_id long, text string"


def _sm(spark, docs):
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    return {(r["doc"], r["kind"], r["loc"]): r["lastmod"]
            for r in sitemap_urls(df).collect()}


def test_sitemap_hand_truth(spark):
    xml = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>  https://a.example/1  </loc>
    <lastmod>2024-01-02</lastmod>
  </url>
  <url><loc>https://a.example/2</loc></url>
  <url><lastmod>2099-01-01</lastmod></url>
</urlset>"""
    out = _sm(spark, [(1, xml)])
    assert out == {(1, "url", "https://a.example/1"): "2024-01-02",
                   (1, "url", "https://a.example/2"): None}


def test_sitemap_index_children(spark):
    xml = """<sitemapindex>
  <sitemap><loc>https://a.example/sm1.xml</loc>
           <lastmod>2023-12-31</lastmod></sitemap>
  <sitemap><loc>https://a.example/sm2.xml</loc></sitemap>
</sitemapindex>"""
    out = _sm(spark, [(7, xml)])
    assert out == {
        (7, "sitemap", "https://a.example/sm1.xml"): "2023-12-31",
        (7, "sitemap", "https://a.example/sm2.xml"): None}


def test_sitemap_case_insensitive_and_non_sitemap(spark):
    out = _sm(spark, [
        (1, "<URL><LOC>https://x.example/u</LOC></URL>"),
        (2, "just some text with no xml"),
        (3, ""),
    ])
    assert out == {(1, "url", "https://x.example/u"): None}
