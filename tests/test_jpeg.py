"""Pure-stdlib baseline JPEG codec (the round-4 multimodal widening).

Independence argument, mirroring tests/test_png.py: the encoder runs
the spec's FORWARD transforms (FDCT, quantize, scan-order Huffman) and
the decoder the INVERSE ones — separately written code paths — so a
roundtrip checks one against the other; the DCT kernels are separately
cross-checked against the direct O(n^2) textbook formula; and
constant-per-block grays must round-trip BIT-EXACT (only DC survives
the FDCT, and the Annex-K DC step divides it exactly), which is the
property the multimodal_jpeg_decode gate's formula oracle relies on."""

import math
import random

import pytest

from biocypher_metta_spark.operators.jpeg import (
    QUANT_LUMA, ZIGZAG, _fdct8x8, _idct8x8, jpeg_decode, jpeg_encode)
from biocypher_metta_spark.operators.multimodal import sniff_image_decode


def block_gray(w, h, variant=0):
    """Constant-per-8x8-block gray pixels with even offsets from 128 —
    the bit-exact JPEG subset (same formula as the driver gate)."""
    return bytes(128 + 2 * (((x // 8) * 7 + (y // 8) * 13 + variant * 29)
                            % 50 - 25)
                 for y in range(h) for x in range(w))


def test_constant_block_gray_roundtrip_exact():
    for w, h, v in ((8, 8, 0), (24, 16, 1), (40, 24, 2), (13, 11, 3)):
        pix = block_gray(w, h, v)
        got = jpeg_decode(jpeg_encode(w, h, 1, pix))
        assert got == (w, h, 1, pix), (w, h, v)


def test_dct_kernels_vs_direct_formula():
    """_fdct8x8/_idct8x8 vs the textbook double-sum DCT-II/III, plus
    inverse-of-each-other to float precision."""
    rng = random.Random(5)
    f = [rng.randint(-128, 127) for _ in range(64)]
    direct = [0.0] * 64
    for u in range(8):
        for v in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            cv = (1 / math.sqrt(2)) if v == 0 else 1.0
            s = sum(f[y * 8 + x]
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    * math.cos((2 * y + 1) * v * math.pi / 16)
                    for y in range(8) for x in range(8))
            direct[u * 8 + v] = 0.25 * cu * cv * s
    fast = _fdct8x8(f)
    # note index orders: direct[u*8+v] has u = horizontal freq from the
    # x-cosine; _fdct8x8 produces out[v*8+c] with row pass over x first
    for u in range(8):
        for v in range(8):
            assert abs(direct[u * 8 + v] - fast[v * 8 + u]) < 1e-9
    back = _idct8x8(fast)
    assert max(abs(a - b) for a, b in zip(back, f)) < 1e-9
    # the sparse decode-path IDCT must agree with the separable one on
    # dense, sparse, DC-only, and all-zero coefficient patterns
    from biocypher_metta_spark.operators.jpeg import _idct8x8_sparse
    for coefs in (fast,
                  [fast[0]] + [0.0] * 63,
                  [0.0] * 64,
                  [v if i % 7 == 0 else 0.0 for i, v in enumerate(fast)]):
        a, b = _idct8x8(coefs), _idct8x8_sparse(coefs)
        assert max(abs(x - y) for x, y in zip(a, b)) < 1e-9


def test_lossy_roundtrip_tolerance():
    """Smooth content through the full standard-table pipeline stays
    within a small quantization error; 4:2:0 only adds chroma error
    (gray content through the color path is still near-exact)."""
    w, h = 24, 16
    grad = bytes(min(255, x * 3 + y * 2) for y in range(h) for x in range(w))
    _, _, _, out = jpeg_decode(jpeg_encode(w, h, 1, grad))
    assert max(abs(a - b) for a, b in zip(grad, out)) <= 4
    rgb = bytes(v for y in range(h) for x in range(w)
                for v in (min(255, x * 5), min(255, y * 8), 128))
    _, _, _, o444 = jpeg_decode(jpeg_encode(w, h, 3, rgb))
    assert max(abs(a - b) for a, b in zip(rgb, o444)) <= 10
    _, _, _, o420 = jpeg_decode(jpeg_encode(w, h, 3, rgb, subsampling="420"))
    assert max(abs(a - b) for a, b in zip(rgb, o420)) <= 20
    gray_rgb = bytes(v for p in block_gray(w, h) for v in (p, p, p))
    _, _, _, og = jpeg_decode(jpeg_encode(w, h, 3, gray_rgb,
                                          subsampling="420"))
    assert max(abs(a - b) for a, b in zip(gray_rgb, og)) <= 1


def test_restart_markers_roundtrip():
    pix = block_gray(40, 24, 1)
    plain = jpeg_decode(jpeg_encode(40, 24, 1, pix))
    for interval in (1, 2, 3):
        blob = jpeg_encode(40, 24, 1, pix, restart_interval=interval)
        assert b"\xFF\xDD" in blob and b"\xFF\xD0" in blob
        assert jpeg_decode(blob) == plain
    rgb = bytes(v for y in range(16) for x in range(24)
                for v in (x * 5 % 256, y * 8 % 256, 128))
    a = jpeg_decode(jpeg_encode(24, 16, 3, rgb, subsampling="420"))
    b = jpeg_decode(jpeg_encode(24, 16, 3, rgb, subsampling="420",
                                restart_interval=1))
    assert a == b


def test_malformed_inputs_rejected():
    good = jpeg_encode(8, 8, 1, bytes(range(0, 128, 2)))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        jpeg_decode(good[:2])              # SOI only
    with pytest.raises(ValueError):
        jpeg_decode(good[:-6])             # truncated entropy data
    # progressive frames rejected explicitly
    prog = bytearray(good)
    prog[good.index(b"\xFF\xC0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(prog))
    with pytest.raises(ValueError):
        jpeg_encode(0, 8, 1, b"")
    with pytest.raises(ValueError):
        jpeg_encode(8, 8, 2, bytes(128))   # 2-channel unsupported


def test_zrl_run_past_block_end_rejected():
    """A ZRL (0xF0) symbol advances k by 16 without writing a coef, so a
    crafted stream of 4+ ZRLs pushes k past 63 WITHOUT tripping the
    run<<4|size bounds check — the decoder must raise, not silently
    un-EOB the block and desync the bit stream (ADVICE r4). Built by
    hand with the module's own canonical-table + bit-writer helpers."""
    import struct

    from biocypher_metta_spark.operators.jpeg import (
        _BitWriter, _canonical_table)

    _, dc_vals, dc_codes = _canonical_table({0})
    dc_bits, _, _ = _canonical_table({0})
    ac_bits, ac_vals, ac_codes = _canonical_table({0x00, 0xF0})

    def dht(tc, bits, vals):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += (b"\xFF\xC0" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += dht(0, dc_bits, dc_vals)
    out += dht(1, ac_bits, ac_vals)
    out += (b"\xFF\xDA" + struct.pack(">H", 8) + b"\x01"
            + bytes([1, 0x00]) + b"\x00\x3F\x00")
    bw = _BitWriter()
    code, ln = dc_codes[0]
    bw.write(code, ln)                   # DC: category 0, no diff bits
    code, ln = ac_codes[0xF0]
    for _ in range(5):                   # 5 ZRLs: k = 1+80 >> 63
        bw.write(code, ln)
    code, ln = ac_codes[0x00]
    bw.write(code, ln)                   # EOB (never reached post-fix)
    bw.flush()
    out += bw.out + b"\xFF\xD9"
    with pytest.raises(ValueError, match="AC run past block end"):
        jpeg_decode(bytes(out))


def test_fill_bytes_between_segments():
    """Spec B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    real encoders emit them, so the parser must skip them."""
    pix = block_gray(16, 8)
    good = jpeg_encode(16, 8, 1, pix)
    i = good.index(b"\xFF\xC0")         # pad before SOF0
    padded = good[:i] + b"\xFF\xFF\xFF" + good[i:]
    assert jpeg_decode(padded) == (16, 8, 1, pix)


def test_decode_fuzz_never_crashes():
    """Same contract as the PNG/WAV fuzz: mutated/truncated/garbage
    streams decode or raise ValueError — never IndexError/struct.error
    (the operator handlers catch ValueError only)."""
    rng = random.Random(20260817)
    base = jpeg_encode(16, 16, 1, block_gray(16, 16, 2))
    for _ in range(400):
        mode = rng.random()
        if mode < 0.3:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        elif mode < 0.6:
            data = base[:rng.randrange(len(base) + 1)]
        else:
            b = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            data = bytes(b)
        try:
            w, h, c, pix = jpeg_decode(data)
            assert len(pix) == w * h * c
        except ValueError:
            pass


def test_zigzag_table_is_the_standard_one():
    """Spot-check the generated zigzag order against the spec's first
    and last entries (T.81 figure A.6)."""
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-6:] == [61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))
    assert QUANT_LUMA[0] == 16      # the DC step the exactness gate uses


def test_sniffer_routes_png_and_jpeg(spark):
    """decode_images with the sniffing default handles a mixed
    PNG+JPEG+garbage batch in one mapInPandas pass."""
    from biocypher_metta_spark.operators.multimodal import decode_images
    from biocypher_metta_spark.operators.png import png_encode

    png = png_encode(6, 4, 3, bytes(range(72)))
    jpg = jpeg_encode(16, 8, 1, block_gray(16, 8))
    rows = [("png://0", "image", bytearray(png), "image/png", len(png)),
            ("jpg://0", "image", bytearray(jpg), "image/jpeg", len(jpg)),
            ("bad://0", "image", bytearray(b"GIF89a.."), "image/gif", 8)]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, content binary, "
              "content_type string, n_bytes long")
    out = {r.media_ref: r for r in decode_images(media).collect()}
    assert (out["png://0"].width, out["png://0"].channels) == (6, 3)
    assert (out["jpg://0"].width, out["jpg://0"].channels) == (16, 1)
    assert out["bad://0"].width is None
    w, h, c, pix = sniff_image_decode(jpg)
    assert bytes(pix) == block_gray(16, 8)


def test_jpeg_resize_kernel_and_operator(spark):
    """Nearest-neighbor JPEG resize: a 2x upscale of a constant-block
    gray stays block-constant (each target 8x8 block samples a 4x4
    source region inside one source block), so the whole
    decode->resize->re-encode->decode loop is bit-exact; downscale is
    checked against direct source sampling."""
    from biocypher_metta_spark.operators.jpeg import jpeg_resize
    from biocypher_metta_spark.operators.multimodal import (
        image_stats, resize_images)

    pix = block_gray(24, 16, 1)
    up = jpeg_decode(jpeg_resize(jpeg_encode(24, 16, 1, pix), 48, 32))
    assert up[:3] == (48, 32, 1)
    expect_up = bytes(pix[(y // 2) * 24 + (x // 2)]
                      for y in range(32) for x in range(48))
    assert up[3] == expect_up
    # operator chain: JPEG rows route to jpeg_resize, garbage to fake
    blob = jpeg_encode(24, 16, 1, pix)
    media = spark.createDataFrame(
        [("j", "image", bytearray(blob), 0),
         ("x", "image", bytearray(b"??"), 0)],
        "media_ref string, kind string, content binary, n_bytes long")
    resized = resize_images(media, 48, 32)
    stats = {r.media_ref: r for r in image_stats(resized).collect()}
    assert (stats["j"].width, stats["j"].height) == (48, 32)
    assert stats["j"].pix_sum == sum(expect_up)
    assert stats["x"].width is None      # fake bytes don't decode
    with pytest.raises(ValueError):
        jpeg_resize(blob, 0, 4)


def test_real_world_jpegs_decode():
    """JPEGs emitted by ordinary encoders (CPython test-suite assets,
    checked in under fixtures/) must decode to their frame dimensions —
    the tables, sampling factors and Huffman codes are all THEIRS, not
    this encoder's, so this exercises the decoder against the wild.
    The 16x16 Python-logo thumbnail is 4:2:0 YCbCr; the 2x2 is
    grayscale. Content sanity: the logo's mean luma sits in the
    mid-range (it's a blue/yellow logo on white, JFIF-standard tables),
    not at either clip rail."""
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    w, h, c, pix = jpeg_decode((fx / "real_python_logo.jpg").read_bytes())
    assert (w, h, c) == (16, 16, 3)
    mean = sum(pix) / len(pix)
    assert 40 < mean < 200
    w2, h2, c2, pix2 = jpeg_decode((fx / "real_2x2.jpg").read_bytes())
    assert (w2, h2) == (2, 2) and c2 in (1, 3)
    assert len(pix2) == w2 * h2 * c2
