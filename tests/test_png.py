"""Pure-stdlib PNG codec (the real multimodal decode kernel).

Independence argument: the encoder applies the spec's FORWARD filter
transforms and the decoder the INVERSE ones — separately written code
paths — so a roundtrip over every (filter, color-type) combination
checks the unfilter math against the original pixel arrays; and two
checked-in REAL-WORLD PNGs (emitted by ordinary PNG encoders, filters
chosen by them, not by us) must decode to their IHDR dimensions with
CRC-verified chunks."""

from pathlib import Path

import pytest

from biocypher_metta_spark.operators.multimodal import (
    decode_images, real_image_decode)
from biocypher_metta_spark.operators.png import png_decode, png_encode

FIXTURES = Path(__file__).parent / "fixtures"


def synth_pixels(w: int, h: int, c: int, variant: int = 0) -> bytes:
    return bytes(((x * 7 + y * 13 + ch * 29 + variant * 101) % 256)
                 for y in range(h) for x in range(w) for ch in range(c))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_all_filters_and_color_types(filter_type, channels):
    w, h = 13, 9  # odd sizes catch stride bugs
    pix = synth_pixels(w, h, channels, variant=filter_type)
    blob = png_encode(w, h, channels, pix, filter_type=filter_type)
    assert png_decode(blob) == (w, h, channels, pix)


def test_roundtrip_extremes():
    # 1x1 and a single-row / single-column image stress the a/b/c
    # neighborhood edges of every filter
    for w, h in [(1, 1), (7, 1), (1, 7)]:
        for ft in range(5):
            pix = synth_pixels(w, h, 3, variant=ft)
            assert png_decode(png_encode(w, h, 3, pix, ft))[3] == pix


def test_palette_decode():
    # hand-assembled color-type-3 PNG: 4x2 indices into a 5-entry palette
    import struct
    import zlib

    from biocypher_metta_spark.operators.png import _SIG, _chunk

    palette = bytes([250, 0, 0,  0, 250, 0,  0, 0, 250,  9, 9, 9,  200, 100, 50])
    idx_rows = [bytes([0, 1, 2, 3]), bytes([4, 3, 2, 1])]
    raw = b"".join(b"\x00" + r for r in idx_rows)
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    blob = (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, c, pix = png_decode(blob)
    assert (w, h, c) == (4, 2, 3)
    want = b"".join(palette[i * 3:i * 3 + 3]
                    for i in [0, 1, 2, 3, 4, 3, 2, 1])
    assert pix == want


def test_multi_idat_streams():
    # IDAT may be split at arbitrary byte boundaries
    import zlib

    from biocypher_metta_spark.operators.png import _SIG, _chunk

    pix = synth_pixels(5, 4, 3)
    blob = png_encode(5, 4, 3, pix, filter_type=2)
    # re-assemble with the compressed stream split into 3 IDATs
    body = zlib.compress(b"".join(
        b"\x02" + bytes((pix[y * 15 + x] - (pix[(y - 1) * 15 + x] if y else 0)) & 0xFF
                        for x in range(15))
        for y in range(4)))
    parts = [body[:5], body[5:11], body[11:]]
    ihdr = blob[8:8 + 25]  # the whole IHDR chunk incl. length/crc
    rebuilt = (_SIG + ihdr + b"".join(_chunk(b"IDAT", p) for p in parts)
               + _chunk(b"IEND", b""))
    assert png_decode(rebuilt) == (5, 4, 3, pix)


def test_malformed_inputs_rejected():
    pix = synth_pixels(4, 4, 3)
    good = png_encode(4, 4, 3, pix)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="CRC"):
        corrupt = bytearray(good)
        corrupt[40] ^= 0xFF
        png_decode(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|IEND"):
        png_decode(good[:-8])
    with pytest.raises(ValueError):
        png_decode(good[:8])  # no chunks at all


def test_real_world_pngs_decode():
    """Files produced by ordinary PNG encoders (werkzeug debug icon,
    networkx test baseline — both 8-bit RGBA): the filters in them were
    chosen by those encoders, so decoding them exercises the unfilter
    paths against bytes we did not construct."""
    w, h, c, pix = png_decode((FIXTURES / "real_world_rgba_16x16.png").read_bytes())
    assert (w, h, c) == (16, 16, 4)
    assert len(pix) == 16 * 16 * 4
    # the icon has visible content: not all pixels identical
    assert len(set(pix)) > 4

    w2, h2, c2, pix2 = png_decode(
        (FIXTURES / "real_world_rgba_800x600.png").read_bytes())
    assert (w2, h2, c2) == (800, 600, 4)
    assert len(pix2) == 800 * 600 * 4
    # matplotlib's empty-graph baseline is overwhelmingly white
    white = sum(1 for i in range(0, len(pix2), 4) if pix2[i] == 255)
    assert white > 0.9 * 800 * 600


def test_real_image_decode_contract():
    pix = synth_pixels(10, 8, 3, variant=2)
    blob = png_encode(10, 8, 3, pix, filter_type=4)
    w, h, c, emb = real_image_decode(blob)
    assert (w, h, c) == (10, 8, 3)
    assert len(emb) == 8 and all(0.0 <= e <= 1.0 for e in emb)
    span = (10 * 8 * 3) // 8
    assert emb[0] == pytest.approx(sum(pix[:span]) / span / 255.0)
    with pytest.raises(ValueError):
        real_image_decode(b"not a png")


def test_decode_images_real_kernel(spark):
    """mapInPandas plumbing with the REAL kernel: PNG rows decode, a
    non-PNG row nulls out (ValueError contract), non-image rows filter."""
    rows = []
    for i in range(6):
        blob = png_encode(4 + i, 3, 4, synth_pixels(4 + i, 3, 4, i),
                          filter_type=i % 5)
        rows.append((f"media://img/{i}", "image", bytearray(blob),
                     "image/png", len(blob)))
    rows.append(("media://img/bad", "image", bytearray(b"GIF89a..."),
                 "image/gif", 9))
    rows.append(("media://vid/0", "video", bytearray(b"\x00" * 32),
                 "video/mp4", 32))
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, content binary, "
              "content_type string, n_bytes long")
    out = {r.media_ref: r for r in
           decode_images(media, decoder=real_image_decode).collect()}
    assert len(out) == 7  # video filtered, bad png kept as nulled row
    for i in range(6):
        r = out[f"media://img/{i}"]
        assert (r.width, r.height, r.channels) == (4 + i, 3, 4)
    assert out["media://img/bad"].width is None


def _chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def test_crc_valid_but_malformed_raises_valueerror_only():
    """Error contract (ADVICE r3): corrupt zlib inside CRC-valid IDAT and
    wrong-size IHDR bodies must raise ValueError, not zlib.error /
    struct.error — the operator handlers catch ValueError to null the
    row instead of killing the stage. Byte-fuzz can't reach these paths
    because single-byte mutations break chunk CRCs first."""
    import struct
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    iend = _chunk(b"IEND", b"")
    # CRC-valid chunks, but IDAT body is not a zlib stream
    bad_zlib = sig + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"nope") + iend
    with pytest.raises(ValueError, match="zlib"):
        png_decode(bad_zlib)
    # CRC-valid IHDR whose body is 12 bytes instead of 13
    bad_ihdr = sig + _chunk(b"IHDR", ihdr[:-1]) + iend
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(bad_ihdr)
