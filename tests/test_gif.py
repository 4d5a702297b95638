"""Pure-stdlib GIF codec (palette + real LZW) — roundtrip and
adversarial-stream tests.

Independence argument: the encoder builds the string table from
(prefix_code, byte) pairs walking forward while the decoder rebuilds
it from emitted codes one step behind (the spec's mirrored dynamics,
including the KwKwK self-reference and the 12-bit table restart), so
an exact roundtrip over runs, noise past 4096 table entries, and both
interlace modes checks the two independently-written table evolutions
against each other byte-for-byte."""

import random
import struct

import pytest

from biocypher_metta_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
)


def palette_pixels(w: int, h: int, n_colors: int, variant: int = 0) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            i = (x * 7 + y * 13 + variant * 29) % n_colors
            out += bytes(((i * 11) % 256, (i * 57) % 256,
                          (i * 199) % 256))
    return bytes(out)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("w,h,n_colors", [(13, 9, 40), (8, 11, 3),
                                          (31, 2, 256)])
def test_roundtrip_shapes_and_palettes(w, h, n_colors, interlace):
    pix = palette_pixels(w, h, n_colors)
    blob = gif_encode(w, h, pix, interlace=interlace)
    assert gif_decode(blob) == (w, h, 3, pix)


def test_roundtrip_extremes_and_runs():
    # 1x1, single row/column, and a long single-color run (the KwKwK
    # chain: every emitted code references the entry being defined)
    for w, h in [(1, 1), (9, 1), (1, 9)]:
        pix = palette_pixels(w, h, 5)
        assert gif_decode(gif_encode(w, h, pix)) == (w, h, 3, pix)
    run = bytes([7, 99, 42]) * (40 * 30)
    assert gif_decode(gif_encode(40, 30, run))[3] == run


def test_roundtrip_table_overflow():
    # 2-color noise at 200x150 drives the LZW table past 4096 entries,
    # forcing the encoder's CLEAR/restart and the decoder's resync
    rng = random.Random(3)
    pix = b"".join(b"\xff\x00\x00" if rng.randrange(2) else
                   b"\x00\x00\xff" for _ in range(200 * 150))
    blob = gif_encode(200, 150, pix)
    assert len(blob) < len(pix)                 # actually compressed
    assert gif_decode(blob) == (200, 150, 3, pix)


def test_lzw_kernel_widths_and_deferred_clear():
    # kernel-level: every min code size, incl. streams the encoder
    # CLEARs mid-way; decoder must also tolerate a full-table stream
    rng = random.Random(11)
    for mcs in (2, 4, 8):
        idx = bytes(rng.randrange(1 << mcs) for _ in range(5000))
        enc = _lzw_encode(idx, mcs)
        assert bytes(_lzw_decode(enc, mcs, len(idx))) == idx


def test_256_colors_and_too_many_raise():
    pix = palette_pixels(32, 8, 256)
    assert gif_decode(gif_encode(32, 8, pix)) == (32, 8, 3, pix)
    over = b"".join(bytes(((i * 131) % 256, (i * 17) % 256, i // 256))
                    for i in range(300))
    with pytest.raises(ValueError, match="256 distinct colors"):
        gif_encode(30, 10, over)
    with pytest.raises(ValueError):
        gif_encode(2, 2, b"\x00" * 5)           # wrong byte count


def test_partial_frame_composites_on_background():
    # hand-build: 4x3 screen, GCT {bg=green, red}, 2x1 frame at (1,1)
    gct = b"\x00\xff\x00" + b"\xff\x00\x00" + b"\x00\x00\x00" * 2
    lzw = _lzw_encode(bytes([1, 1]), 2)
    blob = (b"GIF89a" + struct.pack("<HHBBB", 4, 3, 0x81, 0, 0) + gct
            + struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 1, 0) + bytes([2])
            + bytes([len(lzw)]) + lzw + b"\x00\x3B")
    w, h, c, pix = gif_decode(blob)
    assert (w, h, c) == (4, 3, 3)
    rows = [pix[i * 12:(i + 1) * 12] for i in range(3)]
    assert rows[0] == b"\x00\xff\x00" * 4       # untouched background
    assert rows[1] == (b"\x00\xff\x00" + b"\xff\x00\x00" * 2
                       + b"\x00\xff\x00")
    assert rows[2] == b"\x00\xff\x00" * 4


def test_malformed_streams_raise():
    good = gif_encode(6, 4, palette_pixels(6, 4, 9))
    for bad in [b"", b"GIF8", b"NOTGIF" + good[6:],
                good[:20],                       # truncated mid-table
                good[:-2],                       # cut sub-block term
                good[:-6]]:                      # cut mid-LZW data
        with pytest.raises(ValueError):
            gif_decode(bad)
    # frame rect escaping the logical screen
    gct = b"\x00\x00\x00" * 4
    lzw = _lzw_encode(bytes([0]), 2)
    blob = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0) + gct
            + struct.pack("<BHHHHB", 0x2C, 2, 0, 1, 1, 0) + bytes([2])
            + bytes([len(lzw)]) + lzw + b"\x00\x3B")
    with pytest.raises(ValueError, match="outside logical screen"):
        gif_decode(blob)


def test_sniff_chain_routes_gif():
    from biocypher_metta_spark.operators.multimodal import (
        sniff_image_decode,
    )

    pix = palette_pixels(7, 5, 12)
    assert sniff_image_decode(gif_encode(7, 5, pix)) == (7, 5, 3, pix)
