"""Pure-stdlib TIFF codec (8-bit RGB, none/PackBits, II and MM byte
orders) — roundtrip, fuzz, and malformed-stream tests.

Independence argument: the PackBits encoder chooses runs vs literals
while the decoder replays control bytes — separately written paths —
and the IFD writer lays out offsets the reader must re-derive through
the tag table, in BOTH byte orders, so exact roundtrips over strip
splits and both compressions check the two directions against each
other."""

import random
import struct

import pytest

from biocypher_metta_spark.operators.tiff import (
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
)


def formula_rgb(w, h, n_colors=64):
    pal = [((i * 11) % 256, (i * 57) % 256, (i * 199) % 256)
           for i in range(n_colors)]
    return b"".join(bytes(pal[(x * 7 + y * 13) % n_colors])
                    for y in range(h) for x in range(w))


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rows_per_strip", [0, 1, 4])
def test_roundtrip_matrix(big_endian, packbits, rows_per_strip):
    for w, h in [(1, 1), (13, 9), (2, 31)]:
        rgb = formula_rgb(w, h)
        blob = tiff_encode(w, h, rgb, packbits=packbits,
                           rows_per_strip=rows_per_strip,
                           big_endian=big_endian)
        assert tiff_decode(blob) == (w, h, 3, rgb)
        assert blob[:2] == (b"MM" if big_endian else b"II")


def test_packbits_kernel_fuzz():
    rng = random.Random(5)
    for _ in range(300):
        data = bytearray()
        while len(data) < rng.randrange(0, 400):
            if rng.random() < 0.5:
                data += bytes([rng.randrange(256)]) * rng.randrange(1, 200)
            else:
                data += bytes(rng.randrange(256)
                              for _ in range(rng.randrange(1, 20)))
        data = bytes(data)
        assert packbits_decode(packbits_encode(data), len(data)) == data


def test_packbits_compresses_runs_and_noop():
    # equal-channel pixels -> byte runs -> real compression
    solid = bytes([77, 77, 77]) * (100 * 60)
    blob = tiff_encode(100, 60, solid, packbits=True)
    assert len(blob) < len(solid) // 10
    # interleaved distinct channels defeat byte RLE (documented:
    # PackBits is byte-oriented; no predictor in scope)
    assert packbits_decode(b"\x80\x01\x41\x42", 2) == b"AB"  # 128 noop


def test_packbits_malformed():
    with pytest.raises(ValueError, match="literal"):
        packbits_decode(b"\x05\x41", 6)
    with pytest.raises(ValueError, match="repeat"):
        packbits_decode(b"\xfe", 3)
    with pytest.raises(ValueError, match="expected"):
        packbits_decode(b"\x00\x41", 5)


def test_malformed_tiff_streams():
    good = tiff_encode(6, 4, formula_rgb(6, 4))
    for bad in [b"", b"II", b"XX" + good[2:], good[:10], good[:-4]]:
        with pytest.raises(ValueError):
            tiff_decode(bad)
    # wrong magic number
    bo = struct.pack("<H", 43)
    with pytest.raises(ValueError, match="magic"):
        tiff_decode(b"II" + bo + good[4:])
    # unsupported compression id
    blob = bytearray(good)
    i = blob.index(struct.pack("<HH", 259, 3))
    blob[i + 8:i + 10] = struct.pack("<H", 5)   # LZW: out of scope
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(blob))


def test_encode_validation():
    with pytest.raises(ValueError):
        tiff_encode(0, 4, b"")
    with pytest.raises(ValueError):
        tiff_encode(2, 2, b"\x00" * 5)


def test_sniff_chain_routes_tiff():
    from biocypher_metta_spark.operators.multimodal import (
        sniff_image_decode,
    )

    rgb = formula_rgb(7, 5)
    for be in (False, True):
        blob = tiff_encode(7, 5, rgb, packbits=True, big_endian=be)
        assert sniff_image_decode(blob) == (7, 5, 3, rgb)
