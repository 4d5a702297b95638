"""Uncompressed-AVI codec (operators/avi.py): round-trip exactness,
DIB layout handling (bottom-up, BGR, DWORD row padding), frame-span
sampling, and the parse error contract under truncation/corruption."""

import struct

import pytest

from biocypher_metta_spark.operators.avi import (
    avi_decode, avi_encode, avi_parse, avi_sample_frames)


def _formula_frame(w, h, f):
    return bytes(((x * 7 + y * 13 + ch * 29 + f * 31) % 256)
                 for y in range(h) for x in range(w) for ch in range(3))


def test_round_trip_exact():
    frames = [_formula_frame(5, 4, f) for f in range(3)]
    blob = avi_encode(frames, 5, 4, fps=12)
    w, h, fps, got = avi_decode(blob)
    assert (w, h, fps) == (5, 4, 12)
    assert got == frames


def test_dib_layout_is_really_undone():
    """A single asymmetric pixel proves bottom-up + BGR are reversed:
    encode a frame that is black except RGB=(1,2,3) at (x=1, y=0) —
    in the DIB it must land in the LAST row as bytes (3,2,1)."""
    w, h = 3, 2
    frame = bytearray(w * h * 3)
    frame[3:6] = bytes((1, 2, 3))      # pixel (1, 0)
    blob = avi_encode([bytes(frame)], w, h)
    # raw DIB bytes inside the container: stride = 12 (w*3=9 padded)
    _, _, _, _, spans = avi_parse(blob)
    s, n = spans[0]
    dib = blob[s:s + n]
    assert n == 12 * 2
    assert dib[12 + 3:12 + 6] == bytes((3, 2, 1))   # bottom row, BGR
    assert dib[9:12] == b"\x00\x00\x00"             # row padding
    _, _, _, frames = avi_decode(blob)
    assert frames[0] == bytes(frame)


def test_sampling_skips_and_caps():
    frames = [_formula_frame(4, 3, f) for f in range(7)]
    blob = avi_encode(frames, 4, 3)
    w, h, got = avi_sample_frames(blob, stride=2, max_frames=3)
    assert (w, h) == (4, 3)
    assert [i for i, _ in got] == [0, 2, 4]
    assert all(rgb == frames[i] for i, rgb in got)
    with pytest.raises(ValueError):
        avi_sample_frames(blob, stride=0)


def test_error_contract():
    blob = avi_encode([_formula_frame(4, 3, 0)], 4, 3)
    with pytest.raises(ValueError):
        avi_parse(b"RIFF\x00\x00\x00\x00WAVE")      # wrong form type
    with pytest.raises(ValueError):
        avi_parse(blob[:20])                        # truncated headers
    with pytest.raises(ValueError):
        avi_encode([b"\x00" * 5], 4, 3)             # bad frame size
    # corrupt the strf bitcount -> unsupported profile, clean raise
    i = blob.index(b"strf")
    bad = bytearray(blob)
    struct.pack_into("<H", bad, i + 8 + 14, 8)      # biBitCount = 8
    with pytest.raises(ValueError):
        avi_parse(bytes(bad))


def test_truncation_fuzz_never_crashes_uncontrolled():
    """Every prefix either parses (impossible here) or raises ValueError
    — never IndexError/struct.error leaking out of the contract."""
    blob = avi_encode([_formula_frame(4, 3, f) for f in range(2)], 4, 3)
    for cut in range(0, len(blob), 7):
        try:
            avi_parse(blob[:cut])
        except ValueError:
            pass
