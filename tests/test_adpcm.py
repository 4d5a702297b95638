"""IMA/DVI ADPCM codec (wav.py format tag 17) kernel tests.

Independence argument: the encoder quantizes by successive
approximation against the step table while the decoder reconstructs
by the additive recurrence — separately written paths — so encode ->
decode exactness of the SHARED state trajectory is what roundtrip
checks; the gate's recursive-CTE twin re-implements the decoder a
third time in SQL."""

import math
import struct

import pytest

from biocypher_metta_spark.operators.wav import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    _ima_decode_nibble,
    adpcm_decode,
    wav_decode,
    wav_encode_adpcm,
)


def test_tables_are_the_public_spec():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[88] == 32767
    assert IMA_INDEX_TABLE[:8] == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_decode_nibble_recurrence_by_hand():
    # index 0 -> step 7, nibble 0b0101: bit0 adds step>>2, bit2 adds
    # the full step -> diff = (7>>3) + (7>>2) + 7 = 0 + 1 + 7 = 8
    pred, idx = _ima_decode_nibble(0b0101, 100, 0)
    assert pred == 100 + (7 >> 3) + (7 >> 2) + 7 == 108
    assert idx == max(0, 0 + IMA_INDEX_TABLE[0b0101])
    # sign nibble 8 negates; index clamps at 0 and 88
    pred, idx = _ima_decode_nibble(0b1000, 0, 0)
    assert pred == -(7 >> 3) and idx == 0
    _, idx = _ima_decode_nibble(0b0111, 0, 88)
    assert idx == 88


def test_roundtrip_deterministic_and_tracks_signal():
    samples = [int(12000 * math.sin(i / 9)) for i in range(2000)]
    blob = wav_encode_adpcm(samples, 8000, block_align=64)
    nc, sr, bits, out = wav_decode(blob)
    assert (nc, sr, bits) == (1, 8000, 4)
    assert len(out) == len(samples)
    assert wav_decode(wav_encode_adpcm(samples, 8000, 64))[3] == out
    # after the first block's adaptation the coder tracks the signal:
    # mean abs error well under 10% of the amplitude
    tail = list(zip(samples, out))[200:]
    mae = sum(abs(a - b) for a, b in tail) / len(tail)
    assert mae < 1200, mae
    # compression is real: 4 bits vs 16 plus headers
    assert len(blob) < len(samples)


def test_fact_chunk_trims_partial_final_block():
    spb = (32 - 4) * 2 + 1
    for n in (1, spb - 1, spb, spb + 1, 3 * spb + 5):
        samples = [((i * 7919) % 4001) - 2000 for i in range(n)]
        out = wav_decode(wav_encode_adpcm(samples, 8000, 32))[3]
        assert len(out) == n
        assert out[0] == samples[0]        # header carries sample 0


def test_first_sample_clamps_and_block_header_exact():
    out = wav_decode(wav_encode_adpcm([40000, 0, 0], 8000, 32))[3]
    assert out[0] == 32767                 # int16 clamp in the header
    spb = (32 - 4) * 2 + 1
    samples = [0] * spb + [31000, 30000, 29000]
    out = wav_decode(wav_encode_adpcm(samples, 8000, 32))[3]
    assert out[spb] == 31000               # block 2 header is exact


def test_validation_and_malformed():
    with pytest.raises(ValueError):
        wav_encode_adpcm([], 8000)
    with pytest.raises(ValueError):
        wav_encode_adpcm([1], 8000, block_align=6)
    blob = bytearray(wav_encode_adpcm([0] * 100, 8000, 32))
    with pytest.raises(ValueError, match="truncated ADPCM block"):
        adpcm_decode(bytes(blob)[-10:], 32, 100)
    with pytest.raises(ValueError, match="step index"):
        bad = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 28
        adpcm_decode(bad, 32, 5)
    # strip the fact chunk -> decoder must refuse
    i = bytes(blob).index(b"fact")
    nofact = bytes(blob)[:i] + bytes(blob)[i + 12:]
    with pytest.raises(ValueError, match="fact"):
        wav_decode(nofact)
