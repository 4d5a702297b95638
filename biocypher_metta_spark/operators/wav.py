"""Pure-stdlib WAV (RIFF/WAVE) codec for the audio modality.

Like operators/png.py for images, this closes the "audio decode is a
stub" gap without any media library: canonical PCM WAV is a public spec
(RIFF container, 'fmt ' + 'data' chunks) parseable with struct alone.
Supported: PCM (format tag 1) at 8-bit unsigned and 16-bit signed
little-endian, plus IEEE-float (format tag 3, 32-bit, round 4) scaled
to the int16 range; any channel count/sample rate, extra chunks (LIST,
fact, ...) skipped per the RIFF rules (chunks are word-aligned; odd-sized
chunks carry a pad byte). Anything else raises ValueError, which the
mapInPandas operators null out row-by-row.

The encoder exists for fixtures and round-trip tests: encode -> decode
must reproduce the exact sample values, which the oracle gate verifies
from the sample FORMULA (entry_queries.multimodal_wav_decode).
"""

from __future__ import annotations

import struct


def wav_encode(samples: list[int], sample_rate: int = 8000,
               n_channels: int = 1, bits: int = 16) -> bytes:
    """Interleaved integer samples -> canonical PCM WAV bytes.

    16-bit: signed values in [-32768, 32767]; 8-bit: signed values in
    [-128, 127], stored unsigned (+128) per the WAV convention.
    len(samples) must be a multiple of n_channels.
    """
    if bits not in (8, 16, 32):
        raise ValueError(f"bits={bits} unsupported (PCM 8/16, float 32)")
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples not a whole number of frames")
    bytes_per_sample = bits // 8
    block_align = n_channels * bytes_per_sample
    byte_rate = sample_rate * block_align
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        # IEEE-float storage (format tag 3): int16-range samples map to
        # normalized [-1, 1] floats — the inverse of the decode scaling,
        # so integer samples round-trip exactly through float32
        data = struct.pack(f"<{len(samples)}f",
                           *[s / 32767.0 for s in samples])
    tag = 1 if bits != 32 else 3
    fmt = struct.pack("<HHIIHH", tag, n_channels, sample_rate, byte_rate,
                      block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, int, list[int]]:
    """WAV bytes -> (n_channels, sample_rate, bits, interleaved samples).

    Samples are signed ints regardless of storage width (8-bit unsigned
    storage re-centers to [-128, 127]; float32 storage scales to the
    int16 range), so downstream stats are width-independent. Raises
    ValueError on anything that is not a PCM 8/16-bit or IEEE-float32
    RIFF/WAVE stream.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(8 + riff_size, len(data))
    pos = 12
    fmt = None
    pcm = None
    fact_frames = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        cstart = pos + 8
        if cstart + csize > len(data):
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", data, cstart)
        elif cid == b"data":
            pcm = data[cstart:cstart + csize]
        elif cid == b"fact" and csize >= 4:
            fact_frames = struct.unpack_from("<I", data, cstart)[0]
        pos = cstart + csize + (csize & 1)  # odd chunks carry a pad byte
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    tag, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if tag not in (1, 3, 7, 17):
        raise ValueError(f"format tag {tag} unsupported "
                         "(PCM/float/mu-law/IMA-ADPCM only)")
    if sample_rate < 1:
        raise ValueError("sample_rate must be >= 1")
    if tag == 17:
        # IMA/DVI ADPCM (compressed speech corpora): 4-bit nibbles in
        # self-contained blocks; the fact chunk carries the frame count
        if bits != 4:
            raise ValueError(f"IMA ADPCM must be 4-bit, got {bits}")
        if n_channels != 1:
            raise ValueError("IMA ADPCM: mono only")
        if fact_frames is None:
            raise ValueError("IMA ADPCM WAV missing fact chunk")
        samples = adpcm_decode(pcm, block_align, fact_frames)
    elif tag == 7:
        # G.711 mu-law (telephony/speech corpora): one byte per
        # sample, expanded by the closed-form integer formula
        if bits != 8:
            raise ValueError(f"mu-law WAV must be 8-bit, got {bits}")
        samples = [ulaw_decode_sample(b) for b in pcm]
    elif tag == 3:
        # IEEE-float WAV (the other format real audio corpora contain):
        # normalized [-1, 1] float32 samples scale to the int16 range so
        # downstream stats stay width-independent like the 8-bit path
        if bits != 32:
            raise ValueError(f"float WAV must be 32-bit, got {bits}")
        n = len(pcm) // 4
        floats = struct.unpack_from(f"<{n}f", pcm)
        samples = []
        for f in floats:
            if f != f or f in (float("inf"), float("-inf")):
                raise ValueError("non-finite float sample")
            v = int(round(f * 32767.0))
            samples.append(max(-32768, min(32767, v)))
    elif bits == 8:
        samples = [b - 128 for b in pcm]
    elif bits == 16:
        n = len(pcm) // 2
        samples = list(struct.unpack_from(f"<{n}h", pcm))
    else:
        raise ValueError(f"bits={bits} unsupported (PCM 8/16 only)")
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("data chunk not a whole number of frames")
    return n_channels, sample_rate, bits, samples


def wav_resample(data: bytes, target_rate: int) -> bytes:
    """REAL resample kernel: decode -> zero-order-hold (nearest frame)
    -> re-encode at target_rate. Output frame count is
    floor(n_frames * target_rate / rate); frame i samples source frame
    i * rate // target_rate — every output sample equals some input
    sample, so formula oracles verify resampled streams exactly."""
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")
    ch, rate, bits, samples = wav_decode(data)
    n_frames = len(samples) // ch
    out_frames = (n_frames * target_rate) // rate
    out: list[int] = []
    for i in range(out_frames):
        si = min(i * rate // target_rate, n_frames - 1)
        out.extend(samples[si * ch:(si + 1) * ch])
    return wav_encode(out, target_rate, ch, bits)


# ---------------------------------------------------------------- mu-law
# ITU-T G.711 mu-law companding (format tag 7): telephony and classic
# speech corpora (e.g. 8 kHz call audio) ship in it. Both directions
# are closed-form integer arithmetic — no tables — so an oracle can
# recompute decode(encode(s)) straight from a sample formula in SQL.

_ULAW_BIAS = 0x84     # 132
_ULAW_CLIP = 32635


def ulaw_encode_sample(sample: int) -> int:
    """Linear int16 -> one mu-law byte (G.711)."""
    sign = 0x80 if sample < 0 else 0
    mag = min(-sample if sample < 0 else sample, _ULAW_CLIP) + _ULAW_BIAS
    exp = mag.bit_length() - 8          # mag >= 132 -> in [0, 7]
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def ulaw_decode_sample(byte: int) -> int:
    """One mu-law byte -> linear int16-range value (the G.711 expand
    formula lands in [-32124, 32124] directly — the audioop width-2
    convention — so mu-law streams are loudness-comparable with the
    PCM paths)."""
    u = ~byte & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return -mag if sign else mag


def wav_encode_ulaw(samples: list[int], sample_rate: int = 8000,
                    n_channels: int = 1) -> bytes:
    """Interleaved linear int16 samples -> G.711 mu-law WAV (format
    tag 7, 8 bits stored). Lossy by design: decode returns the
    companded quantization of the input, exactly
    ulaw_decode_sample(ulaw_encode_sample(s))."""
    if n_channels < 1 or len(samples) % n_channels:
        raise ValueError("samples not a whole number of frames")
    data = bytes(ulaw_encode_sample(s) for s in samples)
    fmt = struct.pack("<HHIIHH", 7, n_channels, sample_rate,
                      sample_rate * n_channels, n_channels, 8)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def ulaw_quantize_sql(sample_expr: str) -> str:
    """SQL (DuckDB) expression computing
    ulaw_decode_sample(ulaw_encode_sample(s)) for a BIGINT sample
    expression — the companded quantization as one branch-per-
    exponent CASE, generated from the same constants as the Python
    kernel so oracle and codec cannot drift."""
    m = f"(least(abs({sample_expr}), {_ULAW_CLIP}) + {_ULAW_BIAS})"
    arms = []
    for e in range(8):
        mag = (f"(((({m} // {1 << (e + 3)}) % 16) * 8 + {_ULAW_BIAS})"
               f" * {1 << e} - {_ULAW_BIAS})")
        if e < 7:
            arms.append(f"WHEN {m} < {1 << (8 + e)} THEN {mag}")
        else:
            arms.append(f"ELSE {mag}")
    case = "CASE " + " ".join(arms) + " END"
    return (f"(CASE WHEN {sample_expr} < 0 THEN -({case}) "
            f"ELSE ({case}) END)")


# IMA/DVI ADPCM (WAV format tag 17): 4-bit differential coding with
# the public 89-entry step table — the classic compressed-speech WAV
# variant (4:1 vs int16). Mono blocks: a 4-byte header (predictor
# int16, step index uint8, reserved 0) whose predictor IS the block's
# first output sample, then two samples per byte, LOW nibble first.
# References: IMA Digital Audio Focus Group recommendation (1992) and
# the Microsoft WAVE IMA-ADPCM registration; tables are verbatim from
# the public spec.

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nibble: int, pred: int, index: int) -> tuple[int, int]:
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble]))
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> int:
    """Pick the nibble whose decoded step lands nearest below sample -
    the spec's successive-approximation encoder."""
    step = IMA_STEP_TABLE[index]
    delta = sample - pred
    nibble = 0
    if delta < 0:
        nibble = 8
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


def wav_encode_adpcm(samples: list[int], sample_rate: int = 8000,
                     block_align: int = 256) -> bytes:
    """Mono int16 samples -> IMA ADPCM WAV (format tag 17, 4 bits).
    Lossy by design; decode returns exactly the decoder's
    reconstruction of the encoder's nibble stream.  `block_align` is
    the compressed block size in bytes (>= 8, multiple of 4); the
    final partial block zero-pads its nibbles and the required
    `fact` chunk records the true frame count for the decoder."""
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be >= 8 and a multiple of 4")
    if not samples:
        raise ValueError("need at least one sample")
    spb = (block_align - 4) * 2 + 1        # samples per full block
    blocks = bytearray()
    pred, index = 0, 0
    pos = 0
    while pos < len(samples):
        chunk = samples[pos:pos + spb]
        pos += spb
        pred = max(-32768, min(32767, int(chunk[0])))
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            nib = _ima_encode_sample(int(s), pred, index)
            pred, index = _ima_decode_nibble(nib, pred, index)
            nibbles.append(nib)
        while len(nibbles) < spb - 1:
            nibbles.append(_ima_encode_sample(pred, pred, index))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 17, 1, sample_rate, byte_rate,
                      block_align, 4, 2, spb)
    fact = struct.pack("<I", len(samples))
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", len(fact)) + fact
            + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks))
    if len(blocks) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(pcm: bytes, block_align: int, n_frames: int) -> list[int]:
    """IMA ADPCM data-chunk bytes -> int16 samples (mono), trimmed to
    the fact-chunk frame count."""
    spb = (block_align - 4) * 2 + 1
    out = []
    pos = 0
    while pos < len(pcm) and len(out) < n_frames:
        if pos + block_align > len(pcm):
            raise ValueError("truncated ADPCM block")
        pred, index, _r = struct.unpack_from("<hBB", pcm, pos)
        if index > 88:
            raise ValueError(f"ADPCM step index {index} out of range")
        out.append(pred)
        for b in pcm[pos + 4:pos + block_align]:
            for nib in (b & 0x0F, b >> 4):
                pred, index = _ima_decode_nibble(nib, pred, index)
                out.append(pred)
        pos += block_align
    if len(out) < n_frames:
        raise ValueError(
            f"ADPCM data short: {len(out)} of {n_frames} frames")
    return out[:n_frames]
