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
        pos = cstart + csize + (csize & 1)  # odd chunks carry a pad byte
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    tag, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if tag not in (1, 3, 7):
        raise ValueError(f"format tag {tag} unsupported "
                         "(PCM/float/mu-law only)")
    if sample_rate < 1:
        raise ValueError("sample_rate must be >= 1")
    if tag == 7:
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
