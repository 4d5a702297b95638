"""Pure-stdlib TIFF codec — 8-bit RGB, uncompressed and PackBits.

TIFF is the fifth stdlib-decodable image format in the sniffing chain
and the first with BOTH byte orders in the wild ('II' little-endian
and 'MM' big-endian headers): a fixed 8-byte header pointing at an
IFD of 12-byte tagged entries, pixel data in row strips, optionally
compressed with PackBits — the byte-oriented RLE (control byte n:
0..127 copy n+1 literals, 129..255 repeat the next byte 257-n times,
128 no-op) from the TIFF 6.0 specification (Adobe, 1992; public).

Scope: 8-bit/sample, 3 samples/pixel (RGB), PhotometricInterpretation
RGB, chunky planar config, compression 1 (none) or 32773 (PackBits).
Anything else raises ValueError per the modality error contract.

Reference provenance: the reference repo has no media handling; this
exists for the engine's multimodal-column mandate.
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284


def packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 PackBits: literal runs and repeat runs (>= 3 equal
    bytes flips to a repeat; runs cap at 128)."""
    def run_at(i: int) -> int:
        r = 1
        while i + r < len(data) and r < 128 and data[i + r] == data[i]:
            r += 1
        return r

    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        r = run_at(i)
        if r >= 3:
            out.append(257 - r)
            out.append(data[i])
            i += r
            continue
        lit = i
        while i < n and i - lit < 128 and run_at(i) < 3:
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        c = data[i]
        i += 1
        if c == 128:                      # no-op
            continue
        if c < 128:
            if i + c + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[i:i + c + 1]
            i += c + 1
        else:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expect:
        raise ValueError(
            f"PackBits output {len(out)} != expected {expect}")
    return bytes(out)


def tiff_encode(width: int, height: int, rgb: bytes,
                packbits: bool = False, rows_per_strip: int = 0,
                big_endian: bool = False) -> bytes:
    """Top-down RGB bytes -> single-IFD TIFF ('II' or 'MM' order)."""
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip if rows_per_strip >= 1 else height
    strips = []
    for y0 in range(0, height, rps):
        raw = rgb[y0 * width * 3:min(y0 + rps, height) * width * 3]
        strips.append(packbits_encode(raw) if packbits else raw)
    n_entries = 10
    # layout: header(8) | IFD | bits array(6) | strip offset/count
    # arrays (if >1 strip) | strip data
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    bits_off = after_ifd
    arr_off = bits_off + 6
    n = len(strips)
    if n > 1:
        so_off, sc_off = arr_off, arr_off + 4 * n
        data_off = arr_off + 8 * n
    else:
        so_off = sc_off = 0
        data_off = arr_off
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def entry(tag, typ, count, value):
        return struct.pack(bo + "HHI", tag, typ, count) + value

    def long_v(v):
        return struct.pack(bo + "I", v)

    def short_v(v):
        return struct.pack(bo + "HH", v, 0)

    entries = [
        entry(_TAG_WIDTH, 4, 1, long_v(width)),
        entry(_TAG_HEIGHT, 4, 1, long_v(height)),
        entry(_TAG_BITS, 3, 3, long_v(bits_off)),
        entry(_TAG_COMPRESSION, 3, 1,
              short_v(32773 if packbits else 1)),
        entry(_TAG_PHOTOMETRIC, 3, 1, short_v(2)),
        entry(_TAG_STRIP_OFFSETS, 4, n,
              long_v(offs[0] if n == 1 else so_off)),
        entry(_TAG_SAMPLES, 3, 1, short_v(3)),
        entry(_TAG_ROWS_PER_STRIP, 4, 1, long_v(rps)),
        entry(_TAG_STRIP_COUNTS, 4, n,
              long_v(len(strips[0]) if n == 1 else sc_off)),
        entry(_TAG_PLANAR, 3, 1, short_v(1)),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II")
    out += struct.pack(bo + "HI", 42, ifd_off)
    out += struct.pack(bo + "H", n_entries)
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)            # no next IFD
    out += struct.pack(bo + "HHH", 8, 8, 8)    # bits per sample
    if n > 1:
        for o in offs:
            out += struct.pack(bo + "I", o)
        for s in strips:
            out += struct.pack(bo + "I", len(s))
    for s in strips:
        out += s
    return bytes(out)


def _read_values(data: bytes, bo: str, typ: int, count: int,
                 raw: bytes) -> list:
    size = {3: 2, 4: 4}.get(typ)
    if size is None:
        raise ValueError(f"TIFF value type {typ} unsupported")
    fmt = {3: "H", 4: "I"}[typ]
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        off = struct.unpack(bo + "I", raw)[0]
        if off + total > len(data):
            raise ValueError("TIFF value array out of bounds")
        buf = data[off:off + total]
    return list(struct.unpack(bo + str(count) + fmt, buf))


def tiff_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """TIFF bytes -> (width, height, 3, top-down RGB bytes)."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF stream")
    bo = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    n_entries = struct.unpack_from(bo + "H", data, ifd_off)[0]
    if ifd_off + 2 + n_entries * 12 + 4 > len(data):
        raise ValueError("truncated TIFF IFD entries")
    tags = {}
    for k in range(n_entries):
        off = ifd_off + 2 + k * 12
        tag, typ, count = struct.unpack_from(bo + "HHI", data, off)
        tags[tag] = (typ, count, data[off + 8:off + 12])
    def val(tag, default=None):
        if tag not in tags:
            if default is not None:
                return [default]
            raise ValueError(f"TIFF missing required tag {tag}")
        typ, count, raw = tags[tag]
        return _read_values(data, bo, typ, count, raw)

    width = val(_TAG_WIDTH)[0]
    height = val(_TAG_HEIGHT)[0]
    comp = val(_TAG_COMPRESSION, 1)[0]
    photo = val(_TAG_PHOTOMETRIC)[0]
    samples = val(_TAG_SAMPLES, 1)[0]
    bits = val(_TAG_BITS, 8)
    planar = val(_TAG_PLANAR, 1)[0]
    if width < 1 or height < 1:
        raise ValueError("degenerate TIFF size")
    if photo != 2 or samples != 3 or planar != 1 or \
            any(b != 8 for b in bits):
        raise ValueError(
            "only 8-bit chunky RGB TIFF supported "
            f"(photometric={photo}, samples={samples}, bits={bits})")
    if comp not in (1, 32773):
        raise ValueError(f"TIFF compression {comp} unsupported "
                         "(none and PackBits only)")
    rps = val(_TAG_ROWS_PER_STRIP, height)[0]
    offs = val(_TAG_STRIP_OFFSETS)
    counts = val(_TAG_STRIP_COUNTS)
    if len(offs) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    out = bytearray()
    remaining = height
    for o, c in zip(offs, counts):
        if o + c > len(data):
            raise ValueError("TIFF strip out of bounds")
        rows = min(rps, remaining)
        remaining -= rows
        raw = data[o:o + c]
        expect = rows * width * 3
        if comp == 32773:
            out += packbits_decode(raw, expect)
        else:
            if len(raw) != expect:
                raise ValueError("TIFF strip size mismatch")
            out += raw
    if len(out) != width * height * 3:
        raise ValueError("TIFF pixel data incomplete")
    return width, height, 3, bytes(out)
