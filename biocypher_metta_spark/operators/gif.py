"""Pure-stdlib GIF (GIF87a/GIF89a) codec — palette + LZW.

GIF is the fourth stdlib-decodable image format in the sniffing chain
(after PNG, baseline JPEG and 24-bit BMP) and the first one whose
pixel stream is entropy-coded with LZW: variable-width codes (up to 12
bits) packed LSB-first into <=255-byte data sub-blocks, a dynamic
string table rebuilt on CLEAR codes, and the KwKwK special case where
a code references the entry being defined.  The decoder composites the
FIRST image descriptor onto the logical screen (background-filled,
supporting partial-rect frames and the 4-pass interlace row order) and
returns top-down RGB — animated continuations after the first frame
are ignored, matching the corpus-QA reading of image_stats.

Reference provenance: the reference repo has no media handling at all;
this exists for the engine's multimodal-column mandate (decode /
feature-extract over opaque binary columns).  Format layout per the
public GIF89a specification (CompuServe, 1990).
"""

from __future__ import annotations

import struct

_MAX_CODE_BITS = 12
_TABLE_LIMIT = 1 << _MAX_CODE_BITS          # 4096

# 4-pass interlace: (start row, step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(height: int) -> list:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


class _BitWriter:
    """LSB-first variable-width code packer (the GIF bit order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, restarts the table when it would
    pass 4096 entries, widens the code one bit whenever the next
    emission could reference the just-defined entry (the KwKwK case
    makes that reachable immediately)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh():
        return {(None, i): i for i in range(clear)}, eoi + 1, \
            min_code_size + 1

    table, next_code, code_size = fresh()
    bw.write(clear, code_size)
    w = None
    for c in indices:
        if w is None:
            w = table[(None, c)]
            continue
        k = (w, c)
        if k in table:
            w = table[k]
            continue
        bw.write(w, code_size)
        if next_code < _TABLE_LIMIT:
            table[k] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 \
                    and code_size < _MAX_CODE_BITS:
                code_size += 1
        else:                                   # table full: restart
            bw.write(clear, code_size)
            table, next_code, code_size = fresh()
        w = table[(None, c)]
    if w is not None:
        bw.write(w, code_size)
    bw.write(eoi, code_size)
    return bw.finish()


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytearray:
    """Inverse of _lzw_encode, tolerant of deferred-clear streams
    (table frozen at 4096 until the encoder sends CLEAR)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"LZW min code size {min_code_size} invalid")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev = None
    acc = nbits = pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:                   # must be a root index
                raise ValueError("GIF LZW first code out of table")
            out += table[code]
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):                    # KwKwK
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("GIF LZW code out of table")
        out += entry
        if len(table) < _TABLE_LIMIT:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << code_size) \
                    and code_size < _MAX_CODE_BITS:
                code_size += 1
        prev = code
        if len(out) > expect:
            raise ValueError("GIF pixel data overruns image size")
    if len(out) != expect:
        raise ValueError(
            f"GIF pixel data short: {len(out)} of {expect} indices")
    return out


def gif_encode(width: int, height: int, rgb: bytes,
               interlace: bool = False) -> bytes:
    """Top-down RGB bytes -> single-frame GIF89a.  The palette is the
    first-seen-order set of distinct colors; more than 256 raises (a
    quantizer is a separate concern — the codec is exact)."""
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    palette = {}
    indices = bytearray()
    for p in range(0, len(rgb), 3):
        c = rgb[p:p + 3]
        idx = palette.get(c)
        if idx is None:
            idx = palette.setdefault(c, len(palette))
            if len(palette) > 256:
                raise ValueError("more than 256 distinct colors "
                                 "(GIF needs a quantizer first)")
        indices.append(idx)
    k = 0
    while (2 << k) < max(len(palette), 2):
        k += 1                                  # table size = 2^(k+1)
    mcs = max(2, k + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF0 | k, 0, 0)
    for c, _ in sorted(palette.items(), key=lambda kv: kv[1]):
        out += c
    out += b"\x00\x00\x00" * ((2 << k) - len(palette))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    if interlace:
        reordered = bytearray()
        for y in _interlaced_row_order(height):
            reordered += indices[y * width:(y + 1) * width]
        indices = reordered
    out.append(mcs)
    lzw = _lzw_encode(indices, mcs)
    for p in range(0, len(lzw), 255):
        chunk = lzw[p:p + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block payload")
        parts.append(data[pos:pos + n])
        pos += n


def gif_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """GIF bytes -> (width, height, 3, top-down RGB of the logical
    screen with the first frame composited).  Raises ValueError on
    malformed streams per the modality error contract."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (
            b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw < 1 or sh < 1:
        raise ValueError("degenerate GIF screen size")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF global color table")
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    if gct is not None and bg < len(gct) // 3:
        bg_rgb = gct[3 * bg:3 * bg + 3]
    else:
        bg_rgb = b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (sw * sh))
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF (no trailer)")
        block = data[pos]
        pos += 1
        if block == 0x3B:                       # trailer before a frame
            raise ValueError("GIF has no image data")
        if block == 0x21:                       # extension: skip
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1                            # label
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB",
                                                        data, pos)
        pos += 9
        if iw < 1 or ih < 1 or left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame rect outside logical screen")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated GIF local color table")
            ct = data[pos:pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF (no LZW min code size)")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        indices = _lzw_decode(lzw, mcs, iw * ih)
        rows = (_interlaced_row_order(ih) if ipacked & 0x40
                else range(ih))
        n_colors = len(ct) // 3
        src = 0
        for y in rows:
            base = ((top + y) * sw + left) * 3
            for x in range(iw):
                idx = indices[src]
                src += 1
                if idx >= n_colors:
                    raise ValueError("GIF pixel index outside palette")
                d = base + x * 3
                canvas[d:d + 3] = ct[3 * idx:3 * idx + 3]
        return sw, sh, 3, bytes(canvas)
