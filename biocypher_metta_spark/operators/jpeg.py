"""Pure-stdlib baseline JPEG codec for the multimodal decode kernel.

The container has no PIL/cv2, but baseline JPEG is a public spec
(ITU-T T.81 / ISO 10918-1; JFIF interchange) implementable with nothing
but stdlib math — the same approach as the PNG (operators/png.py) and
WAV (operators/wav.py) codecs. Reference repo has no media code at all
(this layer is the training-data extension, SURVEY.md §2.7 scope).

Supported subset — the shapes that dominate real ML corpora:

* decode: baseline sequential DCT (SOF0), 8-bit precision, 1 (gray) or
  3 (YCbCr->RGB) components, any sampling factors 1-2 (4:4:4 / 4:2:2 /
  4:2:0; chroma upsampled by replication), multiple DQT/DHT segments,
  16-bit quant tables, restart markers (DRI/RSTn), APPn/COM skipped.
  Progressive (SOF2), arithmetic coding, 12-bit and hierarchical modes
  are rejected with ValueError.
* encode (fixture/thumbnail path): SOF0, 4:4:4 or 4:2:0, standard
  Annex-K quantization tables, per-image canonical Huffman tables
  emitted in DHT (fixed-length codes — valid per spec, simpler than
  the Annex-K defaults, and the decoder reads DHT anyway).

Error contract (shared with png_decode/wav_decode): every malformed
input raises ValueError — the operator handlers in multimodal.py null
the row instead of killing the stage.

Throughput honesty: ~0.3 ms per thumbnail and ~2 s per megapixel-class
photo (pure-Python sparse IDCT; real-world fixture measured in
tests/test_jpeg.py). With per-batch duplicate memoization in
image_stats this serves corpus-QA/thumbnail workloads; a 100 TB photo
corpus would swap a native codec into the same sniffer seam
(sniff_image_decode) without touching the Spark plumbing. Exactness note for oracles: an
image whose pixels are CONSTANT inside each 8x8 block has only DC
coefficients; with the Annex-K DC quant step (16) and even offsets
from 128 the whole encode->decode loop is bit-exact, which is what the
multimodal_jpeg_decode gate's formula oracle relies on.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------- tables

def _zigzag_order() -> list[int]:
    out = []
    for s in range(15):
        diag = [(k, s - k) for k in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag = diag[::-1]
        out.extend(r * 8 + c for r, c in diag)
    return out


ZIGZAG = _zigzag_order()          # zigzag index -> raster index

# ITU-T T.81 Annex K.1 example quantization tables (public spec values)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_CN = [1 / math.sqrt(2)] + [1.0] * 7


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _fdct8x8(block: list[int]) -> list[float]:
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        for u in range(8):
            tmp[base + u] = (_CN[u] / 2) * sum(
                block[base + x] * _COS[u][x] for x in range(8))
    out = [0.0] * 64
    for c in range(8):
        for v in range(8):
            out[v * 8 + c] = (_CN[v] / 2) * sum(
                tmp[y * 8 + c] * _COS[v][y] for y in range(8))
    return out


def _idct8x8(coef: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for c in range(8):
        for y in range(8):
            tmp[y * 8 + c] = sum(
                (_CN[v] / 2) * coef[v * 8 + c] * _COS[v][y]
                for v in range(8))
    out = [0.0] * 64
    for r in range(8):
        base = r * 8
        for x in range(8):
            out[base + x] = sum(
                (_CN[u] / 2) * tmp[base + u] * _COS[u][x]
                for u in range(8))
    return out


# per-coefficient 2D IDCT basis (folded normalization), raster-indexed
# like the separable kernels above: coef (v*8+u) -> 64 pixel weights
_IDCT_BASIS = [
    [(_CN[v] / 2 * _COS[v][y]) * (_CN[u] / 2 * _COS[u][x])
     for y in range(8) for x in range(8)]
    for v in range(8) for u in range(8)
]


def _idct8x8_sparse(coef: list[float]) -> list[float]:
    """IDCT as a sum of per-nonzero-coefficient basis planes — the
    classic sparse decode path: quantization zeroes most AC coefs, so
    cost scales with the nonzero count (a DC-only block is one scaled
    plane) instead of the full 2x(8x8x8) separable passes. Parity with
    _idct8x8 is asserted to float precision in tests/test_jpeg.py."""
    out = None
    for k in range(64):
        c = coef[k]
        if c:
            b = _IDCT_BASIS[k]
            if out is None:
                out = [c * bv for bv in b]
            else:
                out = [o + c * bv for o, bv in zip(out, b)]
    return out if out is not None else [0.0] * 64


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _canonical_table(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Fixed-length canonical Huffman table over `symbols`: all codes of
    length L with count <= 2^L - 1 (the all-ones code stays unused, as
    the spec's example tables also arrange). Returns (BITS, HUFFVAL,
    {symbol: (code, length)})."""
    vals = sorted(symbols)
    length = max(1, (len(vals)).bit_length())
    if len(vals) > (1 << length) - 1:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {v: (i, length) for i, v in enumerate(vals)}
    return bits, vals, codes


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _quant_block(plane: list[list[float]], bx: int, by: int,
                 quant: list[int]) -> list[int]:
    """FDCT + quantize the 8x8 block at block coords (bx, by), edge-
    replicating past the plane border; returns zigzagged coefs."""
    h = len(plane)
    w = len(plane[0])
    block = []
    for y in range(8):
        row = plane[min(by * 8 + y, h - 1)]
        for x in range(8):
            block.append(row[min(bx * 8 + x, w - 1)] - 128.0)
    coefs = _fdct8x8(block)
    return [_round_half_away(coefs[ZIGZAG[i]] / quant[ZIGZAG[i]])
            for i in range(64)]


def _block_tokens(q: list[int], pred: int):
    """Huffman symbol/value tokens for one quantized-zigzag block given
    the component's DC predictor; returns (tokens, new_pred). Token =
    (kind, symbol, value); DC symbols are the bit category, AC symbols
    pack run<<4|size with 0x00 = EOB and 0xF0 = ZRL."""
    toks = []
    diff = q[0] - pred
    toks.append(("dc", _category(diff), diff))
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            toks.append(("ac", 0xF0, 0))
            run -= 16
        toks.append(("ac", (run << 4) | _category(q[i]), q[i]))
        run = 0
    if last_nz < 63:
        toks.append(("ac", 0x00, 0))
    return toks, q[0]


def jpeg_encode(width: int, height: int, channels: int, pix: bytes,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Pixels -> baseline JFIF bytes. channels 1 (gray, row-major) or
    3 (RGB interleaved). subsampling '444' or '420' (chroma averaged
    over 2x2 before encoding; gray ignores it). restart_interval > 0
    emits DRI + RSTn markers every that many MCUs."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval out of range")
    if width < 1 or height < 1:
        raise ValueError("zero-dimension image")
    if len(pix) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")

    if channels == 1:
        planes = [[[float(pix[y * width + x]) for x in range(width)]
                   for y in range(height)]]
        samps = [(1, 1)]
        quants = [QUANT_LUMA]
        qmap = [0]
    else:
        ys, cbs, crs = [], [], []
        for y in range(height):
            ry, rcb, rcr = [], [], []
            for x in range(width):
                i = (y * width + x) * 3
                yy, cb, cr = _rgb_to_ycbcr(pix[i], pix[i + 1], pix[i + 2])
                ry.append(yy)
                rcb.append(cb)
                rcr.append(cr)
            ys.append(ry)
            cbs.append(rcb)
            crs.append(rcr)
        if subsampling == "420":
            def down(p):
                oh, ow = (len(p) + 1) // 2, (len(p[0]) + 1) // 2
                out = []
                for by in range(oh):
                    row = []
                    for bx in range(ow):
                        vals = [p[min(2 * by + dy, len(p) - 1)]
                                [min(2 * bx + dx, len(p[0]) - 1)]
                                for dy in range(2) for dx in range(2)]
                        row.append(sum(vals) / 4.0)
                    out.append(row)
                return out
            planes = [ys, down(cbs), down(crs)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ys, cbs, crs]
            samps = [(1, 1), (1, 1), (1, 1)]
        quants = [QUANT_LUMA, QUANT_CHROMA]
        qmap = [0, 1, 1]

    # SCAN-ORDER tokenization: DC prediction must follow the interleaved
    # MCU walk, not per-plane raster order — for subsampled Y (2x2
    # blocks per MCU) the two orders differ. Planes are covered on the
    # MCU-aligned block grid (edge blocks replicate), restart boundaries
    # reset predictors, and the emit loop below replays the exact same
    # walk, so encoder and decoder predictors stay in lockstep.
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    scan_tokens: list[list] = []     # per MCU: [(comp_idx, tokens), ...]
    preds = [0] * channels
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i \
                    and mcu_i % restart_interval == 0:
                preds = [0] * channels
            mcu = []
            for ci in range(channels):
                hs, vs = samps[ci]
                for dy in range(vs):
                    for dx in range(hs):
                        q = _quant_block(planes[ci], mx * hs + dx,
                                         my * vs + dy, quants[qmap[ci]])
                        toks, preds[ci] = _block_tokens(q, preds[ci])
                        mcu.append((ci, toks))
            scan_tokens.append(mcu)
            mcu_i += 1

    # two table pairs max: luma (component 0) and chroma (1,2 shared)
    dc_sets = [set(), set()]
    ac_sets = [set(), set()]
    for mcu in scan_tokens:
        for ci, toks in mcu:
            t = 0 if ci == 0 else 1
            for kind, sym, _ in toks:
                (dc_sets if kind == "dc" else ac_sets)[t].add(sym)
    n_tables = 1 if channels == 1 else 2
    dc_tabs = [_canonical_table(dc_sets[t] or {0}) for t in range(n_tables)]
    ac_tabs = [_canonical_table(ac_sets[t] or {0}) for t in range(n_tables)]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)             # APP0 (density 1:1)
    for t in range(n_tables):
        zz = bytes(quants[t][ZIGZAG[i]] for i in range(64))
        out += b"\xFF\xDB" + struct.pack(">HB", 67, t) + zz
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * channels, 8,
                                     height, width, channels)
    for ci in range(channels):
        hs, vs = samps[ci]
        out += bytes((ci + 1, (hs << 4) | vs, qmap[ci]))
    for t in range(n_tables):
        for cls, (bits, vals, _) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            out += b"\xFF\xC4" + struct.pack(
                ">HB", 19 + len(vals), (cls << 4) | t) \
                + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        t = 0 if ci == 0 else 1
        out += bytes((ci + 1, (t << 4) | t))
    out += b"\x00\x3F\x00"                             # Ss/Se/Ah-Al

    bwiter = _BitWriter()
    rst = 0
    for mcu_i, mcu in enumerate(scan_tokens):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bwiter.flush()
            out += bwiter.out
            out += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            bwiter = _BitWriter()
        for ci, toks in mcu:
            t = 0 if ci == 0 else 1
            _, _, dccodes = dc_tabs[t]
            _, _, accodes = ac_tabs[t]
            for kind, sym, val in toks:
                codes = dccodes if kind == "dc" else accodes
                code, length = codes[sym]
                bwiter.write(code, length)
                size = sym if kind == "dc" else sym & 0x0F
                if size and sym != 0xF0:
                    v = val if val >= 0 else val + (1 << size) - 1
                    bwiter.write(v, size)
    bwiter.flush()
    out += bwiter.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    RSTn markers are surfaced via the `restart` flag."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("entropy data truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected restart marker mid-symbol")
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, n: int) -> None:
        """Consume the expected RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF \
                or d[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("missing restart marker")
        self.pos += 2


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    table = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if vi >= len(vals):
                raise ValueError("DHT counts exceed value list")
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JFIF bytes -> (width, height, channels, row-major pixel
    bytes). Gray stays 1 channel; YCbCr converts to RGB (3). Raises
    ValueError on anything outside the supported subset."""
    try:
        return _jpeg_decode(data)
    except (IndexError, struct.error, OverflowError) as exc:
        # error contract: slicing/unpack surprises on malformed streams
        # surface as ValueError like every explicit check
        raise ValueError(f"malformed JPEG stream: {exc}") from exc


def _jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xFF:          # fill bytes before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            raise ValueError(f"standalone marker {marker:#x} outside scan")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4:pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("segment truncated")
        if marker == 0xDB:                              # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq not in (0, 1):
                    raise ValueError("bad DQT precision")
                n = 64 * (2 if pq else 1)
                if off + n > len(seg):
                    raise ValueError("DQT truncated")
                if pq:
                    vals = list(struct.unpack_from(">64H", seg, off))
                else:
                    vals = list(seg[off:off + 64])
                table = [0] * 64
                for i in range(64):
                    table[ZIGZAG[i]] = vals[i]
                if any(v == 0 for v in table):
                    raise ValueError("zero quantizer step")
                quant[tq] = table
                off += n
        elif marker == 0xC4:                            # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1:off + 17])
                if len(bits) != 16:
                    raise ValueError("DHT truncated")
                n = sum(bits)
                vals = list(seg[off + 17:off + 17 + n])
                if len(vals) != n:
                    raise ValueError("DHT values truncated")
                huff[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + n
        elif marker == 0xC0:                            # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nf not in (1, 3):
                raise ValueError(f"{nf}-component images not supported")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension image")
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError("sampling factors beyond 2 unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:                            # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                            # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise ValueError("non-interleaved scans not supported")
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i:3 + 2 * i]
                comp = next((c for c in frame["comps"] if c["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(data, pos + 2 + seglen, frame, scan,
                                quant, huff, restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, quant, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append([0.0] * (pw * ph))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                dctab = huff.get((0, td))
                actab = huff.get((1, ta))
                qtab = quant.get(comp["tq"])
                if dctab is None or actab is None or qtab is None:
                    raise ValueError("scan references missing table")
                pw = mcux * comp["h"] * 8
                for dy in range(comp["v"]):
                    for dx in range(comp["h"]):
                        zz = [0] * 64
                        s = _decode_symbol(br, dctab)
                        if s > 11:
                            raise ValueError("DC category out of range")
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_symbol(br, actab)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63 or size == 0:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coefs = [0.0] * 64
                        for i in range(64):
                            coefs[ZIGZAG[i]] = zz[i] * qtab[ZIGZAG[i]]
                        blk = _idct8x8_sparse(coefs)
                        bx0 = (mx * comp["h"] + dx) * 8
                        by0 = (my * comp["v"] + dy) * 8
                        plane = planes[ci]
                        for y in range(8):
                            row = (by0 + y) * pw + bx0
                            for x in range(8):
                                plane[row + x] = blk[y * 8 + x] + 128.0
            mcu_i += 1

    if len(comps) == 1:
        pw = mcux * comps[0]["h"] * 8
        out = bytearray(w * h)
        plane = planes[0]
        for y in range(h):
            base = y * pw
            orow = y * w
            for x in range(w):
                out[orow + x] = min(255, max(0, _round_half_away(
                    plane[base + x])))
        return w, h, 1, bytes(out)

    out = bytearray(w * h * 3)
    pws = [mcux * c["h"] * 8 for c in comps]
    for y in range(h):
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                sy = y * c["v"] // vmax
                sx = x * c["h"] // hmax
                vals.append(planes[ci][sy * pws[ci] + sx])
            yy, cb, cr = vals
            r = _round_half_away(yy + 1.402 * (cr - 128.0))
            g = _round_half_away(yy - 0.344136 * (cb - 128.0)
                                 - 0.714136 * (cr - 128.0))
            b = _round_half_away(yy + 1.772 * (cb - 128.0))
            i = (y * w + x) * 3
            out[i] = min(255, max(0, r))
            out[i + 1] = min(255, max(0, g))
            out[i + 2] = min(255, max(0, b))
    return w, h, 3, bytes(out)


def jpeg_resize(data: bytes, width: int, height: int,
                subsampling: str = "444") -> bytes:
    """REAL resize kernel, the JPEG twin of png.png_resize: decode ->
    nearest-neighbor sample -> re-encode. Nearest-neighbor keeps every
    output pixel equal to SOME source pixel, so on the bit-exact
    constant-block subset a 2x upscale stays block-constant and an
    oracle can value-check the resized output from the source formula
    (each target 8x8 block samples a 4x4 source region, which never
    crosses a source block boundary)."""
    if width <= 0 or height <= 0:
        raise ValueError("target dimensions must be positive")
    w, h, c, pix = jpeg_decode(data)
    out = bytearray(width * height * c)
    for y in range(height):
        srow = (y * h // height) * w * c
        drow = y * width * c
        for x in range(width):
            s = srow + (x * w // width) * c
            d = drow + x * c
            out[d:d + c] = pix[s:s + c]
    return jpeg_encode(width, height, c, bytes(out), subsampling=subsampling)
