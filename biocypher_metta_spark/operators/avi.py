"""Uncompressed AVI (RIFF) container codec — pure stdlib.

Completes the video leg of the multimodal family the way png.py/wav.py
did for image/audio: a REAL public container format (Microsoft RIFF
'AVI ', the uncompressed-DIB profile every reference muxer can emit)
parsed with nothing but `struct`, so frame sampling runs on genuine
bytes instead of the deterministic fake in multimodal.sample_frames.

Profile supported (raise ValueError outside it — the shared modality
error contract): single 'vids' stream, BI_RGB (uncompressed) 24-bit
DIB frames in '00db'/'00dc' movi chunks, rows DWORD-aligned bottom-up
in BGR byte order exactly like BMP. That is the bit-exact subset —
no codec, no loss — so decode(encode(frames)) round-trips and integer
pixel sums are oracle-checkable.

Scale notes: payloads stay opaque binary columns; parse + sample run
inside mapInPandas (Arrow batches, multimodal.video_frame_stats), and
sampling every k-th frame touches only the sampled '00db' chunk spans
— the chunk walk is O(#frames) on offsets, not O(bytes), so a wide
stride over a long video reads headers + sampled frames only.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<14I"          # MainAVIHeader (56 bytes)
_STRH_FMT = "<4s4sIHHIIIIIIIi4H"
_BMIH_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def avi_encode(frames: list[bytes], width: int, height: int,
               fps: int = 10) -> bytes:
    """Mux top-down RGB frames (each width*height*3 bytes) into an
    uncompressed-DIB AVI: BGR byte order, DWORD-aligned rows, bottom-up,
    '00db' chunks + idx1 index — the layout stock players accept."""
    if width <= 0 or height <= 0:
        raise ValueError("avi_encode: non-positive dimensions")
    stride = _row_stride(width)
    dibs = []
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("avi_encode: frame size != width*height*3")
        rows = []
        for y in range(height - 1, -1, -1):      # bottom-up
            row = bytearray()
            for x in range(width):
                p = (y * width + x) * 3
                row += bytes((f[p + 2], f[p + 1], f[p]))  # RGB -> BGR
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        dibs.append(b"".join(rows))

    frame_bytes = stride * height
    avih = struct.pack(
        _AVIH_FMT, 1_000_000 // max(fps, 1), frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        _STRH_FMT, b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, width, height)
    bmih = struct.pack(_BMIH_FMT, 40, width, height, 1, 24, 0,
                       frame_bytes, 0, 0, 0, 0)

    def chunk(ckid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return ckid + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        body = kind + data
        return b"LIST" + struct.pack("<I", len(body)) + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_chunks = b"".join(chunk(b"00db", d) for d in dibs)
    movi = lst(b"movi", movi_chunks)
    # idx1 offsets are relative to the start of the movi list data
    idx, off = [], 4
    for d in dibs:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) % 2)
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (ckid, data_start, data_len); tolerates the trailing pad."""
    pos = start
    while pos + 8 <= end:
        ckid = buf[pos:pos + 4]
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        data = pos + 8
        if data + n > end:
            raise ValueError("AVI: chunk overruns its parent")
        yield ckid, data, n
        pos = data + n + (n % 2)


def avi_parse(content: bytes) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    """Parse headers + locate frames WITHOUT copying pixel data:
    (width, height, n_frames, fps, [(dib_start, dib_len), ...]).
    The span list is what lets sampling skip unsampled frames."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_n,) = struct.unpack_from("<I", content, 4)
    end = min(8 + riff_n, len(content))
    width = height = fps = None
    bitcount = compression = None
    spans: list[tuple[int, int]] = []
    for ckid, data, n in _walk_chunks(content, 12, end):
        if ckid != b"LIST":
            continue
        kind = content[data:data + 4]
        if kind == b"hdrl":
            for c2, d2, n2 in _walk_chunks(content, data + 4, data + n):
                if c2 == b"avih" and n2 >= 40:
                    h = struct.unpack_from(_AVIH_FMT, content, d2)
                    fps = 1_000_000 // max(h[0], 1)
                    width, height = h[8], h[9]
                elif c2 == b"LIST" and content[d2:d2 + 4] == b"strl":
                    for c3, d3, n3 in _walk_chunks(content, d2 + 4, d2 + n2):
                        if c3 == b"strf" and n3 >= 40:
                            b = struct.unpack_from(_BMIH_FMT, content, d3)
                            bitcount, compression = b[4], b[5]
        elif kind == b"movi":
            for c2, d2, n2 in _walk_chunks(content, data + 4, data + n):
                if c2 in (b"00db", b"00dc"):
                    spans.append((d2, n2))
    if width is None or not spans:
        raise ValueError("AVI: missing avih header or frames")
    if bitcount != 24 or compression != 0:
        raise ValueError("AVI: only uncompressed 24-bit DIB supported")
    expect = _row_stride(width) * height
    for _, n in spans:
        if n != expect:
            raise ValueError("AVI: frame chunk size != stride*height")
    return width, height, len(spans), fps or 0, spans


def _dib_to_rgb(buf: bytes, start: int, width: int, height: int) -> bytes:
    stride = _row_stride(width)
    out = bytearray(width * height * 3)
    for y in range(height):
        src = start + (height - 1 - y) * stride   # bottom-up -> top-down
        for x in range(width):
            s = src + x * 3
            d = (y * width + x) * 3
            out[d] = buf[s + 2]                   # BGR -> RGB
            out[d + 1] = buf[s + 1]
            out[d + 2] = buf[s]
    return bytes(out)


def avi_decode(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Full decode: (width, height, fps, top-down RGB frames)."""
    w, h, _n, fps, spans = avi_parse(content)
    return w, h, fps, [_dib_to_rgb(content, s, w, h) for s, _ in spans]


def avi_sample_frames(content: bytes, stride: int = 2,
                      max_frames: int = 8) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Every `stride`-th frame, capped: (width, height,
    [(frame_index, rgb_bytes), ...]). Only sampled DIB spans are
    converted — the skip is real, not decode-then-drop."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    w, h, n, _fps, spans = avi_parse(content)
    picks = list(range(0, n, stride))[:max_frames]
    return w, h, [(i, _dib_to_rgb(content, spans[i][0], w, h))
                  for i in picks]
