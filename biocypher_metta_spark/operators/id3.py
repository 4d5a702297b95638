"""ID3v2 tag parsing — audio metadata as typed rows.

The multimodal mandate treats media as opaque binary plus TYPED
metadata; for audio corpora the metadata container is ID3v2 prepended
to the stream (informal standard, id3.org): a 10-byte header ('ID3',
version, flags, SYNCSAFE 28-bit size), then frames of (4-char id,
size, 2 flag bytes, payload).  Text frames (T***) carry an encoding
byte — 0 ISO-8859-1, 1 UTF-16 with BOM, 3 UTF-8 — and the string.
Frame sizes are big-endian plain in v2.3 and syncsafe in v2.4 (the
version byte decides — both are real in the wild).

Scope: v2.3/v2.4 text frames; unknown/binary frames are skipped
structurally (their size still walks); compressed/unsynchronised tags
raise per the modality error contract.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("ID3 syncsafe byte with high bit set")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(payload: bytes) -> str:
    if not payload:
        raise ValueError("empty ID3 text frame")
    enc, body = payload[0], payload[1:]
    if enc == 0:
        s = body.decode("latin-1")
    elif enc == 1:
        s = body.decode("utf-16")          # BOM-driven
    elif enc == 3:
        s = body.decode("utf-8")
    else:
        raise ValueError(f"ID3 text encoding {enc} unsupported")
    return s.split("\x00", 1)[0]


def id3_tags(data: bytes) -> list:
    """ID3v2 bytes -> [(frame_id, text)] for the text frames, in file
    order.  Raises ValueError on malformed/unsupported streams."""
    if len(data) < 10 or data[:3] != b"ID3":
        raise ValueError("not an ID3v2 stream")
    ver, _rev, flags = data[3], data[4], data[5]
    if ver not in (3, 4):
        raise ValueError(f"ID3v2.{ver} unsupported (v2.3/v2.4 only)")
    if flags & 0x80:
        raise ValueError("ID3 unsynchronised tag unsupported")
    tag_size = _syncsafe(data[6:10])
    end = 10 + tag_size
    if end > len(data):
        raise ValueError("truncated ID3 tag")
    out = []
    pos = 10
    while pos + 10 <= end:
        fid = data[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":     # padding
            break
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"bad ID3 frame id {fid!r}")
        raw = data[pos + 4:pos + 8]
        size = _syncsafe(raw) if ver == 4 else \
            struct.unpack(">I", raw)[0]
        pos += 10
        if pos + size > end:
            raise ValueError("ID3 frame overruns tag")
        if fid.startswith(b"T"):
            out.append((fid.decode("ascii"),
                        _decode_text(data[pos:pos + size])))
        pos += size
    return out


ID3_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_id", StringType()),
    StructField("text", StringType()),
])


def id3_frames(media: DataFrame) -> DataFrame:
    """Audio rows -> one row per ID3 text frame (media_ref, frame_id,
    text); undecodable rows null out as a single (media_ref, NULL,
    NULL) row per the modality error contract (same shape as the
    decode operators — the caller filters or inspects)."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                try:
                    frames = id3_tags(blob)
                except ValueError:
                    rows.append((ref, None, None))
                    continue
                if not frames:
                    rows.append((ref, None, None))
                for fid, text in frames:
                    rows.append((ref, fid, text))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_id",
                                              "text"])

    return (media.filter(F.col("kind") == "audio")
            .select("media_ref", "content")
            .mapInPandas(batches, ID3_SCHEMA))


def id3_encode(frames: list, version: int = 3) -> bytes:
    """[(frame_id, text)] -> ID3v2.3/2.4 bytes (UTF-8 text frames in
    v2.4, ISO-8859-1 in v2.3) — fixtures and round-trip tests."""
    if version not in (3, 4):
        raise ValueError("version must be 3 or 4")
    body = bytearray()
    for fid, text in frames:
        if len(fid) != 4 or not fid.startswith("T"):
            raise ValueError(f"bad text frame id {fid!r}")
        if version == 4:
            payload = b"\x03" + text.encode("utf-8")
        else:
            payload = b"\x00" + text.encode("latin-1")
        raw_size = (_syncsafe_enc(len(payload)) if version == 4
                    else struct.pack(">I", len(payload)))
        body += fid.encode("ascii") + raw_size + b"\x00\x00" + payload
    return (b"ID3" + bytes([version, 0, 0])
            + _syncsafe_enc(len(body)) + bytes(body))


def _syncsafe_enc(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("ID3 size too large for syncsafe encoding")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
