"""Round-5aj operator: ID3v2 tag parsing (operators/id3) — kernel
roundtrips across both frame-size conventions, all three text
encodings, and the Spark operator's null-row error contract."""

import struct

import pytest

from biocypher_metta_spark.operators.id3 import (
    _syncsafe_enc,
    id3_encode,
    id3_frames,
    id3_tags,
)


def test_roundtrip_both_versions():
    frames = [("TIT2", "My Title"), ("TPE1", "Artist"), ("TRCK", "7"),
              ("TALB", "An Album")]
    for ver in (3, 4):
        assert id3_tags(id3_encode(frames, version=ver)) == frames


def test_utf8_and_utf16_and_null_terminator():
    # v2.4 utf-8 with non-latin text
    frames = [("TIT2", "Съешь же ещё"), ("TPE1", "汉字")]
    assert id3_tags(id3_encode(frames, version=4)) == frames
    # hand-built v2.3 frame with encoding 1 (UTF-16 + BOM)
    payload = b"\x01" + "Ünïcode".encode("utf-16")
    body = (b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00"
            + payload)
    blob = b"ID3" + bytes([3, 0, 0]) + _syncsafe_enc(len(body)) + body
    assert id3_tags(blob) == [("TIT2", "Ünïcode")]
    # text after a NUL terminator is dropped (spec: terminated string)
    payload = b"\x00Title\x00junk"
    body = (b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00"
            + payload)
    blob = b"ID3" + bytes([3, 0, 0]) + _syncsafe_enc(len(body)) + body
    assert id3_tags(blob) == [("TIT2", "Title")]


def test_non_text_frames_skip_and_padding_stops():
    # a binary APIC-like frame is walked over, not emitted
    apic = b"APIC" + struct.pack(">I", 5) + b"\x00\x00" + b"\xff" * 5
    tit = b"TIT2" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00ab"
    body = apic + tit + b"\x00" * 8            # trailing padding
    blob = b"ID3" + bytes([3, 0, 0]) + _syncsafe_enc(len(body)) + body
    assert id3_tags(blob) == [("TIT2", "ab")]


def test_malformed_raise():
    good = id3_encode([("TIT2", "x")], version=3)
    for bad in [b"", b"ID3", b"ID3\x02\x00\x00\x00\x00\x00\x00",
                good[:-2], b"XXX" + good[3:]]:
        with pytest.raises(ValueError):
            id3_tags(bad)
    # unsynchronised flag
    blob = bytearray(good)
    blob[5] |= 0x80
    with pytest.raises(ValueError, match="unsynchronised"):
        id3_tags(bytes(blob))
    with pytest.raises(ValueError):
        id3_encode([("XIT2", "not a text frame")])


def test_spark_operator_rows_and_null_contract(spark):
    from pyspark.sql import functions as F

    blobs = [id3_encode([("TIT2", "A"), ("TRCK", "1")], version=4),
             b"ID3\x02\x00\x00\x00\x00\x00\x00"]
    media = spark.createDataFrame(
        [("m0", "audio", bytearray(blobs[0])),
         ("m1", "audio", bytearray(blobs[1])),
         ("m2", "image", bytearray(blobs[0]))],
        "media_ref string, kind string, content binary")
    got = {(r["media_ref"], r["frame_id"], r["text"])
           for r in id3_frames(media).collect()}
    assert got == {("m0", "TIT2", "A"), ("m0", "TRCK", "1"),
                   ("m1", None, None)}        # m2 filtered (not audio)
