"""Round-5ae operators: WebVTT cue parsing and cue->frame alignment
(operators/subtitles) against hand-built fixtures and the DuckDB
twin."""

import duckdb
import pytest

from biocypher_metta_spark.operators.subtitles import (
    align_cues_to_frames,
    vtt_cues,
    vtt_cues_sql,
)

VTT = """WEBVTT

1
00:00:01.000 --> 00:00:04.000
Hello world

00:01:05.500 --> 01:01:00,250 align:start
Second cue line1
line2

badline without timing

00:00:09.000 --> 00:00:08.000
negative duration drops

00:00:10.000 --> 00:00:11.000
"""


def _cues(spark, docs):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {(r["doc"], r["cue_idx"], r["start_ms"], r["end_ms"],
             r["cue_text"]) for r in vtt_cues(df).collect()}


def test_vtt_hand_fixture(spark):
    got = _cues(spark, [("d1", VTT)])
    # cue 0: plain; cue 1: optional hours + comma separator + settings
    # + multiline text; cue 2 drops (negative duration); the trailing
    # block with no text drops; the id-line "1" is not part of text
    assert got == {
        ("d1", 0, 1000, 4000, "Hello world"),
        ("d1", 1, 65500, 3660250, "Second cue line1\nline2"),
    }


def test_vtt_crlf_and_empty(spark):
    crlf = VTT.replace("\n", "\r\n")
    assert _cues(spark, [("d2", crlf)]) == {
        ("d2", 0, 1000, 4000, "Hello world"),
        ("d2", 1, 65500, 3660250, "Second cue line1\nline2"),
    }
    assert _cues(spark, [("d3", "WEBVTT\n\nno cues here")]) == set()


def test_vtt_twin_agrees(spark):
    docs = [("d1", VTT), ("d2", VTT.replace("\n", "\r\n")),
            ("d3", "WEBVTT\n\nnothing")]
    got = _cues(spark, docs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    duck = set(map(tuple, con.execute(
        vtt_cues_sql("SELECT doc_id, text FROM t")).fetchall()))
    assert duck == got


def test_align_cues_to_frames(spark):
    cues = vtt_cues(spark.createDataFrame([("m1", VTT)],
                                          "doc_id string, text string"))
    frames = spark.createDataFrame(
        [("m1", 0, 500), ("m1", 1, 1000), ("m1", 2, 3999),
         ("m1", 3, 4000), ("m1", 4, 70000), ("m2", 0, 2000)],
        "media_ref string, frame_idx long, frame_ms long")
    out = align_cues_to_frames(cues, frames, bucket=1000)
    got = {(r["media_ref"], r["frame_idx"], r["cue_idx"])
           for r in out.collect()}
    # half-open [start, end): 1000 and 3999 match cue 0, 4000 does
    # not; 70000 is inside cue 1; m2 has no cues
    assert got == {("m1", 1, 0), ("m1", 2, 0), ("m1", 4, 1)}
