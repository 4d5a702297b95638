"""Round-5ah operator: Unicode script profiling
(operators/text.script_profile) against Python's unicodedata-free
range math and the generated DuckDB twin."""

import duckdb
import pytest

from biocypher_metta_spark.operators.text import (
    SCRIPT_RANGES,
    script_profile,
    script_profile_sql,
)


def _brute(text):
    counts = {name: 0 for name in SCRIPT_RANGES}
    for ch in text:
        cp = ord(ch)
        for name, ranges in SCRIPT_RANGES.items():
            if any(lo <= cp <= hi for lo, hi in ranges):
                counts[name] += 1
                break                      # ranges are disjoint
    n_letters = sum(counts.values())
    best = max(counts.items(),
               key=lambda kv: (kv[1], -list(SCRIPT_RANGES).index(kv[0])))
    if best[1] == 0:
        return n_letters, "none", 0
    return n_letters, best[0], 1000 * best[1] // n_letters


def _profile(spark, docs):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {r["doc_id"]: (r["n_letters"], r["script"],
                          r["script_permille"])
            for r in script_profile(df).collect()}


DOCS = [
    ("en", "The quick brown fox! 123"),
    ("ru", "Съешь же ещё этих мягких французских булок"),
    ("zh", "汉字是世界上最古老的文字之一 plus some latin"),
    ("ja", "ひらがなとカタカナと漢字"),
    ("ar", "النص العربي هنا"),
    ("el", "Ελληνικό κείμενο"),
    ("ko", "한국어 텍스트"),
    ("th", "ข้อความภาษาไทย"),
    ("mixed", "abc где 你好"),
    ("none", "12345 !!! ..."),
    ("empty", ""),
]


def test_script_profile_vs_brute(spark):
    got = _profile(spark, DOCS)
    for doc_id, text in DOCS:
        assert got[doc_id] == _brute(text), (doc_id, got[doc_id])


def test_dominant_scripts_sensible(spark):
    got = _profile(spark, DOCS)
    assert got["en"][1] == "latin"
    assert got["ru"][1] == "cyrillic"
    assert got["zh"][1] == "cjk"
    assert got["ar"][1] == "arabic"
    assert got["ko"][1] == "hangul"
    assert got["th"][1] == "thai"
    assert got["none"] == (0, "none", 0)
    assert got["empty"] == (0, "none", 0)
    # ja: kana majority over the two kanji
    assert got["ja"][1] == "kana"


def test_tie_break_declaration_order(spark):
    # equal latin and cyrillic counts -> latin (declared first)
    got = _profile(spark, [("tie", "ab аб")])
    assert got["tie"] == (4, "latin", 500)


def test_twin_agrees(spark):
    got = _profile(spark, DOCS)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", DOCS)
    duck = {d: (n, s, p) for d, n, s, p in con.execute(
        script_profile_sql("SELECT doc_id, text FROM t")).fetchall()}
    assert duck == got
