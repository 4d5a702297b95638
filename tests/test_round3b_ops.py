"""Round-3b operators: stdlib WAV codec, cross-corpus line dedup,
tf-idf top-k, Gopher repetition filters, deterministic hash split and
LSH dup clustering.

Two layers: kernel/operator unit tests against Python-computed
expectations, plus an adversarial-corpus cross-engine sweep that runs
each new gate's Spark query against its exact DuckDB oracle SQL over a
RANDOMIZED documents table — the driver gate only ever sees the fixed
testdata corpus, so this is what catches corpus-shape-dependent
divergence (tie-breaks, empty windows, shared-line ordering).
"""

from __future__ import annotations

import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from biocypher_metta_spark.operators import dedup as dd
from biocypher_metta_spark.operators import text as tx
from biocypher_metta_spark.operators.wav import wav_decode, wav_encode

# ---------------------------------------------------------------- WAV kernel


def test_wav_round_trip_widths_and_channels():
    rng = random.Random(7)
    for bits in (8, 16):
        lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
        for ch in (1, 2, 3):
            for n_frames in (0, 1, 5, 64):
                s = [rng.randint(lo, hi) for _ in range(n_frames * ch)]
                ch2, rate2, bits2, s2 = wav_decode(
                    wav_encode(s, 11025, ch, bits))
                assert (ch2, rate2, bits2, s2) == (ch, 11025, bits, s)


def test_wav_extra_chunks_skipped_and_odd_pad():
    s = [1, -2, 3]
    data = wav_encode(s, 8000, 1, 16)
    # splice a LIST chunk with an ODD size (forces the word-align pad
    # rule) between 'WAVE' and 'fmt '
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert wav_decode(spliced) == (1, 8000, 16, s)
    # 8-bit odd-length data chunk gets its own pad byte on encode
    odd = wav_encode([5, 6, 7], 8000, 1, 8)
    assert len(odd) % 2 == 0
    assert wav_decode(odd) == (1, 8000, 8, [5, 6, 7])


def test_wav_rejects_malformed():
    good = wav_encode([0, 1], 8000, 1, 16)
    for bad in [
        b"",
        b"RIFX" + good[4:],                      # wrong magic
        good[:4] + good[4:8] + b"WAVX" + good[12:],
        good[:20] + struct.pack("<H", 3) + good[22:],  # float format tag
        good[:-3],                               # truncated data chunk
    ]:
        with pytest.raises(ValueError):
            wav_decode(bad)
    with pytest.raises(ValueError):
        wav_encode([0], 8000, 1, 24)             # 24-bit unsupported
    with pytest.raises(ValueError):
        wav_encode([0, 1, 2], 8000, 2, 16)       # ragged frames
    # sample_rate=0 in a structurally-valid fmt chunk (ADVICE r3): must
    # be ValueError here, not ZeroDivisionError later in wav_resample
    zero_rate = bytearray(good)
    struct.pack_into("<I", zero_rate, good.index(b"fmt ") + 8 + 4, 0)
    with pytest.raises(ValueError, match="sample_rate"):
        wav_decode(bytes(zero_rate))


def test_wav_decode_fuzz_never_crashes():
    """Seeded byte fuzz: mutated/truncated/garbage streams must either
    decode or raise ValueError — no IndexError/struct.error leaks from
    the chunk walker (the error contract audio_stats relies on)."""
    rng = random.Random(20260818)
    base = wav_encode([rng.randint(-3000, 3000) for _ in range(24)], 8000, 2, 16)
    for _ in range(300):
        mode = rng.random()
        if mode < 0.3:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(60)))
        elif mode < 0.6:
            data = base[:rng.randrange(len(base) + 1)]
        else:
            b = bytearray(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            data = bytes(b)
        try:
            ch, rate, bits, samples = wav_decode(data)
            assert ch >= 1 and bits in (8, 16)
        except ValueError:
            pass


def test_png_decode_fuzz_never_crashes():
    """Same contract as the WAV fuzz: mutated/truncated/garbage PNG
    streams must decode or raise ValueError — image_stats catches only
    ValueError, so any other exception type would crash the stage."""
    from biocypher_metta_spark.operators.png import png_decode, png_encode

    rng = random.Random(20260819)
    base = png_encode(8, 6, 3, bytes(((x * 3 + y * 5 + c) % 256)
                                     for y in range(6) for x in range(8)
                                     for c in range(3)), filter_type=2)
    for _ in range(400):
        mode = rng.random()
        if mode < 0.3:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        elif mode < 0.6:
            data = base[:rng.randrange(len(base) + 1)]
        else:
            b = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            data = bytes(b)
        try:
            w, h, c, pix = png_decode(data)
            assert len(pix) == w * h * c
        except ValueError:
            pass


def test_audio_stats_nulls_undecodable_rows(spark):
    from biocypher_metta_spark.operators import multimodal as mm

    payload = wav_encode([10, -20], 8000, 1, 16)
    media = spark.createDataFrame(
        [("a", "audio", bytearray(payload)),
         ("b", "audio", bytearray(b"not a wav")),
         ("c", "image", bytearray(payload))],
        "media_ref string, kind string, content binary")
    rows = {r.media_ref: r for r in mm.audio_stats(media).collect()}
    assert set(rows) == {"a", "b"}  # image row filtered, not nulled
    assert rows["a"].n_samples == 2 and rows["a"].peak_abs == 20
    assert rows["a"].sum_sq == 100 + 400
    assert rows["b"].n_samples is None and rows["b"].sum_sq is None


def test_png_resize_and_wav_resample_kernels():
    from biocypher_metta_spark.operators.png import (png_decode, png_encode,
                                                     png_resize)
    from biocypher_metta_spark.operators.wav import wav_resample

    pix = bytes(((x * 7 + y * 13 + ch * 29) % 256)
                for y in range(6) for x in range(8) for ch in range(3))
    w, h, c, p = png_decode(png_resize(png_encode(8, 6, 3, pix), 5, 4))
    assert (w, h, c) == (5, 4, 3)
    for y in range(4):
        for x in range(5):
            for ch in range(3):
                sx, sy = (x * 8) // 5, (y * 6) // 4
                assert p[(y * 5 + x) * 3 + ch] == (sx * 7 + sy * 13 + ch * 29) % 256
    with pytest.raises(ValueError):
        png_resize(png_encode(2, 2, 1, bytes(4)), 0, 1)
    # zero-order hold down/up + stereo frame integrity
    data = wav_encode([10, 20, 30, 40, 50, 60, 70, 80], 8000, 1, 16)
    assert wav_decode(wav_resample(data, 4000))[3] == [10, 30, 50, 70]
    assert wav_decode(wav_resample(data, 16000))[1] == 16000
    st = wav_encode([1, -1, 2, -2, 3, -3, 4, -4], 8000, 2, 16)
    assert wav_decode(wav_resample(st, 4000))[3] == [1, -1, 3, -3]
    with pytest.raises(ValueError):
        wav_resample(data, 0)


def test_resize_and_resample_operators(spark):
    from biocypher_metta_spark.operators import multimodal as mm
    from biocypher_metta_spark.operators.png import png_decode, png_encode

    png = png_encode(8, 6, 3, bytes(range(144)))
    wav = wav_encode(list(range(0, 80, 10)), 8000, 1, 16)
    media = spark.createDataFrame(
        [("p", "image", bytearray(png), 0), ("junk", "image", bytearray(b"xx"), 0),
         ("a", "audio", bytearray(wav), 0)],
        "media_ref string, kind string, content binary, n_bytes long")
    rz = {r.media_ref: r for r in mm.resize_images(
        media.filter(F.col("kind") == "image"), 4, 3).collect()}
    assert png_decode(bytes(rz["p"].content))[:3] == (4, 3, 3)  # REAL path
    assert rz["junk"].n_bytes == max(4 * 3 // 8, 1)             # fake fallback
    rs = {r.media_ref: r for r in mm.resample_audio(media, 4000).collect()}
    assert set(rs) == {"a"}
    assert wav_decode(bytes(rs["a"].content))[3] == [0, 20, 40, 60]


# ----------------------------------------------------------- line dedup


def test_line_dedup_first_occurrence_semantics(spark):
    docs = [
        (0, "shared one\nunique a\nshared two"),
        (1, "shared one\nunique b"),
        (2, "shared two\nshared one"),          # fully deduped away
        (3, "  \nunique c\n\nshared one"),      # blank lines dropped
    ]
    out = {r.doc_id: r for r in dd.line_dedup(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}
    assert set(out) == {0, 1, 3}                # doc 2 vanishes entirely
    assert out[0].text == "shared one\nunique a\nshared two"
    assert (out[0].n_lines, out[0].n_kept) == (3, 3)
    assert out[1].text == "unique b"
    assert (out[1].n_lines, out[1].n_kept) == (2, 1)
    assert out[3].text == "unique c"
    assert (out[3].n_lines, out[3].n_kept) == (2, 1)


# ------------------------------------------------- tf-idf / split / repeats


def test_tfidf_topk_ranking_and_determinism(spark):
    docs = [(0, "apple apple banana cherry"),
            (1, "banana cherry cherry date"),
            (2, "apple date date date")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tx.tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) == 2 for v in by_doc.values())
    # doc 0: apple tf=2 df=2 -> 1000000//2*2; banana/cherry tf=1 df=2 tie
    top0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert top0[0].token == "apple" and top0[0].score == 1000000
    assert top0[1].token == "banana"            # tie broken by token asc
    top2 = sorted(by_doc[2], key=lambda r: r.rank)
    assert top2[0].token == "date" and top2[0].tf == 3 and top2[0].doc_freq == 2


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "x y z w")], "doc_id long, text string")
    out = {r.doc_id: r for r in tx.repetition_stats(df).collect()}
    # doc 0: 2-grams [a a, a a, a b] -> 1 dup of 3; top token a=3 of 4
    assert out[0].n_tokens == 4
    assert out[0].dup2_permille == 333
    assert out[0].top_tok_permille == 750
    assert out[1].dup2_permille == 0 and out[1].top_tok_permille == 250


def test_pack_sequential_matches_naive_cumsum(spark):
    rng = random.Random(11)
    docs = [(i, " ".join("w" for _ in range(rng.randint(1, 40))))
            for i in range(0, 700, 3)]  # non-contiguous ids
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in
           tx.pack_sequential(df, budget=64, bucket_rows=37).collect()}
    run = 0
    for i, text in docs:  # naive single-stream reference
        n = len(text.split())
        assert out[i].n_tokens == n
        assert out[i].start_offset == run
        assert out[i].pack_id == run // 64
        run += n
    assert len({r.pack_id for r in out.values()}) > 3


def test_pack_sequential_plan_has_no_global_window(spark):
    """The corpus-wide prefix sum must NOT collapse the corpus onto one
    reducer: the only SinglePartition exchange allowed in the plan is the
    one feeding the window over the per-bucket TOTALS (post-aggregate,
    corpus_rows/bucket_rows rows), i.e. every SinglePartition exchange
    must sit above a HashAggregate."""
    df = spark.range(50_000).select(
        F.col("id").alias("doc_id"), F.lit("a b c d").alias("text"))
    out = tx.pack_sequential(df, budget=64, bucket_rows=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        below = plan[m.start():m.start() + 2000]
        assert "HashAggregate" in below, plan[:3000]
    assert "BroadcastHashJoin" in plan  # offsets join back broadcast


def test_cdc_chunks_boundary_stability_under_prefix_edit(spark):
    """The CDC property: chunk boundaries are content-defined, so
    inserting a prefix changes only chunks up to the first surviving
    boundary — all later chunk hashes are identical. (Fixed-width
    chunking would shift every chunk.) Also: chunks must tile the doc
    exactly."""
    rng = random.Random(99)
    text = " ".join("w%d" % rng.randrange(1000) for _ in range(300))
    df = spark.createDataFrame(
        [(0, text), (1, "EDITED PREFIX " + text), (2, ""), (3, "tiny")],
        "doc_id long, text string")
    rows = dd.cdc_chunks(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in (0, 1):
        ch = sorted(by_doc[d], key=lambda r: r.chunk_no)
        assert sum(c.chunk_len for c in ch) == len(text) + (14 if d else 0)
        assert all(c.chunk_len > 0 for c in ch)
    h0 = [c.chunk_hash for c in sorted(by_doc[0], key=lambda r: r.chunk_no)]
    h1 = [c.chunk_hash for c in sorted(by_doc[1], key=lambda r: r.chunk_no)]
    assert len(h0) >= 3, "need several chunks for a meaningful test"
    # every original chunk except (at most) the first reappears verbatim
    assert set(h0[1:]) <= set(h1)
    assert 2 not in by_doc                   # empty doc -> no chunks
    assert by_doc[3][0].chunk_len == 4       # sub-window doc = one chunk


def test_contamination_hits_counts_distinct_shared_ngrams(spark):
    ev = spark.createDataFrame(
        [(900, "the quick brown fox jumps"),
         (901, "pack my box with five dozen")],
        "doc_id long, text string")
    tr = spark.createDataFrame(
        [(0, "she saw the quick brown fox jumps high the quick brown fox"),
         (1, "pack my box again and pack my box"),
         (2, "completely unrelated text with no overlap at all")],
        "doc_id long, text string")
    out = {r.doc_id: r.n_hits for r in
           dd.contamination_hits(tr, ev, n=3).collect()}
    # doc 0 shares 3-grams: "the quick brown","quick brown fox","brown fox jumps"
    # (distinct — the repeated "the quick brown fox" does not double-count)
    assert out[0] == 3
    assert out[1] == 1                       # "pack my box", once
    assert 2 not in out                      # clean docs are absent


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b+c@x-y.co.uk now +1 555 123 4567 at 192.168.0.1 ok"),
         (1, "no pii here, just 1.2 numbers and @ signs"),
         (2, "two mails a@b.io c@d.org")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in tx.scrub_pii(df).collect()}
    assert (out[0].n_email, out[0].n_ipv4, out[0].n_phone) == (1, 1, 1)
    assert out[0].text == "mail <email> now <phone> at <ipv4> ok"
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (0, 0, 0)
    assert out[1].text == "no pii here, just 1.2 numbers and @ signs"
    assert out[2].n_email == 2 and out[2].text == "two mails <email> <email>"


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    out = tx.hash_split(df)
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert 3400 <= counts["train"] <= 3800
    assert 100 <= counts["val"] <= 320 and 100 <= counts["test"] <= 320
    again = {(r.doc_id, r.split) for r in tx.hash_split(df).collect()}
    assert again == {(r.doc_id, r.split) for r in out.collect()}
    other = {r.doc_id: r.split
             for r in tx.hash_split(df, salt="exp2").collect()}
    base = dict((r.doc_id, r.split) for r in out.collect())
    assert any(other[i] != base[i] for i in other)  # salt re-draws


# ------------------------------------------------------------ plan audit


def test_plan_audit_catches_antipatterns(spark):
    """The audit (tools/plan_audit.py) flags 0/63 gates — prove that is
    not vacuous: it must flag a cartesian product, a row-at-a-time
    Python UDF, and a global no-partition window over full input."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit", str(__import__("pathlib").Path(__file__).parent.parent
                          / "tools" / "plan_audit.py"))
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    cross_flags = pa.audit_plan(plan_of(a.crossJoin(b)))
    assert {"cartesian-product", "nested-loop-join"} & set(cross_flags)

    from pyspark.sql.types import LongType
    slow = F.udf(lambda v: v + 1, LongType())
    assert "row-at-a-time-python-udf" in pa.audit_plan(
        plan_of(a.select(slow("x"))))

    from pyspark.sql.window import Window
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    assert "single-partition-exchange-over-full-input" in pa.audit_plan(
        plan_of(a.withColumn("c", F.sum("x").over(w))))

    # and the two-level pack plan stays clean
    from biocypher_metta_spark.operators import text as txo
    df = spark.range(5000).select(F.col("id").alias("doc_id"),
                                  F.lit("a b c").alias("text"))
    assert pa.audit_plan(plan_of(txo.pack_sequential(df, 64, bucket_rows=500))) == []


# ------------------------------------------------------------- knn join


def test_knn_join_exact_dots_and_twin_rank1(spark):
    """Planted exact twins: an identical vector always shares the
    query's sketch bucket, so it MUST come back at rank 1 with the
    maximal dot; and every returned dot must equal the Python integer
    dot (the scoring is exact — only candidate coverage is approximate)."""
    from biocypher_metta_spark.operators import similarity as sim

    rng = random.Random(42)
    dim = 16

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    qs = [(100 + i, vec()) for i in range(6)]
    corpus_rows = [(i, vec()) for i in range(60)] + \
        [(1000 + qid, v) for qid, v in qs]          # exact twins
    queries = spark.createDataFrame(
        [(q, v) for q, v in qs], "q_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>")
    out = sim.knn_join(queries, corpus, dim=dim, k=4, n_planes=4).collect()

    # expected dots via the same quantize/int_dot kernels over the full
    # cross product (tiny here) — validates the JOIN path (blocking,
    # probe dedup, ranking); the arithmetic itself is oracle-validated
    # cross-engine by the emb_knn_join gate
    qd = queries.select("q_id", sim.quantize(F.col("embedding"), 100).alias("qq"))
    cd = corpus.select("vec_id", sim.quantize(F.col("embedding"), 100).alias("cq"))
    exp = {(r.q_id, r.vec_id): r.dot for r in qd.crossJoin(cd).select(
        "q_id", "vec_id",
        sim.int_dot(F.col("qq"), F.col("cq")).alias("dot")).collect()}
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
        assert r.dot == exp[(r.q_id, r.vec_id)]
    for qid, _ in qs:
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert rows[0].vec_id == 1000 + qid          # twin wins
        dots = [r.dot for r in rows]
        assert dots == sorted(dots, reverse=True)
        assert len({r.vec_id for r in rows}) == len(rows)  # no dup pairs


def test_knn_join_probe_bits_monotone_recall(spark):
    """probe_bits widens candidate coverage monotonically: the result
    set at 0 is a subset of 1 is a subset of 2 (per query, by pair,
    before the top-k cut this holds for candidates; after the cut the
    matched-truth count must be non-decreasing), and probe_bits=2
    explores 1 + n + n(n-1)/2 buckets. Legacy probe_adjacent still maps
    to 0/1."""
    from biocypher_metta_spark.operators import similarity as sim

    rng = random.Random(11)
    dim = 8

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    queries = spark.createDataFrame(
        [(i, vec()) for i in range(8)], "q_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(i, vec()) for i in range(200)], "vec_id long, embedding array<float>")
    # ground truth: full quantized dot ranking
    qd = queries.select("q_id", sim.quantize(F.col("embedding"), 100).alias("qq"))
    cd = corpus.select("vec_id", sim.quantize(F.col("embedding"), 100).alias("cq"))
    from pyspark.sql.window import Window
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("vec_id"))
    truth = {(r.q_id, r.vec_id) for r in qd.crossJoin(cd).select(
        "q_id", "vec_id", sim.int_dot(F.col("qq"), F.col("cq")).alias("dot"))
        .withColumn("rank", F.row_number().over(w)).filter("rank <= 5").collect()}
    hits = {}
    for pb in (0, 1, 2):
        got = {(r.q_id, r.vec_id) for r in sim.knn_join(
            queries, corpus, dim=dim, k=5, n_planes=5, probe_bits=pb).collect()}
        hits[pb] = got & truth
    assert hits[0] <= hits[1] <= hits[2]
    assert len(hits[2]) > len(hits[0])  # wider probing must help here
    # legacy boolean still routes to the same paths
    legacy1 = {(r.q_id, r.vec_id) for r in sim.knn_join(
        queries, corpus, dim=dim, k=5, n_planes=5, probe_adjacent=True).collect()}
    legacy0 = {(r.q_id, r.vec_id) for r in sim.knn_join(
        queries, corpus, dim=dim, k=5, n_planes=5, probe_adjacent=False).collect()}
    pb1 = {(r.q_id, r.vec_id) for r in sim.knn_join(
        queries, corpus, dim=dim, k=5, n_planes=5, probe_bits=1).collect()}
    pb0 = {(r.q_id, r.vec_id) for r in sim.knn_join(
        queries, corpus, dim=dim, k=5, n_planes=5, probe_bits=0).collect()}
    assert legacy1 == pb1 and legacy0 == pb0
    import pytest
    with pytest.raises(ValueError, match="probe_bits"):
        sim.knn_join(queries, corpus, dim=dim, probe_bits=3)


# ------------------------------------- adversarial cross-engine gate sweep


def _rand_documents(n=120, seed=20260817):
    """Randomized documents-table rows with planted cross-doc structure:
    small vocab (shared lines + LSH collisions), short/empty/whitespace
    texts, repeated tokens."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            text = ""
        elif kind < 0.1:
            text = "   "
        elif kind < 0.2:
            text = " ".join([rng.choice(vocab[:3])] * rng.randint(1, 30))
        elif kind < 0.35 and rows:
            text = rows[rng.randrange(len(rows))][1]  # exact/near dup
        else:
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(1, 60)))
        rows.append((i, text, "en", f"src{i % 7}", len(text)))
    return rows


def _rand_embeddings(n=90, dim=64, seed=20260818):
    """Random float32 vectors with planted duplicates and near-zero /
    axis-aligned edge vectors — rounding and hyperplane sign edges the
    fixed testdata never exercises."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.1 and rows:
            v = rows[rng.randrange(len(rows))][1]       # exact dup
        elif kind < 0.15:
            v = [0.0] * dim                              # zero vector
        elif kind < 0.2:
            v = [0.0] * dim
            v[rng.randrange(dim)] = rng.choice([1.0, -1.0])
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, v, i % 3))
    return rows


@pytest.fixture(scope="module")
def gate_corpus(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r3b_sfdir")
    rows = _rand_documents()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        _rand_embeddings(),
        "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{d}/{t}.parquet/*.parquet'")
    return str(d), con


@pytest.mark.parametrize("name", [
    "doc_line_dedup", "doc_tfidf_topk", "doc_repetition", "doc_split",
    "doc_dup_clusters", "multimodal_wav_decode", "doc_pack", "doc_scrub",
    "doc_contamination", "emb_knn_join", "emb_dot_topk", "emb_near_dup",
    "doc_pipeline", "doc_cdc", "doc_perplexity", "doc_c4_filter",
])
def test_gate_cross_engine_on_random_corpus(spark, gate_corpus, name):
    from biocypher_metta_spark import entry_queries as eq

    sf_dir, con = gate_corpus
    fn, sql = eq.QUERIES[name]
    sdf = fn(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    norm_s = sorted(tuple(str(r[i]) for i in order_s) for r in srows)
    norm_d = sorted(tuple(str(r[i]) for i in order_d) for r in drows)
    assert norm_s == norm_d


def test_lm_perplexity_orders_fluency(spark):
    """The bigram LM must rank fluent English below shuffled-alphabet
    gibberish and below rare-bigram consonant strings, emit exact
    integer milli-nats, and give the empty doc its padded-space
    baseline instead of dividing by zero."""
    rows = [
        (0, "the children are playing in the fields with their friends"),
        (1, "xq zvj qkx wvz jqz xqv zjx qzw vxj zqx"),
        (2, "the the the the the the the the"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.lm_perplexity(df).collect()}
    assert out[0].nll_per_bigram < out[1].nll_per_bigram
    assert out[2].nll_per_bigram < out[1].nll_per_bigram
    assert out[3].n_bigrams == 1          # '  ' after padding
    for r in out.values():
        assert r.nll_sum >= r.n_bigrams   # all costs positive
        assert r.nll_per_bigram == r.nll_sum // r.n_bigrams


def test_wav_float32_roundtrip_and_rejects():
    """IEEE-float WAV (format tag 3): int16-range samples round-trip
    exactly through normalized float32 storage (rel error ~1e-7 times
    32767 < 0.5, so the decode rounding recovers every integer);
    non-finite samples and non-32-bit float streams raise ValueError."""
    rng = random.Random(12)
    for ch in (1, 2):
        s = [rng.randint(-32768, 32767) for _ in range(12 * ch)]
        assert wav_decode(wav_encode(s, 22050, ch, 32)) == (ch, 22050, 32, s)
    # resample path works on float streams too (decode->hold->re-encode
    # re-encodes at the decoded width: 32 stays 32)
    from biocypher_metta_spark.operators.wav import wav_resample
    data = wav_encode([100, 200, 300, 400], 8000, 1, 32)
    ch, rate, bits, out = wav_decode(wav_resample(data, 4000))
    assert (rate, out) == (4000, [100, 300])
    # tag 3 with wrong width
    bad = bytearray(wav_encode([0, 1], 8000, 1, 32))
    struct.pack_into("<H", bad, bad.index(b"fmt ") + 8 + 14, 16)
    with pytest.raises(ValueError, match="32-bit"):
        wav_decode(bytes(bad))
    # NaN sample
    nan = bytearray(wav_encode([0, 1], 8000, 1, 32))
    di = nan.index(b"data") + 8
    struct.pack_into("<f", nan, di, float("nan"))
    with pytest.raises(ValueError, match="non-finite"):
        wav_decode(bytes(nan))


def test_c4_line_filter_rules(spark):
    """Every C4 rule on a handcrafted doc set: terminal punctuation,
    min words, javascript marker, doc-level lorem-ipsum / brace drops,
    blank-line exclusion, and order preservation of survivors."""
    rows = [
        (0, 'Good sentence number one.\nshort.\n'
            'Please enable javascript to continue.\n'
            'no terminal punctuation here\n\n'
            'Another good "quoted line"\nAnd a third good line!'),
        (1, 'This doc mentions lorem ipsum somewhere.\nKeep me not.'),
        (2, 'function f() {\nreturn 1;\n}'),
        (3, ''),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in tx.c4_line_filter(df).collect()}
    r0 = out[0]
    assert (r0.n_lines, r0.n_kept, r0.doc_kept) == (6, 3, True)
    assert r0.text == ('Good sentence number one.\n'
                       'Another good "quoted line"\nAnd a third good line!')
    assert out[1].doc_kept is False and out[1].text == ""
    assert out[2].doc_kept is False      # brace = code
    assert (out[3].n_lines, out[3].n_kept) == (0, 0)


def test_knn_sizing_rule_and_measured_candidates(spark):
    """expected_candidates encodes the docstring's n_planes sizing rule
    (at 10^9 rows, probe_bits=2: 16 planes floods the rescorer, 24
    keeps ~2e4 candidates), and measured candidate volume on a real
    corpus stays within a small factor of the uniform-load formula."""
    from biocypher_metta_spark.operators import similarity as sim

    # the documented rule, as numbers
    assert sim.expected_candidates(10**9, 16, 2) > 2e6
    assert 1e4 < sim.expected_candidates(10**9, 24, 2) < 5e4
    # monotone: more planes -> fewer candidates; wider probe -> more
    for pb in (0, 1, 2):
        assert sim.expected_candidates(10**6, 16, pb) < \
            sim.expected_candidates(10**6, 8, pb)
    assert sim.expected_candidates(10**6, 16, 0) < \
        sim.expected_candidates(10**6, 16, 2)
    # measured vs formula on a deterministic corpus: hash-derived
    # buckets aren't perfectly uniform, allow 4x
    n, dim, n_planes = 20_000, 8, 6
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: ((F.xxhash64(F.lit("c"), F.col("id"), j)
                                % 1001) / 1000.0).cast("double"))
        .alias("embedding"))
    per_bucket = (corpus.select(
        sim.lsh_bucket(F.col("embedding"), dim, n_planes).alias("b"))
        .groupBy("b").count().agg(F.avg("count")).collect()[0][0])
    probes = 1 + n_planes + n_planes * (n_planes - 1) // 2
    measured = probes * per_bucket
    formula = sim.expected_candidates(n, n_planes, 2)
    assert formula / 4 < measured < formula * 4, (measured, formula)


def test_ivf_knn_join_exhaustive_probe_is_exact(spark):
    """ivf_knn_join with n_probe == n_cells scans every cell exactly
    once -> must reproduce brute-force top-k; with n_probe=1 it must
    return a per-query subset of candidates (never duplicates)."""
    from pyspark.sql.window import Window

    from biocypher_metta_spark.operators import similarity as sim

    rng = random.Random(5)
    dim = 8

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    queries = spark.createDataFrame(
        [(i, vec()) for i in range(6)], "q_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(i, vec()) for i in range(300)],
        "vec_id long, embedding array<float>")
    cents = sim.build_ivf_centroids(corpus, dim=dim, n_planes=3,
                                    lloyd_iters=1)
    qd = queries.select("q_id", sim.quantize(F.col("embedding"), 100)
                        .alias("qq"))
    cd = corpus.select("vec_id", sim.quantize(F.col("embedding"), 100)
                       .alias("cq"))
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(),
                                           F.col("vec_id"))
    truth = {(r.q_id, r.vec_id) for r in qd.crossJoin(cd).select(
        "q_id", "vec_id", sim.int_dot(F.col("qq"), F.col("cq"))
        .alias("dot"))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5").collect()}
    exact = {(r.q_id, r.vec_id) for r in sim.ivf_knn_join(
        queries, corpus, cents, k=5, n_probe=len(cents)).collect()}
    assert exact == truth
    one = [(r.q_id, r.vec_id) for r in sim.ivf_knn_join(
        queries, corpus, cents, k=5, n_probe=1).collect()]
    assert len(one) == len(set(one))
    import pytest
    with pytest.raises(ValueError, match="n_probe"):
        sim.ivf_knn_join(queries, corpus, cents, n_probe=0)
