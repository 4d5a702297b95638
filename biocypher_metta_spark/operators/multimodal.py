"""Multimodal (image/audio/video) column operators.

Media payloads are opaque `binary` columns with typed metadata structs —
the span model's `media_ref` resolves to these via a content store.
Image decode is REAL for PNG (pure-stdlib codec, operators/png.py);
other formats need PIL/cv2 (absent here) and flow through the same
pluggable `decoder=` seam — a deterministic fake keeps those paths
tested. The Spark-side plumbing (schema, partitioning, Arrow batch
shape, UDF signatures) is shared and real either way.

Scale notes: decode/feature-extract are mapInPandas (one Arrow batch per
~10k rows, library initialized once per executor via module-level lazy
init); frame sampling emits rows (explode pattern) so downstream ops
stay columnar; binary payloads should be size-bucketed on write so a few
4K videos don't skew task runtimes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("content", BinaryType()),
    StructField("content_type", StringType()),  # mime
    StructField("n_bytes", LongType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("embedding", ArrayType(FloatType())),
])

FRAME_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_index", IntegerType()),
    StructField("frame", BinaryType()),
])


def sniff_image_decode(content: bytes) -> tuple[int, int, int, bytes]:
    """Format-sniffing decode chain (round 4): magic bytes route to the
    pure-stdlib PNG codec (operators/png.py) or the baseline JPEG codec
    (operators/jpeg.py); anything else raises ValueError — the shared
    modality error contract (operator handlers null the row). This is
    the production shape: one sniffer seam where new codecs chain in."""
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        from biocypher_metta_spark.operators.png import png_decode

        return png_decode(content)
    if content[:2] == b"\xFF\xD8":
        from biocypher_metta_spark.operators.jpeg import jpeg_decode

        return jpeg_decode(content)
    if content[:2] == b"BM":
        from biocypher_metta_spark.operators.bmp import bmp_decode

        return bmp_decode(content)
    if content[:4] == b"GIF8":
        from biocypher_metta_spark.operators.gif import gif_decode

        return gif_decode(content)
    if content[:2] in (b"II", b"MM"):
        from biocypher_metta_spark.operators.tiff import tiff_decode

        return tiff_decode(content)
    raise ValueError("unrecognized image format (PNG, baseline JPEG, "
                     "24-bit BMP, GIF and TIFF are the "
                     "stdlib-decodable formats)")


def real_image_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """REAL decode kernel (round 3, widened round 4): PNG or baseline
    JPEG via the pure-stdlib codecs behind sniff_image_decode — no
    PIL/cv2 needed. Unrecognized payloads raise ValueError, which
    decode_images nulls out per its error contract.

    The 8-float embedding is a deterministic luminance profile: the
    pixel buffer split into 8 equal spans, mean byte value per span,
    scaled to [0, 1] — a stand-in for a real vision embedding with the
    same schema and batch shape."""
    w, h, c, pix = sniff_image_decode(content)
    n = len(pix)
    span = max(n // 8, 1)
    emb = []
    for i in range(8):
        seg = pix[i * span:(i + 1) * span] if i < 7 else pix[7 * span:]
        emb.append((sum(seg) / len(seg) if seg else 0.0) / 255.0)
    return w, h, c, emb


def fake_image_decode(content: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake: dimensions + embedding derived from the bytes
    themselves — exercises the full plumbing without media libs. The
    (width, height) arithmetic is intentionally simple integer math over
    the payload length and middle byte so an external SQL oracle can
    re-derive it row-by-row (see MULTIMODAL_DECODE_SQL)."""
    n = len(content)
    mid = content[n // 2] if n else 0
    w = 16 + (n + mid) % 64
    h = 16 + (n * 7 + mid * 3) % 64
    emb = [((content[i % max(n, 1)] if n else 0) + i) % 255 / 255.0
           for i in range(8)]
    return w, h, 3, emb


def decode_images(media: DataFrame,
                  decoder: Callable = real_image_decode) -> DataFrame:
    """binary -> (width, height, channels, embedding) via mapInPandas.
    Decoder errors null the row out rather than failing the stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    w, h, c, emb = decoder(bytes(content) if content is not None else b"")
                    rows.append((ref, w, h, c, emb))
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append((ref, None, None, None, None))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height",
                                              "channels", "embedding"])

    return (media.filter(F.col("kind") == "image")
            .select("media_ref", "content")
            .mapInPandas(batches, IMAGE_FEATURES_SCHEMA))


IMAGE_STATS_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("pix_sum", LongType()),
])


def image_stats(media: DataFrame, decode: Callable | None = None) -> DataFrame:
    """Corpus-QA decode statistics: dimensions + the exact pixel-byte sum
    per image. The sum is an integer over the decoded buffer, so an
    external oracle that knows the source pixels can value-check the
    whole decode path. Default codec is the sniffing chain (stdlib PNG
    or baseline JPEG); undecodable rows null out."""
    dec = decode or sniff_image_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            # duplicate payloads decode once per Arrow batch (real
            # corpora repeat logos/thumbnails heavily; decode is the
            # costly step, the bytes key is a dict probe)
            seen: dict[bytes, tuple] = {}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                stat = seen.get(blob)
                if stat is None:
                    try:
                        w, h, c, pix = dec(blob)
                        stat = (w, h, c, sum(pix))
                    except ValueError:
                        stat = (None, None, None, None)
                    seen[blob] = stat
                rows.append((ref,) + stat)
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height",
                                              "channels", "pix_sum"])

    return (media.filter(F.col("kind") == "image")
            .select("media_ref", "content")
            .mapInPandas(batches, IMAGE_STATS_SCHEMA))


AUDIO_STATS_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("n_channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("peak_abs", LongType()),
    StructField("sum_sq", LongType()),
])


def audio_stats(media: DataFrame, decode: Callable | None = None) -> DataFrame:
    """Audio decode statistics via the REAL stdlib WAV kernel
    (operators/wav.py): header fields plus the exact integer peak
    amplitude and sum of squared samples over the decoded PCM stream —
    both value-checkable by an oracle that knows the source samples
    (entry_queries.multimodal_wav_decode derives them from the sample
    formula, proving the encode->RIFF->decode loop is lossless).
    Undecodable rows null out per the modality error contract."""
    from biocypher_metta_spark.operators.wav import wav_decode

    dec = decode or wav_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    ch, rate, bits, samples = dec(
                        bytes(content) if content is not None else b"")
                    peak = max((abs(s) for s in samples), default=0)
                    ssq = sum(s * s for s in samples)
                    rows.append((ref, ch, rate, bits, len(samples), peak, ssq))
                except ValueError:
                    rows.append((ref, None, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "n_channels", "sample_rate", "bits",
                "n_samples", "peak_abs", "sum_sq"])

    return (media.filter(F.col("kind") == "audio")
            .select("media_ref", "content")
            .mapInPandas(batches, AUDIO_STATS_SCHEMA))


AUDIO_FRAME_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_idx", LongType()),
    StructField("n", LongType()),
    StructField("energy", LongType()),
    StructField("peak_abs", LongType()),
    StructField("zero_crossings", LongType()),
])


def audio_frame_features(media: DataFrame, frame_len: int = 160,
                         decode: Callable | None = None) -> DataFrame:
    """Frame-level audio features over decoded PCM — the VAD /
    silence-trim / loudness-normalization precursor a speech-corpus
    pipeline runs before deciding which clips to keep: one row per
    NON-OVERLAPPING frame of `frame_len` samples with the exact
    integer energy (sum of squares), peak amplitude, and strict
    zero-crossing count (s[i-1]*s[i] < 0 — touching zero is not a
    crossing, pinned so both engines agree). Frames never span the
    document boundary; the last frame keeps its true shorter `n`.
    Crossings are counted within the frame only (the first sample of
    a frame never pairs with the last of the previous one), so frame
    rows are independently recomputable — what makes the formula
    oracle possible.

    Multi-channel audio is profiled over the channel-interleaved
    stream as decoded — a deliberate screen-level simplification
    (documented here because a true per-channel VAD would de-
    interleave first; the frame plumbing is identical).

    Scale shape: map-only explode inside mapInPandas — audio bytes
    decode once per row on executors and emit frames/doc rows, never
    visiting the driver; zero shuffles. Same pure-Python-codec CPU
    caveat and pluggable-decoder seam as audio_stats. Undecodable
    rows emit a single all-NULL frame row (the decode_images error
    contract: corrupt media degrades to one inspectable row, never a
    lost task)."""
    from biocypher_metta_spark.operators.wav import wav_decode

    if frame_len < 2:
        raise ValueError(f"frame_len must be >= 2, got {frame_len}")
    dec = decode or wav_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    _, _, _, samples = dec(
                        bytes(content) if content is not None else b"")
                except ValueError:
                    rows.append((ref, None, None, None, None, None))
                    continue
                for f in range(0, max(len(samples), 1), frame_len):
                    fr = samples[f:f + frame_len]
                    zc = sum(1 for a, b in zip(fr, fr[1:]) if a * b < 0)
                    rows.append((ref, f // frame_len, len(fr),
                                 sum(s * s for s in fr),
                                 max((abs(s) for s in fr), default=0),
                                 zc))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "frame_idx", "n", "energy", "peak_abs",
                "zero_crossings"])

    return (media.filter(F.col("kind") == "audio")
            .select("media_ref", "content")
            .mapInPandas(batches, AUDIO_FRAME_SCHEMA))


DHASH_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("dhash", LongType()),
])


def image_dhash(media: DataFrame, grid_w: int = 9, grid_h: int = 8,
                decode: Callable | None = None) -> DataFrame:
    """Difference-hash perceptual fingerprint per image — the image
    counterpart of text SimHash, and the standard first screen for
    IMAGE near-dup dedup in multimodal training corpora (re-encoded /
    slightly-recompressed copies keep their dHash within a few bits;
    exact byte dedup misses them entirely). Pipeline: decode ->
    integer grayscale (floor of the channel mean) -> grid_h x grid_w
    box-average downsample (floor; box edges at the floor-division
    grid, so every pixel lands in exactly one box) -> one bit per
    horizontally adjacent cell pair, bit k = gy*(grid_w-1)+gx set iff
    cell[gy][gx] > cell[gy][gx+1]. Every step is integer arithmetic —
    the whole hash is reproducible by an oracle that knows the pixel
    values.

    Output (media_ref, width, height, dhash): dhash packs
    (grid_w-1)*grid_h bits (<= 64; the default 9x8 grid is the
    classic 64-bit dHash) into a signed long (two's complement for
    bit 63). Images smaller than the grid emit NULL dhash with their
    real dimensions (distinguishable from undecodable rows, which
    null everything — the decode_images contract).

    Near-dup pairs compose with dedup.hamming_near_pairs (rename
    dhash -> simhash, bits = (grid_w-1)*grid_h): the pigeonhole
    banding and popcount verify carry over unchanged — one blocked
    bucket join, never all-pairs.

    Scale shape: map-only mapInPandas, zero shuffles; pure-Python
    decode CPU regime with the pluggable-decoder seam (PIL/cv2 slot
    in via `decode` on a real cluster)."""
    if grid_w < 2 or grid_h < 1:
        raise ValueError(
            f"grid must be >= 2x1, got {grid_w}x{grid_h}")
    if (grid_w - 1) * grid_h > 64:
        raise ValueError(
            f"(grid_w-1)*grid_h = {(grid_w - 1) * grid_h} bits "
            "exceeds the 64-bit hash")
    dec = decode or sniff_image_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    w, h, c, pix = dec(
                        bytes(content) if content is not None else b"")
                except ValueError:
                    rows.append((ref, None, None, None))
                    continue
                if w < grid_w or h < grid_h:
                    rows.append((ref, w, h, None))
                    continue
                gray = [sum(pix[(y * w + x) * c + k]
                            for k in range(c)) // c
                        for y in range(h) for x in range(w)]
                bits = 0
                k = 0
                for gy in range(grid_h):
                    y0, y1 = gy * h // grid_h, (gy + 1) * h // grid_h
                    row_cells = []
                    for gx in range(grid_w):
                        x0 = gx * w // grid_w
                        x1 = (gx + 1) * w // grid_w
                        s = sum(gray[y * w + x]
                                for y in range(y0, y1)
                                for x in range(x0, x1))
                        row_cells.append(s // ((y1 - y0) * (x1 - x0)))
                    for gx in range(grid_w - 1):
                        if row_cells[gx] > row_cells[gx + 1]:
                            bits |= 1 << k
                        k += 1
                if bits >= 1 << 63:  # two's complement into a long
                    bits -= 1 << 64
                rows.append((ref, w, h, bits))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "width", "height", "dhash"])

    return (media.filter(F.col("kind") == "image")
            .select("media_ref", "content")
            .mapInPandas(batches, DHASH_SCHEMA))


def fake_resize(content: bytes, w: int, h: int) -> bytes:
    """Deterministic truncate/pad fake for NON-PNG formats (no PIL/cv2
    in this environment) — keeps the plumbing testable for payloads the
    real kernel can't parse."""
    target = max(w * h // 8, 1)
    return (content * (target // max(len(content), 1) + 1))[:target]


def resize_images(media: DataFrame, width: int, height: int,
                  resizer: Callable | None = None) -> DataFrame:
    """Resize: binary in -> binary out. The default kernel is REAL for
    PNG and baseline JPEG (stdlib decode -> nearest-neighbor ->
    re-encode, routed by magic bytes like sniff_image_decode);
    unrecognized payloads fall back to the deterministic fake so the
    batch shape stays exercised end-to-end."""

    def default_resize(content: bytes, w: int, h: int) -> bytes:
        try:
            if content[:2] == b"\xFF\xD8":
                from biocypher_metta_spark.operators.jpeg import jpeg_resize

                return jpeg_resize(content, w, h)
            from biocypher_metta_spark.operators.png import png_resize

            return png_resize(content, w, h)
        except ValueError:
            return fake_resize(content, w, h)

    rz = resizer or default_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["content"] = [rz(bytes(c) if c is not None else b"", width, height)
                              for c in pdf["content"]]
            out["n_bytes"] = [len(c) for c in out["content"]]
            yield out

    return media.mapInPandas(batches, media.schema)


def resample_audio(media: DataFrame, target_rate: int,
                   resampler: Callable | None = None) -> DataFrame:
    """Audio resample: binary in -> binary out at target_rate via the
    REAL stdlib zero-order-hold kernel (operators/wav.wav_resample);
    undecodable payloads pass through unchanged (the error contract for
    a lossy-tolerant media pipeline stage)."""
    from biocypher_metta_spark.operators.wav import wav_resample

    rs = resampler or wav_resample

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            new = []
            for c in pdf["content"]:
                raw = bytes(c) if c is not None else b""
                try:
                    new.append(rs(raw, target_rate))
                except ValueError:
                    new.append(raw)
            out["content"] = new
            out["n_bytes"] = [len(c) for c in new]
            yield out

    return (media.filter(F.col("kind") == "audio")
            .mapInPandas(batches, media.schema))


VIDEO_FRAME_STATS_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("frame_index", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("pix_sum", LongType()),
])


def video_frame_stats(media: DataFrame, stride: int = 2,
                      max_frames: int = 8) -> DataFrame:
    """REAL video frame sampling (round 5): parse uncompressed-DIB AVI
    containers with the stdlib codec (operators/avi.py), take every
    `stride`-th frame up to `max_frames`, and emit one row per sampled
    frame with its dimensions and exact integer pixel-byte sum — the
    oracle-checkable statistic, same pattern as image_stats/audio_stats.
    Only sampled DIB chunk spans are converted (the chunk walk skips the
    rest), so a wide stride over a long video does header-sized work
    plus the sampled frames. Undecodable payloads contribute zero rows
    (the explode-pattern error contract; parse errors never fail the
    stage)."""
    from biocypher_metta_spark.operators.avi import avi_sample_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            # duplicate payloads parse once per Arrow batch (same
            # memoization rationale as image_stats: real corpora repeat
            # assets heavily and the DIB conversion is the costly step)
            seen: dict[bytes, list | None] = {}
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                stats = seen.get(blob)
                if stats is None and blob not in seen:
                    try:
                        w, h, frames = avi_sample_frames(blob, stride,
                                                         max_frames)
                        stats = [(i, w, h, sum(rgb)) for i, rgb in frames]
                    except ValueError:
                        stats = None
                    seen[blob] = stats
                if stats:
                    rows.extend((ref, i, w, h, s) for i, w, h, s in stats)
            yield pd.DataFrame(rows, columns=[
                "media_ref", "frame_index", "width", "height", "pix_sum"])

    return (media.filter(F.col("kind") == "video")
            .select("media_ref", "content")
            .mapInPandas(batches, VIDEO_FRAME_STATS_SCHEMA))


def sample_frames(media: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame (explode
    pattern). The 'frame' here is a deterministic byte slice standing in
    for a real decoder's frame grab (video_frame_stats above is the
    real-container path) — the schema/batching is the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                n = min(max_frames, max(len(data) // every_n_bytes, 1))
                for i in range(n):
                    rows.append((ref, i,
                                 data[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_index", "frame"])

    return (media.filter(F.col("kind") == "video")
            .select("media_ref", "content")
            .mapInPandas(batches, FRAME_SCHEMA))


def synth_media_table(spark, n: int) -> DataFrame:
    """Deterministic fake media store keyed by media_ref — pairs with the
    span synth's 'media://img/<i>' refs."""
    return spark.range(n).select(
        F.concat(F.lit("media://img/"), F.col("id").cast("string")).alias("media_ref"),
        F.when(F.col("id") % 3 == 2, F.lit("video")).otherwise(F.lit("image")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)),
                 "utf-8").cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("content_type"),
        F.lit(72).cast("long").alias("n_bytes"),
    )


SCENE_CUT_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("f_prev", IntegerType()),
    StructField("f_next", IntegerType()),
    StructField("n_px_bytes", LongType()),
    StructField("diff_abs", LongType()),
    StructField("diff_sq", LongType()),
])


def video_scene_cuts(media: DataFrame, stride: int = 1,
                     max_frames: int = 16) -> DataFrame:
    """Consecutive-frame difference profile per video — the shot/
    scene-cut detector a video-corpus pipeline runs to pick keyframes
    and drop static clips: one row per consecutive SAMPLED frame pair
    with the exact integer sum of absolute pixel-byte differences and
    of squared differences (threshold either downstream; a cut is a
    spike, a frozen clip is all-zeros). Both sums are recomputable
    from the source pixels, so a formula oracle checks the decode +
    pairing end-to-end.

    Pairs are between consecutive sampled indices (stride s pairs
    frame i with i+s), each frame's DIB span converted once per pair
    list. Videos with < 2 sampled frames emit nothing; undecodable
    payloads emit one all-NULL row (the single-inspectable-row error
    contract, unlike video_frame_stats' zero-row explode — a cut
    profile with silently missing videos would read as 'no cuts').

    Scale shape: map-only mapInPandas, zero shuffles, frames never
    visit the driver; pure-Python DIB conversion CPU regime."""
    from biocypher_metta_spark.operators.avi import avi_sample_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                try:
                    _, _, frames = avi_sample_frames(blob, stride,
                                                     max_frames)
                except ValueError:
                    rows.append((ref, None, None, None, None, None))
                    continue
                for (fa, ra), (fb, rb) in zip(frames, frames[1:]):
                    d = [a - b for a, b in zip(ra, rb)]
                    rows.append((ref, fa, fb, len(ra),
                                 sum(abs(x) for x in d),
                                 sum(x * x for x in d)))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "f_prev", "f_next", "n_px_bytes",
                "diff_abs", "diff_sq"])

    return (media.filter(F.col("kind") == "video")
            .select("media_ref", "content")
            .mapInPandas(batches, SCENE_CUT_SCHEMA))
