"""WebVTT timed-text parsing — subtitles/captions as structured cue
rows, the third leg of the interleaved-document media story (images
and audio decode; VTT aligns TEXT to media time).

A cue block is `[id-line]\\n HH:MM:SS.mmm --> HH:MM:SS.mmm [settings]
\\n text-lines` separated by blank lines (W3C WebVTT; hours optional,
comma accepted as the millisecond separator for SRT-compatible
inputs).  vtt_cues emits one row per cue with integer-millisecond
bounds — and integer bounds mean cue->frame alignment is exactly the
genomic point-in-interval range join (functions/genomic.
interval_point_join with media_ref as the chromosome), reusing the
bucketed equi-join scale path rather than inventing a new one.

Regexes stay in the RE2/Java shared subset (the sitemap discipline):
no lookaround, no dotall flag — explicit [\\s\\S] classes; '' misses
normalize to NULL via nullif on both engines.  Map-only, fanout
bounded by the real cue count, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS = r"(?:(\d{1,2}):)?(\d{2}):(\d{2})[.,](\d{3})"
# a whole cue block: timing line + following non-blank lines
VTT_BLOCK_RE = (r"((?:\d{1,2}:)?\d{2}:\d{2}[.,]\d{3}[ \t]*-->[ \t]*"
                r"(?:\d{1,2}:)?\d{2}:\d{2}[.,]\d{3}[^\n]*\n"
                r"(?:[^\n]+\n?)*)")
VTT_START_RE = r"^" + _TS
VTT_END_RE = r"-->[ \t]*" + _TS
VTT_TEXT_RE = r"\n([\s\S]*[^\n])"     # up to the last non-newline char


def _ms(block, pattern):
    h = F.coalesce(F.nullif(F.regexp_extract(block, pattern, 1),
                            F.lit("")).cast("long"), F.lit(0))
    m = F.regexp_extract(block, pattern, 2).cast("long")
    s = F.regexp_extract(block, pattern, 3).cast("long")
    ms = F.regexp_extract(block, pattern, 4).cast("long")
    return ((h * 60 + m) * 60 + s) * 1000 + ms


def vtt_cues(df: DataFrame, doc_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Documents -> one row per WebVTT cue: (doc, cue_idx, start_ms,
    end_ms, cue_text).  cue_idx is the cue's 0-based order within the
    document; cues with no text payload or a non-positive duration
    drop (malformed per the spec); \\r\\n inputs are normalized."""
    norm = F.regexp_replace(F.col(text_col), "\r", "")
    b = F.col("_b")
    rows = (df.select(F.col(doc_col).alias("doc"),
                      F.posexplode(
                          F.regexp_extract_all(norm,
                                               F.lit(VTT_BLOCK_RE), 1))
                      .alias("cue_idx", "_b"))
            .select("doc", "cue_idx",
                    _ms(b, VTT_START_RE).alias("start_ms"),
                    _ms(b, VTT_END_RE).alias("end_ms"),
                    F.nullif(F.trim(F.regexp_extract(b, VTT_TEXT_RE,
                                                     1)),
                             F.lit("")).alias("cue_text")))
    return rows.filter(F.col("cue_text").isNotNull()
                       & (F.col("end_ms") > F.col("start_ms")))


def _ms_sql(col, pattern):
    return (f"((coalesce(CAST(nullif(regexp_extract({col}, "
            f"'{pattern}', 1), '') AS BIGINT), 0) * 60 "
            f"+ CAST(regexp_extract({col}, '{pattern}', 2) AS BIGINT))"
            f" * 60 + CAST(regexp_extract({col}, '{pattern}', 3) "
            f"AS BIGINT)) * 1000 "
            f"+ CAST(regexp_extract({col}, '{pattern}', 4) AS BIGINT)")


def vtt_cues_sql(docs_sql: str, doc_col: str = "doc_id",
                 text_col: str = "text") -> str:
    """DuckDB twin of vtt_cues: same RE2-subset regexes, cue index by
    list position (DuckDB regexp_extract_all + range unnest)."""
    start = _ms_sql("b", VTT_START_RE)
    end = _ms_sql("b", VTT_END_RE)
    return f"""SELECT doc, cue_idx, start_ms, end_ms, cue_text FROM (
  SELECT doc, cue_idx,
         {start} AS start_ms,
         {end} AS end_ms,
         nullif(trim(regexp_extract(b, '{VTT_TEXT_RE}', 1)), '')
           AS cue_text
  FROM (
    SELECT doc, cue_idx, l[cue_idx + 1] AS b FROM (
      SELECT doc, l, unnest(range(0, len(l))) AS cue_idx
      FROM (
        SELECT {doc_col} AS doc,
               regexp_extract_all(replace({text_col}, chr(13), ''),
                                  '{VTT_BLOCK_RE}', 1) AS l
        FROM (
{docs_sql.strip()}
        )
      )
    )
  )
)
WHERE cue_text IS NOT NULL AND end_ms > start_ms"""


def align_cues_to_frames(cues: DataFrame, frames: DataFrame,
                         media_col: str = "media_ref",
                         frame_ms_col: str = "frame_ms",
                         bucket: int = 5_000) -> DataFrame:
    """Cue <-> frame alignment: every frame paired with the cue(s)
    active at its timestamp — half-open [start_ms, end_ms), i.e. the
    genomic point-in-interval join with media_ref as the chromosome.
    Inherits the bucketed equi-join scale path (no inequality BNLJ);
    size `bucket` near the typical cue duration."""
    from biocypher_metta_spark.functions.genomic import (
        interval_point_join,
    )

    iv = cues.select(F.col("doc").alias(media_col), "cue_idx",
                     F.col("start_ms").alias("start"),
                     F.col("end_ms").alias("end"), "cue_text")
    return interval_point_join(iv, frames, bucket=bucket,
                               chrom=media_col, pos=frame_ms_col)
