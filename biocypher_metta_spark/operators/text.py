"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID, document fingerprinting.

All pure Catalyst expressions (no Python in the hot path). Where a metric
is a ratio, it is emitted as an integer permille/scaled value computed
from exact integer operands — IEEE division of exact ints is bit-stable
across engines, which keeps the DuckDB oracle hashes equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic, engine-portable 60-bit hash of a string: first 15 hex
# digits of md5, parsed base-16. Twin SQL (DuckDB): ('0x'||substr(md5(x),1,15))::BIGINT
def portable_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


PUNCT_RE = r"[\.,;:!\?'\"\(\)-]"
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# marker-word sets for the stopword language-ID heuristic. Dict order is
# the deterministic tie-break (first listed wins on equal scores).
# ASCII-only markers on purpose: the token column is raw UTF-8 and keeping
# the dictionary ASCII removes any normalization divergence between the
# Spark plan and the DuckDB oracle (whose SQL is GENERATED from this dict
# — entry_queries._duck_lang_scores — so the two can never drift).
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to", "in", "that", "it"],
    "de": ["und", "der", "die", "das", "nicht", "mit", "ein", "ist"],
    "fr": ["le", "la", "les", "et", "des", "une", "est", "dans"],
    "es": ["el", "los", "las", "y", "que", "por", "con", "para"],
    "pt": ["os", "uma", "ele", "isso", "mais", "muito", "sem", "como"],
    "it": ["il", "lo", "gli", "che", "per", "una", "sono", "di"],
    "nl": ["het", "een", "niet", "van", "voor", "naar", "zijn", "ook"],
    "sv": ["och", "att", "det", "som", "den", "inte", "har", "jag"],
}


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counting + surface stats (whitespace tokenizer plus a
    BPE-ish word/number/punct segmentation count)."""
    t = F.col(text_col)
    toks = tokens(t)
    bpe_ish = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_obs"),
        F.size(toks).alias("n_tokens"),
        bpe_ish.cast("long").alias("n_subtokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality scoring: length band + punctuation density +
    stopword presence + repetition, as exact integers (permille scaling)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = F.regexp_count(t, F.lit(PUNCT_RE)).cast("long")
    stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    uniq = F.size(F.array_distinct(toks))
    punct_permille = F.floor(punct * 1000.0 / F.greatest(n_chars, F.lit(1))).cast("long")
    stop_permille = F.floor(stop * 1000.0 / F.greatest(n_tok, F.lit(1))).cast("long")
    rep_permille = F.floor(uniq * 1000.0 / F.greatest(n_tok, F.lit(1))).cast("long")
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1)).otherwise(F.lit(0))
    score = (
        length_ok * 250
        + F.when(stop_permille >= 20, 250).otherwise(0)
        + F.when(rep_permille >= 300, 250).otherwise(0)
        + F.when(punct_permille <= 200, 250).otherwise(0)
    )
    return df.select(
        F.col(id_col),
        punct_permille.alias("punct_permille"),
        stop_permille.alias("stop_permille"),
        rep_permille.alias("rep_permille"),
        score.cast("long").alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID over LANG_MARKERS with deterministic
    tie-break (dict declaration order, then 'unk' when no marker hits).
    Pure expressions — one filter/size per language, no Python."""
    toks = tokens(F.col(text_col))
    def _in(markers):
        # closure factory: a default-arg lambda would be read by Spark as
        # the 2-arg (element, index) higher-order form
        return lambda x: x.isin(markers)

    scores = [(lang, F.size(F.filter(toks, _in(markers))))
              for lang, markers in LANG_MARKERS.items()]
    best = F.greatest(*[s for _, s in scores])
    lang = F.when(best == 0, F.lit("unk"))
    for l, s in scores:
        lang = lang.when(s == best, F.lit(l))
    lang = lang.otherwise(F.lit("unk"))
    en = dict(scores)["en"]
    return df.select(F.col(id_col), en.cast("long").alias("en_score"),
                     lang.alias("lang_pred"))


def shingles(text: Column, n: int = 5) -> Column:
    """Word n-gram shingles as strings (token windows joined by ' ').
    Texts with fewer than n tokens yield an EMPTY list — Spark's
    `sequence` is end-INCLUSIVE (sequence(1, 0) = [1, 0], descending!),
    so the guard must gate on k >= 1 rather than clamp the end to 0;
    found by the randomized cross-engine sweep, where a <n-token doc
    crashed the stage with slice(start=0)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Document fingerprint: min portable-hash over word 5-gram shingles
    (a 1-permutation minhash — rolling-hash document signature)."""
    sh = shingles(F.col(text_col), n)
    h = F.array_min(
        F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    )
    return df.select(F.col(id_col), h.alias("fingerprint"))
