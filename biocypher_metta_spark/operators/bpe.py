"""Distributed BPE tokenizer training — merge-pair learning at corpus
scale.

A training-data pipeline that packs sequences (text.pack_sequences)
and counts tokens eventually needs the tokenizer itself; BPE merge
learning [Sennrich et al., ACL'16] is the canonical algorithm. The
scale trick is the classic one: collapse the corpus to a
(word, freq) VOCABULARY first — the only corpus-sized shuffle — and
run every merge round over the bounded vocab table, weighting pair
counts by word frequency. A 100 TB corpus and a 100 GB corpus have
the same per-round cost once the vocab is built.

Round structure (vocab rows carry a symbol array, initially chars +
an end-of-word marker):

  pair counts  — explode adjacent (sym, next_sym) pairs, sum(freq);
  argmax       — orderBy(count DESC, pair ASC) LIMIT 1, collected to
                 the driver (ONE bounded row per round — the merge
                 decision is inherently global and sequential);
  apply        — greedy left-to-right non-overlapping rewrite of each
                 symbol array via an F.aggregate fold (JVM codegen;
                 a string replace() would MISS adjacent repeats:
                 ' a b a b ' -> the second match loses its leading
                 space to the first — the fold has no such seam);
  checkpoint   — localCheckpoint per round truncates the k-deep fold
                 lineage (vocab is bounded, so this is cheap).

Determinism: integer counts, ASCII alphabet (lowercased, [^a-z]+ ->
word breaks), ties broken (count DESC, sym_a ASC, sym_b ASC) — the
DuckDB twin replicates the exact recurrence with a gaps-and-islands
parity rule instead of a fold (overlapping matches only occur in
same-symbol runs; take every other), so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "_"  # end-of-word marker; alphabet is a-z so '_' cannot collide


def _vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) with word -> initial symbol array (chars + EOW)."""
    words = (docs
             .select(F.explode(F.split(F.trim(F.regexp_replace(
                 F.lower(F.col(text_col)), "[^a-z]+", " ")), " "))
                 .alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w")
             .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)))
    return words.select(
        "w", "freq",
        F.concat(chars, F.array(F.lit(_EOW))).alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1), F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (vocab
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("sym_a"),
                     F.col("p.b").alias("sym_b"))
            .agg(F.sum("freq").cast("long").alias("n")))


def _apply_merge(a: str, b: str):
    """Greedy left-to-right non-overlapping (a, b) -> a||b rewrite of
    the `syms` array, as a pend-one-symbol fold."""
    merged = a + b
    nul = F.lit(None).cast("string")

    def step(acc, x):
        return (F.when(acc["pend"].isNull(),
                       F.struct(acc["out"].alias("out"),
                                x.alias("pend")))
                .when((acc["pend"] == a) & (x == b),
                      F.struct(F.concat(acc["out"],
                                        F.array(F.lit(merged)))
                               .alias("out"),
                               nul.alias("pend")))
                .otherwise(F.struct(
                    F.concat(acc["out"], F.array(acc["pend"]))
                    .alias("out"),
                    x.alias("pend"))))

    return F.aggregate(
        "syms",
        F.struct(F.array().cast("array<string>").alias("out"),
                 nul.alias("pend")),
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["pend"]))))


def train_bpe(docs: DataFrame, text_col: str,
              n_merges: int) -> DataFrame:
    """Learn the first `n_merges` BPE merges over a document corpus.

    Returns the merge table as a DataFrame of
    (merge_rank 1.., sym_a, sym_b, n) built from driver-collected
    per-round argmaxes (n_merges bounded rows — the merge list IS a
    driver-sized artifact, like IVF centroids). Stops early if the
    vocabulary runs out of adjacent pairs.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = _vocab(docs, text_col).localCheckpoint()
    out = []
    for rank in range(1, n_merges + 1):
        top = (_pair_counts(vocab)
               .orderBy(F.desc("n"), "sym_a", "sym_b")
               .limit(1).collect())
        if not top:
            break
        a, b, n = top[0]["sym_a"], top[0]["sym_b"], top[0]["n"]
        out.append((rank, a, b, n))
        vocab = vocab.select(
            "w", "freq",
            _apply_merge(a, b).alias("syms")).localCheckpoint()
    return spark.createDataFrame(
        out, "merge_rank: int, sym_a: string, sym_b: string, n: long")


def train_bpe_sql(docs_sql: str, text_col: str, n_merges: int) -> str:
    """DuckDB twin of train_bpe: the same recurrence in pure SQL over
    a LONG-format (word id, pos, sym) vocabulary. The greedy
    non-overlapping rewrite is spelled as gaps-and-islands parity —
    overlapping candidate matches can only occur inside runs of one
    repeated symbol, where taking every other match IS the
    left-to-right greedy — a completely different mechanism from the
    Spark-side fold."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    ctes = [f"""bpe_w AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(
      regexp_replace(lower({text_col}), '[^a-z]+', ' ', 'g')), ' ')) AS w
    FROM (
{docs_sql.strip()}
    )
  ) WHERE w <> '' GROUP BY 1
), r0 AS MATERIALIZED (
  SELECT w, freq, CAST(i AS BIGINT) AS pos,
         CASE WHEN i <= length(w) THEN substr(w, CAST(i AS INT), 1)
              ELSE '{_EOW}' END AS sym
  FROM bpe_w, unnest(range(1, length(w) + 2)) t(i)
)"""]
    tops = []
    for k in range(1, n_merges + 1):
        p, c = f"r{k - 1}", f"r{k}"
        ctes.append(f"""{c}_n AS (
  SELECT w, freq, pos, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM {p}
), {c}_top AS (
  SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS n
  FROM {c}_n WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1
), {c}_m AS (
  SELECT w, freq, pos, sym, nxt,
         (sym = (SELECT a FROM {c}_top)
          AND nxt = (SELECT b FROM {c}_top)) AS cand
  FROM {c}_n
), {c}_i AS (
  SELECT *, CASE WHEN cand THEN
      row_number() OVER (PARTITION BY w, grp ORDER BY pos) END AS rn
  FROM (
    SELECT *, pos - row_number()
        OVER (PARTITION BY w, cand ORDER BY pos) AS grp
    FROM {c}_m
  )
), {c}_t AS (
  SELECT w, freq, pos,
         coalesce(cand AND rn % 2 = 1, FALSE) AS taken, sym, nxt
  FROM {c}_i
), {c} AS MATERIALIZED (
  SELECT w, freq, pos,
         CASE WHEN taken THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT *, coalesce(lag(taken)
        OVER (PARTITION BY w ORDER BY pos), FALSE) AS consumed
    FROM {c}_t
  ) WHERE NOT consumed
)""")
        tops.append(f"SELECT {k} AS merge_rank, a AS sym_a, b AS sym_b,"
                    f" n FROM r{k}_top")
    body = "\nUNION ALL\n".join(tops)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT CAST(merge_rank AS INT) AS merge_rank, sym_a, "
            f"sym_b, n FROM (\n{body}\n)")


def bpe_encode_tokens(docs: DataFrame, text_col: str,
                      merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list (rank order) and return the corpus
    token-frequency table (token, n) — the vocabulary a tokenizer
    ships with, and the item a data pipeline audits (token histogram
    drift between corpus versions).

    Same scale collapse as train_bpe: the merges rewrite the bounded
    (word, freq) VOCABULARY — k sequential folds, zero shuffles — and
    token counts are sum(freq) per emitted symbol; the corpus is
    touched exactly once (the word count). `merges` is a driver-side
    artifact (train_bpe output), applied as literals.
    """
    if not merges:
        raise ValueError("merges must be non-empty")
    vocab = _vocab(docs, text_col)
    for i, (a, b) in enumerate(merges):
        vocab = vocab.select("w", "freq", _apply_merge(a, b).alias("syms"))
        if (i + 1) % 4 == 0:
            vocab = vocab.localCheckpoint()
    return (vocab
            .select(F.explode("syms").alias("token"), "freq")
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("n")))


def bpe_encode_tokens_sql(docs_sql: str, text_col: str,
                          n_merges: int) -> str:
    """DuckDB twin of train_bpe(n_merges) THEN bpe_encode_tokens with
    those merges: the train twin's round chain already carries the
    rewritten vocabulary, so the encoded token table is just a final
    count over round n's long-format rows."""
    train = train_bpe_sql(docs_sql, text_col, n_merges)
    head, _, _tail = train.rpartition("\nSELECT CAST(merge_rank")
    return (f"{head}\n"
            f"SELECT sym AS token, CAST(sum(freq) AS BIGINT) AS n\n"
            f"FROM r{n_merges} GROUP BY 1")
