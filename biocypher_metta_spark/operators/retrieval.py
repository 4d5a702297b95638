"""BM25 full-text retrieval over a document table.

Gives the engine a search surface: score every document against a
query token set with BM25-style tf/df/length normalization and return
the global top-k.  A training-data pipeline uses the same scorer for
targeted corpus probes ("find the docs that dominate this query") and
quality forensics; the reference engine has no text-retrieval surface
at all (beyond-reference op).

Cross-engine exact scoring
--------------------------
Classic BM25 is sum over query tokens of
    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
with idf(t) = ln((N-df+0.5)/(df+0.5)+1).  Two float hazards: the ln,
and the division chain.  This module's default is a fully integer
variant so the driver gate can hash-match DuckDB bit-for-bit:

* linear idf:  idf_int = floor(idf_scale * (N - df + 1) / (N + 1))
  — bounded in [0, idf_scale], monotone decreasing in df exactly like
  the log idf (the ln is a monotone damping; single-token rankings are
  identical, multi-token sums weight rare terms more steeply than the
  log would — documented variant, not a drop-in BM25 clone).
* rational tf/length term with k1=1.2, b=0.75 cleared of fractions by
  multiplying through by 10*A (A = total corpus token count, N = doc
  count, dl = doc token count; avgdl = A/N):
      score_t = floor( idf_int * 22 * tf * A
                       / (10*A*tf + 3*A + 9*dl*N) )
  — every operand a BIGINT, identical floor in any engine.

Overflow bound: idf_scale * 22 * tf * A must fit int64; with the
default idf_scale=10^6 that holds to A ~ 4*10^9 tokens x tf 100.  At
web scale lower idf_scale to 10^3 (3 sig figs of idf resolution) or
lift the arithmetic to DECIMAL(38,0)/HUGEINT — the formula is already
division-free until the final floor, so the swap is mechanical.

Scale shape
-----------
The plan is deliberately explode-free: per-doc tf for each of the q
query tokens comes from `size(filter(tokens, x == t))` — MAP-ONLY, q
small.  Corpus stats (N, A, df per token) are SCALAR SUBQUERIES over
the same base relation; Catalyst's MergeScalarSubqueries folds the
q+2 of them into ONE single-row aggregate pass whose result is
injected into the scoring projection as constants — no join at all
(the naive crossJoin(broadcast(stats)) plans a
BroadcastNestedLoopJoin, which the repo's plan audit forbids on
principle).  Scoring is then map-only and the only other exchange is
the global top-k TakeOrdered.  Net: one tiny agg + one TakeOrdered,
no groupBy on tokens, no join on a Zipf-skewed token key — the plan a
100-TB scan wants.  (An inverted-index build amortizes repeated
queries but costs a full token shuffle; for the one-shot scoring path
this is strictly better.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import tokens


def _bm25_term(tf, dfq, dl, n, a, idf_scale: int):
    """One query-token's integer BM25 contribution (shared by the
    one-shot scan path and the batch posting-join path so the two
    cannot drift): floor(idf * 22 * tf * A / (10*A*tf + 3*A + 9*dl*N))
    with idf = floor(idf_scale * (N - df + 1) / (N + 1))."""
    idf = F.floor(F.lit(idf_scale) * (n - dfq + 1) / (n + 1))
    num = idf * 22 * tf * a
    den = 10 * a * tf + 3 * a + 9 * dl * n
    return F.when(tf > 0, F.floor(num / den)).otherwise(F.lit(0))


def bm25_topk(df: DataFrame, query_tokens: list, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              idf_scale: int = 1_000_000) -> DataFrame:
    """Global top-k documents for `query_tokens` by integer BM25.

    Returns (id_col, score, rank): score the integer BM25 sum over the
    query tokens (docs matching no token score 0 and are excluded),
    rank 1..k deterministic via (score DESC, id ASC)."""
    if not query_tokens:
        raise ValueError("query_tokens must be non-empty")
    if len(set(query_tokens)) != len(query_tokens):
        raise ValueError("query_tokens must be distinct")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    tk = tokens(F.col(text_col))

    # NB: a `lambda x, t=t:` two-param closure would make pyspark pass
    # the ELEMENT INDEX as the second arg — build the one-arg lambda in
    # a factory instead.
    def _eq(t):
        return lambda x: x == F.lit(t)

    cnt_cols = [
        F.size(F.filter(tk, _eq(t))).cast("long").alias(f"_c{i}")
        for i, t in enumerate(query_tokens)]
    base = df.select(F.col(id_col), F.size(tk).cast("long").alias("_dl"),
                     *cnt_cols)

    # corpus stats as scalar subqueries over the SAME base relation —
    # MergeScalarSubqueries collapses them into one aggregate pass.
    spark = df.sparkSession
    stat_sel = ",\n       ".join(
        ["(SELECT count(*) FROM {base}) AS _n",
         "(SELECT sum(_dl) FROM {base}) AS _a"]
        + [f"(SELECT sum(CASE WHEN _c{i} > 0 THEN 1 ELSE 0 END) "
           "FROM {base}) AS _df" + str(i)
           for i in range(len(query_tokens))])
    enriched = spark.sql(
        "SELECT *,\n       " + stat_sel + "\nFROM {base}", base=base)

    def tok_score(i: int):
        return _bm25_term(F.col(f"_c{i}"), F.col(f"_df{i}"),
                          F.col("_dl"), F.col("_n"), F.col("_a"),
                          idf_scale)

    score = sum(tok_score(i) for i in range(len(query_tokens)))
    scored = (enriched
              .select(F.col(id_col), score.cast("long").alias("score"))
              .filter(F.col("score") > 0))
    # global top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge of k rows), never a full sort.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    from pyspark.sql.window import Window
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def bm25_topk_sql(query_tokens: list, k: int = 10,
                  table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id",
                  idf_scale: int = 1_000_000) -> str:
    """DuckDB twin of bm25_topk, GENERATED from the same formula so
    the gate's two sides share one source of truth and cannot drift.
    (The window rank over k<=tens of rows is trivially cheap.)"""
    cnts = ",\n         ".join(
        f"CAST(len(list_filter(regexp_split_to_array(trim({text_col}), "
        f"'\\s+'), x -> x = '{t}')) AS BIGINT) AS c{i}"
        for i, t in enumerate(query_tokens))
    dfs = ",\n         ".join(
        f"sum(CASE WHEN c{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(query_tokens)))
    terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN CAST(floor("
        f"floor({idf_scale} * (n - df{i} + 1) / (n + 1))"
        f" * 22 * c{i} * a / (10 * a * c{i} + 3 * a + 9 * dl * n)"
        f") AS BIGINT) ELSE 0 END)"
        for i in range(len(query_tokens)))
    return f"""
WITH base AS (
  SELECT {id_col},
         CAST(len(regexp_split_to_array(trim({text_col}), '\\s+'))
              AS BIGINT) AS dl,
         {cnts}
  FROM {table}
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS a,
         {dfs}
  FROM base
), scored AS (
  SELECT {id_col}, {terms} AS score
  FROM base CROSS JOIN stats
)
SELECT {id_col}, score,
       CAST(row_number() OVER (ORDER BY score DESC, {id_col}) AS BIGINT)
         AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, {id_col} LIMIT {k}
"""


def bm25_score_join(df: DataFrame, queries: DataFrame, k: int = 10,
                    text_col: str = "text", id_col: str = "doc_id",
                    query_id_col: str = "query_id",
                    token_col: str = "token",
                    idf_scale: int = 1_000_000) -> DataFrame:
    """Batch BM25: score MANY queries in one pass via a posting-list
    join — the amortized complement to the one-shot `bm25_topk` scan
    (which re-reads the corpus per query).  `queries` is a (query_id,
    token) table; duplicate tokens within a query are collapsed.

    Returns (query_id_col, id_col, score, rank): per query the top-k
    docs by the SAME integer BM25 term as bm25_topk (`_bm25_term` is
    the single source of truth), rank 1..k via (score DESC, id ASC),
    zero-score docs excluded.

    Scale shape: postings (doc, token, tf) and doc lengths are one
    explode + two uniform-key groupBys over the corpus; per-token
    doc_freq is vocabulary-sized.  The query join keys on TOKEN — a
    Zipf-skewed key when queries contain stopwords (the build side has
    one row per (query, token), so broadcast it when the query set is
    small; AQE skew-split covers the big-query-set case).  Scoring
    then aggregates on the uniform (query_id, doc_id) composite and
    the per-query top-k window partitions on query_id.  Corpus scalars
    (N, A) ride in as merged scalar subqueries, as in bm25_topk."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = df.sparkSession

    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("_tok"))
    postings = (tok.groupBy(id_col, "_tok")
                .agg(F.count("*").cast("long").alias("_tf")))
    dl = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("_dl"))
    dfreq = (postings.groupBy("_tok")
             .agg(F.count("*").cast("long").alias("_df")))

    enriched_dl = spark.sql(
        "SELECT *, (SELECT count(*) FROM {dl}) AS _n,"
        " (SELECT sum(_dl) FROM {dl}) AS _a FROM {dl}", dl=dl)

    qt = (queries.select(F.col(query_id_col),
                         F.col(token_col).alias("_tok"))
          .distinct())
    matched = (qt.join(postings, "_tok")
               .join(dfreq, "_tok")
               .join(enriched_dl, id_col))
    term = _bm25_term(F.col("_tf"), F.col("_df"), F.col("_dl"),
                      F.col("_n"), F.col("_a"), idf_scale)
    scored = (matched.groupBy(query_id_col, id_col)
              .agg(F.sum(term).cast("long").alias("score"))
              .filter(F.col("score") > 0))
    from pyspark.sql.window import Window
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.col("score").desc(), F.col(id_col)))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def bm25_join_sql(query_rows: list, k: int = 10,
                  table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id",
                  idf_scale: int = 1_000_000) -> str:
    """DuckDB twin of bm25_score_join for a literal (query_id, token)
    list, GENERATED from the same formula text as bm25_topk_sql."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in query_rows)
    return f"""
WITH q(query_id, token) AS (
  SELECT DISTINCT * FROM (VALUES {vals})
), tok AS (
  SELECT {id_col}, unnest(regexp_split_to_array(trim({text_col}), '\\s+'))
           AS token
  FROM {table}
), postings AS (
  SELECT {id_col}, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
), dl AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS a
  FROM dl
), scored AS (
  SELECT q.query_id, postings.{id_col},
         CAST(sum(CAST(floor(
           floor({idf_scale} * (n - df + 1) / (n + 1))
           * 22 * tf * a / (10 * a * tf + 3 * a + 9 * dl.dl * n)
         ) AS BIGINT)) AS BIGINT) AS score
  FROM q JOIN postings USING (token) JOIN dfreq USING (token)
       JOIN dl ON postings.{id_col} = dl.{id_col} CROSS JOIN stats
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, {id_col}, score,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, {id_col}) AS BIGINT)
           AS rank
  FROM scored WHERE score > 0
)
SELECT query_id, {id_col}, score, rank FROM ranked WHERE rank <= {k}
"""


def rrf_fuse(rankings, topk: int, k: int = 60, scale: int = 10 ** 9,
             id_col: str = "doc_id", out_col: str = "rrf_score",
             max_candidates: int = 1_000_000):
    """Reciprocal Rank Fusion [Cormack & Clarke, SIGIR'09] over bounded
    candidate lists — the hybrid-retrieval combiner that joins the
    lexical (bm25_topk) and vector (similarity.dot_topk / pq.pq_adc_topk)
    legs into one ranking without comparable scores: each list
    contributes floor(scale / (k + rank)) per document and the fused
    score is the sum (a document absent from a list contributes 0, the
    standard RRF convention).  Integer throughout — rank is exact, the
    contribution is one floor division — so a DuckDB twin matches
    bit-for-bit.

    `rankings` is a list of (df, id_col_in_df, score_col, descending)
    tuples.  Ranks are derived deterministically: position in the
    (score, id) total order (descending=True means higher score is
    rank 1; ties break to the LOWER id in both directions).

    Scale shape: RRF inputs are top-R CANDIDATE LISTS (the output of a
    retrieval leg), never corpora — this is inherent to the semantics,
    and enforced: each list is counted (cheap on bounded inputs) and
    > max_candidates raises.  Ranking therefore uses the bounded
    sort_array(collect_list(struct)) pattern (one HashAggregate — the
    plan-audit-legitimate single-partition shape) rather than a global
    rank window over an unbounded input; the fusion is one uniform-key
    groupBy over at most len(rankings) * R rows and a bounded
    TakeOrdered.
    """
    from pyspark.sql import functions as F

    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if not rankings:
        raise ValueError("rankings must be non-empty")
    legs = []
    for i, (df, idc, score_col, desc) in enumerate(rankings):
        n = df.limit(max_candidates + 1).count()
        if n > max_candidates:
            raise ValueError(
                f"ranking {i} has > max_candidates={max_candidates} rows; "
                f"RRF fuses candidate LISTS — cut each leg to its top-R "
                f"before fusing")
        key = F.col(score_col).cast("long")
        key = (-key) if desc else key
        lst = (df.select(F.struct(key.alias("_k"),
                                  F.col(idc).cast("long").alias("_id"))
                         .alias("_s"))
               .agg(F.sort_array(F.collect_list("_s")).alias("_l")))
        legs.append(lst.select(
            F.posexplode("_l").alias("_pos", "_s")).select(
            F.col("_s._id").alias(id_col),
            F.expr(f"CAST({scale} AS BIGINT) div (_pos + 1 + {k})")
            .alias("_contrib")))
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    return (u.groupBy(id_col)
            .agg(F.sum("_contrib").cast("long").alias(out_col))
            .orderBy(F.col(out_col).desc(), F.col(id_col).asc())
            .limit(topk))


def rrf_fuse_sql(ranking_sqls, topk: int, k: int = 60,
                 scale: int = 10 ** 9, id_col: str = "doc_id",
                 out_col: str = "rrf_score") -> str:
    """DuckDB twin of rrf_fuse.  `ranking_sqls` is a list of
    (sql, id_col_in_sql, score_col, descending) — each sql a complete
    query (nested WITH is fine inside the FROM subquery).  The twin
    ranks via row_number() windows (a different mechanism than the
    engine's sort_array order realization) and fuses with the same
    integer floor-division contribution."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if not ranking_sqls:
        raise ValueError("ranking_sqls must be non-empty")
    ctes = []
    for i, (sql, idc, score_col, desc) in enumerate(ranking_sqls):
        order = "DESC" if desc else "ASC"
        ctes.append(f"""rrf_leg{i} AS (
  SELECT CAST({idc} AS BIGINT) AS id,
         CAST({scale} AS BIGINT) // (row_number() OVER (
           ORDER BY {score_col} {order}, {idc} ASC) + {k}) AS contrib
  FROM ({sql}) AS rrf_in{i}
)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT id, contrib FROM rrf_leg{i}"
        for i in range(len(ranking_sqls)))
    return f"""WITH {", ".join(ctes)}
SELECT id AS {id_col}, CAST(sum(contrib) AS BIGINT) AS {out_col}
FROM ({union}) AS rrf_all
GROUP BY id
ORDER BY {out_col} DESC, id ASC
LIMIT {topk}"""
