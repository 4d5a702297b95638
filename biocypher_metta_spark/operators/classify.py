"""Nearest-centroid (Rocchio) text classification, integer-exact.

The lightest supervised router a training-data pipeline runs: train
per-class token-count centroids on a labeled split, score unlabeled
documents by the dot product of their term frequencies with each
centroid, predict the argmax. The multinomial-NB-shaped alternative
needs log-probabilities, which are not exactly portable across
engines; the Rocchio form is sums and one final floor division, so
Spark and DuckDB agree bit-for-bit:

    score(d, c) = sum_t tf_d(t) * cnt_c(t)
    score_ppb   = floor(1e9 * score / total_c)   (class-size normalizer)

with cnt_c(t) the training token count for class c and total_c the
class's total token count — the normalizer removes the
bigger-class-always-wins bias without leaving integer arithmetic.
Ties (same score_ppb for two classes) break to the lexicographically
smaller label, enforced by an explicit ORDER BY in both engines (no
max_by, whose tie behavior is engine-defined).

Scale shape: training is one explode + two mergeable groupBys; the
model is (vocab x classes) rows — bounded by vocabulary, not corpus —
so scoring BROADCASTS it to an equi-join on token against the
per-document term frequencies (one shuffle of the test side on
doc_id for the tf groupBy, reused by AQE for the score groupBy). The
final argmax is a per-document window over |classes| rows. Documents
sharing no token with the training vocabulary produce no scored rows
and are absent from the output (documented contract — route them to a
fallback class downstream if the pipeline needs total coverage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.text import tokens

_DEC = "decimal(38,0)"


def rocchio_centroids(df: DataFrame, text_col: str = "text",
                      label_col: str = "label") -> DataFrame:
    """Per-class token-count centroids: (label, token, cnt, total_c).

    total_c is the class's total token count, repeated on each row so
    the model stays a single self-contained table (one broadcast).
    Empty-string tokens from blank texts are dropped.
    """
    toks = (df.filter(F.col(text_col).isNotNull()
                      & F.col(label_col).isNotNull())
            .select(F.col(label_col).alias("label"),
                    F.explode(tokens(F.col(text_col))).alias("token"))
            .filter(F.col("token") != ""))
    cnt = toks.groupBy("label", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    total = cnt.groupBy("label").agg(
        F.sum("cnt").cast("long").alias("total_c"))
    return cnt.join(F.broadcast(total), "label")


def rocchio_classify(model: DataFrame, df: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Predict a label per document from rocchio_centroids output.

    Returns (id_col, pred_label, score_ppb) with score_ppb the exact
    floor of 1e9 * <tf, centroid> / total_c for the winning class.
    """
    tf = (df.filter(F.col(text_col).isNotNull())
          .select(F.col(id_col),
                  F.explode(tokens(F.col(text_col))).alias("token"))
          .filter(F.col("token") != "")
          .groupBy(id_col, "token")
          .agg(F.count(F.lit(1)).cast(_DEC).alias("tf")))
    scored = (tf.join(F.broadcast(model), "token")
              .groupBy(id_col, "label")
              .agg(F.sum(F.col("tf") * F.col("cnt").cast(_DEC))
                   .alias("_num"),
                   F.max(F.col("total_c")).cast(_DEC).alias("_den")))
    # pmod floor, not a decimal cast (which would round half-up)
    num = F.col("_num") * F.lit(1_000_000_000).cast(_DEC)
    den = F.col("_den")
    ppb = (num - ((num % den) + den) % den) / den
    ranked = (scored.withColumn("score_ppb", ppb.cast("long"))
              .withColumn("_rk", F.row_number().over(
                  Window.partitionBy(id_col)
                  .orderBy(F.col("score_ppb").desc(), F.col("label")))))
    return (ranked.filter(F.col("_rk") == 1)
            .select(id_col, F.col("label").alias("pred_label"),
                    "score_ppb"))


def rocchio_sql(train_sql: str, test_sql: str, id_col: str = "doc_id",
                text_col: str = "text",
                label_col: str = "label") -> str:
    """DuckDB twin of rocchio_centroids + rocchio_classify: same
    explode/count recurrences, HUGEINT score, same floor and
    (score DESC, label ASC) tie-break."""
    return f"""WITH rc_train AS MATERIALIZED (
{train_sql.strip()}
), rc_test AS MATERIALIZED (
{test_sql.strip()}
), rc_ttok AS (
  SELECT {label_col} AS label, unnest(
           regexp_split_to_array(trim({text_col}), '\\s+')) AS token
  FROM rc_train
  WHERE {text_col} IS NOT NULL AND {label_col} IS NOT NULL
), rc_cnt AS (
  SELECT label, token, CAST(count(*) AS BIGINT) AS cnt
  FROM rc_ttok WHERE token <> '' GROUP BY label, token
), rc_tot AS (
  SELECT label, CAST(sum(cnt) AS BIGINT) AS total_c
  FROM rc_cnt GROUP BY label
), rc_model AS (
  SELECT rc_cnt.label, token, cnt, total_c
  FROM rc_cnt JOIN rc_tot USING (label)
), rc_tf AS (
  SELECT {id_col}, token, CAST(count(*) AS HUGEINT) AS tf
  FROM (
    SELECT {id_col}, unnest(
             regexp_split_to_array(trim({text_col}), '\\s+')) AS token
    FROM rc_test WHERE {text_col} IS NOT NULL
  ) WHERE token <> '' GROUP BY {id_col}, token
), rc_sc AS (
  SELECT {id_col}, label,
         sum(tf * cnt::HUGEINT) AS num,
         max(total_c)::HUGEINT AS den
  FROM rc_tf JOIN rc_model USING (token)
  GROUP BY {id_col}, label
), rc_rk AS (
  SELECT {id_col}, label,
         CAST((num * 1000000000::HUGEINT) // den AS BIGINT)
           AS score_ppb,
         row_number() OVER (
           PARTITION BY {id_col}
           ORDER BY CAST((num * 1000000000::HUGEINT) // den AS BIGINT)
                    DESC, label) AS rk
  FROM rc_sc
)
SELECT {id_col}, label AS pred_label, score_ppb
FROM rc_rk WHERE rk = 1"""
