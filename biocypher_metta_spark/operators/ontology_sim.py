"""Ontology annotation analytics: up-propagation and Resnik-style
most-informative common ancestors.

The reference walks GO/ontology hierarchies driver-side per class
(adapters/ontology, notebooks); these operators re-express the two
standard downstream analytics distributively:

* annotation_uppropagate — the GOA "true-path rule": an item
  annotated to a term is implicitly annotated to every ancestor, so
  term-level statistics need the closure of the annotation table.
* resnik_mica — semantic similarity of term pairs via the
  most-informative common ancestor [Resnik, IJCAI'95].  Information
  content is monotone DECREASING in the ancestor's up-propagated
  annotation count (IC = -log p), so the MICA is exactly the common
  ancestor with the MINIMUM count — reported as (mica, n_ann)
  INTEGERS under the (n, term) tie order, avoiding any cross-engine
  float-log divergence (the expr_gene_corr integer-moments rule).

Scale shape: the ontology closure is a DIMENSION (ontologies are
10^4-10^6 terms; GO closure ~10^6 pairs) while the annotation table is
corpus-scale — the up-propagation join broadcasts the closure under
the engine's 32MB threshold and the per-term count is one mergeable
groupBy (map-side partials absorb the root-term hot keys, which every
item hits by construction).  resnik_mica joins pair lists against the
per-term ancestor sets (closure-keyed, dimension-sized) and takes one
min(struct) per pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def annotation_uppropagate(ann: DataFrame, closure: DataFrame,
                           item_col: str = "item",
                           term_col: str = "term",
                           cls_col: str = "cls",
                           anc_col: str = "ancestor") -> DataFrame:
    """Distinct (item, term) pairs closed under the ontology: the
    direct annotations plus every (item, ancestor) implied by the
    closure (true-path rule).  Null items/terms drop."""
    base = (ann.select(F.col(item_col).alias("item"),
                       F.col(term_col).alias("term"))
            .filter(F.col("item").isNotNull()
                    & F.col("term").isNotNull()))
    up = (base.join(closure.select(F.col(cls_col).alias("term"),
                                   F.col(anc_col).alias("anc")),
                    "term")
          .select("item", F.col("anc").alias("term")))
    return base.unionByName(up).distinct()


def annotation_uppropagate_sql(ann_sql: str, closure_sql: str,
                               item_col: str = "item",
                               term_col: str = "term",
                               cls_col: str = "cls",
                               anc_col: str = "ancestor") -> str:
    """DuckDB twin of annotation_uppropagate (closure_sql may itself
    be a recursive CTE — it is embedded as an opaque subquery)."""
    return f"""WITH up_ann AS MATERIALIZED (
  SELECT {item_col} AS item, {term_col} AS term
  FROM (
{ann_sql.strip()}
  )
  WHERE {item_col} IS NOT NULL AND {term_col} IS NOT NULL
), up_clo AS MATERIALIZED (
  SELECT {cls_col} AS term, {anc_col} AS anc
  FROM (
{closure_sql.strip()}
  )
)
SELECT DISTINCT item, term FROM (
  SELECT item, term FROM up_ann
  UNION ALL
  SELECT a.item, c.anc FROM up_ann a JOIN up_clo c USING (term)
)"""


def resnik_mica(pairs: DataFrame, ann: DataFrame, closure: DataFrame,
                t1_col: str = "t1", t2_col: str = "t2",
                item_col: str = "item", term_col: str = "term",
                cls_col: str = "cls",
                anc_col: str = "ancestor") -> DataFrame:
    """Most-informative common ancestor per term pair: output
    (t1, t2, mica, n_ann) where mica is the common ancestor (either
    term counts as its own ancestor) with the minimum up-propagated
    annotation count, ties broken by term id — the integer-exact
    Resnik ordering.  Pairs with no common ancestor or no annotated
    common ancestor are absent from the output."""
    up = annotation_uppropagate(ann, closure, item_col, term_col,
                                cls_col, anc_col)
    counts = up.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_ann"))
    anc = (closure.select(F.col(cls_col).alias("t"),
                          F.col(anc_col).alias("anc"))
           .unionByName(closure.select(F.col(cls_col).alias("t"),
                                       F.col(cls_col).alias("anc")))
           .unionByName(closure.select(F.col(anc_col).alias("t"),
                                       F.col(anc_col).alias("anc")))
           .distinct())
    p = (pairs.select(F.col(t1_col).alias("t1"),
                      F.col(t2_col).alias("t2"))
         .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
         .distinct())
    common = (p
              .join(anc.select(F.col("t").alias("t1"),
                               F.col("anc")), "t1")
              .join(anc.select(F.col("t").alias("t2"),
                               F.col("anc")), ["t2", "anc"]))
    scored = common.join(counts.select(F.col("term").alias("anc"),
                                       "n_ann"), "anc")
    pick = F.struct("n_ann", "anc")
    return (scored.groupBy("t1", "t2").agg(F.min(pick).alias("m"))
            .select("t1", "t2", F.col("m.anc").alias("mica"),
                    F.col("m.n_ann").alias("n_ann")))


def resnik_mica_sql(pairs_sql: str, ann_sql: str, closure_sql: str,
                    t1_col: str = "t1", t2_col: str = "t2",
                    item_col: str = "item", term_col: str = "term",
                    cls_col: str = "cls",
                    anc_col: str = "ancestor") -> str:
    """DuckDB twin of resnik_mica, composed on the uppropagate twin
    plus the reflexive ancestor relation and a row_number pick under
    the same (n_ann, anc) order."""
    up = annotation_uppropagate_sql(ann_sql, closure_sql, item_col,
                                    term_col, cls_col, anc_col)
    return f"""WITH rm_up AS MATERIALIZED (
  SELECT * FROM (
{up}
  )
), rm_cnt AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS n_ann
  FROM rm_up GROUP BY term
), rm_clo AS MATERIALIZED (
  SELECT {cls_col} AS cls, {anc_col} AS ancestor
  FROM (
{closure_sql.strip()}
  )
), rm_anc AS MATERIALIZED (
  SELECT DISTINCT t, anc FROM (
    SELECT cls AS t, ancestor AS anc FROM rm_clo
    UNION ALL SELECT cls, cls FROM rm_clo
    UNION ALL SELECT ancestor, ancestor FROM rm_clo
  )
), rm_p AS MATERIALIZED (
  SELECT DISTINCT {t1_col} AS t1, {t2_col} AS t2
  FROM (
{pairs_sql.strip()}
  )
  WHERE {t1_col} IS NOT NULL AND {t2_col} IS NOT NULL
)
SELECT t1, t2, mica, n_ann FROM (
  SELECT p.t1, p.t2, a1.anc AS mica, c.n_ann,
         row_number() OVER (PARTITION BY p.t1, p.t2
                            ORDER BY c.n_ann, a1.anc) AS rn
  FROM rm_p p
  JOIN rm_anc a1 ON a1.t = p.t1
  JOIN rm_anc a2 ON a2.t = p.t2 AND a2.anc = a1.anc
  JOIN rm_cnt c ON c.term = a1.anc
) WHERE rn = 1"""
