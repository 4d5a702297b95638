"""Market-basket frequent-pair mining and association rules.

The classic curation/analytics op the reference has no analog for (its
pipeline is pure ETL; see SURVEY.md §2 training-data extensions): given
(basket, item) memberships, count co-occurring item pairs and score
directed rules antecedent -> consequent by support, confidence, and
lift. This is Apriori's k=2 pass — at web scale the pair pass is the
only one that matters (higher-k candidates are generated from it), and
it is the one with the quadratic hazard.

Spark-first shape (one logical shuffle chain, no driver loops):

  distinct(basket, item)                      -- dedupe multi-buys
    -> window count over basket, filter <= max_basket
                                              -- HUB GUARD: a single
       pathological basket with 10^6 items would emit 10^12 pairs; at
       100 TB the cap (with the drop count surfaced to the caller via
       `log`-style accounting columns if wanted) is what keeps the
       self-join's fanout linear in the data. The window reuses the
       hash partitioning of the groupBy that follows.
    -> self-join on basket with item_a < item_b
                                              -- co-partitioned on the
       basket key, so pair generation is shuffle-local; output volume
       is sum_b k_b^2 <= max_basket * |memberships|, i.e. linear with
       a constant the caller chose.
    -> groupBy(pair) count  +  groupBy(item) count
    -> broadcast-join item supports onto pair counts (item dimension
       is small: #distinct items << #memberships).

Scores are exact integers so the DuckDB twin hashes identically:
  conf_permille = floor(1000 * n_pair / n_ante)
  lift_milli    = floor(1000 * n_pair * n_baskets / (n_ante * n_cons))
(lift > 1000 means positive association).

No reference counterpart — cited instead to the Spark-side pattern
this replaces: MLlib FPGrowth's first pass (we stay DataFrame-native
and exact-integer so the oracle gate can adjudicate it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(df: DataFrame, basket_col: str, item_col: str,
                      min_pair_support: int = 2,
                      max_basket: int = 64) -> DataFrame:
    """Directed association rules from (basket, item) membership rows.

    Returns one row per ordered rule (ante -> cons) whose pair support
    meets `min_pair_support`, with exact-integer scores:
    [ante, cons, n_pair, n_ante, conf_permille, lift_milli].

    Baskets with more than `max_basket` distinct items are dropped
    whole (the hub guard documented in the module docstring); they
    would otherwise dominate both the pair fanout and the statistics
    with degenerate co-occurrences.
    """
    b, i = F.col(basket_col), F.col(item_col)
    members = (df.select(b.alias("basket"), i.alias("item"))
               .filter(F.col("basket").isNotNull()
                       & F.col("item").isNotNull())
               .distinct())

    w = Window.partitionBy("basket")
    kept = (members
            .withColumn("bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("bsz") <= max_basket)
            .drop("bsz"))

    item_support = (kept.groupBy("item")
                    .agg(F.count(F.lit(1)).cast("long").alias("n_item")))

    a = kept.alias("a")
    c = kept.alias("c")
    pairs = (a.join(c, (F.col("a.basket") == F.col("c.basket"))
                    & (F.col("a.item") < F.col("c.item")))
             .groupBy(F.col("a.item").alias("item_a"),
                      F.col("c.item").alias("item_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
             .filter(F.col("n_pair") >= min_pair_support))

    # both rule directions from each canonical pair
    directed = pairs.select(
        F.col("item_a").alias("ante"), F.col("item_b").alias("cons"),
        "n_pair",
    ).unionByName(pairs.select(
        F.col("item_b").alias("ante"), F.col("item_a").alias("cons"),
        "n_pair"))

    sup_a = item_support.select(F.col("item").alias("ante"),
                                F.col("n_item").alias("n_ante"))
    sup_c = item_support.select(F.col("item").alias("cons"),
                                F.col("n_item").alias("n_cons"))
    scored = (directed
              .join(F.broadcast(sup_a), "ante")
              .join(F.broadcast(sup_c), "cons"))

    # basket total as a SCALAR SUBQUERY (the repo-wide pattern: a
    # crossJoin(broadcast(1-row-agg)) would plan the forbidden
    # BroadcastNestedLoopJoin; the subquery is a driver-injected
    # constant instead — see operators/retrieval.py:44).
    spark = df.sparkSession
    enriched = spark.sql(
        "SELECT *, (SELECT count(DISTINCT basket) FROM {kept}) AS _nb "
        "FROM {scored}", kept=kept, scored=scored)
    return enriched.select(
        "ante", "cons", "n_pair", "n_ante",
        F.floor(F.lit(1000) * F.col("n_pair") / F.col("n_ante"))
        .cast("long").alias("conf_permille"),
        F.floor(F.lit(1000) * F.col("_nb") * F.col("n_pair")
                / (F.col("n_ante") * F.col("n_cons")))
        .cast("long").alias("lift_milli"))
