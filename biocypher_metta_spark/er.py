"""End-to-end entity resolution: the canonicalization capstone.

The reference resolves duplicate entities implicitly — adapters emit
nodes keyed by a normalized id and the writer keeps the first row per
id (biocypher-metta's `skip_duplicate_nodes`, biocypher_config.yaml:11;
metta_writer.py dedups on the serialized atom). That only works when
duplicates already share an exact key. This module is the general
form for records that DON'T share a key yet: fuzzy-match on a name
token set, cluster the match graph, and merge each cluster into one
golden record.

The chain composes three independently-oracled operators:

    set_similarity_join  (operators/dedup.py — exact AllPairs/PPJoin
                          prefix filtering, never all-pairs)
      -> connected_components  (canonicalize.py — min-label
                          propagation, checkpointed rounds)
      -> survivorship_merge    (canonicalize.py — per-field
                          best-precedence merge, one mergeable groupBy)

Scale shape: the match join is prefix-filtered (candidates only from
rare tokens), the component loop shuffles edges log-diameter times
(entity-dup clusters are shallow — diameter ~2), and the final merge
is a single map-side-combinable groupBy. No stage is all-pairs, no
stage funnels through one partition; records that match nothing never
enter the loop at all (left join + coalesce makes them their own
cluster for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from biocypher_metta_spark.canonicalize import (
    connected_components,
    survivorship_merge,
    survivorship_merge_sql,
)
from biocypher_metta_spark.operators.dedup import (
    set_similarity_join,
    set_similarity_join_sql,
)


def resolve_entities(records: DataFrame, rid_col: str, name_col: str,
                     precedence_cols: list[str], field_cols: list[str],
                     tau_permille: int = 600,
                     cc_max_iter: int = 10) -> DataFrame:
    """records -> one golden row per resolved entity.

    `rid_col` is a unique, orderable record id; `name_col` a
    whitespace-tokenizable match text (what the pair join compares);
    `precedence_cols`/`field_cols` as in survivorship_merge. Two
    records merge when their name-token Jaccard >= tau_permille/1000
    (transitively, via connected components). Records that match
    nothing survive as their own singleton cluster.

    Output: (entity_id = min rid reachable, n_members, *field_cols).
    """
    cols = set(records.columns)
    for c in (rid_col, name_col):
        if c not in cols:
            raise ValueError(f"column {c!r} not in records")
    if "entity_id" in cols:
        raise ValueError("records must not already have an "
                         "'entity_id' column")
    if name_col in field_cols:
        raise ValueError("merge the display name via a separate field "
                         "column; name_col is match-only")

    pairs = set_similarity_join(
        records.select(rid_col, name_col), tau_permille,
        text_col=name_col, id_col=rid_col)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")),
        max_iter=cc_max_iter)
    clustered = (
        records
        .join(comp.select(F.col("id").alias(rid_col),
                          F.col("component")), rid_col, "left")
        .withColumn("entity_id",
                    F.coalesce(F.col("component"), F.col(rid_col)))
        .drop("component"))
    return survivorship_merge(clustered, "entity_id",
                              precedence_cols, field_cols)


def resolve_entities_sql(records_sql: str, rid_col: str, name_col: str,
                         precedence_cols: list[str],
                         field_cols: list[str],
                         tau_permille: int = 600) -> str:
    """DuckDB twin of resolve_entities, each stage by an INDEPENDENT
    strategy: brute-force all-pairs-sharing-a-token match (no prefix
    logic — green proves the pruning theorem dropped nothing),
    recursive-CTE reachability enumeration + min() for the components
    (no label propagation), and the per-field window-rank spelling
    for survivorship (no grouped min(struct))."""
    pairs = set_similarity_join_sql(
        f"SELECT {rid_col}, {name_col} FROM er_rec",
        tau_permille, text_col=name_col, id_col=rid_col)
    prec = ", ".join(precedence_cols)
    fields = ", ".join(field_cols)
    clustered = f"""WITH RECURSIVE er_rec AS MATERIALIZED (
  SELECT * FROM (
{records_sql.strip()}
  )
), er_pairs AS MATERIALIZED (
{pairs}
), er_edges AS (
  SELECT id_a AS a, id_b AS b FROM er_pairs
  UNION
  SELECT id_b, id_a FROM er_pairs
), er_reach AS (
  SELECT {rid_col} AS id, {rid_col} AS rch FROM er_rec
  UNION
  SELECT r.id, e.b FROM er_reach r JOIN er_edges e ON r.rch = e.a
), er_lbl AS (
  SELECT id, min(rch) AS entity_id FROM er_reach GROUP BY 1
)
SELECT l.entity_id, {prec}, {fields}
FROM er_rec r JOIN er_lbl l ON r.{rid_col} = l.id"""
    return survivorship_merge_sql(clustered, "entity_id",
                                  precedence_cols, field_cols)
