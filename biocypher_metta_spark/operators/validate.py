"""Schema-driven triple validation (SHACL-lite) over the KG's node and
edge tables — the distributed quality gate for BioCypher-schema-driven
construction (schema.SchemaRegistry holds exactly the constraint shape
this consumes: edge label -> required source/target types + the is_a
hierarchy; reference semantics: schema_config.yaml's source/target
keys, which the reference engine trusts at write time but never
re-checks).  Emits one row per (rule, offending triple):

* unknown_edge_label — edge label absent from the constraint table;
* dangling_src / dangling_tgt — endpoint id missing from the node set;
* src_type / tgt_type — endpoint present but its label is not the
  required type NOR a descendant of it under the is_a hierarchy
  (subtype-aware, like Biolink: a transcribed_to source declared
  `gene` accepts an `ncrna` node when ncrna is_a gene);
* duplicate_edge — the same (label, src, tgt) asserted more than once.

Scale shape: constraints and the is_a closure are schema-sized
(broadcast literals); the data-sized work is two left joins of edges
to the node table on endpoint id (uniform keys) + one duplicate
groupBy with map-side combine.  The hierarchy closure is computed once
with canonicalize.transitive_closure (path doubling, log2(depth)
rounds over schema-sized rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _closure_with_reflexive(isa: DataFrame | None,
                            labels: DataFrame) -> DataFrame:
    """(child, anc): transitive is_a closure plus the reflexive rows
    for every label seen anywhere — 'X is an X' always holds."""
    refl = labels.select(F.col("l").alias("child"),
                         F.col("l").alias("anc")).distinct()
    if isa is None:
        return refl
    from biocypher_metta_spark.canonicalize import transitive_closure

    tc = (transitive_closure(
        isa.select(F.col(isa.columns[0]).alias("src"),
                   F.col(isa.columns[1]).alias("dst")))
        .select(F.col("src").alias("child"), F.col("dst").alias("anc")))
    return refl.unionByName(tc).distinct()


def validate_triples(nodes: DataFrame, edges: DataFrame,
                     constraints: DataFrame,
                     isa: DataFrame | None = None) -> DataFrame:
    """(reason, edge_label, src, tgt) violation rows; empty = valid KG.

    nodes: (id, label); edges: (src, tgt, label);
    constraints: (edge_label, src_label, tgt_label);
    isa: optional (child, parent) subtype edges."""
    e = edges.select(F.col("src"), F.col("tgt"),
                     F.col("label").alias("edge_label"))
    c = F.broadcast(constraints.select("edge_label", "src_label",
                                       "tgt_label").distinct())
    ej = e.join(c, "edge_label", "left")

    unknown = (ej.filter(F.col("src_label").isNull())
               .select(F.lit("unknown_edge_label").alias("reason"),
                       "edge_label", "src", "tgt"))
    known = ej.filter(F.col("src_label").isNotNull())

    n = nodes.select(F.col("id"), F.col("label").alias("nlabel"))
    labels = (n.select(F.col("nlabel").alias("l"))
              .unionByName(constraints.select(
                  F.col("src_label").alias("l")))
              .unionByName(constraints.select(
                  F.col("tgt_label").alias("l")))
              .distinct())
    clo = F.broadcast(_closure_with_reflexive(isa, labels))

    def _endpoint(side: str, req_col: str):
        kj = known.join(
            n.withColumnRenamed("id", "_nid")
            .withColumnRenamed("nlabel", "_nl"),
            known[side] == F.col("_nid"), "left")
        dangling = (kj.filter(F.col("_nid").isNull())
                    .select(F.lit(f"dangling_{side}").alias("reason"),
                            "edge_label", "src", "tgt"))
        typed = (kj.filter(F.col("_nid").isNotNull())
                 .join(clo, (F.col("_nl") == clo["child"])
                       & (F.col(req_col) == clo["anc"]), "left")
                 .filter(clo["child"].isNull())
                 .select(F.lit(f"{side}_type").alias("reason"),
                         "edge_label", "src", "tgt"))
        return dangling.unionByName(typed)

    dup = (e.groupBy("edge_label", "src", "tgt")
           .agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > 1)
           .select(F.lit("duplicate_edge").alias("reason"),
                   "edge_label", "src", "tgt"))

    return (unknown
            .unionByName(_endpoint("src", "src_label"))
            .unionByName(_endpoint("tgt", "tgt_label"))
            .unionByName(dup))


def validate_triples_sql(nodes_sql: str, edges_sql: str,
                         constraints_sql: str,
                         isa_sql: str | None = None) -> str:
    """DuckDB twin of validate_triples: the same rules with the is_a
    closure as a recursive CTE — independent closure machinery (the
    Spark side path-doubles)."""
    isa_part = (f"""
  SELECT child, parent FROM ({isa_sql.strip()})""" if isa_sql else """
  SELECT NULL AS child, NULL AS parent WHERE FALSE""")
    return f"""WITH RECURSIVE vt_nodes AS MATERIALIZED (
  SELECT id, label AS nlabel FROM ({nodes_sql.strip()})
), vt_edges AS MATERIALIZED (
  SELECT src, tgt, label AS edge_label FROM ({edges_sql.strip()})
), vt_c AS (
  SELECT DISTINCT edge_label, src_label, tgt_label
  FROM ({constraints_sql.strip()})
), vt_isa AS ({isa_part}
), vt_tc AS (
  SELECT child, parent AS anc FROM vt_isa
  UNION
  SELECT t.child, i.parent AS anc
  FROM vt_tc t JOIN vt_isa i ON i.child = t.anc
), vt_labels AS (
  SELECT nlabel AS l FROM vt_nodes
  UNION SELECT src_label FROM vt_c
  UNION SELECT tgt_label FROM vt_c
), vt_clo AS (
  SELECT l AS child, l AS anc FROM vt_labels
  UNION SELECT child, anc FROM vt_tc
), vt_known AS (
  SELECT e.*, c.src_label, c.tgt_label
  FROM vt_edges e JOIN vt_c c USING (edge_label)
)
SELECT 'unknown_edge_label' AS reason, e.edge_label, e.src, e.tgt
FROM vt_edges e LEFT JOIN vt_c c USING (edge_label)
WHERE c.src_label IS NULL
UNION ALL
SELECT 'dangling_src', k.edge_label, k.src, k.tgt
FROM vt_known k LEFT JOIN vt_nodes n ON n.id = k.src
WHERE n.id IS NULL
UNION ALL
SELECT 'src_type', k.edge_label, k.src, k.tgt
FROM vt_known k JOIN vt_nodes n ON n.id = k.src
LEFT JOIN vt_clo cl ON cl.child = n.nlabel AND cl.anc = k.src_label
WHERE cl.child IS NULL
UNION ALL
SELECT 'dangling_tgt', k.edge_label, k.src, k.tgt
FROM vt_known k LEFT JOIN vt_nodes n ON n.id = k.tgt
WHERE n.id IS NULL
UNION ALL
SELECT 'tgt_type', k.edge_label, k.src, k.tgt
FROM vt_known k JOIN vt_nodes n ON n.id = k.tgt
LEFT JOIN vt_clo cl ON cl.child = n.nlabel AND cl.anc = k.tgt_label
WHERE cl.child IS NULL
UNION ALL
SELECT 'duplicate_edge', edge_label, src, tgt
FROM (SELECT edge_label, src, tgt, count(*) AS n
      FROM vt_edges GROUP BY 1, 2, 3)
WHERE n > 1"""
