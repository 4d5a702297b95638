"""Distributed PageRank over an edge table (integer fixed-point).

Completes the engine's iterative-graph family (connected_components:
undirected equivalence; transitive_closure: directed reachability;
this: stationary importance) — the centrality measure KG pipelines use
to rank entities for retrieval/linking priors.  The reference engine
has no graph-analytics surface (its MeTTa space answers pattern
matches only), so this is a beyond-reference op over the same triple
tables `sinks.write_triple_table` produces.

Cross-engine exactness
----------------------
All rank mass is int64 fixed-point (`scale`, default 10^12 = 1.0).
Per iteration, with damping dp/1000 (default 850):

    contrib(e)  = floor(r[src] / outdeg[src])           per edge
    r'[v]       = floor((1000-dp)*scale / (1000*N))     teleport
                + floor(dp * sum_in_contrib(v) / 1000)  links
                + floor(dp * dangling / (1000*N))       dangling mass

where dangling = sum of r over zero-outdegree nodes (redistributed
uniformly — the standard fix; dropping it leaks mass every round).
Every division is a single int64/int64 IEEE divide + floor; operands
stay < 2^53 for scale <= 10^12 (dp * S <= 850 * scale ~ 8.5e14), so
both engines round identically and a DuckDB twin with the SAME
expression shapes (pagerank_sql, generated from one formula) matches
bit-for-bit.  Floors shave at most a few units of 10^-12 per term per
round — deterministic quantization, not drift.

Scale shape
-----------
Each iteration: one join of ranks to edges on src (ranks are one row
per node; edges pre-joined with outdeg once and localCheckpointed),
one groupBy dst with map-side combine, one tiny dangling aggregate
injected as a SCALAR SUBQUERY (no crossJoin — a broadcast of a
single-row agg plans a BroadcastNestedLoopJoin, which the repo's plan
audit forbids), and a left join onto the node list.  2 data-sized
shuffles per iteration, both on uniform-ish id keys; celebrity
in-degree skew lands in the dst groupBy where partial aggregation
absorbs it (the combiner sums per partition before the exchange).
The node count N is loop-invariant and fetched ONCE via count() — a
bounded single-scalar driver fetch, the same legitimacy class as the
IVF centroid pulls — so the teleport constant folds into the
projection as a literal.  Lineage is cut per round with
localCheckpoint exactly like connected_components — without it
iteration i replays all i-1 predecessors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from biocypher_metta_spark.ckpt import local_checkpoint_cut as _ckcut
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping_permille: int = 850,
             scale: int = 10 ** 12) -> DataFrame:
    """(id, rank_fp) after `iterations` rounds; rank_fp is fixed-point
    rank * scale.  Edges are dedup'd (simple directed graph; parallel
    edges carry no extra weight — weighted PageRank is a different
    contract).  Sum of rank_fp ~ scale modulo floor shavings."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damping_permille < 1000:
        raise ValueError("damping_permille must be in (0, 1000), "
                         f"got {damping_permille}")
    dp = damping_permille
    spark = edges.sparkSession
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct()
             .localCheckpoint(eager=True))
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    ed = (e.join(deg, "src")
          .select("src", "dst", "outdeg")
          .localCheckpoint(eager=True))

    # loop-invariant scalars; math.floor(a / b) is the same single
    # int64/int64 IEEE divide + floor both engines execute, so the
    # Python-folded constants cannot drift from the SQL twin.
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_fp"))
    init = math.floor(scale / n)
    teleport = math.floor((1000 - dp) * scale / (1000 * n))

    ranks = nodes.select("id", F.lit(init).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = (ranks.join(ed, ranks["id"] == ed["src"])
                   .select(F.col("dst"),
                           F.floor(F.col("r") / F.col("outdeg"))
                           .cast("long").alias("c")))
        s = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("s"))
        dang = (ranks.join(deg, ranks["id"] == deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long")
                     .alias("d")))
        ranks = spark.sql(
            f"""
            SELECT n.id AS id,
                   CAST({teleport}
                        + floor({dp} * coalesce(s.s, 0) / 1000)
                        + floor({dp} * (SELECT d FROM {{dang}})
                                / {1000 * n})
                        AS BIGINT) AS r
            FROM {{nodes}} AS n LEFT JOIN {{s}} AS s ON n.id = s.dst
            """,
            nodes=nodes, s=s, dang=dang).localCheckpoint(eager=True)
    return ranks.select("id", F.col("r").alias("rank_fp"))


def pagerank_sql(edges_sql: str, src: str = "src", dst: str = "dst",
                 iterations: int = 5, damping_permille: int = 850,
                 scale: int = 10 ** 12) -> str:
    """DuckDB twin of pagerank() with the iterations UNROLLED as CTEs,
    GENERATED from the same integer formula (one source of truth — the
    two sides cannot drift).  `edges_sql` yields the raw edge rows;
    generated CTE names carry a pr_ prefix so they cannot collide with
    caller tables."""
    dp = damping_permille
    parts = [f"""WITH pr_raw AS (
{edges_sql.strip()}
), pr_e AS (
  SELECT DISTINCT {src} AS src, {dst} AS dst FROM pr_raw
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), pr_nodes AS (
  SELECT src AS id FROM pr_e UNION SELECT dst FROM pr_e
), pr_deg AS (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
  FROM pr_e GROUP BY 1
), pr_nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM pr_nodes
), pr_r0 AS (
  SELECT id, CAST(floor({scale} / pr_nn.n) AS BIGINT) AS r FROM pr_nodes, pr_nn
)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", pr_s{i} AS (
  SELECT pr_e.dst AS id,
         CAST(sum(CAST(floor(pr_r{p}.r / pr_deg.outdeg) AS BIGINT)) AS BIGINT)
           AS s
  FROM pr_r{p} JOIN pr_e ON pr_r{p}.id = pr_e.src JOIN pr_deg ON pr_e.src = pr_deg.id
  GROUP BY 1
), pr_d{i} AS (
  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang
  FROM pr_r{p} WHERE id NOT IN (SELECT id FROM pr_deg)
), pr_r{i} AS (
  SELECT pr_nodes.id,
         CAST(floor({(1000 - dp) * scale} / (1000 * pr_nn.n)) AS BIGINT)
         + CAST(floor({dp} * coalesce(pr_s{i}.s, 0) / 1000) AS BIGINT)
         + CAST(floor({dp} * pr_d{i}.dang / (1000 * pr_nn.n)) AS BIGINT)
           AS r
  FROM pr_nodes LEFT JOIN pr_s{i} ON pr_nodes.id = pr_s{i}.id, pr_nn, pr_d{i}
)""")
    parts.append(f"\nSELECT id, r AS rank_fp FROM pr_r{iterations}")
    return "".join(parts)


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts over the undirected simple graph
    induced by the edge list -> (id, triangles), every endpoint
    present (zero-triangle vertices included).

    Beyond-reference graph-analytics op (the reference's MeTTa space
    answers pattern matches only); triangles/clustering coefficient is
    the standard KG-quality signal for spotting over-linked hub
    entities and mention-linking noise.

    Scale shape
    -----------
    Degree orientation is the whole trick: every undirected edge is
    directed from its lower (degree, id) endpoint to its higher one,
    which bounds every out-degree by O(sqrt(2m)) [Chiba-Nishizeki].
    Wedge generation — the oriented edge list self-joined on its
    source — therefore costs sum_u C(outdeg(u), 2) = O(m^1.5) total
    work REGARDLESS of in-degree skew: a celebrity vertex (10^8
    neighbors in a web graph) is oriented INWARD from almost all of
    its edges and generates no wedges itself, so the hub never lands
    on one task.  Three shuffles total (degree agg, wedge self-join
    keyed on the wedge apex, closing-edge equi-join on (x, y) pairs)
    plus the final per-vertex count with map-side combine.  No
    iteration, no checkpoint, no driver state.

    Cross-engine exactness: pure integer counting — each triangle
    {a, b, c} is emitted exactly once (its vertices are totally
    ordered by (deg, id); the wedge apex is the minimum, the closing
    edge check follows the same order), so the DuckDB twin generated
    by triangle_count_sql() from the same recipe matches bit-for-bit.
    """
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("id"))
           .unionAll(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("deg")))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    e1 = o.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = o.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedge = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy")) | (
            (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))))
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedge.join(closing, ["x", "y"]).select("u", "x", "y")
    cnt = (tri.select(F.explode(F.array("u", "x", "y")).alias("id"))
           .groupBy("id").agg(F.count(F.lit(1)).cast("long")
                              .alias("triangles")))
    return (deg.select("id").join(cnt, "id", "left")
            .select("id", F.coalesce("triangles", F.lit(0)).cast("long")
                    .alias("triangles")))


def triangle_count_sql(edges_sql: str, src: str = "src",
                       dst: str = "dst") -> str:
    """DuckDB twin of triangle_count(), generated from the same
    orientation recipe (one source of truth).  CTE names carry a tc_
    prefix to avoid collisions with caller tables."""
    return f"""WITH tc_raw AS (
{edges_sql.strip()}
), tc_und AS (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM tc_raw
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), tc_deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS id FROM tc_und UNION ALL SELECT b FROM tc_und)
  GROUP BY 1
), tc_o AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN t.a ELSE t.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN t.b ELSE t.a END AS v,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN db.deg ELSE da.deg END AS dv
  FROM tc_und t
  JOIN tc_deg da ON t.a = da.id
  JOIN tc_deg db ON t.b = db.id
), tc_tri AS (
  SELECT e1.u AS u, e1.v AS x, e2.v AS y
  FROM tc_o e1
  JOIN tc_o e2 ON e1.u = e2.u
   AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
  JOIN tc_o e3 ON e3.u = e1.v AND e3.v = e2.v
), tc_cnt AS (
  SELECT id, CAST(count(*) AS BIGINT) AS triangles
  FROM (SELECT u AS id FROM tc_tri UNION ALL
        SELECT x FROM tc_tri UNION ALL
        SELECT y FROM tc_tri)
  GROUP BY 1
)
SELECT n.id AS id, CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles
FROM (SELECT id FROM tc_deg) n
LEFT JOIN tc_cnt c ON n.id = c.id"""


def kcore(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
          max_rounds: int = 64) -> DataFrame:
    """Vertices of the k-core — the (unique) maximal subgraph of the
    undirected simple graph in which every vertex keeps degree >= k —
    by iterative peeling: drop sub-k vertices, restrict edges, repeat
    to fixpoint.  Output: (id, core_deg), core_deg = the vertex's
    degree WITHIN the core.

    Completes the graph-quality family (triangles spot over-linked
    hubs; the k-core is the standard dense-nucleus extractor for
    KG entity-importance tiers and for stripping pendant crawl
    debris).  Beyond-reference op, same rationale as pagerank above.

    Scale shape
    -----------
    Each round: one degree groupBy (map-side combine absorbs hub
    skew) + one semi-join restricting edges to surviving endpoints —
    all on uniform id keys, never all-pairs.  Rounds = peeling depth
    of the graph (small for web/KG graphs: each round removes a full
    shell, and real degeneracy orders are shallow); lineage is cut
    per round with localCheckpoint exactly like transitive_closure /
    pagerank.  Convergence is checked by edge count (an O(1)-row
    action per round); the k-core's uniqueness means early-stop and
    the twin's fixed unroll agree as long as both reach fixpoint —
    exhaustion without convergence raises, matching the closure
    operator's contract (canonicalize.transitive_closure).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct().localCheckpoint())
    n = und.count()
    for _ in range(max_rounds):
        deg = (und.select(F.col("a").alias("id"))
               .unionAll(und.select(F.col("b").alias("id")))
               .groupBy("id")
               .agg(F.count(F.lit(1)).cast("long").alias("core_deg")))
        keep = deg.filter(F.col("core_deg") >= k)
        # _ckcut, not plain localCheckpoint: keep derives from und, so
        # this is a self-composition — Spark 4's origin-stats
        # propagation would square sizeInBytes per peel round (ckpt.py)
        nxt = _ckcut(und
                     .join(keep.select(F.col("id").alias("a")), "a",
                           "left_semi")
                     .join(keep.select(F.col("id").alias("b")), "b",
                           "left_semi"))
        m = nxt.count()
        if m == n:
            return keep
        und, n = nxt, m
    raise RuntimeError(
        f"kcore did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (peeling depth exceeds it)")


def kcore_sql(edges_sql: str, k: int, rounds: int,
              src: str = "src", dst: str = "dst") -> str:
    """DuckDB twin of kcore(): the peeling recurrence unrolled to a
    fixed `rounds` (the kmeans_sql/pagerank_sql pattern — DuckDB's
    recursive CTEs cannot re-aggregate the working set per round).
    Because the k-core is unique, the engine's early-stopped fixpoint
    equals the twin's fixed unroll whenever `rounds` >= peeling depth.
    Every round CTE is AS MATERIALIZED: each kc_e{{i}} is referenced
    ~5 times by round i+1, so without the hint DuckDB re-inlines the
    whole prefix per reference and planning blows up 5^rounds
    (measured: rounds=5 took 109 s inlined, milliseconds
    materialized).  CTE names carry a kc_ prefix."""
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    parts = [f"""WITH kc_e0 AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
)"""]
    for i in range(1, rounds + 1):
        p, c = f"kc_e{i - 1}", f"kc_e{i}"
        parts.append(f""", kc_d{i} AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS core_deg
  FROM (SELECT a AS id FROM {p} UNION ALL SELECT b FROM {p})
  GROUP BY 1
), kc_k{i} AS MATERIALIZED (
  SELECT id FROM kc_d{i} WHERE core_deg >= {k}
), {c} AS MATERIALIZED (
  SELECT e.a, e.b FROM {p} e
  JOIN kc_k{i} ka ON e.a = ka.id
  JOIN kc_k{i} kb ON e.b = kb.id
)""")
    parts.append(f"""
SELECT id, CAST(count(*) AS BIGINT) AS core_deg
FROM (SELECT a AS id FROM kc_e{rounds} UNION ALL
      SELECT b FROM kc_e{rounds})
GROUP BY 1
HAVING count(*) >= {k}""")
    return "".join(parts)


def label_propagation(edges: DataFrame, rounds: int, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Synchronous label propagation (community detection) over the
    undirected simple graph, run for a FIXED number of rounds.
    Output: (id, label) — nodes sharing a label after `rounds` sit in
    the same (approximate) community.

    Determinism is the whole design: classic LPA breaks vote ties
    randomly and updates asynchronously, which is irreproducible
    across engines AND across Spark task orderings. Here every node
    starts labeled with its own id, all nodes update simultaneously
    from the previous round's labels, and the vote winner is
    (max count, then MIN label) — a total order, so Spark and the
    unrolled DuckDB twin (label_propagation_sql, same recurrence)
    agree row-for-row. Fixed rounds rather than convergence because
    synchronous LPA can 2-cycle on bipartite structures; a fixed
    unroll is what the twin can express and what reproducibility
    wants (rounds=3-5 is the standard neighborhood-mixing depth).

    Distinct from connected_components: CC merges along ANY path
    (min-label flood); LPA weights by neighbor VOTE COUNTS, so dense
    cores keep their own label against a thin bridge — communities,
    not components.

    Scale shape: the adjacency (both directions, deduped,
    localCheckpointed once) is the loop invariant; each round is one
    equi-join of labels onto adjacency by neighbor id + one
    (id, label) groupBy with map-side combine + one min_by per id —
    all uniform-key shuffles, vote rows bounded by directed-edge
    count. Hub skew lands in the count groupBy where the partial agg
    absorbs it. Lineage cut per round (localCheckpoint), same as
    pagerank/kcore above."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("id"), F.col("b").alias("nb"))
           .unionAll(und.select(F.col("b").alias("id"),
                                F.col("a").alias("nb")))
           .localCheckpoint())
    labels = (adj.select("id").distinct()
              .select("id", F.col("id").alias("label"))
              .localCheckpoint())
    for _ in range(rounds):
        votes = (adj.join(labels.select(F.col("id").alias("nb"), "label"),
                          "nb")
                 .groupBy("id", "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (votes.groupBy("id")
                  .agg(F.min_by(
                      "label",
                      F.struct((-F.col("c")).alias("nc"),
                               F.col("label").alias("lb"))).alias("label"))
                  .localCheckpoint())
    return labels


def label_propagation_sql(edges_sql: str, rounds: int, src: str = "src",
                          dst: str = "dst") -> str:
    """DuckDB twin of label_propagation(): the synchronous vote
    recurrence unrolled `rounds` times (kcore_sql pattern, AS
    MATERIALIZED for the same 5^rounds re-inlining reason). The tie
    break is spelled row_number() ORDER BY c DESC, label ASC — an
    independent formulation of Spark's min_by struct(-c, label)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    parts = [f"""WITH lp_u AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), lp_adj AS MATERIALIZED (
  SELECT a AS id, b AS nb FROM lp_u
  UNION ALL SELECT b, a FROM lp_u
), lp_l0 AS MATERIALIZED (
  SELECT DISTINCT id, id AS label FROM lp_adj
)"""]
    for i in range(1, rounds + 1):
        parts.append(f""", lp_v{i} AS MATERIALIZED (
  SELECT n.id, l.label, count(*) AS c
  FROM lp_adj n JOIN lp_l{i - 1} l ON n.nb = l.id
  GROUP BY 1, 2
), lp_l{i} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id
                              ORDER BY c DESC, label ASC) AS rn
    FROM lp_v{i})
  WHERE rn = 1
)""")
    parts.append(f"""
SELECT id, label FROM lp_l{rounds}""")
    return "".join(parts)


def cooccurrence_edges(df: DataFrame, doc_col: str, item_col: str,
                       min_count: int = 1,
                       max_items_per_doc: int | None = None,
                       salt: str = "cooc") -> DataFrame:
    """Bipartite projection: (doc, item) memberships -> weighted
    item-item co-occurrence edges (item_a < item_b, n_docs = number
    of docs containing both). THE bulk KG-construction primitive for
    building entity/term graphs out of a document corpus (the input
    shape is exactly what linking.mention detection and parse_gtf
    attribute explosion emit).

    The scale trap is quadratic per-doc fanout: a doc with 10^5
    distinct items emits C(10^5, 2) ~ 5*10^9 pairs BY ITSELF, and web
    corpora always contain such docs (crawl debris, token dumps).
    `max_items_per_doc` is the guard: a deterministic uniform
    down-sample of each oversized doc's item set — row_number per doc
    ordered by the salted portable hash of (doc, item) — so every doc
    is bounded at C(cap, 2) pairs and the job's pair volume is
    sum(min(m_i, cap)^2)/2 instead of sum(m_i^2)/2. The hash makes
    the kept subset reproducible across runs/engines AND independent
    across docs (hashing the item alone would keep the SAME items
    everywhere — a biased projection). Choose the cap from the pair
    budget: cap=1000 bounds any doc at ~500k pairs.

    Scale shape: distinct on (doc, item), one self-equi-join on doc
    (never a cross join — the a.item < b.item predicate rides the
    doc-key join), one (item_a, item_b) count groupBy with map-side
    combine absorbing popular-pair skew. min_count prunes the long
    tail BEFORE the result materializes."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_items_per_doc is not None and max_items_per_doc < 2:
        raise ValueError("max_items_per_doc must be >= 2 (a 1-item doc "
                         f"emits no pairs anyway), got {max_items_per_doc}")
    items = (df.select(F.col(doc_col).alias("d"),
                       F.col(item_col).alias("it"))
             .filter(F.col("d").isNotNull() & F.col("it").isNotNull())
             .distinct())
    if max_items_per_doc is not None:
        from pyspark.sql.window import Window

        from biocypher_metta_spark.operators.text import portable_hash

        h = portable_hash(F.concat_ws(":", F.lit(salt),
                                      F.col("d").cast("string"),
                                      F.col("it").cast("string")))
        w = Window.partitionBy("d").orderBy(h.asc(), F.col("it").asc())
        items = (items.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= max_items_per_doc).drop("_rn"))
    a = items.select("d", F.col("it").alias("item_a"))
    b = items.select("d", F.col("it").alias("item_b"))
    return (a.join(b, "d")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= min_count))


def cooccurrence_edges_sql(memberships_sql: str, doc_col: str,
                           item_col: str, min_count: int = 1,
                           max_items_per_doc: int | None = None,
                           salt: str = "cooc") -> str:
    """DuckDB twin of cooccurrence_edges() — same distinct/cap/
    self-join/count recurrence, cap spelled with the identical md5
    prefix hash so both engines down-sample oversized docs to the
    SAME item subset."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    capped = "co_items"
    cap_cte = ""
    if max_items_per_doc is not None:
        if max_items_per_doc < 2:
            raise ValueError("max_items_per_doc must be >= 2, "
                             f"got {max_items_per_doc}")
        cap_cte = f""", co_capped AS MATERIALIZED (
  SELECT d, it FROM (
    SELECT d, it, row_number() OVER (
      PARTITION BY d
      ORDER BY ('0x' || substr(md5(concat_ws(':', '{salt}',
                CAST(d AS VARCHAR), CAST(it AS VARCHAR))), 1, 15))::BIGINT,
               it) AS rn
    FROM co_items)
  WHERE rn <= {max_items_per_doc}
)"""
        capped = "co_capped"
    return f"""WITH co_items AS MATERIALIZED (
  SELECT DISTINCT {doc_col} AS d, {item_col} AS it
  FROM (
{memberships_sql.strip()}
  )
  WHERE {doc_col} IS NOT NULL AND {item_col} IS NOT NULL
){cap_cte}
SELECT a.it AS item_a, b.it AS item_b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM {capped} a JOIN {capped} b ON a.d = b.d AND a.it < b.it
GROUP BY 1, 2
HAVING count(*) >= {min_count}"""


def neighborhood_jaccard(edges: DataFrame, min_common: int = 2,
                         src: str = "src", dst: str = "dst",
                         max_degree: int | None = None) -> DataFrame:
    """Link prediction by neighborhood overlap: for node pairs sharing
    >= min_common neighbors in the undirected simple graph, emit
    (node_a < node_b, n_common, jaccard_permille) with
    jaccard_permille = floor(1000 * |N(a) & N(b)| / |N(a) | N(b)|) —
    integer permille so both engines round identically. The standard
    "suggest this edge" / entity-merge-candidate primitive over KG
    adjacency.

    Built BY COMPOSITION on cooccurrence_edges: shared-neighbor pairs
    ARE the co-occurrence projection of the (neighbor, node)
    membership table — same self-join shape, same skew behavior, and
    the same quadratic guard: a 10^6-degree hub manufactures
    C(10^6, 2) candidate pairs through itself. `max_degree` forwards
    to the projection's per-doc cap: each hub VOTES with only a
    deterministic hash-uniform max_degree-subset of its members, so
    n_common becomes a sampled UNDER-count through capped hubs (an
    explicit approximation knob, opt-in and documented rather than
    silent, while degrees — and so the permille denominator — stay
    exact). min_common prunes the candidate tail before the degree
    joins.

    Scale shape: cooccurrence's distinct + self-join + count, then
    two broadcast-or-shuffle joins against the degree table (one row
    per node). Union size by inclusion-exclusion — no second pass
    over the adjacency."""
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nb"))))
    common = (cooccurrence_edges(adj, "nb", "node", min_count=min_common,
                                 max_items_per_doc=max_degree)
              .withColumnRenamed("item_a", "node_a")
              .withColumnRenamed("item_b", "node_b")
              .withColumnRenamed("n_docs", "n_common"))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long")
                                  .alias("deg"))
    out = (common
           .join(deg.select(F.col("node").alias("node_a"),
                            F.col("deg").alias("_da")), "node_a")
           .join(deg.select(F.col("node").alias("node_b"),
                            F.col("deg").alias("_db")), "node_b"))
    union = F.col("_da") + F.col("_db") - F.col("n_common")
    return (out.select("node_a", "node_b", "n_common",
                       F.floor(F.lit(1000) * F.col("n_common") / union)
                       .cast("long").alias("jaccard_permille")))


def neighborhood_jaccard_sql(edges_sql: str, min_common: int = 2,
                             src: str = "src", dst: str = "dst") -> str:
    """DuckDB twin of neighborhood_jaccard — the cooccurrence twin
    over the adjacency plus degree joins, floor-divided in integers."""
    adj_sql = f"""WITH nj_u AS (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
)
SELECT a AS node, b AS nb FROM nj_u
UNION ALL SELECT b, a FROM nj_u"""
    cooc = cooccurrence_edges_sql(adj_sql, "nb", "node",
                                  min_count=min_common)
    return f"""WITH nj_cooc AS MATERIALIZED (
{cooc}
), nj_adj AS MATERIALIZED (
{adj_sql}
), nj_deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM nj_adj GROUP BY 1
)
SELECT c.item_a AS node_a, c.item_b AS node_b,
       c.n_docs AS n_common,
       CAST(floor(1000.0 * c.n_docs
                  / (da.deg + db.deg - c.n_docs)) AS BIGINT)
         AS jaccard_permille
FROM nj_cooc c
JOIN nj_deg da ON c.item_a = da.node
JOIN nj_deg db ON c.item_b = db.node"""


def bfs_distances(edges: DataFrame, sources: DataFrame,
                  max_depth: int, src: str = "src",
                  dst: str = "dst") -> DataFrame:
    """Multi-source bounded BFS over the DIRECTED edge table: minimum
    hop distance from ANY source node to every node reachable within
    `max_depth` hops — the "how far is this entity from a trusted
    seed set" primitive (KG curation radius, ontology distance-to-root,
    link-prediction features). Returns (node, dist) with dist in
    [0, max_depth]; source nodes are dist 0 even when also reachable
    by a longer path. Completes the iterative-graph family next to
    transitive_closure (reachability without distances) — the
    reference engine walks such chains driver-side per query
    (metta_space_import.py pattern matching), never as a set job.

    Frontier iteration, NOT path doubling: in unweighted BFS a node's
    FIRST discovery round is its min distance, so each round joins
    only the current frontier (nodes discovered last round) against
    the edge table, then anti-joins the settled set. The settled set
    never flows through the expansion join — each round shuffles
    O(frontier x avg-degree), and the loop exits early when a round
    discovers nothing. max_depth bounds the rounds, which also makes
    the op total on cyclic graphs. One localCheckpoint per round cuts
    the lineage exactly like connected_components; hub out-degree skew
    lands in the frontier-edge join where AQE's skew split applies.

    Oracle twin (bfs_distances_sql) is an INDEPENDENT spelling: a
    recursive CTE that enumerates every (node, dist<=max_depth) walk
    prefix with UNION dedup, then takes min(dist) per node — full
    enumeration + aggregate vs frontier-settled, same answer by the
    BFS optimality argument."""
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct())
    e = e.localCheckpoint(eager=True)
    frontier = (sources.select(F.col(sources.columns[0]).alias("node"))
                .filter(F.col("node").isNotNull())
                .distinct()
                .select("node", F.lit(0).cast("int").alias("dist")))
    frontier = frontier.localCheckpoint(eager=True)
    settled = frontier
    for depth in range(1, max_depth + 1):
        nxt = (frontier.join(e, frontier["node"] == e["s"])
               .select(F.col("d").alias("node"))
               .distinct()
               .join(settled.select("node"), "node", "left_anti")
               .select("node", F.lit(depth).cast("int").alias("dist")))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled


def bfs_distances_sql(edges_sql: str, sources_sql: str,
                      max_depth: int, src: str = "src",
                      dst: str = "dst") -> str:
    """DuckDB twin of bfs_distances: recursive-CTE walk enumeration
    (UNION-deduped (node, dist) pairs, dist bounded by max_depth) with
    min(dist) per node — independent of the frontier-settled loop."""
    return f"""WITH RECURSIVE bfs_edges AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), bfs_walk AS (
  SELECT node, 0 AS dist FROM (
    SELECT DISTINCT node FROM (
{sources_sql.strip()}
    ) WHERE node IS NOT NULL
  )
  UNION
  SELECT e.d AS node, w.dist + 1 AS dist
  FROM bfs_walk w JOIN bfs_edges e ON e.s = w.node
  WHERE w.dist < {max_depth}
)
SELECT node, CAST(min(dist) AS INTEGER) AS dist
FROM bfs_walk GROUP BY node"""


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         iterations: int = 3, scale: int = 10 ** 6) -> DataFrame:
    """HITS hubs & authorities [Kleinberg JACM'99] — the directed-web
    complement to pagerank() (one stationary importance score there;
    here the mutual recursion "good hubs point at good authorities"),
    the classic ranking for link-graph corpora (web_link_edges ->
    canonical_url -> hits).  Returns (id, hub_fp, auth_fp), fixed-point
    in [0, scale].

    Cross-engine exactness: classic HITS L2-normalizes each round —
    irreproducible floats.  This is the documented MAX-normalized
    integer variant (normalizing by the max instead of the L2 norm
    rescales uniformly per round, so each round's RANKING is identical
    to the float recursion's up to floor quantization):

        a_raw[v] = sum over u->v of h[u]
        a[v]     = (a_raw[v] * scale) DIV greatest(max_v a_raw, 1)
        h_raw[u] = sum over u->v of a[v]
        h[u]     = (h_raw[u] * scale) DIV greatest(max_u h_raw, 1)

    with h initialized to `scale`.  The normalization products run in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB twin) — exact integer
    arithmetic with identical truncation on non-negative operands, the
    outlier_flags headroom pattern — so there is NO int64 ceiling on
    a_raw * scale and no 2^53 float-division hazard.

    Scale shape: per round two edge-sized equi-joins (scores onto
    src / onto dst) each followed by a groupBy on the opposite endpoint
    (map-side combine absorbs hub/authority skew — exactly the
    celebrity-key shape this op exists to rank) and ONE single-row max
    aggregate attached as a cross join (bounded scalar, the pagerank
    dangling-mass pattern); localCheckpoint per round cuts lineage.
    Zero in-degree (resp. out-degree) nodes hold score 0 from round 1
    on — every node appears in the output.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct()
             .localCheckpoint(eager=True))

    spark = edges.sparkSession
    # the single-row max rides in as a SCALAR SUBQUERY (the pagerank
    # dangling-mass pattern) — a crossJoin of the 1-row frame would
    # plan as BroadcastNestedLoopJoin and trip the plan audit
    norm_sql = """
        SELECT n.id AS id,
               CAST((CAST(coalesce(r.raw, 0) AS DECIMAL(38,0))
                     * {scale})
                    DIV greatest((SELECT mx FROM {{mx}}), 1)
                    AS BIGINT) AS s
        FROM {{nodes}} AS n LEFT JOIN {{raw}} AS r ON n.id = r.id
        """.format(scale=scale)

    h = nodes.select("id", F.lit(scale).cast("long").alias("s"))
    a = None
    for _ in range(iterations):
        a_raw = (h.join(e, h["id"] == e["src"])
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("s").cast("long").alias("raw")))
        mx_a = a_raw.agg(F.coalesce(F.max("raw"), F.lit(0))
                         .cast("long").alias("mx"))
        a = spark.sql(norm_sql, nodes=nodes, raw=a_raw,
                      mx=mx_a).localCheckpoint(eager=True)
        h_raw = (a.join(e, a["id"] == e["dst"])
                 .groupBy(F.col("src").alias("id"))
                 .agg(F.sum("s").cast("long").alias("raw")))
        mx_h = h_raw.agg(F.coalesce(F.max("raw"), F.lit(0))
                         .cast("long").alias("mx"))
        h = spark.sql(norm_sql, nodes=nodes, raw=h_raw,
                      mx=mx_h).localCheckpoint(eager=True)
    return (h.withColumnRenamed("s", "hub_fp")
            .join(a.withColumnRenamed("s", "auth_fp"), "id")
            .select("id", "hub_fp", "auth_fp"))


def hits_sql(edges_sql: str, src: str = "src", dst: str = "dst",
             iterations: int = 3, scale: int = 10 ** 6) -> str:
    """DuckDB twin of hits(), iterations unrolled as CTEs and GENERATED
    from the same recurrence (HUGEINT where the engine uses
    DECIMAL(38,0)); ht_ prefix avoids caller-table collisions."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    parts = [f"""WITH ht_raw AS (
{edges_sql.strip()}
), ht_e AS (
  SELECT DISTINCT {src} AS src, {dst} AS dst FROM ht_raw
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), ht_nodes AS (
  SELECT src AS id FROM ht_e UNION SELECT dst FROM ht_e
), ht_h0 AS (
  SELECT id, CAST({scale} AS BIGINT) AS s FROM ht_nodes
)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", ht_araw{i} AS (
  SELECT ht_e.dst AS id, CAST(sum(s) AS BIGINT) AS raw
  FROM ht_h{p} JOIN ht_e ON ht_h{p}.id = ht_e.src
  GROUP BY 1
), ht_amx{i} AS (
  SELECT CAST(coalesce(max(raw), 0) AS BIGINT) AS mx FROM ht_araw{i}
), ht_a{i} AS (
  SELECT ht_nodes.id,
         CAST(CAST(coalesce(raw, 0) AS HUGEINT) * {scale}
              // greatest(mx, 1) AS BIGINT) AS s
  FROM ht_nodes LEFT JOIN ht_araw{i} ON ht_nodes.id = ht_araw{i}.id,
       ht_amx{i}
), ht_hraw{i} AS (
  SELECT ht_e.src AS id, CAST(sum(s) AS BIGINT) AS raw
  FROM ht_a{i} JOIN ht_e ON ht_a{i}.id = ht_e.dst
  GROUP BY 1
), ht_hmx{i} AS (
  SELECT CAST(coalesce(max(raw), 0) AS BIGINT) AS mx FROM ht_hraw{i}
), ht_h{i} AS (
  SELECT ht_nodes.id,
         CAST(CAST(coalesce(raw, 0) AS HUGEINT) * {scale}
              // greatest(mx, 1) AS BIGINT) AS s
  FROM ht_nodes LEFT JOIN ht_hraw{i} ON ht_nodes.id = ht_hraw{i}.id,
       ht_hmx{i}
)""")
    parts.append(f"""
SELECT ht_h{iterations}.id, ht_h{iterations}.s AS hub_fp,
       ht_a{iterations}.s AS auth_fp
FROM ht_h{iterations} JOIN ht_a{iterations}
  ON ht_h{iterations}.id = ht_a{iterations}.id""")
    return "".join(parts)


def sssp_bounded(edges: DataFrame, sources: DataFrame, rounds: int,
                 src: str = "src", dst: str = "dst",
                 weight: str = "w") -> DataFrame:
    """Multi-source WEIGHTED shortest paths, bounded Bellman-Ford:
    (node, cost) = minimum integer path cost from any source node over
    paths of AT MOST `rounds` edges — the weighted sibling of
    bfs_distances (hop counts) for KG edges that carry confidence /
    latency / length weights. The hop bound is the documented
    semantics, not an approximation knob: it makes the op total on
    cyclic graphs (including negative-weight edges — "cheapest
    <= R-hop path" is well-defined where "cheapest path" is not) and
    equals true shortest distances whenever rounds >= graph diameter
    with nonnegative weights.

    Frontier relaxation, NOT full-table rounds: the Bellman-Ford
    invariant (after round r, cost[v] = min over <= r-edge paths)
    survives restricting round r's expansion to nodes IMPROVED in
    round r-1 — any <= r-edge improvement extends an improvement from
    the previous round. Each round therefore shuffles O(improved x
    avg-degree) + one min-combine groupBy, settled mass never
    recirculates, and the loop exits early once no cost improves.
    Parallel edges collapse to their min weight up front (one
    distinct-shaped groupBy); per-round localCheckpoint cuts lineage
    exactly like connected_components; hub out-degree skew lands in
    the frontier join where AQE's skew split applies.

    Oracle twin (sssp_bounded_sql) is an INDEPENDENT spelling:
    recursive-CTE enumeration of (node, cost, hops <= rounds) walk
    tuples with UNION dedup, then min(cost) per node — enumeration +
    aggregate vs frontier relaxation, same answer by the invariant."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & F.col("w").isNotNull())
         .groupBy("s", "d").agg(F.min("w").alias("w")))
    e = e.localCheckpoint(eager=True)
    dist = (sources.select(F.col(sources.columns[0]).alias("node"))
            .filter(F.col("node").isNotNull())
            .distinct()
            .select("node", F.lit(0).cast("long").alias("cost")))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for _ in range(rounds):
        cand = (frontier.join(e, frontier["node"] == e["s"])
                .select(F.col("d").alias("node"),
                        (F.col("cost") + F.col("w")).alias("cost"))
                .groupBy("node").agg(F.min("cost").alias("cost")))
        improved = (cand.join(dist.withColumnRenamed("cost", "_old"),
                              "node", "left")
                    .filter(F.col("_old").isNull()
                            | (F.col("cost") < F.col("_old")))
                    .select("node", "cost"))
        improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        dist = (dist.join(improved.select("node"), "node", "left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True))
        frontier = improved
    return dist


def sssp_bounded_sql(edges_sql: str, sources_sql: str, rounds: int,
                     src: str = "src", dst: str = "dst",
                     weight: str = "w") -> str:
    """DuckDB twin of sssp_bounded: recursive-CTE walk enumeration —
    (node, cost, hops) tuples bounded by `rounds` hops, UNION-deduped
    so cyclic graphs terminate — then min(cost) per node."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    return f"""WITH RECURSIVE sp_edges AS MATERIALIZED (
  SELECT s, d, min(w) AS w FROM (
    SELECT {src} AS s, {dst} AS d, CAST({weight} AS BIGINT) AS w FROM (
{edges_sql.strip()}
    ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
      AND {weight} IS NOT NULL
  ) GROUP BY s, d
), sp_walk AS (
  SELECT node, CAST(0 AS BIGINT) AS cost, 0 AS hops FROM (
    SELECT DISTINCT node FROM (
{sources_sql.strip()}
    ) WHERE node IS NOT NULL
  )
  UNION
  SELECT e.d AS node, w.cost + e.w AS cost, w.hops + 1 AS hops
  FROM sp_walk w JOIN sp_edges e ON e.s = w.node
  WHERE w.hops < {rounds}
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost
FROM sp_walk GROUP BY node"""


def random_walks(edges: DataFrame, walk_len: int, reps: int = 1,
                 src: str = "src", dst: str = "dst",
                 seed: str = "w") -> DataFrame:
    """Deterministic 'random' walks over the directed edge table:
    `reps` walks of up to `walk_len` steps from every node with an
    out-edge, each step choosing the neighbor at position
    portable_hash('<start>:<rep>:<step>:<cur>') % out_degree in the
    dst-sorted adjacency — the DeepWalk/node2vec (p=q=1) corpus
    generator [Perozzi et al. KDD'14] re-expressed so the "randomness"
    is a pure function of (walk identity, step, current node) and any
    engine regenerates the identical corpus: KG -> token-sequence
    training data with exact reproducibility instead of seeds-and-hope.
    Returns (start, rep, step, node) rows; step 0 is the start node;
    walks stop early at sink nodes.

    Scale shape: the adjacency is positioned ONCE (row_number per src
    over dst order — one shuffle, window over per-node lists) and
    localCheckpointed alongside its degree table. Each step is two
    EQUI-joins: frontier x degree on node (1:1, computes the hash
    position) then x adjacency on (node, pos) (1:1) — no degree-shaped
    expansion at hub nodes, unlike joining on a residual pos = hash %
    deg predicate, which would fan every frontier row out by its full
    degree before filtering. Frontier rows stay O(#walks) throughout;
    per-step localCheckpoint cuts lineage. Walk-count scaling is by
    `reps`, embarrassingly parallel.

    Oracle twin (random_walks_sql) UNROLLS the steps as CTEs generated
    from the same hash recipe over DuckDB's row_number — independent
    window/join machinery, identical corpus."""
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if reps < 1:
        raise ValueError(f"reps must be >= 1, got {reps}")
    from pyspark.sql import Window

    from biocypher_metta_spark.operators.text import portable_hash

    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct())
    adj = (e.withColumn(
        "pos", F.row_number().over(Window.partitionBy("s").orderBy("d"))
        - 1).localCheckpoint(eager=True))
    deg = (adj.groupBy("s").agg(F.count("*").alias("deg"))
           .localCheckpoint(eager=True))

    # rep fan-out via a literal-array explode (map-only) — a cross
    # join against a range would plan the BroadcastNestedLoopJoin the
    # plan audit forbids
    walks = (adj.select(F.col("s").alias("start")).distinct()
             .select("start",
                     F.explode(F.array(*[F.lit(i).cast("int")
                                         for i in range(reps)]))
                     .alias("rep"))
             .select("start", "rep",
                     F.lit(0).cast("int").alias("step"),
                     F.col("start").alias("node")))
    walks = walks.localCheckpoint(eager=True)
    frontier = walks
    for t in range(1, walk_len + 1):
        h = portable_hash(F.concat_ws(
            ":", F.col("start").cast("string"),
            F.col("rep").cast("string"), F.lit(str(t)),
            F.col("node").cast("string")))
        stepped = (frontier.join(deg, frontier["node"] == deg["s"])
                   .select("start", "rep",
                           F.col("node").alias("cur"),
                           F.pmod(h, F.col("deg")).alias("pos")))
        nxt = (stepped.join(adj, (stepped["cur"] == adj["s"])
                            & (stepped["pos"] == adj["pos"]))
               .select("start", "rep",
                       F.lit(t).cast("int").alias("step"),
                       F.col("d").alias("node")))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        walks = walks.unionByName(nxt)
        frontier = nxt
    return walks


def random_walks_sql(edges_sql: str, walk_len: int, reps: int = 1,
                     src: str = "src", dst: str = "dst") -> str:
    """DuckDB twin of random_walks, steps UNROLLED as CTEs from the
    same hash recipe (60-bit md5 prefix of '<start>:<rep>:<step>:
    <cur>') over row_number adjacency positions."""
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    if reps < 1:
        raise ValueError(f"reps must be >= 1, got {reps}")
    parts = [f"""WITH rw_adj AS MATERIALIZED (
  SELECT s, d, row_number() OVER (PARTITION BY s ORDER BY d) - 1 AS pos
  FROM (
    SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
    ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
  )
), rw_deg AS (
  SELECT s, count(*) AS deg FROM rw_adj GROUP BY s
), rw_w0 AS (
  SELECT start, rep, 0 AS step, start AS node
  FROM (SELECT DISTINCT s AS start FROM rw_adj),
       (SELECT unnest(range({reps})) AS rep)
)"""]
    for t in range(1, walk_len + 1):
        h = (f"CAST(('0x' || substr(md5(CAST(w.start AS VARCHAR) || ':' "
             f"|| CAST(w.rep AS VARCHAR) || ':{t}:' "
             f"|| CAST(w.node AS VARCHAR)), 1, 15)) AS BIGINT)")
        parts.append(f""", rw_w{t} AS (
  SELECT w.start, w.rep, {t} AS step, a.d AS node
  FROM rw_w{t - 1} w
  JOIN rw_deg g ON g.s = w.node
  JOIN rw_adj a ON a.s = w.node AND a.pos = {h} % g.deg
)""")
    union = "\nUNION ALL ".join(
        f"SELECT start, rep, step, node FROM rw_w{t}"
        for t in range(walk_len + 1))
    parts.append(f"""
SELECT start, CAST(rep AS INTEGER) AS rep,
       CAST(step AS INTEGER) AS step, node
FROM ({union})""")
    return "".join(parts)


_WL_SUM_MOD = 1 << 40


def wl_colors(edges: DataFrame, rounds: int = 2, src: str = "src",
              dst: str = "dst") -> DataFrame:
    """Weisfeiler-Leman color refinement over the directed edge table:
    (node, color) where equal colors after `rounds` refinements mark
    nodes the R-round WL test cannot distinguish — the structural-role
    signature KG pipelines use for schema inference and structure-level
    entity dedup (two entities wired identically get one color however
    their ids differ). Round 0 colors by (out-degree, in-degree);
    round t rehashes (previous color, out-neighborhood digest,
    in-neighborhood digest).

    Bounded-state variant: textbook WL concatenates the SORTED
    neighbor-color multiset — per-node state that grows with degree
    and serializes hub nodes (the as-of hot-key problem as an agg).
    Here the multiset is digested ADDITIVELY instead: sum over
    neighbors of (neighbor-color hash mod 2^40) — order-free, so a
    plain groupBy sum with map-side combine absorbs any hub, and
    int64-safe to ~8M-degree hubs (2^63 / 2^40). Distinct multisets
    can collide only through the 60-bit rehash / 40-bit summands
    (negligible at KG scales, and a collision merely coarsens the
    partition — it never splits a true class, the conservative
    direction for dedup candidates).

    Scale shape per round: two equi-joins of the one-row-per-node
    color table to the edge table (colors are the small side; AQE
    handles hub skew in the edge-side shuffle) + two summing groupBys
    + one map-only rehash. rounds is typically 2-3 (WL stabilizes in
    diameter-ish rounds on real graphs).

    Oracle twin (wl_colors_sql) UNROLLS the rounds as generated CTEs
    over the same hash recipe."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    from biocypher_metta_spark.operators.text import portable_hash

    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("s").alias("node"))
             .unionByName(e.select(F.col("d").alias("node")))
             .distinct())
    outd = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("od"))
    ind = e.groupBy(F.col("d").alias("node")).agg(
        F.count("*").alias("idg"))
    colors = (nodes.join(outd, "node", "left").join(ind, "node", "left")
              .select("node", portable_hash(F.concat_ws(
                  ":", F.lit("wl0"),
                  F.coalesce(F.col("od"), F.lit(0)).cast("string"),
                  F.coalesce(F.col("idg"), F.lit(0)).cast("string")))
                  .alias("color"))
              .localCheckpoint(eager=True))
    for _ in range(rounds):
        digest = F.pmod(portable_hash(
            F.concat(F.lit("n"), F.col("color").cast("string"))),
            F.lit(_WL_SUM_MOD))
        s_out = (e.join(colors, e["d"] == colors["node"])
                 .select(F.col("s").alias("node"), digest.alias("g"))
                 .groupBy("node").agg(F.sum("g").alias("so")))
        s_in = (e.join(colors, e["s"] == colors["node"])
                .select(F.col("d").alias("node"), digest.alias("g"))
                .groupBy("node").agg(F.sum("g").alias("si")))
        colors = (colors.join(s_out, "node", "left")
                  .join(s_in, "node", "left")
                  .select("node", portable_hash(F.concat_ws(
                      ":", F.lit("wl"), F.col("color").cast("string"),
                      F.coalesce(F.col("so"), F.lit(0)).cast("string"),
                      F.coalesce(F.col("si"), F.lit(0)).cast("string")))
                      .alias("color"))
                  .localCheckpoint(eager=True))
    return colors


def wl_colors_sql(edges_sql: str, rounds: int = 2, src: str = "src",
                  dst: str = "dst") -> str:
    """DuckDB twin of wl_colors, rounds UNROLLED as CTEs from the same
    60-bit-hash / 40-bit-additive-digest recipe."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    h = ("CAST(('0x' || substr(md5({v}), 1, 15)) AS BIGINT)")
    parts = [f"""WITH wl_edges AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), wl_nodes AS (
  SELECT s AS node FROM wl_edges UNION SELECT d FROM wl_edges
), wl_c0 AS (
  SELECT n.node,
         {h.format(v="'wl0:' || CAST(coalesce(o.od, 0) AS VARCHAR)"
                     " || ':' || CAST(coalesce(i.idg, 0) AS VARCHAR)")}
           AS color
  FROM wl_nodes n
  LEFT JOIN (SELECT s AS node, count(*) AS od FROM wl_edges
             GROUP BY s) o ON o.node = n.node
  LEFT JOIN (SELECT d AS node, count(*) AS idg FROM wl_edges
             GROUP BY d) i ON i.node = n.node
)"""]
    for t in range(1, rounds + 1):
        dig = h.format(v="'n' || CAST(c.color AS VARCHAR)")
        parts.append(f""", wl_so{t} AS (
  SELECT e.s AS node, sum({dig} % {_WL_SUM_MOD}) AS so
  FROM wl_edges e JOIN wl_c{t - 1} c ON c.node = e.d GROUP BY e.s
), wl_si{t} AS (
  SELECT e.d AS node, sum({dig} % {_WL_SUM_MOD}) AS si
  FROM wl_edges e JOIN wl_c{t - 1} c ON c.node = e.s GROUP BY e.d
), wl_c{t} AS (
  SELECT c.node,
         {h.format(v="'wl:' || CAST(c.color AS VARCHAR) || ':' "
                     "|| CAST(coalesce(o.so, 0) AS VARCHAR) || ':' "
                     "|| CAST(coalesce(i.si, 0) AS VARCHAR)")} AS color
  FROM wl_c{t - 1} c
  LEFT JOIN wl_so{t} o ON o.node = c.node
  LEFT JOIN wl_si{t} i ON i.node = c.node
)""")
    parts.append(f"""
SELECT node, color FROM wl_c{rounds}""")
    return "".join(parts)


def temporal_reachability(edges: DataFrame, sources: DataFrame,
                          max_hops: int, src: str = "src",
                          dst: str = "dst",
                          ts: str = "ts") -> DataFrame:
    """Earliest-arrival reachability over a TEMPORAL edge table
    (contact (src, dst) at integer time ts): (node, arrival) = the
    minimum time any information released by a source at its start
    time can reach the node along a TIME-RESPECTING path — each hop's
    contact time must be >= the arrival at its tail [Holme & Saramäki,
    Phys. Rep. 2012]. Static reachability over-counts badly on contact
    data (a path through yesterday's edge into last week's edge exists
    statically but carries nothing); this is the diffusion/provenance
    primitive for event-shaped KGs. `sources` carries (node, t0) start
    times; `max_hops` bounds rounds (totality on dense contact sets).

    Frontier relaxation, same skeleton as sssp_bounded: a node
    re-expands only when its arrival IMPROVED last round (any
    earlier-arrival path extends an improvement), each round = one
    equi-join of the frontier to edges on the tail + the ts >= arrival
    residual filter + a min-combine groupBy; per-round localCheckpoint;
    early exit when nothing improves. Hub out-degree skew lands in the
    frontier join under AQE, and the min-combine absorbs in-degree
    skew map-side.

    Oracle twin (temporal_reachability_sql): recursive-CTE enumeration
    of (node, arrival, hops) tuples with the same time-respecting
    constraint, UNION-deduped, then min(arrival) — independent
    enumeration vs relaxation."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"),
                      F.col(ts).cast("long").alias("t"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & F.col("t").isNotNull())
         .distinct())
    e = e.localCheckpoint(eager=True)
    arr = (sources.select(F.col(sources.columns[0]).alias("node"),
                          F.col(sources.columns[1]).cast("long")
                          .alias("arrival"))
           .filter(F.col("node").isNotNull()
                   & F.col("arrival").isNotNull())
           .groupBy("node").agg(F.min("arrival").alias("arrival")))
    arr = arr.localCheckpoint(eager=True)
    frontier = arr
    for _ in range(max_hops):
        cand = (frontier.join(e, frontier["node"] == e["s"])
                .filter(F.col("t") >= F.col("arrival"))
                .select(F.col("d").alias("node"),
                        F.col("t").alias("arrival"))
                .groupBy("node").agg(F.min("arrival").alias("arrival")))
        improved = (cand.join(arr.withColumnRenamed("arrival", "_old"),
                              "node", "left")
                    .filter(F.col("_old").isNull()
                            | (F.col("arrival") < F.col("_old")))
                    .select("node", "arrival"))
        improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        arr = (arr.join(improved.select("node"), "node", "left_anti")
               .unionByName(improved)
               .localCheckpoint(eager=True))
        frontier = improved
    return arr


def temporal_reachability_sql(edges_sql: str, sources_sql: str,
                              max_hops: int, src: str = "src",
                              dst: str = "dst", ts: str = "ts") -> str:
    """DuckDB twin of temporal_reachability: recursive-CTE walk
    enumeration under the time-respecting constraint, then
    min(arrival) per node."""
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    return f"""WITH RECURSIVE tr_edges AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d, CAST({ts} AS BIGINT) AS t
  FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {ts} IS NOT NULL
), tr_walk AS (
  SELECT node, arrival, 0 AS hops FROM (
    SELECT node, CAST(min(t0) AS BIGINT) AS arrival FROM (
{sources_sql.strip()}
    ) WHERE node IS NOT NULL AND t0 IS NOT NULL GROUP BY node
  )
  UNION
  SELECT e.d AS node, e.t AS arrival, w.hops + 1 AS hops
  FROM tr_walk w JOIN tr_edges e ON e.s = w.node AND e.t >= w.arrival
  WHERE w.hops < {max_hops}
)
SELECT node, CAST(min(arrival) AS BIGINT) AS arrival
FROM tr_walk GROUP BY node"""


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          src: str = "src", dst: str = "dst",
                          iterations: int = 5,
                          damping_permille: int = 850,
                          scale: int = 10 ** 12) -> DataFrame:
    """Personalized PageRank: pagerank() with ALL teleport mass
    restricted to the seed set — the random surfer restarts at a seed
    instead of anywhere, so rank_fp measures importance RELATIVE to
    the seeds: the standard KG retrieval prior ("entities relevant to
    this query's seed entities") and the local-community scorer
    [Jeh & Widom, WWW'03]. Same integer fixed-point contract as
    pagerank (identical overflow bounds, floors are deterministic
    quantization); init mass and the dangling redistribution also go
    to seeds only, so all mass stays in the seeded component — nodes
    the seeds cannot reach hold rank exactly 0.

    Scale shape: identical to pagerank (two data-sized shuffles per
    round, scalar dangling subquery, map-side combine on the dst agg)
    plus one broadcast-sized left join to the seed flag per round;
    seeds not present in the graph are ignored (documented — the twin
    does the same).

    Twin: personalized_pagerank_sql, generated from this formula."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damping_permille < 1000:
        raise ValueError("damping_permille must be in (0, 1000), "
                         f"got {damping_permille}")
    dp = damping_permille
    spark = edges.sparkSession
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    e = e.localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id")))
             .distinct()
             .localCheckpoint(eager=True))
    sd = (seeds.select(F.col(seeds.columns[0]).alias("id"))
          .filter(F.col("id").isNotNull())
          .distinct()
          .join(nodes, "id")
          .localCheckpoint(eager=True))
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    ed = (e.join(deg, "src")
          .select("src", "dst", "outdeg")
          .localCheckpoint(eager=True))

    ns = sd.count()
    if ns == 0:
        raise ValueError("no seed appears in the graph")
    init = math.floor(scale / ns)
    teleport = math.floor((1000 - dp) * scale / (1000 * ns))

    ranks = (nodes.join(sd.withColumn("_isseed", F.lit(1)), "id", "left")
             .select("id", F.when(F.col("_isseed").isNotNull(),
                                  F.lit(init)).otherwise(F.lit(0))
                     .cast("long").alias("r")))
    for _ in range(iterations):
        contrib = (ranks.join(ed, ranks["id"] == ed["src"])
                   .select(F.col("dst"),
                           F.floor(F.col("r") / F.col("outdeg"))
                           .cast("long").alias("c")))
        s = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("s"))
        dang = (ranks.join(deg, ranks["id"] == deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long")
                     .alias("d")))
        ranks = spark.sql(
            f"""
            SELECT n.id AS id,
                   CAST(CASE WHEN sd.id IS NOT NULL THEN {teleport}
                        ELSE 0 END
                        + floor({dp} * coalesce(s.s, 0) / 1000)
                        + CASE WHEN sd.id IS NOT NULL THEN
                            floor({dp} * (SELECT d FROM {{dang}})
                                  / {1000 * ns})
                          ELSE 0 END
                        AS BIGINT) AS r
            FROM {{nodes}} AS n
            LEFT JOIN {{s}} AS s ON n.id = s.dst
            LEFT JOIN {{sd}} AS sd ON n.id = sd.id
            """,
            nodes=nodes, s=s, dang=dang, sd=sd) \
            .localCheckpoint(eager=True)
    return ranks.select("id", F.col("r").alias("rank_fp"))


def personalized_pagerank_sql(edges_sql: str, seeds_sql: str,
                              src: str = "src", dst: str = "dst",
                              iterations: int = 5,
                              damping_permille: int = 850,
                              scale: int = 10 ** 12) -> str:
    """DuckDB twin of personalized_pagerank with iterations UNROLLED,
    generated from the same integer formula. `seeds_sql` yields one
    column `id`."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 < damping_permille < 1000:
        raise ValueError("damping_permille must be in (0, 1000), "
                         f"got {damping_permille}")
    dp = damping_permille
    parts = [f"""WITH ppr_raw AS (
{edges_sql.strip()}
), ppr_e AS (
  SELECT DISTINCT {src} AS src, {dst} AS dst FROM ppr_raw
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), ppr_nodes AS (
  SELECT src AS id FROM ppr_e UNION SELECT dst FROM ppr_e
), ppr_seeds AS (
  SELECT DISTINCT s.id FROM (
{seeds_sql.strip()}
  ) s JOIN ppr_nodes n ON n.id = s.id WHERE s.id IS NOT NULL
), ppr_deg AS (
  SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
  FROM ppr_e GROUP BY 1
), ppr_ns AS (
  SELECT CAST(count(*) AS BIGINT) AS ns FROM ppr_seeds
), ppr_r0 AS (
  SELECT n.id,
         CASE WHEN sd.id IS NOT NULL
              THEN CAST(floor({scale} / ppr_ns.ns) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS r
  FROM ppr_nodes n LEFT JOIN ppr_seeds sd ON n.id = sd.id, ppr_ns
)"""]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f""", ppr_s{i} AS (
  SELECT ppr_e.dst AS id,
         CAST(sum(CAST(floor(ppr_r{p}.r / ppr_deg.outdeg) AS BIGINT))
              AS BIGINT) AS s
  FROM ppr_r{p}
  JOIN ppr_e ON ppr_r{p}.id = ppr_e.src
  JOIN ppr_deg ON ppr_e.src = ppr_deg.id
  GROUP BY 1
), ppr_d{i} AS (
  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang
  FROM ppr_r{p} WHERE id NOT IN (SELECT id FROM ppr_deg)
), ppr_r{i} AS (
  SELECT n.id,
         CASE WHEN sd.id IS NOT NULL
              THEN CAST(floor({(1000 - dp) * scale}
                              / (1000 * ppr_ns.ns)) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END
         + CAST(floor({dp} * coalesce(ppr_s{i}.s, 0) / 1000) AS BIGINT)
         + CASE WHEN sd.id IS NOT NULL
                THEN CAST(floor({dp} * ppr_d{i}.dang
                                / (1000 * ppr_ns.ns)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END
           AS r
  FROM ppr_nodes n
  LEFT JOIN ppr_s{i} ON n.id = ppr_s{i}.id
  LEFT JOIN ppr_seeds sd ON n.id = sd.id, ppr_ns, ppr_d{i}
)""")
    parts.append(f"\nSELECT id, r AS rank_fp FROM ppr_r{iterations}")
    return "".join(parts)


def resource_allocation_links(edges: DataFrame, min_common: int = 2,
                              src: str = "src", dst: str = "dst",
                              scale: int = 1_000_000,
                              max_hub_degree: int | None = None
                              ) -> DataFrame:
    """Link prediction by the resource-allocation index (Zhou-Lu-Zhang
    2009): for non-adjacent pairs a < b, ra_fp = sum over common
    neighbors z of floor(scale / deg(z)) — exact integer per term, so
    both engines sum identically (Adamic-Adar's 1/log deg needs libm;
    RA is its division-only sibling and empirically at least as good).

    Differs from neighborhood_jaccard twice: each shared neighbor is
    WEIGHTED by its inverse degree (a promiscuous hub witness counts
    for little), and existing edges are ANTI-JOINED away — the output
    is proposals for edges the graph does not have, the actual
    link-prediction contract.

    Scale shape: one self-join of the adjacency on the shared
    neighbor z — the same quadratic hub hazard as the co-occurrence
    projection, but RA's own weighting makes the principled guard a
    TRUNCATION, not a sample: `max_hub_degree=D` drops z with
    deg(z) > D entirely, and every dropped term was < scale/D by
    construction, so the error per pair is bounded by
    n_dropped_witnesses * floor(scale/D) (opt-in, default exact).
    Then one groupBy on the pair, a left-anti join against the
    undirected edge set, and a min_common prune that runs BEFORE the
    anti-join so the candidate tail never reaches it."""
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nb"))))
    deg = adj.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    zdeg = deg.select(F.col("node").alias("nb"), F.col("deg").alias("zdeg"))
    wadj = adj.join(zdeg, "nb")
    if max_hub_degree is not None:
        if max_hub_degree < 1:
            raise ValueError("max_hub_degree must be >= 1")
        wadj = wadj.filter(F.col("zdeg") <= max_hub_degree)
    l, r = wadj.alias("l"), wadj.alias("r")
    cand = (l.join(r, (F.col("l.nb") == F.col("r.nb"))
                   & (F.col("l.node") < F.col("r.node")))
            .groupBy(F.col("l.node").alias("node_a"),
                     F.col("r.node").alias("node_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"),
                 F.sum(F.floor(F.lit(scale) / F.col("l.zdeg")))
                 .cast("long").alias("ra_fp"))
            .filter(F.col("n_common") >= min_common))
    return cand.join(
        und, (cand["node_a"] == und["a"]) & (cand["node_b"] == und["b"]),
        "left_anti")


def resource_allocation_links_sql(edges_sql: str, min_common: int = 2,
                                  src: str = "src", dst: str = "dst",
                                  scale: int = 1_000_000) -> str:
    """DuckDB twin of resource_allocation_links (exact path)."""
    return f"""WITH ra_u AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), ra_adj AS MATERIALIZED (
  SELECT a AS node, b AS nb FROM ra_u
  UNION ALL SELECT b, a FROM ra_u
), ra_deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM ra_adj GROUP BY 1
), ra_cand AS (
  SELECT l.node AS node_a, r.node AS node_b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(CAST(floor({scale} / zd.deg) AS BIGINT)) AS BIGINT)
           AS ra_fp
  FROM ra_adj l
  JOIN ra_adj r ON l.nb = r.nb AND l.node < r.node
  JOIN ra_deg zd ON zd.node = l.nb
  GROUP BY 1, 2
  HAVING count(*) >= {min_common}
)
SELECT c.node_a, c.node_b, c.n_common, c.ra_fp
FROM ra_cand c
WHERE NOT EXISTS (SELECT 1 FROM ra_u e
                  WHERE e.a = c.node_a AND e.b = c.node_b)"""


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         scale: int = 1000) -> DataFrame:
    """Newman degree assortativity of the undirected simple graph:
    Pearson correlation over the stub multiset {(deg(u), deg(v)),
    (deg(v), deg(u)) for each edge}, quantized to r_milli =
    floor(scale * r). Positive: hubs attach to hubs (social
    networks); negative: hubs attach to leaves (biological /
    technological KGs) — the one-number mixing diagnostic for an
    extracted graph.

    PURE integer arithmetic, no float anywhere: the stub multiset is
    symmetric, so sum_x = sum_y and sum_xx = sum_yy, and Pearson's
    denominator sqrt(den_x)*sqrt(den_y) collapses to den_x exactly —
    r = (m*sxy - sx^2) / (m*sxx - sx^2), a ratio of exact
    DECIMAL(38,0)/HUGEINT integers, floor-divided by the pmod form
    (both engines agree bit-for-bit; no sqrt rounding to reason
    about, unlike the general autocorr). Regular graphs (den = 0)
    yield NULL r_milli.

    The symmetry also collapses the plan: moments come off the
    UNDIRECTED pair table in ONE aggregate (m = 2n, sx = sum(da+db),
    sxx = sum(da^2+db^2), sxy = 2*sum(da*db)) — the stub table is
    never materialized. Scale shape: one distinct on edge pairs, one
    degree groupBy, two joins of the pair table against the one-row-
    per-node degree table, one global single-row aggregate."""
    dec = "decimal(38,0)"
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nb"))))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long")
                                  .alias("deg"))
    j = (und.join(deg.select(F.col("node").alias("a"),
                             F.col("deg").alias("_da")), "a")
         .join(deg.select(F.col("node").alias("b"),
                          F.col("deg").alias("_db")), "b"))
    da, db = F.col("_da").cast(dec), F.col("_db").cast(dec)
    agg = j.agg(
        (F.count(F.lit(1)).cast(dec) * 2).alias("m"),
        F.sum(da + db).alias("sx"),
        F.sum(da * da + db * db).alias("sxx"),
        F.sum(F.lit(2).cast(dec) * da * db).alias("sxy"))
    num = (F.lit(scale).cast(dec)
           * (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")))
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    r = (num - ((num % den) + den) % den) / den
    return (agg.select(
        (F.col("m").cast("long")).alias("n_stubs"),
        F.when(den > 0, r).cast("long").alias("r_milli"))
        .filter(F.col("n_stubs") > 0))


def degree_assortativity_sql(edges_sql: str, src: str = "src",
                             dst: str = "dst",
                             scale: int = 1000) -> str:
    """DuckDB twin of degree_assortativity: the same collapsed
    symmetric moments in HUGEINT with the same pmod floor division."""
    return f"""WITH as_e AS (
  SELECT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), as_u AS (
  SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM as_e
), as_adj AS (
  SELECT a AS node FROM as_u UNION ALL SELECT b FROM as_u
), as_deg AS (
  SELECT node, CAST(count(*) AS HUGEINT) AS deg
  FROM as_adj GROUP BY 1
), as_m AS (
  SELECT CAST(2 * count(*) AS HUGEINT) AS m,
         CAST(sum(da.deg + db.deg) AS HUGEINT) AS sx,
         CAST(sum(da.deg * da.deg + db.deg * db.deg) AS HUGEINT)
           AS sxx,
         CAST(sum(2 * da.deg * db.deg) AS HUGEINT) AS sxy
  FROM as_u u
  JOIN as_deg da ON u.a = da.node
  JOIN as_deg db ON u.b = db.node
)
SELECT CAST(m AS BIGINT) AS n_stubs,
       CAST(CASE WHEN m * sxx - sx * sx > 0 THEN
         ({scale} * (m * sxy - sx * sx)
          - ((({scale} * (m * sxy - sx * sx))
              % (m * sxx - sx * sx)) + (m * sxx - sx * sx))
            % (m * sxx - sx * sx))
         // (m * sxx - sx * sx)
       END AS BIGINT) AS r_milli
FROM as_m WHERE m > 0"""


def _edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (a < b) simple edge
    table: (a, b, support), zero-support edges included. The triangle
    enumeration is the degree-oriented wedge join of triangle_count
    (O(m^1.5) regardless of skew); each triangle (u, x, y) credits
    its three edges in canonical id order."""
    deg = (und.select(F.col("a").alias("id"))
           .unionAll(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).cast("long")
                              .alias("deg")))
    j = (und.join(deg.select(F.col("id").alias("a"),
                             F.col("deg").alias("da")), "a")
         .join(deg.select(F.col("id").alias("b"),
                          F.col("deg").alias("db")), "b"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    e1 = o.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = o.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedge = e1.join(e2, "u").filter(
        (F.col("dx") < F.col("dy")) | (
            (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))))
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedge.join(closing, ["x", "y"]).select("u", "x", "y")
    sides = tri.select(F.explode(F.array(
        F.struct(F.least("u", "x").alias("a"),
                 F.greatest("u", "x").alias("b")),
        F.struct(F.least("u", "y").alias("a"),
                 F.greatest("u", "y").alias("b")),
        F.struct(F.least("x", "y").alias("a"),
                 F.greatest("x", "y").alias("b")))).alias("e"))
    sup = (sides.select("e.a", "e.b")
           .groupBy("a", "b")
           .agg(F.count(F.lit(1)).cast("long").alias("support")))
    return (und.join(sup, ["a", "b"], "left")
            .select("a", "b", F.coalesce("support", F.lit(0))
                    .cast("long").alias("support")))


def ktruss(edges: DataFrame, k: int, src: str = "src",
           dst: str = "dst", max_rounds: int = 32) -> DataFrame:
    """Edges of the k-truss — the maximal subgraph in which every
    edge closes >= k-2 triangles WITHIN the subgraph — by support
    peeling: compute per-edge triangle support, drop sub-(k-2)
    edges, recompute, repeat to fixpoint. Output: (a, b, support)
    with support counted inside the truss. The EDGE-cohesion sibling
    of kcore (a k-truss is always inside the (k-1)-core but far
    denser — the standard community-nucleus / spam-farm extractor,
    and the edge filter that survives removing any one vertex).

    Scale shape: each round is one degree-oriented triangle
    enumeration (O(m^1.5) bound per Chiba-Nishizeki orientation — a
    celebrity hub generates no wedges itself), one edge-key support
    groupBy, one co-keyed join back; rounds = truss peeling depth
    (shallow on web/KG graphs: a whole support shell peels per
    round); lineage cut per round with localCheckpoint, fixpoint
    checked by edge count (O(1)-row action). Exhaustion without
    convergence raises, the kcore/closure contract. Uniqueness of
    the k-truss makes the engine's early stop and the twin's fixed
    unroll agree whenever rounds >= depth."""
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct().localCheckpoint())
    n = und.count()
    for _ in range(max_rounds):
        sup = _edge_support(und)
        keep = sup.filter(F.col("support") >= k - 2)
        nxt = keep.select("a", "b").localCheckpoint()
        m = nxt.count()
        if m == n:
            return keep
        und, n = nxt, m
    raise RuntimeError(
        f"ktruss did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (peeling depth exceeds it)")


def ktruss_sql(edges_sql: str, k: int, rounds: int, src: str = "src",
               dst: str = "dst") -> str:
    """DuckDB twin of ktruss(): the peeling recurrence unrolled to a
    fixed `rounds` (the kcore_sql pattern, every round CTE
    MATERIALIZED for the same planner-blowup reason), plus one final
    support pass over the fixpoint edge set — which equals the
    engine's last in-loop support exactly when rounds >= depth."""
    if k < 3 or rounds < 1:
        raise ValueError("k must be >= 3 and rounds >= 1")

    def support_round(i: int, src_cte: str) -> str:
        return f""", kt_deg{i} AS MATERIALIZED (
  SELECT id, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS id FROM {src_cte} UNION ALL
        SELECT b FROM {src_cte})
  GROUP BY 1
), kt_o{i} AS MATERIALIZED (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN t.a ELSE t.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN t.b ELSE t.a END AS v,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND t.a < t.b)
              THEN db.deg ELSE da.deg END AS dv
  FROM {src_cte} t
  JOIN kt_deg{i} da ON t.a = da.id
  JOIN kt_deg{i} db ON t.b = db.id
), kt_tri{i} AS MATERIALIZED (
  SELECT e1.u AS u, e1.v AS x, e2.v AS y
  FROM kt_o{i} e1
  JOIN kt_o{i} e2 ON e1.u = e2.u
   AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))
  JOIN kt_o{i} e3 ON e3.u = e1.v AND e3.v = e2.v
), kt_sup{i} AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS support
  FROM (SELECT least(u, x) AS a, greatest(u, x) AS b FROM kt_tri{i}
        UNION ALL
        SELECT least(u, y), greatest(u, y) FROM kt_tri{i}
        UNION ALL
        SELECT least(x, y), greatest(x, y) FROM kt_tri{i})
  GROUP BY 1, 2
)"""

    parts = [f"""WITH kt_e0 AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
)"""]
    for i in range(1, rounds + 1):
        parts.append(support_round(i, f"kt_e{i - 1}"))
        parts.append(f""", kt_e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM kt_e{i - 1} e
  JOIN kt_sup{i} s ON e.a = s.a AND e.b = s.b
  WHERE s.support >= {k - 2}
)""")
    fin = rounds + 1
    parts.append(support_round(fin, f"kt_e{rounds}"))
    parts.append(f"""
SELECT e.a, e.b, s.support
FROM kt_e{rounds} e
JOIN kt_sup{fin} s ON e.a = s.a AND e.b = s.b
WHERE s.support >= {k - 2}""")
    return "".join(parts)


def four_cycles(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_degree: int | None = None) -> DataFrame:
    """Per-node 4-cycle (quadrilateral) census over the undirected
    simple graph: (id, c4) for every node on at least one 4-cycle —
    the next motif after triangle_count, and the one that catches
    bipartite-style redundancy triangles are blind to (two entities
    linked through two independent intermediates: mirror pages,
    duplicated records, A-buys-B-through-two-brokers).

    Opposite-pair identity: a 4-cycle u-w-v-x is determined by its
    opposite pair {u, v} plus an unordered pair of their common
    neighbors {w, x}, and each cycle contains node u in exactly one
    opposite pair — so

        c4(u) = sum over v of C(codeg(u, v), 2)

    counts each cycle at u exactly once, with no division and no
    orientation step. codeg pairs ARE the co-occurrence projection
    of the (neighbor, node) membership table, so this composes on
    cooccurrence_edges and inherits its quadratic hub guard:
    `max_degree` caps each hub's VOTE at a deterministic hash-uniform
    subset (codeg becomes a documented under-count through capped
    hubs, same contract as neighborhood_jaccard). C(n,2) = n*(n-1)/2
    is exact — n*(n-1) is always even, so integer `div` 2 is the
    true value, no floor quantization at all.

    Scale shape: distinct + doc-keyed self-join + pair-count groupBy
    (cooccurrence's shape), then one explode-to-both-endpoints union
    and a mergeable per-node sum. Pair volume is sum(deg^2) bounded
    by the cap — the same budget rule as the projection."""
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nb"))))
    common = cooccurrence_edges(adj, "nb", "node", min_count=2,
                                max_items_per_doc=max_degree)
    contrib = (common.select(
        F.col("item_a").alias("id"),
        F.col("item_b").alias("_other"),
        (F.col("n_docs") * (F.col("n_docs") - 1)).alias("_2c")))
    both = contrib.select("id", "_2c").unionAll(
        contrib.select(F.col("_other").alias("id"), "_2c"))
    # `div`, not `/`: the pair-sum can pass 2^53 where double
    # division goes inexact (the winnowing lesson); n*(n-1) terms are
    # even, so integer div IS the exact value
    return (both.groupBy("id")
            .agg(F.expr("sum(_2c) div 2").cast("long").alias("c4")))


def four_cycles_sql(edges_sql: str, src: str = "src",
                    dst: str = "dst") -> str:
    """DuckDB twin of four_cycles — the cooccurrence twin over the
    adjacency, then the same C(n,2) sum per endpoint."""
    adj_sql = f"""WITH c4_u AS (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
)
SELECT a AS node, b AS nb FROM c4_u
UNION ALL SELECT b, a FROM c4_u"""
    cooc = cooccurrence_edges_sql(adj_sql, "nb", "node", min_count=2)
    return f"""WITH c4_pairs AS MATERIALIZED (
{cooc}
), c4_sides AS (
  SELECT item_a AS id, n_docs * (n_docs - 1) AS c2 FROM c4_pairs
  UNION ALL
  SELECT item_b, n_docs * (n_docs - 1) FROM c4_pairs
)
SELECT id, CAST(sum(c2) // 2 AS BIGINT) AS c4
FROM c4_sides GROUP BY id"""


def collab_weight_edges(df: DataFrame, doc_col: str, item_col: str,
                        min_count: int = 1,
                        max_items_per_doc: int | None = None,
                        scale: int = 1_000_000) -> DataFrame:
    """Newman collaboration-weight bipartite projection [Newman PRE
    64, 2001]: (doc, item) memberships -> (item_a < item_b, n_docs,
    w_ppm) where each shared doc contributes 1/(m_d - 1) (m_d = the
    doc's item count) instead of co-occurrence's flat 1 — so a pair
    sharing an exclusive 2-item doc outweighs one sharing a
     10^4-item crawl-debris doc. THE weighting that makes projected
    entity graphs usable when doc sizes span orders of magnitude.

    w_ppm = sum over shared docs of floor(scale / (m_d - 1)): the
    per-doc floor is part of the operator definition, so both
    engines sum identical integers in any order. 1-item docs emit no
    pairs (and would divide by zero) — filtered. With a hub cap,
    m_d is the CAPPED size, keeping each term consistent with the
    pairs actually emitted.

    Scale shape: cooccurrence's distinct + per-doc count (mergeable
    groupBy joined back on the doc key) + doc-keyed self-join; the
    weight term rides the join projection, and the final pair
    groupBy sums it map-side. Same quadratic hub guard and budget
    rule as cooccurrence_edges."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_items_per_doc is not None and max_items_per_doc < 2:
        raise ValueError("max_items_per_doc must be >= 2, got "
                         f"{max_items_per_doc}")
    items = (df.select(F.col(doc_col).alias("d"),
                       F.col(item_col).alias("it"))
             .filter(F.col("d").isNotNull() & F.col("it").isNotNull())
             .distinct())
    if max_items_per_doc is not None:
        from pyspark.sql.window import Window

        from biocypher_metta_spark.operators.text import portable_hash

        h = portable_hash(F.concat_ws(":", F.lit("collab"),
                                      F.col("d").cast("string"),
                                      F.col("it").cast("string")))
        w = Window.partitionBy("d").orderBy(h.asc(), F.col("it").asc())
        items = (items.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= max_items_per_doc).drop("_rn"))
    sizes = (items.groupBy("d")
             .agg(F.count(F.lit(1)).alias("_m"))
             .filter(F.col("_m") >= 2)
             .withColumn("_w", F.floor(F.lit(scale)
                                       / (F.col("_m") - 1))
                         .cast("long")))
    weighted = items.join(sizes, "d")
    a = weighted.select("d", F.col("it").alias("item_a"), "_w")
    b = weighted.select("d", F.col("it").alias("item_b"))
    return (a.join(b, "d")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("_w").cast("long").alias("w_ppm"))
            .filter(F.col("n_docs") >= min_count))


def collab_weight_edges_sql(memberships_sql: str, doc_col: str,
                            item_col: str, min_count: int = 1,
                            scale: int = 1_000_000) -> str:
    """DuckDB twin of collab_weight_edges (uncapped form): same
    distinct / size-filter / per-doc floor / self-join / sum."""
    return f"""WITH cw_items AS MATERIALIZED (
  SELECT DISTINCT {doc_col} AS d, {item_col} AS it
  FROM (
{memberships_sql.strip()}
  )
  WHERE {doc_col} IS NOT NULL AND {item_col} IS NOT NULL
), cw_sizes AS MATERIALIZED (
  SELECT d, count(*) AS m,
         CAST({scale} // (count(*) - 1) AS BIGINT) AS w
  FROM cw_items GROUP BY d HAVING count(*) >= 2
)
SELECT a.it AS item_a, b.it AS item_b,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(s.w) AS BIGINT) AS w_ppm
FROM cw_items a
JOIN cw_items b ON a.d = b.d AND a.it < b.it
JOIN cw_sizes s ON a.d = s.d
GROUP BY a.it, b.it
HAVING count(*) >= {min_count}"""


def betweenness(edges: DataFrame, sources: DataFrame, max_depth: int,
                src: str = "src", dst: str = "dst",
                scale: int = 1_000_000) -> DataFrame:
    """Sampled-source betweenness centrality [Brandes 2001; sampling
    per Brandes-Pich 2007]: (node, bc_scaled) where bc_scaled sums,
    over the given source set, each node's shortest-path dependency
    delta_s(v) = sum over successors w of (sigma_v/sigma_w) *
    (scale + delta_s(w)) — the bridge/bottleneck centrality the degree
    family (pagerank/HITS/PPR/assortativity) cannot see. Paths are
    bounded at `max_depth` hops (the sssp_bounded contract: the bound
    IS the semantics — total on cyclic graphs, equal to classic
    betweenness when max_depth >= diameter). Nodes on no shortest-path
    interior are absent (bc 0); each source's own row is excluded per
    Brandes.

    Deterministic quantization, not floats: each per-edge term is the
    INTEGER floor(sigma_v * (scale + delta_w) / sigma_w) in
    decimal(38,0), so both engines sum identical integers in any order
    (the decile_lift/RAKE contract — per-edge quantization is the
    operator definition). sigma_v <= sigma_w by the predecessor-sum
    recurrence, so every term is <= scale + delta_w: no overflow
    before 38 digits.

    Scale shape: the forward pass is bfs_distances' frontier loop
    lifted to (source, node) keys — each round shuffles O(frontier x
    avg-degree) plus one sigma-sum groupBy, settled mass never
    recirculates, early exit on an empty frontier; sigma rides the
    frontier as a long. The predecessor DAG is built ONCE with two
    co-keyed equi-joins, then each backward round is a depth-filtered
    broadcast-sized lookup join + one groupBy — max_depth rounds
    forward and backward, one localCheckpoint per round
    (connected_components' lineage contract). Everything is linear in
    |sources|: sampling the sources is the documented 100-TB bound.

    Oracle twin (betweenness_sql) is an INDEPENDENT spelling: a
    recursive-CTE walk enumeration (sigma = count of walks whose
    length equals the min — a minimal-length walk cannot revisit, so
    it IS a shortest path) and the backward recurrence unrolled as one
    generated CTE per depth."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    dec = "decimal(38,0)"
    e = (edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"))
         .filter(F.col("_es").isNotNull() & F.col("_ed").isNotNull()
                 & (F.col("_es") != F.col("_ed")))
         .distinct())
    e = e.localCheckpoint(eager=True)
    sp = (sources.select(F.col(sources.columns[0]).alias("s"))
          .filter(F.col("s").isNotNull())
          .distinct()
          .select("s", F.col("s").alias("node"),
                  F.lit(0).cast("int").alias("dist"),
                  F.lit(1).cast("long").alias("sigma")))
    sp = sp.localCheckpoint(eager=True)
    frontier = sp
    for k in range(1, max_depth + 1):
        cand = (frontier.join(e, frontier["node"] == e["_es"])
                .groupBy("s", F.col("_ed").alias("node"))
                .agg(F.sum("sigma").alias("sigma")))
        new = (cand.join(sp.select("s", "node"), ["s", "node"],
                         "left_anti")
               .select("s", "node", F.lit(k).cast("int").alias("dist"),
                       "sigma"))
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        sp = sp.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    sv = sp.select("s", F.col("node").alias("v"),
                   F.col("dist").alias("dv"),
                   F.col("sigma").alias("sig_v"))
    sw = sp.select(F.col("s").alias("_ws"), F.col("node").alias("w"),
                   F.col("dist").alias("dw"),
                   F.col("sigma").alias("sig_w"))
    pred = (sv.join(e, sv["v"] == e["_es"])
            .join(sw, (F.col("s") == F.col("_ws"))
                  & (F.col("_ed") == F.col("w"))
                  & (F.col("dw") == F.col("dv") + 1))
            .select("s", "v", "w", "dv", "sig_v", "sig_w"))
    pred = pred.localCheckpoint(eager=True)
    deeper = None
    parts = []
    for d in range(max_depth - 1, -1, -1):
        pd_ = pred.filter(F.col("dv") == d)
        if deeper is not None:
            pd_ = pd_.join(
                deeper.select("s", F.col("node").alias("w"),
                              F.col("delta").alias("_dw")),
                ["s", "w"], "left")
        else:
            pd_ = pd_.withColumn("_dw", F.lit(None).cast(dec))
        num = (F.col("sig_v").cast(dec)
               * (F.lit(scale).cast(dec)
                  + F.coalesce(F.col("_dw"), F.lit(0).cast(dec))))
        den = F.col("sig_w").cast(dec)
        contrib = (num - num % den) / den  # all-nonneg floor division
        cur = (pd_.groupBy("s", F.col("v").alias("node"))
               .agg(F.sum(contrib).cast(dec).alias("delta")))
        cur = cur.localCheckpoint(eager=True)
        deeper = cur
        parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (out.filter(F.col("node") != F.col("s"))
            .groupBy("node")
            .agg(F.sum("delta").cast("long").alias("bc_scaled")))


def betweenness_sql(edges_sql: str, sources_sql: str, max_depth: int,
                    src: str = "src", dst: str = "dst",
                    scale: int = 1_000_000) -> str:
    """DuckDB twin of betweenness: recursive-CTE walk enumeration for
    (dist, sigma) — sigma = count of minimal-length walks — and the
    quantized backward recurrence unrolled as one generated CTE per
    depth, HUGEINT `//` matching the engine's decimal(38,0) floor."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    delta_ctes = []
    union_parts = []
    for d in range(max_depth - 1, -1, -1):
        if d == max_depth - 1:
            delta_ctes.append(f"""bw_d{d} AS (
  SELECT s, v AS node,
         CAST(sum((sig_v * CAST({scale} AS HUGEINT)) // sig_w)
              AS HUGEINT) AS delta
  FROM bw_pred WHERE dv = {d} GROUP BY 1, 2
)""")
        else:
            delta_ctes.append(f"""bw_d{d} AS (
  SELECT p.s, p.v AS node,
         CAST(sum((p.sig_v * (CAST({scale} AS HUGEINT)
                              + coalesce(nd.delta, 0))) // p.sig_w)
              AS HUGEINT) AS delta
  FROM bw_pred p
  LEFT JOIN bw_d{d + 1} nd ON nd.s = p.s AND nd.node = p.w
  WHERE p.dv = {d} GROUP BY 1, 2
)""")
        union_parts.append(f"SELECT s, node, delta FROM bw_d{d}")
    return f"""WITH RECURSIVE bw_edges AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), bw_src AS (
  SELECT DISTINCT node FROM (
{sources_sql.strip()}
  ) WHERE node IS NOT NULL
), bw_walk AS (
  SELECT node AS s, node AS node, 0 AS len FROM bw_src
  UNION ALL
  SELECT w.s, e.d AS node, w.len + 1 AS len
  FROM bw_walk w JOIN bw_edges e ON e.s = w.node
  WHERE w.len < {max_depth}
), bw_dist AS (
  SELECT s, node, min(len) AS dist FROM bw_walk GROUP BY 1, 2
), bw_ds AS (
  SELECT dt.s, dt.node, dt.dist, CAST(count(*) AS HUGEINT) AS sig
  FROM bw_walk w
  JOIN bw_dist dt ON dt.s = w.s AND dt.node = w.node
                 AND dt.dist = w.len
  GROUP BY 1, 2, 3
), bw_pred AS (
  SELECT v.s, v.node AS v, wn.node AS w, v.dist AS dv,
         v.sig AS sig_v, wn.sig AS sig_w
  FROM bw_ds v
  JOIN bw_edges e ON e.s = v.node
  JOIN bw_ds wn ON wn.s = v.s AND wn.node = e.d
               AND wn.dist = v.dist + 1
), {", ".join(delta_ctes)}
SELECT node, CAST(sum(delta) AS BIGINT) AS bc_scaled
FROM ({" UNION ALL ".join(union_parts)})
WHERE node <> s GROUP BY node"""


def harmonic_closeness(edges: DataFrame, sources: DataFrame,
                       max_depth: int, src: str = "src",
                       dst: str = "dst",
                       scale: int = 1_000_000) -> DataFrame:
    """Harmonic closeness from a sampled source set [Marchiori-Latora
    2000; sampling per Eppstein-Wang 2004]: (node, h_scaled, n_seen)
    where h_scaled = sum over sources s with 1 <= d(s, v) <= max_depth
    of floor(scale / d(s, v)) and n_seen counts the contributing
    sources — the DISTANCE face of the centrality triad this module
    now covers in full (pagerank/HITS/PPR = flow INTO a node,
    betweenness = flow THROUGH it, closeness = how NEAR it sits to
    everything). Harmonic, not classic closeness, because unreachable
    pairs contribute 0 instead of poisoning the mean — the standard
    fix on disconnected graphs, and per-term floors make it the usual
    deterministic quantization (sum of identical integers in any
    order).

    Scale shape: bfs_distances' frontier-settled loop lifted to
    (source, node) keys — the betweenness forward pass without sigma:
    each round shuffles O(frontier x avg-degree) plus the settled
    anti-join, early exit on an empty frontier, one localCheckpoint
    per round; the final groupBy(node) is the only extra exchange.
    Linear in |sources| — sampling the sources is the documented
    100-TB bound (Eppstein-Wang: O(log n / eps^2) samples suffice).

    Oracle twin (harmonic_closeness_sql): recursive-CTE walk
    enumeration + min(len) per (source, node) + the same floored
    harmonic sum — independent evaluation, same answer by BFS
    optimality."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    e = (edges.select(F.col(src).alias("_es"), F.col(dst).alias("_ed"))
         .filter(F.col("_es").isNotNull() & F.col("_ed").isNotNull()
                 & (F.col("_es") != F.col("_ed")))
         .distinct())
    e = e.localCheckpoint(eager=True)
    settled = (sources.select(F.col(sources.columns[0]).alias("s"))
               .filter(F.col("s").isNotNull())
               .distinct()
               .select("s", F.col("s").alias("node"),
                       F.lit(0).cast("int").alias("dist")))
    settled = settled.localCheckpoint(eager=True)
    frontier = settled
    for k in range(1, max_depth + 1):
        nxt = (frontier.join(e, frontier["node"] == e["_es"])
               .select("s", F.col("_ed").alias("node"))
               .distinct()
               .join(settled.select("s", "node"), ["s", "node"],
                     "left_anti")
               .select("s", "node", F.lit(k).cast("int").alias("dist")))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (settled.filter(F.col("dist") >= 1)
            .groupBy("node")
            .agg(F.sum(F.floor(F.lit(scale) / F.col("dist"))
                       .cast("long")).cast("long").alias("h_scaled"),
                 F.count(F.lit(1)).cast("long").alias("n_seen")))


def harmonic_closeness_sql(edges_sql: str, sources_sql: str,
                           max_depth: int, src: str = "src",
                           dst: str = "dst",
                           scale: int = 1_000_000) -> str:
    """DuckDB twin of harmonic_closeness: recursive-CTE walk
    enumeration + min(len) per (source, node) + the floored harmonic
    sum."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    return f"""WITH RECURSIVE hc_edges AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), hc_src AS (
  SELECT DISTINCT node FROM (
{sources_sql.strip()}
  ) WHERE node IS NOT NULL
), hc_walk AS (
  SELECT node AS s, node AS node, 0 AS len FROM hc_src
  UNION
  SELECT w.s, e.d AS node, w.len + 1 AS len
  FROM hc_walk w JOIN hc_edges e ON e.s = w.node
  WHERE w.len < {max_depth}
), hc_dist AS (
  SELECT s, node, min(len) AS dist FROM hc_walk GROUP BY 1, 2
)
SELECT node,
       CAST(sum({scale} // dist) AS BIGINT) AS h_scaled,
       CAST(count(*) AS BIGINT) AS n_seen
FROM hc_dist WHERE dist >= 1 GROUP BY node"""


def modularity(edges: DataFrame, labels: DataFrame, src: str = "src",
               dst: str = "dst") -> DataFrame:
    """Per-community Newman modularity contributions in ppm — the
    quality score FOR the partitions label_propagation/kcore emit
    (did LPA actually find dense communities, or noise?). On the
    undirected simple graph (same least/greatest canonicalization as
    label_propagation) with m total edges, community c with e_c
    intra-community edges and degree mass d_c contributes

        Q_c = e_c/m - (d_c / 2m)^2  =  (4m*e_c - d_c^2) / (4m^2)

    contrib_ppm is the exact floor of Q_c * 1e6 (pmod idiom — Q_c can
    be NEGATIVE for anti-communities, so plain % would round toward
    zero) in DECIMAL(38,0)/HUGEINT; sum(contrib_ppm) approximates
    global Q*1e6 within one ulp per community, and consumers wanting
    the exact global floor sum the integer numerators first.

    `labels` is (id, label), e.g. straight from label_propagation;
    edges whose endpoint has no label row are dropped from e_in but
    still count in m and in labeled endpoints' degrees (m is a
    property of the GRAPH, not the labeling — this keeps Q comparable
    across labelings of the same graph).

    Scale shape: m is injected as a SCALAR SUBQUERY (the repo-wide
    pattern — a crossJoin(broadcast(1-row-agg)) would plan the
    forbidden BroadcastNestedLoopJoin, see operators/retrieval.py:44);
    the degree sum and intra-edge count are two mergeable groupBys;
    the intra check joins the (small) label map onto both endpoints —
    co-keyed equi-joins, hub skew absorbed by the map-side partial
    counts."""
    for c in ("n_nodes", "e_in", "d_sum", "contrib_ppm"):
        if c in labels.columns:
            raise ValueError(f"labels must not already have column {c!r}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull()
                 & (F.col("s") != F.col("d"))))
    und = (e.select(F.least("s", "d").alias("a"),
                    F.greatest("s", "d").alias("b"))
           .distinct())
    lab = labels.select(F.col("id").alias("_id"),
                        F.col("label").alias("_lb"))
    deg = (und.select(F.col("a").alias("_id"))
           .unionAll(und.select(F.col("b").alias("_id")))
           .groupBy("_id").agg(F.count(F.lit(1)).alias("_deg")))
    members = (lab.join(deg, "_id", "left")
               .groupBy("_lb")
               .agg(F.count(F.lit(1)).alias("n_nodes"),
                    F.coalesce(F.sum("_deg"), F.lit(0)).cast(_DEC)
                    .alias("_d")))
    intra = (und
             .join(lab.select(F.col("_id").alias("a"),
                              F.col("_lb").alias("_la")), "a")
             .join(lab.select(F.col("_id").alias("b"),
                              F.col("_lb").alias("_lb2")), "b")
             .filter(F.col("_la") == F.col("_lb2"))
             .groupBy(F.col("_la").alias("_lb"))
             .agg(F.count(F.lit(1)).alias("_e")))
    joined = (members.join(intra, "_lb", "left")
              .select("_lb", "n_nodes", "_d",
                      F.coalesce(F.col("_e"), F.lit(0)).cast(_DEC)
                      .alias("_e")))
    spark = edges.sparkSession
    per = spark.sql(
        "SELECT *, (SELECT CAST(count(*) AS decimal(38,0)) FROM {und})"
        " AS _m FROM {joined}", und=und, joined=joined)
    four_m = F.lit(4).cast(_DEC) * F.col("_m")
    num = ((four_m * F.col("_e") - F.col("_d") * F.col("_d"))
           * F.lit(1_000_000).cast(_DEC))
    den = four_m * F.col("_m")
    ppm = (num - ((num % den) + den) % den) / den
    return per.select(
        F.col("_lb").alias("label"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("_e").cast("long").alias("e_in"),
        F.col("_d").cast("long").alias("d_sum"),
        F.when(F.col("_m") == F.lit(0).cast(_DEC), F.lit(0))
        .otherwise(ppm).cast("long").alias("contrib_ppm"))


def modularity_sql(edges_sql: str, labels_sql: str, src: str = "src",
                   dst: str = "dst") -> str:
    """DuckDB twin of modularity(): same canonicalization, HUGEINT
    terms, same pmod floor."""
    return f"""WITH md_u AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), md_m AS (
  SELECT count(*)::HUGEINT AS m FROM md_u
), md_lab AS MATERIALIZED (
  SELECT id AS _id, label AS _lb FROM (
{labels_sql.strip()}
  )
), md_deg AS (
  SELECT _id, count(*)::HUGEINT AS deg FROM (
    SELECT a AS _id FROM md_u UNION ALL SELECT b FROM md_u
  ) GROUP BY _id
), md_mem AS (
  SELECT l._lb, count(*)::HUGEINT AS n_nodes,
         coalesce(sum(d.deg), 0)::HUGEINT AS dsum
  FROM md_lab l LEFT JOIN md_deg d ON l._id = d._id
  GROUP BY l._lb
), md_e AS (
  SELECT la._lb, count(*)::HUGEINT AS e_in
  FROM md_u u
  JOIN md_lab la ON u.a = la._id
  JOIN md_lab lb ON u.b = lb._id
  WHERE la._lb = lb._lb
  GROUP BY la._lb
), md_per AS (
  SELECT mem._lb, mem.n_nodes, mem.dsum,
         coalesce(e.e_in, 0)::HUGEINT AS e_in, m.m
  FROM md_mem mem LEFT JOIN md_e e ON mem._lb = e._lb CROSS JOIN md_m m
), md_q AS (
  SELECT _lb, n_nodes, e_in, dsum,
         (4::HUGEINT * m * e_in - dsum * dsum) * 1000000::HUGEINT
           AS num,
         4::HUGEINT * m * m AS den, m
  FROM md_per
)
SELECT _lb AS label, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(e_in AS BIGINT) AS e_in, CAST(dsum AS BIGINT) AS d_sum,
       CASE WHEN m = 0 THEN 0
            ELSE CAST((num - (((num % den) + den) % den)) // den
                      AS BIGINT) END AS contrib_ppm
FROM md_q"""


def neighborhood_function(edges: DataFrame, max_hops: int,
                          k: int = 64, src: str = "src",
                          dst: str = "dst") -> DataFrame:
    """ANF / HyperBall-style neighborhood function [Palmer-Gibbons-
    Faloutsos 2002; Boldi-Rosa-Vigna 2011, with KMV in place of HLL
    for cross-engine determinism — the kmv_distinct rationale]: for
    every node v and hop h in 1..max_hops, estimate
    |{u : dist(v, u) <= h}| over the DIRECTED graph, self included.
    Output (node, hop, n_sketch, est) — the effective-diameter /
    reach-distribution primitive behind 'how much of the ontology is
    within 3 is_a hops of each term'.

    Each node carries its k smallest 60-bit member hashes (exact
    below k, estimate floor((k-1) * 2^60/h_k) above — the
    kmv_distinct contract, bit-identical cross-engine because both
    engines do the int64->double division under IEEE round-to-
    nearest). One round per hop: neighbor sketches flow along
    reversed edges, merge is flatten -> distinct -> sort -> slice k —
    associative and exact on the k-minima lattice, so the sketch
    after h rounds is EXACTLY kmin_k over the h-hop neighborhood
    (no resampling drift), which is what lets the gate run an
    independent exact-BFS oracle at k > max reach.

    Scale shape: per-node state is k longs; each round is one edge
    equi-join + one mergeable groupBy whose collect_list holds
    deg(v)+1 arrays — fine to the ~10^4-degree range; a mega-hub
    should route through kmv_minima_by's salted two-stage top-k
    (same lattice, bounded task state) — the documented escape
    hatch, same class as the as-of hot key. Lineage cut per round
    (localCheckpoint), the iterative-family contract."""
    from biocypher_metta_spark.operators.text import portable_hash

    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
         .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct()
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("s").alias("node"))
             .unionAll(e.select(F.col("d").alias("node")))
             .distinct())
    sk = (nodes.select(
        "node",
        F.array(portable_hash(F.col("node").cast("string")))
        .alias("sketch"))
        .localCheckpoint(eager=True))
    est = (F.when(F.size("sketch") < k, F.size("sketch"))
           .otherwise(F.floor(
               (k - 1)
               * (F.lit(float(1 << 60))
                  / F.element_at("sketch", k))))
           .cast("long"))
    out = None
    for hop in range(1, max_hops + 1):
        contrib = (e.join(sk.withColumnRenamed("node", "d"), "d")
                   .select(F.col("s").alias("node"), "sketch"))
        # the checkpointed sk MUST be the union's first child: Union
        # binds output attributes to the first child, and putting the
        # join-derived contrib (whose attrs alias sk's) first makes
        # localCheckpoint's LogicalRDD.fromDataset fail with
        # "key not found: node#N" on self-union-shaped inputs (e.g.
        # spark.range-built edge lists). Merge order is irrelevant to
        # the groupBy. Regression-pinned by
        # tests/test_round5t_ops.py::test_effective_radius_range_input.
        sk = (sk.unionAll(contrib)
              .groupBy("node")
              .agg(F.slice(
                  F.array_sort(F.array_distinct(
                      F.flatten(F.collect_list("sketch")))),
                  1, k).alias("sketch"))
              .localCheckpoint(eager=True))
        hop_rows = sk.select(
            "node", F.lit(hop).cast("int").alias("hop"),
            F.size("sketch").cast("long").alias("n_sketch"),
            est.alias("est"))
        out = hop_rows if out is None else out.unionAll(hop_rows)
    return out


def neighborhood_function_sql(edges_sql: str, max_hops: int,
                              src: str = "src",
                              dst: str = "dst") -> str:
    """EXACT-count oracle for neighborhood_function at k > max
    reachable-set size (where the KMV sketch is provably exact):
    hop-unrolled reachability closure with per-hop distinct counts —
    an INDEPENDENT spelling (set semantics, no hashing at all)."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    parts = [f"""WITH nf_e AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), nf_r0 AS MATERIALIZED (
  SELECT node, node AS u FROM (
    SELECT DISTINCT s AS node FROM nf_e
    UNION SELECT DISTINCT d FROM nf_e
  )
)"""]
    for h in range(1, max_hops + 1):
        parts.append(f""", nf_r{h} AS MATERIALIZED (
  SELECT DISTINCT node, u FROM (
    SELECT node, u FROM nf_r{h - 1}
    UNION ALL
    SELECT r.node, e.d AS u FROM nf_r{h - 1} r JOIN nf_e e ON r.u = e.s
  )
)""")
    selects = [
        f"""SELECT node, {h} AS hop, count(*) AS n_sketch,
       count(*) AS est FROM nf_r{h} GROUP BY node"""
        for h in range(1, max_hops + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


def effective_radius(edges: DataFrame, max_hops: int, k: int = 64,
                     q_permille: int = 900, src: str = "src",
                     dst: str = "dst") -> DataFrame:
    """Per-node effective radius by COMPOSITION on
    neighborhood_function: the smallest hop h at which the node
    already reaches >= q_permille/1000 of everything it reaches
    within max_hops — the ANF paper's effective-diameter readout
    [Palmer-Gibbons-Faloutsos 2002 §4] turned per-node (the graph's
    effective diameter is then a quantile over this column, one tiny
    aggregate the caller picks). 'How deep must is_a traversal go
    before an ontology query saturates' is this number.

    Output (node, eff_radius, reach_est): reach_est is the max_hops
    estimate the threshold is taken against. All-integer comparison
    (1000 * est_h >= q * est_H) on the KMV estimates, so the gate's
    exact-regime proof (k > reachable-set size -> est is the true
    count) carries over verbatim; h = max_hops always satisfies it,
    so every node emits exactly one row.

    Scale shape: inherits neighborhood_function's per-hop join +
    sketch-merge rounds, then ONE extra self-join on node (the
    max_hops slice is one row per node) and a min-hop groupBy — both
    on the already-partitioned node key."""
    nf = neighborhood_function(edges, max_hops, k=k, src=src, dst=dst)
    if not 1 <= q_permille <= 1000:
        raise ValueError(
            f"q_permille must be in [1, 1000], got {q_permille}")
    fin = (nf.filter(F.col("hop") == max_hops)
           .select("node", F.col("est").alias("reach_est")))
    hit = (nf.join(fin, "node")
           .filter(F.lit(1000) * F.col("est")
                   >= F.lit(q_permille) * F.col("reach_est")))
    return (hit.groupBy("node", "reach_est")
            .agg(F.min("hop").cast("int").alias("eff_radius"))
            .select("node", "eff_radius", "reach_est"))


def effective_radius_sql(edges_sql: str, max_hops: int,
                         q_permille: int = 900, src: str = "src",
                         dst: str = "dst") -> str:
    """Exact-count oracle for effective_radius in the k-exact regime:
    wraps the independent hop-unrolled BFS twin
    (neighborhood_function_sql) with the same integer threshold."""
    anf = neighborhood_function_sql(edges_sql, max_hops,
                                    src=src, dst=dst)
    return f"""WITH er_nf AS MATERIALIZED (
  SELECT * FROM (
{anf}
  )
), er_fin AS (
  SELECT node, est AS reach_est FROM er_nf WHERE hop = {max_hops}
), er_hit AS (
  SELECT er_nf.node, er_nf.hop, er_fin.reach_est
  FROM er_nf JOIN er_fin ON er_nf.node = er_fin.node
  WHERE 1000 * er_nf.est >= {q_permille} * er_fin.reach_est
)
SELECT node, CAST(min(hop) AS INT) AS eff_radius,
       CAST(reach_est AS BIGINT) AS reach_est
FROM er_hit GROUP BY node, reach_est"""


def dag_depth(edges: DataFrame, src: str = "src", dst: str = "dst",
              max_iter: int = 20) -> DataFrame:
    """Longest-path depth per node over a DAG — ontology TERM DEPTH:
    with is_a edges pointing child -> parent, depth(v) = the longest
    is_a chain above v (GO/Biolink term depth, the standard
    information-content normalizer), and roots sit at depth 0. The
    max-plus twin of canonicalize.transitive_closure: same path
    doubling, same checkpoint-per-round discipline, but the closure
    carries the LONGEST length per (s, d) pair instead of bare
    reachability.

    Each round joins the current length table with itself (paths of
    length <= 2^k after k rounds: len = a.len + b.len, max per pair),
    so a depth-D DAG converges in ceil(log2 D) shuffles. Convergence
    = (pair count, total length) both stable; exhaustion raises (the
    transitive_closure contract). A cycle makes 'longest path'
    undefined — detected exactly as a positive diagonal (s = d)
    entry, which path doubling necessarily materializes within the
    cycle's doubling horizon, and raises ValueError rather than
    looping to exhaustion.

    Output (node, depth) for EVERY node incident to an edge; depth 0
    for pure roots. Self-loops are rejected up front (they are
    1-cycles). Scale caveat shared with transitive_closure: the
    length table is O(reachable pairs) — log-depth ontology DAGs with
    bounded ancestor sets are the domain; a deep chain is quadratic
    in its length.
    """
    cur = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
           .distinct())
    if cur.filter(F.col("s") == F.col("d")).limit(1).count() > 0:
        raise ValueError("self-loop edge: input is not a DAG")
    cur = (cur.withColumn("len", F.lit(1).cast("long"))
           .localCheckpoint(eager=True))
    stat = cur.agg(F.count(F.lit(1)), F.sum("len")).collect()[0]
    n, t = int(stat[0]), int(stat[1])
    converged = False
    for _ in range(max_iter):
        hop = (cur.alias("a")
               .join(cur.alias("b"), F.col("a.d") == F.col("b.s"))
               .select(F.col("a.s").alias("s"), F.col("b.d").alias("d"),
                       (F.col("a.len") + F.col("b.len")).alias("len")))
        nxt = (cur.unionByName(hop)
               .groupBy("s", "d").agg(F.max("len").alias("len")))
        nxt = nxt.localCheckpoint(eager=True)
        bad = nxt.filter(F.col("s") == F.col("d")).limit(1).count()
        if bad:
            raise ValueError(
                "cycle detected (positive-length path from a node to "
                "itself): input is not a DAG")
        stat = nxt.agg(F.count(F.lit(1)), F.sum("len")).collect()[0]
        m, u = int(stat[0]), int(stat[1])
        cur = nxt
        if (m, u) == (n, t):
            converged = True
            break
        n, t = m, u
    if not converged:
        raise RuntimeError(
            f"dag_depth did not reach a fixed point within {max_iter} "
            f"path-doubling rounds (covers depth 2^{max_iter}); "
            "raise max_iter")
    nodes = (cur.select(F.col("s").alias("node"))
             .unionAll(cur.select(F.col("d").alias("node")))
             .distinct())
    depths = (cur.groupBy("s").agg(F.max("len").alias("depth"))
              .withColumnRenamed("s", "node"))
    return (nodes.join(depths, "node", "left")
            .select("node",
                    F.coalesce(F.col("depth"), F.lit(0))
                    .cast("long").alias("depth")))


def dag_depth_sql(edges_sql: str, src: str = "src",
                  dst: str = "dst") -> str:
    """Oracle twin of dag_depth for acyclic inputs: single-step
    recursive CTE (terminates on DAGs because path length is bounded
    by the longest path) + max per start node, 0 for pure roots — an
    independent spelling of the same longest-path semantics."""
    return f"""WITH RECURSIVE dd_e AS MATERIALIZED (
  SELECT DISTINCT {src} AS s, {dst} AS d FROM (
{edges_sql.strip()}
  ) WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
), dd_p AS (
  SELECT s, d, 1 AS len FROM dd_e
  UNION
  SELECT p.s, e.d, p.len + 1 FROM dd_p p JOIN dd_e e ON p.d = e.s
), dd_n AS (
  SELECT s AS node FROM dd_e UNION SELECT d FROM dd_e
)
SELECT dd_n.node,
       CAST(coalesce(max(dd_p.len), 0) AS BIGINT) AS depth
FROM dd_n LEFT JOIN dd_p ON dd_p.s = dd_n.node
GROUP BY dd_n.node"""


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst") -> DataFrame:
    """Per-node LOCAL clustering coefficient over the undirected
    simple graph — the KG-quality counterpart of the global triangle
    census: cc(v) = triangles(v) / C(deg(v), 2), i.e. how much of
    v's neighborhood is itself connected. Low-cc high-degree nodes
    are the classic mention-linking-noise signature (a hub whose
    'neighbors' share nothing); high-cc clumps are candidate
    over-merged entities. Emitted as the exact integer permille
    floor(2000 * triangles / (deg * (deg - 1))); deg < 2 nodes emit
    0 (no pair to close).

    Pure composition on two already-oracled primitives:
    triangle_count (degree-oriented O(m^1.5) wedge join — hub-proof)
    and the endpoint-degree aggregate, joined on the node id. Output
    (id, deg, triangles, cc_permille), every endpoint present.
    """
    tri = triangle_count(edges, src=src, dst=dst)
    und = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
        .distinct())
    deg = (und.select(F.col("a").alias("id"))
           .unionAll(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).cast("long")
                              .alias("deg")))
    # exact decimal floor (a double divide drifts from the twin's
    # integer // once 2000*triangles passes 2^53)
    num = (F.lit(2000).cast("decimal(38,0)")
           * F.col("triangles").cast("decimal(38,0)"))
    den = (F.col("deg").cast("decimal(38,0)")
           * (F.col("deg") - 1).cast("decimal(38,0)"))
    return (tri.join(deg, "id")
            .select("id", "deg", "triangles",
                    F.when(F.col("deg") < 2, F.lit(0))
                    .otherwise((num - num % den) / den)
                    .cast("long").alias("cc_permille")))


def clustering_coefficient_sql(edges_sql: str, src: str = "src",
                               dst: str = "dst") -> str:
    """Oracle twin of clustering_coefficient: composes the
    triangle_count twin (same orientation recipe) with the degree
    aggregate and the same permille floor."""
    tri = triangle_count_sql(edges_sql, src=src, dst=dst)
    return f"""WITH cc_tri AS MATERIALIZED (
  SELECT * FROM (
{tri}
  )
), cc_und AS (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
), cc_deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS id FROM cc_und UNION ALL SELECT b FROM cc_und)
  GROUP BY 1
)
SELECT cc_tri.id, cc_deg.deg, cc_tri.triangles,
       CASE WHEN cc_deg.deg < 2 THEN 0
            ELSE CAST((2000::HUGEINT * cc_tri.triangles)
                      // (cc_deg.deg::HUGEINT * (cc_deg.deg - 1))
                 AS BIGINT)
       END AS cc_permille
FROM cc_tri JOIN cc_deg ON cc_tri.id = cc_deg.id"""


def boruvka_mst(edges: DataFrame, src: str = "src", dst: str = "dst",
                weight: str = "weight", max_rounds: int = 32,
                jump_rounds: int = 32) -> DataFrame:
    """Minimum spanning forest of the weighted undirected simple
    graph by distributed Boruvka contraction.  Output: the MSF edge
    set (a, b, w) with a < b — V-1 edges per connected component.

    Ties are broken by the total order (w, a, b), which makes the
    MSF unique (equivalent to an infinitesimal perturbation), so the
    engine's contraction answer and the twin's independent
    Kruskal-cut-property answer are comparable row-for-row.  Parallel
    edges collapse to their minimum weight; self loops and null
    endpoints are dropped.

    The MSF is the classic KG-backbone extractor: keep the cheapest
    connector per entity cluster (e.g. strongest-evidence link per
    merged mention group) and drop redundant heavy edges — the
    dendrogram base for single-linkage clustering over similarity
    graphs (doc/embedding dedup at corpus scale).

    Scale shape
    -----------
    Pure Boruvka is the textbook DISTRIBUTED MST choice precisely
    because every round is a groupBy, never a sort of the full edge
    list (Kruskal) or a priority queue (Prim): (1) per-component
    min-edge via min(struct) over the CURRENT contracted edge list —
    map-side partial agg absorbs hub skew, (2) contract the chosen
    pseudoforest by two-cycle rooting + pointer jumping (self-joins
    on <= #components rows, chain depth halves per hop, fixpoint
    read as a cheap count off the checkpointed hop — no extra join),
    (3) rewrite the edge list onto the new component ids and
    re-collapse parallel pairs to their (w, a, b)-minimum
    representative, so the WORKING SET shrinks geometrically along
    with the component count (the original edge list is touched
    exactly once) while original endpoints ride along for the
    output.  Component count at least halves per round, so rounds <=
    log2(V) (~30 at 10^9 nodes); lineage is cut per round with
    localCheckpoint exactly like transitive_closure.  Exhaustion
    without fixpoint raises, matching the closure/kcore contract.
    """
    if max_rounds < 1 or jump_rounds < 1:
        raise ValueError("max_rounds and jump_rounds must be >= 1")
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & F.col("w").isNotNull() & (F.col("a") != F.col("b")))
         .groupBy("a", "b").agg(F.min("w").alias("w")))
    # working edges keyed by component (ca < cb); components start as
    # the node ids themselves, original endpoints ride along as payload
    work = _ckcut(e.select(F.col("a").alias("ca"), F.col("b").alias("cb"),
                     "w", "a", "b"))
    out_cols = ["a", "b", "w"]
    msf = None
    for _ in range(max_rounds):
        if work.isEmpty():
            break
        # per-component minimum incident edge under the (w, a, b)
        # total order; the chosen edge also carries the neighbouring
        # component -> a pseudoforest parent pointer per component
        pick = F.struct("w", "a", "b", "oc")
        inc = (work.select(F.col("ca").alias("c"), "w", "a", "b",
                           F.col("cb").alias("oc"))
               .unionAll(work.select(F.col("cb").alias("c"), "w", "a",
                                     "b", F.col("ca").alias("oc"))))
        sel = _ckcut(inc.groupBy("c").agg(F.min(pick).alias("m"))
               .select("c", F.col("m.a").alias("a"),
                       F.col("m.b").alias("b"), F.col("m.w").alias("w"),
                       F.col("m.oc").alias("p")))
        chosen = sel.select("a", "b", "w").distinct()
        msf = chosen if msf is None else msf.unionAll(chosen)
        msf = _ckcut(msf)
        # contract: break the pseudoforest's 2-cycles (u<->v pick the
        # same minimum edge; root at the smaller id), then pointer-jump
        par = _ckcut(sel.alias("x")
               .join(sel.select(F.col("c").alias("p"),
                                F.col("p").alias("gp")).alias("y"),
                     "p", "left")
               .select("c", F.when((F.col("gp") == F.col("c"))
                                   & (F.col("c") < F.col("p")),
                                   F.col("c"))
                       .otherwise(F.col("p")).alias("p")))
        for _j in range(jump_rounds):
            hop = _ckcut(par.alias("x")
                   .join(par.select(F.col("c").alias("p"),
                                    F.col("p").alias("pp")).alias("y"),
                         "p", "left")
                   .select("c", "p", F.coalesce("pp", "p").alias("np")))
            moved = (hop.filter(F.col("np") != F.col("p"))
                     .limit(1).count())
            par = hop.select("c", F.col("np").alias("p"))
            if moved == 0:
                break
        else:
            raise RuntimeError(
                f"boruvka_mst pointer jumping did not converge within "
                f"jump_rounds={jump_rounds}")
        # rewrite edges onto root components, drop intra-component
        # edges, re-collapse parallel pairs to the (w, a, b)-minimum
        # representative -> the working set shrinks with the merge
        m = F.struct("w", "a", "b")
        work = _ckcut(work
                .join(par.select(F.col("c").alias("ca"),
                                 F.col("p").alias("ra")), "ca")
                .join(par.select(F.col("c").alias("cb"),
                                 F.col("p").alias("rb")), "cb")
                .filter(F.col("ra") != F.col("rb"))
                .select(F.least("ra", "rb").alias("ca"),
                        F.greatest("ra", "rb").alias("cb"),
                        "w", "a", "b")
                .groupBy("ca", "cb").agg(F.min(m).alias("m"))
                .select("ca", "cb", F.col("m.w").alias("w"),
                        F.col("m.a").alias("a"), F.col("m.b").alias("b")))
    else:
        if not work.isEmpty():
            raise RuntimeError(
                f"boruvka_mst did not converge within "
                f"max_rounds={max_rounds}")
    if msf is None:
        return work.limit(0).select(*out_cols)
    return msf.select(*out_cols)


def boruvka_mst_sql(edges_sql: str, src: str = "src", dst: str = "dst",
                    weight: str = "weight") -> str:
    """DuckDB twin of boruvka_mst — deliberately a DIFFERENT
    algorithm (independent-oracle rule): the Kruskal cut property.
    Under the (w, a, b) total order, an edge belongs to the unique
    MSF iff its endpoints are NOT connected using only strictly
    smaller edges.  The recursive CTE materializes, per candidate
    edge rank rk, the set of nodes reachable from its a-endpoint
    through edges of rank < rk; the edge survives iff b is absent
    from that set.  O(E*V) state — an oracle-sized spelling, not a
    scale path (the engine side is the scale path)."""
    return f"""WITH RECURSIVE bm_e AS MATERIALIZED (
  SELECT a, b, w,
         CAST(row_number() OVER (ORDER BY w, a, b) AS BIGINT) AS rk
  FROM (
    SELECT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b,
           CAST(min({weight}) AS BIGINT) AS w
    FROM (
{edges_sql.strip()}
    )
    WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
      AND {weight} IS NOT NULL AND {src} <> {dst}
    GROUP BY 1, 2
  )
), bm_reach(rk, node) AS (
  SELECT rk, a FROM bm_e
  UNION
  SELECT r.rk,
         CASE WHEN e.a = r.node THEN e.b ELSE e.a END
  FROM bm_reach r
  JOIN bm_e e ON e.rk < r.rk AND (e.a = r.node OR e.b = r.node)
)
SELECT e.a, e.b, e.w
FROM bm_e e
WHERE NOT EXISTS (
  SELECT 1 FROM bm_reach r WHERE r.rk = e.rk AND r.node = e.b
)"""


def dominant_matching(edges: DataFrame, src: str = "src",
                      dst: str = "dst", weight: str = "weight",
                      max_rounds: int = 64) -> DataFrame:
    """Greedy maximal matching of the weighted undirected simple
    graph under the (w, a, b) total order, computed in parallel
    rounds of LOCALLY DOMINANT edges: an edge that is the minimum
    incident edge at BOTH endpoints is exactly an edge the
    sequential greedy would pick before any of its competitors, so
    repeatedly taking all dominant edges and retiring their
    endpoints reproduces the sequential greedy matching exactly
    (Preis's local-dominance argument) — deterministic, unique,
    comparable to an independently-spelled twin.  Output: matched
    (a, b, w) with a < b; each node appears at most once.

    The matching is the 1:1 assignment primitive of entity
    alignment: candidate cross-source merge pairs scored by
    similarity, where each entity may merge with at most one
    counterpart — greedy-by-best-score is the standard baseline
    (2-approximation on weight) and its determinism is what makes
    the result auditable.

    Scale shape
    -----------
    Each round: one min(struct) groupBy per endpoint (map-side
    partial agg absorbs hubs), one self-equality join to test
    dominance at both ends, two anti-joins to retire matched
    endpoints — all on uniform node keys.  Typical round count is
    O(log E) (a constant fraction of nodes retires per round on
    bounded-degree and random-weight graphs); the documented worst
    case is a monotone chain (one dominant edge per round, the LPA
    caveat family) — max_rounds bounds it and exhaustion raises.
    Lineage cut per round with localCheckpoint.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    work = _ckcut(edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                         F.greatest(F.col(src), F.col(dst)).alias("b"),
                         F.col(weight).cast("long").alias("w"))
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                    & F.col("w").isNotNull()
                    & (F.col("a") != F.col("b")))
            .groupBy("a", "b").agg(F.min("w").alias("w")))
    matched = None
    for _ in range(max_rounds):
        if work.isEmpty():
            break
        pick = F.struct("w", "a", "b")
        inc = (work.select(F.col("a").alias("id"), "w", "a", "b")
               .unionAll(work.select(F.col("b").alias("id"),
                                     "w", "a", "b")))
        best = (inc.groupBy("id").agg(F.min(pick).alias("m"))
                .select("id", F.col("m.w").alias("bw"),
                        F.col("m.a").alias("ba"),
                        F.col("m.b").alias("bb")))
        dom = _ckcut(work
               .join(best.select(F.col("id").alias("a"),
                                 F.col("bw").alias("wa"),
                                 F.col("ba").alias("aa"),
                                 F.col("bb").alias("ab")), "a")
               .join(best.select(F.col("id").alias("b"),
                                 F.col("bw").alias("wb"),
                                 F.col("ba").alias("ba"),
                                 F.col("bb").alias("bb")), "b")
               .filter((F.col("w") == F.col("wa"))
                       & (F.col("a") == F.col("aa"))
                       & (F.col("b") == F.col("ab"))
                       & (F.col("w") == F.col("wb"))
                       & (F.col("a") == F.col("ba"))
                       & (F.col("b") == F.col("bb")))
               .select("a", "b", "w"))
        matched = dom if matched is None else matched.unionAll(dom)
        matched = _ckcut(matched)
        ids = (dom.select(F.col("a").alias("id"))
               .unionAll(dom.select(F.col("b").alias("id"))))
        work = _ckcut(work
                .join(ids.select(F.col("id").alias("a")), "a",
                      "left_anti")
                .join(ids.select(F.col("id").alias("b")), "b",
                      "left_anti")
                .select("a", "b", "w"))
    else:
        if not work.isEmpty():
            raise RuntimeError(
                f"dominant_matching did not converge within "
                f"max_rounds={max_rounds} (monotone-chain worst "
                f"case — raise max_rounds)")
    if matched is None:
        return work.limit(0).select("a", "b", "w")
    return matched.select("a", "b", "w")


def dominant_matching_sql(edges_sql: str, rounds: int,
                          src: str = "src", dst: str = "dst",
                          weight: str = "weight") -> str:
    """DuckDB twin of dominant_matching: the locally-dominant-edge
    recurrence unrolled to a fixed `rounds` (the kcore_sql pattern).
    Greedy uniqueness means the engine's early-stopped fixpoint
    equals the twin whenever `rounds` covers the actual round count.
    AS MATERIALIZED per round CTE (each referenced several times)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    parts = [f"""WITH dm_e0 AS MATERIALIZED (
  SELECT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b,
         CAST(min({weight}) AS BIGINT) AS w
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
    AND {weight} IS NOT NULL AND {src} <> {dst}
  GROUP BY 1, 2
)"""]
    for i in range(1, rounds + 1):
        p = f"dm_e{i - 1}"
        parts.append(f""", dm_nb{i} AS MATERIALIZED (
  SELECT id, w, a, b FROM (
    SELECT id, w, a, b, row_number() OVER (
      PARTITION BY id ORDER BY w, a, b) AS rn
    FROM (SELECT a AS id, w, a, b FROM {p}
          UNION ALL SELECT b, w, a, b FROM {p})
  ) WHERE rn = 1
), dm_d{i} AS MATERIALIZED (
  SELECT e.a, e.b, e.w FROM {p} e
  JOIN dm_nb{i} na ON na.id = e.a AND na.w = e.w
    AND na.a = e.a AND na.b = e.b
  JOIN dm_nb{i} nb ON nb.id = e.b AND nb.w = e.w
    AND nb.a = e.a AND nb.b = e.b
), dm_e{i} AS MATERIALIZED (
  SELECT e.a, e.b, e.w FROM {p} e
  WHERE e.a NOT IN (SELECT a FROM dm_d{i}
                    UNION ALL SELECT b FROM dm_d{i})
    AND e.b NOT IN (SELECT a FROM dm_d{i}
                    UNION ALL SELECT b FROM dm_d{i})
)""")
    un = "\nUNION ALL ".join(f"SELECT a, b, w FROM dm_d{i}"
                             for i in range(1, rounds + 1))
    parts.append(f"\n{un}")
    return "".join(parts)


def greedy_mis(edges: DataFrame, src: str = "src", dst: str = "dst",
               max_rounds: int = 64) -> DataFrame:
    """Maximal independent set of the undirected simple graph under
    a fixed portable-hash priority, computed in Luby-style parallel
    rounds: an undecided node enters the MIS when its (h, id) is
    strictly smallest in its undecided neighborhood (vacuously when
    the neighborhood emptied); MIS neighbors retire.  With the
    priority FIXED across rounds this is exactly the sequential
    greedy MIS in (h, id) order — deterministic and unique, so the
    oracle can check it row-for-row.  Output: (id, h).

    The MIS is the conflict-free selection primitive: from a
    similarity/conflict graph pick a maximal set of mutually
    non-adjacent items (diversity sampling of near-dup clusters,
    non-overlapping mention spans, one-per-neighborhood training
    exemplars).  Hash priorities make the choice reproducible AND
    break adversarial orderings of sequential ids.

    Scale shape
    -----------
    Each round: one min groupBy over edge endpoints + two semi/anti
    joins on uniform node keys; a constant fraction of the
    UNDECIDED neighborhood resolves per round in expectation over
    the hash order (Luby's argument), so rounds are O(log V);
    max_rounds bounds the adversarial tail and exhaustion raises.
    Isolated nodes never appear in an edge list — the caller unions
    them into the MIS directly.  localCheckpoint per round.
    """
    from biocypher_metta_spark.operators.text import portable_hash

    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    und = _ckcut(edges.select(F.col(src).alias("id"))
           .unionAll(edges.select(F.col(dst).alias("id")))
           .filter(F.col("id").isNotNull()).distinct()
           .select("id",
                   portable_hash(F.col("id").cast("string")).alias("h")))
    e = _ckcut(edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b")))
         .distinct())
    mis = None
    for _ in range(max_rounds):
        if und.isEmpty():
            break
        pri = F.struct("h", "id")
        nbr = (e.join(und.select(F.col("id").alias("a"),
                                 F.col("h").alias("ha")), "a")
               .join(und.select(F.col("id").alias("b"),
                                F.col("h").alias("hb")), "b"))
        nmin = (nbr.select(F.col("a").alias("id"),
                           F.struct(F.col("hb").alias("h"),
                                    F.col("b").alias("id")).alias("np"))
                .unionAll(nbr.select(
                    F.col("b").alias("id"),
                    F.struct(F.col("ha").alias("h"),
                             F.col("a").alias("id")).alias("np")))
                .groupBy("id").agg(F.min("np").alias("np")))
        win = _ckcut(und.join(nmin, "id", "left")
               .filter(F.col("np").isNull() | (pri < F.col("np")))
               .select("id", "h"))
        mis = win if mis is None else mis.unionAll(win)
        mis = _ckcut(mis)
        # retire winners and their whole neighborhoods
        retired = (win.select("id")
                   .unionAll(nbr.join(win.select(F.col("id")
                                                 .alias("a")), "a",
                                      "left_semi")
                             .select(F.col("b").alias("id")))
                   .unionAll(nbr.join(win.select(F.col("id")
                                                 .alias("b")), "b",
                                      "left_semi")
                             .select(F.col("a").alias("id"))))
        und = _ckcut(und.join(retired, "id", "left_anti"))
        e = _ckcut(e.join(und.select(F.col("id").alias("a")), "a",
                    "left_semi")
             .join(und.select(F.col("id").alias("b")), "b",
                   "left_semi"))
    else:
        if not und.isEmpty():
            raise RuntimeError(
                f"greedy_mis did not converge within "
                f"max_rounds={max_rounds}")
    if mis is None:
        return und.limit(0).select("id", "h")
    return mis.select("id", "h")


def greedy_mis_sql(edges_sql: str, rounds: int, src: str = "src",
                   dst: str = "dst") -> str:
    """DuckDB twin of greedy_mis: the fixed-priority Luby recurrence
    unrolled to `rounds` (kcore_sql pattern), with the engine's
    portable hash spelled as DuckDB md5 arithmetic so priorities are
    bit-identical across engines."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    parts = [f"""WITH gm_n0 AS MATERIALIZED (
  SELECT id, ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM (
    SELECT DISTINCT {src} AS id FROM (
{edges_sql.strip()}
    ) WHERE {src} IS NOT NULL
    UNION
    SELECT DISTINCT {dst} FROM (
{edges_sql.strip()}
    ) WHERE {dst} IS NOT NULL
  )
), gm_e0 AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL AND {src} <> {dst}
)"""]
    for i in range(1, rounds + 1):
        pn, pe = f"gm_n{i - 1}", f"gm_e{i - 1}"
        parts.append(f""", gm_nm{i} AS MATERIALIZED (
  SELECT id, nh, nid FROM (
    SELECT id, nh, nid, row_number() OVER (
      PARTITION BY id ORDER BY nh, nid) AS rn
    FROM (
      SELECT e.a AS id, nb.h AS nh, nb.id AS nid
      FROM {pe} e JOIN {pn} nb ON nb.id = e.b
      UNION ALL
      SELECT e.b, na.h, na.id
      FROM {pe} e JOIN {pn} na ON na.id = e.a
    )
  ) WHERE rn = 1
), gm_w{i} AS MATERIALIZED (
  SELECT u.id, u.h FROM {pn} u
  LEFT JOIN gm_nm{i} m ON m.id = u.id
  WHERE m.id IS NULL OR (u.h, u.id) < (m.nh, m.nid)
), gm_n{i} AS MATERIALIZED (
  SELECT u.id, u.h FROM {pn} u
  WHERE u.id NOT IN (SELECT id FROM gm_w{i})
    AND u.id NOT IN (
      SELECT e.b FROM {pe} e JOIN gm_w{i} w ON w.id = e.a
      UNION ALL
      SELECT e.a FROM {pe} e JOIN gm_w{i} w ON w.id = e.b
    )
), gm_e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {pe} e
  JOIN gm_n{i} na ON na.id = e.a
  JOIN gm_n{i} nb ON nb.id = e.b
)""")
    un = "\nUNION ALL ".join(f"SELECT id, h FROM gm_w{i}"
                             for i in range(1, rounds + 1))
    parts.append(f"\n{un}")
    return "".join(parts)


def single_linkage_clusters(edges: DataFrame, threshold: int,
                            src: str = "src", dst: str = "dst",
                            weight: str = "weight",
                            max_rounds: int = 32,
                            cc_iter: int = 64) -> DataFrame:
    """Single-linkage clustering at a distance threshold: every node
    of the (filtered, simple) graph labeled with the minimum node id
    reachable through edges of weight <= threshold.  Output:
    (id, cluster); nodes whose every incident edge exceeds the
    threshold are singleton clusters of themselves.

    This is the dendrogram cut the MSF docstring promises: clusters
    at threshold t are exactly the connected components of the
    t-filtered graph, and those equal the components of the
    t-filtered MINIMUM SPANNING FOREST (cut property) — so the
    engine first contracts the graph to its MSF (boruvka_mst,
    near-linear) and then runs hash-min component labeling over the
    surviving FOREST edges (V-1 rows max, not E) — the standard
    embedding/near-dup cluster extractor at a similarity cutoff.

    The DuckDB twin is NOT this composition: it computes min-id
    reachability over the t-filtered ORIGINAL edge set with a
    recursive CTE — a different algorithm over a different edge set
    that must agree exactly (the cut property is what's being
    checked).
    """
    from biocypher_metta_spark.canonicalize import connected_components

    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                      F.greatest(F.col(src), F.col(dst)).alias("b"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & F.col("w").isNotNull()
                 & (F.col("a") != F.col("b"))))
    nodes = (e.select(F.col("a").alias("id"))
             .unionAll(e.select(F.col("b").alias("id")))
             .distinct())
    msf = boruvka_mst(e, src="a", dst="b", weight="w",
                      max_rounds=max_rounds)
    keep = msf.filter(F.col("w") <= F.lit(int(threshold)))
    comp = (connected_components(keep, src="a", dst="b",
                                 max_iter=cc_iter)
            .select(F.col("id"), F.col("component").alias("cluster")))
    return (nodes.join(comp, "id", "left")
            .select("id", F.coalesce("cluster", "id").alias("cluster")))


def single_linkage_clusters_sql(edges_sql: str, threshold: int,
                                src: str = "src", dst: str = "dst",
                                weight: str = "weight") -> str:
    """Independent twin of single_linkage_clusters: min-id
    reachability over the threshold-filtered ORIGINAL edges (no MSF
    involved) as a recursive CTE."""
    return f"""WITH RECURSIVE sl_e AS MATERIALIZED (
  SELECT DISTINCT least({src}, {dst}) AS a, greatest({src}, {dst}) AS b
  FROM (
{edges_sql.strip()}
  )
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
    AND {weight} IS NOT NULL AND {src} <> {dst}
    AND CAST({weight} AS BIGINT) <= {int(threshold)}
), sl_n AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT least({src}, {dst}) AS id
    FROM (
{edges_sql.strip()}
    )
    WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
      AND {weight} IS NOT NULL AND {src} <> {dst}
    UNION
    SELECT greatest({src}, {dst})
    FROM (
{edges_sql.strip()}
    )
    WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
      AND {weight} IS NOT NULL AND {src} <> {dst}
  )
), sl_reach(id, node) AS (
  SELECT id, id FROM sl_n
  UNION
  SELECT r.id, CASE WHEN e.a = r.node THEN e.b ELSE e.a END
  FROM sl_reach r JOIN sl_e e ON e.a = r.node OR e.b = r.node
)
SELECT id, min(node) AS cluster FROM sl_reach GROUP BY id"""
