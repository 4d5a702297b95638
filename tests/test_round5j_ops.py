"""Round-5j operators: market-basket association rules."""

import random

import duckdb

from biocypher_metta_spark.operators.itemsets import association_rules


def _rules(spark, rows, **kw):
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(df, "basket", "item", **kw)
    return sorted(tuple(r) for r in out.collect())


def test_association_rules_hand_case(spark):
    # 4 baskets; {a,b} together in 3, a alone in 1 -> conf(a->b)=750,
    # conf(b->a)=1000, lift = 4*3/(4*3) = 1000 (independent would be
    # exactly this co-count).
    rows = [(1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "a"),
            # duplicate membership rows must not double-count
            (1, "a")]
    got = _rules(spark, rows, min_pair_support=2, max_basket=10)
    assert got == [("a", "b", 3, 4, 750, 1000),
                   ("b", "a", 3, 3, 1000, 1000)]


def test_association_rules_hub_guard_drops_mega_basket(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    # basket 99 holds 5 items; with max_basket=4 it vanishes whole,
    # including its contribution to item supports and basket count
    rows += [(99, f"x{i}") for i in range(4)] + [(99, "a")]
    got = _rules(spark, rows, min_pair_support=2, max_basket=4)
    assert got == [("a", "b", 2, 2, 1000, 1000),
                   ("b", "a", 2, 2, 1000, 1000)]


def test_association_rules_randomized_vs_quadratic(spark):
    rng = random.Random(53)
    rows = [(rng.randrange(40), f"i{rng.randrange(12)}")
            for _ in range(600)]
    got = _rules(spark, rows, min_pair_support=2, max_basket=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE m (basket BIGINT, item VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?,?)", rows)
    oracle = sorted(tuple(r) for r in con.execute("""
        WITH members AS (SELECT DISTINCT basket, item FROM m),
        kept AS (
          SELECT basket, item FROM (
            SELECT basket, item,
                   count(*) OVER (PARTITION BY basket) AS bsz
            FROM members) WHERE bsz <= 8),
        nb AS (SELECT count(DISTINCT basket) AS n FROM kept),
        sup AS (SELECT item, count(*) AS n_item FROM kept GROUP BY item),
        pairs AS (
          SELECT a.item AS ia, c.item AS ib, count(*) AS np
          FROM kept a JOIN kept c
            ON a.basket = c.basket AND a.item < c.item
          GROUP BY 1, 2 HAVING count(*) >= 2),
        directed AS (
          SELECT ia AS ante, ib AS cons, np FROM pairs
          UNION ALL SELECT ib, ia, np FROM pairs)
        SELECT d.ante, d.cons, CAST(d.np AS BIGINT),
               CAST(sa.n_item AS BIGINT),
               CAST(floor((1000 * d.np) / sa.n_item) AS BIGINT),
               CAST(floor((1000 * nb.n * d.np)
                          / (sa.n_item * sc.n_item)) AS BIGINT)
        FROM directed d
        JOIN sup sa ON sa.item = d.ante
        JOIN sup sc ON sc.item = d.cons
        CROSS JOIN nb""").fetchall())
    assert got == oracle


# ---------------------------------------------------------------------------
# engine-portable HyperLogLog
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.sketch import (  # noqa: E402
    HLL_M, hll_distinct_by, hll_estimate_from_registers, hll_registers_by)


def test_hll_accuracy_and_bounded_state(spark):
    # 6000 distinct values, duplicated x2 — estimate within the ~3-sigma
    # band of 1.04/sqrt(64) = 13% per-sigma for m=64
    rows = [(f"v{i}",) for i in range(6000)] * 2
    df = spark.createDataFrame(rows, "v string")
    regs = hll_registers_by(df.withColumn("g", __import__(
        "pyspark").sql.functions.lit("all")), ["g"], "v")
    assert regs.count() <= HLL_M  # the defining sketch property
    est = hll_distinct_by(df.withColumn("g", __import__(
        "pyspark").sql.functions.lit("all")), ["g"], "v").collect()[0]
    assert abs(est["est_fp"] - 6000) < 6000 * 0.40


def test_hll_registers_are_max_mergeable(spark):
    from pyspark.sql import functions as F
    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(250, 750)], "v string")
    ra = hll_registers_by(a.withColumn("g", F.lit("x")), ["g"], "v")
    rb = hll_registers_by(b.withColumn("g", F.lit("x")), ["g"], "v")
    merged = (ra.unionByName(rb).groupBy("g", "bucket")
              .agg(F.max("m").cast("long").alias("m")))
    direct = hll_registers_by(
        a.unionByName(b).withColumn("g", F.lit("x")), ["g"], "v")
    em = hll_estimate_from_registers(merged, ["g"]).collect()
    ed = hll_estimate_from_registers(direct, ["g"]).collect()
    assert [tuple(r) for r in em] == [tuple(r) for r in ed]


def test_hll_registers_match_duckdb_bit_for_bit(spark):
    from pyspark.sql import functions as F
    rows = [(f"u{i % 37}",) for i in range(200)] + [(None,)]
    df = spark.createDataFrame(rows, "v string")
    got = sorted(tuple(r) for r in hll_registers_by(
        df.withColumn("g", F.lit("s")), ["g"], "v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    oracle = sorted(tuple(r) for r in con.execute("""
        SELECT 's' AS g, h % 64 AS bucket,
               max(least(55 - length(bin(h // 64)), 40)) AS m
        FROM (SELECT ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
              FROM t WHERE v IS NOT NULL)
        GROUP BY 1, 2""").fetchall())
    assert got == oracle


# ---------------------------------------------------------------------------
# resource-allocation link prediction
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.graph import (  # noqa: E402
    resource_allocation_links, resource_allocation_links_sql)


def _ra(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src long, dst long")
    return sorted(tuple(r) for r in
                  resource_allocation_links(df, **kw).collect())


def test_ra_hand_case_weights_and_antijoin(spark):
    # path graph 1-2, 2-3, plus 1-4, 3-4: pair (1,3) shares z=2
    # (deg 2) and z=4 (deg 2) -> ra = 2*500000; pair (2,4) shares
    # z=1, z=3 (deg 2 each) -> same. Pair (1,2) is an EDGE -> absent.
    rows = [(1, 2), (2, 3), (1, 4), (3, 4)]
    got = _ra(spark, rows, min_common=2)
    assert got == [(1, 3, 2, 1000000), (2, 4, 2, 1000000)]


def test_ra_hub_truncation_drops_hub_witnesses(spark):
    # star: hub 0 connected to 1..5; spokes also chained 1-2
    rows = [(0, i) for i in range(1, 6)] + [(1, 2)]
    # exact: (1,2) is an edge -> absent; pairs (i,j) i,j>=1 share hub
    # 0 (deg 5) only -> n_common=1 < 2 -> nothing survives min_common=2
    assert _ra(spark, rows, min_common=2) == []
    # with min_common=1 the hub-witnessed pairs appear at 200000 each;
    # truncating max_hub_degree=4 removes the hub and yields nothing
    full = _ra(spark, rows, min_common=1)
    assert (1, 3, 1, 200000) in full
    assert _ra(spark, rows, min_common=1, max_hub_degree=4) == []


def test_ra_randomized_vs_duckdb_twin(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    got = _ra(spark, rows, min_common=2)
    con = duckdb.connect()
    con.execute("CREATE TABLE ed (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO ed VALUES (?,?)", rows)
    sql = resource_allocation_links_sql(
        "SELECT src, dst FROM ed", min_common=2)
    oracle = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == oracle


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.text import (  # noqa: E402
    winnow_fingerprints)


def _winnow(spark, docs, n=5, w=4):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return winnow_fingerprints(df, n=n, w=w).collect()


def test_winnowing_guarantee_and_short_doc(spark):
    words = " ".join(f"w{i}" for i in range(40))
    rows = _winnow(spark, [("a", words)])
    # guarantee: every window of 4 consecutive shingles (positions
    # 1..36-ish) contains at least one selected position
    got = sorted(r["pos"] for r in rows)
    n_shingles = 40 - 4
    for start in range(1, n_shingles - 4 + 2):
        assert any(start <= p <= start + 3 for p in got), start
    # a short doc (fewer than w shingles) yields exactly one fp
    short = _winnow(spark, [("s", "a b c d e f")])  # 2 shingles < w
    assert len(short) == 1


def test_winnowing_shared_run_produces_shared_hash(spark):
    run = " ".join(f"shared{i}" for i in range(12))  # >= w+n-1 = 8
    d1 = "x1 x2 x3 " + run + " y1 y2"
    d2 = "z1 " + run + " q1 q2 q3 q4"
    rows = _winnow(spark, [("a", d1), ("b", d2)])
    ha = {r["h"] for r in rows if r["doc_id"] == "a"}
    hb = {r["h"] for r in rows if r["doc_id"] == "b"}
    assert ha & hb, "shared 12-token run must share a fingerprint"
    # and two unrelated docs don't (with overwhelming probability)
    rows2 = _winnow(spark, [("a", " ".join(f"u{i}" for i in range(20))),
                            ("b", " ".join(f"v{i}" for i in range(20)))])
    ha2 = {r["h"] for r in rows2 if r["doc_id"] == "a"}
    hb2 = {r["h"] for r in rows2 if r["doc_id"] == "b"}
    assert not (ha2 & hb2)


def test_winnowing_matches_duckdb_twin_randomized(spark):
    rng = random.Random(29)
    docs = [(f"d{j}", " ".join(f"t{rng.randrange(30)}"
                               for _ in range(rng.randrange(3, 60))))
            for j in range(25)]
    got = sorted(tuple(r) for r in _winnow(spark, docs))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", docs)
    from biocypher_metta_spark.entry_queries import DOC_WINNOWING_SQL
    oracle = sorted(tuple(r) for r in
                    con.execute(DOC_WINNOWING_SQL).fetchall())
    assert got == oracle


# ---------------------------------------------------------------------------
# anchor-text aggregation
# ---------------------------------------------------------------------------

from biocypher_metta_spark.operators.web import (  # noqa: E402
    anchor_text_summary)


def test_anchor_text_hand_case(spark):
    docs = [
        (1, '<a href="https://x.com/p">Buy   NOW</a> '
            '<a href="https://x.com/p">buy now</a> '
            '<a href="https://x.com/p">store</a> '
            '<a href="https://x.com/p"></a> '
            '<a href="/rel">rel</a> <a href="#f">f</a>'),
        (2, "<a href='https://x.com/p'>buy now</a> "
            '<a href="https://y.org/q">y page</a>'),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in anchor_text_summary(df).collect())
    assert got == [
        ("https://x.com/p", "buy now", 3, 1),
        ("https://x.com/p", "store", 1, 2),
        ("https://y.org/q", "y page", 1, 1),
    ]


def test_anchor_text_top_k_truncates(spark):
    docs = [(i, "".join(
        f'<a href="https://z.net/">a{j}</a>' for j in range(5)))
        for i in range(2)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = anchor_text_summary(df, top_k=2).collect()
    assert len(got) == 2 and {r["rank"] for r in got} == {1, 2}


def test_anchor_text_randomized_vs_duckdb_regexp(spark):
    rng = random.Random(41)
    hosts = ["https://a.com/x", "https://b.org/y", "https://c.io/z"]
    anchors = ["one", "two  WORDS", "Three", ""]
    docs = []
    for i in range(40):
        parts = []
        for _ in range(rng.randrange(0, 6)):
            parts.append('<a href="%s">%s</a>' % (
                rng.choice(hosts + ["/rel", "#frag"]),
                rng.choice(anchors)))
        docs.append((i, " filler ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in anchor_text_summary(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", docs)
    oracle = sorted(tuple(r) for r in con.execute(r"""
        WITH els AS (
          SELECT unnest(regexp_extract_all(text,
            '(?i)<a\s[^>]*href\s*=\s*["''][^"'']+["''][^>]*>[^<]*</a>'))
            AS el
          FROM d
        ), pairs AS (
          SELECT regexp_extract(el,
                   '(?i)href\s*=\s*["'']([^"'']+)["'']', 1) AS href,
                 lower(trim(regexp_replace(
                   regexp_extract(el, '>([^<]*)<', 1), '\s+', ' ', 'g')))
                   AS anchor
          FROM els
        ), counts AS (
          SELECT href AS url, anchor, count(*) AS n
          FROM pairs
          WHERE regexp_matches(href, '(?i)^https?://') AND anchor <> ''
          GROUP BY 1, 2
        )
        SELECT url, anchor, CAST(n AS BIGINT),
               CAST(row_number() OVER (PARTITION BY url
                    ORDER BY n DESC, anchor) AS BIGINT) AS rank
        FROM counts QUALIFY rank <= 3""").fetchall())
    assert got == oracle
