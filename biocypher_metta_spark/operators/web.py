"""Web-corpus curation operators: URL parsing and per-domain caps.

Web-crawl training corpora (C4, RefinedWeb, Dolma) cap how many
documents any single registrable domain may contribute — otherwise a
handful of mega-sites (blogspot mirrors, e-commerce catalogs, SEO
farms) dominate the mixture and the model overfits their boilerplate.
The recipe is: canonicalize the URL to a host, group by host, keep a
bounded, deterministically-chosen subset per host.

Scale shape
-----------
`extract_host` is a single regexp over the url column — map-only,
stays inside WholeStageCodegen (no Python).  `domain_cap` shuffles
once on the host key and takes a per-host top-n by salted hash (the
same uniform without-replacement draw as
`sampling.stratified_sample`, and the same `prefilter_permille`
escape hatch for mega-hosts — a 10^8-page domain sends only its
smallest hash band through the per-key sort).  Host keys on a web
crawl are Zipf-skewed by construction, so this operator is exactly
where AQE skew handling + the prefilter knob earn their keep.
(No reference counterpart — beyond-reference training-data op.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biocypher_metta_spark.operators.sampling import stratified_sample

# scheme://[userinfo@]HOST[:port][/path...]  — capture the host.
# RE2/Java-common subset (no lookbehind) so the same pattern family
# works in Spark, DuckDB, and RE2-based scanners.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def extract_host(url: Column, strip_www: bool = True) -> Column:
    """Lower-cased host part of a URL; '' when the URL has no
    scheme://host prefix (Spark's regexp_extract convention for
    no-match, which callers should filter or null out).

    strip_www drops ONE leading 'www.' label — the conventional
    canonicalization so www.example.com and example.com pool into the
    same cap bucket."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)"
_REST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+(.*)$"
# tracking params the C4/CC recipes drop before URL-dedup
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL for url-level dedup (the C4 / Common
    Crawl precursor to exact dedup on the URL key). Deterministic
    rewrite chain, every step a JVM-side regexp/array op:

    1. strip the fragment (#...);
    2. lower-case scheme and host, drop userinfo, strip ONE leading
       'www.' label;
    3. drop the default port (:80 for http, :443 for https — other
       schemes keep their port);
    4. strip ALL trailing slashes from the path (root '/' becomes '');
    5. drop tracking params (utm_*, fbclid, gclid), SORT the remaining
       query params (sorting canonicalizes param order across crawls;
       duplicate keys keep value-sorted order), drop the '?' when none
       survive.

    Inputs with no scheme://authority prefix pass through trimmed and
    otherwise untouched — dropping them is the caller's policy call,
    as in domain_cap."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, _AUTH_RE, 1)), r"^www\.", "")
    host = (F.when(scheme == "http",
                   F.regexp_replace(host, r":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(host, r":443$", ""))
            .otherwise(host))
    rest = F.regexp_extract(u, _REST_RE, 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1),
                            r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (~p.rlike(_TRACKING_RE)) & (p != "")))
    canon_q = F.array_join(params, "&")
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q))
        .otherwise(F.lit("")))
    return F.when(scheme == "", F.trim(url)).otherwise(out)


def domain_cap(df: DataFrame, cap: int, url_col: str = "url",
               id_col: str = "doc_id", salt: str = "domcap",
               prefilter_permille: int | None = None) -> DataFrame:
    """Keep at most `cap` documents per canonical host.

    The kept subset per host is the `cap` rows with the smallest
    salted portable hash — uniform, reproducible across engines and
    reruns (a re-crawl that adds pages to a domain keeps a stable core
    rather than resampling everything).  Rows whose URL yields no host
    (relative links, garbage) are passed through UNCAPPED under the
    sentinel host '' — dropping them is a separate policy decision the
    caller makes explicitly.

    Output adds `host` and `sample_rank` (1..cap within host)."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    with_host = df.withColumn("host", extract_host(F.col(url_col)))
    hosted = with_host.filter(F.col("host") != "")
    capped = stratified_sample(
        hosted, ["host"], cap, id_col=id_col, salt=salt,
        prefilter_permille=prefilter_permille)
    unhosted = (with_host.filter(F.col("host") == "")
                .withColumn("sample_rank", F.lit(0)))
    return capped.unionByName(unhosted)


_HREF_RE = r"""(?i)href\s*=\s*["']([^"']+)["']"""


def extract_links(df: DataFrame, doc_col: str = "doc_id",
                  text_col: str = "text",
                  base_url_col: str | None = None) -> DataFrame:
    """Hyperlink extraction: raw page text -> (doc, url, n_links)
    link-edge rows, the construction step of the WEB GRAPH that
    pagerank/kcore/cooccurrence upstream consume (and the source of
    anchor-graph dedup signals). href values are captured with one
    RE2/Java-common regexp (regexp_extract_all group 1 — map-side,
    zero Python), deduplicated per doc, absolute http(s) URLs
    canonicalized via canonical_url; fragment-only, relative, and
    javascript: links are DROPPED rather than resolved — base-URL
    resolution needs the crawl's redirect metadata, which is a
    JOIN-time concern (`base_url_col` reserved for it), not a
    regex one.

    Scale shape: regexp_extract_all + explode is the only fanout and
    is bounded by actual link count; the per-(doc,url) distinct is
    one shuffle on uniform keys. Compose with domain_cap BEFORE
    pagerank to stop mega-site link farms from dominating the graph.
    """
    if base_url_col is not None:
        raise NotImplementedError(
            "base-URL resolution of relative links needs crawl "
            "metadata joined in; extract absolute links first and "
            "resolve relatives in that join")
    raw = df.select(
        F.col(doc_col).alias("doc"),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(_HREF_RE), 1)).alias("href"))
    absolute = raw.filter(F.col("href").rlike(r"(?i)^https?://"))
    return (absolute
            .select("doc", canonical_url(F.col("href")).alias("url"))
            .groupBy("doc", "url")
            .agg(F.count(F.lit(1)).cast("long").alias("n_links")))


_ANCHOR_EL_RE = (r"""(?i)<a\s[^>]*href\s*=\s*["'][^"']+["'][^>]*>"""
                 r"""[^<]*</a>""")
_ANCHOR_TXT_RE = r">([^<]*)<"


def anchor_text_summary(df: DataFrame, doc_col: str = "doc_id",
                        text_col: str = "text",
                        top_k: int = 3) -> DataFrame:
    """Anchor-text aggregation: (url, anchor, n, rank) — for each
    canonical link TARGET, the top_k most frequent normalized anchor
    strings pointing at it across the corpus. The classic web-corpus
    signal: anchors are how the REST of the web describes a page
    (retrieval expansion, KG entity naming, spam signals), and it only
    exists as an aggregate across documents — the inverse view of
    extract_links' per-source edges.

    Extraction is one RE2/Java-common regexp over whole <a ...>text</a>
    elements (group 0 — Spark's regexp_extract_all extracts a single
    group index, so (href, anchor) pairs cannot come from one pattern;
    per-element sub-extraction keeps both engines on identical
    semantics). Anchors are whitespace-collapsed, trimmed, lowercased;
    empty anchors (image links, spacer tags) are dropped. Relative /
    javascript: / fragment hrefs drop exactly as in extract_links.

    Scale shape: map-side extraction bounded by real anchor count; one
    shuffle for the (url, anchor) count; the per-url top-k window runs
    over ALREADY AGGREGATED rows (bounded by distinct anchors per url,
    not by link volume — a billion identical "click here" links to one
    target are one row by the time they reach the window)."""
    els = df.select(
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(_ANCHOR_EL_RE), 0)).alias("el"))
    pairs = els.select(
        F.regexp_extract(F.col("el"), _HREF_RE, 1).alias("href"),
        F.lower(F.trim(F.regexp_replace(
            F.regexp_extract(F.col("el"), _ANCHOR_TXT_RE, 1),
            r"\s+", " "))).alias("anchor"))
    kept = (pairs.filter(F.col("href").rlike(r"(?i)^https?://"))
            .filter(F.col("anchor") != ""))
    counts = (kept.select(canonical_url(F.col("href")).alias("url"),
                          "anchor")
              .groupBy("url", "anchor")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy(F.col("n").desc(), "anchor")
    return (counts.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .filter(F.col("rank") <= top_k))


# robots.txt (RFC 9309 core): crawl-permission filtering for the web
# family. Plain-prefix rules only — the RFC's percent-encoding and the
# '*'/'$' wildcard EXTENSION are out of scope and documented so (rules
# containing them still flow through literally). Longest-match wins,
# Allow wins length ties, no matching rule means allowed — the RFC
# defaults. Group selection is per host: if any group names the agent
# exactly, only those groups bind; otherwise the '*' groups do.

_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def robots_rules(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """Parse raw robots.txt bodies into bindable rule rows
    (host, rule_path, is_allow, rule_len) for `agent`.

    The line walk is declarative: posexplode the lines, strip
    comments, regexp the directive/value pair, then reconstruct the
    RFC's group structure with two window passes over the line
    positions — a group starts at a User-agent line whose predecessor
    is NOT one (consecutive User-agent lines share the group), and
    gid is the running count of group starts. Rules with empty values
    ('Disallow:' = allow everything) are dropped, as are rules in
    groups that don't bind the agent.

    Scale shape: robots bodies are small and one-per-host — the
    windows sort line counts per host, and the output rule table is
    the small build side of robots_filter's host join."""
    from pyspark.sql import Window

    a = agent.lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "raw"))
    clean = F.trim(F.substring_index(F.col("raw"), "#", 1))
    parsed = lines.select(
        "host", "pos",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1))
        .alias("dir"),
        F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:\s*(\S*)", 1))
        .alias("val"))
    w = Window.partitionBy("host").orderBy("pos")
    parsed = parsed.withColumn(
        "is_ua", (F.col("dir") == "user-agent").cast("int"))
    parsed = parsed.withColumn(
        "grp_start",
        ((F.col("is_ua") == 1)
         & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0))
        .cast("int"))
    parsed = parsed.withColumn("gid", F.sum("grp_start").over(w))
    grp = (parsed.filter(F.col("is_ua") == 1)
           .groupBy("host", "gid")
           .agg(F.max((F.lower(F.col("val")) == a).cast("int"))
                .alias("m_exact"),
                F.max((F.col("val") == "*").cast("int"))
                .alias("m_star")))
    grp = grp.withColumn(
        "host_exact",
        F.max("m_exact").over(Window.partitionBy("host")))
    keep = grp.filter(
        ((F.col("host_exact") == 1) & (F.col("m_exact") == 1))
        | ((F.col("host_exact") == 0) & (F.col("m_star") == 1))
    ).select("host", "gid")
    return (parsed
            .filter(F.col("dir").isin("allow", "disallow")
                    & (F.col("val") != ""))
            .join(keep, ["host", "gid"])
            .select("host", F.col("val").alias("rule_path"),
                    (F.col("dir") == "allow").cast("int")
                    .alias("is_allow"),
                    F.length("val").cast("long").alias("rule_len"))
            .distinct())


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Verdict per DISTINCT url against robots_rules output:
    (url, host, path, allowed, rule_path, rule_len) — longest
    matching prefix rule binds, Allow wins length ties, hosts with
    no binding rule (or absent from the rule table) default to
    allowed with NULL rule columns. Prefix match is spelled
    substring(path, 1, len) = rule in BOTH engines — no LIKE
    metacharacter hazards from %/_ in rule paths.

    Scale shape: one equi-join on host (rule side is small — broadcast
    it when the host universe allows) + one per-url window over the
    handful of candidate rules; Zipf host skew lands in the join
    where AQE's skew split applies."""
    from pyspark.sql import Window

    p = F.regexp_extract(F.col("url"), _PATH_RE, 1)
    u = (urls.select(F.col(url_col).alias("url"))
         .withColumn("host", extract_host(F.col("url")))
         .withColumn("path", F.when(p == "", "/").otherwise(p)))
    j = u.join(rules, "host", "left")
    j = j.withColumn(
        "mlen",
        F.coalesce(
            F.when(F.expr("substring(path, 1, length(rule_path))"
                          " = rule_path"), F.col("rule_len")),
            F.lit(-1)))
    w = Window.partitionBy("url").orderBy(
        F.col("mlen").desc(),
        F.coalesce(F.col("is_allow"), F.lit(-1)).desc(),
        F.coalesce(F.col("rule_path"), F.lit("")).desc())
    best = (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    no_match = F.col("mlen") < 0
    return best.select(
        "url", "host", "path",
        F.when(no_match, F.lit(1)).otherwise(F.col("is_allow"))
        .cast("int").alias("allowed"),
        F.when(no_match, F.lit(None)).otherwise(F.col("rule_path"))
        .alias("rule_path"),
        F.when(no_match, F.lit(None)).otherwise(F.col("rule_len"))
        .cast("long").alias("rule_len"))


def robots_rules_sql(robots_sql: str, agent: str = "*") -> str:
    """DuckDB twin of robots_rules: same line walk, same two window
    passes, same group-binding recurrence."""
    a = agent.lower().replace("'", "''")
    return f"""WITH rb_in AS MATERIALIZED (
  SELECT host, robots_txt FROM (
{robots_sql.strip()}
  )
), rb_lines AS (
  SELECT host,
         unnest(string_split(robots_txt, chr(10))) AS raw,
         unnest(range(1, len(string_split(robots_txt, chr(10))) + 1))
           AS pos
  FROM rb_in
), rb_p AS (
  SELECT host, pos,
         lower(regexp_extract(trim(split_part(raw, '#', 1)),
                              '^([A-Za-z-]+)\\s*:', 1)) AS dir,
         trim(regexp_extract(trim(split_part(raw, '#', 1)),
                             '^[A-Za-z-]+\\s*:\\s*(\\S*)', 1)) AS val
  FROM rb_lines
), rb_g0 AS (
  SELECT *, CASE WHEN dir = 'user-agent' THEN 1 ELSE 0 END AS is_ua
  FROM rb_p
), rb_g1 AS (
  SELECT *, CASE WHEN is_ua = 1 AND coalesce(
           lag(is_ua) OVER (PARTITION BY host ORDER BY pos), 0) = 0
         THEN 1 ELSE 0 END AS grp_start
  FROM rb_g0
), rb_g2 AS (
  SELECT *, sum(grp_start) OVER (PARTITION BY host ORDER BY pos)
            AS gid
  FROM rb_g1
), rb_grp AS (
  SELECT host, gid,
         max(CASE WHEN lower(val) = '{a}' THEN 1 ELSE 0 END)
           AS m_exact,
         max(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS m_star
  FROM rb_g2 WHERE is_ua = 1 GROUP BY host, gid
), rb_grp2 AS (
  SELECT *, max(m_exact) OVER (PARTITION BY host) AS host_exact
  FROM rb_grp
), rb_keep AS (
  SELECT host, gid FROM rb_grp2
  WHERE (host_exact = 1 AND m_exact = 1)
     OR (host_exact = 0 AND m_star = 1)
)
SELECT DISTINCT g.host, g.val AS rule_path,
       CASE WHEN g.dir = 'allow' THEN 1 ELSE 0 END AS is_allow,
       CAST(length(g.val) AS BIGINT) AS rule_len
FROM rb_g2 g JOIN rb_keep k USING (host, gid)
WHERE g.dir IN ('allow', 'disallow') AND g.val <> ''"""


def robots_filter_sql(urls_sql: str, robots_sql: str,
                      agent: str = "*") -> str:
    """DuckDB twin of robots_filter stacked on robots_rules_sql."""
    rules = robots_rules_sql(robots_sql, agent)
    return f"""WITH rf_rules AS MATERIALIZED (
  SELECT * FROM (
{rules}
  )
), rf_u AS (
  SELECT url,
         regexp_replace(lower(regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)),
           '^www\\.', '') AS host,
         CASE WHEN regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
           THEN '/' ELSE regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) END
           AS path
  FROM (
{urls_sql.strip()}
  )
), rf_j AS (
  SELECT u.url, u.host, u.path, r.rule_path, r.is_allow, r.rule_len,
         coalesce(CASE WHEN substring(u.path, 1, length(r.rule_path))
                          = r.rule_path
                       THEN r.rule_len END, -1) AS mlen
  FROM rf_u u LEFT JOIN rf_rules r ON u.host = r.host
), rf_best AS (
  SELECT *, row_number() OVER (
    PARTITION BY url
    ORDER BY mlen DESC, coalesce(is_allow, -1) DESC,
             coalesce(rule_path, '') DESC) AS rn
  FROM rf_j
)
SELECT url, host, path,
       CAST(CASE WHEN mlen < 0 THEN 1 ELSE is_allow END AS INTEGER)
         AS allowed,
       CASE WHEN mlen < 0 THEN NULL ELSE rule_path END AS rule_path,
       CAST(CASE WHEN mlen < 0 THEN NULL ELSE rule_len END AS BIGINT)
         AS rule_len
FROM rf_best WHERE rn = 1"""


_SITEMAP_URL_BLOCK_RE = r"(?i)<url>([\s\S]*?)</url>"
_SITEMAP_MAP_BLOCK_RE = r"(?i)<sitemap>([\s\S]*?)</sitemap>"
_SITEMAP_LOC_RE = r"(?i)<loc>\s*([^<]+?)\s*</loc>"
_SITEMAP_MOD_RE = r"(?i)<lastmod>\s*([^<]+?)\s*</lastmod>"


def sitemap_urls(df: DataFrame, doc_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Sitemap-protocol parse (sitemaps.org XML): each document's
    <urlset> entries and <sitemapindex> children as rows — the crawl
    seed list a web-corpus pipeline expands BEFORE fetching (and
    joins against robots_filter for permission). Output (doc, kind,
    loc, lastmod): kind 'url' for page entries, 'sitemap' for nested
    index children; lastmod NULL when the tag is absent; entries
    without a <loc> drop.

    Regexes stay in the RE2/Java shared subset (the extract_links
    discipline): block capture via the explicit [\\s\\S]*? non-greedy
    class — no engine-specific dotall flag — then per-block <loc> /
    <lastmod> sub-extraction; regexp_extract returns '' on a miss in
    BOTH engines, normalized to NULL with nullif. Map-only
    (regexp_extract_all + one explode per block kind), fanout bounded
    by actual entry count; no shuffles at all."""
    out = None
    for kind, block_re in (("url", _SITEMAP_URL_BLOCK_RE),
                           ("sitemap", _SITEMAP_MAP_BLOCK_RE)):
        rows = (df.select(
            F.col(doc_col).alias("doc"),
            F.explode(F.regexp_extract_all(
                F.col(text_col), F.lit(block_re), 1)).alias("_b"))
            .select(
                "doc", F.lit(kind).alias("kind"),
                F.nullif(F.regexp_extract(F.col("_b"),
                                          _SITEMAP_LOC_RE, 1),
                         F.lit("")).alias("loc"),
                F.nullif(F.regexp_extract(F.col("_b"),
                                          _SITEMAP_MOD_RE, 1),
                         F.lit("")).alias("lastmod"))
            .filter(F.col("loc").isNotNull()))
        out = rows if out is None else out.unionByName(rows)
    return out


def sitemap_urls_sql(docs_sql: str, doc_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB twin of sitemap_urls: same RE2-subset block + field
    regexes (DuckDB's regex engine IS RE2)."""
    parts = []
    for kind, block_re in (("url", _SITEMAP_URL_BLOCK_RE),
                           ("sitemap", _SITEMAP_MAP_BLOCK_RE)):
        parts.append(f"""SELECT doc, '{kind}' AS kind,
       nullif(regexp_extract(b, '{_SITEMAP_LOC_RE}', 1), '') AS loc,
       nullif(regexp_extract(b, '{_SITEMAP_MOD_RE}', 1), '') AS lastmod
FROM (
  SELECT {doc_col} AS doc,
         unnest(regexp_extract_all({text_col},
                                   '{block_re}', 1)) AS b
  FROM (
{docs_sql.strip()}
  )
)
WHERE nullif(regexp_extract(b, '{_SITEMAP_LOC_RE}', 1), '')
      IS NOT NULL""")
    return "\nUNION ALL\n".join(parts)


# ---- IPv4 / CIDR: crawl-infrastructure filtering ----------------------
#
# Allow/deny-listing crawler traffic and corpus provenance by network
# block is a standard web-pipeline step (bot ranges, datacenter
# blocks, per-ASN caps). An IPv4 address is a 32-bit integer and a
# CIDR block 'a.b.c.d/p' is the integer interval
# [base & mask, (base & mask) + 2^(32-p) - 1] — so membership testing
# at scale is EXACTLY the bucketed point-in-interval join the genomic
# machinery already provides (functions/genomic.interval_point_join),
# not a new operator: one constant chromosome, /16-sized buckets.

_IPV4_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def ipv4_to_long(col):
    """Dotted-quad string column -> BIGINT in [0, 2^32), NULL for
    anything malformed (wrong shape or an octet > 255)."""
    octs = [F.regexp_extract(col, _IPV4_RE, i).cast("long")
            for i in (1, 2, 3, 4)]
    valid = (F.regexp_extract(col, _IPV4_RE, 1) != F.lit(""))
    for o in octs:
        valid = valid & (o <= 255)
    num = ((octs[0] * 16777216) + (octs[1] * 65536)
           + (octs[2] * 256) + octs[3])
    return F.when(valid, num)


def ipv4_to_long_sql(expr: str) -> str:
    """DuckDB twin of ipv4_to_long for a VARCHAR expression."""
    octs = [f"CAST(regexp_extract({expr}, '{_IPV4_RE}', {i}) AS BIGINT)"
            for i in (1, 2, 3, 4)]
    valid = " AND ".join([f"regexp_extract({expr}, '{_IPV4_RE}', 1) <> ''"]
                         + [f"{o} <= 255" for o in octs])
    num = (f"({octs[0]} * 16777216 + {octs[1]} * 65536 "
           f"+ {octs[2]} * 256 + {octs[3]})")
    return f"(CASE WHEN {valid} THEN {num} END)"


def cidr_bounds(col):
    """CIDR string column 'a.b.c.d/p' -> (lo, hi) BIGINT columns —
    the block's inclusive integer range; NULL pair when malformed
    (bad address, p outside 0..32)."""
    addr = F.regexp_extract(col, r"^([^/]+)/(\d{1,2})$", 1)
    p = F.nullif(F.regexp_extract(col, r"^([^/]+)/(\d{1,2})$", 2),
                 F.lit("")).cast("int")
    base = ipv4_to_long(addr)
    size = F.pow(F.lit(2.0), (32 - p)).cast("long")
    lo = F.when(p.isNotNull() & (p <= 32) & base.isNotNull(),
                (base - base % size))
    return lo, lo + size - 1


def cidr_bounds_sql(expr: str) -> tuple:
    addr = f"regexp_extract({expr}, '^([^/]+)/(\\d{{1,2}})$', 1)"
    p = (f"CAST(nullif(regexp_extract({expr}, "
         f"'^([^/]+)/(\\d{{1,2}})$', 2), '') AS INTEGER)")
    base = ipv4_to_long_sql(addr)
    size = f"CAST(power(2, 32 - {p}) AS BIGINT)"
    lo = (f"(CASE WHEN {p} IS NOT NULL AND {p} <= 32 "
          f"AND {base} IS NOT NULL "
          f"THEN {base} - ({base} % {size}) END)")
    return lo, f"({lo} + {size} - 1)"


def ip_in_cidr_join(ips: DataFrame, cidrs: DataFrame,
                    ip_col: str = "ip", cidr_col: str = "cidr",
                    bucket: int = 65_536) -> DataFrame:
    """Every (ip row, containing CIDR block) pair: parse both sides to
    integer ranges, then the bucketed point-in-interval equi-join
    (genomic machinery, constant chromosome). Malformed ips/cidrs
    drop. Buckets default to /16 granularity: a /16-or-longer block
    explodes to exactly one bucket; shorter blocks to 2^(16-p)."""
    from biocypher_metta_spark.functions.genomic import (
        interval_point_join,
    )

    lo, hi = cidr_bounds(F.col(cidr_col))
    iv = (cidrs.withColumn("_lo", lo).withColumn("_hi", hi)
          .filter(F.col("_lo").isNotNull())
          .withColumn("_chr", F.lit("ip"))
          .withColumn("_end", F.col("_hi") + 1))
    pt = (ips.withColumn("_ipn", ipv4_to_long(F.col(ip_col)))
          .filter(F.col("_ipn").isNotNull())
          .withColumn("_chr", F.lit("ip")))
    out = interval_point_join(iv, pt, bucket=bucket, chrom="_chr",
                              start="_lo", end="_end", pos="_ipn")
    return out.drop("_chr", "_lo", "_hi", "_end", "_ipn")
