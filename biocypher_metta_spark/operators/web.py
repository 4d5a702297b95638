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
