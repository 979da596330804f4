"""Hyperlink extraction and the domain link graph.

A Common-Crawl-style corpus carries raw ``html``; the web link graph
(who links to whom, aggregated to domains) is the classic derived
artifact — it feeds PageRank-style domain authority (``graph.pagerank``
composes directly on the edges returned here), spam-domain filtering,
and crawl frontier scoring.

Everything is JVM-side built-ins: ``decode`` + ``regexp_extract_all``
over the html bytes, ``functions.urls.canonical_url`` on the targets,
one groupBy for the edge weights.  No per-row Python, nothing that
can't predicate-pushdown, and the href explode is the only row
multiplier (bounded by links-per-page).

Scale: the groupBy key (src_domain, dst_domain) is hub-skewed — big
sites attract links from everywhere — but the aggregation is a count
with map-side combine, so the hot edge collapses per partition before
the shuffle (same posture as boilerplate's line-df count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ner_extractor_spark.functions.urls import canonical_url

#: href attribute capture — double-quoted values, the overwhelmingly
#: dominant form in real markup; deliberately lookaround-free so Java
#: regex (Spark) and RE2 (DuckDB oracle) agree byte for byte.
HREF_PATTERN = r'href="([^"]+)"'

_DOMAIN = r"^[a-z]+://([^/:?#]+)"


def page_domain(col) -> F.Column:
    """Authority (host) part of an absolute, already-lowercased URL;
    '' when the value is relative or unparseable."""
    return F.regexp_extract(col, _DOMAIN, 1)


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, href) — one row per href occurrence in the raw html
    (duplicates preserved: multiplicity is the edge weight signal)."""
    return pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(
            F.decode(F.col(html_col), "UTF-8"),
            F.lit(HREF_PATTERN), F.lit(1))).alias("href"))


def domain_link_graph(links: DataFrame) -> DataFrame:
    """(src_domain, dst_domain, n) — hrefs canonicalized first, then
    rolled up to the domain level; relative links (no authority after
    canonicalization) are dropped."""
    e = links.select(
        page_domain(canonical_url(F.col("src_url"))).alias("src_domain"),
        page_domain(canonical_url(F.col("href"))).alias("dst_domain"))
    return (e.filter((F.col("dst_domain") != "") & (F.col("src_domain") != ""))
            .groupBy("src_domain", "dst_domain")
            .agg(F.count(F.lit(1)).alias("n")))


#: simple-anchor snippet: an <a ...> tag with a double-quoted href and
#: a tag-free text body.  Nested-markup anchors are out of the simple
#: subset by design (deterministic + engine-portable: Java regex and
#: RE2 agree; anchor text with child tags needs the html.py parser).
ANCHOR_SNIPPET = r'<a\s[^>]*href="[^"]+"[^>]*>[^<]*</a>'


def extract_anchor_texts(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(src_url, href, anchor) — one row per simple anchor occurrence.
    Pure JVM: one regexp_extract_all explode (bounded by
    anchors-per-page), two per-snippet regexp_extracts."""
    snips = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(
            F.decode(F.col(html_col), "UTF-8"),
            F.lit(ANCHOR_SNIPPET), F.lit(0))).alias("snip"))
    return snips.select(
        "src_url",
        F.regexp_extract("snip", r'href="([^"]+)"', 1).alias("href"),
        F.regexp_extract("snip", r">([^<]*)<", 1).alias("anchor"))


def anchor_alias_candidates(anchors: DataFrame, top_k: int = 3,
                            min_count: int = 1) -> DataFrame:
    """Anchor-text alias mining — the classic KG alias source (how
    link dictionaries are bootstrapped from the web: the text people
    use to link to a target IS its alias distribution): per canonical
    target url, the ``top_k`` normalized anchor surfaces by
    (count desc, alias asc), with counts.

    Output (dst_url, alias_norm, n, rank) feeds ``link_exact``'s
    alias dimension directly.  Scale shape: one (dst, alias)-keyed
    count with map-side combine (the hub-target skew collapses per
    partition), then a per-dst top-k window — keyed on the target
    url, the maximal-cardinality key."""
    from pyspark.sql import Window

    from ner_extractor_spark.functions.urls import canonical_url
    from ner_extractor_spark.operators.link import norm_surface

    a = (anchors.select(canonical_url(F.col("href")).alias("dst_url"),
                        norm_surface(F.col("anchor")).alias("alias_norm"))
         .filter(F.col("alias_norm") != ""))
    cnt = (a.groupBy("dst_url", "alias_norm")
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") >= min_count))
    w = Window.partitionBy("dst_url").orderBy(F.col("n").desc(),
                                              F.col("alias_norm").asc())
    return (cnt.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k))


def alias_dim_from_anchors(anchor_candidates: DataFrame,
                           entity_type: str = "URL") -> DataFrame:
    """Bootstrap a LINKABLE alias dictionary from mined anchor text —
    the closing of the web-alias loop: ``anchor_alias_candidates``
    output becomes an ALIASES-schema table (alias_norm, entity_id,
    entity_type, prior) that plugs straight into ``link_exact`` /
    ``link_coherent``.  The canonical target url is the entity id;
    ``prior`` is the anchor-estimated P(entity | alias) — the alias's
    count for this target over its count across ALL targets, the
    standard link-dictionary prior (cf. the Wikipedia anchor
    dictionaries of Spitkovsky & Chang 2012 — public).

    Scale shape: one alias-keyed rollup (sum over targets) joined back
    on alias_norm — the same key the candidate table is already
    aggregated on; no new shuffle shape."""
    tot = (anchor_candidates.groupBy("alias_norm")
           .agg(F.sum("n").alias("_tot")))
    return (anchor_candidates.join(tot, on="alias_norm")
            .select("alias_norm",
                    F.col("dst_url").alias("entity_id"),
                    F.lit(entity_type).alias("entity_type"),
                    F.round(F.col("n") / F.col("_tot"), 6).alias("prior")))
