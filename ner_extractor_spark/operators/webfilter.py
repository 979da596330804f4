"""URL/domain filtering (RefinedWeb/C4-style corpus hygiene): drop
pages from blocked domains (including every subdomain) and pages whose
url contains a blocked term.

Scale shapes:

  * domain blocking is a BROADCAST LEFT JOIN of the page's host-suffix
    chain against the blocklist: ``a.b.example.com`` explodes into
    ``[a.b.example.com, b.example.com, example.com, com]`` and any
    exact match on a suffix blocks the page — so subdomain coverage
    costs one bounded explode (hosts have ~2-6 labels), never a LIKE
    scan over a multi-million-row blocklist;
  * term blocking is a pure-JVM ``exists`` HOF over a literal term
    array (term lists are small curated sets; a huge term list would
    move to the same suffix-join pattern on tokenized url parts).

Deterministic and engine-portable (regexp + HOFs; the DuckDB oracle
replays the identical suffix chain), first-violation reason codes in a
fixed order: blocked_domain, then blocked_term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# userinfo may contain ':' (user:pw@); the host may not contain '@'
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#@]*@)?([^/:?#@]+)"


def url_host(col):
    """Lowercased host of a URL ('' when there is no scheme://host);
    userinfo@ and :port are excluded."""
    return F.lower(F.regexp_replace(
        F.regexp_extract(col, _HOST_RE, 2), r":\d+$", ""))


def host_suffixes(host_col):
    """The dot-suffix chain of a host: a.b.c -> [a.b.c, b.c, c]."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."))


def filter_urls(pages: DataFrame, blocked_domains,
                blocked_terms: list[str],
                url_col: str = "url") -> DataFrame:
    """(url, host, keep, reason) per page.

    ``blocked_domains``: exact hosts or registrable suffixes
    ('example.com' blocks every subdomain), as either

      * a ``list``/``tuple`` — curated lists ride as an array literal
        and the whole filter is a ZERO-SHUFFLE map
        (``arrays_overlap`` over the suffix chain), or
      * a one-column ``domain`` DataFrame — the multi-million-row
        blocklist case: suffix-chain × broadcast blocklist semi join,
        then a join-back keyed on url to re-attach the flag (the one
        shuffle of this mode; pass a list when the blocklist fits a
        literal).

    ``blocked_terms``: lowercase substrings matched against the whole
    lowercased url (path+query included).
    """
    hosts = pages.select(F.col(url_col).alias("url"),
                         url_host(F.col(url_col)).alias("host"))
    # downstream expressions key on the ALIASED column — referencing
    # url_col here would break for any non-default column name
    u = F.col("url")
    if isinstance(blocked_domains, (list, tuple)):
        if blocked_domains:
            dom_arr = F.array(*[F.lit(d.lower()) for d in blocked_domains])
            dom_hit = F.arrays_overlap(host_suffixes(F.col("host")),
                                       dom_arr)
        else:
            dom_hit = F.lit(False)
        flagged = hosts.withColumn("_dom_block", dom_hit)
    else:
        sfx = hosts.select(
            "url", F.explode(host_suffixes(F.col("host"))).alias("domain"))
        blocked = (sfx.join(F.broadcast(
            blocked_domains.select(F.lower("domain").alias("domain"))
            .distinct()), on="domain", how="inner")
            .select("url").distinct()
            .withColumn("_dom_block", F.lit(True)))
        flagged = hosts.join(blocked, on="url", how="left")
    term_arr = F.array(*[F.lit(t.lower()) for t in blocked_terms]) \
        if blocked_terms else F.array().cast("array<string>")
    term_hit = F.exists(term_arr, lambda t: F.contains(F.lower(u), t))
    reason = (
        F.when(F.coalesce(F.col("_dom_block"), F.lit(False)),
               F.lit("blocked_domain"))
        .when(term_hit, F.lit("blocked_term"))
        .otherwise(F.lit("ok")))
    return flagged.select("url", "host", (reason == "ok").alias("keep"),
                          reason.alias("reason"))


# path = first '/' after the authority, up to '?' or '#'
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(/[^?#]*)?"


def url_path(col):
    """URL path without query/fragment; '/' when the URL has none
    (robots matching operates on the path, RFC 9309 §2.2.2)."""
    p = F.regexp_extract(col, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(urls: DataFrame, rules,
                  url_col: str = "url") -> DataFrame:
    """Crawl-politeness gating: (url, host, path, allowed,
    matched_prefix) per DISTINCT url under an aggregated robots rule
    table — RFC 9309 semantics on the path-prefix subset: the
    LONGEST matching rule for the url's host wins; on a length tie
    allow beats disallow; no matching rule means allowed (callers
    needing wildcard rules expand '*' upstream into prefix families).

    ``rules``: (host, prefix, allow) rows — a DataFrame, or a Python
    list of tuples (the curated-literal case).  Rule tables are the
    per-host digest of fetched robots.txt files — millions of rows at
    crawl scale but trivially broadcastable (one row per directive),
    so the whole gate is a BROADCAST left join + one url-keyed
    aggregation; no shuffle touches the corpus beyond the url key."""
    spark = urls.sparkSession
    if not isinstance(rules, DataFrame):
        rules = spark.createDataFrame(
            list(rules), "host string, prefix string, allow boolean")
    r = F.broadcast(rules.select(F.col("host").alias("_rh"),
                                 "prefix", "allow"))
    u = (urls.select(F.col(url_col).alias("url")).distinct()
         .withColumn("host", url_host(F.col("url")))
         .withColumn("path", url_path(F.col("url"))))
    j = u.join(r, F.col("host") == F.col("_rh"), "left")
    cand = F.when(
        F.col("_rh").isNotNull()
        & F.col("path").startswith(F.col("prefix")),
        F.struct(F.length("prefix").alias("a"),
                 F.col("allow").cast("int").alias("b"),
                 F.col("prefix").alias("prefix"),
                 F.col("allow").alias("allow")))
    return (j.groupBy("url", "host", "path")
            .agg(F.max(cand).alias("win"))
            .select("url", "host", "path",
                    F.coalesce(F.col("win.allow"), F.lit(True))
                    .alias("allowed"),
                    F.col("win.prefix").alias("matched_prefix")))
