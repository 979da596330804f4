"""Hyperlink extraction + domain link graph (operators/weblinks.py)."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.weblinks import (
    domain_link_graph, extract_links, page_domain)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary")


def test_extract_links_preserves_multiplicity(spark):
    pages = _pages(spark, [
        ("https://a.test/1",
         '<a href="https://b.test/x"></a><a href="https://b.test/x"></a>'),
    ])
    got = extract_links(pages).collect()
    assert [r["href"] for r in got] == ["https://b.test/x"] * 2


def test_domain_link_graph_canonicalizes_and_drops_relative(spark):
    pages = _pages(spark, [
        # mixed-case authority + default port + utm noise -> b.test
        ("https://a.test/1", '<a href="HTTPS://B.Test:443/x?utm_s=1"></a>'),
        # relative link: no authority after canonicalization -> dropped
        ("https://a.test/2", '<a href="/local/path"></a>'),
        # second edge a->b (different page, same domains)
        ("https://a.test/3", '<a href="https://b.test/y"></a>'),
        ("https://c.test/1", '<a href="https://b.test/z"></a>'),
    ])
    got = {(r["src_domain"], r["dst_domain"]): r["n"]
           for r in domain_link_graph(extract_links(pages)).collect()}
    assert got == {("a.test", "b.test"): 2, ("c.test", "b.test"): 1}


def test_page_domain_parses_authority_only(spark):
    df = spark.createDataFrame(
        [("https://h.test/p?q=1#f",), ("nonsense",)], "u string")
    got = [r["d"] for r in
           df.select(page_domain(F.col("u")).alias("d")).collect()]
    assert got == ["h.test", ""]


def test_extract_anchor_texts_simple_subset(spark):
    from ner_extractor_spark.operators.weblinks import extract_anchor_texts
    html = (
        '<html><body>'
        '<a href="https://a.test/1">One</a>'
        '<a class="x" href="https://a.test/2" rel="nofollow"> Two  words </a>'
        "<a href='https://sq.test/no'>single-quoted skipped</a>"
        '<a href="https://nested.test/x"><b>nested skipped</b></a>'
        '<a href="https://a.test/1">One</a>'      # duplicate preserved
        '</body></html>')
    pages = spark.createDataFrame([("https://src.test/p", html)],
                                  "url string, h string") \
        .select("url", F.encode("h", "UTF-8").alias("html"))
    got = [(r["href"], r["anchor"]) for r in
           extract_anchor_texts(pages).collect()]
    assert got == [("https://a.test/1", "One"),
                   ("https://a.test/2", " Two  words "),
                   ("https://a.test/1", "One")]


def test_anchor_alias_candidates_topk_and_link_composition(spark):
    from ner_extractor_spark.operators.link import link_exact
    from ner_extractor_spark.operators.weblinks import \
        anchor_alias_candidates
    from ner_extractor_spark.schemas import ALIASES
    anchors = spark.createDataFrame(
        [("s", "https://e.test/acme?utm_source=x", "ACME Corp"),
         ("s", "https://e.test/acme", "ACME  Corp"),   # same after norm
         ("s", "https://e.test/acme", "Acme"),
         ("s", "https://e.test/acme", "the firm"),
         ("s", "https://e.test/acme", "Acme"),
         ("s", "https://e.test/other", "   "),         # blank dropped
         ("s", "https://e.test/other", "Other")],
        "src_url string, href string, anchor string")
    top = anchor_alias_candidates(anchors, top_k=2)
    rows = [(r["dst_url"], r["alias_norm"], r["n"], r["rank"])
            for r in sorted(top.collect(),
                            key=lambda r: (r["dst_url"], r["rank"]))]
    # utm param canonicalizes away, so all acme anchors share a target;
    # 'acme corp' ties 'acme' at n=2 -> lexicographic order breaks it
    assert rows == [("https://e.test/acme", "acme", 2, 1),
                    ("https://e.test/acme", "acme corp", 2, 2),
                    ("https://e.test/other", "other", 1, 1)]
    # the mined table IS a link dimension: wire it into link_exact
    mined = top.filter(F.col("rank") == 1).select(
        "alias_norm", F.col("dst_url").alias("entity_id"),
        F.lit("ORG").alias("entity_type"), F.lit(1.0).alias("prior"))
    aliases = spark.createDataFrame(mined.collect(), schema=ALIASES)
    mentions = spark.createDataFrame(
        [("u", 0, 0, 1, "ORG", "Acme"), ("u", 0, 2, 3, "ORG", "Zzz")],
        "url string, sent_id int, start int, end int, label string, "
        "surface string")
    linked = {r["surface"]: r["entity_id"]
              for r in link_exact(mentions, aliases).collect()}
    assert linked.get("Acme") == "https://e.test/acme"


def test_alias_dim_from_anchors_priors_and_linking(spark):
    from ner_extractor_spark.operators.link import link_exact
    from ner_extractor_spark.operators.weblinks import alias_dim_from_anchors

    cand = spark.createDataFrame(
        [("https://e.test/a", "acme", 3, 1),
         ("https://e.test/b", "acme", 1, 1),     # ambiguous alias
         ("https://e.test/b", "bolt co", 2, 2)],
        "dst_url string, alias_norm string, n long, rank int")
    dim = alias_dim_from_anchors(cand)
    got = {(r["alias_norm"], r["entity_id"]): r["prior"]
           for r in dim.collect()}
    assert got[("acme", "https://e.test/a")] == 0.75
    assert got[("acme", "https://e.test/b")] == 0.25
    assert got[("bolt co", "https://e.test/b")] == 1.0

    # plugs straight into link_exact: max prior wins the ambiguity
    mentions = spark.createDataFrame(
        [("u", 0, 0, 0, "Acme", "ORG")],
        "url string, sent_id int, start int, end int, surface string, "
        "label string")
    linked = link_exact(mentions, dim).collect()
    assert len(linked) == 1
    assert linked[0]["entity_id"] == "https://e.test/a"
