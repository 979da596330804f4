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
