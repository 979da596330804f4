"""URL/domain filtering: suffix-chain subdomain blocking, term
blocking, reason precedence, broadcast plan."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.webfilter import (filter_urls,
                                                     host_suffixes,
                                                     url_host)


def test_url_host_and_suffixes(spark):
    rows = [("https://A.B.Example.COM:8443/p?q=1",),
            ("http://user:pw@host.test/x",),
            ("no-scheme/path",)]
    df = spark.createDataFrame(rows, "u string")
    got = df.select(
        url_host(F.col("u")).alias("h"),
        host_suffixes(url_host(F.col("u"))).alias("s")).collect()
    assert got[0]["h"] == "a.b.example.com"
    assert got[0]["s"] == ["a.b.example.com", "b.example.com",
                           "example.com", "com"]
    assert got[1]["h"] == "host.test"
    assert got[2]["h"] == ""


def test_filter_urls_semantics(spark):
    pages = spark.createDataFrame([
        ("https://news.example.org/a",),         # ok
        ("https://ads.tracker.test/b",),         # subdomain of blocked
        ("https://tracker.test/c",),             # exact blocked
        ("https://clean.test/casino-review",),   # term hit
        ("https://ads.tracker.test/casino",),    # domain wins over term
        ("https://nottracker.test/d",),          # NOT a dot-suffix match
    ], "url string")
    blocked = spark.createDataFrame(
        [("tracker.test",), ("spam.example",)], "domain string")
    got = {r["url"]: (r["keep"], r["reason"])
           for r in filter_urls(pages, blocked, ["casino"]).collect()}
    assert got["https://news.example.org/a"] == (True, "ok")
    assert got["https://ads.tracker.test/b"] == (False, "blocked_domain")
    assert got["https://tracker.test/c"] == (False, "blocked_domain")
    assert got["https://clean.test/casino-review"] == \
        (False, "blocked_term")
    assert got["https://ads.tracker.test/casino"] == \
        (False, "blocked_domain")
    assert got["https://nottracker.test/d"] == (True, "ok")


def test_filter_urls_blocklist_join_is_broadcast(spark):
    pages = spark.createDataFrame([("https://a.test/x",)], "url string")
    blocked = spark.createDataFrame([("b.test",)], "domain string")
    plan = filter_urls(pages, blocked, [])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_filter_urls_empty_terms_and_empty_blocklist(spark):
    pages = spark.createDataFrame([("https://a.test/x",)], "url string")
    blocked = spark.createDataFrame([], "domain string")
    got = filter_urls(pages, blocked, []).collect()
    assert got[0]["keep"] is True and got[0]["reason"] == "ok"


def test_filter_urls_custom_url_column(spark):
    """Regression: a non-default url column name must work (the
    expressions key on the aliased column, r04 self-review)."""
    pages = spark.createDataFrame(
        [("https://ads.tracker.test/x",), ("https://ok.test/casino",)],
        "page_url string")
    blocked = spark.createDataFrame([("tracker.test",)], "domain string")
    got = {r["url"]: r["reason"] for r in filter_urls(
        pages, blocked, ["casino"], url_col="page_url").collect()}
    assert got["https://ads.tracker.test/x"] == "blocked_domain"
    assert got["https://ok.test/casino"] == "blocked_term"


def test_filter_urls_literal_mode_zero_shuffle(spark):
    """A list blocklist must produce the same verdicts as the DataFrame
    mode with NO Exchange anywhere (pure map)."""
    urls = [("https://news.example.org/a",),
            ("https://ads.tracker.test/b",),
            ("https://clean.test/casino-review",)]
    pages = spark.createDataFrame(urls, "url string")
    bl_df = spark.createDataFrame([("tracker.test",)], "domain string")
    via_df = sorted(map(tuple,
                        filter_urls(pages, bl_df, ["casino"]).collect()))
    lit_out = filter_urls(pages, ["Tracker.TEST"], ["casino"])
    assert sorted(map(tuple, lit_out.collect())) == via_df
    plan = lit_out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_robots_filter_semantics(spark):
    from ner_extractor_spark.operators.webfilter import (robots_filter,
                                                         url_path)
    rules = [
        ("a.test", "/", False),
        ("a.test", "/public", True),
        ("b.test", "/x", True),
        ("b.test", "/x", False),       # equal length -> allow wins
        ("c.test", "/priv", False),
    ]
    urls = spark.createDataFrame(
        [("https://a.test/secret",),
         ("https://a.test/public/page",),
         ("https://b.test/x/1",),
         ("https://c.test/open",),
         ("https://c.test/priv/1?q=2#f",),
         ("https://user:pw@c.test:8080/priv/2",),
         ("https://nohost-rules.test/anything",)], "url string")
    got = {r["url"]: r for r in robots_filter(urls, rules).collect()}
    assert not got["https://a.test/secret"]["allowed"]
    assert got["https://a.test/secret"]["matched_prefix"] == "/"
    # longer allow carves back under disallow-all
    assert got["https://a.test/public/page"]["allowed"]
    assert got["https://a.test/public/page"]["matched_prefix"] == "/public"
    assert got["https://b.test/x/1"]["allowed"]          # tie -> allow
    assert got["https://c.test/open"]["allowed"]          # no match
    assert got["https://c.test/open"]["matched_prefix"] is None
    # query/fragment stripped from path; userinfo/port from host
    assert not got["https://c.test/priv/1?q=2#f"]["allowed"]
    assert not got["https://user:pw@c.test:8080/priv/2"]["allowed"]
    assert got["https://user:pw@c.test:8080/priv/2"]["host"] == "c.test"
    assert got["https://nohost-rules.test/anything"]["allowed"]


def test_url_path_defaults(spark):
    from pyspark.sql import functions as F
    from ner_extractor_spark.operators.webfilter import url_path
    df = spark.createDataFrame(
        [("https://a.test",), ("https://a.test/",),
         ("https://a.test?q=1",), ("https://a.test/p/q",)], "url string")
    got = [r["p"] for r in
           df.select(url_path(F.col("url")).alias("p")).collect()]
    assert got == ["/", "/", "/", "/p/q"]
