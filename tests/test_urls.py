"""URL canonicalization: fragment/case/port/slash/param normalization,
conservation of path+query case, idempotence."""

from pyspark.sql import functions as F

from ner_extractor_spark.functions.urls import canonical_url

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Ex.COM:80/A/B/?utm_source=x&b=2&a=1#frag",
     "http://www.ex.com/A/B?a=1&b=2"),
    ("https://Ex.org:443/path", "https://ex.org/path"),
    ("https://ex.org:8443/path", "https://ex.org:8443/path"),  # non-default kept
    ("http://ex.com:80", "http://ex.com"),                     # bare authority
    ("http://ex.com///", "http://ex.com"),                     # slash collapse
    ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),    # all params dropped
    ("http://ex.com/CaseKept/Q?Z=9&a=1", "http://ex.com/CaseKept/Q?Z=9&a=1"),
    ("ftp://Mixed.Host/File", "ftp://mixed.host/File"),        # scheme-generic
    ("no-scheme/path/", "no-scheme/path"),                     # schemeless
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)],
                               "i int, u string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)],
                               "i int, u string")
    once = df.select("i", canonical_url(F.col("u")).alias("c"))
    twice = once.select("i", canonical_url(F.col("c")).alias("c2"))
    rows = {r["i"]: r for r in once.join(twice, "i").collect()}
    for r in rows.values():
        assert r["c"] == r["c2"]
