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
    # a slash ending a query VALUE is data, never stripped (ADVICE r03)
    ("http://ex.com/p?a=b/", "http://ex.com/p?a=b/"),
    ("http://ex.com/p/?a=b/", "http://ex.com/p?a=b/"),         # path slash still goes
    # '/?' INSIDE a param value is data too (only the FIRST '?' is the
    # query delimiter — r04 restructure)
    ("http://ex.com/p/?a=b/?c", "http://ex.com/p?a=b/?c"),
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


def test_canonical_url_random_idempotence_property(spark):
    """Property over randomly assembled URL-ish strings: one batch
    canonicalization is a fixed point (no oscillation between rules),
    and output never contains a fragment or a default port."""
    import random
    rng = random.Random(11)
    schemes = ["http://", "HTTPS://", "ftp://", ""]
    hosts = ["Ex.COM", "ex.com:80", "ex.com:443", "a.B.c:8080"]
    paths = ["", "/", "/A/b", "/A/b/", "//", "/x%20y"]
    queries = ["", "?a=1", "?utm_x=9", "?b=2&a=1&utm_s=0", "?Z=&a"]
    frags = ["", "#f", "#a#b"]
    raws = ["".join([rng.choice(schemes), rng.choice(hosts),
                     rng.choice(paths), rng.choice(queries),
                     rng.choice(frags)]) for _ in range(200)]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(raws)],
                               "i int, u string")
    once = {r["i"]: r["c"] for r in
            df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    df2 = spark.createDataFrame([(i, c) for i, c in once.items()],
                                "i int, u string")
    twice = {r["i"]: r["c"] for r in
             df2.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    for i, c in once.items():
        assert twice[i] == c, (raws[i], c, twice[i])
        assert "#" not in c
        # default ports only default for THEIR scheme (https://h:80 is a
        # real non-default port and must survive)
        if c.startswith("http://"):
            assert ":80/" not in c and not c.endswith(":80"), c
        if c.startswith("https://"):
            assert ":443/" not in c and not c.endswith(":443"), c
        assert "utm_" not in c
