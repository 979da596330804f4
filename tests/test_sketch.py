"""Count-min sketch: overestimate guarantee, exactness at low load,
mergeability, partition invariance."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.sketch import build_cms, cms_estimate


def _tokens(spark, n=4000):
    # zipf-ish: token t{k} appears ~n/(k+1) times
    rows = []
    k = 0
    while len(rows) < n:
        rows.extend([(f"t{k}",)] * max(1, n // (4 * (k + 1))))
        k += 1
    return spark.createDataFrame(rows[:n], "token string")


def test_cms_upper_bound_and_low_load_exactness(spark):
    toks = _tokens(spark)
    cms = build_cms(toks)
    true = {r["token"]: r["n"] for r in
            toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    terms = spark.createDataFrame(
        [(t,) for t in list(true)[:20]] + [("never-seen",)], "term string")
    est = {r["term"]: r["est"] for r in cms_estimate(cms, terms).collect()}
    for t, e in est.items():
        assert e >= true.get(t, 0), (t, e)     # CMS never underestimates
    # distinct tokens << width: collisions are rare enough that at least
    # the heavy hitters estimate exactly
    heavy = max(true, key=true.get)
    assert est[heavy] == true[heavy]
    assert est["never-seen"] <= max(true.values())


def test_cms_merge_is_cellwise_sum(spark):
    a, b = _tokens(spark, 1500), _tokens(spark, 2500)
    merged = (build_cms(a).unionByName(build_cms(b))
              .groupBy("row", "cell").agg(F.sum("n").alias("n")))
    whole = build_cms(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_cms_partition_invariance(spark):
    toks = _tokens(spark)
    x = sorted(map(tuple, build_cms(toks).collect()))
    y = sorted(map(tuple, build_cms(toks.repartition(17)).collect()))
    assert x == y


def test_bloom_no_false_negatives_and_merge(spark):
    from ner_extractor_spark.operators.sketch import (bloom_contains,
                                                      build_bloom)
    toks = _tokens(spark)
    bloom = build_bloom(toks)
    present = [r["token"] for r in toks.distinct().limit(30).collect()]
    terms = spark.createDataFrame(
        [(t,) for t in present] + [("never-seen-xyzzy",)], "term string")
    got = {r["term"]: r["maybe_present"]
           for r in bloom_contains(bloom, terms).collect()}
    assert all(got[t] for t in present)        # NEVER a false negative
    # bloom is sparse: set-bit count bounded by k * distinct tokens
    n_distinct = toks.distinct().count()
    assert bloom.count() <= min(4 * n_distinct, 16384)
    # mergeability: union+distinct of two halves == whole
    a, b = _tokens(spark, 1500), _tokens(spark, 2500)
    merged = build_bloom(a).unionByName(build_bloom(b)).distinct()
    whole = build_bloom(a.unionByName(b))
    assert sorted(r["bit"] for r in merged.collect()) == \
        sorted(r["bit"] for r in whole.collect())


def test_bloom_duplicate_probe_terms_still_no_false_negative(spark):
    """ADVICE r03 regression: a present term DUPLICATED in the probe set
    must still report maybe_present (probes fan out from the deduped
    term set, so multiplicity can't inflate n_set past k)."""
    from ner_extractor_spark.operators.sketch import (bloom_contains,
                                                      build_bloom)
    toks = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "token string")
    bloom = build_bloom(toks)
    terms = spark.createDataFrame(
        [("alpha",), ("alpha",), ("alpha",), ("beta",), ("absent-q",)],
        "term string")
    out = bloom_contains(bloom, terms)
    got = {r["term"]: r["maybe_present"] for r in out.collect()}
    assert got["alpha"] is True and got["beta"] is True
    # deduped output: one row per distinct term
    assert out.count() == 3


def test_cms_mismatched_probe_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    toks = _tokens(spark)
    cms = build_cms(toks, width=1024)
    terms = spark.createDataFrame([("t0",)], "term string")
    # probing with a smaller width than the build: the sketch holds cells
    # the probe could never address -> runtime raise, never a silent
    # under-estimate
    with pytest.raises((SparkRuntimeException, Py4JJavaError),
                       match="depth/width mismatch"):
        cms_estimate(cms, terms, width=256).collect()
    # non-fold width rejected up front, same as build_cms
    with pytest.raises(ValueError):
        cms_estimate(cms, terms, width=1000)


# -- HyperLogLog ------------------------------------------------------------

def _ref_hll(tokens, b=6):
    """Sequential replica of build_hll's register derivation."""
    import hashlib
    m = 1 << b
    regs = {}
    for t in tokens:
        h = hashlib.md5(t.encode()).hexdigest()
        reg = int(h[:4], 16) % m
        tail = h[4:20]
        z = len(tail) - len(tail.lstrip("0"))
        if z >= 16:
            rho = 65
        else:
            v = int(tail[z], 16)
            lz = 0 if v >= 8 else (1 if v >= 4 else (2 if v >= 2 else 3))
            rho = z * 4 + lz + 1
        rho = min(rho, 40)
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_sequential_replica(spark):
    from ner_extractor_spark.operators.sketch import build_hll
    toks = [f"tok{i}" for i in range(200)] + ["tok0", "tok1"]  # dups
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {r["reg"]: r["max_rho"] for r in build_hll(df).collect()}
    assert got == _ref_hll(toks)


def test_hll_is_multiset_invariant(spark):
    from ner_extractor_spark.operators.sketch import build_hll
    once = spark.createDataFrame([("a",), ("b",)], "token string")
    thrice = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("a",)], "token string")
    assert sorted(map(tuple, build_hll(once).collect())) == \
        sorted(map(tuple, build_hll(thrice).collect()))


def test_hll_estimate_within_expected_error(spark):
    from ner_extractor_spark.operators.sketch import build_hll, hll_estimate
    n = 500
    df = spark.createDataFrame(
        [(f"item-{i}",) for i in range(n)], "token string")
    est = hll_estimate(build_hll(df))
    # m=64 -> standard error ~1.04/sqrt(64) = 13%; allow ~2.7 sigma
    assert abs(est - n) / n < 0.35


def test_hll_merge_is_register_max(spark):
    from ner_extractor_spark.operators.sketch import build_hll
    from pyspark.sql import functions as F
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)],
                              "token string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)],
                              "token string")
    merged = (build_hll(a).unionByName(build_hll(b))
              .groupBy("reg").agg(F.max("max_rho").alias("max_rho")))
    direct = build_hll(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
