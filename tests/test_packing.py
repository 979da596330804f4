"""Data mixing + sequence packing: quotas, determinism, bin budgets."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.packing import (mixture_sample,
                                                   pack_sequences)


def _docs(spark, n=240):
    rows = [(i, f"s{i % 3}", "tok " * (5 + i % 40)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_quotas_and_determinism(spark):
    d = _docs(spark)                     # 80 docs per source s0/s1/s2
    out = mixture_sample(d, {"s0": 0.5, "s1": 0.25}, group="source")
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src == {"s0": 40, "s1": 20}          # s2 absent -> dropped
    # partition-layout invariance
    again = mixture_sample(d.repartition(13), {"s0": 0.5, "s1": 0.25},
                           group="source")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_pack_sequences_budget_and_coverage(spark):
    d = _docs(spark)
    budget = 200
    p = pack_sequences(d, budget=budget, n_buckets=8)
    assert p.count() == d.count()                  # every doc assigned
    stats = (p.groupBy("bucket", "bin")
             .agg(F.sum("n_tokens").alias("s"),
                  F.max("n_tokens").alias("mx")).collect())
    gmx = p.agg(F.max("n_tokens")).first()[0]
    max_bin = {}
    for r in stats:
        max_bin[r["bucket"]] = max(max_bin.get(r["bucket"], -1), r["bin"])
    for r in stats:
        # quantized-packing bound: a bin's mass deviates from the budget
        # by less than one document on EITHER side (a straddler at the
        # previous boundary eats into this window; one at this boundary
        # overflows it)
        if r["bin"] < max_bin[r["bucket"]]:
            assert r["s"] > budget - gmx, r
        assert r["s"] < budget + gmx, r
    # deterministic under repartition
    a = sorted(map(tuple, p.collect()))
    b = sorted(map(tuple, pack_sequences(d.repartition(7), budget=budget,
                                         n_buckets=8).collect()))
    assert a == b
