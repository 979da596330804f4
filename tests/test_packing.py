"""Data mixing + sequence packing: quotas, determinism, bin budgets."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.packing import (mixture_sample,
                                                   pack_sequences)


def _docs(spark, n=240):
    rows = [(i, f"s{i % 3}", "tok " * (5 + i % 40)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _expected_mixture(n, weights, n_buckets=16, seed=42):
    """Python replica of mixture_sample's (source, bucket) quota streams
    over the _docs corpus — the determinism ground truth."""
    import hashlib
    import math
    from collections import defaultdict

    streams = defaultdict(list)
    for i in range(n):
        src = f"s{i % 3}"
        if src not in weights:
            continue
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        streams[(src, int(h[:4], 16) % n_buckets)].append((h, i))
    keep = set()
    for (src, _), rows in streams.items():
        rows.sort()
        quota = math.floor(weights[src] * len(rows))
        keep.update(i for _, i in rows[:quota])
    return keep


def test_mixture_quotas_and_determinism(spark):
    d = _docs(spark)                     # 80 docs per source s0/s1/s2
    weights = {"s0": 0.5, "s1": 0.25}
    out = mixture_sample(d, weights, group="source")
    got = {r["doc_id"] for r in out.collect()}
    assert got == _expected_mixture(240, weights)  # exact replica match
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # per-bucket floors undershoot the single-stream floor(w*n_g) by at
    # most n_buckets-1 rows; s2 absent from weights -> dropped entirely
    assert 40 - 15 <= by_src["s0"] <= 40
    assert 20 - 15 <= by_src["s1"] <= 20
    assert "s2" not in by_src
    # partition-layout invariance
    again = mixture_sample(d.repartition(13), weights, group="source")
    assert got == {r["doc_id"] for r in again.collect()}


def test_mixture_no_per_source_window(spark):
    """Scale pin (VERDICT r02 #2): no window in the plan may partition on
    the source column alone — a handful of sources at 100 TB would each
    funnel through a single reducer.  Every window spec must include the
    md5 bucket."""
    d = _docs(spark)
    plan = mixture_sample(d, {"s0": 0.5}, group="source") \
        ._jdf.queryExecution().optimizedPlan().toString()
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, plan
    for ln in specs:
        assert "_b#" in ln.split("windowspecdefinition", 1)[1], ln


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
