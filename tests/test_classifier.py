"""Hashed linear quality classifier: deterministic weights, scoring
math vs a driver-side replica, OOV behavior, broadcast plan."""

import hashlib
import math

from ner_extractor_spark.operators.classifier import (N_BUCKETS,
                                                      classify_docs,
                                                      synthetic_weights)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "Spark  builds   DataFrames"),      # multi-space normalization
    (3, "zzz"),
]


def _fold8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _w(bucket: int) -> float:
    return (_fold8(f"qw|{bucket}") % 2048 - 1024) / 1024.0


def _replica(text: str, bias=0.0):
    terms = " ".join(text.lower().split()).split(" ")
    ws = [_w(_fold8(t) % N_BUCKETS) for t in terms]
    score = round(sum(ws) / len(ws) + bias, 6)
    prob = round(1.0 / (1.0 + math.exp(-score)), 6)
    return len(terms), score, prob


def test_classifier_matches_driver_replica(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    w = synthetic_weights(spark)
    got = {r["doc_id"]: r for r in classify_docs(docs, w).collect()}
    for doc_id, text in DOCS:
        n, score, prob = _replica(text)
        r = got[doc_id]
        assert (r["n_terms"], r["score"], r["prob"]) == (n, score, prob), \
            (doc_id, r)
        assert r["keep"] == (prob >= 0.5)


def test_classifier_bias_shifts_gate(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    w = synthetic_weights(spark)
    hi = classify_docs(docs, w, bias=10.0)
    assert all(r["keep"] for r in hi.collect())
    lo = classify_docs(docs, w, bias=-10.0)
    assert not any(r["keep"] for r in lo.collect())


def test_classifier_oov_scores_bias(spark):
    """A weights table missing every probed bucket: score == bias
    exactly (missing features are 0, never NaN)."""
    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id int, text string")
    empty_w = spark.createDataFrame([], "bucket int, w double")
    r = classify_docs(docs, empty_w, bias=0.25).first()
    assert r["score"] == 0.25 and r["n_terms"] == 2


def test_classifier_weight_join_is_broadcast(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = classify_docs(docs, synthetic_weights(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
