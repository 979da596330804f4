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


def test_classifier_zero_term_doc_gets_a_row(spark):
    """ADVICE r04 (medium): classify_docs must be TOTAL — a
    whitespace-only document scores the bias with n_terms = 0 instead
    of silently vanishing from downstream verdict joins."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "")],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in
           classify_docs(docs, synthetic_weights(spark),
                         bias=0.25).collect()}
    assert set(got) == {1, 2, 3}
    for d in (2, 3):
        assert got[d]["n_terms"] == 0
        assert got[d]["score"] == 0.25
        assert got[d]["prob"] == round(1 / (1 + math.exp(-0.25)), 6)


def test_calibrated_threshold_is_prob_percentile(spark):
    """calibrate_classifier_threshold == numpy linear-interpolated
    percentile of the probability column, rounded to 6."""
    import numpy as np

    from ner_extractor_spark.operators.classifier import \
        calibrate_classifier_threshold

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta w{i % 7} x{i % 3}") for i in range(24)],
        "doc_id int, text string")
    scored = classify_docs(docs, synthetic_weights(spark))
    probs = [r["prob"] for r in scored.collect()]
    thr = calibrate_classifier_threshold(scored, keep_rate=0.8).first()
    want = round(float(np.percentile(probs, 20, method="linear")), 6)
    assert thr["cls_threshold"] == want


def test_classify_calibrated_matches_scalar_twin(spark):
    """The calibrated gate equals classify_docs with the same cut
    passed as a scalar threshold (the broadcast wiring changes
    nothing), and the keep fraction respects the keep-rate target."""
    from ner_extractor_spark.operators.classifier import \
        classify_docs_calibrated

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta w{i % 7} x{i % 3}") for i in range(24)],
        "doc_id int, text string")
    w = synthetic_weights(spark)
    cal = classify_docs_calibrated(docs, w, keep_rate=0.8)
    rows = cal.collect()
    thr = rows[0]["cls_threshold"]
    twin = {r["doc_id"]: r for r in
            classify_docs(docs, w, threshold=thr).collect()}
    for r in rows:
        t = twin[r["doc_id"]]
        assert (r["n_terms"], r["score"], r["prob"], r["keep"]) == \
            (t["n_terms"], t["score"], t["prob"], t["keep"])
    n_keep = sum(r["keep"] for r in rows)
    # >= because ties at the cut keep extra docs; 0.8*24 ~ 19
    assert n_keep >= int(0.8 * len(rows))
