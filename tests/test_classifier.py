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


def _py_perceptron(feats, labels, n_buckets=64, n_rounds=3, lr_den=1024):
    """Driver-side replica: feats = {doc: {bucket: cnt}} incl bias -1."""
    w = {b: 0.0 for b in range(-1, n_buckets)}
    for _ in range(n_rounds):
        grad = {b: 0 for b in w}
        for doc, f in feats.items():
            margin = sum(c * w[b] for b, c in f.items())
            pred = margin >= 0
            if pred != (labels[doc] == 1):
                s = 1 if labels[doc] == 1 else -1
                for b, c in f.items():
                    grad[b] += s * c
        for b in w:
            w[b] += grad[b] / lr_den
    return w


def test_train_perceptron_matches_python_replica(spark):
    """The distributed fixed-round batch perceptron is bit-identical to
    a sequential driver-side replica (everything is dyadic-exact, so
    distribution order cannot move a single bit)."""
    import hashlib

    from ner_extractor_spark.operators.classifier import train_perceptron

    rows = [(1, "the quick brown fox jumps over the lazy dog", 1),
            (2, "zz zz zz zz zz", 0),
            (3, "a storm hit the coast and traders met", 1),
            (4, "qq qq ww ww ee ee", 0),
            (5, "the market rallied for nine straight days", 1)]
    d = spark.createDataFrame([(i, t) for i, t, _ in rows],
                              "doc_id int, text string")
    lab = spark.createDataFrame([(i, y) for i, _, y in rows],
                                "doc_id int, label int")
    got = {r["bucket"]: r["w"]
           for r in train_perceptron(d, lab, n_buckets=64,
                                     n_rounds=3).collect()}

    def bucket(term):
        h = hashlib.md5(term.encode()).hexdigest()
        return int(h[:8], 16) % 64

    feats = {}
    for i, t, _ in rows:
        f = {-1: 1}
        for w_ in t.lower().split():
            b = bucket(w_)
            f[b] = f.get(b, 0) + 1
        feats[i] = f
    want = _py_perceptron(feats, {i: y for i, _, y in rows})
    assert got == want
    assert any(v != 0.0 for v in got.values())


def test_perceptron_learns_separable_labels(spark):
    """On a linearly separable proxy task the learned gate beats the
    zero init: after enough rounds every doc is classified correctly
    by perceptron_scores (convergence theorem on separable data)."""
    from ner_extractor_spark.operators.classifier import (
        perceptron_scores, train_perceptron)

    pos = [(i, "the good clean sentence number %d" % i, 1)
           for i in range(1, 6)]
    neg = [(i, "xx yy zz junk junk junk", 0) for i in range(6, 11)]
    rows = pos + neg
    d = spark.createDataFrame([(i, t) for i, t, _ in rows],
                              "doc_id int, text string")
    lab = spark.createDataFrame([(i, y) for i, _, y in rows],
                                "doc_id int, label int")
    w = train_perceptron(d, lab, n_buckets=64, n_rounds=10)
    got = {r["doc_id"]: r["keep"]
           for r in perceptron_scores(d, w, n_buckets=64).collect()}
    assert all(got[i] for i, _, y in rows if y == 1)
    assert not any(got[i] for i, _, y in rows if y == 0)
