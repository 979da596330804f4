"""ANN: brute-force cosine top-k correctness vs numpy; IVF recall sanity."""

import numpy as np

from ner_extractor_spark.operators.similarity import cosine_topk, ivf_topk


def _data(spark, n=80, d=16, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype(float)
    corpus = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>")
    qids = [3, 17, 42]
    queries = spark.createDataFrame(
        [(q, vecs[q].tolist()) for q in qids],
        "qid long, embedding array<double>")
    return corpus, queries, vecs, qids


def test_cosine_topk_matches_numpy(spark):
    corpus, queries, vecs, qids = _data(spark)
    k = 5
    got = cosine_topk(corpus, queries, k=k).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        sims = vecs @ vecs[q] / (norms * norms[q])
        expect = list(np.lexsort((np.arange(len(sims)), -np.round(sims, 6)))[:k])
        got_ids = [v for _, v in sorted(by_q[q])]
        assert got_ids == [int(x) for x in expect], q
        assert got_ids[0] == q   # self is the top hit


def test_ivf_assignment_plan_has_no_window(spark):
    """Corpus-to-cell assignment must be a max_by aggregation, not a
    sort-window over corpus×n_cells rows (VERDICT r01 #3)."""
    from ner_extractor_spark.operators.similarity import (ivf_assign,
                                                          ivf_centroids)
    corpus, _, vecs, _ = _data(spark)
    # materialized centroids isolate the assignment stage (ivf_centroids'
    # own row_number ranks a bounded n_cells-row side — that window is fine)
    cents = spark.createDataFrame(
        [(i + 1, vecs[i].tolist()) for i in range(8)],
        "cell int, centroid array<double>")
    assigned = ivf_assign(corpus, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # and the semantics still match the centroid-ranked path
    full = ivf_assign(corpus, ivf_centroids(corpus, 8))
    assert full.count() == corpus.count()


def test_ivf_topk_recall(spark):
    corpus, queries, vecs, qids = _data(spark)
    exact = cosine_topk(corpus, queries, k=5)
    approx = ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=4)
    e = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    a = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    # self-match must always survive; recall over 50% with 4/8 probes
    for q in qids:
        assert (q, q) in a
    assert len(a & e) / len(e) >= 0.5
