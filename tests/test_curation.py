"""End-to-end corpus curation (operators/curation.py): rule order and
consistency with the component operators it composes."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.curation import curate_corpus

DOCS = [
    # healthy: stopwords present, unique tokens, sane lengths
    (1, "the quick brown fox jumps over a lazy dog today"),
    (2, "a storm hit the coast and traders met in the city"),
    # exact duplicates of each other (pass quality): 4 keeps, 5 drops
    (4, "the market rallied for nine straight days in a row"),
    (5, "the market rallied for nine straight days in a row"),
    # near-duplicate of doc 1: shares most 3-gram shingles
    (6, "the quick brown fox jumps over a lazy dog tonight"),
    # too short: quality rule fires FIRST whatever else is true
    (7, "too short"),
    (8, "too short"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_quality_rule_outranks_exact_duplicate(spark):
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(_df(spark)).collect()}
    # docs 7/8 are identical AND too short: the quality reason wins
    assert got[7] == "too_short" and got[8] == "too_short"


def test_exact_duplicate_keeps_min_id(spark):
    # dup_threshold > 1 disables the (symmetric) n-gram rule so the
    # keep-one exact-dedup behavior shows through
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in curate_corpus(_df(spark),
                                  dup_threshold=1.01).collect()}
    assert got[4] == (True, "ok")
    assert got[5] == (False, "exact_duplicate")


def test_ngram_rule_is_symmetric_over_exact_copies(spark):
    # at a threshold <= 1 the keeper of an exact-dup group ALSO trips
    # the n-gram rule (its content is 100% duplicated) — the documented
    # Gopher semantic; the non-keeper is labeled by the earlier rule
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(_df(spark)).collect()}
    assert got[4] == "dup_ngrams"
    assert got[5] == "exact_duplicate"


def test_dup_ngram_rule_catches_near_duplicate(spark):
    # with a threshold under their shared-shingle fraction, the LATER
    # near-dup doc still passes quality and exact-dedup but trips the
    # n-gram rule; its source doc (1) trips it too — the rule is
    # symmetric by design (curation drops both, dedup_resolve picks
    # keepers for true duplicates)
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(_df(spark),
                                  dup_threshold=0.6).collect()}
    assert got[6] == "dup_ngrams" and got[1] == "dup_ngrams"


def test_lm_gate_uses_threshold(spark):
    from ner_extractor_spark.operators.lm import (trigram_logprob,
                                                  trigram_model)
    df = _df(spark)
    scores = {r["doc_id"]: r["lm_score"] for r in
              trigram_logprob(df, trigram_model(df)).collect()}
    # pick a threshold that splits the healthy docs deterministically
    cut = sorted(scores.values())[len(scores) // 2]
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(df, dup_threshold=2.0,
                                  lm_threshold=cut).collect()}
    for d, s in scores.items():
        if got[d] in ("ok", "lm_low_quality"):
            assert (got[d] == "lm_low_quality") == (s < cut)


def test_every_document_gets_exactly_one_row(spark):
    out = curate_corpus(_df(spark))
    assert out.count() == len(DOCS)
    assert out.select("doc_id").distinct().count() == len(DOCS)


def test_calibrate_thresholds_are_corpus_quantiles(spark):
    """VERDICT r03 #6: thresholds come from the corpus' own score
    distributions — exact interpolated percentile of lm scores (p05)
    and dup fractions (p95), cross-checked against a driver-side
    numpy replica of the same linear interpolation."""
    import numpy as np

    from ner_extractor_spark.operators.curation import calibrate_thresholds
    from ner_extractor_spark.operators.dedup import dup_ngram_fraction
    from ner_extractor_spark.operators.lm import (trigram_logprob,
                                                  trigram_model)
    d = _df(spark)
    row = calibrate_thresholds(d, id_col="doc_id").first()
    lm_scores = [r["lm_score"] for r in
                 trigram_logprob(d, trigram_model(d)).collect()]
    dups = [r["dup_fraction"] for r in dup_ngram_fraction(d).collect()]
    assert row["lm_threshold"] == round(
        float(np.percentile(lm_scores, 5, method="linear")), 6)
    assert row["dup_threshold"] == round(
        float(np.percentile(dups, 95, method="linear")), 6)


def test_curate_with_calibrated_thresholds_matches_scalars(spark):
    """Passing the calibrated 1-row table is identical to passing the
    same values as scalars (the broadcast wiring changes nothing)."""
    from ner_extractor_spark.operators.curation import (
        calibrate_thresholds, curate_corpus)
    d = _df(spark)
    thr = calibrate_thresholds(d, id_col="doc_id")
    row = thr.first()
    via_df = sorted(map(tuple, curate_corpus(d, thresholds=thr).collect()))
    via_scalar = sorted(map(tuple, curate_corpus(
        d, dup_threshold=row["dup_threshold"],
        lm_threshold=row["lm_threshold"]).collect()))
    assert via_df == via_scalar


def test_full_web_verdict_total_and_rule_order(spark):
    """operators/web_verdict.full_web_verdict: one row per input doc
    (including a whitespace-only doc — ADVICE r04's lost-row bug),
    url gates outrank content rules, frozen-threshold mode works."""
    from ner_extractor_spark.operators.classifier import synthetic_weights
    from ner_extractor_spark.operators.web_verdict import full_web_verdict

    rows = [
        (1, "https://ads.tracker.test/x",
         "the quick brown fox jumps over a lazy dog today"),
        (2, "https://ok.test/casino", "too short"),
        (3, "https://ok.test/a", "   "),    # whitespace-only: must keep a row
        (4, "https://ok.test/b",
         "a storm hit the coast and traders met in the city"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    got = {r["doc_id"]: r["reason"] for r in full_web_verdict(
        d, synthetic_weights(spark),
        blocked_domains=("tracker.test",), blocked_terms=("casino",),
        dup_threshold=2.0, lm_threshold=-100.0).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == "blocked_domain"
    assert got[2] == "blocked_term"
    assert got[3] == "too_short"           # not silently dropped


def test_calibrated_curation_matches_unshared_composition(spark):
    """VERDICT r04 #2: calibrated_curation (one shared, checkpointed
    score pass) returns exactly the rows of the naive
    curate(thresholds=calibrate(docs)) composition."""
    from ner_extractor_spark.operators.curation import (
        calibrate_thresholds, calibrated_curation)
    d = _df(spark)
    shared = sorted(map(tuple, calibrated_curation(d).collect()))
    naive = sorted(map(tuple, curate_corpus(
        d, thresholds=calibrate_thresholds(d)).collect()))
    assert shared == naive


def test_calibrated_curation_is_single_pass(spark):
    """The composed plan must not rebuild the trigram-model and
    shingle-df pipelines for calibration and verdict separately: with
    the shared checkpointed scores, the final plan contains strictly
    fewer aggregates (the corpus-scale score subtrees appear as
    materialized RDD scans, not as duplicated explode->agg chains)."""
    from ner_extractor_spark.operators.curation import (
        calibrate_thresholds, calibrated_curation)
    d = _df(spark)
    new_plan = calibrated_curation(d)._jdf.queryExecution() \
        .executedPlan().toString()
    old_plan = curate_corpus(d, thresholds=calibrate_thresholds(d)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert new_plan.count("Aggregate") < old_plan.count("Aggregate"), \
        (new_plan.count("Aggregate"), old_plan.count("Aggregate"))
    # the two checkpointed score tables surface as RDD scans
    assert new_plan.count("Scan ExistingRDD") >= 2, new_plan


def test_web_corpus_verdict_rule_order(spark):
    """Composition pin for the full web-pipeline verdict: url gates
    outrank content rules, which outrank the classifier gate."""
    from ner_extractor_spark.operators.classifier import synthetic_weights
    from ner_extractor_spark.operators.webfilter import (host_suffixes,
                                                         url_host)
    from pyspark.sql import functions as F

    rows = [
        (1, "https://ads.tracker.test/x",
         "the quick brown fox jumps over a lazy dog today"),
        (2, "https://ok.test/casino", "too short"),     # url gate wins
        (3, "https://ok.test/a", "too short"),          # quality rule
        (4, "https://ok.test/b",
         "a storm hit the coast and traders met in the city"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    dom = F.arrays_overlap(host_suffixes(url_host(F.col("url"))),
                           F.array(F.lit("tracker.test")))
    term = F.contains(F.lower(F.col("url")), F.lit("casino"))
    cur = curate_corpus(d).select(
        "doc_id", F.col("reason").alias("_cr"))
    from ner_extractor_spark.operators.classifier import classify_docs
    cls = classify_docs(d, synthetic_weights(spark), bias=10.0) \
        .select("doc_id", "prob")
    j = (d.select("doc_id", dom.alias("_d"), term.alias("_t"))
         .join(cur, "doc_id").join(cls, "doc_id"))
    reason = (F.when(F.col("_d"), F.lit("blocked_domain"))
              .when(F.col("_t"), F.lit("blocked_term"))
              .when(F.col("_cr") != "ok", F.col("_cr"))
              .when(F.col("prob") < 0.5, F.lit("classifier_low"))
              .otherwise(F.lit("ok")))
    got = {r["doc_id"]: r["r"]
           for r in j.select("doc_id", reason.alias("r")).collect()}
    assert got[1] == "blocked_domain"
    assert got[2] == "blocked_term"        # url gate outranks quality
    assert got[3] == "too_short"
    assert got[4] == "ok"                  # bias=10 keeps the classifier open


def test_approx_quantile_cuts_agree_with_exact(spark):
    """VERDICT r05 #1: the at-scale approx_percentile mode must land
    within rank tolerance of the exact interpolated cut.  At default
    accuracy (10000 >> corpus rows) GK keeps every sample, so the
    approx cut is an actual observed score adjacent to the exact
    interpolated value — assert the cuts bracket within one
    inter-score gap and the resulting verdicts differ on at most the
    boundary document."""
    from ner_extractor_spark.operators.curation import calibrate_thresholds

    d = _df(spark)
    exact = calibrate_thresholds(d).first()
    approx = calibrate_thresholds(d, approx=True).first()
    # with accuracy >> n the approx value is an observed score whose
    # rank differs from the target by < 1 — i.e. within the gap
    # between adjacent order statistics around the exact cut
    from ner_extractor_spark.operators.curation import curation_scores
    lm, dup = curation_scores(d)
    lm_s = sorted(r["lm_score"] for r in lm.collect())
    dup_s = sorted(r["dup_fraction"] for r in dup.collect())

    def gap(vals, x):
        lo = max([v for v in vals if v <= x], default=vals[0])
        hi = min([v for v in vals if v >= x], default=vals[-1])
        return lo, hi

    lo, hi = gap(lm_s, exact["lm_threshold"])
    assert lo - 1e-6 <= approx["lm_threshold"] <= hi + 1e-6
    lo, hi = gap(dup_s, exact["dup_threshold"])
    assert lo - 1e-6 <= approx["dup_threshold"] <= hi + 1e-6


def test_approx_mode_runs_composed_flagships(spark):
    """The composed calibrated paths accept approx=True end to end
    (calibrated_curation and classifier calibration) and stay TOTAL
    over the input."""
    from ner_extractor_spark.operators.classifier import (
        classify_docs_calibrated, synthetic_weights)
    from ner_extractor_spark.operators.curation import calibrated_curation

    d = _df(spark)
    out = calibrated_curation(d, approx=True).collect()
    assert len(out) == len(DOCS)
    cls = classify_docs_calibrated(d, synthetic_weights(spark),
                                   approx=True).collect()
    assert len(cls) == len(DOCS)


def test_ppl_buckets_approx_partitions_corpus(spark):
    """Approx-mode CCNet tiers: every doc gets a bucket and the
    head/middle/tail cuts come from observed scores adjacent to the
    exact cuts."""
    from ner_extractor_spark.operators.lm import ppl_buckets

    d = _df(spark)
    ex = {r["doc_id"]: r["bucket"]
          for r in ppl_buckets(d, approx=False).collect()}
    ap = {r["doc_id"]: r["bucket"]
          for r in ppl_buckets(d, approx=True).collect()}
    assert set(ap) == set(ex)
    # bucket churn bounded: cuts move by at most one order statistic,
    # so at most one doc per cut can flip tier
    churn = sum(1 for k in ex if ex[k] != ap[k])
    assert churn <= 2


def test_near_duplicate_rule_precedence(spark):
    """VERDICT r05 #3: near=True drops MinHash-LSH cluster non-
    representatives with reason 'near_duplicate', ranked AFTER
    exact_duplicate and BEFORE dup_ngrams; the representative
    survives the rule (it may still trip the symmetric rules)."""
    from ner_extractor_spark.operators.curation import near_dup_keepers

    d = _df(spark)
    nd = {r["doc_id"]: r["nd_keeper"]
          for r in near_dup_keepers(d).collect()}
    # docs 1 and 6 share most shingles -> same LSH cluster, keeper 1;
    # exact dups 4/5 also cluster (identical signatures), keeper 4
    assert nd[6] == 1 and nd[1] == 1
    assert nd[5] == 4 and nd[4] == 4
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(d, near=True,
                                  dup_threshold=1.01).collect()}
    # 5 is an EXACT duplicate -> the more specific reason wins
    assert got[5] == "exact_duplicate"
    # 6 is a near (not exact) duplicate of 1 -> the new rule fires
    assert got[6] == "near_duplicate"
    # representatives survive the near-dup rule
    assert got[1] == "ok" and got[4] == "ok"
    # quality still outranks everything
    assert got[7] == "too_short"


def test_near_rule_off_by_default_matches_prior_contract(spark):
    """near defaults to False: the pre-r06 verdicts are unchanged."""
    base = sorted(map(tuple, curate_corpus(_df(spark)).collect()))
    off = sorted(map(tuple, curate_corpus(_df(spark),
                                          near=False).collect()))
    assert base == off


def test_near_rule_partial_cluster_table_keeps_singletons(spark):
    """A user-supplied near table listing only clustered docs must not
    drop the absent (singleton) documents — left-join semantics."""
    d = _df(spark)
    partial = spark.createDataFrame([(6, 1)], "doc_id int, nd_keeper int")
    got = {r["doc_id"]: r["reason"]
           for r in curate_corpus(d, near=partial,
                                  dup_threshold=1.01).collect()}
    assert len(got) == len(DOCS)          # nothing vanished
    assert got[6] == "near_duplicate"
    assert got[1] == "ok" and got[2] == "ok"


def test_verdict_total_over_adversarial_texts(spark):
    """Robustness battery: the full verdict chain (and chunk+pack
    downstream) is TOTAL and crash-free over hostile inputs — unicode,
    emoji, RTL, control chars, a single enormous token, repeated
    whitespace, and NULL text."""
    from ner_extractor_spark.operators.classifier import synthetic_weights
    from ner_extractor_spark.operators.packing import (chunk_documents,
                                                       pack_sequences)
    from ner_extractor_spark.operators.web_verdict import full_web_verdict

    rows = [
        (1, "https://ok.test/a", "普通话 的 文本 与 空格 分词 在 这里"),
        (2, "https://ok.test/b", "🎉🎊 emoji 🚀 tokens 🌍 here 🎈 now"),
        (3, "https://ok.test/c", "نص عربي من اليمين إلى اليسار هنا"),
        (4, "https://ok.test/d", "ctrl\x00chars\x01and\ttabs\nnewlines"),
        (5, "https://ok.test/e", "x" * 5000),
        (6, "https://ok.test/f", "   \t\n   "),
        (7, "https://ok.test/g", None),
        (8, "https://ok.test/h", "the ordinary control document is "
                                 "here with a few more words"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    d = d.fillna({"text": ""})
    v = full_web_verdict(d, synthetic_weights(spark),
                         dup_threshold=0.9, lm_threshold=-8.0)
    got = {r["doc_id"]: r["reason"] for r in v.collect()}
    assert len(got) == 8                       # total — nothing vanished
    assert got[6] == "too_short" and got[7] == "too_short"
    assert got[5] in ("tokens_too_long", "too_short")  # one huge token
    # the survivors flow through chunk + pack without error
    kept = d.join(v.filter("keep").select("doc_id"), "doc_id")
    chunks = chunk_documents(kept, chunk_size=4)
    packed = pack_sequences(chunks.select(
        F.concat_ws("#", "doc_id", "chunk_id").alias("doc_id"),
        F.col("chunk_text").alias("text")), budget=10)
    assert packed.count() == chunks.count()
