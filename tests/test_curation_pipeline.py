"""Resumable training-data assembly plan (plans/curation_pipeline.py):
stage tables + manifest resume + lineage, mirroring the KG plan's
contract (tests/test_pipeline_e2e.py)."""

from pyspark.sql import functions as F

from ner_extractor_spark.plans.curation_pipeline import run_curation_pipeline


def _docs(spark, n=40):
    rows = []
    for i in range(n):
        if i % 9 == 0:
            text = "zz"                     # too_short
        elif i % 7 == 0:
            # a 10-token verbatim run inside an otherwise-unique doc:
            # small dup-ngram fraction (survives the p95 cut), but
            # ExactSubstr still flags the shared span
            uniq = " ".join(f"w{i}x{j} the a{j}" for j in range(8))
            text = (f"intro piece {i} about the topic {uniq} "
                    "shared boilerplate run one two three four five six "
                    f"seven eight nine ten and then a unique tail {i}")
        else:
            text = (f"report {i}: the committee met in the city and "
                    f"agreed a plan for week {i % 9} with more words")
        url = (f"https://ads.tracker.test/x{i}" if i % 11 == 0
               else f"https://ok{i % 3}.test/doc/{i}")
        rows.append((i, url, text))
    return spark.createDataFrame(rows, "doc_id int, url string, text string")


def _weights(spark):
    from ner_extractor_spark.operators.classifier import synthetic_weights
    return synthetic_weights(spark)


def test_pipeline_stages_and_outputs(spark, tmp_path):
    d = _docs(spark)
    r = run_curation_pipeline(
        spark, d, _weights(spark), str(tmp_path / "cp"),
        blocked_domains=("tracker.test",), chunk_size=8, budget=20)
    verdict = {x["doc_id"]: x["reason"] for x in r.verdict.collect()}
    assert len(verdict) == 40
    assert verdict[0] == "blocked_domain"     # 0 % 11 == 0
    assert verdict[9] == "too_short"
    packed = r.packed.collect()
    assert packed and all(x["bucket"] is not None for x in packed)
    # every packed chunk traces back to a kept doc
    kept = {k for k, v in verdict.items() if v == "ok"}
    for x in r.chunks.collect():
        assert int(x["chunk_uid"].split("#")[0]) in kept


def test_pipeline_resume_skips_and_is_identical(spark, tmp_path):
    d = _docs(spark)
    wd = str(tmp_path / "cp")
    r1 = run_curation_pipeline(spark, d, _weights(spark), wd,
                               chunk_size=8, budget=20)
    p1 = sorted(map(tuple, r1.packed.collect()))
    r2 = run_curation_pipeline(spark, d, _weights(spark), wd,
                               chunk_size=8, budget=20)
    p2 = sorted(map(tuple, r2.packed.collect()))
    assert p1 == p2 and p1

    from ner_extractor_spark.plans.checkpoints import (StageManifest,
                                                       read_lineage)
    man = StageManifest(wd)
    for stage in ["verdict", "cleaned", "chunks", "packed"]:
        assert man.done(stage), stage
    # lineage rows written once per stage (the resume appended nothing)
    lin = read_lineage(spark, wd)
    stages = {x["stage"] for x in lin.select("stage").distinct().collect()}
    assert {"verdict", "cleaned", "chunks", "packed"} <= stages


def test_pipeline_span_dedup_removes_shared_runs(spark, tmp_path):
    """The boilerplate run (>= 8 shared tokens across the i%7 docs) is
    stripped before chunking; with span_dedup=False it survives."""
    d = _docs(spark)
    r_on = run_curation_pipeline(
        spark, d, _weights(spark), str(tmp_path / "on"),
        chunk_size=8, budget=20, span_dedup=True)
    r_off = run_curation_pipeline(
        spark, d, _weights(spark), str(tmp_path / "off"),
        chunk_size=8, budget=20, span_dedup=False)
    removed = {x["doc_id"]: x["n_removed_tokens"]
               for x in r_on.cleaned.collect()}
    assert any(v > 0 for v in removed.values())
    txt_on = " ".join(x["chunk_text"] for x in r_on.chunks.collect())
    txt_off = " ".join(x["chunk_text"] for x in r_off.chunks.collect())
    assert "shared boilerplate run one two" not in txt_on
    assert "shared boilerplate run one two" in txt_off


def test_pipeline_learned_gate_plugs_in(spark, tmp_path):
    from ner_extractor_spark.functions.text import quality_filter
    from ner_extractor_spark.operators.classifier import (
        perceptron_scores, train_perceptron)

    d = _docs(spark)
    keep, _ = quality_filter(F.col("text"))
    lab = d.select("doc_id", keep.cast("int").alias("label"))
    pw = train_perceptron(d, lab, n_buckets=64, n_rounds=3)
    gate = perceptron_scores(d, pw, n_buckets=64).select(
        "doc_id", F.col("keep").alias("cls_keep"))
    r = run_curation_pipeline(
        spark, d, _weights(spark), str(tmp_path / "cp"),
        chunk_size=8, budget=20, cls_keep=gate)
    assert r.verdict.count() == 40


def test_pipeline_survives_empty_stages(spark, tmp_path):
    """A corpus where the verdict drops EVERYTHING still produces
    readable (0-row) stage tables and resumes cleanly — an empty
    parquet stage has no part files, so the read-back must carry the
    writer's schema (regression: UNABLE_TO_INFER_SCHEMA)."""
    rows = [(i, f"https://ok.test/d/{i}", "zz")   # all too_short
            for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id int, url string, text string")
    wd = str(tmp_path / "cp")
    r1 = run_curation_pipeline(spark, d, _weights(spark), wd,
                               chunk_size=8, budget=20)
    assert r1.verdict.count() == 6 and r1.packed.count() == 0
    # resume over the empty stages
    r2 = run_curation_pipeline(spark, d, _weights(spark), wd,
                               chunk_size=8, budget=20)
    assert r2.packed.count() == 0
    assert r2.chunks.columns == r1.chunks.columns
