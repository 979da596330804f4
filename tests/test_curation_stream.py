"""Streaming curation (streaming/curation_stream.py): batch/stream
parity per micro-batch, crash-window replay idempotence, frozen-vs-
calibrated threshold modes."""

from ner_extractor_spark.streaming.curation_stream import \
    run_curation_stream


def _docs(spark, n=40):
    rows = []
    for i in range(n):
        if i % 7 == 0:
            text = "the market rallied for nine straight days in a row"
        elif i % 5 == 0:
            text = "zzz qqq xxx"          # short + gibberish
        else:
            text = (f"report {i}: the committee met in the city and "
                    f"agreed a plan for week {i % 9}")
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id int, text string")


def _read_stream(spark, src, schema):
    return spark.readStream.schema(schema).format("parquet").load(src)


def test_curation_stream_matches_batch_per_micro_batch(spark, tmp_path):
    """Every batch_id partition equals curate_corpus over exactly that
    batch's documents — the 'model as of batch N' contract."""
    from ner_extractor_spark.operators.curation import (
        calibrate_thresholds, curate_corpus)
    docs = _docs(spark)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    docs.repartition(2).write.parquet(src)

    run_curation_stream(_read_stream(spark, src, docs.schema), out, ckpt)

    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert verdicts.count() == 40
    batch_ids = [r["batch_id"] for r in
                 verdicts.select("batch_id").distinct().collect()]
    for bid in batch_ids:
        part = verdicts.filter(f"batch_id = {bid}").drop("batch_id")
        ids = [r["doc_id"] for r in part.select("doc_id").collect()]
        subset = docs.filter(docs.doc_id.isin(ids))
        want = curate_corpus(
            subset, thresholds=calibrate_thresholds(subset))
        assert sorted(map(tuple, part.collect())) == \
            sorted(map(tuple, want.collect()))

    # resume on the same checkpoint: clean no-op
    run_curation_stream(_read_stream(spark, src, docs.schema), out, ckpt)
    assert spark.read.parquet(f"{out}/verdicts").count() == 40


def test_curation_stream_replayed_batch_is_idempotent(spark, tmp_path):
    """Crash after the verdict partition lands but before the streaming
    commit: the replayed epoch must rewrite batch_id=N byte-identically
    (same rows, no duplicates)."""
    docs = _docs(spark)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    docs.repartition(2).write.parquet(src)

    run_curation_stream(_read_stream(spark, src, docs.schema), out,
                        str(ckpt), dup_threshold=0.9, lm_threshold=-5.0)
    expected = sorted(map(tuple,
                          spark.read.parquet(f"{out}/verdicts").collect()))
    assert expected

    commits = sorted((p for p in (ckpt / "commits").iterdir()
                      if p.name.isdigit()), key=lambda p: int(p.name))
    commits[-1].unlink()
    crc = ckpt / "commits" / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()

    run_curation_stream(_read_stream(spark, src, docs.schema), out,
                        str(ckpt), dup_threshold=0.9, lm_threshold=-5.0)
    replayed = sorted(map(tuple,
                          spark.read.parquet(f"{out}/verdicts").collect()))
    assert replayed == expected


def test_curation_stream_threshold_mode_validation(spark, tmp_path):
    import pytest
    docs = _docs(spark, 4)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    with pytest.raises(ValueError):
        run_curation_stream(_read_stream(spark, src, docs.schema),
                            str(tmp_path / "out"), str(tmp_path / "ck"),
                            dup_threshold=0.9)


def _web_docs(spark, n=30):
    rows = []
    for i in range(n):
        if i % 6 == 0:
            url = f"https://ads.tracker.test/p/{i}"
        elif i % 6 == 1:
            url = f"https://ok.test/casino/{i}"
        else:
            url = f"https://ok.test/p/{i}"
        if i % 5 == 0:
            text = "zzz qqq xxx"
        else:
            text = (f"report {i}: the committee met in the city and "
                    f"agreed a plan for week {i % 9}")
        rows.append((i, url, text))
    return spark.createDataFrame(rows, "doc_id int, url string, text string")


def test_web_verdict_stream_matches_batch_composition(spark, tmp_path):
    """VERDICT r04 #7: the FULL web verdict (url gates + curation +
    classifier) streamed per micro-batch equals full_web_verdict over
    exactly that batch's documents, and a replayed epoch is
    idempotent."""
    from ner_extractor_spark.operators.classifier import synthetic_weights
    from ner_extractor_spark.operators.web_verdict import full_web_verdict
    from ner_extractor_spark.streaming.curation_stream import \
        run_web_verdict_stream

    docs = _web_docs(spark)
    w = synthetic_weights(spark)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ckpt = tmp_path / "ckpt"
    docs.repartition(2).write.parquet(src)

    kw = dict(blocked_domains=("tracker.test",), blocked_terms=("casino",),
              dup_threshold=0.9, lm_threshold=-8.0)
    run_web_verdict_stream(_read_stream(spark, src, docs.schema), w,
                           out, str(ckpt), **kw)

    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert verdicts.count() == 30
    for bid in [r["batch_id"] for r in
                verdicts.select("batch_id").distinct().collect()]:
        part = verdicts.filter(f"batch_id = {bid}").drop("batch_id")
        ids = [r["doc_id"] for r in part.select("doc_id").collect()]
        subset = docs.filter(docs.doc_id.isin(ids))
        want = full_web_verdict(subset, w, **kw)
        assert sorted(map(tuple, part.collect())) == \
            sorted(map(tuple, want.collect()))

    # crash-window replay: drop the last commit, rerun, identical rows
    expected = sorted(map(tuple, verdicts.collect()))
    commits = sorted((p for p in (ckpt / "commits").iterdir()
                      if p.name.isdigit()), key=lambda p: int(p.name))
    commits[-1].unlink()
    crc = ckpt / "commits" / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()
    run_web_verdict_stream(_read_stream(spark, src, docs.schema), w,
                           out, str(ckpt), **kw)
    assert sorted(map(tuple,
                      spark.read.parquet(f"{out}/verdicts").collect())) \
        == expected


def test_web_verdict_stream_frozen_learned_gate(spark, tmp_path):
    """r06: the TRAINED frozen gate in streaming — perceptron weights
    learned offline, each micro-batch gated through perceptron_scores;
    parity vs the batch composition with the same cls_keep table."""
    from pyspark.sql import functions as F

    from ner_extractor_spark.functions.text import quality_filter
    from ner_extractor_spark.operators.classifier import (
        perceptron_scores, synthetic_weights, train_perceptron)
    from ner_extractor_spark.operators.web_verdict import full_web_verdict
    from ner_extractor_spark.streaming.curation_stream import \
        run_web_verdict_stream

    docs = _web_docs(spark)
    # offline training on the full corpus (the freeze-then-stream
    # posture), quality proxy labels
    keep, _ = quality_filter(F.col("text"))
    lab = docs.select("doc_id", keep.cast("int").alias("label"))
    pw = train_perceptron(docs, lab, n_buckets=64,
                          n_rounds=3).localCheckpoint()
    w = synthetic_weights(spark)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    docs.repartition(2).write.parquet(src)

    kw = dict(blocked_domains=("tracker.test",), blocked_terms=("casino",),
              dup_threshold=0.9, lm_threshold=-8.0)
    run_web_verdict_stream(_read_stream(spark, src, docs.schema), w,
                           out, str(tmp_path / "ckpt"),
                           perceptron_weights=pw, **kw)

    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert verdicts.count() == 30
    for bid in [r["batch_id"] for r in
                verdicts.select("batch_id").distinct().collect()]:
        part = verdicts.filter(f"batch_id = {bid}").drop("batch_id")
        ids = [r["doc_id"] for r in part.select("doc_id").collect()]
        subset = docs.filter(docs.doc_id.isin(ids))
        gate = perceptron_scores(subset, pw, n_buckets=64).select(
            "doc_id", F.col("keep").alias("cls_keep"))
        want = full_web_verdict(subset, w, cls_keep=gate, **kw)
        assert sorted(map(tuple, part.collect())) == \
            sorted(map(tuple, want.collect()))
