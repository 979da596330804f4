"""Structured Streaming ingestion: availableNow drain with watermarked
windowed aggregation, exactly-once resume via checkpoint."""

from ner_extractor_spark import synth
from ner_extractor_spark.schemas import PAGES
from ner_extractor_spark.streaming.ingest import (read_pages_stream,
                                                  run_available_now,
                                                  windowed_page_counts)


def test_stream_windowed_counts_and_resume(spark, tmp_path):
    docs = synth.gold_corpus(30)
    pages = spark.createDataFrame(synth.pages_rows(docs), schema=PAGES)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.write.parquet(src)

    stream = read_pages_stream(spark, src)
    assert stream.isStreaming
    run_available_now(windowed_page_counts(stream), out, ckpt)

    got = spark.read.parquet(out)
    # append mode emits only windows the watermark has closed: window.end
    # <= max(event time) - watermark delay.  That withholding is the
    # correct late-data semantics, so mirror it in the expectation.
    import datetime
    max_ts = pages.agg({"warc_ts": "max"}).collect()[0][0]
    wm = max_ts - datetime.timedelta(hours=2)
    batch_expected = (
        pages.selectExpr("window(warc_ts, '1 hour') as w", "lang")
        .groupBy("w", "lang").count()
        .selectExpr("w.start as window_start", "w.end as window_end",
                    "lang", "count as n_pages")
        .filter(f"window_end <= timestamp'{wm}'"))
    g = {(r["window_start"], r["lang"]): r["n_pages"] for r in got.collect()}
    e = {(r["window_start"], r["lang"]): r["n_pages"] for r in batch_expected.collect()}
    assert g == e and len(g) > 0

    # resume: re-running with the same checkpoint adds nothing (no new data)
    run_available_now(windowed_page_counts(read_pages_stream(spark, src)), out, ckpt)
    assert spark.read.parquet(out).count() == len(g)
