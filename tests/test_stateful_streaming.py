"""applyInPandasWithState: per-domain running mention stats across
micro-batches (state survives between triggers via checkpoint)."""

from pyspark.sql import functions as F

from ner_extractor_spark import synth
from ner_extractor_spark.operators.extract import extract_sentences
from ner_extractor_spark.schemas import PAGES
from ner_extractor_spark.streaming.stateful import domain_mention_stats


def test_domain_mention_stats_accumulates(spark, tmp_path):
    docs = synth.gold_corpus(40)
    pages = spark.createDataFrame(synth.pages_rows(docs), schema=PAGES)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    pages.write.parquet(src)

    stream = (spark.readStream.schema(PAGES).format("parquet")
              .option("maxFilesPerTrigger", "1").load(src))
    sents = extract_sentences(stream, lang=None)
    stats = domain_mention_stats(sents, synth.tagger_dictionary())

    # parquet sink only supports append; route update-mode output
    # through foreachBatch (the standard pattern for update sinks)
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (stats.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out)
    # the LAST update per domain equals the batch-computed totals
    from pyspark.sql import Window
    latest = (got.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("domain").orderBy(F.desc("n_sentences"))))
        .filter("rn = 1"))

    from ner_extractor_spark.operators.ner import tag_sentences
    from ner_extractor_spark.operators.spans import extract_mentions
    batch_sents = extract_sentences(pages, lang=None).withColumn(
        "domain", F.regexp_extract("url", r"^[a-z]+://([^/#]+)", 1))
    exp_sent = {r["domain"]: r["n"] for r in batch_sents.groupBy("domain")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    men = extract_mentions(tag_sentences(batch_sents, synth.tagger_dictionary()))
    men = men.withColumn("domain",
                         F.regexp_extract("url", r"^[a-z]+://([^/#]+)", 1))
    exp_men = {r["domain"]: r["n"] for r in men.groupBy("domain")
               .agg(F.count(F.lit(1)).alias("n")).collect()}

    got_sent = {r["domain"]: r["n_sentences"] for r in latest.collect()}
    got_men = {r["domain"]: r["n_mentions"] for r in latest.collect()}
    assert got_sent == exp_sent
    assert got_men == exp_men
