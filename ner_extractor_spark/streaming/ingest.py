"""Structured Streaming ingestion (SURVEY §2.11 — optional in the
reference scope, included as the resumable-ingest front door).

Pattern: ``readStream`` over a pages directory (file source = the
sandbox stand-in for a Kafka/WARC feed) -> watermark on ``warc_ts`` ->
tumbling-window counts (late-capture tolerant) -> ``writeStream`` with a
checkpointLocation.  ``Trigger.AvailableNow`` drains everything then
stops — giving batch-job semantics with streaming-grade exactly-once
checkpointing, which is exactly the "resumable batch" posture of the
north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import PAGES


def read_pages_stream(spark: SparkSession, path: str) -> DataFrame:
    return (spark.readStream.schema(PAGES).format("parquet").load(path))


def windowed_page_counts(pages_stream: DataFrame,
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Per-(window, lang) page counts tolerant of late WARC captures."""
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "lang", "n_pages")
    )


def run_available_now(result: DataFrame, out_path: str,
                      checkpoint: str) -> None:
    """Drain the stream to parquet and stop (exactly-once, resumable)."""
    q = (result.writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
