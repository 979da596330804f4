"""S13: training-log regex scan (reference `notebooks/project_code.ipynb`
cell 9 — parse ``step=... loss=... lr=...`` and validation-metric lines
out of run logs).  Classic log-ETL: spark.read.text + regexp_extract,
fully pushdown/codegen friendly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

STEP_RE = r"step=(\d+).*?loss=([0-9.]+).*?lr=([0-9.eE+-]+)"
EVAL_RE = r"eval.*?f1=([0-9.]+)"


def parse_training_log(spark: SparkSession, path: str) -> DataFrame:
    """One row per step line: (step, loss, lr)."""
    raw = spark.read.text(path)
    return (
        raw.filter(F.col("value").rlike("step="))
        .select(
            F.regexp_extract("value", STEP_RE, 1).cast("long").alias("step"),
            F.regexp_extract("value", STEP_RE, 2).cast("double").alias("loss"),
            F.regexp_extract("value", STEP_RE, 3).cast("double").alias("lr"),
        )
        .filter(F.col("step").isNotNull())
    )


def parse_eval_f1(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.text(path)
    return (
        raw.filter(F.col("value").rlike("eval"))
        .select(F.regexp_extract("value", EVAL_RE, 1).cast("double").alias("f1"))
        .filter(F.col("f1").isNotNull())
    )
