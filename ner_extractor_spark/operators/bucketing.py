"""Bucketed tables for co-located joins (SURVEY §4.3.6 / north rule
partitioning posture).

At 10^12 docs the mentions⋈pages-class joins repeat across pipeline
runs; bucketing both sides by the join key at write time removes the
exchange from every subsequent join (sort-merge join reads co-located
buckets).  In production this is Iceberg ``bucket(N, url)`` partition
transforms; in the sandbox the same physics via Spark's managed-table
bucketing (``bucketBy(...).sortBy(...).saveAsTable``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16,
                   mode: str = "overwrite") -> None:
    (df.write.mode(mode)
     .bucketBy(n_buckets, key)
     .sortBy(key)
     .saveAsTable(table))


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)
