"""Shuffle-key skew diagnostics.

The north rule demands skew handled EXPLICITLY (salted repartitioning
on domain / entity-surface-form keys, AQE skew-join hints).  The
handling half lives in ``link.salt_explode`` (generic salting recipe)
and the AQE session defaults; this module is the measuring half: a
heavy-hitter profile of a prospective shuffle key, so the salt factor
``k`` and AQE thresholds are sized from data, not guessed.

Scale shape: one groupBy on the key (map-side combine — the hot key
collapses per partition before the shuffle, so profiling the skew
never suffers from it), then a distributed partial top-k
(``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — each
partition keeps its local k, the driver merges; NO global sort).  The
rank window runs over the <= top_k surviving rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def key_skew_profile(df: DataFrame, key_col: str,
                     top_k: int = 10) -> DataFrame:
    """Top ``top_k`` heaviest values of ``key_col``:
    (rank, key, n, share) with share = n / total rows, rounded to 6.

    Read it as: share * shuffle partitions ~ how many partition-sized
    units the hottest key occupies — the lower bound for a useful
    ``salt_explode`` k on that key.
    """
    # materialize the per-key counts once: both the top-k and the
    # total derive from them, and without the barrier Catalyst would
    # run the (possibly expensive) upstream pipeline twice — same
    # lineage-barrier discipline as cc.py / graph.pagerank
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n"))
              .localCheckpoint())
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    rank_w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(rank_w))
            .select("rank", "key", "n",
                    F.round(F.col("n") / F.col("total"), 6).alias("share")))
