"""Split / sampling operators (SURVEY §2.6) — all deterministic under
re-partitioning: every pseudo-random choice is keyed by a stable hash of
row identity (md5 of a key column + seed), NEVER by partition layout
(SURVEY W6/F16; rand(seed) is partition-dependent and forbidden here).

md5 (not xxhash64) so the DuckDB correctness oracle can recompute the
exact same ordering in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hash_order(key_col, seed: int = 42):
    """Deterministic engine-portable pseudo-random sort key."""
    return F.md5(F.concat(F.lit(str(seed) + "|"), key_col.cast("string")))


def deterministic_shuffle(df: DataFrame, key: str, seed: int = 42) -> DataFrame:
    """W6: seeded shuffle, invariant to cluster size."""
    return df.orderBy(hash_order(F.col(key), seed))


def stratified_split(df: DataFrame, strata: str, key: str,
                     val_ratio: float, seed: int = 42) -> DataFrame:
    """T1: exact per-stratum quota split (sklearn train_test_split
    stratify semantics: floor-ish quota per stratum).  Adds a `split`
    column ('train'/'validation').

    Window per stratum ordered by the stable hash; the first
    round(n*ratio) rows of each stratum go to validation.  Exact like
    sklearn (sampleBy is only approximate).
    """
    w = Window.partitionBy(strata).orderBy(hash_order(F.col(key), seed))
    cnt = Window.partitionBy(strata)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .withColumn(
            "split",
            F.when(F.col("_rn") <= F.round(F.col("_n") * val_ratio),
                   F.lit("validation")).otherwise(F.lit("train")),
        )
        .drop("_rn", "_n")
    )


def group_kfold(df: DataFrame, group: str, n_splits: int = 5) -> DataFrame:
    """T3: GroupKFold — every group entirely in one fold, fold sizes
    balanced greedily by descending group size (sklearn's strategy:
    assign each group, largest first, to the currently-smallest fold).

    The group list is aggregated distributed-side; the greedy assignment
    itself runs on the driver over the (bounded) distinct-group table —
    same contract as the reference, which k-folds documents, not rows.
    Returns df + `fold` column (0-based).
    """
    sizes = df.groupBy(group).agg(F.count(F.lit(1)).alias("_gsize"))
    rows = sizes.orderBy(F.desc("_gsize"), F.col(group)).collect()
    fold_totals = [0] * n_splits
    assign = {}
    for r in rows:
        f = min(range(n_splits), key=lambda i: (fold_totals[i], i))
        assign[r[group]] = f
        fold_totals[f] += r["_gsize"]
    spark = df.sparkSession
    from pyspark.sql.types import IntegerType, StructField, StructType
    fold_schema = StructType([df.schema[group], StructField("fold", IntegerType())])
    fold_df = spark.createDataFrame([(g, f) for g, f in assign.items()], schema=fold_schema)
    return df.join(F.broadcast(fold_df), on=group, how="inner")


def group_fold_rr(df: DataFrame, group: str, n_splits: int = 5) -> DataFrame:
    """Fully-declarative GroupKFold variant: groups sorted by descending
    size get folds round-robin.  Slightly coarser balance than the greedy
    `group_kfold`, but zero driver involvement and expressible in ANSI
    SQL (the correctness-oracle-checkable flavor).  Adds `fold`."""
    sizes = df.groupBy(group).agg(F.count(F.lit(1)).alias("_gsize"))
    w = Window.orderBy(F.desc("_gsize"), F.col(group))
    folds = sizes.withColumn(
        "fold", ((F.row_number().over(w) - 1) % n_splits).cast("int")
    ).select(group, "fold")
    return df.join(F.broadcast(folds), on=group, how="inner")


def random_subsample(df: DataFrame, key: str, k: int, seed: int = 42) -> DataFrame:
    """T7: deterministic k-row subsample (viz / spot checks)."""
    return df.orderBy(hash_order(F.col(key), seed)).limit(k)
