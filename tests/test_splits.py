"""Split operators: exact stratified quotas, GroupKFold integrity,
determinism under repartitioning."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.splits import (deterministic_shuffle,
                                                  group_kfold,
                                                  stratified_split)


def _df(spark, n=200):
    rows = [(i, ["PER", "ORG", "LOC", "O"][i % 4], f"d{i % 23}") for i in range(n)]
    return spark.createDataFrame(rows, "sent_id int, primary_label string, doc string")


def test_stratified_split_exact_quota(spark):
    df = _df(spark)
    out = stratified_split(df, "primary_label", "sent_id", val_ratio=0.2)
    per = out.groupBy("primary_label", "split").count().collect()
    counts = {(r["primary_label"], r["split"]): r["count"] for r in per}
    for lbl in ["PER", "ORG", "LOC", "O"]:
        assert counts[(lbl, "validation")] == 10   # round(50 * 0.2)
        assert counts[(lbl, "train")] == 40


def test_stratified_split_partition_invariant(spark):
    df = _df(spark)
    a = stratified_split(df, "primary_label", "sent_id", 0.2).collect()
    b = stratified_split(df.repartition(32), "primary_label", "sent_id", 0.2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_group_kfold_group_integrity_and_balance(spark):
    df = _df(spark)
    out = group_kfold(df, "doc", n_splits=5)
    # every doc in exactly one fold
    viol = (out.groupBy("doc").agg(F.countDistinct("fold").alias("k"))
            .filter(F.col("k") > 1).count())
    assert viol == 0
    sizes = [r["count"] for r in out.groupBy("fold").count().collect()]
    assert len(sizes) == 5
    assert max(sizes) - min(sizes) <= 10  # greedy balance is tight here


def test_deterministic_shuffle_stable(spark):
    df = _df(spark, 50)
    a = [r["sent_id"] for r in deterministic_shuffle(df, "sent_id").collect()]
    b = [r["sent_id"] for r in
         deterministic_shuffle(df.repartition(16), "sent_id").collect()]
    assert a == b
    assert a != sorted(a)   # actually shuffled
