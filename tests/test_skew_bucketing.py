"""T-skew (SURVEY §5.2) + bucketed co-located joins:
- salted join result == plain join result on a hot-key dataset;
- joining two bucketed tables adds no Exchange."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.bucketing import read_table, write_bucketed
from ner_extractor_spark.operators.link import salt_explode


def test_salted_join_equals_plain(spark):
    # hot key: 'reuters' carries 80% of the big side
    big = spark.createDataFrame(
        [(i, "reuters" if i % 5 != 0 else f"k{i}") for i in range(2000)],
        "id long, key string")
    small = spark.createDataFrame(
        [("reuters", "Q-1")] + [(f"k{i}", f"Q-{i}") for i in range(0, 2000, 5)],
        "key string, entity string")

    plain = big.join(small, on="key").select("id", "entity")
    big_s, small_s, keys = salt_explode(big, small, key="key", k=8,
                                        salt_src="id")
    salted = big_s.join(small_s, on=keys).select("id", "entity")

    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))
    # the salt actually spreads the hot key across buckets
    spread = (big_s.filter("key = 'reuters'")
              .select("_salt").distinct().count())
    assert spread == 8


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).select(
            F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("url"))
        b = spark.range(0, 1000, 2).select(
            F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("url"),
            F.lit(1).alias("x"))
        write_bucketed(a, "bkt_a", "url", n_buckets=8)
        write_bucketed(b, "bkt_b", "url", n_buckets=8)
        j = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"), "url")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
