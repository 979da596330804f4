"""Text-analysis functions: lang-id heuristic, quality features,
token counting, fingerprint."""

from pyspark.sql import functions as F

from ner_extractor_spark.functions.text import (fingerprint, lang_id,
                                                quality_features, token_count)


def test_lang_id(spark):
    df = spark.createDataFrame([
        (1, "the cat sat on the mat and it is happy"),
        (2, "der hund ist nicht zu hause und die katze"),
        (3, "le chat est dans la maison pour dormir"),
        (4, "xyzzy qwerty plugh"),
    ], "id int, text string")
    got = {r["id"]: r["l"] for r in
           df.select("id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "und"


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, ""), (3, "x x x x x")], "id int, text string")
    tc = {r["id"]: r["n"] for r in
          df.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert tc == {1: 4, 2: 0, 3: 5}
    q = {r["id"]: r for r in quality_features(df.filter("id != 2")).collect()}
    assert q[1]["unique_ratio"] == 1.0
    assert q[3]["unique_ratio"] == 0.2


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "other")],
        "id int, text string")
    fp = {r["id"]: r["f"] for r in
          df.select("id", fingerprint(F.col("text")).alias("f")).collect()}
    assert fp[1] == fp[2] != fp[3]
