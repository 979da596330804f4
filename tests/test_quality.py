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


def test_quality_filter_reasons(spark):
    from pyspark.sql import functions as F

    from ner_extractor_spark.functions.text import quality_filter
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),  # ok
        (2, "tiny doc"),                                           # too_short
        (3, "a b c d e f g h i j"),                                # tokens_too_short
        (4, "zz yy xx ww vv uu tt ss"),                            # no_stopwords
        (5, "the the the the the the the the"),                    # too_repetitive
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    keep, reason = quality_filter(F.col("text"))
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in df.select("doc_id", keep, reason).collect()}
    assert got[1] == (True, "ok")
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "tokens_too_short")
    assert got[4] == (False, "no_stopwords")
    assert got[5] == (False, "too_repetitive")


def test_repetition_and_pii(spark):
    from pyspark.sql import functions as F

    from ner_extractor_spark.functions.text import (pii_counts,
                                                    repetition_features)
    rows = [
        (1, "a b c a b c a b c a b c"),           # highly repetitive
        (2, "one two three four five six seven"),  # no repeats
        (3, "mail me at jo.doe@example.com or 12.34.56.78 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    dup, top = repetition_features(F.col("text"))
    got = {r["doc_id"]: (r["dup_shingle_ratio"], r["top_token_share"])
           for r in df.select("doc_id", dup, top).collect()}
    assert got[1][0] > 0.5 and abs(got[1][1] - 4 / 12) < 1e-6
    assert got[2] == (0.0, round(1 / 7, 6))
    pii = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"])
           for r in df.select("doc_id", *pii_counts(F.col("text"))).collect()}
    assert pii[3][0] == 1 and pii[3][2] == 1
    assert pii[1] == (0, 0, 0)


def test_redact_pii(spark):
    from pyspark.sql import functions as F

    from ner_extractor_spark.functions.text import pii_counts, redact_pii
    rows = [
        (1, "mail jo.doe@example.com or call +1 (555) 123-4567 ok"),
        (2, "server at 10.0.12.34 answered"),
        (3, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    red = df.select("doc_id", redact_pii(F.col("text")).alias("t"))
    got = {r["doc_id"]: r["t"] for r in red.collect()}
    assert got[1] == "mail <EMAIL> or call <PHONE> ok"
    assert got[2] == "server at <IP> answered"
    assert got[3] == rows[2][1]                    # untouched
    # count-consistency: redaction is a fixed point on natural text —
    # post-redaction counts are all zero
    counts = red.select(*pii_counts(F.col("t"))).collect()
    assert all(tuple(r) == (0, 0, 0) for r in counts)
