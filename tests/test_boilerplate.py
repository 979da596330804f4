"""Line-level boilerplate removal (operators/boilerplate.py)."""

from ner_extractor_spark.operators.boilerplate import (
    line_document_frequency, strip_boilerplate_lines)

FOOTER = "all rights reserved"

DOCS = [
    # unique content + shared footer
    (1, "alpha beta\ngamma delta\n" + FOOTER),
    (2, "epsilon zeta\n" + FOOTER),
    # document that is NOTHING but boilerplate: must survive as a row
    (3, FOOTER),
    # two docs sharing a content line -> that line is boilerplate too
    (4, "shared line\nunique four"),
    (5, "shared line\nunique five"),
    # empty line inside a doc: structure, never counted, always kept
    (6, "top\n\nbottom"),
]


def _run(spark, min_df=2):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    out = strip_boilerplate_lines(df, min_df=min_df)
    return {r["doc_id"]: r for r in out.collect()}


def test_footer_stripped_content_kept_in_order(spark):
    rows = _run(spark)
    assert rows[1]["clean_text"] == "alpha beta\ngamma delta"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (3, 2)
    assert rows[2]["clean_text"] == "epsilon zeta"


def test_fully_boilerplate_doc_survives_empty(spark):
    rows = _run(spark)
    assert (rows[3]["n_lines"], rows[3]["n_kept"]) == (1, 0)
    assert rows[3]["clean_text"] == ""


def test_cross_doc_shared_content_line_is_stripped(spark):
    rows = _run(spark)
    assert rows[4]["clean_text"] == "unique four"
    assert rows[5]["clean_text"] == "unique five"


def test_empty_lines_never_count_and_are_kept(spark):
    rows = _run(spark)
    # doc 6's empty line is below min_len: not df-counted, not stripped
    assert rows[6]["clean_text"] == "top\n\nbottom"
    assert (rows[6]["n_lines"], rows[6]["n_kept"]) == (3, 3)


def test_min_df_high_keeps_everything(spark):
    rows = _run(spark, min_df=10)
    assert all(r["n_kept"] == r["n_lines"] for r in rows.values())


def test_document_frequency_counts_distinct_docs(spark):
    df = spark.createDataFrame(
        [(1, FOOTER + "\n" + FOOTER), (2, FOOTER)],
        "doc_id int, text string")
    freq = {r["line"]: r["line_df"]
            for r in line_document_frequency(df).collect()}
    # repeated within doc 1 counts once: df = 2 distinct docs, not 3
    assert freq[FOOTER] == 2


def test_identity_on_duplicate_free_corpus(spark):
    # property: when no line crosses documents, stripping is the
    # identity (n_kept == n_lines, clean_text == text) — checked over a
    # seeded random multi-line corpus in one Spark pass
    import random
    rng = random.Random(7)
    rows = []
    for d in range(60):
        n_lines = rng.randint(1, 6)
        lines = [f"doc{d} line{i} " + " ".join(
            rng.choice("abcdefgh") for _ in range(rng.randint(1, 5)))
            for i in range(n_lines)]
        rows.append((d, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate_lines(df).collect()}
    orig = dict(rows)
    assert len(out) == len(rows)
    for d, text in orig.items():
        assert out[d]["clean_text"] == text
        assert out[d]["n_kept"] == out[d]["n_lines"]
