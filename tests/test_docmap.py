"""J1 multiset doc-id mapping: duplicates pair 1:1, unmatched raises."""

import pytest

from ner_extractor_spark.operators.docmap import map_doc_ids

COLS = ("url string, sent_id int, tokens array<string>, pos_tags array<string>, "
        "chunk_tags array<string>, ner_tags array<string>")


def _sent(url, sid, toks):
    n = len(toks)
    return (url, sid, toks, ["NN"] * n, ["O"] * n, ["O"] * n)


def test_map_doc_ids_multiset(spark):
    raw = spark.createDataFrame([
        _sent("r", 0, ["a", "b"]) + (0,),
        _sent("r", 1, ["dup"]) + (0,),
        _sent("r", 2, ["dup"]) + (1,),     # duplicate key, different doc
        _sent("r", 3, ["c"]) + (2,),
    ], COLS + ", doc_id long")
    processed = spark.createDataFrame([
        _sent("p", 0, ["dup"]),
        _sent("p", 1, ["a", "b"]),
        _sent("p", 2, ["dup"]),
    ], COLS)
    out = map_doc_ids(processed, raw)
    got = {r["sent_id"]: r["doc_id"] for r in out.collect()}
    assert got[1] == 0
    # the two dup sentences consume BOTH raw doc ids exactly once
    assert sorted([got[0], got[2]]) == [0, 1]


def test_map_doc_ids_unmatched_raises(spark):
    raw = spark.createDataFrame([_sent("r", 0, ["a"]) + (0,)],
                                COLS + ", doc_id long")
    processed = spark.createDataFrame([_sent("p", 0, ["zzz"])], COLS)
    with pytest.raises(ValueError, match="not found in raw corpus"):
        map_doc_ids(processed, raw)
