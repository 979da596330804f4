"""Byte-parity of the frozen CoNLL serializer (SURVEY §5.2 T-parity/text)
and parser semantics (S1/S2, W1, J1 key)."""

import pytest

from ner_extractor_spark.sources.conll import (Sentence, parse_conll,
                                               parse_conll_with_doc_ids,
                                               serialize_conll)

SAMPLE = (
    "-DOCSTART- -X- -X- O\n"
    "\n"
    "EU NNP I-NP B-ORG\n"
    "rejects VBZ I-VP O\n"
    "\n"
    "Peter NNP I-NP B-PER\n"
    "Blackburn NNP I-NP I-PER\n"
    "\n"
    "-DOCSTART- -X- -X- O\n"
    "\n"
    "BRUSSELS NNP I-NP B-LOC\n"
    "\n"
)


def test_parse_and_roundtrip_bytes():
    sents = parse_conll(SAMPLE)
    assert len(sents) == 3
    assert sents[0].tokens == ["EU", "rejects"]
    assert sents[0].ner_tags == ["B-ORG", "O"]
    # serializer round-trip is byte-identical modulo the DOCSTART lines
    expected = (
        "EU NNP I-NP B-ORG\nrejects VBZ I-VP O\n\n"
        "Peter NNP I-NP B-PER\nBlackburn NNP I-NP I-PER\n\n"
        "BRUSSELS NNP I-NP B-LOC\n\n"
    )
    assert serialize_conll(sents) == expected
    # and parsing the serialization yields the same sentences (fixpoint)
    assert [s.key() for s in parse_conll(serialize_conll(sents))] == \
        [s.key() for s in sents]


def test_doc_ids_running_count():
    with_ids = parse_conll_with_doc_ids(SAMPLE)
    assert [(s.tokens[0], d) for s, d in with_ids] == \
        [("EU", 0), ("Peter", 0), ("BRUSSELS", 1)]


def test_malformed_line_raises():
    with pytest.raises(ValueError, match="Malformed"):
        parse_conll("only three cols\n")


def test_sentence_key_multiset_semantics():
    """Duplicate sentences produce equal keys (J1 pairs them 1:1 by
    row_number, reference pairs by stack-pop — same multiset result)."""
    a = Sentence(["x"], ["NN"], ["O"], ["O"])
    b = Sentence(["x"], ["NN"], ["O"], ["O"])
    assert a.key() == b.key()


def test_spark_reader_matches_python(spark, tmp_path):
    p = tmp_path / "sample.txt"
    p.write_text(SAMPLE)
    from ner_extractor_spark.sources.conll import read_conll_spark
    rows = (read_conll_spark(spark, str(p))
            .orderBy("doc_id", "sent_id").collect())
    py = parse_conll_with_doc_ids(SAMPLE)
    assert len(rows) == len(py)
    for row, (sent, doc_id) in zip(rows, py):
        assert row["doc_id"] == doc_id
        assert list(row["tokens"]) == sent.tokens
        assert list(row["ner_tags"]) == sent.ner_tags
