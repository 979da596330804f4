"""Triple extraction: fused zero-shuffle variant == join variant, and
pattern semantics (first predicate between, gap cap, ordered pairs)."""

from pyspark.sql import functions as F

from ner_extractor_spark import synth
from ner_extractor_spark.operators.extract import extract_sentences
from ner_extractor_spark.operators.ner import tag_sentences
from ner_extractor_spark.operators.spans import extract_mentions
from ner_extractor_spark.operators.triples import (extract_triples,
                                                   extract_triples_local)
from ner_extractor_spark.schemas import PAGES


def _tagged(spark, n=60):
    pages = spark.createDataFrame(synth.pages_rows(synth.gold_corpus(n)),
                                  schema=PAGES)
    return tag_sentences(extract_sentences(pages, lang=None),
                         synth.tagger_dictionary())


def test_local_equals_join_variant(spark):
    tagged = _tagged(spark)
    mentions = extract_mentions(tagged)
    a = extract_triples(tagged, mentions).collect()
    b = extract_triples_local(tagged).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_triples_semantics_handbuilt(spark):
    rows = [
        # subj PRED obj -> one triple with pred
        ("u", 0, ["John", "Smith", "met", "Acme", "Corp"], "x",
         ["B-PER", "I-PER", "O", "B-ORG", "I-ORG"]),
        # no predicate between -> nothing
        ("u", 1, ["John", "Smith", "and", "Acme"], "x",
         ["B-PER", "I-PER", "O", "B-ORG"]),
        # two predicates -> the FIRST one wins
        ("u", 2, ["John", "met", "visited", "Acme"], "x",
         ["B-PER", "O", "O", "B-ORG"]),
        # gap larger than max_gap -> nothing
        ("u", 3, ["John"] + ["met"] + ["f"] * 9 + ["Acme"], "x",
         ["B-PER"] + ["O"] * 10 + ["B-ORG"]),
        # adjacent mentions -> nothing (no room for a predicate)
        ("u", 4, ["John", "Acme"], "x", ["B-PER", "B-ORG"]),
    ]
    tagged = spark.createDataFrame(
        rows, "url string, sent_id int, tokens array<string>, "
              "sent_text string, pred_tags array<string>")
    out = extract_triples_local(tagged, max_gap=8).collect()
    got = {(r["sent_id"], r["subj_surface"], r["pred"], r["obj_surface"])
           for r in out}
    assert got == {
        (0, "John Smith", "met", "Acme Corp"),
        (2, "John", "met", "Acme"),
    }
