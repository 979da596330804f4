"""Entity-aware augmentation (G1-G3): splice correctness, BIO synthesis,
weight column, determinism under repartitioning, cap semantics."""

from pyspark.sql import functions as F

from ner_extractor_spark.functions.bio import get_entities
from ner_extractor_spark.operators.augment import (build_entity_pool,
                                                   entity_aware_augmentation)

SENT = ("url string, sent_id int, tokens array<string>, "
        "ner_tags array<string>")
MEN = "url string, sent_id int, start int, end int, surface string, label string"


def _fixture(spark):
    sents = spark.createDataFrame([
        ("u1", 0, ["John", "Smith", "met", "Acme", "Corp"],
         ["B-PER", "I-PER", "O", "B-ORG", "I-ORG"]),
        ("u1", 1, ["Mary", "visited", "Springfield"],
         ["B-PER", "O", "B-LOC"]),
        ("u2", 0, ["Globex", "hired", "Bob", "Stone"],
         ["B-ORG", "O", "B-PER", "I-PER"]),
        ("u2", 1, ["nothing", "here"], ["O", "O"]),
    ], SENT)
    mentions = spark.createDataFrame([
        ("u1", 0, 0, 1, "John Smith", "PER"),
        ("u1", 0, 3, 4, "Acme Corp", "ORG"),
        ("u1", 1, 0, 0, "Mary", "PER"),
        ("u1", 1, 2, 2, "Springfield", "LOC"),
        ("u2", 0, 0, 0, "Globex", "ORG"),
        ("u2", 0, 2, 3, "Bob Stone", "PER"),
    ], MEN)
    return sents, mentions


def test_pool_is_deterministic(spark):
    _, mentions = _fixture(spark)
    pool = {r["label"]: list(r["surfaces"])
            for r in build_entity_pool(mentions).collect()}
    assert pool["PER"] == ["Bob Stone", "John Smith", "Mary"]
    assert pool["ORG"] == ["Acme Corp", "Globex"]


def test_augmentation_splice_and_tags(spark):
    sents, mentions = _fixture(spark)
    out = entity_aware_augmentation(sents, mentions, replace_prob=1.0,
                                    max_replacements=5).collect()
    assert len(out) > 0
    for r in out:
        toks, tags = list(r["tokens"]), list(r["ner_tags"])
        assert len(toks) == len(tags)
        assert r["loss_weight"] == 0.5
        # every decoded span's surface must come from the pool of its label
        spans = get_entities(tags)
        assert spans, (toks, tags)
        # non-entity scaffold is preserved: 'met'/'visited'/'hired' etc.
        assert set(toks) & {"met", "visited", "hired"} or r["sent_id"] == 1


def test_augmentation_deterministic_under_repartition(spark):
    sents, mentions = _fixture(spark)
    a = entity_aware_augmentation(sents, mentions, replace_prob=0.9).collect()
    b = entity_aware_augmentation(sents.repartition(7),
                                  mentions.repartition(5),
                                  replace_prob=0.9).collect()
    ka = sorted((r["url"], r["sent_id"], tuple(r["tokens"]), tuple(r["ner_tags"]))
                for r in a)
    kb = sorted((r["url"], r["sent_id"], tuple(r["tokens"]), tuple(r["ner_tags"]))
                for r in b)
    assert ka == kb and len(ka) > 0


def test_max_replacements_cap(spark):
    sents, mentions = _fixture(spark)
    out = entity_aware_augmentation(sents, mentions, replace_prob=1.0,
                                    max_replacements=1).collect()
    orig = {(r["url"], r["sent_id"]): (list(r["tokens"]), list(r["ner_tags"]))
            for r in sents.collect()}
    for r in out:
        o_toks, o_tags = orig[(r["url"], r["sent_id"])]
        # with cap=1 the tail after the first span must be unchanged:
        # decoded span count stays the same as gold
        assert len(get_entities(list(r["ner_tags"]))) == \
            len(get_entities(o_tags))


def test_no_op_sentences_dropped(spark):
    sents, mentions = _fixture(spark)
    out = entity_aware_augmentation(sents, mentions, replace_prob=0.0)
    assert out.count() == 0
