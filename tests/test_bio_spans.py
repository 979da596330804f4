"""Span-decode parity (SURVEY §5.2 T-parity/spans): the adversarial BIO
edge cases pinned to seqeval-lenient semantics, plus HOF-expression vs
pure-Python decoder equivalence on randomized sequences."""

import random

import pytest

from ner_extractor_spark.functions.bio import (build_bio_tags, fix_bio,
                                               get_entities, greedy_entities,
                                               primary_label)

# (case_id, tags, expected (type, start, end) spans) — seqeval semantics.
CASES = [
    ("simple", ["B-PER", "I-PER", "O"], [("PER", 0, 1)]),
    ("orphan_I_opens", ["O", "I-PER", "I-PER"], [("PER", 1, 2)]),
    ("I_after_other_type", ["B-PER", "I-ORG"], [("PER", 0, 0), ("ORG", 1, 1)]),
    ("B_B_adjacent", ["B-LOC", "B-LOC"], [("LOC", 0, 0), ("LOC", 1, 1)]),
    ("all_O", ["O", "O", "O"], []),
    ("empty", [], []),
    ("span_at_end", ["O", "B-ORG", "I-ORG"], [("ORG", 1, 2)]),
    ("single_token_seq", ["B-MISC"], [("MISC", 0, 0)]),
    ("I_start_of_seq", ["I-LOC", "O"], [("LOC", 0, 0)]),
    ("B_then_I_wrong_type", ["B-PER", "I-PER", "I-LOC", "O"],
     [("PER", 0, 1), ("LOC", 2, 2)]),
    ("sandwich", ["B-PER", "O", "I-PER"], [("PER", 0, 0), ("PER", 2, 2)]),
    ("adjacent_entities", ["B-PER", "I-PER", "B-ORG", "I-ORG"],
     [("PER", 0, 1), ("ORG", 2, 3)]),
]


@pytest.mark.parametrize("case_id,tags,expected", CASES)
def test_get_entities_edge_cases(case_id, tags, expected):
    assert get_entities(tags) == expected


def test_greedy_divergence_on_orphan_I():
    # F1 (seqeval) opens a span on orphan I-; F2 (notebook greedy) drops it
    tags = ["O", "I-PER", "I-PER"]
    assert get_entities(tags) == [("PER", 1, 2)]
    assert greedy_entities(["a", "b", "c"], tags) == []


def test_fix_bio():
    assert fix_bio(["I-PER", "I-PER", "O", "I-LOC"]) == \
        ["B-PER", "I-PER", "O", "B-LOC"]
    assert fix_bio(["B-PER", "I-PER"]) == ["B-PER", "I-PER"]
    assert fix_bio(["B-PER", "I-LOC"]) == ["B-PER", "B-LOC"]


def test_build_bio_tags():
    assert build_bio_tags("ORG", 3) == ["B-ORG", "I-ORG", "I-ORG"]
    assert build_bio_tags("ORG", 0) == []


def test_primary_label():
    assert primary_label(["O", "B-PER", "B-ORG"]) == "PER"
    assert primary_label(["O", "O"]) == "O"
    assert primary_label(["I-MISC"]) == "MISC"


def _random_tags(rng, n):
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.45:
            out.append("O")
        else:
            prefix = "B" if r < 0.7 else "I"
            out.append(f"{prefix}-{rng.choice(['PER','ORG','LOC','MISC'])}")
    return out


def test_hof_expr_matches_python_on_random_sequences(spark):
    """The zero-shuffle SQL higher-order decode == the Python authority
    on 400 randomized adversarial sequences (one Spark job)."""
    from pyspark.sql import functions as F
    from ner_extractor_spark.operators.spans import span_decode_expr

    rng = random.Random(0)
    rows = [(i, _random_tags(rng, rng.randint(0, 12))) for i in range(400)]
    df = spark.createDataFrame(rows, "id int, pred_tags array<string>")
    got = {
        r["id"]: [(m["label"], m["start"], m["end"]) for m in r["spans"]]
        for r in df.select("id", span_decode_expr().alias("spans")).collect()
    }
    for i, tags in rows:
        assert got[i] == get_entities(tags), (i, tags)
