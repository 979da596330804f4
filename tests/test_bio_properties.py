"""Property-based tests (hypothesis) for the BIO algebra — pure Python,
no Spark: structural invariants of the seqeval-parity decoder."""

from hypothesis import given, settings, strategies as st

from ner_extractor_spark.functions.bio import (build_bio_tags, fix_bio,
                                               get_entities)

TYPES = ["PER", "ORG", "LOC", "MISC"]
tag = st.one_of(
    st.just("O"),
    st.builds(lambda p, t: f"{p}-{t}", st.sampled_from(["B", "I"]),
              st.sampled_from(TYPES)),
)
tags = st.lists(tag, max_size=30)


@settings(max_examples=300, deadline=None)
@given(tags)
def test_spans_are_valid_and_disjoint(seq):
    spans = get_entities(seq)
    prev_end = -1
    for label, start, end in spans:
        assert 0 <= start <= end < len(seq)
        assert label in TYPES
        assert start > prev_end          # ordered, non-overlapping
        prev_end = end
        # every position inside a span is non-O with the span's type
        for i in range(start, end + 1):
            assert seq[i] != "O" and seq[i].endswith(label)
    # every non-O position is covered by exactly one span
    covered = {i for _, s, e in spans for i in range(s, e + 1)}
    assert covered == {i for i, t in enumerate(seq) if t != "O"}


@settings(max_examples=300, deadline=None)
@given(tags)
def test_fix_bio_preserves_spans_and_is_idempotent(seq):
    fixed = fix_bio(seq)
    # fix_bio only rewrites orphan I- to B-: decode result is unchanged
    assert get_entities(fixed) == get_entities(seq)
    assert fix_bio(fixed) == fixed
    # after fixing, no orphan I- remains
    prev = "O"
    for t in fixed:
        if t.startswith("I-"):
            assert prev in (f"B-{t[2:]}", f"I-{t[2:]}")
        prev = t


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(TYPES), st.integers(min_value=1, max_value=8))
def test_build_bio_roundtrip(label, n):
    assert get_entities(build_bio_tags(label, n)) == [(label, 0, n - 1)]
