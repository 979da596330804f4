"""F10-F13 alignment algebra: property tests against the synthetic
splitter (no tokenizer libs needed — the algebra is the contract)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ner_extractor_spark.functions.align import (IGNORE_INDEX,
                                                 align_labels_to_subwords,
                                                 clean_bpe_token,
                                                 detokenize_bpe,
                                                 fake_word_ids,
                                                 first_subword_inverse)

LABELS = ["O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC"]

sentence = st.lists(
    st.tuples(st.integers(min_value=1, max_value=12),      # token length
              st.sampled_from(LABELS)),
    min_size=1, max_size=40)


@settings(max_examples=200, deadline=None)
@given(sentence)
def test_first_subword_roundtrip(sent):
    lengths = [ln for ln, _ in sent]
    labels = [lab for _, lab in sent]
    wids = fake_word_ids(lengths)
    sub = align_labels_to_subwords(labels, wids)
    assert len(sub) == len(wids)
    # specials masked; round-trip through the inverse is exact
    assert sub[0] == IGNORE_INDEX and sub[-1] == IGNORE_INDEX
    assert first_subword_inverse(wids, sub) == labels


@settings(max_examples=200, deadline=None)
@given(sentence)
def test_label_all_subwords_roberta_rule(sent):
    lengths = [ln for ln, _ in sent]
    labels = [lab for _, lab in sent]
    wids = fake_word_ids(lengths)
    sub = align_labels_to_subwords(labels, wids, label_all_subwords=True)
    prev = None
    for wid, lab in zip(wids, sub):
        if wid is None:
            assert lab == IGNORE_INDEX
        elif wid != prev:
            assert lab == labels[wid]              # first subword: verbatim
        else:
            want = labels[wid]
            if want.startswith("B-"):              # F11: B-X -> I-X
                want = "I-" + want[2:]
            assert lab == want                     # continuations supervised
        prev = wid
    # a split B-X word never opens a second span: no B- on continuations
    assert all(not (isinstance(s, str) and s.startswith("B-"))
               for s, w, p in zip(sub, wids, [None] + list(wids[:-1]))
               if w is not None and w == p)


@settings(max_examples=200, deadline=None)
@given(sentence, st.integers(min_value=4, max_value=24))
def test_truncation_yields_word_prefix(sent, max_length):
    lengths = [ln for ln, _ in sent]
    labels = [lab for _, lab in sent]
    wids = fake_word_ids(lengths, max_length=max_length)
    assert len(wids) <= max_length
    sub = align_labels_to_subwords(labels, wids)
    got = first_subword_inverse(wids, sub)
    assert got == labels[:len(got)]                # prefix, nothing reordered


def test_clean_and_detokenize_bpe():
    assert clean_bpe_token("ĠParis") == "Paris"
    assert clean_bpe_token("Paris") == "Paris"
    assert detokenize_bpe(["The", "Ġquick", "Ġbro", "wn", "Ġfox"]) == \
        "The quick brown fox"
    assert detokenize_bpe(["ĠLeading"]) == "Leading"
