"""Subword-alignment algebra (SURVEY F10-F13; reference semantics
``DistilBERT-CRF/src/data_module.py:85-111`` tokenize-and-align,
``RoBERTa/NER_roberta.ipynb`` continuation-label variant).

These are PURE functions over ``word_ids`` — the per-subword word-index
list a fast tokenizer emits (None for special tokens).  They carry the
whole alignment contract; the only env-blocked piece of the transformer
path is the forward pass itself (``operators/ner.TransformerTagger``).
Inside the Arrow batch of that mapInPandas stage they run per sentence:

    sub_labels = align_labels_to_subwords(word_tags, enc.word_ids())
    ...model forward, argmax/viterbi over subword positions...
    word_preds = first_subword_inverse(enc.word_ids(), sub_preds)

Property-tested against a deterministic synthetic splitter in
tests/test_align.py — no tokenizer library needed to pin the algebra.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar, Union

T = TypeVar("T")

#: the loss-mask sentinel (reference ``ignore_index=-100``): positions a
#: CrossEntropy/CRF loss must skip — special tokens and (by default)
#: non-first subwords.
IGNORE_INDEX = -100


def align_labels_to_subwords(
        word_labels: Sequence[str],
        word_ids: Sequence[Optional[int]],
        label_all_subwords: bool = False) -> List[Union[str, int]]:
    """F10+F12: word-level BIO labels -> per-subword supervision.

    * special tokens (word_id None — CLS/SEP/PAD) get IGNORE_INDEX;
    * the FIRST subword of each word carries the word's label;
    * continuation subwords get IGNORE_INDEX by default, or (F11, the
      RoBERTa rule, ``label_all_subwords=True``) the word's label with
      B-X demoted to I-X so a split word never opens a second span.

    Output length == len(word_ids) — truncation/padding (F12) is already
    encoded in the word_ids the tokenizer produced.
    """
    out: List[Union[str, int]] = []
    prev: Optional[int] = None
    for wid in word_ids:
        if wid is None:
            out.append(IGNORE_INDEX)
        elif wid != prev:
            out.append(word_labels[wid])
        elif label_all_subwords:
            lab = word_labels[wid]
            out.append("I-" + lab[2:] if lab.startswith("B-") else lab)
        else:
            out.append(IGNORE_INDEX)
        prev = wid
    return out


def first_subword_inverse(word_ids: Sequence[Optional[int]],
                          subword_values: Sequence[T]) -> List[T]:
    """F10 inverse: per-subword model outputs -> word-level outputs by
    taking the value at each word's FIRST subword (reference prediction
    alignment).  Words whose subwords were all truncated away (F12) are
    absent; truncation only ever removes a suffix, so the result is the
    word-level prefix that survived.
    """
    firsts = {}
    prev: Optional[int] = None
    for wid, val in zip(word_ids, subword_values):
        if wid is not None and wid != prev:
            firsts.setdefault(wid, val)
        prev = wid
    n = len(firsts)
    if sorted(firsts) != list(range(n)):
        raise ValueError(f"non-contiguous word_ids: {sorted(firsts)[:8]}...")
    return [firsts[i] for i in range(n)]


def clean_bpe_token(token: str, marker: str = "Ġ") -> str:
    """F13: strip the GPT-2/RoBERTa leading-space marker (Ġ, U+0120)
    from a BPE piece — the display/surface-join cleanup."""
    return token[len(marker):] if token.startswith(marker) else token


def detokenize_bpe(tokens: Sequence[str], marker: str = "Ġ") -> str:
    """F13 surface reconstruction: Ġ marks 'preceded by a space'."""
    return "".join(
        (" " + t[len(marker):]) if t.startswith(marker) else t
        for t in tokens).lstrip(" ")


def fake_word_ids(token_lengths: Sequence[int],
                  max_length: Optional[int] = None,
                  pieces_per_word: int = 4) -> List[Optional[int]]:
    """Deterministic synthetic tokenizer for tests: word i yields
    ``1 + len_i // pieces_per_word`` subwords, wrapped in [CLS]/[SEP]
    (None), truncated to ``max_length`` keeping the trailing None —
    the same shape a HF fast tokenizer's ``word_ids()`` has."""
    ids: List[Optional[int]] = [None]
    for i, ln in enumerate(token_lengths):
        ids.extend([i] * (1 + ln // pieces_per_word))
    ids.append(None)
    if max_length is not None and len(ids) > max_length:
        ids = ids[:max_length - 1] + [None]
    return ids
