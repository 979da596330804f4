"""M1-shape linear tagger (forward + align + decode end-to-end, no
torch): truncation semantics, realign consistency, batch/partition
invariance, exactness of the dyadic emission algebra."""

import hashlib

from ner_extractor_spark.functions.align import (fake_word_ids,
                                                 first_subword_inverse)
from ner_extractor_spark.functions.crf import path_score, viterbi_decode
from ner_extractor_spark.operators.ner import (LINEAR_FEAT_DIM,
                                               VITERBI_TRANSITIONS,
                                               linear_tag_words,
                                               linear_tagger_weights)

SENTS = "url string, sent_id int, tokens array<string>"


def _sents(spark):
    rows = [
        ("u1", 0, ["alice", "met", "bob"]),
        ("u1", 1, ["a"]),
        # long sentence with long words -> truncation (F12): each word
        # yields 1 + len//4 = 4 pieces, 10 words = 40 inner pieces > 22
        ("u2", 0, [f"verylongword{i:02d}" for i in range(10)]),
    ]
    return spark.createDataFrame(rows, SENTS)


def _replica(tokens, n_tags=3, max_length=24):
    """Pure-Python replica of one sentence through the pipeline."""
    W = linear_tagger_weights(n_tags)
    pieces = ["[CLS]"]
    for tok in tokens:
        pieces.append(tok)
        pieces.extend(f"{tok}##{j}" for j in range(1, 1 + len(tok) // 4))
    pieces.append("[SEP]")
    if len(pieces) > max_length:
        pieces = pieces[:max_length - 1] + ["[SEP]"]
    ems = []
    for p in pieces:
        h = hashlib.md5(p.encode()).hexdigest()
        x = [int(c, 16) for c in h[:LINEAR_FEAT_DIM]]
        ems.append([sum(x[f] * W[f][k] for f in range(LINEAR_FEAT_DIM))
                    / 4096.0 for k in range(n_tags)])
    trans = [row[:n_tags] for row in VITERBI_TRANSITIONS[:n_tags]]
    path = viterbi_decode(ems, trans)
    wids = fake_word_ids([len(t) for t in tokens], max_length=max_length)
    words = first_subword_inverse(wids, path)
    return ",".join(map(str, words)), len(words), path_score(path, ems, trans)


def test_linear_tagger_matches_replica_and_truncates(spark):
    got = {(r["url"], r["sent_id"]): (r["word_tags"], r["n_words"], r["score"])
           for r in linear_tag_words(_sents(spark)).collect()}
    assert got[("u1", 0)] == _replica(["alice", "met", "bob"])
    assert got[("u1", 1)] == _replica(["a"])
    long_toks = [f"verylongword{i:02d}" for i in range(10)]
    tags, n_words, score = _replica(long_toks)
    assert got[("u2", 0)] == (tags, n_words, score)
    # truncation really happened: only the surviving word prefix tagged
    assert n_words < len(long_toks)
    assert len(tags.split(",")) == n_words
    # exactness: scores are dyadic rationals (multiples of 1/4096)
    for _, _, s in got.values():
        assert (s * 4096) == int(s * 4096)


def test_linear_tagger_partition_invariance(spark):
    d = _sents(spark)
    a = sorted(map(tuple, linear_tag_words(d).collect()))
    b = sorted(map(tuple, linear_tag_words(d.repartition(5)).collect()))
    assert a == b
