"""M3/M4 decode algebra: Viterbi vs brute-force enumeration (property),
greedy baseline, deterministic tie-breaks."""

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from ner_extractor_spark.functions.crf import (greedy_decode, path_score,
                                               viterbi_decode)

# dyadic rationals (k/256): every partial sum is exactly representable,
# so the DP's accumulation order and path_score's agree bit-for-bit —
# with arbitrary floats the two legitimate summation orders differ by
# ulps and near-ties flip (that is float physics, not a decode bug)
scores = st.integers(min_value=-1280, max_value=1280).map(lambda k: k / 256)


@st.composite
def problem(draw):
    T = draw(st.integers(min_value=1, max_value=5))
    K = draw(st.integers(min_value=1, max_value=4))
    em = [[draw(scores) for _ in range(K)] for _ in range(T)]
    tr = [[draw(scores) for _ in range(K)] for _ in range(K)]
    use_se = draw(st.booleans())
    start = [draw(scores) for _ in range(K)] if use_se else None
    end = [draw(scores) for _ in range(K)] if use_se else None
    return em, tr, start, end


@settings(max_examples=200, deadline=None)
@given(problem())
def test_viterbi_matches_bruteforce(p):
    em, tr, start, end = p
    T, K = len(em), len(em[0])
    got = viterbi_decode(em, tr, start, end)
    # brute force: max score, ties to lexicographically smallest path —
    # exactly the DP's per-step min-index tie-break
    best = max(itertools.product(range(K), repeat=T),
               key=lambda path: (path_score(path, em, tr, start, end),
                                 tuple(-x for x in path)))
    assert path_score(got, em, tr, start, end) == \
        path_score(best, em, tr, start, end)


def test_viterbi_nondyadic_near_tie():
    """Hypothesis-discovered regression (2026-08-16 patch, now folded in):
    with NON-dyadic scores (2.999999999999999 vs 1.9 + 2.0 - 1.9 + ...)
    the DP's and brute force's summation orders legitimately differ by
    ulps and the argmax path can flip.  The decode contract for such
    inputs is score-optimality up to float accumulation error — assert
    isclose, not equality (the exact-equality property above is what the
    dyadic strategy guarantees)."""
    em = [[-1.0, -1.9, 0.0, 0.0],
          [0.0, 0.0, 0.0, 2.999999999999999],
          [0.0, 0.0, 0.0, 0.0],
          [0.0, 0.0, 0.0, 0.0]]
    tr = [[0.0, 0.0, 0.0, 0.0],
          [0.0, 0.0, 0.0, 1.9],
          [0.0, 2.0, 0.0, 0.0],
          [0.0, 0.0, 0.0, 0.0]]
    got = viterbi_decode(em, tr)
    best = max(itertools.product(range(4), repeat=4),
               key=lambda path: (path_score(path, em, tr),
                                 tuple(-x for x in path)))
    import math
    assert math.isclose(path_score(got, em, tr),
                        path_score(best, em, tr), rel_tol=1e-12)


def test_tie_break_smallest_index():
    em = [[1.0, 1.0], [1.0, 1.0]]
    tr = [[0.0, 0.0], [0.0, 0.0]]
    assert viterbi_decode(em, tr) == [0, 0]
    assert greedy_decode(em) == [0, 0]


def test_transitions_override_emissions():
    # emission prefers tag 1 at t=1, but the 0->1 transition is so
    # punitive that staying on 0 wins — the thing greedy gets wrong
    em = [[2.0, 0.0], [0.0, 1.0]]
    tr = [[0.0, -10.0], [0.0, 0.0]]
    assert viterbi_decode(em, tr) == [0, 0]
    assert greedy_decode(em) == [0, 1]


def test_empty_and_single():
    assert viterbi_decode([], [[0.0]]) == []
    assert viterbi_decode([[0.5, 1.5]], [[0, 0], [0, 0]]) == [1]
