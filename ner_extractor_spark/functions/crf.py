"""CRF decode algebra (SURVEY §2.8 M3/M4; reference semantics
``DistilBERT-CRF/src/modeling.py`` CRF head).

Pure functions over score matrices — the decode half of the CRF layer,
implemented and tested WITHOUT torch: inside the inference UDF they run
on the logits a forward pass produced (the only env-gated step).  The
training half (M2 partition-function loss) is training-only per SURVEY
and stays out of the inference engine.

``viterbi_decode`` — exact argmax path over emission + transition
scores (first-order linear-chain CRF), deterministic tie-break to the
smallest tag index.  ``greedy_decode`` — the no-transition argmax
baseline (M4).  Property-tested against brute-force path enumeration in
tests/test_crf.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def viterbi_decode(emissions: Sequence[Sequence[float]],
                   transitions: Sequence[Sequence[float]],
                   start: Optional[Sequence[float]] = None,
                   end: Optional[Sequence[float]] = None) -> List[int]:
    """Best tag path for one sequence.

    score(path) = Σ_t emissions[t][y_t] + Σ_t transitions[y_{t-1}][y_t]
                  (+ start[y_0] + end[y_{T-1}] when given).

    O(T·K²) dynamic program with backpointers; ties break to the
    SMALLEST tag index at every step (deterministic across runs and
    float-identical re-orderings of equal scores).
    """
    T = len(emissions)
    if T == 0:
        return []
    K = len(emissions[0])
    start = list(start) if start is not None else [0.0] * K
    end = list(end) if end is not None else [0.0] * K

    score = [start[k] + emissions[0][k] for k in range(K)]
    back: List[List[int]] = []
    for t in range(1, T):
        nxt = [0.0] * K
        ptr = [0] * K
        for j in range(K):
            best_i, best_s = 0, score[0] + transitions[0][j]
            for i in range(1, K):
                s = score[i] + transitions[i][j]
                if s > best_s:                 # strict: ties keep min i
                    best_i, best_s = i, s
            nxt[j] = best_s + emissions[t][j]
            ptr[j] = best_i
        score = nxt
        back.append(ptr)

    last, best = 0, score[0] + end[0]
    for k in range(1, K):
        s = score[k] + end[k]
        if s > best:
            last, best = k, s
    path = [last]
    for ptr in reversed(back):
        path.append(ptr[path[-1]])
    return path[::-1]


def greedy_decode(emissions: Sequence[Sequence[float]]) -> List[int]:
    """M4: per-position argmax, ties to the smallest index — the
    transition-free baseline the reference compares Viterbi against."""
    return [max(range(len(row)), key=lambda k: (row[k], -k))
            for row in emissions]


def path_score(path: Sequence[int],
               emissions: Sequence[Sequence[float]],
               transitions: Sequence[Sequence[float]],
               start: Optional[Sequence[float]] = None,
               end: Optional[Sequence[float]] = None) -> float:
    """Score of an explicit path (the brute-force oracle's kernel)."""
    if not path:
        return 0.0
    s = (start[path[0]] if start is not None else 0.0) + emissions[0][path[0]]
    for t in range(1, len(path)):
        s += transitions[path[t - 1]][path[t]] + emissions[t][path[t]]
    s += end[path[-1]] if end is not None else 0.0
    return s
