"""Posting-list set-operation kernels over sorted docid arrays.

The X1-X4 analog (SURVEY.md §2.7): the reference evaluates query trees
as lazy set ops over per-token CellQueryResults
(``oscar-cmd/DecelledACOT.cpp:73-95``) and plain ItemIndex ops
(``unite``/``symDiff``, ``Workfunctions.cpp:1353-1356``). Here every
operand is a pair of aligned numpy arrays ``(docids sorted unique
uint64, scores float64)`` and every op is a vectorized C-speed merge.

Score semantics (pinned, mirrored by the test oracle):
    AND     keep docs in both; score = left + right
    OR      union; score = left + right where both, else the one present
    ANDNOT  docs of left not in right; left scores
    XOR     symmetric difference; score from the containing side
"""

from __future__ import annotations

import numpy as np

ScoredSet = tuple[np.ndarray, np.ndarray]  # (docids uint64 sorted, scores f64)


def empty_set() -> ScoredSet:
    return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)


def intersect(a: ScoredSet, b: ScoredSet) -> ScoredSet:
    ids_a, sc_a = a
    ids_b, sc_b = b
    if not len(ids_a) or not len(ids_b):
        return empty_set()
    # probe the smaller side into the larger: O(m log n) instead of the
    # O((n+m)log(n+m)) concat-sort np.intersect1d pays — the head-AND-tail
    # case (65k-posting block vs a handful of docs) is ~1000x less work.
    # Score addition is commutative, so the swap is result-identical.
    if len(ids_a) > len(ids_b):
        ids_a, sc_a, ids_b, sc_b = ids_b, sc_b, ids_a, sc_a
    pos = np.searchsorted(ids_b, ids_a)
    pos[pos == len(ids_b)] = 0  # out-of-range probes can never match
    hit = ids_b[pos] == ids_a
    return ids_a[hit], sc_a[hit] + sc_b[pos[hit]]


def union(a: ScoredSet, b: ScoredSet) -> ScoredSet:
    ids_a, sc_a = a
    ids_b, sc_b = b
    if not len(ids_a):
        return ids_b.copy(), sc_b.copy()
    if not len(ids_b):
        return ids_a.copy(), sc_a.copy()
    ids = np.union1d(ids_a, ids_b)
    scores = np.zeros(len(ids), dtype=np.float64)
    pos_a = np.searchsorted(ids, ids_a)
    pos_b = np.searchsorted(ids, ids_b)
    scores[pos_a] += sc_a
    scores[pos_b] += sc_b
    return ids, scores


def andnot(a: ScoredSet, b: ScoredSet) -> ScoredSet:
    ids_a, sc_a = a
    ids_b, _ = b
    if not len(ids_a):
        return empty_set()
    if not len(ids_b):
        return ids_a.copy(), sc_a.copy()
    # searchsorted membership probe instead of np.isin's concat-sort;
    # probe whichever side is smaller (O(min log max) + one mask pass).
    if len(ids_b) < len(ids_a):
        pos = np.searchsorted(ids_a, ids_b)
        pos[pos == len(ids_a)] = 0
        drop = pos[ids_a[pos] == ids_b]
        keep = np.ones(len(ids_a), dtype=bool)
        keep[drop] = False
    else:
        pos = np.searchsorted(ids_b, ids_a)
        pos[pos == len(ids_b)] = 0
        keep = ids_b[pos] != ids_a
    return ids_a[keep], sc_a[keep]


def xor(a: ScoredSet, b: ScoredSet) -> ScoredSet:
    ids_a, sc_a = a
    ids_b, sc_b = b
    only_a = andnot(a, b)
    only_b = andnot(b, a)
    return union(only_a, only_b)


def multi_union(sets: list[ScoredSet]) -> ScoredSet:
    """k-way union, bit-identical to the left-assoc pairwise OR chain.

    Per doc, scores accumulate with ``+=`` in the ORDER the sets are
    given (== ascending-term expansion order), so every doc's float sum
    is the exact addition sequence the chain produces — but the ids
    merge ONCE (one sort over the concat) instead of E-1 growing
    pairwise unions (the O(E^2) cost a 256-way prefix/fuzzy expansion
    chain pays)."""
    sets = [s for s in sets if len(s[0])]
    if not sets:
        return empty_set()
    if len(sets) == 1:
        return sets[0][0].copy(), sets[0][1].copy()
    ids = np.unique(np.concatenate([s[0] for s in sets]))
    scores = np.zeros(len(ids), dtype=np.float64)
    for sid, ssc in sets:
        scores[np.searchsorted(ids, sid)] += ssc
    return ids, scores


def top_k(ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, docid asc) — the rank-identity tiebreak
    mirroring the reference's "docID order is rank order" invariant
    (``OsmKeyValueObjectStore.cpp:1339-1399``)."""
    n = len(ids)
    if n == 0 or k <= 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    if n > k * 4 and n > 1024:
        # tie-safe selection: every true top-k member has score >= the
        # k-th largest score, so the candidate set {score >= thresh}
        # (>= k entries) provably contains the answer
        thresh = np.partition(scores, n - k)[n - k]
        cand = np.flatnonzero(scores >= thresh)
        ids_c, scores_c = ids[cand], scores[cand]
    else:
        ids_c, scores_c = ids, scores
    order = np.lexsort((ids_c, -scores_c))[:k]
    return ids_c[order], scores_c[order]
