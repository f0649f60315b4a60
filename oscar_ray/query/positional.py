"""Positional query kernels: phrase adjacency and proximity windows.

Evaluates over the positions sidecar (``IndexBuildConfig.index_positions``,
build.py stage A/B ``pos``/``poss`` payloads). The reference engine has no
positional queries (its CellQueryResult algebra is set-only,
``oscar-cmd/DecelledACOT.cpp:73-95``); this is part of the beyond-reference
fulltext surface a web-scale engine needs.

Everything here is block-at-a-time and fully vectorized. The core trick:
within one posting block every docid is block-relative (< 2^block_span_bits)
and every token position fits 32 bits (doclen is int32), so one uint64 key

    key = (rel_docid << 32) | position

linearizes (doc, position) pairs into a single SORTED array per term, and

- **phrase** ("w0 w1 ... wm-1", adjacent in order) is an iterated sorted-set
  intersection: occurrences surviving step j satisfy ``key0 + j in keys_j``
  — one ``searchsorted`` membership probe per step (both sides are already
  sorted; never a re-sorting ``np.intersect1d``), no per-doc loop;
- **proximity** (all distinct terms within a span <= slop) is, for every
  candidate end position t (union of all terms' keys), the last occurrence
  of each term at or before t in the same doc (one ``searchsorted`` per
  term); the minimal covering window ending at t has span
  ``max_over_terms(t - last_t)`` — the doc matches iff any t has
  ``span <= slop``.

Per block, each term decodes ONCE (postings + positions), the candidate
docid set (the terms' AND) is computed first with sorted membership
probes, and keys are built only for candidate docs — a selective phrase
over a head term touches O(candidate occurrences) key work, not O(cf).

Positions never cross blocks (both queries are intra-doc and a doc lives in
exactly one block per term), so blocks evaluate independently — the same
property that makes block-max pruning and distributed serving work.
"""

from __future__ import annotations

import numpy as np

from oscar_ray.index.reader import IndexReader, PositionsUnavailable, TermPostings

_POS_BITS = np.uint64(32)


def _sorted_isect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED unique uint64 arrays — membership probe
    of `a` into `b`, no concatenate-and-sort (what np.intersect1d does)."""
    if not len(a) or not len(b):
        return a[:0]
    i = np.searchsorted(b, a)
    np.minimum(i, len(b) - 1, out=i)
    return a[b[i] == a]


def _ranges(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated (vectorized arange)."""
    total = int(lens.sum())
    if not total:
        return np.empty(0, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def _sorted_group_counts(rel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """np.unique(rel, return_counts=True) for an ALREADY-SORTED array —
    boundary diffs instead of a re-sort."""
    bnd = np.flatnonzero(np.diff(rel)) + 1
    starts = np.concatenate(([0], bnd))
    ends = np.concatenate((bnd, [len(rel)]))
    return rel[starts], ends - starts


def _common_blocks(tps: list[TermPostings]) -> np.ndarray:
    out = tps[0].block_ids
    for tp in tps[1:]:
        out = _sorted_isect(out, tp.block_ids)
    return out


def _check_positional(tps: list[TermPostings]) -> None:
    for tp in tps:
        if tp.df and not tp.has_positions:
            raise PositionsUnavailable(
                f"term {tp.term!r}: index was built without positions "
                "(IndexBuildConfig.index_positions)"
            )


def _candidate_keys(
    tp: TermPostings,
    i: int,
    base: int,
    cand: np.ndarray,
    decoded: tuple[np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    """Sorted (rel_docid<<32 | pos) keys for block i, RESTRICTED to the
    candidate docids — positions decode once for the block (the varint
    stream has no per-doc random access), but key construction and every
    downstream probe touch only candidate occurrences."""
    docids, tfs, _dls = decoded
    pos = tp.positions_block(i, tfs)
    if len(cand) == len(docids):  # dense: every doc is a candidate
        rel = (docids - np.uint64(base)).astype(np.uint64)
        return (np.repeat(rel, tfs.astype(np.int64)) << _POS_BITS) | pos
    sel = np.searchsorted(docids, cand)
    lens = tfs[sel].astype(np.int64)
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1].astype(np.int64), out=starts[1:])
    take = np.repeat(starts[sel], lens) + _ranges(lens)
    rel = (cand - np.uint64(base)).astype(np.uint64)
    return (np.repeat(rel, lens) << _POS_BITS) | pos[take]


def _map_blocks(blocks: list, fn, parallel: bool) -> list:
    """Evaluate independent posting blocks, optionally on a small thread
    pool (the per-query threadCount analog the engine already uses for
    leaf fetches): per-block work is numpy + parquet reads, both of
    which release the GIL. Results keep block order — score/rank
    determinism never depends on evaluation order."""
    if parallel and len(blocks) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(blocks))) as ex:
            return list(ex.map(fn, blocks))
    return [fn(b) for b in blocks]


def phrase_postings(
    reader: IndexReader, tokens: tuple[str, ...], parallel: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact-adjacency phrase match -> (docids, phrase_tf, doclen).

    ``phrase_tf`` counts occurrences of the full token sequence
    (overlapping starts counted), docids ascending over the whole corpus.
    """
    tps = [reader.postings(t) for t in tokens]
    empty = np.empty(0, dtype=np.uint64)
    if any(tp.df == 0 for tp in tps):
        return empty, empty.copy(), empty.copy()
    _check_positional(tps)
    span_bits = reader.block_span_bits
    one = np.uint64(1)

    def eval_block(b: int):
        base = int(b) << span_bits
        idxs = [int(np.searchsorted(tp.block_ids, b)) for tp in tps]
        decoded = [tp.decode_block(i) for tp, i in zip(tps, idxs)]
        cand = decoded[0][0]
        for d in decoded[1:]:
            cand = _sorted_isect(cand, d[0])
            if not len(cand):
                break
        if not len(cand):
            return None
        cur = _candidate_keys(tps[0], idxs[0], base, cand, decoded[0])
        for tp, i, d in zip(tps[1:], idxs[1:], decoded[1:]):
            if not len(cur):
                break
            keys_j = _candidate_keys(tp, i, base, cand, d)
            cur = _sorted_isect(cur + one, keys_j)
        if not len(cur):
            return None
        # cur holds the LAST token's keys of each full-phrase occurrence
        match_rel, tf = _sorted_group_counts(cur >> _POS_BITS)
        ids = match_rel + np.uint64(base)
        docids0, _tfs0, dls0 = decoded[0]
        dl = dls0[np.searchsorted(docids0, ids)]
        return ids, tf.astype(np.uint64), dl

    results = [
        r
        for r in _map_blocks(_common_blocks(tps).tolist(), eval_block, parallel)
        if r is not None
    ]
    if not results:
        return empty, empty.copy(), empty.copy()
    return (
        np.concatenate([r[0] for r in results]),
        np.concatenate([r[1] for r in results]),
        np.concatenate([r[2] for r in results]),
    )


def proximity_match_ids(
    reader: IndexReader, tokens: tuple[str, ...], slop: int,
    parallel: bool = False
) -> np.ndarray:
    """Docids where one occurrence of EVERY distinct token fits in a span
    of <= slop (max position - min position, unordered). Ascending."""
    tps = [reader.postings(t) for t in tokens]
    if any(tp.df == 0 for tp in tps):
        return np.empty(0, dtype=np.uint64)
    _check_positional(tps)
    span_bits = reader.block_span_bits
    slop_u = np.uint64(slop)

    def eval_block(b: int):
        base = int(b) << span_bits
        idxs = [int(np.searchsorted(tp.block_ids, b)) for tp in tps]
        decoded = [tp.decode_block(i) for tp, i in zip(tps, idxs)]
        cand = decoded[0][0]
        for d in decoded[1:]:
            cand = _sorted_isect(cand, d[0])
            if not len(cand):
                break
        if not len(cand):
            return None
        keys = [
            _candidate_keys(tp, i, base, cand, d)
            for tp, i, d in zip(tps, idxs, decoded)
        ]
        t_end = np.unique(np.concatenate(keys))
        all_ok = np.ones(len(t_end), dtype=bool)
        max_span = np.zeros(len(t_end), dtype=np.uint64)
        for k in keys:
            idx = np.searchsorted(k, t_end, side="right") - 1
            ok = idx >= 0
            last = k[np.maximum(idx, 0)]
            same_doc = (last >> _POS_BITS) == (t_end >> _POS_BITS)
            ok &= same_doc
            gap = t_end - last  # valid only where ok; low 32 bits = pos diff
            all_ok &= ok
            max_span = np.maximum(max_span, np.where(ok, gap, 0))
        hit = all_ok & (max_span <= slop_u)
        if not hit.any():
            return None
        match_rel, _ = _sorted_group_counts((t_end[hit] >> _POS_BITS))
        return match_rel + np.uint64(base)

    out = [
        r
        for r in _map_blocks(_common_blocks(tps).tolist(), eval_block, parallel)
        if r is not None
    ]
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out)
