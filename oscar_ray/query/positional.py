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

linearizes (doc, position) pairs into a single sorted array per term, and

- **phrase** ("w0 w1 ... wm-1", adjacent in order) is an iterated sorted-set
  intersection: occurrences surviving step j satisfy ``key0 + j in keys_j``
  — ``np.intersect1d`` per step, no per-doc loop;
- **proximity** (all distinct terms within a span <= slop) is, for every
  candidate end position t (union of all terms' keys), the last occurrence
  of each term at or before t in the same doc (one ``searchsorted`` per
  term); the minimal covering window ending at t has span
  ``max_over_terms(t - last_t)`` — the doc matches iff any t has
  ``span <= slop``.

Positions never cross blocks (both queries are intra-doc and a doc lives in
exactly one block per term), so blocks evaluate independently — the same
property that makes block-max pruning and distributed serving work.
"""

from __future__ import annotations

from functools import reduce

import numpy as np

from oscar_ray.index.reader import IndexReader, PositionsUnavailable, TermPostings

_POS_BITS = np.uint64(32)


def _block_keys(
    tp: TermPostings, i: int, block_base: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (docids, tfs, dls, keys) for block index i of one term.

    ``keys`` is sorted ascending by construction: docids ascend within a
    block and positions ascend within a doc.
    """
    docids, tfs, dls = tp.decode_block(i)
    pos = tp.positions_block(i, tfs)
    rel = docids - np.uint64(block_base)
    keys = (np.repeat(rel, tfs.astype(np.int64)) << _POS_BITS) | pos
    return docids, tfs, dls, keys


def _common_blocks(tps: list[TermPostings]) -> np.ndarray:
    return reduce(lambda a, b: np.intersect1d(a, b, assume_unique=True),
                  [tp.block_ids for tp in tps])


def _check_positional(tps: list[TermPostings]) -> None:
    for tp in tps:
        if tp.df and not tp.has_positions:
            raise PositionsUnavailable(
                f"term {tp.term!r}: index was built without positions "
                "(IndexBuildConfig.index_positions)"
            )


def phrase_postings(
    reader: IndexReader, tokens: tuple[str, ...]
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
    out_ids: list[np.ndarray] = []
    out_tf: list[np.ndarray] = []
    out_dl: list[np.ndarray] = []
    one = np.uint64(1)
    for b in _common_blocks(tps).tolist():
        base = int(b) << span_bits
        idxs = [int(np.searchsorted(tp.block_ids, b)) for tp in tps]
        # cheap docid pre-intersection: skip position decode when the
        # block has no doc containing every token
        doc_sets = [tp.decode_block(i)[0] for tp, i in zip(tps, idxs)]
        cand = reduce(
            lambda a, c: np.intersect1d(a, c, assume_unique=True), doc_sets
        )
        if not len(cand):
            continue
        docids0, tfs0, dls0, cur = _block_keys(tps[0], idxs[0], base)
        for tp, i in zip(tps[1:], idxs[1:]):
            if not len(cur):
                break
            keys_j = _block_keys(tp, i, base)[3]
            cur = np.intersect1d(cur + one, keys_j, assume_unique=True)
        if not len(cur):
            continue
        # cur holds the LAST token's keys of each full-phrase occurrence
        rel = cur >> _POS_BITS
        match_rel, tf = np.unique(rel, return_counts=True)
        ids = match_rel + np.uint64(base)
        dl = dls0[np.searchsorted(docids0, ids)]
        out_ids.append(ids)
        out_tf.append(tf.astype(np.uint64))
        out_dl.append(dl)
    if not out_ids:
        return empty, empty.copy(), empty.copy()
    return (
        np.concatenate(out_ids),
        np.concatenate(out_tf),
        np.concatenate(out_dl),
    )


def proximity_match_ids(
    reader: IndexReader, tokens: tuple[str, ...], slop: int
) -> np.ndarray:
    """Docids where one occurrence of EVERY distinct token fits in a span
    of <= slop (max position - min position, unordered). Ascending."""
    tps = [reader.postings(t) for t in tokens]
    if any(tp.df == 0 for tp in tps):
        return np.empty(0, dtype=np.uint64)
    _check_positional(tps)
    span_bits = reader.block_span_bits
    slop_u = np.uint64(slop)
    out: list[np.ndarray] = []
    for b in _common_blocks(tps).tolist():
        base = int(b) << span_bits
        idxs = [int(np.searchsorted(tp.block_ids, b)) for tp in tps]
        doc_sets = [tp.decode_block(i)[0] for tp, i in zip(tps, idxs)]
        cand = reduce(
            lambda a, c: np.intersect1d(a, c, assume_unique=True), doc_sets
        )
        if not len(cand):
            continue
        keys = [_block_keys(tp, i, base)[3] for tp, i in zip(tps, idxs)]
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
        if hit.any():
            match_rel = np.unique(t_end[hit] >> _POS_BITS)
            out.append(match_rel + np.uint64(base))
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out)
