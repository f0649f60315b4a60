"""Exact duplicate-substring removal (ExactSubstr discipline).

Removes every re-occurrence of any W-token substring that appears
anywhere else in the corpus, at ARBITRARY alignment — the "ExactSubstr"
dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better", §4.1) re-expressed for Ray Data, at whitespace-token
granularity.  This is strictly finer than C4-style span dedup
(``stages/spans.py``): spans are non-overlapping stride-K chunks, so a
duplicated passage that straddles a span boundary survives span dedup;
here windows slide at stride 1, so any duplicated run of >= W tokens is
caught wherever it starts.

Semantics (first-occurrence-wins, like the rest of the dedup suite):

1. Every doc contributes a window at each token position
   ``p in [0, n_tokens - W]``.
2. Windows are keyed by content; all occurrences of a key except the
   globally first (ordered by ``(doc_id, pos)``) are *cut starts*.
3. A token is removed iff it is covered by any cut start's interval
   ``[pos, pos + W)`` — overlapping cut intervals merge naturally.
   Docs whose every token is cut are dropped (as C4 drops emptied
   pages); the rewritten corpus is ``(doc_id, text, n_cut)``.

Distributed shape — no driver-side state, two bounded exchanges:

- *Explode* ships only ``(key1, key2, doc_id, pos)`` rows (no window
  text — a window-text explode would be a WxN blowup).  One row per
  token position: the cost of stride-1 exactness, the same O(corpus)
  budget as Lee et al.'s suffix array, hash-partitioned by
  ``key1 % num_parts`` and skew-free by construction (identical windows
  must co-locate; everything else spreads uniformly).
- *First-occurrence* groups on the bounded ``part`` column (P <= 64, so
  Ray's per-group overhead never scales with window cardinality) and
  emits only the DUPLICATE rows — typically a small fraction of the
  corpus.
- *Rewrite* routes cut starts by ``doc_id % num_parts`` and unions them
  with the original docs (same schema; ``pos = -1`` marks a doc row),
  so each group holds a doc and its cuts; tokens are re-split there
  (cheaper than carrying window text through the exchange) and the
  covered mask is one diff-array cumsum.

Window keys are content hashes computable identically in DuckDB, with
ZERO per-position Python work: each distinct token gets an md5-lower-64
hash (the proven ``md5_number_lower % (2^61-1)`` oracle namespace,
vocab-bounded ``np.fromiter`` like ``doc_fingerprint``), and the window
key is a pair of position-weighted prefix-sum differences in the
mod-2^64 ring (numpy uint64 wrap arithmetic == DuckDB HUGEINT-exact
then ``% 2^64`` — a ring homomorphism, so wrap-at-every-step equals
exact-then-mod).  For window start p with doc-local token hashes h:

    key1 = sum_{j=0..W-1} (j+1)   * h[p+j]  (mod 2^64)
    key2 = sum_{j=0..W-1} (j+1)^2 * h[p+j]  (mod 2^64)

both derived from three per-doc cumulative arrays (S1 = cumsum h,
S2 = cumsum (i+1)h, S3 = cumsum (i+1)^2 h) by

    A = S1[p+W-1] - S1[p-1]   (range sums; same for B over S2, C over S3)
    key1 = B - p*A
    key2 = C - 2p*B + p^2*A

Two independent weightings over 64-bit md5-random token hashes make a
false key collision astronomically unlikely on non-adversarial data —
and the SQL oracle computes the SAME keys, so oracle parity is exact
regardless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.stages.spans import _md5_lower64


def _split_tokens(col) -> tuple[pa.ListArray, np.ndarray, np.ndarray]:
    """Split a string column on single spaces; return (list array,
    int64 offsets, per-row token counts)."""
    toks = pc.split_pattern(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, " "
    )
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    return toks, offsets, np.diff(offsets)


def _token_hashes_u64(values: pa.Array) -> np.ndarray:
    """Per-token md5-lower-64 hashes (uint64), md5 run once per DISTINCT
    token (vocab-bounded, the accepted doc_fingerprint budget)."""
    denc = pc.dictionary_encode(values)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    vocab_h = _md5_lower64(denc.dictionary.to_pylist()).astype(np.uint64)
    codes = np.asarray(denc.indices, dtype=np.int64)
    return vocab_h[codes]


def _window_keys(
    h: np.ndarray, offsets: np.ndarray, ntok: np.ndarray, w: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized sliding-window keys for every valid start position.

    Returns (doc_index, doc-local pos, key1, key2) with keys in the
    mod-2^64 ring (uint64 wrap == DuckDB exact-then-mod).
    """
    n = len(h)
    doc_starts = offsets[:-1].astype(np.uint64)
    iloc = np.arange(n, dtype=np.uint64) - np.repeat(doc_starts, ntok)
    w1 = iloc + np.uint64(1)
    z = np.zeros(1, dtype=np.uint64)
    c1 = np.concatenate([z, np.cumsum(h, dtype=np.uint64)])
    c2 = np.concatenate([z, np.cumsum(h * w1, dtype=np.uint64)])
    c3 = np.concatenate([z, np.cumsum(h * w1 * w1, dtype=np.uint64)])

    nwin = np.maximum(ntok - w + 1, 0)
    doc_of = np.repeat(np.arange(len(ntok), dtype=np.int64), nwin)
    win_base = np.concatenate([[0], np.cumsum(nwin)[:-1]])
    pos = np.arange(int(nwin.sum()), dtype=np.int64) - np.repeat(win_base, nwin)
    g = offsets[:-1][doc_of] + pos  # global start index

    a = c1[g + w] - c1[g]
    b = c2[g + w] - c2[g]
    c = c3[g + w] - c3[g]
    p = pos.astype(np.uint64)
    key1 = b - p * a
    key2 = c - np.uint64(2) * p * b + p * p * a
    return doc_of, pos, key1, key2


class SubstrExplodeStage:
    """map_batches actor: (doc_id, text) -> one keyed row per window
    start position (key1, key2, doc_id, pos, part)."""

    def __init__(
        self, w: int, num_parts: int, id_col: str = "doc_id", text_col: str = "text"
    ):
        self.w, self.num_parts = w, num_parts
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        toks, offsets, ntok = _split_tokens(batch[self.text_col])
        h = _token_hashes_u64(toks.values)
        doc_of, pos, key1, key2 = _window_keys(h, offsets, ntok, self.w)
        return pa.table(
            {
                self.id_col: pa.array(ids[doc_of], type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
                "key1": pa.array(key1, type=pa.uint64()),
                "key2": pa.array(key2, type=pa.uint64()),
                "part": pa.array(
                    (key1 % np.uint64(self.num_parts)).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )


def _dup_starts(g: pa.Table, id_col: str) -> pa.Table:
    """Within one routing part: every non-first occurrence of a
    (key1, key2) pair, ordered by (doc_id, pos), is a cut start."""
    k1 = g["key1"].to_numpy()
    k2 = g["key2"].to_numpy()
    d = g[id_col].to_numpy()
    p = g["pos"].to_numpy()
    order = np.lexsort((p, d, k2, k1))
    k1s, k2s = k1[order], k2[order]
    first = np.concatenate([[True], (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
    dup = order[~first]
    return pa.table(
        {
            id_col: pa.array(d[dup], type=pa.int64()),
            "pos": pa.array(p[dup], type=pa.int64()),
        }
    )


def _apply_cuts(g: pa.Table, w: int, id_col: str, text_col: str) -> pa.Table:
    """Within one doc-routed group: rows with pos == -1 carry doc text,
    rows with pos >= 0 are cut starts. Remove covered tokens, rebuild."""
    pos = g["pos"].to_numpy()
    d = g[id_col].to_numpy()
    doc_rows = pos < 0
    doc_ids = d[doc_rows]
    doc_order = np.argsort(doc_ids, kind="mergesort")
    doc_ids = doc_ids[doc_order]
    texts = (
        g[text_col].combine_chunks().take(pa.array(np.flatnonzero(doc_rows)[doc_order]))
    )
    toks, offsets, ntok = _split_tokens(texts)

    cut_doc = d[~doc_rows]
    cut_pos = pos[~doc_rows]
    di = np.searchsorted(doc_ids, cut_doc)  # every cut's doc is present
    starts = offsets[di] + cut_pos
    ends = offsets[di] + np.minimum(cut_pos + w, ntok[di])
    diff = np.zeros(int(offsets[-1]) + 1, dtype=np.int64)
    np.add.at(diff, starts, 1)
    np.add.at(diff, ends, -1)
    covered = np.cumsum(diff)[:-1] > 0

    keep = ~covered
    kept_per_doc = np.add.reduceat(keep.astype(np.int64), offsets[:-1])
    kept_per_doc[ntok == 0] = 0  # reduceat over empty slices reads past
    new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
    kept_vals = toks.values.filter(pa.array(keep))
    text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), kept_vals),
        " ",
    )
    n_cut = ntok - kept_per_doc
    alive = kept_per_doc > 0
    return pa.table(
        {
            id_col: pa.array(doc_ids, type=pa.int64()),
            text_col: text,
            "n_cut": pa.array(n_cut, type=pa.int64()),
        }
    ).filter(pa.array(alive))


def dedup_substrings(
    ds: ray.data.Dataset,
    w: int = 50,
    num_parts: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    rewrite: bool = True,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """ExactSubstr dedup: remove every re-occurrence of any W-token
    substring, at arbitrary alignment, keeping the globally first
    occurrence (ordered by ``(doc_id, pos)``).

    With ``rewrite=True`` returns the rewritten corpus
    ``(doc_id, text, n_cut)`` (fully-cut docs drop); otherwise returns
    the cut-start rows ``(doc_id, pos)`` themselves.
    """
    exploded = ds.map_batches(
        SubstrExplodeStage,
        fn_constructor_kwargs={
            "w": w,
            "num_parts": num_parts,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    cuts = exploded.groupby("part").map_groups(
        lambda g: _dup_starts(g.drop_columns(["part"]), id_col),
        batch_format="pyarrow",
    )
    if not rewrite:
        return cuts

    def docs_side(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        return pa.table(
            {
                "dpart": pa.array(ids % num_parts, type=pa.int64()),
                id_col: pa.array(ids, type=pa.int64()),
                "pos": pa.array(np.full(len(ids), -1), type=pa.int64()),
                text_col: t[text_col],
            }
        )

    def cuts_side(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        return pa.table(
            {
                "dpart": pa.array(ids % num_parts, type=pa.int64()),
                id_col: pa.array(ids, type=pa.int64()),
                "pos": t["pos"],
                text_col: pa.array([""] * len(ids), type=pa.string()),
            }
        )

    unioned = ds.map_batches(docs_side, batch_format="pyarrow").union(
        cuts.map_batches(cuts_side, batch_format="pyarrow")
    )
    # Bound the block count entering the doc-routed exchange: Ray's sort
    # shuffle cuts each map block into one piece per reduce partition
    # (reduce partitions == input blocks), and pieces under the ~100 KB
    # inline threshold bypass plasma and accumulate in the OWNER
    # process's heap — a many-small-blocks union would put ~corpus bytes
    # on the driver transiently. Coalescing to O(num_parts) blocks keeps
    # every piece plasma-sized; 64 distinct routing keys never need more
    # reduce partitions than that anyway. (Measured: 2M docs, 128-block
    # union -> 1.8 GB driver peak; coalesced -> plasma-resident.)
    unioned = unioned.repartition(num_parts)
    return unioned.groupby("dpart").map_groups(
        lambda g: _apply_cuts(g.drop_columns(["dpart"]), w, id_col, text_col),
        batch_format="pyarrow",
    )
