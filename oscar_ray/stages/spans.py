"""Span-level exact deduplication (C4-style repeated-span removal).

The corpus is chunked into non-overlapping K-token spans and every span
that repeats anywhere in the corpus is dropped except its first
occurrence (ordered by ``(doc_id, span_idx)``).  This is the C4
"three-sentence span" discipline (Raffel et al. 2020, §2.2) adapted to
whitespace-token text: dedup granularity finer than a document, coarser
than a shingle.

Distributed shape (no driver-side state at any point):

1. *Explode* — a ``map_batches`` stage splits each doc's text on single
   spaces, regroups the flat token buffer into K-token spans with pure
   offset arithmetic (one ``ListArray.from_arrays`` over the SAME value
   buffer — zero-copy), joins each span back to a string with
   ``pc.binary_join``, and hashes it md5-lower-64 → ``span_hash``
   (DuckDB ``md5_number_lower`` convention, mod 2^61-1, the same
   namespace discipline as ``doc_fingerprint``).  Rows carry a routing
   ``part = span_hash % num_parts``.
2. *First-occurrence* — ``groupby(part)`` (bounded cardinality ≤ 64, so
   Ray's per-group overhead never scales with span cardinality) and a
   vectorized lexsort ``(span_hash, doc_id, span_idx)`` keeps the head
   of each hash run.  Every occurrence of a span reaches exactly one
   part, so the decision is globally exact.
3. *(optional) Rewrite* — kept spans are routed by ``doc_id % num_parts``
   and re-joined into per-doc text, ordered by ``span_idx``.  Docs whose
   every span was dropped disappear (C4 drops emptied pages too).

At 100 TB the only all-to-all is the exploded (hash, doc, idx[, span])
rows — ~1/K of the token stream per row plus the span text only when
``rewrite=True`` — hash-partitioned and therefore skew-free by
construction (span hashes are uniform even when span CONTENT is
head-heavy: identical spans must meet, everything else spreads).

Per-span md5 runs as a bounded ``np.fromiter`` loop (n_tokens/K digests
per batch), the same budget accepted for ``doc_fingerprint``'s
per-distinct-token digests; everything else is Arrow/numpy kernels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

SPAN_MOD = (1 << 61) - 1  # == text_analysis.FP_MOD (md5-lower-64 namespace)


def _md5_lower64(strings: list[str], mod: int = SPAN_MOD) -> np.ndarray:
    """DuckDB ``md5_number_lower(s)::HUGEINT % mod``: lower 8 digest
    bytes, little-endian (proven equivalent by the fingerprint oracle)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")
            % mod
            for s in strings
        ),
        dtype=np.int64,
        count=len(strings),
    )


class SpanExplodeStage:
    """map_batches actor: (doc_id, text) -> one row per K-token span."""

    def __init__(
        self,
        k: int,
        num_parts: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        carry_text: bool = False,
        carry_cols: tuple[str, ...] = (),
    ):
        self.k, self.num_parts = k, num_parts
        self.id_col, self.text_col, self.carry_text = id_col, text_col, carry_text
        self.carry_cols = carry_cols  # per-doc columns repeated onto span rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        col = batch[self.text_col]
        toks = pc.split_pattern(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, " "
        )
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        ntok = np.diff(offsets)  # split('') == [''] so ntok >= 1 always
        k = self.k
        nspan = (ntok + k - 1) // k
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), nspan)
        span_idx = np.arange(nspan.sum(), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nspan)[:-1]]), nspan
        )
        # span start offsets are contiguous across docs (same value
        # buffer), so appending the global end yields valid offsets
        span_start = offsets[doc_of] + span_idx * k
        span_offsets = np.append(span_start, offsets[-1])
        span_list = pa.ListArray.from_arrays(
            pa.array(span_offsets, type=pa.int32()), toks.values
        )
        spans = pc.binary_join(span_list, " ")
        h = _md5_lower64(spans.to_pylist())
        cols = {
            self.id_col: pa.array(ids[doc_of], type=pa.int64()),
            "span_idx": pa.array(span_idx, type=pa.int64()),
            "span_hash": pa.array(h, type=pa.int64()),
            "part": pa.array(h % self.num_parts, type=pa.int64()),
        }
        if self.carry_text:
            cols["span"] = spans
        take = pa.array(doc_of)
        for c in self.carry_cols:
            col_c = batch[c]
            cols[c] = (
                col_c.combine_chunks() if isinstance(col_c, pa.ChunkedArray) else col_c
            ).take(take)
        return pa.table(cols)


def _first_occurrence(g: pa.Table, id_col: str) -> pa.Table:
    h = g["span_hash"].to_numpy()
    d = g[id_col].to_numpy()
    i = g["span_idx"].to_numpy()
    order = np.lexsort((i, d, h))
    hs = h[order]
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    return g.take(pa.array(np.sort(order[first]))).drop_columns(["part"])


def dedup_spans(
    ds: ray.data.Dataset,
    k: int = 8,
    num_parts: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    rewrite: bool = False,
    concurrency: int = 4,
    carry_cols: tuple[str, ...] = (),
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """Global first-occurrence dedup of K-token spans.

    Returns kept ``(doc_id, span_idx, span_hash)`` rows, or — with
    ``rewrite=True`` — the corpus rewritten as ``(doc_id, text,
    n_spans)`` with duplicate spans removed (fully-emptied docs drop).
    ``carry_cols`` names per-doc columns to thread through the rewrite
    (repeated onto span rows, re-collapsed per doc on reassembly).

    ``coalesce_blocks`` (default ``num_parts``) bounds the block count
    entering each text-carrying shuffle.  Ray's sort shuffle cuts each
    of B map blocks into B reduce pieces, and pieces under the ~100 KB
    inline threshold bypass plasma and land on the owner heap — so the
    piece size is ~corpus_bytes / B².  Size it to keep pieces ≥ ~0.5 MB:
    ``B ≈ sqrt(corpus_bytes / 5e5)``, clamped to [8, num_parts].  At
    100-TB scale the default is always plasma-sized; only small corpora
    need a lower value.
    """
    cb = coalesce_blocks or num_parts
    exploded = ds.map_batches(
        SpanExplodeStage,
        fn_constructor_kwargs={
            "k": k,
            "num_parts": num_parts,
            "id_col": id_col,
            "text_col": text_col,
            "carry_text": rewrite,
            "carry_cols": carry_cols if rewrite else (),
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if rewrite:
        # span rows carry text here: bound block count so sort sub-blocks
        # exceed Ray's ~100 KB inline threshold and stay plasma-resident
        # (see stages/substr.py rewrite note)
        exploded = exploded.repartition(cb)
    kept = exploded.groupby("part").map_groups(
        lambda g: _first_occurrence(g, id_col), batch_format="pyarrow"
    )
    if not rewrite:
        return kept

    def tag_doc_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dpart", pa.array(t[id_col].to_numpy() % num_parts, type=pa.int64())
        )

    def reassemble(g: pa.Table) -> pa.Table:
        d = g[id_col].to_numpy()
        i = g["span_idx"].to_numpy()
        order = np.lexsort((i, d))
        ds_s = d[order]
        spans = g["span"].combine_chunks().take(pa.array(order))
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ds_s)) + 1])
        bounds = np.append(starts, len(ds_s))
        span_list = pa.ListArray.from_arrays(
            pa.array(bounds, type=pa.int32()), spans
        )
        cols = {
            id_col: pa.array(ds_s[starts], type=pa.int64()),
            text_col: pc.binary_join(span_list, " "),
            "n_spans": pa.array(np.diff(bounds), type=pa.int64()),
        }
        first_rows = pa.array(order[starts])
        for c in carry_cols:
            cols[c] = g[c].combine_chunks().take(first_rows)
        return pa.table(cols)

    return (
        kept.map_batches(tag_doc_part, batch_format="pyarrow")
        .repartition(cb)  # same inline-threshold discipline
        .groupby("dpart")
        .map_groups(lambda g: reassemble(g.drop_columns(["dpart"])), batch_format="pyarrow")
    )
