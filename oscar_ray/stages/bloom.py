"""Bloom-filter first-seen dedup — the "BFF" pattern used by public
LLM-corpus pipelines (Dolma's Bloom-filter filtering; Soldaini et al.
2024): drop every later copy of a document (or paragraph) while holding
only a FIXED-SIZE bitmap per partition instead of the full seen-set.

Why it exists next to exact dedup (stages/dedup.py, hash groupby):
the exact path's state is O(distinct units); the Bloom path's state is
``m_bits/8`` bytes per partition, period — at 10^12 units you size
``m_bits`` to the false-positive budget (e.g. 2^33 bits = 1 GiB/part,
k=4, ~10^10 distinct/part -> FP ~0.6%) and memory stops scaling with
the corpus. The price is a deterministic, bounded rate of false
positives (a non-duplicate dropped); false NEGATIVES are impossible —
every true duplicate is always dropped (proof: all copies of a unit
hash-route to the same partition; the first occurrence always sets its
k bits, so any later copy either shares its chunk — caught by the exact
in-chunk unique — or tests the bitmap after those bits were set).

Distributed shape (the repo's standard discipline):
- ONE map_batches pass computes the pinned content hash
  (:func:`dedup.hash_strings_u64`) and the routing part — no shuffle of
  text, only (doc_id, h1) rows move;
- ONE bounded-cardinality ``groupby(part).map_groups`` exchange
  (num_parts <= 64, so Ray's per-group overhead is capped by design);
- per part: rows sorted by ``doc_id`` (global first-seen order — all
  copies co-locate, so per-part order IS global order for each unit),
  then processed in vectorized chunks: k bit positions per row by
  Kirsch-Mitzenmacher double hashing (h1 + i*h2, public technique),
  in-chunk duplicates caught exactly with ``np.unique``, cross-chunk
  membership by an all-k-bits-set gather, then one
  ``np.bitwise_or.at`` sets the chunk's bits. No Python loop over rows.

Determinism contract: output is a pure function of (corpus, m_bits, k,
num_parts, chunk_rows) — hashes are pinned, per-part order is sorted,
and chunk boundaries are pinned by ``chunk_rows``. (FP verdicts DO
depend on num_parts and chunk_rows: membership tests see the bitmap as
of the processing prefix. Both are pinned parameters, not tuning
knobs.) Unit identity is the 64-bit content hash — at 10^12 units
expect ~3e4 spurious 64-bit collisions, the same order as the Bloom FP
budget; byte-exact guarantees stay with stages/dedup.py.

Reference analog: the reference dedups exactly via its insertion-order
hash tables (`OsmKeyValueObjectStore` item dedup); this is the
memory-bounded streaming variant that brief requires at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from oscar_ray.stages.dedup import hash_strings_u64

_H2_SALT = np.uint64(0x94D049BB133111EB)


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _bloom_part(
    t: pa.Table,
    m_bits: int,
    k: int,
    chunk_rows: int,
    id_col: str,
    keep_rows: bool = False,
) -> pa.Table:
    """One partition: sorted first-seen pass over its (doc_id, h1) rows.

    ``keep_rows=False`` -> verdict table (id_col, kept int32);
    ``keep_rows=True`` -> the SURVIVING input rows themselves (sorted by
    id, routing columns dropped) — the filter shape pipelines consume.
    """
    t = t.combine_chunks()
    ids = t[id_col].to_numpy().astype(np.int64)
    h1 = t["h1"].to_numpy().astype(np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, h1 = ids[order], h1[order]
    h2 = _splitmix64_np(h1 ^ _H2_SALT) | np.uint64(1)  # odd -> full-period step
    mask = np.uint64(m_bits - 1)
    bitmap = np.zeros(m_bits >> 6, dtype=np.uint64)
    kept = np.zeros(len(ids), dtype=bool)
    for lo in range(0, len(ids), chunk_rows):
        hi = min(lo + chunk_rows, len(ids))
        ch1, ch2 = h1[lo:hi], h2[lo:hi]
        # exact within-chunk: only each value's first occurrence survives
        _, first_idx, inv = np.unique(ch1, return_index=True, return_inverse=True)
        is_first = first_idx[inv] == np.arange(hi - lo)
        # k bit positions per row (double hashing)
        with np.errstate(over="ignore"):
            pos = np.stack(
                [((ch1 + np.uint64(i) * ch2) & mask) for i in range(1, k + 1)]
            )  # (k, rows)
        word, bit = pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63))
        hit = ((bitmap[word] & bit) != 0).all(axis=0)
        kept[lo:hi] = is_first & ~hit
        # set bits for every first occurrence (kept OR false-positive):
        # later cross-chunk copies must always test positive
        fw, fb = word[:, is_first], bit[:, is_first]
        np.bitwise_or.at(bitmap, fw.ravel(), fb.ravel())
    if keep_rows:
        surv = t.take(pa.array(order[kept])) if kept.any() else t.slice(0, 0)
        return surv.drop_columns([c for c in ("h1", "part") if c in t.column_names])
    return pa.table(
        {
            id_col: pa.array(ids),
            "kept": pa.array(kept.astype(np.int32)),
        }
    )


def bloom_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 26,
    k: int = 4,
    num_parts: int = 16,
    chunk_rows: int = 1 << 16,
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """First-seen dedup verdict per unit -> Dataset(id_col, kept int32).

    ``kept == 1`` for the lowest-``id_col`` copy of each distinct
    ``text_col`` value (and for FP-free non-duplicates); later copies
    get 0. ``m_bits`` must be a power of two. To dedup paragraphs
    rather than documents, explode upstream (stages/spans.py) and pass
    the paragraph column.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"

    def route(batch: pa.Table) -> pa.Table:
        h1 = hash_strings_u64(batch[text_col])
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.cast(pa.int64()),
                "h1": pa.array(h1),
                "part": pa.array((h1 % np.uint64(num_parts)).astype(np.int32)),
            }
        )

    import functools

    return (
        ds.map_batches(route, batch_format="pyarrow")
        # bound the block count entering the exchange so sort pieces stay
        # past the ~100 KB inline threshold — tiny inline pieces flood the
        # driver heap (the joins.py range_count_join finding: ~1 GB driver
        # RSS at 2M+ units before coalescing)
        .repartition(coalesce_blocks or num_parts)
        .groupby("part")
        .map_groups(
            functools.partial(
                _bloom_part,
                m_bits=m_bits,
                k=k,
                chunk_rows=chunk_rows,
                id_col=id_col,
            ),
            batch_format="pyarrow",
        )
    )


def bloom_dedup_keep(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 26,
    k: int = 4,
    num_parts: int = 16,
    chunk_rows: int = 1 << 16,
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """First-seen dedup returning the SURVIVING rows with all their
    columns — the pinned-memory drop-in for
    :func:`dedup.exact_dedup_keep` (same keep-lowest-id rule; plus the
    bounded FP budget documented in the module header). All input
    columns travel through the one routed exchange, exactly like the
    exact path."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    import functools

    def route(batch: pa.Table) -> pa.Table:
        h1 = hash_strings_u64(batch[text_col])
        batch = batch.append_column("h1", pa.array(h1))
        return batch.append_column(
            "part", pa.array((h1 % np.uint64(num_parts)).astype(np.int32))
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        # see bloom_dedup: coalesce before the exchange (inline-piece
        # driver-RSS discipline)
        .repartition(coalesce_blocks or num_parts)
        .groupby("part")
        .map_groups(
            functools.partial(
                _bloom_part,
                m_bits=m_bits,
                k=k,
                chunk_rows=chunk_rows,
                id_col=id_col,
                keep_rows=True,
            ),
            batch_format="pyarrow",
        )
    )
