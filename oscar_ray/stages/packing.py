"""Sequence packing: map each doc to its window(s) in the concatenated
fixed-length token stream — the layout step before LLM pre-training.

Semantics (GPT-style document packing): concatenate every document's
token stream in ascending ``doc_id`` order and slice the stream into
consecutive ``budget``-token windows. For each doc the op reports where
its tokens land:

  ``cum_before``  exclusive prefix sum of token counts over doc_id order
  ``seq_id``      cum_before // budget   (window holding the first token)
  ``seq_offset``  cum_before %  budget   (position inside that window)
  ``n_seqs``      number of windows the doc spans (0 for empty docs)

This is a *global order statistic*, so the only honest distributed shape
is a prefix sum, done hierarchically:

1. a stateless ``map_batches`` counts tokens per doc (vectorized
   flatten + bincount — same tokenizer as the index build);
2. docs are assigned arithmetic range parts ``doc_id // part_span``
   (the same partitioner the index build uses — no shuffle key choice,
   no skew: parts are contiguous id ranges);
3. one small ``groupby(part).sum`` produces the per-part token totals —
   at 10^12 docs with ``part_span = 2^20`` that is ~10^6 rows, the ONLY
   thing the driver ever holds — and an exclusive scan over it gives
   each part's base offset, broadcast once via ``ray.put``;
4. a ``groupby(part).map_groups`` sorts each part by doc_id and adds a
   local vectorized cumsum to the broadcast base. Group payload is
   (doc_id, n_tokens) only — ≤ part_span × 16 B ≈ 16 MB per group —
   never the text.

The window arithmetic (integer div/mod of an exact int64 prefix sum) is
reproduced verbatim by a DuckDB window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens

DEFAULT_PART_SPAN = 1 << 20


def token_counts(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, n_tokens) for EVERY doc (zero-token docs included — packing
    must keep them so the id space stays dense for downstream joins)."""
    parent_a, _ = flatten_tokens(batch[text_col])
    n_tokens = np.bincount(np.asarray(parent_a), minlength=len(batch))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
        }
    )


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_span: int = DEFAULT_PART_SPAN,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Dataset -> (id, n_tokens, cum_before, seq_id, seq_offset, n_seqs)."""
    counts = ds.map_batches(
        token_counts,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).map_batches(
        lambda t: t.append_column(
            "part", pa.array(t[id_col].to_numpy() // part_span, type=pa.int64())
        ),
        batch_format="pyarrow",
    )
    # counts is consumed TWICE (per-part totals, then the finish
    # groupby); pin the small (id, n_tokens, part) table in the object
    # store so the upstream lineage — which may be a whole curation
    # graph — executes once, not once per pass
    counts = counts.materialize()

    # pass 1: per-part totals (small), exclusive scan on the driver
    part_rows = counts.groupby("part").sum("n_tokens").take_all()
    part_ids = np.array([r["part"] for r in part_rows], dtype=np.int64)
    part_sums = np.array([r["sum(n_tokens)"] for r in part_rows], dtype=np.int64)
    order = np.argsort(part_ids)
    part_ids, part_sums = part_ids[order], part_sums[order]
    base = np.concatenate([[0], np.cumsum(part_sums)[:-1]])
    base_ref = ray.put((part_ids, base))

    # pass 2: per-part local cumsum + broadcast base
    def finish(g: pa.Table) -> pa.Table:
        pids, bases = ray.get(base_ref)
        part = int(g["part"][0].as_py())
        b = int(bases[np.searchsorted(pids, part)])
        idx = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy()[idx]
        n = g["n_tokens"].to_numpy()[idx]
        cum_before = b + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        seq_id = cum_before // budget
        last = (cum_before + np.maximum(n, 1) - 1) // budget
        n_seqs = np.where(n > 0, last - seq_id + 1, 0)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n),
                "cum_before": pa.array(cum_before),
                "seq_id": pa.array(seq_id.astype(np.int64)),
                "seq_offset": pa.array((cum_before % budget).astype(np.int64)),
                "n_seqs": pa.array(n_seqs.astype(np.int64)),
            }
        )

    return counts.groupby("part").map_groups(finish, batch_format="pyarrow")
