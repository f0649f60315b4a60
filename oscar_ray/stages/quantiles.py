"""Exact distributed grouped quantiles (percentile_disc semantics).

Computes, per group, the exact discrete quantiles of an integer value
column — the A7 stats work item (min/max/mean/median over query
results, `oscar-cmd/Workfunctions.cpp` stats printers) upgraded to a
distributed exact-percentile operator (per-language document-length
distributions are the canonical training-data use).

Semantics are pinned to SQL ``quantile_disc`` / ``percentile_disc``:
the q-quantile of n sorted values is element ``ceil(q*n) - 1``
(0-based). q is carried as an int64 MICRO fraction and the threshold
computed in pure integer arithmetic (``-(-q_u * n // 1_000_000)``) —
no float boundary can shift an index, and the rule is verified against
DuckDB across n in the pytest.

Distributed shape (one bounded exchange, the repo's routing pattern):

1. *Pre-aggregate* — ``map_batches`` collapses each batch to distinct
   ``(group, value, count)`` rows (doc-length values repeat heavily,
   so the exchange volume is ~cardinality, not ~rows) routed by
   ``hash(group) % P``.
2. *Per-part finalize* — every group lands wholly in one part;
   a vectorized lexsort + segment-cumsum + per-group searchsorted
   turns weighted (value, count) runs into exact quantiles. Groups
   are bounded (languages, sources), so per-part state is
   O(distinct values), never O(rows).

At extreme scale with UNBOUNDED value cardinality per group, swap
stage 1's exact counts for fixed-width histogram buckets (mergeable,
tree-reduce) — the exact path is right whenever distinct values per
group fit a partition (doc lengths, token counts, score buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.stages.dedup import hash_strings_u64

QS_MICRO = (250_000, 500_000, 750_000, 900_000, 990_000)
Q_NAMES = ("p25", "p50", "p75", "p90", "p99")
_SCALE = 1_000_000


def disc_index(q_micro: int, n: int) -> int:
    """0-based percentile_disc index: ceil(q*n) - 1, exact integers."""
    return max(0, min(n - 1, -((-q_micro * n) // _SCALE) - 1))


class _PairCountStage:
    """map_batches: batch -> distinct (group, value, c, part) rows."""

    def __init__(self, group_col: str, value_col: str, num_parts: int):
        self.group_col, self.value_col = group_col, value_col
        self.num_parts = num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        grp = batch[self.group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        denc = grp.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        vals = batch[self.value_col].to_numpy().astype(np.int64)
        if not len(vals):
            return pa.table(
                {
                    self.group_col: pa.array([], type=pa.string()),
                    "v": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        # distinct (group, value) within the batch via a packed key
        span = int(vals.max()) - int(vals.min()) + 1
        key = codes * np.int64(span) + (vals - int(vals.min()))
        uniq, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        u_code = (uniq // span).astype(np.int64)
        u_val = (uniq % span + int(vals.min())).astype(np.int64)
        u_grp = denc.dictionary.take(pa.array(u_code))
        part = (hash_strings_u64(u_grp) % np.uint64(self.num_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                self.group_col: u_grp,
                "v": pa.array(u_val),
                "c": pa.array(c),
                "part": pa.array(part),
            }
        )


def _part_quantiles(
    g: pa.Table, group_col: str, qs_micro: tuple, names: tuple
) -> pa.Table:
    """One routed part: weighted (value, count) runs -> exact
    per-group quantiles, fully vectorized."""
    grp = g[group_col]
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    denc = grp.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = np.asarray(denc.indices, dtype=np.int64)
    v = g["v"].to_numpy()
    c = g["c"].to_numpy()
    order = np.lexsort((v, codes))
    codes, v, c = codes[order], v[order], c[order]
    # combine duplicate (group, value) rows from different batches
    starts = np.flatnonzero(
        np.r_[True, (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])]
    )
    codes, v = codes[starts], v[starts]
    c = np.add.reduceat(c, starts)
    # group segments over the combined runs
    g_starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    g_ends = np.r_[g_starts[1:], len(codes)]
    cum = np.cumsum(c)
    seg_base = np.r_[0, cum[g_ends[:-1] - 1]]
    n_g = cum[g_ends - 1] - seg_base  # total count per group
    out = {
        group_col: denc.dictionary.take(pa.array(codes[g_starts])),
        "n": pa.array(n_g.astype(np.int64)),
    }
    for q_u, name in zip(qs_micro, names):
        # threshold rank (1-based) = ceil(q*n) in exact int arithmetic
        t = -((-int(q_u) * n_g) // _SCALE)
        t = np.maximum(t, 1)
        picks = np.empty(len(g_starts), dtype=np.int64)
        for i, (s, e) in enumerate(zip(g_starts, g_ends)):  # per GROUP,
            # not per row: groups are bounded (langs/sources)
            rel = cum[s:e] - seg_base[i]
            picks[i] = v[s + np.searchsorted(rel, t[i])]
        out[name] = pa.array(picks)
    return pa.table(out)


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs_micro: tuple = QS_MICRO,
    names: tuple = Q_NAMES,
    num_parts: int = 32,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """-> one row per group: (group, n, p25, p50, p75, p90, p99)."""
    pairs = ds.map_batches(
        _PairCountStage,
        fn_constructor_kwargs={
            "group_col": group_col,
            "value_col": value_col,
            "num_parts": num_parts,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return pairs.groupby("part").map_groups(
        lambda g: _part_quantiles(
            g.drop_columns(["part"]), group_col, tuple(qs_micro), tuple(names)
        ),
        batch_format="pyarrow",
    )
