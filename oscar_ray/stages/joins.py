"""Custom join operators Ray Data lacks: as-of join (time-series).

The brief's "custom operators" row: implemented as a composition of
hash-partition routing + per-partition vectorized merge (option (a) of
the custom-operator ladder) — the same explicit-exchange pattern as the
rest of the repo. Partitioning assumption: both sides of one join key
land in the same partition (key-hash routing), and per-partition data
fits a task (keys are hash-scattered, so a partition holds ~N/P keys).

Semantics (ASOF inner, DuckDB-compatible): for every left row, the
single right row with the same key and the greatest ``right.ts <=
left.ts``; left rows with no such right row are dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _part_col(x: np.ndarray, num_parts: int) -> np.ndarray:
    from oscar_ray.stages.dedup import _splitmix64

    with np.errstate(over="ignore"):
        return (_splitmix64(x.astype(np.uint64)) % np.uint64(num_parts)).astype(np.int64)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_prefix: str = "prev_",
    num_parts: int = 16,
) -> ray.data.Dataset:
    """ASOF inner join -> left_cols + prefixed right_cols.

    Distributed shape: both sides route by hash(key) (one exchange);
    within a partition the match is ONE lexsort + forward-fill — sort
    all rows by (key, ts, side) with right rows ordered before left on
    ties (inclusive <=), propagate the last-seen right row index with
    maximum.accumulate, validate the key matches. No per-row Python.
    """

    def tag(ds: ray.data.Dataset, cols: list[str], side: int) -> ray.data.Dataset:
        def f(t: pa.Table) -> pa.Table:
            out = {
                "__key": t[key].combine_chunks().cast(pa.int64()),
                "__ts": t[ts].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()),
                "__side": pa.array(np.full(t.num_rows, side, dtype=np.int64)),
                "part": pa.array(_part_col(t[key].to_numpy(), num_parts)),
            }
            for c in cols:
                out[f"__{side}_{c}"] = t[c]
            return pa.table(out)

        return ds.map_batches(f, batch_format="pyarrow")

    lcols = [c for c in left_cols if c not in (key, ts)]
    rcols = [c for c in right_cols if c not in (key, ts)]
    merged = tag(left, lcols, 1).union(tag(right, rcols, 0))

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        k = g["__key"].to_numpy()
        t = g["__ts"].to_numpy()
        side = g["__side"].to_numpy()
        order = np.lexsort((side, t, k))  # right (0) before left (1) on ties
        k_s, t_s, side_s = k[order], t[order], side[order]
        n = len(k_s)
        idx = np.arange(n)
        last_right = np.where(side_s == 0, idx, -1)
        last_right = np.maximum.accumulate(last_right)
        is_left = side_s == 1
        match = last_right[is_left]
        valid = match >= 0
        # matched right row must share the key (accumulate crosses key runs)
        valid[valid] &= k_s[match[valid]] == k_s[is_left][valid]
        li = order[is_left][valid]  # original row index of surviving lefts
        ri = order[match[valid]]
        out = {}
        out[key] = k[li]
        out[ts] = g["__ts"].to_numpy()[li]
        for c in lcols:
            out[c] = g[f"__1_{c}"].to_numpy()[li]
        out[f"{right_prefix}{ts}"] = t[ri]
        for c in rcols:
            out[f"{right_prefix}{c}"] = g[f"__0_{c}"].to_numpy()[ri]
        return pd.DataFrame(out)

    return merged.groupby("part").map_groups(join_partition, batch_format="pandas")
