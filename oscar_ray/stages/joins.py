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


def sessionize(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    gap_us: int = 43_200_000_000,
    num_parts: int = 16,
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessionization: consecutive events of one key belong to
    the same session while the inter-event gap is <= ``gap_us``; a larger
    gap (or the key's first event) opens a new session.  The classic
    clickstream/sequence-building op (the reference's per-item grouped
    scans have no direct analog; this is the webtext-pipeline windowed
    aggregate the brief's "windowed aggregate" row asks for).

    -> (key, session_idx [1-based per key], session_start_us,
    session_end_us, n_events, sum_value_micro).

    Distributed shape: ONE hash(key) exchange (every event of a key in
    one partition — the same partitioning assumption as asof_join), then
    a per-partition vectorized pass: lexsort (key, ts, id), boundary
    flags from diff, per-session aggregates via add.reduceat.  Session
    identity never crosses partitions, so the result is globally exact.
    ``sum_value_micro = sum(floor(value * 1e6))`` keeps the aggregate an
    order-independent integer (the lm.py micro discipline).
    """

    def tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": t[key].combine_chunks().cast(pa.int64()),
                "__ts": t[ts].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()),
                "__id": t[id_col].combine_chunks().cast(pa.int64()),
                "__vmicro": pa.array(
                    np.floor(t[value].to_numpy(zero_copy_only=False) * 1e6).astype(
                        np.int64
                    )
                ),
                "part": pa.array(_part_col(t[key].to_numpy(), num_parts)),
            }
        )

    def sess_partition(g: pa.Table) -> pa.Table:
        k = g["__key"].to_numpy()
        t = g["__ts"].to_numpy()
        i = g["__id"].to_numpy()
        v = g["__vmicro"].to_numpy()
        if len(k) == 0:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    "session_idx": pa.array([], type=pa.int64()),
                    "session_start_us": pa.array([], type=pa.int64()),
                    "session_end_us": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value_micro": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((i, t, k))
        ks, ts_, vs = k[order], t[order], v[order]
        n = len(ks)
        new_key = np.concatenate([[True], ks[1:] != ks[:-1]])
        is_new = new_key | np.concatenate([[True], (ts_[1:] - ts_[:-1]) > gap_us])
        starts = np.flatnonzero(is_new)
        bounds = np.append(starts, n)
        # 1-based session ordinal per key: global session number minus the
        # session number at the key's first row
        sess_global = np.cumsum(is_new) - 1
        key_first_sess = sess_global[np.flatnonzero(new_key)]
        key_id = np.cumsum(new_key) - 1
        sess_idx = sess_global[starts] - key_first_sess[key_id[starts]] + 1
        return pa.table(
            {
                key: pa.array(ks[starts], type=pa.int64()),
                "session_idx": pa.array(sess_idx, type=pa.int64()),
                "session_start_us": pa.array(ts_[starts], type=pa.int64()),
                "session_end_us": pa.array(ts_[bounds[1:] - 1], type=pa.int64()),
                "n_events": pa.array(np.diff(bounds), type=pa.int64()),
                "sum_value_micro": pa.array(
                    np.add.reduceat(vs, starts), type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        # bound the block count entering the exchange so sort pieces stay
        # past the ~100 KB inline threshold (see range_count_join note)
        .repartition(coalesce_blocks or num_parts)
        .groupby("part")
        .map_groups(sess_partition, batch_format="pyarrow")
    )


def range_count_join(
    intervals: ray.data.Dataset,
    events: ray.data.Dataset,
    key: str,
    id_col: str,
    lo_col: str,
    hi_col: str,
    ts: str = "ts",
    value: str = "value",
    num_parts: int = 16,
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """Range (interval) join: for every interval row, the count and
    integer-micro value sum of same-key events with ``lo <= ts < hi``
    (half-open). LEFT semantics — intervals with no match keep a zero
    row. -> (id_col, n_events, sum_value_micro).

    ``coalesce_blocks`` (default ``num_parts``) bounds the block count
    entering the exchange: Ray's sort shuffle cuts each of B map blocks
    into B reduce pieces, and pieces under the ~100 KB inline threshold
    bypass plasma onto the owner heap — at 40M tagged rows in 512 blocks
    that is 262k ~10 KB pieces and an 87 s sort (measured); coalesced to
    64 blocks the pieces are plasma-sized (the stages/spans.py
    discipline).

    The brief's "range join" custom operator. Distributed shape: ONE
    hash(key) exchange co-locates a key's intervals and events; within a
    partition the join is O((n+m) log n) with NO per-row Python — the
    rank trick: replace ts by its left-insertion rank in the partition's
    sorted event-ts array, so the composite (user_index, rank) fits an
    int64 and BOTH interval bounds become two vectorized searchsorted
    probes against the composite-sorted event order; counts are index
    differences and value sums are prefix-sum differences. Every
    comparison is on exact integers (timestamps in us, values floored
    to micros), so the result is hash-exact against the SQL oracle.
    """

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key": t[key].combine_chunks().cast(pa.int64()),
                "__ts": t[ts].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()),
                "__vmicro": pa.array(
                    np.floor(t[value].to_numpy(zero_copy_only=False) * 1e6).astype(
                        np.int64
                    )
                ),
                "__id": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "__lo": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__hi": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__side": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "part": pa.array(_part_col(t[key].to_numpy(), num_parts)),
            }
        )

    def tag_intervals(t: pa.Table) -> pa.Table:
        def us(c):
            c = t[c].combine_chunks()
            if pa.types.is_timestamp(c.type):
                c = c.cast(pa.timestamp("us"))
            return c.cast(pa.int64())

        return pa.table(
            {
                "__key": t[key].combine_chunks().cast(pa.int64()),
                "__ts": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__vmicro": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__id": t[id_col].combine_chunks().cast(pa.int64()),
                "__lo": us(lo_col),
                "__hi": us(hi_col),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "part": pa.array(_part_col(t[key].to_numpy(), num_parts)),
            }
        )

    merged = (
        events.map_batches(tag_events, batch_format="pyarrow")
        .union(intervals.map_batches(tag_intervals, batch_format="pyarrow"))
        .repartition(coalesce_blocks or num_parts)
    )

    def join_partition(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy()
        is_iv = side == 1
        ids = g["__id"].to_numpy()[is_iv]
        ik = g["__key"].to_numpy()[is_iv]
        lo = g["__lo"].to_numpy()[is_iv]
        hi = g["__hi"].to_numpy()[is_iv]
        ek = g["__key"].to_numpy()[~is_iv]
        et = g["__ts"].to_numpy()[~is_iv]
        ev = g["__vmicro"].to_numpy()[~is_iv]
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value_micro": pa.array([], type=pa.int64()),
                }
            )
        n = len(ek)
        cnt = np.zeros(len(ids), dtype=np.int64)
        vsum = np.zeros(len(ids), dtype=np.int64)
        if n:
            users = np.unique(ek)
            uidx_ev = np.searchsorted(users, ek)
            sorted_ts = np.sort(et)
            rank_ev = np.searchsorted(sorted_ts, et, side="left")
            comp = uidx_ev * np.int64(n + 1) + rank_ev
            order = np.argsort(comp, kind="stable")
            comp_s = comp[order]
            prefix = np.concatenate([[0], np.cumsum(ev[order])])
            iu = np.searchsorted(users, ik)
            ok = (iu < len(users)) & (users[np.minimum(iu, len(users) - 1)] == ik)
            r_lo = np.searchsorted(sorted_ts, lo, side="left")
            r_hi = np.searchsorted(sorted_ts, hi, side="left")
            base = np.minimum(iu, len(users) - 1) * np.int64(n + 1)
            p_lo = np.searchsorted(comp_s, base + r_lo, side="left")
            p_hi = np.searchsorted(comp_s, base + r_hi, side="left")
            cnt = np.where(ok, p_hi - p_lo, 0).astype(np.int64)
            vsum = np.where(ok, prefix[p_hi] - prefix[p_lo], 0).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_events": pa.array(cnt),
                "sum_value_micro": pa.array(vsum),
            }
        )

    return merged.groupby("part").map_groups(join_partition, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, str],
    num_parts: int = 32,
    how: str = "inner",
    concurrency: int = 4,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Large-large equi-join: ONE co-routed exchange, per-part arrow join.

    Ray Data's Dataset API has no partitioned join, and the repo's
    broadcast hash join (pipelines/relational.py) only covers a small
    build side. Here BOTH sides stream through the same
    ``hash(key) % num_parts`` routing (string keys via the pinned
    ``hash_strings_u64``, integer keys via splitmix64) into one
    ``groupby(part)`` exchange — each side's rows for a key land in the
    same part, where one vectorized ``pyarrow.Table.join`` runs. The
    off-side columns travel as all-null arrays (validity bitmaps only),
    so the exchange volume is ~|L| + |R| rows.

    ``on``: shared key name, or ``(left_on, right_on)``; the output key
    column uses the LEFT name. ``how``: "inner" or "left". Right
    columns colliding with left names get ``right_suffix``. Row order
    within the result is not deterministic (hash-join internals) —
    sort downstream if order matters; row CONTENT is exact.

    Skew note: one hot key concentrates in one part — acceptable for
    foreign-key joins (key multiplicity bounded); for adversarial skew
    pre-split the hot keys (the stage-B salt discipline, SCALE.md).
    """
    import pyarrow.compute as pc

    from oscar_ray.stages.dedup import hash_strings_u64

    l_on, r_on = (on, on) if isinstance(on, str) else on
    ls, rs = left.schema(), right.schema()  # ray Schema: .names/.types
    l_all = dict(zip(ls.names, ls.types))
    r_all = dict(zip(rs.names, rs.types))
    l_names = [n for n in ls.names if n != l_on]
    r_names = [n for n in rs.names if n != r_on]
    bad = set(l_names) & {l_on} | {"part", "side"} & set(l_names + r_names)
    if bad:
        raise ValueError(f"reserved column names in join inputs: {sorted(bad)}")
    r_out = {n: (n + right_suffix if n in set(l_names) | {l_on} else n) for n in r_names}
    l_types = {n: l_all[n] for n in l_names}
    r_types = {r_out[n]: r_all[n] for n in r_names}
    key_type = l_all[l_on]
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def _route(side: int, key_col: str):
        def route(batch: pa.Table) -> pa.Table:
            k = batch[key_col]
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            k = k.cast(key_type)
            # null keys never match (SQL semantics): drop them, except
            # left-side rows under how="left", which survive unmatched
            # (arrow's left-outer join also treats null keys as no-match)
            if k.null_count and not (side == 0 and how == "left"):
                batch = batch.filter(pc.is_valid(k))
                k = k.drop_null()
            if pa.types.is_string(key_type) or pa.types.is_large_string(key_type):
                h = hash_strings_u64(k.fill_null("") if k.null_count else k)
            else:
                kn = k.fill_null(0) if k.null_count else k
                h = _splitmix_u64(kn.cast(pa.int64()).to_numpy(zero_copy_only=False))
            n = len(batch)
            cols: dict = {
                "part": pa.array((h % np.uint64(num_parts)).astype(np.int64)),
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                l_on: k,
            }
            for name in l_names:
                cols[name] = (
                    batch[name] if side == 0 else pa.nulls(n, l_types[name])
                )
            for orig in r_names:
                cols[r_out[orig]] = (
                    batch[orig] if side == 1 else pa.nulls(n, r_types[r_out[orig]])
                )
            return pa.table(cols)

        return route

    routed = left.map_batches(
        _route(0, l_on), batch_format="pyarrow", concurrency=concurrency
    ).union(
        right.map_batches(
            _route(1, r_on), batch_format="pyarrow", concurrency=concurrency
        )
    )
    out_names = [l_on, *l_names, *(r_out[n] for n in r_names)]

    def _join_part(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        is_l = pc.equal(g["side"], 0)
        L = g.filter(is_l).select([l_on, *l_names])
        R = g.filter(pc.invert(is_l)).select([l_on, *(r_out[n] for n in r_names)])
        return L.join(R, keys=l_on, join_type=join_type).select(out_names)

    return routed.groupby("part").map_groups(
        lambda g: _join_part(g.drop_columns(["part"])),
        batch_format="pyarrow",
    )


def _splitmix_u64(x: np.ndarray) -> np.ndarray:
    from oscar_ray.stages.dedup import _splitmix64

    with np.errstate(over="ignore"):
        return _splitmix64(x.astype(np.uint64))
