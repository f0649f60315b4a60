"""Relational demo pipelines over the TPC-H-ish test tables.

These exercise the engine's general data-processing operators (the
SURVEY.md §2 aggregation/join/sort/set-op/facet rows) as idiomatic Ray
Data pipelines with DuckDB-checkable semantics. Column naming matches
the oracle SQL exactly (driver hashes sorted-by-name columns).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def lineitem_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style grouped aggregate (A1/A5 analog: grouped counts/sums).

    Pre-aggregation happens inside Ray's hash-groupby; the revenue column
    is computed vectorized per batch before the shuffle.
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    # money rides as exact integer cents (floor((price*(1-disc))*100) per
    # row — identical IEEE ops in any engine) so the sum is order-free
    def add_cents(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0),
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"].cast(pa.int64()),
                "revenue_cents": pc.floor(rev).cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(add_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="sum_revenue_cents"),
            Count(alias_name="n_rows"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )


def customer_order_join(sf_dir: str) -> ray.data.Dataset:
    """Broadcast hash join (J1/J5 analog): orders x customer -> revenue per
    customer market segment. The small side (customer) is ray.put once and
    probed per batch; no shuffle join."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).take_all()
    keys = np.array([r["c_custkey"] for r in cust], dtype=np.int64)
    segs = np.array([r["c_mktsegment"] for r in cust], dtype=object)
    order = np.argsort(keys)
    ref = ray.put((keys[order], segs[order]))

    class JoinSegment:
        def __init__(self):
            self.keys, self.segs = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            pos = np.minimum(np.searchsorted(self.keys, ck), len(self.keys) - 1)
            hit = self.keys[pos] == ck
            seg = np.where(hit, self.segs[pos], None)
            cents = pc.floor(pc.multiply(t["o_totalprice"], pa.scalar(100.0)))
            return pa.table(
                {
                    "c_mktsegment": pa.array(seg.tolist(), type=pa.string()),
                    "price_cents": cents.cast(pa.int64()),
                }
            )

    from ray.data.aggregate import Count, Sum

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(JoinSegment, batch_format="pyarrow", concurrency=2)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("price_cents", alias_name="sum_totalprice_cents"),
            Count(alias_name="n_orders"),
        )
        .sort("c_mktsegment")
    )


def top_parts_by_size(sf_dir: str, k: int = 100) -> pa.Table:
    """Top-k (O1/O4 analog): top-100 parts by (p_size desc, p_partkey asc).

    Per-block PARTIAL top-k inside map_batches, then a k*n_blocks-sized
    driver merge — no range-partition sort shuffle (a full distributed
    sort moves every row to rank 100 of them; the partial-merge shape
    moves k rows per block)."""
    import numpy as np

    ds = _read(sf_dir, "part", ["p_partkey", "p_size"])

    def partial_topk(t: pa.Table) -> pa.Table:
        size = t["p_size"].to_numpy()
        key = t["p_partkey"].to_numpy()
        n = len(size)
        if n > k:
            thresh = np.partition(size, n - k)[n - k]
            cand = np.flatnonzero(size >= thresh)  # tie-safe
        else:
            cand = np.arange(n)
        order = np.lexsort((key[cand], -size[cand]))[:k]
        sel = cand[order]
        return t.select(["p_partkey", "p_size"]).take(pa.array(sel))

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    import pandas as pd

    df = pd.DataFrame(partials).sort_values(
        ["p_size", "p_partkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            "p_partkey": pa.array(df["p_partkey"].to_numpy()),
            "p_size": pa.array(df["p_size"].to_numpy()),
        }
    )


def order_status_facets(sf_dir: str) -> ray.data.Dataset:
    """Facet counts (A5 kvstats analog): per (o_orderstatus, o_orderpriority)
    count, ordered by count desc then keys — the 'topk(n, cmp)' shape."""
    from ray.data.aggregate import Count

    out = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"))
    )

    def negkey(t: pa.Table) -> pa.Table:
        return t.append_column("neg_n", pc.negate(t["n"]))

    return (
        out.map_batches(negkey, batch_format="pyarrow")
        .sort(["neg_n", "o_orderstatus", "o_orderpriority"])
        .limit(10)
        .select_columns(["o_orderstatus", "o_orderpriority", "n"])
    )


def customer_set_ops(sf_dir: str) -> pa.Table:
    """Set-algebra over id sets (X1-X4 analog) with the engine's numpy
    kernels: customers with BUILDING segment vs customers holding an
    open ('O') order -> sizes of intersection / union / difference /
    symmetric difference. One scalar row."""
    from oscar_ray.query import setops

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"])

    seg_ids = np.unique(
        np.concatenate(
            [
                b["c_custkey"].to_numpy()
                for b in cust.map_batches(building_only, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    ).astype(np.uint64)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def open_orders(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_custkey"])

    open_ids = np.unique(
        np.concatenate(
            [
                b["o_custkey"].to_numpy()
                for b in orders.map_batches(open_orders, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    ).astype(np.uint64)
    a = (seg_ids, np.zeros(len(seg_ids)))
    b = (open_ids, np.zeros(len(open_ids)))
    return pa.table(
        {
            "n_building": pa.array([len(seg_ids)], type=pa.int64()),
            "n_open": pa.array([len(open_ids)], type=pa.int64()),
            "n_and": pa.array([len(setops.intersect(a, b)[0])], type=pa.int64()),
            "n_or": pa.array([len(setops.union(a, b)[0])], type=pa.int64()),
            "n_andnot": pa.array([len(setops.andnot(a, b)[0])], type=pa.int64()),
            "n_xor": pa.array([len(setops.xor(a, b)[0])], type=pa.int64()),
        }
    )


def events_json_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured extraction: parse the events `props` JSON column
    per batch and aggregate the extracted field per event type.

    Ray has no arrow JSON-parse kernel; the per-row json.loads happens
    inside map_batches (C-accelerated stdlib) — the pattern, not the
    parser, is the point: schema-on-read projection fused with the scan.
    """
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract_k(t: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (
                int(_json.loads(p).get("k", 0)) if p else 0
                for p in t["props"].to_pylist()
            ),
            dtype=np.int64,
            count=len(t),
        )
        return pa.table({"event_type": t["event_type"], "k": pa.array(ks)})

    from ray.data.aggregate import Count, Max, Sum

    return (
        ds.map_batches(extract_k, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("k", alias_name="sum_k"),
            Max("k", alias_name="max_k"),
            Count(alias_name="n"),
        )
        .sort("event_type")
    )


def embedding_label_centroids(sf_dir: str) -> pa.Table:
    """Vector aggregate: per-label centroid of the embedding column via
    per-batch partial sums (map_batches) + driver combine — the mergeable-
    sketch aggregation pattern (guide §aggregation-at-scale).

    Output: (label, n_vecs, centroid_norm_micro) — the centroid's L2 norm
    in exact micro-units for engine-agnostic comparison.
    """
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        n = len(t)
        if not n:
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64())),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        mat = flat.reshape(n, -1)
        labels = t["label"].to_numpy().astype(np.int64)
        uniq = np.unique(labels)
        sums = np.zeros((len(uniq), mat.shape[1]))
        counts = np.zeros(len(uniq), dtype=np.int64)
        for i, lab in enumerate(uniq):
            m = labels == lab
            sums[i] = mat[m].sum(axis=0)
            counts[i] = int(m.sum())
        return pa.table(
            {
                "label": pa.array(uniq),
                "vsum": pa.array([row.tolist() for row in sums], type=pa.list_(pa.float64())),
                "n": pa.array(counts),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[int, tuple[np.ndarray, int]] = {}
    for r in parts:
        lab = int(r["label"])
        v = np.asarray(r["vsum"], dtype=np.float64)
        if lab in agg:
            agg[lab] = (agg[lab][0] + v, agg[lab][1] + int(r["n"]))
        else:
            agg[lab] = (v, int(r["n"]))
    rows = []
    for lab in sorted(agg):
        v, n = agg[lab]
        centroid = v / n
        norm = float(np.sqrt(np.sum(centroid * centroid)))
        rows.append(
            {"label": lab, "n_vecs": n, "centroid_norm_micro": int(np.floor(norm * 1e6))}
        )
    return pa.Table.from_pylist(rows)


def facet_entropy(sf_dir: str) -> pa.Table:
    """Shannon facet statistics (A6 analog: `shannonKvstats`,
    ``oscar-cmd/Workfunctions.cpp:171-233``): per facet key, the entropy
    of its value distribution over orders. Counts come from a grouped
    aggregate; the entropy reduce is driver-side (value cardinality is
    tiny)."""
    from ray.data.aggregate import Count

    rows = []
    for facet in ("o_orderstatus", "o_orderpriority"):
        counts = (
            _read(sf_dir, "orders", [facet])
            .groupby(facet)
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
        n = np.array(sorted(r["n"] for r in counts), dtype=np.float64)
        p = n / n.sum()
        entropy = float(np.sum(-p * np.log(p)))
        rows.append(
            {
                "facet": facet,
                "n_values": len(counts),
                "entropy": round(entropy, 6),
            }
        )
    return pa.Table.from_pylist(rows).sort_by("facet")


def events_window_counts(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window grouped aggregate over the events stream table.

    Stream-shaped analog (guide §streaming): window = floor(epoch/3600s),
    grouped per (user-ish key, window). Assumes the events table has a
    timestamp column and some key/value columns; adapts to actual names.
    """
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())  # us since epoch
        win = pc.divide(ts, pa.scalar(3600_000_000, type=pa.int64()))
        return pa.table({"k": t["event_type"], "hour_bucket": win})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["k", "hour_bucket"])
        .aggregate(Count(alias_name="n"))
        .sort(["k", "hour_bucket"])
    )


def events_sliding_window(sf_dir: str) -> pa.Table:
    """SLIDING window counts (1h window, 30min slide): each event lands
    in exactly two windows — a flat_map-shaped window-assignment
    `map_batches` then per-batch partial counts with a (small,
    window-cardinality-sized) driver combine. The windowed-aggregate
    custom operator from the brief, expressed without any shuffle."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def assign(t: pa.Table) -> pa.Table:
        slot = pc.divide(t["ts"].cast(pa.int64()), pa.scalar(1_800_000_000, type=pa.int64()))
        s = slot.to_numpy() if not hasattr(slot, "combine_chunks") else slot.combine_chunks().to_numpy()
        k = t["event_type"].to_numpy(zero_copy_only=False)
        # window start slots: slot and slot-1 (each window spans 2 slots)
        ks = np.concatenate((k, k))
        ws = np.concatenate((s, s - 1))
        df = pd.DataFrame({"k": ks, "win30": ws})
        agg = df.groupby(["k", "win30"], as_index=False).size()
        return pa.table(
            {
                "k": pa.array(agg["k"], type=pa.string()),
                "win30": pa.array(agg["win30"].astype(np.int64)),
                "n": pa.array(agg["size"].astype(np.int64)),
            }
        )

    partials = ds.map_batches(assign, batch_format="pyarrow").take_all()
    import pandas as pd

    agg = (
        pd.DataFrame(partials)
        .groupby(["k", "win30"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["k", "win30"])
    )
    return pa.table(
        {
            "k": pa.array(agg["k"], type=pa.string()),
            "win30": pa.array(agg["win30"].to_numpy()),
            "n": pa.array(agg["n"].to_numpy()),
        }
    )


def events_asof_join(sf_dir: str) -> pa.Table:
    """ASOF join demo: each purchase event joined to the user's latest
    click at-or-before it (the time-series custom join from the brief;
    DuckDB ASOF JOIN is the oracle). -> (event_id, prev_event_id, gap_us)."""
    from oscar_ray.stages.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def split(kind: str):
        return ev.filter(expr=f"event_type == '{kind}'")

    joined = asof_join(
        split("purchase"),
        split("click"),
        key="user_id",
        ts="ts",
        left_cols=["event_id"],
        right_cols=["event_id"],
        num_parts=16,
    )

    def finish(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t["ts"].cast(pa.int64()), t["prev_ts"].cast(pa.int64()))
        return pa.table(
            {
                "event_id": t["event_id"].combine_chunks().cast(pa.int64()),
                "prev_event_id": t["prev_event_id"].combine_chunks().cast(pa.int64()),
                "gap_us": gap,
            }
        )

    return pa.Table.from_pandas(
        joined.map_batches(finish, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    ).sort_by("event_id")


def events_sessions(sf_dir: str, gap_us: int = 43_200_000_000) -> pa.Table:
    """Gap-based sessionization over the events stream (windowed
    aggregate / clickstream sequence-building; DuckDB window-function
    oracle). -> (user_id, session_idx, session_start_us, session_end_us,
    n_events, sum_value_micro)."""
    from oscar_ray.stages.joins import sessionize

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = sessionize(ev, gap_us=gap_us, num_parts=16)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).sort_by(
        [("user_id", "ascending"), ("session_idx", "ascending")]
    )


def events_follow_window(sf_dir: str, window_us: int = 3_600_000_000) -> pa.Table:
    """Range-join demo: for every event, the count + micro-value sum of
    SAME-USER events in the following hour ``(ts, ts + 1h]`` (burst
    size). Self range-join via :func:`range_count_join` with half-open
    integer-us bounds [ts+1, ts+1h+1). -> (event_id, n_follow,
    sum_value_micro); DuckDB inequality-join oracle."""
    import numpy as np

    from oscar_ray.stages.joins import range_count_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def to_iv(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
        tsn = ts.to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "lo": pa.array(tsn + 1),
                "hi": pa.array(tsn + np.int64(window_us) + 1),
            }
        )

    iv = ev.map_batches(to_iv, batch_format="pyarrow")
    out = range_count_join(
        iv, ev, key="user_id", id_col="event_id", lo_col="lo", hi_col="hi",
        num_parts=16,
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).sort_by(
        "event_id"
    )
    return t.rename_columns(["event_id", "n_follow", "sum_value_micro"])
