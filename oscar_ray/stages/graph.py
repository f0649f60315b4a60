"""Distributed PageRank over a link graph (raw-task ref exchanges).

The canonical web-scale iterative operator: rank flows along the crawl
link graph (the reference's analog surface is its relation-DAG reduce,
`oscar-create` A4 parent/child aggregation — out of scope as geometry,
in scope as the webtext link graph). Iterative Dataset loops are a
scale-killer (~2 s fixed cost per groupby execution — see the
connected-components note, dedup.py:908), so the power iteration runs
as raw ``ray.remote`` fan-outs over hash-partitioned object refs, the
repo's established pattern: per iteration, one scatter task per source
partition emits P per-destination-partition partial sums
(``options(num_returns=P)``), one gather task per destination
partition folds them with the teleport base. The driver holds only
refs (P^2 per round); node and edge arrays never leave the workers.

Determinism contract (what makes the SQL oracle possible): ranks are
int64 MICRO units with a pinned update rule —

    share(u)  = (r[u] * damp_num) // (damp_den * outdeg[u])
    r'(v)     = (scale * (damp_den - damp_num)) // (damp_den * n_nodes)
                + sum over in-edges share(u)

All operations are integer (floor division on non-negative operands),
so every parallelism level and DuckDB's unrolled-CTE evaluation yield
bit-identical ranks. Dangling nodes (outdeg 0) simply leak rank mass,
as the classic formulation without dangling redistribution does;
totals need not sum to ``scale``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from oscar_ray.stages.dedup import _splitmix64

SCALE = 1_000_000_000_000  # rank unit: 1e-12 of total mass


def _part_of(ids: np.ndarray, num_parts: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (_splitmix64(ids.astype(np.uint64)) % np.uint64(num_parts)).astype(
            np.int64
        )


@ray.remote
def _edges_split(tbl: pa.Table, src_col: str, dst_col: str, num_parts: int):
    """One input block -> P (src,dst) slices routed by part(src)."""
    src = tbl[src_col].to_numpy().astype(np.int64)
    dst = tbl[dst_col].to_numpy().astype(np.int64)
    p = _part_of(src, num_parts)
    order = np.argsort(p, kind="stable")
    src, dst, p = src[order], dst[order], p[order]
    bounds = np.searchsorted(p, np.arange(num_parts + 1))
    return tuple(
        np.stack([src[bounds[i] : bounds[i + 1]], dst[bounds[i] : bounds[i + 1]]])
        for i in range(num_parts)
    )


@ray.remote
def _edges_init(*slices):
    """Fold one part's edge slices; precompute outdeg per local src."""
    # num_parts == 1: num_returns=1 delivers the whole 1-tuple as the value
    slices = [x for s in slices for x in (s if isinstance(s, tuple) else (s,))]
    live = [s for s in slices if s.size]
    e = np.concatenate(live, axis=1) if live else np.zeros((2, 0), np.int64)
    src, dst = e[0], e[1]
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    u_src, counts = np.unique(src, return_counts=True)
    return src, dst, u_src, counts.astype(np.int64)


@ray.remote
def _nodes_init(node_ids: np.ndarray, n_nodes: int):
    """One part's sorted node ids + uniform start rank."""
    ids = np.sort(node_ids.astype(np.int64))
    r = np.full(len(ids), SCALE // n_nodes, dtype=np.int64)
    return ids, r


@ray.remote
def _scatter(edges, nodes, num_parts: int, damp_num: int, damp_den: int):
    """One src part: emit per-dst-part (dst_ids, contribution sums)."""
    src, dst, u_src, outdeg = edges
    ids, r = nodes
    # rank + outdeg of each edge's src (u_src subset of ids by routing)
    r_src = r[np.searchsorted(ids, u_src)]
    share_u = (r_src * np.int64(damp_num)) // (np.int64(damp_den) * outdeg)
    share = np.repeat(share_u, outdeg)  # edges sorted by src
    p = _part_of(dst, num_parts)
    out = []
    for q in range(num_parts):
        m = p == q
        d = dst[m]
        # int64 segment sums (no float bincount: stays exact at any scale)
        order = np.argsort(d, kind="stable")
        ds_, sh_ = d[order], share[m][order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        isums = np.add.reduceat(sh_, starts) if len(sh_) else sh_[:0]
        out.append(np.stack([ds_[starts] if len(sh_) else ds_[:0], isums.astype(np.int64)]))
    return tuple(out)


@ray.remote
def _gather(nodes, n_nodes: int, damp_num: int, damp_den: int, *incoming):
    """One dst part: base + folded incoming contributions -> new r."""
    ids, _ = nodes
    base = (np.int64(SCALE) * (damp_den - damp_num)) // (
        np.int64(damp_den) * n_nodes
    )
    incoming = [
        x for s in incoming for x in (s if isinstance(s, tuple) else (s,))
    ]
    r = np.full(len(ids), base, dtype=np.int64)
    for inc in incoming:
        if inc.size:
            pos = np.searchsorted(ids, inc[0])
            np.add.at(r, pos, inc[1])
    return ids, r


@ray.remote
def _emit(nodes) -> pa.Table:
    ids, r = nodes
    return pa.table(
        {"node": pa.array(ids), "rank_micro": pa.array(r.astype(np.int64))}
    )


def pagerank(
    edges: ray.data.Dataset,
    n_nodes: int,
    iters: int = 5,
    num_parts: int = 16,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Integer-exact PageRank; nodes are ids in [0, n_nodes).

    -> Dataset (node, rank_micro), one row per node (including nodes
    with no edges, which hold the teleport base after one iteration).
    """
    blocks = edges.to_arrow_refs()
    nb = len(blocks)
    split = [
        _edges_split.options(num_returns=num_parts).remote(
            b, src_col, dst_col, num_parts
        )
        for b in blocks
    ]
    if num_parts == 1:  # num_returns=1 yields a bare ref, not a list
        split = [[s] for s in split]
    edge_parts = [
        _edges_init.remote(*[split[i][p] for i in range(nb)])
        for p in range(num_parts)
    ]
    all_ids = np.arange(n_nodes, dtype=np.int64)
    pid = _part_of(all_ids, num_parts)
    node_parts = [
        _nodes_init.remote(all_ids[pid == p], n_nodes) for p in range(num_parts)
    ]
    for _ in range(iters):
        scat = [
            _scatter.options(num_returns=num_parts).remote(
                edge_parts[p], node_parts[p], num_parts, damp_num, damp_den
            )
            for p in range(num_parts)
        ]
        if num_parts == 1:
            scat = [[s] for s in scat]
        node_parts = [
            _gather.remote(
                node_parts[q],
                n_nodes,
                damp_num,
                damp_den,
                *[scat[p][q] for p in range(num_parts)],
            )
            for q in range(num_parts)
        ]
    return ray.data.from_arrow_refs([_emit.remote(npart) for npart in node_parts])


# --------------------------------------------------------------------------
# HITS (hubs & authorities, Kleinberg 1999) — same raw-task ref-exchange
# discipline as pagerank, but BOTH edge directions exchange per iteration:
# a(v) = sum of h(u) over in-edges (edges co-located by part(src), partials
# routed to part(dst)), then h(u) = sum of a(v) over out-edges (a second
# edge layout co-located by part(dst), partials routed to part(src)).
#
# Integer determinism: the classic L2 normalization is replaced by a pinned
# integer rescale after every half-step — x <- x * HITS_SCALE // max(x)
# (floor on non-negative operands; the max is a P-scalar allreduce, the only
# driver-side value per half-step). Every parallelism level and the
# unrolled DuckDB CTE chain produce bit-identical values. Overflow bound:
# raw <= deg_max * HITS_SCALE and raw * HITS_SCALE must fit int64, so
# deg_max < 2^63 / HITS_SCALE^2 ~ 9.2e6 at 1e6 — far above any real
# per-page degree (the aggregation caps anchors at 8; crawl graphs cap
# out-links); asserted per part.
# --------------------------------------------------------------------------

HITS_SCALE = 1_000_000  # "micro" units; see overflow bound above


@ray.remote
def _hits_scatter(edges, nodes, scale_max: int, num_parts: int):
    """One co-located part: emit per-other-part (other_ids, sum of x(key)).

    ``edges`` is the (key, other, u_key, deg) layout from _edges_init —
    key = the co-location side whose value x flows along each edge.
    ``scale_max`` applies the pinned lazy rescale (x * S // max) to the
    incoming raw state; the raw/scaled split keeps every rescale a pure
    function of (raw, global max) — no mutation between iterations.
    """
    key, other, u_key, deg = edges
    ids, x = nodes
    x = (x * np.int64(HITS_SCALE)) // np.int64(max(1, scale_max))
    xv = x[np.searchsorted(ids, u_key)]
    assert xv.size == 0 or int(xv.max()) <= HITS_SCALE  # rescale invariant
    contrib = np.repeat(xv, deg)
    p = _part_of(other, num_parts)
    out = []
    for q in range(num_parts):
        m = p == q
        d = other[m]
        order = np.argsort(d, kind="stable")
        ds_, sh_ = d[order], contrib[m][order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        isums = np.add.reduceat(sh_, starts) if len(sh_) else sh_[:0]
        out.append(
            np.stack([ds_[starts] if len(sh_) else ds_[:0], isums.astype(np.int64)])
        )
    return tuple(out)


@ray.remote(num_returns=2)
def _hits_gather(ids: np.ndarray, *incoming):
    """One part: fold incoming partial sums -> (raw state, local max)."""
    incoming = [x for s in incoming for x in (s if isinstance(s, tuple) else (s,))]
    raw = np.zeros(len(ids), dtype=np.int64)
    for inc in incoming:
        if inc.size:
            pos = np.searchsorted(ids, inc[0])
            np.add.at(raw, pos, inc[1])
    return (ids, raw), int(raw.max(initial=0))


@ray.remote
def _hits_emit(a_state, a_max: int, h_state, h_max: int) -> pa.Table:
    ids, a_raw = a_state
    _, h_raw = h_state
    a = (a_raw * np.int64(HITS_SCALE)) // np.int64(max(1, a_max))
    h = (h_raw * np.int64(HITS_SCALE)) // np.int64(max(1, h_max))
    return pa.table(
        {
            "node": pa.array(ids),
            "authority_micro": pa.array(a),
            "hub_micro": pa.array(h),
        }
    )


def hits(
    edges: ray.data.Dataset,
    n_nodes: int,
    iters: int = 3,
    num_parts: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Integer-exact HITS; nodes are ids in [0, n_nodes).

    -> Dataset (node, authority_micro, hub_micro), one row per node.
    Start state h0 = HITS_SCALE for every node; per iteration one
    forward and one reverse edge exchange plus two scalar max
    allreduces (the driver holds refs and 2 ints per iteration, never
    node-sized arrays).
    """
    blocks = edges.to_arrow_refs()
    nb = len(blocks)

    def _layout(key_col: str, other_col: str):
        split = [
            _edges_split.options(num_returns=num_parts).remote(
                b, key_col, other_col, num_parts
            )
            for b in blocks
        ]
        if num_parts == 1:
            split = [[s] for s in split]
        return [
            _edges_init.remote(*[split[i][p] for i in range(nb)])
            for p in range(num_parts)
        ]

    by_src = _layout(src_col, dst_col)  # h flows src -> dst (authority)
    by_dst = _layout(dst_col, src_col)  # a flows dst -> src (hub)

    all_ids = np.arange(n_nodes, dtype=np.int64)
    pid = _part_of(all_ids, num_parts)
    id_parts = [ray.put(all_ids[pid == p]) for p in range(num_parts)]
    h_parts = [
        _nodes_init.remote(all_ids[pid == p], 1) for p in range(num_parts)
    ]  # n_nodes=1 -> uniform start value SCALE (pagerank's unit)
    h_max = SCALE  # so the first scatter's lazy rescale lands h0 at HITS_SCALE

    a_parts = a_max = None
    for _ in range(iters):
        scat = [
            _hits_scatter.options(num_returns=num_parts).remote(
                by_src[p], h_parts[p], h_max, num_parts
            )
            for p in range(num_parts)
        ]
        if num_parts == 1:
            scat = [[s] for s in scat]
        gath = [
            _hits_gather.remote(
                id_parts[q], *[scat[p][q] for p in range(num_parts)]
            )
            for q in range(num_parts)
        ]
        a_parts = [g[0] for g in gath]
        a_max = max(ray.get([g[1] for g in gath]))
        scat = [
            _hits_scatter.options(num_returns=num_parts).remote(
                by_dst[p], a_parts[p], a_max, num_parts
            )
            for p in range(num_parts)
        ]
        if num_parts == 1:
            scat = [[s] for s in scat]
        gath = [
            _hits_gather.remote(
                id_parts[q], *[scat[p][q] for p in range(num_parts)]
            )
            for q in range(num_parts)
        ]
        h_parts = [g[0] for g in gath]
        h_max = max(ray.get([g[1] for g in gath]))
    return ray.data.from_arrow_refs(
        [
            _hits_emit.remote(a_parts[q], a_max, h_parts[q], h_max)
            for q in range(num_parts)
        ]
    )
