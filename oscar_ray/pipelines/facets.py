"""Facets and hydration over a query RESULT set (the kvstats analog).

The reference's most-used interactive features after search itself:

- ``--kvstats``: facet counts + top-k over the items matching a
  completion query (``oscar-cmd/Workfunctions.cpp:134-169``, the
  ``liboscar::KVStats`` call at ``:152-156``) — here: run the BM25
  set-op query, then per-column value counts over the matched docs.
- ``--shannon-kvstats``: entropy scoring of facets with key exclusion
  lists (``Workfunctions.cpp:171-233``) — here: per-facet Shannon
  entropy over the matched subset, exclusion list honored.
- item dump / result hydration (``-ds``): resolve matched ids back to
  their KV content (``Workfunctions.cpp:888-1062``,
  ``LiveCompleter.cpp:29-35``) — here: join top-k (docid, score) back
  to the documents table columns.

Distributed shape (scales to 10^12 docs): the match set is NEVER
materialized on the driver. Posting blocks are docid-range aligned
(block_id = docid >> block_span_bits), so the set-op tree evaluates
independently per block: Ray tasks each own a contiguous block range,
evaluate the query over just their range, and return one sorted
id-array object each — the driver holds only (docid_lo, docid_hi, ref)
triples. The documents table then streams through ``map_batches``; each
counter batch fetches ONLY the match-range refs overlapping its own
docid span (per-actor LRU) and does a vectorized ``searchsorted``
membership test, emitting facet-cardinality-sized partial counts. No
shuffle, no full-table materialization, no corpus-sized driver array
(the reference's lazily-flattened result-index discipline,
``oscar-cmd/Workfunctions.cpp:146-169``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _matched_ids(sf_dir: str, query: str, suffixes: bool = False) -> np.ndarray:
    """Full BM25 match set for a query, sorted ascending int64.

    Driver-sized: use only for small/selective queries or CLI display —
    the streamed path is :func:`matched_id_plan` + :class:`_FacetCounter`.
    """
    from oscar_ray.pipelines.search import documents_index_dir
    from oscar_ray.query.engine import QueryEngine

    idx = documents_index_dir(sf_dir, suffixes=suffixes)
    ids, _ = QueryEngine(idx).search(query, k=1 << 62)
    return np.sort(ids.astype(np.int64))


# Ray reuses worker processes across tasks, so a module-level engine
# cache keeps the open dictionaries + decoded-block caches warm across
# queries against the same index (the reference keeps its stores
# energized between completions). Keyed on manifest mtime so an
# in-place rebuild / maintenance cycle drops the stale engine; LRU-
# capped so a worker that serves many distinct indexes (test sessions,
# multi-tenant hosts) doesn't accumulate open engines without bound.
_TASK_ENGINES: dict[str, tuple[float, object]] = {}
_TASK_ENGINES_MAX = 4


def _task_engine(index_dir: str):
    from oscar_ray.index.layout import manifest_path
    from oscar_ray.query.engine import QueryEngine

    mt = os.path.getmtime(manifest_path(index_dir))
    ent = _TASK_ENGINES.pop(index_dir, None)  # pop+reinsert = LRU touch
    if ent is not None and ent[0] == mt:
        _TASK_ENGINES[index_dir] = ent
        return ent[1]
    while len(_TASK_ENGINES) >= _TASK_ENGINES_MAX:
        _TASK_ENGINES.pop(next(iter(_TASK_ENGINES)))
    eng = QueryEngine(index_dir)
    _TASK_ENGINES[index_dir] = (mt, eng)
    return eng


@ray.remote
def _matched_range_task(index_dir: str, query: str, blk_lo: int, blk_hi: int):
    """Evaluate the full set-op match set restricted to blocks in
    [blk_lo, blk_hi) -> sorted int64 docids. Each task opens the index
    itself (no driver-side postings fetch); the read amplification is
    num_tasks x the QUERY TERMS' postings — bounded, parallel, and never
    corpus-sized."""
    from oscar_ray.query.engine import (
        _block_bounds,
        _collect_leaves,
        _eval_block,
        expand_prefixes,
    )
    from oscar_ray.query.parser import QueryParseError, parse_query

    empty = np.empty(0, dtype=np.int64)
    eng = _task_engine(index_dir)
    try:
        node = parse_query(query)
    except QueryParseError:
        return empty
    if node is None:
        return empty
    node = expand_prefixes(node, eng.reader)
    leaves = _collect_leaves(node, eng.reader)
    blocks = _block_bounds(node, leaves)
    out = []
    for b in sorted(blocks):
        if blk_lo <= b < blk_hi:
            ids, _ = _eval_block(node, leaves, b)
            if len(ids):
                out.append(np.asarray(ids, dtype=np.int64))
    return np.concatenate(out) if out else empty


def matched_id_plan(
    index_dir: str, query: str, num_tasks: int = 8
) -> list[tuple[int, int, "ray.ObjectRef"]]:
    """Distributed match-set plan: (docid_lo, docid_hi_exclusive, ref)
    per contiguous block range; each ref resolves to that range's sorted
    matched ids. Ranges partition the docid space, so the arrays are
    globally disjoint and a consumer only fetches ranges it overlaps."""
    import json

    from oscar_ray.index import layout

    with open(layout.manifest_path(index_dir)) as f:
        manifest = json.load(f)
    bits = manifest["config"]["block_span_bits"]
    stats = manifest["stats"]
    # partition the DOCID SPACE, never the live-doc count: URL-dedup
    # tombstones leave holes (docids run to total_docs-1 > n_docs-1) and
    # id_column docids may be sparse — blocks past n_docs would otherwise
    # silently fall outside every task's range
    max_docid = stats.get("max_docid", -1)
    if max_docid < 0:
        max_docid = max(stats.get("total_docs", stats["n_docs"]) - 1, 0)
    n_blocks = max((max_docid >> bits) + 1, 1)
    num_tasks = max(1, min(num_tasks, n_blocks))
    bounds = np.linspace(0, n_blocks, num_tasks + 1).astype(np.int64)
    plan = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi <= lo:
            continue
        ref = _matched_range_task.remote(index_dir, query, int(lo), int(hi))
        plan.append((int(lo) << bits, int(hi) << bits, ref))
    return plan


class _FacetCounter:
    """map_batches: per-batch partial (facet, value, n) counts over the
    docs whose id is in the distributed match plan.

    The plan is a list of (docid_lo, docid_hi, ref) with disjoint ranges;
    a batch fetches only the refs its own docid span overlaps (per-actor
    cache, ``max_cached`` ranges) — an actor's resident match state is a
    few ranges, never the full match set.
    """

    def __init__(
        self,
        plan: list[tuple[int, int, "ray.ObjectRef"]],
        facet_cols: list[str],
        id_col: str = "doc_id",
        max_cached: int = 16,
    ):
        self.plan = sorted(plan, key=lambda e: e[0])
        self.los = np.asarray([e[0] for e in self.plan], dtype=np.int64)
        self.his = np.asarray([e[1] for e in self.plan], dtype=np.int64)
        self.facet_cols = facet_cols
        self.id_col = id_col
        self.max_cached = max_cached
        self._cache: dict[int, np.ndarray] = {}

    def _range_ids(self, i: int) -> np.ndarray:
        hit = self._cache.pop(i, None)  # pop+reinsert = LRU recency touch
        if hit is None:
            if len(self._cache) >= self.max_cached:
                self._cache.pop(next(iter(self._cache)))
            hit = ray.get(self.plan[i][2])
        self._cache[i] = hit
        return hit

    def _membership(self, ids: np.ndarray) -> np.ndarray:
        keep = np.zeros(len(ids), dtype=bool)
        if not len(ids) or not len(self.plan):
            return keep
        lo, hi = int(ids.min()), int(ids.max())
        first = int(np.searchsorted(self.his, lo, side="right"))
        for i in range(first, len(self.plan)):
            if self.los[i] > hi:
                break
            m = self._range_ids(i)
            if not len(m):
                continue
            pos = np.searchsorted(m, ids)
            pos = np.minimum(pos, len(m) - 1)
            keep |= m[pos] == ids
        return keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        keep = self._membership(ids)
        facets, values, ns = [], [], []
        for col in self.facet_cols:
            vals = batch[col].to_numpy(zero_copy_only=False)[keep]
            uniq, counts = np.unique(vals.astype(str), return_counts=True)
            facets.extend([col] * len(uniq))
            values.extend(uniq.tolist())
            ns.extend(counts.tolist())
        return pa.table(
            {
                "facet": pa.array(facets, type=pa.string()),
                "value": pa.array(values, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )


def _facet_counts(
    sf_dir: str,
    query: str,
    facet_cols: list[str],
    concurrency: int = 2,
    num_match_tasks: int = 8,
) -> pd.DataFrame:
    """(facet, value, n) totals over the matched docs — the shared core.

    Streamed end-to-end: the match set lives as per-range object refs
    (see :func:`matched_id_plan`), the documents table streams through
    the counter, and only facet-cardinality-sized partials reach the
    driver.
    """
    from oscar_ray.pipelines.search import documents_index_dir

    idx = documents_index_dir(sf_dir)
    plan = matched_id_plan(idx, query, num_tasks=num_match_tasks)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"] + facet_cols
    )
    partials = ds.map_batches(
        _FacetCounter,
        fn_constructor_kwargs={"plan": plan, "facet_cols": facet_cols},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()  # facet-cardinality-sized, not corpus-sized
    if not partials:
        return pd.DataFrame({"facet": [], "value": [], "n": []})
    df = pd.DataFrame(partials)
    return df.groupby(["facet", "value"], as_index=False).agg(n=("n", "sum"))


def search_facets(
    sf_dir: str,
    query: str,
    facet_cols: list[str] = ("lang", "source"),
    topk: int = 10,
    concurrency: int = 2,
) -> pa.Table:
    """Top-k facet values over the docs matching a set-op BM25 query.

    -> (facet, value, n) — per facet, the topk values by (n desc, value
    asc); the ``KVStats::topk`` analog.
    """
    agg = _facet_counts(sf_dir, query, list(facet_cols), concurrency)
    out = []
    for facet, g in agg.groupby("facet"):
        g = g.sort_values(["n", "value"], ascending=[False, True], kind="mergesort")
        out.append(g.head(topk))
    res = (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({"facet": [], "value": [], "n": []})
    )
    return pa.table(
        {
            "facet": pa.array(res["facet"], type=pa.string()),
            "value": pa.array(res["value"], type=pa.string()),
            "n": pa.array(res["n"].astype(np.int64), type=pa.int64()),
        }
    )


def search_shannon_facets(
    sf_dir: str,
    query: str,
    facet_cols: list[str] = ("lang", "source"),
    exclude: tuple[str, ...] = (),
    concurrency: int = 2,
) -> pa.Table:
    """Shannon entropy per facet over the matched docs, with exclusion
    list (the ``--shannon-kvstats`` analog) -> (facet, n_values, entropy).

    entropy = sum over values of -(n/t) * ln(n/t); rounded to 6 decimals.
    """
    cols = [c for c in facet_cols if c not in set(exclude)]
    agg = _facet_counts(sf_dir, query, cols, concurrency)
    rows = []
    for facet in sorted(cols):
        g = agg[agg["facet"] == facet]
        n = g["n"].to_numpy().astype(np.float64)
        if not len(n):
            rows.append({"facet": facet, "n_values": 0, "entropy": 0.0})
            continue
        p = n / n.sum()
        rows.append(
            {
                "facet": facet,
                "n_values": int(len(n)),
                "entropy": round(float(-(p * np.log(p)).sum()), 6),
            }
        )
    return pa.table(
        {
            "facet": pa.array([r["facet"] for r in rows], type=pa.string()),
            "n_values": pa.array([r["n_values"] for r in rows], type=pa.int64()),
            "entropy": pa.array([r["entropy"] for r in rows], type=pa.float64()),
        }
    )


def shannon_top_keyvalues(
    sf_dir: str,
    query: str,
    facet_cols: list[str] = ("lang", "source"),
    threshold: float = 0.5,
    topn: int = 10,
    key_exclusions: tuple[str, ...] = (),
    keyvalue_exclusions: tuple[tuple[str, str], ...] = (),
    concurrency: int = 2,
) -> pa.Table:
    """Shannon-clustering topKeyValues (the ``--shannon-kvstats`` ranking
    surface, ``oscar-cmd/Workfunctions.cpp:194-231``): rank (facet,
    value) pairs by distance to the split point ``split = floor(threshold
    * |matched items|)`` — values that split the result set near the
    threshold rank first (smallest splitdist), the
    ``kvclustering::ShannonClustering`` discipline.

    Exclusions mirror the reference exactly: ``key_exclusions`` entries
    drop a whole facet, with the ``prefix?`` form excluding every facet
    starting with the prefix (``Workfunctions.cpp:198-211``);
    ``keyvalue_exclusions`` drops single (facet, value) pairs.

    -> (facet, value, n, pct, splitdist) sorted (splitdist asc, facet
    asc, value asc), limit topn. pct is the reference's integer percent
    ``(100 * n) / |items|``.
    """
    cols = list(facet_cols)
    agg = _facet_counts(sf_dir, query, cols, concurrency)
    # |items| = match count: every matched doc contributes exactly one
    # value row per facet (nulls count as their string form)
    total = int(agg[agg["facet"] == cols[0]]["n"].sum()) if len(agg) else 0
    return _rank_splitdist(
        agg, total, threshold, topn, key_exclusions, keyvalue_exclusions
    )


def _rank_splitdist(
    agg: pd.DataFrame,
    total: int,
    threshold: float,
    topn: int,
    key_exclusions: tuple[str, ...],
    keyvalue_exclusions: tuple[tuple[str, str], ...],
) -> pa.Table:
    """Shared splitdist ranking core (counts -> topKeyValues table)."""
    split = int(threshold * total)  # uint32-truncation analog
    keep = pd.Series(True, index=agg.index)
    for x in key_exclusions:
        if not x:
            continue
        if x.endswith("?"):
            keep &= ~agg["facet"].str.startswith(x[:-1])
        else:
            keep &= agg["facet"] != x
    for kf, kv in keyvalue_exclusions:
        keep &= ~((agg["facet"] == kf) & (agg["value"] == kv))
    sub = agg[keep].copy()
    sub["splitdist"] = (sub["n"] - split).abs()
    sub["pct"] = (100 * sub["n"]) // max(total, 1)
    sub = sub.sort_values(
        ["splitdist", "facet", "value"], kind="mergesort"
    ).head(topn)
    return pa.table(
        {
            "facet": pa.array(sub["facet"], type=pa.string()),
            "value": pa.array(sub["value"], type=pa.string()),
            "n": pa.array(sub["n"].astype(np.int64), type=pa.int64()),
            "pct": pa.array(sub["pct"].astype(np.int64), type=pa.int64()),
            "splitdist": pa.array(sub["splitdist"].astype(np.int64), type=pa.int64()),
        }
    )


class _Hydrator:
    """map_batches: pick the matched docs' display columns (broadcast
    (docid, score) plan; vectorized membership + score gather)."""

    def __init__(self, plan_ref, columns: list[str], id_col: str = "doc_id"):
        ids, scores = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.ids, self.scores = ids, scores
        self.columns, self.id_col = columns, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        pos = np.searchsorted(self.ids, ids)
        pos = np.minimum(pos, max(len(self.ids) - 1, 0))
        keep = self.ids[pos] == ids if len(self.ids) else np.zeros(len(ids), bool)
        sub = batch.filter(pa.array(keep))
        return sub.append_column(
            "score", pa.array(self.scores[pos[keep]], type=pa.float64())
        )


def hydrate_results(
    sf_dir: str,
    query: str,
    k: int = 10,
    columns: list[str] = ("lang", "source", "n_chars"),
    round_to: int = 4,
    concurrency: int = 2,
) -> pa.Table:
    """Top-k search results joined back to document content columns
    (the ``-ds`` item-dump analog) -> (doc_id, <columns...>, score).

    The (docid, score) plan is top-k-sized, broadcast once; the documents
    table streams through a filtered map — never collected.
    """
    from oscar_ray.pipelines.search import documents_index_dir
    from oscar_ray.query.engine import QueryEngine

    idx = documents_index_dir(sf_dir)
    ids, scores = QueryEngine(idx).search(query, k=k)
    order = np.argsort(ids.astype(np.int64))
    plan = (ids.astype(np.int64)[order], np.round(scores, round_to)[order])
    plan_ref = ray.put(plan)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"] + list(columns)
    )
    out = ds.map_batches(
        _Hydrator,
        fn_constructor_kwargs={"plan_ref": plan_ref, "columns": list(columns)},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).sort_by("doc_id")


# -- index-local variants (CLI work items; no source table needed) ---------


def docmeta_lookup(index_dir: str, docids: np.ndarray) -> pa.Table:
    """Resolve docids -> docmeta rows (docid, url, doclen[, lang]) from the
    index's own docmeta artifacts — the single-process ``-ds`` dump path.
    Scans docmeta files with a vectorized membership filter; intended for
    top-k-sized id sets (display), not corpus-sized joins."""
    import pyarrow.parquet as pq

    from oscar_ray.index.layout import docmeta_files

    want = np.sort(np.asarray(docids, dtype=np.int64))
    parts = []
    for f in docmeta_files(index_dir):
        t = pq.read_table(f)
        ids = t["docid"].to_numpy()
        pos = np.searchsorted(want, ids)
        pos = np.minimum(pos, max(len(want) - 1, 0))
        keep = want[pos] == ids if len(want) else np.zeros(len(ids), bool)
        if keep.any():
            parts.append(t.filter(pa.array(keep)))
    return (
        pa.concat_tables(parts).sort_by("docid")
        if parts
        else pa.table({"docid": pa.array([], type=pa.int64())})
    )


def shannon_topkv_from_index(
    index_dir: str,
    query: str,
    keys: list[str] = ("lang",),
    threshold: float = 0.5,
    topn: int = 10,
    key_exclusions: tuple[str, ...] = (),
    keyvalue_exclusions: tuple[tuple[str, str], ...] = (),
) -> pa.Table:
    """shannon-kvstats topKeyValues over an index's docmeta columns,
    streamed via the match plan (needs a Ray session; the source-table
    path is :func:`shannon_top_keyvalues`)."""
    agg, total = _kv_counts_from_index(index_dir, query, list(keys))
    return _rank_splitdist(
        agg, total, threshold, topn, key_exclusions, keyvalue_exclusions
    )


@ray.remote(num_cpus=1)
def _kvmeta_count_task(
    path: str, keys: list[str], plan_los, plan_his, plan_refs
) -> tuple[list, int]:
    """Count (facet, value, n) over one docmeta file restricted to the
    match plan, fetching only the plan ranges the file's docid span
    overlaps. -> (count rows, matched-doc count in this file)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["docid"] + [k for k in set(keys)])
    ids = t["docid"].to_numpy()
    keep = np.zeros(len(ids), dtype=bool)
    if len(ids):
        lo, hi = int(ids.min()), int(ids.max())
        for plo, phi, ref in zip(plan_los, plan_his, plan_refs):
            if phi <= lo or plo > hi:
                continue
            m = ray.get(ref)
            if not len(m):
                continue
            pos = np.searchsorted(m, ids)
            pos = np.minimum(pos, len(m) - 1)
            keep |= m[pos] == ids
    rows = []
    for key in keys:
        if key not in t.column_names:
            continue
        vals = t[key].to_numpy(zero_copy_only=False)[keep]
        uniq, n = np.unique(vals.astype(str), return_counts=True)
        rows.extend(
            {"facet": key, "value": v, "n": int(c)}
            for v, c in zip(uniq.tolist(), n.tolist())
        )
    return rows, int(keep.sum())


def _kv_counts_from_index(
    index_dir: str, query: str, keys: list[str], num_match_tasks: int = 8
) -> tuple[pd.DataFrame, int]:
    """Full (facet, value, n) counts over one query's match set from the
    index's own docmeta artifacts; -> (counts, |matched|).

    STREAMED like :func:`_facet_counts` (the reference keeps the result
    index lazily flattened here too, ``oscar-cmd/Workfunctions.cpp:
    146-169``): the match set lives as :func:`matched_id_plan` range
    refs, one Ray task per docmeta file fetches only overlapping ranges
    and returns facet-cardinality counts — the driver never holds a
    match-set-sized array, even for head terms. Every matched docid
    appears in exactly one docmeta row, so summing per-file matched
    counts gives |matched|."""
    from oscar_ray.index.layout import docmeta_files

    plan = matched_id_plan(index_dir, query, num_tasks=num_match_tasks)
    los = [e[0] for e in plan]
    his = [e[1] for e in plan]
    refs = [e[2] for e in plan]
    outs = ray.get(
        [
            _kvmeta_count_task.remote(f, list(keys), los, his, refs)
            for f in docmeta_files(index_dir)
        ]
    )
    counts: dict[tuple[str, str], int] = {}
    total = 0
    for rows, matched in outs:
        total += matched
        for r in rows:
            k = (r["facet"], r["value"])
            counts[k] = counts.get(k, 0) + r["n"]
    df = pd.DataFrame(
        [{"facet": k, "value": v, "n": n} for (k, v), n in counts.items()],
        columns=["facet", "value", "n"],
    )
    return df, total


def kvstats_from_index(
    index_dir: str, query: str, keys: list[str] = ("lang",), topk: int = 10
) -> pa.Table:
    """kvstats over an index's docmeta columns for one query's full
    match set, streamed via the match plan (needs a Ray session; the
    source-table path is :func:`search_facets`)."""
    df, _total = _kv_counts_from_index(index_dir, query, list(keys))
    out = []
    for facet, g in df.groupby("facet"):
        out.append(
            g.sort_values(["n", "value"], ascending=[False, True], kind="mergesort").head(topk)
        )
    res = pd.concat(out, ignore_index=True) if out else df
    return pa.table(
        {
            "facet": pa.array(res["facet"], type=pa.string()),
            "value": pa.array(res["value"], type=pa.string()),
            "n": pa.array(res["n"].astype(np.int64) if len(res) else [], type=pa.int64()),
        }
    )
