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

Distributed shape (scales to 10^12 docs): the matched-id set is a query
result (bounded: one sorted int64 array), broadcast ONCE via ray.put;
the documents table is streamed through ``map_batches`` with a
vectorized ``searchsorted`` membership test and per-batch PARTIAL facet
counts; only facet-cardinality-sized partials reach the driver. No
shuffle, no full-table materialization.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _matched_ids(sf_dir: str, query: str, suffixes: bool = False) -> np.ndarray:
    """Full BM25 match set for a query, sorted ascending int64."""
    from oscar_ray.pipelines.search import documents_index_dir
    from oscar_ray.query.engine import QueryEngine

    idx = documents_index_dir(sf_dir, suffixes=suffixes)
    ids, _ = QueryEngine(idx).search(query, k=1 << 62)
    return np.sort(ids.astype(np.int64))


class _FacetCounter:
    """map_batches: per-batch partial (facet, value, n) counts over the
    docs whose id is in the broadcast matched set."""

    def __init__(self, matched_ref, facet_cols: list[str], id_col: str = "doc_id"):
        self.matched = (
            ray.get(matched_ref) if isinstance(matched_ref, ray.ObjectRef) else matched_ref
        )
        self.facet_cols = facet_cols
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        pos = np.searchsorted(self.matched, ids)
        pos = np.minimum(pos, max(len(self.matched) - 1, 0))
        keep = (
            self.matched[pos] == ids if len(self.matched) else np.zeros(len(ids), bool)
        )
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
) -> pd.DataFrame:
    """(facet, value, n) totals over the matched docs — the shared core."""
    matched_ref = ray.put(_matched_ids(sf_dir, query))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"] + facet_cols
    )
    partials = ds.map_batches(
        _FacetCounter,
        fn_constructor_kwargs={"matched_ref": matched_ref, "facet_cols": facet_cols},
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


def kvstats_from_index(
    index_dir: str, query: str, keys: list[str] = ("lang",), topk: int = 10
) -> pa.Table:
    """kvstats over an index's docmeta columns for one query's full match
    set (single-process CLI convenience; the distributed path is
    :func:`search_facets` over the source table)."""
    import pyarrow.parquet as pq

    from oscar_ray.index.layout import docmeta_files
    from oscar_ray.query.engine import QueryEngine

    ids, _ = QueryEngine(index_dir).search(query, k=1 << 62)
    want = np.sort(ids.astype(np.int64))
    counts: dict[tuple[str, str], int] = {}
    for f in docmeta_files(index_dir):
        t = pq.read_table(f)
        dm_ids = t["docid"].to_numpy()
        pos = np.searchsorted(want, dm_ids)
        pos = np.minimum(pos, max(len(want) - 1, 0))
        keep = want[pos] == dm_ids if len(want) else np.zeros(len(dm_ids), bool)
        for key in keys:
            if key not in t.column_names:
                continue
            vals = t[key].to_numpy(zero_copy_only=False)[keep]
            uniq, n = np.unique(vals.astype(str), return_counts=True)
            for v, c in zip(uniq.tolist(), n.tolist()):
                counts[(key, v)] = counts.get((key, v), 0) + int(c)
    df = pd.DataFrame(
        [{"facet": k, "value": v, "n": n} for (k, v), n in counts.items()],
        columns=["facet", "value", "n"],
    )
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
