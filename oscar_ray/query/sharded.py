"""Doc-sharded query serving: one store copy across an actor pool.

The 50M-doc decade probe (BASELINE.md) showed full per-actor preload —
the reference's ``mlock`` work item applied per serving process
(``oscar-cmd/Workfunctions.cpp:781-820``) — inverting once
``store_bytes x pool_size`` outgrows host RAM: preload wins per actor
but caps the pool, so the node optimum became lazy hydration. Document
partitioning restores preload economics at ANY store size: shard ``i``
of ``k`` holds only posting rows whose ``block_id`` falls in its slice
of the docid-block space (``IndexReader(shard=(i, k))``), so the pool
holds ONE resident copy of the store total, regardless of pool width.

Exactness: corpus stats (n_docs, avgdl) and dictionary df/cf stay
global in every shard, so per-document BM25 scores are bit-identical
to an unsharded engine's; shards partition the docid space, so
concatenating shard top-k lists and re-applying the same tie-safe
(score desc, docid asc) ``setops.top_k`` yields the exact global
top-k. A shard's local top-k provably contains every global-top-k doc
that lives in the shard. Phrase leaves are the one globally-coupled
statistic (phrase idf uses the PHRASE's df, engine.py); the pool runs
a pre-pass summing shard-local phrase dfs (exact: docid partitioning)
and pins them in every shard before evaluation.

This is the classic document-partitioned ("local index") distributed
search architecture: every query fans out to all shards and results
merge on the coordinator — per-query latency parallelizes across the
pool, aggregate decode work matches the unsharded engine, and the
serving tier scales horizontally by adding shard groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from oscar_ray.query import setops


def merge_shard_results(
    parts: list[pa.Table], ks: dict[int, int] | int = 10
) -> pa.Table:
    """Merge per-shard (query_id, rank, docid, score) tables into the
    global top-k per query — exact, because shard docid spaces are
    disjoint and scores are computed from global stats.

    ``ks``: per-query_id k (or one int for all). Output rows are
    ordered by (query_id asc, rank asc) with ranks recomputed 1..k
    under the engine's (score desc, docid asc) tie rule.
    """
    t = pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
    if t.num_rows == 0:
        return t
    qids = t["query_id"].to_numpy()
    docids = t["docid"].to_numpy().astype(np.uint64)
    scores = t["score"].to_numpy()
    out_q, out_r, out_d, out_s = [], [], [], []
    order = np.argsort(qids, kind="stable")
    qids_s, docids_s, scores_s = qids[order], docids[order], scores[order]
    bounds = np.concatenate(
        ([0], np.flatnonzero(np.diff(qids_s)) + 1, [len(qids_s)])
    )
    for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
        qid = int(qids_s[s])
        k = ks if isinstance(ks, int) else ks.get(qid, 10)
        ids, sc = setops.top_k(docids_s[s:e], scores_s[s:e], k)
        out_q.extend([qid] * len(ids))
        out_r.extend(range(1, len(ids) + 1))
        out_d.extend(ids.astype(np.int64).tolist())
        out_s.extend(sc.tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "docid": pa.array(out_d, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        }
    )


class ShardedPool:
    """Driver-side handle over ``n_shards`` doc-sharded QueryServer
    actors. Each actor preloads its block slice (default), so pool-wide
    resident postings = ONE store copy + per-process overhead.

    >>> pool = ShardedPool(index_dir, n_shards=32)
    >>> results = pool.search_batch(query_table)   # exact global top-k
    """

    def __init__(
        self,
        index_dir: str,
        n_shards: int,
        preload: bool = True,
        default_k: int = 10,
        mode: str = "auto",
        num_cpus: float = 1,
        decoded_cache_mb: int | str | None = "auto",
    ):
        import ray

        from oscar_ray.query.engine import QueryServer

        self.default_k = default_k
        if decoded_cache_mb == "auto":
            decoded_cache_mb = self._auto_cache_mb(index_dir, n_shards)
        Actor = ray.remote(num_cpus=num_cpus)(QueryServer)
        self.actors = [
            Actor.remote(
                index_dir=index_dir,
                default_k=default_k,
                mode=mode,
                preload=preload,
                shard=(i, n_shards),
                decoded_cache_mb=decoded_cache_mb,
            )
            for i in range(n_shards)
        ]

    @staticmethod
    def _auto_cache_mb(index_dir: str, n_shards: int) -> int | None:
        """Per-shard decoded-block budget sized to the node, not the env
        default: a shard's full decoded working set is ~24 B per posting
        over 1/k of the block space, so cache min(that, a pool-wide 35%
        RAM allowance) — the 256 MB default thrashes at the 50M/100M
        decades (warm QPS collapses to cold) while the node has tens of
        GB idle. Never returns less than the 256 MB default."""
        import json
        import os

        from oscar_ray.index import layout

        try:
            with open(layout.manifest_path(index_dir)) as f:
                manifest = json.load(f)
            rows = sum(p["rows"] for p in manifest["partitions"] if p)
            need_mb = (rows * 24 // max(n_shards, 1)) >> 20
            ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            allow_mb = int(0.35 * ram / max(n_shards, 1)) >> 20
            return max(256, min(need_mb + need_mb // 4, allow_mb))
        except Exception:
            return None  # fall back to the env/default budget

    def ready(self) -> None:
        import ray

        ray.get([a.__ray_ready__.remote() for a in self.actors])

    def pin_phrase_dfs(self, queries: list[str]) -> dict:
        """Pre-pass for phrase-bearing query sets: sum shard-local
        phrase dfs (exact global df under docid partitioning) and pin
        them in every shard. Idempotent; returns the pinned map."""
        import ray

        locals_ = ray.get(
            [a.phrase_local_dfs.remote(queries) for a in self.actors]
        )
        totals: dict[tuple[str, ...], int] = {}
        for d in locals_:
            for key, df in d.items():
                totals[key] = totals.get(key, 0) + df
        if totals:
            ray.get([a.set_phrase_dfs.remote(totals) for a in self.actors])
        return totals

    def search_batch(
        self, batch: pa.Table, pin_phrases: bool = True
    ) -> pa.Table:
        """Fan one (query_id, query[, k]) batch to every shard, merge to
        the exact global top-k. ``pin_phrases=False`` skips the phrase
        pre-pass (correct only for phrase-free query sets — term,
        prefix, fuzzy, regex, field, proximity and all set operators
        need no pre-pass)."""
        import ray

        if pin_phrases and any(
            '"' in q for q in batch["query"].to_pylist()
        ):
            self.pin_phrase_dfs(batch["query"].to_pylist())
        parts = ray.get([a.__call__.remote(batch) for a in self.actors])
        if "k" in batch.column_names:
            ks = dict(
                zip(
                    batch["query_id"].to_pylist(),
                    (int(x) for x in batch["k"].to_pylist()),
                )
            )
            return merge_shard_results(parts, ks)
        return merge_shard_results(parts, self.default_k)
