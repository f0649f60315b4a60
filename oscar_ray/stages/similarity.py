"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — broadcast query matrix (ray.put
once), per-batch numpy matmul, per-batch partial top-k, driver k-way
merge. Scale path: LSH-bucketed search (random-hyperplane signatures
route vectors and queries to buckets; only matching buckets are
scanned).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-30)


def _tie_safe_topk(row: np.ndarray, ids: np.ndarray, k: int):
    """Per-batch top-k candidate selection, tie-safe (same contract as
    setops.top_k): keep every candidate whose score >= the k-th largest,
    order by (score desc, id asc), truncate to k. Truncation is safe:
    any dropped boundary tie has a higher id than k kept equal-score
    candidates, so it can never enter the global (score desc, id asc)
    top-k merge ahead of them."""
    n = len(row)
    if n == 0 or k <= 0:
        return np.empty(0, dtype=np.int64)
    if n > k:
        thresh = np.partition(row, n - k)[n - k]
        cand = np.flatnonzero(row >= thresh)
    else:
        cand = np.arange(n)
    order = np.lexsort((ids[cand], -row[cand]))[:k]
    return cand[order]


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries.

    Emits per-(query, batch) partial candidates (id, score); a tiny
    driver-side merge keeps the global top-k per query. The query matrix
    rides the object store once (ray.put), not once per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        m = _batch_matrix(batch, self.vec_col)
        if not len(ids):
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    self.id_col: pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        sims = self.q @ _normalize(m).T  # (nq, nb)
        qids, out_ids, out_sc = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            sel = _tie_safe_topk(row, ids, self.k)
            qids.extend([qi] * len(sel))
            out_ids.extend(ids[sel].tolist())
            out_sc.extend(row[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                self.id_col: pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_sc, type=pa.float64()),
            }
        )


def knn_brute_force(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """Exact cosine top-k per query -> (query_id, rank, vec_id, score).

    Ties broken by vec_id ascending; scores rounded to 6 decimals in the
    output (raw float64 used for ranking).
    """
    qref = ray.put(np.asarray(query_vecs, dtype=np.float64))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(int(r["query_id"]), []).append((r[id_col], r["score"]))
    rows = []
    for qi in range(len(query_vecs)):
        cand = by_q.get(qi, [])
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, sc) in enumerate(cand[:k], start=1):
            rows.append(
                {
                    "query_id": qi,
                    "rank": rank,
                    id_col: int(vid),
                    "score": round(float(sc), 4),
                }
            )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """All pairs with cosine >= tau (a_id < b_id) — embedding near-dup.

    Broadcast the (normalized) full matrix once, stream batches against
    it; emits only pairs where the batch row id < the matched id. Works
    to ~1M x small-dim vectors via the broadcast; beyond that use
    :func:`knn_lsh` bucketing.
    """
    all_rows = ds.select_columns([id_col, vec_col]).take_all()
    ids_all = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    mat_all = _normalize(np.array([r[vec_col] for r in all_rows], dtype=np.float64))
    order = np.argsort(ids_all)
    ids_all, mat_all = ids_all[order], mat_all[order]
    ref = ray.put((ids_all, mat_all))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat_all = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy()
            m = _normalize(_batch_matrix(batch, vec_col))
            out_a, out_b, out_s = [], [], []
            if len(ids):
                sims = m @ self.mat_all.T  # (nb, N)
                for i in range(len(ids)):
                    mask = (sims[i] >= tau) & (self.ids_all > ids[i])
                    js = np.flatnonzero(mask)
                    out_a.extend([int(ids[i])] * len(js))
                    out_b.extend(self.ids_all[js].tolist())
                    out_s.extend(np.round(sims[i][js], 4).tolist())
            return pa.table(
                {
                    "a_id": pa.array(out_a, type=pa.int64()),
                    "b_id": pa.array(out_b, type=pa.int64()),
                    "cosine": pa.array(out_s, type=pa.float64()),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=concurrency)


class _HyperplaneHasher:
    """Random-hyperplane LSH: vector -> nbits-bit bucket signature."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.int64) * (1 << np.arange(bits.shape[1]))).sum(axis=1)


def knn_lsh(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """Approximate cosine top-k: scan only vectors whose hyperplane bucket
    is within hamming distance 1 of the query's bucket (the IVF/LSH scale
    path; recall < 1 by design, output schema == knn_brute_force)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    hasher = _HyperplaneHasher(q.shape[1], nbits=nbits)
    qbuckets = hasher.bucket(q)
    # per query: admissible buckets (exact + hamming-1)
    admissible: list[set[int]] = []
    for b in qbuckets:
        s = {int(b)}
        for bit in range(nbits):
            s.add(int(b) ^ (1 << bit))
        admissible.append(s)
    adm_ref = ray.put(admissible)
    qref = ray.put(q)

    class BucketedTopK(BruteForceTopK):
        def __init__(self):
            super().__init__(qref, k, id_col=id_col, vec_col=vec_col)
            self.adm = ray.get(adm_ref)
            self.hasher = hasher

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy()
            m = _normalize(_batch_matrix(batch, vec_col))
            if not len(ids):
                return super().__call__(batch)
            buckets = self.hasher.bucket(m)
            qids, out_ids, out_sc = [], [], []
            for qi in range(self.q.shape[0]):
                sel = np.array(
                    [j for j, b in enumerate(buckets) if int(b) in self.adm[qi]], dtype=np.int64
                )
                if not len(sel):
                    continue
                row = self.q[qi] @ m[sel].T
                pick = _tie_safe_topk(row, ids[sel], k)
                qids.extend([qi] * len(pick))
                out_ids.extend(ids[sel][pick].tolist())
                out_sc.extend(row[pick].tolist())
            return pa.table(
                {
                    "query_id": pa.array(qids, type=pa.int64()),
                    id_col: pa.array(out_ids, type=pa.int64()),
                    "score": pa.array(out_sc, type=pa.float64()),
                }
            )

    partials = ds.map_batches(
        BucketedTopK, batch_format="pyarrow", concurrency=concurrency
    ).take_all()
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(int(r["query_id"]), []).append((r[id_col], r["score"]))
    rows = []
    for qi in range(len(q)):
        cand = by_q.get(qi, [])
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, sc) in enumerate(cand[:k], start=1):
            rows.append({"query_id": qi, "rank": rank, id_col: int(vid), "score": round(float(sc), 4)})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )
