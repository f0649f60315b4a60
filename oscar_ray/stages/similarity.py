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
    return _merge_topk(partials, len(query_vecs), k, id_col)


@ray.remote(num_cpus=1)
def _chunk_pair_task(
    left: pa.Table, right: pa.Table | None, tau: float, id_col: str, vec_col: str
) -> pa.Table:
    """All cosine >= tau pairs between two vector chunks (right=None:
    within-chunk pairs). One matmul + one vectorized threshold — the
    a_id < b_id constraint is a mask, never a per-row loop."""
    ids_a = left[id_col].to_numpy()
    m_a = _normalize(_batch_matrix(left, vec_col))
    if right is None:
        ids_b, m_b = ids_a, m_a
    else:
        ids_b = right[id_col].to_numpy()
        m_b = _normalize(_batch_matrix(right, vec_col))
    if not len(ids_a) or not len(ids_b):
        return pa.table(
            {
                "a_id": pa.array([], type=pa.int64()),
                "b_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    sims = m_a @ m_b.T
    mask = (sims >= tau) & (ids_a[:, None] < ids_b[None, :])
    ai, bj = np.nonzero(mask)
    return pa.table(
        {
            "a_id": pa.array(ids_a[ai].astype(np.int64)),
            "b_id": pa.array(ids_b[bj].astype(np.int64)),
            "cosine": pa.array(np.round(sims[ai, bj], 4), type=pa.float64()),
        }
    )


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """All pairs with cosine >= tau (a_id < b_id) — EXACT embedding
    near-dup, distributed as chunk-pair tasks.

    The dataset's blocks become object-store chunk refs (driver holds
    refs only, never vectors); every chunk pair (i <= j) is one Ray task
    doing a single matmul. Exact all-pairs is inherently O(N^2/chunks^2)
    tasks — for approximate sub-quadratic near-dup at larger N use
    :func:`embedding_dup_pairs_lsh`.
    """
    chunks = (
        ds.select_columns([id_col, vec_col])
        .map_batches(lambda t: t, batch_format="pyarrow", batch_size=65536)
        .to_arrow_refs()
    )
    futs = []
    for i in range(len(chunks)):
        futs.append(_chunk_pair_task.remote(chunks[i], None, tau, id_col, vec_col))
        for j in range(i + 1, len(chunks)):
            futs.append(_chunk_pair_task.remote(chunks[i], chunks[j], tau, id_col, vec_col))
    return ray.data.from_arrow_refs(futs)


def embedding_dup_pairs_lsh(
    ds: ray.data.Dataset,
    tau: float = 0.95,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int = 16,
    max_bucket: int = 100_000,
    seed: int = 42,
) -> ray.data.Dataset:
    """Approximate near-dup pairs: only vectors sharing a hyperplane
    bucket are compared (the sub-quadratic scale path; recall < 1 for
    pairs split across buckets — higher tau -> higher recall). Bucket
    routing is a hash shuffle; within-partition comparison is one
    matmul per bucket run; oversized buckets (> max_bucket) are dropped
    with the same disclosure rule as the text-dedup df cap."""
    import pandas as pd

    class AddBucket:
        def __init__(self):
            self.hasher = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if not t.num_rows:
                # same empty-batch guard as build_vector_buckets: never
                # latch the hasher's dim off an empty batch
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        vec_col: t[vec_col].combine_chunks(),
                        "bucket": pa.array([], type=pa.int64()),
                        "part": pa.array([], type=pa.int64()),
                    }
                )
            m = _normalize(_batch_matrix(t, vec_col))
            if self.hasher is None:
                self.hasher = _HyperplaneHasher(m.shape[1], nbits, seed)
            b = self.hasher.bucket(m)
            return pa.table(
                {
                    id_col: t[id_col].combine_chunks().cast(pa.int64()),
                    vec_col: t[vec_col].combine_chunks(),
                    "bucket": pa.array(b.astype(np.int64)),
                    "part": pa.array((b % num_parts).astype(np.int64)),
                }
            )

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        buckets = g["bucket"].to_numpy()
        mat = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        order = np.lexsort((ids, buckets))
        ids, buckets, mat = ids[order], buckets[order], mat[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(buckets)) + 1, [len(ids)])
        )
        a_l, b_l, s_l = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2 or m > max_bucket:
                continue
            sims = mat[s:e] @ mat[s:e].T
            sub_ids = ids[s:e]
            mask = (sims >= tau) & (sub_ids[:, None] < sub_ids[None, :])
            ai, bj = np.nonzero(mask)
            a_l.append(sub_ids[ai])
            b_l.append(sub_ids[bj])
            s_l.append(np.round(sims[ai, bj], 4))
        if not a_l:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_l),
                "b_id": np.concatenate(b_l),
                "cosine": np.concatenate(s_l),
            }
        )

    return (
        ds.map_batches(AddBucket, batch_format="pyarrow", concurrency=2)
        .groupby("part")
        .map_groups(pairs_in_part, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# distributed spherical k-means + IVF (inverted-file) ANN
# --------------------------------------------------------------------------


class _KMeansAssignPartial:
    """map_batches: per-batch partial (cluster, count, sum-vector) rows —
    the mergeable-aggregate shape: driver combine is k x dim, never
    corpus-sized."""

    def __init__(self, centroids_ref, vec_col: str):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.c = c  # (k, dim), normalized
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        if not len(m):
            return pa.table(
                {
                    "cluster": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        assign = np.argmax(m @ self.c.T, axis=1)
        clusters, inv = np.unique(assign, return_inverse=True)
        sums = np.zeros((len(clusters), m.shape[1]))
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(clusters))
        return pa.table(
            {
                "cluster": pa.array(clusters.astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
                "vsum": pa.array([r.tolist() for r in sums], type=pa.list_(pa.float64())),
            }
        )


def _deterministic_seed_vectors(
    ds: ray.data.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """k seed vectors chosen by smallest splitmix64(vec_id) — a seeded,
    order-independent sample computed as per-batch partial top-k."""
    from oscar_ray.stages.dedup import _splitmix64

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _splitmix64(ids + np.uint64(0xC0FFEE))
        keep = np.argsort(h)[:k]
        return pa.table(
            {
                "h": pa.array(h[keep].view(np.int64)),
                vec_col: t[vec_col].take(pa.array(keep)),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: np.uint64(np.int64(r["h"])))
    return _normalize(
        np.array([r[vec_col] for r in rows[:k]], dtype=np.float64)
    )


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> np.ndarray:
    """Distributed spherical k-means -> (k, dim) normalized centroids.

    Per iteration: broadcast centroids (ray.put once), one streaming
    pass of per-batch partial sums, a k x dim driver combine. Fully
    deterministic (seeded order-independent init, argmax ties to the
    lowest cluster id). Empty clusters keep their previous centroid.
    """
    centroids = _deterministic_seed_vectors(ds, k, id_col, vec_col)
    for _ in range(n_iter):
        partials = ds.map_batches(
            _KMeansAssignPartial,
            fn_constructor_kwargs={"centroids_ref": ray.put(centroids), "vec_col": vec_col},
            batch_format="pyarrow",
            concurrency=concurrency,
        ).take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in partials:
            sums[int(r["cluster"])] += np.asarray(r["vsum"])
            counts[int(r["cluster"])] += r["n"]
        new = centroids.copy()
        nz = counts > 0
        new[nz] = _normalize(sums[nz] / counts[nz, None])
        if np.allclose(new, centroids, atol=1e-9):
            break
        centroids = new
    return centroids


def ivf_build(
    ds: ray.data.Dataset,
    out_dir: str,
    n_clusters: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> str:
    """Build an IVF artifact: k-means centroids + the vector table
    hive-partitioned by nearest-centroid cluster (`cluster=<c>/`).
    A probe reads only the nprobe nearest clusters' directories."""
    import json
    import os

    centroids = kmeans_fit(ds, n_clusters, n_iter, id_col, vec_col, concurrency)
    cref = ray.put(centroids)

    class AddCluster:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(t, vec_col))
            a = np.argmax(m @ self.c.T, axis=1) if len(m) else np.empty(0, np.int64)
            return t.append_column("cluster", pa.array(a.astype(np.int64)))

    ds.map_batches(AddCluster, batch_format="pyarrow", concurrency=concurrency).write_parquet(
        out_dir, partition_cols=["cluster"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    with open(os.path.join(out_dir, "ivf_manifest.json"), "w") as f:
        json.dump(
            {"n_clusters": int(n_clusters), "id_col": id_col, "vec_col": vec_col}, f
        )
    return out_dir


def ivf_search(
    ivf_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> pa.Table:
    """IVF probe: per query the nprobe nearest centroids' partitions are
    read and brute-force scored; with nprobe == n_clusters the result is
    EXACTLY knn_brute_force (tested). Output schema == knn_brute_force."""
    import glob
    import os

    centroids = np.load(os.path.join(ivf_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    sims = q @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    # per query: nprobe nearest clusters (ties to lower id via stable sort)
    probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    # per query admissible cluster sets, vectorized membership at scan time
    adm = [np.sort(p) for p in probe]
    want = np.unique(probe.reshape(-1))
    paths = []
    for c in want:
        d = os.path.join(ivf_dir, f"cluster={int(c)}")
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return _merge_topk([], len(q), k, id_col)
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col, "cluster"])
    qref = ray.put(q)
    adm_ref = ray.put(adm)

    class ProbeTopK(BruteForceTopK):
        def __init__(self):
            super().__init__(qref, k, id_col=id_col, vec_col=vec_col)
            self.adm = ray.get(adm_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy()
            # hive partition values materialize as strings
            clusters = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(batch, self.vec_col))
            qids, out_ids, out_sc = [], [], []
            for qi in range(self.q.shape[0]):
                sel = np.flatnonzero(np.isin(clusters, self.adm[qi]))
                if not len(sel):
                    continue
                row = self.q[qi] @ m[sel].T
                pick = _tie_safe_topk(row, ids[sel], self.k)
                qids.extend([qi] * len(pick))
                out_ids.extend(ids[sel][pick].tolist())
                out_sc.extend(row[pick].tolist())
            return pa.table(
                {
                    "query_id": pa.array(qids, type=pa.int64()),
                    self.id_col: pa.array(out_ids, type=pa.int64()),
                    "score": pa.array(out_sc, type=pa.float64()),
                }
            )

    partials = ds.map_batches(
        ProbeTopK, batch_format="pyarrow", concurrency=concurrency
    ).take_all()
    return _merge_topk(partials, len(q), k, id_col)


class _HyperplaneHasher:
    """Random-hyperplane LSH: vector -> nbits-bit bucket signature."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))

    def bucket(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits.astype(np.int64) * (1 << np.arange(bits.shape[1]))).sum(axis=1)


def _admissible_buckets(qbuckets: np.ndarray, nbits: int) -> list[np.ndarray]:
    """Per query: sorted admissible bucket ids (exact + hamming-1)."""
    out = []
    for b in qbuckets:
        s = np.concatenate(
            ([int(b)], np.int64(b) ^ (np.int64(1) << np.arange(nbits, dtype=np.int64)))
        )
        out.append(np.unique(s))
    return out


def _merge_topk(partials, n_queries: int, k: int, id_col: str) -> pa.Table:
    """Driver-side k.n_queries-sized merge of per-batch partials."""
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(int(r["query_id"]), []).append((r[id_col], r["score"]))
    rows = []
    for qi in range(n_queries):
        cand = by_q.get(qi, [])
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (vid, sc) in enumerate(cand[:k], start=1):
            rows.append(
                {"query_id": qi, "rank": rank, id_col: int(vid), "score": round(float(sc), 4)}
            )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


class _LshTopK(BruteForceTopK):
    """Per-batch LSH-filtered cosine top-k (vectorized np.isin bucket
    membership — never a per-element Python test)."""

    def __init__(self, qref, adm_ref, hasher, k, id_col, vec_col):
        super().__init__(qref, k, id_col=id_col, vec_col=vec_col)
        self.adm = ray.get(adm_ref) if isinstance(adm_ref, ray.ObjectRef) else adm_ref
        self.hasher = hasher

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        m = _normalize(_batch_matrix(batch, self.vec_col))
        if not len(ids):
            return super().__call__(batch)
        buckets = self.hasher.bucket(m)
        qids, out_ids, out_sc = [], [], []
        for qi in range(self.q.shape[0]):
            sel = np.flatnonzero(np.isin(buckets, self.adm[qi]))
            if not len(sel):
                continue
            row = self.q[qi] @ m[sel].T
            pick = _tie_safe_topk(row, ids[sel], self.k)
            qids.extend([qi] * len(pick))
            out_ids.extend(ids[sel][pick].tolist())
            out_sc.extend(row[pick].tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                self.id_col: pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_sc, type=pa.float64()),
            }
        )


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
    is within hamming distance 1 of the query's bucket (recall < 1 by
    design; output schema == knn_brute_force). Full-scan variant — use
    :func:`build_vector_buckets` + :func:`knn_lsh_partitioned` to prune
    I/O as well as dot products (identical output, same hasher)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    hasher = _HyperplaneHasher(q.shape[1], nbits=nbits)
    adm = _admissible_buckets(hasher.bucket(q), nbits)
    partials = ds.map_batches(
        _LshTopK,
        fn_constructor_kwargs={
            "qref": ray.put(q),
            "adm_ref": ray.put(adm),
            "hasher": hasher,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, len(q), k, id_col)


def build_vector_buckets(
    ds: ray.data.Dataset,
    out_dir: str,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> str:
    """Write the vector table hive-partitioned by hyperplane bucket
    (`bucket=<b>/...parquet`) + a manifest — the IVF-style ANN artifact.
    A probe then reads ONLY admissible bucket directories: with nbits=8
    and hamming-1 probing, (1+nbits)/2^nbits ~ 3.5% of the bytes."""
    import json
    import os

    class AddBucket:
        def __init__(self):
            self.hasher = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if not t.num_rows:
                # never latch the hasher off an empty batch: its dim would
                # pin to a bogus value and crash the next real batch
                return t.append_column("bucket", pa.array([], type=pa.int64()))
            m = _normalize(_batch_matrix(t, vec_col))
            if self.hasher is None:
                self.hasher = _HyperplaneHasher(m.shape[1], nbits, seed)
            b = self.hasher.bucket(m)
            return t.append_column("bucket", pa.array(b.astype(np.int64)))

    ds.map_batches(AddBucket, batch_format="pyarrow", concurrency=2).write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, "ann_manifest.json"), "w") as f:
        json.dump({"nbits": nbits, "seed": seed, "id_col": id_col, "vec_col": vec_col}, f)
    return out_dir


def knn_lsh_partitioned(
    bucket_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """LSH top-k over a bucket-partitioned vector artifact: reads ONLY the
    union of the queries' admissible bucket partitions (hamming <= 1),
    then scans them with the same per-query bucket filter as
    :func:`knn_lsh` — output is identical to knn_lsh over the full table."""
    import json
    import os

    with open(os.path.join(bucket_dir, "ann_manifest.json")) as f:
        mf = json.load(f)
    nbits, seed = mf["nbits"], mf["seed"]
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    hasher = _HyperplaneHasher(q.shape[1], nbits=nbits, seed=seed)
    adm = _admissible_buckets(hasher.bucket(q), nbits)
    want = np.unique(np.concatenate(adm)) if adm else np.empty(0, dtype=np.int64)
    import glob

    paths = []
    for b in want:
        d = os.path.join(bucket_dir, f"bucket={int(b)}")
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return _merge_topk([], len(q), k, id_col)
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    partials = ds.map_batches(
        _LshTopK,
        fn_constructor_kwargs={
            "qref": ray.put(q),
            "adm_ref": ray.put(adm),
            "hasher": hasher,
            "k": k,
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, len(q), k, id_col)


# -- SemDeDup: cluster-partitioned semantic dedup ----------------------------


def _greedy_keep(vecs: np.ndarray, threshold: float, block: int = 512) -> np.ndarray:
    """Greedy lowest-id-wins near-dup removal over NORMALIZED rows
    (already sorted by id ascending): row j is dropped iff some KEPT
    earlier row i < j has cos(i, j) >= threshold. Returns a bool keep
    mask. Blocked: O(n^2 / block) matmuls against the kept prefix plus a
    short within-block resolution loop (sequential dependence is real —
    a dropped row must not veto later rows)."""
    n = len(vecs)
    keep = np.ones(n, dtype=bool)
    kept_rows: list[np.ndarray] = []
    for s in range(0, n, block):
        e = min(s + block, n)
        blk = vecs[s:e]
        # killed by any kept row from EARLIER blocks (one matmul)
        if kept_rows:
            prev = np.concatenate(kept_rows, axis=0)
            dead = (blk @ prev.T).max(axis=1) >= threshold
        else:
            dead = np.zeros(e - s, dtype=bool)
        # within-block sequential resolution on the block self-sims
        sims = blk @ blk.T
        for j in range(e - s):
            if dead[j]:
                continue
            alive_before = np.flatnonzero(~dead[:j])
            if len(alive_before) and sims[j, alive_before].max() >= threshold:
                dead[j] = True
        keep[s:e] = ~dead
        if (e - s) - int(dead.sum()):
            kept_rows.append(blk[~dead])
    return keep


class _ClusterAssignStage:
    """map_batches: (id, vec) -> (id, vec, cluster) with argmax-cosine
    assignment against broadcast centroids (ties to the lowest cluster
    id, the kmeans_fit contract)."""

    def __init__(self, centroids_ref, id_col: str, vec_col: str):
        self.centroids = np.asarray(ray.get(centroids_ref))
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        if len(m) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    self.vec_col: batch[self.vec_col],
                    "cluster": pa.array([], type=pa.int64()),
                }
            )
        cluster = np.argmax(m @ self.centroids.T, axis=1).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                self.vec_col: batch[self.vec_col],
                "cluster": pa.array(cluster),
            }
        )


def semantic_dedup(
    ds: ray.data.Dataset,
    k: int = 16,
    threshold: float = 0.85,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023): distributed spherical k-means
    partitions the embedding space; WITHIN each cluster a greedy
    lowest-id-wins sweep drops any vector with cosine >= ``threshold``
    to an earlier kept vector. -> (vec_id, cluster, keep) for every
    input row.

    Deterministic at any parallelism: kmeans_fit is order-independent,
    assignment ties break to the lowest cluster id, and the keep
    decision depends only on the cluster's id-sorted member list.

    Distributed shape: centroids broadcast once (``ray.put``); ONE
    cluster-routed exchange co-locates each cluster's members; the
    quadratic work is per-cluster (the SemDeDup accepted cost — the
    paper's pairwise pass is exactly this), blocked matmuls against the
    kept prefix. Partitioning assumption: k is sized so one cluster's
    vectors fit a worker (n/k x dim on average); skewed clusters degrade
    wall-clock, not correctness.
    """
    centroids = kmeans_fit(
        ds, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
        concurrency=concurrency,
    )
    assigned = ds.map_batches(
        _ClusterAssignStage,
        fn_constructor_kwargs={
            "centroids_ref": ray.put(centroids),
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        vecs = _normalize(_batch_matrix(g, vec_col))[order]
        keep = _greedy_keep(vecs, threshold)
        cl = g["cluster"].to_numpy()[order]
        return pa.table(
            {
                id_col: pa.array(ids[order], type=pa.int64()),
                "cluster": pa.array(cl, type=pa.int64()),
                "keep": pa.array(keep.astype(np.int64)),
            }
        )

    return (
        # inline-threshold coalesce: embedding-carrying exchange (spans.py)
        assigned.repartition(max(16, k))
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


# -- Product quantization (PQ) ANN -------------------------------------------


class _PQAssignPartial:
    """map_batches: per-batch partial (sub, code, count, sum) rows for
    every subspace at once — the mergeable k-means shape, m times."""

    def __init__(self, books_ref, vec_col: str):
        b = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        self.books = b  # (m, ncodes, dsub)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        m, ncodes, dsub = self.books.shape
        if not len(mat):
            return pa.table(
                {
                    "sub": pa.array([], type=pa.int64()),
                    "code": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        subs, codes, ns, sums = [], [], [], []
        for s in range(m):
            x = mat[:, s * dsub : (s + 1) * dsub]
            # L2 assignment, ties to the lowest code id (argmin contract)
            d = ((x[:, None, :] - self.books[s][None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            u, inv = np.unique(assign, return_inverse=True)
            sm = np.zeros((len(u), dsub))
            np.add.at(sm, inv, x)
            subs.append(np.full(len(u), s, dtype=np.int64))
            codes.append(u.astype(np.int64))
            ns.append(np.bincount(inv, minlength=len(u)).astype(np.int64))
            sums.append(sm)
        return pa.table(
            {
                "sub": pa.array(np.concatenate(subs)),
                "code": pa.array(np.concatenate(codes)),
                "n": pa.array(np.concatenate(ns)),
                "vsum": pa.array(
                    [r.tolist() for r in np.concatenate(sums, axis=0)],
                    type=pa.list_(pa.float64()),
                ),
            }
        )


def pq_train(
    ds: ray.data.Dataset,
    m: int = 4,
    nbits: int = 6,
    n_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> np.ndarray:
    """Product-quantization codebooks -> (m, 2**nbits, dim/m), Lloyd's
    k-means per subspace over the L2-NORMALIZED vectors (so inner-product
    ADC approximates cosine). All m subspaces train in the SAME streaming
    pass per iteration: per-batch partial (sub, code, n, sum) rows,
    driver combine is (m * 2**nbits) x dsub — never corpus-sized.
    Deterministic: seeds from smallest splitmix64(vec_id), argmin ties to
    the lowest code, empty codes keep their previous centroid.

    Jegou, Douze & Schmid 2011, "Product quantization for nearest
    neighbor search" (TPAMI) — the standard billion-scale memory path:
    a dim-float vector becomes m codes (m bytes at nbits<=8).
    """
    ncodes = 1 << nbits
    seeds = _deterministic_seed_vectors(ds, ncodes, id_col, vec_col)  # (ncodes, dim)
    if seeds.shape[0] < ncodes:
        raise ValueError(f"need >= {ncodes} vectors to train {nbits}-bit PQ")
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack([seeds[:, s * dsub : (s + 1) * dsub] for s in range(m)])
    for _ in range(n_iter):
        partials = ds.map_batches(
            _PQAssignPartial,
            fn_constructor_kwargs={"books_ref": ray.put(books), "vec_col": vec_col},
            batch_format="pyarrow",
            concurrency=concurrency,
        ).take_all()
        sums = np.zeros_like(books)
        counts = np.zeros((m, ncodes))
        for r in partials:
            sums[int(r["sub"]), int(r["code"])] += np.asarray(r["vsum"])
            counts[int(r["sub"]), int(r["code"])] += r["n"]
        new = books.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        if np.allclose(new, books, atol=1e-12):
            break
        books = new
    return books


class _PQEncodeStage:
    """map_batches actor: (id, vec) -> (id, codes list<uint8>)."""

    def __init__(self, books_ref, id_col: str, vec_col: str):
        self.books = ray.get(books_ref)
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.vec_col))
        m, ncodes, dsub = self.books.shape
        codes = np.zeros((len(mat), m), dtype=np.uint8)
        for s in range(m):
            x = mat[:, s * dsub : (s + 1) * dsub]
            d = ((x[:, None, :] - self.books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                "codes": pa.array(
                    [r.tolist() for r in codes], type=pa.list_(pa.uint8())
                ),
            }
        )


def pq_encode(
    ds: ray.data.Dataset,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """-> (vec_id, codes): the compressed index, m bytes per vector."""
    return ds.map_batches(
        _PQEncodeStage,
        fn_constructor_kwargs={
            "books_ref": ray.put(books),
            "id_col": id_col,
            "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class _PQAdcTopK:
    """Actor-pool stage: asymmetric-distance (ADC) top-k per batch of
    codes against broadcast per-query lookup tables. One table build per
    actor (q x m x ncodes), per-batch work is pure gather + sum."""

    def __init__(self, books_ref, qref, k: int, id_col: str):
        books = ray.get(books_ref)  # (m, ncodes, dsub)
        q = _normalize(np.asarray(ray.get(qref), dtype=np.float64))
        m, ncodes, dsub = books.shape
        # inner-product tables: tab[qi, s, c] = q_s . book[s, c]
        qs = q.reshape(len(q), m, dsub)
        self.tab = np.einsum("qsd,scd->qsc", qs, books)
        self.k, self.id_col = k, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        col = batch["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.asarray(col.flatten(), dtype=np.int64).reshape(len(ids), -1)
        nq, m, ncodes = self.tab.shape
        # score[qi, row] = sum_s tab[qi, s, codes[row, s]]
        flat = codes + (np.arange(m) * ncodes)[None, :]
        scores = self.tab.reshape(nq, -1)[:, flat].sum(axis=2)  # (nq, rows)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            sel = _tie_safe_topk(scores[qi], ids, self.k)
            out_q.append(np.full(len(sel), qi, dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(scores[qi][sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def knn_pq(
    codes_ds: ray.data.Dataset,
    books: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> pa.Table:
    """ADC top-k over a PQ-encoded corpus -> (query_id, vec_id, score),
    (query_id asc, score desc, id asc). Approximate by construction;
    the pytest contract is recall vs brute force, plus exactness when
    the codebook reconstructs the corpus exactly."""
    partials = codes_ds.map_batches(
        _PQAdcTopK,
        fn_constructor_kwargs={
            "books_ref": ray.put(books),
            "qref": ray.put(queries),
            "k": k,
            "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    ).take_all()
    return _merge_topk(partials, len(queries), k, id_col)


def ivf_pq_build(
    ds: ray.data.Dataset,
    out_dir: str,
    n_clusters: int = 16,
    m: int = 8,
    nbits: int = 6,
    n_iter: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
    books: np.ndarray | None = None,
) -> str:
    """IVF-PQ artifact (the FAISS IVFADC shape, Jegou et al. 2011 §V):
    coarse k-means centroids partition the corpus (hive `cluster=<c>/`),
    and each partition stores only (id, m-byte PQ codes) — at 100 TB the
    float vectors never persist in the index, a 64-float embedding
    costs m bytes + the docid. PQ codes quantize the raw NORMALIZED
    vector (not the residual), so ADC inner-product scores are directly
    comparable across probed clusters.

    ``books`` overrides codebook training (test hook / precomputed)."""
    import json
    import os

    centroids = kmeans_fit(ds, n_clusters, n_iter, id_col, vec_col, concurrency)
    if books is None:
        books = pq_train(
            ds, m=m, nbits=nbits, n_iter=n_iter, id_col=id_col,
            vec_col=vec_col, concurrency=concurrency,
        )
    cref, bref = ray.put(centroids), ray.put(books)

    class AssignEncode:
        def __init__(self):
            self.c = ray.get(cref)
            self.books = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = _normalize(_batch_matrix(t, vec_col))
            mm, ncodes, dsub = self.books.shape
            if not len(mat):
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "codes": pa.array([], type=pa.list_(pa.uint8())),
                        "cluster": pa.array([], type=pa.int64()),
                    }
                )
            cl = np.argmax(mat @ self.c.T, axis=1).astype(np.int64)
            codes = np.zeros((len(mat), mm), dtype=np.uint8)
            for s in range(mm):
                x = mat[:, s * dsub : (s + 1) * dsub]
                d = ((x[:, None, :] - self.books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: t[id_col].cast(pa.int64()),
                    "codes": pa.array(
                        [r.tolist() for r in codes], type=pa.list_(pa.uint8())
                    ),
                    "cluster": pa.array(cl),
                }
            )

    ds.map_batches(
        AssignEncode, batch_format="pyarrow", concurrency=concurrency
    ).write_parquet(out_dir, partition_cols=["cluster"])
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    np.save(os.path.join(out_dir, "pq_books.npy"), books)
    with open(os.path.join(out_dir, "ivfpq_manifest.json"), "w") as f:
        json.dump(
            {"n_clusters": int(n_clusters), "m": int(m), "nbits": int(nbits),
             "id_col": id_col}, f
        )
    return out_dir


def ivf_pq_search(
    ivfpq_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> pa.Table:
    """Probe the nprobe nearest coarse clusters, ADC-score their PQ
    codes. Output schema == knn_brute_force. With nprobe == n_clusters
    and a lossless codebook the result is EXACTLY brute force (tested)."""
    import glob
    import os

    centroids = np.load(os.path.join(ivfpq_dir, "centroids.npy"))
    books = np.load(os.path.join(ivfpq_dir, "pq_books.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    sims = q @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    adm = [np.sort(p) for p in probe]
    want = np.unique(probe.reshape(-1))
    paths = []
    for c in want:
        d = os.path.join(ivfpq_dir, f"cluster={int(c)}")
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return _merge_topk([], len(q), k, id_col)
    ds = ray.data.read_parquet(paths, columns=[id_col, "codes", "cluster"])
    bref, qref, aref = ray.put(books), ray.put(q), ray.put(adm)

    class ProbeAdc(_PQAdcTopK):
        def __init__(self):
            super().__init__(bref, qref, k, id_col)
            self.adm = ray.get(aref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy()
            clusters = batch["cluster"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            col = batch["codes"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = np.asarray(col.flatten(), dtype=np.int64).reshape(len(ids), -1)
            nq, mm, ncodes = self.tab.shape
            flat = codes + (np.arange(mm) * ncodes)[None, :]
            qids, out_ids, out_sc = [], [], []
            for qi in range(nq):
                sel = np.flatnonzero(np.isin(clusters, self.adm[qi]))
                if not len(sel):
                    continue
                row = self.tab[qi].reshape(-1)[flat[sel]].sum(axis=1)
                pick = _tie_safe_topk(row, ids[sel], self.k)
                qids.extend([qi] * len(pick))
                out_ids.extend(ids[sel][pick].tolist())
                out_sc.extend(row[pick].tolist())
            return pa.table(
                {
                    "query_id": pa.array(qids, type=pa.int64()),
                    self.id_col: pa.array(out_ids, type=pa.int64()),
                    "score": pa.array(out_sc, type=pa.float64()),
                }
            )

    partials = ds.map_batches(
        ProbeAdc, batch_format="pyarrow", concurrency=concurrency
    ).take_all()
    return _merge_topk(partials, len(q), k, id_col)


# -- NSW graph ANN: the per-segment HNSW layout ------------------------------


def _nsw_search_graph(
    vn: np.ndarray, nbrs: np.ndarray, q: np.ndarray, ef: int, entry: int = 0
):
    """Best-first beam search over one shard's graph.

    Returns (ids, sims) of the ef best found, sim desc then id asc —
    deterministic: heap keys carry ids, no float ties left to chance.
    """
    import heapq

    visited = np.zeros(len(vn), dtype=bool)
    s0 = float(vn[entry] @ q)
    visited[entry] = True
    cand = [(-s0, entry)]  # max-heap on sim (negated)
    best = [(s0, -entry)]  # min-heap keeping the ef best
    while cand:
        negs, u = heapq.heappop(cand)
        if len(best) >= ef and -negs < best[0][0]:
            break  # nothing in the frontier can improve the result set
        nb = nbrs[u]
        nb = nb[nb >= 0]
        nb = nb[~visited[nb]]
        if not len(nb):
            continue
        visited[nb] = True
        sims = vn[nb] @ q
        worst = best[0][0]
        for s, v in zip(sims.tolist(), nb.tolist()):
            if len(best) < ef or s > worst:
                heapq.heappush(cand, (-s, v))
                heapq.heappush(best, (s, -v))
                if len(best) > ef:
                    heapq.heappop(best)
                worst = best[0][0]
    out = sorted(best, key=lambda t: (-t[0], -t[1]))
    return (
        np.array([-i for _, i in out], dtype=np.int64),
        np.array([s for s, _ in out], dtype=np.float64),
    )


def _nsw_connect(nbrs: np.ndarray, deg: np.ndarray, vn: np.ndarray, a: int, b: int):
    cap = nbrs.shape[1]
    if deg[a] < cap:
        nbrs[a, deg[a]] = b
        deg[a] += 1
        return
    cur = np.append(nbrs[a], np.int32(b))
    sims = vn[cur] @ vn[a]
    keep = np.lexsort((cur, -sims))[:cap]  # best sims, ties by id asc
    nbrs[a] = cur[keep]


def _nsw_build_graph(vn: np.ndarray, m_links: int, ef_construction: int) -> np.ndarray:
    """Incremental NSW construction (Malkov et al.: the HNSW base
    layer): each point links to its m_links best beam-search results
    over the graph so far, bidirectionally, neighbor lists pruned to
    2*m_links by similarity. Deterministic: fixed insertion order,
    id-keyed tie-breaks. Returns the int32 (n, 2*m_links) adjacency."""
    n = len(vn)
    nbrs = np.full((n, 2 * m_links), -1, dtype=np.int32)
    deg = np.zeros(n, dtype=np.int32)
    for i in range(1, n):
        ids, _ = _nsw_search_graph(vn, nbrs, vn[i], ef_construction)
        for j in ids[:m_links].tolist():
            _nsw_connect(nbrs, deg, vn, i, j)
            _nsw_connect(nbrs, deg, vn, j, i)
    return nbrs


def nsw_build(
    ds: ray.data.Dataset,
    out_dir: str,
    m_links: int = 8,
    ef_construction: int = 40,
    shard_rows: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> str:
    """Write a shard-partitioned NSW graph artifact (`shard=<s>/...`).

    One shard per ~shard_rows input rows (the Lucene segment model:
    each segment owns an independent graph; construction parallelizes
    across shards, the expensive step of any HNSW-family index). Shard
    keys are the shard's min id — deterministic for disjoint blocks."""
    import json
    import os

    def build_shard(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    vec_col: pa.array([], type=pa.list_(pa.float32())),
                    "nbrs": pa.array([], type=pa.list_(pa.int32())),
                    "shard": pa.array([], type=pa.int64()),
                }
            )
        ids = t[id_col].to_numpy()
        vn = _normalize(_batch_matrix(t, vec_col))
        nbrs = _nsw_build_graph(vn, m_links, ef_construction)
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                # adjacency stored as GLOBAL ids so the searcher is
                # independent of parquet row order within the shard
                "nbrs": pa.array([ids[row[row >= 0]].tolist() for row in nbrs]),
                "shard": pa.array(
                    np.full(len(ids), ids.min(), dtype=np.int64)
                ),
            }
        )

    ds.map_batches(
        build_shard,
        batch_format="pyarrow",
        batch_size=shard_rows,
        concurrency=concurrency,
    ).write_parquet(out_dir, partition_cols=["shard"])
    with open(os.path.join(out_dir, "ann_manifest.json"), "w") as f:
        json.dump(
            {
                "kind": "nsw",
                "m_links": m_links,
                "ef_construction": ef_construction,
                "id_col": id_col,
                "vec_col": vec_col,
            },
            f,
        )
    return out_dir


@ray.remote(num_cpus=1)
def _nsw_shard_search(
    paths: list, q: np.ndarray, k: int, ef: int, id_col: str, vec_col: str
) -> pa.Table:
    import pyarrow.parquet as pq_

    t = pa.concat_tables([pq_.read_table(p, columns=[id_col, vec_col, "nbrs"]) for p in paths])
    ids = t[id_col].to_numpy()
    vn = _normalize(_batch_matrix(t, vec_col))
    # local row index -> padded adjacency matrix
    lists = t["nbrs"].combine_chunks()
    flat = np.asarray(lists.flatten(), dtype=np.int64)
    offs = np.asarray(lists.offsets, dtype=np.int64)
    # stored ids are GLOBAL: remap to shard-local rows (sorted ids)
    order = np.argsort(ids, kind="stable")
    pos = order[np.searchsorted(ids[order], flat)]
    counts = np.diff(offs)
    cap = int(counts.max()) if len(counts) else 1
    adj = np.full((len(ids), cap), -1, dtype=np.int64)
    rows = np.repeat(np.arange(len(ids)), counts)
    cols = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, np.int64)
    adj[rows, cols] = pos
    qids, out_ids, out_sc = [], [], []
    for qi in range(q.shape[0]):
        loc, sims = _nsw_search_graph(vn, adj, q[qi], max(ef, k))
        loc, sims = loc[:k], sims[:k]
        qids.extend([qi] * len(loc))
        out_ids.extend(ids[loc].tolist())
        out_sc.extend(sims.tolist())
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            id_col: pa.array(out_ids, type=pa.int64()),
            "score": pa.array(out_sc, type=pa.float64()),
        }
    )


def knn_nsw(
    graph_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    ef_search: int = 64,
    concurrency: int = 8,
) -> pa.Table:
    """Graph-ANN top-k: one beam-search task per shard, tie-safe merge.

    Every shard is probed (segments are independent graphs); recall is
    governed by ef_search exactly as in HNSW serving."""
    import glob
    import json
    import os

    with open(os.path.join(graph_dir, "ann_manifest.json")) as f:
        mf = json.load(f)
    id_col, vec_col = mf["id_col"], mf["vec_col"]
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    shard_dirs = sorted(glob.glob(os.path.join(graph_dir, "shard=*")))
    qref = ray.put(q)
    tables = ray.get(
        [
            _nsw_shard_search.remote(
                sorted(glob.glob(os.path.join(d, "*.parquet"))),
                qref,
                k,
                ef_search,
                id_col,
                vec_col,
            )
            for d in shard_dirs
        ]
    )
    partials = [r for t in tables for r in t.to_pylist()]
    return _merge_topk(partials, len(q), k, id_col)


# ---------------------------------------------------------------------------
# MMR result diversification


def mmr_rerank(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    depth: int = 64,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pa.Table:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998): greedily re-rank exact cosine top-``depth`` candidates by
    ``lam * rel - (1 - lam) * max_sim_to_selected`` -> (query_id, rank,
    vec_id, rel, mmr_score).

    Two phases: DISTRIBUTED candidate generation (the existing
    knn_brute_force partial-top-k merge) and a k x depth greedy per
    query over the candidates — driver state is bounded at
    n_queries x depth rows + one depth x depth sim matrix per query,
    never corpus-sized. Candidate vectors come back via ONE streamed
    membership-filter pass (sorted-id broadcast, the DSIR/KWIC fetch
    pattern). Tie rule pinned: argmax ties break to the FIRST occurrence
    in knn-rank order, i.e. the best-ranked (highest-relevance, then
    lowest-vec_id) candidate wins. The greedy float chain is
    not SQL-expressible — driver entry is rows-only; correctness is the
    python-reference parity pytest.
    """
    qv = np.asarray(query_vecs, dtype=np.float64)
    cands = knn_brute_force(
        ds, qv, k=depth, id_col=id_col, vec_col=vec_col, concurrency=concurrency
    )
    need = np.sort(np.unique(cands[id_col].to_numpy()))
    need_ref = ray.put(need)

    def fetch(batch: pa.Table) -> pa.Table:
        m = ray.get(need_ref)
        ids = batch[id_col].to_numpy()
        if not len(ids) or not len(m):  # empty candidate set: nothing to fetch
            return batch.select([id_col, vec_col]).slice(0, 0)
        pos = np.minimum(np.searchsorted(m, ids), len(m) - 1)
        return batch.select([id_col, vec_col]).filter(pa.array(m[pos] == ids))

    rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    vecs = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for r in rows}
    for vid, v in vecs.items():
        n = np.linalg.norm(v)
        vecs[vid] = v / n if n > 0 else v

    out_q, out_rank, out_id, out_rel, out_mmr = [], [], [], [], []
    ct = cands.to_pandas()
    for q in range(len(qv)):
        g = ct[ct["query_id"] == q].sort_values("rank")
        ids = g[id_col].to_numpy()
        rel = g["score"].to_numpy().astype(np.float64)
        if not len(ids):
            continue
        V = np.stack([vecs[i] for i in ids])
        sim = V @ V.T
        m = len(ids)
        max_sim = np.full(m, -np.inf)
        avail = np.ones(m, dtype=bool)
        for rank in range(min(k, m)):
            score = lam * rel if rank == 0 else lam * rel - (1 - lam) * max_sim
            score = np.where(avail, score, -np.inf)
            # pinned tie rule: first occurrence == best knn rank
            j = int(np.argmax(score))
            avail[j] = False
            max_sim = np.maximum(max_sim, sim[:, j]) if rank else sim[:, j].copy()
            out_q.append(q)
            out_rank.append(rank + 1)
            out_id.append(int(ids[j]))
            out_rel.append(round(float(rel[j]), 6))
            out_mmr.append(round(float(score[j]), 6))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_rank, type=pa.int64()),
            id_col: pa.array(out_id, type=pa.int64()),
            "rel": pa.array(out_rel, type=pa.float64()),
            "mmr_score": pa.array(out_mmr, type=pa.float64()),
        }
    )
