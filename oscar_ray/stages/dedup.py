"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The web-scale generalization of the reference's exact item dedup
(`removeDuplicates` via a processed-id set,
``oscar-create/OsmKeyValueObjectStore.cpp:1031-1037,1110-1116``) and its
posting-payload dedup (`ItemIndexFactory` content-hash store,
``oscarcreate.cpp:74``): content-keyed groupbys instead of shared hash
tables.

All operators take/return Ray Datasets; heavy work is vectorized inside
``map_batches``; the only shuffles are content-keyed groupbys. Token
hashes are blake2b-64 computed once per distinct token; n-gram shingle
hashes are a vectorized splitmix64 rolling chain over the token-hash
array (deterministic across processes, no per-n-gram Python calls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens

# shingles occurring in more than this many docs are dropped from
# pair generation: non-discriminative and quadratic-blowup-prone.
# Pinned: the oracle SQL must apply the same cap.
DEFAULT_MAX_SHINGLE_DF = 100


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def _content_hash_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    h = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else ""
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {"h": pa.array(h, type=pa.string()), id_col: batch[id_col].cast(pa.int64())}
    )


def exact_dedup_groups(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """-> (h, keep_id, n_docs): md5 content groups with survivor = min id.

    Pattern: vectorized content hash in map_batches, then a
    groupby(hash) — the id set per group never leaves its reduce task.
    """
    hashed = ds.map_batches(
        _content_hash_batch,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count, Min

    out = hashed.groupby("h").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_docs")
    )
    return out


# --------------------------------------------------------------------------
# shingling (shared by jaccard / minhash)
# --------------------------------------------------------------------------


_SHINGLE_SEED = np.uint64(0x9E3779B97F4A7C15)


def _token_hashes(tokens_a) -> np.ndarray:
    """blake2b-64 hash per token, computed once per DISTINCT token
    (dictionary encode) then gathered — the vocabulary is tiny next to
    the token stream, so the Python hash loop runs |vocab| times, not
    |tokens| times."""
    denc = pc.dictionary_encode(
        tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
    )
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = np.asarray(denc.indices, dtype=np.int64)
    uniq = denc.dictionary.to_pylist()
    uhash = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
            )
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return uhash[codes] if len(codes) else np.empty(0, dtype=np.uint64)


def hash_strings_u64(arr) -> np.ndarray:
    """Order-dependent 64-bit hash per string, FULLY vectorized (no
    Python loop over values): splitmix64-mix each (byte, position) pair
    straight out of the arrow string buffers, XOR-reduce per string
    (position-dependent inputs make XOR order-sensitive), final-mix with
    the length. Used for ROUTING (hash % P) where any well-mixed
    deterministic hash works; content-identity hashes (minhash shingles,
    fingerprints) keep the pinned blake2b path."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    lengths = np.diff(off)
    out = np.full(len(arr), np.uint64(0x27D4EB2F165667C5), dtype=np.uint64)
    total = int(off[-1] - off[0])
    if total:
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        pos = np.arange(total, dtype=np.uint64) - np.repeat(
            (off[:-1] - off[0]).astype(np.uint64), lengths
        )
        with np.errstate(over="ignore"):
            mixed = _splitmix64(
                data.astype(np.uint64) * np.uint64(0x100000001B3)
                + pos * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(0x5EED)
            )
        nonempty = lengths > 0
        # empty strings own zero bytes, so consecutive-nonempty reduceat
        # segments are exactly each nonempty string's bytes
        red = np.bitwise_xor.reduceat(mixed, (off[:-1] - off[0])[nonempty])
        out[nonempty] = red
    with np.errstate(over="ignore"):
        return _splitmix64(out + lengths.astype(np.uint64))


def _batch_shingles(parent: np.ndarray, th: np.ndarray, n: int):
    """Vectorized n-gram shingle hashes for a whole batch.

    -> (doc_idx int64, shingle uint64), DISTINCT per doc, sorted by
    (doc_idx, shingle). ``parent`` is the per-token doc index (ascending),
    ``th`` the per-token 64-bit hashes. A window's hash is a splitmix64
    chain over its n token hashes (one vectorized pass per offset —
    no per-n-gram Python); windows crossing doc boundaries are masked out.
    """
    N = len(th)
    if N < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    W = N - n + 1
    acc = np.full(W, _SHINGLE_SEED, dtype=np.uint64)
    for j in range(n):
        acc = _splitmix64(acc ^ th[j : j + W])
    wparent = parent[:W].astype(np.int64)
    valid = parent[n - 1 :] == wparent
    acc, wparent = acc[valid], wparent[valid]
    if not len(acc):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    order = np.lexsort((acc, wparent))
    a, p = acc[order], wparent[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]) | (a[1:] != a[:-1])
    return p[keep], a[keep]


class ShingleStage:
    """map_batches: doc -> exploded (id, shingle uint64) rows + set size.

    Fully vectorized: token hashes via dictionary encode + gather,
    n-gram combination via a splitmix64 rolling chain, per-doc dedup via
    one lexsort — no per-n-gram Python calls anywhere.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", n: int = 3):
        self.id_col, self.text_col, self.n = id_col, text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        ids = batch[self.id_col].to_numpy()
        p, sh = _batch_shingles(parent, _token_hashes(tokens_a), self.n)
        sizes = np.bincount(p, minlength=len(batch)) if len(p) else np.zeros(len(batch), dtype=np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids[p] if len(p) else np.empty(0, dtype=np.int64), type=pa.int64()),
                "shingle": pa.array(sh.view(np.int64)),
                "set_size": pa.array(sizes[p] if len(p) else np.empty(0, dtype=np.int64), type=pa.int64()),
            }
        )


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tau: float = 0.5,
    max_shingle_df: int = DEFAULT_MAX_SHINGLE_DF,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Exact near-dup pairs: token-n-gram-set Jaccard >= tau, a_id < b_id.

    Distributed shape: shingle-explode -> groupby(shingle) emits co-occurring
    id pairs (groups capped at max_shingle_df — pinned, mirrored in the
    oracle SQL) -> groupby(pair) counts intersections -> jaccard filter.
    Returns (a_id, b_id, jaccard) with jaccard rounded to 6 decimals.
    """
    num_parts = max(concurrency * 4, 16)
    shingled = ds.map_batches(
        ShingleStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    ).map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                (t["shingle"].to_numpy().view(np.uint64) % np.uint64(num_parts)).astype(
                    np.int64
                )
            ),
        ),
        batch_format="pyarrow",
    )

    # groupby(part) -> FEW large groups; pair generation is vectorized
    # per partition (never a Python call per shingle group)
    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["shingle"].to_numpy()
        ids = g[id_col].to_numpy()
        szs = g["set_size"].to_numpy()
        order = np.lexsort((ids, sh))
        sh, ids, szs = sh[order], ids[order], szs[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sh)) + 1, [len(sh)]))
        a_l, b_l, asz_l, bsz_l = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2 or m > max_shingle_df:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a_l.append(ids[s:e][ai])
            b_l.append(ids[s:e][bi])
            asz_l.append(szs[s:e][ai])
            bsz_l.append(szs[s:e][bi])
        if not a_l:
            return pd.DataFrame({"a_id": [], "b_id": [], "inter": [], "a_sz": [], "b_sz": []}).astype("int64")
        df = pd.DataFrame(
            {
                "a_id": np.concatenate(a_l),
                "b_id": np.concatenate(b_l),
                "a_sz": np.concatenate(asz_l),
                "b_sz": np.concatenate(bsz_l),
            }
        )
        # pre-aggregate within the partition before the global pair groupby
        out = (
            df.groupby(["a_id", "b_id"], as_index=False)
            .agg(inter=("a_sz", "size"), a_sz=("a_sz", "first"), b_sz=("b_sz", "first"))
        )
        return out

    # coalesce before the exchange (inline-threshold discipline, spans.py)
    co = (
        shingled.repartition(num_parts)
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )

    # combine per-pair partial intersections: route rows by a pair-hash
    # partition and aggregate vectorized per partition. (Ray's native
    # multi-column groupby().aggregate() is avoided deliberately — it is
    # orders of magnitude slower than this pattern on pair-shaped keys.)
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a_id", "b_id"], as_index=False).agg(
            inter=("inter", "sum"), a_sz=("a_sz", "first"), b_sz=("b_sz", "first")
        )
        union_sz = (agg["a_sz"] + agg["b_sz"] - agg["inter"]).astype(float)
        j = np.round(agg["inter"].astype(float) / np.maximum(union_sz, 1.0), 6)
        out = pd.DataFrame(
            {"a_id": agg["a_id"], "b_id": agg["b_id"], "jaccard": j}
        )
        return out[j >= tau]

    return _pair_partitioned(co, num_parts).groupby("pair_part").map_groups(
        finish, batch_format="pandas"
    )


def _pair_partitioned(ds: ray.data.Dataset, num_parts: int) -> ray.data.Dataset:
    """Add a pair_part routing column = hash(a_id, b_id) % num_parts."""

    def add(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy().astype(np.uint64)
        b = t["b_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(1_000_003) + b) % np.uint64(num_parts)
        return t.append_column("pair_part", pa.array(h.astype(np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup candidates (scale path)
# --------------------------------------------------------------------------

def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized, wrap arithmetic mod 2^64."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class MinHashStage:
    """map_batches: doc -> (id, band, band_hash) rows (LSH banding).

    Signature: num_perm hash functions h_i(x) = splitmix64(x + seed_i)
    (deterministic seeds from a fixed rng), min over the doc's shingle
    hashes per i; split into bands of num_perm/bands rows, each band
    hashed to one bucket key. Fully vectorized: one
    (num_perm, n_shingles) matrix per document.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perm: int = 128,
        bands: int = 32,
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        self.id_col, self.text_col, self.n = id_col, text_col, n
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        ids = batch[self.id_col].to_numpy()
        p, sh = _batch_shingles(parent, _token_hashes(tokens_a), self.n)
        if not len(p):
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int64()),
                    "band_hash": pa.array([], type=pa.int64()),
                }
            )
        # docs with >= 1 shingle, and each shingle's position in that list
        docs, doc_of_sh = np.unique(p, return_inverse=True)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(doc_of_sh)) + 1))
        # signature: per perm, one vectorized hash pass over ALL shingles +
        # a segmented min per doc — O(num_perm * n_shingles) C work,
        # memory O(n_shingles), never a per-doc Python iteration
        sig = np.empty((self.num_perm, len(docs)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                sig[i] = np.minimum.reduceat(_splitmix64(sh + self.seeds[i]), starts)
        # band hash: splitmix64 chain over the band's rows (vectorized
        # across docs); >> 1 keeps the int64 view non-negative
        bands_hash = np.empty((self.bands, len(docs)), dtype=np.uint64)
        for band in range(self.bands):
            acc = np.full(len(docs), _SHINGLE_SEED + np.uint64(band), dtype=np.uint64)
            for r in range(band * self.rows, (band + 1) * self.rows):
                acc = _splitmix64(acc ^ sig[r])
            bands_hash[band] = acc >> np.uint64(1)
        doc_ids = ids[docs]
        return pa.table(
            {
                self.id_col: pa.array(
                    np.repeat(doc_ids, self.bands), type=pa.int64()
                ),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int64), len(docs))
                ),
                "band_hash": pa.array(
                    bands_hash.T.reshape(-1).view(np.int64), type=pa.int64()
                ),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    tau: float = 0.5,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Near-dup candidate pairs via MinHash banding, verified with exact
    Jaccard (second pass over only the candidate docs).

    -> (a_id, b_id, jaccard) with jaccard >= tau, a_id < b_id.
    Scale: candidates per band bucket are generated inside the bucket's
    reduce task; verification re-shingles only candidate docs (a
    broadcast-filtered map), never the corpus.
    """
    sig = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "id_col": id_col,
            "text_col": text_col,
            "n": n,
            "num_perm": num_perm,
            "bands": bands,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    num_parts = max(concurrency * 4, 16)
    sig = sig.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                (
                    (t["band_hash"].to_numpy().view(np.uint64) * np.uint64(33)
                     + t["band"].to_numpy().view(np.uint64))
                    % np.uint64(num_parts)
                ).astype(np.int64)
            ),
        ),
        batch_format="pyarrow",
    )

    def bucket_pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        change = (np.diff(band) != 0) | (np.diff(bh) != 0)
        starts = np.concatenate(([0], np.flatnonzero(change) + 1, [len(ids)]))
        a_l, b_l = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            uids = np.unique(ids[s:e])
            m = len(uids)
            if m < 2 or m > 1000:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a_l.append(uids[ai])
            b_l.append(uids[bi])
        if not a_l:
            return pd.DataFrame({"a_id": [], "b_id": []}).astype("int64")
        df = pd.DataFrame({"a_id": np.concatenate(a_l), "b_id": np.concatenate(b_l)})
        return df.drop_duplicates()

    raw_pairs = (
        sig.repartition(num_parts)  # inline-threshold coalesce (spans.py)
        .groupby("part")
        .map_groups(bucket_pairs_in_partition, batch_format="pandas")
    )
    cand = (
        _pair_partitioned(raw_pairs, num_parts)
        .groupby("pair_part")
        .map_groups(
            lambda g: g[["a_id", "b_id"]].drop_duplicates(), batch_format="pandas"
        )
    )
    empty = pa.table(
        {
            "a_id": pa.array([], type=pa.int64()),
            "b_id": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    cand = cand.materialize()
    n_cand = cand.count()
    if not n_cand:
        return ray.data.from_arrow(empty)
    return _verify_pairs_exact(
        ds, cand, n_cand, id_col=id_col, text_col=text_col, n=n, tau=tau,
        num_parts=num_parts, concurrency=concurrency,
    )


@ray.remote
def _plan_chunk_meta(t: pa.Table):
    """(rows, min_doc, max_doc, last_doc, last_pp) of one sorted chunk."""
    if not t.num_rows:
        return (0, 0, 0, 0, 0)
    doc = t["doc"].to_numpy()
    pp = t["pp"].to_numpy()
    return (t.num_rows, int(doc[0]), int(doc[-1]), int(doc[-1]), int(pp[-1]))


@ray.remote
def _plan_chunk_dedup(t: pa.Table, prev_doc, prev_pp):
    """Within-chunk (doc, pp) dedup (rows arrive sorted) + drop a leading
    run equal to the previous chunk's last row -> (doc, pp) numpy pair."""
    doc = t["doc"].to_numpy().astype(np.int64)
    pp = t["pp"].to_numpy().astype(np.int64)
    first = np.ones(len(doc), dtype=bool)
    first[1:] = (doc[1:] != doc[:-1]) | (pp[1:] != pp[:-1])
    if prev_doc is not None and len(doc):
        first &= ~((doc == prev_doc) & (pp == prev_pp))
    return doc[first], pp[first]


def _plan_chunks(expl_sorted: "ray.data.Dataset"):
    """Sorted (doc, pp) Dataset -> [(doc_lo, doc_hi_inclusive, ref)] of
    deduplicated chunk refs. Driver state is O(#chunks)."""
    refs = list(expl_sorted.to_arrow_refs())
    metas = ray.get([_plan_chunk_meta.remote(r) for r in refs])
    plan = []
    prev = (None, None)
    for ref, (n_rows, lo, hi, last_doc, last_pp) in zip(refs, metas):
        if not n_rows:
            continue
        plan.append((lo, hi, _plan_chunk_dedup.remote(ref, prev[0], prev[1])))
        prev = (last_doc, last_pp)
    return plan


class RoutedShingles(ShingleStage):
    """Shingle only planned docs; replicate rows per pair partition.

    ``plan`` is a list of (doc_lo, doc_hi_inclusive, ref) chunk triples
    whose refs resolve to sorted distinct (doc, pp) arrays. A batch
    fetches only the chunks overlapping its id range (per-actor LRU) —
    actor-resident plan state is a few chunks, never the full plan.
    """

    def __init__(self, plan, max_cached: int = 16, **kw):
        super().__init__(**kw)
        self.plan = sorted(plan, key=lambda e: e[0])
        self.los = np.asarray([e[0] for e in self.plan], dtype=np.int64)
        self.his = np.asarray([e[1] for e in self.plan], dtype=np.int64)
        self.max_cached = max_cached
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _chunk(self, i: int):
        hit = self._cache.pop(i, None)  # pop+reinsert = LRU recency touch
        if hit is None:
            if len(self._cache) >= self.max_cached:
                self._cache.pop(next(iter(self._cache)))
            hit = ray.get(self.plan[i][2])
        self._cache[i] = hit
        return hit

    def _overlapping(self, lo: int, hi: int) -> range:
        first = int(np.searchsorted(self.his, lo, side="left"))
        last = int(np.searchsorted(self.los, hi, side="right"))
        return range(first, last)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty_pp = pa.array([], type=pa.int64())
        ids = batch[self.id_col].to_numpy()
        if not len(ids) or not len(self.plan):
            return super().__call__(batch.slice(0, 0)).append_column(
                "pair_part", empty_pp
            )
        overlap = list(self._overlapping(int(ids.min()), int(ids.max())))
        # process chunks in windows of <= max_cached: each chunk is
        # fetched ONCE per call AND actor residency stays bounded at the
        # cache cap even for batches spanning the whole id space (plan
        # chunks have disjoint doc ranges, so per-window shingle +
        # replicate unions to exactly the full result — a boundary doc
        # split across two chunks contributes its disjoint (doc, pp)
        # rows from each window, never duplicates)
        out_tables = []
        for w in range(0, len(overlap), self.max_cached):
            window = overlap[w : w + self.max_cached]
            chunks = {i: self._chunk(i) for i in window}
            keep = np.zeros(len(ids), dtype=bool)
            for i in window:
                pdoc, _ = chunks[i]
                if not len(pdoc):
                    continue
                pos = np.minimum(np.searchsorted(pdoc, ids), len(pdoc) - 1)
                keep |= pdoc[pos] == ids
            if not keep.any():
                continue
            sh = super().__call__(batch.filter(pa.array(keep)))
            doc = sh[self.id_col].to_numpy()
            if not len(doc):
                continue
            parts_out, rows_out = [], []
            for i in window:
                pdoc, ppp = chunks[i]
                if not len(pdoc):
                    continue
                lo = np.searchsorted(pdoc, doc, side="left")
                hi = np.searchsorted(pdoc, doc, side="right")
                reps = hi - lo
                total = int(reps.sum())
                if not total:
                    continue
                # flattened plan indices for each row's [lo, hi) range
                base = np.repeat(lo, reps)
                within = np.arange(total) - np.repeat(
                    np.concatenate(([0], np.cumsum(reps)[:-1])), reps
                )
                parts_out.append(ppp[base + within])
                rows_out.append(np.repeat(np.arange(len(doc)), reps))
            if parts_out:
                rep_tbl = sh.take(pa.array(np.concatenate(rows_out)))
                out_tables.append(
                    rep_tbl.append_column(
                        "pair_part", pa.array(np.concatenate(parts_out))
                    )
                )
        if not out_tables:
            return super().__call__(batch.slice(0, 0)).append_column(
                "pair_part", empty_pp
            )
        return pa.concat_tables(out_tables)


def _verify_pairs_exact(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    n_cand: int,
    id_col: str,
    text_col: str,
    n: int,
    tau: float,
    num_parts: int,
    concurrency: int,
    pairs_per_part: int = 64,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate pairs, distributed.

    - candidate pairs stay a Dataset end-to-end: routed to verify
      partitions by ``pair_part = hash(a, b) % n_pair_parts`` (a pure
      function of the pair — no driver-side enumeration);
    - the doc -> pair_part routing plan is SHARDED: the exploded
      (doc, pair_part) rows are range-sorted by doc (distributed sort),
      deduplicated per chunk with a boundary handoff task chain, and
      kept as (doc_lo, doc_hi, ref) chunk triples — the driver holds
      only per-chunk bounds + refs, never a candidate-sized array;
    - each shingle actor fetches only the plan chunks overlapping its
      batch's id range (small LRU) and emits each candidate doc's
      shingles once per pair partition (vectorized searchsorted
      membership + run-length replication);
    - per verify partition, Jaccard is one lexsort + run-length
      intersection count over (pair_idx, shingle) rows from both sides —
      no Python sets anywhere.
    """
    n_pair_parts = max(1, min(num_parts * 4, (n_cand + pairs_per_part - 1) // pairs_per_part))

    def add_pp(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy().astype(np.uint64)
        b = t["b_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            pp = _splitmix64(a * np.uint64(0x9E3779B1) + b) % np.uint64(n_pair_parts)
        return t.append_column("pair_part", pa.array(pp.astype(np.int64)))

    cand_pp = cand.map_batches(add_pp, batch_format="pyarrow").materialize()

    # sharded routing plan: explode to (doc, pair_part), distributed
    # range-sort by (doc, pp), then a per-chunk dedup task chain where
    # each chunk also drops rows equal to its predecessor's last row
    # (duplicates are adjacent after the sort, so boundary handoff makes
    # the dedup exact). The driver touches only per-chunk bounds + refs.
    expl_sorted = (
        cand_pp.map_batches(
            lambda t: pa.table(
                {
                    "doc": pa.concat_arrays(
                        [t["a_id"].combine_chunks(), t["b_id"].combine_chunks()]
                    ).cast(pa.int64()),
                    "pp": pa.concat_arrays(
                        [t["pair_part"].combine_chunks(), t["pair_part"].combine_chunks()]
                    ).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["doc", "pp"])
    )
    plan = _plan_chunks(expl_sorted)

    routed = ds.map_batches(
        RoutedShingles,
        fn_constructor_kwargs={
            "plan": plan, "id_col": id_col, "text_col": text_col, "n": n,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    # unify pairs + shingle rows into one tagged schema for the verify
    # partition groupby: (x, y, z, kind, pair_part)
    pairs_tagged = cand_pp.map_batches(
        lambda t: pa.table(
            {
                "x": t["a_id"].combine_chunks().cast(pa.int64()),
                "y": t["b_id"].combine_chunks().cast(pa.int64()),
                "z": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "pair_part": t["pair_part"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    sh_tagged = routed.map_batches(
        lambda t: pa.table(
            {
                "x": t[id_col].combine_chunks().cast(pa.int64()),
                "y": t["shingle"].combine_chunks().cast(pa.int64()),
                "z": t["set_size"].combine_chunks().cast(pa.int64()),
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "pair_part": t["pair_part"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == 0]
        sh = g[g["kind"] == 1]
        if not len(pr):
            return pd.DataFrame({"a_id": [], "b_id": [], "jaccard": []}).astype(
                {"a_id": "int64", "b_id": "int64", "jaccard": "float64"}
            )
        a = pr["x"].to_numpy()
        b = pr["y"].to_numpy()
        sd = sh["x"].to_numpy()
        sv = sh["y"].to_numpy()
        sz = sh["z"].to_numpy()
        o = np.lexsort((sv, sd))
        sd, sv, sz = sd[o], sv[o], sz[o]

        def side_rows(docs: np.ndarray):
            lo = np.searchsorted(sd, docs, side="left")
            hi = np.searchsorted(sd, docs, side="right")
            reps = hi - lo
            total = int(reps.sum())
            base = np.repeat(lo, reps)
            within = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])), reps
            )
            idx = base + within
            pidx = np.repeat(np.arange(len(docs)), reps)
            # guard: a candidate doc with ZERO shingle rows in this
            # partition (possible if the pair dataset drifts from the
            # shingle dataset) must read as set_size 0, not index into
            # an empty sz array
            sizes = np.zeros(len(docs), dtype=np.int64)
            m = reps > 0
            if m.any():
                sizes[m] = sz[lo[m]]
            return pidx, sv[idx], sizes

        pa_idx, va, asz = side_rows(a)
        pb_idx, vb, bsz = side_rows(b)
        pi = np.concatenate((pa_idx, pb_idx))
        hv = np.concatenate((va, vb))
        if len(pi):
            o2 = np.lexsort((hv, pi))
            pi_s, hv_s = pi[o2], hv[o2]
            dup = (pi_s[1:] == pi_s[:-1]) & (hv_s[1:] == hv_s[:-1])
            inter = np.bincount(pi_s[1:][dup], minlength=len(a)).astype(np.float64)
        else:
            inter = np.zeros(len(a), dtype=np.float64)
        union = np.maximum(asz + bsz - inter, 1.0)
        j = np.round(inter / union, 6)
        keep = j >= tau
        return pd.DataFrame(
            {"a_id": a[keep], "b_id": b[keep], "jaccard": j[keep]}
        ).astype({"a_id": "int64", "b_id": "int64", "jaccard": "float64"})

    return (
        pairs_tagged.union(sh_tagged)
        .repartition(num_parts)  # inline-threshold coalesce (spans.py)
        .groupby("pair_part")
        .map_groups(verify_partition, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


class SimHashStage:
    """map_batches: doc -> (id, simhash int64, band keys) via 64-bit simhash.

    Weighted (by tf) sign-sum over token crc32-seeded blake hashes;
    4 x 16-bit bands for candidate bucketing.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        denc = pc.dictionary_encode(tokens_a)
        codes = np.asarray(denc.indices, dtype=np.int64)
        uniq_terms = denc.dictionary.to_pylist()
        uhash = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
                )
                for t in uniq_terms
            ),
            dtype=np.uint64,
            count=len(uniq_terms),
        )
        n = len(batch)
        ids = batch[self.id_col].to_numpy()
        sims = np.zeros(n, dtype=np.uint64)
        if len(codes):
            th = uhash[codes]
            # bit matrix contributions: for each of 64 bits, +-1 weighted sum
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            ) * 2 - 1
            acc = np.zeros((n, 64), dtype=np.int64)
            np.add.at(acc, parent, bits)
            sims = (acc > 0).astype(np.uint64) @ (
                np.uint64(1) << np.arange(64, dtype=np.uint64)
            )
        # long format: one row per (doc, band) so candidate bucketing is a
        # single groupby instead of four unioned pipelines
        n_bands = 4
        band_vals = np.stack(
            [
                ((sims >> np.uint64(16 * band)) & np.uint64(0xFFFF)).astype(np.int64)
                for band in range(n_bands)
            ],
            axis=1,
        )  # (n, 4)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, n_bands), type=pa.int64()),
                "simhash": pa.array(np.repeat(sims.view(np.int64), n_bands)),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n)),
                "band_val": pa.array(band_vals.reshape(-1)),
            }
        )


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Candidates: pairs sharing any 16-bit band (pigeonhole guarantees
    recall for hamming <= 3 with 4 bands); verified exactly.
    -> (a_id, b_id, hamming).
    """
    sigs = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    num_parts = max(concurrency * 4, 16)
    banded = sigs.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                ((t["band_val"].to_numpy() * 4 + t["band"].to_numpy()) % num_parts).astype(
                    np.int64
                )
            ),
        ),
        batch_format="pyarrow",
    )

    def band_pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy()
        bv = g["band_val"].to_numpy()
        ids = g[id_col].to_numpy()
        sims = g["simhash"].to_numpy()
        order = np.lexsort((ids, bv, band))
        band, bv, ids, sims = band[order], bv[order], ids[order], sims[order]
        change = (np.diff(band) != 0) | (np.diff(bv) != 0)
        starts = np.concatenate(([0], np.flatnonzero(change) + 1, [len(ids)]))
        a_l, b_l, as_l, bs_l = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2 or m > 1000:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a_l.append(ids[s:e][ai])
            b_l.append(ids[s:e][bi])
            as_l.append(sims[s:e][ai])
            bs_l.append(sims[s:e][bi])
        if not a_l:
            return pd.DataFrame({"a_id": [], "b_id": [], "a_sim": [], "b_sim": []}).astype("int64")
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_l),
                "b_id": np.concatenate(b_l),
                "a_sim": np.concatenate(as_l),
                "b_sim": np.concatenate(bs_l),
            }
        ).drop_duplicates(["a_id", "b_id"])

    # inline-threshold coalesce (spans.py discipline)
    allp = (
        banded.repartition(num_parts)
        .groupby("part")
        .map_groups(band_pairs_in_partition, batch_format="pandas")
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a_sim"].to_numpy().view(np.uint64)
        b = batch["b_sim"].to_numpy().view(np.uint64)
        ham = np.zeros(len(a), dtype=np.int64)
        x = a ^ b
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        out = pa.table(
            {
                "a_id": batch["a_id"].cast(pa.int64()),
                "b_id": batch["b_id"].cast(pa.int64()),
                "hamming": pa.array(ham),
            }
        )
        return out.filter(pa.array(ham <= max_hamming))

    verified = allp.map_batches(verify, batch_format="pyarrow")
    # a pair can match in several bands: dedup via pair-hash partitions
    return (
        _pair_partitioned(verified, num_parts)
        .groupby("pair_part")
        .map_groups(
            lambda g: g.groupby(["a_id", "b_id"], as_index=False).agg(
                hamming=("hamming", "min")
            ),
            batch_format="pandas",
        )
    )


# --------------------------------------------------------------------------
# near-dup clusters (connected components over pair edges)
# --------------------------------------------------------------------------


def cluster_pairs(
    pairs: ray.data.Dataset | pa.Table,
    id_col_a: str = "a_id",
    id_col_b: str = "b_id",
    max_rounds: int = 50,
    driver_limit: int = 2_000_000,
) -> pa.Table:
    """Connected components over near-dup pair edges -> (doc_id, cluster_id).

    cluster_id = min doc_id of the component (the dedup survivor). The
    iterate-to-fixpoint shape of the reference's relation-member closure
    (``OsmKeyValueObjectStore.cpp:1009-1016``, SURVEY.md J2): min-label
    propagation with pointer jumping, repeated until no label changes.

    Two execution paths, identical output:
    - edge lists <= ``driver_limit``: single numpy task (fast path);
    - larger: :func:`cluster_pairs_ds` — per-round distributed
      propagate + combine, nothing corpus-sized on the driver except the
      returned label table itself (use cluster_pairs_ds directly to keep
      even that as a Dataset).
    """
    if isinstance(pairs, ray.data.Dataset):
        pairs = pairs.materialize()
        if pairs.count() > driver_limit:
            out = cluster_pairs_ds(pairs, id_col_a, id_col_b, max_rounds)
            return pa.Table.from_pandas(
                out.to_pandas(), preserve_index=False
            ).sort_by("doc_id")
        rows = pairs.select_columns([id_col_a, id_col_b]).take_all()
        a = np.array([r[id_col_a] for r in rows], dtype=np.int64)
        b = np.array([r[id_col_b] for r in rows], dtype=np.int64)
    else:
        a = pairs[id_col_a].to_numpy().astype(np.int64)
        b = pairs[id_col_b].to_numpy().astype(np.int64)
    nodes, label = _numpy_components(a, b, max_rounds)
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(label, type=pa.int64()),
        }
    )


def _numpy_components(a: np.ndarray, b: np.ndarray, max_rounds: int):
    nodes = np.unique(np.concatenate((a, b))) if len(a) else np.empty(0, dtype=np.int64)
    label = nodes.copy()
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    for _ in range(max_rounds):
        new = label.copy()
        np.minimum.at(new, ai, label[bi])
        np.minimum.at(new, bi, label[ai])
        # pointer-jump: adopt your current label's label
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if (new == label).all():
            break
        label = new
    return nodes, label


def _cc_part_of(x: np.ndarray, num_parts: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (_splitmix64(x.astype(np.uint64)) % np.uint64(num_parts)).astype(np.int64)


@ray.remote(num_cpus=1)
def _cc_split_block(tbl: pa.Table, a_col: str, b_col: str, num_parts: int):
    """Edge block -> 2*num_parts returns: num_parts (src,dst) slices
    routed by hash(src) (both edge directions), then num_parts
    unique-node slices routed by hash(node)."""
    a = tbl[a_col].to_numpy().astype(np.int64)
    b = tbl[b_col].to_numpy().astype(np.int64)
    src = np.concatenate((a, b))
    dst = np.concatenate((b, a))
    ep = _cc_part_of(src, num_parts)
    out = []
    for p in range(num_parts):
        m = ep == p
        out.append((src[m], dst[m]))
    nodes = np.unique(dst)
    npart = _cc_part_of(nodes, num_parts)
    out.extend(nodes[npart == p] for p in range(num_parts))
    return tuple(out)


@ray.remote(num_cpus=1)
def _cc_init_part(n_blocks: int, *slices):
    """-> (edges sorted by src, initial labels). args = n_blocks edge
    slices then n_blocks node slices (each a top-level ref, auto-resolved)."""
    edge_slices = slices[:n_blocks]
    node_slices = slices[n_blocks:]
    src = np.concatenate([e[0] for e in edge_slices]) if edge_slices else np.empty(0, np.int64)
    dst = np.concatenate([e[1] for e in edge_slices]) if edge_slices else np.empty(0, np.int64)
    o = np.argsort(src, kind="stable")
    nodes = (
        np.unique(np.concatenate(node_slices)) if node_slices else np.empty(0, np.int64)
    )
    return (src[o], dst[o]), (nodes, nodes.copy())


@ray.remote(num_cpus=1)
def _cc_propagate(edges, labels, num_parts: int):
    """label[src] gathered over this partition's edges (src sorted ==
    labels sorted: one searchsorted), pre-minimized per dst, routed by
    hash(dst) -> num_parts (node, cand) slices (one return each)."""
    (src, dst), (ln, ll) = edges, labels
    if not len(src):
        z = np.empty(0, np.int64)
        return tuple((z, z) for _ in range(num_parts))
    cand = ll[np.searchsorted(ln, src)]
    o = np.argsort(dst, kind="stable")
    dst_s, cand_s = dst[o], cand[o]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(dst_s)) + 1))
    node = dst_s[starts]
    cmin = np.minimum.reduceat(cand_s, starts)
    p = _cc_part_of(node, num_parts)
    return tuple((node[p == q], cmin[p == q]) for q in range(num_parts))


@ray.remote(num_cpus=1)
def _cc_combine(labels, num_parts: int, *cand_slices):
    """Fold candidate mins into this partition's labels. Returns
    1 + num_parts values: new (node, label), then per-partition jump
    requests (node, label, changed) routed by hash(label)."""
    ln, ll = labels
    new = ll.copy()
    for cn, cl in cand_slices:
        if len(cn):
            pos = np.searchsorted(ln, cn)
            np.minimum.at(new, pos, cl)
    changed = new != ll
    jp = _cc_part_of(new, num_parts)
    reqs = tuple((ln[jp == q], new[jp == q], changed[jp == q]) for q in range(num_parts))
    return ((ln, new),) + reqs


@ray.remote(num_cpus=1)
def _cc_jump(lut, num_parts: int, *req_slices):
    """label <- label[label] for requests routed here (lut = this
    partition's fresh labels). Returns num_parts (node, label) slices
    re-routed by hash(node), then the changed count (combine's flag OR
    jump's own change) as the final return."""
    ln, ll = lut
    node = np.concatenate([r[0] for r in req_slices]) if req_slices else np.empty(0, np.int64)
    lab = np.concatenate([r[1] for r in req_slices]) if req_slices else np.empty(0, np.int64)
    chg = (
        np.concatenate([r[2] for r in req_slices]) if req_slices else np.empty(0, bool)
    )
    if len(ln) and len(node):
        pos = np.minimum(np.searchsorted(ln, lab), len(ln) - 1)
        hit = ln[pos] == lab
        new = np.where(hit, np.minimum(ll[pos], lab), lab)
    else:
        new = lab
    changed_total = int((new < lab).sum() + chg.sum())
    np_part = _cc_part_of(node, num_parts)
    out = []
    for q in range(num_parts):
        m = np_part == q
        n_q, l_q = node[m], new[m]
        o = np.argsort(n_q)
        out.append((n_q[o], l_q[o]))
    return tuple(out) + (changed_total,)


@ray.remote(num_cpus=1)
def _cc_gather_labels(*slices):
    """Merge jump outputs for one partition back into sorted (node, label)."""
    node = np.concatenate([s[0] for s in slices]) if slices else np.empty(0, np.int64)
    lab = np.concatenate([s[1] for s in slices]) if slices else np.empty(0, np.int64)
    o = np.argsort(node, kind="stable")
    return node[o], lab[o]


@ray.remote(num_cpus=1)
def _cc_to_table(labels) -> pa.Table:
    nodes, lab = labels
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(lab, type=pa.int64()),
        }
    )


def cluster_pairs_ds(
    pairs: ray.data.Dataset,
    id_col_a: str = "a_id",
    id_col_b: str = "b_id",
    max_rounds: int = 50,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Distributed connected components -> Dataset (doc_id, cluster_id).

    Min-label propagation with pointer jumping over hash-partitioned
    object-store shards, driven by raw Ray task fan-outs (the same
    explicit-exchange pattern as the index build — Dataset groupby per
    round costs seconds of executor overhead; these rounds are
    milliseconds of numpy per task). Per round and partition:
    propagate (label[src] -> min per dst, routed by hash(dst)), combine
    (fold mins into labels, emit jump requests routed by hash(label)),
    jump (label <- label[label], re-routed by hash(node)). Rounds are
    O(log n) thanks to the jump step; the driver holds only object refs
    and a per-round changed counter — node/edge data never leaves the
    object store.
    """
    blocks = (
        pairs.select_columns([id_col_a, id_col_b])
        .map_batches(lambda t: t, batch_format="pyarrow")
        .to_arrow_refs()
    )
    if not blocks:
        return ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "cluster_id": pa.array([], type=pa.int64())}
            )
        )
    nb = len(blocks)
    # split[i][p] = edge slice, split[i][num_parts+p] = node slice
    split = [
        _cc_split_block.options(num_returns=2 * num_parts).remote(
            b, id_col_a, id_col_b, num_parts
        )
        for b in blocks
    ]
    init = [
        _cc_init_part.options(num_returns=2).remote(
            nb,
            *[split[i][p] for i in range(nb)],
            *[split[i][num_parts + p] for i in range(nb)],
        )
        for p in range(num_parts)
    ]
    edges_p = [r[0] for r in init]
    labels_p = [r[1] for r in init]

    for _ in range(max_rounds):
        # prop[p][q]: candidate slice from src-partition p for dst-partition q
        prop = [
            _cc_propagate.options(num_returns=num_parts).remote(
                edges_p[p], labels_p[p], num_parts
            )
            for p in range(num_parts)
        ]
        # comb[p][0]: new labels; comb[p][1+q]: jump requests for partition q
        comb = [
            _cc_combine.options(num_returns=1 + num_parts).remote(
                labels_p[p], num_parts, *[prop[q][p] for q in range(num_parts)]
            )
            for p in range(num_parts)
        ]
        # jum[p][q]: label slices for node-partition q; jum[p][-1]: changed
        jum = [
            _cc_jump.options(num_returns=num_parts + 1).remote(
                comb[p][0], num_parts, *[comb[q][1 + p] for q in range(num_parts)]
            )
            for p in range(num_parts)
        ]
        labels_p = [
            _cc_gather_labels.remote(*[jum[q][p] for q in range(num_parts)])
            for p in range(num_parts)
        ]
        changed = sum(ray.get([jum[p][num_parts] for p in range(num_parts)]))
        if not changed:
            break
    return ray.data.from_arrow_refs([_cc_to_table.remote(l) for l in labels_p])


# ---------------------------------------------------------------------------
# cluster survivor selection


def keep_best_per_cluster(
    docs: ray.data.Dataset,
    clusters: ray.data.Dataset | pa.Table,
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    num_parts: int = 32,
) -> ray.data.Dataset:
    """One survivor per near-dup cluster: argmax ``score_col``, tie -> min id.

    The canonical LLM-corpus dedup policy "keep the best copy, not the
    first copy": every document joins its connected-component label
    (docs in no pair form singleton clusters, label = own id), then a
    single groupby picks the representative. -> Dataset(cluster_id,
    best_doc_id, best_<score_col>, n_docs), one row per cluster.

    Scale shape: ONE partitioned hash join (docs x labels, both sides
    streamed through the same hash(key)%num_parts exchange) + ONE
    groupby over a PACKED int64 max — argmax without a sort or a
    per-group Python call. Packing is exact while ``score < 2^23`` and
    ``doc_id < 2^40`` (asserted): ``packed = score * 2^40 +
    (2^40 - 1 - doc_id)`` so max(packed) orders by (score DESC, id ASC).

    Reference analog: the reference keeps the FIRST item per duplicate
    group (`OsmKeyValueObjectStore` insertion order); this is the
    scored generalization the curation brief needs.
    """
    from ray.data.aggregate import Count, Max

    from oscar_ray.stages.joins import hash_join

    if isinstance(clusters, pa.Table):
        clusters = ray.data.from_arrow(clusters)
    joined = hash_join(
        docs, clusters, on=id_col, how="left", num_parts=num_parts
    )

    id_span = np.int64(1) << np.int64(40)

    def pack(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        cl = pc.cast(pc.coalesce(t["cluster_id"], ids), pa.int64())
        ids_np = ids.to_numpy()
        score = t[score_col].to_numpy().astype(np.int64)
        # explicit raises (asserts strip under -O and would silently wrap int64)
        if score.size and not (score.max() < (1 << 23) and score.min() >= 0):
            raise ValueError(
                "keep_best score out of packed argmax range [0, 2^23); "
                "rescale the score column or use a two-column argmax"
            )
        if ids_np.size and ids_np.max() >= id_span:
            raise ValueError("keep_best doc_id >= 2^40: widen the packing")
        packed = score * id_span + (id_span - np.int64(1) - ids_np)
        return pa.table({"cluster_id": cl, "packed": pa.array(packed)})

    agg = (
        joined.map_batches(pack, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Max("packed"), Count())
    )

    def unpack(t: pa.Table) -> pa.Table:
        packed = t["max(packed)"].to_numpy()
        return pa.table(
            {
                "cluster_id": t["cluster_id"],
                "best_doc_id": pa.array(id_span - np.int64(1) - packed % id_span),
                f"best_{score_col}": pa.array(packed // id_span),
                "n_docs": pc.cast(t["count()"], pa.int64()),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# winnowing-fingerprint near-dup pairs (MOSS-style overlap detection)


def winnowing_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 64,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """MOSS-style overlap pairs: docs sharing >= ``min_shared`` winnowing
    fingerprints (DISTINCT per doc; positions dropped), a_id < b_id ->
    (a_id, b_id, n_shared).

    The winnowing guarantee makes this a principled candidate generator:
    any shared token run of >= w + k - 1 tokens contributes at least one
    shared fingerprint, at ~2/(w+1) the volume of full shingle pairs.
    Distributed shape mirrors :func:`ngram_jaccard_pairs` exactly — ONE
    fp-routed exchange with vectorized per-group pair expansion (groups
    capped at ``max_fp_df``, the stop-fingerprint rule, mirrored in the
    oracle SQL) then ONE pair-routed count combine. No new shuffle shape.
    """
    import functools

    from oscar_ray.stages.text_analysis import winnowing_fingerprints

    num_parts = max(concurrency * 4, 16)

    def fps(batch: pa.Table) -> pa.Table:
        out = winnowing_fingerprints(
            batch, k=k, w=w, id_col=id_col, text_col=text_col
        )
        # distinct (doc, fp): docs are batch-complete, so batch-local
        # distinct IS global distinct
        tbl = out.select([id_col, "fp"]).group_by([id_col, "fp"]).aggregate([])
        part = (tbl["fp"].to_numpy().astype(np.uint64) % np.uint64(num_parts)).astype(
            np.int64
        )
        return tbl.append_column("part", pa.array(part))

    routed = ds.map_batches(fps, batch_format="pyarrow", concurrency=concurrency)

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        fp = g["fp"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(fp)) + 1, [len(fp)]))
        a_l, b_l = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2 or m > max_fp_df:
                continue
            ai, bi = np.triu_indices(m, k=1)
            a_l.append(ids[s:e][ai])
            b_l.append(ids[s:e][bi])
        if not a_l:
            return pd.DataFrame({"a_id": [], "b_id": [], "n_shared": []}).astype(
                "int64"
            )
        df = pd.DataFrame(
            {"a_id": np.concatenate(a_l), "b_id": np.concatenate(b_l)}
        )
        return df.groupby(["a_id", "b_id"], as_index=False).agg(
            n_shared=("a_id", "size")
        )

    co = (
        routed.repartition(num_parts)
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a_id", "b_id"], as_index=False).agg(
            n_shared=("n_shared", "sum")
        )
        return agg[agg["n_shared"] >= min_shared]

    return _pair_partitioned(co, num_parts).groupby("pair_part").map_groups(
        finish, batch_format="pandas"
    )
