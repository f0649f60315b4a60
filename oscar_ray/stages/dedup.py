"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The web-scale generalization of the reference's exact item dedup
(`removeDuplicates` via a processed-id set,
``oscar-create/OsmKeyValueObjectStore.cpp:1031-1037,1110-1116``) and its
posting-payload dedup (`ItemIndexFactory` content-hash store,
``oscarcreate.cpp:74``): content-keyed groupbys instead of shared hash
tables.

All operators take/return Ray Datasets; heavy work is vectorized inside
``map_batches``; the only shuffles are content-keyed groupbys. Shingle
hashing uses blake2b (deterministic across processes).
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


def _shingle_hashes(tokens: list[str], n: int) -> np.ndarray:
    """Distinct blake2b-64 hashes of token n-grams of one document."""
    if len(tokens) < n:
        return np.empty(0, dtype=np.uint64)
    out = set()
    join = " ".join
    for i in range(len(tokens) - n + 1):
        dig = hashlib.blake2b(join(tokens[i : i + n]).encode("utf-8"), digest_size=8)
        out.add(int.from_bytes(dig.digest(), "little"))
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class ShingleStage:
    """map_batches: doc -> exploded (id, shingle uint64) rows + set size."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", n: int = 3):
        self.id_col, self.text_col, self.n = id_col, text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        toks = tokens_a.to_pylist()
        ids = batch[self.id_col].to_numpy()
        out_id, out_sh, out_sz = [], [], []
        # per-doc loop over *documents* (not tokens): shingling is
        # inherently per-doc sequence work; the hashing is C (blake2b)
        bounds = np.searchsorted(parent, np.arange(len(batch) + 1))
        for d in range(len(batch)):
            sh = _shingle_hashes(toks[bounds[d] : bounds[d + 1]], self.n)
            out_id.append(np.full(len(sh), ids[d], dtype=np.int64))
            out_sh.append(sh)
            out_sz.append(np.full(len(sh), len(sh), dtype=np.int64))
        if out_id:
            ids_c = np.concatenate(out_id)
            sh_c = np.concatenate(out_sh)
            sz_c = np.concatenate(out_sz)
        else:
            ids_c = sh_c = sz_c = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids_c, type=pa.int64()),
                "shingle": pa.array(sh_c.astype(np.int64)),
                "set_size": pa.array(sz_c, type=pa.int64()),
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

    co = shingled.groupby("part").map_groups(pairs_in_partition, batch_format="pandas")

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

    def _signature(self, sh: np.ndarray) -> np.ndarray | None:
        if len(sh) == 0:
            return None
        with np.errstate(over="ignore"):
            m = _splitmix64(sh[None, :] + self.seeds[:, None])
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        toks = tokens_a.to_pylist()
        ids = batch[self.id_col].to_numpy()
        bounds = np.searchsorted(parent, np.arange(len(batch) + 1))
        out_id, out_band, out_hash = [], [], []
        for d in range(len(batch)):
            sh = _shingle_hashes(toks[bounds[d] : bounds[d + 1]], self.n)
            sig = self._signature(sh)
            if sig is None:
                continue
            for band in range(self.bands):
                chunk = sig[band * self.rows : (band + 1) * self.rows]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_id.append(int(ids[d]))
                out_band.append(band)
                out_hash.append(int.from_bytes(bh, "little") >> 1)
        return pa.table(
            {
                self.id_col: pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int64()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
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

    raw_pairs = sig.groupby("part").map_groups(
        bucket_pairs_in_partition, batch_format="pandas"
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
    cand_rows = cand.take_all()
    if not cand_rows:
        return ray.data.from_arrow(empty)

    # DISTRIBUTED exact verification: the pair list (LSH output, small by
    # construction) is broadcast as a doc -> [(pair_part, pair_idx)] plan;
    # a filtered shingle pass re-emits each candidate doc's shingles once
    # per pair partition it participates in, and each pair partition
    # computes its pairs' exact Jaccard vectorized. Only the candidate
    # PAIR LIST ever touches the driver, never the shingle sets.
    pairs = sorted((int(r["a_id"]), int(r["b_id"])) for r in cand_rows)
    n_pair_parts = max(1, min(num_parts, (len(pairs) + 63) // 64))
    doc_plan: dict[int, list[int]] = {}
    for i, (a, b) in enumerate(pairs):
        pp = i % n_pair_parts
        doc_plan.setdefault(a, []).append(pp)
        doc_plan.setdefault(b, []).append(pp)
    plan_ref = ray.put({d: sorted(set(pp)) for d, pp in doc_plan.items()})
    pairs_ref = ray.put(pairs)

    class RoutedShingles(ShingleStage):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.plan = ray.get(plan_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_numpy()
            keep = np.fromiter(
                (int(d) in self.plan for d in ids), dtype=bool, count=len(ids)
            )
            sh = super().__call__(batch.filter(pa.array(keep)))
            # replicate each doc's shingle rows to every pair partition it's in
            doc = sh[self.id_col].to_numpy()
            reps = np.fromiter(
                (len(self.plan[int(d)]) for d in doc), dtype=np.int64, count=len(doc)
            )
            parts = np.fromiter(
                (p for d in doc for p in self.plan[int(d)]),
                dtype=np.int64,
                count=int(reps.sum()),
            )
            idx = np.repeat(np.arange(len(doc)), reps)
            rep_tbl = sh.take(pa.array(idx))
            return rep_tbl.append_column("pair_part", pa.array(parts))

    routed = ds.map_batches(
        RoutedShingles,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        all_pairs = ray.get(pairs_ref)
        pp = int(g["pair_part"].iloc[0])
        my_pairs = [p for i, p in enumerate(all_pairs) if i % n_pair_parts == pp]
        sets: dict[int, set] = {}
        for d, s in zip(g[id_col].to_numpy(), g["shingle"].to_numpy()):
            sets.setdefault(int(d), set()).add(int(s))
        rows = []
        for a, b in my_pairs:
            sa, sb = sets.get(a, set()), sets.get(b, set())
            union = len(sa | sb)
            j = round(len(sa & sb) / union, 6) if union else 0.0
            if j >= tau:
                rows.append({"a_id": a, "b_id": b, "jaccard": j})
        return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"]).astype(
            {"a_id": "int64", "b_id": "int64", "jaccard": "float64"}
        )

    return routed.groupby("pair_part").map_groups(verify_partition, batch_format="pandas")


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

    allp = banded.groupby("part").map_groups(band_pairs_in_partition, batch_format="pandas")

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
) -> pa.Table:
    """Connected components over near-dup pair edges -> (doc_id, cluster_id).

    cluster_id = min doc_id of the component (the dedup survivor). The
    iterate-to-fixpoint shape of the reference's relation-member closure
    (``OsmKeyValueObjectStore.cpp:1009-1016``, SURVEY.md J2): min-label
    propagation over the edge list, repeated until no label changes.
    Rounds are O(component diameter); near-dup components are tiny, so a
    handful of rounds suffice. Labels are numpy arrays here (pair sets are
    cardinality-bounded: near-dup edges only); the same loop distributes
    as per-round groupby(node).min(label) when edges exceed one task.
    """
    if isinstance(pairs, ray.data.Dataset):
        rows = pairs.select_columns([id_col_a, id_col_b]).take_all()
        a = np.array([r[id_col_a] for r in rows], dtype=np.int64)
        b = np.array([r[id_col_b] for r in rows], dtype=np.int64)
    else:
        a = pairs[id_col_a].to_numpy().astype(np.int64)
        b = pairs[id_col_b].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate((a, b))) if len(a) else np.empty(0, dtype=np.int64)
    label = nodes.copy()
    pos = {int(n): i for i, n in enumerate(nodes.tolist())}
    ai = np.array([pos[int(x)] for x in a], dtype=np.int64)
    bi = np.array([pos[int(x)] for x in b], dtype=np.int64)
    for _ in range(max_rounds):
        new = label.copy()
        np.minimum.at(new, ai, label[bi])
        np.minimum.at(new, bi, label[ai])
        # pointer-jump: adopt your current label's label
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if (new == label).all():
            break
        label = new
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array(label, type=pa.int64()),
        }
    )
