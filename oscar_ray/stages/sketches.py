"""Streaming-style sketches over the token stream.

The "novel sketch" custom-operator row from the brief (cf. the top-k
frequent-term-query literature): both operators are MERGEABLE per-batch
summaries — the distributed shape is map_batches partials + an
associative combine, never a per-term shuffle.

- :func:`cms_term_counts`: Count-Min sketch of term frequencies.
  Per-batch partial sketches are plain int64 matrices; sum of sketches
  == sketch of the union (exactly mergeable), so the combine is a
  tree-reduce of dense arrays. Estimates overcount only (min over
  depth rows bounds the error by eps * total_count w.h.p.).
- :func:`topk_frequent_terms`: EXACT global top-k by collection
  frequency — per-batch exact partial counts routed by hash(term) % P
  (every occurrence of a term reaches ONE partition), per-partition
  vectorized combine + partial top-k, tiny (P * k)-row driver merge.
  The driver never holds vocabulary-sized state.

Combines are TREE-REDUCED as Ray tasks (both sketches are associative
by construction: CMS merges by +, HLL by elementwise max), so the
driver receives O(1) rows regardless of input block count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens

_CMS_SEED = 0x5EED5EED


def _tree_reduce_tables(ds: ray.data.Dataset, merge_fn, fanin: int = 8) -> pa.Table | None:
    """Tree-reduce a Dataset of mergeable rows down to ONE small table.

    ``merge_fn(list[pa.Table]) -> pa.Table`` must be associative and
    tolerate empty input tables. Executes the dataset to block refs, then
    ladders ``fanin``-way merge tasks (depth log_fanin(blocks)); the
    driver holds only refs + the final merged table — never a linear
    scan over per-block rows. Returns None for an empty dataset.
    """
    # a fanin group of only empty tables yields None (NOT merge_fn([]),
    # whose zero-length sketch row would poison the next merge level)
    merge_task = ray.remote(num_cpus=1)(
        lambda *tables: (
            merge_fn(live)
            if (live := [t for t in tables if t is not None and t.num_rows])
            else None
        )
    )
    refs = list(ds.to_arrow_refs())
    if not refs:
        return None
    while len(refs) > 1:
        refs = [
            merge_task.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)
        ]
    out = ray.get(refs[0])
    return out if out is not None and out.num_rows else None


def _cms_hash(term_hashes: np.ndarray, row: int, width: int) -> np.ndarray:
    from oscar_ray.stages.dedup import _splitmix64

    with np.errstate(over="ignore"):
        return (
            _splitmix64(term_hashes + np.uint64(_CMS_SEED + 0x9E37 * row))
            % np.uint64(width)
        ).astype(np.int64)


class CMSketchStage:
    """map_batches: text batch -> ONE row holding this batch's partial
    Count-Min sketch (depth x width int64, flattened)."""

    def __init__(self, text_col: str = "text", width: int = 16384, depth: int = 4):
        self.text_col, self.width, self.depth = text_col, width, depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        from oscar_ray.stages.dedup import _token_hashes

        _parent, tokens_a = flatten_tokens(batch[self.text_col])
        th = _token_hashes(tokens_a)
        sketch = np.zeros((self.depth, self.width), dtype=np.int64)
        if len(th):
            # exact per-distinct-term counts first (one unique), then one
            # scatter-add per depth row — C work proportional to vocab
            uniq, counts = np.unique(th, return_counts=True)
            for r in range(self.depth):
                np.add.at(sketch[r], _cms_hash(uniq, r, self.width), counts)
        return pa.table(
            {
                "sketch": pa.array([sketch.reshape(-1)], type=pa.list_(pa.int64())),
                "n_tokens": pa.array([int(len(th))], type=pa.int64()),
            }
        )


class CountMinSketch:
    """Queryable merged sketch."""

    def __init__(self, matrix: np.ndarray, width: int, depth: int, total: int):
        self.matrix, self.width, self.depth, self.total = matrix, width, depth, total

    def estimate(self, terms: list[str]) -> np.ndarray:
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
                )
                for t in terms
            ),
            dtype=np.uint64,
            count=len(terms),
        )
        est = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            est = np.minimum(est, self.matrix[r][_cms_hash(hs, r, self.width)])
        return est


def _merge_cms_tables(tables: list[pa.Table]) -> pa.Table:
    """Associative CMS merge: elementwise + over sketch rows (any count)."""
    mats, total = [], 0
    for t in tables:
        col = t["sketch"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        mats.append(flat.reshape(t.num_rows, -1).sum(axis=0))
        total += int(pa.compute.sum(t["n_tokens"]).as_py() or 0)
    merged = np.sum(mats, axis=0) if mats else np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "sketch": pa.array([merged.tolist()], type=pa.list_(pa.int64())),
            "n_tokens": pa.array([total], type=pa.int64()),
        }
    )


def cms_term_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    width: int = 16384,
    depth: int = 4,
    concurrency: int = 2,
) -> CountMinSketch:
    """Build the merged Count-Min sketch of the corpus's term counts.

    One dense partial row per input block; the combine is a tree of
    fanin-way + reductions as Ray tasks — the driver receives one row.
    """
    partials = ds.map_batches(
        CMSketchStage,
        fn_constructor_kwargs={"text_col": text_col, "width": width, "depth": depth},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = _tree_reduce_tables(partials, _merge_cms_tables)
    if merged is None:
        return CountMinSketch(np.zeros((depth, width), dtype=np.int64), width, depth, 0)
    matrix = np.asarray(merged["sketch"][0].as_py(), dtype=np.int64)
    return CountMinSketch(
        matrix.reshape(depth, width), width, depth, int(merged["n_tokens"][0].as_py())
    )


def topk_frequent_terms(
    ds: ray.data.Dataset,
    k: int = 20,
    text_col: str = "text",
    concurrency: int = 2,
    num_parts: int = 16,
) -> pa.Table:
    """EXACT top-k terms by collection frequency -> (term, cf),
    (cf desc, term asc).

    Scale shape (the KVStats::topk discipline, the A5 analog): per-batch
    exact partial counts carry ``part = hash(term) % P``, so EVERY
    occurrence of a term lands in exactly one partition of the groupby
    exchange; each partition combines vectorized (arrow groupby) and
    emits only its local top-k — exact, because the global top-k is a
    subset of the union of per-partition top-k's when partitions own
    whole terms. The driver merges P * k rows, never vocabulary-sized
    state.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        _parent, tokens_a = flatten_tokens(batch[text_col])
        denc = pc.dictionary_encode(
            tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
        )
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(denc.dictionary))
        # partition per DISTINCT term: vectorized buffer-level hash
        # (hash_strings_u64) mod P — no Python loop, even vocab-sized.
        # Routing only affects WHICH partition combines a term, never
        # the counts, so results (and the SQL oracle) are unchanged.
        from oscar_ray.stages.dedup import hash_strings_u64

        parts = (
            hash_strings_u64(denc.dictionary) % np.uint64(num_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "term": denc.dictionary,
                "cf": pa.array(counts.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g[["term", "cf"]], preserve_index=False)
        agg = t.group_by("term").aggregate([("cf", "sum")])
        cf = agg["cf_sum"].to_numpy()
        terms = agg["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -cf))[:k]
        return pd.DataFrame(
            {"term": terms[order], "cf": cf[order].astype(np.int64)}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)
        .groupby("part")
        .map_groups(part_topk, batch_format="pandas")
        .take_all()
    )  # <= P * k rows
    if not rows:
        return pa.table(
            {"term": pa.array([], type=pa.string()), "cf": pa.array([], type=pa.int64())}
        )
    df = pd.DataFrame(rows).sort_values(
        ["cf", "term"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pa.table(
        {
            "term": pa.array(df["term"], type=pa.string()),
            "cf": pa.array(df["cf"].to_numpy().astype(np.int64)),
        }
    )


# -- HyperLogLog distinct counting ------------------------------------------

_HLL_SEED = np.uint64(0x48499)


class HLLStage:
    """map_batches: text batch -> one row with this batch's partial HLL
    register array (distinct-TERM estimation; registers merge by max)."""

    def __init__(self, text_col: str = "text", p: int = 12):
        assert p >= 11, "p >= 11 keeps the rank computation float-exact"
        self.text_col, self.p = text_col, p
        self.m = 1 << p

    def __call__(self, batch: pa.Table) -> pa.Table:
        from oscar_ray.stages.dedup import _splitmix64, _token_hashes

        _parent, tokens_a = flatten_tokens(batch[self.text_col])
        th = _token_hashes(tokens_a)
        regs = np.zeros(self.m, dtype=np.int64)
        if len(th):
            with np.errstate(over="ignore"):
                h = _splitmix64(th + _HLL_SEED)
            idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
            low_bits = 64 - self.p
            v = h & np.uint64((1 << low_bits) - 1)
            # rank = leading zeros of the low (64-p)-bit field + 1;
            # frexp's exponent is v's exact bit_length for v < 2^53
            # (guaranteed when p >= 11; asserted in __init__)
            fl = np.frexp(v.astype(np.float64))[1]  # 0 when v == 0
            rank = (low_bits - fl + 1).astype(np.int64)
            np.maximum.at(regs, idx, rank)
        return pa.table({"regs": pa.array([regs], type=pa.list_(pa.int64()))})


def _merge_hll_tables(tables: list[pa.Table]) -> pa.Table:
    """Associative HLL merge: elementwise max over register rows."""
    regs = None
    for t in tables:
        col = t["regs"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        m = flat.reshape(t.num_rows, -1).max(axis=0)
        regs = m if regs is None else np.maximum(regs, m)
    if regs is None:
        regs = np.empty(0, dtype=np.int64)
    return pa.table({"regs": pa.array([regs.tolist()], type=pa.list_(pa.int64()))})


def hll_distinct_terms(
    ds: ray.data.Dataset, text_col: str = "text", p: int = 12, concurrency: int = 2
) -> float:
    """Estimated number of DISTINCT terms in the corpus (HyperLogLog,
    registers merged by elementwise max — exactly mergeable; the combine
    is a tree of Ray tasks, so the driver receives one register row)."""
    partials = ds.map_batches(
        HLLStage,
        fn_constructor_kwargs={"text_col": text_col, "p": p},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = _tree_reduce_tables(partials, _merge_hll_tables)
    m = 1 << p
    regs = (
        np.asarray(merged["regs"][0].as_py(), dtype=np.int64)
        if merged is not None
        else np.zeros(m, dtype=np.int64)
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def topk_terms_by_group(
    ds: ray.data.Dataset,
    group_col: str = "lang",
    k: int = 10,
    text_col: str = "text",
    concurrency: int = 2,
    num_parts: int = 16,
) -> pa.Table:
    """EXACT per-group top-k terms by collection frequency ->
    (group, term, cf), ordered (group asc, cf desc, term asc).

    Same discipline as :func:`topk_frequent_terms`, with the routing key
    hash(term) alone: every (group, term) combination still lands in
    exactly one partition (a term's rows all share a part, whatever
    their group), each partition emits its local per-group top-k, and
    the driver merges <= P * |groups| * k rows. Group cardinality is
    assumed facet-like (languages, sources); the driver merge is
    group-count-bounded, never vocabulary-bounded.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        gcol = batch[group_col]
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
        parent, tokens_a = flatten_tokens(batch[text_col])
        groups = gcol.take(parent)
        t = pa.table({"g": groups, "term": tokens_a})
        agg = t.group_by(["g", "term"]).aggregate([([], "count_all")])
        from oscar_ray.stages.dedup import hash_strings_u64

        parts = (
            hash_strings_u64(agg["term"].combine_chunks())
            % np.uint64(num_parts)
        ).astype(np.int64)
        return pa.table(
            {
                group_col: agg["g"],
                "term": agg["term"],
                "cf": agg["count_all"].cast(pa.int64()),
                "part": pa.array(parts),
            }
        )

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(
            g[[group_col, "term", "cf"]], preserve_index=False
        )
        agg = t.group_by([group_col, "term"]).aggregate([("cf", "sum")])
        gv = agg[group_col].to_numpy(zero_copy_only=False)
        terms = agg["term"].to_numpy(zero_copy_only=False)
        cf = agg["cf_sum"].to_numpy()
        order = np.lexsort((terms, -cf, gv))
        gv, terms, cf = gv[order], terms[order], cf[order]
        starts = np.concatenate([[True], gv[1:] != gv[:-1]])
        rank = np.arange(len(gv)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(gv)), -1)
        )
        keep = rank < k
        return pd.DataFrame(
            {group_col: gv[keep], "term": terms[keep], "cf": cf[keep].astype(np.int64)}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)
        .groupby("part")
        .map_groups(part_topk, batch_format="pandas")
        .take_all()
    )  # <= P * |groups| * k rows
    if not rows:
        return pa.table(
            {
                group_col: pa.array([], type=pa.string()),
                "term": pa.array([], type=pa.string()),
                "cf": pa.array([], type=pa.int64()),
            }
        )
    df = pd.DataFrame(rows)
    df = df.sort_values(
        [group_col, "cf", "term"], ascending=[True, False, True], kind="mergesort"
    )
    df = df.groupby(group_col, sort=True).head(k).reset_index(drop=True)
    return pa.table(
        {
            group_col: pa.array(df[group_col], type=pa.string()),
            "term": pa.array(df["term"], type=pa.string()),
            "cf": pa.array(df["cf"].to_numpy().astype(np.int64)),
        }
    )


# -- TF-IDF keyword extraction ------------------------------------------------


def tfidf_keywords(
    ds,
    n_docs: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
    concurrency: int = 2,
):
    """EXACT per-doc top-k keywords by tf-idf ->
    (doc_id, term, tf, score_micro, rank), rank 1..k per doc ordered
    (score desc, term asc). Ties are term-lexicographic, so the result
    is total-order deterministic.

        idf_micro = floor(ln((n_docs + 1) / (df + 1)) * 1e6)   int64
        score     = tf * idf_micro                             int64

    The integer-micro idf (ln once per DISTINCT term on float64 operands
    built from exact integers) keeps every downstream comparison integer
    arithmetic — hash-exact against the SQL oracle's window function.

    Distributed shape (two bounded-part exchanges, the bigram-LM
    pattern): per-batch (doc, term, tf) rows route by hash(term) % P,
    so each part holds every occurrence row of its terms and df is
    part-local; scored rows re-route by doc % P where a vectorized
    lexsort keeps the per-doc top-k. The df table never leaves its
    partition and the driver holds nothing — output is a Dataset of
    <= n_docs * k rows.

    ``n_docs`` is the corpus document count (parquet metadata at the
    caller — no extra pass). Reference analog: the per-item top-scored
    tag surface of KVStats (`oscar-cmd/Workfunctions.cpp` kvstats),
    upgraded from facet counts to tf-idf relevance.
    """
    import pyarrow.compute as pc

    from oscar_ray.stages.dedup import hash_strings_u64

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        parent_a, tokens_a = flatten_tokens(batch[text_col])
        parent = np.asarray(parent_a, dtype=np.int64)
        if len(parent) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        denc = pc.dictionary_encode(tokens_a)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        nv = np.int64(len(denc.dictionary))
        key = parent * nv + codes
        uniq, cnt = np.unique(key, return_counts=True)
        u_doc, u_code = uniq // nv, uniq % nv
        terms = denc.dictionary.take(pa.array(u_code))
        parts = (hash_strings_u64(terms) % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[u_doc], type=pa.int64()),
                "term": terms,
                "tf": pa.array(cnt.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    def score_part(g: pa.Table) -> pa.Table:
        terms = g["term"]
        denc = pc.dictionary_encode(
            terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        )
        codes = np.asarray(denc.indices, dtype=np.int64)
        df_per_term = np.bincount(codes, minlength=len(denc.dictionary))
        # ln once per distinct term; exact-integer float64 operands
        idf_micro = np.floor(
            np.log((n_docs + 1.0) / (df_per_term + 1.0)) * 1_000_000
        ).astype(np.int64)
        tf = g["tf"].to_numpy()
        ids = g[id_col].to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "term": denc.dictionary.take(pa.array(codes)),
                "tf": pa.array(tf.astype(np.int64)),
                "score_micro": pa.array(tf * idf_micro[codes]),
                "dpart": pa.array(ids % np.int64(num_parts)),
            }
        )

    def doc_topk(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy()
        terms = g["term"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy()
        score = g["score_micro"].to_numpy()
        order = np.lexsort((terms, -score, ids))
        ids, terms, tf, score = ids[order], terms[order], tf[order], score[order]
        starts = np.concatenate([[True], ids[1:] != ids[:-1]])
        rank = np.arange(len(ids)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(ids)), -1)
        )
        keep = rank < k
        return pa.table(
            {
                id_col: pa.array(ids[keep], type=pa.int64()),
                "term": pa.array(terms[keep], type=pa.string()),
                "tf": pa.array(tf[keep].astype(np.int64)),
                "score_micro": pa.array(score[keep].astype(np.int64)),
                "rank": pa.array((rank[keep] + 1).astype(np.int64)),
            }
        )

    scored = (
        ds.map_batches(explode, batch_format="pyarrow", concurrency=concurrency)
        # bound block count entering each exchange: sort-shuffle pieces
        # are ~bytes/B^2 and must stay past Ray's ~100 KB inline
        # threshold (the stages/spans.py discipline)
        .repartition(num_parts)
        .groupby("part")
        .map_groups(lambda g: score_part(g.drop_columns(["part"])), batch_format="pyarrow")
    )
    return (
        scored.repartition(num_parts)
        .groupby("dpart")
        .map_groups(lambda g: doc_topk(g.drop_columns(["dpart"])), batch_format="pyarrow")
    )


def cooccurrence_pmi(
    ds,
    n_docs: int,
    max_terms_per_doc: int = 16,
    min_pair_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
):
    """Collocation extraction: doc-level term co-occurrence with PMI.

    Universe: each doc's FIRST ``max_terms_per_doc`` distinct terms in
    document order (the bounded per-doc set that keeps pair volume
    O(docs * K^2) — the shingle-cap discipline). For every unordered
    in-universe pair (a < b lexicographically):

        pmi_micro = fln(pair_docs) + fln(n_docs) - fln(docs_a) - fln(docs_b)
        fln(x)    = floor(ln(x) * 1e6)  on exact-integer float64 operands

    — ln once per distinct count, floors summed as int64 (the repo's
    integer-micro ln discipline), so the SQL oracle is hash-exact.

    Distributed shape: per-batch vectorized first-K extraction + pair
    expansion -> ONE pair-hash-routed count exchange and ONE term-routed
    doc-count exchange -> two partitioned hash_joins to attach the
    marginals -> vectorized PMI. Output Dataset:
    (term_a, term_b, pair_docs, pmi_micro), pair_docs >= min_pair_docs.
    Driver holds nothing; pair cardinality is vocab^2-bounded and
    further cut by the min-support filter.
    """
    import pyarrow.compute as pc

    from oscar_ray.stages.dedup import hash_strings_u64
    from oscar_ray.stages.joins import hash_join

    K = max_terms_per_doc

    def _kept_first_k(batch: pa.Table):
        """-> (doc ids, lexrank-sorted kept codes per doc, dictionary)."""
        parent_a, tokens_a = flatten_tokens(batch[text_col])
        parent = np.asarray(parent_a, dtype=np.int64)
        if len(parent) == 0:
            return None
        denc = pc.dictionary_encode(tokens_a)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        nv = np.int64(len(denc.dictionary))
        key = parent * nv + codes
        _, first_idx = np.unique(key, return_index=True)
        first_idx.sort()  # doc-grouped, within-doc first-appearance order
        p, c = parent[first_idx], codes[first_idx]
        starts = np.concatenate([[0], np.flatnonzero(p[1:] != p[:-1]) + 1])
        seg_of = np.searchsorted(starts, np.arange(len(p)), side="right") - 1
        rank = np.arange(len(p)) - starts[seg_of]
        keep = rank < K
        p, c = p[keep], c[keep]
        # within each doc, order kept terms lexicographically
        lexrank = np.empty(int(nv), dtype=np.int64)
        lexrank[np.argsort(denc.dictionary.to_numpy(zero_copy_only=False))] = (
            np.arange(int(nv))
        )
        order = np.lexsort((lexrank[c], p))
        return batch[id_col].to_numpy(), p[order], c[order], denc.dictionary

    def explode_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term_a": pa.array([], type=pa.string()),
                "term_b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        got = _kept_first_k(batch)
        if got is None:
            return empty
        _, p, c, vocab = got
        starts = np.concatenate([[0], np.flatnonzero(p[1:] != p[:-1]) + 1])
        seg_of = np.searchsorted(starts, np.arange(len(p)), side="right") - 1
        pos = np.arange(len(p)) - starts[seg_of]
        total = int(pos.sum())
        if total == 0:
            return empty
        # b side: element at in-doc position j pairs with its j predecessors
        b_idx = np.repeat(np.arange(len(p)), pos)
        offs = np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.arange(total) - offs + np.repeat(starts[seg_of], pos)
        ca, cb = c[a_idx], c[b_idx]
        # batch-level pre-aggregation before the exchange
        nv = np.int64(len(vocab))
        pkey = ca * nv + cb
        uniq, cnt = np.unique(pkey, return_counts=True)
        ta = vocab.take(pa.array(uniq // nv))
        tb = vocab.take(pa.array(uniq % nv))
        joined = pc.binary_join_element_wise(ta, tb, "\x1f")
        parts = (hash_strings_u64(joined) % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "term_a": ta,
                "term_b": tb,
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    def explode_terms(batch: pa.Table) -> pa.Table:
        got = _kept_first_k(batch)
        if got is None:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        _, _, c, vocab = got
        uniq, cnt = np.unique(c, return_counts=True)
        t = vocab.take(pa.array(uniq))
        parts = (hash_strings_u64(t) % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "term": t,
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    def _sum_part(g: pa.Table, cols: list[str], out: str) -> pa.Table:
        joined = g[cols[0]].combine_chunks()
        for extra in cols[1:]:
            joined = pc.binary_join_element_wise(
                joined, g[extra].combine_chunks(), "\x1f"
            )
        denc = pc.dictionary_encode(joined)
        codes = np.asarray(denc.indices, dtype=np.int64)
        sums = np.bincount(
            codes, weights=g["n"].to_numpy(), minlength=len(denc.dictionary)
        ).astype(np.int64)
        firsts = np.unique(codes, return_index=True)[1]
        res = {c_: g[c_].combine_chunks().take(pa.array(firsts)) for c_ in cols}
        res[out] = pa.array(sums[np.asarray(denc.indices.take(pa.array(firsts)))])
        return pa.table(res)

    pairs = (
        ds.map_batches(explode_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _sum_part(g, ["term_a", "term_b"], "pair_docs"),
            batch_format="pyarrow",
        )
    )
    terms = (
        ds.map_batches(explode_terms, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _sum_part(g, ["term"], "term_docs"),
            batch_format="pyarrow",
        )
    )
    j1 = hash_join(pairs, terms, on=("term_a", "term"), num_parts=num_parts)
    j2 = hash_join(
        j1,
        terms,
        on=("term_b", "term"),
        num_parts=num_parts,
        right_suffix="_b",
    )

    fln_n = int(np.floor(np.log(np.float64(n_docs)) * 1_000_000))

    def _pmi(batch: pa.Table) -> pa.Table:
        pd_ = batch["pair_docs"].to_numpy()
        keep = pd_ >= min_pair_docs
        pd_ = pd_[keep]
        ca = batch["term_docs"].to_numpy()[keep]
        cb = batch["term_docs_b"].to_numpy()[keep]
        fln = lambda x: np.floor(  # noqa: E731 — ln once per operand row
            np.log(x.astype(np.float64)) * 1_000_000
        ).astype(np.int64)
        pmi = fln(pd_) + np.int64(fln_n) - fln(ca) - fln(cb)
        return pa.table(
            {
                "term_a": batch["term_a"].filter(pa.array(keep)),
                "term_b": batch["term_b"].filter(pa.array(keep)),
                "pair_docs": pa.array(pd_.astype(np.int64)),
                "pmi_micro": pa.array(pmi),
            }
        )

    return j2.map_batches(_pmi, batch_format="pyarrow")
