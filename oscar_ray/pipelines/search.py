"""Search pipelines over the testdata ``documents`` table.

``documents`` (doc_id, text, lang, source, n_chars) plays the pages role
with ``id_column="doc_id"`` (docid == doc_id, so results are directly
comparable to DuckDB SQL over the same table). Index artifacts are cached
under /tmp keyed by the input fingerprint, so repeated ``queries()``
calls share one build.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.layout import dict_path
from oscar_ray.index.reader import IndexReader
from oscar_ray.query.engine import QueryEngine

_CACHE_ROOT = "/tmp/oscar_ray_cache"


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def documents_index_dir(
    sf_dir: str, suffixes: bool = False, positions: bool = False
) -> str:
    """Build (or reuse) the documents index for one sf dir; returns its path.

    ``suffixes=True`` builds the substring-capable variant (separate cache
    dir; postings ~5x larger). ``positions=True`` builds the positional
    variant (phrase/proximity queries; ~2x postings bytes).
    """
    from oscar_ray.sources.pages import input_fingerprint, list_fragments

    src = documents_path(sf_dir)
    fp = input_fingerprint(list_fragments(src))
    tag = {
        (False, False): "documents",
        (True, False): "documents-sfx",
        (False, True): "documents-pos",
        (True, True): "documents-sfx-pos",
    }[(suffixes, positions)]
    out = os.path.join(_CACHE_ROOT, f"{tag}-{fp}")
    cfg = IndexBuildConfig(
        num_partitions=8,
        block_span_bits=12,
        shard_fragments=2,
        id_column="doc_id",
        url_column=None,
        lang_column="lang",
        dedup_urls=False,
        cleanup_spill=False,
        index_suffixes=suffixes,
        index_positions=positions,
        field_columns=None if suffixes else ["lang"],  # @lang: filter terms
    )
    build_index(src, out, cfg)  # no-op when complete manifest matches
    return out


def documents_segment_dirs(sf_dir: str, n_segments: int = 2) -> list[str]:
    """Split the documents table into block-span-aligned doc_id ranges and
    build one index per range (cached). The federated-serving fixture:
    SegmentedReader over these with zero offsets is rank-identical to the
    single documents index."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from oscar_ray.sources.pages import input_fingerprint, list_fragments

    src = documents_path(sf_dir)
    fp = input_fingerprint(list_fragments(src))
    root = os.path.join(_CACHE_ROOT, f"documents-seg{n_segments}-{fp}")
    dirs = [os.path.join(root, f"seg-{i}") for i in range(n_segments)]
    if all(os.path.exists(os.path.join(d, "manifest.json")) for d in dirs):
        try:
            from oscar_ray.index.reader import IndexReader

            if all(IndexReader(d).manifest.get("complete") for d in dirs):
                return dirs
        except Exception:
            pass
    t = pq.read_table(src)
    span = 1 << 6  # == the build config's block_span_bits below: small
    # blocks so even the 500-doc tier splits at a block boundary
    max_id = int(pc.max(t["doc_id"]).as_py())
    per = max((max_id + 1) // n_segments // span, 1) * span
    for i, d in enumerate(dirs):
        lo = i * per
        hi = (i + 1) * per if i < n_segments - 1 else max_id + 1
        part = t.filter(
            pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
        )
        seg_src = os.path.join(root, f"src-{i}.parquet")
        os.makedirs(root, exist_ok=True)
        pq.write_table(part, seg_src)
        cfg = IndexBuildConfig(
            num_partitions=8,
            block_span_bits=6,
            shard_fragments=2,
            id_column="doc_id",
            url_column=None,
            lang_column="lang",
            dedup_urls=False,
            cleanup_spill=False,
            field_columns=["lang"],
        )
        build_index(seg_src, d, cfg)
    return dirs


def segmented_scores_table(
    sf_dir: str, query: str, k: int | None = None, round_to: int = 4
) -> pa.Table:
    """bm25_scores_table over FEDERATED segment indexes (no merge):
    global df/avgdl summed across segments, ids pass through (explicit
    zero offsets — the segments' id ranges are already disjoint)."""
    from oscar_ray.index.segmented import SegmentedReader

    dirs = documents_segment_dirs(sf_dir)
    reader = SegmentedReader(dirs, offsets=[0] * len(dirs))
    engine = QueryEngine(None, reader=reader)
    ids, scores = engine.search(query, k=k if k is not None else 1 << 62)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "score": pa.array(np.round(scores, round_to), type=pa.float64()),
        }
    )
    return tbl if k is not None else tbl.sort_by("doc_id")


def sharded_scores_table(
    sf_dir: str, query: str, n_shards: int = 4, round_to: int = 4
) -> pa.Table:
    """bm25_scores_table evaluated by the doc-sharded serving pool
    (query/sharded.py): n_shards actors, each holding one docid-block
    slice of every posting list, fanned out and exactly merged. The
    oracle is the plain whole-corpus query: sharding must be invisible
    (scores bit-identical — global stats in every shard)."""
    from oscar_ray.query.sharded import ShardedPool

    idx = documents_index_dir(sf_dir)
    pool = ShardedPool(idx, n_shards=n_shards, num_cpus=0.5)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array([query], type=pa.string()),
            "k": pa.array([1 << 62], type=pa.int64()),  # full match set
        }
    )
    t = pool.search_batch(batch)
    tbl = pa.table(
        {
            "doc_id": t["docid"],
            "score": pa.array(
                np.round(t["score"].to_numpy(), round_to), type=pa.float64()
            ),
        }
    )
    return tbl.sort_by("doc_id")


def term_stats_table(sf_dir: str) -> pa.Table:
    """(term, df, cf) over the whole corpus, term ascending."""
    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    from oscar_ray.index.layout import FIELD_MARKER

    idx = documents_index_dir(sf_dir)
    reader = IndexReader(idx)
    parts = []
    for p in range(reader.num_partitions):
        path = dict_path(idx, p)
        if os.path.exists(path):
            parts.append(pq.read_table(path))
    t = pa.concat_tables(parts)
    # exclude namespace-marked terms (@field filters) — term stats are
    # about the text vocabulary
    t = t.filter(pc.invert(pc.starts_with(t["term"], FIELD_MARKER)))
    return t.sort_by("term")


def completion_table(sf_dir: str, prefix: str, k: int = 10) -> pa.Table:
    """(term, df) top-k completion suggestions for one prefix, ranked
    df DESC then term ASC (LiveCompletion term surface — see
    IndexReader.complete for the partition prune/merge shape)."""
    idx = documents_index_dir(sf_dir)
    rows = IndexReader(idx).complete(prefix, k)
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], type=pa.string()),
            "df": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


def suggestion_table(
    sf_dir: str, term: str, max_dist: int = 2, k: int = 10
) -> pa.Table:
    """(term, dist, df) did-you-mean suggestions for one query term,
    ranked dist ASC, df DESC, term ASC (see IndexReader.suggest)."""
    idx = documents_index_dir(sf_dir)
    rows = IndexReader(idx).suggest(term, max_dist=max_dist, k=k)
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], type=pa.string()),
            "dist": pa.array([r[1] for r in rows], type=pa.int64()),
            "df": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def doc_lengths_table(sf_dir: str) -> pa.Table:
    """(doc_id, doclen) for docs with >= 1 token."""
    import pyarrow.parquet as pq

    from oscar_ray.index.layout import docmeta_files

    idx = documents_index_dir(sf_dir)
    meta = pa.concat_tables(
        pq.read_table(f, columns=["docid", "doclen"]) for f in docmeta_files(idx)
    )
    meta = meta.rename_columns(["doc_id", "doclen"]).sort_by("doc_id")
    import pyarrow.compute as pc

    return meta.filter(pc.greater(meta["doclen"], 0))


def bm25_scores_table(
    sf_dir: str,
    query: str,
    k: int | None = None,
    round_to: int = 4,
    suffixes: bool = False,
    positions: bool = False,
) -> pa.Table:
    """(doc_id, score) for one query; score rounded AFTER ranking.

    k=None returns the full matching set (robust for oracle comparison);
    otherwise top-k in rank order. Raw scores are bit-identical to the
    SQL oracle (see spec/bm25.bm25_idf), so rounding agrees too.
    """
    idx = documents_index_dir(sf_dir, suffixes=suffixes, positions=positions)
    engine = QueryEngine(idx)
    eff_k = k if k is not None else 1 << 62
    ids, scores = engine.search(query, k=eff_k)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "score": pa.array(np.round(scores, round_to), type=pa.float64()),
        }
    )
    return tbl if k is not None else tbl.sort_by("doc_id")


def hybrid_search_rrf(
    sf_dir: str,
    query: str,
    query_vec: np.ndarray,
    k: int = 10,
    depth: int = 1000,
    rrf_c: int = 60,
) -> pa.Table:
    """Hybrid retrieval: BM25 top-``depth`` fused with embedding-cosine
    top-``depth`` by Reciprocal Rank Fusion -> (item_id, rrf_micro,
    lex_rank, vec_rank), top-k by (rrf desc, item_id asc).

    rrf(id) = 1/(c + lex_rank) + 1/(c + vec_rank), each term present
    only when the id appears in that list (absent rank reported as 0).
    Both candidate lists are depth-capped — the standard fusion shape,
    and what keeps the driver's merge state bounded at any corpus size
    (the two engines each produce their top-depth distributed; fusion is
    a 2*depth-row rank join). rrf_micro = floor(rrf * 1e6): the addition
    order (lexical term first) is pinned, so the DuckDB oracle computes
    identical float64 bits.
    """
    idx = documents_index_dir(sf_dir)
    emb = os.path.join(sf_dir, "embeddings.parquet")
    return hybrid_rrf_from_index(idx, emb, query, query_vec, k, depth, rrf_c)


def hybrid_rrf_from_index(
    index_dir: str,
    embeddings_path: str,
    query: str,
    query_vec: np.ndarray,
    k: int = 10,
    depth: int = 1000,
    rrf_c: int = 60,
) -> pa.Table:
    """RRF fusion against an already-built index + an embeddings parquet
    (the CLI-facing core of :func:`hybrid_search_rrf`)."""
    lex_ids, _ = QueryEngine(index_dir).search(query, k=depth)

    import ray.data

    from oscar_ray.stages.similarity import knn_brute_force

    # concurrency=2: a wider actor pool starves the upstream read at
    # small num_cpus (documented Ray Data pitfall); the scorer is one
    # matmul per batch, never the bottleneck here
    ann = knn_brute_force(
        ray.data.read_parquet(embeddings_path),
        np.asarray(query_vec, dtype=np.float64)[None, :],
        k=depth,
        concurrency=2,
    )
    vec_ids = ann["vec_id"].to_numpy()
    vec_ranks = ann["rank"].to_numpy()

    all_ids = np.union1d(lex_ids.astype(np.int64), vec_ids.astype(np.int64))
    lex_r = np.zeros(len(all_ids), dtype=np.int64)
    pos = np.searchsorted(all_ids, lex_ids.astype(np.int64))
    lex_r[pos] = np.arange(1, len(lex_ids) + 1)
    vec_r = np.zeros(len(all_ids), dtype=np.int64)
    pos = np.searchsorted(all_ids, vec_ids.astype(np.int64))
    vec_r[pos] = vec_ranks
    # pinned op order: lexical contribution + vector contribution
    rrf = np.where(lex_r > 0, 1.0 / (rrf_c + lex_r), 0.0) + np.where(
        vec_r > 0, 1.0 / (rrf_c + vec_r), 0.0
    )
    order = np.lexsort((all_ids, -rrf))[:k]
    return pa.table(
        {
            "item_id": pa.array(all_ids[order], type=pa.int64()),
            "rrf_micro": pa.array(
                np.floor(rrf[order] * 1e6).astype(np.int64), type=pa.int64()
            ),
            "lex_rank": pa.array(lex_r[order], type=pa.int64()),
            "vec_rank": pa.array(vec_r[order], type=pa.int64()),
        }
    )


def corpus_stats_table(sf_dir: str) -> pa.Table:
    """One row: (n_docs, sum_doclen) — docs with >=1 token excluded? No:
    every ingested doc counts (empty docs keep doclen 0)."""
    idx = documents_index_dir(sf_dir)
    reader = IndexReader(idx)
    s = reader.manifest["stats"]
    return pa.table(
        {
            "n_docs": pa.array([s["n_docs"]], type=pa.int64()),
            "sum_doclen": pa.array([s["sum_doclen"]], type=pa.int64()),
        }
    )


class _SnippetStage:
    """Actor stage: stream the corpus, emit a KWIC snippet for docs in
    the broadcast match set. The match-id array rides the object store
    ONCE (``ray.put`` ref in the constructor, like the decontamination
    stage's shingle set); per batch the membership probe is a
    vectorized searchsorted — non-matching rows never tokenize."""

    def __init__(self, id_ref, terms: tuple, window: int):
        import ray

        self.ids = ray.get(id_ref)  # sorted int64 array, zero-copy view
        self.terms = frozenset(terms)
        self.window = window

    def __call__(self, t: pa.Table) -> pa.Table:
        from oscar_ray.spec.tokenizer import tokenize_text

        did = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(self.ids):
            pos = np.searchsorted(self.ids, did)
            pos = np.clip(pos, 0, len(self.ids) - 1)
            mask = self.ids[pos] == did
        else:
            mask = np.zeros(len(did), dtype=bool)
        sub = t.filter(pa.array(mask))
        out_id, out_pos, out_sn = [], [], []
        w = self.window
        for d, text in zip(sub["doc_id"].to_pylist(), sub["text"].to_pylist()):
            toks = tokenize_text(text or "")
            p = next((i for i, tk in enumerate(toks) if tk in self.terms), None)
            if p is None:
                continue
            parts = (
                toks[max(0, p - w) : p]
                + ["[" + toks[p] + "]"]
                + toks[p + 1 : p + 1 + w]
            )
            out_id.append(d)
            out_pos.append(p + 1)  # 1-based, matches the SQL list_position
            out_sn.append(" ".join(parts))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "match_pos": pa.array(out_pos, type=pa.int64()),
                "snippet": pa.array(out_sn, type=pa.string()),
            }
        )


def kwic_snippets(sf_dir: str, query: str, terms: tuple, window: int = 3):
    """KWIC snippets for every doc matching ``query``: (doc_id,
    match_pos, snippet) where match_pos is the 1-based token index of
    the FIRST occurrence of any of ``terms`` and snippet is the
    +-window token context with the hit bracketed ("a b [scan] c d e").

    The item-print work item (`oscar-cmd` --show-docs / Workfunctions
    item printing) upgraded to contextual highlighting. Index resolves
    the match set (k-unbounded, like the other oracle entries); the
    corpus pass is a streaming map_batches with the id set broadcast —
    snippet rows live distributed until the caller sorts/collects.
    """
    import ray
    import ray.data

    idx = documents_index_dir(sf_dir)
    engine = QueryEngine(idx)
    ids, _scores = engine.search(query, k=1 << 62)
    id_ref = ray.put(np.sort(np.asarray(ids, dtype=np.int64)))
    ds = ray.data.read_parquet(documents_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(
        _SnippetStage,
        fn_constructor_kwargs={"id_ref": id_ref, "terms": terms, "window": window},
        batch_format="pyarrow",
        concurrency=2,
    ).sort("doc_id")


def more_like_this(
    sf_dir: str,
    doc_id: int,
    m: int = 5,
    k: int | None = None,
    round_to: int = 4,
) -> pa.Table:
    """Lucene-style More-Like-This: the source doc's top-``m`` tf*idf
    terms become an OR query; -> (doc_id, score) over the OTHER matching
    docs (k=None: full set sorted by id; else top-k in rank order).

    Term selection is pinned: tf from the source document's token
    stream (spec tokenizer), idf from the index's df via the exact
    ``spec.bm25.bm25_idf`` kernel, top-m by (tf*idf DESC, term ASC) —
    bit-reproducible in SQL, so the whole chain is hash-oracled
    (`search_more_like_this`). The OR query is evaluated by the normal
    engine (block-max pruning and all); query terms are joined in
    ascending term order so float accumulation matches the engine's
    pinned union order.

    Reference analog: the item-context workflows in oscar-cmd (seed an
    item, complete over its own strings, `Workfunctions.cpp` item info
    + completion chaining); re-expressed as the standard MLT operator.
    """
    from collections import Counter

    import pyarrow.dataset as pads

    from oscar_ray.spec.bm25 import bm25_idf
    from oscar_ray.spec.tokenizer import tokenize_text

    idx = documents_index_dir(sf_dir)
    engine = QueryEngine(idx)
    reader = engine.reader

    src = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id") == doc_id
    )
    if len(src) == 0:
        raise KeyError(f"doc_id {doc_id} not found in {sf_dir}")
    tf = Counter(tokenize_text(src["text"][0].as_py()))
    weighted = sorted(
        (
            (-(cnt * bm25_idf(reader.postings(t).df, reader.n_docs)), t)
            for t, cnt in tf.items()
        ),
    )[:m]
    terms = sorted(t for _, t in weighted)
    # +1: the source doc usually ranks itself first and is then excluded
    eff_k = (k + 1) if k is not None else 1 << 62
    ids, scores = engine.search(" + ".join(terms), k=eff_k)
    keep = ids != np.uint64(doc_id)
    ids, scores = ids[keep], scores[keep]
    if k is not None:
        ids, scores = ids[:k], scores[:k]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "score": pa.array(np.round(scores, round_to), type=pa.float64()),
        }
    )
    return tbl if k is not None else tbl.sort_by("doc_id")


def weighted_field_search(
    sf_dir: str,
    query: str,
    weight: float = 2.0,
    round_to: int = 4,
) -> pa.Table:
    """Weighted-field retrieval (the BM25F idea, Robertson et al. 2004,
    applied as score-level field combination): ``S = s_body + weight *
    s_anchor`` over TWO indexes sharing one docid space — the body index
    and the anchor-text-only index (anchor inheritance per the pinned
    link rule, pipelines/anchors.py). Docs matching in either field
    rank; the anchor field's own df/avgdl statistics are used (that is
    what distinguishes a field from concatenation — a rare anchor term
    scores high in the anchor field even if common in bodies).

    -> (doc_id, score) over the union match set, sorted by doc_id,
    rounded after combination. Addition order pinned (body + w*anchor)
    so the SQL oracle's coalesce sum is bit-identical pre-round.
    """
    from oscar_ray.pipelines.anchors import anchors_only_index_dir

    body = QueryEngine(documents_index_dir(sf_dir))
    anch = QueryEngine(anchors_only_index_dir(sf_dir))
    bi, bs = body.search(query, k=1 << 62)
    ai, as_ = anch.search(query, k=1 << 62)
    bi, ai = bi.astype(np.int64), ai.astype(np.int64)
    bo, ao = np.argsort(bi), np.argsort(ai)
    bi, bs, ai, as_ = bi[bo], bs[bo], ai[ao], as_[ao]
    all_ids = np.union1d(bi, ai)
    s = np.zeros(len(all_ids), dtype=np.float64)
    s[np.searchsorted(all_ids, bi)] += bs
    s[np.searchsorted(all_ids, ai)] += weight * as_
    return pa.table(
        {
            "doc_id": pa.array(all_ids),
            "score": pa.array(np.round(s, round_to), type=pa.float64()),
        }
    )


def ql_scores_table(
    sf_dir: str,
    terms: tuple[str, ...],
    mu: float = 100.0,
    round_to: int = 4,
) -> pa.Table:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001) — the classic language-model alternative to BM25,
    demonstrating the pluggable-scorer surface over the SAME index
    artifacts: ``score(d) = sum_t ln((tf_td + mu * cf_t / C) /
    (dl_d + mu))`` for docs matching >= 1 query term (absent terms
    contribute their tf=0 smoothed mass, the proper LM rule). ``C`` is
    the exact collection token count (manifest ``stats.sum_doclen``);
    cf comes from the posting metadata — no extra artifact.

    Determinism: float op order pinned (cf/C, then *mu, then +tf; terms
    accumulate in the given tuple order), so the DuckDB oracle computes
    identical doubles and the post-rank rounding agrees.
    -> (doc_id, score) sorted by doc_id.
    """
    idx = documents_index_dir(sf_dir)
    reader = IndexReader(idx)
    c_total = float(reader.manifest["stats"]["sum_doclen"])
    per_term = []
    for t in terms:
        tp = reader.postings(t)
        ids_l, tfs_l, dls_l = [], [], []
        for i in range(len(tp.block_ids)):
            d, tf, dl = tp.decode_block(i)
            ids_l.append(d.astype(np.int64))
            tfs_l.append(tf.astype(np.float64))
            dls_l.append(dl.astype(np.float64))
        ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
        tfs = np.concatenate(tfs_l) if tfs_l else np.empty(0, np.float64)
        dls = np.concatenate(dls_l) if dls_l else np.empty(0, np.float64)
        per_term.append((ids, tfs, dls, float(tp.cf)))

    all_ids = np.unique(np.concatenate([p[0] for p in per_term]))
    dl_all = np.zeros(len(all_ids), dtype=np.float64)
    for ids, _tfs, dls, _cf in per_term:
        dl_all[np.searchsorted(all_ids, ids)] = dls
    score = np.zeros(len(all_ids), dtype=np.float64)
    for ids, tfs, _dls, cf in per_term:
        tf_full = np.zeros(len(all_ids), dtype=np.float64)
        tf_full[np.searchsorted(all_ids, ids)] = tfs
        score = score + np.log((tf_full + mu * (cf / c_total)) / (dl_all + mu))
    return pa.table(
        {
            "doc_id": pa.array(all_ids),
            "score": pa.array(np.round(score, round_to), type=pa.float64()),
        }
    )
