"""Query evaluation: exhaustive and block-max-pruned, plus batch serving.

Two evaluation strategies over the same artifacts, mirroring the
reference's engine pair (plain CellQueryResult vs treed/decelled
evaluation, ``oscar-cmd/LiveCompleter.cpp:170-236`` /
``DecelledACOT.cpp:13-99``) whose equality the reference asserts with
``-ifq`` (``Workfunctions.cpp:1169-1191``) — our differential tests do
the same:

- **exhaustive**: decode every term's full posting list, evaluate the
  set-op tree bottom-up with vectorized merges, then tie-safe top-k.
- **pruned** (block-max): posting blocks are docid-range aligned
  (block_id = docid >> B for every term), so each block id defines an
  independent slice of the docid space and ANY set-op tree evaluates
  exactly per block. Blocks are visited in descending score upper
  bound (sum of per-term idf * block max_tfn, feasibility per op), and
  the scan stops when the bound falls strictly below the current k-th
  score (ties stay correct: a doc can only tie theta inside a block
  whose bound >= theta). This is Block-Max WAND adapted to aligned
  blocks; head-term salting at build time is what makes the block set
  fine-grained enough to prune.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from dataclasses import dataclass, field

from oscar_ray.index.reader import IndexReader, PositionsUnavailable
from oscar_ray.query import setops
from oscar_ray.index.layout import FIELD_MARKER, SUFFIX_MARKER
from oscar_ray.query.parser import (
    Field,
    Fuzzy,
    Node,
    Op,
    Phrase,
    Prefix,
    Proximity,
    QueryParseError,
    Regex,
    Substring,
    Term,
    parse_query,
    query_terms,
)
from oscar_ray.spec.bm25 import bm25_idf, bm25_tf_norm

#: maximum dictionary expansions per prefix leaf (ascending term order);
#: pinned — the oracle applies the same cap
MAX_PREFIX_EXPANSIONS = 256


def expand_prefixes(
    node: Node, reader: IndexReader, limit: int = MAX_PREFIX_EXPANSIONS
) -> Node:
    """Rewrite Prefix leaves into left-assoc OR chains over the matching
    dictionary terms (ascending — pins float accumulation order). A prefix
    with no matches becomes Term("") which has df == 0.

    The trie-descent analog: oscar resolves a prefix to a trie subtree
    whose payload is the precomputed union (``CellTextCompleter`` fm/pm
    pointers); we resolve it to an OR over the sorted dictionary range.
    """
    if isinstance(node, (Prefix, Substring, Fuzzy, Regex)):
        if isinstance(node, Prefix):
            terms = reader.terms_with_prefix(node.prefix, limit=limit)
        elif isinstance(node, Fuzzy):
            # fuzzy = OR over dictionary terms within edit distance,
            # ascending, same expansion cap as a prefix scan
            terms = reader.terms_with_edit_distance(
                node.token, node.max_dist, limit=limit
            )
        elif isinstance(node, Regex):
            terms = reader.terms_with_regex(node.pattern, limit=limit)
        elif node.exact_suffix:
            # `*foo`: exact suffix == the single marker term
            terms = [SUFFIX_MARKER + node.token]
            if reader.term_stats(terms[0])[0] == 0:
                terms = []
        else:
            # `*foo*`: substring == prefix scan over the suffix namespace
            terms = reader.terms_with_prefix(SUFFIX_MARKER + node.token, limit=limit)
        if not terms:
            return Term("")
        if len(terms) == 1:
            return Term(terms[0])
        # k-way node: one merged union (setops.multi_union) instead of an
        # O(E^2) pairwise chain; per-doc float accumulation order is the
        # same ascending-term sequence, so scores stay bit-identical
        return MultiOr(tuple(terms))
    if isinstance(node, Op):
        return Op(
            node.kind,
            expand_prefixes(node.left, reader, limit),
            expand_prefixes(node.right, reader, limit),
        )
    return node


@dataclass(frozen=True)
class MultiOr:
    """A dictionary-expansion union (prefix/substring/fuzzy/regex leaf
    expanded over E dictionary terms, ascending): evaluated as ONE k-way
    merged union per block / per query, score-identical to the OR chain."""

    terms: tuple[str, ...]

    def __repr__(self):
        return f"MOr({len(self.terms)} terms)"


@dataclass(frozen=True)
class Materialized:
    """A positional leaf (Phrase/Proximity) evaluated eagerly to a scored
    set before tree evaluation — positional predicates need exact
    positions, so there is nothing lazy left to prune; the per-block max
    scores below keep the REST of the tree block-max prunable around it."""

    ids: np.ndarray  # uint64, ascending
    scores: np.ndarray  # float64, aligned
    block_slices: dict = field(default_factory=dict)  # block_id -> (lo, hi)
    block_maxes: dict = field(default_factory=dict)  # block_id -> max score

    def __repr__(self):
        return f"M({len(self.ids)} docs)"


def _make_materialized(
    ids: np.ndarray, scores: np.ndarray, span_bits: int
) -> Materialized:
    ids = np.asarray(ids, dtype=np.uint64)
    scores = np.asarray(scores, dtype=np.float64)
    blocks = (ids >> np.uint64(span_bits)).astype(np.int64)
    slices: dict = {}
    maxes: dict = {}
    if len(ids):
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(blocks)) + 1, [len(ids)])
        )
        for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            b = int(blocks[s])
            slices[b] = (s, e)
            maxes[b] = float(scores[s:e].max())
    return Materialized(ids, scores, slices, maxes)


class QueryEngine:
    """Evaluate set-algebra BM25 queries against one index directory.

    ``parallel_fetch=True`` fetches distinct terms' postings on a small
    thread pool (the per-query threadCount analog,
    ``LiveCompleter.cpp:202-227``) — use for single-query latency; leave
    off in batch-serving actors, where it oversubscribes threads and
    costs throughput."""

    def __init__(
        self,
        index_dir: str,
        reader: IndexReader | None = None,
        parallel_fetch: bool = False,
    ):
        self.reader = reader or IndexReader(index_dir)
        self.parallel_fetch = parallel_fetch
        # materialized positional leaves are the expensive part of phrase
        # serving; repeated phrases in a batch stream hit this (keyed on
        # the leaf itself — the eval depends on nothing else)
        self._positional_cache: dict = {}
        # doc-sharded serving (query/sharded.py): a phrase's BM25 idf
        # uses its df, which a block-ranged reader can only see locally.
        # The sharded pool sums local dfs (shards partition docids, so
        # the sum IS the global df) and pins them here before eval.
        self.phrase_df_overrides: dict[tuple[str, ...], int] = {}

    # ------------------------------------------------------------------
    def search(self, query: str, k: int = 10, mode: str = "auto"):
        """-> (docids int64, scores float64), rank order (score desc, docid asc).

        Malformed queries yield empty results (don't-crash contract).
        """
        ids, scores, _ = self.search_timed(query, k=k, mode=mode)
        return ids, scores

    def search_timed(self, query: str, k: int = 10, mode: str = "auto"):
        """search() + per-phase microsecond timings, mirroring the
        reference's benchmark phase split (parse / calc / flatten,
        ``oscar-cmd/Benchmark.cpp:227-305``): parse_us (query -> AST),
        expand_us (prefix/substring dictionary expansion), eval_us
        (posting fetch + set ops + top-k)."""
        import time as _time

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        t0 = _time.perf_counter()
        try:
            node = parse_query(query)
        except QueryParseError:
            return (*empty, {"parse_us": (_time.perf_counter() - t0) * 1e6,
                             "expand_us": 0.0, "eval_us": 0.0, "error": True})
        t1 = _time.perf_counter()
        if node is None:
            return (*empty, {"parse_us": (t1 - t0) * 1e6, "expand_us": 0.0,
                             "eval_us": 0.0})
        node = expand_prefixes(node, self.reader)
        try:
            node = self._materialize_positional(node)
        except PositionsUnavailable:
            # don't-crash contract: a phrase/proximity query against an
            # index without the positions sidecar yields empty, flagged
            return (*empty, {"parse_us": (t1 - t0) * 1e6,
                             "expand_us": (_time.perf_counter() - t1) * 1e6,
                             "eval_us": 0.0, "error": True,
                             "reason": "positions_unavailable"})
        t2 = _time.perf_counter()
        if mode == "exhaustive":
            ids, scores = self._eval_exhaustive(node)
            ids, scores = setops.top_k(ids, scores, k)
        else:
            ids, scores = self._eval_pruned(node, k)
        t3 = _time.perf_counter()
        timings = {
            "parse_us": (t1 - t0) * 1e6,
            "expand_us": (t2 - t1) * 1e6,
            "eval_us": (t3 - t2) * 1e6,
        }
        return ids.astype(np.int64), scores, timings

    # -- positional leaves (evaluated eagerly, before tree eval) --------
    def _materialize_positional(self, node: Node) -> Node:
        from oscar_ray.query import positional

        df_override = (
            self.phrase_df_overrides.get(tuple(node.tokens))
            if isinstance(node, Phrase)
            else None
        )
        if isinstance(node, (Phrase, Proximity)):
            hit = self._positional_cache.get((node, df_override))
            if hit is not None:
                return hit
        if isinstance(node, Phrase):
            ids, tfs, dls = positional.phrase_postings(
                self.reader, node.tokens, parallel=self.parallel_fetch
            )
            if not len(ids):
                scores = ids.astype(np.float64)
            else:
                # one virtual term: BM25 over the PHRASE's tf and df.
                # Under doc-sharding len(ids) is the shard-LOCAL df; the
                # pool pins the global df (sum of local dfs) via
                # phrase_df_overrides so scores stay rank-identical.
                df = float(df_override) if df_override is not None else float(len(ids))
                idf = bm25_idf(df, self.reader.n_docs)
                scores = idf * bm25_tf_norm(
                    tfs, dls, self.reader.avgdl, self.reader.params
                )
            return self._cache_positional(
                (node, df_override),
                _make_materialized(ids, scores, self.reader.block_span_bits),
            )
        if isinstance(node, Proximity):
            # positional FILTER over the tokens' AND: same scores, the
            # window predicate only narrows the doc set
            and_set: setops.ScoredSet | None = None
            for t in node.tokens:
                leaf = self._leaf_full(t)
                and_set = leaf if and_set is None else setops.intersect(and_set, leaf)
            ids, scores = and_set
            match = positional.proximity_match_ids(
                self.reader, node.tokens, node.slop, parallel=self.parallel_fetch
            )
            if len(match) and len(ids):
                sel = np.searchsorted(ids, match)
                ids, scores = match, scores[sel]
            else:
                ids = np.empty(0, dtype=np.uint64)
                scores = np.empty(0, dtype=np.float64)
            return self._cache_positional(
                (node, None),
                _make_materialized(ids, scores, self.reader.block_span_bits),
            )
        if isinstance(node, Op):
            return Op(
                node.kind,
                self._materialize_positional(node.left),
                self._materialize_positional(node.right),
            )
        return node

    def _cache_positional(self, key, mat: Materialized) -> Materialized:
        if len(self._positional_cache) > 256:
            self._positional_cache.clear()
        self._positional_cache[key] = mat
        return mat

    # -- exhaustive ----------------------------------------------------
    def _leaf_full(self, term: str) -> setops.ScoredSet:
        tp = self.reader.postings(term)
        # nb == 0 with df > 0: a doc-sharded reader (block_range) whose
        # shard holds none of this term's blocks — df stays global
        nb = len(tp.doc_counts)
        if tp.df == 0 or nb == 0:
            return setops.empty_set()
        pairs = [
            tp.scored_block(i, self.reader.avgdl, self.reader.params)
            for i in range(nb)
        ]
        docids = np.concatenate([p[0] for p in pairs])
        tfn = np.concatenate([p[1] for p in pairs])
        # field marker terms are zero-score FILTERS (idf 0): they narrow
        # the doc set through the set algebra without moving BM25 scores
        idf = 0.0 if term.startswith(FIELD_MARKER) else bm25_idf(tp.df, self.reader.n_docs)
        return docids, idf * tfn

    def _eval_exhaustive(self, node: Node) -> setops.ScoredSet:
        if isinstance(node, Materialized):
            return node.ids, node.scores
        if isinstance(node, MultiOr):
            return setops.multi_union([self._leaf_full(t) for t in node.terms])
        if isinstance(node, (Term, Field)):
            return self._leaf_full(node.token)
        left = self._eval_exhaustive(node.left)
        right = self._eval_exhaustive(node.right)
        return _APPLY[node.kind](left, right)

    # -- pruned (block-max) --------------------------------------------
    def _eval_pruned(self, node: Node, k: int):
        if k <= 0:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        leaves = _collect_leaves(node, self.reader, parallel=self.parallel_fetch)
        # per-node, per-block upper bounds + feasibility
        blocks = _block_bounds(node, leaves)
        if not blocks:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        order = sorted(blocks.items(), key=lambda kv: -kv[1])
        buf_ids = []
        buf_scores = []
        top_ids = np.empty(0, dtype=np.uint64)
        top_scores = np.empty(0, dtype=np.float64)
        n_buf = 0
        theta = -np.inf
        for block_id, ub in order:
            if n_buf + len(top_ids) >= k and ub < theta:
                break
            ids, scores = _eval_block(node, leaves, block_id)
            if len(ids):
                buf_ids.append(ids)
                buf_scores.append(scores)
                n_buf += len(ids)
            if n_buf > max(4 * k, 4096) or (theta == -np.inf and n_buf + len(top_ids) >= k):
                top_ids, top_scores = setops.top_k(
                    np.concatenate([top_ids] + buf_ids),
                    np.concatenate([top_scores] + buf_scores),
                    k,
                )
                buf_ids, buf_scores, n_buf = [], [], 0
                if len(top_ids) >= k:
                    theta = top_scores[-1]
        if buf_ids:
            top_ids, top_scores = setops.top_k(
                np.concatenate([top_ids] + buf_ids),
                np.concatenate([top_scores] + buf_scores),
                k,
            )
        return top_ids, top_scores


def _tree_terms(node: Node) -> list[str]:
    """Leaf terms incl. MultiOr members (Materialized carries no terms)."""
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, (Term, Field)):
            out.append(n.token)
        elif isinstance(n, MultiOr):
            out.extend(n.terms)
        elif isinstance(n, Op):
            stack.append(n.right)
            stack.append(n.left)
    return out


def _collect_leaves(
    node: Node, reader: IndexReader, parallel: bool = False
) -> dict[str, dict]:
    """term -> {postings, idf, block_index: {block_id: i}} for all leaves."""
    terms = list(dict.fromkeys(_tree_terms(node)))
    if parallel and len(terms) > 2:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(terms))) as ex:
            tps = list(ex.map(reader.postings, terms))
    else:
        tps = [reader.postings(t) for t in terms]
    out: dict[str, dict] = {}
    for term, tp in zip(terms, tps):
        if tp.df == 0 or term.startswith(FIELD_MARKER):
            idf = 0.0  # field filters score zero (see _leaf_full)
        else:
            idf = bm25_idf(tp.df, reader.n_docs)
        out[term] = {
            "tp": tp,
            "idf": idf,
            "blocks": {int(b): i for i, b in enumerate(tp.block_ids)},
            "reader": reader,
            "cache": {},
        }
    return out


def _block_bounds(node: Node, leaves: dict) -> dict[int, float]:
    """block_id -> score upper bound for the whole tree; infeasible blocks absent."""
    all_blocks = set()
    for leaf in leaves.values():
        all_blocks.update(leaf["blocks"].keys())
    stack = [node]
    while stack:  # materialized (positional) leaves carry their own blocks
        n = stack.pop()
        if isinstance(n, Materialized):
            all_blocks.update(n.block_maxes.keys())
        elif isinstance(n, Op):
            stack.append(n.left)
            stack.append(n.right)

    def bound(n: Node, b: int) -> tuple[bool, float]:
        if isinstance(n, Materialized):
            mx = n.block_maxes.get(b)
            return (False, 0.0) if mx is None else (True, mx)
        if isinstance(n, MultiOr):
            ub = 0.0
            feasible = False
            for t in n.terms:
                leaf = leaves[t]
                i = leaf["blocks"].get(b)
                if i is not None:
                    feasible = True
                    ub += leaf["idf"] * float(leaf["tp"].max_tfns[i])
            return feasible, ub
        if isinstance(n, (Term, Field)):
            leaf = leaves[n.token]
            i = leaf["blocks"].get(b)
            if i is None:
                return False, 0.0
            return True, leaf["idf"] * float(leaf["tp"].max_tfns[i])
        fl, ul = bound(n.left, b)
        fr, ur = bound(n.right, b)
        if n.kind == "and":
            return (fl and fr), (ul + ur)
        if n.kind == "andnot":
            return fl, ul
        # or / xor
        return (fl or fr), (ul + ur)

    out = {}
    for b in all_blocks:
        feasible, ub = bound(node, b)
        if feasible:
            out[b] = ub
    return out


def _leaf_block(leaf: dict, block_id: int) -> setops.ScoredSet:
    i = leaf["blocks"].get(block_id)
    if i is None:
        return setops.empty_set()
    hit = leaf["cache"].get(block_id)
    if hit is not None:
        return hit
    reader: IndexReader = leaf["reader"]
    # (docids, tf_norm) served from the reader's byte-budgeted LRU —
    # per-query cost is one scalar multiply over the cached vector
    docids, tfn = leaf["tp"].scored_block(i, reader.avgdl, reader.params)
    scores = leaf["idf"] * tfn
    res = (docids, scores)
    leaf["cache"][block_id] = res
    return res


def _eval_block(node: Node, leaves: dict, block_id: int) -> setops.ScoredSet:
    if isinstance(node, Materialized):
        sl = node.block_slices.get(block_id)
        if sl is None:
            return setops.empty_set()
        return node.ids[sl[0] : sl[1]], node.scores[sl[0] : sl[1]]
    if isinstance(node, MultiOr):
        return setops.multi_union(
            [_leaf_block(leaves[t], block_id) for t in node.terms]
        )
    if isinstance(node, (Term, Field)):
        return _leaf_block(leaves[node.token], block_id)
    left = _eval_block(node.left, leaves, block_id)
    right = _eval_block(node.right, leaves, block_id)
    return _APPLY[node.kind](left, right)


_APPLY = {
    "and": setops.intersect,
    "or": setops.union,
    "andnot": setops.andnot,
    "xor": setops.xor,
}


class QueryServer:
    """Actor-pool batch query evaluator (SURVEY.md ST6 analog).

    Use as ``queries_ds.map_batches(QueryServer,
    fn_constructor_kwargs={"index_dir": ...}, concurrency=N,
    batch_format="pyarrow")``; each actor opens the index once and
    serves query batches, emitting (query_id, rank, docid, score) rows.
    """

    def __init__(
        self,
        index_dir: str,
        default_k: int = 10,
        mode: str = "auto",
        preload: bool = False,
        shard: tuple[int, int] | None = None,
        decoded_cache_mb: int | None = None,
    ):
        if "," in index_dir:
            # segmented serving: base,delta,... federated per actor
            from oscar_ray.index.segmented import SegmentedReader

            if shard is not None:
                raise ValueError("doc-sharding a segmented federation is unsupported")
            self.engine = QueryEngine(None, reader=SegmentedReader(index_dir.split(",")))
        else:
            # shard=(i, k): doc-sharded serving — this actor holds only
            # its docid-block slice of every posting list (sharded.py)
            self.engine = QueryEngine(
                index_dir,
                reader=IndexReader(
                    index_dir, shard=shard, decoded_cache_mb=decoded_cache_mb
                ),
            )
        if preload:  # mlock analog: resident postings per actor
            self.engine.reader.preload()
        self.default_k = default_k
        self.mode = mode

    def phrase_local_dfs(self, queries: list[str]) -> dict[tuple[str, ...], int]:
        """Local document frequency of every phrase leaf in ``queries``.

        Doc-sharded phrase scoring pre-pass: shards partition the docid
        space, so summing these local dfs across the pool yields the
        exact global phrase df, which the pool pins via
        :meth:`set_phrase_dfs` before evaluation (phrase idf must be
        global for rank-identity). Parse failures contribute nothing
        (the don't-crash contract handles them at eval time)."""
        from oscar_ray.query import positional

        out: dict[tuple[str, ...], int] = {}
        for q in queries:
            try:
                node = parse_query(q)
            except QueryParseError:
                continue
            stack = [node]
            while stack:
                n = stack.pop()
                if isinstance(n, Phrase):
                    key = tuple(n.tokens)
                    if key not in out:
                        ids, _tfs, _dls = positional.phrase_postings(
                            self.engine.reader, list(key)
                        )
                        out[key] = int(len(ids))
                elif isinstance(n, Op):
                    stack.append(n.left)
                    stack.append(n.right)
        return out

    def set_phrase_dfs(self, dfs: dict[tuple[str, ...], int]) -> None:
        self.engine.phrase_df_overrides = dict(dfs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docids, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else None
        for i, (qid, q) in enumerate(
            zip(batch["query_id"].to_pylist(), batch["query"].to_pylist())
        ):
            k = int(ks[i]) if ks else self.default_k
            ids, sc = self.engine.search(q, k=k, mode=self.mode)
            qids.extend([qid] * len(ids))
            ranks.extend(range(1, len(ids) + 1))
            docids.extend(ids.tolist())
            scores.extend(sc.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "docid": pa.array(docids, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )
