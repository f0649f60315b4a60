"""Lazy postings reader over the partitioned index artifacts.

The query-time analog of the reference's mmap'd artifact set opened once
per process (`energize`, ``oscar-cmd/oscarmain.cpp:33-48`` /
``Benchmark.cpp:125-140``, SURVEY.md ST6): an IndexReader is constructed
once per query actor, holds corpus stats + lazily-loaded per-partition
term dictionaries, and fetches a term's posting blocks with parquet
predicate pushdown (the `term` column is sorted within each partition
file, so row-group statistics prune most of the file).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from oscar_ray.index import layout
from oscar_ray.spec.bm25 import BM25Params
from oscar_ray.stages.codecs import decode_positions, decode_postings


class PositionsUnavailable(ValueError):
    """A positional query (phrase/proximity) hit an index built without
    the positions sidecar (IndexBuildConfig.index_positions=False)."""


@dataclass
class TermPostings:
    """All posting blocks of one term (decoded lazily per block).

    Payload bytes may themselves be LAZY: when ``_fetch`` is set, a None
    entry in ``_docs`` is materialized on first decode by fetching just
    the parquet row group holding that posting row — so block-max-pruned
    queries read payload bytes only for the blocks they actually touch
    (O(touched blocks) bytes, not O(df)). Metadata (block ids, counts,
    max_tfn) is always eager — it drives the pruning.
    """

    term: str
    df: int
    cf: int
    block_ids: np.ndarray  # int64, ascending
    doc_counts: np.ndarray  # int64
    max_tfns: np.ndarray  # float64 — block-max metadata for WAND pruning
    _docs: list[bytes | None]
    _tfs: list[bytes | None]
    _dls: list[bytes | None]
    codec: str = "varint"  # docid stream codec (manifest config)
    _fetch: "callable | None" = None  # i -> (docs, tfs, dls) bytes
    _poss: "list[bytes | None] | None" = None  # positions payloads (sidecar)
    _fetch_pos: "callable | None" = None  # i -> poss bytes
    _decoded_cache: "object | None" = None  # reader-owned _DecodedBlockCache
    # segmented serving (index/segmented.py): per-block docid shift added
    # after decode — payload bytes stay segment-relative and untouched
    doc_offsets: "np.ndarray | None" = None

    @property
    def has_positions(self) -> bool:
        return self._poss is not None

    def positions_block(self, i: int, tfs: np.ndarray | None = None) -> np.ndarray:
        """Flat uint64 token positions for block i (lazily hydrated).

        Doc j of the block owns the slice ``[cum_tf[j], cum_tf[j+1])``
        (``tfs`` from :meth:`decode_block`, passed in to avoid a double
        decode), ascending within the doc.
        """
        if self._poss is None:
            raise PositionsUnavailable(
                f"term {self.term!r}: index was built without positions "
                "(IndexBuildConfig.index_positions)"
            )
        if self._poss[i] is None:
            self._poss[i] = self._fetch_pos(i)
        if tfs is None:
            _, tfs, _ = self.decode_block(i)
        return decode_positions(self._poss[i], tfs)

    def decode_block(self, i: int):
        """-> (docids, tfs, doclens) uint64 arrays for block index i.

        Decoded arrays are cached in the owning reader's byte-budgeted
        LRU (see ``_DecodedBlockCache``) so recurring head terms decode
        ONCE per server process, not once per query — serving latency of
        stopword-side AND queries is otherwise decode-bound (measured
        15M postings/s/thread at the 2M-doc tail soak). Callers must
        treat the returned arrays as read-only."""
        cache = self._decoded_cache
        key = (self.term, i) if cache is not None else None
        hit = cache.get(key) if cache is not None else None
        if hit is None:
            hit = self._decode_block_raw(i)
            if cache is not None:
                cache.put(key, hit)
        docids, tfs, dls = hit
        if self.doc_offsets is not None and self.doc_offsets[i]:
            # offset applied on a COPY so the cached array stays segment-
            # relative (federations share one underlying reader cache)
            docids = docids + np.uint64(self.doc_offsets[i])
        return docids, tfs, dls

    def _decode_block_raw(self, i: int):
        """Decode block i without touching the LRU (callers cache what
        they actually serve from: the triple, or the scored pair)."""
        if self._docs[i] is None:
            self._docs[i], self._tfs[i], self._dls[i] = self._fetch(i)
        return decode_postings(
            self._docs[i],
            self._tfs[i],
            self._dls[i],
            count=int(self.doc_counts[i]),
            codec=self.codec,
        )

    def scored_block(self, i: int, avgdl: float, params: BM25Params):
        """-> (docids uint64, tf_norm float64) for block i — the BM25
        serving unit, LRU-cached at 16 bytes/posting.

        tf_norm depends only on (tfs, doclens, avgdl, params) — all
        query-independent — so per-query scoring is one scalar multiply
        (idf * vec). Caching (docids, tfn) INSTEAD of the decoded
        (docids, tfs, dls) triple halves the per-posting footprint, i.e.
        doubles how many head blocks fit the byte budget — miss rate,
        not decode speed, dominates stopword-AND latency (tail soak).
        The triple entry still exists for positional/decode_all callers;
        a scored miss reuses it when present. avgdl/params are fixed per
        reader, which owns the cache, so the key needs no param part."""
        from oscar_ray.spec.bm25 import bm25_tf_norm

        cache = self._decoded_cache
        key = (self.term, i, "sc") if cache is not None else None
        hit = cache.get(key) if cache is not None else None
        if hit is None:
            triple = cache.get((self.term, i)) if cache is not None else None
            if triple is None:
                triple = self._decode_block_raw(i)
            docids, tfs, dls = triple
            hit = (docids, bm25_tf_norm(tfs, dls, avgdl, params))
            if cache is not None:
                cache.put(key, hit)
        docids, tfn = hit
        if self.doc_offsets is not None and self.doc_offsets[i]:
            docids = docids + np.uint64(self.doc_offsets[i])
        return docids, tfn

    def decode_all(self):
        """-> (docids, tfs, doclens) for the whole term, concatenated."""
        if not self._docs:
            z = np.empty(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        parts = [self.decode_block(i) for i in range(len(self._docs))]
        return tuple(np.concatenate([p[j] for p in parts]) for j in range(3))


import pyarrow as pa


def resolve_payload_refs(t: pa.Table) -> pa.Table:
    """Materialize payload-dedup indirections of a FULL partition table
    (build.py payload_dedup / the reference's setDeduplication analog):
    rows with ``payload_row >= 0`` take their (docs, tfs, dls) bytes from
    that canonical row index. Returns the table without ``payload_row``
    (same schema as a non-deduped file). No-op when the column is absent."""
    if "payload_row" not in t.column_names:
        return t
    pr = t["payload_row"].to_numpy()
    need = np.flatnonzero(pr >= 0)
    if len(need):
        docs = t["docs"].to_pylist()
        tfs = t["tfs"].to_pylist()
        dls = t["dls"].to_pylist()
        for i in need.tolist():
            j = int(pr[i])
            docs[i], tfs[i], dls[i] = docs[j], tfs[j], dls[j]
        for name, vals in (("docs", docs), ("tfs", tfs), ("dls", dls)):
            t = t.set_column(
                t.schema.get_field_index(name), name, pa.array(vals, type=pa.binary())
            )
    return t.drop_columns(["payload_row"])


_EMPTY_TBL = pa.table(
    {
        "term": pa.array([], type=pa.string()),
        "block_id": pa.array([], type=pa.int64()),
        "doc_count": pa.array([], type=pa.int64()),
        "sum_tf": pa.array([], type=pa.int64()),
        "max_tfn": pa.array([], type=pa.float64()),
        "docs": pa.array([], type=pa.binary()),
        "tfs": pa.array([], type=pa.binary()),
        "dls": pa.array([], type=pa.binary()),
    }
)

_EMPTY = TermPostings(
    term="",
    df=0,
    cf=0,
    block_ids=np.empty(0, dtype=np.int64),
    doc_counts=np.empty(0, dtype=np.int64),
    max_tfns=np.empty(0, dtype=np.float64),
    _docs=[],
    _tfs=[],
    _dls=[],
)


_QGRAM_BUCKETS = 4096  # hashed-bigram bucket space for the count filter


def _bigram_buckets(m: np.ndarray) -> np.ndarray:
    """Hashed bigram bucket ids for each adjacent codepoint pair of a
    (n, w) uint32 matrix — collisions only merge buckets, which can only
    RAISE the shared-count score, so the filter stays lossless."""
    a = m[:, :-1].astype(np.uint64)
    b = m[:, 1:].astype(np.uint64)
    return ((a * np.uint64(1_000_003) + b) % np.uint64(_QGRAM_BUCKETS)).astype(
        np.int64
    )


def _levenshtein_band(
    cached: tuple[np.ndarray, np.ndarray, np.ndarray],
    q_codes: np.ndarray,
    qlen: int,
    max_dist: int,
    cand: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(terms, distances) within Levenshtein ``max_dist`` of the query,
    from a cached (terms, codepoint_matrix, lens) triple (see
    _fuzzy_matrix). ``cand`` optionally restricts the scan to a subset of
    rows (the q-gram shortlist) — semantics are unchanged, only fewer
    rows enter the DP.

    Classic unit-cost DP (insert/delete/substitute — the same function
    DuckDB's ``levenshtein`` computes, which the SQL oracle relies on),
    advanced column-by-column over a (n_candidates, qlen+1) matrix.
    """
    terms, m_full, lens_full = cached
    if cand is not None:
        terms = terms[cand]
        m_full = m_full[cand]
        lens_full = lens_full[cand]
    width = qlen + max_dist  # longer terms can never be within max_dist
    band = (lens_full >= max(qlen - max_dist, 0)) & (lens_full <= width)
    idx = np.flatnonzero(band)
    if not len(idx):
        return terms[:0], np.empty(0, dtype=np.int32)
    m = m_full[idx, : min(width, m_full.shape[1])]
    lens = lens_full[idx]
    n_c = len(idx)
    dp = np.broadcast_to(np.arange(qlen + 1, dtype=np.int32), (n_c, qlen + 1)).copy()
    result = np.full(n_c, qlen, dtype=np.int32)  # empty candidate -> qlen
    max_len = min(int(lens.max()), m.shape[1])
    for j in range(max_len):
        active = lens > j
        cj = m[:, j]
        new = np.empty_like(dp)
        new[:, 0] = j + 1
        for i in range(1, qlen + 1):
            sub = dp[:, i - 1] + (cj != q_codes[i - 1])
            new[:, i] = np.minimum(np.minimum(dp[:, i] + 1, new[:, i - 1] + 1), sub)
        dp = np.where(active[:, None], new, dp)
        done = lens == j + 1
        if done.any():
            result[done] = dp[done, qlen]
    within = result <= max_dist
    hits = idx[within]
    return terms[hits], result[within]


class _PartDict:
    """Sorted-array term dictionary for one partition.

    The scale-shape replacement for a Python dict (SCALE.md query-serving
    note): three parallel arrays straight off the parquet columns — no
    per-term Python objects hashed at load, ~3x less heap at 10^6-term
    partitions, O(log n) lookup via searchsorted (dict files are written
    sorted by term). Supports the mapping surface the reader uses:
    ``get``, ``in``, iteration (ascending), ``len``.
    """

    __slots__ = ("terms", "df", "cf")

    def __init__(self, terms: np.ndarray, df: np.ndarray, cf: np.ndarray):
        self.terms = terms  # object dtype, ascending
        self.df = df
        self.cf = cf

    def get(self, term: str, default=(0, 0)):
        i = int(np.searchsorted(self.terms, term))
        if i < len(self.terms) and self.terms[i] == term:
            return (int(self.df[i]), int(self.cf[i]))
        return default

    def __contains__(self, term: str) -> bool:
        return self.get(term, None) is not None

    def __iter__(self):
        return iter(self.terms.tolist())

    def __len__(self) -> int:
        return len(self.terms)

    def keys(self):
        return self.terms

    def items(self):
        for i, t in enumerate(self.terms.tolist()):
            yield t, (int(self.df[i]), int(self.cf[i]))


class _DecodedBlockCache:
    """Byte-budgeted LRU over decoded posting blocks, shared by every
    TermPostings a reader hands out.

    Serving cost of frequent-term queries is decode-bound (varint+delta
    reconstruction, ~15M postings/s/thread measured); under a Zipf query
    mix the same head blocks decode over and over. Budget default 256 MB
    (env ``OSCAR_RAY_DECODED_CACHE_MB``) — 24 bytes per cached posting,
    so the budget caps resident decoded state regardless of corpus size;
    preload() keeps payload BYTES for everything, this keeps ARRAYS for
    the hot set only."""

    def __init__(self, max_bytes: int | None = None):
        if max_bytes is None:
            max_bytes = int(os.environ.get("OSCAR_RAY_DECODED_CACHE_MB", "256")) << 20
        self.max_bytes = max_bytes
        self.bytes = 0
        self._d: dict[tuple, tuple] = {}
        # engine parallel_fetch decodes blocks from a thread pool: the
        # pop/reinsert recency touch races put()'s eviction without this
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            hit = self._d.pop(key, None)
            if hit is not None:
                self._d[key] = hit  # LRU recency touch
            return hit

    def put(self, key, val) -> None:
        nb = sum(a.nbytes for a in val)
        if nb > self.max_bytes:
            return
        with self._lock:
            old = self._d.pop(key, None)
            if old is not None:
                self.bytes -= sum(a.nbytes for a in old)
            while self.bytes + nb > self.max_bytes and self._d:
                # dicts iterate in insertion order
                ev = self._d.pop(next(iter(self._d)))
                self.bytes -= sum(a.nbytes for a in ev)
            self._d[key] = val
            self.bytes += nb

    def clear(self) -> None:
        with self._lock:
            self._d.clear()
            self.bytes = 0


class IndexReader:
    """Open-once, read-many access to one index directory.

    ``block_range=(lo, hi)`` restricts the reader to posting rows whose
    ``block_id`` falls in the half-open range — the doc-sharded serving
    unit (query/sharded.py): an actor holding one docid-block slice of
    EVERY posting list. Corpus stats (n_docs, avgdl) and the term
    dictionaries (df, cf) stay GLOBAL, so per-document BM25 scores are
    bit-identical to an unsharded reader's; only which documents the
    reader can see changes. ``shard=(i, k)`` computes an even
    ``block_range`` split of the corpus's block space for shard i of k.
    """

    def __init__(
        self,
        index_dir: str,
        block_range: tuple[int, int] | None = None,
        shard: tuple[int, int] | None = None,
        decoded_cache_mb: int | None = None,
    ):
        self.index_dir = index_dir
        with open(layout.manifest_path(index_dir)) as f:
            self.manifest = json.load(f)
        if not self.manifest.get("complete"):
            raise ValueError(f"index at {index_dir} is incomplete")
        cfg = self.manifest["config"]
        self.num_partitions = cfg["num_partitions"]
        self.block_span_bits = cfg["block_span_bits"]
        self.docid_codec = cfg.get("docid_codec", "varint")
        self.params = BM25Params(k1=cfg["k1"], b=cfg["b"])
        stats = self.manifest["stats"]
        self.n_docs = stats["n_docs"]
        self.avgdl = max(stats["avgdl"], 1e-9)
        self.has_positions = bool(cfg.get("index_positions", False))
        if shard is not None:
            if block_range is not None:
                raise ValueError("pass block_range OR shard, not both")
            i, k = shard
            if not (0 <= i < k):
                raise ValueError(f"shard index {i} out of range for {k} shards")
            # split the REAL block space: docids can be sparse (URL-dedup
            # drops docs but ids keep their dense assignment positions),
            # so max_docid — not n_docs — bounds the last block
            max_docid = stats.get("max_docid", max(self.n_docs, 1) - 1)
            n_blocks = (max_docid >> self.block_span_bits) + 1
            block_range = (i * n_blocks // k, (i + 1) * n_blocks // k)
        self.block_range = block_range
        self._dicts: dict[int, dict[str, tuple[int, int]]] = {}
        self._postings_cache: dict[str, TermPostings] = {}
        self._files: dict[int, pq.ParquetFile] = {}
        self._rg_stats: dict[int, list[tuple[str, str]]] = {}
        self._rg_offsets: dict[int, list[int]] = {}
        self._payload_groups: dict[tuple[int, int], pa.Table] = {}
        self._pos_groups: dict[tuple[int, int], pa.Table] = {}
        self._pa_terms: dict[int, "pa.Array"] = {}  # regex-scan term arrays
        self._fuzzy_mats: dict[int, tuple] = {}  # fuzzy-scan codepoint matrices
        self._qgram_csrs: dict[int, tuple] = {}  # fuzzy-scan q-gram filters
        # hot decoded blocks (LRU). decoded_cache_mb overrides the 256 MB
        # env default — a serving node sizes this to RAM/pool_width (the
        # 50M/100M decades thrash the default: warm QPS ~= cold QPS
        # because the queried terms' decoded working set exceeds it)
        self._decoded_cache = _DecodedBlockCache(
            max_bytes=None if decoded_cache_mb is None else decoded_cache_mb << 20
        )

    # -- dictionary ---------------------------------------------------------

    def _part_dict(self, part: int) -> _PartDict:
        if part not in self._dicts:
            path = layout.dict_path(self.index_dir, part)
            if os.path.exists(path):
                t = pq.read_table(path)
                self._dicts[part] = _PartDict(
                    np.asarray(t["term"].to_pylist(), dtype=object),
                    t["df"].to_numpy(),
                    t["cf"].to_numpy(),
                )
            else:
                self._dicts[part] = _PartDict(
                    np.empty(0, dtype=object),
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64),
                )
        return self._dicts[part]

    def term_stats(self, term: str) -> tuple[int, int]:
        """(df, cf) of a term; (0, 0) if absent."""
        part = layout.term_partition(term, self.num_partitions)
        return self._part_dict(part).get(term, (0, 0))

    def terms_with_prefix(self, prefix: str, limit: int | None = None) -> list[str]:
        """All dictionary terms starting with ``prefix``, ascending.

        The flat-trie range-scan analog (``HashBasedFlatTrie`` /
        sorted-term layout, SURVEY.md §1.3): per-partition sorted term
        arrays + binary search — terms hash-scatter across partitions, so
        every partition contributes its own (tiny) range.
        """
        out: list[str] = []
        for part in range(self.num_partitions):
            arr = self._part_sorted_terms(part)
            if len(arr) == 0:
                continue
            lo = np.searchsorted(arr, prefix)
            # upper bound uses the MAX code point: '￿' would exclude
            # terms whose next char is a supplementary-plane codepoint
            # (e.g. CJK Ext-B, which the tokenizer does produce)
            hi = np.searchsorted(arr, prefix + chr(0x10FFFF))
            out.extend(arr[lo:hi].tolist())
        out.sort()
        return out[:limit] if limit is not None else out

    def _part_sorted_terms(self, part: int) -> np.ndarray:
        # the _PartDict's term array IS the sorted array — no copy
        return self._part_dict(part).terms

    def terms_with_regex(self, pattern: str, limit: int | None = None) -> list[str]:
        """All text-vocabulary terms FULLY matching the RE2 pattern,
        ascending (regex-query expansion, Lucene RegexpQuery analog —
        and the same semantics as DuckDB's ``regexp_full_match``, which
        the SQL oracle uses).

        One vectorized RE2 pass per partition dictionary (arrow
        ``match_substring_regex`` on the cached term array, anchored);
        marker namespaces excluded. An RE2-invalid pattern (python-re
        validated constructs RE2 lacks, e.g. backrefs) matches nothing.
        """
        import pyarrow as pa_
        import pyarrow.compute as pc_

        anchored = f"^(?:{pattern})$"
        out: list[str] = []
        for part in range(self.num_partitions):
            arr = self._part_sorted_terms(part)
            lo = int(np.searchsorted(arr, "\x0f"))  # skip marker namespaces
            if lo >= len(arr):
                continue
            pa_arr = self._pa_terms.get(part)
            if pa_arr is None:
                pa_arr = pa_.array(arr[lo:], type=pa_.string())
                self._pa_terms[part] = pa_arr
            try:
                mask = pc_.match_substring_regex(pa_arr, pattern=anchored)
            except pa_.lib.ArrowInvalid:
                return []
            hits = arr[lo:][mask.to_numpy(zero_copy_only=False)]
            out.extend(hits.tolist())
        out.sort()
        return out[:limit] if limit is not None else out

    def terms_with_edit_distance(
        self, term: str, max_dist: int, limit: int | None = None
    ) -> list[str]:
        """All text-vocabulary terms within Levenshtein distance
        ``max_dist`` of ``term``, ascending (fuzzy-query expansion).

        Vectorized Wagner-Fischer across ALL candidates of a partition at
        once: candidates are length-band filtered (| len - qlen | <=
        max_dist), packed into one fixed-width codepoint matrix, and the
        DP advances one candidate-character COLUMN per step with numpy
        row ops — O(maxlen * qlen) vector passes over the band, never a
        per-term python loop. Marker namespaces (field/suffix terms) are
        excluded; at web scale each partition's dictionary is
        independent, so this scan parallelizes exactly like the prefix
        scan (SURVEY.md trie-descent analog)."""
        q = np.frombuffer(np.array([term], dtype=f"U{max(len(term), 1)}"), dtype=np.uint32)
        qlen = len(term)
        out: list[str] = []
        for part in range(self.num_partitions):
            cached = self._fuzzy_matrix(part)
            if cached is None:
                continue
            cand = self._fuzzy_shortlist(part, q, qlen, max_dist)
            hits, _ = _levenshtein_band(cached, q, qlen, max_dist, cand=cand)
            if len(hits):
                out.extend(hits.tolist())
        out.sort()
        return out[:limit] if limit is not None else out

    def _fuzzy_matrix(self, part: int):
        """(terms, codepoint matrix, lens) for one partition's text
        vocabulary, built once per reader (the per-query 'U'-cast was the
        fuzzy scan's dominant cost): marker namespaces sliced off, the
        object array cast to one fixed-width uint32 matrix (~4B x maxlen
        per term, fuzzy-only, lazy)."""
        hit = self._fuzzy_mats.get(part)
        if hit is not None:
            return hit if hit != () else None
        arr = self._part_sorted_terms(part)
        lo = int(np.searchsorted(arr, "\x0f"))  # skip marker namespaces
        terms = arr[lo:]
        if not len(terms):
            self._fuzzy_mats[part] = ()
            return None
        mat_u = np.asarray(terms, dtype=np.str_)  # auto width = longest term
        w = mat_u.dtype.itemsize // 4
        m = np.frombuffer(mat_u, dtype=np.uint32).reshape(len(terms), w)
        lens = (m != 0).sum(axis=1)  # tokenizer terms never contain NUL
        cached = (terms, m, lens)
        self._fuzzy_mats[part] = cached
        return cached

    def _qgram_csr(self, part: int):
        """Bucketed bigram -> term-row CSR over one partition's text
        vocabulary (lazy, cached — built from the fuzzy codepoint matrix).
        Powers the count filter: a candidate within edit distance d must
        share >= max(len_q, len_c) - 1 - 2d multiset bigrams with the
        query (each edit disturbs <= 2 bigrams; Gravano et al. 2001
        q-gram bound with q=2). Our score overcounts (multiplicity
        product + hash-bucket collisions), so thresholding on it never
        drops a true match."""
        hit = self._qgram_csrs.get(part)
        if hit is not None:
            return hit if hit != () else None
        cached = self._fuzzy_matrix(part)
        if cached is None:
            self._qgram_csrs[part] = ()
            return None
        _terms, m, lens = cached
        codes = _bigram_buckets(m)
        valid = np.arange(m.shape[1] - 1)[None, :] < (lens - 1)[:, None]
        flat = codes[valid]
        rows = np.broadcast_to(
            np.arange(m.shape[0], dtype=np.int32)[:, None], valid.shape
        )[valid]
        order = np.argsort(flat, kind="stable")
        counts = np.bincount(flat, minlength=_QGRAM_BUCKETS)
        starts = np.zeros(_QGRAM_BUCKETS + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        csr = (starts, rows[order])
        self._qgram_csrs[part] = csr
        return csr

    def _fuzzy_shortlist(
        self, part: int, q_codes: np.ndarray, qlen: int, max_dist: int
    ) -> np.ndarray | None:
        """Candidate row subset for one partition's fuzzy scan, or None
        for 'all rows' (filter not applicable)."""
        if qlen < 2:
            return None  # no query bigrams to count
        csr = self._qgram_csr(part)
        if csr is None:
            return None
        starts, term_ids = csr
        cached = self._fuzzy_matrix(part)
        _terms, _m, lens = cached
        qcodes = _bigram_buckets(q_codes[None, :])[0]
        pieces = [term_ids[starts[c] : starts[c + 1]] for c in qcodes]
        score = np.bincount(
            np.concatenate(pieces) if pieces else np.empty(0, dtype=np.int32),
            minlength=len(lens),
        )
        thresh = np.maximum(np.maximum(lens, qlen) - 1 - 2 * max_dist, 0)
        return np.flatnonzero(score >= thresh)

    def complete(self, prefix: str, k: int | None = 10) -> list[tuple[str, int]]:
        """Top-k completion suggestions for ``prefix``: (term, df) ranked
        df DESC, term ASC — the term-level LiveCompletion surface (the
        reference serves ranked completions per keystroke,
        oscar-cmd/LiveCompleter.cpp; its completion strings are built at
        index time, SURVEY.md §2 S7).

        Scale shape: each partition contributes one binary-searched range
        of its sorted dictionary, locally pruned to k by (df desc, term
        asc) before the merge — driver state is at most k × partitions
        pairs regardless of vocabulary size.
        """
        rows: list[tuple[str, int]] = []
        for part in range(self.num_partitions):
            d = self._part_dict(part)
            arr = d.terms
            if not len(arr):
                continue
            lo = int(np.searchsorted(arr, prefix))
            # never descend into marker namespaces (field/suffix terms)
            lo = max(lo, int(np.searchsorted(arr, "\x0f")))
            hi = int(np.searchsorted(arr, prefix + chr(0x10FFFF)))
            if hi <= lo:
                continue
            terms, dfs = arr[lo:hi], d.df[lo:hi]
            if k is not None and len(terms) > k:
                top = np.lexsort((terms, -dfs))[:k]  # local prune
                terms, dfs = terms[top], dfs[top]
            rows.extend(zip(terms.tolist(), (int(x) for x in dfs)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k] if k is not None else rows

    def suggest(
        self, term: str, max_dist: int = 2, k: int | None = 10
    ) -> list[tuple[str, int, int]]:
        """Did-you-mean suggestions: (term, dist, df) for vocabulary terms
        within Levenshtein ``max_dist``, ranked dist ASC, df DESC, term
        ASC (spell-correction over the same banded-DP expansion the fuzzy
        query operator uses; DuckDB ``levenshtein`` is the oracle).

        Scale shape: one vectorized DP per partition dictionary (the
        cached codepoint matrix), candidates merged at k × partitions
        driver cost.
        """
        q = np.frombuffer(
            np.array([term], dtype=f"U{max(len(term), 1)}"), dtype=np.uint32
        )
        qlen = len(term)
        rows: list[tuple[str, int, int]] = []
        for part in range(self.num_partitions):
            cached = self._fuzzy_matrix(part)
            if cached is None:
                continue
            cand = self._fuzzy_shortlist(part, q, qlen, max_dist)
            hits, dists = _levenshtein_band(cached, q, qlen, max_dist, cand=cand)
            if not len(hits):
                continue
            d = self._part_dict(part)
            dfs = d.df[np.searchsorted(d.terms, hits)]  # hits are present
            if k is not None and len(hits) > k:
                top = np.lexsort((hits, -dfs, dists))[:k]  # local prune
                hits, dists, dfs = hits[top], dists[top], dfs[top]
            rows.extend(
                zip(hits.tolist(), (int(x) for x in dists), (int(x) for x in dfs))
            )
        rows.sort(key=lambda r: (r[1], -r[2], r[0]))
        return rows[:k] if k is not None else rows

    def vocabulary_size(self) -> int:
        return sum(
            m["terms"] for m in self.manifest["partitions"] if m is not None
        )

    # -- postings -----------------------------------------------------------

    def postings(self, term: str) -> TermPostings:
        """Fetch a term's posting METADATA eagerly (predicate-pushdown
        parquet read of the non-payload columns); payload bytes hydrate
        lazily per row group on first block decode — a pruned query's
        byte cost is O(touched blocks), not O(df)."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            return hit
        part = layout.term_partition(term, self.num_partitions)
        df, cf = self._part_dict(part).get(term, (0, 0))
        if df == 0:
            tp = _EMPTY
        else:
            t, global_idx, payload_rows = self._read_term_meta(part, term)
            n = t.num_rows

            def fetch(i: int, _part=part, _gi=global_idx, _pr=payload_rows):
                # payload-dedup indirection: canonical row holds the bytes
                idx = int(_gi[i])
                if _pr is not None and _pr[i] >= 0:
                    idx = int(_pr[i])
                return self._payload_row(_part, idx)

            def fetch_pos(i: int, _part=part, _gi=global_idx):
                return self._positions_row(_part, int(_gi[i]))

            tp = TermPostings(
                term=term,
                df=int(df),
                cf=int(cf),
                block_ids=t["block_id"].to_numpy(),
                doc_counts=t["doc_count"].to_numpy(),
                max_tfns=t["max_tfn"].to_numpy(),
                _docs=[None] * n,
                _tfs=[None] * n,
                _dls=[None] * n,
                codec=self.docid_codec,
                _fetch=fetch,
                _poss=[None] * n if self.has_positions else None,
                _fetch_pos=fetch_pos if self.has_positions else None,
                _decoded_cache=self._decoded_cache,
            )
        if len(self._postings_cache) > 4096 and not getattr(self, "_cache_pinned", False):
            self._postings_cache.clear()
        self._postings_cache[term] = tp
        return tp

    def _payload_row(self, part: int, idx: int) -> tuple[bytes, bytes, bytes]:
        """Payload bytes of global posting row ``idx`` via a cached
        row-group read (groups are uniform-sized except the last).
        Reopens the handle if drop_caches() evicted it after this
        TermPostings was fetched (stale-closure safety)."""
        f = self._ensure_part_open(part)
        rg0 = f.metadata.row_group(0).num_rows
        g = idx // rg0
        key = (part, g)
        gt = self._payload_groups.get(key)
        if gt is None:
            if len(self._payload_groups) >= 32:
                try:  # benign race under threaded block eval: skip evict
                    self._payload_groups.pop(next(iter(self._payload_groups)))
                except (RuntimeError, KeyError, StopIteration):
                    pass
            gt = f.read_row_groups([g], columns=["docs", "tfs", "dls"], use_threads=False)
            self._payload_groups[key] = gt
        r = idx - g * rg0
        return gt["docs"][r].as_py(), gt["tfs"][r].as_py(), gt["dls"][r].as_py()

    def _positions_row(self, part: int, idx: int) -> bytes:
        """Positions payload of global posting row ``idx`` — the sidecar
        twin of :meth:`_payload_row`, with its OWN row-group cache so
        positional queries never double the plain payload cache's heap."""
        f = self._ensure_part_open(part)
        rg0 = f.metadata.row_group(0).num_rows
        g = idx // rg0
        key = (part, g)
        gt = self._pos_groups.get(key)
        if gt is None:
            if len(self._pos_groups) >= 32:
                try:  # benign race under threaded block eval: skip evict
                    self._pos_groups.pop(next(iter(self._pos_groups)))
                except (RuntimeError, KeyError, StopIteration):
                    pass
            gt = f.read_row_groups([g], columns=["poss"], use_threads=False)
            self._pos_groups[key] = gt
        return gt["poss"][idx - g * rg0].as_py()

    def preload(self) -> int:
        """Load every term's postings into the in-memory cache (the
        reference's `mlock`/`mload` work items,
        ``oscar-cmd/Workfunctions.cpp:781-820``): read each partition file
        once, group rows by term, cache TermPostings (payload bytes held,
        blocks still decoded lazily). Returns number of terms cached.
        Memory = compressed index size — only for indices that fit."""
        n = 0
        for part in range(self.num_partitions):
            path = layout.postings_path(self.index_dir, part)
            if not os.path.exists(path):
                continue
            t = resolve_payload_refs(pq.ParquetFile(path).read())
            if self.block_range is not None:
                # payload refs resolved FIRST (a row's canonical payload
                # row can live outside the shard's block range); steady-
                # state heap is store_bytes / n_shards, the full table is
                # transient per partition file
                lo, hi = self.block_range
                t = t.filter(
                    pc.and_(
                        pc.greater_equal(t["block_id"], lo),
                        pc.less(t["block_id"], hi),
                    )
                )
            terms = t["term"].to_pylist()
            if not terms:
                continue
            has_poss = "poss" in t.column_names
            d = self._part_dict(part)
            start = 0
            for i in range(1, len(terms) + 1):
                if i == len(terms) or terms[i] != terms[start]:
                    term = terms[start]
                    sl = t.slice(start, i - start)
                    df, cf = d.get(term, (0, 0))
                    self._postings_cache[term] = TermPostings(
                        term=term,
                        df=int(df),
                        cf=int(cf),
                        block_ids=sl["block_id"].to_numpy(),
                        doc_counts=sl["doc_count"].to_numpy(),
                        max_tfns=sl["max_tfn"].to_numpy(),
                        _docs=sl["docs"].to_pylist(),
                        _tfs=sl["tfs"].to_pylist(),
                        _dls=sl["dls"].to_pylist(),
                        codec=self.docid_codec,
                        _poss=sl["poss"].to_pylist() if has_poss else None,
                        # decoded-block LRU applies to preloaded postings
                        # too: payload BYTES are pinned here, but recurring
                        # head-term blocks should still decode once per
                        # process, not once per query
                        _decoded_cache=self._decoded_cache,
                    )
                    n += 1
                    start = i
        # preloaded caches must not be evicted by the LRU-ish clear
        self._cache_pinned = True
        return n

    def drop_caches(self, page_cache: bool = False) -> int:
        """The reference's `mdrop` work item
        (``oscar-cmd/Workfunctions.cpp:781-820``): evict this reader's
        in-process state (postings cache, dictionaries, file handles,
        row-group stats) so the next query measures a true cold path
        without a process restart. ``page_cache=True`` additionally asks
        the kernel to drop the OS page cache for every index artifact
        via posix_fadvise(DONTNEED) — the drop_caches-protocol analog
        (``Benchmark.cpp:117-123``) that needs no root. Returns the
        number of files fadvise'd."""
        self._postings_cache.clear()
        self._dicts.clear()
        self._files.clear()
        self._rg_stats.clear()
        self._rg_offsets.clear()
        self._payload_groups.clear()
        self._pos_groups.clear()
        self._pa_terms.clear()
        self._fuzzy_mats.clear()
        self._qgram_csrs.clear()
        self._decoded_cache.clear()  # cold must mean decode-cold too
        self._cache_pinned = False
        n = 0
        if page_cache and hasattr(os, "posix_fadvise"):
            for root, _dirs, files in os.walk(self.index_dir):
                for fn in files:
                    if fn.endswith(".parquet"):
                        try:
                            fd = os.open(os.path.join(root, fn), os.O_RDONLY)
                            try:
                                os.posix_fadvise(
                                    fd, 0, 0, os.POSIX_FADV_DONTNEED
                                )
                                n += 1
                            finally:
                                os.close(fd)
                        except OSError:
                            pass
        return n

    def _ensure_part_open(self, part: int) -> pq.ParquetFile:
        """Open-once partition handle + row-group stats/offsets."""
        f = self._files.get(part)
        if f is None:
            f = pq.ParquetFile(layout.postings_path(self.index_dir, part))
            stats = []
            offsets = [0]
            md = f.metadata
            ci = f.schema_arrow.get_field_index("term")
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                stats.append((s.min, s.max))
                offsets.append(offsets[-1] + md.row_group(rg).num_rows)
            # stats before files: concurrent leaf fetches (thread pool in
            # _collect_leaves) key off _files and then read _rg_stats
            self._rg_stats[part] = stats
            self._rg_offsets[part] = offsets
            self._files[part] = f
        return f

    def _read_term_meta(self, part: int, term: str):
        """Read one term's posting METADATA rows (payload columns are
        NOT read — they hydrate lazily via :meth:`_payload_row`):
        open-once file handle + manual row-group pruning on the sorted
        `term` column's min/max statistics (the mmap-once ST6 analog).

        -> (meta_table, global_row_indices int64, payload_rows | None)
        """
        f = self._ensure_part_open(part)
        groups = [
            rg
            for rg, (lo, hi) in enumerate(self._rg_stats[part])
            if lo <= term <= hi
        ]
        empty_idx = np.empty(0, dtype=np.int64)
        if not groups:
            return _EMPTY_TBL, empty_idx, None
        has_refs = "payload_row" in f.schema_arrow.names
        # no sum_tf: the query path never reads it (cf comes from the
        # dictionary) — skip the column decode in the hot serving path
        cols = ["term", "block_id", "doc_count", "max_tfn"]
        if has_refs:
            cols.append("payload_row")
        t = f.read_row_groups(groups, columns=cols, use_threads=False)
        keep = pc.equal(t["term"], term)
        if self.block_range is not None:
            lo, hi = self.block_range
            keep = pc.and_(
                keep,
                pc.and_(
                    pc.greater_equal(t["block_id"], lo), pc.less(t["block_id"], hi)
                ),
            )
        # global row index of each kept row: per selected group, the
        # group's start offset + local position
        offsets = self._rg_offsets[part]
        base = np.concatenate(
            [
                np.arange(offsets[g], offsets[g + 1], dtype=np.int64)
                for g in groups
            ]
        )
        mask = keep.to_numpy(zero_copy_only=False)
        t = t.filter(keep)
        global_idx = base[mask]
        payload_rows = t["payload_row"].to_numpy() if has_refs else None
        if has_refs:
            t = t.drop_columns(["payload_row"])
        return t, global_idx, payload_rows
