"""Segmented (federated) serving: query several built indexes as one.

The Lucene-segment-model step the incremental loop needs: a base index
plus freshly built delta indexes serve TOGETHER, rank-identical to the
merged index, without paying the merge — merge (index/merge.py) becomes
a background compaction, exactly the reference's two-completer setup
(``oscar-cmd`` loads multiple completers side by side;
``oscarcreate.cpp:82-116`` store-dir/search-dir reuse).

Docid spaces are disjoint by construction: segment k's docids shift by
the same span-aligned cumulative offset merge_indexes computes, so a
federated query and a merged-index query return IDENTICAL docids.

CAVEAT (disclosed, matches the merge default): federation applies NO
cross-segment URL dedup — a document re-crawled into a delta segment
surfaces TWICE until compaction (``merge_indexes`` keep_first, or the
maintain-loop ``keep_last`` replacement) runs. Same behavior as serving
two reference completers side by side.
Global BM25 statistics (n_docs, avgdl, df, cf) are summed across
segments; per-doc scores are computed by the engine from raw (tf, dl)
with the global stats, so scores match the merged index bit-for-bit.
Stored block-max bounds were computed with each SEGMENT's avgdl — they
are rescaled by ``max(1, global_avgdl / segment_avgdl)`` (tf-norm is
increasing in avgdl, and the tf-norm ratio is bounded by the avgdl
ratio), keeping block-max pruning admissible at a small looseness cost.
"""

from __future__ import annotations

import numpy as np

from oscar_ray.index.reader import IndexReader, TermPostings, _EMPTY


class SegmentedReader:
    """Read-side federation over N IndexReaders with disjoint docids.

    Implements the slice of the IndexReader interface the query engine
    uses (postings / term_stats / dictionary scans / corpus stats);
    positional queries work iff EVERY segment carries the sidecar.
    """

    def __init__(self, index_dirs: list[str], offsets: list[int] | None = None):
        """``offsets=None`` (default) assigns span-aligned cumulative
        docid offsets (merge_indexes' layout — segments built from
        independent corpora). Pass explicit offsets (e.g. all zero) when
        the segments were built with ``id_column`` over ALREADY-disjoint
        global id ranges; ranges must not share a posting block
        (split at a multiple of 2^block_span_bits), which is verified
        per term at fetch time."""
        if not index_dirs:
            raise ValueError("need at least one index dir")
        self.readers = [IndexReader(d) for d in index_dirs]
        r0 = self.readers[0]
        for r in self.readers[1:]:
            for key in ("block_span_bits", "docid_codec"):
                if getattr(r, key) != getattr(r0, key):
                    raise ValueError(
                        f"segment config mismatch on {key}: "
                        f"{getattr(r, key)} != {getattr(r0, key)}"
                    )
            if r.params != r0.params:
                raise ValueError("segment BM25 params mismatch")
        self.block_span_bits = r0.block_span_bits
        self.docid_codec = r0.docid_codec
        self.params = r0.params
        self.has_positions = all(r.has_positions for r in self.readers)
        span = 1 << self.block_span_bits
        if offsets is not None:
            if len(offsets) != len(self.readers):
                raise ValueError("one offset per segment required")
            if any(o % span for o in offsets):
                raise ValueError("offsets must be multiples of the block span")
            self.offsets = [int(o) for o in offsets]
        else:
            # span-aligned cumulative offsets == merge_indexes' docid layout
            self.offsets = []
            base = 0
            for r in self.readers:
                self.offsets.append(base)
                # stats.max_docid is authoritative (merged segments' shard
                # entries carry PRE-offset ids); fall back to the shard scan
                max_id = r.manifest["stats"].get("max_docid")
                if max_id is None:
                    max_id = max(
                        (m.get("max_docid", -1) for m in r.manifest["shards"]),
                        default=-1,
                    )
                base += ((int(max_id) + 1 + span - 1) // span) * span
        self.n_docs = sum(r.n_docs for r in self.readers)
        sum_dl = sum(r.avgdl * r.n_docs for r in self.readers)
        self.avgdl = max(sum_dl / self.n_docs if self.n_docs else 0.0, 1e-9)
        self._postings_cache: dict[str, TermPostings] = {}
        # synthetic manifest: the federated view of config + corpus stats
        # (CLI capability checks read these; suffix search needs EVERY
        # segment to carry the suffix namespace)
        cfg0_m = dict(r0.manifest["config"])
        cfg0_m["index_suffixes"] = all(
            r.manifest["config"].get("index_suffixes") for r in self.readers
        )
        cfg0_m["index_positions"] = self.has_positions
        self.manifest = {
            "config": cfg0_m,
            "stats": {"n_docs": self.n_docs, "avgdl": self.avgdl},
            "segments": list(index_dirs),
            "complete": True,
        }
        self.num_partitions = max(r.num_partitions for r in self.readers)

    # -- dictionary ----------------------------------------------------
    def term_stats(self, term: str) -> tuple[int, int]:
        df = cf = 0
        for r in self.readers:
            d, c = r.term_stats(term)
            df += d
            cf += c
        return df, cf

    def _union(self, lists: list[list[str]], limit: int | None) -> list[str]:
        out = sorted(set().union(*map(set, lists))) if lists else []
        return out[:limit] if limit is not None else out

    def terms_with_prefix(self, prefix: str, limit: int | None = None) -> list[str]:
        return self._union(
            [r.terms_with_prefix(prefix) for r in self.readers], limit
        )

    def terms_with_edit_distance(
        self, term: str, max_dist: int, limit: int | None = None
    ) -> list[str]:
        return self._union(
            [r.terms_with_edit_distance(term, max_dist) for r in self.readers],
            limit,
        )

    def terms_with_regex(self, pattern: str, limit: int | None = None) -> list[str]:
        return self._union(
            [r.terms_with_regex(pattern) for r in self.readers], limit
        )

    def complete(self, prefix: str, k: int | None = 10) -> list[tuple[str, int]]:
        """Federated ranked completions: per-segment candidates merged by
        SUMMED df (a term may live in several segments). Exact: segments
        are asked unpruned — the candidate set is the prefix range, which
        is small by construction — then ranked (df desc, term asc)."""
        dfs: dict[str, int] = {}
        for r in self.readers:
            for term, df in r.complete(prefix, k=None):
                dfs[term] = dfs.get(term, 0) + df
        rows = sorted(dfs.items(), key=lambda t: (-t[1], t[0]))
        return rows[:k] if k is not None else rows

    def suggest(
        self, term: str, max_dist: int = 2, k: int | None = 10
    ) -> list[tuple[str, int, int]]:
        """Federated did-you-mean: per-segment fuzzy candidates merged by
        summed df (dist is a property of the term, identical across
        segments), ranked dist asc, df desc, term asc."""
        acc: dict[str, tuple[int, int]] = {}
        for r in self.readers:
            for t, dist, df in r.suggest(term, max_dist=max_dist, k=None):
                prev = acc.get(t)
                acc[t] = (dist, df + (prev[1] if prev else 0))
        rows = [(t, d, df) for t, (d, df) in acc.items()]
        rows.sort(key=lambda r: (r[1], -r[2], r[0]))
        return rows[:k] if k is not None else rows

    def vocabulary_size(self) -> int:
        # upper bound: terms shared across segments count once per segment
        return sum(r.vocabulary_size() for r in self.readers)

    # -- postings ------------------------------------------------------
    def postings(self, term: str) -> TermPostings:
        hit = self._postings_cache.get(term)
        if hit is not None:
            return hit
        parts = []  # (segment tp, docid offset, segment avgdl)
        df = cf = 0
        for r, off in zip(self.readers, self.offsets):
            tp = r.postings(term)
            if tp.df:
                parts.append((tp, off, r.avgdl))
                df += tp.df
                cf += tp.cf
        if not parts:
            out = _EMPTY
        else:
            span = self.block_span_bits
            block_ids = np.concatenate(
                [tp.block_ids + (off >> span) for tp, off, _a in parts]
            )
            if len(block_ids) > 1 and not (np.diff(block_ids) > 0).all():
                raise ValueError(
                    f"term {term!r}: segment docid ranges share a posting "
                    "block — explicit offsets must keep segments "
                    "block-disjoint (split ids at a span multiple)"
                )
            doc_counts = np.concatenate([tp.doc_counts for tp, _o, _a in parts])
            # admissible bound rescale: stored max_tfn used the SEGMENT's
            # avgdl; tf_norm grows with avgdl and its ratio is bounded by
            # the avgdl ratio (see module docstring)
            max_tfns = np.concatenate(
                [
                    tp.max_tfns * max(1.0, self.avgdl / max(seg_avgdl, 1e-9))
                    for tp, _o, seg_avgdl in parts
                ]
            )
            doc_offsets = np.concatenate(
                [
                    np.full(len(tp.block_ids), off, dtype=np.int64)
                    for tp, off, _a in parts
                ]
            )
            blockmap: list[tuple[TermPostings, int]] = []
            for tp, _off, _a in parts:
                blockmap.extend((tp, i) for i in range(len(tp.block_ids)))

            def fetch(i: int, _m=blockmap):
                tp, li = _m[i]
                if tp._docs[li] is None:
                    return tp._fetch(li)
                return tp._docs[li], tp._tfs[li], tp._dls[li]

            def fetch_pos(i: int, _m=blockmap):
                tp, li = _m[i]
                if tp._poss[li] is None:
                    return tp._fetch_pos(li)
                return tp._poss[li]

            n = len(block_ids)
            out = TermPostings(
                term=term,
                df=df,
                cf=cf,
                block_ids=block_ids,
                doc_counts=doc_counts,
                max_tfns=max_tfns,
                _docs=[None] * n,
                _tfs=[None] * n,
                _dls=[None] * n,
                codec=self.docid_codec,
                _fetch=fetch,
                _poss=[None] * n if self.has_positions else None,
                _fetch_pos=fetch_pos if self.has_positions else None,
                doc_offsets=doc_offsets,
            )
        if len(self._postings_cache) > 4096:
            self._postings_cache.clear()
        self._postings_cache[term] = out
        return out

    def preload(self) -> int:
        return sum(r.preload() for r in self.readers)

    def drop_caches(self, page_cache: bool = False) -> int:
        self._postings_cache.clear()
        return sum(r.drop_caches(page_cache=page_cache) for r in self.readers)
