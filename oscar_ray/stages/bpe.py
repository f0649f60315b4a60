"""Distributed BPE tokenizer training + corpus encoding.

Trains a byte-pair-encoding vocabulary (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units", Algorithm 1) on
the corpus, then encodes documents with it — the "train a tokenizer on
your data" stage of an LLM pipeline, feeding token budgets that
``stages/packing.py`` packs.

Scale shape — the classic two-phase decomposition:

1. *Word counts* (corpus-sized -> vocab-sized): one hash-routed exact
   count exchange, the ``topk_frequent_terms`` pattern without the top-k
   cut.  Everything after this step runs over the WORD-FREQUENCY TABLE
   (distinct words x count), never the corpus: BPE statistics are
   invariant to where words occur, so 100 TB of text collapses to a
   vocab-sized table before any iteration starts.  ``min_count`` prunes
   the hapax tail (standard practice; web-scale noise would otherwise
   dominate the table).
2. *Merge learning* (iterative): the word table is sharded across
   persistent Ray actors (ANY disjoint split works — after the exact
   groupby each word exists exactly once).  Per merge the driver holds
   only the aggregated PAIR-COUNT table (pair-vocab-sized, never
   word- or corpus-sized), picks the argmax pair (count desc, then
   lexicographic symbol-string pair asc — pinned tie-break), and
   broadcasts it; each shard rewrites only the words containing the
   pair (a ``pair -> word`` inverted index makes that O(affected
   words)) and returns a sparse pair-count DELTA.  Iterative loops use
   raw actors + ref exchanges rather than per-iteration Dataset
   groupbys (each Ray Data groupby costs ~2 s fixed overhead; 1000
   merges would pay it 1000x).

Symbol ids: initial symbols are Unicode code points (id == ord(char)),
the end-of-word marker is ``EOW_ID``, and merge m creates id
``MERGE_BASE + m`` — deterministic without any coordination.

Encoding (``bpe_token_counts``) is a stateless actor-pool
``map_batches``: per batch, words are dictionary-encoded and each
DISTINCT word is encoded once (rank-greedy merge loop, LRU-cached in
the actor), then per-doc totals are one ``np.bincount`` — per-batch
Python work is bounded by batch vocabulary, the accepted
``doc_fingerprint`` budget.

No SQL oracle: iterative merge training is not expressible in DuckDB;
correctness is pinned by pytest parity with a sequential reference
implementation of Algorithm 1 plus shard-count invariance.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.dedup import hash_strings_u64

EOW_ID = 0x110000  # one past the Unicode range
MERGE_BASE = 0x110001


def word_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    num_parts: int = 16,
    concurrency: int = 2,
    min_count: int = 1,
) -> ray.data.Dataset:
    """EXACT corpus word counts -> (word, count), each word once globally.

    Per-batch partial counts carry ``part = hash(word) % P`` so every
    occurrence of a word lands in one partition of the single exchange;
    partitions combine vectorized (arrow groupby)."""

    def partial(batch: pa.Table) -> pa.Table:
        _parent, tokens_a = flatten_tokens(batch[text_col])
        denc = pc.dictionary_encode(
            tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
        )
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(denc.dictionary))
        parts = (hash_strings_u64(denc.dictionary) % np.uint64(num_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                "word": denc.dictionary,
                "count": pa.array(counts.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        agg = g.group_by("word").aggregate([("count", "sum")])
        t = pa.table({"word": agg["word"], "count": agg["count_sum"]})
        if min_count > 1:
            t = t.filter(pc.greater_equal(t["count"], min_count))
        return t

    return (
        ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)
        .groupby("part")
        .map_groups(
            lambda g: combine(g.drop_columns(["part"])), batch_format="pyarrow"
        )
    )


def _word_pairs(seq: list[int]) -> list[tuple[int, int]]:
    return list(zip(seq, seq[1:]))


def _merge_seq(seq: list[int], a: int, b: int, new_id: int) -> list[int]:
    """Replace non-overlapping (a, b) occurrences left-to-right."""
    out, i, n = [], 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


@ray.remote(num_cpus=1)
class BPEShard:
    """Holds one shard of the word-frequency table as symbol sequences;
    answers pair counts and applies broadcast merges incrementally."""

    def load(self, refs: list) -> int:
        self.seqs: list[list[int]] = []
        self.counts: list[int] = []
        for t in ray.get(list(refs)):
            if t.num_rows == 0 or "word" not in t.column_names:
                continue  # empty blocks may arrive schema-less
            for w, c in zip(t["word"].to_pylist(), t["count"].to_pylist()):
                self.seqs.append([ord(ch) for ch in w] + [EOW_ID])
                self.counts.append(int(c))
        self.pair_index: dict[tuple[int, int], set[int]] = {}
        self.pair_counts: Counter = Counter()
        for wi, seq in enumerate(self.seqs):
            c = self.counts[wi]
            for p in _word_pairs(seq):
                self.pair_counts[p] += c
                self.pair_index.setdefault(p, set()).add(wi)
        return len(self.seqs)

    def full_pair_counts(self) -> dict:
        return dict(self.pair_counts)

    def apply_merge(self, a: int, b: int, new_id: int) -> dict:
        """Rewrite words containing (a, b); return the sparse pair-count
        delta (old word pairs subtracted, new word pairs added)."""
        delta: Counter = Counter()
        affected = self.pair_index.pop((a, b), set())
        for wi in affected:
            seq = self.seqs[wi]
            c = self.counts[wi]
            old_pairs = _word_pairs(seq)
            if (a, b) not in old_pairs:
                continue  # stale index entry from an earlier rewrite
            new_seq = _merge_seq(seq, a, b, new_id)
            self.seqs[wi] = new_seq
            new_pairs = _word_pairs(new_seq)
            for p in old_pairs:
                delta[p] -= c
            for p in new_pairs:
                delta[p] += c
                self.pair_index.setdefault(p, set()).add(wi)
        delta = {k: v for k, v in delta.items() if v != 0}
        self.pair_counts.update(delta)
        for k in [k for k, v in self.pair_counts.items() if v <= 0]:
            del self.pair_counts[k]
        return delta


@dataclass
class BPEModel:
    """Learned merge table. ``merges[m] = (a, b)`` creates symbol
    ``MERGE_BASE + m``; ``ranks`` maps pair -> merge index."""

    merges: list = field(default_factory=list)
    sym_str: dict = field(default_factory=dict)  # id -> surface string

    @property
    def ranks(self) -> dict:
        return {pair: m for m, pair in enumerate(self.merges)}

    def vocab(self) -> list[str]:
        """Merge-created symbol surface strings, in creation order."""
        return [self.sym_str[MERGE_BASE + m] for m in range(len(self.merges))]


def _sym_to_str(sym_str: dict, sid: int) -> str:
    if sid in sym_str:
        return sym_str[sid]
    return "</w>" if sid == EOW_ID else chr(sid)


def train_bpe(
    ds: ray.data.Dataset,
    num_merges: int = 200,
    min_count: int = 1,
    num_shards: int = 4,
    text_col: str = "text",
    num_parts: int = 16,
    concurrency: int = 2,
) -> BPEModel:
    """Learn ``num_merges`` BPE merges from the corpus.

    Deterministic: argmax pair by (count desc, symbol-string pair asc).
    Stops early when no pair occurs twice."""
    wc = word_counts(
        ds,
        text_col=text_col,
        num_parts=num_parts,
        concurrency=concurrency,
        min_count=min_count,
    ).materialize()
    refs = list(wc.to_arrow_refs())
    shards = [BPEShard.remote() for _ in range(num_shards)]
    loads = [
        shard.load.remote(refs[i :: num_shards]) for i, shard in enumerate(shards)
    ]
    ray.get(loads)

    counts: Counter = Counter()
    for d in ray.get([s.full_pair_counts.remote() for s in shards]):
        counts.update(d)

    model = BPEModel()

    def key(item):
        (a, b), c = item
        return (-c, _sym_to_str(model.sym_str, a), _sym_to_str(model.sym_str, b))

    for m in range(num_merges):
        live = [(p, c) for p, c in counts.items() if c >= 2]
        if not live:
            break
        (a, b), _c = min(live, key=key)
        new_id = MERGE_BASE + m
        model.merges.append((a, b))
        model.sym_str[new_id] = _sym_to_str(model.sym_str, a) + _sym_to_str(
            model.sym_str, b
        )
        for d in ray.get([s.apply_merge.remote(a, b, new_id) for s in shards]):
            counts.update(d)
        counts.pop((a, b), None)
        for k in [k for k, v in counts.items() if v <= 0]:
            del counts[k]
    for s in shards:
        ray.kill(s)
    return model


def encode_word(word: str, ranks: dict) -> list[int]:
    """Rank-greedy BPE encode of one word (lowest-rank pair merges
    first — exactly reproduces training order)."""
    seq = [ord(ch) for ch in word] + [EOW_ID]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq = (
            seq[:best_i] + [MERGE_BASE + best_rank] + seq[best_i + 2 :]
        )
    return seq


class BPEEncodeStage:
    """map_batches actor: (doc_id, text) -> (doc_id, n_words, n_bpe_tokens).

    The model is broadcast once via ``ray.put`` (read per actor in
    ``__init__``, never re-shipped per batch); distinct words encode
    once per batch + an LRU-ish per-actor cache."""

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        model = ray.get(model_ref) if not isinstance(model_ref, BPEModel) else model_ref
        self.ranks = model.ranks
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        parent, tokens_a = flatten_tokens(batch[self.text_col])
        denc = pc.dictionary_encode(
            tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
        )
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        lens = np.empty(len(denc.dictionary), dtype=np.int64)
        for i, w in enumerate(denc.dictionary.to_pylist()):
            n = self._cache.get(w)
            if n is None:
                n = len(encode_word(w, self.ranks))
                if len(self._cache) >= 1 << 20:
                    self._cache.clear()
                self._cache[w] = n
            lens[i] = n
        codes = np.asarray(denc.indices, dtype=np.int64)
        par = np.asarray(parent, dtype=np.int64)
        n_rows = len(ids)
        n_words = np.bincount(par, minlength=n_rows)
        n_bpe = np.bincount(par, weights=lens[codes].astype(np.float64), minlength=n_rows)
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_bpe_tokens": pa.array(n_bpe.astype(np.int64)),
            }
        )


def bpe_token_counts(
    ds: ray.data.Dataset,
    model: BPEModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Encode the corpus with a trained model -> per-doc BPE token counts."""
    model_ref = ray.put(model)
    return ds.map_batches(
        BPEEncodeStage,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class BPETokenizeStage:
    """map_batches actor: (doc_id, text) -> (doc_id, n_bpe_tokens,
    token_ids: list<int32>) — the TERMINAL curation step that turns a
    curated corpus into training-ready token shards.

    Same broadcast/caching discipline as :class:`BPEEncodeStage`, but
    the per-word cache holds the full id sequences and the per-doc
    lists assemble into one Arrow ListArray via offsets (one
    np.concatenate over the batch's word sequences, no per-token
    Python appends). Ids are the training ids (bytes 0-255, EOW 256,
    merges 257+): encode == training segmentation, so downstream
    de-tokenization is exact."""

    def __init__(self, model_ref, id_col: str = "doc_id", text_col: str = "text"):
        model = ray.get(model_ref) if not isinstance(model_ref, BPEModel) else model_ref
        self.ranks = model.ranks
        self.id_col, self.text_col = id_col, text_col
        self._cache: dict[str, np.ndarray] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        parent, tokens_a = flatten_tokens(batch[self.text_col])
        denc = pc.dictionary_encode(
            tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
        )
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dict_seqs: list[np.ndarray] = []
        for w in denc.dictionary.to_pylist():
            seq = self._cache.get(w)
            if seq is None:
                seq = np.asarray(encode_word(w, self.ranks), dtype=np.int32)
                if len(self._cache) >= 1 << 20:
                    self._cache.clear()
                self._cache[w] = seq
            dict_seqs.append(seq)
        codes = np.asarray(denc.indices, dtype=np.int64)
        par = np.asarray(parent, dtype=np.int64)
        n_rows = len(ids)
        seq_lens = np.fromiter(
            (len(s) for s in dict_seqs), dtype=np.int64, count=len(dict_seqs)
        )
        word_lens = seq_lens[codes] if len(codes) else np.zeros(0, np.int64)
        per_doc = np.bincount(par, weights=word_lens.astype(np.float64), minlength=n_rows).astype(np.int64)
        values = (
            np.concatenate([dict_seqs[c] for c in codes])
            if len(codes)
            else np.zeros(0, np.int32)
        )
        offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(per_doc, out=offsets[1:])
        token_ids = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
        )
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "n_bpe_tokens": pa.array(per_doc),
                "token_ids": token_ids,
            }
        )


def bpe_tokenize(
    ds: ray.data.Dataset,
    model: BPEModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
) -> ray.data.Dataset:
    """Corpus -> (doc_id, n_bpe_tokens, token_ids list<int32>); write
    the result with ``.write_parquet(out_dir)`` for training shards."""
    model_ref = ray.put(model)
    return ds.map_batches(
        BPETokenizeStage,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
