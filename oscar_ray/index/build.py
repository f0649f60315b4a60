"""Resumable two-stage inverted-index build on Ray Data.

Pipeline shape (SURVEY.md §3.4 / §7; the Ray-native replacement for the
reference's trie build ``oscar-create/CellTextCompleter.h:771-1113`` and
OOM external-sort build ``readwritefuncs.cpp:340-394``):

    Stage A (map):  fragment shards -> tokenize (pinned spec) ->
                    per-(doc,term) tf rows -> hash-spill by
                    part = crc32(term) % P  +  docmeta per shard
    Dedup   (opt):  groupby(url) over docmeta -> tombstone docids
                    (exact URL dedup, the `removeDuplicates` analog,
                    ``OsmKeyValueObjectStore.cpp:1110-1116``)
    Stats:          N, avgdl over surviving docs (Ray aggregate)
    Stage B (reduce): one task per term partition -> sort (term, docid)
                    -> segment into docid-range blocks (block_id =
                    docid >> log2(block_span), the head-term salt from
                    SURVEY.md §4 skew row) -> delta+varint encode +
                    block-max metadata -> postings/dict parquet

The explicit hash-partition + per-partition-reduce pattern replaces a
global ``groupby(term)`` so (a) head-term groups never materialize as
one giant Arrow group, (b) each stage checkpoints at its natural
granularity (input shard / term partition) via atomic completion
markers, and (c) partition tasks are embarrassingly parallel at both
cluster sizes.

Why the two stages are raw ``ray.remote`` fan-outs over descriptors
rather than Dataset operators: both are *resumable side-effect writers*
— each work item writes its own artifact files then an atomic marker,
and a resumed build re-runs exactly the unmarked items. The Dataset API
has no per-item completion contract (a failed pipeline re-runs whole
lineage), which is precisely the "lay outputs out so a rerun can skip
finished work" case the Ray guide carves out for explicit layout.
Everything per-record elsewhere in this repo (tokenize-for-analysis,
dedup, scoring, serving) stays in ``map_batches``; the tokenizer itself
is the same vectorized arrow-kernel code in both shapes. Raw tasks also
reuse Ray's warm worker processes across the A -> dedup -> B phases,
where per-pipeline actor pools would respawn.

Determinism: docids derive from the static input layout
(``sources/pages.py``), stage-B sorts are stable, and every artifact file
is written with fixed writer settings — so rebuilding at any
parallelism level yields byte-identical postings/dict/docmeta artifacts
(the `check`-flag rebuild-and-compare analog,
``oscar-create/readwritefuncs.cpp:311-325``).

At 100 TB: `shard_fragments` bounds stage-A task memory (a shard is the
unit of re-read on resume), `num_partitions` is sized so one partition's
spill fits a reduce task (P ~ corpus_tokens_bytes / few GB), and the
spill dir must live on shared storage. No stage materializes the corpus;
the only all-to-all movement is the spill write+read, which is the
theoretical minimum for index inversion.
"""

from __future__ import annotations

import json

import os
import shutil
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from oscar_ray.index import layout
from oscar_ray.sources.pages import (
    Fragment,
    input_fingerprint,
    list_fragments,
    read_fragment,
)
from oscar_ray.spec.bm25 import BM25Params, bm25_tf_norm
from oscar_ray.spec.tokenizer import flatten_tokens

_PARQUET_WRITE_OPTS = dict(compression="zstd", data_page_version="2.0")
# spill is written once and read once — cheap (de)compression wins there
_SPILL_WRITE_OPTS = dict(compression="lz4", data_page_version="2.0")
INDEX_FORMAT_VERSION = 2  # v2: postings carry (max_tf, min_dl) for merge-time block-max


@dataclass
class IndexBuildConfig:
    """Knobs for the index build (the Config.h analog, JSON-serializable)."""

    num_partitions: int = 16
    block_span_bits: int = 16  # posting block covers 2^bits docids
    shard_fragments: int = 4  # input row-groups per stage-A shard
    dedup_urls: bool = True
    url_partitions: int = 16  # docmeta hash-partition count (dedup parallelism)
    # dedup on the CANONICAL url (stages/urls.py::canonicalize_urls — the
    # pinned crawl normal form) instead of the raw string: syntactic
    # variants (case, default ports, fragments, param order, utm_*) of one
    # resource collapse to one live doc. Docmeta stores the canonical form
    # alongside the raw url (`curl` column) and partition routing keys on
    # it so variants co-locate; hydration/display keep the raw url.
    canonical_url_dedup: bool = False
    # substring search support (the reference's suffix-string insertion,
    # ``SampleSuffixStringsContainer``/suffixDelimeters, SURVEY.md M5):
    # every proper suffix (len >= min_suffix_len) of every token is indexed
    # as a marker-prefixed term SUFFIX_MARKER+suffix, so a substring query
    # becomes a prefix scan over the suffix dictionary. Multiplies the
    # postings volume by ~avg token length — off by default (the reference
    # gates it behind config the same way).
    index_suffixes: bool = False
    min_suffix_len: int = 2
    # positional sidecar (phrase / proximity search): every posting block
    # row additionally stores a `poss` payload — the concatenation, in
    # block doc order, of each doc's ascending token positions for the
    # term, delta-gap + LEB128 encoded (the docid-stream codec). The
    # per-doc sub-streams are delimited by the aligned `tfs` stream, so
    # positions add ZERO metadata — one extra lazily-hydrated binary
    # column, read only by positional queries. Roughly doubles postings
    # bytes (one varint per token occurrence); off by default.
    # Composes with index_suffixes and field_columns (marker-namespace
    # pairs carry empty payloads — substring/field matching is set-only);
    # mutually exclusive with payload_dedup (position payloads make
    # byte-equal payload collisions meaningless).
    index_positions: bool = False
    # field/tag-scoped search (the reference's `"@"+key+":"+value`
    # tag-strings, ``TextSearchTraits.h:68-86``): for each listed column,
    # every doc gets one marker term FIELD_MARKER+col+":"+norm(value)
    # (tf=1), so `@col:value` query leaves evaluate as zero-score filter
    # posting lists. Tiny postings cost: one row per doc per field.
    field_columns: list = None  # e.g. ["lang"]; None/[] = off
    # docid stream codec, the reference's selectable ItemIndex type
    # (``oscarcreate.cpp:70-75``, index_rlede/eliasfano.json): 'varint'
    # (delta-gap + LEB128, the default), 'rlede' (RLE over gaps, the
    # reference's default type), 'eliasfano' or 'wah'
    docid_codec: str = "varint"
    # posting-payload dedup (the reference's setDeduplication(true),
    # ``oscarcreate.cpp:74``, ``Config.h:23-32``: identical ItemIndex
    # payloads stored once): within a partition file, rows whose
    # (docs, tfs, dls) bytes are identical to an earlier row store empty
    # bytes + a `payload_row` pointer to the canonical row; readers
    # resolve the indirection (reader.py resolve_payload_refs)
    payload_dedup: bool = False
    # input_hint invariant: when True, stage A reads the html binary column
    # and derives text via the deterministic extractor (spec/extract.py);
    # if a text column also exists it is asserted byte-identical per row
    # (the "byte-identical extracted text per url" contract).
    extract_from_html: bool = False
    # which html->text extractor: "fixture" (the pinned per-row
    # invariant, spec/extract.py::extract_text) or "generic" (the
    # real-web boilerplate stripper, extract_text_generic)
    extractor: str = "fixture"
    html_column: str = "html"
    text_column: str = "text"
    url_column: str | None = "url"  # None: synthesize doc://<docid>, no dedup
    lang_column: str | None = "lang"
    # inherited-strings columns (the reference's region-inherited strings,
    # SURVEY.md M6 / ``OsmKeyValueObjectStore`` region-string inheritance,
    # re-expressed for webtext as anchor-text inheritance — see
    # stages/links.py): each listed string column's tokens are APPENDED to
    # the doc's scored term stream (concatenated after the text column with
    # a space), so they contribute tf, doclen and positions exactly like
    # body tokens. The text column itself — and the byte-identical
    # extracted-text invariant — is untouched. Positions note: the appended
    # stream is position-contiguous with the body (a phrase can span the
    # boundary); the reference's per-string phrase scoping is not modeled.
    extra_text_columns: list = None  # e.g. ["anchor_text"]; None/[] = off
    id_column: str | None = None  # use an existing unique int64 id as docid
    # static-rank docid ordering (the applySort analog,
    # ``OsmKeyValueObjectStore.cpp:1339-1399`` — "docID order is rank
    # order"): when set, docids are assigned by DESCENDING value of this
    # column (ties by input position), so BM25's docid-ascending tiebreak
    # prefers higher-static-rank documents and `limit` over docid order is
    # a static top-k. Mutually exclusive with id_column.
    rank_column: str | None = None
    k1: float = 0.9
    b: float = 0.4
    cleanup_spill: bool = False  # drop tmp/ after successful finalize

    def bm25(self) -> BM25Params:
        return BM25Params(k1=self.k1, b=self.b)


# --------------------------------------------------------------------------
# Stage A: tokenize shards, spill by term partition
# --------------------------------------------------------------------------


class TokenizeShardWorker:
    """Actor-pool stage: tokenize one input shard per batch row and spill.

    The stateful-tokenizer analog (DiacriticRemover/casefolder held per
    worker, ``TextSearchTraits.h:30-37`` / SURVEY.md ST3): per-actor setup
    happens once in ``__init__``; ``__call__`` handles shard descriptor
    rows and performs only vectorized work (arrow kernels + numpy).
    """

    def __init__(self, cfg: dict, out_dir: str):
        self.cfg = IndexBuildConfig(**cfg)
        self.out_dir = out_dir

    def __call__(self, batch: dict) -> pa.Table:
        metrics = []
        for shard_id, frags_json in zip(
            batch["shard_id"].tolist(), batch["fragments"].tolist()
        ):
            metrics.append(self._process_shard(int(shard_id), json.loads(frags_json)))
        return pa.Table.from_pylist(metrics)

    def _process_shard(self, shard_id: int, frags: list[dict]) -> dict:
        cfg = self.cfg
        t0 = time.perf_counter()
        # per-substage attribution (bench sums these across shards so
        # stage-A task-second drift is localizable round-over-round)
        sub: dict[str, float] = {}
        _t_mark = [t0]

        def mark(name: str) -> None:
            now = time.perf_counter()
            sub[name] = sub.get(name, 0.0) + (now - _t_mark[0])
            _t_mark[0] = now
        cols = [cfg.html_column] if cfg.extract_from_html else [cfg.text_column]
        if cfg.url_column:
            cols.append(cfg.url_column)
        if cfg.lang_column:
            cols.append(cfg.lang_column)
        for fc in cfg.field_columns or []:
            if fc not in cols:
                cols.append(fc)
        for ec in cfg.extra_text_columns or []:
            if ec not in cols:
                cols.append(ec)
        tbl = pa.concat_tables(
            read_fragment(Fragment(**f), columns=cols, id_column=cfg.id_column)
            for f in frags
        )
        if cfg.rank_column:
            # static-rank mode: overwrite layout docids with the remap
            remap = pa.concat_tables(
                pq.read_table(
                    os.path.join(self.out_dir, "remap", f"frag-{f['base_docid']}.parquet")
                )
                for f in frags
            )["docid"]
            tbl = tbl.set_column(
                tbl.schema.get_field_index("docid"), "docid", remap.combine_chunks()
            )
        docid = tbl["docid"].to_numpy()
        mark("read")
        if cfg.extract_from_html:
            from oscar_ray.spec.extract import EXTRACTORS

            extract = EXTRACTORS[cfg.extractor]
            text_col = pa.array(
                [extract(h) for h in tbl[cfg.html_column].to_pylist()],
                type=pa.string(),
            )
        else:
            text_col = tbl[cfg.text_column]
        if cfg.extra_text_columns:
            # inherited strings (M6 analog): append each extra column's
            # token stream after the body by space-concatenation — one
            # vectorized kernel; empties/nulls contribute no tokens (the
            # flatten_tokens '' filter drops separator artifacts)
            def _contig(col):
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return pc.fill_null(col, "")

            text_col = pc.binary_join_element_wise(
                _contig(text_col),
                *[_contig(tbl[ec]) for ec in cfg.extra_text_columns],
                " ",
            )
        parent_a, tokens_a = flatten_tokens(text_col)
        parent = np.asarray(parent_a)
        dict_enc = pc.dictionary_encode(
            tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
        )
        if isinstance(dict_enc, pa.ChunkedArray):
            dict_enc = dict_enc.combine_chunks()
        codes = np.asarray(dict_enc.indices, dtype=np.int64)
        terms_dict = dict_enc.dictionary

        # tf per (row, term): combine row index and dictionary code into one key
        key = (parent.astype(np.int64) << np.int64(32)) | codes
        uniq, tf = np.unique(key, return_counts=True)
        urow = (uniq >> np.int64(32)).astype(np.int64)
        ucode = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)

        doclen_per_row = np.bincount(parent, minlength=len(tbl)).astype(np.int64)
        mark("tokenize")

        pos_arr = None
        if cfg.index_positions:
            # token position within its doc = flat index - doc's first flat
            # index (flatten preserves row order and within-row order)
            row_first = np.zeros(len(tbl) + 1, dtype=np.int64)
            np.cumsum(doclen_per_row, out=row_first[1:])
            tok_pos = np.arange(len(parent), dtype=np.int64) - row_first[parent]
            # group positions by (row, term) pair: a stable sort on the
            # pair key yields groups in EXACTLY the uniq order above,
            # each group's positions ascending (stable keeps token order)
            order_pairs = np.argsort(key, kind="stable")
            pair_starts = np.zeros(len(tf), dtype=np.int64)
            np.cumsum(tf[:-1], out=pair_starts[1:])
            from oscar_ray.stages.codecs import encode_positions_segmented

            pos_arr = encode_positions_segmented(tok_pos[order_pairs], pair_starts)
            mark("positions")

        terms_py = terms_dict.to_pylist()
        if cfg.index_suffixes:
            n_before = len(urow)
            urow, ucode, tf, terms_py = _expand_suffix_pairs(
                urow, ucode, tf, terms_py, cfg.min_suffix_len
            )
            if pos_arr is not None and len(urow) > n_before:
                # suffix-marker pairs append after the base pairs: empty
                # payloads (substring matching is set-only; phrase eval
                # never touches the suffix namespace)
                pos_arr = pa.concat_arrays(
                    [pos_arr, _empty_binary(len(urow) - n_before)]
                )
        if cfg.field_columns:
            n_before = len(urow)
            urow, ucode, tf, terms_py = _append_field_pairs(
                tbl, cfg.field_columns, urow, ucode, tf, terms_py, doclen_per_row
            )
            if pos_arr is not None and len(urow) > n_before:
                # field marker pairs are appended at the END: pad with
                # empty payloads (field filters are never position-matched)
                pos_arr = pa.concat_arrays(
                    [pos_arr, _empty_binary(len(urow) - n_before)]
                )

        mark("suffix_fields")
        # partition of each unique term in this shard's dictionary
        part_by_code = layout.term_partitions_np(terms_py, cfg.num_partitions)
        pair_part = part_by_code[ucode]

        # order rows by partition for contiguous per-partition slices
        order = np.argsort(pair_part, kind="stable")
        pair_part = pair_part[order]
        terms_arr = pa.array(terms_py, type=pa.string())
        ucode_o = ucode[order]
        docid_o = docid[urow[order]]
        # narrow columns: tf/doclen fit int32 by the doclen >= tf
        # invariant (a doc's token count bounds both); docid stays int64.
        # Halves the spill bytes + stage-B sort-gather traffic for 2 of 4
        # posting columns (the >16-way memory-bandwidth cliff amplifier).
        tf_o = tf[order].astype(np.int32)
        dl_o = doclen_per_row[urow[order]].astype(np.int32)
        pos_o = pc.take(pos_arr, pa.array(order)) if pos_arr is not None else None
        if len(pair_part):
            bounds = np.flatnonzero(np.diff(pair_part)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(pair_part)]))
        else:  # zero-token shard (e.g. an empty segment slice)
            starts = ends = np.empty(0, dtype=np.int64)
        spilled_bytes = 0
        for s, e in zip(starts, ends):
            p = int(pair_part[s])
            # term column = compacted DictionaryArray per partition slice:
            # int-code remap (np.unique/searchsorted) + a vocab_p-sized
            # string take — never an n_postings-sized string gather
            sl_codes = ucode_o[s:e]
            uniq_codes, local = np.unique(sl_codes, return_inverse=True)
            term_col = pa.DictionaryArray.from_arrays(
                pa.array(local.astype(np.int32)),
                pc.take(terms_arr, pa.array(uniq_codes)),
            )
            slice_cols = {
                "term": term_col,
                "docid": pa.array(docid_o[s:e], type=pa.int64()),
                "tf": pa.array(tf_o[s:e], type=pa.int32()),
                "doclen": pa.array(dl_o[s:e], type=pa.int32()),
            }
            if pos_o is not None:
                slice_cols["pos"] = pos_o.slice(int(s), int(e - s))
            slice_tbl = pa.table(slice_cols)
            path = layout.spill_path(self.out_dir, p, shard_id)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(slice_tbl, path, **_SPILL_WRITE_OPTS)
            spilled_bytes += os.path.getsize(path)
        mark("spill")

        # docmeta for this shard, hash-partitioned by url so dedup is a
        # per-partition scan (crc32 over this shard's rows, C-speed)
        if cfg.url_column:
            url_arr = tbl[cfg.url_column]
        else:
            url_arr = pa.array([f"doc://{d}" for d in docid.tolist()], type=pa.string())
        meta_cols = {
            "docid": tbl["docid"],
            "url": url_arr,
            "doclen": pa.array(doclen_per_row, type=pa.int64()),
        }
        route_arr = url_arr
        if cfg.canonical_url_dedup:
            from oscar_ray.stages.urls import canonicalize_urls

            route_arr = canonicalize_urls(url_arr)
            meta_cols["curl"] = route_arr
        if cfg.lang_column:
            meta_cols["lang"] = tbl[cfg.lang_column]
        meta_tbl = pa.table(meta_cols)
        url_parts = layout.term_partitions_np(route_arr.to_pylist(), cfg.url_partitions)
        uorder = np.argsort(url_parts, kind="stable")
        meta_tbl = meta_tbl.take(pa.array(uorder))
        up_sorted = url_parts[uorder]
        ub = np.flatnonzero(np.diff(up_sorted)) + 1
        for s, e in zip(
            np.concatenate(([0], ub)), np.concatenate((ub, [len(up_sorted)]))
        ):
            mp = layout.docmeta_path(self.out_dir, shard_id, int(up_sorted[s]))
            os.makedirs(os.path.dirname(mp), exist_ok=True)
            pq.write_table(meta_tbl.slice(int(s), int(e - s)), mp, **_PARQUET_WRITE_OPTS)

        mark("docmeta")
        m = {
            "shard_id": shard_id,
            "docs": len(tbl),
            "tokens": int(doclen_per_row.sum()),
            "pairs": int(len(uniq)),
            "spilled_bytes": int(spilled_bytes),
            "sub_secs": {k: round(v, 3) for k, v in sub.items()},
            # docid-SPACE bound (consumers like the facet match plan must
            # partition by docid range, which tombstones never shrink)
            "max_docid": int(docid.max()) if len(tbl) else -1,
            "secs": round(time.perf_counter() - t0, 3),
        }
        layout.write_marker(layout.marker_path(self.out_dir, "shardA", shard_id), m)
        return m


# --------------------------------------------------------------------------
# Stage B: per-partition postings assembly
# --------------------------------------------------------------------------


class AssemblePartitionWorker:
    """Reduce stage: build one term partition's postings per batch row.

    Replaces the reference's global in-memory trie + posting arena
    (``CellTextCompleter.h:305-430``, SURVEY.md ST4) with independent
    per-partition tasks: read this partition's spill, stable-sort by
    (term, docid), cut into docid-range blocks, encode. No shared state.
    """

    def __init__(self, cfg: dict, out_dir: str, stats: dict, tombstones_ref=None):
        self.cfg = IndexBuildConfig(**cfg)
        self.out_dir = out_dir
        self.stats = stats
        # raw tasks auto-resolve top-level ObjectRef args; actor-pool
        # constructor kwargs do not — accept both
        if tombstones_ref is None:
            tomb = None
        elif isinstance(tombstones_ref, ray.ObjectRef):
            tomb = ray.get(tombstones_ref)
        else:
            tomb = tombstones_ref
        self.tombstones = (
            np.sort(np.asarray(tomb, dtype=np.int64)) if tomb is not None and len(tomb) else None
        )

    def __call__(self, batch: dict) -> pa.Table:
        return pa.Table.from_pylist(
            [self._assemble(int(p)) for p in batch["part"].tolist()]
        )

    def _assemble(self, part: int) -> dict:
        cfg = self.cfg
        t0 = time.perf_counter()
        sdir = layout.spill_dir(self.out_dir, part)
        files = sorted(
            os.path.join(sdir, f) for f in os.listdir(sdir) if f.endswith(".parquet")
        ) if os.path.isdir(sdir) else []
        if files:
            # keep the parquet dictionary encoding: unify_dictionaries merges
            # the per-file term dicts (vocab-sized work) instead of
            # re-hashing every one of the partition's posting rows
            tbl = pa.concat_tables(
                pq.read_table(f, read_dictionary=["term"]) for f in files
            ).unify_dictionaries()
        else:
            empty_cols = {
                "term": pa.array([], type=pa.string()).dictionary_encode(),
                "docid": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int32()),
                "doclen": pa.array([], type=pa.int32()),
            }
            if cfg.index_positions:
                empty_cols["pos"] = pa.array([], type=pa.large_binary())
            tbl = pa.table(empty_cols)

        docid = tbl["docid"].to_numpy()
        tf = tbl["tf"].to_numpy()
        dl = tbl["doclen"].to_numpy()
        term_col = tbl["term"]
        pos_col = tbl["pos"].combine_chunks() if cfg.index_positions else None

        if self.tombstones is not None and tbl.num_rows:
            pos = np.searchsorted(self.tombstones, docid)
            pos = np.minimum(pos, len(self.tombstones) - 1)
            keep = self.tombstones[pos] != docid
            docid, tf, dl = docid[keep], tf[keep], dl[keep]
            term_col = pc.filter(term_col, pa.array(keep))
            if pos_col is not None:
                pos_col = pc.filter(pos_col, pa.array(keep))

        n_rows = len(docid)
        if n_rows:
            denc = (
                term_col.combine_chunks()
                if isinstance(term_col, pa.ChunkedArray)
                else term_col
            )
            if not pa.types.is_dictionary(denc.type):
                denc = pc.dictionary_encode(denc)
            codes = np.asarray(denc.indices, dtype=np.int64)
            terms_np = np.asarray(denc.dictionary.to_pylist(), dtype=object)
            rank_of_code = np.empty(len(terms_np), dtype=np.int64)
            term_order = np.argsort(terms_np, kind="stable")
            rank_of_code[term_order] = np.arange(len(terms_np))
            rank = rank_of_code[codes]
            # pack (rank, docid) into ONE int64 sort key when ranges allow
            # (half the memory traffic of a 2-key lexsort; docids at 10^12-doc
            # scale exceed 2^40 only past ~10^12, where the fallback kicks in)
            max_docid = int(docid.max()) if n_rows else 0
            if max_docid < (1 << 40) and len(terms_np) < (1 << 23):
                order = np.argsort(
                    (rank.astype(np.int64) << np.int64(40)) | docid.astype(np.int64),
                    kind="stable",
                )
            else:
                order = np.lexsort((docid, rank))
            rank, docid, tf, dl = rank[order], docid[order], tf[order], dl[order]
            if pos_col is not None:
                pos_col = pc.take(pos_col, pa.array(order))
            block = docid >> np.int64(cfg.block_span_bits)
            seg_change = (np.diff(rank) != 0) | (np.diff(block) != 0)
            seg_starts = np.concatenate(([0], np.flatnonzero(seg_change) + 1))
            seg_ends = np.concatenate((seg_starts[1:], [n_rows]))
            sorted_terms = terms_np[term_order]
        else:
            seg_starts = seg_ends = np.empty(0, dtype=np.int64)
            sorted_terms = np.empty(0, dtype=object)
            rank = block = docid = tf = dl = np.empty(0, dtype=np.int64)

        avgdl = max(self.stats["avgdl"], 1e-9)
        params = cfg.bm25()
        from oscar_ray.stages.codecs import (
            delta_encode_segmented,
            varint_encode_segments,
        )

        if n_rows:
            # postings invariant (MatchDesc::isConsistent analog): within a
            # segment docids must be strictly ascending unique
            same_seg = np.ones(n_rows, dtype=bool)
            same_seg[seg_starts] = False
            if (np.diff(docid.astype(np.int64), prepend=docid[:1])[same_seg] <= 0).any():
                raise AssertionError("posting docids not strictly ascending")
            if cfg.docid_codec in ("eliasfano", "rlede", "wah"):
                from oscar_ray.stages.codecs import encode_docid_stream

                # per-segment encode (EF's l / rlede's runs vary per
                # block); segments are block-capped so the cost is bounded
                docs_b = [
                    encode_docid_stream(docid[s:e].astype(np.uint64), cfg.docid_codec)
                    for s, e in zip(seg_starts.tolist(), seg_ends.tolist())
                ]
            else:
                # single-pass vectorized encode of every segment at once
                gaps = delta_encode_segmented(docid, seg_starts)
                docs_b = varint_encode_segments(gaps, seg_starts, seg_ends)
            tfs_b = varint_encode_segments(tf, seg_starts, seg_ends)
            dls_b = varint_encode_segments(dl, seg_starts, seg_ends)
            tfn = bm25_tf_norm(tf, dl, avgdl, params)
            max_tfn = np.maximum.reduceat(tfn, seg_starts)
            # int64 accumulator: tf itself is int32 in the spill
            sum_tf = np.add.reduceat(tf, seg_starts, dtype=np.int64)
            # avgdl-independent bound ingredients (segment merge recomputes
            # max_tfn for the merged corpus's avgdl from these)
            max_tf = np.maximum.reduceat(tf, seg_starts)
            min_dl = np.minimum.reduceat(dl, seg_starts)
            terms_out = sorted_terms[rank[seg_starts]]
            blocks_out = block[seg_starts]
            counts_out = seg_ends - seg_starts
            if pos_col is not None:
                from oscar_ray.stages.codecs import concat_binary_segments_arrow

                # per-block positions payload: zero-copy concat of the
                # sorted per-(term,doc) payloads (doc order == block order)
                poss_arr = concat_binary_segments_arrow(
                    pos_col, seg_starts, seg_ends
                )
        else:
            docs_b = tfs_b = dls_b = []
            max_tfn = np.empty(0, dtype=np.float64)
            sum_tf = counts_out = blocks_out = np.empty(0, dtype=np.int64)
            max_tf = min_dl = np.empty(0, dtype=np.int64)
            terms_out = np.empty(0, dtype=object)
            poss_arr = pa.array([], type=pa.large_binary())

        n_payload_refs = 0
        cols = {
            "term": pa.array(terms_out, type=pa.string()),
            "block_id": pa.array(blocks_out, type=pa.int64()),
            "doc_count": pa.array(counts_out, type=pa.int64()),
            "sum_tf": pa.array(sum_tf, type=pa.int64()),
            "max_tfn": pa.array(max_tfn, type=pa.float64()),
            "max_tf": pa.array(max_tf, type=pa.int64()),
            "min_dl": pa.array(min_dl, type=pa.int64()),
            "docs": pa.array(docs_b, type=pa.binary()),
            "tfs": pa.array(tfs_b, type=pa.binary()),
            "dls": pa.array(dls_b, type=pa.binary()),
        }
        if pos_col is not None or (cfg.index_positions and not n_rows):
            cols["poss"] = poss_arr
        if cfg.payload_dedup:
            # setDeduplication analog: identical (docs, tfs, dls) payload
            # triples within this partition are stored once; later rows
            # keep empty bytes + the canonical ROW INDEX in payload_row
            import hashlib as _hl

            seen: dict[bytes, int] = {}
            payload_row = np.full(len(docs_b), -1, dtype=np.int64)
            for i, (db, tb, lb) in enumerate(zip(docs_b, tfs_b, dls_b)):
                h = _hl.blake2b(
                    db + b"\x00" + tb + b"\x00" + lb, digest_size=16
                ).digest()
                j = seen.get(h)
                if j is None:
                    seen[h] = i
                elif docs_b[j] == db and tfs_b[j] == tb and dls_b[j] == lb:
                    payload_row[i] = j
                    docs_b[i] = tfs_b[i] = dls_b[i] = b""
            n_payload_refs = int((payload_row >= 0).sum())
            cols["docs"] = pa.array(docs_b, type=pa.binary())
            cols["tfs"] = pa.array(tfs_b, type=pa.binary())
            cols["dls"] = pa.array(dls_b, type=pa.binary())
            cols["payload_row"] = pa.array(payload_row, type=pa.int64())
        postings = pa.table(cols)
        ppath = layout.postings_path(self.out_dir, part)
        os.makedirs(os.path.dirname(ppath), exist_ok=True)
        pq.write_table(postings, ppath, row_group_size=4096, **_PARQUET_WRITE_OPTS)

        # per-term dictionary: df/cf aggregated over this term's blocks
        # (terms are wholly contained in one partition by the hash routing)
        if postings.num_rows:
            g = postings.group_by("term").aggregate(
                [("doc_count", "sum"), ("sum_tf", "sum")]
            )
            d = pa.table(
                {
                    "term": g["term"],
                    "df": g["doc_count_sum"].cast(pa.int64()),
                    "cf": g["sum_tf_sum"].cast(pa.int64()),
                }
            ).sort_by("term")
        else:
            d = pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                    "cf": pa.array([], type=pa.int64()),
                }
            )
        dpath = layout.dict_path(self.out_dir, part)
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        pq.write_table(d, dpath, **_PARQUET_WRITE_OPTS)

        m = {
            "part": part,
            "rows": int(n_rows),
            "terms": int(d.num_rows),
            "blocks": int(postings.num_rows),
            "postings_bytes": os.path.getsize(ppath),
            "payload_refs": n_payload_refs,
            "secs": round(time.perf_counter() - t0, 3),
        }
        layout.write_marker(layout.marker_path(self.out_dir, "partB", part), m)
        return m


# --------------------------------------------------------------------------
# Driver orchestration
# --------------------------------------------------------------------------


def _chunk(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i : i + n]


def build_index(
    input_paths: str | list[str],
    out_dir: str,
    cfg: IndexBuildConfig | None = None,
    resume: bool = True,
    check: bool = False,
) -> dict:
    """Build (or resume) the inverted index; returns the manifest dict.

    Ray must already be initialized by the caller (driver contract).
    ``check=True`` runs the structural invariant checkers after the build
    (the reference's post-build `check` flag,
    ``readwritefuncs.cpp:311-325``).
    """
    cfg = cfg or IndexBuildConfig()
    from oscar_ray.spec.extract import EXTRACTORS

    if cfg.extractor not in EXTRACTORS:
        raise ValueError(
            f"unknown extractor {cfg.extractor!r}; choose from {sorted(EXTRACTORS)}"
        )
    if cfg.index_positions and cfg.payload_dedup:
        raise ValueError(
            "index_positions is mutually exclusive with payload_dedup "
            "(see IndexBuildConfig)"
        )
    if cfg.url_column is None and cfg.dedup_urls:
        from dataclasses import replace

        cfg = replace(cfg, dedup_urls=False)
    frags = list_fragments(input_paths)
    fingerprint = input_fingerprint(frags)
    os.makedirs(out_dir, exist_ok=True)

    manifest = _load_manifest(out_dir)
    matches = bool(
        manifest
        and manifest.get("fingerprint") == fingerprint
        and manifest.get("config") == asdict(cfg)
        and manifest.get("version") == INDEX_FORMAT_VERSION
    )
    if manifest and manifest.get("complete") and matches and resume:
        return manifest
    if manifest and (not matches or not resume):
        # input/config changed, or caller forced a rebuild
        _wipe(out_dir)
        manifest = None

    _write_manifest(
        out_dir,
        {
            "version": INDEX_FORMAT_VERSION,
            "fingerprint": fingerprint,
            "config": asdict(cfg),
            "complete": False,
        },
    )

    shards = [
        {"shard_id": i, "fragments": json.dumps([f.to_dict() for f in chunk])}
        for i, chunk in enumerate(_chunk(frags, cfg.shard_fragments))
    ]
    t_build0 = time.perf_counter()
    phase_walls = {}

    if cfg.rank_column:
        if cfg.id_column:
            raise ValueError("rank_column and id_column are mutually exclusive")
        _assign_rank_docids(frags, cfg, out_dir)
        phase_walls["rank_sort"] = round(time.perf_counter() - t_build0, 3)

    # ---- Stage A (skip shards whose marker exists) ----
    todo = [
        s
        for s in shards
        if layout.read_marker(layout.marker_path(out_dir, "shardA", s["shard_id"])) is None
    ]
    if todo:
        # raw task fan-out: each task is a pure side-effect writer driven by
        # a descriptor (spill files + marker) — the Dataset API adds only
        # per-execution overhead here. Tasks reuse Ray's warm workers.
        cfg_dict = asdict(cfg)
        ray.get(
            [
                _stage_a_task.remote(s["shard_id"], s["fragments"], cfg_dict, out_dir)
                for s in todo
            ]
        )
    stage_a_metrics = [
        layout.read_marker(layout.marker_path(out_dir, "shardA", s["shard_id"]))
        for s in shards
    ]
    phase_walls["stage_a"] = round(time.perf_counter() - t_build0, 3)

    # ---- Dedup + corpus stats (totals come free from stage-A markers) ----
    t_phase = time.perf_counter()
    total_docs = sum(m["docs"] for m in stage_a_metrics)
    total_dl = sum(m["tokens"] for m in stage_a_metrics)
    max_docid = max((m.get("max_docid", -1) for m in stage_a_metrics), default=-1)
    tombstones, stats = _dedup_and_stats(out_dir, cfg, total_docs, total_dl, max_docid)
    phase_walls["dedup_stats"] = round(time.perf_counter() - t_phase, 3)
    t_phase = time.perf_counter()

    # ---- Stage B (skip partitions whose marker exists) ----
    parts = [
        p
        for p in range(cfg.num_partitions)
        if layout.read_marker(layout.marker_path(out_dir, "partB", p)) is None
    ]
    if parts:
        tomb_ref = ray.put(tombstones) if len(tombstones) else None
        cfg_dict = asdict(cfg)
        ray.get(
            [
                _stage_b_task.remote(p, cfg_dict, out_dir, stats, tomb_ref)
                for p in parts
            ]
        )
    part_metrics = [
        layout.read_marker(layout.marker_path(out_dir, "partB", p))
        for p in range(cfg.num_partitions)
    ]

    phase_walls["stage_b"] = round(time.perf_counter() - t_phase, 3)
    manifest = {
        "version": INDEX_FORMAT_VERSION,
        "fingerprint": fingerprint,
        "config": asdict(cfg),
        "stats": stats,
        "shards": stage_a_metrics,
        "partitions": part_metrics,
        "build_secs": round(time.perf_counter() - t_build0, 3),
        "phase_walls": phase_walls,
        "complete": True,
    }
    _write_manifest(out_dir, manifest)
    if cfg.cleanup_spill:
        shutil.rmtree(os.path.join(out_dir, "tmp"), ignore_errors=True)
    if check:
        from oscar_ray.index.check import check_index

        check_index(out_dir)
    return manifest


def _empty_binary(n: int) -> pa.Array:
    """n empty-bytes rows as one zero-copy large_binary array."""
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(np.zeros(n + 1, dtype=np.int64)), pa.py_buffer(b"")],
        children=None,
    )


def _expand_suffix_pairs(
    urow: np.ndarray,
    ucode: np.ndarray,
    tf: np.ndarray,
    terms_py: list[str],
    min_suffix_len: int,
):
    """Add marker-prefixed suffix terms to the (row, term, tf) pairs.

    For every dictionary term t, every proper suffix s with
    len(s) >= min_suffix_len becomes SUFFIX_MARKER+s; a doc's tf for a
    suffix term is the sum of tfs of its tokens having that suffix
    (re-aggregated per (row, suffix)). The full token itself is also
    inserted (its own suffix), so substring queries subsume exact ones.
    """
    from oscar_ray.index.layout import SUFFIX_MARKER

    # per original code: the list of suffix-term codes it expands into
    suffix_terms: list[str] = []
    suffix_code_of: dict[str, int] = {}
    expansions: list[list[int]] = []
    for t in terms_py:
        codes = []
        for i in range(len(t)):
            s = t[i:]
            if len(s) < min_suffix_len:
                break
            st = SUFFIX_MARKER + s
            c = suffix_code_of.get(st)
            if c is None:
                c = len(suffix_terms)
                suffix_code_of[st] = c
                suffix_terms.append(st)
            codes.append(c)
        expansions.append(codes)

    counts = np.fromiter((len(e) for e in expansions), dtype=np.int64, count=len(expansions))
    flat_exp = np.fromiter(
        (c for e in expansions for c in e), dtype=np.int64, count=int(counts.sum())
    )
    exp_offsets = np.concatenate(([0], np.cumsum(counts)))

    n_base = len(terms_py)
    per_pair = counts[ucode]
    rep_row = np.repeat(urow, per_pair)
    rep_tf = np.repeat(tf, per_pair)
    # suffix code per expanded pair: gather each pair's expansion list
    idx = np.concatenate(
        [flat_exp[exp_offsets[c] : exp_offsets[c + 1]] for c in ucode.tolist()]
    ) if len(ucode) else np.empty(0, dtype=np.int64)
    # re-aggregate tf by (row, suffix code): same term-suffix can come from
    # several tokens of the same doc
    key = (rep_row.astype(np.int64) << np.int64(32)) | (idx + n_base)
    order = np.argsort(key, kind="stable")
    key_s, tf_s = key[order], rep_tf[order]
    seg = np.concatenate(([0], np.flatnonzero(np.diff(key_s)) + 1))
    agg_key = key_s[seg]
    agg_tf = np.add.reduceat(tf_s, seg) if len(tf_s) else np.empty(0, dtype=np.int64)

    all_row = np.concatenate((urow, (agg_key >> np.int64(32)).astype(np.int64)))
    all_code = np.concatenate((ucode, (agg_key & np.int64(0xFFFFFFFF)).astype(np.int64)))
    all_tf = np.concatenate((tf, agg_tf))
    return all_row, all_code, all_tf, terms_py + suffix_terms


def _append_field_pairs(
    tbl: pa.Table,
    field_columns: list,
    urow: np.ndarray,
    ucode: np.ndarray,
    tf: np.ndarray,
    terms_py: list[str],
    doclen_per_row: np.ndarray,
):
    """Append one (row, FIELD_MARKER+col+":"+norm(value), tf=1) pair per
    doc per field column. Values are normalized with the pinned tokenizer
    (tokens joined '_'); the marker-term vocabulary is field-cardinality
    sized, so normalization runs once per DISTINCT value (dictionary
    encode), never per row. Zero-token docs get NO field terms — every
    posting keeps the doclen >= tf invariant (C5), and a field filter
    can never surface a doc no text query could ever match."""
    from oscar_ray.index.layout import field_term
    from oscar_ray.spec.tokenizer import tokenize_text

    add_rows, add_codes = [], []
    for col in field_columns:
        fcol = tbl[col]
        if isinstance(fcol, pa.ChunkedArray):
            fcol = fcol.combine_chunks()
        denc = pc.dictionary_encode(fcol)
        codes = denc.indices.to_numpy(zero_copy_only=False)  # float w/ nan for null
        uniq = denc.dictionary.to_pylist()
        term_code_of: list[int] = []
        seen: dict[str, int] = {}
        for v in uniq:
            toks = tokenize_text(str(v)) if v is not None else []
            if not toks:
                term_code_of.append(-1)
                continue
            t = field_term(col, toks)
            c = seen.get(t)  # distinct raw values can normalize equal
            if c is None:
                c = len(terms_py)
                seen[t] = c
                terms_py.append(t)
            term_code_of.append(c)
        tco = np.asarray(term_code_of, dtype=np.int64)
        valid = ~pd_isnull_np(codes) & (doclen_per_row > 0)
        rows = np.flatnonzero(valid)
        mapped = tco[codes[valid].astype(np.int64)]
        ok = mapped >= 0
        add_rows.append(rows[ok])
        add_codes.append(mapped[ok])
    if add_rows:
        ar = np.concatenate(add_rows)
        ac = np.concatenate(add_codes)
        urow = np.concatenate((urow, ar))
        ucode = np.concatenate((ucode, ac))
        tf = np.concatenate((tf, np.ones(len(ar), dtype=tf.dtype)))
    return urow, ucode, tf, terms_py


def pd_isnull_np(codes: np.ndarray) -> np.ndarray:
    """Null mask for dictionary indices materialized as float (NaN=null)."""
    if codes.dtype.kind == "f":
        return np.isnan(codes)
    return np.zeros(len(codes), dtype=bool)


@ray.remote(num_cpus=1)
def _read_rank_column(frag: dict, column: str) -> np.ndarray:
    t = pq.ParquetFile(frag["path"]).read_row_group(frag["row_group"], columns=[column])
    return t[column].to_numpy().astype(np.float64)


#: above this many rows the rank pre-pass runs the distributed
#: range-partition sort instead of the single-driver lexsort
RANK_SORT_DRIVER_LIMIT = 20_000_000


def _rank_desc_key(rank: np.ndarray) -> np.ndarray:
    """Map float64 ranks to uint64 keys whose ASCENDING order equals
    rank DESCENDING (IEEE sortable-bits trick; -0.0 canonicalized to 0.0
    so the total order matches float comparison; NaN rejected)."""
    r = np.asarray(rank, dtype=np.float64)
    if np.isnan(r).any():
        raise ValueError("rank_column contains NaN")
    r = np.where(r == 0.0, 0.0, r)  # collapse -0.0
    u = r.view(np.uint64)
    asc = np.where(r >= 0, u ^ np.uint64(1 << 63), ~u)
    return ~asc  # descending


def _assign_rank_docids(frags, cfg: IndexBuildConfig, out_dir: str) -> None:
    """Pre-pass for rank_column mode: global sort by (rank desc, input
    position asc) -> docid = sort position; per-fragment remap files.

    The applySort analog (``OsmKeyValueObjectStore.cpp:1339-1399``).
    Small inputs sort driver-side (one float per row); above
    RANK_SORT_DRIVER_LIMIT the distributed range-partition sort runs
    instead — both produce the SAME remap artifacts (the remap CONTRACT,
    remap/frag-N.parquet column 'docid' aligned to fragment rows, is
    what stage A depends on, not the sort's location; equality tested).
    """
    marker = layout.marker_path(out_dir, "rankmap", 0)
    if layout.read_marker(marker) is not None:
        return
    total = sum(f.num_rows for f in frags)
    if total > RANK_SORT_DRIVER_LIMIT:
        _assign_rank_docids_distributed(frags, cfg, out_dir)
        layout.write_marker(marker, {"rows": int(total), "mode": "distributed"})
        return
    ranks = ray.get(
        [_read_rank_column.remote(f.to_dict(), cfg.rank_column) for f in frags]
    )
    flat = np.concatenate(ranks) if ranks else np.empty(0)
    order = np.lexsort((np.arange(len(flat)), -flat))
    docid_of_orig = np.empty(len(flat), dtype=np.int64)
    docid_of_orig[order] = np.arange(len(flat))
    os.makedirs(os.path.join(out_dir, "remap"), exist_ok=True)
    for f in frags:
        seg = docid_of_orig[f.base_docid : f.base_docid + f.num_rows]
        pq.write_table(
            pa.table({"docid": pa.array(seg)}),
            os.path.join(out_dir, "remap", f"frag-{f.base_docid}.parquet"),
            **_PARQUET_WRITE_OPTS,
        )
    layout.write_marker(marker, {"rows": int(len(flat)), "mode": "driver"})


@ray.remote(num_cpus=1)
def _rank_sample_task(frag: dict, column: str, stride: int):
    r = pq.ParquetFile(frag["path"]).read_row_group(
        frag["row_group"], columns=[column]
    )[column].to_numpy().astype(np.float64)
    return len(r), _rank_desc_key(r)[::stride].copy()


@ray.remote(num_cpus=1)
def _rank_bucket_task(
    frag: dict, column: str, bounds: np.ndarray, out_dir: str
) -> np.ndarray:
    """Assign this fragment's rows to key-range buckets; spill (key, pos)
    per bucket; return per-bucket counts."""
    base = int(frag["base_docid"])
    r = pq.ParquetFile(frag["path"]).read_row_group(
        frag["row_group"], columns=[column]
    )[column].to_numpy().astype(np.float64)
    key = _rank_desc_key(r)
    pos = base + np.arange(len(r), dtype=np.int64)
    bucket = np.searchsorted(bounds, key, side="right")
    counts = np.bincount(bucket, minlength=len(bounds) + 1).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    key, pos, bucket = key[order], pos[order], bucket[order]
    cuts = np.concatenate(([0], np.flatnonzero(np.diff(bucket)) + 1, [len(bucket)]))
    for s, e in zip(cuts[:-1], cuts[1:]):
        b = int(bucket[s])
        d = os.path.join(out_dir, "tmp", "ranksort", f"bucket-{b:05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {"key": pa.array(key[s:e].view(np.int64)), "pos": pa.array(pos[s:e])}
            ),
            os.path.join(d, f"frag-{base}.parquet"),
            **_SPILL_WRITE_OPTS,
        )
    return counts


@ray.remote(num_cpus=1)
def _rank_sort_bucket_task(
    out_dir: str, bucket: int, offset: int, frag_bases: np.ndarray
) -> int:
    """Sort one bucket by (key asc == rank desc, pos asc), assign docids
    from the bucket's global offset, spill (pos, docid) per fragment."""
    d = os.path.join(out_dir, "tmp", "ranksort", f"bucket-{bucket:05d}")
    if not os.path.isdir(d):
        return 0
    files = sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
    t = pa.concat_tables(pq.read_table(f) for f in files)
    key = t["key"].to_numpy().view(np.uint64)
    pos = t["pos"].to_numpy()
    order = np.lexsort((pos, key))
    pos = pos[order]
    docid = offset + np.arange(len(pos), dtype=np.int64)
    fidx = np.searchsorted(frag_bases, pos, side="right") - 1
    o2 = np.argsort(fidx, kind="stable")
    pos, docid, fidx = pos[o2], docid[o2], fidx[o2]
    cuts = np.concatenate(([0], np.flatnonzero(np.diff(fidx)) + 1, [len(fidx)]))
    for s, e in zip(cuts[:-1], cuts[1:]):
        fb = int(frag_bases[fidx[s]])
        pd_dir = os.path.join(out_dir, "tmp", "ranksort", "parts", f"frag-{fb}")
        os.makedirs(pd_dir, exist_ok=True)
        pq.write_table(
            pa.table({"pos": pa.array(pos[s:e]), "docid": pa.array(docid[s:e])}),
            os.path.join(pd_dir, f"bucket-{bucket:05d}.parquet"),
            **_SPILL_WRITE_OPTS,
        )
    return len(pos)


@ray.remote(num_cpus=1)
def _rank_emit_frag_task(out_dir: str, base: int, num_rows: int) -> int:
    """Gather a fragment's (pos, docid) parts, write the remap artifact
    (byte-identical contract to the driver path)."""
    pd_dir = os.path.join(out_dir, "tmp", "ranksort", "parts", f"frag-{base}")
    files = (
        sorted(os.path.join(pd_dir, f) for f in os.listdir(pd_dir))
        if os.path.isdir(pd_dir)
        else []
    )
    t = pa.concat_tables(pq.read_table(f) for f in files)
    pos = t["pos"].to_numpy()
    docid = t["docid"].to_numpy()
    assert len(pos) == num_rows, (base, len(pos), num_rows)
    seg = np.empty(num_rows, dtype=np.int64)
    seg[pos - base] = docid
    os.makedirs(os.path.join(out_dir, "remap"), exist_ok=True)
    pq.write_table(
        pa.table({"docid": pa.array(seg)}),
        os.path.join(out_dir, "remap", f"frag-{base}.parquet"),
        **_PARQUET_WRITE_OPTS,
    )
    return num_rows


def _assign_rank_docids_distributed(
    frags, cfg: IndexBuildConfig, out_dir: str, num_buckets: int = 64
) -> None:
    """Distributed applySort: sample -> key-range boundaries (chosen at
    DISTINCT key values so equal ranks share a bucket and the in-bucket
    (key, pos) sort reproduces the driver path's tie order exactly) ->
    per-fragment bucket spill -> per-bucket sort + docid assignment from
    exact prefix-sum offsets -> per-fragment remap emit. Nothing
    corpus-sized on the driver (samples + bucket counts only)."""
    stride = max(1, sum(f.num_rows for f in frags) // (num_buckets * 4096) or 1)
    samples = ray.get(
        [_rank_sample_task.remote(f.to_dict(), cfg.rank_column, stride) for f in frags]
    )
    keys = np.sort(np.concatenate([s[1] for s in samples]))
    distinct = np.unique(keys)
    if len(distinct) > 1:
        qpos = np.linspace(0, len(distinct) - 1, num_buckets + 1)[1:-1]
        bounds = np.unique(distinct[qpos.astype(np.int64)])
    else:
        bounds = np.empty(0, dtype=np.uint64)
    counts = ray.get(
        [
            _rank_bucket_task.remote(f.to_dict(), cfg.rank_column, bounds, out_dir)
            for f in frags
        ]
    )
    total_counts = np.sum(np.stack(counts), axis=0)
    offsets = np.concatenate(([0], np.cumsum(total_counts)[:-1]))
    frag_bases = np.array(sorted(f.base_docid for f in frags), dtype=np.int64)
    ray.get(
        [
            _rank_sort_bucket_task.remote(out_dir, b, int(offsets[b]), frag_bases)
            for b in range(len(bounds) + 1)
        ]
    )
    ray.get(
        [
            _rank_emit_frag_task.remote(out_dir, f.base_docid, f.num_rows)
            for f in frags
        ]
    )
    shutil.rmtree(os.path.join(out_dir, "tmp", "ranksort"), ignore_errors=True)


@ray.remote(num_cpus=1)
def _stage_a_task(shard_id: int, fragments_json: str, cfg: dict, out_dir: str) -> int:
    """Raw-task wrapper for stage A (worker construction is trivially cheap)."""
    TokenizeShardWorker(cfg, out_dir)._process_shard(shard_id, json.loads(fragments_json))
    return shard_id


@ray.remote(num_cpus=1)
def _stage_b_task(part: int, cfg: dict, out_dir: str, stats: dict, tombstones_ref) -> int:
    """Raw-task wrapper for stage B."""
    AssemblePartitionWorker(cfg, out_dir, stats, tombstones_ref)._assemble(part)
    return part


@ray.remote(num_cpus=1)
def _dedup_part_task(out_dir: str, url_part: int, use_canonical: bool = False) -> tuple:
    """Find tombstones within one url-hash partition of docmeta.

    All rows of any url live in exactly one partition (crc32 routing at
    stage-A write — on the CANONICAL url when canonical_url_dedup, so
    variants still co-locate), so dedup needs no exchange: sort by
    (url, docid), mark every row whose url equals its predecessor's.
    """
    files = layout.docmeta_files(out_dir, url_part)
    if not files:
        return np.empty(0, dtype=np.int64), 0
    key_col = "curl" if use_canonical else "url"
    t = pa.concat_tables(
        pq.read_table(f, columns=["docid", key_col, "doclen"]) for f in files
    )
    import pandas as pd

    df = pd.DataFrame(
        {
            "docid": t["docid"].to_numpy(),
            "url": t[key_col].to_pylist(),
            "doclen": t["doclen"].to_numpy(),
        }
    ).sort_values(["url", "docid"], kind="mergesort")
    dup_mask = df["url"].to_numpy()[1:] == df["url"].to_numpy()[:-1]
    mask = np.concatenate(([False], dup_mask))
    return df["docid"].to_numpy()[mask], int(df["doclen"].to_numpy()[mask].sum())


def _dedup_and_stats(
    out_dir: str,
    cfg: IndexBuildConfig,
    total_docs: int,
    total_dl: int,
    max_docid: int = -1,
):
    """Exact URL dedup; corpus totals are passed in from stage-A markers.

    The `removeDuplicates` analog (``OsmKeyValueObjectStore.cpp:1110-1116``).
    Because docmeta is url-hash-partitioned at write time, dedup is an
    embarrassingly parallel per-partition raw-task scan — the exchange
    already happened as part of the stage-A spill, and no groupby shuffle
    is needed.
    """

    def _stats(n_tomb: int, tomb_dl: int) -> dict:
        n_docs = total_docs - n_tomb
        sum_dl = total_dl - tomb_dl
        return {
            "n_docs": n_docs,
            "total_docs": total_docs,
            # the docid SPACE bound (>= n_docs - 1: tombstones leave
            # holes, id_column docids may be sparse) — range partitioners
            # must use this, never the live-doc count
            "max_docid": max_docid,
            "n_duplicates": n_tomb,
            "sum_doclen": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        }

    if not cfg.dedup_urls:
        return np.empty(0, dtype=np.int64), _stats(0, 0)

    results = ray.get(
        [
            _dedup_part_task.remote(out_dir, p, cfg.canonical_url_dedup)
            for p in range(cfg.url_partitions)
        ]
    )
    tombstones = np.sort(np.concatenate([r[0] for r in results])).astype(np.int64)
    tomb_dl = int(sum(r[1] for r in results))
    # persist as an artifact: dedup lineage, external consumers, and the
    # >10^9-doc path where stage B range-slices this sorted file instead
    # of taking a ray.put broadcast (SCALE.md)
    pq.write_table(
        pa.table({"docid": pa.array(tombstones)}),
        os.path.join(out_dir, "tombstones.parquet"),
        row_group_size=1 << 20,
        **_PARQUET_WRITE_OPTS,
    )
    return tombstones, _stats(len(tombstones), tomb_dl)


def _load_manifest(out_dir: str) -> dict | None:
    p = layout.manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    p = layout.manifest_path(out_dir)
    tmp = p + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(tmp, p)


def _wipe(out_dir: str) -> None:
    for sub in ("docmeta", "postings", "dict", "tmp", "remap"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
