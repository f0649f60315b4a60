"""Index segment merge: combine built indexes into one queryable index.

The incremental-growth operator a 10^12-doc corpus needs: new crawl
batches are indexed independently (cheap, isolated failure domains),
then merged — the classic search-engine segment merge, re-expressed for
this layout.

Why the merge is nearly free here:
- docid spaces are made disjoint by shifting each input by an offset
  rounded up to a multiple of the block span, so every (term, block_id)
  row keeps its internal delta-encoded payload byte-for-byte — only the
  FIRST varint of each docid stream (the absolute base) is re-spliced,
  and block_ids shift by ``offset >> block_span_bits``.
- per-term df/cf add; (term, block) collisions are impossible across
  inputs, so per-partition merge = concat + sort.
- block-max metadata is recomputed for the merged corpus's avgdl from
  the stored avgdl-independent ingredients (max_tf, min_dl) — an upper
  bound for ANY avgdl, so pruning stays sound.

Alignment property: if every input's docid span is already a multiple of
the block span (or is the last input), offsets equal cumulative doc
spans — indexing inputs separately and merging yields the SAME docids as
one build over the concatenated inputs (tested).

Not handled across inputs: URL dedup (each input deduped internally;
cross-segment dedup = run the exact-dedup op over merged docmeta and
rebuild with tombstones).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from oscar_ray.index import layout
from oscar_ray.index.build import (
    _PARQUET_WRITE_OPTS,
    INDEX_FORMAT_VERSION,
    IndexBuildConfig,
    _write_manifest,
)
from oscar_ray.spec.bm25 import BM25Params, bm25_tf_norm
from oscar_ray.stages.codecs import varint_decode, varint_encode


def _shift_docs_payload(docs: bytes, offset: int) -> bytes:
    """Add `offset` to the absolute first docid of a delta+varint stream."""
    if not docs or offset == 0:
        return docs
    raw = np.frombuffer(docs, dtype=np.uint8)
    # length of the first varint
    end = 0
    while raw[end] & 0x80:
        end += 1
    end += 1
    first = int(varint_decode(raw[:end], count=1)[0])
    return varint_encode(np.array([first + offset], dtype=np.uint64)) + docs[end:]


@ray.remote(num_cpus=1)
def _merge_partition(part: int, in_dirs: list[str], offsets: list[int],
                     out_dir: str, cfg: dict, avgdl: float) -> int:
    cfg = IndexBuildConfig(**cfg)
    span_bits = cfg.block_span_bits
    params = BM25Params(k1=cfg.k1, b=cfg.b)
    tables = []
    for d, off in zip(in_dirs, offsets):
        path = layout.postings_path(d, part)
        if not os.path.exists(path):
            continue
        t = pq.read_table(path)
        if "payload_row" in t.column_names:
            # payload-dedup source: materialize the indirections before
            # splicing (the merged file is written without refs)
            from oscar_ray.index.reader import resolve_payload_refs

            t = resolve_payload_refs(t)
        if t.num_rows and off:
            t = t.set_column(
                t.schema.get_field_index("block_id"),
                "block_id",
                pa.array(t["block_id"].to_numpy() + (off >> span_bits)),
            )
            if cfg.docid_codec in ("eliasfano", "rlede", "wah"):
                # these streams have no splice-able absolute head: decode,
                # shift, re-encode per block (blocks are span-capped)
                from oscar_ray.stages.codecs import (
                    decode_docid_stream,
                    encode_docid_stream,
                )

                counts = t["doc_count"].to_numpy()
                shifted = [
                    encode_docid_stream(
                        decode_docid_stream(b, int(c), cfg.docid_codec)
                        + np.uint64(off),
                        cfg.docid_codec,
                    )
                    for b, c in zip(t["docs"].to_pylist(), counts)
                ]
            else:
                shifted = [_shift_docs_payload(b, off) for b in t["docs"].to_pylist()]
            t = t.set_column(
                t.schema.get_field_index("docs"),
                "docs",
                pa.array(shifted, type=pa.binary()),
            )
        tables.append(t)
    merged = pa.concat_tables(tables) if tables else None
    if merged is not None and merged.num_rows:
        # recompute block-max for the merged avgdl from (max_tf, min_dl)
        mt = merged["max_tf"].to_numpy().astype(np.float64)
        md = merged["min_dl"].to_numpy().astype(np.float64)
        new_tfn = bm25_tf_norm(mt, md, max(avgdl, 1e-9), params)
        merged = merged.set_column(
            merged.schema.get_field_index("max_tfn"), "max_tfn",
            pa.array(new_tfn, type=pa.float64()),
        )
        merged = merged.sort_by([("term", "ascending"), ("block_id", "ascending")])
    if merged is None:
        # no input contributed rows for this partition: write an empty
        # v2-schema postings table (never re-read a file whose absence is
        # exactly what made `merged` None)
        merged = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "block_id": pa.array([], type=pa.int64()),
                "doc_count": pa.array([], type=pa.int64()),
                "sum_tf": pa.array([], type=pa.int64()),
                "max_tfn": pa.array([], type=pa.float64()),
                "max_tf": pa.array([], type=pa.int64()),
                "min_dl": pa.array([], type=pa.int64()),
                "docs": pa.array([], type=pa.binary()),
                "tfs": pa.array([], type=pa.binary()),
                "dls": pa.array([], type=pa.binary()),
            }
        )
    ppath = layout.postings_path(out_dir, part)
    os.makedirs(os.path.dirname(ppath), exist_ok=True)
    pq.write_table(merged, ppath, row_group_size=4096, **_PARQUET_WRITE_OPTS)

    # dictionary: concat + per-term sum
    dicts = [
        pq.read_table(layout.dict_path(d, part))
        for d in in_dirs
        if os.path.exists(layout.dict_path(d, part))
    ]
    dt = pa.concat_tables(dicts) if dicts else pa.table(
        {"term": pa.array([], type=pa.string()),
         "df": pa.array([], type=pa.int64()),
         "cf": pa.array([], type=pa.int64())}
    )
    if dt.num_rows:
        g = dt.group_by("term").aggregate([("df", "sum"), ("cf", "sum")])
        dt = pa.table(
            {"term": g["term"], "df": g["df_sum"].cast(pa.int64()),
             "cf": g["cf_sum"].cast(pa.int64())}
        ).sort_by("term")
    dpath = layout.dict_path(out_dir, part)
    os.makedirs(os.path.dirname(dpath), exist_ok=True)
    pq.write_table(dt, dpath, **_PARQUET_WRITE_OPTS)
    layout.write_marker(
        layout.marker_path(out_dir, "partB", part),
        {"part": part, "merged_from": len(in_dirs), "terms": int(dt.num_rows),
         "blocks": int(merged.num_rows), "rows": int(merged.num_rows),
         "postings_bytes": os.path.getsize(ppath), "secs": 0.0},
    )
    return part


def merge_indexes(in_dirs: list[str], out_dir: str) -> dict:
    """Merge >= 2 built indexes (identical configs) into out_dir."""
    manifests = []
    for d in in_dirs:
        with open(layout.manifest_path(d)) as f:
            m = json.load(f)
        if not m.get("complete"):
            raise ValueError(f"index {d} incomplete")
        manifests.append(m)
    cfg0 = dict(manifests[0]["config"])
    for m in manifests[1:]:
        c = dict(m["config"])
        for key in ("num_partitions", "block_span_bits", "k1", "b", "index_suffixes",
                    "min_suffix_len", "docid_codec", "field_columns",
                    "index_positions"):
            if c.get(key) != cfg0.get(key):
                raise ValueError(f"config mismatch on {key}: {c.get(key)} != {cfg0.get(key)}")
    cfg = IndexBuildConfig(**cfg0)
    span = 1 << cfg.block_span_bits

    # docid spans from docmeta (max docid + 1 per input)
    offsets = []
    base = 0
    spans = []
    for d in in_dirs:
        max_id = -1
        for f in layout.docmeta_files(d):
            col = pq.read_table(f, columns=["docid"])["docid"].to_numpy()
            if len(col):
                max_id = max(max_id, int(col.max()))
        spans.append(max_id + 1)
        offsets.append(base)
        base += ((max_id + 1 + span - 1) // span) * span

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    # docmeta: rewrite shifted per input (shard ids renumbered per input)
    shard = 0
    for d, off in zip(in_dirs, offsets):
        for f in layout.docmeta_files(d):
            t = pq.read_table(f)
            if off:
                t = t.set_column(
                    t.schema.get_field_index("docid"), "docid",
                    pa.array(t["docid"].to_numpy() + off),
                )
            import re as _re

            m = _re.search(r"part=(\d+)", f)
            upart = int(m.group(1)) if m else None
            mp = layout.docmeta_path(out_dir, shard, upart)
            os.makedirs(os.path.dirname(mp), exist_ok=True)
            pq.write_table(t, mp, **_PARQUET_WRITE_OPTS)
            shard += 1

    # merged corpus stats
    n_docs = sum(m["stats"]["n_docs"] for m in manifests)
    total_docs = sum(m["stats"]["total_docs"] for m in manifests)
    sum_dl = sum(m["stats"]["sum_doclen"] for m in manifests)
    avgdl = sum_dl / n_docs if n_docs else 0.0
    stats = {
        "n_docs": n_docs, "total_docs": total_docs,
        # docid space of the merged index: exact per-input bounds were
        # already scanned from docmeta above (spans[i] = max docid + 1) —
        # never fall back to total_docs, which under-reports sparse
        # id_column spaces and would silently shrink facet match plans
        "max_docid": max(
            off + sp - 1 for off, sp in zip(offsets, spans)
        ),
        "n_duplicates": sum(m["stats"]["n_duplicates"] for m in manifests),
        "sum_doclen": sum_dl, "avgdl": avgdl,
    }

    ray.get(
        [
            _merge_partition.remote(p, in_dirs, offsets, out_dir, cfg0, avgdl)
            for p in range(cfg.num_partitions)
        ]
    )
    part_metrics = [
        layout.read_marker(layout.marker_path(out_dir, "partB", p))
        for p in range(cfg.num_partitions)
    ]
    manifest = {
        "version": INDEX_FORMAT_VERSION,
        "fingerprint": "merge:" + "+".join(m["fingerprint"] for m in manifests),
        "config": cfg0,
        "stats": stats,
        "shards": [m2 for m in manifests for m2 in m["shards"]],
        "partitions": part_metrics,
        "merged_from": [os.path.abspath(d) for d in in_dirs],
        "input_offsets": offsets,
        "complete": True,
    }
    _write_manifest(out_dir, manifest)
    return manifest
