"""Incremental index maintenance: delta build -> merge -> URL replacement.

The user-facing update loop over :mod:`oscar_ray.index.merge`'s segment
merge — the analog of the reference's two-stage store-dir/search-dir
reuse (``oscar-create/oscarcreate.cpp:82-116``: rebuild the search
structures over an existing store plus new input, without re-ingesting
the store). Here:

1. the NEW docs are indexed as an independent delta segment with the
   base's exact config (cheap, isolated failure domain);
2. base + delta merge (docid spaces made disjoint, payloads spliced
   byte-for-byte — ``merge.merge_indexes``);
3. CROSS-SEGMENT url duplicates are resolved tombstone-aware: a
   per-url-hash-partition scan of the merged docmeta (the same
   no-exchange shape as build-time dedup) finds urls present in both
   segments, and the losing copies become tombstones;
4. every partition is re-assembled through the SAME stage-B code path
   as a fresh build (decode -> spill rows -> ``_stage_b_task`` with the
   post-replacement corpus stats), so with ``policy="keep_first"`` the
   result is BYTE-IDENTICAL to a from-scratch build over the union of
   the inputs — postings, dictionaries, stats, and tombstone artifacts
   alike (tested, including ``payload_dedup``). With zero cross-segment
   collisions the re-assembly is skipped: payloads are still identical,
   stats equal, and queries rank-identical; only the block-max column
   keeps merge's sound upper bound instead of the exact maximum.

Policies:
- ``keep_first`` (default): the earliest docid of a url survives —
  exactly ``build_index``'s union dedup semantics.
- ``keep_last``: the NEWEST copy survives (doc REPLACEMENT: the delta's
  version of a url supersedes the base's).

Scale notes: the dup scan is one task per url partition (no shuffle —
docmeta is url-hash-partitioned at write time); the re-assembly is one
task per term partition. The prior-tombstone filter ships the merged
tombstone artifact as one broadcast ref; past ~10^9 tombstones it
should range-slice ``tombstones.parquet`` per url partition instead
(same discipline as SCALE.md's stage-B note).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from oscar_ray.index import layout
from oscar_ray.index.build import (
    _PARQUET_WRITE_OPTS,
    _SPILL_WRITE_OPTS,
    IndexBuildConfig,
    _stage_b_task,
    _write_manifest,
    build_index,
)
from oscar_ray.index.merge import merge_indexes
from oscar_ray.stages.codecs import decode_postings


@ray.remote(num_cpus=1)
def _cross_dup_task(
    index_dir: str, url_part: int, prior_ref, policy: str
) -> tuple[np.ndarray, int]:
    """Find NEW tombstones in one url partition of the merged docmeta:
    duplicate urls (keep first or last docid per policy) minus docids
    already tombstoned inside an input segment.
    -> (new tombstone docids, their summed doclen)."""
    files = layout.docmeta_files(index_dir, url_part)
    if not files:
        return np.empty(0, dtype=np.int64), 0
    t = pa.concat_tables(
        pq.read_table(f, columns=["docid", "url", "doclen"]) for f in files
    )
    df = pd.DataFrame(
        {
            "docid": t["docid"].to_numpy(),
            "url": t["url"].to_pylist(),
            "doclen": t["doclen"].to_numpy(),
        }
    ).sort_values(["url", "docid"], kind="mergesort")
    # drop docids already tombstoned inside an input segment FIRST: they
    # have no postings, so they can neither survive (keep_last would
    # otherwise pick a dead copy) nor need tombstoning again
    prior = ray.get(prior_ref) if isinstance(prior_ref, ray.ObjectRef) else prior_ref
    if prior is not None and len(prior):
        df = df[~np.isin(df["docid"].to_numpy(), prior)]
    if not len(df):
        return np.empty(0, dtype=np.int64), 0
    urls = df["url"].to_numpy()
    if policy == "keep_first":
        dup = np.concatenate(([False], urls[1:] == urls[:-1]))
    elif policy == "keep_last":
        dup = np.concatenate((urls[:-1] == urls[1:], [False]))
    else:
        raise ValueError(f"unknown policy {policy!r}")
    ids = df["docid"].to_numpy()[dup]
    dls = df["doclen"].to_numpy()[dup]
    return ids.astype(np.int64), int(dls.sum())


@ray.remote(num_cpus=1)
def _respill_partition_task(index_dir: str, part: int, cfg: dict) -> int:
    """Decode one merged partition's postings back into stage-A spill
    rows (term dict / docid / tf / doclen) so the standard stage-B
    assembly can re-run with the post-replacement corpus stats. Returns
    the row count."""
    from oscar_ray.index.reader import resolve_payload_refs

    ppath = layout.postings_path(index_dir, part)
    codec = cfg.get("docid_codec", "varint")
    t = pq.read_table(ppath)
    if "payload_row" in t.column_names:
        t = resolve_payload_refs(t)
    # the positional sidecar must survive maintenance: decode each
    # block's flat positions and re-encode them per (term,doc) pair —
    # the stage-A spill layout stage-B reassembly expects
    has_pos = bool(cfg.get("index_positions")) and "poss" in t.column_names
    if has_pos:
        from oscar_ray.stages.codecs import (
            decode_positions,
            encode_positions_segmented,
        )
    term_code: dict[str, int] = {}
    terms: list[str] = []
    code_chunks, id_chunks, tf_chunks, dl_chunks, pos_chunks = [], [], [], [], []
    for i in range(t.num_rows):
        cnt = t["doc_count"][i].as_py()
        ids, tfs, dls = decode_postings(
            t["docs"][i].as_py(),
            t["tfs"][i].as_py(),
            t["dls"][i].as_py(),
            count=cnt,
            codec=codec,
        )
        term = t["term"][i].as_py()
        c = term_code.get(term)
        if c is None:
            c = len(terms)
            term_code[term] = c
            terms.append(term)
        code_chunks.append(np.full(len(ids), c, dtype=np.int32))
        id_chunks.append(ids.astype(np.int64))
        tf_chunks.append(tfs.astype(np.int32))
        dl_chunks.append(dls.astype(np.int32))
        if has_pos:
            raw = t["poss"][i].as_py()
            if not raw:
                # marker-namespace row (suffix / field terms): tf entries
                # exist but positions are empty by design — re-emit one
                # empty per-pair payload per posting, as stage A wrote them
                pos_chunks.append(
                    encode_positions_segmented(
                        np.empty(0, dtype=np.int64),
                        np.zeros(len(ids), dtype=np.int64),
                    )
                )
            else:
                tfs64 = tfs.astype(np.int64)
                flat = decode_positions(raw, tfs64)
                starts = np.zeros(len(tfs64), dtype=np.int64)
                np.cumsum(tfs64[:-1], out=starts[1:])
                pos_chunks.append(encode_positions_segmented(flat, starts))
    n = int(sum(len(x) for x in id_chunks))
    spill = pa.table(
        {
            "term": pa.DictionaryArray.from_arrays(
                pa.array(
                    np.concatenate(code_chunks)
                    if code_chunks
                    else np.empty(0, dtype=np.int32)
                ),
                pa.array(terms, type=pa.string()),
            ),
            "docid": pa.array(
                np.concatenate(id_chunks) if id_chunks else np.empty(0, np.int64),
                type=pa.int64(),
            ),
            "tf": pa.array(
                np.concatenate(tf_chunks) if tf_chunks else np.empty(0, np.int32),
                type=pa.int32(),
            ),
            "doclen": pa.array(
                np.concatenate(dl_chunks) if dl_chunks else np.empty(0, np.int32),
                type=pa.int32(),
            ),
        }
    )
    if has_pos:
        spill = spill.append_column(
            "pos",
            pa.concat_arrays(pos_chunks)
            if pos_chunks
            else pa.array([], type=pa.large_binary()),
        )
    path = layout.spill_path(index_dir, part, 0)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(spill, path, **_SPILL_WRITE_OPTS)
    return n


def update_index(
    base_dir: str,
    new_input: str,
    out_dir: str,
    policy: str = "keep_first",
    delta_dir: str | None = None,
    keep_delta: bool = False,
) -> dict:
    """Incrementally extend ``base_dir`` with ``new_input`` into
    ``out_dir``; returns the updated manifest. See module docstring."""
    with open(layout.manifest_path(base_dir)) as f:
        base_manifest = json.load(f)
    cfg_dict = dict(base_manifest["config"])
    cfg = IndexBuildConfig(**cfg_dict)

    delta = delta_dir or (out_dir.rstrip("/") + ".delta")
    build_index(new_input, delta, cfg)
    manifest = merge_indexes([base_dir, delta], out_dir)
    if not keep_delta:
        shutil.rmtree(delta, ignore_errors=True)

    if not cfg.dedup_urls:
        return manifest  # replacement is URL-keyed; nothing to resolve

    # prior tombstones (already absent from both inputs' postings): the
    # merge rewrote docmeta shifted, so shift each input's artifact by
    # its recorded offset before excluding
    prior_parts = []
    for d, off in zip(manifest["merged_from"], manifest["input_offsets"]):
        tp = os.path.join(d, "tombstones.parquet")
        if os.path.exists(tp):
            ids = pq.read_table(tp)["docid"].to_numpy()
            prior_parts.append(ids.astype(np.int64) + np.int64(off))
    prior = (
        np.sort(np.concatenate(prior_parts))
        if prior_parts
        else np.empty(0, dtype=np.int64)
    )
    prior_ref = ray.put(prior)

    outs = ray.get(
        [
            _cross_dup_task.remote(out_dir, p, prior_ref, policy)
            for p in range(cfg.url_partitions)
        ]
    )
    new_tombs = np.sort(np.concatenate([o[0] for o in outs])).astype(np.int64)
    new_dl = int(sum(o[1] for o in outs))

    stats = dict(manifest["stats"])
    if len(new_tombs):
        stats["n_docs"] -= int(len(new_tombs))
        stats["n_duplicates"] += int(len(new_tombs))
        stats["sum_doclen"] -= new_dl
        stats["avgdl"] = stats["sum_doclen"] / stats["n_docs"] if stats["n_docs"] else 0.0

        # re-assemble EVERY partition through the standard stage-B path:
        # avgdl changed, so block-max metadata must be exact for the new
        # corpus (merge's upper bound is sound but not build-identical)
        ray.get(
            [
                _respill_partition_task.remote(out_dir, p, cfg_dict)
                for p in range(cfg.num_partitions)
            ]
        )
        tomb_ref = ray.put(new_tombs)
        ray.get(
            [
                _stage_b_task.remote(p, cfg_dict, out_dir, stats, tomb_ref)
                for p in range(cfg.num_partitions)
            ]
        )

    # merged tombstone artifact = prior (shifted) + new, sorted — the
    # same lineage a from-scratch union build would write
    all_tombs = np.sort(np.concatenate([prior, new_tombs])).astype(np.int64)
    pq.write_table(
        pa.table({"docid": pa.array(all_tombs)}),
        os.path.join(out_dir, "tombstones.parquet"),
        row_group_size=1 << 20,
        **_PARQUET_WRITE_OPTS,
    )

    manifest["stats"] = stats
    manifest["partitions"] = [
        layout.read_marker(layout.marker_path(out_dir, "partB", p))
        for p in range(cfg.num_partitions)
    ]
    shutil.rmtree(os.path.join(out_dir, "tmp"), ignore_errors=True)
    manifest["maintained"] = {
        "policy": policy,
        "new_tombstones": int(len(new_tombs)),
        "delta_input": os.path.abspath(new_input),
    }
    _write_manifest(out_dir, manifest)
    return manifest
