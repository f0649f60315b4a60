"""Structural invariant checkers for a built index.

The `--check index|store|gh|geocell` analog
(``oscar-cmd/ConsistencyCheckers.cpp``, SURVEY.md §5.3): machine-checkable
invariants over the artifacts, runnable as a CLI work item
(``scripts/oscar_cmd.py check``) or post-build (``build_index(...,
check=True)``). Each partition is checked independently (parallelizable;
run serially here — the checks are read-only streaming scans).

Invariants:
  C1  manifest complete; partition/shard metrics present
  C2  postings: docids strictly ascending unique within every block
      (`MatchDesc::isConsistent`), block ranges honor block_span_bits
  C3  per-term df == sum of its blocks' doc_counts == dict df;
      cf == sum of sum_tf == dict cf
  C4  block max_tfn >= every member's tf-norm (block-max soundness)
  C5  tf >= 1, doclen >= tf for every posting
  C6  docmeta: docids unique; every postings docid exists in docmeta;
      doclen in postings == docmeta doclen
  C7  url-hash partitioning: every docmeta row sits in its crc32 partition
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow.parquet as pq

from oscar_ray.index import layout
from oscar_ray.index.reader import IndexReader
from oscar_ray.spec.bm25 import bm25_tf_norm
from oscar_ray.stages.codecs import decode_postings


class IndexCheckError(AssertionError):
    pass


def check_index(index_dir: str, sample_blocks: int | None = None) -> dict:
    """Run all invariant checks; raises IndexCheckError on first violation.

    Returns summary counters. ``sample_blocks`` limits per-partition block
    decoding (None = exhaustive).
    """
    reader = IndexReader(index_dir)
    manifest = reader.manifest
    if not manifest.get("complete"):
        raise IndexCheckError("C1: manifest not complete")
    if any(m is None for m in manifest["partitions"]):
        raise IndexCheckError("C1: missing partition metrics")

    span = 1 << reader.block_span_bits
    avgdl = reader.avgdl
    params = reader.params

    # docmeta: docid -> doclen (C6, C7)
    meta_doclen: dict[int, int] = {}
    for f in layout.docmeta_files(index_dir):
        m = re.search(r"part=(\d+)", f)
        t = pq.read_table(f, columns=["docid", "url", "doclen"])
        ids = t["docid"].to_numpy()
        for d, dl in zip(ids.tolist(), t["doclen"].to_numpy().tolist()):
            if d in meta_doclen:
                raise IndexCheckError(f"C6: duplicate docid {d} in docmeta")
            meta_doclen[d] = dl
        if m is not None:
            want_part = int(m.group(1))
            n_url_parts = manifest["config"]["url_partitions"]
            for u in t["url"].to_pylist():
                if layout.term_partition(u, n_url_parts) != want_part:
                    raise IndexCheckError(f"C7: url {u!r} misrouted to part {want_part}")

    meta_ids = np.array(sorted(meta_doclen), dtype=np.int64)
    meta_dls = np.array([meta_doclen[int(d)] for d in meta_ids], dtype=np.int64)
    if len(meta_ids) == 0:
        meta_ids = np.array([-1], dtype=np.int64)
        meta_dls = np.array([-1], dtype=np.int64)

    n_blocks = n_terms = n_postings = 0
    for part in range(reader.num_partitions):
        ppath = layout.postings_path(index_dir, part)
        if not os.path.exists(ppath):
            raise IndexCheckError(f"C1: missing postings file for part {part}")
        t = pq.read_table(ppath)
        if "payload_row" in t.column_names:
            # C8 (payload dedup, the setDeduplication analog): refs never
            # chain, point backwards to a canonical row, and ref rows
            # carry empty bytes (the canonical row holds the payload)
            from oscar_ray.index.reader import resolve_payload_refs

            pr = t["payload_row"].to_numpy()
            refs = np.flatnonzero(pr >= 0)
            for i in refs.tolist():
                j = int(pr[i])
                if j >= i:
                    raise IndexCheckError(f"C8: forward payload ref {i}->{j}")
                if int(pr[j]) >= 0:
                    raise IndexCheckError(f"C8: chained payload ref {i}->{j}")
                if (
                    len(t["docs"][i].as_py())
                    or len(t["tfs"][i].as_py())
                    or len(t["dls"][i].as_py())
                ):
                    raise IndexCheckError(f"C8: ref row {i} carries payload bytes")
            t = resolve_payload_refs(t)
        dict_tbl = pq.read_table(layout.dict_path(index_dir, part))
        dict_df = dict(zip(dict_tbl["term"].to_pylist(), dict_tbl["df"].to_pylist()))
        dict_cf = dict(zip(dict_tbl["term"].to_pylist(), dict_tbl["cf"].to_pylist()))

        per_term_df: dict[str, int] = {}
        per_term_cf: dict[str, int] = {}
        limit = t.num_rows if sample_blocks is None else min(sample_blocks, t.num_rows)
        for i in range(t.num_rows):
            row_term = t["term"][i].as_py()
            cnt = t["doc_count"][i].as_py()
            per_term_df[row_term] = per_term_df.get(row_term, 0) + cnt
            per_term_cf[row_term] = per_term_cf.get(row_term, 0) + t["sum_tf"][i].as_py()
            if i >= limit:
                continue
            blk = t["block_id"][i].as_py()
            ids, tfs, dls = decode_postings(
                t["docs"][i].as_py(),
                t["tfs"][i].as_py(),
                t["dls"][i].as_py(),
                count=cnt,
                codec=reader.docid_codec,
            )
            sids = ids.astype(np.int64)
            if len(sids) > 1 and not (np.diff(sids) > 0).all():
                raise IndexCheckError(f"C2: non-ascending docids, term {row_term!r}")
            if not ((sids >= blk * span).all() and (sids < (blk + 1) * span).all()):
                raise IndexCheckError(f"C2: docid outside block range, term {row_term!r}")
            if not (tfs >= 1).all():
                raise IndexCheckError(f"C5: tf < 1, term {row_term!r}")
            if not (dls >= tfs).all():
                raise IndexCheckError(f"C5: doclen < tf, term {row_term!r}")
            tfn = bm25_tf_norm(tfs, dls, avgdl, params)
            if t["max_tfn"][i].as_py() < float(tfn.max()) - 1e-12:
                raise IndexCheckError(f"C4: max_tfn below member score, term {row_term!r}")
            # C6: postings docids exist in docmeta with matching doclen
            pos = np.searchsorted(meta_ids, sids)
            pos = np.minimum(pos, len(meta_ids) - 1)
            if not (meta_ids[pos] == sids).all():
                raise IndexCheckError(f"C6: posting docid missing from docmeta ({row_term!r})")
            if not (meta_dls[pos] == dls.astype(np.int64)).all():
                raise IndexCheckError(f"C6: doclen mismatch ({row_term!r})")
            n_postings += cnt
            n_blocks += 1
        for term, df in per_term_df.items():
            if dict_df.get(term) != df:
                raise IndexCheckError(f"C3: dict df mismatch for {term!r}")
            if dict_cf.get(term) != per_term_cf[term]:
                raise IndexCheckError(f"C3: dict cf mismatch for {term!r}")
        if set(dict_df) != set(per_term_df):
            raise IndexCheckError(f"C3: dict/postings term set mismatch in part {part}")
        n_terms += len(per_term_df)

    return {
        "partitions": reader.num_partitions,
        "terms": n_terms,
        "blocks_checked": n_blocks,
        "postings_checked": n_postings,
        "docs": len(meta_doclen),
    }
