"""On-disk index artifact layout + partition helpers.

Artifact tree (all paths under the index ``out_dir``)::

    manifest.json                  global manifest: fingerprint, config,
                                   corpus stats, per-partition lineage+metrics
    docmeta/shard-SSSS.parquet     (docid, url, doclen, lang) per input shard
    postings/part-PPPPP.parquet    (term, block_id, doc_count, sum_tf,
                                    max_tfn, docs, tfs, dls) sorted by
                                    (term, block_id); one file per term partition
    dict/part-PPPPP.parquet        (term, df, cf) sorted by term
    tmp/part=P/shard-SSSS.parquet  stage-A spill (term,docid,tf,doclen)
    tmp/markers/*.json             per-shard / per-partition completion markers

This mirrors the reference's artifact set (KV store + ItemIndexStore +
text-search container + manifest-ish header bytes,
``oscar-create/oscarcreate.cpp:60-75,146-164``) re-expressed as
partitioned Parquet + JSON manifest. Term -> partition routing uses a
stable CRC32 (same function at build and query time), the analog of the
trie's deterministic token -> node routing.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np


#: namespace marker for suffix-index terms (substring search, SURVEY.md M5);
#: \x01 never appears in tokenizer output, so the namespaces cannot collide
SUFFIX_MARKER = "\x01"

#: namespace marker for field/tag terms (`@field:value` scoped search —
#: the reference's `"@"+key+":"+value` tag-string insertion,
#: ``oscar-create/TextSearchTraits.h:68-86``); \x02 never appears in
#: tokenizer output, so the namespace cannot collide with text terms
FIELD_MARKER = "\x02"


def field_term(field: str, value_tokens: list[str]) -> str:
    """Canonical marker term for a field value: tokens joined with '_'
    (kept verbatim by the query lexer, impossible in tokenizer output)."""
    return FIELD_MARKER + field + ":" + "_".join(value_tokens)


def term_partition(term: str, num_partitions: int) -> int:
    """Stable term -> partition id (CRC32 mod P). Must match build & query."""
    return zlib.crc32(term.encode("utf-8")) % num_partitions


def term_partitions_np(terms, num_partitions: int) -> np.ndarray:
    """Vectorized-ish partition ids for an array of term strings.

    CRC32 has no numpy kernel; we loop over the (already-deduplicated)
    term dictionary only — callers pass unique terms, never the exploded
    posting rows.
    """
    crc = zlib.crc32
    return np.fromiter(
        (crc(t.encode("utf-8")) % num_partitions for t in terms),
        dtype=np.int64,
        count=len(terms),
    )


def postings_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "postings", f"part-{part:05d}.parquet")


def dict_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "dict", f"part-{part:05d}.parquet")


def docmeta_path(out_dir: str, shard: int, url_part: int | None = None) -> str:
    """Docmeta is hash-partitioned by url (crc32(url) % url_partitions) at
    write time so exact-url dedup is an embarrassingly parallel per-part
    scan instead of a shuffle."""
    if url_part is None:
        return os.path.join(out_dir, "docmeta", f"shard-{shard:04d}.parquet")
    return os.path.join(
        out_dir, "docmeta", f"part={url_part}", f"shard-{shard:04d}.parquet"
    )


def docmeta_files(out_dir: str, url_part: int | None = None) -> list[str]:
    import glob as _glob

    if url_part is None:
        pattern = os.path.join(out_dir, "docmeta", "**", "*.parquet")
        return sorted(_glob.glob(pattern, recursive=True))
    return sorted(
        _glob.glob(os.path.join(out_dir, "docmeta", f"part={url_part}", "*.parquet"))
    )


def spill_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "tmp", f"part={part}")


def spill_path(out_dir: str, part: int, shard: int) -> str:
    return os.path.join(spill_dir(out_dir, part), f"shard-{shard:04d}.parquet")


def marker_path(out_dir: str, kind: str, idx: int) -> str:
    return os.path.join(out_dir, "tmp", "markers", f"{kind}-{idx:05d}.json")


def write_marker(path: str, payload: dict) -> None:
    """Write a completion marker atomically (tmp file + rename)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def read_marker(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")
