"""Parquet fragment readers with deterministic docid assignment.

The reference assigns dense item ids at ingest and then fixes ordering
with a global re-sort (``OsmKeyValueObjectStore.cpp:1124,1339-1399`` —
`fetch_add` then `applySort`). We instead make docid a **pure function of
the static input layout**: files sorted by path, row groups in file
order, ``docid = base_offset(file, row_group) + local_row_index``. This
is what makes the build resumable and rank-identity reproducible under
any task schedule (SURVEY.md §4 determinism row, §7.4).

The reader is a metadata-scan + fragment-task pattern (the same shape
``ray.data.read_parquet`` uses internally): a driver-side footer-only
scan yields fragment descriptors; a Dataset of descriptors is mapped to
row-group tables. One fragment == one Ray block, so read parallelism ==
row-group count, and column pruning happens at the pyarrow read.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class Fragment:
    """One parquet row group with its precomputed global docid base."""

    path: str
    row_group: int
    base_docid: int
    num_rows: int

    def to_dict(self) -> dict:
        return {
            "path": self.path,
            "row_group": self.row_group,
            "base_docid": self.base_docid,
            "num_rows": self.num_rows,
        }


#: recognized input formats: parquet (row-group fragments); and as
#: whole-file fragments: line-delimited JSON / CSV, plus WARC / WET
#: (the Common-Crawl container layout, one ~1 GB file == one block)
_EXTS = (
    ".parquet",
    ".jsonl",
    ".ndjson",
    ".csv",
    ".warc",
    ".warc.gz",
    ".wet",
    ".wet.gz",
)
_WARC_EXTS = (".warc", ".warc.gz", ".wet", ".wet.gz")


def resolve_paths(paths: str | list[str]) -> list[str]:
    """Expand a dir / glob / list into a sorted list of input files."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            out = sorted(
                p
                for ext in _EXTS
                for p in glob.glob(os.path.join(paths, f"*{ext}"))
            )
        else:
            out = sorted(glob.glob(paths)) or [paths]
    else:
        out = sorted(paths)
    if not out:
        raise FileNotFoundError(f"no input files under {paths!r}")
    return out


#: file-count threshold above which the footer scan fans out as Ray
#: tasks (when a Ray session exists). Below it, task round-trips cost
#: more than the reads they save.
DISTRIBUTED_SCAN_MIN_FILES = 64


def _file_row_groups(path: str) -> list[int]:
    """Row counts of one input file's fragments (footer-only for parquet)."""
    if path.endswith(".parquet"):
        meta = pq.ParquetFile(path).metadata
        return [meta.row_group(rg).num_rows for rg in range(meta.num_row_groups)]
    if path.endswith(_WARC_EXTS):
        from oscar_ray.sources.warc import count_warc_file

        return [count_warc_file(path)]  # header walk only, no table
    return [len(_read_whole_file(path, columns=None))]


def _scan_files_task(paths: list[str]) -> list[list[int]]:
    return [_file_row_groups(p) for p in paths]


def list_fragments(
    paths: str | list[str],
    distributed_min_files: int = DISTRIBUTED_SCAN_MIN_FILES,
) -> list[Fragment]:
    """Metadata scan: (path, row_group) -> cumulative docid base.

    Deterministic: files sorted by path, row groups in order. Parquet
    files cost a footer read per file; JSONL/CSV files (one fragment per
    file, ``row_group == -1``) cost a row-count pass.

    At scale (>= ``distributed_min_files`` files and a live Ray session)
    the per-file footer reads FAN OUT as Ray tasks over path chunks; the
    driver receives only (path, [row counts]) descriptors and assigns the
    cumulative docid bases in sorted-path order — identical output to the
    serial scan by construction (chunking preserves the sorted order).
    """
    import ray as _ray

    files = resolve_paths(paths)
    if len(files) >= distributed_min_files and _ray.is_initialized():
        scan = _ray.remote(num_cpus=1)(_scan_files_task)
        # ~4 chunks per CPU bounds both task count and per-task latency
        n_chunks = min(len(files), 4 * int(_ray.cluster_resources().get("CPU", 8)))
        step = (len(files) + n_chunks - 1) // n_chunks
        chunks = [files[i : i + step] for i in range(0, len(files), step)]
        per_file = [
            rgs for out in _ray.get([scan.remote(c) for c in chunks]) for rgs in out
        ]
    else:
        per_file = [_file_row_groups(p) for p in files]
    frags: list[Fragment] = []
    base = 0
    for path, rgs in zip(files, per_file):
        for rg, n in zip(range(len(rgs)) if path.endswith(".parquet") else [-1], rgs):
            frags.append(Fragment(path, rg, base, n))
            base += n
    return frags


def _read_whole_file(path: str, columns: list[str] | None) -> pa.Table:
    """Read a non-parquet (jsonl/csv) file as one arrow table."""
    if path.endswith((".jsonl", ".ndjson")):
        from pyarrow import json as pa_json

        t = pa_json.read_json(path)
    elif path.endswith(_WARC_EXTS):
        from oscar_ray.sources.warc import read_warc_file

        t = read_warc_file(path)
    elif path.endswith(".csv"):
        from pyarrow import csv as pa_csv

        t = pa_csv.read_csv(path)
    else:
        raise ValueError(f"unsupported input format: {path}")
    return t.select(columns) if columns else t


def input_fingerprint(frags: list[Fragment]) -> str:
    """Stable fingerprint of the input layout (for checkpoint manifests)."""
    import hashlib

    h = hashlib.sha256()
    for f in frags:
        h.update(f"{f.path}:{f.row_group}:{f.num_rows}\n".encode())
    return h.hexdigest()[:16]


def read_fragment(
    frag: Fragment | dict,
    columns: list[str] | None = None,
    id_column: str | None = None,
) -> pa.Table:
    """Read one row group and attach the deterministic ``docid`` column.

    If ``id_column`` is given, that column (cast to int64) is used as the
    docid instead of the layout-derived ordinal — used when the input
    table carries its own unique id (e.g. testdata ``documents.doc_id``).
    """
    if isinstance(frag, dict):
        frag = Fragment(
            frag["path"], int(frag["row_group"]), int(frag["base_docid"]), int(frag["num_rows"])
        )
    read_cols = list(columns) if columns else None
    if read_cols is not None and id_column and id_column not in read_cols:
        read_cols.append(id_column)
    if frag.row_group < 0:
        tbl = _read_whole_file(frag.path, read_cols)
    else:
        tbl = pq.ParquetFile(frag.path).read_row_group(frag.row_group, columns=read_cols)
    if id_column:
        docid = tbl[id_column].cast(pa.int64())
        if id_column not in (columns or []):
            tbl = tbl.drop_columns([id_column])
    else:
        docid = pa.array(
            np.arange(frag.base_docid, frag.base_docid + len(tbl), dtype=np.int64)
        )
    return tbl.append_column("docid", docid)


def pages_dataset_with_docids(
    paths: str | list[str],
    columns: list[str] | None = None,
    id_column: str | None = None,
    docid_col: str = "_docid",
    frags_per_task: int = 4,
) -> "ray.data.Dataset":
    """All input fragments as ONE Dataset carrying the deterministic docid.

    For corpus REWRITES that must survive row reordering (e.g. the
    ``--anchors`` enrichment join): the layout docid (or ``id_column``)
    travels with each row as ``docid_col``, so the rewritten corpus can be
    indexed with ``IndexBuildConfig(id_column=docid_col)`` and produce
    artifacts independent of the rewrite's row order. Fragment reads fan
    out as Ray tasks over descriptor rows (the stage-A pattern).
    """
    import json as _json

    import ray.data

    frags = list_fragments(paths)
    desc = pa.table(
        {"frag": pa.array([_json.dumps(f.to_dict()) for f in frags])}
    )

    def _read(batch: pa.Table):
        for fj in batch["frag"].to_pylist():
            tbl = read_fragment(_json.loads(fj), columns=columns, id_column=id_column)
            i = tbl.schema.get_field_index("docid")
            yield tbl.set_column(i, docid_col, tbl.column(i))

    n_blocks = max(1, (len(frags) + frags_per_task - 1) // frags_per_task)
    return (
        ray.data.from_arrow(desc)
        .repartition(n_blocks)
        .map_batches(_read, batch_format="pyarrow", batch_size=frags_per_task)
    )
