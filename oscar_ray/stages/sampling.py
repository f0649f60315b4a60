"""Seeded corpus sampling: stratified rates and per-source quotas.

Two standard corpus-shaping passes for training-data mixes:

- :func:`stratified_sample` — keep each row with a per-stratum rate
  (e.g. downsample head languages, keep all of a rare one). The keep
  decision is a pure function of (seed, id): ``md5(seed:id)`` lower 64
  bits (little-endian — DuckDB's ``md5_number_lower`` convention, same
  as the fingerprint op) mod 1e6 compared against the stratum's
  micro-rate. No shuffle, no RNG state: embarrassingly parallel,
  deterministic under retries/resume (a Ray task that re-executes makes
  the same decision), and reproducible by a SQL oracle.

- :func:`cap_per_source` — keep at most ``cap`` rows per source
  (per-domain quotas à la C4), chosen by the same seeded hash order so
  the survivors are a stable pseudo-random subset. Distributed as a
  two-phase top-k: a vectorized per-block partial (each block keeps at
  most ``cap`` rows per source it sees) bounds the shuffle input to
  ``blocks × cap`` rows per source, then one groupby over a BOUNDED
  routing part (``blake2b(source) % nparts``, nparts ≤ 32 — every row
  of a source lands in one part, so ranks are exact) finalizes with the
  same vectorized multi-source rank kernel. Grouping on the part, not
  the raw source, keeps Ray's per-group Python-call overhead capped by
  ``nparts`` however many distinct domains exist (web scale: millions).
  Head-domain skew never concentrates more than ``blocks × cap`` rows
  in one part per hot domain.

Reference analog: the seeded query sampling in `oscar-cmd`'s benchmark
generator (sources/queryset.py cites it) — same hash-order determinism,
applied corpus-side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

HASH_MOD = 1_000_000


def _hash_buckets(seed: str, ids: np.ndarray) -> np.ndarray:
    """md5(seed:id) lower-64 little-endian mod 1e6 (DuckDB
    ``md5_number_lower('seed:' || id) % 1000000``), one digest per row —
    bounded by batch size, same per-row md5 budget as doc_fingerprint."""
    pre = f"{seed}:".encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(pre + str(i).encode()).digest()[8:16], "little")
            % HASH_MOD
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


class StratifiedSampleStage:
    """map_batches actor: seeded per-stratum keep/drop + bucket column."""

    def __init__(
        self,
        rates_micro: dict[str, int],
        default_micro: int,
        seed: str,
        id_col: str = "doc_id",
        stratum_col: str = "lang",
    ):
        self.rates = dict(rates_micro)
        self.default = default_micro
        self.seed, self.id_col, self.stratum_col = seed, id_col, stratum_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        buckets = _hash_buckets(self.seed, ids)
        col = batch[self.stratum_col]
        d = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        # rate lookup once per DISTINCT stratum, broadcast via codes
        thresh_of = np.fromiter(
            (self.rates.get(s, self.default) for s in d.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(d.dictionary),
        )
        thresh = thresh_of[np.asarray(d.indices, dtype=np.int64)]
        keep = buckets < thresh
        out = batch.filter(pa.array(keep))
        return out.append_column("bucket", pa.array(buckets[keep], type=pa.int64()))


def stratified_sample(
    ds: ray.data.Dataset,
    rates_micro: dict[str, int],
    default_micro: int,
    seed: str = "s42",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Keep rows where md5-bucket(seed:id) < micro-rate of the stratum."""
    return ds.map_batches(
        StratifiedSampleStage,
        fn_constructor_kwargs={
            "rates_micro": rates_micro,
            "default_micro": default_micro,
            "seed": seed,
            "id_col": id_col,
            "stratum_col": stratum_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _rank_within_source(
    t: pa.Table, cap: int, id_col: str, source_col: str
) -> pa.Table:
    """Vectorized (source, bucket, id) lexsort -> per-source rank, keep
    rank <= cap. Used both as the per-block partial and the finalize."""
    src = pc.dictionary_encode(
        t[source_col].combine_chunks()
        if isinstance(t[source_col], pa.ChunkedArray)
        else t[source_col]
    )
    codes = np.asarray(src.indices, dtype=np.int64)
    buckets = t["bucket"].to_numpy()
    ids = t[id_col].to_numpy()
    order = np.lexsort((ids, buckets, codes))
    codes_s = codes[order]
    # rank = position within the source run (runs are contiguous post-sort)
    n = len(codes_s)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(codes_s)) + 1])
    lengths = np.diff(np.concatenate([starts, [n]]))
    rank = np.arange(n) - np.repeat(starts, lengths) + 1
    keep_pos = order[rank <= cap]
    out = t.take(pa.array(np.sort(keep_pos)))
    # recompute rank aligned to the (unsorted) kept rows
    rk = np.empty(len(codes), dtype=np.int64)
    rk[order] = rank
    return out.append_column(
        "rk", pa.array(rk[np.sort(keep_pos)], type=pa.int64())
    )


def _source_parts(src: pa.Array | pa.ChunkedArray, nparts: int) -> np.ndarray:
    """blake2b(source) % nparts per row, hashed once per DISTINCT source
    via dictionary-encode (per-batch distinct domains, not per row)."""
    arr = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    d = pc.dictionary_encode(arr)
    uniq = d.dictionary.to_pylist()
    part_of = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(str(u).encode(), digest_size=8).digest(), "little")
            % nparts
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return part_of[np.asarray(d.indices, dtype=np.int64)]


class SourceCapPartial:
    """Per-block partial: keep at most cap rows per source seen in the
    block; attaches the seeded bucket and the bounded routing part."""

    def __init__(
        self, cap: int, seed: str, id_col: str, source_col: str, nparts: int
    ):
        self.cap, self.seed = cap, seed
        self.id_col, self.source_col, self.nparts = id_col, source_col, nparts

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        b = batch.append_column(
            "bucket", pa.array(_hash_buckets(self.seed, ids), type=pa.int64())
        )
        out = _rank_within_source(
            b, self.cap, self.id_col, self.source_col
        ).drop_columns(["rk"])
        return out.append_column(
            "part",
            pa.array(_source_parts(out[self.source_col], self.nparts), type=pa.int64()),
        )


def cap_per_source(
    ds: ray.data.Dataset,
    cap: int,
    seed: str = "s42",
    id_col: str = "doc_id",
    source_col: str = "source",
    concurrency: int = 4,
    nparts: int = 32,
) -> ray.data.Dataset:
    """Keep <= cap rows per source by seeded-hash order; output adds
    ``bucket`` (the hash) and ``rk`` (1-based rank within source).

    The finalize groups on a bounded routing part (nparts ≤ 32), not the
    raw source key: a part table holds many sources and the rank kernel
    is vectorized across all of them, so Ray's per-group overhead never
    scales with domain cardinality."""

    def finalize(g: pa.Table) -> pa.Table:
        return _rank_within_source(g, cap, id_col, source_col).drop_columns(["part"])

    partial = ds.map_batches(
        SourceCapPartial,
        fn_constructor_kwargs={
            "cap": cap,
            "seed": seed,
            "id_col": id_col,
            "source_col": source_col,
            "nparts": nparts,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return partial.groupby("part").map_groups(finalize, batch_format="pyarrow")
