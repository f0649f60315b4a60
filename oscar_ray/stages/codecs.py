"""Vectorized delta-gap + varint posting codecs (numpy, no Python loops).

The reference compresses posting lists with selectable codecs — RLE+delta
(`rlede`), Elias-Fano, WAH — in its ItemIndexStore
(``oscar-create/oscarcreate.cpp:70-75``, codec configs
``data/configs/oscar-create/index_rlede.json``) and writes delta-coded
varint streams for trie payloads (``CellTextCompleter.cpp:227-243``).
We implement the north_star codec: **delta-gap docids + LEB128 varints**,
fully vectorized with numpy (byte-length computation via log masks,
scatter fill per byte position; decode via continuation-bit segmentation
+ per-position shifts).

Encoded layout per array: plain LEB128 varint stream, one varint per
value, MSB = continuation. Docid streams are delta-gapped first
(first value absolute, then gaps) — gaps are >= 1 because docids are
strictly ascending and unique per block (the `MatchDesc::isConsistent`
invariant, ``CellTextCompleter.cpp:119-137``).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # enough for uint64


def _varint_nbytes(v: np.ndarray) -> np.ndarray:
    """ceil(bit_length/7) per value in one vectorized pass.

    frexp's exponent == bit_length exactly for v < 2^53; the rare huge
    values get a per-value exact fix-up.
    """
    _, exp = np.frexp(v.astype(np.float64))
    nbytes = np.maximum((exp + 6) // 7, 1).astype(np.int64)
    big = v >= np.uint64(1) << np.uint64(53)
    if big.any():
        nbytes[big] = [(int(x).bit_length() + 6) // 7 for x in v[big]]
    return nbytes


def _varint_encode_raw(v: np.ndarray):
    """-> (byte_buffer uint8, per-value byte offsets int64[n+1])."""
    nbytes = _varint_nbytes(v)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for p in range(int(nbytes.max()) if v.size else 0):
        mask = nbytes > p
        idx = offsets[:-1][mask] + p
        chunk = (v[mask] >> np.uint64(7 * p)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > p).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out, offsets


def varint_encode_segments(values: np.ndarray, seg_starts: np.ndarray, seg_ends: np.ndarray) -> list[bytes]:
    """Encode MANY segments of one array with a single vectorized pass.

    The whole array is LEB128-encoded once; each segment's bytes are then
    a slice of the shared buffer (per-value byte offsets are exact). This
    is what makes postings assembly O(1) numpy calls per partition rather
    than per (term, block) segment.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    buf, offsets = _varint_encode_raw(v)
    data = buf.tobytes()
    return [
        data[offsets[s] : offsets[e]] for s, e in zip(seg_starts.tolist(), seg_ends.tolist())
    ]


def delta_encode_segmented(
    sorted_ids: np.ndarray, seg_starts: np.ndarray
) -> np.ndarray:
    """Delta-gap per segment in one pass: gaps everywhere, absolute value
    restored at each segment start."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = ids.copy()
    gaps[1:] = ids[1:] - ids[:-1]
    gaps[seg_starts] = ids[seg_starts]
    return gaps


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint array -> bytes. Vectorized (no per-value loop)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    buf, _ = _varint_encode_raw(v)
    return buf.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream -> uint64 array. Vectorized.

    Fast paths: an all-1-byte stream (tf streams, most dl/gap streams) is
    a straight widen; the general path reconstructs by byte position with
    masked gathers (no scatter-add).
    """
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    n_values = int(is_last.sum())
    if count is not None and count != n_values:
        raise ValueError(f"varint stream has {n_values} values, expected {count}")
    if n_values == raw.size:  # every varint is one byte
        return raw.astype(np.uint64)
    ends = np.flatnonzero(is_last)
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    sizes = ends - starts + 1
    vals = np.zeros(n_values, dtype=np.uint64)
    max_size = int(sizes.max())
    for p in range(max_size):
        mask = sizes > p
        b = raw[starts[mask] + p].astype(np.uint64)
        vals[mask] |= (b & np.uint64(0x7F)) << np.uint64(7 * p)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending ids -> gaps (first absolute). uint64 out."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode."""
    return np.cumsum(gaps, dtype=np.uint64)


# --------------------------------------------------------------------------
# Elias-Fano (optional docid codec — the reference's `eliasfano`
# ItemIndex type, config ``data/configs/oscar-create/index_eliasfano.json``)
# --------------------------------------------------------------------------


def ef_encode(ids: np.ndarray) -> bytes:
    """Elias-Fano encode a strictly-ascending uint64 sequence.

    Layout: [u8 l][low bits, n*l bits packed LSB-first][high bitvector,
    unary-gap coded: bit (high[i] + i) set]. Count is external (the
    posting row's doc_count), like the varint streams. Vectorized:
    one packbits for lows, one scatter for highs.
    """
    v = np.ascontiguousarray(ids, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    u = int(v[-1]) + 1
    l = max(0, (u // n).bit_length() - 1)  # floor(log2(u/n)) for u>=n
    low_bytes = b""
    if l:
        low = v & np.uint64((1 << l) - 1)
        # bit matrix (n, l) LSB-first -> packbits(bitorder='little')
        bits = ((low[:, None] >> np.arange(l, dtype=np.uint64)[None, :]) & 1).astype(
            np.uint8
        )
        low_bytes = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    high = (v >> np.uint64(l)).astype(np.int64) + np.arange(n, dtype=np.int64)
    nbits = int(high[-1]) + 1
    hv = np.zeros((nbits + 7) // 8 * 8, dtype=np.uint8)
    hv[high] = 1
    high_bytes = np.packbits(hv, bitorder="little").tobytes()
    return bytes([l]) + low_bytes + high_bytes


def ef_decode(buf: bytes, count: int) -> np.ndarray:
    """Inverse of ef_encode (count = number of values)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    l = int(raw[0])
    low_nbytes = (count * l + 7) // 8
    low = np.zeros(count, dtype=np.uint64)
    if l:
        bits = np.unpackbits(raw[1 : 1 + low_nbytes], bitorder="little")[: count * l]
        m = bits.reshape(count, l).astype(np.uint64)
        low = (m << np.arange(l, dtype=np.uint64)[None, :]).sum(axis=1)
    hbits = np.unpackbits(raw[1 + low_nbytes :], bitorder="little")
    pos = np.flatnonzero(hbits)[:count].astype(np.int64)
    high = (pos - np.arange(count, dtype=np.int64)).astype(np.uint64)
    return (high << np.uint64(l)) | low


# --------------------------------------------------------------------------
# RLE-on-gaps ("rlede" — the reference's DEFAULT ItemIndex type,
# ``data/configs/oscar-create/index_rlede.json``): delta-gap the docids,
# then run-length encode repeated gaps as (gap, run) varint pairs.
# Dense posting lists (runs of gap==1) collapse dramatically.
# --------------------------------------------------------------------------


def rlede_encode(ids: np.ndarray) -> bytes:
    """Strictly-ascending uint64 ids -> (gap, run_length) varint pairs."""
    gaps = delta_encode(np.ascontiguousarray(ids, dtype=np.uint64))
    if gaps.size == 0:
        return b""
    change = np.concatenate(([0], np.flatnonzero(np.diff(gaps)) + 1))
    runs = np.diff(np.concatenate((change, [gaps.size]))).astype(np.uint64)
    vals = gaps[change]
    inter = np.empty(2 * len(vals), dtype=np.uint64)
    inter[0::2] = vals
    inter[1::2] = runs
    return varint_encode(inter)


def rlede_decode(buf: bytes, count: int) -> np.ndarray:
    """Inverse of rlede_encode (count = number of ids)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    flat = varint_decode(buf)
    gaps = np.repeat(flat[0::2], flat[1::2].astype(np.int64))
    if len(gaps) != count:
        raise ValueError(f"rlede stream decodes {len(gaps)} ids, expected {count}")
    return delta_decode(gaps)


def encode_docid_stream(docids: np.ndarray, codec: str) -> bytes:
    """Encode one block's strictly-ascending docids with the configured
    codec ('varint' = delta-gap + LEB128, 'rlede', 'eliasfano')."""
    if codec == "eliasfano":
        return ef_encode(docids)
    if codec == "rlede":
        return rlede_encode(docids)
    return varint_encode(delta_encode(np.asarray(docids, dtype=np.uint64)))


def decode_docid_stream(buf: bytes, count: int | None, codec: str) -> np.ndarray:
    if codec in ("eliasfano", "rlede"):
        if count is None:
            raise ValueError(f"{codec} decode requires count")
        return ef_decode(buf, count) if codec == "eliasfano" else rlede_decode(buf, count)
    return delta_decode(varint_decode(buf, count))


def encode_postings(docids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray):
    """Encode one posting block -> (docs_bytes, tfs_bytes, dls_bytes).

    docids must be strictly ascending unique (checked); tfs/doclens are
    aligned per-doc payloads.
    """
    ids = np.asarray(docids, dtype=np.uint64)
    if ids.size > 1 and not (ids[1:] > ids[:-1]).all():
        raise ValueError("posting docids must be strictly ascending unique")
    return (
        varint_encode(delta_encode(ids)),
        varint_encode(np.asarray(tfs, dtype=np.uint64)),
        varint_encode(np.asarray(doclens, dtype=np.uint64)),
    )


def decode_postings(
    docs_bytes, tfs_bytes, dls_bytes, count: int | None = None, codec: str = "varint"
):
    """Decode one posting block -> (docids, tfs, doclens) uint64 arrays."""
    docids = decode_docid_stream(docs_bytes, count, codec)
    tfs = varint_decode(tfs_bytes, count)
    dls = varint_decode(dls_bytes, count)
    return docids, tfs, dls
