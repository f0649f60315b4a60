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
    ends = np.flatnonzero((raw & 0x80) == 0)
    n_values = ends.size
    if count is not None and count != n_values:
        raise ValueError(f"varint stream has {n_values} values, expected {count}")
    if n_values == raw.size:  # every varint is one byte
        return raw.astype(np.uint64)
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    sizes = ends - starts + 1
    # byte 0 belongs to every value — decode it unmasked (one gather);
    # continuation bytes survive only on the (typically few) multi-byte
    # values, so p>=1 rounds work on a shrinking INDEX list instead of
    # full-width boolean fancy-indexing (6x on a head posting block)
    vals = raw[starts].astype(np.uint64) & np.uint64(0x7F)
    live = np.flatnonzero(sizes > 1)
    p = 1
    while live.size:
        b = raw[starts[live] + p].astype(np.uint64)
        vals[live] |= (b & np.uint64(0x7F)) << np.uint64(7 * p)
        p += 1
        live = live[sizes[live] > p]
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


# --------------------------------------------------------------------------
# WAH (Word-Aligned Hybrid bitmap — the reference's third ItemIndex codec
# config, ``data/configs/oscar-create/index_wah.json``): 32-bit words over
# the bitmap of (id - base); literal words carry 31 bitmap bits (MSB=0),
# fill words (MSB=1) run-length encode all-zero / all-one 31-bit groups
# (bit30 = fill value, low 30 bits = group count).
# --------------------------------------------------------------------------

_WAH_GROUP = 31
_WAH_MAX_RUN = (1 << 30) - 1
_WAH_FULL = np.uint32((1 << 31) - 1)


def _wah_expand_runs(keys: np.ndarray, runs: np.ndarray, fill_bit: int):
    """Fill runs -> WAH words, splitting runs > 2^30-1 groups.

    -> (sort_keys, seq, words): one word per piece, `keys` repeated per
    piece, `seq` preserving intra-run order."""
    n_words = ((runs + _WAH_MAX_RUN - 1) // _WAH_MAX_RUN).astype(np.int64)
    total = int(n_words.sum())
    rep_keys = np.repeat(keys, n_words)
    seq = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(n_words)[:-1])), n_words
    )
    vals = np.full(total, _WAH_MAX_RUN, dtype=np.uint64)
    last = np.cumsum(n_words) - 1
    vals[last] = runs - (n_words - 1).astype(np.uint64) * np.uint64(_WAH_MAX_RUN)
    words = (
        np.uint32(1 << 31)
        | (np.uint32(fill_bit) << np.uint32(30))
        | vals.astype(np.uint32)
    )
    return rep_keys, seq, words


def wah_encode(ids: np.ndarray) -> bytes:
    """WAH-encode strictly-ascending uint64 ids: varint(base) header +
    little-endian uint32 WAH words of the (ids - base) bitmap.

    Compact construction — O(n ids), never O(bitmap range): literals are
    OR-reduced per NONEMPTY 31-bit group, zero gaps between nonempty
    groups become zero-fill words, and maximal chains of FULL groups
    merge into one-fill words (split at the 2^30-1 run cap).
    """
    v = np.ascontiguousarray(ids, dtype=np.uint64)
    if v.size == 0:
        return b""
    base = v[0]
    offs = v - base
    g = offs // np.uint64(_WAH_GROUP)
    bit = (offs % np.uint64(_WAH_GROUP)).astype(np.uint32)
    ug, start_idx = np.unique(g, return_index=True)  # sorted nonempty groups
    litv = np.bitwise_or.reduceat(np.uint32(1) << bit, start_idx)
    gap = np.empty(len(ug), dtype=np.uint64)
    gap[0] = ug[0]  # == 0 (offs[0] == 0), kept general
    gap[1:] = ug[1:] - ug[:-1] - np.uint64(1)
    full = litv == _WAH_FULL
    # a full group STARTS a one-fill run unless it directly extends a
    # full predecessor (gap == 0)
    fr_start = full.copy()
    if len(full) > 1:
        fr_start[1:] = full[1:] & ~(full[:-1] & (gap[1:] == 0))
    run_id = np.cumsum(fr_start) - 1
    one_runs = (
        np.bincount(run_id[full], minlength=int(fr_start.sum())).astype(np.uint64)
        if full.any()
        else np.empty(0, dtype=np.uint64)
    )
    # emission order per nonempty group index i: zero-fill words (phase
    # 0), then the group's own word (phase 1: literal, or the one-fill
    # run word on its first group)
    keys_l, seqs_l, words_l = [], [], []
    zf_idx = np.flatnonzero(gap > 0)
    if len(zf_idx):
        k, s, w = _wah_expand_runs(zf_idx.astype(np.int64) * 2, gap[zf_idx], 0)
        keys_l.append(k)
        seqs_l.append(s)
        words_l.append(w)
    lit_idx = np.flatnonzero(~full)
    if len(lit_idx):
        keys_l.append(lit_idx.astype(np.int64) * 2 + 1)
        seqs_l.append(np.zeros(len(lit_idx), dtype=np.int64))
        words_l.append(litv[lit_idx])
    of_idx = np.flatnonzero(fr_start)
    if len(of_idx):
        k, s, w = _wah_expand_runs(of_idx.astype(np.int64) * 2 + 1, one_runs, 1)
        keys_l.append(k)
        seqs_l.append(s)
        words_l.append(w)
    keys = np.concatenate(keys_l)
    seqs = np.concatenate(seqs_l)
    words = np.concatenate(words_l).astype(np.uint32)
    order = np.lexsort((seqs, keys))
    return varint_encode(np.array([base], dtype=np.uint64)) + words[order].astype(
        "<u4"
    ).tobytes()


def wah_decode(buf: bytes, count: int) -> np.ndarray:
    """Inverse of wah_encode (count = number of ids)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    # varint header: base
    head_end = int(np.flatnonzero((raw & 0x80) == 0)[0]) + 1
    base = varint_decode(raw[:head_end])[0]
    words = np.frombuffer(buf, dtype="<u4", offset=head_end)
    is_fill = (words >> np.uint32(31)) == 1
    runs = np.where(is_fill, words & np.uint32(_WAH_MAX_RUN), 1).astype(np.int64)
    gstart = np.concatenate(([0], np.cumsum(runs)[:-1]))
    pos_parts = []
    lit_idx = np.flatnonzero(~is_fill)
    if len(lit_idx):
        litv = words[lit_idx].astype(np.uint32)
        bits = (litv[:, None] >> np.arange(_WAH_GROUP, dtype=np.uint32)[None, :]) & 1
        li, bi = np.nonzero(bits)
        pos_parts.append(gstart[lit_idx][li] * _WAH_GROUP + bi)
    one_idx = np.flatnonzero(is_fill & ((words >> np.uint32(30)) & 1 == 1))
    if len(one_idx):
        # every bit of every group in the run is set
        r = runs[one_idx]
        total_groups = int(r.sum())
        g0 = np.repeat(gstart[one_idx], r)
        within = np.arange(total_groups) - np.repeat(
            np.concatenate(([0], np.cumsum(r)[:-1])), r
        )
        groups = g0 + within
        pos_parts.append(
            (groups[:, None] * _WAH_GROUP + np.arange(_WAH_GROUP)[None, :]).reshape(-1)
        )
    if not pos_parts:
        raise ValueError("wah stream decodes 0 ids")
    pos = np.sort(np.concatenate(pos_parts))
    if len(pos) != count:
        raise ValueError(f"wah stream decodes {len(pos)} ids, expected {count}")
    return pos.astype(np.uint64) + base


def encode_docid_stream(docids: np.ndarray, codec: str) -> bytes:
    """Encode one block's strictly-ascending docids with the configured
    codec ('varint' = delta-gap + LEB128, 'rlede', 'eliasfano', 'wah')."""
    if codec == "eliasfano":
        return ef_encode(docids)
    if codec == "rlede":
        return rlede_encode(docids)
    if codec == "wah":
        return wah_encode(docids)
    return varint_encode(delta_encode(np.asarray(docids, dtype=np.uint64)))


#: codecs whose streams need an external count and per-segment encode
COUNTED_CODECS = ("eliasfano", "rlede", "wah")


def decode_docid_stream(buf: bytes, count: int | None, codec: str) -> np.ndarray:
    if codec in COUNTED_CODECS:
        if count is None:
            raise ValueError(f"{codec} decode requires count")
        if codec == "eliasfano":
            return ef_decode(buf, count)
        if codec == "wah":
            return wah_decode(buf, count)
        return rlede_decode(buf, count)
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


# --------------------------------------------------------------------------
# Positional payloads (phrase/proximity search sidecar)
# --------------------------------------------------------------------------


def varint_encode_segments_arrow(values: np.ndarray, seg_starts: np.ndarray):
    """Encode MANY segments -> ONE arrow large_binary array, zero-copy.

    Same single-pass LEB128 trick as :func:`varint_encode_segments`, but
    instead of slicing python ``bytes`` per segment (O(segments) object
    churn — millions of (term, doc) pairs per shard), the result array
    SHARES the one encoded buffer and only samples the per-value byte
    offsets at segment boundaries. O(1) numpy/arrow calls total.
    """
    import pyarrow as pa

    v = np.ascontiguousarray(values, dtype=np.uint64)
    n_segs = len(seg_starts)
    if v.size == 0:
        off = np.zeros(max(n_segs, 0) + 1, dtype=np.int64)
        return pa.Array.from_buffers(
            pa.large_binary(),
            n_segs,
            [None, pa.py_buffer(off), pa.py_buffer(b"")],
            children=None,
        )
    buf, offsets = _varint_encode_raw(v)
    seg_bounds = np.concatenate((np.asarray(seg_starts, dtype=np.int64), [v.size]))
    byte_offsets = offsets[seg_bounds]
    return pa.Array.from_buffers(
        pa.large_binary(),
        n_segs,
        [None, pa.py_buffer(byte_offsets), pa.py_buffer(buf)],
        children=None,
    )


def concat_binary_segments_arrow(bin_arr, seg_starts: np.ndarray, seg_ends: np.ndarray):
    """Concatenate row ranges of a binary array -> large_binary array.

    ``out[i] = b"".join(bin_arr[seg_starts[i]:seg_ends[i]])`` — but
    zero-copy: segments must be contiguous & ascending (stage-B segments
    are), so the result shares the input data buffer and just samples
    its offsets at the segment boundaries.
    """
    import pyarrow as pa

    if isinstance(bin_arr, pa.ChunkedArray):
        combined = bin_arr.combine_chunks()
        if isinstance(combined, pa.ChunkedArray):
            combined = (
                combined.chunk(0)
                if combined.num_chunks
                else pa.array([], type=bin_arr.type)
            )
        bin_arr = combined
    if not pa.types.is_large_binary(bin_arr.type):
        bin_arr = bin_arr.cast(pa.large_binary())
    n = len(bin_arr)
    n_segs = len(seg_starts)
    if n == 0 or n_segs == 0:
        off = np.zeros(n_segs + 1, dtype=np.int64)
        return pa.Array.from_buffers(
            pa.large_binary(),
            n_segs,
            [None, pa.py_buffer(off), pa.py_buffer(b"")],
            children=None,
        )
    if bin_arr.null_count:
        raise ValueError("positions payload column must not contain nulls")
    # row offsets of the (possibly sliced) array view
    row_off = np.frombuffer(bin_arr.buffers()[1], dtype=np.int64,
                            count=bin_arr.offset + n + 1)[bin_arr.offset:]
    starts = np.asarray(seg_starts, dtype=np.int64)
    ends = np.asarray(seg_ends, dtype=np.int64)
    if not (ends[:-1] == starts[1:]).all() or (starts[0] != 0) or (ends[-1] != n):
        raise ValueError("segments must exactly tile the input rows")
    byte_offsets = np.concatenate((row_off[starts], [row_off[n]]))
    return pa.Array.from_buffers(
        pa.large_binary(),
        n_segs,
        [None, pa.py_buffer(byte_offsets), bin_arr.buffers()[2]],
        children=None,
    )


def encode_positions_segmented(positions: np.ndarray, seg_starts: np.ndarray):
    """Per-(term,doc) ascending position lists -> large_binary payloads.

    ``positions`` is the concatenation of every pair's ascending token
    positions; ``seg_starts`` marks each pair's first element. Encoding is
    delta-gap per segment (first value absolute) + LEB128, the same codec
    the docid streams use — one vectorized pass over the whole shard.
    """
    gaps = delta_encode_segmented(np.asarray(positions, dtype=np.uint64), seg_starts)
    return varint_encode_segments_arrow(gaps, seg_starts)


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode one block's positions payload -> flat uint64 positions.

    ``tfs`` (per-doc term frequencies, from the aligned ``tfs`` stream)
    delimit the per-doc sub-streams: doc j's positions are the slice
    ``[cum_tf[j], cum_tf[j+1])`` of the result, ascending within the doc.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    vals = varint_decode(buf, total)
    if total == 0:
        return vals
    if len(vals) != total:
        # e.g. a field-marker term: tf entries exist but no position bytes
        raise ValueError(
            f"positions payload has {len(vals)} values, block tfs expect {total}"
        )
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    c = np.cumsum(vals, dtype=np.uint64)
    base = c[starts] - vals[starts]
    return c - np.repeat(base, tfs)
