"""PNG codec, pure numpy + stdlib zlib — no Pillow.

Lossless counterpart to the baseline-JPEG codec (``stages/jpeg.py``):
``png_encode`` writes 8-bit gray/RGB/RGBA non-interlaced PNG with a
selectable per-row filter; ``png_decode`` handles ALL five scanline
filters (None/Sub/Up/Average/Paeth), color types 0/2/3/4/6 at bit depth
8, palette expansion, and multiple IDAT chunks — the common envelope of
real-world 8-bit PNGs. Outside it (bit depth != 8, Adam7 interlace) it
raises a disclosed NotImplementedError, like the other multimodal gates.

The inflate step is stdlib ``zlib`` (present in this container); the
filter algebra is numpy: Sub is a per-byte-lane cumsum, Up a vector add,
Average/Paeth run one short Python loop over row PIXELS with numpy lane
ops (rows are independent after the previous row is reconstructed).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w, 1|3|4) -> PNG bytes (8-bit, non-interlaced).

    ``filter_type`` selects the per-row scanline filter (0..4) — mainly
    to exercise every decoder filter path; 0 (None) is the default.
    """
    if img.ndim != 3 or img.shape[2] not in (1, 3, 4):
        raise ValueError("expected (h, w, 1|3|4) uint8")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    h, w, nc = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[nc]
    bpp = nc
    raw = img.astype(np.int32)
    rows = []
    prev = np.zeros((w, nc), dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.zeros_like(cur)
        left[1:] = cur[:-1]
        up = prev
        ul = np.zeros_like(cur)
        ul[1:] = prev[:-1]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - up
        elif filter_type == 3:
            filt = cur - (left + up) // 2
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
            filt = cur - pred
        rows.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_row(
    ft: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """One scanline: filtered bytes (int32 (w, bpp)) -> reconstructed."""
    if ft == 0:
        return row % 256
    if ft == 2:  # Up
        return (row + prev) % 256
    if ft == 1:  # Sub — per-lane prefix sum mod 256
        return np.cumsum(row, axis=0) % 256
    out = np.zeros_like(row)
    w = row.shape[0]
    if ft == 3:  # Average
        for x in range(w):
            left = out[x - 1] if x else np.zeros(bpp, dtype=np.int32)
            out[x] = (row[x] + (left + prev[x]) // 2) % 256
        return out
    if ft == 4:  # Paeth
        zero = np.zeros(bpp, dtype=np.int32)
        for x in range(w):
            left = out[x - 1] if x else zero
            ul = prev[x - 1] if x else zero
            up = prev[x]
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
            out[x] = (row[x] + pred) % 256
        return out
    raise ValueError(f"bad filter type {ft}")


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w, channels).

    Envelope: 8-bit, non-interlaced, color types 0/2/3/4/6 (palette
    expanded through PLTE). Raises NotImplementedError outside it and
    ValueError on malformed input.
    """
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    pos = len(_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + body + crc
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated IHDR")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit PNG supported")
    if interlace:
        raise NotImplementedError("Adam7 interlace not supported")
    if comp or filt:
        raise ValueError("invalid compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"bad color type {ctype}")
    nc = _CHANNELS[ctype]
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as e:  # documented contract: malformed -> ValueError
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    data = np.frombuffer(inflated, dtype=np.uint8)
    stride = 1 + w * nc
    if len(data) != stride * h:
        raise ValueError("scanline data size mismatch")
    data = data.reshape(h, stride)
    out = np.zeros((h, w, nc), dtype=np.int32)
    prev = np.zeros((w, nc), dtype=np.int32)
    for y in range(h):
        ft = int(data[y, 0])
        row = data[y, 1:].astype(np.int32).reshape(w, nc)
        prev = _unfilter_row(ft, row, prev, nc)
        out[y] = prev
    img = out.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        img = plte[img[:, :, 0]]
    return img
