"""GIF codec (87a/89a), pure Python/numpy — no PIL/giflib.

Completes the "common legacy web formats" image set next to
:mod:`oscar_ray.stages.jpeg` (lossy) and :mod:`oscar_ray.stages.png`
(lossless/deflate): GIF's compression layer is LZW with variable code
width (3-12 bits), implemented here in both directions, plus palette
handling and interlace.

Envelope (disclosed gates, same discipline as the other codecs):
- decode: 87a/89a, global or local color table, interlaced or not,
  extensions skipped, FIRST image frame returned as (h, w, 3) uint8
  (animation frames beyond the first are ignored — compositing with
  disposal methods is out of scope).
- encode: 89a, one frame, exact palette (<= 256 distinct colors —
  ValueError beyond that; color quantization is out of scope).

Round-trip contract (tested): decode(encode(img)) == img exactly for
any image with <= 256 distinct colors — LZW is lossless.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# -- LZW ---------------------------------------------------------------------


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF LZW stream -> index array. Codes are packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole stream (sub-blocks already joined)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    pos = 0
    width = min_code_size + 1
    # table: list of byte sequences; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    n_bits = len(bits)
    while pos + width <= n_bits:
        code = int(np.packbits(bits[pos : pos + width], bitorder="little").view(
            np.uint8
        )[0]) if width <= 8 else int.from_bytes(
            np.packbits(bits[pos : pos + width], bitorder="little").tobytes(), "little"
        )
        pos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _TABLE_LIMIT:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < _TABLE_LIMIT:
                table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if len(out) >= n_expected:
            break
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """Index array -> GIF LZW stream (emits CLEAR when the table fills)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []  # (value, width) pairs flattened as tuples
    codes: list[tuple[int, int]] = []

    def emit(code: int, width: int):
        codes.append((code, width))

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for v in indices.tobytes():
        c = w + bytes([v])
        if c in table:
            w = c
            continue
        emit(table[w], width)
        if next_code < _TABLE_LIMIT:
            # the decoder adds one entry per code EXCEPT the first after
            # a clear, so its table trails this counter by one — widen
            # one step later than the decoder's len==2^width boundary
            table[c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([v])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    # pack LSB-first
    total = sum(wd for _c, wd in codes)
    bits = np.zeros(total, dtype=np.uint8)
    p = 0
    for c, wd in codes:
        for b in range(wd):
            bits[p + b] = (c >> b) & 1
        p += wd
    return np.packbits(bits, bitorder="little").tobytes()


# -- container ---------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_decode(payload: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (h, w, 3) — the first image frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x7)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(b"".join(chunks), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF image data")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        if int(rows.max(initial=0)) >= len(ct):
            raise ValueError("palette index out of range")
        return ct[rows]  # (h, w, 3)
    raise ValueError("no image block in GIF")


def gif_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w, 3|1) -> GIF89a bytes (exact palette, <= 256 colors)."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) uint8")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors; GIF needs <= 256 "
            "(quantize upstream)"
        )
    # pad palette to a power of two >= 2
    size = 2
    while size < len(palette):
        size *= 2
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    gct_bits = int(size).bit_length() - 2  # 2 << gct_bits == size
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
        )
        indices = indices[order]
    min_code_size = max(2, int(size).bit_length() - 1)
    data = _lzw_compress(indices.reshape(-1), min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits & 0x7), 0, 0)
    out += pal.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# -- animated GIF (GIF89a multi-frame) ---------------------------------------
# Real web GIFs are animations: a stream of image descriptors, each
# optionally preceded by a Graphic Control Extension (disposal method,
# delay, transparent index), composited onto a logical-screen canvas.
# Spec: GIF89a specification (public), GCE block 0x21 0xF9.


def gif_decode_frames(payload: bytes, max_frames: int | None = None) -> list:
    """GIF bytes -> list of composited uint8 (h, w, 3) canvases, one
    per animation frame.

    Full compositing semantics: sub-rectangle placement, transparency
    (transparent pixels leave the canvas through), and all three
    disposal methods (1 leave / 2 restore-background / 3
    restore-previous). The canvas starts as the logical-screen
    background color (global-palette bg index, else black).
    ``max_frames`` stops parsing early — sampling k frames of a long
    animation never decodes past the last needed frame (the LZW data
    of *skipped* frames is still walked for framing, which is the GIF
    format's cost: unlike AVI there is no index)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    frames: list = []
    disposal = 0
    transparent: int | None = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # Graphic Control
                gfields = payload[pos + 1]
                disposal = (gfields >> 2) & 0x7
                transparent = payload[pos + 4] if gfields & 0x1 else None
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x7)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(b"".join(chunks), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF image data")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        if int(rows.max(initial=0)) >= len(ct):
            raise ValueError("palette index out of range")
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent is not None:
            opaque = rows != transparent
            region[opaque] = ct[rows[opaque]]
        else:
            region[:, :] = ct[rows]
        frames.append(canvas.copy())
        if disposal == 2:  # restore background in the frame's rect
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3 and prev is not None:
            canvas = prev
        disposal, transparent = 0, None
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("no image block in GIF")
    return frames


def gif_encode_animated(
    frames: np.ndarray, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """uint8 (n, h, w, 3) -> animated GIF89a bytes.

    One exact global palette over ALL frames (<= 256 distinct colors,
    quantize upstream), each frame a full-canvas image descriptor with a
    GCE (disposal=1 leave-in-place, delay in centiseconds); optional
    NETSCAPE2.0 infinite-loop extension like real encoders emit."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("expected (n, h, w, 3) uint8")
    n_frames, h, w, _ = frames.shape
    flat = frames.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors across frames; GIF needs <= 256"
        )
    size = 2
    while size < len(palette):
        size *= 2
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    gct_bits = int(size).bit_length() - 2
    min_code_size = max(2, int(size).bit_length() - 1)
    indices = inverse.astype(np.uint8).reshape(n_frames, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits & 0x7), 0, 0)
    out += pal.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n_frames):
        # GCE: disposal=1 (leave), no transparency
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        data = _lzw_compress(indices[f].reshape(-1), min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
