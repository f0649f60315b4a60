"""Library-free MJPEG-in-AVI video codec (RIFF container).

This closes the "any real video codec" envelope gate from the
multimodal brief: AVI with the ``MJPG`` fourcc is a genuine,
widely-produced web/camera format (every frame is an independent
baseline/progressive JPEG), and this container is simple enough to
implement exactly from the public RIFF AVI layout — so unlike mp3/h264
we can decode it for real with no external libraries, reusing the
table-driven JPEG codec in ``stages/jpeg.py``.

Reference parity note: the reference engine treats media blobs as
opaque payloads with typed metadata (SURVEY.md §2 multimodal brief);
this module is the decode step the brief asks to make real where
tractable. Container layout follows the public Microsoft RIFF AVI
spec (AVIMAINHEADER / AVISTREAMHEADER / BITMAPINFOHEADER / idx1).

Envelope (explicit, tested):
- video stream fourcc must be ``MJPG`` (or ``mjpg``); anything else
  (h264/xvid/...) raises ``NotImplementedError`` — honest gate, same
  discipline as compressed audio.
- frames must be self-contained JPEGs (carry their own DHT), which is
  what real MJPEG writers emit and what our encoder produces; a frame
  without tables fails in ``jpeg_decode`` with a clear error.
- audio streams (``..wb`` chunks) are skipped, not decoded.

Random access: ``idx1`` (written by us, present in virtually all
real-world files — AVIF_HASINDEX) gives O(1) frame lookup so sampling
k frames from an n-frame payload never touches the other n-k frames;
a missing idx1 falls back to a linear walk of the ``movi`` list.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + size + data, padded to even length."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode_mjpeg(
    frames: np.ndarray,
    fps: int = 10,
    quality: int = 85,
    subsampling: str = "420",
) -> bytes:
    """uint8 (n, h, w, 3) -> AVI bytes with one MJPG video stream.

    Each frame is an independent baseline JPEG (real-world MJPEG
    default is 4:2:0; selectable). An idx1 index is always written.
    """
    n, h, w, _ = frames.shape
    encoded = [
        jpeg_encode(frames[i], quality=quality, subsampling=subsampling)
        for i in range(n)
    ]
    max_sz = max((len(e) for e in encoded), default=0)

    # movi list: 00dc chunks; idx1 offsets are relative to the 'movi'
    # fourcc (the common convention; the parser also accepts absolute).
    movi_payload = bytearray()
    idx_entries = []
    for e in encoded:
        off = 4 + len(movi_payload)  # from 'movi' fourcc to chunk ckid
        idx_entries.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(e)))
        movi_payload += _chunk(b"00dc", e)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    usec_per_frame = int(round(1_000_000 / max(fps, 1)))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame,        # dwMicroSecPerFrame
        max_sz * max(fps, 1),  # dwMaxBytesPerSec (advisory)
        0,                     # dwPaddingGranularity
        _AVIF_HASINDEX,        # dwFlags
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_sz,                # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,            # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", b"MJPG",
        0, 0, 0,               # dwFlags, wPriority, wLanguage
        0,                     # dwInitialFrames
        1, max(fps, 1),        # dwScale / dwRate -> fps
        0, n,                  # dwStart, dwLength (frames)
        max_sz,                # dwSuggestedBufferSize
        0,                     # dwQuality (default)
        0,                     # dwSampleSize (0: varying)
        0, 0, w, h,            # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


@dataclass
class AviInfo:
    width: int
    height: int
    n_frames: int
    fps: float
    codec: str
    # (payload_offset, size) of each video frame's JPEG bytes,
    # absolute into the AVI payload
    frame_spans: list


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_size); handles even padding."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def avi_parse(payload: bytes) -> AviInfo:
    """Parse container metadata + frame index. MJPG-only envelope."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])

    width = height = n_frames = 0
    fps = 0.0
    codec = ""
    movi_fourcc_pos = -1
    idx1: bytes | None = None
    walk_spans: list[tuple[int, int]] = []

    for fourcc, start, size in _iter_chunks(payload, 12, end):
        if fourcc == b"LIST":
            ltype = payload[start : start + 4]
            if ltype == b"hdrl":
                for f2, s2, z2 in _iter_chunks(payload, start + 4, start + size):
                    if f2 == b"avih" and z2 >= 40:
                        usec, _, _, _, total, _, _, _, w, h = struct.unpack_from(
                            "<10I", payload, s2
                        )
                        width, height, n_frames = w, h, total
                        fps = 1_000_000 / usec if usec else 0.0
                    elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                        for f3, s3, z3 in _iter_chunks(payload, s2 + 4, s2 + z2):
                            if f3 == b"strh" and z3 >= 8:
                                if payload[s3 : s3 + 4] == b"vids":
                                    codec = payload[s3 + 4 : s3 + 8].decode(
                                        "ascii", "replace"
                                    )
            elif ltype == b"movi":
                movi_fourcc_pos = start
                for f2, s2, z2 in _iter_chunks(payload, start + 4, start + size):
                    if f2[2:4] in (b"dc", b"db"):
                        walk_spans.append((s2, z2))
        elif fourcc == b"idx1":
            idx1 = payload[start : start + size]

    if codec.upper() != "MJPG":
        raise NotImplementedError(
            f"AVI video codec {codec!r} outside the MJPG envelope"
        )

    spans: list[tuple[int, int]] = []
    if idx1 is not None and movi_fourcc_pos >= 0:
        for off in range(0, len(idx1) - 15, 16):
            ckid, _flags, chunk_off, chunk_sz = struct.unpack_from("<4sIII", idx1, off)
            if ckid[2:4] not in (b"dc", b"db"):
                continue
            # offsets are movi-relative (common) or absolute (some
            # writers); disambiguate by checking for the ckid bytes.
            abs_pos = movi_fourcc_pos + chunk_off
            if payload[abs_pos : abs_pos + 4] != ckid:
                abs_pos = chunk_off
            spans.append((abs_pos + 8, chunk_sz))
    if not spans:
        spans = walk_spans
    if n_frames == 0:
        n_frames = len(spans)
    return AviInfo(width, height, n_frames, fps, codec, spans)


def avi_frame(payload: bytes, i: int, info: AviInfo | None = None) -> np.ndarray:
    """Decode video frame i -> uint8 (h, w, 3|1), touching only that
    frame's bytes (idx1 random access)."""
    info = info or avi_parse(payload)
    if not 0 <= i < len(info.frame_spans):
        raise IndexError(i)
    off, size = info.frame_spans[i]
    return jpeg_decode(payload[off : off + size])
