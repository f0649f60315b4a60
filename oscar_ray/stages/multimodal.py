"""Multimodal (image/audio/video) column stages.

Media rides as opaque ``binary`` columns with typed metadata, exactly how
``html: binary`` rides in the pages schema. Decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages: heavy codec
state loads once per actor, batches stay small because payload rows are
large (set ``batch_size`` accordingly and keep ``batch_format="pyarrow"``
— binary columns do not survive pandas round-trips cleanly).

Codec support is tiered by what this container can actually do:

- **real, library-free decoders** (pure numpy/struct, fully implemented
  and tested): PPM/PGM images (``decode_ppm``), baseline AND
  progressive JPEG (``stages/jpeg.py`` — real Huffman + DCT compressed
  decode, 8-bit incl. 4:2:0/4:2:2 subsampling and SOF2 multi-scan),
  PNG (``stages/png.py`` — zlib inflate + all five scanline filters,
  gray/RGB/RGBA/palette at 8-bit), GIF (``stages/gif.py`` —
  variable-width LZW, palette, interlace), RIFF/WAV audio as PCM16 AND
  compressed IMA-ADPCM (``decode_wav`` / ``ima_adpcm_decode``,
  block-parallel), a raw-RGB frame container (``RVID``,
  ``decode_rvid_header``) and MJPEG-in-AVI video (``stages/avi.py`` —
  RIFF parse, idx1 random access, per-frame JPEG decode) — decode,
  nearest-neighbor resize, feature extraction and frame sampling all
  operate on real pixels/samples;
- ``decoder="fake"``: deterministic pseudo-features from payload bytes
  (plumbing/schema testing for arbitrary payloads);
- ``decoder="real"``: the Pillow/ffmpeg path for the remaining
  compressed formats (mp3/ogg, inter-frame video codecs like h264) —
  NotImplementedError in this container (libs absent), with the
  actor-state shape (load codec once in ``__init__``) kept real.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def sniff_media(payload: bytes) -> str:
    """Magic-byte container/codec sniff for mixed-corpus routing.

    -> one of ``jpeg png gif ppm wav avi rvid mp3 mp4 ogg h264 webm
    unknown``. A real crawl's media column is MOSTLY formats outside
    the library-free envelope (mp3/aac in mp4, h264); the feature
    stages use this to stream those rows through as counted skips
    instead of dying mid-corpus."""
    p = payload or b""
    if p[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if p[:2] in (b"P5", b"P6") and (len(p) > 2 and p[2:3] in b" \t\r\n"):
        return "ppm"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "avi"
    if p[:4] == b"RVID":
        return "rvid"
    if p[:3] == b"ID3" or (len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0):
        return "mp3"
    if p[4:8] == b"ftyp":
        return "mp4"
    if p[:4] == b"OggS":
        return "ogg"
    if p[:4] == b"\x1aE\xdf\xa3":
        return "webm"
    if p[:4] in (b"\x00\x00\x00\x01",) or p[:3] == b"\x00\x00\x01":
        return "h264"
    return "unknown"


# --------------------------------------------------------------------------
# library-free codecs
# --------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) -> uint8 array (h, w, c).

    Full header grammar: magic, whitespace/comments, width, height,
    maxval (<= 255 supported). Raises ValueError on malformed input.
    """
    if not payload or payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        raise ValueError("not a P5/P6 netpbm payload")
    channels = 3 if payload[1:2] == b"6" else 1
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return data.reshape(h, w, channels)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 1|3) -> P5/P6 bytes (inverse of decode_ppm)."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure-numpy index grids (no loops)."""
    h, w, _ = img.shape
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    ci = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ri[:, None], ci[None, :], :]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE -> (samples float64 in [-1, 1] shaped
    (n, channels), sample_rate). Walks the chunk list (fmt before data).

    Formats: PCM16 (tag 1) and COMPRESSED IMA-ADPCM (tag 0x11, 4-bit —
    the classic 4x-compressed dictation/game format) — the latter decoded
    by the block-parallel numpy routine below. Other tags (MP3/AAC/...)
    stay honest gates: no codec libraries exist in this container."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n_fact = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (n_fact,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, block_align, bits = fmt
    if audio_format == 0x11:  # IMA ADPCM
        if bits != 4:
            raise NotImplementedError("only 4-bit IMA ADPCM")
        if n_channels != 1:
            raise NotImplementedError("stereo IMA ADPCM not supported")
        pcm = ima_adpcm_decode(data, block_align)
        if n_fact is not None:  # trim final-block padding
            pcm = pcm[:n_fact]
        return pcm.reshape(-1, 1).astype(np.float64) / 32768.0, sample_rate
    if audio_format in (6, 7):  # G.711 A-law / mu-law
        if bits not in (0, 8):
            raise NotImplementedError("G.711 is 8 bits/sample")
        codes = np.frombuffer(data, dtype=np.uint8)
        pcm = (ulaw_decode if audio_format == 7 else alaw_decode)(codes)
        n = len(pcm) // n_channels * n_channels
        return (
            pcm[:n].reshape(-1, n_channels).astype(np.float64) / 32768.0,
            sample_rate,
        )
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"unsupported WAV format tag 0x{audio_format:x} (PCM16, "
            "IMA-ADPCM and G.711 only; other formats need codec libraries)"
        )
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // n_channels * n_channels
    return (
        samples[:n].reshape(-1, n_channels).astype(np.float64) / 32768.0,
        sample_rate,
    )


# -- IMA ADPCM (WAV format tag 0x11) ----------------------------------------
# Predictor + step-size-table quantizer (IMA/DVI spec): each block is
# independent (header carries the seed sample + step index), so both
# directions VECTORIZE ACROSS BLOCKS — the serial recursion runs over
# the ~2*(block_align-4) nibbles of a block while every block advances
# in lockstep as numpy lanes.

_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: np.ndarray, idx: np.ndarray, nib: np.ndarray):
    """One IMA reconstruction step, vectorized over block lanes:
    (pred, idx, nibble) -> (pred', idx'). Shared by decode and the
    encoder's predictor update (the spec requires the encoder to track
    the decoder's reconstruction exactly)."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    diff = diff + np.where(nib & 1, step >> 2, 0)
    diff = diff + np.where(nib & 2, step >> 1, 0)
    diff = diff + np.where(nib & 4, step, 0)
    pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
    idx = np.clip(idx + _IMA_INDEX_TABLE[nib & 7], 0, 88)
    return pred, idx


def ima_adpcm_decode(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA-ADPCM data chunk -> int16 samples (block-parallel)."""
    if block_align < 4:
        raise ValueError("block_align too small")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.empty(0, dtype=np.int16)
    raw = np.frombuffer(data, dtype=np.uint8, count=n_blocks * block_align).reshape(
        n_blocks, block_align
    )
    pred = raw[:, :2].copy().view("<i2")[:, 0].astype(np.int64)
    idx = np.clip(raw[:, 2].astype(np.int64), 0, 88)
    body = raw[:, 4:]
    # nibble order: low nibble of byte 0 first
    nibs = np.empty((n_blocks, body.shape[1] * 2), dtype=np.int64)
    nibs[:, 0::2] = body & 0xF
    nibs[:, 1::2] = body >> 4
    out = np.empty((n_blocks, 1 + nibs.shape[1]), dtype=np.int64)
    out[:, 0] = pred
    for s in range(nibs.shape[1]):
        pred, idx = _ima_step(pred, idx, nibs[:, s])
        out[:, 1 + s] = pred
    return out.reshape(-1).astype(np.int16)


def ima_adpcm_encode(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Mono int16 samples -> IMA-ADPCM data bytes (block-parallel).

    Each block: 4-byte header (seed sample int16, step index, reserved)
    + 4-bit codes. The step index is seeded per block from the first
    delta's magnitude (any seed is spec-valid — the header transmits it)."""
    spb = (block_align - 4) * 2 + 1  # samples per block
    s = np.asarray(samples, dtype=np.int64)
    n_blocks = (len(s) + spb - 1) // spb
    if n_blocks == 0:
        return b""
    pad = n_blocks * spb - len(s)
    if pad:
        s = np.concatenate([s, np.full(pad, s[-1] if len(s) else 0, dtype=np.int64)])
    blocks = s.reshape(n_blocks, spb)
    pred = blocks[:, 0].copy()
    # seed index: closest step to the first delta (vector searchsorted)
    first_delta = np.abs(np.diff(blocks[:, :2], axis=1))[:, 0] if spb > 1 else np.zeros(n_blocks, dtype=np.int64)
    idx = np.clip(
        np.searchsorted(_IMA_STEP_TABLE, first_delta), 0, 88
    ).astype(np.int64)
    header = np.zeros((n_blocks, 4), dtype=np.uint8)
    header[:, :2] = pred.astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    header[:, 2] = idx.astype(np.uint8)
    nibs = np.empty((n_blocks, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        target = blocks[:, t]
        step = _IMA_STEP_TABLE[idx]
        diff = target - pred
        sign = (diff < 0).astype(np.int64) * 8
        mag = np.abs(diff)
        nib = np.zeros(n_blocks, dtype=np.int64)
        ge = mag >= step
        nib |= np.where(ge, 4, 0)
        mag = mag - np.where(ge, step, 0)
        half = step >> 1
        ge = mag >= half
        nib |= np.where(ge, 2, 0)
        mag = mag - np.where(ge, half, 0)
        quarter = step >> 2
        nib |= np.where(mag >= quarter, 1, 0)
        nib |= sign
        pred, idx = _ima_step(pred, idx, nib)
        nibs[:, t - 1] = nib.astype(np.uint8)
    packed = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    return np.concatenate([header, packed], axis=1).tobytes()


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int, block_align: int = 256
) -> bytes:
    """(n, 1) float in [-1,1] -> COMPRESSED mono IMA-ADPCM WAV bytes
    (fmt tag 0x11 with samples-per-block extension + fact chunk)."""
    if samples.ndim != 2 or samples.shape[1] != 1:
        raise ValueError("mono (n, 1) samples required")
    pcm16 = (np.clip(samples[:, 0], -1.0, 1.0) * 32767.0).astype(np.int64)
    data = ima_adpcm_encode(pcm16, block_align)
    spb = (block_align - 4) * 2 + 1
    n_blocks = len(data) // block_align
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(pcm16))
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data)))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return out


# -- G.711 mu-law / A-law (WAV format tags 7 / 6) ---------------------------
# The telephony log-PCM codecs: 8 bits per sample, decode is a pure
# sign/exponent/mantissa formula (ITU-T G.711), fully vectorized.


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law bytes -> int16 linear (G.711 expansion formula)."""
    u = (~codes.astype(np.int64)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law bytes -> int16 linear (G.711 expansion formula)."""
    a = codes.astype(np.int64) ^ 0x55
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def _g711_encode_nearest(pcm16: np.ndarray, decode_fn) -> np.ndarray:
    """Nearest-codeword encoder: build the 256-entry expansion table
    once, searchsorted each sample against the sorted codeword values —
    spec-conformant (any decoder reproduces the nearest level) and
    vectorized, no per-sample branching."""
    table = decode_fn(np.arange(256, dtype=np.uint8)).astype(np.int64)
    order = np.argsort(table, kind="stable")
    levels = table[order]
    pos = np.searchsorted(levels, pcm16)
    lo = np.clip(pos - 1, 0, 255)
    hi = np.clip(pos, 0, 255)
    pick = np.where(
        np.abs(levels[hi] - pcm16) < np.abs(pcm16 - levels[lo]), hi, lo
    )
    return order[pick].astype(np.uint8)


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int, law: str = "ulaw"
) -> bytes:
    """(n, channels) float in [-1,1] -> G.711 WAV bytes (tag 7 mu-law
    or tag 6 A-law, 8 bits/sample)."""
    tag, decode_fn = (7, ulaw_decode) if law == "ulaw" else (6, alaw_decode)
    pcm16 = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int64)
    n_ch = samples.shape[1]
    data = _g711_encode_nearest(pcm16.reshape(-1), decode_fn).tobytes()
    fmt = struct.pack(
        "<HHIIHHH", tag, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8, 0
    )
    fact = struct.pack("<I", len(samples))
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data)))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float in [-1,1] -> PCM16 WAV bytes."""
    s = np.clip(samples, -1.0, 1.0)
    pcm = (s * 32767.0).astype("<i2").tobytes()
    n_ch = samples.shape[1]
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, n_ch,
        sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 -> raw-RGB video container bytes."""
    n, h, w, _ = frames.shape
    return RVID_MAGIC + struct.pack("<III", w, h, n) + frames.tobytes()


def decode_rvid_header(payload: bytes) -> tuple[int, int, int]:
    """-> (width, height, n_frames); frame i is a fixed-stride slice."""
    if payload[:4] != RVID_MAGIC or len(payload) < 16:
        raise ValueError("not an RVID payload")
    return struct.unpack_from("<III", payload, 4)


def rvid_frame(payload: bytes, i: int) -> np.ndarray:
    """Decode frame i -> uint8 (h, w, 3) without touching other frames."""
    w, h, n = decode_rvid_header(payload)
    if not 0 <= i < n:
        raise IndexError(i)
    stride = w * h * 3
    off = 16 + i * stride
    return np.frombuffer(payload, dtype=np.uint8, count=stride, offset=off).reshape(
        h, w, 3
    )


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real feature vector from pixels: per-channel mean/std + a
    grayscale thumbnail, padded/truncated to ``dim`` float32s."""
    gray = img.astype(np.float32).mean(axis=2)
    stats = []
    for c in range(img.shape[2]):
        ch = img[:, :, c].astype(np.float32)
        stats.extend([ch.mean() / 255.0, ch.std() / 255.0])
    side = max(1, int(np.sqrt(max(dim - len(stats), 1))))
    thumb = resize_nearest(gray[:, :, None].astype(np.uint8), side, side)[:, :, 0]
    feat = np.concatenate(
        [np.asarray(stats, dtype=np.float32), thumb.reshape(-1).astype(np.float32) / 255.0]
    )
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return feat[:dim]


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Real audio features: duration, RMS, zero-crossing rate, spectral
    centroid (rfft) — all numpy, mono-mixed."""
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt((mono**2).mean())) if n else 0.0
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    if n:
        spec = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
        centroid = float((spec * freqs).sum() / max(spec.sum(), 1e-12))
    else:
        centroid = 0.0
    return {
        "duration_s": round(n / sample_rate, 6) if sample_rate else 0.0,
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "spectral_centroid_hz": round(centroid, 3),
        "sample_rate": sample_rate,
        "n_channels": samples.shape[1],
    }


class ImageFeatureStage:
    """Actor-pool stage: binary image -> fixed-dim feature vector.

    Output schema: (id, feature: list<float32>[dim], width, height).
    Decoders: ``"ppm"`` — REAL decode of P5/P6 netpbm payloads;
    ``"jpeg"`` — REAL baseline-JPEG decode (pure numpy Huffman + IDCT,
    ``stages/jpeg.py``); ``"png"`` / ``"gif"`` — REAL deflate / LZW
    decodes (``stages/png.py`` / ``stages/gif.py``); all produce pixel
    stats + grayscale thumbnail
    features with true width/height. ``"fake"`` — deterministic digest
    features for arbitrary payloads; ``"real"`` — the Pillow path for
    formats outside the library-free envelope, NotImplementedError here.
    """

    IMAGE_FORMATS = ("jpeg", "png", "gif", "ppm")

    def __init__(
        self,
        id_col: str = "doc_id",
        media_col: str = "media",
        dim: int = 64,
        decoder: str = "fake",
        passthrough_cols: tuple = (),
        on_unsupported: str = "raise",
    ):
        self.id_col, self.media_col, self.dim = id_col, media_col, dim
        if decoder not in ("fake", "real", "ppm", "jpeg", "png", "gif", "auto"):
            raise ValueError(decoder)
        if on_unsupported not in ("raise", "skip"):
            raise ValueError(on_unsupported)
        self.decoder = decoder
        self.on_unsupported = on_unsupported
        self.passthrough_cols = list(passthrough_cols)
        # a compressed-format path would load the codec/model ONCE here
        # (per actor): self.model = load_feature_extractor(...)

    def _features(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        decoder = self.decoder
        if decoder == "auto":
            # mixed-corpus routing: sniff, decode the envelope formats,
            # surface everything else as an unsupported-format skip
            fmt = sniff_media(payload)
            if fmt not in self.IMAGE_FORMATS:
                raise NotImplementedError(f"unsupported image format: {fmt}")
            decoder = fmt
        if decoder == "real":
            raise NotImplementedError(
                "real image decode requires Pillow/libjpeg (not in this container)"
            )
        if decoder == "jpeg":
            from oscar_ray.stages.jpeg import jpeg_decode

            img = jpeg_decode(payload)
            return image_features(img, self.dim), img.shape[1], img.shape[0]
        if decoder == "png":
            from oscar_ray.stages.png import png_decode

            img = png_decode(payload)
            # drop the alpha plane for features: RGBA -> RGB, gray+alpha
            # -> gray (alpha is channel 1 of a 2-channel image, not color)
            if img.shape[2] == 4:
                img = img[:, :, :3]
            elif img.shape[2] == 2:
                img = img[:, :, :1]
            return image_features(img, self.dim), img.shape[1], img.shape[0]
        if decoder == "gif":
            from oscar_ray.stages.gif import gif_decode

            img = gif_decode(payload)
            return image_features(img, self.dim), img.shape[1], img.shape[0]
        if decoder == "ppm":
            img = decode_ppm(payload)
            return image_features(img, self.dim), img.shape[1], img.shape[0]
        # deterministic fake: stretch a 32-byte digest to dim floats in [0,1)
        dig = hashlib.blake2b(payload or b"", digest_size=32).digest()
        reps = (self.dim * 4 + len(dig) - 1) // len(dig)
        raw = (dig * reps)[: self.dim * 4]
        return (
            np.frombuffer(raw, dtype=np.uint32).astype(np.float32) / np.float32(2**32),
            0,
            0,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ws, hs, reasons = [], [], [], []
        for p in batch[self.media_col].to_pylist():
            try:
                f, w, h = self._features(p)
            except NotImplementedError as e:
                if self.on_unsupported != "skip":
                    raise
                # counted skip: the row streams through with its reason;
                # a mixed real-world corpus must not die on one mp4
                feats.append([])
                ws.append(0)
                hs.append(0)
                reasons.append(str(e))
                continue
            feats.append(f.tolist())
            ws.append(w)
            hs.append(h)
            reasons.append("")
        cols = {
            self.id_col: batch[self.id_col].cast(pa.int64()),
            **{c: batch[c] for c in self.passthrough_cols},
            "feature": pa.array(feats, type=pa.list_(pa.float32())),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
        if self.on_unsupported == "skip":
            cols["skip_reason"] = pa.array(reasons, type=pa.string())
        return pa.table(cols)


class ImageResizeStage:
    """Actor-pool stage: PPM/PGM payload -> resized PPM/PGM payload
    (REAL pixels, nearest-neighbor). Output: (id, media, width, height)."""

    def __init__(
        self,
        out_w: int,
        out_h: int,
        id_col: str = "doc_id",
        media_col: str = "media",
    ):
        self.out_w, self.out_h = out_w, out_h
        self.id_col, self.media_col = id_col, media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch[self.media_col].to_pylist():
            img = decode_ppm(p)
            out.append(encode_ppm(resize_nearest(img, self.out_h, self.out_w)))
        n = len(out)
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                "media": pa.array(out, type=pa.binary()),
                "width": pa.array([self.out_w] * n, type=pa.int32()),
                "height": pa.array([self.out_h] * n, type=pa.int32()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: WAV PCM16 payload -> REAL audio features.

    Output: (id, duration_s, rms, zcr, spectral_centroid_hz,
    sample_rate, n_channels). ``decoder="wav"`` covers PCM16 and
    IMA-ADPCM payloads; ``"avi"`` demuxes the PCM16 auds stream out of
    an MJPEG AVI container (``stages/avi.py``); ``"real"`` (mp3/ogg via
    ffmpeg) is NotImplementedError in this container.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        media_col: str = "media",
        decoder: str = "wav",
        on_unsupported: str = "raise",
    ):
        if decoder not in ("wav", "avi", "real", "auto"):
            raise ValueError(decoder)
        if on_unsupported not in ("raise", "skip"):
            raise ValueError(on_unsupported)
        self.id_col, self.media_col, self.decoder = id_col, media_col, decoder
        self.on_unsupported = on_unsupported

    def _decode(self, p: bytes) -> tuple[np.ndarray, int]:
        decoder = self.decoder
        if decoder == "auto":
            fmt = sniff_media(p)
            if fmt == "wav":
                decoder = "wav"
            elif fmt == "avi":
                decoder = "avi"
            else:
                raise NotImplementedError(f"unsupported audio format: {fmt}")
        if decoder == "real":
            raise NotImplementedError("compressed audio requires ffmpeg")
        if decoder == "avi":
            from .avi import avi_audio

            return avi_audio(p)
        return decode_wav(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        skip_mode = self.on_unsupported == "skip"
        rows = []
        for i, p in enumerate(batch[self.media_col].to_pylist()):
            try:
                samples, rate = self._decode(p)
            except NotImplementedError as e:
                if not skip_mode:
                    raise
                f = {
                    "duration_s": 0.0,
                    "rms": 0.0,
                    "zcr": 0.0,
                    "spectral_centroid_hz": 0.0,
                    "sample_rate": 0,
                    "n_channels": 0,
                    "skip_reason": str(e),
                }
                f[self.id_col] = batch[self.id_col][i].as_py()
                rows.append(f)
                continue
            f = audio_features(samples, rate)
            if skip_mode:
                f["skip_reason"] = ""
            f[self.id_col] = batch[self.id_col][i].as_py()
            rows.append(f)
        return pa.Table.from_pylist(rows)


class FrameSampleStage:
    """Actor-pool stage: binary video -> N sampled frame payloads (flat rows).

    Output: (id, frame_index, frame: binary). Decoders: ``"rvid"`` —
    REAL frame extraction from the raw-RGB container (evenly-spaced
    frame indices, each emitted as a standalone PPM payload);
    ``"avi"`` — REAL MJPEG-in-AVI decode (``stages/avi.py``: RIFF
    parse + idx1 random access + per-frame JPEG decode; only the k
    sampled frames are ever decoded); ``"gif"`` — REAL animated-GIF
    decode (``stages/gif.py::gif_decode_frames``: full disposal/
    transparency compositing; GIF has no frame index, so sampling
    walks up to the last needed frame); ``"fake"`` — deterministic
    byte slices; ``"real"`` — ffmpeg path for codecs outside the
    envelope, NotImplementedError here.
    """

    VIDEO_FORMATS = ("rvid", "avi", "gif")

    def __init__(
        self,
        id_col: str = "doc_id",
        media_col: str = "media",
        n_frames: int = 4,
        decoder: str = "fake",
        on_unsupported: str = "raise",
    ):
        if decoder not in ("fake", "real", "rvid", "avi", "gif", "auto"):
            raise ValueError(decoder)
        if on_unsupported not in ("raise", "skip"):
            raise ValueError(on_unsupported)
        self.id_col, self.media_col, self.n_frames = id_col, media_col, n_frames
        self.decoder = decoder
        self.on_unsupported = on_unsupported

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real video decode requires ffmpeg")
        skip_mode = self.on_unsupported == "skip"
        ids, fidx, frames, reasons = [], [], [], []
        for i, payload in enumerate(batch[self.media_col].to_pylist()):
            # keep reasons in lockstep with emitted rows: rows emitted by
            # the previous payload's decode branches carry ''
            reasons += [""] * (len(ids) - len(reasons))
            payload = payload or b""
            decoder = self.decoder
            if decoder == "auto":
                fmt = sniff_media(payload)
                if fmt not in self.VIDEO_FORMATS:
                    if not skip_mode:
                        raise NotImplementedError(
                            f"unsupported video format: {fmt}"
                        )
                    # counted skip: one marker row per undecodable payload
                    ids.append(batch[self.id_col][i].as_py())
                    fidx.append(-1)
                    frames.append(b"")
                    reasons.append(f"unsupported video format: {fmt}")
                    continue
                decoder = fmt
            n_before = len(ids)
            if decoder == "avi":
                from .avi import avi_frame, avi_parse

                info = avi_parse(payload)
                n_avail = len(info.frame_spans)
                take = min(self.n_frames, n_avail)
                picks = (
                    np.linspace(0, n_avail - 1, take).astype(np.int64)
                    if take
                    else np.empty(0, np.int64)
                )
                for f, src in enumerate(picks.tolist()):
                    img = avi_frame(payload, src, info)
                    if img.shape[2] == 1:
                        img = np.repeat(img, 3, axis=2)
                    ids.append(batch[self.id_col][i].as_py())
                    fidx.append(f)
                    frames.append(encode_ppm(img))
                continue
            if decoder == "gif":
                from .gif import gif_decode_frames

                all_frames = gif_decode_frames(payload)
                n_avail = len(all_frames)
                take = min(self.n_frames, n_avail)
                picks = (
                    np.linspace(0, n_avail - 1, take).astype(np.int64)
                    if take
                    else np.empty(0, np.int64)
                )
                for f, src in enumerate(picks.tolist()):
                    ids.append(batch[self.id_col][i].as_py())
                    fidx.append(f)
                    frames.append(encode_ppm(all_frames[src]))
                continue
            if decoder == "rvid":
                _w, _h, n_avail = decode_rvid_header(payload)
                take = min(self.n_frames, n_avail)
                picks = (
                    np.linspace(0, n_avail - 1, take).astype(np.int64)
                    if take
                    else np.empty(0, np.int64)
                )
                for f, src in enumerate(picks.tolist()):
                    ids.append(batch[self.id_col][i].as_py())
                    fidx.append(f)
                    frames.append(encode_ppm(rvid_frame(payload, src)))
                continue
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(batch[self.id_col][i].as_py())
                fidx.append(f)
                frames.append(payload[f * step : (f + 1) * step])
        cols = {
            self.id_col: pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(fidx, type=pa.int32()),
            "frame": pa.array(frames, type=pa.binary()),
        }
        if skip_mode:
            # decoded rows carry '' — reasons was only appended for skip
            # markers, so pad it to the emitted row count in order
            reasons += [""] * (len(ids) - len(reasons))
            cols["skip_reason"] = pa.array(reasons, type=pa.string())
        return pa.table(cols)
