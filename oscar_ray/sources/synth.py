"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Produces the exact input_hint shape from BASELINE.json:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. Seeded, order-independent (row i's content depends only
on (seed, i)), so any scale/sharding regenerates identical rows —
the analog of the reference's seeded query sampling
(``oscar-cmd/oscarmain.cpp:23`` `srand(0)`).

Content knobs mirror FIXTURES.md: Zipf(1.1) term draw over a 10k-term
vocab (head-term skew), LogNormal doc lengths clamped to [8, 2048],
~1% empty docs, ~2% exact-duplicate urls, 5% tokens get mixed-case or
accented variants (exercises NFC+lowercase normalization), lang mix
en/de/und.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from oscar_ray.spec.extract import make_html

VOCAB_SIZE = 10_000
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

_ACCENT_MAP = str.maketrans("aeiou", "áéíóú")
_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _vocab() -> np.ndarray:
    """Deterministic 10k alphabetic vocab: 'w' + base-26 triple (waaa..won?).

    Alphabetic (with vowels) so the 5% case/diacritic variants actually
    exercise the normalization spec (upper + accent fold back to base).
    """
    words = []
    for i in range(VOCAB_SIZE):
        words.append(
            "w" + _LETTERS[i // 676] + _LETTERS[(i // 26) % 26] + _LETTERS[i % 26]
        )
    return np.array(words, dtype=object)


def generate_pages_batch(
    start_row: int, n_rows: int, seed: int = 42, dup_rate: float = 0.02
) -> pa.Table:
    """Generate rows [start_row, start_row+n_rows) of the pages table.

    Row content is a pure function of (seed, absolute row index) — the
    per-row RNG is seeded with (seed, row) — so sharding and scale do
    not change row contents.
    """
    vocab = _vocab()
    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    htmls: list[bytes] = []
    ts = np.arange(start_row, start_row + n_rows, dtype="int64") * 1_000_000

    for row in range(start_row, start_row + n_rows):
        rng = np.random.default_rng((seed, row))
        # ~2% exact duplicates: point at an earlier row's url AND text
        if row > 10 and rng.random() < dup_rate:
            src = int(rng.integers(0, row))
            src_rng = np.random.default_rng((seed, src))
            url, text, lang = _gen_row(src_rng, src, vocab)
        else:
            url, text, lang = _gen_row(rng, row, vocab)
        urls.append(url)
        texts.append(text)
        langs.append(lang)
        htmls.append(make_html(text, title=url))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _gen_row(rng: np.random.Generator, row: int, vocab: np.ndarray):
    site = min(int(rng.zipf(1.2)), 1000)
    url = f"https://site{site}.example/p/{row}"
    lang = rng.choice(["en", "de", "und"], p=[0.90, 0.06, 0.04])
    if rng.random() < 0.01:
        return url, "", lang
    doclen = int(np.clip(rng.lognormal(4.0, 0.6), 8, 2048))
    term_ids = np.minimum(rng.zipf(1.1, size=doclen), VOCAB_SIZE) - 1
    toks = vocab[term_ids].tolist()
    # 5% of tokens get case/diacritic variants; normalization folds them back
    n_var = int(0.05 * doclen)
    if n_var:
        idx = rng.integers(0, doclen, size=n_var)
        for j, i in enumerate(idx):
            toks[i] = toks[i].upper() if j % 2 == 0 else toks[i].translate(_ACCENT_MAP)
    return url, " ".join(toks), lang


def write_pages(
    out_dir: str,
    n_rows: int,
    n_files: int = 4,
    rows_per_group: int | None = None,
    seed: int = 42,
    dup_rate: float = 0.02,
) -> list[str]:
    """Write the pages table as n_files parquet files; returns file paths.

    Layout (file count, row-group size) is part of the fixture: docid
    assignment derives from (file ordinal, row-group offsets).
    """
    os.makedirs(out_dir, exist_ok=True)
    per_file = (n_rows + n_files - 1) // n_files
    paths = []
    start = 0
    for f in range(n_files):
        n = min(per_file, n_rows - start)
        if n <= 0:
            break
        tbl = generate_pages_batch(start, n, seed=seed, dup_rate=dup_rate)
        path = os.path.join(out_dir, f"pages-{f:04d}.parquet")
        pq.write_table(tbl, path, row_group_size=rows_per_group or max(1, n // 2))
        paths.append(path)
        start += n
    return paths


def generate_ppm(doc_id: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic P6 image per doc: seeded gradient + noise (real
    pixels for the library-free PPM decode path)."""
    import numpy as np

    from oscar_ray.stages.multimodal import encode_ppm

    rng = np.random.default_rng(doc_id * 2654435761 % (2**32))
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None, None]
    base = (gx + gy) / 2
    noise = rng.integers(0, 64, size=(h, w, 3)).astype(np.float64)
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    return encode_ppm(img)


def generate_jpeg(doc_id: int, w: int = 24, h: int = 16, quality: int = 85) -> bytes:
    """Deterministic baseline-JPEG image per doc (same pixel generator as
    :func:`generate_ppm`, compressed through the library-free encoder —
    real Huffman/DCT bytes for the compressed-decode path). Subsampling
    cycles 420/444/422 by doc id and odd ids emit PROGRESSIVE (SOF2)
    multi-scan streams, so the corpus exercises the full real-world
    envelope (4:2:0 baseline and progressive are the web defaults);
    progressive decode is bit-exact vs baseline (same coefficients)."""
    import numpy as np

    from oscar_ray.stages.jpeg import jpeg_encode, jpeg_encode_progressive
    from oscar_ray.stages.multimodal import decode_ppm

    img = decode_ppm(generate_ppm(doc_id, w=w, h=h))
    sub = ("420", "444", "422")[int(doc_id) % 3]
    enc = jpeg_encode_progressive if int(doc_id) % 2 else jpeg_encode
    return enc(np.ascontiguousarray(img), quality=quality, subsampling=sub)


def generate_png(doc_id: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic PNG per doc (same pixels as :func:`generate_ppm`,
    Paeth-filtered so the decode path exercises real filter math)."""
    from oscar_ray.stages.multimodal import decode_ppm
    from oscar_ray.stages.png import png_encode

    return png_encode(decode_ppm(generate_ppm(doc_id, w=w, h=h)), filter_type=4)


def generate_wav(doc_id: int, seconds: float = 0.25, rate: int = 8000) -> bytes:
    """Deterministic PCM16 WAV per doc: a sine whose frequency derives
    from the doc id (+ a quieter octave)."""
    import numpy as np

    from oscar_ray.stages.multimodal import encode_wav

    freq = 200.0 + (doc_id * 37) % 1800
    t = np.arange(int(seconds * rate)) / rate
    mono = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(4 * np.pi * freq * t)
    return encode_wav(mono[:, None], rate)


def generate_gif(doc_id: int, w: int = 24, h: int = 16) -> bytes:
    """Deterministic GIF per doc: the generate_ppm pixels posterized to
    <= 64 colors (GIF is palette-bound), LZW-compressed for real."""
    import numpy as np

    from oscar_ray.stages.gif import gif_encode
    from oscar_ray.stages.multimodal import decode_ppm

    img = decode_ppm(generate_ppm(doc_id, w=w, h=h))
    return gif_encode(
        (img // 64 * 64).astype(np.uint8), interlace=bool(doc_id % 2)
    )


def generate_wav_adpcm(doc_id: int, seconds: float = 0.25, rate: int = 8000) -> bytes:
    """Deterministic COMPRESSED audio per doc: the same sine family as
    :func:`generate_wav` but IMA-ADPCM-coded (WAV fmt 0x11, ~4x smaller)
    — the compressed-audio analog of generate_jpeg for images."""
    import numpy as np

    from oscar_ray.stages.multimodal import encode_wav_adpcm

    freq = 200.0 + (doc_id * 37) % 1800
    t = np.arange(int(seconds * rate)) / rate
    mono = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(4 * np.pi * freq * t)
    return encode_wav_adpcm(mono[:, None], rate)


def generate_rvid(doc_id: int, n_frames: int = 6, w: int = 16, h: int = 12) -> bytes:
    """Deterministic raw-RGB video per doc: brightness ramp over frames."""
    import numpy as np

    from oscar_ray.stages.multimodal import encode_rvid

    rng = np.random.default_rng((doc_id + 7) * 40503 % (2**32))
    base = rng.integers(0, 128, size=(h, w, 3), dtype=np.uint8)
    frames = np.stack(
        [np.clip(base.astype(np.int64) + 20 * f, 0, 255).astype(np.uint8) for f in range(n_frames)]
    )
    return encode_rvid(frames)


def generate_avi(doc_id: int, n_frames: int = 6, w: int = 16, h: int = 12) -> bytes:
    """Deterministic COMPRESSED video per doc: the same frame family as
    :func:`generate_rvid` but packed as MJPEG-in-AVI (every frame an
    independent baseline JPEG; subsampling cycles 420/444/422 by doc
    id) plus the :func:`generate_wav` sine as an interleaved PCM16
    auds stream — the real-video-container analog of generate_jpeg."""
    import numpy as np

    from oscar_ray.stages.avi import avi_encode_mjpeg

    rng = np.random.default_rng((doc_id + 7) * 40503 % (2**32))
    base = rng.integers(0, 128, size=(h, w, 3), dtype=np.uint8)
    frames = np.stack(
        [np.clip(base.astype(np.int64) + 20 * f, 0, 255).astype(np.uint8) for f in range(n_frames)]
    )
    sub = ("420", "444", "422")[int(doc_id) % 3]
    rate = 8000
    freq = 200.0 + (doc_id * 37) % 1800
    t = np.arange(int(0.25 * rate)) / rate
    mono = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(4 * np.pi * freq * t)
    return avi_encode_mjpeg(
        frames, fps=10, quality=90, subsampling=sub,
        audio=mono[:, None], audio_rate=rate,
        # odd ids use the real-world camera form: Annex-K fixed tables,
        # DHT segments omitted (decoder fallback path)
        omit_dht=bool(int(doc_id) % 2),
    )


def generate_wav_g711(doc_id: int, seconds: float = 0.25, rate: int = 8000) -> bytes:
    """Deterministic G.711 log-PCM audio per doc: the generate_wav sine
    family compressed to 8-bit mu-law (even ids) / A-law (odd ids) —
    the telephony-format analog of generate_wav_adpcm."""
    import numpy as np

    from oscar_ray.stages.multimodal import encode_wav_g711

    freq = 200.0 + (doc_id * 37) % 1800
    t = np.arange(int(seconds * rate)) / rate
    mono = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(4 * np.pi * freq * t)
    return encode_wav_g711(
        mono[:, None], rate, law="ulaw" if int(doc_id) % 2 == 0 else "alaw"
    )


def generate_gif_anim(doc_id: int, n_frames: int = 6, w: int = 16, h: int = 12) -> bytes:
    """Deterministic ANIMATED GIF per doc: the generate_rvid frame
    family posterized to the GIF palette bound — the web-animation
    analog of generate_avi (no frame index; full LZW per frame)."""
    import numpy as np

    from oscar_ray.stages.gif import gif_encode_animated

    rng = np.random.default_rng((doc_id + 7) * 40503 % (2**32))
    base = rng.integers(0, 128, size=(h, w, 3), dtype=np.uint8)
    frames = np.stack(
        [
            (np.clip(base.astype(np.int64) + 20 * f, 0, 255) // 64 * 64).astype(np.uint8)
            for f in range(n_frames)
        ]
    )
    return gif_encode_animated(frames, delay_cs=10)
