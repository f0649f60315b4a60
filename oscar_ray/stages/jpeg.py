"""Baseline JPEG codec, pure numpy + Python bit I/O — no Pillow/libjpeg.

Upgrades the multimodal image path from uncompressed-only (PPM) to a real
compressed format: ``jpeg_encode`` emits spec-conformant baseline
sequential JFIF (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, 8-bit, 4:4:4 / 4:2:2 /
4:2:0 or grayscale, byte-stuffed entropy stream), and ``jpeg_decode`` is
fully TABLE-DRIVEN — Huffman and quant tables are read from the file's
own DHT/DQT segments, and interleaved MCUs honor arbitrary integer
sampling factors (the real-world web default 4:2:0 included, chroma
box-replicated up), so it decodes any compliant baseline sequential
JPEG within its declared envelope (8-bit; DRI/RSTn restart intervals
supported). PROGRESSIVE (SOF2) decode is supported too — spectral
selection + successive approximation per ITU-T T.81 Annex G, all four
scan types (DC first/refine, AC first/refine with EOB runs), with
``jpeg_encode_progressive`` emitting a real multi-scan script for
round-trip evidence (progressive decode is bit-exact vs baseline decode
of the same coefficients). No external
JPEG tool exists in this container, so the subsampled-decode evidence is
(a) a PINNED byte fixture (frozen stream + frozen source raster, bounded
MAE) and (b) encoder/decoder paths that handle subsampling with
independent code (box-average down vs box-replicate up, separate MCU
indexing).

Design notes:
- DCT/IDCT are exact orthonormal matrix products over all blocks at once
  (``einsum`` on an (n, 8, 8) stack) — the only Python-level loop is the
  per-symbol Huffman bit loop, which is what baseline JPEG's entropy
  layer fundamentally is.
- The encoder defaults to SELF-GENERATED canonical Huffman tables (all
  12 DC size symbols at 4 bits, all 162 valid AC run/size symbols at 8
  bits); any prefix-free table is valid baseline JPEG and the tables
  ride in DHT like always. ``tables="annex_k"`` switches to the ITU
  T.81 Annex K typical tables (kept as literals, structurally
  validated in tests against the spec's landmark code lengths), and
  the DECODER falls back to those same tables when a scan references
  an undefined slot — the real-world MJPEG DHT-omitted stream form.
- Quantization uses the IJG quality scaling of the two example tables
  from the JPEG spec (the only table literals kept, they are 8x8 and
  easy to verify).

Round-trip contract (tested): decode(encode(img, q)) equals img up to
quantization error — exact for flat blocks at q=100-ish, bounded MAE
otherwise.
"""

from __future__ import annotations

import struct

import numpy as np

# spec example luminance/chrominance quant tables (JPEG Annex K.1)
_Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_Q_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# zigzag scan order: _ZIGZAG[i] = flat index (row*8+col) of the i-th
# zigzag coefficient; derived, not transcribed
def _zigzag_order() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(s + 1)
        for i in rng if s % 2 else reversed(rng):
            r, c = i, s - i
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal DCT-II basis: block_f = _C @ block @ _C.T
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (1..100) of the spec example tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# -- self-generated canonical Huffman tables (encoder side) -----------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical code assignment: value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))  # size categories 0..11, all 4-bit codes
_AC_VALUES = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]  # EOB, ZRL, then every run/size — 162 symbols, all 8-bit codes
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALUES)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALUES)

# ITU-T T.81 Annex K "typical" Huffman tables (public spec Tables
# K.3-K.6). Real-world MJPEG streams routinely OMIT the DHT segments
# and assume these fixed tables (the classic MJPEG quirk; ffmpeg
# installs the same defaults) — the decoder falls back to them when a
# scan references an undefined table, and jpeg_encode(tables="annex_k")
# emits streams coded with them (optionally DHT-less, MJPEG-style).
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    list(
        bytes.fromhex(
            "01020300041105122131410613516107227114328191a108"
            "2342b1c11552d1f02433627282090a161718191a25262728"
            "292a3435363738393a434445464748494a53545556575859"
            "5a636465666768696a737475767778797a83848586878889"
            "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6"
            "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
            "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"
        )
    ),
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    list(
        bytes.fromhex(
            "000102031104052131061241510761711322328108144291"
            "a1b1c109233352f0156272d10a162434e125f11718191a26"
            "2728292a35363738393a434445464748494a535455565758"
            "595a636465666768696a737475767778797a828384858687"
            "88898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4"
            "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
            "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"
        )
    ),
)
# (class, table id) -> (bits, values); ids 0/1 = luma/chroma convention
_ANNEX_K_TABLES = {
    (0, 0): _K_DC_LUMA,
    (0, 1): _K_DC_CHROMA,
    (1, 0): _K_AC_LUMA,
    (1, 1): _K_AC_CHROMA,
}


def _htab_or_default(htabs: dict, cls: int, tid: int):
    """Scan table lookup with the MJPEG fixed-table fallback."""
    key = (cls, tid)
    tab = htabs.get(key)
    if tab is None:
        if key not in _ANNEX_K_TABLES:
            raise ValueError(f"scan references undefined Huffman table {key}")
        tab = htabs[key] = _decode_table(*_ANNEX_K_TABLES[key])
    return tab


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # drop drained history: an unbounded Python-int accumulator makes
        # every later shift O(total bits) — i.e. quadratic encode
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    """JPEG signed-magnitude: negatives stored as v - 1 in `size` bits."""
    return v if v >= 0 else v + (1 << size) - 1


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (n_blocks, 8, 8), edge-padded to multiples of 8."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _blocks_grid(plane: np.ndarray, gw: int, gh: int) -> np.ndarray:
    """(H, W) float -> (gh*gw, 8, 8), edge-padded to exactly that grid."""
    h, w = plane.shape
    ph, pw = gh * 8 - h, gw * 8 - w
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return (
        plane.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _box_downsample(plane: np.ndarray, rx: int, ry: int) -> np.ndarray:
    """Box-average downsample by (rx horizontal, ry vertical), edge-padded."""
    h, w = plane.shape
    if h % ry or w % rx:
        plane = np.pad(plane, ((0, -h % ry), (0, -w % rx)), mode="edge")
    H, W = plane.shape
    return plane.reshape(H // ry, ry, W // rx, rx).mean(axis=(1, 3))


#: supported encoder subsampling modes -> Y sampling factors (h, v)
_SUBSAMP = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def jpeg_encode(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "444",
    tables: str = "flat",
    omit_dht: bool = False,
) -> bytes:
    """uint8 (h, w, 1|3) -> baseline JFIF bytes.

    ``subsampling``: "444" (default, every pinned fixture), "422" or
    "420" — chroma planes box-averaged down, Y emitting 2x1 / 2x2 blocks
    per interleaved MCU like real-world web JPEGs.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    N MCUs (byte-aligned, DC predictors reset) — the spec's
    error-resilience feature, round-trip-tested against the decoder.
    ``tables``: "flat" (default — the self-generated fixed-length
    canonical tables) or "annex_k" — the ITU T.81 Annex K typical
    tables, luma on DC/AC id 0 and chroma on id 1 like real encoders.
    ``omit_dht=True`` (annex_k only) emits NO DHT segments — the
    MJPEG fixed-table stream form; the decoder's Annex-K fallback
    reconstructs it exactly.
    """
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) uint8")
    if subsampling not in _SUBSAMP:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMP)}")
    if tables not in ("flat", "annex_k"):
        raise ValueError("tables must be 'flat' or 'annex_k'")
    if omit_dht and tables != "annex_k":
        raise ValueError("omit_dht requires tables='annex_k'")
    h, w, nc = img.shape
    sx, sy = _SUBSAMP[subsampling] if nc == 3 else (1, 1)
    qy, qc = _quality_tables(quality)
    f = img.astype(np.float64)
    # MCU grid over the full-resolution plane; per-component block grids
    mcux = (w + 8 * sx - 1) // (8 * sx)
    mcuy = (h + 8 * sy - 1) // (8 * sy)
    if nc == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sx > 1 or sy > 1:
            cb, cr = _box_downsample(cb, sx, sy), _box_downsample(cr, sx, sy)
        planes = [y, cb, cr]
        qtabs = [qy, qc, qc]
        qids = [0, 1, 1]
        samps = [(sx, sy), (1, 1), (1, 1)]
        grids = [(mcux * sx, mcuy * sy), (mcux, mcuy), (mcux, mcuy)]
    else:
        planes = [f[:, :, 0]]
        qtabs = [qy]
        qids = [0]
        samps = [(1, 1)]
        grids = [(mcux, mcuy)]

    # forward DCT + quantize, all blocks per component at once
    comp_coefs = []
    for plane, qt, (gw_c, gh_c) in zip(planes, qtabs, grids):
        blocks = _blocks_grid(plane, gw_c, gh_c) - 128.0
        coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        quant = np.round(coefs / qt[None, :, :]).astype(np.int32)
        comp_coefs.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for qid, qt in ((0, qy), (1, qc))[: (2 if nc == 3 else 1)]:
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, qid) + zz
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        csx, csy = samps[ci]
        out += struct.pack("BBB", ci + 1, (csx << 4) | csy, qids[ci])
    # Huffman code assignment + per-component table ids
    if tables == "annex_k":
        dc_codes = [_canonical_codes(*_K_DC_LUMA), _canonical_codes(*_K_DC_CHROMA)]
        ac_codes = [_canonical_codes(*_K_AC_LUMA), _canonical_codes(*_K_AC_CHROMA)]
        tbl_of = [0, 1, 1][:nc]  # luma -> 0, chroma -> 1
        dht = []
        for tid, (dcb, dcv), (acb, acv) in (
            (0, _K_DC_LUMA, _K_AC_LUMA),
            (1, _K_DC_CHROMA, _K_AC_CHROMA),
        )[: (2 if nc == 3 else 1)]:
            dht.append((tid, dcb, dcv))
            dht.append((0x10 | tid, acb, acv))
    else:
        dc_codes, ac_codes = [_DC_CODES], [_AC_CODES]
        tbl_of = [0] * nc  # DC table 0, AC table 0 shared by all comps
        dht = [(0x00, _DC_BITS, _DC_VALUES), (0x10, _AC_BITS, _AC_VALUES)]
    if not omit_dht:
        for tc_th, bits, values in dht:
            out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc_th)
            out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        t = tbl_of[ci]
        out += struct.pack("BB", ci + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"  # spectral selection 0..63, Ah/Al 0

    # entropy-coded data: interleaved MCUs, samps[ci] blocks per comp
    bw = _BitWriter()
    n_mcu = mcux * mcuy
    prev_dc = [0] * nc

    def emit_block(ci: int, zz: np.ndarray):
        dc_tab = dc_codes[tbl_of[ci]]
        ac_tab = ac_codes[tbl_of[ci]]
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        size = _size_cat(diff)
        code, length = dc_tab[size]
        bw.write(code, length)
        if size:
            bw.write(_amplitude(diff, size), size)
        nz = np.flatnonzero(zz[1:])  # positions of nonzero ACs
        pos = 0
        for k in nz.tolist():
            while k - pos >= 16:
                c, l = ac_tab[0xF0]  # ZRL
                bw.write(c, l)
                pos += 16
            run = k - pos
            v = int(zz[1 + k])
            size = _size_cat(v)
            c, l = ac_tab[(run << 4) | size]
            bw.write(c, l)
            bw.write(_amplitude(v, size), size)
            pos = k + 1
        if pos < 63:
            c, l = ac_tab[0x00]  # EOB
            bw.write(c, l)

    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align (1-padding), emit cycling RSTn, reset predictors
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            prev_dc = [0] * nc
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            csx, csy = samps[ci]
            gw_c = grids[ci][0]
            for by in range(csy):
                for bx in range(csx):
                    idx = (my * csy + by) * gw_c + (mx * csx + bx)
                    emit_block(ci, comp_coefs[ci][idx])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------


class _BitReader:
    """Entropy-stream bit reader with 0xFF00 de-stuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: stop feeding data, pad with zeros
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def restart(self):
        """Consume an RSTn marker at a restart boundary: discard the
        bit-level remainder (1-padding) and any zero bytes _fill
        injected after stopping at the marker, then step past it."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # only padding (and 0xFF00 stuffing) can sit between the last
        # symbol and the marker — scan past it to the next real marker
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(d) or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n


def _decode_table(bits: list[int], values: list[int]):
    """-> (maxcode-per-length lookup) for fast canonical decode:
    lists min_code, max_code, first_value_index per length."""
    mins, maxs, firsts = [0] * 17, [-1] * 17, [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        mins[length] = code
        firsts[length] = k
        maxs[length] = code + n - 1 if n else -1
        code += n
        k += n
        code <<= 1
    return mins, maxs, firsts, values


def _huff_decode(br: _BitReader, tbl) -> int:
    mins, maxs, firsts, values = tbl
    window = br.peek16()
    code = 0
    for length in range(1, 17):
        code = window >> (16 - length)
        if maxs[length] >= 0 and code <= maxs[length]:
            br.skip(length)
            return values[firsts[length] + (code - mins[length])]
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, 1|3).

    Envelope: 8-bit baseline sequential (SOF0) or progressive (SOF2),
    1 or 3 components, sampling factors 1-4 with integer subsampling
    ratios (4:4:4, 4:2:2, 4:2:0, 2x1, ... — chroma planes are
    box-replicated back up); DRI/RSTn restart intervals supported —
    NotImplementedError outside the envelope (disclosed gates, like the
    other multimodal codecs).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    frame = None
    scan_comps = None
    data_start = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # spec B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while payload[pos + 1] == 0xFF and pos + 2 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int32)
                qtabs[prec_id & 0xF] = t[_UNZIGZAG].reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0xF)] = _decode_table(bits, values)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline")
            comps = []
            for ci in range(nc):
                cid, samp, qid = struct.unpack_from("BBB", body, 6 + 3 * ci)
                hs, vs = samp >> 4, samp & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append((cid, hs, vs, qid))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive — dedicated multi-scan path
            return _decode_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline/progressive (SOF0/SOF2)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
    nc = len(comps)
    samp_of = {cid: (hs, vs) for cid, hs, vs, _q in comps}
    qid_of = {cid: q for cid, _h, _v, q in comps}
    hmax = max(hs for _c, hs, _v, _q in comps)
    vmax = max(vs for _c, _h, vs, _q in comps)

    interleaved = len(scan_comps) > 1
    if interleaved:
        # MCU grid over the max-sampled plane; comp ci contributes
        # hs*vs blocks per MCU in raster order within the MCU (B.2.3)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        grids = [
            (mcux * samp_of[cid][0], mcuy * samp_of[cid][1])
            for cid, _d, _a in scan_comps
        ]
    else:
        # non-interleaved scan: each "MCU" is one block of the single
        # component's own grid (spec A.2.2)
        cid = scan_comps[0][0]
        hs, vs = samp_of[cid]
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        mcux, mcuy = (cw + 7) // 8, (ch + 7) // 8
        grids = [(mcux, mcuy)]
    n_mcu = mcux * mcuy

    br = _BitReader(payload, data_start)
    coefs = [
        np.zeros((gw * gh, 64), dtype=np.int32) for gw, gh in grids
    ]
    blocks_per = [
        (samp_of[cid] if interleaved else (1, 1)) for cid, _d, _a in scan_comps
    ]
    prev_dc = [0] * len(scan_comps)
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            prev_dc = [0] * len(scan_comps)
        my, mx = divmod(m, mcux)
        for ci, (cid, dc_id, ac_id) in enumerate(scan_comps):
            dct = _htab_or_default(htabs, 0, dc_id)
            act = _htab_or_default(htabs, 1, ac_id)
            chs, cvs = blocks_per[ci]
            gw = grids[ci][0]
            for by in range(cvs):
                for bx in range(chs):
                    idx = (my * cvs + by) * gw + (mx * chs + bx)
                    size = _huff_decode(br, dct)
                    diff = _extend(br.read(size), size) if size else 0
                    prev_dc[ci] += diff
                    zz = coefs[ci][idx]
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, act)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0xF
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[k] = _extend(br.read(size), size)
                        k += 1

    # dequantize + inverse zigzag + IDCT all blocks at once per comp,
    # then box-replicate subsampled planes back to full resolution
    planes = []
    for ci, (cid, _dc, _ac) in enumerate(scan_comps):
        qt = qtabs[qid_of[cid]]
        gw, gh = grids[ci]
        deq = coefs[ci][:, _UNZIGZAG].reshape(-1, 8, 8) * qt[None, :, :]
        blocks = np.einsum("xu,nuv,yv->nxy", _C.T, deq, _C.T) + 128.0
        plane = (
            blocks.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
        hs, vs = samp_of[cid]
        ry, rx = vmax // vs, hmax // hs
        if vmax % vs or hmax % hs:
            raise NotImplementedError("non-integer subsampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# -- progressive (SOF2) -----------------------------------------------------
#
# Multi-scan decode per ITU-T T.81 Annex G (spectral selection + successive
# approximation), same table-driven discipline as the baseline path: all
# Huffman tables come from the stream's DHT segments, coefficients
# accumulate across scans, one vectorized dequant+IDCT at the end.


def _find_scan_end(data: bytes, pos: int) -> int:
    """Byte offset of the first real marker after entropy data at ``pos``
    (skips 0xFF00 stuffing, RSTn markers and 0xFF fill bytes)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        else:
            pos += 1
    return n


def _prog_dc_scan(br, htabs, scan, geom, coefs, Al, refine, restart_interval):
    """One DC scan (first pass: Huffman-coded diffs of DC>>Al; refinement:
    one appended bit per block). Interleaved or single-component."""
    scan_comps, interleaved, mcux, mcuy, comp_geom = geom
    p1 = 1 << Al
    prev_dc = [0] * len(scan_comps)
    if interleaved:
        n_units = mcux * mcuy
    else:
        cid = scan_comps[0][0]
        cw, ch, _gw = comp_geom[cid][3:6]
        n_units = cw * ch
    for m in range(n_units):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            prev_dc = [0] * len(scan_comps)
        for ci, (cid, dc_id, _ac) in enumerate(scan_comps):
            hs, vs, _qid, cw, ch, gw = comp_geom[cid]
            if interleaved:
                my, mx = divmod(m, mcux)
                blocks = [
                    (my * vs + by) * gw + (mx * hs + bx)
                    for by in range(vs)
                    for bx in range(hs)
                ]
            else:
                by, bx = divmod(m, cw)
                blocks = [by * gw + bx]
            for idx in blocks:
                zz = coefs[cid][idx]
                if refine:
                    if br.read(1):
                        zz[0] |= p1
                else:
                    size = _huff_decode(br, _htab_or_default(htabs, 0, dc_id))
                    diff = _extend(br.read(size), size) if size else 0
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci] << Al


def _prog_ac_first(br, act, zz, Ss, Se, Al, eobrun):
    """AC first pass for one block (spec G.1.2.2): run/size symbols with
    EOBn run codes; values enter at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read(r)
            break
        k += r
        if k > Se:
            raise ValueError("AC index out of band")
        zz[k] = _extend(br.read(s), s) << Al
        k += 1
    return eobrun


def _prog_ac_refine(br, act, zz, Ss, Se, Al, eobrun):
    """AC refinement for one block (spec G.1.2.3): correction bits for
    already-nonzero coefficients, +-1<<Al insertions for newly-significant
    ones, EOB runs carrying correction bits."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15: pass over 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if br.read(1) else -p1
            while k <= Se:
                c = int(zz[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            c = int(zz[k])
            if c != 0:
                if br.read(1) and (c & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive JFIF bytes -> uint8 (h, w, 1|3).

    Envelope: 8-bit SOF2, 1 or 3 components, integer subsampling ratios,
    DRI/RSTn inside scans; arithmetic coding and hierarchical modes stay
    NotImplementedError gates.
    """
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}
    comp_geom: dict[int, tuple] = {}
    mcux = mcuy = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        while payload[pos + 1] == 0xFF and pos + 2 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec_id = body[b]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int32)
                qtabs[prec_id & 0xF] = t[_UNZIGZAG].reshape(8, 8)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc_th = body[b]
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                htabs[(tc_th >> 4, tc_th & 0xF)] = _decode_table(bits, values)
                b += 17 + n
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit progressive")
            comps = []
            for ci in range(nc):
                cid, samp, qid = struct.unpack_from("BBB", body, 6 + 3 * ci)
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hs, vs, qid in comps:
                gw, gh = mcux * hs, mcuy * vs  # padded interleaved grid
                cw = ((w * hs + hmax - 1) // hmax + 7) // 8  # real blocks
                ch = ((h * vs + vmax - 1) // vmax + 7) // 8
                comp_geom[cid] = (hs, vs, qid, cw, ch, gw)
                coefs[cid] = np.zeros((gw * gh, 64), dtype=np.int32)
            frame = (h, w, comps, hmax, vmax)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("mixed/unsupported frame type")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            Ss, Se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0xF
            data_start = pos + 2 + seglen
            br = _BitReader(payload, data_start)
            interleaved = ns > 1
            geom = (scan_comps, interleaved, mcux, mcuy, comp_geom)
            if Ss == 0:
                if Se != 0:
                    raise ValueError("DC scan with Se != 0")
                _prog_dc_scan(
                    br, htabs, scan_comps, geom, coefs, Al, Ah > 0, restart_interval
                )
            else:
                if interleaved:
                    raise ValueError("AC scans must be single-component")
                cid, _dc_id, ac_id = scan_comps[0]
                act = _htab_or_default(htabs, 1, ac_id)
                _hs, _vs, _qid, cw, ch, gw = comp_geom[cid]
                eobrun = 0
                fn = _prog_ac_refine if Ah else _prog_ac_first
                for n in range(cw * ch):
                    if restart_interval and n and n % restart_interval == 0:
                        br.restart()
                        eobrun = 0
                    by, bx = divmod(n, cw)
                    eobrun = fn(
                        br, act, coefs[cid][by * gw + bx], Ss, Se, Al, eobrun
                    )
            pos = _find_scan_end(payload, data_start)
            continue
        pos += 2 + seglen
    if frame is None:
        raise ValueError("missing SOF2")
    h, w, comps, hmax, vmax = frame
    planes = []
    for cid, hs, vs, qid in comps:
        gw = comp_geom[cid][5]
        gh = coefs[cid].shape[0] // gw
        deq = coefs[cid][:, _UNZIGZAG].reshape(-1, 8, 8) * qtabs[qid][None, :, :]
        blocks = np.einsum("xu,nuv,yv->nxy", _C.T, deq, _C.T) + 128.0
        plane = (
            blocks.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        )
        ry, rx = vmax // vs, hmax // hs
        if vmax % vs or hmax % hs:
            raise NotImplementedError("non-integer subsampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# -- progressive encoder ----------------------------------------------------
#
# Emits SOF2 with a typical web scan script (DC first + refine, AC bands
# with two successive-approximation levels on luma). Each scan gets its
# own self-generated canonical Huffman table built from the scan's actual
# symbol set (two passes: count, then write) — same "any prefix-free
# table is valid, ship it in DHT" policy as the baseline encoder.


class _SymCount:
    """Pass-1 sink: records which symbols a scan emits."""

    def __init__(self):
        self.freq: dict[int, int] = {}

    def sym(self, s: int):
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int):
        pass


class _SymWrite:
    """Pass-2 sink: Huffman codes + raw bits into a _BitWriter."""

    def __init__(self, bw: _BitWriter, codes: dict[int, tuple[int, int]]):
        self.bw, self.codes = bw, codes

    def sym(self, s: int):
        c, ln = self.codes[s]
        self.bw.write(c, ln)

    def bits(self, v: int, n: int):
        if n:
            self.bw.write(v, n)


def _scan_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """(bits, values) for a fixed-length canonical table covering exactly
    the scan's symbols: n symbols at L = bit_length(n) bits, so the
    all-ones code of every length stays unused (spec C.2)."""
    syms = sorted(freq) or [0x00]
    L = max(1, len(syms).bit_length())
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


def _enc_dc_prog(comp_sel, comp_coefs, samps, grids, mcux, mcuy, Al, refine, sink):
    """DC scan encoder: interleaved over ``comp_sel``; first pass emits
    size/amplitude of diff(DC >> Al), refinement emits bit Al of each DC."""
    prev = {ci: 0 for ci in comp_sel}
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in comp_sel:
            sx, sy = samps[ci]
            gw = grids[ci][0]
            for by in range(sy):
                for bx in range(sx):
                    idx = (my * sy + by) * gw + (mx * sx + bx)
                    dc = int(comp_coefs[ci][idx][0])
                    if refine:
                        sink.bits((dc >> Al) & 1, 1)
                    else:
                        v = dc >> Al  # arithmetic shift, like the decoder's <<
                        diff = v - prev[ci]
                        prev[ci] = v
                        size = _size_cat(diff)
                        sink.sym(size)
                        sink.bits(_amplitude(diff, size), size)


def _enc_ac_first_prog(coefs, cw, ch, gw, Ss, Se, Al, sink):
    """AC first-pass scan encoder (G.1.2.2): run/size over the band's
    point-transformed values, all-zero bands folded into EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    for n in range(cw * ch):
        by, bx = divmod(n, cw)
        zz = coefs[by * gw + bx]
        vals = []
        for k in range(Ss, Se + 1):
            v = int(zz[k])
            a = abs(v) >> Al
            if a:
                vals.append((k, v > 0, a))
        if not vals:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        pos = Ss
        for k, positive, a in vals:
            while k - pos >= 16:
                sink.sym(0xF0)
                pos += 16
            size = a.bit_length()
            sv = a if positive else -a
            sink.sym(((k - pos) << 4) | size)
            sink.bits(_amplitude(sv, size), size)
            pos = k + 1
        if pos <= Se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine_prog(coefs, cw, ch, gw, Ss, Se, Al, sink):
    """AC refinement scan encoder (G.1.2.3): correction bits for
    history-nonzero coefficients, run-coded +-1 insertions for newly
    significant ones, EOB runs carrying their buffered correction bits."""
    eobrun = 0
    pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            for b in pending:
                sink.bits(b, 1)
            pending = []
            eobrun = 0

    for n in range(cw * ch):
        by, bx = divmod(n, cw)
        zz = coefs[by * gw + bx]
        ab = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
        eob_pos = -1
        for i, a in enumerate(ab):
            if a == 1:
                eob_pos = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(ab):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob_pos:
                flush_eob()
                sink.sym(0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            flush_eob()
            sink.sym((r << 4) | 1)
            sink.bits(1 if int(zz[Ss + i]) > 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def jpeg_encode_progressive(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """uint8 (h, w, 1|3) -> progressive (SOF2) JFIF bytes.

    Scan script (the shape real encoders emit): interleaved DC at Al=1
    then a DC refinement; luma AC split into a 1-5 band and a 6-63 band
    at Al=2 with two refinement passes; chroma AC at Al=1 with one
    refinement. Exercises all four scan decoders.
    """
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) uint8")
    if subsampling not in _SUBSAMP:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMP)}")
    h, w, nc = img.shape
    sx, sy = _SUBSAMP[subsampling] if nc == 3 else (1, 1)
    qy, qc = _quality_tables(quality)
    f = img.astype(np.float64)
    mcux = (w + 8 * sx - 1) // (8 * sx)
    mcuy = (h + 8 * sy - 1) // (8 * sy)
    if nc == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sx > 1 or sy > 1:
            cb, cr = _box_downsample(cb, sx, sy), _box_downsample(cr, sx, sy)
        planes = [y, cb, cr]
        qtabs = [qy, qc, qc]
        qids = [0, 1, 1]
        samps = [(sx, sy), (1, 1), (1, 1)]
        grids = [(mcux * sx, mcuy * sy), (mcux, mcuy), (mcux, mcuy)]
    else:
        planes, qtabs, qids = [f[:, :, 0]], [qy], [0]
        samps, grids = [(1, 1)], [(mcux, mcuy)]

    comp_coefs = []
    for plane, qt, (gw_c, gh_c) in zip(planes, qtabs, grids):
        blocks = _blocks_grid(plane, gw_c, gh_c) - 128.0
        coefs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        quant = np.round(coefs / qt[None, :, :]).astype(np.int32)
        comp_coefs.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    # non-interleaved (AC-scan) block grids per component
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    real_grids = []
    for ci in range(nc):
        chs, cvs = samps[ci]
        cw = ((w * chs + hmax - 1) // hmax + 7) // 8
        ch_b = ((h * cvs + vmax - 1) // vmax + 7) // 8
        real_grids.append((cw, ch_b))

    # scan script: (kind, comps, Ss, Se, Ah, Al)
    if nc == 3:
        script = [
            ("dc", [0, 1, 2], 0, 0, 0, 1),
            ("ac", [0], 1, 5, 0, 2),
            ("ac", [1], 1, 63, 0, 1),
            ("ac", [2], 1, 63, 0, 1),
            ("ac", [0], 6, 63, 0, 2),
            ("ac", [0], 1, 63, 2, 1),
            ("dc", [0, 1, 2], 0, 0, 1, 0),
            ("ac", [0], 1, 63, 1, 0),
            ("ac", [1], 1, 63, 1, 0),
            ("ac", [2], 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", [0], 0, 0, 0, 1),
            ("ac", [0], 1, 5, 0, 2),
            ("ac", [0], 6, 63, 0, 2),
            ("ac", [0], 1, 63, 2, 1),
            ("dc", [0], 0, 0, 1, 0),
            ("ac", [0], 1, 63, 1, 0),
        ]

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for qid, qt in ((0, qy), (1, qc))[: (2 if nc == 3 else 1)]:
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, qid) + zz
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        csx, csy = samps[ci]
        out += struct.pack("BBB", ci + 1, (csx << 4) | csy, qids[ci])

    for kind, comps_sel, Ss, Se, Ah, Al in script:
        refine = Ah > 0

        def run(sink):
            if kind == "dc":
                _enc_dc_prog(
                    comps_sel, comp_coefs, samps, grids, mcux, mcuy, Al, refine, sink
                )
            else:
                ci = comps_sel[0]
                cw, ch_b = real_grids[ci]
                gw = grids[ci][0]
                fn = _enc_ac_refine_prog if refine else _enc_ac_first_prog
                fn(comp_coefs[ci], cw, ch_b, gw, Ss, Se, Al, sink)

        counter = _SymCount()
        run(counter)
        needs_table = not (kind == "dc" and refine)
        if needs_table:
            bits, values = _scan_table(counter.freq)
            tc = 0 if kind == "dc" else 1
            out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), tc << 4)
            out += bytes(bits) + bytes(values)
            codes = _canonical_codes(bits, values)
        else:
            codes = {}
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps_sel), len(comps_sel))
        for ci in comps_sel:
            out += struct.pack("BB", ci + 1, 0x00)
        out += struct.pack("BBB", Ss, Se, (Ah << 4) | Al)
        bw = _BitWriter()
        run(_SymWrite(bw, codes))
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
