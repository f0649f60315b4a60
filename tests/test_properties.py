"""Property-based tests (hypothesis): codecs and set-op kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oscar_ray.query import setops
from oscar_ray.stages.codecs import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)

uints = st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)


@given(uints)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr), count=len(arr)) == arr).all()


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(ids_set):
    ids = np.array(sorted(ids_set), dtype=np.uint64)
    tfs = np.arange(1, len(ids) + 1, dtype=np.uint64)
    dls = np.full(len(ids), 7, dtype=np.uint64)
    d, t, l = encode_postings(ids, tfs, dls)
    di, ti, li = decode_postings(d, t, l, count=len(ids))
    assert (di == ids).all() and (ti == tfs).all() and (li == dls).all()


@given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    ids = np.unique(np.array(vals, dtype=np.uint64))
    assert (delta_decode(delta_encode(ids)) == ids).all()


@given(st.sets(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_eliasfano_roundtrip(ids_set):
    from oscar_ray.stages.codecs import ef_decode, ef_encode

    ids = np.array(sorted(ids_set), dtype=np.uint64)
    assert (ef_decode(ef_encode(ids), len(ids)) == ids).all()


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=100, deadline=None)
def test_docid_stream_codecs_agree(ids_set):
    from oscar_ray.stages.codecs import decode_docid_stream, encode_docid_stream

    ids = np.array(sorted(ids_set), dtype=np.uint64)
    for codec in ("varint", "rlede", "eliasfano", "wah"):
        buf = encode_docid_stream(ids, codec)
        assert (decode_docid_stream(buf, len(ids), codec) == ids).all()


@given(st.integers(min_value=1, max_value=500), st.integers(min_value=0, max_value=2**30))
@settings(max_examples=100, deadline=None)
def test_rlede_dense_runs(n, base):
    """Dense runs (gap==1 everywhere) collapse to a few bytes."""
    from oscar_ray.stages.codecs import rlede_decode, rlede_encode

    ids = np.arange(base, base + n, dtype=np.uint64)
    buf = rlede_encode(ids)
    assert len(buf) <= 22  # (base,1)+(1,n-1) pairs of varints
    assert (rlede_decode(buf, n) == ids).all()


id_sets = st.sets(st.integers(min_value=0, max_value=500), max_size=80)


@given(id_sets, id_sets)
@settings(max_examples=200, deadline=None)
def test_setops_match_python_sets(sa, sb):
    def mk(s):
        ids = np.array(sorted(s), dtype=np.uint64)
        return ids, np.ones(len(ids), dtype=np.float64)

    a, b = mk(sa), mk(sb)
    assert set(setops.intersect(a, b)[0].tolist()) == (sa & sb)
    assert set(setops.union(a, b)[0].tolist()) == (sa | sb)
    assert set(setops.andnot(a, b)[0].tolist()) == (sa - sb)
    assert set(setops.xor(a, b)[0].tolist()) == (sa ^ sb)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenizer_fast_path_equivalence(text):
    """ASCII fast path == arrow kernel chain for arbitrary unicode input."""
    import pyarrow as pa

    from oscar_ray.spec.tokenizer import tokenize_column, tokenize_text

    got = tokenize_text(text)
    lists = tokenize_column(pa.array([text], type=pa.string()))
    want = [t for t in lists[0].as_py() if t]
    assert got == want


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_unexpectedly(q):
    from oscar_ray.query.parser import QueryParseError, parse_query

    try:
        parse_query(q)
    except QueryParseError:
        pass  # the only permitted failure mode


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_top_k_matches_sorted(pairs, k):
    ids = np.array([p[0] for p in pairs], dtype=np.uint64)
    scores = np.array([p[1] for p in pairs], dtype=np.float64)
    order = np.argsort(ids)
    ids, scores = ids[order], scores[order]
    got_ids, got_sc = setops.top_k(ids, scores, k)
    want = sorted(zip(ids.tolist(), scores.tolist()), key=lambda t: (-t[1], t[0]))[:k]
    assert got_ids.tolist() == [w[0] for w in want]
    assert got_sc.tolist() == [w[1] for w in want]


@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from(["ulaw", "alaw"]),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=100, deadline=None)
def test_g711_roundtrip_error_bound(samples, law, n_ch):
    """G.711 nearest-codeword encode + spec decode: per-sample error is
    bounded by half the local quantization step (the step at |x| is
    ~2^(exp) scaled; a loose global bound is 1/16 full scale near the
    top segment, tight near zero). We assert the NEAREST property
    directly: no other codeword reconstructs closer."""
    from oscar_ray.stages.multimodal import (
        _g711_encode_nearest,
        alaw_decode,
        ulaw_decode,
    )

    dec = ulaw_decode if law == "ulaw" else alaw_decode
    arr = np.asarray(samples[: len(samples) // n_ch * n_ch], dtype=np.float64)
    if not len(arr):
        return
    pcm = (np.clip(arr, -1.0, 1.0) * 32767.0).astype(np.int64)
    codes = _g711_encode_nearest(pcm, dec)
    table = dec(np.arange(256, dtype=np.uint8)).astype(np.int64)
    got = table[codes.astype(np.int64)]
    best = np.min(np.abs(table[None, :] - pcm[:, None]), axis=1)
    assert (np.abs(got - pcm) == best).all()


@given(
    st.integers(min_value=1, max_value=5),   # n frames
    st.integers(min_value=1, max_value=3),   # h blocks-ish
    st.integers(min_value=1, max_value=3),   # w
    st.sampled_from(["444", "422", "420"]),
    st.booleans(),                           # omit_dht
    st.booleans(),                           # with audio
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_avi_container_roundtrip(n, hb, wb, sub, omit_dht, with_audio, seed):
    """AVI mux/demux is lossless at the container layer: every frame's
    indexed bytes decode identically to a standalone JPEG of the same
    pixels/tables, and the audio samples reassemble exactly."""
    from oscar_ray.stages.avi import (
        avi_audio,
        avi_encode_mjpeg,
        avi_frame,
        avi_parse,
    )
    from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    h, w = 4 * hb, 4 * wb
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    audio = (
        rng.uniform(-1, 1, size=(rng.integers(1, 500), 1)) if with_audio else None
    )
    payload = avi_encode_mjpeg(
        frames, fps=7, quality=80, subsampling=sub,
        audio=audio, audio_rate=8000, omit_dht=omit_dht,
    )
    info = avi_parse(payload)
    assert (info.width, info.height) == (w, h)
    assert len(info.frame_spans) == n
    for i in range(n):
        ref = jpeg_encode(
            frames[i], quality=80, subsampling=sub,
            tables="annex_k" if omit_dht else "flat", omit_dht=omit_dht,
        )
        assert (avi_frame(payload, i, info) == jpeg_decode(ref)).all()
    if with_audio:
        got, rate = avi_audio(payload, info)
        assert rate == 8000 and got.shape == audio.shape
        assert np.abs(got - audio).max() < 1 / 32000 + 1e-12


# --- WARC container round trip (sources/warc.py) ---

_url_chars = st.characters(min_codepoint=0x21, max_codepoint=0x2FF)
_urls = st.text(alphabet=_url_chars, min_size=1, max_size=80)
_texts = st.text(
    st.characters(exclude_categories=("Cs",)), max_size=400
)
_ts = st.integers(min_value=0, max_value=2**47)


@given(
    st.lists(st.tuples(_urls, _texts, st.binary(max_size=300), _ts), max_size=25),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_warc_container_roundtrip(rows, use_gzip):
    """Arbitrary payloads (including bytes that LOOK like record
    headers or CRLF framing) survive the WARC response container;
    arbitrary unicode survives WET; dates round-trip to the us."""
    import tempfile

    import pyarrow as pa

    from oscar_ray.sources.warc import parse_warc, parse_wet, warc_write, wet_write

    tbl = pa.table(
        {
            "url": pa.array([u for u, _, _, _ in rows], type=pa.string()),
            "warc_ts": pa.array([t for _, _, _, t in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": pa.array([x for _, x, _, _ in rows], type=pa.string()),
            "html": pa.array([h for _, _, h, _ in rows], type=pa.binary()),
            "lang": pa.array(["xx"] * len(rows), type=pa.string()),
        }
    )
    suffix = ".warc.gz" if use_gzip else ".warc"
    with tempfile.TemporaryDirectory() as d:
        warc_write(d + "/t" + suffix, tbl)
        wet_write(d + "/t.wet" + (".gz" if use_gzip else ""), tbl)
        wa = parse_warc(open(d + "/t" + suffix, "rb").read())
        we = parse_wet(
            open(d + "/t.wet" + (".gz" if use_gzip else ""), "rb").read()
        )
    assert wa["url"].to_pylist() == tbl["url"].to_pylist()
    assert wa["html"].to_pylist() == tbl["html"].to_pylist()
    assert (
        wa["warc_ts"].cast(pa.int64()).to_pylist()
        == tbl["warc_ts"].cast(pa.int64()).to_pylist()
    )
    assert we["text"].to_pylist() == tbl["text"].to_pylist()
    assert we["url"].to_pylist() == tbl["url"].to_pylist()
