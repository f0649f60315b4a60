"""Spec-layer tests: tokenizer, extract invariant, codecs, BM25 (no Ray)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from oscar_ray.spec.bm25 import bm25_idf, bm25_score, bm25_tf_norm
from oscar_ray.spec.extract import extract_text, make_html
from oscar_ray.spec.tokenizer import flatten_tokens, tokenize_column, tokenize_text
from oscar_ray.stages.codecs import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


class TestTokenizer:
    def test_basic(self):
        assert tokenize_text("Hello, World!") == ["hello", "world"]

    def test_diacritics_fold(self):
        # NFD + strip marks: accented variants fold to base letters
        assert tokenize_text("Cáfé wábc") == ["cafe", "wabc"]

    def test_case_fold(self):
        assert tokenize_text("WABC wAbC") == ["wabc", "wabc"]

    def test_nfc_nfd_agree(self):
        composed = "café"  # é precomposed
        decomposed = "café"  # e + combining acute
        assert tokenize_text(composed) == tokenize_text(decomposed) == ["cafe"]

    def test_digits_kept(self):
        assert tokenize_text("abc123 4x5") == ["abc123", "4x5"]

    def test_empty_and_null(self):
        assert tokenize_text("") == []
        assert tokenize_text("   ,,, ") == []
        assert tokenize_text(None) == []

    def test_column_matches_scalar(self):
        texts = ["Héllo wörld", "", "a  b\t c", "STRASSE straße"]
        parent, toks = flatten_tokens(pa.array(texts))
        got: dict[int, list[str]] = {}
        for p, t in zip(parent.to_pylist(), toks.to_pylist()):
            got.setdefault(p, []).append(t)
        for i, text in enumerate(texts):
            assert got.get(i, []) == tokenize_text(text)


class TestExtract:
    def test_roundtrip(self):
        for text in ["", "a", "hello world", "x " * 500 + "end", "a&b <c>"]:
            assert extract_text(make_html(text, title="T")) == text

    def test_generated_pages_invariant(self):
        from oscar_ray.sources.synth import generate_pages_batch

        tbl = generate_pages_batch(0, 200, seed=42)
        for html, text in zip(tbl["html"].to_pylist(), tbl["text"].to_pylist()):
            assert extract_text(html) == text

    def test_generator_deterministic_and_shard_independent(self):
        from oscar_ray.sources.synth import generate_pages_batch

        whole = generate_pages_batch(0, 100, seed=42)
        parts = pa.concat_tables(
            [generate_pages_batch(0, 37, seed=42), generate_pages_batch(37, 63, seed=42)]
        )
        assert whole.equals(parts)


class TestCodecs:
    @pytest.mark.parametrize("n", [0, 1, 2, 100, 10_000])
    def test_varint_roundtrip(self, n):
        rng = np.random.default_rng(n)
        vals = rng.integers(0, 1 << 56, size=n).astype(np.uint64)
        assert (varint_decode(varint_encode(vals), count=n) == vals).all()

    def test_varint_boundaries(self):
        vals = np.array(
            [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63], dtype=np.uint64
        )
        assert (varint_decode(varint_encode(vals)) == vals).all()

    def test_delta_roundtrip(self):
        ids = np.unique(np.random.default_rng(7).integers(0, 1 << 40, size=5000))
        assert (delta_decode(delta_encode(ids)) == ids).all()

    def test_postings_roundtrip(self):
        rng = np.random.default_rng(1)
        ids = np.unique(rng.integers(0, 1 << 30, size=1000))
        tfs = rng.integers(1, 100, size=ids.size)
        dls = rng.integers(8, 2048, size=ids.size)
        d, t, l = encode_postings(ids, tfs, dls)
        di, ti, li = decode_postings(d, t, l, count=ids.size)
        assert (di == ids).all() and (ti == tfs).all() and (li == dls).all()

    def test_postings_reject_unsorted(self):
        with pytest.raises(ValueError):
            encode_postings(np.array([3, 2]), np.array([1, 1]), np.array([5, 5]))
        with pytest.raises(ValueError):
            encode_postings(np.array([2, 2]), np.array([1, 1]), np.array([5, 5]))


class TestBM25:
    def test_idf_monotone_decreasing_in_df(self):
        n = 1000
        dfs = np.array([1, 10, 100, 999], dtype=np.float64)
        idfs = bm25_idf(dfs, n)
        assert (np.diff(idfs) < 0).all()
        assert (idfs > 0).all()

    def test_tf_norm_saturates(self):
        lo = bm25_tf_norm(1, 100, 100.0)
        hi = bm25_tf_norm(100, 100, 100.0)
        assert 0 < lo < hi < 1.9 + 0.01  # bounded by k1+1

    def test_score_formula(self):
        import math

        got = bm25_score(tf=2, doclen=50, df=10, n_docs=1000, avgdl=100.0)
        idf = math.log1p((1000 - 10 + 0.5) / (10 + 0.5))
        tfn = 2 * 1.9 / (2 + 0.9 * (1 - 0.4 + 0.4 * 50 / 100.0))
        assert abs(got - idf * tfn) < 1e-12


class TestGenericExtract:
    """Real-web extractor (spec/extract.py::extract_text_generic)."""

    def test_boilerplate_stripped(self):
        from oscar_ray.spec.extract import extract_text_generic

        html = (
            b"<!DOCTYPE html><html><head><title>DROP ME</title>"
            b"<style>body { color: red }</style></head><body>"
            b"<!-- comment <p>not text</p> -->"
            b"<script type='text/javascript'>var x = '<p>nope</p>';</script>"
            b"<h1 class=\"big\">Title</h1>"
            b"<div><p>first &amp; second</p><p>third</p></div>"
            b"<ul><li>a</li><li>b</li></ul>"
            b"<span>inline <b>bold</b> tail</span>"
            b"<noscript>enable js</noscript>"
            b"</body></html>"
        )
        got = extract_text_generic(html)
        assert got == "Title\nfirst & second\nthird\na\nb\ninline bold tail"

    def test_whitespace_collapse_and_entities(self):
        from oscar_ray.spec.extract import extract_text_generic

        html = b"<body><p>  a\t\tb </p>\n\n<p> c&lt;d&gt;e </p></body>"
        assert extract_text_generic(html) == "a b\nc<d>e"
        assert extract_text_generic(b"") == ""
        assert extract_text_generic(None) == ""

    def test_invalid_utf8_replaced_not_crashed(self):
        from oscar_ray.spec.extract import extract_text_generic

        got = extract_text_generic(b"<p>ok \xff\xfe bytes</p>")
        assert got.startswith("ok ") and got.endswith(" bytes")

    def test_same_tokens_as_fixture_extractor(self):
        """On fixture pages the generic extractor yields the same token
        stream (separators differ, tokens don't)."""
        from oscar_ray.sources.synth import generate_pages_batch
        from oscar_ray.spec.extract import extract_text, extract_text_generic
        from oscar_ray.spec.tokenizer import tokenize_text

        tbl = generate_pages_batch(0, 120, seed=42)
        for h in tbl["html"].to_pylist():
            assert tokenize_text(extract_text_generic(h)) == tokenize_text(
                extract_text(h)
            )

    def test_unknown_extractor_rejected(self, ray_session, tmp_path):
        import pytest as _pytest

        from oscar_ray.index.build import IndexBuildConfig, build_index

        with _pytest.raises(ValueError, match="unknown extractor"):
            build_index(
                str(tmp_path), str(tmp_path / "o"), IndexBuildConfig(extractor="nope")
            )
