"""Substring/suffix search parity (M5 analog: suffix-string insertion)."""

from __future__ import annotations

import numpy as np
import pytest

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.query.engine import QueryEngine
from oscar_ray.query import parser as qp
from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def suffix_setup(ray_session, tmp_path_factory):
    from oscar_ray.sources.synth import write_pages

    pages = str(tmp_path_factory.mktemp("pages_sfx"))
    write_pages(pages, n_rows=400, n_files=1, rows_per_group=200)
    out = str(tmp_path_factory.mktemp("idx_sfx"))
    cfg = IndexBuildConfig(
        num_partitions=4, block_span_bits=8, shard_fragments=2, index_suffixes=True
    )
    build_index(pages, out, cfg)
    oracle = OracleIndex.from_parquet_dir(pages, index_suffixes=True)
    return QueryEngine(out), oracle


class TestParserModifiers:
    def test_substring(self):
        node = qp.parse_query("*abc*")
        assert node == qp.Substring("abc", exact_suffix=False)

    def test_exact_suffix(self):
        node = qp.parse_query("*abc")
        assert node == qp.Substring("abc", exact_suffix=True)

    def test_prefix_still_prefix(self):
        assert qp.parse_query("abc*") == qp.Prefix("abc")


class TestSubstringParity:
    @pytest.mark.parametrize(
        "q",
        [
            "*aab*",  # substring: tokens containing 'aab'
            "*bc",  # exact suffix
            "*ab* wa*",  # substring AND prefix
            "waaa - *zz*",  # andnot with substring
            "*zzzznope*",  # no matches
        ],
    )
    def test_rank_and_score_identity(self, suffix_setup, q):
        engine, oracle = suffix_setup
        got_ids, got_sc = engine.search(q, k=20)
        want = oracle.search(q, k=20)
        assert got_ids.tolist() == [d for d, _ in want], q
        np.testing.assert_allclose(got_sc, [s for _, s in want], rtol=1e-12, atol=0)

    def test_substring_actually_matches(self, suffix_setup):
        engine, oracle = suffix_setup
        ids, _ = engine.search("*aa*", k=1000)
        assert len(ids) > 0  # vocab waaa..wzzz guarantees 'aa' substrings

    def test_pruned_equals_exhaustive(self, suffix_setup):
        engine, _ = suffix_setup
        a = engine.search("*ab* + *cd*", k=15, mode="auto")
        b = engine.search("*ab* + *cd*", k=15, mode="exhaustive")
        assert a[0].tolist() == b[0].tolist() and a[1].tolist() == b[1].tolist()

    def test_exact_unaffected_by_suffix_ns(self, suffix_setup):
        """The suffix namespace must not leak into exact-term results."""
        engine, oracle = suffix_setup
        got_ids, got_sc = engine.search("waaa", k=10)
        want = oracle.search("waaa", k=10)
        assert got_ids.tolist() == [d for d, _ in want]
