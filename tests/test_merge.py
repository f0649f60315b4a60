"""Index segment merge tests: merged == single-build when spans align."""

from __future__ import annotations

import os

import numpy as np
import pytest

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.check import check_index
from oscar_ray.index.merge import merge_indexes
from oscar_ray.query.engine import QueryEngine
from oscar_ray.sources.synth import generate_pages_batch


def _write_rows(tbl, path, rows_per_group):
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path, row_group_size=rows_per_group)


@pytest.fixture(scope="module")
def merged_setup(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    span_bits = 8  # span 256; choose first segment = 512 rows -> aligned
    a_rows, b_rows = 512, 300
    whole = generate_pages_batch(0, a_rows + b_rows, seed=42)
    _write_rows(whole.slice(0, a_rows), str(root / "segA" / "p.parquet"), 256)
    _write_rows(whole.slice(a_rows, b_rows), str(root / "segB" / "p.parquet"), 150)
    _write_rows(whole, str(root / "all" / "p0.parquet"), 256)

    # NOTE: the single-build reference must see the same per-row content;
    # docids in segB start at 0 locally and get offset 512 by the merge,
    # which equals their position in the single build (512 aligned to span)
    cfg = IndexBuildConfig(
        num_partitions=4, block_span_bits=span_bits, shard_fragments=2, dedup_urls=False
    )
    idx_a, idx_b = str(root / "ia"), str(root / "ib")
    build_index(str(root / "segA"), idx_a, cfg)
    build_index(str(root / "segB"), idx_b, cfg)
    merged = str(root / "im")
    merge_indexes([idx_a, idx_b], merged)
    single = str(root / "is")
    build_index(str(root / "all"), single, cfg)
    return merged, single


class TestMerge:
    def test_merged_passes_checker(self, merged_setup):
        merged, _ = merged_setup
        summary = check_index(merged)
        assert summary["docs"] == 812

    def test_merged_matches_single_build(self, merged_setup):
        """Aligned segment spans -> identical docids, ranks, and scores."""
        merged, single = merged_setup
        em, es = QueryEngine(merged), QueryEngine(single)
        assert em.reader.n_docs == es.reader.n_docs
        assert abs(em.reader.avgdl - es.reader.avgdl) < 1e-9
        rng = np.random.default_rng(3)
        terms = ["waaa", "wbaa", "wab", "wbab"]
        queries = ["waaa", "waaa wbab", "waaa + wbab", "waaa - wbab", "wa*"]
        for _ in range(20):
            a, b = terms[rng.integers(0, 4)], terms[rng.integers(0, 4)]
            queries.append(f"{a} {'+-^ '[rng.integers(0, 4)]} {b}".replace("  ", " "))
        for q in queries:
            im, sm = em.search(q, k=50), es.search(q, k=50)
            assert im[0].tolist() == sm[0].tolist(), q
            np.testing.assert_allclose(im[1], sm[1], rtol=1e-12, atol=0, err_msg=q)

    def test_merge_config_mismatch_rejected(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        tbl = generate_pages_batch(0, 50, seed=1)
        src = str(tmp_path / "src")
        _write_rows(tbl, os.path.join(src, "p.parquet"), 25)
        i1, i2 = str(tmp_path / "i1"), str(tmp_path / "i2")
        build_index(src, i1, IndexBuildConfig(num_partitions=2))
        build_index(src, i2, IndexBuildConfig(num_partitions=4))
        with pytest.raises(ValueError, match="config mismatch"):
            merge_indexes([i1, i2], str(tmp_path / "out"))
