"""Shared fixtures: one Ray session per pytest session; synthetic pages."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_t1(tmp_path_factory):
    """1k-row pages table, 2 files (FIXTURES.md t1 smoke scale)."""
    from oscar_ray.sources.synth import write_pages

    d = tmp_path_factory.mktemp("pages_t1")
    write_pages(str(d), n_rows=1000, n_files=2, rows_per_group=250)
    return str(d)


@pytest.fixture(scope="session")
def built_index_t1(ray_session, pages_t1, tmp_path_factory):
    """Index over pages_t1 with small partitions + small blocks."""
    from oscar_ray.index.build import IndexBuildConfig, build_index

    out = str(tmp_path_factory.mktemp("index_t1"))
    cfg = IndexBuildConfig(num_partitions=8, block_span_bits=8, shard_fragments=3)
    manifest = build_index(pages_t1, out, cfg)
    return out, manifest


@pytest.fixture(scope="session")
def oracle_t1(pages_t1):
    from tests.oracle import OracleIndex

    return OracleIndex.from_parquet_dir(pages_t1)
