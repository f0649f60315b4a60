"""Doc-sharded serving: exact rank/score identity vs the unsharded
engine at every shard count, phrase-df pre-pass, empty-shard edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.index.reader import IndexReader
from oscar_ray.query.engine import QueryEngine, QueryServer
from oscar_ray.query.sharded import ShardedPool, merge_shard_results
from oscar_ray.sources.queryset import generate_queries


@pytest.fixture(scope="module")
def query_batch(oracle_t1):
    dfs = {t: len(p) for t, p in oracle_t1.postings.items()}
    qs = generate_queries(dfs, n_queries=80, seed=11)
    return pa.Table.from_pylist(qs)


@pytest.fixture(scope="module")
def unsharded_results(built_index_t1, query_batch):
    index_dir, _ = built_index_t1
    return QueryServer(index_dir)(query_batch)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([("query_id", "ascending"), ("rank", "ascending")])


class TestReaderBlockRange:
    def test_shards_partition_posting_rows(self, built_index_t1):
        """Union over shards of every term's (block_id, doc_count) rows
        equals the full reader's — no row lost or duplicated."""
        index_dir, _ = built_index_t1
        full = IndexReader(index_dir)
        shards = [IndexReader(index_dir, shard=(i, 3)) for i in range(3)]
        # ranges tile [0, n_blocks) without overlap — n_blocks from
        # max_docid (docids can be sparse after URL-dedup)
        n_blocks = (
            (full.manifest["stats"]["max_docid"] >> full.block_span_bits) + 1
        )
        assert shards[0].block_range[0] == 0
        assert shards[-1].block_range[1] == n_blocks
        for a, b in zip(shards, shards[1:]):
            assert a.block_range[1] == b.block_range[0]
        for term in ["the", "lorem", "zzz-absent"]:
            tp_full = full.postings(term)
            got = []
            for sh in shards:
                tp = sh.postings(term)
                assert tp.df == tp_full.df  # df stays GLOBAL
                got.extend(zip(tp.block_ids.tolist(), tp.doc_counts.tolist()))
            assert sorted(got) == sorted(
                zip(tp_full.block_ids.tolist(), tp_full.doc_counts.tolist())
            )

    def test_preload_respects_range_and_decodes_identically(self, built_index_t1):
        index_dir, _ = built_index_t1
        full = IndexReader(index_dir)
        sh = IndexReader(index_dir, shard=(1, 2))
        sh.preload()
        lo, hi = sh.block_range
        term = "the"
        tp_full, tp_sh = full.postings(term), sh.postings(term)
        assert all(lo <= b < hi for b in tp_sh.block_ids.tolist())
        # shard blocks decode byte-identically to the same full blocks
        fmap = {int(b): i for i, b in enumerate(tp_full.block_ids)}
        for i, b in enumerate(tp_sh.block_ids.tolist()):
            a = tp_sh.decode_block(i)
            e = tp_full.decode_block(fmap[int(b)])
            for x, y in zip(a, e):
                np.testing.assert_array_equal(x, y)

    def test_empty_shard_and_engine_guard(self, built_index_t1):
        """More shards than blocks -> some shards hold nothing; the
        engine returns empty instead of crashing on df>0/0-block terms."""
        index_dir, _ = built_index_t1
        full = IndexReader(index_dir)
        n_blocks = ((full.n_docs - 1) >> full.block_span_bits) + 1
        k = n_blocks + 3
        empties = 0
        for i in range(k):
            r = IndexReader(index_dir, shard=(i, k))
            eng = QueryEngine(index_dir, reader=r)
            ids, scores = eng.search("the", k=10, mode="exhaustive")
            if r.block_range[0] == r.block_range[1]:
                empties += 1
                assert len(ids) == 0
        assert empties == 3

    def test_sparse_docids_last_block_covered(self, ray_session, tmp_path_factory):
        """URL-dedup drops docs but docids keep their dense assignment
        positions, so max_docid > n_docs - 1: the shard split must tile
        the REAL block space or tail-block docs become unreachable (the
        exact 50M-soak regression: 2 docs lost from the last block)."""
        from oscar_ray.index.build import IndexBuildConfig, build_index

        d = tmp_path_factory.mktemp("sparse_ids")
        src = str(d / "docs.parquet")
        n = 64
        # duplicate URLs in the MIDDLE so later docids shift past n_docs
        urls = [f"http://ex.com/{i if not 20 <= i < 30 else 'dup'}" for i in range(n)]
        pq.write_table(
            pa.table(
                {
                    "url": urls,
                    "text": [f"alpha w{i:03d} common" for i in range(n)],
                    "lang": ["en"] * n,
                }
            ),
            src,
        )
        out = str(d / "idx")
        build_index(
            src,
            out,
            IndexBuildConfig(num_partitions=2, block_span_bits=3, shard_fragments=1),
            check=True,
        )
        full = IndexReader(out)
        assert full.manifest["stats"]["max_docid"] > full.n_docs - 1  # sparse
        want_ids, want_sc = QueryEngine(out).search("common", k=n, mode="exhaustive")
        for k in (2, 3):
            got = []
            for i in range(k):
                eng = QueryEngine(out, reader=IndexReader(out, shard=(i, k)))
                ids, sc = eng.search("common", k=n, mode="exhaustive")
                got.extend(zip(ids.tolist(), sc.tolist()))
            got.sort()
            assert got == sorted(zip(want_ids.tolist(), want_sc.tolist()))

    def test_shard_validation(self, built_index_t1):
        index_dir, _ = built_index_t1
        with pytest.raises(ValueError):
            IndexReader(index_dir, shard=(2, 2))
        with pytest.raises(ValueError):
            IndexReader(index_dir, block_range=(0, 1), shard=(0, 2))


class TestShardedPoolExactness:
    @pytest.mark.parametrize("n_shards", [1, 2, 3])
    def test_rank_and_score_identity(
        self, ray_session, built_index_t1, query_batch, unsharded_results, n_shards
    ):
        index_dir, _ = built_index_t1
        pool = ShardedPool(index_dir, n_shards=n_shards, num_cpus=0.25)
        got = _sorted(pool.search_batch(query_batch))
        want = _sorted(unsharded_results)
        assert got.num_rows == want.num_rows
        assert got["query_id"].to_pylist() == want["query_id"].to_pylist()
        assert got["docid"].to_pylist() == want["docid"].to_pylist()
        np.testing.assert_array_equal(  # bit-identical BM25 (global stats)
            got["score"].to_numpy(), want["score"].to_numpy()
        )

    def test_exhaustive_mode_identity(
        self, ray_session, built_index_t1, query_batch
    ):
        index_dir, _ = built_index_t1
        want = _sorted(QueryServer(index_dir, mode="exhaustive")(query_batch))
        pool = ShardedPool(index_dir, n_shards=2, mode="exhaustive", num_cpus=0.25)
        got = _sorted(pool.search_batch(query_batch))
        assert got["docid"].to_pylist() == want["docid"].to_pylist()
        np.testing.assert_array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        )

    def test_lazy_shards_match_preloaded(
        self, ray_session, built_index_t1, query_batch, unsharded_results
    ):
        index_dir, _ = built_index_t1
        pool = ShardedPool(index_dir, n_shards=2, preload=False, num_cpus=0.25)
        got = _sorted(pool.search_batch(query_batch))
        want = _sorted(unsharded_results)
        assert got["docid"].to_pylist() == want["docid"].to_pylist()


PHRASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sleeps while the fox waits",
    "brown fox quick brown fox the end",
    "lazy dogs and quick foxes never meet",
    "the brown bear ate the quick salmon",
    "quick brown fox quick brown fox encore",
    "dogs sleep; foxes jump; bears eat salmon",
    "over the river and through the woods a fox ran",
] * 4  # 32 docs -> 4 blocks at span_bits=3


@pytest.fixture(scope="module")
def phrase_index(ray_session, tmp_path_factory):
    from oscar_ray.index.build import IndexBuildConfig, build_index

    d = tmp_path_factory.mktemp("sharded_pos")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(PHRASE_TEXTS)), type=pa.int64()),
                "text": PHRASE_TEXTS,
                "lang": ["en"] * len(PHRASE_TEXTS),
            }
        ),
        src,
    )
    out = str(d / "idx")
    build_index(
        src,
        out,
        IndexBuildConfig(
            num_partitions=4,
            block_span_bits=3,
            shard_fragments=1,
            id_column="doc_id",
            url_column=None,
            dedup_urls=False,
            index_positions=True,
        ),
        check=True,
    )
    return out


class TestShardedPhrases:
    """Phrase idf depends on the GLOBAL phrase df; the pool's pre-pass
    sums shard-local dfs (exact under docid partitioning) and pins them."""

    QUERIES = [
        '"quick brown fox"',
        '"quick brown" dog',
        '"the quick" + "brown fox"',
        'fox ~2 dog',
        '"quick brown fox" - lazy',
    ]

    @pytest.fixture(scope="class")
    def phrase_batch(self):
        return pa.table(
            {
                "query_id": pa.array(range(len(self.QUERIES)), type=pa.int64()),
                "query": pa.array(self.QUERIES, type=pa.string()),
            }
        )

    @pytest.mark.parametrize("n_shards", [2, 3])
    def test_phrase_identity_with_pin(
        self, ray_session, phrase_index, phrase_batch, n_shards
    ):
        want = _sorted(QueryServer(phrase_index)(phrase_batch))
        pool = ShardedPool(phrase_index, n_shards=n_shards, num_cpus=0.25)
        got = _sorted(pool.search_batch(phrase_batch))
        assert got["docid"].to_pylist() == want["docid"].to_pylist()
        np.testing.assert_array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        )

    def test_pinned_dfs_are_global(self, ray_session, phrase_index, phrase_batch):
        eng = QueryEngine(phrase_index)
        from oscar_ray.query import positional

        ids, _t, _d = positional.phrase_postings(eng.reader, ["quick", "brown", "fox"])
        pool = ShardedPool(phrase_index, n_shards=2, num_cpus=0.25)
        pinned = pool.pin_phrase_dfs(phrase_batch["query"].to_pylist())
        assert pinned[("quick", "brown", "fox")] == len(ids)


class TestMergeFunction:
    def test_merge_respects_per_query_k(self):
        a = pa.table(
            {
                "query_id": pa.array([1, 1, 2], type=pa.int64()),
                "rank": pa.array([1, 2, 1], type=pa.int64()),
                "docid": pa.array([10, 11, 20], type=pa.int64()),
                "score": pa.array([3.0, 2.0, 5.0], type=pa.float64()),
            }
        )
        b = pa.table(
            {
                "query_id": pa.array([1, 2], type=pa.int64()),
                "rank": pa.array([1, 1], type=pa.int64()),
                "docid": pa.array([30, 21], type=pa.int64()),
                "score": pa.array([2.5, 5.0], type=pa.float64()),
            }
        )
        out = merge_shard_results([a, b], ks={1: 2, 2: 1})
        by_q = {}
        for row in out.to_pylist():
            by_q.setdefault(row["query_id"], []).append((row["docid"], row["score"]))
        assert by_q[1] == [(10, 3.0), (30, 2.5)]
        assert by_q[2] == [(20, 5.0)]  # score tie -> lower docid wins

    def test_merge_all_empty(self):
        e = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "docid": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        assert merge_shard_results([e, e]).num_rows == 0


class TestDecodedCacheBudget:
    """Serving-node decoded-cache sizing: the per-reader budget override
    and ShardedPool's auto sizing (the 50M/100M-decade fix — the 256 MB
    default thrashes once the queried working set outgrows it)."""

    def test_reader_budget_override(self, built_index_t1):
        index_dir, _ = built_index_t1
        r = IndexReader(index_dir, decoded_cache_mb=7)
        assert r._decoded_cache.max_bytes == 7 << 20
        # default path still honors the env/256MB default
        assert IndexReader(index_dir)._decoded_cache.max_bytes >= 1 << 20

    def test_auto_cache_mb_formula(self, built_index_t1):
        import json

        from oscar_ray.index import layout

        index_dir, _ = built_index_t1
        with open(layout.manifest_path(index_dir)) as f:
            manifest = json.load(f)
        rows = sum(p["rows"] for p in manifest["partitions"] if p)
        for k in (1, 2, 8):
            got = ShardedPool._auto_cache_mb(index_dir, k)
            need_mb = (rows * 24 // k) >> 20
            assert got >= 256  # never below the default
            assert got >= min(need_mb, 256)

    def test_auto_cache_mb_missing_index_falls_back(self, tmp_path):
        assert ShardedPool._auto_cache_mb(str(tmp_path / "nope"), 4) is None

    def test_sharded_identity_with_tiny_budget(
        self, ray_session, built_index_t1, query_batch, unsharded_results
    ):
        """Rank/score identity is budget-independent: a 1 MB decoded
        cache (constant eviction) answers bit-identically."""
        index_dir, _ = built_index_t1
        pool = ShardedPool(
            index_dir, n_shards=2, num_cpus=0.25, decoded_cache_mb=1
        )
        got = _sorted(pool.search_batch(query_batch))
        want = _sorted(unsharded_results)
        assert got.equals(want)
