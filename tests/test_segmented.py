"""Segmented (federated) serving tests: N independently built indexes
queried as one engine, rank- AND score-identical to their merge — the
Lucene-segment-model step of the incremental loop (index/segmented.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.merge import merge_indexes
from oscar_ray.index.segmented import SegmentedReader
from oscar_ray.query.engine import QueryEngine

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "quick brown foxes dance",
    "",
    "hash join and merge join win over nested loop join",
    "the the the quick quick brown",
    "merge sort beats quick sort on nearly sorted data",
    "a hash join is a join that uses a hash table",
    "brown quick",
    "join hash",
    "quick stop stops slow drop plop",
    "over the lazy dog the quick brown fox jumps",
] * 3

QUERIES = [
    "quick",
    "hash join",
    "quick + brown - fox",
    '"hash join"',
    '"the quick brown"',
    '"fox dog"~5',
    "stop~",
    "%fox(es)?%",
    "qu*",
    "the ^ dog",
    '"quick quick"',
]

CFG = dict(
    num_partitions=4,
    block_span_bits=3,
    shard_fragments=1,
    id_column="doc_id",
    url_column=None,
    lang_column=None,
    dedup_urls=False,
    index_positions=True,
)


def _write(texts, ids, path):
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": list(texts)}),
        path,
    )
    return path


@pytest.fixture(scope="module")
def seg_setup(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("segmented")
    sa = _write(TEXTS[:16], range(16), str(d / "a.parquet"))
    sb = _write(TEXTS[16:], range(len(TEXTS) - 16), str(d / "b.parquet"))
    ia, ib = str(d / "ia"), str(d / "ib")
    build_index(sa, ia, IndexBuildConfig(**CFG))
    build_index(sb, ib, IndexBuildConfig(**CFG))
    merged = str(d / "merged")
    merge_indexes([ia, ib], merged)
    return ia, ib, merged, str(d)


class TestSegmentedParity:
    def test_rank_and_score_identical_to_merge(self, seg_setup):
        ia, ib, merged, _ = seg_setup
        es = QueryEngine(None, reader=SegmentedReader([ia, ib]))
        em = QueryEngine(merged)
        assert es.reader.n_docs == em.reader.n_docs
        assert abs(es.reader.avgdl - em.reader.avgdl) < 1e-12
        for q in QUERIES:
            for mode in ("exhaustive", "auto"):
                a = es.search(q, k=1000, mode=mode)
                b = em.search(q, k=1000, mode=mode)
                assert a[0].tolist() == b[0].tolist(), (q, mode)
                np.testing.assert_allclose(
                    a[1], b[1], rtol=1e-12, err_msg=f"{q} {mode}"
                )

    def test_term_stats_are_global(self, seg_setup):
        ia, ib, merged, _ = seg_setup
        sr = SegmentedReader([ia, ib])
        mr = QueryEngine(merged).reader
        for t in ["quick", "join", "the", "zzz"]:
            assert sr.term_stats(t) == mr.term_stats(t)

    def test_dictionary_scans_are_unions(self, seg_setup):
        ia, ib, merged, _ = seg_setup
        sr = SegmentedReader([ia, ib])
        mr = QueryEngine(merged).reader
        assert sr.terms_with_prefix("qu") == mr.terms_with_prefix("qu")
        assert sr.terms_with_edit_distance("stop", 1) == mr.terms_with_edit_distance(
            "stop", 1
        )
        assert sr.terms_with_regex("jo.*") == mr.terms_with_regex("jo.*")

    def test_complete_and_suggest_match_merge(self, seg_setup):
        # federated completions / did-you-mean == the merged index's
        # (dfs summed across segments; dist is term-intrinsic) — the
        # CLI's zero-hit hint and bench --live paths in segmented mode
        ia, ib, merged, _ = seg_setup
        sr = SegmentedReader([ia, ib])
        mr = QueryEngine(merged).reader
        assert sr.complete("qu", k=10) == mr.complete("qu", k=10)
        assert sr.complete("j", k=None) == mr.complete("j", k=None)
        assert sr.suggest("stp", max_dist=2, k=10) == mr.suggest(
            "stp", max_dist=2, k=10
        )
        assert sr.suggest("joim", max_dist=1, k=None) == mr.suggest(
            "joim", max_dist=1, k=None
        )

    def test_explicit_zero_offsets_preserve_global_ids(
        self, ray_session, seg_setup, tmp_path
    ):
        """id_column segments over already-disjoint id ranges (split at a
        block-span multiple) serve with offsets=[0,0] and return the
        ORIGINAL ids — the federated-entry mode."""
        _, _, _, d = seg_setup
        # segment B re-built with its GLOBAL ids (16..32), block-aligned
        sb2 = _write(
            TEXTS[16:], [16 + i for i in range(len(TEXTS) - 16)],
            str(tmp_path / "b2.parquet"),
        )
        ib2 = str(tmp_path / "ib2")
        build_index(sb2, ib2, IndexBuildConfig(**CFG))
        ia = os.path.join(d, "ia")
        sr = SegmentedReader([ia, ib2], offsets=[0, 0])
        es = QueryEngine(None, reader=sr)
        em = QueryEngine(os.path.join(d, "merged"))
        for q in QUERIES:
            a, b = es.search(q, k=1000), em.search(q, k=1000)
            assert a[0].tolist() == b[0].tolist(), q
            np.testing.assert_allclose(a[1], b[1], rtol=1e-12, err_msg=q)

    def test_query_server_segmented(self, ray_session, seg_setup):
        """Batch serving actors accept the comma-joined segment syntax."""
        import ray.data

        from oscar_ray.query.engine import QueryServer

        ia, ib, merged, _ = seg_setup
        queries = [
            {"query_id": i, "query": q, "k": 5} for i, q in enumerate(QUERIES[:4])
        ]
        got = (
            ray.data.from_items(queries, override_num_blocks=2)
            .map_batches(
                QueryServer,
                fn_constructor_kwargs={"index_dir": f"{ia},{ib}"},
                batch_format="pyarrow",
                concurrency=2,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        em = QueryEngine(merged)
        for q in queries:
            ids, sc = em.search(q["query"], k=5)
            sub = got[got["query_id"] == q["query_id"]]
            assert sub["docid"].tolist() == ids.tolist(), q["query"]
            np.testing.assert_allclose(sub["score"].to_numpy(), sc)

    def test_unaligned_offsets_rejected(self, seg_setup):
        ia, ib, _, _ = seg_setup
        with pytest.raises(ValueError, match="multiples of the block span"):
            SegmentedReader([ia, ib], offsets=[0, 4])

    def test_config_mismatch_rejected(self, ray_session, seg_setup, tmp_path):
        ia, _, _, _ = seg_setup
        other = str(tmp_path / "other")
        cfg = dict(CFG)
        cfg["block_span_bits"] = 5
        _write(TEXTS[:8], range(8), str(tmp_path / "o.parquet"))
        build_index(str(tmp_path / "o.parquet"), other, IndexBuildConfig(**cfg))
        with pytest.raises(ValueError, match="mismatch"):
            SegmentedReader([ia, other])

    def test_block_overlap_detected(self, ray_session, seg_setup, tmp_path):
        """Explicit zero offsets with id ranges sharing a block raise."""
        ia, _, _, _ = seg_setup
        # ids 1..9 overlap segment A's block 0/1 range (span 8)
        sb = _write(
            ["quick brown"] * 9, [1 + i for i in range(9)], str(tmp_path / "c.parquet")
        )
        ic = str(tmp_path / "ic")
        build_index(sb, ic, IndexBuildConfig(**CFG))
        sr = SegmentedReader([ia, ic], offsets=[0, 0])
        with pytest.raises(ValueError, match="share a posting block"):
            sr.postings("quick")
