"""Structural consistency checker tests (the --check analog, SURVEY §5.3)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.index import layout
from oscar_ray.index.check import IndexCheckError, check_index


class TestChecker:
    def test_clean_index_passes(self, built_index_t1, oracle_t1):
        index_dir, _ = built_index_t1
        summary = check_index(index_dir)
        assert summary["docs"] == oracle_t1.n_docs + len(oracle_t1.tombstones)
        assert summary["terms"] == len(oracle_t1.postings)
        assert summary["postings_checked"] > 0

    def test_corrupt_postings_detected(self, built_index_t1, tmp_path):
        import shutil

        index_dir, manifest = built_index_t1
        bad = str(tmp_path / "bad_idx")
        shutil.copytree(index_dir, bad)
        # corrupt one block's payload: swap two delta bytes of part 0
        ppath = layout.postings_path(bad, 0)
        t = pq.read_table(ppath)
        docs = t["docs"].to_pylist()
        target = next(i for i, d in enumerate(docs) if len(d) >= 2)
        b = bytearray(docs[target])
        b[0] ^= 0x3F  # perturb the first gap -> wrong doclen/ordering downstream
        docs[target] = bytes(b)
        t = t.set_column(t.schema.get_field_index("docs"), "docs", pa.array(docs, type=pa.binary()))
        pq.write_table(t, ppath)
        with pytest.raises((IndexCheckError, ValueError)):
            check_index(bad)

    def test_dict_mismatch_detected(self, built_index_t1, tmp_path):
        import shutil

        index_dir, _ = built_index_t1
        bad = str(tmp_path / "bad_dict")
        shutil.copytree(index_dir, bad)
        dpath = layout.dict_path(bad, 1)
        t = pq.read_table(dpath)
        df = t["df"].to_pylist()
        df[0] += 1
        t = t.set_column(t.schema.get_field_index("df"), "df", pa.array(df, type=pa.int64()))
        pq.write_table(t, dpath)
        with pytest.raises(IndexCheckError, match="C3"):
            check_index(bad)

    def test_incomplete_manifest_detected(self, built_index_t1, tmp_path):
        import shutil

        index_dir, _ = built_index_t1
        bad = str(tmp_path / "bad_manifest")
        shutil.copytree(index_dir, bad)
        mp = layout.manifest_path(bad)
        m = json.load(open(mp))
        m["complete"] = False
        json.dump(m, open(mp, "w"))
        with pytest.raises(Exception):
            check_index(bad)

    def test_build_with_check_flag(self, ray_session, tmp_path):
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.sources.synth import write_pages

        pages = str(tmp_path / "pages")
        write_pages(pages, n_rows=150, n_files=1)
        out = str(tmp_path / "idx")
        m = build_index(
            pages, out, IndexBuildConfig(num_partitions=4, shard_fragments=2), check=True
        )
        assert m["complete"]

    def test_all_features_combined(self, ray_session, tmp_path):
        """Suffix index + static rank + dedup + html extraction together:
        invariants hold and every query family answers."""
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.query.engine import QueryEngine
        from oscar_ray.sources.synth import write_pages

        pages = str(tmp_path / "pages")
        write_pages(pages, n_rows=300, n_files=2, rows_per_group=150)
        # add a rank column derived from warc_ts (any float works)
        import glob

        import pyarrow.compute as pc_mod

        for f in glob.glob(pages + "/*.parquet"):
            t = pq.read_table(f)
            rank = pc_mod.cast(t["warc_ts"].cast("int64"), "float64")
            pq.write_table(t.append_column("rank", rank), f, row_group_size=150)

        out = str(tmp_path / "idx")
        cfg = IndexBuildConfig(
            num_partitions=4,
            block_span_bits=8,
            shard_fragments=2,
            index_suffixes=True,
            rank_column="rank",
            extract_from_html=True,
            dedup_urls=True,
        )
        m = build_index(pages, out, cfg, check=True)
        assert m["complete"]
        eng = QueryEngine(out)
        for q in ["waaa", "wa*", "*aa*", "*aa", "waaa + wbab", "waaa - wbab"]:
            ids, scores = eng.search(q, k=10)
            assert len(ids) == len(scores)
        assert len(eng.search("*aa*", k=10)[0]) > 0
