"""Index-build tests: invariants, dedup, determinism, resume (FIXTURES.md §4)."""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from oscar_ray.index import layout
from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.reader import IndexReader
from oscar_ray.stages.codecs import decode_postings


def _artifact_hashes(index_dir: str) -> dict[str, str]:
    """sha256 of every index artifact file (postings/dict/docmeta)."""
    out = {}
    for sub in ("postings", "dict", "docmeta"):
        for p in sorted(
            glob.glob(os.path.join(index_dir, sub, "**", "*.parquet"), recursive=True)
        ):
            out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
    return out


class TestInvariants:
    def test_postings_sorted_unique_and_df(self, built_index_t1, oracle_t1):
        index_dir, manifest = built_index_t1
        reader = IndexReader(index_dir)
        # every term: sum of block doc_counts == df == oracle df
        seen_terms = 0
        for part in range(manifest["config"]["num_partitions"]):
            t = pq.read_table(layout.postings_path(index_dir, part))
            per_term: dict[str, int] = {}
            for term, cnt, docs, tfs, dls, blk in zip(
                t["term"].to_pylist(),
                t["doc_count"].to_pylist(),
                t["docs"].to_pylist(),
                t["tfs"].to_pylist(),
                t["dls"].to_pylist(),
                t["block_id"].to_pylist(),
            ):
                ids, tf, dl = decode_postings(docs, tfs, dls, count=cnt)
                assert (np.diff(ids.astype(np.int64)) > 0).all(), "docids not strictly ascending"
                assert (tf >= 1).all() and (dl >= 1).all()
                span = 1 << manifest["config"]["block_span_bits"]
                assert (ids >= blk * span).all() and (ids < (blk + 1) * span).all()
                per_term[term] = per_term.get(term, 0) + cnt
            for term, df in per_term.items():
                assert df == oracle_t1.df(term), term
                assert reader.term_stats(term)[0] == df
                seen_terms += 1
        assert seen_terms == len(oracle_t1.postings)

    def test_block_max_bounds_member_scores(self, built_index_t1):
        from oscar_ray.spec.bm25 import bm25_tf_norm

        index_dir, manifest = built_index_t1
        reader = IndexReader(index_dir)
        t = pq.read_table(layout.postings_path(index_dir, 0))
        for i in range(min(200, t.num_rows)):
            row = t.slice(i, 1).to_pylist()[0]
            ids, tf, dl = decode_postings(
                row["docs"], row["tfs"], row["dls"], count=row["doc_count"]
            )
            tfns = bm25_tf_norm(tf, dl, reader.avgdl, reader.params)
            assert row["max_tfn"] >= tfns.max() - 1e-15

    def test_corpus_stats_match_oracle(self, built_index_t1, oracle_t1):
        _, manifest = built_index_t1
        s = manifest["stats"]
        assert s["n_docs"] == oracle_t1.n_docs
        assert abs(s["avgdl"] - oracle_t1.avgdl) < 1e-9
        assert s["n_duplicates"] == len(oracle_t1.tombstones)

    def test_docmeta_doclens_match_oracle(self, built_index_t1, oracle_t1):
        index_dir, _ = built_index_t1
        meta = pq.read_table(os.path.join(index_dir, "docmeta"))
        by_docid = dict(zip(meta["docid"].to_pylist(), meta["doclen"].to_pylist()))
        for docid, dl in oracle_t1.doclen.items():
            assert by_docid[docid] == dl

    def test_dedup_tombstones(self, built_index_t1, oracle_t1):
        """Duplicate urls collapse: no tombstoned docid appears in postings."""
        index_dir, manifest = built_index_t1
        if not oracle_t1.tombstones:
            pytest.skip("fixture produced no duplicates")
        tomb = oracle_t1.tombstones
        for part in range(manifest["config"]["num_partitions"]):
            t = pq.read_table(layout.postings_path(index_dir, part))
            for cnt, docs, tfs, dls in zip(
                t["doc_count"].to_pylist(),
                t["docs"].to_pylist(),
                t["tfs"].to_pylist(),
                t["dls"].to_pylist(),
            ):
                ids, _, _ = decode_postings(docs, tfs, dls, count=cnt)
                assert not (set(ids.astype(np.int64).tolist()) & tomb)


class TestDeterminismAndResume:
    def test_rebuild_identical(self, ray_session, pages_t1, tmp_path):
        """Different parallelism / shard config -> byte-identical artifacts.

        The rebuild-and-compare analog (``readwritefuncs.cpp:311-325``).
        docmeta shards differ when shard_fragments differs, so compare
        postings+dict (the queryable artifacts) across configs.
        """
        cfg_a = IndexBuildConfig(
            num_partitions=8, block_span_bits=8, shard_fragments=3
        )
        cfg_b = IndexBuildConfig(
            num_partitions=8, block_span_bits=8, shard_fragments=1
        )
        out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
        build_index(pages_t1, out_a, cfg_a)
        build_index(pages_t1, out_b, cfg_b)
        ha = {k: v for k, v in _artifact_hashes(out_a).items() if not k.startswith("docmeta")}
        hb = {k: v for k, v in _artifact_hashes(out_b).items() if not k.startswith("docmeta")}
        assert ha == hb and len(ha) > 0

    def test_distributed_fragment_scan_identical(self, ray_session, tmp_path):
        """Above the file threshold the footer scan fans out as Ray
        tasks; the fragment list (paths, row groups, docid bases) must
        equal the serial scan's exactly."""
        import pyarrow.parquet as pq

        from oscar_ray.sources.pages import list_fragments
        from oscar_ray.sources.synth import generate_pages_batch

        src = str(tmp_path / "many")
        os.makedirs(src)
        rng = np.random.default_rng(11)
        base_tbl = generate_pages_batch(0, 40, seed=9)
        for i in range(80):
            n = int(rng.integers(5, 40))
            pq.write_table(
                base_tbl.slice(0, n),
                os.path.join(src, f"f{i:04d}.parquet"),
                row_group_size=16,
            )
        dist = list_fragments(src, distributed_min_files=8)  # forced fan-out
        serial = list_fragments(src, distributed_min_files=1 << 60)
        assert dist == serial
        assert len(dist) > 80  # multiple row groups per file
        bases = [f.base_docid for f in dist]
        assert bases == sorted(bases) and bases[0] == 0

    def test_resume_after_partial_stage_b(self, ray_session, pages_t1, tmp_path):
        """Kill after partition p of P, resume -> identical artifacts (FIXTURES §4.4)."""
        cfg = IndexBuildConfig(num_partitions=8, block_span_bits=8, shard_fragments=3)
        full_dir = str(tmp_path / "full")
        build_index(pages_t1, full_dir, cfg)
        want = _artifact_hashes(full_dir)

        part_dir = str(tmp_path / "partial")
        build_index(pages_t1, part_dir, cfg)
        # simulate a crash that lost partitions 3..7 mid-stage-B + the manifest
        for p in range(3, 8):
            os.remove(layout.postings_path(part_dir, p))
            os.remove(layout.dict_path(part_dir, p))
            os.remove(layout.marker_path(part_dir, "partB", p))
        manifest = json.load(open(layout.manifest_path(part_dir)))
        manifest["complete"] = False
        json.dump(manifest, open(layout.manifest_path(part_dir), "w"))

        m2 = build_index(pages_t1, part_dir, cfg, resume=True)
        assert m2["complete"]
        assert _artifact_hashes(part_dir) == want

    def test_resume_after_partial_stage_a(self, ray_session, pages_t1, tmp_path):
        cfg = IndexBuildConfig(num_partitions=8, block_span_bits=8, shard_fragments=3)
        full_dir = str(tmp_path / "full")
        build_index(pages_t1, full_dir, cfg)
        want = _artifact_hashes(full_dir)

        part_dir = str(tmp_path / "partial")
        build_index(pages_t1, part_dir, cfg)
        # crash story: shard 0's spill is done but stage B never ran; also
        # drop every stage-B artifact and marker
        shutil.rmtree(os.path.join(part_dir, "postings"))
        shutil.rmtree(os.path.join(part_dir, "dict"))
        for mp in glob.glob(os.path.join(part_dir, "tmp", "markers", "partB-*.json")):
            os.remove(mp)
        # and shard 1 lost its marker (will be re-tokenized idempotently)
        os.remove(layout.marker_path(part_dir, "shardA", 1))
        manifest = json.load(open(layout.manifest_path(part_dir)))
        manifest["complete"] = False
        json.dump(manifest, open(layout.manifest_path(part_dir), "w"))

        m2 = build_index(pages_t1, part_dir, cfg, resume=True)
        assert m2["complete"]
        assert _artifact_hashes(part_dir) == want

    def test_input_change_triggers_rebuild(self, ray_session, tmp_path):
        from oscar_ray.sources.synth import write_pages

        pages = str(tmp_path / "pages")
        write_pages(pages, n_rows=100, n_files=1)
        out = str(tmp_path / "idx")
        cfg = IndexBuildConfig(num_partitions=4, shard_fragments=2)
        m1 = build_index(pages, out, cfg)
        write_pages(pages, n_rows=150, n_files=1)  # input changed
        m2 = build_index(pages, out, cfg)
        assert m2["fingerprint"] != m1["fingerprint"]
        assert m2["stats"]["total_docs"] == 150

    def test_extract_from_html_identical_artifacts(self, ray_session, pages_t1, tmp_path):
        """input_hint invariant: building from the html column (via the
        deterministic extractor) yields byte-identical postings/dict to
        building from the text column."""
        base = dict(num_partitions=4, block_span_bits=8, shard_fragments=2)
        out_text = str(tmp_path / "from_text")
        out_html = str(tmp_path / "from_html")
        build_index(pages_t1, out_text, IndexBuildConfig(**base))
        build_index(
            pages_t1, out_html, IndexBuildConfig(**base, extract_from_html=True)
        )
        ht = {k: v for k, v in _artifact_hashes(out_text).items() if not k.startswith("docmeta")}
        hh = {k: v for k, v in _artifact_hashes(out_html).items() if not k.startswith("docmeta")}
        assert ht == hh and len(ht) > 0

    def test_generic_extractor_identical_postings(
        self, ray_session, pages_t1, tmp_path
    ):
        """The real-web extractor produces the same TOKEN stream on
        fixture pages (newline vs space separators), so postings/dict
        artifacts are byte-identical to the pinned extractor's."""
        base = dict(num_partitions=4, block_span_bits=8, shard_fragments=2)
        out_f = str(tmp_path / "fixture_x")
        out_g = str(tmp_path / "generic_x")
        build_index(
            pages_t1, out_f, IndexBuildConfig(**base, extract_from_html=True)
        )
        build_index(
            pages_t1,
            out_g,
            IndexBuildConfig(**base, extract_from_html=True, extractor="generic"),
        )
        hf = {
            k: v
            for k, v in _artifact_hashes(out_f).items()
            if k.startswith(("postings", "dict"))
        }
        hg = {
            k: v
            for k, v in _artifact_hashes(out_g).items()
            if k.startswith(("postings", "dict"))
        }
        assert hf == hg and len(hf) > 0

    def test_jsonl_source_identical_index(self, ray_session, tmp_path):
        """JSONL input (whole-file fragments) builds the same postings as
        the equivalent parquet input."""
        import json as _json

        import pyarrow as pa

        from oscar_ray.sources.synth import generate_pages_batch

        tbl = generate_pages_batch(0, 120, seed=42).select(["url", "text", "lang"])
        pdir = str(tmp_path / "pq")
        jdir = str(tmp_path / "jl")
        os.makedirs(pdir)
        os.makedirs(jdir)
        pq.write_table(tbl, os.path.join(pdir, "a.parquet"), row_group_size=60)
        with open(os.path.join(jdir, "a.jsonl"), "w") as f:
            for r in tbl.to_pylist():
                f.write(_json.dumps(r) + "\n")
        cfg = IndexBuildConfig(num_partitions=4, shard_fragments=2)
        out_p, out_j = str(tmp_path / "ip"), str(tmp_path / "ij")
        build_index(pdir, out_p, cfg)
        build_index(jdir, out_j, cfg)
        hp = {k: v for k, v in _artifact_hashes(out_p).items() if k.startswith(("postings", "dict"))}
        hj = {k: v for k, v in _artifact_hashes(out_j).items() if k.startswith(("postings", "dict"))}
        assert hp == hj and len(hp) > 0

    def test_rank_column_mode(self, ray_session, tmp_path):
        """applySort analog: docids assigned by rank desc; BM25 ties then
        prefer higher-static-rank docs automatically."""
        import pyarrow as pa

        tbl = pa.table(
            {
                "url": ["u0", "u1", "u2", "u3"],
                "text": ["same text here"] * 4,  # identical -> identical scores
                "rank": pa.array([5.0, 20.0, 1.0, 10.0], type=pa.float64()),
            }
        )
        src = str(tmp_path / "ranked")
        os.makedirs(src)
        pq.write_table(tbl, os.path.join(src, "part.parquet"))
        out = str(tmp_path / "idx")
        cfg = IndexBuildConfig(
            num_partitions=2,
            rank_column="rank",
            lang_column=None,
            dedup_urls=False,
        )
        build_index(src, out, cfg)
        # rank 20 -> docid 0, rank 10 -> 1, rank 5 -> 2, rank 1 -> 3
        meta = pq.read_table(os.path.join(out, "docmeta"))
        by_url = dict(zip(meta["url"].to_pylist(), meta["docid"].to_pylist()))
        assert by_url == {"u1": 0, "u3": 1, "u0": 2, "u2": 3}
        from oscar_ray.query.engine import QueryEngine

        ids, scores = QueryEngine(out).search("same", k=4)
        assert ids.tolist() == [0, 1, 2, 3]  # equal scores -> static-rank order
        assert len(set(scores.tolist())) == 1

    def test_id_column_mode(self, ray_session, tmp_path):
        """Existing unique int64 id column becomes the docid."""
        import pyarrow as pa

        tbl = pa.table(
            {
                "doc_id": pa.array([10, 20, 30], type=pa.int64()),
                "url": ["u1", "u2", "u3"],
                "text": ["alpha beta", "beta gamma", "alpha alpha"],
            }
        )
        src = str(tmp_path / "docs")
        os.makedirs(src)
        pq.write_table(tbl, os.path.join(src, "part.parquet"))
        out = str(tmp_path / "idx")
        cfg = IndexBuildConfig(
            num_partitions=2, id_column="doc_id", lang_column=None, dedup_urls=False
        )
        build_index(src, out, cfg)
        reader = IndexReader(out)
        from oscar_ray.query.engine import QueryEngine

        ids, _ = QueryEngine(out, reader).search("alpha", k=10)
        assert sorted(ids.tolist()) == [10, 30]


class TestDistributedRankSort:
    """_assign_rank_docids_distributed produces byte-identical remap
    artifacts to the driver-side lexsort (the remap CONTRACT)."""

    def test_remap_identical_to_driver_path(self, ray_session, tmp_path):
        import hashlib

        import numpy as np
        import pyarrow as pa

        from oscar_ray.index.build import (
            IndexBuildConfig,
            _assign_rank_docids,
            _assign_rank_docids_distributed,
        )
        from oscar_ray.sources.pages import list_fragments

        rng = np.random.default_rng(3)
        src = str(tmp_path / "ranked")
        os.makedirs(src)
        n_per = 700
        for fi in range(3):
            ranks = rng.choice(
                [-2.5, -1.0, 0.0, 0.5, 3.25, 7.0, 7.0, 100.0], size=n_per
            )  # heavy ties + negatives + zeros
            pq.write_table(
                pa.table(
                    {
                        "url": [f"u{fi}-{i}" for i in range(n_per)],
                        "text": ["x"] * n_per,
                        "rank": pa.array(ranks, type=pa.float64()),
                    }
                ),
                os.path.join(src, f"part-{fi}.parquet"),
                row_group_size=350,
            )
        frags = list_fragments(src)
        cfg = IndexBuildConfig(rank_column="rank", lang_column=None, dedup_urls=False)

        out_a = str(tmp_path / "driver")
        os.makedirs(out_a)
        _assign_rank_docids(frags, cfg, out_a)  # small -> driver path
        out_b = str(tmp_path / "dist")
        os.makedirs(out_b)
        _assign_rank_docids_distributed(frags, cfg, out_b, num_buckets=7)

        for f in sorted(os.listdir(os.path.join(out_a, "remap"))):
            ha = hashlib.md5(
                open(os.path.join(out_a, "remap", f), "rb").read()
            ).hexdigest()
            hb = hashlib.md5(
                open(os.path.join(out_b, "remap", f), "rb").read()
            ).hexdigest()
            assert ha == hb, f


class TestEliasFanoCodec:
    """docid_codec='eliasfano' (the reference's selectable ItemIndex
    type): identical query results + structural checkers green."""

    @pytest.mark.parametrize("codec", ["rlede", "eliasfano", "wah"])
    def test_codec_index_parity_and_check(self, ray_session, pages_t1, tmp_path, codec):
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.index.check import check_index
        from oscar_ray.query.engine import QueryEngine

        out_v = str(tmp_path / "idx_varint")
        out_e = str(tmp_path / f"idx_{codec}")
        base = dict(num_partitions=4, block_span_bits=8, shard_fragments=3)
        build_index(pages_t1, out_v, IndexBuildConfig(**base))
        build_index(pages_t1, out_e, IndexBuildConfig(**base, docid_codec=codec))
        check_index(out_e)
        ev, ee = QueryEngine(out_v), QueryEngine(out_e)
        for q in ["waaa", "waaa wbaa", "waaa + wbab", "wa* - wbaa", "(waaa + wbaa) ^ wcaa"]:
            iv, sv = ev.search(q, k=50)
            ie, se = ee.search(q, k=50)
            assert iv.tolist() == ie.tolist(), q
            np.testing.assert_allclose(sv, se)


class TestPayloadDedup:
    """payload_dedup=True (the reference's setDeduplication analog):
    identical posting payloads stored once per partition, resolved
    transparently by every read path, byte-identical rebuilds."""

    def test_dedup_parity_and_identity(self, ray_session, tmp_path):
        import hashlib
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.index.check import check_index
        from oscar_ray.index.reader import IndexReader
        from oscar_ray.query.engine import QueryEngine

        src = str(tmp_path / "src")
        os.makedirs(src)
        # several terms always co-occur with identical tf/doclen ->
        # identical payloads across terms within the partition
        n = 200
        pq.write_table(
            pa.table(
                {
                    "url": [f"u{i}" for i in range(n)],
                    "text": [f"alpha beta gamma doc{i % 7}" for i in range(n)],
                }
            ),
            os.path.join(src, "p.parquet"),
        )
        base = dict(num_partitions=1, block_span_bits=4, lang_column=None)
        out_plain = str(tmp_path / "plain")
        out_a = str(tmp_path / "dedup_a")
        out_b = str(tmp_path / "dedup_b")
        build_index(src, out_plain, IndexBuildConfig(**base))
        build_index(src, out_a, IndexBuildConfig(payload_dedup=True, **base))
        build_index(src, out_b, IndexBuildConfig(payload_dedup=True, **base))

        m = json.load(open(os.path.join(out_a, "manifest.json")))
        assert sum(p.get("payload_refs", 0) for p in m["partitions"] if p) > 0
        check_index(out_a)  # includes the C8 ref-consistency checks

        # decode parity over the whole dictionary, lazy AND preloaded
        ra = IndexReader(out_plain)
        rb = IndexReader(out_a)
        rp = IndexReader(out_a)
        rp.preload()
        for term in sorted(ra._part_dict(0)):
            want = ra.postings(term).decode_all()
            for r in (rb, rp):
                got = r.postings(term).decode_all()
                for x, y in zip(want, got):
                    np.testing.assert_array_equal(x, y)

        # query parity
        ea, eb = QueryEngine(out_plain), QueryEngine(out_a)
        for q in ["alpha", "alpha beta", "doc1 + doc2", "alpha - doc3", "d*"]:
            ia, sa = ea.search(q, k=50)
            ib, sb = eb.search(q, k=50)
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_allclose(sa, sb)

        # rebuild identity with the flag on
        def dirhash(d):
            h = hashlib.sha256()
            pdir = os.path.join(d, "postings")
            for fn in sorted(os.listdir(pdir)):
                h.update(open(os.path.join(pdir, fn), "rb").read())
            return h.hexdigest()

        assert dirhash(out_a) == dirhash(out_b)

        # segment merge resolves refs: merging dedup sources writes the
        # same postings bytes as merging their plain twins
        from oscar_ray.index.merge import merge_indexes

        mp = str(tmp_path / "merged_plain")
        md = str(tmp_path / "merged_dedup")
        merge_indexes([out_plain, out_plain], mp)
        merge_indexes([out_a, out_b], md)
        assert dirhash(mp) == dirhash(md)


class TestConfigFuzz:
    """Random config combinations (partitions x span x codec x fields x
    suffixes x dedup) all build, pass the structural checkers, and answer
    queries identically in pruned and exhaustive mode."""

    def test_random_configs(self, ray_session, pages_t1, tmp_path):
        import numpy as np

        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.index.check import check_index
        from oscar_ray.query.engine import QueryEngine

        rng = np.random.default_rng(23)
        for trial in range(6):
            cfg = IndexBuildConfig(
                num_partitions=int(rng.integers(1, 12)),
                block_span_bits=int(rng.integers(4, 14)),
                shard_fragments=int(rng.integers(1, 5)),
                docid_codec=["varint", "rlede", "eliasfano", "wah"][int(rng.integers(0, 4))],
                field_columns=[None, ["lang"]][int(rng.integers(0, 2))],
                index_suffixes=bool(rng.integers(0, 2)),
                dedup_urls=bool(rng.integers(0, 2)),
                payload_dedup=bool(rng.integers(0, 2)),
            )
            out = str(tmp_path / f"fuzz{trial}")
            build_index(pages_t1, out, cfg)
            check_index(out, sample_blocks=50)
            eng = QueryEngine(out)
            queries = ["waaa", "waaa + wbab", "waaa - wbaa", "(waaa wbaa) ^ wcaa"]
            if cfg.field_columns:
                queries.append("waaa @lang:en")
            if cfg.index_suffixes:
                queries.append("*aaa*")
            for q in queries:
                a_ids, a_sc = eng.search(q, k=30, mode="auto")
                b_ids, b_sc = eng.search(q, k=30, mode="exhaustive")
                assert a_ids.tolist() == b_ids.tolist(), (trial, q)
                np.testing.assert_allclose(a_sc, b_sc)


class TestKillResumeCli:
    """True fault injection on the CLI build: SIGKILL the oscar_create
    subprocess at an arbitrary point mid-build, then resume (the default)
    — artifacts must be byte-identical to an uninterrupted build. The
    per-partition atomic markers make any kill point safe (FIXTURES §4.4
    extends the constructed-partial-state resume tests with a real kill)."""

    def test_sigkill_mid_build_then_resume_identical(self, pages_t1, tmp_path):
        import glob
        import signal
        import subprocess
        import sys as _sys
        import time

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        clean_dir = str(tmp_path / "clean")
        kill_dir = str(tmp_path / "killed")
        argv = [
            _sys.executable,
            "scripts/oscar_create.py",
            "-i",
            pages_t1,
            "--num-cpus",
            "4",
            "--partitions",
            "8",
            "--block-span-bits",
            "8",
        ]
        subprocess.run(
            argv + ["-o", clean_dir], cwd=repo, capture_output=True, timeout=300, check=True
        )
        proc = subprocess.Popen(
            argv + ["-o", kill_dir], cwd=repo,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        # kill as soon as the build has written SOMETHING (arbitrary point)
        deadline = time.time() + 240
        while time.time() < deadline and proc.poll() is None:
            if glob.glob(os.path.join(kill_dir, "**", "*"), recursive=True):
                break
            time.sleep(0.05)
        if proc.poll() is None:
            time.sleep(0.5)  # let it get somewhere nondeterministic
            proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
        # resume (default behavior) must complete and match the clean build
        subprocess.run(
            argv + ["-o", kill_dir], cwd=repo, capture_output=True, timeout=300, check=True
        )
        ha = _artifact_hashes(clean_dir)
        hb = _artifact_hashes(kill_dir)
        assert ha == hb and len(ha) > 0


class TestCanonicalUrlDedup:
    def _pages(self, path):
        import pyarrow as pa

        # three urls that canonicalize to ONE resource + one distinct
        rows = [
            {"url": "HTTP://A.com:80/x?b=1&a=1#f", "text": "alpha beta"},
            {"url": "http://a.com/x?a=1&b=1", "text": "alpha gamma"},
            {"url": "http://a.com/x?b=1&a=1&utm_source=z", "text": "alpha delta"},
            {"url": "http://b.com/y", "text": "alpha epsilon"},
        ]
        pq.write_table(pa.Table.from_pylist(rows), path)

    def test_variants_collapse_to_one_live_doc(self, ray_session, tmp_path):
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.query.engine import QueryEngine

        src = tmp_path / "pages.parquet"
        self._pages(str(src))
        kw = dict(
            num_partitions=2, block_span_bits=10, shard_fragments=1,
            lang_column=None,
        )
        m = build_index(
            str(src), str(tmp_path / "idx_canon"),
            IndexBuildConfig(canonical_url_dedup=True, **kw),
        )
        assert m["stats"]["n_duplicates"] == 2  # docids 1, 2 tombstoned
        eng = QueryEngine(str(tmp_path / "idx_canon"))
        ids, _ = eng.search("alpha", k=10)
        assert sorted(ids) == [0, 3]
        # raw-string dedup keeps all four (urls differ byte-wise)
        m2 = build_index(
            str(src), str(tmp_path / "idx_raw"), IndexBuildConfig(**kw)
        )
        assert m2["stats"]["n_duplicates"] == 0
        eng2 = QueryEngine(str(tmp_path / "idx_raw"))
        ids2, _ = eng2.search("alpha", k=10)
        assert sorted(ids2) == [0, 1, 2, 3]
