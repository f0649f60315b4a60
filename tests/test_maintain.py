"""Incremental maintenance tests: base+delta update == from-scratch union.

The store-dir/search-dir reuse loop (oscarcreate.cpp:82-116 analog):
indexing only the NEW docs and updating must be indistinguishable from
rebuilding everything — byte-identical postings/dict artifacts, equal
stats and tombstone lineage — including with payload_dedup and with
urls that collide across segments. keep_last flips collisions into doc
REPLACEMENT (the delta's version wins).
"""

from __future__ import annotations

import filecmp
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.index.check import check_index
from oscar_ray.index.maintain import update_index
from oscar_ray.query.engine import QueryEngine
from oscar_ray.sources.synth import generate_pages_batch

SPAN_BITS = 8
A_ROWS, B_ROWS = 512, 300  # base span 512 = 2 * 256 -> block-aligned


def _write_rows(tbl, path, rows_per_group):
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path, row_group_size=rows_per_group)


def _union_tables(root):
    """Base slice + delta slice of one deterministic pages table, with
    the delta's LAST row turned into a same-url/different-text REPLACEMENT
    of a base row (on top of the generator's organic ~2% url dups)."""
    whole = generate_pages_batch(0, A_ROWS + B_ROWS, seed=42)
    base = whole.slice(0, A_ROWS)
    delta = whole.slice(A_ROWS, B_ROWS)
    urls = delta["url"].to_pylist()
    texts = delta["text"].to_pylist()
    urls[-1] = base["url"][3].as_py()
    texts[-1] = "zzreplacement fresh tokens only here"
    delta = (
        delta.set_column(
            delta.schema.get_field_index("url"), "url", pa.array(urls)
        ).set_column(
            delta.schema.get_field_index("text"), "text", pa.array(texts)
        )
    )
    return base, delta


def _dir_bytes(d):
    out = {}
    for sub in ("postings", "dict"):
        p = os.path.join(d, sub)
        for f in sorted(os.listdir(p)):
            with open(os.path.join(p, f), "rb") as fh:
                out[f"{sub}/{f}"] = fh.read()
    return out


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "payload_dedup"])
def maintained(request, ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp(f"maint_{request.param}")
    base_t, delta_t = _union_tables(root)
    _write_rows(base_t, str(root / "segA" / "p.parquet"), 256)
    _write_rows(delta_t, str(root / "segB" / "p.parquet"), 150)
    # union dir: same bytes, same fragmentation -> same docids as merge
    _write_rows(base_t, str(root / "all" / "p0.parquet"), 256)
    _write_rows(delta_t, str(root / "all" / "p1.parquet"), 150)

    cfg = IndexBuildConfig(
        num_partitions=4,
        block_span_bits=SPAN_BITS,
        shard_fragments=2,
        payload_dedup=request.param,
    )
    base_idx = str(root / "ibase")
    build_index(str(root / "segA"), base_idx, cfg)
    updated = str(root / "iupd")
    update_index(base_idx, str(root / "segB"), updated)
    scratch = str(root / "iscr")
    build_index(str(root / "all"), scratch, cfg)
    return updated, scratch


class TestKeepFirstEqualsScratch:
    def test_artifacts_byte_identical(self, maintained):
        updated, scratch = maintained
        ub, sb = _dir_bytes(updated), _dir_bytes(scratch)
        assert ub.keys() == sb.keys()
        for k in ub:
            assert ub[k] == sb[k], f"artifact differs: {k}"

    def test_stats_and_tombstones_equal(self, maintained):
        import pyarrow.parquet as pq

        updated, scratch = maintained
        mu = json.load(open(os.path.join(updated, "manifest.json")))
        ms = json.load(open(os.path.join(scratch, "manifest.json")))
        for key in ("n_docs", "total_docs", "sum_doclen", "n_duplicates", "max_docid"):
            assert mu["stats"][key] == ms["stats"][key], key
        assert abs(mu["stats"]["avgdl"] - ms["stats"]["avgdl"]) < 1e-12
        tu = pq.read_table(os.path.join(updated, "tombstones.parquet"))
        ts = pq.read_table(os.path.join(scratch, "tombstones.parquet"))
        assert tu["docid"].to_pylist() == ts["docid"].to_pylist()

    def test_checker_and_queries(self, maintained):
        updated, scratch = maintained
        check_index(updated)
        eu, es = QueryEngine(updated), QueryEngine(scratch)
        rng = np.random.default_rng(5)
        terms = ["waaa", "wbaa", "wab", "wbab", "zzreplacement"]
        for _ in range(15):
            a, b = terms[rng.integers(0, 5)], terms[rng.integers(0, 5)]
            q = f"{a} {'+-^ '[rng.integers(0, 4)]} {b}".replace("  ", " ")
            iu, isc = eu.search(q, k=50), es.search(q, k=50)
            assert iu[0].tolist() == isc[0].tolist(), q
            np.testing.assert_allclose(iu[1], isc[1], rtol=1e-12, atol=0, err_msg=q)


class TestKeepLastReplacement:
    def test_delta_version_wins(self, ray_session, tmp_path):
        root = tmp_path
        base_t, delta_t = _union_tables(root)
        _write_rows(base_t, str(root / "segA" / "p.parquet"), 256)
        _write_rows(delta_t, str(root / "segB" / "p.parquet"), 150)
        cfg = IndexBuildConfig(
            num_partitions=4, block_span_bits=SPAN_BITS, shard_fragments=2
        )
        base_idx = str(root / "ibase")
        build_index(str(root / "segA"), base_idx, cfg)

        # the base's doc 3 text is still queryable before the update
        base_eng = QueryEngine(base_idx)
        old_tokens = [
            t for t in base_t["text"][3].as_py().split() if len(t) > 2
        ]
        probe = old_tokens[0]
        ids_before, _ = base_eng.search(probe, k=1000)
        assert 3 in ids_before.tolist()

        updated = str(root / "iupd_last")
        m = update_index(base_idx, str(root / "segB"), updated, policy="keep_last")
        assert m["maintained"]["policy"] == "keep_last"
        check_index(updated)
        eng = QueryEngine(updated)

        # docid 3 (old copy of the replaced url) must be GONE from every
        # posting; the replacement text must resolve to the delta docid
        ids, _ = eng.search(probe, k=1000)
        assert 3 not in ids.tolist()
        new_ids, _ = eng.search("zzreplacement", k=10)
        assert len(new_ids) == 1 and int(new_ids[0]) >= 512

        # n_docs: one live doc per distinct url
        mu = json.load(open(os.path.join(updated, "manifest.json")))
        n_urls = len(set(base_t["url"].to_pylist() + delta_t["url"].to_pylist()))
        assert mu["stats"]["n_docs"] == n_urls


class TestChurnFederationWithPositions:
    """The composed loop: maintain (keep_last replacements, tombstone
    respill) x segmented federation x positional sidecar, over TWO
    cycles. The federation [maintained_seg1, seg2] must stay rank- AND
    score-identical to the compacted merge of the same segments, and
    phrase/proximity queries must keep working after each maintain
    (the respill path must carry the sidecar)."""

    QUERIES = [
        "waaa",
        "waaa wbaa",
        "waaa + wbab*",
        "zzreplacement",
    ]

    def _phrase_probe(self, tbl):
        """First two >2-char tokens of a LIVE doc -> a phrase query."""
        for row in range(tbl.num_rows):
            toks = [t for t in (tbl["text"][row].as_py() or "").split() if len(t) > 2]
            if len(toks) >= 2:
                return f'"{toks[0].lower()} {toks[1].lower()}"'
        raise AssertionError("no phrase probe found")

    def test_two_cycles(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from oscar_ray.index.merge import merge_indexes
        from oscar_ray.index.segmented import SegmentedReader

        root = tmp_path
        whole = generate_pages_batch(0, A_ROWS + 2 * B_ROWS, seed=42)
        base_t = whole.slice(0, A_ROWS)
        d1 = whole.slice(A_ROWS, B_ROWS)
        d2 = whole.slice(A_ROWS + B_ROWS, B_ROWS)

        def replace_last(delta, repl_url, text):
            urls = delta["url"].to_pylist()
            texts = delta["text"].to_pylist()
            urls[-1] = repl_url
            texts[-1] = text
            return delta.set_column(
                delta.schema.get_field_index("url"), "url", pa.array(urls)
            ).set_column(
                delta.schema.get_field_index("text"), "text", pa.array(texts)
            )

        # cycle-1 delta replaces a BASE url; cycle-2 delta replaces a
        # CYCLE-1 url (replacement-of-a-replacement)
        d1 = replace_last(d1, base_t["url"][3].as_py(),
                          "zzreplacement fresh tokens only here")
        d2 = replace_last(d2, d1["url"][5].as_py(),
                          "zzreplacement second cycle tokens")

        _write_rows(base_t, str(root / "segA" / "p.parquet"), 256)
        _write_rows(d1, str(root / "d1" / "p.parquet"), 150)
        _write_rows(d2, str(root / "d2" / "p.parquet"), 150)

        cfg = IndexBuildConfig(
            num_partitions=4,
            block_span_bits=SPAN_BITS,
            shard_fragments=2,
            index_positions=True,
        )
        base_idx = str(root / "ibase")
        build_index(str(root / "segA"), base_idx, cfg)

        # --- cycle 1: maintain with a keep_last replacement ------------
        upd1 = str(root / "iupd1")
        m1 = update_index(base_idx, str(root / "d1"), upd1, policy="keep_last")
        assert m1["maintained"]["policy"] == "keep_last"
        check_index(upd1)
        e1 = QueryEngine(upd1)
        # positional sidecar must survive the tombstone respill
        phrase = self._phrase_probe(d1)
        ids_p, _ = e1.search(phrase, k=100)
        assert len(ids_p) >= 1
        ids_r, _ = e1.search("zzreplacement", k=10)
        assert len(ids_r) == 1 and int(ids_r[0]) >= A_ROWS

        # --- a second independently built segment ----------------------
        seg2_rows = generate_pages_batch(7, 256, seed=99)
        _write_rows(seg2_rows, str(root / "seg2" / "p.parquet"), 256)
        seg2 = str(root / "iseg2")
        build_index(str(root / "seg2"), seg2, cfg)

        def compare(seg_dirs, merged_dir, probe_tbls):
            fed = SegmentedReader(seg_dirs)
            assert fed.has_positions
            ef = QueryEngine(merged_dir, reader=fed)
            em = QueryEngine(merged_dir)
            queries = list(self.QUERIES) + [self._phrase_probe(t) for t in probe_tbls]
            for q in queries:
                fi, fs = ef.search(q, k=50)
                mi, ms = em.search(q, k=50)
                np.testing.assert_array_equal(fi, mi, err_msg=q)
                np.testing.assert_allclose(fs, ms, atol=1e-9, err_msg=q)

        merged1 = str(root / "imerged1")
        merge_indexes([upd1, seg2], merged1)
        compare([upd1, seg2], merged1, [base_t, d1, seg2_rows])

        # --- cycle 2: maintain AGAIN on the already-maintained index ---
        upd2 = str(root / "iupd2")
        m2 = update_index(upd1, str(root / "d2"), upd2, policy="keep_last")
        assert m2["maintained"]["policy"] == "keep_last"
        check_index(upd2)
        e2 = QueryEngine(upd2)
        ids2, _ = e2.search('"second cycle"', k=10)
        assert len(ids2) == 1  # the cycle-2 replacement, phrase-findable
        # cycle-1 replaced doc's OLD copy stays gone; its replacement and
        # the cycle-2 replacement are both live under the keep_last rule
        live, _ = e2.search("zzreplacement", k=10)
        assert len(live) == 2

        merged2 = str(root / "imerged2")
        merge_indexes([upd2, seg2], merged2)
        compare([upd2, seg2], merged2, [base_t, d1, d2, seg2_rows])


class TestPositionsPlusSuffixes:
    """Maintenance on an index built with BOTH the positional sidecar and
    the suffix marker namespace (the soak_differential.py combo): marker
    rows carry empty position payloads with nonzero tfs, and the respill
    must re-emit them as empty per-pair payloads instead of decoding."""

    def test_update_equals_scratch(self, ray_session, tmp_path):
        root = tmp_path
        base_t, delta_t = _union_tables(root)
        _write_rows(base_t, str(root / "segA" / "p.parquet"), 256)
        _write_rows(delta_t, str(root / "segB" / "p.parquet"), 150)
        _write_rows(base_t, str(root / "all" / "p0.parquet"), 256)
        _write_rows(delta_t, str(root / "all" / "p1.parquet"), 150)
        cfg = IndexBuildConfig(
            num_partitions=4,
            block_span_bits=SPAN_BITS,
            shard_fragments=2,
            index_positions=True,
            index_suffixes=True,
        )
        base_idx = str(root / "ibase")
        build_index(str(root / "segA"), base_idx, cfg)
        updated = str(root / "iupd")
        # regression: this raised ValueError("positions payload has 0
        # values, ...") from the marker rows before the respill fix
        update_index(base_idx, str(root / "segB"), updated)
        check_index(updated)
        scratch = str(root / "iscr")
        build_index(str(root / "all"), scratch, cfg)
        assert _dir_bytes(updated) == _dir_bytes(scratch)

        e = QueryEngine(updated)
        # positional sidecar still works after maintenance
        toks = [
            t
            for t in (delta_t["text"][0].as_py() or "").split()
            if len(t) > 2
        ]
        ids_p, _ = e.search(f'"{toks[0].lower()} {toks[1].lower()}"', k=100)
        assert len(ids_p) >= 1
        # suffix namespace still works (substring query on a delta token)
        probe = next(t.lower() for t in toks if len(t) >= 4)
        ids_s, _ = e.search(f"*{probe[1:-1]}*", k=500)
        assert len(ids_s) >= 1
