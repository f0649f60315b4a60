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
