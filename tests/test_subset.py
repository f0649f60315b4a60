"""Hierarchical drill-down tree (the GeoHierarchy subSet analog,
``oscar-cmd/LiveCompleter.cpp:222-224``) vs a brute-force pandas oracle
over the index's own docmeta urls."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

def _head_term(index_dir: str) -> str:
    """Highest-df dictionary term -> a wide match set over pages_t1."""
    import os

    import pyarrow.parquet as pq

    from oscar_ray.index.layout import dict_path
    from oscar_ray.index.reader import IndexReader

    best, best_df = None, -1
    for p in range(IndexReader(index_dir).num_partitions):
        path = dict_path(index_dir, p)
        if os.path.exists(path):
            t = pq.read_table(path, columns=["term", "df"])
            i = int(np.argmax(t["df"].to_numpy()))
            if t["df"][i].as_py() > best_df:
                best, best_df = t["term"][i].as_py(), t["df"][i].as_py()
    assert best is not None
    return best


def test_public_suffixes_kernel():
    from oscar_ray.pipelines.subset import public_suffixes

    got = public_suffixes(
        pa.array(["example.co.uk", "example.com", "localhost", "a.b.c.org"])
    ).to_pylist()
    assert got == ["co.uk", "com", "localhost", "b.c.org"]


@pytest.fixture(scope="module")
def tree_and_oracle(ray_session, built_index_t1):
    """Run subset_tree_from_index and a pandas oracle over the same
    docmeta + match set."""
    import ray

    from oscar_ray.index.layout import docmeta_files
    from oscar_ray.pipelines.facets import matched_id_plan
    from oscar_ray.pipelines.subset import subset_tree_from_index
    from oscar_ray.stages.urls import registered_domains, url_hosts

    index_dir, _ = built_index_t1
    query = _head_term(index_dir)
    tree = subset_tree_from_index(index_dir, query, num_match_tasks=5).to_pandas()

    # oracle: full match set (union of plan refs) + pandas rollup
    import pyarrow.parquet as pq

    plan = matched_id_plan(index_dir, query, num_tasks=3)
    matched = np.sort(np.concatenate([ray.get(r) for _, _, r in plan]))
    meta = pa.concat_tables(
        pq.read_table(f, columns=["docid", "url"]) for f in docmeta_files(index_dir)
    )
    mdf = meta.to_pandas()
    mdf = mdf[mdf["docid"].isin(matched)]
    host = url_hosts(pa.array(mdf["url"], type=pa.string())).to_pylist()
    dom = registered_domains(pa.array(host, type=pa.string())).to_pylist()
    odf = pd.DataFrame({"host": host, "domain": dom}).dropna()
    odf["suffix"] = odf["domain"].str.replace(r"^[^.]+\.", "", n=1, regex=True)
    return tree, odf, len(matched)


def test_level_sums_equal_match_count(tree_and_oracle):
    tree, odf, n_matched = tree_and_oracle
    assert n_matched > 0
    for level in (1, 2, 3):
        assert tree[tree["level"] == level]["n"].sum() == len(odf)
    assert len(odf) <= n_matched  # unparseable urls may drop


def test_tree_matches_pandas_rollup(tree_and_oracle):
    tree, odf, _ = tree_and_oracle
    want1 = odf.groupby("suffix").size()
    got1 = tree[tree["level"] == 1].set_index("node")["n"]
    assert got1.sort_index().to_dict() == want1.sort_index().to_dict()
    want2 = odf.groupby(["suffix", "domain"]).size()
    got2 = tree[tree["level"] == 2].set_index(["parent", "node"])["n"]
    assert got2.sort_index().to_dict() == want2.sort_index().to_dict()
    want3 = odf.groupby(["domain", "host"]).size()
    got3 = tree[tree["level"] == 3].set_index(["parent", "node"])["n"]
    assert got3.sort_index().to_dict() == want3.sort_index().to_dict()


def test_parents_exist(tree_and_oracle):
    tree, _, _ = tree_and_oracle
    l1 = set(tree[tree["level"] == 1]["node"])
    l2 = tree[tree["level"] == 2]
    assert set(l2["parent"]) <= l1
    l3 = tree[tree["level"] == 3]
    assert set(l3["parent"]) <= set(l2["node"])
    assert (tree["n"] > 0).all()


def test_pruned_is_topk_subset(ray_session, built_index_t1):
    from oscar_ray.pipelines.subset import subset_tree_from_index

    index_dir, _ = built_index_t1
    query = _head_term(index_dir)
    full = subset_tree_from_index(index_dir, query, num_match_tasks=5).to_pandas()
    k = 2
    pruned = subset_tree_from_index(
        index_dir, query, max_children=k, num_match_tasks=5
    ).to_pandas()
    fkeys = set(map(tuple, full[["level", "parent", "node", "n"]].to_numpy()))
    pkeys = set(map(tuple, pruned[["level", "parent", "node", "n"]].to_numpy()))
    assert pkeys <= fkeys
    # per parent: at most k children, and exactly the top-k by (n desc, node)
    for (level, parent), g in pruned.groupby(["level", "parent"]):
        assert len(g) <= k
        fg = full[(full["level"] == level) & (full["parent"] == parent)]
        if level == 1 or parent in set(pruned[pruned["level"] == level - 1]["node"]):
            want = (
                fg.sort_values(["n", "node"], ascending=[False, True])
                .head(k)["node"]
                .tolist()
            )
            assert sorted(g["node"]) == sorted(want)
    # descendants of pruned nodes are gone
    kept2 = set(pruned[pruned["level"] == 2]["node"])
    assert set(pruned[pruned["level"] == 3]["parent"]) <= kept2


def test_no_match_returns_empty(ray_session, built_index_t1):
    from oscar_ray.pipelines.subset import subset_tree_from_index

    index_dir, _ = built_index_t1
    t = subset_tree_from_index(index_dir, "zzzznotaterm", num_match_tasks=3)
    assert t.num_rows == 0
    assert t.column_names == ["level", "parent", "node", "n"]


def test_server_cache_invalidates_on_rebuild(ray_session, tmp_path):
    """The memory-resident subset servers are keyed on the manifest
    mtime: an in-place index replacement must drop the stale docmeta
    mapping, not serve counts for deleted docs."""
    import shutil

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines import subset as S
    from oscar_ray.sources.synth import write_pages

    pages_a = str(tmp_path / "pages_a")
    pages_b = str(tmp_path / "pages_b")
    write_pages(pages_a, n_rows=400, n_files=2, seed=1)
    write_pages(pages_b, n_rows=250, n_files=2, seed=9)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_partitions=4, block_span_bits=8, shard_fragments=2)

    build_index(pages_a, idx, cfg)
    q = _head_term(idx)
    from oscar_ray.pipelines.subset import subset_tree_from_index

    tree_a = subset_tree_from_index(idx, q).to_pandas()
    assert len(tree_a)

    # replace the index in place (the maintenance/compaction flow)
    shutil.rmtree(idx)
    build_index(pages_b, idx, cfg)
    q2 = _head_term(idx)
    tree_cached = subset_tree_from_index(idx, q2).to_pandas()
    # ground truth: force-forget the server pool and recompute
    S._SERVERS.clear()
    tree_fresh = subset_tree_from_index(idx, q2).to_pandas()
    pd.testing.assert_frame_equal(
        tree_cached.reset_index(drop=True), tree_fresh.reset_index(drop=True)
    )
    # the new corpus is smaller: totals must reflect pages_b, not pages_a
    assert tree_cached[tree_cached["level"] == 1]["n"].sum() <= 250
