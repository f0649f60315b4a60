"""Query-result facets / hydration (kvstats + item-dump analogs) vs a
brute-force pandas oracle over the sf0.001 documents table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
QUERY = "hash join"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def matched(ray_session):
    from oscar_ray.pipelines.facets import _matched_ids

    return _matched_ids(SF, QUERY)


def _oracle_matched(docs_df: pd.DataFrame) -> np.ndarray:
    from oscar_ray.spec.tokenizer import tokenize_text

    out = []
    for did, text in zip(docs_df["doc_id"], docs_df["text"]):
        toks = set(tokenize_text(text or ""))
        if "hash" in toks and "join" in toks:
            out.append(did)
    return np.sort(np.array(out, dtype=np.int64))


def test_matched_ids_vs_oracle(matched, docs_df):
    np.testing.assert_array_equal(matched, _oracle_matched(docs_df))


@pytest.mark.parametrize("num_tasks", [1, 3, 8])
def test_matched_id_plan_equals_full_set(ray_session, matched, num_tasks):
    """The distributed per-block-range match plan unions to exactly the
    driver-side full match set, for any task count; ranges are disjoint
    and each ref's ids lie inside its advertised range."""
    import ray

    from oscar_ray.pipelines.facets import matched_id_plan
    from oscar_ray.pipelines.search import documents_index_dir

    idx = documents_index_dir(SF)
    plan = matched_id_plan(idx, QUERY, num_tasks=num_tasks)
    parts = []
    for lo, hi, ref in plan:
        ids = ray.get(ref)
        if len(ids):
            assert ids.min() >= lo and ids.max() < hi
            assert (np.diff(ids) > 0).all()
            parts.append(ids)
    got = np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    np.testing.assert_array_equal(got, matched)


def test_shannon_topkv_ranking_and_exclusions(ray_session, matched, docs_df):
    """topKeyValues: ranked by |n - floor(threshold*|matched|)| asc; key
    exclusions (verbatim + `prefix?` form) and key-value exclusions drop
    rows before ranking (Workfunctions.cpp:194-231 semantics)."""
    from oscar_ray.pipelines.facets import shannon_top_keyvalues

    sub = docs_df[docs_df["doc_id"].isin(matched)]
    total = len(sub)
    split = int(0.5 * total)

    got = shannon_top_keyvalues(SF, QUERY, facet_cols=("lang", "source")).to_pandas()
    # ranking: splitdist ascending, counts correct
    assert (got["splitdist"].to_numpy() == np.abs(got["n"].to_numpy() - split)).all()
    assert (np.diff(got["splitdist"].to_numpy()) >= 0).all()
    for _, r in got.iterrows():
        assert (sub[r["facet"]] == r["value"]).sum() == r["n"]
        assert r["pct"] == (100 * r["n"]) // total

    # verbatim key exclusion drops the whole facet
    got_ex = shannon_top_keyvalues(
        SF, QUERY, facet_cols=("lang", "source"), key_exclusions=("lang",)
    ).to_pandas()
    assert set(got_ex["facet"]) == {"source"}

    # prefix? form: "sour?" excludes source
    got_pre = shannon_top_keyvalues(
        SF, QUERY, facet_cols=("lang", "source"), key_exclusions=("sour?",)
    ).to_pandas()
    assert set(got_pre["facet"]) == {"lang"}

    # key-value exclusion drops exactly that pair
    kv = (got.iloc[0]["facet"], got.iloc[0]["value"])
    got_kv = shannon_top_keyvalues(
        SF, QUERY, facet_cols=("lang", "source"), keyvalue_exclusions=(kv,)
    ).to_pandas()
    assert not ((got_kv["facet"] == kv[0]) & (got_kv["value"] == kv[1])).any()


def test_matched_id_plan_covers_tombstone_holes(ray_session, tmp_path):
    """Docids run over the docid SPACE (total_docs), not the live-doc
    count: with URL dedup tombstoning 25% of docs, live docids reach
    beyond n_docs-1 and the plan must still cover them (regression:
    blocks past n_docs were assigned to no task and silently dropped)."""
    import os

    import pyarrow as pa

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines.facets import matched_id_plan
    from oscar_ray.query.engine import QueryEngine

    src = str(tmp_path / "src")
    os.makedirs(src)
    n = 64
    # every 4th row duplicates row 0's url+text -> tombstoned, leaving
    # docid holes; live docids still span [0, 64)
    urls = [("u0" if i % 4 == 3 and i > 0 else f"u{i}") for i in range(n)]
    texts = [("common zero" if u == "u0" else f"common word{i}") for i, u in enumerate(urls)]
    pq.write_table(
        pa.table({"url": urls, "text": texts}), os.path.join(src, "p.parquet")
    )
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        IndexBuildConfig(
            num_partitions=2, block_span_bits=4, lang_column=None, dedup_urls=True
        ),
    )
    eng = QueryEngine(idx)
    want_ids, _ = eng.search("common", k=1 << 30)
    want = np.sort(want_ids.astype(np.int64))
    assert want.max() > len(want)  # holes exist: ids exceed live count
    import ray

    plan = matched_id_plan(idx, "common", num_tasks=4)
    got = np.sort(
        np.concatenate([ray.get(r) for _lo, _hi, r in plan] or [np.empty(0, np.int64)])
    )
    np.testing.assert_array_equal(got, want)


def test_facet_counter_fetches_only_overlapping_ranges(ray_session, tmp_path):
    """A counter batch confined to one docid range must not fetch refs
    for other ranges (the no-corpus-sized-actor-state property). Built
    with tiny blocks so the docid space spans many ranges."""
    import os

    import pyarrow as pa

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines.facets import _FacetCounter, matched_id_plan

    src = str(tmp_path / "src")
    os.makedirs(src)
    n = 64
    pq.write_table(
        pa.table(
            {
                "url": [f"u{i}" for i in range(n)],
                "text": ["common word"] * n,
            }
        ),
        os.path.join(src, "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        IndexBuildConfig(num_partitions=2, block_span_bits=4, lang_column=None),
    )
    plan = matched_id_plan(idx, "common", num_tasks=4)
    assert len(plan) == 4
    counter = _FacetCounter(plan, facet_cols=["lang"])
    lo0, hi0, _ = counter.plan[0]
    batch_ids = np.arange(lo0, min(hi0, lo0 + 5), dtype=np.int64)
    out = counter(
        pa.table(
            {
                "doc_id": pa.array(batch_ids, type=pa.int64()),
                "lang": pa.array(["en"] * len(batch_ids)),
            }
        )
    )
    # only range 0 fetched; and every probe doc matched ("common" is in all)
    assert set(counter._cache.keys()) == {0}
    assert out["n"].to_pylist() == [len(batch_ids)]


def test_search_facets_counts(ray_session, matched, docs_df):
    from oscar_ray.pipelines.facets import search_facets

    got = search_facets(SF, QUERY, facet_cols=("lang", "source"), topk=10).to_pandas()
    sub = docs_df[docs_df["doc_id"].isin(matched)]
    for facet in ("lang", "source"):
        want = sub[facet].value_counts()
        g = got[got["facet"] == facet].set_index("value")["n"]
        assert len(g) == min(10, len(want))
        for v, n in g.items():
            assert want[v] == n
        # top-k by (n desc, value asc): every excluded value has count <=
        # the smallest included count
        if len(want) > len(g):
            assert want[~want.index.isin(g.index)].max() <= g.min()


def test_shannon_facets_and_exclusion(ray_session, matched, docs_df):
    from oscar_ray.pipelines.facets import search_shannon_facets

    got = search_shannon_facets(SF, QUERY, facet_cols=("lang", "source")).to_pandas()
    assert list(got["facet"]) == ["lang", "source"]
    sub = docs_df[docs_df["doc_id"].isin(matched)]
    for _, row in got.iterrows():
        n = sub[row["facet"]].value_counts().to_numpy().astype(float)
        p = n / n.sum()
        assert row["n_values"] == len(n)
        assert abs(row["entropy"] - round(float(-(p * np.log(p)).sum()), 6)) < 1e-9

    only_lang = search_shannon_facets(
        SF, QUERY, facet_cols=("lang", "source"), exclude=("source",)
    ).to_pandas()
    assert list(only_lang["facet"]) == ["lang"]


def test_hydrate_results(ray_session, docs_df):
    from oscar_ray.pipelines.facets import hydrate_results
    from oscar_ray.pipelines.search import bm25_scores_table, documents_index_dir
    from oscar_ray.query.engine import QueryEngine

    got = hydrate_results(SF, "merge", k=5).to_pandas()
    idx = documents_index_dir(SF)
    ids, scores = QueryEngine(idx).search("merge", k=5)
    assert sorted(got["doc_id"]) == sorted(ids.tolist())
    by_id = docs_df.set_index("doc_id")
    for _, r in got.iterrows():
        assert r["lang"] == by_id.loc[r["doc_id"], "lang"]
        assert r["source"] == by_id.loc[r["doc_id"], "source"]
        assert r["n_chars"] == by_id.loc[r["doc_id"], "n_chars"]
    score_of = dict(zip(ids.tolist(), np.round(scores, 4).tolist()))
    for _, r in got.iterrows():
        assert abs(r["score"] - score_of[r["doc_id"]]) < 1e-9


def test_kvstats_from_index_matches_search_facets(ray_session):
    from oscar_ray.pipelines.facets import kvstats_from_index, search_facets
    from oscar_ray.pipelines.search import documents_index_dir

    idx = documents_index_dir(SF)
    a = kvstats_from_index(idx, QUERY, keys=["lang"], topk=10).to_pandas()
    b = search_facets(SF, QUERY, facet_cols=("lang",), topk=10).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_docmeta_lookup(ray_session):
    from oscar_ray.pipelines.facets import docmeta_lookup
    from oscar_ray.pipelines.search import documents_index_dir

    idx = documents_index_dir(SF)
    t = docmeta_lookup(idx, np.array([3, 7, 11], dtype=np.int64))
    assert t["docid"].to_pylist() == [3, 7, 11]
    assert "doclen" in t.column_names


def test_hybrid_rrf_fusion_semantics(ray_session):
    """RRF fusion: rrf = 1/(c+lex_rank) + 1/(c+vec_rank) with absent
    ranks contributing 0; depth caps both lists; output sorted by
    (rrf desc, item_id asc)."""
    import pyarrow.parquet as pq

    from oscar_ray.pipelines.search import documents_index_dir, hybrid_search_rrf
    from oscar_ray.query.engine import QueryEngine

    qv = np.array(
        pq.read_table(f"{SF}/embeddings.parquet").sort_by("vec_id")["embedding"][0].as_py(),
        dtype=np.float64,
    )
    got = hybrid_search_rrf(SF, "merge", qv, k=10, depth=50, rrf_c=60).to_pandas()
    assert len(got) == 10
    # recompute rrf from the reported ranks and check micro + ordering
    lex, vec = got["lex_rank"].to_numpy(), got["vec_rank"].to_numpy()
    rrf = np.where(lex > 0, 1.0 / (60 + lex), 0.0) + np.where(vec > 0, 1.0 / (60 + vec), 0.0)
    assert (np.floor(rrf * 1e6).astype(np.int64) == got["rrf_micro"].to_numpy()).all()
    assert (np.diff(rrf) <= 1e-18).all()  # non-increasing
    assert (lex <= 50).all() and (vec <= 50).all()  # depth cap
    # lexical ranks agree with the engine's own ordering
    idx = documents_index_dir(SF)
    ids, _ = QueryEngine(idx).search("merge", k=50)
    lex_map = {int(d): r + 1 for r, d in enumerate(ids)}
    for iid, lr in zip(got["item_id"], lex, strict=True):
        assert lex_map.get(int(iid), 0) == int(lr)


def test_task_engine_cache_invalidates_on_rebuild(ray_session, tmp_path):
    """_matched_range_task reuses a worker-process QueryEngine keyed on
    the manifest mtime: an in-place index replacement must not serve
    match sets (and thus kvstats counts) from the stale engine."""
    import shutil

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines.facets import kvstats_from_index
    from oscar_ray.sources.synth import write_pages

    pages_a = str(tmp_path / "pages_a")
    pages_b = str(tmp_path / "pages_b")
    write_pages(pages_a, n_rows=400, n_files=2, seed=3)
    write_pages(pages_b, n_rows=200, n_files=2, seed=11)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_partitions=4, block_span_bits=8, shard_fragments=2)

    build_index(pages_a, idx, cfg)
    # warm every worker's engine cache for this index: several queries
    # so the range tasks land on all workers
    for q in ("waaa", "wbaa", "wcaa"):
        kvstats_from_index(idx, q, keys=["lang"])

    shutil.rmtree(idx)
    build_index(pages_b, idx, cfg)
    got = kvstats_from_index(idx, "waaa", keys=["lang"]).to_pandas()
    # ground truth: a fresh driver-side engine over the NEW index (no
    # worker cache involved); every doc carries a lang value, so the
    # facet total equals the match count
    from oscar_ray.query.engine import QueryEngine

    ids, _ = QueryEngine(idx).search("waaa", k=1 << 40)
    assert int(got["n"].sum()) == len(ids) <= 200
