"""Scale soak for the round-3 sketch/top-k rewrites (run manually, not CI):

1. topk: EXACT top-k frequent terms over the 2M-doc bench pages table —
   the vocabulary x block-count volume the round-2 driver-pandas combine
   was flagged for. Validates against a DuckDB full groupby on the same
   parquet AND asserts the DRIVER's peak RSS stays flat (the routed
   per-partition top-k means only P * k rows ever reach the driver).
2. sketches: CMS + HLL over the same table through the tree-reduce
   combine — driver receives O(1) rows; HLL estimate within 5% of the
   exact distinct count.

Usage: python scripts/soak_sketches.py [topk|sketches|all]
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pages_2m() -> str:
    import bench

    return bench._pages_dir("/root/testdata/sf0.1", 2_000_000, n_files=64)


def _driver_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def soak_topk(k: int = 50) -> dict:
    import duckdb
    import ray.data

    from oscar_ray.stages.sketches import topk_frequent_terms

    src = _pages_2m()
    rss_before = _driver_rss_mb()
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(src, columns=["text"])
    got = topk_frequent_terms(ds, k=k, concurrency=16, num_parts=32)
    secs = time.perf_counter() - t0
    rss_after = _driver_rss_mb()
    # structural flat-driver proof: the routed combine hands the driver
    # at most P * k rows, never vocabulary-sized state
    assert got.num_rows <= k

    t0 = time.perf_counter()
    # strip_accents ~ the spec tokenizer's NFD + strip-marks fold (the
    # bench pages table plants latin diacritics; sf tables are ascii)
    want = duckdb.sql(
        f"""
        SELECT t.term, count(*)::BIGINT AS cf
        FROM read_parquet('{src}/*.parquet'),
             unnest(regexp_split_to_array(lower(strip_accents(text)), '[^a-z0-9]+')) AS t(term)
        WHERE t.term <> ''
        GROUP BY t.term ORDER BY cf DESC, t.term LIMIT {k}
        """
    ).fetchall()
    duck_secs = time.perf_counter() - t0
    got_rows = list(zip(got["term"].to_pylist(), got["cf"].to_pylist()))
    assert got_rows == [(t, int(c)) for t, c in want], "top-k mismatch vs DuckDB"
    # flat driver RSS up to Ray Data's constant shuffle-coordination
    # overhead (measured ~200-400 MB on this host for ANY groupby,
    # including a 32-row count — independent of vocabulary size); the
    # vocabulary itself (~1M distinct terms x blocks) never lands here
    assert rss_after - rss_before < 800, f"driver RSS grew {rss_after - rss_before:.0f} MB"
    return {
        "rows": 2_000_000,
        "k": k,
        "secs": round(secs, 1),
        "duckdb_secs": round(duck_secs, 1),
        "driver_rss_growth_mb": round(rss_after - rss_before, 1),
        "top3": got_rows[:3],
    }


def soak_sketches() -> dict:
    import ray.data

    from oscar_ray.pipelines.search import documents_index_dir  # noqa: F401
    from oscar_ray.stages.sketches import cms_term_counts, hll_distinct_terms

    src = _pages_2m()
    ds = ray.data.read_parquet(src, columns=["text"])
    t0 = time.perf_counter()
    est = hll_distinct_terms(ds, p=14, concurrency=16)
    hll_secs = time.perf_counter() - t0

    import duckdb

    exact = duckdb.sql(
        f"""
        SELECT count(DISTINCT t.term) FROM read_parquet('{src}/*.parquet'),
            unnest(regexp_split_to_array(lower(strip_accents(text)), '[^a-z0-9]+')) AS t(term)
        WHERE t.term <> ''
        """
    ).fetchone()[0]
    rel_err = abs(est - exact) / exact
    assert rel_err < 0.05, f"HLL err {rel_err:.3f}"

    ds2 = ray.data.read_parquet(src, columns=["text"])
    t0 = time.perf_counter()
    cms = cms_term_counts(ds2, width=1 << 16, depth=4, concurrency=16)
    cms_secs = time.perf_counter() - t0
    return {
        "rows": 2_000_000,
        "hll_secs": round(hll_secs, 1),
        "hll_est": int(est),
        "distinct_exact": int(exact),
        "hll_rel_err": round(rel_err, 4),
        "cms_secs": round(cms_secs, 1),
        "cms_total_tokens": cms.total,
    }


def soak_facets() -> dict:
    """Head-term facet membership at the 2M-doc probe: the streamed
    match plan (per-block-range refs) + range-local counters must keep
    the DRIVER's RSS flat even when the query matches ~every doc —
    round 2's broadcast path would have pulled the full match array."""
    import pyarrow as pa
    import ray
    import ray.data

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines.facets import _FacetCounter, matched_id_plan

    src = _pages_2m()
    idx = "/tmp/oscar_ray_bench/soak-facet-idx"
    build_index(
        src,
        idx,
        IndexBuildConfig(num_partitions=64, block_span_bits=14, dedup_urls=True),
        resume=True,
    )
    # pick a head term from a dictionary partition (highest df)
    import pyarrow.parquet as pq

    from oscar_ray.index.layout import dict_path

    best_term, best_df = "", 0
    for p in range(64):
        t = pq.read_table(dict_path(idx, p))
        if t.num_rows:
            i = int(pa.compute.index(t["df"], pa.compute.max(t["df"])).as_py())
            if t["df"][i].as_py() > best_df:
                best_df = t["df"][i].as_py()
                best_term = t["term"][i].as_py()

    rss_before = _driver_rss_mb()
    t0 = time.perf_counter()
    plan = matched_id_plan(idx, best_term, num_tasks=16)
    # the SAME deterministic fragment -> docid layout the build used
    from dataclasses import asdict

    from oscar_ray.sources.pages import list_fragments, read_fragment

    frags = [asdict(f) for f in list_fragments(src)]

    def load(b: pa.Table) -> pa.Table:
        out = [
            read_fragment(frags[int(i)], columns=["lang"])
            for i in b["i"].to_pylist()
        ]
        t = pa.concat_tables(out)
        return t.rename_columns(
            ["doc_id" if c == "docid" else c for c in t.column_names]
        )

    ds = ray.data.from_arrow(
        pa.table({"i": pa.array(range(len(frags)), type=pa.int64())})
    ).repartition(32).map_batches(load, batch_format="pyarrow", batch_size=2)
    partials = ds.map_batches(
        _FacetCounter,
        fn_constructor_kwargs={"plan": plan, "facet_cols": ["lang"]},
        batch_format="pyarrow",
        concurrency=8,
    ).take_all()
    secs = time.perf_counter() - t0
    rss_after = _driver_rss_mb()
    import pandas as pd

    agg = (
        pd.DataFrame(partials).groupby(["facet", "value"], as_index=False).agg(n=("n", "sum"))
        if partials
        else pd.DataFrame()
    )
    n_matched_tasks = sum(1 for _lo, _hi, r in plan)
    assert len(agg) and agg["n"].sum() > 0
    assert rss_after - rss_before < 120, f"driver RSS grew {rss_after - rss_before:.0f} MB"

    # index-local kvstats (the CLI `kvstats` path, round-4 streamed):
    # same head-term query through _kv_counts_from_index — per-docmeta-
    # file tasks + the match plan; driver RSS must stay flat here too
    from oscar_ray.pipelines.facets import kvstats_from_index

    rss_kv0 = _driver_rss_mb()
    t0 = time.perf_counter()
    kvt = kvstats_from_index(idx, best_term, keys=["lang"], topk=10)
    kv_secs = time.perf_counter() - t0
    kv_growth = _driver_rss_mb() - rss_kv0
    assert kvt.num_rows > 0
    assert kv_growth < 120, f"kvstats driver RSS grew {kv_growth:.0f} MB"
    return {
        "kvstats_secs": round(kv_secs, 1),
        "kvstats_rows": int(kvt.num_rows),
        "kvstats_driver_rss_growth_mb": round(kv_growth, 1),
        "rows": 2_000_000,
        "head_term": best_term,
        "head_df": int(best_df),
        "plan_ranges": n_matched_tasks,
        "facet_rows": int(len(agg)),
        "matched_total": int(agg["n"].sum()),
        "secs": round(secs, 1),
        "driver_rss_growth_mb": round(rss_after - rss_before, 1),
    }


def main():
    import json

    import ray

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    out = {}
    if which in ("topk", "all"):
        out["topk"] = soak_topk()
    if which in ("sketches", "all"):
        out["sketches"] = soak_sketches()
    if which in ("facets", "all"):
        out["facets"] = soak_facets()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
