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

    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        SELECT t.term, count(*)::BIGINT AS cf
        FROM read_parquet('{src}/*.parquet'),
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
        WHERE t.term <> ''
        GROUP BY t.term ORDER BY cf DESC, t.term LIMIT {k}
        """
    ).fetchall()
    duck_secs = time.perf_counter() - t0
    got_rows = list(zip(got["term"].to_pylist(), got["cf"].to_pylist()))
    assert got_rows == [(t, int(c)) for t, c in want], "top-k mismatch vs DuckDB"
    # flat driver RSS: the routed combine must not grow the driver by
    # anything vocabulary-sized (50 MB grace for Ray bookkeeping)
    assert rss_after - rss_before < 50, f"driver RSS grew {rss_after - rss_before:.0f} MB"
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
            unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
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
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
