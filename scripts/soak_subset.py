"""Subset drill-down serving soak: latency percentiles at 2M docs.

The reference times ``ghsg= `` (the subSet sub-DAG over each query's
full match set, ``oscar-cmd/Benchmark.cpp:180-199``) as a first-class
benchmark phase. This soak measures the memory-resident serving path
(`subset_tree_from_index`: `_MetaSubsetServer` host-code pool +
matched_id_plan) on a 2M-doc index: one-time server warmup, then
sequential per-query latency (p50/p95/p99) over a Zipf head / tail /
mixed query mix, plus driver RSS before/after — the per-node state is
|shard docs| x 12 B + the distinct-host dictionary, so RSS growth must
be flat in query count and tree-sized in corpus.

Usage: python scripts/soak_subset.py [n_docs] [n_per_stratum] [index_dir]
(index_dir defaults to the shared soak-tail index path and is built if
missing; pass an existing index — e.g. the 50M decade-probe build — to
measure serving at that scale without rebuilding.)
Writes records/soak_subset_<n_docs>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pct(a, q):
    import numpy as np

    return round(float(np.percentile(np.asarray(a), q)), 1)


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )
    import numpy as np
    import pyarrow.parquet as pq

    import bench
    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.index.layout import dict_path
    from oscar_ray.index.reader import IndexReader
    from oscar_ray.pipelines.subset import subset_tree_from_index

    idx = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/tmp/oscar_ray_bench/soak-tail-{n_docs}"  # shared with soak_tail
    )
    if not os.path.isdir(os.path.join(idx, "postings")):
        src = bench._pages_dir("", n_docs, n_files=64)
        cfg = IndexBuildConfig(
            num_partitions=64, block_span_bits=14, shard_fragments=1,
            dedup_urls=True,
        )
        t0 = time.perf_counter()
        build_index(src, idx, cfg, resume=True)
        print(f"# built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    reader = IndexReader(idx)
    dfs: dict[str, int] = {}
    for p in range(reader.num_partitions):
        path = dict_path(idx, p)
        if os.path.exists(path):
            t = pq.read_table(path)
            dfs.update(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    terms = sorted(dfs, key=lambda t: (-dfs[t], t))
    head = terms[: max(1, len(terms) // 100)]
    tail = [t for t in terms[len(terms) // 2 :] if dfs[t] >= 1]
    rng = np.random.default_rng(42)
    w = 1.0 / (np.arange(len(head)) + 1.0)
    w /= w.sum()
    strata = {
        "head": [str(head[i]) for i in rng.choice(len(head), n_per, p=w)],
        "tail": [str(tail[i]) for i in rng.integers(0, len(tail), n_per)],
        "mixed": [
            f"{head[int(rng.choice(len(head), p=w))]} "
            f"{tail[int(rng.integers(0, len(tail)))]}"
            for _ in range(n_per)
        ],
    }

    probe_before = bench._alu_probe()
    rss_start = _rss_mb()
    t0 = time.perf_counter()
    subset_tree_from_index(idx, strata["head"][0])  # server pool warmup
    warmup_secs = round(time.perf_counter() - t0, 3)

    out: dict = {
        "n_docs": n_docs,
        "n_terms": len(terms),
        "n_per_stratum": n_per,
        "num_cpus": num_cpus,
        "warmup_secs": warmup_secs,
        "rss_start_mb": rss_start,
    }
    for name, qs in strata.items():
        lat = []
        rows = 0
        for q in qs:
            t0 = time.perf_counter()
            t = subset_tree_from_index(idx, q)
            lat.append((time.perf_counter() - t0) * 1e3)
            rows += t.num_rows
        out[name] = {
            "p50_ms": _pct(lat, 50),
            "p95_ms": _pct(lat, 95),
            "p99_ms": _pct(lat, 99),
            "max_ms": _pct(lat, 100),
            "mean_ms": round(float(np.mean(lat)), 1),
            "qps_1thread": round(len(qs) / (sum(lat) / 1e3), 1),
            "tree_rows": rows,
        }
    out["rss_end_mb"] = _rss_mb()
    out["rss_growth_mb"] = round(out["rss_end_mb"] - rss_start, 1)
    out["alu_probe_secs"] = round(bench._alu_probe(), 3)
    out["alu_probe_before_secs"] = round(probe_before, 3)

    ray.shutdown()
    rec = os.path.join(repo, "records", f"soak_subset_{n_docs}.json")
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
