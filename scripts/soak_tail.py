"""Tail-latency soak: Zipf head/tail query mix over a 2M-doc index.

The reference benchmark records min/max/mean/median per phase
(``oscar-cmd/Benchmark.cpp:243-305``); this soak adds the SLO view:
per-query latency percentiles (p50/p95/p99) split by query stratum —
``head`` (top-1% df terms: big postings, block-max pruning territory)
vs ``tail`` (bottom-half df terms: dictionary-bound) vs ``mixed``
(2-term AND of one head + one tail term). Queries run SEQUENTIALLY on
one engine so each sample is one query's true latency, not a batch
artifact; the in-epoch ALU probe rides along to flag host throttle.

Usage: python scripts/soak_tail.py [n_docs] [n_per_stratum]
Writes records/soak_tail_<n_docs>.json.
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


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 600
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
    from oscar_ray.query.engine import QueryEngine

    src = bench._pages_dir("", n_docs, n_files=64)
    idx = f"/tmp/oscar_ray_bench/soak-tail-{n_docs}"
    if not os.path.isdir(os.path.join(idx, "postings")):
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

    # Zipf-weighted head picks: rank r drawn with weight ~ 1/(r+1)
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
    engine = QueryEngine(idx, reader, parallel_fetch=True)
    # warm the dictionaries + head postings once (serving steady state)
    for q in strata["head"][:20]:
        engine.search(q, k=10)

    out: dict = {
        "n_docs": n_docs,
        "n_terms": len(terms),
        "n_per_stratum": n_per,
        "num_cpus": num_cpus,
    }
    for name, qs in strata.items():
        lat = []
        rows = 0
        for q in qs:
            t0 = time.perf_counter()
            ids, _ = engine.search(q, k=10)
            lat.append((time.perf_counter() - t0) * 1e6)
            rows += len(ids)
        out[name] = {
            "p50_us": _pct(lat, 50),
            "p95_us": _pct(lat, 95),
            "p99_us": _pct(lat, 99),
            "max_us": _pct(lat, 100),
            "mean_us": round(float(np.mean(lat)), 1),
            "qps_1thread": round(len(qs) / (sum(lat) / 1e6), 1),
            "result_rows": rows,
        }
    out["alu_probe_secs"] = round(bench._alu_probe(), 3)
    out["alu_probe_before_secs"] = round(probe_before, 3)

    ray.shutdown()
    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    rec = os.path.join(repo, "records", f"soak_tail_{n_docs}.json")
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
