"""Query-serving soak over the 10M-doc index built by soak_build10m.py.

Mirrors bench.py's serving protocol (persistent QueryServer actor pool,
preload, cold run then best-of-5 warm) at one decade past the bench
scale: validates that warm QPS holds when the postings store is ~625 MB
over 10M docs, and that per-actor memory stays bounded (lazy payload
hydration, sorted-array dictionaries).

Run AFTER scripts/soak_build10m.py (reuses its index dir). Run SOLO.

Per-actor full-store preload is used only while it fits: when
store_bytes x pool_size exceeds ~60% of host RAM (the 50M decade:
3.1 GB x 32 actors OOMs a 125 GB host), actors open lazily and rely on
row-group hydration + the decoded-block LRU — the same policy a
real cluster deployment applies per serving node. Override with
OSCAR_RAY_SOAK_PRELOAD=0/1.

Usage: python scripts/soak_query10m.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    idx = f"/tmp/oscar_ray_bench/soak-build-{n_docs}"
    if not os.path.isdir(idx):
        raise SystemExit(f"run soak_build10m.py first: {idx} missing")

    import ray

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    import bench
    from oscar_ray.index.layout import dict_path
    from oscar_ray.index.reader import IndexReader
    from oscar_ray.query.engine import QueryServer
    from oscar_ray.sources.queryset import generate_queries

    reader = IndexReader(idx)
    dfs: dict[str, int] = {}
    for p in range(reader.num_partitions):
        path = dict_path(idx, p)
        if os.path.exists(path):
            t = pq.read_table(path)
            dfs.update(zip(t["term"].to_pylist(), t["df"].to_pylist()))
    queries = generate_queries(dfs, n_queries=n_queries, seed=42)

    # preload() holds the POSTINGS store per actor (reader.preload reads
    # only postings/, payload bytes held, blocks decoded lazily); budget
    # with a 2x heap factor for the pylist payload-chunk overhead.
    pdir = os.path.join(idx, "postings")
    store_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(pdir)
        for f in fns
    )
    ram_bytes = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    fits = 2 * store_bytes * num_cpus < 0.6 * ram_bytes
    preload = bool(int(os.environ.get("OSCAR_RAY_SOAK_PRELOAD", "1" if fits else "0")))

    qtbl = pa.Table.from_pylist(queries)
    sharded = os.environ.get("OSCAR_RAY_SOAK_MODE", "") == "sharded"
    if sharded:
        # doc-sharded serving (query/sharded.py): num_cpus actors, each
        # preloading ONE block slice — one resident store copy across
        # the pool at any width, the 50M preload-inversion fix. Every
        # query fans to all shards; merge is exact.
        from oscar_ray.query.sharded import ShardedPool

        preload = bool(int(os.environ.get("OSCAR_RAY_SOAK_PRELOAD", "1")))
        spool = ShardedPool(idx, n_shards=num_cpus, preload=preload)
        t0 = time.perf_counter()
        spool.ready()
        open_secs = time.perf_counter() - t0

        def run_once() -> int:
            # search_batch honors the per-query k column — result_rows
            # must equal the pool-mode invariant (138,215 at 50M/4k)
            return spool.search_batch(qtbl).num_rows

        probe_before = bench._alu_probe()
        t0 = time.perf_counter()
        n_rows = run_once()
        cold_secs = time.perf_counter() - t0
        warm_secs = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run_once()
            warm_secs = min(warm_secs, time.perf_counter() - t0)
        probe_after = bench._alu_probe()
    else:
        ServerActor = ray.remote(num_cpus=1)(QueryServer)
        pool = [ServerActor.remote(index_dir=idx, preload=preload) for _ in range(num_cpus)]
        slices = [
            qtbl.slice(
                i * len(queries) // num_cpus,
                (i + 1) * len(queries) // num_cpus - i * len(queries) // num_cpus,
            )
            for i in range(num_cpus)
        ]
        t0 = time.perf_counter()
        ray.get([p.__ray_ready__.remote() for p in pool])
        open_secs = time.perf_counter() - t0

        probe_before = bench._alu_probe()
        t0 = time.perf_counter()
        outs = ray.get([p.__call__.remote(s) for p, s in zip(pool, slices) if s.num_rows])
        cold_secs = time.perf_counter() - t0
        n_rows = sum(t.num_rows for t in outs)
        warm_secs = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            ray.get([p.__call__.remote(s) for p, s in zip(pool, slices) if s.num_rows])
            warm_secs = min(warm_secs, time.perf_counter() - t0)
        probe_after = bench._alu_probe()

    out = {
        "n_docs": n_docs,
        "mode": "sharded" if sharded else "pool",
        "preload": preload,
        "store_bytes": store_bytes,
        "n_terms": len(dfs),
        "n_queries": len(queries),
        "pool_open_secs": round(open_secs, 3),
        "query_cold_secs": round(cold_secs, 3),
        "query_warm_secs": round(warm_secs, 3),
        "qps_cold": round(len(queries) / cold_secs, 1),
        "qps_warm": round(len(queries) / warm_secs, 1),
        "result_rows": int(n_rows),
        "alu_probe_secs": [round(probe_before, 3), round(probe_after, 3)],
    }
    print(json.dumps(out, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
