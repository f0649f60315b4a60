"""PageRank soak: 5M nodes x 15M edges x 10 iterations, numpy-checked.

Evidence that the raw-task ref-exchange power iteration
(stages/graph.py) holds at graph scale: synthesizes the closed-form
3-outlink graph over N nodes (the driver-entry construction), runs T
iterations at P parts, and compares EVERY rank bit-for-bit against the
single-process numpy reference (the integer rule makes this exact).
Records total/per-iteration wall, driver RSS growth, ALU probe.

Usage: python scripts/soak_pagerank.py [n_nodes] [iters]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))

    import ray

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa

    import bench
    from oscar_ray.stages.graph import SCALE, pagerank

    def mk_edges(t: pa.Table) -> pa.Table:
        did = t["node"].to_numpy()
        srcs, dsts = [], []
        for j in (1, 2, 3):
            srcs.append(did)
            dsts.append((did * np.int64(2654435761) + j * np.int64(40503)) % n)
        return pa.table(
            {"src": pa.array(np.concatenate(srcs)), "dst": pa.array(np.concatenate(dsts))}
        )

    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(64)
    edges = nodes.map_batches(mk_edges, batch_format="pyarrow").materialize()

    probe0 = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    got = (
        pagerank(edges, n_nodes=n, iters=iters, num_parts=32)
        .to_pandas()
        .sort_values("node")
    )
    wall = time.perf_counter() - t0
    probe1 = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    # single-process integer reference (exact by construction)
    t0 = time.perf_counter()
    src = np.arange(n, dtype=np.int64)
    r = np.full(n, SCALE // n, dtype=np.int64)
    base = (np.int64(SCALE) * 15) // (np.int64(100) * n)
    share_div = np.int64(100) * 3
    for _ in range(iters):
        share = (r * np.int64(85)) // share_div
        newr = np.full(n, base, dtype=np.int64)
        for j in (1, 2, 3):
            dst = (src * np.int64(2654435761) + j * np.int64(40503)) % n
            np.add.at(newr, dst, share)
        r = newr
    ref_secs = time.perf_counter() - t0
    exact = bool(
        (got["node"].values == src).all() and (got["rank_micro"].values == r).all()
    )

    print(
        json.dumps(
            {
                "n_nodes": n,
                "n_edges": 3 * n,
                "iters": iters,
                "wall_secs": round(wall, 1),
                "secs_per_iter": round(wall / iters, 2),
                "edge_visits_per_sec": round(3 * n * iters / wall, 1),
                "numpy_reference_secs": round(ref_secs, 1),
                "exact_match": exact,
                "alu_probe_secs": [round(probe0, 3), round(probe1, 3)],
                "driver_rss_growth_mb": round(rss1 - rss0, 1),
            },
            indent=1,
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
