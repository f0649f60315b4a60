"""HITS soak: 5M nodes x 15M edges x 3 iterations, numpy-checked.

Companion to soak_pagerank.py for the two-directional exchange
(stages/graph.py::hits): synthesizes the closed-form 3-outlink graph,
runs T iterations at P parts (2 edge exchanges + 2 scalar max
allreduces per iteration), and compares EVERY authority/hub value
bit-for-bit against the single-process numpy reference (the pinned
integer rescale makes this exact). Records wall, driver RSS, ALU probe.

Usage: python scripts/soak_hits.py [n_nodes] [iters]
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
    from oscar_ray.stages.graph import HITS_SCALE, SCALE, hits

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
        hits(edges, n_nodes=n, iters=iters, num_parts=32)
        .to_pandas()
        .sort_values("node")
    )
    wall = time.perf_counter() - t0
    probe1 = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    # single-process integer reference (exact by construction)
    t0 = time.perf_counter()
    src = np.arange(n, dtype=np.int64)
    dsts = [(src * np.int64(2654435761) + j * np.int64(40503)) % n for j in (1, 2, 3)]
    h = np.full(n, SCALE, dtype=np.int64)
    hmax = SCALE
    a_raw = np.zeros(n, dtype=np.int64)
    amax = 1
    for _ in range(iters):
        hs = (h * np.int64(HITS_SCALE)) // np.int64(max(1, hmax))
        a_raw = np.zeros(n, dtype=np.int64)
        for dst in dsts:
            np.add.at(a_raw, dst, hs)
        amax = max(1, int(a_raw.max(initial=0)))
        asc = (a_raw * np.int64(HITS_SCALE)) // np.int64(amax)
        h = np.zeros(n, dtype=np.int64)
        for dst in dsts:
            h += asc[dst]  # out-edges of src i are exactly dsts[j][i]
        hmax = max(1, int(h.max(initial=0)))
    ref_a = (a_raw * np.int64(HITS_SCALE)) // amax
    ref_h = (h * np.int64(HITS_SCALE)) // hmax
    ref_secs = time.perf_counter() - t0
    exact = bool(
        (got["node"].values == src).all()
        and (got["authority_micro"].values == ref_a).all()
        and (got["hub_micro"].values == ref_h).all()
    )

    print(
        json.dumps(
            {
                "n_nodes": n,
                "n_edges": 3 * n,
                "iters": iters,
                "wall_secs": round(wall, 1),
                "secs_per_iter": round(wall / iters, 2),
                "edge_visits_per_sec": round(2 * 3 * n * iters / wall, 1),
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
