"""10M-doc build soak — one decade past the 2M probe (round-4 item 8).

Validates the SCALE.md arithmetic a decade closer to target: builds the
full inverted index over 10,000,000 synthetic pages and records docs/s,
per-stage task-seconds, phase walls, peak driver RSS, and an in-epoch
ALU probe (host-state attribution, same discipline as bench.py).

The pages table is generated once (Ray-parallel, cached under
/tmp/oscar_ray_bench/pages-10000000, ~few GB). Run SOLO — concurrent
work poisons the timing.

Usage: python scripts/soak_build10m.py [n_docs]

n_docs > 20M (e.g. the 50M decade probe) doubles n_files (512) and
num_partitions (128) so per-task work stays in the 10M band; override
with GRAFT_SOAK_FILES / GRAFT_SOAK_PARTS.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
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

    import bench

    # Scale file/partition counts with the corpus so per-task work stays in
    # the 10M-probe band: >20M docs doubles both the input file count (finer
    # stage-A waves at 32 cpus) and the partition count (stage-B per-task
    # heap stays ~10M/64-sized). Same discipline a real cluster job applies
    # when the corpus decade changes.
    big = n_docs > 20_000_000
    n_files = int(os.environ.get("GRAFT_SOAK_FILES", "512" if big else "256"))
    n_parts = int(os.environ.get("GRAFT_SOAK_PARTS", "128" if big else "64"))
    # url-dedup parallelism must scale with the corpus too: at 100M docs
    # the default 16 docmeta partitions made dedup_stats a 36 s wall
    # (16-way on 32 cpus, ~6M urls/task); 64 keeps that phase in the
    # 10M-probe band the same way n_files/n_parts do
    n_uparts = int(os.environ.get("GRAFT_SOAK_URLPARTS", "64" if big else "16"))

    t0 = time.perf_counter()
    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=n_files)
    gen_secs = time.perf_counter() - t0

    from oscar_ray.index.build import IndexBuildConfig, build_index

    idx = f"/tmp/oscar_ray_bench/soak-build-{n_docs}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexBuildConfig(
        num_partitions=n_parts,
        block_span_bits=16,
        shard_fragments=8,
        dedup_urls=True,
        url_partitions=n_uparts,
        # the spill is build scaffolding; at the 50M decade it is ~11 GB
        # (3.5x the postings store) and must not ship with the artifact
        cleanup_spill=True,
    )
    probe_before = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    manifest = build_index(src, idx, cfg, resume=False)
    build_secs = time.perf_counter() - t0
    probe_after = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    stats = manifest["stats"]
    task_a = round(sum(s["secs"] for s in manifest["shards"] if s), 2)
    task_b = round(sum(p["secs"] for p in manifest["partitions"] if p), 2)
    sub_a: dict[str, float] = {}
    for s in manifest["shards"]:
        for k, v in ((s or {}).get("sub_secs") or {}).items():
            sub_a[k] = sub_a.get(k, 0.0) + v
    sub_a = {k: round(v, 2) for k, v in sub_a.items()}
    # quick query sanity over the built index
    from oscar_ray.query.engine import QueryEngine

    eng = QueryEngine(idx)
    ids, scores = eng.search("waaa wbaa", k=10)
    out = {
        "n_docs": stats["n_docs"],
        "total_docs": stats["total_docs"],
        "n_files": n_files,
        "num_partitions": n_parts,
        "url_partitions": n_uparts,
        "gen_secs": round(gen_secs, 1),
        "build_secs": round(build_secs, 1),
        "docs_per_sec": round(stats["total_docs"] / build_secs, 1),
        "phase_walls": manifest.get("phase_walls"),
        "stage_task_secs": {"a": task_a, "b": task_b, "a_sub": sub_a},
        "alu_probe_secs": [round(probe_before, 3), round(probe_after, 3)],
        "driver_peak_rss_mb": round(rss1, 1),
        "driver_rss_growth_mb": round(rss1 - rss0, 1),
        "postings_bytes": sum(
            p["postings_bytes"] for p in manifest["partitions"] if p
        ),
        "query_smoke_results": int(len(ids)),
    }
    print(json.dumps(out, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
