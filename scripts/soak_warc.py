"""WARC-ingest soak: build the index from .warc.gz shards at scale.

Proves the Common-Crawl container path (sources/warc.py) holds beyond
test scale: converts the cached N-doc pages table to per-record-gzip
WARC shards (one Ray task per parquet fragment), builds the full
inverted index from the WARC directory (extract_from_html), builds the
parquet control, and checks the two produce BYTE-IDENTICAL postings +
dict artifacts. Records conversion + build walls, docs/s, ALU probes,
and driver RSS growth. Run SOLO — concurrent work poisons timing.

Usage: python scripts/soak_warc.py [n_docs]
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _artifact_hashes(d: str) -> dict:
    return {
        os.path.relpath(p, d): hashlib.sha256(open(p, "rb").read()).hexdigest()
        for sub in ("postings", "dict")
        for p in sorted(glob.glob(os.path.join(d, sub, "**", "*.parquet"), recursive=True))
    }


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
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

    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=256)

    from oscar_ray.sources.pages import list_fragments, read_fragment

    warc_dir = f"/tmp/oscar_ray_bench/warc-{n_docs}"
    os.makedirs(warc_dir, exist_ok=True)
    frags = list_fragments(src)

    @ray.remote(num_cpus=1)
    def convert(frag_dict: dict, i: int) -> int:
        from oscar_ray.sources.warc import warc_write

        path = os.path.join(warc_dir, f"shard-{i:05d}.warc.gz")
        if os.path.exists(path):
            return 0
        tbl = read_fragment(frag_dict, columns=["url", "warc_ts", "html", "lang"])
        return warc_write(path, tbl.drop_columns(["docid"]))

    probe0 = bench._alu_probe()
    t0 = time.perf_counter()
    wrote = sum(ray.get([convert.remote(f.to_dict(), i) for i, f in enumerate(frags)]))
    convert_secs = time.perf_counter() - t0
    warc_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(warc_dir, "*.warc.gz"))
    )

    from oscar_ray.index.build import IndexBuildConfig, build_index

    base = dict(num_partitions=64, block_span_bits=16, shard_fragments=8, dedup_urls=True)
    idx_w = f"/tmp/oscar_ray_bench/soak-warc-idx-{n_docs}"
    idx_p = f"/tmp/oscar_ray_bench/soak-warc-ctl-{n_docs}"
    shutil.rmtree(idx_w, ignore_errors=True)
    shutil.rmtree(idx_p, ignore_errors=True)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    probe1 = bench._alu_probe()
    t0 = time.perf_counter()
    m_w = build_index(warc_dir, idx_w, IndexBuildConfig(**base, extract_from_html=True))
    warc_build_secs = time.perf_counter() - t0
    probe2 = bench._alu_probe()
    t0 = time.perf_counter()
    m_p = build_index(src, idx_p, IndexBuildConfig(**base))
    pq_build_secs = time.perf_counter() - t0
    probe3 = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    hw, hp = _artifact_hashes(idx_w), _artifact_hashes(idx_p)
    out = {
        "n_docs": n_docs,
        "warc_files": len(frags),
        "convert_secs": round(convert_secs, 1) if wrote else "cached",
        "convert_docs_per_sec": round(wrote / convert_secs, 1) if wrote else "cached",
        "warc_gb": round(warc_bytes / 2**30, 2),
        "warc_build_secs": round(warc_build_secs, 1),
        "warc_docs_per_sec": round(m_w["stats"]["total_docs"] / warc_build_secs, 1),
        "pq_build_secs": round(pq_build_secs, 1),
        "pq_docs_per_sec": round(m_p["stats"]["total_docs"] / pq_build_secs, 1),
        "build_wall_ratio": round(warc_build_secs / pq_build_secs, 3),
        "artifacts_identical": hw == hp and len(hw) > 0,
        "n_artifacts": len(hw),
        "n_unique_docs": m_w["stats"]["n_docs"],
        "alu_probe_secs": [round(p, 3) for p in (probe0, probe1, probe2, probe3)],
        "driver_rss_growth_mb": round(rss1 - rss0, 1),
    }
    print(json.dumps(out, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
