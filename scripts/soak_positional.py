"""Positional-tier soak: build cost of the positions sidecar + phrase /
proximity / fuzzy query latency at bench scale.

Builds the SAME pages corpus twice (with and without
``index_positions``) and reports: build wall ratio, postings-bytes
ratio (the sidecar's real storage cost after parquet compression), and
per-class query latency over generated phrase/proximity/fuzzy queries
(phrases are sampled from real adjacent token pairs of the corpus, so
they have genuine matches). Validates the SCALE.md claims: sidecar
bytes ~2x, non-positional queries untouched, positional queries decode
only common-block positions.

Usage: python scripts/soak_positional.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _postings_bytes(idx: str) -> int:
    total = 0
    for root, _d, files in os.walk(os.path.join(idx, "postings")):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 500
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

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.query.engine import QueryEngine
    from oscar_ray.sources.synth import write_pages
    from oscar_ray.spec.tokenizer import tokenize_text

    base = f"/tmp/oscar_ray_bench/soak-positional-{n_docs}"
    pages = os.path.join(base, "pages")
    if not os.path.isdir(pages):
        write_pages(pages, n_rows=n_docs, n_files=max(8, num_cpus), rows_per_group=4096)

    out = {"n_docs": n_docs, "num_cpus": num_cpus}
    walls = {}
    # untimed warmup: first build pays Ray worker/task-dispatch startup
    build_index(
        pages,
        os.path.join(base, "idx-warmup"),
        IndexBuildConfig(num_partitions=min(32, num_cpus * 2), shard_fragments=2),
        resume=False,
    )
    for tag, positions in (("plain", False), ("pos", True)):
        idx = os.path.join(base, f"idx-{tag}")
        cfg = IndexBuildConfig(
            num_partitions=min(32, num_cpus * 2),
            shard_fragments=2,
            index_positions=positions,
        )
        t0 = time.perf_counter()
        # resume=False: force a real rebuild so build_s compares the two
        # variants (pages are page-cache-warm for both after the plain run)
        build_index(pages, idx, cfg, resume=False)
        walls[tag] = time.perf_counter() - t0
        out[f"build_s_{tag}"] = round(walls[tag], 2)
        out[f"postings_mb_{tag}"] = round(_postings_bytes(idx) / 1e6, 1)
    out["build_ratio"] = round(walls["pos"] / max(walls["plain"], 1e-9), 3)
    out["bytes_ratio"] = round(
        out["postings_mb_pos"] / max(out["postings_mb_plain"], 1e-6), 3
    )

    # query classes: real adjacent pairs -> phrases with genuine matches
    import glob

    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    sample = pq.read_table(
        sorted(glob.glob(os.path.join(pages, "*.parquet")))[0], columns=["text"]
    )["text"].to_pylist()[:2000]
    pairs = []
    for t in sample[:400]:
        toks = tokenize_text(t)
        if len(toks) >= 3:
            i = int(rng.integers(0, len(toks) - 1))
            pairs.append((toks[i], toks[i + 1]))
    rng.shuffle(pairs)
    pairs = pairs[:n_queries]

    eng = QueryEngine(os.path.join(base, "idx-pos"))
    classes = {
        "phrase": [f'"{a} {b}"' for a, b in pairs],
        "near5": [f'"{a} {b}"~5' for a, b in pairs],
        "fuzzy1": [f"{a}~" for a, _ in pairs],
        "and_plain": [f"{a} {b}" for a, b in pairs],
    }
    for name, qs in classes.items():
        t0 = time.perf_counter()
        n_hits = 0
        for q in qs:
            ids, _ = eng.search(q, k=10)
            n_hits += len(ids)
        wall = time.perf_counter() - t0
        out[f"{name}_qps"] = round(len(qs) / wall, 1)
        out[f"{name}_hits"] = n_hits
    ray.shutdown()
    print(json.dumps(out))
    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    with open(os.path.join(repo, "records", f"soak_positional_{n_docs}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
