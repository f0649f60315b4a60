"""Curation-pipeline soak: end-to-end curate over synthetic pages.

Measures the full curate graph (scrub -> quality gate -> seeded sample
-> exact dedup -> span dedup -> packing -> parquet sink) at a scale two
decades past the oracle fixtures, recording docs/s, tokens/s, survivor
counts per funnel stage (from the output), peak driver RSS, and the
in-epoch ALU probe (host-state attribution, same discipline as
bench.py). Run SOLO — concurrent work poisons the timing.

Usage: python scripts/soak_curate.py [n_docs]
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

    import pyarrow as pa

    import bench
    from oscar_ray.pipelines.curate import curate_corpus
    from oscar_ray.sources.pages import Fragment, list_fragments, read_fragment

    t0 = time.perf_counter()
    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)
    gen_secs = time.perf_counter() - t0

    frags = list_fragments(src)

    def load(batch: pa.Table) -> pa.Table:
        tbls = []
        for row in batch.to_pylist():
            t = read_fragment(Fragment(**row), columns=["text", "lang"])
            tbls.append(
                pa.table(
                    {
                        "doc_id": t["docid"],
                        "text": t["text"],
                        "lang": t["lang"],
                    }
                )
            )
        return pa.concat_tables(tbls)

    ds = ray.data.from_items([vars(f) for f in frags]).map_batches(
        load, batch_size=1, batch_format="pyarrow"
    )

    out = f"/tmp/oscar_ray_bench/soak-curate-{n_docs}"
    shutil.rmtree(out, ignore_errors=True)

    probe_before = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    # size the text-shuffle coalesce so sort-shuffle pieces
    # (~corpus_bytes / B²) stay past Ray's ~100 KB inline threshold:
    # B = sqrt(est_bytes / 0.5 MB), est ~250 B/doc, clamped to [8, 64]
    coalesce = max(8, min(64, int((n_docs * 250 / 5e5) ** 0.5)))
    curated = curate_corpus(
        ds,
        denylist=("waaa", "wbab"),
        quality_min_micro=200_000,
        rates_micro={"en": 700_000, "de": 500_000},
        default_micro=300_000,
        span_k=8,
        budget=2048,
        num_parts=64,
        concurrency=8,
        coalesce_blocks=coalesce,
    )
    curated.write_parquet(out)
    wall = time.perf_counter() - t0
    probe_after = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    import pyarrow.parquet as pq
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out, "*.parquet")))
    n_out = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    n_tokens = 0
    for f in files:
        t = pq.read_table(f, columns=["n_tokens"])
        n_tokens += int(pa.compute.sum(t["n_tokens"]).as_py() or 0)

    rec = {
        "n_docs": n_docs,
        "gen_secs": round(gen_secs, 1),
        "curate_secs": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "survivor_rows": n_out,
        "survivor_tokens": n_tokens,
        "driver_rss_mb": round(rss1, 1),
        "driver_rss_growth_mb": round(rss1 - rss0, 1),
        "alu_probe_before": probe_before,
        "alu_probe_after": probe_after,
        "num_cpus": num_cpus,
    }
    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    with open(os.path.join(repo, "records", f"soak_curate_{n_docs}.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
