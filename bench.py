"""Benchmark harness: index build docs/sec + BM25 query QPS over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline secs>, "unit": "sec",
   "queries": {...per-phase secs...}, "sf": ..., "num_cpus": N}

--scaling: the two-cluster-size criterion stand-in (N vs 4N nodes; see
BASELINE.md). PINNED EPOCH PROTOCOL (no post-hoc run selection): S
samples (default 5, GRAFT_SCALE_SAMPLES), each sample runs the lo-cpu
and hi-cpu jobs BACK-TO-BACK in fresh processes, and every run times a
single-thread ALU probe in its own epoch so host throttling is
attributable per sample. Reported: the full per-sample series, the
PAIRED MEDIAN efficiencies (the headline), and probe-normalized
efficiencies (raw_eff * probe_hi/probe_lo) that isolate engine scaling
from host-epoch drift.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


# pages-table scale per sf dir (the input_hint table, synthesized
# deterministically — driver documents.parquet is too small to stress the
# build: 5k rows at sf0.1)
_BENCH_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 480_000}


def _pages_dir(sf_dir: str, n_rows: int, n_files: int = 32) -> str:
    """Generate (once, cached) the deterministic pages table via Ray tasks."""
    import ray

    out = f"/tmp/oscar_ray_bench/pages-{n_rows}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    @ray.remote
    def gen_file(f: int, start: int, n: int) -> str:
        import pyarrow.parquet as pq

        from oscar_ray.sources.synth import generate_pages_batch

        tbl = generate_pages_batch(start, n, seed=42)
        path = os.path.join(out, f"pages-{f:04d}.parquet")
        pq.write_table(tbl, path, row_group_size=max(1, n // 2))
        return path

    per = (n_rows + n_files - 1) // n_files
    ray.get(
        [
            gen_file.remote(f, f * per, min(per, n_rows - f * per))
            for f in range(n_files)
            if min(per, n_rows - f * per) > 0
        ]
    )
    open(done, "w").close()
    return out


def _alu_probe(iters: int = 4_000_000) -> float:
    """Single-thread cache-resident integer loop — a fixed workload whose
    wall time tracks ONLY the host's per-core throughput this epoch
    (documented ~1.5-2x VM variance). Timed inside each bench process so
    every sample carries its own host-state evidence."""
    t0 = time.perf_counter()
    x = 0
    for i in range(iters):
        x = (x * 1103515245 + 12345 + i) & 0xFFFFFFFF
    return time.perf_counter() - t0


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.index.reader import IndexReader
    from oscar_ray.query.engine import QueryServer
    from oscar_ray.sources.queryset import generate_queries

    out_dir = f"/tmp/oscar_ray_bench/idx-cpus{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    n_rows = _BENCH_ROWS.get(os.path.basename(sf_dir.rstrip("/")), 20_000)
    src = _pages_dir(sf_dir, n_rows)
    # warm the page cache so both parallelism levels measure compute+shuffle
    for name in sorted(os.listdir(src)):
        if name.endswith(".parquet"):
            with open(os.path.join(src, name), "rb") as f:
                while f.read(1 << 24):
                    pass

    # IDENTICAL config at every parallelism level (the two-cluster-size
    # protocol compares the same job, only the resource count varies)
    cfg = IndexBuildConfig(
        num_partitions=64,
        block_span_bits=14,
        shard_fragments=1,
        dedup_urls=True,
    )

    # pre-warm Ray worker processes (python import cost is cluster warm-up,
    # not steady-state throughput; a real cluster's workers are long-lived)
    @ray.remote(num_cpus=1)
    def _warm() -> int:
        import pyarrow  # noqa: F401

        import oscar_ray.index.build  # noqa: F401

        return 0

    ray.get([_warm.remote() for _ in range(num_cpus)])

    # best-of-2: the sandbox VM shows run-to-run host throttling variance;
    # min is the honest steady-state estimate (reference protocol also
    # takes the last of repeated warm runs)
    build_secs = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        manifest = build_index(src, out_dir, cfg, resume=False)
        build_secs = min(build_secs, time.perf_counter() - t0)
    n_docs = manifest["stats"]["total_docs"]
    # summed per-task seconds per stage: flat across parallelism levels
    # == the total work is constant (no serialization/shuffle bottleneck);
    # any wall-clock efficiency loss is then resource contention, not design
    task_secs_a = round(sum(m["secs"] for m in manifest["shards"] if m), 2)
    task_secs_b = round(sum(m["secs"] for m in manifest["partitions"] if m), 2)
    # per-substage stage-A attribution (read/tokenize/suffix_fields/
    # spill/docmeta) so task-second drift is localizable across rounds
    sub_a: dict[str, float] = {}
    for m in manifest["shards"]:
        for k, v in ((m or {}).get("sub_secs") or {}).items():
            sub_a[k] = sub_a.get(k, 0.0) + v
    sub_a = {k: round(v, 2) for k, v in sub_a.items()}

    # query set from the built dictionary (stratified by df)
    import pyarrow.parquet as pq

    from oscar_ray.index.layout import dict_path

    reader = IndexReader(out_dir)
    dfs: dict[str, int] = {}
    for p in range(reader.num_partitions):
        path = dict_path(out_dir, p)
        if os.path.exists(path):
            t = pq.read_table(path)
            dfs.update(zip(t["term"].to_pylist(), t["df"].to_pylist()))
    # RAY_GRAFT_NQ: --scaling runs use a longer query batch (4000) so the
    # warm timing window is long enough to damp host burst noise; the
    # plain bench keeps 2000 for cross-round comparability (QPS is
    # normalized either way)
    n_queries = int(os.environ.get("RAY_GRAFT_NQ", "2000"))
    queries = generate_queries(dfs, n_queries=n_queries, seed=42)

    # query serving: a PERSISTENT actor pool (the ST6 'energize once, serve
    # many' analog). Actors are spawned and index-opened before timing; the
    # cold run then measures first-touch postings reads (cc=true analog),
    # the warm run measures steady-state serving (2-run warm protocol).
    import pyarrow as pa

    ServerActor = ray.remote(num_cpus=1)(QueryServer)
    # preload = the reference's mlock/mload protocol: postings resident
    # before timing; the cold run then measures first DECODE, the warm
    # run steady-state scoring
    pool = [
        ServerActor.remote(index_dir=out_dir, preload=True) for _ in range(num_cpus)
    ]
    qtbl = pa.Table.from_pylist(queries)
    slices = [
        qtbl.slice(i * len(queries) // num_cpus,
                   (i + 1) * len(queries) // num_cpus - i * len(queries) // num_cpus)
        for i in range(num_cpus)
    ]
    ray.get([p.__ray_ready__.remote() for p in pool])  # spawn + open outside timing

    t0 = time.perf_counter()
    outs = ray.get(
        [p.__call__.remote(s) for p, s in zip(pool, slices) if s.num_rows]
    )
    cold_secs = time.perf_counter() - t0
    n_rows_cold = sum(t.num_rows for t in outs)
    warm_secs = float("inf")
    # best-of-5: this VM's run-to-run throttling variance (~20% even
    # back-to-back) otherwise dominates the scaling-efficiency ratio
    for _ in range(5):
        t0 = time.perf_counter()
        ray.get([p.__call__.remote(s) for p, s in zip(pool, slices) if s.num_rows])
        warm_secs = min(warm_secs, time.perf_counter() - t0)

    # ghsg subSet phase (the reference times the drill-down sub-DAG per
    # query, ``oscar-cmd/Benchmark.cpp:180-199`` ``ghsg=``): drill-down
    # tree over the FULL match set for a sample of the query mix.
    # The serving pool holds every CPU — release it first or the subset
    # tasks can never schedule.
    for p in pool:
        ray.kill(p)
    from oscar_ray.pipelines.subset import subset_tree_from_index

    sub_queries = [q["query"] for q in queries[:8]]
    # energize the subset servers first (the reference benchmarks ghsg=
    # after mlock/mload warms the stores): the first call reads docmeta
    # once into the memory-resident host-code mapping — timed separately
    t0 = time.perf_counter()
    subset_tree_from_index(out_dir, sub_queries[0], num_match_tasks=8)
    subset_warmup_secs = time.perf_counter() - t0
    t0 = time.perf_counter()
    subset_rows = sum(
        subset_tree_from_index(out_dir, q, num_match_tasks=8).num_rows
        for q in sub_queries
    )
    subset_secs = time.perf_counter() - t0

    ray.shutdown()
    return {
        "alu_probe_secs": round(_alu_probe(), 3),
        "subset_secs": round(subset_secs, 3),
        "subset_qps": round(len(sub_queries) / subset_secs, 1),
        "subset_warmup_secs": round(subset_warmup_secs, 3),
        "subset_rows": int(subset_rows),
        "stage_task_secs": {"a": task_secs_a, "b": task_secs_b, "a_sub": sub_a},
        "build_secs": round(build_secs, 3),
        "build_docs_per_sec": round(n_docs / build_secs, 1),
        "n_docs": n_docs,
        "query_cold_secs": round(cold_secs, 3),
        "query_warm_secs": round(warm_secs, 3),
        "qps_cold": round(len(queries) / cold_secs, 1),
        "qps_warm": round(len(queries) / warm_secs, 1),
        "n_queries": len(queries),
        "result_rows": int(n_rows_cold),
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # default pair 4 -> 16 (N and 4N): this sandbox VM has a measured
        # contention cliff above ~16 concurrent memory-heavy tasks (even a
        # cache-resident pure-python loop degrades ~23% at 32-way); see
        # BASELINE.md "host ceiling" note. Override with GRAFT_SCALE_PAIR=8,32.
        lo, hi = (
            int(x) for x in os.environ.get("GRAFT_SCALE_PAIR", "4,16").split(",")
        )
        n_samples = int(os.environ.get("GRAFT_SCALE_SAMPLES", "5"))
        ratio = hi / lo

        def one_run(n: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            env.setdefault("RAY_GRAFT_NQ", "4000")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])["queries"]

        samples = []
        for s in range(n_samples):
            # PAIRED epochs: lo then hi back-to-back, no cherry-picking
            r_lo = one_run(lo)
            r_hi = one_run(hi)
            eff_b = (r_lo["build_secs"] / r_hi["build_secs"]) / ratio
            eff_q = (r_lo["query_warm_secs"] / r_hi["query_warm_secs"]) / ratio
            # host-epoch attribution: if the hi run's epoch was slower
            # per-core (probe_hi > probe_lo), raw efficiency under-reports
            # the engine; the normalized figure divides that drift out
            probe_ratio = r_hi["alu_probe_secs"] / max(r_lo["alu_probe_secs"], 1e-9)
            samples.append(
                {
                    "sample": s,
                    f"stage_task_secs_{lo}": r_lo.get("stage_task_secs"),
                    f"stage_task_secs_{hi}": r_hi.get("stage_task_secs"),
                    "build_eff": round(eff_b, 3),
                    "query_eff": round(eff_q, 3),
                    "build_eff_probe_norm": round(eff_b * probe_ratio, 3),
                    "query_eff_probe_norm": round(eff_q * probe_ratio, 3),
                    f"probe_secs_{lo}": r_lo["alu_probe_secs"],
                    f"probe_secs_{hi}": r_hi["alu_probe_secs"],
                    f"build_secs_{lo}": r_lo["build_secs"],
                    f"build_secs_{hi}": r_hi["build_secs"],
                    f"query_warm_secs_{lo}": r_lo["query_warm_secs"],
                    f"query_warm_secs_{hi}": r_hi["query_warm_secs"],
                    f"qps_warm_{hi}": r_hi["qps_warm"],
                    f"docs_per_sec_{hi}": r_hi["build_docs_per_sec"],
                }
            )

        def med(key: str) -> float:
            vals = sorted(x[key] for x in samples)
            m = len(vals) // 2
            return round(
                vals[m] if len(vals) % 2 else (vals[m - 1] + vals[m]) / 2, 3
            )

        print(
            json.dumps(
                {
                    "metric": f"scaling_{lo}_to_{hi}",
                    "n_samples": n_samples,
                    "build_scaling_efficiency": med("build_eff"),
                    "query_scaling_efficiency": med("query_eff"),
                    "build_eff_probe_norm_median": med("build_eff_probe_norm"),
                    "query_eff_probe_norm_median": med("query_eff_probe_norm"),
                    "samples": samples,
                }
            )
        )
        return

    r = run_bench(sf_dir, num_cpus)
    print(
        json.dumps(
            {
                "metric": "index_build_plus_bm25_query",
                "value": round(r["build_secs"] + r["query_warm_secs"], 3),
                "unit": "sec",
                "queries": r,
                "sf": sf_dir,
                "num_cpus": num_cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
