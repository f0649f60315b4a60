"""Soak for the round-4 ops: ExactSubstr dedup + BPE training at 2M docs.

Runs both over the synthetic pages corpus (two decades past the oracle
fixtures), recording wall time, throughput, output sizes, peak driver
RSS growth, and the in-epoch ALU probe (host-state attribution, same
discipline as bench.py). Run SOLO — concurrent work poisons the timing.

Usage: python scripts/soak_substr_bpe.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
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
    from oscar_ray.sources.pages import Fragment, list_fragments, read_fragment

    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)
    frags = list_fragments(src)

    def load(batch: pa.Table) -> pa.Table:
        tbls = []
        for row in batch.to_pylist():
            t = read_fragment(Fragment(**row), columns=["text"])
            tbls.append(pa.table({"doc_id": t["docid"], "text": t["text"]}))
        return pa.concat_tables(tbls)

    def pages_ds():
        return ray.data.from_items([vars(f) for f in frags]).map_batches(
            load, batch_size=1, batch_format="pyarrow"
        )

    rec = {"n_docs": n_docs, "num_cpus": num_cpus}

    # ---- control: a plain Ray Data groupby at the same exploded row count.
    # Ray's sort-shuffle holds O(shuffled bytes) transiently on the local-
    # mode driver (small map sub-blocks are inlined into task returns);
    # recording the control separates that framework constant from
    # anything the substr/BPE stages themselves hold.
    import numpy as np

    n_win_est = n_docs * 49  # ~64 tokens/doc, w=16 -> ~49 windows/doc

    def gen(batch: pa.Table) -> pa.Table:
        n = n_win_est // 64
        rng = np.random.default_rng(int(batch["id"][0].as_py()))
        return pa.table(
            {
                "key1": pa.array(rng.integers(0, 1 << 62, n).astype(np.uint64)),
                "key2": pa.array(rng.integers(0, 1 << 62, n).astype(np.uint64)),
                "doc": pa.array(rng.integers(0, 1 << 40, n)),
                "pos": pa.array(rng.integers(0, 1 << 20, n)),
                "part": pa.array(rng.integers(0, 64, n)),
            }
        )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    ctrl = (
        ray.data.from_arrow(pa.table({"id": pa.array(range(64), type=pa.int64())}))
        .repartition(64)
        .map_batches(gen, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: pa.table({"n": pa.array([g.num_rows], type=pa.int64())}),
            batch_format="pyarrow",
        )
        .sum("n")
    )
    rec["groupby_control"] = {
        "rows": int(ctrl),
        "secs": round(time.perf_counter() - t0, 1),
        "driver_rss_growth_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 - rss0, 1
        ),
    }
    print(json.dumps({"groupby_control": rec["groupby_control"]}), flush=True)

    # ---- ExactSubstr dedup (w=16, rewrite) --------------------------------
    from oscar_ray.stages.substr import dedup_substrings

    probe0 = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    agg = (
        dedup_substrings(pages_ds(), w=16, num_parts=64, concurrency=num_cpus // 2)
        .map_batches(
            lambda t: pa.table(
                {
                    "rows": pa.array([t.num_rows], type=pa.int64()),
                    "cut": pa.array(
                        [int(pa.compute.sum(t["n_cut"]).as_py() or 0)],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sum(["rows", "cut"])
    )
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rec["substr"] = {
        "secs": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "survivor_rows": int(agg["sum(rows)"]),
        "tokens_cut": int(agg["sum(cut)"]),
        "driver_rss_growth_mb": round(rss1 - rss0, 1),
        "alu_probe": probe0,
    }
    print(json.dumps({"substr": rec["substr"]}), flush=True)

    # ---- BPE training + encode -------------------------------------------
    from oscar_ray.stages.bpe import bpe_token_counts, train_bpe

    probe0 = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    model = train_bpe(
        pages_ds(),
        num_merges=256,
        min_count=4,
        num_shards=8,
        num_parts=32,
        concurrency=num_cpus // 2,
    )
    train_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc = bpe_token_counts(pages_ds(), model, concurrency=num_cpus // 2).sum(
        ["n_words", "n_bpe_tokens"]
    )
    enc_wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rec["bpe"] = {
        "train_secs": round(train_wall, 1),
        "encode_secs": round(enc_wall, 1),
        "merges": len(model.merges),
        "encode_docs_per_sec": round(n_docs / enc_wall, 1),
        "n_words": int(enc["sum(n_words)"]),
        "n_bpe_tokens": int(enc["sum(n_bpe_tokens)"]),
        "compression": round(enc["sum(n_bpe_tokens)"] / max(enc["sum(n_words)"], 1), 3),
        "driver_rss_growth_mb": round(rss1 - rss0, 1),
        "alu_probe": probe0,
    }
    rec["alu_probe_after"] = bench._alu_probe()

    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    with open(
        os.path.join(repo, "records", f"soak_substr_bpe_{n_docs}.json"), "w"
    ) as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
