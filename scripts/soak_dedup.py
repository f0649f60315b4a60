"""Scale soak for the round-2 dedup rewrites (run manually, not in CI):

1. clustering: >2M-edge graph through the DISTRIBUTED label-propagation
   path (cluster_pairs_ds) — the edge volume round 1's driver-side
   take_all() path was flagged for — validated against the numpy
   fixpoint on the same edges.
2. minhash: MinHash+LSH with distributed exact verification over the
   480k-doc bench pages table (docs >> sf0.1 documents).
3. shingle A/B: the round-1 per-n-gram blake2b loop vs the vectorized
   splitmix64 chain on identical inputs -> measured speedup.

Usage: python scripts/soak_dedup.py [cluster|minhash|shingle_ab|all]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def soak_cluster(n_edges: int = 2_500_000) -> dict:
    import pyarrow as pa
    import ray
    import ray.data

    from oscar_ray.stages.dedup import _numpy_components, cluster_pairs_ds

    rng = np.random.default_rng(42)
    n_nodes = n_edges  # sparse graph: many small components + some chains
    a = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    # plant 5 chains of length 200 (deep components for pointer jumping)
    for c in range(5):
        base = n_nodes + 1000 * c
        ids = np.arange(base, base + 200, dtype=np.int64)
        a = np.concatenate((a, ids[:-1]))
        b = np.concatenate((b, ids[1:]))

    t0 = time.perf_counter()
    ds = ray.data.from_arrow(
        pa.table({"a_id": pa.array(a), "b_id": pa.array(b)})
    ).repartition(32)
    out = cluster_pairs_ds(ds, num_parts=32)
    n_out = out.count()
    dist_secs = time.perf_counter() - t0

    t0 = time.perf_counter()
    nodes, labels = _numpy_components(a, b, max_rounds=100)
    np_secs = time.perf_counter() - t0

    # full equality on a deterministic sample + exact node/label-set match
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    want = dict(zip(nodes.tolist(), labels.tolist()))
    assert len(got) == len(want) == n_out, (len(got), len(want), n_out)
    assert got == want, "distributed labels != numpy labels"
    return {
        "edges": int(len(a)),
        "nodes": int(len(nodes)),
        "distributed_secs": round(dist_secs, 2),
        "numpy_secs": round(np_secs, 2),
        "match": True,
    }


def _soak_docs_ds(n_rows: int = 480_000):
    """Bench pages table as a (doc_id, text) documents dataset."""
    import pyarrow as pa
    import ray.data

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib

    bench = importlib.import_module("bench")
    pages = bench._pages_dir("soak", n_rows)

    from oscar_ray.sources.pages import list_fragments

    frags = [f.to_dict() for f in list_fragments(pages)]

    def load(batch):
        import pyarrow.parquet as pq

        from oscar_ray.sources.pages import Fragment, read_fragment

        tables = []
        for i in batch["i"]:
            t = read_fragment(Fragment(**frags[int(i)]), columns=["text"])
            tables.append(
                pa.table({"doc_id": t["docid"], "text": t["text"]})
            )
        return pa.concat_tables(tables)

    import ray.data

    return ray.data.from_items(
        [{"i": i} for i in range(len(frags))], override_num_blocks=len(frags)
    ).map_batches(load, batch_format="pandas")


def soak_minhash(n_rows: int = 480_000) -> dict:
    from oscar_ray.stages.dedup import minhash_lsh_pairs

    ds = _soak_docs_ds(n_rows).materialize()
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(ds, n=3, tau=0.5, concurrency=16)
    n_pairs = pairs.count()
    return {
        "docs": n_rows,
        "pairs": int(n_pairs),
        "secs": round(time.perf_counter() - t0, 2),
    }


def soak_shingle_ab(n_docs: int = 20_000) -> dict:
    """Round-1 per-n-gram blake2b loop vs the vectorized chain, same docs."""
    import pyarrow as pa

    from oscar_ray.spec.tokenizer import flatten_tokens, tokenize_text
    from oscar_ray.stages.dedup import ShingleStage

    from oscar_ray.sources.synth import generate_pages_batch

    tbl = generate_pages_batch(0, n_docs, seed=7)
    batch = pa.table({"doc_id": pa.array(range(n_docs), type=pa.int64()),
                      "text": tbl["text"]})

    # old path (round 1): blake2b per n-gram per doc
    def old_shingles(tokens: list[str], n: int) -> set:
        out = set()
        join = " ".join
        for i in range(len(tokens) - n + 1):
            dig = hashlib.blake2b(join(tokens[i: i + n]).encode(), digest_size=8)
            out.add(int.from_bytes(dig.digest(), "little"))
        return out

    texts = batch["text"].to_pylist()
    t0 = time.perf_counter()
    old_total = 0
    for t in texts:
        old_total += len(old_shingles(tokenize_text(t or ""), 3))
    old_secs = time.perf_counter() - t0

    stage = ShingleStage()
    t0 = time.perf_counter()
    out = stage(batch)
    new_secs = time.perf_counter() - t0
    new_total = out.num_rows
    return {
        "docs": n_docs,
        "old_secs": round(old_secs, 3),
        "new_secs": round(new_secs, 3),
        "speedup": round(old_secs / max(new_secs, 1e-9), 1),
        "old_shingles": int(old_total),
        "new_shingles": int(new_total),
    }


def main():
    import json

    import ray

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    out = {}
    if what in ("cluster", "all"):
        out["cluster"] = soak_cluster()
    if what in ("minhash", "all"):
        out["minhash"] = soak_minhash()
    if what in ("shingle_ab", "all"):
        out["shingle_ab"] = soak_shingle_ab()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
