"""High-intensity randomized differential: engine vs brute-force oracle.

The reference ships an inline-feed differential (`-ifq`); the pytest
suite runs a 60-tree version (tests/test_query.py
TestRandomTreeDifferential). This soak is the same check at soak
intensity on a 20x corpus: thousands of random set-op trees (terms,
prefix*, *substring*, + - ^ / nesting) evaluated three ways — pruned
engine, exhaustive engine, and the O(corpus) python OracleIndex — with
ids AND BM25 scores compared exactly; plus a positional leg (random
phrase / proximity ~k / fuzzy term~d built from real corpus bigrams)
checking pruned == exhaustive and phrase => proximity => AND
containment invariants.

Usage: python scripts/soak_differential.py [n_docs] [n_setop] [n_positional]
Writes records/soak_differential_<n_docs>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_setop = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    n_pos = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 8))
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
    from tests.oracle import OracleIndex

    pages = f"/tmp/oscar_ray_bench/diff-pages-{n_docs}"
    idx = f"/tmp/oscar_ray_bench/diff-idx-{n_docs}"
    if not os.path.isdir(pages):
        write_pages(pages, n_rows=n_docs, n_files=4, seed=42)
    if not os.path.isdir(os.path.join(idx, "postings")):
        cfg = IndexBuildConfig(
            num_partitions=16,
            block_span_bits=10,
            shard_fragments=2,
            index_suffixes=True,
            index_positions=True,
        )
        t0 = time.perf_counter()
        build_index(pages, idx, cfg, resume=True)
        print(f"# built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    oracle = OracleIndex.from_parquet_dir(pages, index_suffixes=True)
    engine = QueryEngine(idx)
    from oscar_ray.index.layout import SUFFIX_MARKER

    rng = np.random.default_rng(20260819)
    terms = np.array(
        sorted(t for t in oracle.postings if not t.startswith(SUFFIX_MARKER)),
        dtype=object,
    )

    def random_tree(depth: int) -> str:
        if depth == 0 or rng.random() < 0.4:
            t = str(terms[rng.integers(0, len(terms))])
            roll = rng.random()
            if roll < 0.12:
                return t[: max(2, len(t) - 1)] + "*"
            if roll < 0.2 and len(t) >= 4:
                return f"*{t[1:-1]}*"
            return t
        op = ["+", "-", "^", " ", "/"][int(rng.integers(0, 5))]
        return f"({random_tree(depth - 1)} {op} {random_tree(depth - 1)})"

    t0 = time.perf_counter()
    n_nonempty = 0
    for i in range(n_setop):
        q = random_tree(int(rng.integers(1, 4)))
        k = int(rng.choice([1, 10, 100]))
        got_ids, got_sc = engine.search(q, k=k)
        exh_ids, exh_sc = engine.search(q, k=k, mode="exhaustive")
        assert got_ids.tolist() == exh_ids.tolist(), f"pruned!=exhaustive: {q}"
        want = oracle.search(q, k=k)
        assert got_ids.tolist() == [d for d, _ in want], f"ids!=oracle: {q}"
        np.testing.assert_allclose(
            got_sc, [s for _, s in want], rtol=1e-12, atol=0, err_msg=q
        )
        n_nonempty += bool(len(got_ids))
    setop_secs = time.perf_counter() - t0

    # positional leg: real corpus bigrams -> phrase / proximity / fuzzy
    import pyarrow.parquet as pq

    from oscar_ray.spec.tokenizer import tokenize_text

    texts = pq.read_table(pages, columns=["text"])["text"].to_pylist()[:2000]
    bigrams = []
    for tx in texts[:400]:
        toks = tokenize_text(tx)
        bigrams.extend(zip(toks[:-1], toks[1:]))
    bigrams = list(dict.fromkeys(bigrams))
    t0 = time.perf_counter()
    n_pos_nonempty = 0
    for i in range(n_pos):
        a, b = bigrams[int(rng.integers(0, len(bigrams)))]
        kind = int(rng.integers(0, 3))
        if kind == 0:
            q = f'"{a} {b}"'
        elif kind == 1:
            q = f'"{a} {b}"~{int(rng.integers(1, 5))}'
        else:
            q = f"{a}~{int(rng.integers(1, 3))}"
        k = int(rng.choice([10, 100]))
        got_ids, _ = engine.search(q, k=k)
        exh_ids, _ = engine.search(q, k=k, mode="exhaustive")
        assert got_ids.tolist() == exh_ids.tolist(), f"pruned!=exhaustive: {q}"
        if kind in (0, 1):
            # containment: phrase subset-of proximity subset-of plain AND
            and_ids, _ = engine.search(f"{a} {b}", k=1 << 40)
            ph_ids, _ = engine.search(f'"{a} {b}"', k=1 << 40)
            px_ids, _ = engine.search(f'"{a} {b}"~4', k=1 << 40)
            assert set(ph_ids.tolist()) <= set(px_ids.tolist()), (a, b)
            assert set(px_ids.tolist()) <= set(and_ids.tolist()), (a, b)
        n_pos_nonempty += bool(len(got_ids))
    pos_secs = time.perf_counter() - t0

    out = {
        "n_docs": n_docs,
        "n_setop_queries": n_setop,
        "setop_nonempty": n_nonempty,
        "setop_secs": round(setop_secs, 1),
        "n_positional_queries": n_pos,
        "positional_nonempty": n_pos_nonempty,
        "positional_secs": round(pos_secs, 1),
        "n_terms": len(terms),
        "result": "ALL EXACT (ids + scores vs python oracle; pruned == exhaustive; phrase containment)",
    }
    ray.shutdown()
    rec = os.path.join(repo, "records", f"soak_differential_{n_docs}.json")
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
