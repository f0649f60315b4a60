"""Dictionary-serving soak: completion + did-you-mean latency at a
web-scale vocabulary.

The synthetic corpus generator tops out at 10^4 distinct terms, far below
the 10^8-10^9-term vocabulary a 10^12-page corpus carries (SCALE.md
round-5 note). This soak validates the dictionary-surface arithmetic
directly: synthesize an N-term vocabulary IN THE REAL INDEX LAYOUT
(sorted per-partition dict parquet, CRC32-routed exactly like the
builder), open it with the real ``IndexReader``, and measure

- ``complete(prefix, k)``   — binary-searched range + df top-k prune
- ``suggest(term, d, k)``   — banded Wagner-Fischer DP over the partition

per-call, cold (first touch loads the dictionaries / builds the fuzzy
codepoint matrices) and warm. Only the dictionary tier exists here — no
postings — which is exactly the tier these two surfaces touch
(reader.py: complete/suggest never open a postings file).

Usage: python scripts/soak_dict.py [n_terms] [num_partitions]
Writes records/soak_dict_<n_terms>.json when run from the repo root.
"""

from __future__ import annotations

import json
import os
import resource
import string
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oscar_ray.index import layout  # noqa: E402
from oscar_ray.index.reader import IndexReader  # noqa: E402


def synth_vocab(n_terms: int, seed: int = 42) -> list[str]:
    """n_terms distinct lowercase terms, length 4-12, deterministic."""
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(string.ascii_lowercase.encode(), dtype=np.uint8)
    out: set[str] = set()
    while len(out) < n_terms:
        need = n_terms - len(out)
        lens = rng.integers(4, 13, size=need)
        chars = letters[rng.integers(0, 26, size=int(lens.sum()))]
        s = chars.tobytes().decode()
        pos = 0
        for ln in lens.tolist():
            out.add(s[pos : pos + ln])
            pos += ln
    return sorted(out)[:n_terms]


def write_dict_index(out_dir: str, terms: list[str], parts: int, seed: int = 7):
    """The dictionary tier of a real index: sorted per-partition dict
    parquet + a complete manifest (no postings — complete/suggest never
    read them)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "dict"), exist_ok=True)
    arr = np.asarray(terms, dtype=object)
    pids = layout.term_partitions_np(arr, parts)
    # Zipf-ish df: heavy head, hapax tail (realistic prune pressure)
    df = np.maximum((1e7 / (1.0 + rng.pareto(1.2, size=len(arr)) * 50)), 1).astype(
        np.int64
    )
    cf = df + rng.integers(0, 5, size=len(arr))
    part_meta = []
    for p in range(parts):
        m = pids == p
        t = pa.table(
            {
                "term": pa.array(arr[m].tolist(), type=pa.string()),
                "df": pa.array(df[m], type=pa.int64()),
                "cf": pa.array(cf[m], type=pa.int64()),
            }
        ).sort_by("term")
        pq.write_table(t, layout.dict_path(out_dir, p))
        part_meta.append({"terms": int(m.sum())})
    manifest = {
        "complete": True,
        "config": {
            "num_partitions": parts,
            "block_span_bits": 12,
            "k1": 0.9,
            "b": 0.4,
        },
        "stats": {"n_docs": int(df.max()), "avgdl": 100.0},
        "partitions": part_meta,
    }
    with open(layout.manifest_path(out_dir), "w") as f:
        json.dump(manifest, f)


def pct(a: list[float]) -> dict:
    x = np.array(a)
    return {
        "n": len(a),
        "mean_us": round(float(x.mean()) * 1e6, 1),
        "median_us": round(float(np.median(x)) * 1e6, 1),
        "p95_us": round(float(np.percentile(x, 95)) * 1e6, 1),
        "p99_us": round(float(np.percentile(x, 99)) * 1e6, 1),
        "max_us": round(float(x.max()) * 1e6, 1),
    }


def main():
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_dir = f"/tmp/oscar_ray_bench/soak-dict-{n_terms}-{parts}"
    t0 = time.perf_counter()
    if not os.path.exists(layout.manifest_path(out_dir)):
        terms = synth_vocab(n_terms)
        write_dict_index(out_dir, terms, parts)
    synth_secs = time.perf_counter() - t0

    rng = np.random.default_rng(123)
    reader = IndexReader(out_dir)

    # -- completion: cold (dict load) then warm over random prefixes
    t0 = time.perf_counter()
    first = reader.complete("th", k=10)
    complete_cold_s = time.perf_counter() - t0
    letters = string.ascii_lowercase
    prefixes = [
        "".join(rng.choice(list(letters), size=int(rng.integers(1, 4))))
        for _ in range(300)
    ]
    times, hits = [], 0
    for p in prefixes:
        t0 = time.perf_counter()
        r = reader.complete(p, k=10)
        times.append(time.perf_counter() - t0)
        hits += len(r)
    complete_stats = pct(times)

    # -- suggest: cold (fuzzy matrix build) then warm over misspellings
    probe_terms = [
        reader.complete(p, k=1)[0][0]
        for p in prefixes[:60]
        if reader.complete(p, k=1)
    ]
    misspelled = [t[:-1] + ("z" if t[-1] != "z" else "q") for t in probe_terms]
    t0 = time.perf_counter()
    reader.suggest(misspelled[0], max_dist=2, k=10)
    suggest_cold_s = time.perf_counter() - t0
    sug_times, sug_rows = [], 0
    for t in misspelled:
        t0 = time.perf_counter()
        r = reader.suggest(t, max_dist=2, k=10)
        sug_times.append(time.perf_counter() - t0)
        sug_rows += len(r)
    suggest_stats = pct(sug_times)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rec = {
        "metric": "dict_serving_soak",
        "n_terms": n_terms,
        "num_partitions": parts,
        "terms_per_partition": n_terms // parts,
        "synth_secs": round(synth_secs, 1),
        "complete_cold_s": round(complete_cold_s, 4),
        "complete_warm": complete_stats,
        "complete_hits": hits,
        "suggest_cold_s": round(suggest_cold_s, 4),
        "suggest_warm_d2": suggest_stats,
        "suggest_rows": sug_rows,
        "first_result": first[:3],
        "driver_rss_mb": round(rss_mb, 1),
    }
    print(json.dumps(rec))
    rec_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "records",
        f"soak_dict_{n_terms}.json",
    )
    with open(rec_path, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
