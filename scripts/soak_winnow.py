"""Scale soak for winnowing fingerprints (manual, not CI):

bench pages (diacritic variants included — the SQL mirrors the spec
tokenizer with lower(strip_accents(...))) through
`text_analysis.winnowing_fingerprints`, verified EXACTLY against the
DuckDB winnowing chain on ORDER-FREE whole-stream aggregates:
row count and a bit_xor over a per-row 64-bit mix of
(doc_id, pos, fp) — any differing, missing or extra row flips the xor.
This avoids materializing the ~25-fingerprints/doc stream twice at 2M
docs while keeping the check exact.

Usage: python scripts/soak_winnow.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MIX = 1_000_003  # row mix: ((doc_id*MIX + pos)*MIX + fp) mod 2^64

_SQL_ID = (
    "(md5_number_lower(url || '|' || epoch_us(warc_ts)::VARCHAR)::HUGEINT"
    " % {mod})::BIGINT"
)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": repo}},
    )
    import duckdb
    import pyarrow as pa
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import bench
    from soak_classify import ID_MOD, _with_ids

    from oscar_ray.stages.text_analysis import winnowing_fingerprints

    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)

    rss0 = _rss_mb()
    t0 = time.perf_counter()

    def agg(batch: pa.Table) -> pa.Table:
        out = winnowing_fingerprints(batch)
        d = out["doc_id"].to_numpy().astype(np.uint64)
        p = out["pos"].to_numpy().astype(np.uint64)
        f = out["fp"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            key = (d * np.uint64(MIX) + p) * np.uint64(MIX) + f
        x = np.bitwise_xor.reduce(key) if len(key) else np.uint64(0)
        return pa.table(
            {"n": pa.array([len(key)], type=pa.int64()),
             "x": pa.array([int(x)], type=pa.uint64())}
        )

    parts = _with_ids(src).map_batches(agg, batch_format="pyarrow").take_all()
    n_rows = sum(r["n"] for r in parts)
    xor = 0
    for r in parts:
        xor ^= int(r["x"])
    ray_secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    id_expr = _SQL_ID.format(mod=ID_MOD)
    t0 = time.perf_counter()
    con = duckdb.connect()
    con.sql(f"SET threads TO {num_cpus}")
    got = con.sql(
        f"""
        WITH tokarr AS (
            SELECT {id_expr} AS doc_id,
                   list_filter(regexp_split_to_array(
                       lower(strip_accents(text)), '[^a-z0-9]+'),
                       x -> x <> '') AS arr
            FROM read_parquet('{src}/*.parquet')
        ),
        sh AS (
            SELECT doc_id, i - 1 AS pos,
                   (((((md5_number_lower(arr[i])::HUGEINT % {(1 << 61) - 1})
                         * 1000003) % {(1 << 61) - 1}
                       + (md5_number_lower(arr[i + 1])::HUGEINT % {(1 << 61) - 1}))
                         * 1000003) % {(1 << 61) - 1}
                      + (md5_number_lower(arr[i + 2])::HUGEINT % {(1 << 61) - 1}))
                   % {(1 << 61) - 1} AS h
            FROM tokarr, unnest(range(1, len(arr) - 1)) AS u(i)
            WHERE len(arr) >= 3
        ),
        keys AS (
            SELECT doc_id, pos, ((h // 2097152)::BIGINT * 1048576 + pos) AS key
            FROM sh
        ),
        win AS (
            SELECT doc_id,
                   min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk,
                   count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS cnt
            FROM keys
        ),
        sel AS (SELECT DISTINCT doc_id, mk FROM win WHERE cnt = 4),
        rows_ AS (
            SELECT doc_id, (mk % 1048576)::BIGINT AS pos,
                   (mk // 1048576)::BIGINT AS fp
            FROM sel
        )
        SELECT count(*)::BIGINT AS n,
               bit_xor((((doc_id::HUGEINT * {MIX} + pos) * {MIX} + fp)
                        % 18446744073709551616)::UBIGINT) AS x
        FROM rows_
        """
    ).fetchone()
    duck_secs = time.perf_counter() - t0
    assert int(got[0]) == n_rows, (int(got[0]), n_rows)
    assert int(got[1]) == xor, (int(got[1]), xor)

    out = {
        "n_docs": n_docs,
        "n_fingerprints": int(n_rows),
        "ray_secs": round(ray_secs, 2),
        "duckdb_secs": round(duck_secs, 2),
        "driver_rss_growth_mb": round(rss_growth, 1),
        "num_cpus": num_cpus,
        "exact_match": True,
    }
    print(json.dumps(out))
    with open(os.path.join(repo, "records", f"soak_winnow_{n_docs}.json"), "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
