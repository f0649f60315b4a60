"""Scale soak for Bloom first-seen dedup (manual, not CI):

2M bench pages plus a planted 5% duplicate tail (every 20th doc
re-appears under a higher id) run through `stages/bloom.py::bloom_dedup`
at the default 2^26-bit/part sizing; the full verdict table is verified
EXACTLY against DuckDB's first-seen window rule (EXCEPT both ways — at
this fill factor, ~65k distinct per part against 2^26 bits, the FP
probability is ~1e-12 per doc, so exact coincidence is the expected
outcome and any mismatch is a bug). Records wall time, DuckDB control
time, driver RSS growth and total bitmap bytes (the memory-bounded
claim: state is parts x m_bits/8 regardless of corpus size).

Usage: python scripts/soak_bloom.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DUP_MOD = 20  # every 20th doc gets a duplicate copy
OFFSET = 1 << 61
NUM_PARTS = 32
M_BITS = 1 << 26

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

    from oscar_ray.stages.bloom import bloom_dedup

    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)
    out_dir = f"/tmp/oscar_ray_cache/soak_bloom_{n_docs}"
    os.system(f"rm -rf {out_dir}")

    rss0 = _rss_mb()
    t0 = time.perf_counter()
    ds = _with_ids(src)

    def dup_tail(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = t["doc_id"].to_numpy()
        d = t.filter(pa.array(ids % DUP_MOD == 0))
        return d.set_column(
            d.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(d["doc_id"], OFFSET),
        )

    union = ds.union(ds.map_batches(dup_tail, batch_format="pyarrow"))
    verdicts = bloom_dedup(
        union, m_bits=M_BITS, num_parts=NUM_PARTS
    )
    verdicts.write_parquet(out_dir)
    bloom_secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    # exact DuckDB control: the same union, first-seen window rule
    id_expr = _SQL_ID.format(mod=ID_MOD)
    t0 = time.perf_counter()
    con = duckdb.connect()
    base = f"""
        WITH d AS (
            SELECT {id_expr} AS doc_id, text
            FROM read_parquet('{src}/*.parquet')
        ),
        u AS (
            SELECT doc_id, text FROM d
            UNION ALL
            SELECT doc_id + {OFFSET}, text FROM d WHERE doc_id % {DUP_MOD} = 0
        ),
        oracle AS (
            SELECT doc_id,
                   CAST(doc_id = min(doc_id) OVER (PARTITION BY text)
                        AS INTEGER) AS kept
            FROM u
        )
    """
    stats = con.sql(
        base
        + f"""
        SELECT (SELECT count(*) FROM oracle) AS n,
               (SELECT count(*) FROM oracle WHERE kept = 0) AS dropped,
               (SELECT count(*) FROM
                   (SELECT * FROM oracle
                    EXCEPT
                    SELECT doc_id, kept FROM read_parquet('{out_dir}/*.parquet'))
               ) AS miss_a,
               (SELECT count(*) FROM
                   (SELECT doc_id, kept FROM read_parquet('{out_dir}/*.parquet')
                    EXCEPT
                    SELECT * FROM oracle)
               ) AS miss_b
        """
    ).fetchone()
    duck_secs = time.perf_counter() - t0
    n_units, dropped, miss_a, miss_b = (int(x) for x in stats)
    assert miss_a == 0 and miss_b == 0, (miss_a, miss_b)

    out = {
        "n_units": n_units,
        "dropped": dropped,
        "bloom_secs": round(bloom_secs, 2),
        "duckdb_secs": round(duck_secs, 2),
        "bitmap_mb_total": round(NUM_PARTS * M_BITS / 8 / 1e6, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
        "num_cpus": num_cpus,
        "exact_match": True,
    }
    print(json.dumps(out))
    rec = os.path.join(repo, "records", f"soak_bloom_{n_units}.json")
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
