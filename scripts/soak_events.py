"""Scale soak for the windowed/interval event ops (manual, not CI):
sessionize + range_count_join over a synthetic 20M-row event stream
(100k users), validated against DuckDB window/inequality queries on
exact integer aggregates; asserts flat driver RSS.

Event rows are a pure function of the row index (splitmix64), so the
table is deterministic at any generation parallelism and DuckDB can
regenerate nothing — it reads the same parquet.

Usage: python scripts/soak_events.py [n_rows]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_USERS = 100_000
TS_SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30 days
GAP_US = 3_600_000_000  # 1h session gap
WIN_US = 600_000_000  # 10min follow window


def _events_dir(n_rows: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    out = f"/tmp/oscar_ray_bench/events-{n_rows}"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    @ray.remote
    def gen(f: int, start: int, n: int) -> None:
        from oscar_ray.stages.dedup import _splitmix64

        idx = np.arange(start, start + n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h1 = _splitmix64(idx + np.uint64(0xE1))
            h2 = _splitmix64(idx + np.uint64(0xE2))
            h3 = _splitmix64(idx + np.uint64(0xE3))
        t = pa.table(
            {
                "event_id": pa.array(idx.astype(np.int64)),
                "user_id": pa.array((h1 % np.uint64(N_USERS)).astype(np.int64)),
                "ts": pa.array(
                    (h2 % np.uint64(TS_SPAN_US)).astype(np.int64)
                ).cast(pa.timestamp("us")),
                "value": pa.array(
                    (h3 % np.uint64(1_000_000)).astype(np.float64) / 1e6
                ),
            }
        )
        pq.write_table(t, os.path.join(out, f"ev-{f:04d}.parquet"))

    n_files = 64
    per = (n_rows + n_files - 1) // n_files
    ray.get(
        [
            gen.remote(f, f * per, min(per, n_rows - f * per))
            for f in range(n_files)
            if min(per, n_rows - f * per) > 0
        ]
    )
    open(done, "w").close()
    return out


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def soak(n_rows: int) -> dict:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    from oscar_ray.stages.joins import range_count_join, sessionize

    src = _events_dir(n_rows)
    rec: dict = {"rows": n_rows, "n_users": N_USERS}

    # -- sessionize ---------------------------------------------------------
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    ev = ray.data.read_parquet(src, columns=["event_id", "ts", "user_id", "value"])
    sess = sessionize(ev, gap_us=GAP_US, num_parts=64)
    agg = sess.aggregate(
        Count(), Sum("n_events"), Sum("sum_value_micro"), Max("session_idx")
    )
    rec["sessionize_secs"] = round(time.perf_counter() - t0, 1)
    rec["sessionize_rss_growth_mb"] = round(_rss_mb() - rss0, 1)

    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   floor(value * 1000000)::BIGINT AS vm,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
                        THEN 1 ELSE 0 END AS is_new
            FROM read_parquet('{src}/ev-*.parquet')
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, vm,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                   ) AS sid
            FROM e
        ), g AS (
            SELECT user_id, sid, count(*)::BIGINT AS n, sum(vm)::BIGINT AS sv
            FROM s GROUP BY 1, 2
        )
        SELECT count(*)::BIGINT, sum(n)::BIGINT, sum(sv)::BIGINT,
               max(sid)::BIGINT
        FROM g
        """
    ).fetchone()
    rec["sessionize_duckdb_secs"] = round(time.perf_counter() - t0, 1)
    got = (
        agg["count()"],
        agg["sum(n_events)"],
        agg["sum(sum_value_micro)"],
        agg["max(session_idx)"],
    )
    assert tuple(int(x) for x in got) == tuple(int(x) for x in want), (got, want)
    rec["n_sessions"] = int(got[0])

    # -- range join (10-min follow window, self-join) -----------------------
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    ev = ray.data.read_parquet(src, columns=["event_id", "ts", "user_id", "value"])

    def to_iv(t: pa.Table) -> pa.Table:
        tsn = t["ts"].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "lo": pa.array(tsn + 1),
                "hi": pa.array(tsn + np.int64(WIN_US) + 1),
            }
        )

    iv = ev.map_batches(to_iv, batch_format="pyarrow")
    rj = range_count_join(
        iv, ev, key="user_id", id_col="event_id", lo_col="lo", hi_col="hi",
        num_parts=64,
    )
    agg = rj.aggregate(Count(), Sum("n_events"), Sum("sum_value_micro"))
    rec["rangejoin_secs"] = round(time.perf_counter() - t0, 1)
    rec["rangejoin_rss_growth_mb"] = round(_rss_mb() - rss0, 1)

    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   floor(value * 1000000)::BIGINT AS vm
            FROM read_parquet('{src}/ev-*.parquet')
        )
        SELECT count(*)::BIGINT,
               coalesce(sum(n), 0)::BIGINT, coalesce(sum(sv), 0)::BIGINT
        FROM (
            SELECT a.event_id,
                   count(b.event_id)::BIGINT AS n,
                   coalesce(sum(b.vm), 0)::BIGINT AS sv
            FROM e a LEFT JOIN e b
              ON b.user_id = a.user_id
             AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + {WIN_US}
            GROUP BY 1
        )
        """
    ).fetchone()
    rec["rangejoin_duckdb_secs"] = round(time.perf_counter() - t0, 1)
    got = (agg["count()"], agg["sum(n_events)"], agg["sum(sum_value_micro)"])
    assert tuple(int(x) for x in got) == tuple(int(x) for x in want), (got, want)
    rec["follow_pairs"] = int(got[1])
    return rec


def main():
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    rec = soak(n)
    print(json.dumps(rec))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "records",
        f"soak_events_{n}.json",
    )
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
