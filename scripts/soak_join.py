"""hash_join soak: 20M x 2M partitioned equi-join, DuckDB-checked.

Evidence that the co-routed exchange join (stages/joins.py::hash_join)
holds at fact-table scale: synthesizes a 20M-row fact side and a
2M-row dim side (seeded, Ray-parallel, cached parquet), joins on the
int key, aggregates integer sums per dim group, and compares the FULL
grouped result (exact integers) against DuckDB running the identical
join+aggregate on the same parquet. Records walls, rows/s, driver RSS
growth, and an in-run ALU probe. Run SOLO.

Usage: python scripts/soak_join.py [n_fact] [n_dim]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synth(dir_: str, n_fact: int, n_dim: int) -> tuple[str, str]:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    fact_dir = os.path.join(dir_, f"fact-{n_fact}")
    dim_dir = os.path.join(dir_, f"dim-{n_dim}")
    if os.path.exists(fact_dir) and os.path.exists(dim_dir):
        return fact_dir, dim_dir

    @ray.remote(num_cpus=1)
    def write_fact(i: int, rows: int, path: str) -> int:
        rng = np.random.default_rng((1234, i))
        keys = rng.integers(0, n_dim, rows)
        t = pa.table(
            {
                "fk": keys.astype(np.int64),
                "val": rng.integers(0, 1000, rows).astype(np.int64),
            }
        )
        pq.write_table(t, path, row_group_size=rows)
        return rows

    @ray.remote(num_cpus=1)
    def write_dim(i: int, lo: int, hi: int, path: str) -> int:
        rng = np.random.default_rng((5678, i))
        keys = np.arange(lo, hi, dtype=np.int64)
        t = pa.table(
            {
                "pk": keys,
                "grp": rng.integers(0, 25, hi - lo).astype(np.int64),
            }
        )
        pq.write_table(t, path, row_group_size=hi - lo)
        return hi - lo

    os.makedirs(fact_dir + ".tmp", exist_ok=True)
    os.makedirs(dim_dir + ".tmp", exist_ok=True)
    shards = 64
    per = n_fact // shards
    refs = [
        write_fact.remote(i, per, os.path.join(fact_dir + ".tmp", f"f-{i:04d}.parquet"))
        for i in range(shards)
    ]
    dper = (n_dim + 15) // 16
    refs += [
        write_dim.remote(
            i, i * dper, min((i + 1) * dper, n_dim),
            os.path.join(dim_dir + ".tmp", f"d-{i:04d}.parquet"),
        )
        for i in range(16)
    ]
    import ray as _r

    _r.get(refs)
    os.replace(fact_dir + ".tmp", fact_dir)
    os.replace(dim_dir + ".tmp", dim_dir)
    return fact_dir, dim_dir


def main():
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
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

    import bench

    fact_dir, dim_dir = _synth("/tmp/oscar_ray_bench", n_fact, n_dim)

    import numpy as np
    import pyarrow as pa

    from oscar_ray.stages.joins import hash_join

    # control FIRST (ru_maxrss is a monotone peak): the same volume
    # through a plain Ray Data groupby-identity exchange attributes
    # the driver-RSS cost of Ray's sort shuffle itself; the join's
    # growth below is then the MARGINAL peak beyond the control
    rss2 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()

    def route(t: pa.Table) -> pa.Table:
        part = (t["fk"].to_numpy() % 64).astype(np.int64)
        return t.append_column("part", pa.array(part))

    ctl_rows = (
        ray.data.read_parquet(fact_dir)
        .map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: g, batch_format="pyarrow")
        .count()
    )
    ctl_secs = time.perf_counter() - t0
    rss3 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


    probe0 = bench._alu_probe()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.perf_counter()
    fact = ray.data.read_parquet(fact_dir)
    dim = ray.data.read_parquet(dim_dir)
    j = hash_join(fact, dim, on=("fk", "pk"), num_parts=64, concurrency=8)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "grp": t["grp"],
                "val": t["val"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("val", alias_name="sum_val"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    join_secs = time.perf_counter() - t0
    probe1 = bench._alu_probe()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    import duckdb

    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        SELECT d.grp, sum(f.val)::BIGINT AS sum_val, count(*)::BIGINT AS n
        FROM read_parquet('{fact_dir}/*.parquet') f
        JOIN read_parquet('{dim_dir}/*.parquet') d ON f.fk = d.pk
        GROUP BY d.grp ORDER BY d.grp
        """
    ).fetchdf()
    duck_secs = time.perf_counter() - t0
    same = (
        len(out) == len(want)
        and (out["grp"].values == want["grp"].values).all()
        and (out["sum_val"].values == want["sum_val"].values).all()
        and (out["n"].values == want["n"].values).all()
    )
    print(
        json.dumps(
            {
                "n_fact": n_fact,
                "n_dim": n_dim,
                "join_agg_secs": round(join_secs, 1),
                "fact_rows_per_sec": round(n_fact / join_secs, 1),
                "duckdb_secs": round(duck_secs, 1),
                "groups": len(out),
                "exact_match": bool(same),
                "alu_probe_secs": [round(probe0, 3), round(probe1, 3)],
                "join_marginal_rss_growth_mb": round(rss1 - rss0, 1),
                "control_groupby_identity_secs": round(ctl_secs, 1),
                "control_rows": ctl_rows,
                "control_rss_growth_mb": round(rss3 - rss2, 1),
            },
            indent=1,
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
