"""Local driver-style correctness check: Ray queries() vs DuckDB oracle_sql().

Mimics the graft driver: run each pipeline and its SQL on the same sf
dir, normalize (sort columns by name, sort rows), compare row count,
schema, values. Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sortable = [
        c
        for c in df.columns
        if not len(df) or not isinstance(df[c].iloc[0], (list, np.ndarray, dict, bytes))
    ]
    if len(df) and sortable:
        df = df.sort_values(by=sortable, kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if len(got) != len(want):
        issues.append(f"rows {len(got)} != {len(want)}")
    if list(got.columns) != list(want.columns):
        issues.append(f"cols {list(got.columns)} != {list(want.columns)}")
        return issues
    if len(got) == len(want) and len(got):
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(
                want[c].dtype, np.floating
            ):
                bad = ~np.isclose(
                    a.astype(np.float64), b.astype(np.float64), rtol=0, atol=1e-9
                )
            else:
                bad = a.astype(object) != b.astype(object)
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                issues.append(
                    f"col {c}: {int(bad.sum())} diffs, first at row {i}: {a[i]!r} != {b[i]!r}"
                )
    return issues


def main():
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            raise SystemExit("--json requires a path argument")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            results.append(
                {"name": name, "status": "err", "issue": f"{type(e).__name__}: {e}"}
            )
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"OK?  {name}: rows={len(got)} ({dt:.1f}s) [no oracle — rows-only]")
            results.append(
                {
                    "name": name,
                    "status": "rows_only",
                    "rows": len(got),
                    "secs": round(dt, 1),
                }
            )
            n_pass += 1
            continue
        try:
            want = normalize(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            results.append(
                {
                    "name": name,
                    "status": "err",
                    "issue": f"oracle SQL: {type(e).__name__}: {e}",
                }
            )
            n_fail += 1
            continue
        issues = compare(name, got, want)
        if issues:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(issues))
            results.append(
                {"name": name, "status": "fail", "issue": "; ".join(issues)}
            )
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
            results.append(
                {
                    "name": name,
                    "status": "pass",
                    "rows": len(got),
                    "secs": round(dt, 1),
                }
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_entries": len(results),
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_path}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
