"""Scale soak for DSIR importance resampling (manual, not CI):

Runs `stages/dsir.py` over the 2M-doc bench pages table (lang as the
weak target label, doc ids derived from md5(url|ts) so DuckDB can
reproduce them) and validates against DuckDB running the SAME
closed-form chain end-to-end — compared on exact integer aggregates
(count / sum / min / max of the micro weights) plus the exact top-k
id list of the Gumbel selection. The per-doc frame never lands on
the driver; flat driver RSS is asserted (same budget note as
soak_sketches: Ray's local-mode coordination costs a constant
~200-400 MB on this host regardless of data size).

Usage: python scripts/soak_dsir.py [n_docs] [k]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

POS_LANGS = ("de", "es", "und")  # weak target: non-en "curated" slice
ID_MOD = 1 << 62

_SQL_ID = (
    "(md5_number_lower(url || '|' || epoch_us(warc_ts)::VARCHAR)::HUGEINT"
    " % {mod})::BIGINT"
)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
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
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from ray.data.aggregate import Count, Max, Min, Sum

    import bench
    from soak_classify import _with_ids

    from oscar_ray.stages.dsir import N_BUCKETS, dsir_select, dsir_weights

    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)

    rss0 = _rss_mb()
    t0 = time.perf_counter()
    # actor pools must stay < num_cpus: a pool that claims every CPU
    # slot starves the upstream read/repartition tasks and deadlocks
    conc = max(2, num_cpus // 2)
    ds = _with_ids(src)
    scored = dsir_weights(
        ds, label_col="lang", target_values=POS_LANGS, concurrency=conc
    )
    agg = scored.aggregate(
        Count(),
        Sum("n_grams"),
        Sum("logw_micro"),
        Min("logw_micro"),
        Max("logw_micro"),
        Sum("key_micro"),
    )
    weights_secs = time.perf_counter() - t0

    t0 = time.perf_counter()
    sel = dsir_select(
        _with_ids(src), k=k, label_col="lang", target_values=POS_LANGS,
        concurrency=conc,
    )
    select_secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    id_expr = _SQL_ID.format(mod=ID_MOD)
    pos_list = ", ".join(f"'{v}'" for v in POS_LANGS)
    base = f"""
        WITH tokarr AS (
            SELECT {id_expr} AS doc_id, lang,
                   list_filter(
                       regexp_split_to_array(
                           lower(strip_accents(text)), '[^a-z0-9]+'),
                       x -> x <> '') AS arr
            FROM read_parquet('{src}/*.parquet')
        ),
        grams AS (
            SELECT doc_id, t.term AS g FROM tokarr, unnest(arr) AS t(term)
            UNION ALL
            SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g
            FROM tokarr, unnest(range(1, len(arr))) AS t(i)
        ),
        gf AS (
            SELECT doc_id,
                   (md5_number_lower(g)::HUGEINT % {N_BUCKETS})::BIGINT AS f
            FROM grams
        ),
        lab AS (
            SELECT {id_expr} AS doc_id, lang IN ({pos_list}) AS tgt
            FROM read_parquet('{src}/*.parquet')
        ),
        cnt AS (
            SELECT f, count(*) FILTER (WHERE tgt)::BIGINT AS tc,
                   count(*)::BIGINT AS rc
            FROM gf JOIN lab USING (doc_id) GROUP BY f
        ),
        tot AS (SELECT sum(tc)::BIGINT AS ttot, sum(rc)::BIGINT AS rtot
                FROM cnt),
        lam AS (
            SELECT f,
                   floor(ln(((cnt.tc + 1)::DOUBLE
                             * ({N_BUCKETS} + tot.rtot)::DOUBLE)
                            / ((cnt.rc + 1)::DOUBLE
                               * ({N_BUCKETS} + tot.ttot)::DOUBLE))
                         * 1e6)::BIGINT AS lam
            FROM cnt CROSS JOIN tot
        ),
        docw AS (
            SELECT gf.doc_id, count(*)::BIGINT AS n_grams,
                   sum(lam.lam)::BIGINT AS logw
            FROM gf JOIN lam USING (f) GROUP BY gf.doc_id
        ),
        allw AS (
            SELECT d.doc_id,
                   coalesce(docw.n_grams, 0)::BIGINT AS n_grams,
                   coalesce(docw.logw, 0)::BIGINT AS logw_micro,
                   floor(-ln(-ln(
                       ((md5_number_lower('dsir1:' || d.doc_id::VARCHAR)
                         ::HUGEINT % 9007199254740991) + 1)::DOUBLE
                       / 9007199254740992::DOUBLE)) * 1e6)::BIGINT
                       AS gumbel_micro
            FROM (SELECT {id_expr} AS doc_id
                  FROM read_parquet('{src}/*.parquet')) d
            LEFT JOIN docw ON d.doc_id = docw.doc_id
        )
    """
    t0 = time.perf_counter()
    want = duckdb.sql(
        base
        + """
        SELECT count(*)::BIGINT, sum(n_grams)::BIGINT,
               sum(logw_micro)::BIGINT, min(logw_micro)::BIGINT,
               max(logw_micro)::BIGINT,
               sum(logw_micro + gumbel_micro)::BIGINT
        FROM allw
        """
    ).fetchone()
    want_top = [
        r[0]
        for r in duckdb.sql(
            base
            + f"""
        SELECT doc_id FROM allw
        ORDER BY (logw_micro + gumbel_micro) DESC, doc_id LIMIT {k}
        """
        ).fetchall()
    ]
    duck_secs = time.perf_counter() - t0

    got = (
        agg["count()"],
        agg["sum(n_grams)"],
        agg["sum(logw_micro)"],
        agg["min(logw_micro)"],
        agg["max(logw_micro)"],
        agg["sum(key_micro)"],
    )
    assert tuple(int(x) for x in got) == tuple(int(x) for x in want), (got, want)
    assert sel["doc_id"].to_pylist() == want_top, "top-k id mismatch"
    assert rss_growth < 800, f"driver RSS grew {rss_growth:.0f} MB"

    out = {
        "rows": n_docs,
        "k": k,
        "num_cpus": num_cpus,
        "weights_secs": round(weights_secs, 1),
        "select_secs": round(select_secs, 1),
        "duckdb_secs": round(duck_secs, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
        "docs_scored": int(got[0]),
        "sum_grams": int(got[1]),
    }
    ray.shutdown()
    print(json.dumps(out))
    os.makedirs(os.path.join(repo, "records"), exist_ok=True)
    with open(os.path.join(repo, "records", f"soak_dsir_{n_docs}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
