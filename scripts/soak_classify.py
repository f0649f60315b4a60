"""Scale soak for the round-4 classifier/keyword ops (manual, not CI):

1. nb_quality: the NBSVM-style classifier over the 2M-doc bench pages
   table (lang as the weak label, id derived from md5(url) so DuckDB
   can reproduce it). Validated against DuckDB running the SAME
   closed-form model end-to-end, compared on exact integer aggregates
   (count / sums / min / max / positive-rate) — the full per-doc frame
   never lands on the driver, which is the point.
2. tfidf: per-doc top-5 tf-idf keywords over the same table, same
   aggregate-equality validation against a DuckDB window query.

Both assert flat driver RSS (same budget note as soak_sketches: Ray's
local-mode shuffle coordination costs a constant ~200-400 MB on this
host regardless of data size).

Usage: python scripts/soak_classify.py [nb|tfidf|all] [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POS_LANGS = ("de", "es", "und")  # weak label: non-en "curated" slice
ID_MOD = 1 << 62  # md5(url) folded into a positive int64


def _pages(n_docs: int) -> str:
    import bench

    return bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _with_ids(src: str):
    """pages -> (doc_id, text, lang) with doc_id = md5_number_lower(
    url || '|' || epoch_us(warc_ts)) % 2^62 — DuckDB-reproducible AND
    row-unique (the pages table plants ~2% exact url duplicates; the
    per-row timestamp disambiguates them, since per-doc ids must be
    unique for per-doc ops)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    def add_id(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        ts = t["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        ids = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{u}|{s}".encode()).digest()[8:16], "little"
                )
                % ID_MOD
                for u, s in zip(urls, ts)
            ),
            dtype=np.int64,
            count=len(urls),
        )
        return pa.table(
            {"doc_id": pa.array(ids), "text": t["text"], "lang": t["lang"]}
        )

    return ray.data.read_parquet(
        src, columns=["url", "warc_ts", "text", "lang"]
    ).map_batches(add_id, batch_format="pyarrow")


_SQL_ID = (
    "(md5_number_lower(url || '|' || epoch_us(warc_ts)::VARCHAR)::HUGEINT"
    " % {mod})::BIGINT"
)

_SQL_TOK = """
tok AS (
    SELECT {id_expr} AS doc_id, lang, t.term
    FROM read_parquet('{src}/*.parquet'),
         unnest(regexp_split_to_array(lower(strip_accents(text)), '[^a-z0-9]+'))
             AS t(term)
    WHERE t.term <> ''
)"""


def soak_nb(n_docs: int = 2_000_000) -> dict:
    import duckdb

    from oscar_ray.stages.classify import nb_quality_scores

    src = _pages(n_docs)
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    out = nb_quality_scores(
        _with_ids(src),
        label_col="lang",
        pos_values=POS_LANGS,
        num_parts=32,
        concurrency=16,
    )
    # integer-exact aggregates; the per-doc frame stays distributed
    import ray.data  # noqa: F401
    from ray.data.aggregate import Count, Max, Min, Sum

    agg = out.aggregate(
        Count(),
        Sum("n_feats"),
        Sum("nb_score_micro"),
        Min("nb_score_micro"),
        Max("nb_score_micro"),
        Sum("pred"),
    )
    secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    pos_list = ", ".join(f"'{v}'" for v in POS_LANGS)
    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        WITH {_SQL_TOK.format(src=src, id_expr=_SQL_ID.format(mod=ID_MOD))},
        lab AS (
            SELECT {_SQL_ID.format(mod=ID_MOD)} AS doc_id,
                   lang IN ({pos_list}) AS pos
            FROM read_parquet('{src}/*.parquet')
        ),
        feats AS (
            SELECT DISTINCT doc_id,
                   (md5_number_lower(term)::HUGEINT % 1048576)::BIGINT AS f
            FROM tok
        ),
        tot AS (
            SELECT (SELECT count(*) FROM lab WHERE pos)::BIGINT AS npos,
                   (SELECT count(*) FROM lab WHERE NOT pos)::BIGINT AS nneg,
                   count(*) FILTER (WHERE pos)::BIGINT AS pos_rows,
                   count(*) FILTER (WHERE NOT pos)::BIGINT AS neg_rows
            FROM feats JOIN lab USING (doc_id)
        ),
        r AS (
            SELECT f,
                   floor(ln(((count(*) FILTER (WHERE pos) + 1)::DOUBLE
                             * (1048576 + tot.neg_rows)::DOUBLE)
                            / ((count(*) FILTER (WHERE NOT pos) + 1)::DOUBLE
                               * (1048576 + tot.pos_rows)::DOUBLE))
                         * 1e6)::BIGINT AS r_micro
            FROM feats JOIN lab USING (doc_id) CROSS JOIN tot
            GROUP BY f, tot.pos_rows, tot.neg_rows
        ),
        bias AS (
            SELECT floor(ln(npos::DOUBLE / nneg::DOUBLE) * 1e6)::BIGINT AS b
            FROM tot
        ),
        docs AS (
            SELECT feats.doc_id,
                   count(*)::BIGINT AS n_feats,
                   (sum(r.r_micro) + max(bias.b))::BIGINT AS score
            FROM feats JOIN r USING (f) CROSS JOIN bias
            GROUP BY feats.doc_id
        )
        SELECT count(*)::BIGINT, sum(n_feats)::BIGINT, sum(score)::BIGINT,
               min(score)::BIGINT, max(score)::BIGINT,
               sum((score > 0)::BIGINT)::BIGINT
        FROM docs
        """
    ).fetchone()
    duck_secs = time.perf_counter() - t0

    got = (
        agg["count()"],
        agg["sum(n_feats)"],
        agg["sum(nb_score_micro)"],
        agg["min(nb_score_micro)"],
        agg["max(nb_score_micro)"],
        agg["sum(pred)"],
    )
    assert tuple(int(x) for x in got) == tuple(int(x) for x in want), (got, want)
    assert rss_growth < 800, f"driver RSS grew {rss_growth:.0f} MB"
    return {
        "rows": n_docs,
        "secs": round(secs, 1),
        "duckdb_secs": round(duck_secs, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
        "docs_scored": int(got[0]),
        "pred_pos": int(got[5]),
        "sum_score_micro": int(got[2]),
    }


def soak_tfidf(n_docs: int = 2_000_000, k: int = 5) -> dict:
    import duckdb
    import pyarrow.parquet as pq  # noqa: F401

    from oscar_ray.stages.sketches import tfidf_keywords

    src = _pages(n_docs)
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    out = tfidf_keywords(
        _with_ids(src), n_docs=n_docs, k=k, num_parts=32, concurrency=16
    )
    from ray.data.aggregate import Count, Max, Sum

    agg = out.aggregate(Count(), Sum("tf"), Sum("score_micro"), Max("score_micro"))
    secs = time.perf_counter() - t0
    rss_growth = _rss_mb() - rss0

    t0 = time.perf_counter()
    want = duckdb.sql(
        f"""
        WITH {_SQL_TOK.format(src=src, id_expr=_SQL_ID.format(mod=ID_MOD))},
        tf AS (
            SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM tok GROUP BY doc_id, term
        ),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        s AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   (tf.tf * floor(ln(({n_docs} + 1)::DOUBLE
                                     / (df.df + 1)::DOUBLE)
                                  * 1e6)::BIGINT)::BIGINT AS score_micro
            FROM tf JOIN df USING (term)
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score_micro DESC, term
            ) AS rnk FROM s
        )
        SELECT count(*)::BIGINT, sum(tf)::BIGINT, sum(score_micro)::BIGINT,
               max(score_micro)::BIGINT
        FROM r WHERE rnk <= {k}
        """
    ).fetchone()
    duck_secs = time.perf_counter() - t0

    got = (agg["count()"], agg["sum(tf)"], agg["sum(score_micro)"], agg["max(score_micro)"])
    assert tuple(int(x) for x in got) == tuple(int(x) for x in want), (got, want)
    assert rss_growth < 800, f"driver RSS grew {rss_growth:.0f} MB"
    return {
        "rows": n_docs,
        "k": k,
        "keyword_rows": int(got[0]),
        "secs": round(secs, 1),
        "duckdb_secs": round(duck_secs, 1),
        "driver_rss_growth_mb": round(rss_growth, 1),
    }


def main():
    import ray

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
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
    if which in ("nb", "all"):
        out["nb"] = soak_nb(n)
        print(json.dumps({"nb": out["nb"]}))
    if which in ("tfidf", "all"):
        out["tfidf"] = soak_tfidf(n)
        print(json.dumps({"tfidf": out["tfidf"]}))
    rec = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "records",
        f"soak_classify_{n}.json",
    )
    with open(rec, "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
