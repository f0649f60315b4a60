"""Anchor-inheritance soak: 2M linked pages -> extract/aggregate/join/build.

Scale evidence for the anchor-text pipeline (stages/links.py +
pipelines/anchors.py + the --anchors corpus rewrite): generates an
N-doc linked corpus (fixture nav links over the bench pages' text),
runs the full enrichment (link extraction -> one anchor exchange ->
hash_join rewrite), builds the enriched index, and verifies the ENTIRE
aggregate (every doc's n_inlinks + anchor_text) exactly against DuckDB
running the pinned link-rule SQL over the same parquet — the comparison
happens inside DuckDB (EXCEPT both ways), so no corpus-sized arrays
touch the driver.

Usage: python scripts/soak_anchors.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
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

    import pyarrow as pa

    import bench
    from oscar_ray.index.build import IndexBuildConfig, build_index
    from oscar_ray.pipelines.anchors import (
        _gen_linked_batch,
        enrich_corpus_with_anchors,
    )
    from oscar_ray.sources.pages import Fragment, list_fragments, read_fragment

    rss = lambda: resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024  # noqa: E731

    # -- linked corpus: bench pages text re-wrapped with fixture nav links
    t0 = time.perf_counter()
    src = bench._pages_dir("/root/testdata/sf0.1", n_docs, n_files=64)
    frags = list_fragments(src)

    def load(batch: pa.Table) -> pa.Table:
        tbls = []
        for row in batch.to_pylist():
            t = read_fragment(Fragment(**row), columns=["text", "lang"])
            tbls.append(
                pa.table(
                    {"doc_id": t["docid"], "text": t["text"], "lang": t["lang"]}
                )
            )
        return pa.concat_tables(tbls)

    linked = f"/tmp/oscar_ray_bench/soak-anchors-pages-{n_docs}"
    if not os.path.isdir(linked):
        (
            ray.data.from_items([vars(f) for f in frags])
            .map_batches(load, batch_size=1, batch_format="pyarrow")
            .map_batches(
                lambda b: _gen_linked_batch(b, n_docs), batch_format="pyarrow"
            )
            .write_parquet(linked + ".tmp")
        )
        os.rename(linked + ".tmp", linked)
    gen_secs = time.perf_counter() - t0

    out = f"/tmp/oscar_ray_bench/soak-anchors-corpus-{n_docs}"
    idx = f"/tmp/oscar_ray_bench/soak-anchors-idx-{n_docs}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)

    probe0 = bench._alu_probe()
    rss0 = rss()
    t0 = time.perf_counter()
    enrich_corpus_with_anchors(linked, out)
    enrich_secs = time.perf_counter() - t0
    rss1 = rss()

    t0 = time.perf_counter()
    build_index(
        out,
        idx,
        IndexBuildConfig(
            num_partitions=32,
            id_column="_docid",
            dedup_urls=False,
            extra_text_columns=["anchor_text"],
        ),
    )
    build_secs = time.perf_counter() - t0
    probe1 = bench._alu_probe()
    rss2 = rss()

    # -- exact whole-aggregate verification inside DuckDB
    t0 = time.perf_counter()
    import duckdb

    from oscar_ray.pipelines.anchors import MAX_INLINKS
    from oscar_ray.stages.links import (
        LINK_MULT,
        LINK_STEP,
        MAX_OUT_LINKS,
        TOKENS_PER_LINK,
    )

    con = duckdb.connect()
    # strip_accents: the bench pages corpus carries 5% case/diacritic
    # token variants (write_pages knobs), which the pinned tokenizer folds
    # (NFD -> strip marks -> lower); plain lower() would leave accented
    # codepoints as split boundaries and shift every downstream slice.
    # (The sf-tier documents corpus is ascii-lower, so the driver oracles
    # don't need this.)
    want = f"""
    WITH tl AS (
      SELECT doc_id,
             list_filter(
                 regexp_split_to_array(strip_accents(lower(text)), '[^a-z0-9]+'),
                 t -> t <> '') AS toks
      FROM parquet_scan('{linked}/*.parquet')),
    js AS (SELECT unnest(range(1, {MAX_OUT_LINKS + 1})) AS j),
    links AS (
      SELECT tl.doc_id AS src_doc,
             (tl.doc_id * {LINK_MULT} + js.j * {LINK_STEP}) % {n_docs} AS dst_doc,
             array_to_string(tl.toks[3*js.j-2 : 3*js.j], ' ') AS anchor,
             js.j AS link_pos
      FROM tl CROSS JOIN js
      WHERE js.j <= least({MAX_OUT_LINKS}, len(tl.toks) // {TOKENS_PER_LINK})),
    ranked AS (
      SELECT dst_doc, anchor,
             row_number() OVER (PARTITION BY dst_doc
                                ORDER BY src_doc, link_pos) AS rk
      FROM links)
    SELECT dst_doc AS doc_id,
           string_agg(anchor, ' ' ORDER BY rk)
               FILTER (WHERE rk <= {MAX_INLINKS}) AS anchor_text
    FROM ranked GROUP BY dst_doc
    """
    got = f"""
    SELECT doc_id, anchor_text
    FROM parquet_scan('{out}/*.parquet') WHERE anchor_text IS NOT NULL
    """
    diff = con.sql(
        f"SELECT count(*) FROM (({got}) EXCEPT ({want})) UNION ALL "
        f"SELECT count(*) FROM (({want}) EXCEPT ({got}))"
    ).fetchall()
    n_rows = con.sql(f"SELECT count(*) FROM ({got})").fetchone()[0]
    verify_secs = time.perf_counter() - t0
    exact = diff[0][0] == 0 and diff[1][0] == 0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "docs_with_inlinks": int(n_rows),
                "gen_secs": round(gen_secs, 1),
                "enrich_secs": round(enrich_secs, 1),
                "enrich_docs_per_sec": round(n_docs / enrich_secs, 1),
                "build_secs": round(build_secs, 1),
                "build_docs_per_sec": round(n_docs / build_secs, 1),
                "duckdb_verify_secs": round(verify_secs, 1),
                "exact_match": exact,
                "alu_probe_secs": [round(probe0, 3), round(probe1, 3)],
                "driver_rss_mb": [round(rss0, 1), round(rss1, 1), round(rss2, 1)],
            },
            indent=1,
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()


