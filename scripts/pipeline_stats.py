"""Print ds.stats() for representative Ray Data pipelines (perf triage).

Usage: python scripts/pipeline_stats.py [sf_dir]

Runs the text-analysis and dedup pipelines over the documents table and
prints Ray Data's per-stage wall/cpu/memory breakdown — the feedback
loop for checking that wall-time is dominated by useful compute (no
starving stages, no absurd block counts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
        include_dashboard=False,
        logging_level="ERROR",
        runtime_env={
            "env_vars": {
                "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            }
        },
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from oscar_ray.stages.dedup import ngram_jaccard_pairs
    from oscar_ray.stages.text_analysis import doc_token_stats

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    print("=== text analysis (map_batches) ===")
    ds = docs.map_batches(doc_token_stats, batch_format="pyarrow").materialize()
    print(ds.stats())

    print("\n=== ngram jaccard (shingle -> partition groupbys) ===")
    pairs = ngram_jaccard_pairs(docs, tau=0.2).materialize()
    print(pairs.stats())

    print("\n=== minhash + distributed verify ===")
    from oscar_ray.stages.dedup import minhash_lsh_pairs

    mh = minhash_lsh_pairs(docs, tau=0.2).materialize()
    print(mh.stats())

    print("\n=== routed exact top-k terms (partial -> part groupby) ===")
    from oscar_ray.stages.sketches import topk_frequent_terms

    topk_frequent_terms(
        ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"]),
        k=20,
    )
    # topk take_all()s internally; re-run the visible prefix for stats
    from oscar_ray.pipelines.facets import _FacetCounter, matched_id_plan
    from oscar_ray.pipelines.search import documents_index_dir

    print("\n=== streamed facet membership (plan tasks + range counters) ===")
    idx = documents_index_dir(sf_dir)
    plan = matched_id_plan(idx, "merge", num_tasks=4)
    fc = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
        )
        .map_batches(
            _FacetCounter,
            fn_constructor_kwargs={"plan": plan, "facet_cols": ["lang"]},
            batch_format="pyarrow",
            concurrency=2,
        )
        .materialize()
    )
    print(fc.stats())

    print("\n=== asof join (hash route + per-partition merge) ===")
    from oscar_ray.pipelines.relational import events_asof_join

    events_asof_join(sf_dir)  # pa.Table result; stats printed below via last ds
    from oscar_ray.stages.joins import asof_join

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    j = asof_join(
        ev.filter(expr="event_type == 'purchase'"),
        ev.filter(expr="event_type == 'click'"),
        key="user_id", ts="ts", left_cols=["event_id"], right_cols=["event_id"],
    )
    j = j.materialize()
    print(j.stats())

    ray.shutdown()


if __name__ == "__main__":
    main()
