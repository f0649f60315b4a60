"""CLI index builder — the `oscar-create` analog (``oscar-create/oscarcreate.cpp``).

Usage:
  python scripts/oscar_create.py --input /path/to/pages_dir --out /tmp/idx \
      [--config cfg.json] [--num-cpus 32] [--no-resume]

The JSON config carries IndexBuildConfig fields (the reference's
config-driven pipeline analog, ``oscar-create/Config.h:137-257``);
CLI flags override. Prints the manifest summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="Build the inverted index")
    ap.add_argument("--input", "-i", required=True, help="pages parquet dir/glob")
    ap.add_argument("--out", "-o", required=True, help="index output directory")
    ap.add_argument("--config", "-c", help="JSON file of IndexBuildConfig fields")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--no-resume", action="store_true", help="force full rebuild")
    ap.add_argument("--partitions", type=int, help="term partitions (P)")
    ap.add_argument("--block-span-bits", type=int, help="docids per block = 2^bits")
    ap.add_argument("--id-column", help="use an existing unique int64 id column")
    ap.add_argument("--no-dedup", action="store_true", help="skip exact URL dedup")
    ap.add_argument(
        "--codec",
        choices=["varint", "rlede", "eliasfano", "wah"],
        help="docid stream codec (ItemIndex-type analog; default varint)",
    )
    ap.add_argument(
        "--fields", help="comma-separated columns to index as @field: filter terms"
    )
    ap.add_argument(
        "--extractor",
        choices=["fixture", "generic"],
        help="html->text extractor for WARC/html inputs: 'fixture' = the "
        "pinned per-row invariant (default); 'generic' = real-web "
        "boilerplate stripper (implies --extract-from-html)",
    )
    ap.add_argument(
        "--payload-dedup",
        action="store_true",
        help="store identical posting payloads once per partition "
        "(the reference's setDeduplication analog)",
    )
    ap.add_argument(
        "--positions",
        action="store_true",
        help="store the positional sidecar (enables phrase '\"a b\"' and "
        "proximity '\"a b\"~k' queries; ~2x postings bytes)",
    )
    ap.add_argument(
        "--canonical-urls",
        action="store_true",
        help="dedup on the canonical url form (case/port/fragment/param-"
        "order/utm_* variants collapse to one live doc)",
    )
    ap.add_argument(
        "--anchors",
        action="store_true",
        help="anchor-text inheritance (the region-inherited-strings "
        "analog): extract <a href> links from the corpus's own html, "
        "aggregate anchor text per target url, and index each doc under "
        "its inlink anchors too (adds a corpus rewrite pre-pass under "
        "<out>/anchored_corpus)",
    )
    ap.add_argument(
        "--keep-spill",
        action="store_true",
        help="retain tmp/ (the stage-A term-partitioned spill) after a "
        "successful build; default drops it — it is build scaffolding "
        "roughly the tokenized-corpus size (3.5x the postings store at "
        "50M docs) and only mid-build resume reads it",
    )
    ap.add_argument(
        "--update-base",
        help="incremental update: index ONLY the new input as a delta and "
        "merge it with this existing base index into --out (the store-dir/"
        "search-dir reuse loop, oscarcreate.cpp:82-116)",
    )
    ap.add_argument(
        "--update-policy",
        choices=["keep_first", "keep_last"],
        default="keep_first",
        help="url-collision policy for --update-base: keep_first == union "
        "build dedup; keep_last == the new doc REPLACES the base's",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"env_vars": {"PYTHONPATH": repo_root}},
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from oscar_ray.index.build import IndexBuildConfig, build_index

    fields = {}
    if args.config:
        with open(args.config) as f:
            fields.update(json.load(f))
    if args.partitions:
        fields["num_partitions"] = args.partitions
    if args.block_span_bits:
        fields["block_span_bits"] = args.block_span_bits
    if args.id_column:
        fields["id_column"] = args.id_column
        fields["url_column"] = fields.get("url_column")
    if args.no_dedup:
        fields["dedup_urls"] = False
    if args.codec:
        fields["docid_codec"] = args.codec
    if args.fields:
        fields["field_columns"] = args.fields.split(",")
    if args.payload_dedup:
        fields["payload_dedup"] = True
    if args.canonical_urls:
        fields["canonical_url_dedup"] = True
    if args.positions:
        fields["index_positions"] = True
    fields.setdefault("cleanup_spill", not args.keep_spill)
    if args.extractor:
        fields["extractor"] = args.extractor
        if args.extractor == "generic":
            fields.setdefault("extract_from_html", True)
    # WARC inputs carry html (no text column): default to the extractor;
    # WET inputs carry extracted text directly. Explicit config wins.
    from oscar_ray.sources.pages import resolve_paths

    inputs = resolve_paths(args.input)
    if "extract_from_html" not in fields and inputs:
        if all(p.endswith((".warc", ".warc.gz")) for p in inputs):
            fields["extract_from_html"] = True
    cfg = IndexBuildConfig(**fields)

    if args.update_base:
        from oscar_ray.index.maintain import update_index

        manifest = update_index(
            args.update_base, args.input, args.out, policy=args.update_policy
        )
        print(
            json.dumps(
                {
                    "complete": manifest["complete"],
                    "stats": manifest["stats"],
                    "maintained": manifest.get("maintained"),
                },
                indent=1,
            )
        )
        ray.shutdown()
        return

    build_input = args.input
    if args.anchors:
        from oscar_ray.pipelines.anchors import enrich_corpus_with_anchors

        corpus = os.path.join(args.out, "anchored_corpus")
        if not os.path.isdir(corpus):  # resumable: reuse a finished rewrite
            os.makedirs(args.out, exist_ok=True)
            enrich_corpus_with_anchors(
                args.input,
                corpus,
                url_col=cfg.url_column or "url",
                html_col=cfg.html_column,
            )
        build_input = corpus
        fields["id_column"] = "_docid"
        fields["extra_text_columns"] = (cfg.extra_text_columns or []) + [
            "anchor_text"
        ]
        cfg = IndexBuildConfig(**fields)

    manifest = build_index(build_input, args.out, cfg, resume=not args.no_resume)
    print(
        json.dumps(
            {
                "complete": manifest["complete"],
                "stats": manifest["stats"],
                "build_secs": manifest.get("build_secs"),
                "phase_walls": manifest.get("phase_walls"),
                "partitions": len([p for p in manifest["partitions"] if p]),
            },
            indent=1,
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
