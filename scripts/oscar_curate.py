"""CLI for the end-to-end training-data curation pipeline.

Usage:
  python scripts/oscar_curate.py -i /path/to/documents(.parquet|dir) \
      -o /tmp/curated [--quality-min-micro 300000] [--rates en=600000,es=350000] \
      [--default-rate 100000] [--span-k 8] [--budget 512] \
      [--denylist dup,slow] [--num-cpus 32] [--num-parts 32]

Runs scrub -> quality gate -> seeded sample -> exact dedup -> span dedup
-> sequence packing (pipelines/curate.py) as one streaming Dataset graph
and writes partitioned parquet. The output commit is ATOMIC: blocks
stream into ``<out>.tmp`` and the directory is renamed into place with a
JSON manifest only after the write completes, so an interrupted run
never leaves a half-written output that a downstream consumer could
mistake for finished (the same atomic-marker discipline as the index
builder's per-partition resume markers, index/build.py).

Reference analog: the single-config multi-stage processing chain of
``oscar-create/oscarcreate.cpp:82-116``, pointed at corpus curation
instead of index construction.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_rates(s: str | None) -> dict[str, int]:
    if not s:
        return {}
    out = {}
    for kv in s.split(","):
        k, v = kv.split("=")
        out[k.strip()] = int(v)
    return out


def main():
    ap = argparse.ArgumentParser(description="Curate a documents corpus")
    ap.add_argument("--input", "-i", required=True, help="documents parquet file/dir")
    ap.add_argument("--out", "-o", required=True, help="output directory")
    ap.add_argument("--quality-min-micro", type=int, default=300_000)
    ap.add_argument("--rates", help="per-lang micro keep rates, e.g. en=600000,es=350000")
    ap.add_argument("--default-rate", type=int, default=1_000_000,
                    help="micro keep rate for langs not in --rates (default: keep all)")
    ap.add_argument("--seed", default="s42")
    ap.add_argument("--span-k", type=int, default=8)
    ap.add_argument("--budget", type=int, default=512, help="tokens per packed sequence")
    ap.add_argument("--denylist", help="comma-separated blocklist terms")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--num-parts", type=int, default=32, help="dedup routing partitions")
    ap.add_argument("--concurrency", type=int, default=4, help="actors per stateful stage")
    ap.add_argument("--force", action="store_true", help="overwrite a finished output")
    ap.add_argument(
        "--output",
        choices=["packed", "corpus", "tokens", "wet"],
        default="packed",
        help="'packed' = training-sequence layout; 'corpus' = the curated "
        "(doc_id, text, n_spans) corpus, indexable via oscar_create "
        "--id-column doc_id; 'tokens' = train a BPE tokenizer on the "
        "curated corpus and write per-doc token_ids list<int32> shards "
        "(the terminal training-data step); 'wet' = Common-Crawl WET "
        "conversion shards (.wet.gz, sources/warc.py) — re-indexable "
        "with oscar_create directly",
    )
    ap.add_argument(
        "--bpe-merges", type=int, default=4096,
        help="BPE merge count for --output tokens",
    )
    ap.add_argument(
        "--bpe-min-count", type=int, default=2,
        help="drop words rarer than this from BPE training",
    )
    ap.add_argument(
        "--dsir-k", type=int,
        help="pre-select the top-K docs by DSIR importance (hashed "
        "n-gram ratios vs the --dsir-target sources, Gumbel-top-k) "
        "before the curation chain; needs a 'source' column",
    )
    ap.add_argument(
        "--dsir-target", default="src0,src1,src2,src3,src4",
        help="comma-separated 'source' values forming the DSIR target "
        "(curated-reference) distribution",
    )
    ap.add_argument("--dsir-seed", type=int, default=1,
                    help="Gumbel hashed-uniform seed for --dsir-k")
    ap.add_argument(
        "--dedup", choices=("exact", "bloom"), default="exact",
        help="exact keep-first (O(distinct) state) or Bloom first-seen "
        "(pinned bitmap per partition, bounded FP rate)",
    )
    ap.add_argument("--bloom-mbits", type=int, default=1 << 26,
                    help="Bloom bitmap bits per partition (power of two)")
    ap.add_argument(
        "--c4", action="store_true",
        help="C4 line-level cleaning first (published Raffel et al. rules)",
    )
    ap.add_argument(
        "--c4-rules", metavar="FILE.json",
        help="JSON C4Rules override (keys as in oscar_ray.stages.c4.C4Rules)",
    )
    args = ap.parse_args()

    manifest_path = os.path.join(args.out, "_MANIFEST.json")
    if os.path.exists(manifest_path) and not args.force:
        print(f"output already finished ({manifest_path}); use --force to redo",
              file=sys.stderr)
        return 0

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

    from oscar_ray.pipelines.curate import curate_corpus

    path = args.input
    wet_exts = (".wet", ".wet.gz")
    is_wet = path.endswith(wet_exts) or (
        os.path.isdir(path)
        and any(glob.glob(os.path.join(path, f"*{e}")) for e in wet_exts)
    )
    if is_wet:
        # Common-Crawl WET shards in -> curated corpus out: rows come
        # through the deterministic fragment reader (doc_id = layout
        # docid), one Ray block per .wet.gz file
        if args.dsir_k:
            print("--dsir-k needs a source column; WET inputs have none",
                  file=sys.stderr)
            sys.exit(2)
        import pyarrow as pa

        from oscar_ray.sources.pages import list_fragments, read_fragment

        frags = list_fragments(path)
        files = sorted({f.path for f in frags})

        def _load_wet(batch: pa.Table) -> pa.Table:
            tabs = []
            for fd in batch.to_pylist():
                t = read_fragment(fd, columns=["text", "lang"])
                tabs.append(
                    pa.table(
                        {
                            "doc_id": t["docid"].cast(pa.int64()),
                            "text": t["text"],
                            "lang": t["lang"],
                        }
                    )
                )
            return pa.concat_tables(tabs)

        ds = (
            ray.data.from_items([f.to_dict() for f in frags])
            .repartition(max(1, len(frags)))
            .map_batches(_load_wet, batch_format="pyarrow")
        )
    else:
        if os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        else:
            files = [path]
        cols = ["doc_id", "text", "lang"]
        if args.dsir_k:
            cols.append("source")
        ds = ray.data.read_parquet(files, columns=cols)

    t0 = time.time()
    if args.dsir_k:
        # DSIR pre-selection: resolve the top-K doc ids (k-bounded on
        # the driver), broadcast the sorted id array once, stream the
        # corpus through a searchsorted membership filter (the KWIC
        # match-set pattern). The input is read again by the curation
        # chain below — the counts/score passes are shuffle-free.
        import numpy as np
        import pyarrow as pa

        from oscar_ray.stages.dsir import dsir_select

        sel = dsir_select(
            ds,
            k=args.dsir_k,
            target_values=tuple(args.dsir_target.split(",")),
            seed=args.dsir_seed,
            concurrency=args.concurrency,
        )
        keep = np.sort(sel["doc_id"].to_numpy())
        keep_ref = ray.put(keep)

        def _dsir_filter(batch: "pa.Table") -> "pa.Table":
            m = ray.get(keep_ref)  # zero-copy from the object store
            ids = batch["doc_id"].to_numpy()
            if not len(m) or not len(ids):
                return batch.slice(0, 0)
            pos = np.minimum(np.searchsorted(m, ids), len(m) - 1)
            return batch.filter(pa.array(m[pos] == ids))

        ds = ds.map_batches(_dsir_filter, batch_format="pyarrow").drop_columns(
            ["source"]
        )
    c4_rules = None
    if args.c4 or args.c4_rules:
        from oscar_ray.stages.c4 import C4Rules

        if args.c4_rules:
            import json as _json

            with open(args.c4_rules) as f:
                c4_rules = C4Rules(**_json.load(f))
        else:
            c4_rules = C4Rules()
    curated = curate_corpus(
        ds,
        denylist=tuple(sorted(args.denylist.split(","))) if args.denylist else (),
        quality_min_micro=args.quality_min_micro,
        rates_micro=_parse_rates(args.rates),
        default_micro=args.default_rate,
        seed=args.seed,
        span_k=args.span_k,
        budget=args.budget,
        num_parts=args.num_parts,
        concurrency=args.concurrency,
        output="corpus" if args.output in ("tokens", "wet") else args.output,
        c4_rules=c4_rules,
        dedup=args.dedup,
        bloom_mbits=args.bloom_mbits,
    )
    if args.output == "tokens":
        # curate -> train on survivors -> tokenize survivors. The
        # curated corpus is consumed twice (train + encode), so
        # materialize it once instead of re-running the whole curation
        # lineage (the pack_sequences lesson).
        from oscar_ray.stages.bpe import bpe_tokenize, train_bpe

        curated = curated.materialize()
        model = train_bpe(
            curated,
            num_merges=args.bpe_merges,
            min_count=args.bpe_min_count,
            num_shards=max(2, args.num_parts // 8),
            concurrency=args.concurrency,
        )
        curated = bpe_tokenize(curated, model, concurrency=args.concurrency)

    tmp = args.out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if args.output == "wet":
        # one WET shard per block, written inside the tasks (the driver
        # sees only (path, n) rows); url/warc_ts synthesized from doc_id
        # exactly as the text_warc_roundtrip convention
        import pyarrow as pa
        import pyarrow.compute as pc

        from oscar_ray.sources.warc import wet_write

        os.makedirs(tmp, exist_ok=True)

        def _write_wet(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
            if len(batch) == 0:
                return empty
            ids = batch["doc_id"]
            urls = pc.binary_join_element_wise(
                "https://curated.example/d/", ids.cast(pa.string()), ""
            )
            ts = pc.multiply(ids, 1_000_000).cast(pa.timestamp("us"))
            path = os.path.join(tmp, f"part-{ids[0].as_py():012d}.wet.gz")
            n = wet_write(
                path,
                pa.table(
                    {
                        "url": urls,
                        "warc_ts": ts,
                        "text": batch["text"],
                        "lang": batch["lang"],
                    }
                ),
            )
            return pa.table({"path": [path], "n": pa.array([n], pa.int64())})

        stats = curated.map_batches(_write_wet, batch_format="pyarrow").to_pandas()
        out_files = sorted(stats["path"].tolist())
        n_rows = int(stats["n"].sum())
        wall = time.time() - t0
    else:
        curated.write_parquet(tmp)
        wall = time.time() - t0

        # row count from footers only (no data read)
        import pyarrow.parquet as pq

        out_files = sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in out_files)

    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.replace(tmp, args.out)
    manifest = {
        "n_rows": n_rows,
        "n_files": len(out_files),
        "wall_s": round(wall, 3),
        "config": {
            "quality_min_micro": args.quality_min_micro,
            "rates_micro": _parse_rates(args.rates),
            "default_rate_micro": args.default_rate,
            "seed": args.seed,
            "span_k": args.span_k,
            "budget": args.budget,
            "denylist": sorted(args.denylist.split(",")) if args.denylist else [],
            "num_parts": args.num_parts,
            "output": args.output,
            "bpe_merges": args.bpe_merges if args.output == "tokens" else None,
            "dsir_k": args.dsir_k,
            "dsir_target": sorted(args.dsir_target.split(",")) if args.dsir_k else None,
            "dsir_seed": args.dsir_seed if args.dsir_k else None,
            "dedup": args.dedup,
            "bloom_mbits": args.bloom_mbits if args.dedup == "bloom" else None,
            "c4_rules": (c4_rules.__dict__ if c4_rules is not None else None),
        },
        "input_files": len(files),
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
