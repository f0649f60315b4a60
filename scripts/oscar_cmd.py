"""CLI query tool — the `oscar-cmd` analog (``oscar-cmd/oscarmain.cpp``).

Work items (mirroring the reference's dispatch):
  query      evaluate one query:        -q "term1 term2 + other*" [-k 10]
  batch      evaluate a query file (one per line) via the actor pool
  dump-term  print a term's stats + decoded postings head (S9 dump analog)
  dump-dict  print dictionary head / vocabulary size
  stats      print manifest stats

Usage:
  python scripts/oscar_cmd.py -i /tmp/idx query -q "hash join" -k 10
  python scripts/oscar_cmd.py -i /tmp/idx batch -f queries.txt -k 10
  python scripts/oscar_cmd.py -i /tmp/idx dump-term -t merge
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_ray(num_cpus: int = 8):
    """Start a local Ray session for subcommands that use the streamed
    (task-based) paths; workers get the repo on PYTHONPATH."""
    import ray

    if not ray.is_initialized():
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"env_vars": {"PYTHONPATH": repo_root}},
        )


def _did_you_mean(reader, qstr: str, max_terms: int = 3) -> list[str]:
    """did-you-mean hints for a zero-hit query: for each plain term that is
    absent from the dictionary, the top ranked suggestions (dist asc, df
    desc — IndexReader.suggest). Returns printable hint lines."""
    from oscar_ray.spec.tokenizer import tokenize_text

    hints = []
    for tok in tokenize_text(qstr)[:max_terms]:
        if reader.term_stats(tok)[0] > 0:
            continue
        sugg = reader.suggest(tok, max_dist=2, k=3)
        if sugg:
            alts = ", ".join(t for t, _d, _df in sugg)
            hints.append(f"# did you mean: {tok} -> {alts}")
    return hints


def _print_tree(rows: list[dict]) -> None:
    """Indented drill-down tree print (the LiveCompletion display):
    children grouped under (level, parent), siblings by n desc, node asc."""
    children: dict[tuple[int, str], list[dict]] = {}
    for r in rows:
        children.setdefault((r["level"], r["parent"]), []).append(r)
    for lst in children.values():
        lst.sort(key=lambda r: (-r["n"], r["node"]))

    def walk(level: int, parent: str, indent: str) -> None:
        for r in children.get((level, parent), []):
            print(f"{indent}{r['node']}\t{r['n']}")
            walk(level + 1, r["node"], indent + "  ")

    walk(1, "", "")


def main():
    ap = argparse.ArgumentParser(description="Query / inspect an index")
    ap.add_argument("--index", "-i", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("query")
    q.add_argument("-q", "--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["auto", "exhaustive"], default="auto")
    q.add_argument(
        "--show-docs",
        action="store_true",
        help="hydrate results from docmeta (the reference's -ds item dump)",
    )
    q.add_argument(
        "--cold",
        action="store_true",
        help="drop reader + OS page caches first (mdrop / drop_caches analog)",
    )
    q.add_argument(
        "--boost-index",
        metavar="IDX",
        help="second index over the SAME docid space (e.g. an anchor-text"
        "-only build): results combine as s_main + W * s_boost — the "
        "BM25F-style field boost (pipelines/search.weighted_field_search)",
    )
    q.add_argument("--boost-weight", type=float, default=2.0)
    q.add_argument(
        "--snippets",
        metavar="CORPUS",
        help="corpus parquet dir/file: print a KWIC snippet per hit "
        "(first query-term occurrence, +-3 tokens, hit bracketed). "
        "Requires an index built with --id-column matching the corpus "
        "doc_id column (docids must be corpus row ids)",
    )
    sub.add_parser("mdrop", help="evict OS page cache for the index artifacts")
    bm = sub.add_parser(
        "bench",
        help="per-query phase timing stats over a query file (--benchmark analog)",
    )
    bm.add_argument("-f", "--file", required=True, help="one query per line")
    bm.add_argument("-k", type=int, default=10)
    bm.add_argument(
        "--cold", action="store_true", help="drop caches before EVERY query (cc=true)"
    )
    bm.add_argument("--runs", type=int, default=2, help="warm runs per query (last counts)")
    bm.add_argument(
        "--live", action="store_true",
        help="add the LiveCompleter keystroke phase: time ranked "
        "completions for every prefix of each query's first term",
    )
    gq = sub.add_parser(
        "gen-queries", help="emit a seeded stratified query set from the dictionary"
    )
    gq.add_argument("-n", type=int, default=100)
    gq.add_argument("--seed", type=int, default=42)
    kv = sub.add_parser("kvstats", help="facet counts over a query's match set")
    kv.add_argument("-q", "--query", required=True)
    kv.add_argument("--keys", default="lang", help="comma-separated docmeta columns")
    kv.add_argument("--topk", type=int, default=10)
    ss = sub.add_parser(
        "subset",
        help="hierarchical drill-down tree over a query's match set "
        "(suffix -> domain -> host, the GeoHierarchy subSet analog)",
    )
    ss.add_argument("-q", "--query", required=True)
    ss.add_argument(
        "--max-children", type=int, default=None,
        help="prune each node to its top-k children (n desc, name asc)",
    )
    sk = sub.add_parser(
        "shannon-kvstats",
        help="topKeyValues ranked by distance to threshold*|matched| "
        "(splitdist), with key exclusions ('name' or 'prefix?') and "
        "key:value exclusions",
    )
    sk.add_argument("-q", "--query", required=True)
    sk.add_argument("--keys", default="lang", help="comma-separated docmeta columns")
    sk.add_argument("--threshold", type=float, default=0.5)
    sk.add_argument("--topk", type=int, default=10)
    sk.add_argument(
        "--exclude-key", action="append", default=[],
        help="key to exclude; trailing '?' makes it a prefix exclusion",
    )
    sk.add_argument(
        "--exclude-kv", action="append", default=[],
        help="key:value pair to exclude (repeatable)",
    )
    hy = sub.add_parser(
        "hybrid", help="BM25 x embedding-cosine reciprocal-rank fusion"
    )
    hy.add_argument("-q", "--query", required=True)
    hy.add_argument("--embeddings", required=True, help="embeddings parquet path")
    hy.add_argument("--vec-id", type=int, default=0, help="query vector's vec_id")
    hy.add_argument("-k", type=int, default=10)
    hy.add_argument("--depth", type=int, default=1000)
    hy.add_argument("--rrf-c", type=int, default=60)
    b = sub.add_parser("batch")
    b.add_argument("-f", "--file", required=True, help="one query per line")
    b.add_argument("-k", type=int, default=10)
    b.add_argument("--num-cpus", type=int, default=8)
    b.add_argument("--out", help="write results as parquet to this dir instead of stdout")
    b.add_argument(
        "--shards",
        type=int,
        default=0,
        help="doc-sharded serving: N actors each preloading one docid-block "
        "slice of the store (one resident copy pool-wide); 0 = query-"
        "partitioned actor pool (default)",
    )
    dt = sub.add_parser("dump-term")
    dt.add_argument("-t", "--term", required=True)
    dt.add_argument("--head", type=int, default=10)
    dd = sub.add_parser(
        "dump-doc", help="print one doc's docmeta row (dumpItem analog)"
    )
    dd.add_argument("-d", "--docid", type=int, required=True)
    cq = sub.add_parser(
        "cqr-size",
        help="index bytes backing a query's result (printCQRDataSize analog)",
    )
    cq.add_argument("-q", "--query", required=True)
    cq.add_argument("--head", type=int, default=10, help="largest terms printed")
    cp = sub.add_parser(
        "complete",
        help="top term completions for a prefix, ranked by collection "
        "frequency (the CellTextCompleter trie-descent analog)",
    )
    cp.add_argument("-p", "--prefix", required=True)
    cp.add_argument("-n", type=int, default=10)
    cp.add_argument(
        "--scan-cap", type=int, default=4096, help="max dictionary range scanned"
    )
    sg = sub.add_parser(
        "suggest",
        help="did-you-mean: dictionary terms within edit distance of a "
        "(possibly misspelled) term, ranked by collection frequency",
    )
    sg.add_argument("-q", "--term", required=True)
    sg.add_argument("-d", "--distance", type=int, default=1, choices=[1, 2])
    sg.add_argument("-n", type=int, default=10)
    it = sub.add_parser(
        "interactive",
        help="REPL completion loop; empty line quits (LiveCompletion analog)",
    )
    it.add_argument("-k", type=int, default=10)
    it.add_argument("--mode", choices=["auto", "exhaustive"], default="auto")
    it.add_argument("--show-docs", action="store_true")
    it.add_argument(
        "--subset", type=int, default=None, metavar="N",
        help="after each query, print the drill-down tree over the FULL "
        "match set, top-N children per node (the ghsg subSet display)",
    )
    sub.add_parser("dump-dict")
    sub.add_parser("stats")
    ck = sub.add_parser("check")
    ck.add_argument("--sample-blocks", type=int, default=None)
    mg = sub.add_parser("merge", help="merge other built indexes INTO -i (segment merge)")
    mg.add_argument("inputs", nargs="+", help="source index dirs (>= 2)")
    sd = sub.add_parser(
        "symdiff",
        help="symmetric difference of two completers on a query "
        "(--symdiff-items-completers analog)",
    )
    sd.add_argument("-q", "--query", required=True)
    sd.add_argument(
        "--other-index",
        help="second index dir (default: same index, other eval mode)",
    )
    sd.add_argument(
        "--left-mode", choices=["auto", "exhaustive"], default="auto"
    )
    sd.add_argument(
        "--right-mode", choices=["auto", "exhaustive"], default="exhaustive"
    )
    sd.add_argument("--head", type=int, default=20, help="ids printed per side")
    args = ap.parse_args()

    if "," in args.index and args.cmd not in (
        "query", "batch", "bench", "mdrop", "complete", "suggest",
    ):
        raise SystemExit(
            f"segmented mode (comma-separated -i) supports query/batch/"
            f"bench/mdrop/complete, not {args.cmd}; merge first"
        )
    if "," in args.index and getattr(args, "show_docs", False):
        raise SystemExit("--show-docs needs a single index (docmeta lookup)")

    if args.cmd == "merge":
        import ray

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"env_vars": {"PYTHONPATH": repo_root}},
        )
        from oscar_ray.index.merge import merge_indexes

        m = merge_indexes(args.inputs, args.index)
        print(json.dumps({"complete": m["complete"], "stats": m["stats"],
                          "merged_from": m["merged_from"]}))
        ray.shutdown()
        return

    if args.cmd == "batch":
        import ray

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
        from oscar_ray.query.engine import QueryServer

        with open(args.file) as f:
            queries = [
                {"query_id": i, "query": line.rstrip("\n"), "k": args.k}
                for i, line in enumerate(f)
                if line.strip()
            ]
        if args.shards:
            # doc-sharded pool: every query fans to all shards, merged
            # exactly (query/sharded.py) — preload economics at any
            # store size; rank/score-identical to the pool path
            import pyarrow as pa

            from oscar_ray.query.sharded import ShardedPool

            pool = ShardedPool(args.index, n_shards=args.shards)
            pool.ready()
            qtbl = pa.Table.from_pylist(queries)
            t0 = time.perf_counter()
            merged = pool.search_batch(qtbl)
            dt_s = time.perf_counter() - t0
            if args.out:
                import pyarrow.parquet as _pq

                os.makedirs(args.out, exist_ok=True)
                _pq.write_table(merged, os.path.join(args.out, "results.parquet"))
                n_rows = "written"
            else:
                n_rows = merged.num_rows
                for r in merged.to_pylist()[: 5 * args.k]:
                    print(json.dumps(r))
            print(
                f"# {len(queries)} queries, {n_rows} result rows, "
                f"{dt_s:.3f}s, {len(queries)/dt_s:.1f} qps "
                f"({args.shards} doc shards)",
                file=sys.stderr,
            )
            ray.shutdown()
            return
        qds = ray.data.from_items(queries, override_num_blocks=max(1, args.num_cpus))
        t0 = time.perf_counter()
        results = qds.map_batches(
            QueryServer,
            fn_constructor_kwargs={"index_dir": args.index},
            batch_format="pyarrow",
            concurrency=args.num_cpus,
        )
        if args.out:
            # streaming parquet sink: results never materialize on the driver
            results.write_parquet(args.out)
            dt_s = time.perf_counter() - t0
            n_rows = "written"
        else:
            rows = results.take_all()
            dt_s = time.perf_counter() - t0
            n_rows = len(rows)
            for r in rows[: 5 * args.k]:
                print(json.dumps(r))
        print(
            f"# {len(queries)} queries, {n_rows} result rows, "
            f"{dt_s:.3f}s, {len(queries)/dt_s:.1f} qps",
            file=sys.stderr,
        )
        ray.shutdown()
        return

    # single-process work items (mmap-once analog: open reader, serve)
    from oscar_ray.index.reader import IndexReader
    from oscar_ray.query.engine import QueryEngine

    if args.cmd == "check":
        from oscar_ray.index.check import check_index

        print(json.dumps(check_index(args.index, sample_blocks=args.sample_blocks)))
        return

    if args.cmd == "symdiff":
        # the reference's --symdiff-items-completers work item
        # (oscar-cmd/Workfunctions.cpp:1353-1356): run the query on two
        # completers (second index dir, or pruned-vs-exhaustive on the
        # same index) and print the symmetric difference of matched ids.
        import numpy as _np

        from oscar_ray.query.engine import QueryEngine

        left = QueryEngine(args.index)
        right = QueryEngine(args.other_index) if args.other_index else left
        l_ids, _ = left.search(args.query, k=1 << 62, mode=args.left_mode)
        r_ids, _ = right.search(args.query, k=1 << 62, mode=args.right_mode)
        l_set = _np.unique(l_ids.astype(_np.int64))
        r_set = _np.unique(r_ids.astype(_np.int64))
        only_l = _np.setdiff1d(l_set, r_set, assume_unique=True)
        only_r = _np.setdiff1d(r_set, l_set, assume_unique=True)
        lname = f"{args.index}:{args.left_mode}"
        rname = f"{args.other_index or args.index}:{args.right_mode}"
        print(
            json.dumps(
                {
                    "left": lname, "right": rname,
                    "left_matches": int(len(l_set)),
                    "right_matches": int(len(r_set)),
                    "symdiff": int(len(only_l) + len(only_r)),
                }
            )
        )
        for d in only_l[: args.head].tolist():
            print(f"<\t{d}")
        for d in only_r[: args.head].tolist():
            print(f">\t{d}")
        return

    if args.cmd == "kvstats":
        from oscar_ray.pipelines.facets import kvstats_from_index

        _ensure_ray()  # streamed match plan: no driver-side match set
        t = kvstats_from_index(
            args.index, args.query, keys=args.keys.split(","), topk=args.topk
        )
        for r in t.to_pylist():
            print(f"{r['facet']}\t{r['value']}\t{r['n']}")
        return

    if args.cmd == "subset":
        from oscar_ray.pipelines.subset import subset_tree_from_index

        _ensure_ray()  # streamed match plan: no driver-side match set
        t = subset_tree_from_index(
            args.index, args.query, max_children=args.max_children
        )
        _print_tree(t.to_pylist())
        return

    if args.cmd == "hybrid":
        import ray

        import numpy as _np
        import pyarrow.parquet as _pq

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if not ray.is_initialized():
            ray.init(
                address="local",
                num_cpus=8,
                include_dashboard=False,
                logging_level="ERROR",
                runtime_env={"env_vars": {"PYTHONPATH": repo_root}},
            )
        import ray.data

        ray.data.DataContext.get_current().enable_progress_bars = False
        from oscar_ray.pipelines.search import hybrid_rrf_from_index

        et = _pq.read_table(args.embeddings).sort_by("vec_id")
        qv = _np.asarray(et["embedding"][args.vec_id].as_py(), dtype=_np.float64)
        t = hybrid_rrf_from_index(
            args.index, args.embeddings, args.query, qv,
            k=args.k, depth=args.depth, rrf_c=args.rrf_c,
        )
        for r in t.to_pylist():
            print(
                f"{r['item_id']}\trrf={r['rrf_micro'] / 1e6:.6f}\t"
                f"lex_rank={r['lex_rank']}\tvec_rank={r['vec_rank']}"
            )
        ray.shutdown()
        return

    if args.cmd == "shannon-kvstats":
        from oscar_ray.pipelines.facets import shannon_topkv_from_index

        _ensure_ray()  # streamed match plan: no driver-side match set
        t = shannon_topkv_from_index(
            args.index,
            args.query,
            keys=args.keys.split(","),
            threshold=args.threshold,
            topn=args.topk,
            key_exclusions=tuple(args.exclude_key),
            keyvalue_exclusions=tuple(
                tuple(x.split(":", 1)) for x in args.exclude_kv
            ),
        )
        for r in t.to_pylist():
            print(
                f"{r['facet']}:{r['value']}: {r['n']}={r['pct']}%"
                f" splitdist={r['splitdist']}"
            )
        return

    if "," in args.index:
        # segmented (federated) serving: base,delta1,... served as one
        # engine, rank-identical to their merge (index/segmented.py;
        # unsupported subcommands rejected right after arg parsing)
        from oscar_ray.index.segmented import SegmentedReader

        reader = SegmentedReader(args.index.split(","))
    else:
        reader = IndexReader(args.index)
    if args.cmd == "dump-doc":
        # the reference's -di work item (oscar-cmd/Workfunctions.cpp:892-895,
        # store().at(id).print): resolve one docid against docmeta.
        from oscar_ray.pipelines.facets import docmeta_lookup

        import numpy as _np

        rows = docmeta_lookup(args.index, _np.array([args.docid])).to_pylist()
        if not rows:
            print(json.dumps({"docid": args.docid, "found": False}))
            return
        print(json.dumps(rows[0] | {"found": True}))
        return
    if args.cmd == "cqr-size":
        # the reference's --print-cqr-data-size work item
        # (oscar-cmd/Workfunctions.cpp:254-292): per-result-set index
        # sizes — here, the posting payload + metadata bytes of every
        # term the query touches after prefix/suffix expansion.
        from oscar_ray.query.engine import QueryEngine, expand_prefixes
        from oscar_ray.query.parser import parse_query, query_terms

        engine = QueryEngine(args.index, reader)
        try:
            tree = expand_prefixes(parse_query(args.query), reader)
        except Exception as e:  # don't-crash contract, like query
            print(f"# parse error: {e}", file=sys.stderr)
            return
        per_term = []
        for term in sorted(set(query_terms(tree))):
            tp = reader.postings(term)
            nbytes = 0
            for i in range(len(tp.block_ids)):
                if tp._docs[i] is None and tp._fetch is not None:
                    tp._docs[i], tp._tfs[i], tp._dls[i] = tp._fetch(i)
                nbytes += len(tp._docs[i]) + len(tp._tfs[i]) + len(tp._dls[i])
            meta_bytes = 8 * 3 * len(tp.block_ids)  # block_id/count/max_tfn
            per_term.append((term, tp.df, len(tp.block_ids), nbytes, meta_bytes))
        ids, _ = engine.search(args.query, k=1 << 62, mode="auto")
        total_payload = sum(t[3] for t in per_term)
        total_meta = sum(t[4] for t in per_term)
        print(
            json.dumps(
                {
                    "query": args.query,
                    "terms": len(per_term),
                    "matched_docs": int(len(ids)),
                    "payload_bytes": total_payload,
                    "metadata_bytes": total_meta,
                    "total_bytes": total_payload + total_meta,
                }
            )
        )
        for term, df, nblocks, nbytes, mbytes in sorted(
            per_term, key=lambda t: -t[3]
        )[: args.head]:
            print(f"{term}\tdf={df}\tblocks={nblocks}\tpayload_bytes={nbytes}")
        return
    if args.cmd == "suggest":
        # did-you-mean: the fuzzy-expansion scan surfaced as its own work
        # item — candidates within edit distance, most-frequent first
        # (cf desc, then distance-free term asc tiebreak)
        from oscar_ray.spec.tokenizer import tokenize_text

        toks = tokenize_text(args.term)
        if len(toks) != 1:
            print("# suggest needs a single normalized token", file=sys.stderr)
            return
        cands = reader.terms_with_edit_distance(toks[0], args.distance)
        ranked = sorted(
            ((t, *reader.term_stats(t)) for t in cands),
            key=lambda x: (-x[2], x[0]),
        )
        for t, df, cf in ranked[: args.n]:
            marker = " (exact)" if t == toks[0] else ""
            print(f"{t}\tcf={cf}\tdf={df}{marker}")
        print(f"# {len(cands)} candidates within distance {args.distance}",
              file=sys.stderr)
        return

    if args.cmd == "complete":
        # oscar's signature operation: prefix -> ranked completions. The
        # reference resolves a prefix to a trie subtree
        # (sserialize HashBasedFlatTrie; CompletionStringCreators.cpp);
        # here it's the sorted-dictionary range scan + per-term (df, cf)
        # stats, ranked by cf desc then term asc.
        from oscar_ray.spec.tokenizer import tokenize_text

        toks = tokenize_text(args.prefix)
        prefix = toks[0] if toks else ""
        if not prefix:
            print("# empty prefix after normalization", file=sys.stderr)
            return
        terms = reader.terms_with_prefix(prefix, limit=args.scan_cap)
        stats = [(t, *reader.term_stats(t)) for t in terms]
        stats.sort(key=lambda x: (-x[2], x[0]))
        for t, df, cf in stats[: args.n]:
            print(f"{t}\tcf={cf}\tdf={df}")
        print(
            f"# {len(terms)} terms in range (scan cap {args.scan_cap})",
            file=sys.stderr,
        )
        return
    if args.cmd == "interactive":
        # the reference's interactive completion REPL
        # (oscar-cmd/LiveCompleter.cpp:276-310 doFullCompletion): read a
        # query per line, evaluate, print top-k + phase timings; empty
        # line (or EOF) quits.
        from oscar_ray.query.engine import QueryEngine

        engine = QueryEngine(args.index, reader, parallel_fetch=True)
        if sys.stdin.isatty():
            print("query> ", end="", flush=True)
        for line in sys.stdin:
            qstr = line.strip()
            if not qstr:
                break
            ids, scores, timings = engine.search_timed(
                qstr, k=args.k, mode=args.mode
            )
            if args.show_docs and len(ids):
                from oscar_ray.pipelines.facets import docmeta_lookup

                by_id = {
                    r["docid"]: r
                    for r in docmeta_lookup(args.index, ids).to_pylist()
                }
                for rank, (d, s) in enumerate(zip(ids.tolist(), scores.tolist()), 1):
                    r = by_id.get(d, {})
                    print(f"{rank}\t{d}\t{s:.6f}\t{r.get('url', '?')}")
            else:
                for rank, (d, s) in enumerate(zip(ids.tolist(), scores.tolist()), 1):
                    print(f"{rank}\t{d}\t{s:.6f}")
            phases = " ".join(
                f"{k_}={v:.0f}us"
                for k_, v in timings.items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)
            )
            if timings.get("reason"):
                phases += f" ({timings['reason']})"
            print(f"# {len(ids)} results; {phases}", file=sys.stderr)
            if not len(ids) and not timings.get("error"):
                for hint in _did_you_mean(reader, qstr):
                    print(hint, file=sys.stderr)
            if args.subset is not None:
                # LiveCompleter.cpp:222-224 ghsg().subSet over the FULL
                # match set (not just the printed top-k)
                import time as _time

                from oscar_ray.pipelines.subset import subset_tree_from_index

                _ensure_ray()
                t0 = _time.perf_counter()
                _print_tree(
                    subset_tree_from_index(
                        args.index, qstr, max_children=args.subset
                    ).to_pylist()
                )
                print(
                    f"# ghsg= {(_time.perf_counter() - t0) * 1e6:.0f}us",
                    file=sys.stderr,
                )
            if sys.stdin.isatty():
                print("query> ", end="", flush=True)
        return
    if args.cmd == "mdrop":
        n = reader.drop_caches(page_cache=True)
        print(json.dumps({"fadvised_files": n}))
        return
    if args.cmd == "bench":
        # the reference's --benchmark loop (``oscar-cmd/Benchmark.cpp:98-332``):
        # per query, optional cold protocol (drop_caches analog) then
        # `runs` warm evaluations with the LAST counting; prints per-phase
        # total/min/max/mean/median microseconds
        import numpy as np

        from oscar_ray.query.engine import QueryEngine

        engine = QueryEngine(args.index, reader)
        with open(args.file) as f:
            queries = [line.rstrip("\n") for line in f if line.strip()]
        phases: dict[str, list] = {"parse_us": [], "expand_us": [], "eval_us": [], "total_us": []}
        if args.live:
            # per-keystroke ranked completion (the LiveCompleter loop: the
            # reference recompletes on every keystroke, LiveCompleter.cpp)
            phases["complete_us"] = []
        n_results = []
        keystrokes = 0
        for q in queries:
            if args.cold:
                reader.drop_caches(page_cache=True)
                engine = QueryEngine(args.index, reader)
            runs = 1 if args.cold else max(1, args.runs)
            for _ in range(runs):
                ids, _sc, t = engine.search_timed(q, k=args.k)
            for key in ("parse_us", "expand_us", "eval_us"):
                phases[key].append(t[key])
            phases["total_us"].append(t["parse_us"] + t["expand_us"] + t["eval_us"])
            n_results.append(len(ids))
            if args.live:
                from oscar_ray.spec.tokenizer import tokenize_text

                toks = tokenize_text(q)
                first = toks[0] if toks else ""
                for i in range(1, len(first) + 1):
                    t0 = time.perf_counter()
                    reader.complete(first[:i], k=10)
                    phases["complete_us"].append((time.perf_counter() - t0) * 1e6)
                    keystrokes += 1
        stats = {}
        for key, vals in phases.items():
            a = np.array(vals) if vals else np.zeros(1)
            stats[key] = {
                "total": round(float(a.sum()), 1),
                "min": round(float(a.min()), 1),
                "max": round(float(a.max()), 1),
                "mean": round(float(a.mean()), 1),
                "median": round(float(np.median(a)), 1),
                # tail latency (the reference prints min/max/mean/median,
                # Benchmark.cpp:243-305; p95/p99 added for SLO evidence)
                "p95": round(float(np.percentile(a, 95)), 1),
                "p99": round(float(np.percentile(a, 99)), 1),
            }
        out = {
            "queries": len(queries),
            "mode": "cold" if args.cold else f"warm(last of {args.runs})",
            "result_rows": int(sum(n_results)),
            "phases_us": stats,
            "qps": round(len(queries) / max(sum(phases["total_us"]) / 1e6, 1e-9), 1),
        }
        if args.live:
            out["keystrokes"] = keystrokes
        print(json.dumps(out))
        return
    if args.cmd == "gen-queries":
        from oscar_ray.sources.queryset import generate_queries

        dfs: dict[str, int] = {}
        for part in range(reader.num_partitions):
            for term, (df, _cf) in reader._part_dict(part).items():
                if not term.startswith(("\x01", "\x02")):
                    dfs[term] = df
        for q in generate_queries(dfs, n_queries=args.n, seed=args.seed):
            print(q["query"])
        return
    if args.cmd == "stats":
        print(json.dumps(reader.manifest["stats"], indent=1))
        print(json.dumps({"vocabulary": reader.vocabulary_size()}))
    elif args.cmd == "dump-dict":
        for part in range(reader.num_partitions):
            for term, (df, cf) in sorted(reader._part_dict(part).items())[:5]:
                print(f"{term}\tdf={df}\tcf={cf}\t(part {part})")
    elif args.cmd == "dump-term":
        tp = reader.postings(args.term)
        print(json.dumps({"term": args.term, "df": tp.df, "cf": tp.cf,
                          "blocks": len(tp.block_ids)}))
        if tp.df:
            ids, tfs, dls = tp.decode_all()
            for i in range(min(args.head, len(ids))):
                print(f"docid={ids[i]} tf={tfs[i]} doclen={dls[i]}")
    elif args.cmd == "query":
        if args.cold:
            n = reader.drop_caches(page_cache=True)
            print(f"# cold: dropped caches ({n} files fadvised)", file=sys.stderr)
        engine = QueryEngine(args.index, reader, parallel_fetch=True)
        if any(tok.startswith("*") for tok in args.query.split()) and not (
            reader.manifest["config"].get("index_suffixes")
        ):
            print(
                "# warning: substring/suffix query against an index built "
                "without index_suffixes — it will match nothing",
                file=sys.stderr,
            )
        if args.boost_index:
            import numpy as np

            ignored = [
                f
                for f, v in (
                    ("--mode", args.mode != "auto"),
                    ("--show-docs", bool(args.show_docs)),
                    ("--snippets", bool(args.snippets)),
                )
                if v
            ]
            if ignored:
                print(
                    "# warning: --boost-index ignores "
                    + ", ".join(ignored)
                    + " (combined-scoring path prints rank\\tid\\tscore only)",
                    file=sys.stderr,
                )

            boost = QueryEngine(args.boost_index, parallel_fetch=True)
            bi_, bs_ = engine.search(args.query, k=1 << 62)
            ai_, as_ = boost.search(args.query, k=1 << 62)
            bi_, ai_ = bi_.astype(np.int64), ai_.astype(np.int64)
            bo, ao = np.argsort(bi_), np.argsort(ai_)
            bi_, bs_, ai_, as_ = bi_[bo], bs_[bo], ai_[ao], as_[ao]
            all_ids = np.union1d(bi_, ai_)
            s = np.zeros(len(all_ids), dtype=np.float64)
            s[np.searchsorted(all_ids, bi_)] += bs_
            s[np.searchsorted(all_ids, ai_)] += args.boost_weight * as_
            order = np.lexsort((all_ids, -s))[: args.k]
            for rank, j in enumerate(order, 1):
                print(f"{rank}\t{all_ids[j]}\t{s[j]:.6f}")
            print(
                f"# {len(all_ids)} combined matches "
                f"(field boost w={args.boost_weight})",
                file=sys.stderr,
            )
            return
        ids, scores, timings = engine.search_timed(args.query, k=args.k, mode=args.mode)
        if args.show_docs and len(ids):
            from oscar_ray.pipelines.facets import docmeta_lookup

            meta = docmeta_lookup(args.index, ids)
            by_id = {r["docid"]: r for r in meta.to_pylist()}
            for rank, (d, s) in enumerate(zip(ids.tolist(), scores.tolist()), 1):
                r = by_id.get(d, {})
                print(
                    f"{rank}\t{d}\t{s:.6f}\t{r.get('url', '?')}"
                    f"\t{r.get('lang', '?')}\tdoclen={r.get('doclen', '?')}"
                )
        else:
            for rank, (d, s) in enumerate(zip(ids.tolist(), scores.tolist()), 1):
                print(f"{rank}\t{d}\t{s:.6f}")
        if args.snippets and len(ids):
            import pyarrow.dataset as pads

            from oscar_ray.spec.tokenizer import tokenize_text

            terms = set()
            for tok in args.query.split():
                if tok in ("+", "-", "^", "/", "(", ")") or tok.startswith(
                    ("@", "*", "(")
                ) or "*" in tok:
                    continue
                terms.update(tokenize_text(tok))
            dset = pads.dataset(args.snippets)
            idcol = "doc_id"
            tbl = dset.to_table(
                columns=[idcol, "text"],
                filter=pads.field(idcol).isin(ids.tolist()),
            )
            text_of = dict(
                zip(tbl[idcol].to_pylist(), tbl["text"].to_pylist())
            )
            for rank, d in enumerate(ids.tolist(), 1):
                toks = tokenize_text(text_of.get(d) or "")
                p = next((i for i, t_ in enumerate(toks) if t_ in terms), None)
                if p is None:
                    print(f"{rank}\t{d}\t(no plain-term hit)")
                    continue
                parts = (
                    toks[max(0, p - 3) : p]
                    + ["[" + toks[p] + "]"]
                    + toks[p + 1 : p + 4]
                )
                print(f"{rank}\t{d}\t{' '.join(parts)}")
        phases = " ".join(
            f"{k_}={v:.0f}us"
            for k_, v in timings.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        )
        if timings.get("reason"):
            phases += f" ({timings['reason']})"
        if timings.get("error"):
            phases += " (parse error -> empty result)"
        print(f"# {len(ids)} results; {phases}", file=sys.stderr)
        if not len(ids) and not timings.get("error"):
            for hint in _did_you_mean(reader, args.query):
                print(hint, file=sys.stderr)


if __name__ == "__main__":
    main()
