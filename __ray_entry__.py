"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents index build + batch
BM25 serving) on sf0.001. ``queries()`` exposes one callable per
implemented operator family (SURVEY.md §2); ``oracle_sql()`` gives the
DuckDB-equivalent SQL where the op is SQL-expressible (non-SQL ops —
LSH/simhash internals, sketches, approximate ANN, multimodal — are
rows-only checked).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().

Float-determinism notes (so value-hashes match):
- money sums ride as exact integers: floor(x * 100) per row (identical
  IEEE ops in both engines), summed exactly;
- BM25 / cosine scores are rounded (4-6 decimals) AFTER ranking.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# pinned query constants shared by the Ray and SQL sides
BM25_TERM = "merge"
BM25_AND = "hash join"
BM25_OR_TERMS = ("scan", "filter")
BM25_NOT = ("scan", "hash")
BM25_PREFIX = "s"  # expands to scan/slow/small/sort/spark/... (qt=prefix analog)
SUBSTR_TOKEN = "erg"  # *erg* — matches merge/merges/... via the suffix index
PHRASE_Q = ("merge", "join")  # "merge join" — adjacent-token phrase
NEAR_Q, NEAR_SLOP = ("hash", "join"), 3  # "hash join"~3 proximity window
FUZZY_TERM, FUZZY_DIST = "part", 2  # part~2 -> {fast, part, sort, spark}
REGEX_PAT = "s(can|ort)"  # %s(can|ort)% -> {scan, sort} (RE2 both sides)
COMPLETE_PREFIX, COMPLETE_K = "s", 10  # completion suggestions for 's'
SUGGEST_TERM, SUGGEST_DIST, SUGGEST_K = "sor", 2, 10  # did-you-mean 'sor'
MIN_SUFFIX_LEN_SQL = 2  # == IndexBuildConfig.min_suffix_len
HYBRID_DEPTH, RRF_C = 1000, 60  # hybrid-retrieval fusion constants
K1, B = 0.9, 0.4
NGRAM_N, JACCARD_TAU, MAX_SHINGLE_DF = 3, 0.2, 100
DECONTAM_MOD = 97  # synthetic benchmark subset: doc_id % 97 == 0
SCRUB_DENYLIST = ("dup", "slow", "spark")  # sorted; whole-word blocklist
SCRUB_PLANT_MOD = 3  # every 3rd doc gets deterministic planted PII
SEQ_BUDGET = 512  # tokens per packed training sequence
SAMPLE_SEED = "s42"  # seeded-hash sampling namespace
SAMPLE_RATES_MICRO = {"en": 600_000, "es": 350_000, "zh": 200_000}
SAMPLE_DEFAULT_MICRO = 100_000
SOURCE_CAP = 15  # max docs kept per source (testdata: ~25/source, so it bites)
SPAN_K = 8  # tokens per dedup span (C4-style repeated-span removal)
SUBSTR_W = 8  # window width for ExactSubstr sliding-window dedup
BPE_MERGES = 64  # merges learned by the corpus-trained BPE tokenizer
CURATE_QMIN_MICRO = 300_000  # quality gate for the end-to-end curation pipeline
COSINE_TAU = 0.4  # testdata embeddings are near-orthogonal (max pair ~0.51)
ANN_K, ANN_NQ = 10, 3
MAX_PREFIX_EXPANSIONS_SQL = 256  # == oscar_ray.query.engine.MAX_PREFIX_EXPANSIONS
TOKEN_SPLIT_SQL = "[^a-z0-9]+"  # spec tokenizer == this for ascii-lower corpora
FP_MOD_SQL = (1 << 61) - 1  # == oscar_ray.stages.text_analysis.FP_MOD
FP_BASE_SQL = 1_000_003  # == oscar_ray.stages.text_analysis.FP_BASE


def entry() -> Any:
    """Flagship: build the documents index at sf0.001, serve a query batch."""
    import ray.data

    from oscar_ray.pipelines.search import documents_index_dir
    from oscar_ray.query.engine import QueryServer

    sf_dir = "/root/testdata/sf0.001"
    index_dir = documents_index_dir(sf_dir)
    queries = [
        {"query_id": 0, "query": "merge", "k": 10},
        {"query_id": 1, "query": "hash join", "k": 10},
        {"query_id": 2, "query": "scan + filter", "k": 10},
        {"query_id": 3, "query": "table - index", "k": 10},
        {"query_id": 4, "query": "(sort + group) window", "k": 10},
    ]
    qds = ray.data.from_items(queries, override_num_blocks=2)
    return qds.map_batches(
        QueryServer,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        concurrency=2,
    )


# ---------------------------------------------------------------------------


def _search_term_stats(sf_dir: str):
    from oscar_ray.pipelines.search import term_stats_table

    return term_stats_table(sf_dir)


def _search_doc_lengths(sf_dir: str):
    from oscar_ray.pipelines.search import doc_lengths_table

    return doc_lengths_table(sf_dir)


def _search_bm25_term(sf_dir: str):
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, BM25_TERM, k=None)


def _search_bm25_and(sf_dir: str):
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, BM25_AND, k=None)


def _search_bm25_or(sf_dir: str):
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"{BM25_OR_TERMS[0]} + {BM25_OR_TERMS[1]}", k=None)


def _search_bm25_andnot(sf_dir: str):
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"{BM25_NOT[0]} - {BM25_NOT[1]}", k=None)


def _search_bm25_prefix(sf_dir: str):
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"{BM25_PREFIX}*", k=None)


def _search_completions(sf_dir: str):
    """Top-k completion suggestions (term, df) for COMPLETE_PREFIX —
    the term-level LiveCompletion surface (oscar-cmd/LiveCompleter.cpp)."""
    from oscar_ray.pipelines.search import completion_table

    return completion_table(sf_dir, COMPLETE_PREFIX, k=COMPLETE_K)


def _search_suggest(sf_dir: str):
    """Did-you-mean suggestions (term, dist, df) for SUGGEST_TERM via the
    banded-DP dictionary scan; DuckDB levenshtein is the oracle."""
    from oscar_ray.pipelines.search import suggestion_table

    return suggestion_table(sf_dir, SUGGEST_TERM, max_dist=SUGGEST_DIST, k=SUGGEST_K)


def _search_bm25_substring(sf_dir: str):
    """Substring search via the suffix-indexed variant (`*erg*`: prefix
    scan over the suffix-marker namespace, OR-summed BM25)."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"*{SUBSTR_TOKEN}*", k=None, suffixes=True)


def _search_bm25_lang_filter(sf_dir: str):
    """BM25 term query narrowed by a @lang: field filter (tag-scoped
    search, the TextSearchTraits tag-string analog)."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"{BM25_TERM} @lang:en", k=None)


def _search_bm25_phrase(sf_dir: str):
    """Exact-phrase query over the positional index variant: one virtual
    term scored with BM25 over the phrase's own tf (adjacency-verified
    occurrence count) and df (query/positional.py phrase_postings)."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(
        sf_dir, f'"{PHRASE_Q[0]} {PHRASE_Q[1]}"', k=None, positions=True
    )


def _search_bm25_near(sf_dir: str):
    """Proximity query `"w1 w2"~slop`: the terms' AND, narrowed to docs
    where one occurrence of each fits a window of <= slop positions
    (scores stay the plain AND scores — the window is a filter)."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(
        sf_dir, f'"{NEAR_Q[0]} {NEAR_Q[1]}"~{NEAR_SLOP}', k=None, positions=True
    )


def _search_bm25_fuzzy(sf_dir: str):
    """Fuzzy term query `term~d`: OR over all dictionary terms within
    Levenshtein distance d (vectorized DP scan of the partition
    dictionaries, reader.terms_with_edit_distance), prefix-style
    expansion cap."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"{FUZZY_TERM}~{FUZZY_DIST}", k=None)


def _search_segmented_and(sf_dir: str):
    """Federated (segmented) serving: the documents corpus split into
    block-aligned id ranges, each indexed independently, queried as ONE
    engine (index/segmented.py — global df/avgdl, no merge). Oracle is
    the plain whole-corpus AND query: federation must be invisible."""
    from oscar_ray.pipelines.search import segmented_scores_table

    return segmented_scores_table(sf_dir, BM25_AND, k=None)


def _search_sharded_and(sf_dir: str):
    """Doc-sharded serving (query/sharded.py): 4 actors each holding one
    docid-block slice of every posting list, the query fanned out and
    exactly merged. Oracle is the plain whole-corpus AND query: document
    partitioning must be invisible (global stats in every shard)."""
    from oscar_ray.pipelines.search import sharded_scores_table

    return sharded_scores_table(sf_dir, BM25_AND, n_shards=4)


def _search_bm25_regex(sf_dir: str):
    """Regex term query `%pat%` (Lucene RegexpQuery analog): OR over all
    dictionary terms fully matching the RE2 pattern (one vectorized
    arrow match per partition dictionary), prefix-style cap."""
    from oscar_ray.pipelines.search import bm25_scores_table

    return bm25_scores_table(sf_dir, f"%{REGEX_PAT}%", k=None)


def _search_snippets(sf_dir: str):
    """KWIC snippet/highlight work item: the OR match set resolved by
    the index, then a streaming corpus pass emits the +-3-token context
    around the first hit with the matched token bracketed (the
    --show-docs item print upgraded to contextual highlighting)."""
    from oscar_ray.pipelines.search import kwic_snippets

    return kwic_snippets(
        sf_dir,
        f"{BM25_OR_TERMS[0]} + {BM25_OR_TERMS[1]}",
        terms=BM25_OR_TERMS,
        window=3,
    )


def _search_facets(sf_dir: str):
    from oscar_ray.pipelines.facets import search_facets

    return search_facets(sf_dir, BM25_AND, facet_cols=("lang", "source"), topk=10)


def _search_shannon_facets(sf_dir: str):
    from oscar_ray.pipelines.facets import search_shannon_facets

    return search_shannon_facets(sf_dir, BM25_AND, facet_cols=("lang", "source"))


def _search_subset_tree(sf_dir: str):
    """Hierarchical drill-down over the match set — the GeoHierarchy
    ``subSet`` analog (``oscar-cmd/LiveCompleter.cpp:222-224``;
    ``oscar-create/CellCreator.cpp:196-402``): count-annotated public
    suffix -> registered domain -> host tree over the docs matching the
    AND query. URLs synthesized with mixed public suffixes (com / co.uk
    / org / com.au, the text_domain_stats fixture rule); the Ray side
    parses real URL strings (RE2 host extraction + suffix-aware domain
    reduction), the oracle recomputes the hierarchy arithmetically from
    doc_id/source — two independent implementations."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from oscar_ray.pipelines.search import documents_index_dir
    from oscar_ray.pipelines.subset import subset_tree

    _TLDS = np.array(["com", "co.uk", "org", "com.au"])

    def mk_urls(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        sub = pa.array(np.char.add("w", (did % 7).astype(str)))
        tld = pa.array(_TLDS[did % 4])
        ids = pa.array(did.astype(str))
        url = pc.binary_join_element_wise(
            "https://", sub, ".", t["source"].combine_chunks(), ".", tld, "/a/", ids, ""
        )
        return pa.table({"doc_id": t["doc_id"], "url": url})

    idx = documents_index_dir(sf_dir)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    ).map_batches(mk_urls, batch_format="pyarrow")
    return subset_tree(idx, docs, BM25_AND, concurrency=2)


def _search_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-1000 fused with embedding-
    cosine top-1000 by reciprocal-rank fusion (c=60), top-10."""
    from oscar_ray.pipelines.search import hybrid_search_rrf

    return hybrid_search_rrf(
        sf_dir,
        BM25_TERM,
        _queries_embeddings(sf_dir)[0],
        k=10,
        depth=HYBRID_DEPTH,
        rrf_c=RRF_C,
    )


def _search_shannon_topkv(sf_dir: str):
    """Shannon-clustering topKeyValues: key-values ranked by distance to
    the 0.5 * |matched| split point, with a key-value exclusion applied
    (the --shannon-kvstats topKeyValues surface)."""
    from oscar_ray.pipelines.facets import shannon_top_keyvalues

    return shannon_top_keyvalues(
        sf_dir,
        BM25_AND,
        facet_cols=("lang", "source"),
        threshold=0.5,
        topn=10,
        keyvalue_exclusions=(("lang", "en"),),
    )


def _search_hydrate(sf_dir: str):
    from oscar_ray.pipelines.facets import hydrate_results

    return hydrate_results(sf_dir, BM25_TERM, k=10)


def _rel_lineitem_agg(sf_dir: str):
    from oscar_ray.pipelines.relational import lineitem_agg

    return lineitem_agg(sf_dir)


def _rel_customer_order_join(sf_dir: str):
    from oscar_ray.pipelines.relational import customer_order_join

    return customer_order_join(sf_dir)


def _rel_top_parts(sf_dir: str):
    from oscar_ray.pipelines.relational import top_parts_by_size

    return top_parts_by_size(sf_dir)


def _rel_order_facets(sf_dir: str):
    from oscar_ray.pipelines.relational import order_status_facets

    return order_status_facets(sf_dir)


def _rel_facet_entropy(sf_dir: str):
    from oscar_ray.pipelines.relational import facet_entropy

    return facet_entropy(sf_dir)


def _rel_customer_setops(sf_dir: str):
    from oscar_ray.pipelines.relational import customer_set_ops

    return customer_set_ops(sf_dir)


def _rel_events_window(sf_dir: str):
    from oscar_ray.pipelines.relational import events_window_counts

    return events_window_counts(sf_dir)


def _rel_events_sliding(sf_dir: str):
    from oscar_ray.pipelines.relational import events_sliding_window

    return events_sliding_window(sf_dir)


def _rel_events_asof(sf_dir: str):
    from oscar_ray.pipelines.relational import events_asof_join

    return events_asof_join(sf_dir)


def _rel_events_range_join(sf_dir: str):
    """Self range-join: per event, count + micro-value sum of same-user
    events in the following hour — the interval-join custom operator
    (rank-trick composite searchsorted, one key exchange)."""
    from oscar_ray.pipelines.relational import events_follow_window

    return events_follow_window(sf_dir)


def _rel_events_sessions(sf_dir: str):
    from oscar_ray.pipelines.relational import events_sessions

    return events_sessions(sf_dir)


def _rel_events_json(sf_dir: str):
    from oscar_ray.pipelines.relational import events_json_stats

    return events_json_stats(sf_dir)


def _emb_label_centroids(sf_dir: str):
    from oscar_ray.pipelines.relational import embedding_label_centroids

    return embedding_label_centroids(sf_dir)


def _dedup_exact(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.dedup import exact_dedup_groups

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return exact_dedup_groups(ds).sort("h")


def _dedup_ngram_jaccard(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ngram_jaccard_pairs(
        ds, n=NGRAM_N, tau=JACCARD_TAU, max_shingle_df=MAX_SHINGLE_DF
    ).sort(["a_id", "b_id"])


def _dedup_clusters(sf_dir: str):
    """Connected components over exact n-gram-Jaccard pair edges."""
    import os

    import ray.data

    from oscar_ray.stages.dedup import cluster_pairs, ngram_jaccard_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = ngram_jaccard_pairs(ds, n=NGRAM_N, tau=JACCARD_TAU, max_shingle_df=MAX_SHINGLE_DF)
    return cluster_pairs(pairs).sort_by("doc_id")


def _dedup_minhash(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return minhash_lsh_pairs(ds, n=NGRAM_N, tau=JACCARD_TAU)


def _dedup_simhash(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.dedup import simhash_dup_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return simhash_dup_pairs(ds, max_hamming=3).sort(["a_id", "b_id"])


def _text_token_stats(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import doc_token_stats

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(doc_token_stats, batch_format="pyarrow").sort("doc_id")


def _text_quality(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import QualityScorer

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=2
    ).sort("doc_id")


def _text_langid(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import LangId

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).sort("doc_id")


def _text_topk_terms(sf_dir: str):
    """Exact top-20 terms by collection frequency (heavy hitters over the
    token stream; mergeable per-batch partial counts)."""
    import os

    import ray.data

    from oscar_ray.stages.sketches import topk_frequent_terms

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return topk_frequent_terms(ds, k=20)


def _text_cms_counts(sf_dir: str):
    """Count-Min-sketch term-count estimates for the corpus vocabulary
    (mergeable per-batch sketches; estimates upper-bound exact cf —
    rows-only check, bounds pytest-verified)."""
    import os

    import pyarrow as pa
    import ray.data

    from oscar_ray.pipelines.search import term_stats_table
    from oscar_ray.stages.sketches import cms_term_counts

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    cms = cms_term_counts(ds)
    stats = term_stats_table(sf_dir)
    terms = stats["term"].to_pylist()
    est = cms.estimate(terms)
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "cf_true": stats["cf"],
            "cf_est": pa.array(est, type=pa.int64()),
        }
    ).sort_by("term")


def _text_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-term estimate next to the exact count
    (max-mergeable registers; deterministic, so rows-only-stable)."""
    import os

    import pyarrow as pa
    import ray.data

    from oscar_ray.pipelines.search import term_stats_table
    from oscar_ray.stages.sketches import hll_distinct_terms

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    est = hll_distinct_terms(ds, p=12)
    exact = term_stats_table(sf_dir).num_rows
    return pa.table(
        {
            "distinct_exact": pa.array([exact], type=pa.int64()),
            "distinct_hll": pa.array([int(round(est))], type=pa.int64()),
        }
    )


def _text_repetition(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import doc_repetition_stats

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(doc_repetition_stats, batch_format="pyarrow").sort("doc_id")


def _text_fingerprint(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import doc_fingerprint

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(doc_fingerprint, batch_format="pyarrow").sort("doc_id")


def _text_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs whose token-3-gram shingles overlap
    the synthetic 'benchmark' subset (doc_id % DECONTAM_MOD == 0 — a
    deterministic stand-in for a real eval set, which at scale is a tiny
    broadcast next to the corpus)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.decontam import decontaminate

    path = os.path.join(sf_dir, "documents.parquet")
    cols = ["doc_id", "text"]

    def _mod_filter(is_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            mod = t["doc_id"].to_numpy() % DECONTAM_MOD
            return t.filter(pa.array(mod == 0 if is_bench else mod != 0))

        return f

    bench = ray.data.read_parquet(path, columns=cols).map_batches(
        _mod_filter(True), batch_format="pyarrow"
    )
    corpus = ray.data.read_parquet(path, columns=cols).map_batches(
        _mod_filter(False), batch_format="pyarrow"
    )
    return decontaminate(corpus, bench, n=NGRAM_N, concurrency=4).sort("doc_id")


def _text_scrub(sf_dir: str):
    """PII + denylist scrubbing. The corpus has no natural PII, so every
    SCRUB_PLANT_MOD-th doc gets a deterministic planted suffix (email +
    IPv4 + phone derived from doc_id) — appended identically in the SQL
    oracle — before the RE2 redaction stage runs; the remaining docs
    exercise the no-match and denylist-only branches."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from oscar_ray.stages.scrub import scrub_documents

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()

        def s(a) -> pa.Array:
            return pa.array(a.astype(np.int64)).cast(pa.string())

        suffix = pc.binary_join_element_wise(
            " contact user",
            s(ids),
            "@mail.example.com from 10.",
            s(ids % 200),
            ".",
            s(ids * 7 % 200),
            ".",
            s(ids % 250),
            " or call +1 (555) 010-",
            s(1000 + ids % 9000),
            "",
        )
        planted = pc.binary_join_element_wise(t["text"], suffix, "")
        text = pc.if_else(pa.array(ids % SCRUB_PLANT_MOD == 0), planted, t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": text})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(plant, batch_format="pyarrow")
    return scrub_documents(ds, denylist=SCRUB_DENYLIST).sort("doc_id")


def _text_pack_sequences(sf_dir: str):
    """Training-layout sequence packing: a hierarchical distributed
    prefix-sum (per-part sums -> driver exclusive scan -> broadcast base
    + per-part vectorized cumsum). part_span is shrunk far below the
    at-scale default so even sf0.001 exercises the multi-part path."""
    import os

    import ray.data

    from oscar_ray.stages.packing import pack_sequences

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return pack_sequences(ds, budget=SEQ_BUDGET, part_span=64).sort("doc_id")


def _text_bigram_lm(sf_dir: str):
    """Corpus-trained add-one bigram LM scores per doc (CCNet-style
    perplexity-filter primitive): integer micro-logprob totals, exact
    vs the SQL oracle."""
    import os

    import ray.data

    from oscar_ray.stages.lm import bigram_lm_scores

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bigram_lm_scores(ds, num_parts=32, concurrency=2).sort("doc_id")


def _graph_pagerank(sf_dir: str):
    """Distributed PageRank (stages/graph.py): raw-task ref exchanges,
    integer-exact power iteration (shares (r*85)//(100*outdeg), base
    (1e12*15)//(100*N)) over a closed-form link graph — 3 out-links per
    doc at (doc_id*2654435761 + j*40503) % N, the same expression the
    SQL oracle unrolls for 5 iterations."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from oscar_ray.stages.graph import pagerank

    src_path = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(src_path).metadata.num_rows  # footer only

    def mk_edges(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy().astype(np.int64)
        srcs, dsts = [], []
        for j in (1, 2, 3):
            srcs.append(did)
            dsts.append((did * np.int64(2654435761) + j * np.int64(40503)) % n)
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs)),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )

    edges = ray.data.read_parquet(src_path, columns=["doc_id"]).map_batches(
        mk_edges, batch_format="pyarrow"
    )
    return pagerank(edges, n_nodes=n, iters=5, num_parts=16).sort("node")


def _text_ccnet_buckets(sf_dir: str):
    """CCNet perplexity bucketing (Wenzek et al. 2020): bigram-LM score
    -> hash_join lang back on -> per-language integer tercile thresholds
    (grouped_quantiles) -> head/middle/tail. Three distributed
    primitives composed; integer-exact vs the SQL window chain."""
    import os

    import ray.data

    from oscar_ray.stages.lm import perplexity_buckets

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return perplexity_buckets(ds, num_parts=32, concurrency=2).sort("doc_id")


def _url_canonicalize(sf_dir: str):
    """URL canonicalization (stages/urls.py::canonicalize_urls — the
    crawl-dedup pre-step): scheme/host lowercase, default ports stripped,
    empty path -> '/', query params deduped of utm_* + sorted, fragment
    dropped; all arrow kernels (extract_regex + explode/lexsort/rebuild
    for the param sort). Fixture: messy URLs synthesized per doc_id
    (mixed-case scheme/host, default + non-default ports, unsorted params
    with a tracking param, fragments); the oracle re-parses the SAME
    strings with DuckDB regexp/list functions — two independent
    implementations of the pinned rule."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.urls import canonicalize_urls

    def mk(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        scheme = np.where(did % 2 == 0, "HTTP", "https").astype(object)
        host = "WWW" + (did % 5).astype(str).astype(object) + ".Example.COM"
        port = np.where(
            did % 3 == 0,
            np.where(did % 2 == 0, ":80", ":443").astype(object),
            np.where(did % 3 == 1, ":8080", "").astype(object),
        )
        query = (
            "?b=" + (did % 3).astype(str).astype(object)
            + "&utm_source=feed&a=" + (did % 7).astype(str).astype(object)
        )
        frag = np.where(did % 2 == 0, "#s1", "").astype(object)
        url = (
            scheme + "://" + host + port
            + "/p/" + did.astype(str).astype(object) + query + frag
        )
        u = pa.array(url, type=pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": u,
                "canonical_url": canonicalize_urls(u),
            }
        )

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .map_batches(mk, batch_format="pyarrow")
        .sort("doc_id")
    )


def _text_cooccurrence(sf_dir: str):
    """Collocation extraction (stages/sketches.py::cooccurrence_pmi):
    first-16 distinct terms per doc -> vectorized pair expansion -> one
    pair-routed count exchange + one term-routed doc-count exchange ->
    two partitioned hash_joins -> integer-micro PMI (ln once per count,
    floors summed as int64). min support 5 docs."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from oscar_ray.stages.sketches import cooccurrence_pmi

    src = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(src).metadata.num_rows
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    return cooccurrence_pmi(ds, n_docs=n).sort(["term_a", "term_b"])


def _graph_hits(sf_dir: str):
    """Distributed HITS (stages/graph.py::hits): per iteration one forward
    and one reverse co-located edge exchange + two scalar max allreduces;
    the classic L2 normalization is replaced by the pinned integer rescale
    x*S//max(x), so every parallelism level and the unrolled SQL CTE chain
    are bit-identical. Same closed-form 3-out-link graph as
    graph_pagerank."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from oscar_ray.stages.graph import hits

    src_path = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(src_path).metadata.num_rows

    def mk_edges(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy().astype(np.int64)
        srcs, dsts = [], []
        for j in (1, 2, 3):
            srcs.append(did)
            dsts.append((did * np.int64(2654435761) + j * np.int64(40503)) % n)
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs)),
                "dst": pa.array(np.concatenate(dsts)),
            }
        )

    edges = ray.data.read_parquet(src_path, columns=["doc_id"]).map_batches(
        mk_edges, batch_format="pyarrow"
    )
    return hits(edges, n_nodes=n, iters=3, num_parts=16).sort("node")


def _link_anchor_stats(sf_dir: str):
    """Anchor-text inheritance aggregate (the reference's region-inherited
    strings, SURVEY.md M6, as its webtext analog — stages/links.py): real
    ``<a href>`` regex extraction over the linked-pages fixture html, one
    hash-routed exchange keyed on dst_url, per-part vectorized sort + cap
    (first 8 inlinks in (src, link_pos) order) + tokenizer-normalized
    anchor join. (doc_id, n_inlinks, anchor_text), one row per target."""
    from oscar_ray.pipelines.anchors import anchors_dataset

    return anchors_dataset(sf_dir).sort("doc_id")


def _search_bm25_anchor(sf_dir: str):
    """BM25 over the anchor-ENRICHED index: every doc is also searchable
    under the anchor text of its inlinks (IndexBuildConfig
    .extra_text_columns — build.py stage A appends the inherited token
    stream, so anchors contribute tf/doclen like body tokens). Full match
    set for the pinned head term; scores bit-identical to the SQL oracle
    whose token stream unions body tokens with capped anchor tokens."""
    import numpy as np
    import pyarrow as pa

    from oscar_ray.pipelines.anchors import anchored_documents_index_dir
    from oscar_ray.query.engine import QueryEngine

    eng = QueryEngine(anchored_documents_index_dir(sf_dir))
    ids, scores = eng.search(BM25_TERM, k=1 << 62)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "score": pa.array(np.round(scores, 4), type=pa.float64()),
        }
    ).sort_by("doc_id")


def _rel_order_lineitem_join(sf_dir: str):
    """Large-large partitioned equi-join (stages/joins.py::hash_join):
    lineitem x orders on orderkey — both sides stream through ONE
    co-routed exchange; per-part vectorized arrow join; integer-micro
    revenue aggregate per (priority, returnflag)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    j = hash_join(li, orders, on=("l_orderkey", "o_orderkey"), num_parts=32, concurrency=2)

    import pyarrow.compute as pc

    def add_cents(t: pa.Table) -> pa.Table:
        # same IEEE op order as the SQL: floor((price * (1-disc)) * 100)
        rev = pc.multiply(
            pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            ),
            pa.scalar(100.0),
        )
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "l_returnflag": t["l_returnflag"],
                "qty": t["l_quantity"].cast(pa.int64()),
                "rev": pc.floor(rev).cast(pa.int64()),
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        j.map_batches(add_cents, batch_format="pyarrow")
        .groupby(["o_orderpriority", "l_returnflag"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("rev", alias_name="sum_revenue_cents"),
            Sum("n", alias_name="n_rows"),
        )
    )
    return out.sort(["o_orderpriority", "l_returnflag"])


def _text_nb_quality(sf_dir: str):
    """Model-based quality filter (NBSVM log-count ratios over hashed
    unigrams, curated-source weak labels): closed-form training + doc
    scoring in one routed exchange, integer-micro scores exact vs SQL."""
    import os

    import ray.data

    from oscar_ray.stages.classify import nb_quality_scores

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return nb_quality_scores(ds, num_parts=32, concurrency=2).sort("doc_id")


def _emb_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): spherical k-means partitioning +
    within-cluster greedy cosine near-dup removal (lowest id wins).
    No SQL oracle (iterative k-means); pytest brute-force parity."""
    import os

    import ray.data

    from oscar_ray.stages.similarity import semantic_dedup

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return semantic_dedup(
        ds, k=8, threshold=COSINE_TAU, n_iter=4, concurrency=2
    ).sort("vec_id")


def _text_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    multinomial log ratios vs the curated-source target distribution,
    integer-micro exact vs SQL; zero data shuffle (O(D) model
    tree-reduced, lam broadcast once)."""
    import os

    import ray.data

    from oscar_ray.stages.dsir import dsir_weights

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return dsir_weights(ds, concurrency=2).sort("doc_id")


def _text_dsir_select(sf_dir: str):
    """DSIR Gumbel-top-k resample: top-100 docs by logw + hashed-uniform
    Gumbel key (the paper's without-replacement sampler, pinned
    deterministic); per-block partial top-k tree-reduced to k rows."""
    import os

    import ray.data

    from oscar_ray.stages.dsir import dsir_select

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return dsir_select(ds, k=100, concurrency=2)


def _text_length_quantiles(sf_dir: str):
    """Exact per-language doc-length percentiles (percentile_disc
    semantics, integer-exact thresholds): batch-level (group, value)
    count pre-aggregation + ONE group-routed exchange."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from oscar_ray.stages.quantiles import grouped_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    ).map_batches(
        lambda t: pa.table(
            {
                "lang": t["lang"],
                "len": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_quantiles(ds, "lang", "len", concurrency=2).sort("lang")


def _text_domain_stats(sf_dir: str):
    """Per-registered-domain stats over URLs synthesized with mixed
    public suffixes (com / co.uk / org / com.au): vectorized RE2 host
    extraction + suffix-aware domain reduction (stages/urls.py), batch
    distinct-host pre-aggregation, ONE hash(domain)-routed exchange."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from oscar_ray.stages.urls import domain_stats

    _TLDS = np.array(["com", "co.uk", "org", "com.au"])

    def mk_urls(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        sub = pa.array(np.char.add("w", (did % 7).astype(str)))
        tld = pa.array(_TLDS[did % 4])
        ids = pa.array(did.astype(str))
        url = pc.binary_join_element_wise(
            "https://", sub, ".", t["source"].combine_chunks(), ".", tld, "/a/", ids, ""
        )
        return pa.table({"url": url, "n_chars": t["n_chars"]})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    ).map_batches(mk_urls, batch_format="pyarrow")
    return domain_stats(ds, chars_col="n_chars", concurrency=2).sort("domain")


def _text_warc_roundtrip(sf_dir: str):
    """Common-Crawl container round trip: documents -> deterministic
    WARC response shards (one Ray write task per parquet fragment,
    atomic + finished-skip resumable) -> distributed WARC parse +
    html->text extraction; hash-exact vs the source table. Proves the
    engine ingests/emits the real crawl layout (sources/warc.py)."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from oscar_ray.sources.pages import (
        input_fingerprint,
        list_fragments,
        read_fragment,
    )
    from oscar_ray.sources.warc import read_warc_file, warc_write
    from oscar_ray.spec.extract import extract_text, make_html

    src = os.path.join(sf_dir, "documents.parquet")
    frags = list_fragments(src)
    out_dir = os.path.join("/tmp/oscar_ray_warc", input_fingerprint(frags))
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def write_shard(frag_dict: dict, i: int) -> str:
        path = os.path.join(out_dir, f"shard-{i:05d}.warc.gz")
        if os.path.exists(path):  # atomic writes: existing == finished
            return path
        tbl = read_fragment(
            frag_dict, columns=["text", "lang", "source"], id_column="doc_id"
        )
        ids = tbl["docid"].cast(pa.string())
        urls = pc.binary_join_element_wise(
            "https://", tbl["source"], ".example/d/", ids, ""
        )
        ts = pc.multiply(tbl["docid"], 1_000_000).cast(pa.timestamp("us"))
        htmls = [
            make_html(t, title=u)
            for t, u in zip(tbl["text"].to_pylist(), urls.to_pylist())
        ]
        warc_write(
            path,
            pa.table(
                {
                    "url": urls,
                    "warc_ts": ts,
                    "html": pa.array(htmls, type=pa.binary()),
                    "lang": tbl["lang"],
                }
            ),
        )
        return path

    paths = ray.get(
        [write_shard.remote(f.to_dict(), i) for i, f in enumerate(frags)]
    )

    def parse_shard(batch: pa.Table) -> pa.Table:
        tabs = []
        for p in batch["path"].to_pylist():
            t = read_warc_file(p)
            text = pa.array(
                [extract_text(h) for h in t["html"].to_pylist()],
                type=pa.string(),
            )
            tabs.append(
                pa.table(
                    {
                        "url": t["url"],
                        "ts_us": t["warc_ts"].cast(pa.int64()),
                        "lang": t["lang"],
                        "text": text,
                    }
                )
            )
        return pa.concat_tables(tabs)

    ds = ray.data.from_arrow(pa.table({"path": sorted(paths)})).repartition(
        max(1, len(paths))
    )
    return ds.map_batches(parse_shard, batch_format="pyarrow").sort("url")


def _text_tfidf_keywords(sf_dir: str):
    """Per-doc top-5 keywords by tf-idf: routed df exchange + per-doc
    top-k, integer-micro idf exact vs the SQL window oracle."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from oscar_ray.stages.sketches import tfidf_keywords

    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.ParquetFile(path).metadata.num_rows  # footer only
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return tfidf_keywords(ds, n_docs=n_docs, k=5, num_parts=32, concurrency=2).sort(
        ["doc_id", "rank"]
    )


def _text_topk_terms_by_lang(sf_dir: str):
    """Exact per-language top-10 terms by collection frequency: routed
    partial counts (hash(term) % P keeps every (lang, term) pair in one
    partition), per-partition per-group local top-k, group-count-bounded
    driver merge."""
    import os

    import ray.data

    from oscar_ray.stages.sketches import topk_terms_by_group

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "lang"]
    )
    return topk_terms_by_group(ds, group_col="lang", k=10)


def _text_dedup_spans(sf_dir: str):
    """C4-style span-level dedup: every repeated K-token span is dropped
    except its first occurrence (ordered by doc_id, span_idx), then docs
    are rewritten from their surviving spans. Globally exact: each span
    hash is routed to exactly one partition."""
    import os

    import ray.data

    from oscar_ray.stages.spans import dedup_spans

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dedup_spans(ds, k=SPAN_K, num_parts=32, rewrite=True).sort("doc_id")


def _text_dedup_substr(sf_dir: str):
    """ExactSubstr dedup (Lee et al. 2022): windows slide at stride 1,
    so any duplicated run of >= W tokens is cut from every occurrence
    but the globally first (ordered by doc_id, pos) — duplicate ranges
    at ARBITRARY alignment, strictly finer than C4 span dedup. Window
    keys are position-weighted prefix-sum hashes in the mod-2^64 ring,
    computed identically by numpy uint64 wrap and DuckDB HUGEINT."""
    import os

    import ray.data

    from oscar_ray.stages.substr import dedup_substrings

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return dedup_substrings(ds, w=SUBSTR_W, num_parts=32, rewrite=True).sort("doc_id")


def _text_bpe_tokens(sf_dir: str):
    """Corpus-trained BPE tokenizer (Sennrich et al. 2016 Algorithm 1)
    applied back to the corpus: one hash-routed exact word-count
    exchange collapses the corpus to a vocab-sized table, iterative
    merge learning runs on sharded persistent actors exchanging sparse
    pair-count deltas (driver holds only the pair-count table), then an
    actor-pool encode emits per-doc BPE token counts. No SQL oracle —
    iterative merge training is not DuckDB-expressible; pytest pins
    parity with a sequential reference implementation."""
    import os

    import ray.data

    from oscar_ray.stages.bpe import bpe_token_counts, train_bpe

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    model = train_bpe(
        ds, num_merges=BPE_MERGES, min_count=2, num_shards=4, concurrency=2
    )
    return bpe_token_counts(ds, model, concurrency=2).sort("doc_id")


def _text_bpe_token_ids(sf_dir: str):
    """The TERMINAL training-data step: curated corpus -> per-doc BPE
    token id sequences (list<int32>, training ids: bytes 0-255, EOW
    256, merges 257+), ready to `write_parquet` as training shards.
    Rows-only like text_bpe_tokens (BPE is not SQL-expressible);
    pytest pins ids == the sequential reference segmentation."""
    import os

    import ray.data

    from oscar_ray.stages.bpe import bpe_tokenize, train_bpe

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    model = train_bpe(
        ds, num_merges=BPE_MERGES, min_count=2, num_shards=4, concurrency=2
    )
    return bpe_tokenize(ds, model, concurrency=2).sort("doc_id")


def _pipeline_curate(sf_dir: str):
    """End-to-end curation: scrub -> quality gate -> seeded sample (one
    fused row-local actor stage) -> exact dedup keep-first -> span dedup
    rewrite -> sequence packing. One lazy streaming Dataset graph; the
    composite DuckDB oracle applies the same stages in the same pinned
    order."""
    import os

    import ray.data

    from oscar_ray.pipelines.curate import curate_corpus

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return curate_corpus(
        ds,
        denylist=SCRUB_DENYLIST,
        quality_min_micro=CURATE_QMIN_MICRO,
        rates_micro=SAMPLE_RATES_MICRO,
        default_micro=SAMPLE_DEFAULT_MICRO,
        seed=SAMPLE_SEED,
        span_k=SPAN_K,
        budget=SEQ_BUDGET,
        part_span=64,
        concurrency=2,  # two pools (gate + span explode): 4 actors, leave
        # CPU headroom for read/groupby tasks at the driver's num_cpus=8
    ).sort("doc_id")


def _text_sample_stratified(sf_dir: str):
    """Seeded per-language downsampling (training-mix shaping): keep
    docs whose md5(seed:id) bucket clears the language's micro-rate."""
    import os

    import ray.data

    from oscar_ray.stages.sampling import stratified_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return stratified_sample(
        ds, SAMPLE_RATES_MICRO, SAMPLE_DEFAULT_MICRO, seed=SAMPLE_SEED
    ).sort("doc_id")


def _text_source_cap(sf_dir: str):
    """Per-source quota (per-domain caps): <= SOURCE_CAP docs per source
    by seeded-hash order, two-phase partial + groupby finalize."""
    import os

    import ray.data

    from oscar_ray.stages.sampling import cap_per_source

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    return cap_per_source(ds, SOURCE_CAP, seed=SAMPLE_SEED).sort("doc_id")


def _queries_embeddings(sf_dir: str):
    import os

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).sort_by("vec_id")
    q = t.slice(0, ANN_NQ)
    return np.array(q["embedding"].to_pylist(), dtype=np.float64)


def _emb_mmr_topk(sf_dir: str):
    """MMR-diversified cosine top-k (Carbonell & Goldstein 1998):
    distributed top-depth candidates, bounded greedy re-rank. Greedy
    float chains are not SQL-expressible -> rows-only; parity is the
    python-reference pytest (tests/test_stages.py::TestMMR)."""
    import os

    import ray.data

    from oscar_ray.stages.similarity import mmr_rerank

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return mmr_rerank(ds, _queries_embeddings(sf_dir), k=ANN_K, depth=64, lam=0.7)


def _emb_encode(sf_dir: str):
    """Batched embedding-encoder actor stage (the GPU-model slot):
    hash-projection weights built once per actor in __init__, vectorized
    forward per batch -> (doc_id, embedding list<float32>[16], e0).
    Deterministic under any partitioning; rows-only (the float chain is
    not SQL-expressible) — correctness is the sequential-reference
    parity pytest + the encode->ANN chained test."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.encoder import encode_embeddings

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = encode_embeddings(ds, dim=16, concurrency=2)

    def add_e0(t: pa.Table) -> pa.Table:
        e0 = np.array(
            [round(float(v[0]), 4) if len(v) else 0.0 for v in t["embedding"].to_pylist()]
        )
        return t.append_column("e0", pa.array(e0, type=pa.float64()))

    return out.map_batches(add_e0, batch_format="pyarrow").sort("doc_id")


def _ann_cosine_topk(sf_dir: str):
    import os

    import ray.data

    from oscar_ray.stages.similarity import knn_brute_force

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return knn_brute_force(ds, _queries_embeddings(sf_dir), k=ANN_K)


def _ann_lsh_topk(sf_dir: str):
    """LSH ANN over the bucket-partitioned vector artifact (built+cached
    once per input): probes only admissible bucket directories; output is
    identical to the full-scan knn_lsh with the same hasher."""
    import os

    import ray.data

    from oscar_ray.sources.pages import input_fingerprint, list_fragments
    from oscar_ray.stages.similarity import build_vector_buckets, knn_lsh_partitioned

    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = input_fingerprint(list_fragments(src))
    bucket_dir = f"/tmp/oscar_ray_cache/annbuckets-{fp}"
    if not os.path.exists(os.path.join(bucket_dir, "ann_manifest.json")):
        build_vector_buckets(ray.data.read_parquet(src), bucket_dir, nbits=8)
    return knn_lsh_partitioned(bucket_dir, _queries_embeddings(sf_dir), k=ANN_K)


def _ann_nsw_topk(sf_dir: str):
    """Graph ANN (NSW — the HNSW base layer, Lucene per-segment
    layout): shard-partitioned navigable-small-world graphs built once
    per input (the expensive step, parallel across shards); one
    beam-search task per shard, tie-safe merge. Rows-only; recall>=0.95
    and exhaustive-beam parity are pytest-verified."""
    import os

    import ray.data

    from oscar_ray.sources.pages import input_fingerprint, list_fragments
    from oscar_ray.stages.similarity import knn_nsw, nsw_build

    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = input_fingerprint(list_fragments(src))
    graph_dir = f"/tmp/oscar_ray_cache/anngraph-{fp}"
    if not os.path.exists(os.path.join(graph_dir, "ann_manifest.json")):
        nsw_build(
            ray.data.read_parquet(src),
            graph_dir,
            m_links=8,
            ef_construction=40,
            shard_rows=4096,
            concurrency=2,
        )
    return knn_nsw(graph_dir, _queries_embeddings(sf_dir), k=ANN_K, ef_search=64)


def _ann_ivf_topk(sf_dir: str):
    """IVF ANN: distributed spherical k-means centroids + cluster-
    partitioned vectors; probes the nprobe nearest clusters' partitions
    only (rows-only check; nprobe=all == brute force is pytest-verified)."""
    import os

    import ray.data

    from oscar_ray.sources.pages import input_fingerprint, list_fragments
    from oscar_ray.stages.similarity import ivf_build, ivf_search

    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = input_fingerprint(list_fragments(src))
    ivf_dir = f"/tmp/oscar_ray_cache/ivf-{fp}"
    if not os.path.exists(os.path.join(ivf_dir, "ivf_manifest.json")):
        ivf_build(ray.data.read_parquet(src), ivf_dir, n_clusters=8, n_iter=5)
    return ivf_search(ivf_dir, _queries_embeddings(sf_dir), k=ANN_K, nprobe=3)


def _ann_pq_topk(sf_dir: str):
    """PQ (product-quantization) ANN: per-subspace k-means codebooks,
    m-byte codes, asymmetric-distance top-k (Jegou et al. 2011). The
    memory-scale path: a 64-float vector becomes 8 bytes. Rows-only;
    exact-codebook == brute-force parity is pytest-verified."""
    import os

    import ray.data

    from oscar_ray.stages.similarity import knn_pq, pq_encode, pq_train

    src = os.path.join(sf_dir, "embeddings.parquet")
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    books = pq_train(ds, m=8, nbits=6, n_iter=5, concurrency=2)
    codes = pq_encode(ds, books, concurrency=2)
    return knn_pq(codes, books, _queries_embeddings(sf_dir), k=ANN_K)


def _ann_ivfpq_topk(sf_dir: str):
    """IVF-PQ ANN (FAISS IVFADC shape): coarse k-means partitions hold
    only m-byte PQ codes; probes ADC-score the nprobe nearest clusters.
    Rows-only; lossless-codebook full-probe == brute force is
    pytest-verified."""
    import os

    import ray.data

    from oscar_ray.sources.pages import input_fingerprint, list_fragments
    from oscar_ray.stages.similarity import ivf_pq_build, ivf_pq_search

    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = input_fingerprint(list_fragments(src))
    d = f"/tmp/oscar_ray_cache/ivfpq-{fp}"
    if not os.path.exists(os.path.join(d, "ivfpq_manifest.json")):
        ivf_pq_build(
            ray.data.read_parquet(src, columns=["vec_id", "embedding"]),
            d, n_clusters=8, m=8, nbits=6, n_iter=4,
        )
    return ivf_pq_search(d, _queries_embeddings(sf_dir), k=ANN_K, nprobe=3)


def _emb_dup_pairs(sf_dir: str):
    import os

    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.similarity import embedding_dup_pairs

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = embedding_dup_pairs(ds, tau=COSINE_TAU).sort(["a_id", "b_id"]).take_all()
    schema = pa.schema(
        [("a_id", pa.int64()), ("b_id", pa.int64()), ("cosine", pa.float64())]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _mm_media_ds(sf_dir: str, kind: str):
    """documents doc_ids -> deterministic synthetic media payloads
    (REAL PPM/WAV/RVID bytes, decoded for real by the stages)."""
    import os

    import pyarrow as pa
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        from oscar_ray.sources.synth import (
            generate_avi,
            generate_gif,
            generate_gif_anim,
            generate_jpeg,
            generate_png,
            generate_ppm,
            generate_rvid,
            generate_wav,
            generate_wav_adpcm,
            generate_wav_g711,
        )

        gen = {
            "ppm": generate_ppm,
            "jpeg": generate_jpeg,
            "png": generate_png,
            "gif": generate_gif,
            "wav": generate_wav,
            "adpcm": generate_wav_adpcm,
            "g711": generate_wav_g711,
            "rvid": generate_rvid,
            "avi": generate_avi,
            "gif_anim": generate_gif_anim,
        }[kind]
        payload = [gen(int(d)) for d in t["doc_id"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "media": pa.array(payload, type=pa.binary())}
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


def _mm_image_features(sf_dir: str):
    """Image pipeline with a REAL (library-free) decoder: deterministic
    PPM payloads per doc -> decode -> pixel-stat + thumbnail features."""
    from oscar_ray.stages.multimodal import ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "ppm")
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "ppm", "dim": 16},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_image_features_jpeg(sf_dir: str):
    """Image pipeline over COMPRESSED payloads: deterministic baseline
    JPEGs decoded by the library-free numpy codec (real Huffman + IDCT),
    then the same feature extractor as the PPM path."""
    from oscar_ray.stages.multimodal import ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "jpeg")
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "jpeg", "dim": 16},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_image_features_png(sf_dir: str):
    """Image pipeline over LOSSLESS-compressed payloads: Paeth-filtered
    PNGs decoded by the library-free zlib+numpy codec. Because PNG is
    lossless, the features must EQUAL the PPM path's features — checked
    in pytest; the driver row is rows-only like the other mm entries."""
    from oscar_ray.stages.multimodal import ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "png")
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "png", "dim": 16},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_audio_features(sf_dir: str):
    """Audio pipeline with a REAL decoder: PCM16 WAV payloads -> RIFF
    parse -> duration/RMS/ZCR/spectral-centroid features."""
    from oscar_ray.stages.multimodal import AudioFeatureStage

    return (
        _mm_media_ds(sf_dir, "wav")
        .map_batches(
            AudioFeatureStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_image_features_gif(sf_dir: str):
    """Image pipeline over LZW-compressed payloads: palette GIFs (half
    interlaced) decoded by the library-free codec. GIF is lossless over
    its palette, so features EQUAL the same posterized raster's PPM
    features — checked in pytest; the driver row is rows-only."""
    from oscar_ray.stages.multimodal import ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "gif")
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "gif", "dim": 16},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_audio_features_adpcm(sf_dir: str):
    """Audio pipeline over COMPRESSED payloads: IMA-ADPCM WAVs (fmt
    0x11, 4-bit predictive codes) decoded by the block-parallel numpy
    codec, then the same feature extractor as the PCM16 path. Features
    must track the PCM16 path's closely (lossy ~28 dB SNR) — checked in
    pytest; the driver row is rows-only like the other mm entries."""
    from oscar_ray.stages.multimodal import AudioFeatureStage

    return (
        _mm_media_ds(sf_dir, "adpcm")
        .map_batches(
            AudioFeatureStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_audio_features_g711(sf_dir: str):
    """Audio pipeline over G.711 log-PCM payloads (WAV tags 7/6 —
    telephony mu-law/A-law, alternating per doc), decoded by the
    vectorized ITU expansion formulas, same feature extractor."""
    from oscar_ray.stages.multimodal import AudioFeatureStage

    return (
        _mm_media_ds(sf_dir, "g711")
        .map_batches(
            AudioFeatureStage,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_audio_features_avi(sf_dir: str):
    """Audio pipeline DEMUXED from a video container: the MJPEG-AVI
    payloads carry an interleaved PCM16 auds stream; `avi_audio`
    reassembles the 01wb chunks and the same feature extractor runs on
    the samples. Mirrors real-world soundtrack feature extraction."""
    from oscar_ray.stages.multimodal import AudioFeatureStage

    return (
        _mm_media_ds(sf_dir, "avi")
        .map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={"decoder": "avi"},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_video_frames_avi(sf_dir: str):
    """Video pipeline over a REAL compressed container: MJPEG-in-AVI
    payloads (RIFF parse + idx1 random access, per-frame JPEG decode —
    only sampled frames are decoded) -> PPM frames -> image features."""
    from oscar_ray.stages.multimodal import FrameSampleStage, ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "avi")
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "avi", "n_frames": 3},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
        )
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={
                "decoder": "ppm",
                "dim": 8,
                "media_col": "frame",
                "passthrough_cols": ("frame_index",),
            },
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_video_frames_gif(sf_dir: str):
    """Web-animation pipeline: ANIMATED GIF payloads -> composited
    frames (full disposal/transparency semantics, stages/gif.py) ->
    PPM -> per-frame image features."""
    from oscar_ray.stages.multimodal import FrameSampleStage, ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "gif_anim")
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "gif", "n_frames": 3},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
        )
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={
                "decoder": "ppm",
                "dim": 8,
                "media_col": "frame",
                "passthrough_cols": ("frame_index",),
            },
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _mm_mixed_skips(sf_dir: str):
    """Mixed real-world corpus through the image stage with compressed-
    codec gates surfaced as COUNTED SKIPS (not raised errors): per doc,
    the payload format cycles jpeg/png/mp3/mp4/h264 by doc_id%5; decoder
    ='auto' sniffs magic bytes, decodes the in-envelope formats, and
    streams the rest through with a skip_reason. -> (skip_reason, n)
    counts; '' = decoded. The oracle recomputes counts from the doc_id
    arithmetic — hash-exact, proving no row is dropped or mislabeled."""
    import os

    import pyarrow as pa
    import ray.data

    from oscar_ray.stages.multimodal import ImageFeatureStage

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def to_media(t: pa.Table) -> pa.Table:
        from oscar_ray.sources.synth import generate_jpeg, generate_png

        payload = []
        for d in t["doc_id"].to_pylist():
            m = int(d) % 5
            if m == 0:
                payload.append(generate_jpeg(int(d)))
            elif m == 1:
                payload.append(generate_png(int(d)))
            elif m == 2:
                payload.append(b"ID3\x04" + bytes(60))  # mp3 envelope
            elif m == 3:
                payload.append(b"\x00\x00\x00\x18ftypisom" + bytes(40))  # mp4
            else:
                payload.append(b"\x00\x00\x00\x01\x67" + bytes(40))  # h264
        return pa.table(
            {"doc_id": t["doc_id"], "media": pa.array(payload, type=pa.binary())}
        )

    feats = ds.map_batches(to_media, batch_format="pyarrow").map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs={
            "decoder": "auto",
            "dim": 8,
            "on_unsupported": "skip",
        },
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )

    def count(t: pa.Table) -> pa.Table:
        agg = t.group_by(["skip_reason"]).aggregate([([], "count_all")])
        return pa.table(
            {"skip_reason": agg["skip_reason"], "n": agg["count_all"]}
        )

    return (
        feats.map_batches(count, batch_format="pyarrow")
        .groupby("skip_reason")
        .sum("n")
        .map_batches(
            lambda t: pa.table(
                {
                    "skip_reason": t["skip_reason"],
                    "n": t["sum(n)"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("skip_reason")
    )


def _mm_video_frames(sf_dir: str):
    """Video pipeline with a REAL frame sampler: raw-RGB container ->
    evenly-spaced frames re-encoded as PPM -> per-frame image features."""
    from oscar_ray.stages.multimodal import FrameSampleStage, ImageFeatureStage

    return (
        _mm_media_ds(sf_dir, "rvid")
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "rvid", "n_frames": 3},
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
        )
        .map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={
                "decoder": "ppm",
                "dim": 8,
                "media_col": "frame",
                "passthrough_cols": ("frame_index",),
            },
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .sort("doc_id")
    )


def _text_c4_filters(sf_dir: str):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) over documents.

    The synthetic corpus has neither newlines nor punctuation, so the
    pinned ruleset maps the SAME machinery onto the vocab: " line " is
    the line break, a 9-word terminal set stands in for terminal
    punctuation, "slow" for "javascript" (stages/c4.py module doc; the
    REAL C4 defaults are pytest-exercised over a punctuation fixture).
    """
    import functools
    import os

    import ray.data

    from oscar_ray.stages.c4 import C4Rules, c4_line_filter

    rules = C4Rules(
        line_sep=" line ",
        terminal_regex=r"(data|merge|sort|join|key|row|table|scan|agg)$",
        min_words=2,
        bad_line_substr="slow",
        min_sentences=3,
        sentence_regex=r"(data|merge|sort|join|key|row|table|scan|agg)",
        bad_doc_substr="",
        brace_doc_filter=True,
    )
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        functools.partial(c4_line_filter, rules=rules), batch_format="pyarrow"
    ).sort("doc_id")


def _dedup_keep_best(sf_dir: str):
    """Keep-best-copy dedup: one survivor per n-gram-Jaccard cluster,
    argmax n_chars (tie -> min doc_id); singleton docs survive as their
    own cluster. Join + packed-max groupby (stages/dedup.py)."""
    import os

    import ray.data

    from oscar_ray.stages.dedup import (
        cluster_pairs,
        keep_best_per_cluster,
        ngram_jaccard_pairs,
    )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    pairs = ngram_jaccard_pairs(ds, n=NGRAM_N, tau=JACCARD_TAU, max_shingle_df=MAX_SHINGLE_DF)
    labels = cluster_pairs(pairs)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    return keep_best_per_cluster(docs, labels, score_col="n_chars").sort("cluster_id")


WINNOW_MAX_FP_DF = 64  # stop-fingerprint cap (mirrored in the oracle)
WINNOW_MIN_SHARED = 2


def _winnow_sel_cte() -> str:
    """Shared winnowing CTE chain (k=3, w=4; leftmost-min tie rule via
    packed key): k-gram hash = md5-token polynomial mod 2^61-1 (the
    text_fingerprint discipline), fp = top 40 bits, key = fp*2^20 + pos,
    window min over 4 consecutive keys; -> `sel(doc_id, mk)`."""
    return f"""tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            sh AS (
                SELECT doc_id, i - 1 AS pos,
                       (((((md5_number_lower(arr[i])::HUGEINT % {FP_MOD_SQL})
                             * {FP_BASE_SQL}) % {FP_MOD_SQL}
                           + (md5_number_lower(arr[i + 1])::HUGEINT % {FP_MOD_SQL}))
                             * {FP_BASE_SQL}) % {FP_MOD_SQL}
                          + (md5_number_lower(arr[i + 2])::HUGEINT % {FP_MOD_SQL}))
                       % {FP_MOD_SQL} AS h
                FROM tokarr, unnest(range(1, len(arr) - 1)) AS u(i)
                WHERE len(arr) >= 3
            ),
            keys AS (
                SELECT doc_id, pos,
                       ((h // 2097152)::BIGINT * 1048576 + pos) AS key
                FROM sh
            ),
            win AS (
                SELECT doc_id,
                       min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN 3 PRECEDING
                                      AND CURRENT ROW) AS mk,
                       count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN 3 PRECEDING
                                      AND CURRENT ROW) AS cnt
                FROM keys
            ),
            sel AS (SELECT DISTINCT doc_id, mk FROM win WHERE cnt = 4)"""


def _dedup_winnowing_pairs(sf_dir: str):
    """MOSS-style overlap pairs: docs sharing >= WINNOW_MIN_SHARED
    winnowing fingerprints (fp groups capped at WINNOW_MAX_FP_DF)."""
    import os

    import ray.data

    from oscar_ray.stages.dedup import winnowing_pairs

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return winnowing_pairs(
        ds, min_shared=WINNOW_MIN_SHARED, max_fp_df=WINNOW_MAX_FP_DF
    ).sort(["a_id", "b_id"])


def _text_winnowing(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. 2003): k-gram hashes,
    per-window min selection (leftmost-tie pinned variant), distinct
    (pos, fp) per doc. Shuffle-free map_batches; md5-mod-p hashes so
    the DuckDB oracle reproduces every value."""
    import os

    import ray.data

    from oscar_ray.stages.text_analysis import winnowing_fingerprints

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(winnowing_fingerprints, batch_format="pyarrow").sort(
        ["doc_id", "pos"]
    )


def _search_df_histogram(sf_dir: str):
    """Index capacity statistics: log2-bucketed document-frequency
    histogram over the text vocabulary (terms per bucket, total df,
    total cf) — the posting-length distribution that sizes block spans,
    caps and codec choices (BASELINE/SCALE arithmetic's input)."""
    import numpy as np
    import pyarrow as pa

    from oscar_ray.pipelines.search import term_stats_table

    t = term_stats_table(sf_dir)
    df = t["df"].to_numpy().astype(np.int64)
    cf = t["cf"].to_numpy().astype(np.int64)
    # exact floor(log2(df)) via frexp (df is float64-exact; no log rounding)
    bucket = (np.frexp(df.astype(np.float64))[1] - 1).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    b, df_, cf_ = bucket[order], df[order], cf[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(b)) + 1, [len(b)]))
    rows = {
        "bucket": b[starts[:-1]],
        "n_terms": np.diff(starts).astype(np.int64),
        "sum_df": np.add.reduceat(df_, starts[:-1]) if len(b) else [],
        "sum_cf": np.add.reduceat(cf_, starts[:-1]) if len(b) else [],
    }
    return pa.table({k: pa.array(np.asarray(v, dtype=np.int64)) for k, v in rows.items()})


QL_MU = 100.0  # Dirichlet smoothing mass (pinned)


def _search_ql_dirichlet(sf_dir: str):
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001) over the same index artifacts — the pluggable-scorer
    surface demonstrated with a second ranking model next to BM25."""
    from oscar_ray.pipelines.search import ql_scores_table

    return ql_scores_table(sf_dir, BM25_OR_TERMS, mu=QL_MU)


ANCHOR_BOOST_W = 2.0  # anchor-field weight (exact float, power of two)


def _search_bm25_anchor_boost(sf_dir: str):
    """Weighted-field retrieval (BM25F-style score combination): body
    BM25 + W x anchor-field BM25, each field with its OWN df/avgdl
    statistics (two same-docid-space indexes; pipelines/search.py::
    weighted_field_search)."""
    from oscar_ray.pipelines.search import weighted_field_search

    return weighted_field_search(sf_dir, BM25_TERM, weight=ANCHOR_BOOST_W)


MLT_DOC = 7  # pinned More-Like-This source doc (present at every sf tier)
MLT_M = 5


def _search_more_like_this(sf_dir: str):
    """Lucene-MLT analog: top-m tf*idf terms of doc MLT_DOC as an OR
    query over the index; full match set minus the source doc."""
    from oscar_ray.pipelines.search import more_like_this

    return more_like_this(sf_dir, doc_id=MLT_DOC, m=MLT_M, k=None)


def _dedup_bloom(sf_dir: str):
    """Bloom-filter first-seen dedup (Dolma BFF pattern; stages/bloom.py).

    SQL-oracled as EXACT first-seen dedup: at this scale with
    m_bits=2^26 and k=4 the false-positive probability is ~1e-18 per
    doc and the pipeline is bit-deterministic, so the approximate
    engine provably coincides with the exact rule (the approximate
    regime itself is pytest-exercised under a tiny bitmap)."""
    import os

    import ray.data

    from oscar_ray.stages.bloom import bloom_dedup

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bloom_dedup(ds).sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "search_term_stats": _search_term_stats,
        "search_doc_lengths": _search_doc_lengths,
        "search_bm25_term": _search_bm25_term,
        "search_bm25_and": _search_bm25_and,
        "search_bm25_or": _search_bm25_or,
        "search_bm25_andnot": _search_bm25_andnot,
        "search_bm25_prefix": _search_bm25_prefix,
        "search_bm25_substring": _search_bm25_substring,
        "search_bm25_lang_filter": _search_bm25_lang_filter,
        "search_bm25_phrase": _search_bm25_phrase,
        "search_bm25_near": _search_bm25_near,
        "search_bm25_fuzzy": _search_bm25_fuzzy,
        "search_bm25_regex": _search_bm25_regex,
        "search_segmented_and": _search_segmented_and,
        "search_sharded_and": _search_sharded_and,
        "search_facets": _search_facets,
        "search_subset_tree": _search_subset_tree,
        "search_shannon_facets": _search_shannon_facets,
        "search_shannon_topkv": _search_shannon_topkv,
        "search_hybrid_rrf": _search_hybrid_rrf,
        "search_snippets": _search_snippets,
        "search_hydrate": _search_hydrate,
        "search_more_like_this": _search_more_like_this,
        "search_bm25_anchor_boost": _search_bm25_anchor_boost,
        "search_ql_dirichlet": _search_ql_dirichlet,
        "search_df_histogram": _search_df_histogram,
        "search_completions": _search_completions,
        "search_suggest": _search_suggest,
        "rel_lineitem_agg": _rel_lineitem_agg,
        "rel_customer_order_join": _rel_customer_order_join,
        "rel_top_parts": _rel_top_parts,
        "rel_order_facets": _rel_order_facets,
        "rel_customer_setops": _rel_customer_setops,
        "rel_facet_entropy": _rel_facet_entropy,
        "rel_events_window": _rel_events_window,
        "rel_events_sliding": _rel_events_sliding,
        "rel_events_asof": _rel_events_asof,
        "rel_events_range_join": _rel_events_range_join,
        "rel_events_sessions": _rel_events_sessions,
        "rel_events_json": _rel_events_json,
        "emb_label_centroids": _emb_label_centroids,
        "dedup_exact": _dedup_exact,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_clusters": _dedup_clusters,
        "dedup_keep_best": _dedup_keep_best,
        "dedup_bloom": _dedup_bloom,
        "dedup_minhash": _dedup_minhash,
        "dedup_simhash": _dedup_simhash,
        "text_token_stats": _text_token_stats,
        "text_quality": _text_quality,
        "text_langid": _text_langid,
        "text_repetition": _text_repetition,
        "text_topk_terms": _text_topk_terms,
        "text_cms_counts": _text_cms_counts,
        "text_hll_distinct": _text_hll_distinct,
        "text_fingerprint": _text_fingerprint,
        "text_decontaminate": _text_decontaminate,
        "text_scrub": _text_scrub,
        "text_pack_sequences": _text_pack_sequences,
        "text_bigram_lm": _text_bigram_lm,
        "text_nb_quality": _text_nb_quality,
        "text_dsir_weights": _text_dsir_weights,
        "text_dsir_select": _text_dsir_select,
        "text_length_quantiles": _text_length_quantiles,
        "text_warc_roundtrip": _text_warc_roundtrip,
        "text_domain_stats": _text_domain_stats,
        "text_ccnet_buckets": _text_ccnet_buckets,
        "text_c4_filters": _text_c4_filters,
        "text_winnowing": _text_winnowing,
        "dedup_winnowing_pairs": _dedup_winnowing_pairs,
        "graph_pagerank": _graph_pagerank,
        "graph_hits": _graph_hits,
        "text_cooccurrence": _text_cooccurrence,
        "url_canonicalize": _url_canonicalize,
        "link_anchor_stats": _link_anchor_stats,
        "search_bm25_anchor": _search_bm25_anchor,
        "rel_order_lineitem_join": _rel_order_lineitem_join,
        "ann_nsw_topk": _ann_nsw_topk,
        "text_tfidf_keywords": _text_tfidf_keywords,
        "text_dedup_spans": _text_dedup_spans,
        "text_dedup_substr": _text_dedup_substr,
        "text_bpe_tokens": _text_bpe_tokens,
        "text_bpe_token_ids": _text_bpe_token_ids,
        "text_topk_terms_by_lang": _text_topk_terms_by_lang,
        "pipeline_curate": _pipeline_curate,
        "text_sample_stratified": _text_sample_stratified,
        "text_source_cap": _text_source_cap,
        "emb_encode": _emb_encode,
        "ann_cosine_topk": _ann_cosine_topk,
        "emb_mmr_topk": _emb_mmr_topk,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        "ann_pq_topk": _ann_pq_topk,
        "ann_ivfpq_topk": _ann_ivfpq_topk,
        "emb_dup_pairs": _emb_dup_pairs,
        "emb_semantic_dedup": _emb_semantic_dedup,
        "mm_image_features": _mm_image_features,
        "mm_image_features_jpeg": _mm_image_features_jpeg,
        "mm_image_features_png": _mm_image_features_png,
        "mm_image_features_gif": _mm_image_features_gif,
        "mm_audio_features": _mm_audio_features,
        "mm_audio_features_adpcm": _mm_audio_features_adpcm,
        "mm_audio_features_avi": _mm_audio_features_avi,
        "mm_audio_features_g711": _mm_audio_features_g711,
        "mm_video_frames": _mm_video_frames,
        "mm_mixed_skips": _mm_mixed_skips,
        "mm_video_frames_avi": _mm_video_frames_avi,
        "mm_video_frames_gif": _mm_video_frames_gif,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_TOK_CTE = f"""
tok AS (
    SELECT doc_id, t.term
    FROM documents,
         unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}')) AS t(term)
    WHERE t.term <> ''
)"""

# corpus bigram-LM per-doc scores (shared by text_bigram_lm /
# text_ccnet_buckets): add-one bigram logprobs, int64 micro, summed
# per doc — identical text to the inline chain the engine pins.
_BIGRAM_SCORED_CTE = f"""
tokarr AS (
    SELECT doc_id,
           list_filter(
               regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
               x -> x <> '') AS arr
    FROM documents
),
big AS (
    SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
    FROM tokarr, unnest(range(1, len(arr))) AS t(i)
),
cab AS (SELECT a, b, count(*)::BIGINT AS c FROM big GROUP BY a, b),
caa AS (SELECT a, sum(c)::BIGINT AS ca FROM cab GROUP BY a),
v AS (
    SELECT count(DISTINCT t.term)::BIGINT AS v
    FROM tokarr, unnest(arr) AS t(term)
),
lp AS (
    SELECT cab.a, cab.b,
           floor(ln((cab.c + 1)::DOUBLE / (caa.ca + v.v)::DOUBLE)
                 * 1e6)::BIGINT AS lp
    FROM cab JOIN caa USING (a) CROSS JOIN v
),
docb AS (
    SELECT doc_id, a, b, count(*)::BIGINT AS n
    FROM big GROUP BY doc_id, a, b
),
scored AS (
    SELECT doc_id,
           sum(n)::BIGINT AS n_bigrams,
           sum(n * lp.lp)::BIGINT AS lp_total_micro
    FROM docb JOIN lp USING (a, b)
    GROUP BY doc_id
)"""

def _pagerank_sql(iters: int = 5) -> str:
    """Unrolled integer PageRank CTE chain (graph_pagerank oracle).

    Same pinned integer rule as stages/graph.py; DuckDB `//` truncates
    toward zero but every operand here is non-negative, so // == floor.
    """
    parts = [
        "WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents)",
        "n0 AS (SELECT doc_id AS node FROM documents)",
        """edges AS (
            SELECT doc_id AS src,
                   (doc_id * 2654435761 + j * 40503) % nn.n AS dst
            FROM documents CROSS JOIN nn, unnest([1, 2, 3]) AS t(j)
        )""",
        "r0 AS (SELECT node, (1000000000000 // nn.n)::BIGINT AS r FROM n0 CROSS JOIN nn)",
    ]
    prev = "r0"
    for t in range(1, iters + 1):
        parts.append(
            f"""s{t} AS (
                SELECT e.dst AS node,
                       sum((p.r * 85) // (100 * 3))::BIGINT AS inc
                FROM edges e JOIN {prev} p ON p.node = e.src
                GROUP BY e.dst
            )"""
        )
        parts.append(
            f"""r{t} AS (
                SELECT n0.node,
                       ((1000000000000 * 15) // (100 * nn.n)
                        + coalesce(s{t}.inc, 0))::BIGINT AS r
                FROM n0 CROSS JOIN nn LEFT JOIN s{t} ON s{t}.node = n0.node
            )"""
        )
        prev = f"r{t}"
    return (
        ",\n".join(parts)
        + f"\nSELECT node, r AS rank_micro FROM {prev} ORDER BY node"
    )


def _hits_sql(iters: int = 3) -> str:
    """Unrolled integer HITS CTE chain (graph_hits oracle).

    Mirrors stages/graph.py::hits exactly: h0 = HITS_SCALE for every node
    (the engine's h0 = SCALE rescaled by max=SCALE is exactly HITS_SCALE,
    no floor loss), then per iteration authority raw sums over in-edges,
    rescale x*S//max, hub raw sums over out-edges, rescale. `//` truncates
    but every operand is non-negative, so // == floor.
    """
    from oscar_ray.stages.graph import HITS_SCALE as S

    parts = [
        "WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents)",
        "n0 AS (SELECT doc_id AS node FROM documents)",
        """edges AS (
            SELECT doc_id AS src,
                   (doc_id * 2654435761 + j * 40503) % nn.n AS dst
            FROM documents CROSS JOIN nn, unnest([1, 2, 3]) AS t(j)
        )""",
        f"hs0 AS (SELECT node, {S}::BIGINT AS x FROM n0)",
    ]
    prev_h = "hs0"
    for t in range(1, iters + 1):
        parts += [
            f"""ar{t} AS (
                SELECT e.dst AS node, sum(p.x)::BIGINT AS raw
                FROM edges e JOIN {prev_h} p ON p.node = e.src
                GROUP BY e.dst
            )""",
            f"""as{t} AS (
                SELECT n0.node,
                       (coalesce(ar{t}.raw, 0) * {S})
                       // greatest(1, (SELECT max(raw) FROM ar{t})) AS x
                FROM n0 LEFT JOIN ar{t} ON ar{t}.node = n0.node
            )""",
            f"""hr{t} AS (
                SELECT e.src AS node, sum(p.x)::BIGINT AS raw
                FROM edges e JOIN as{t} p ON p.node = e.dst
                GROUP BY e.src
            )""",
            f"""hs{t} AS (
                SELECT n0.node,
                       (coalesce(hr{t}.raw, 0) * {S})
                       // greatest(1, (SELECT max(raw) FROM hr{t})) AS x
                FROM n0 LEFT JOIN hr{t} ON hr{t}.node = n0.node
            )""",
        ]
        prev_h = f"hs{t}"
    return ",\n".join(parts) + f"""
        SELECT n0.node, a.x::BIGINT AS authority_micro, h.x::BIGINT AS hub_micro
        FROM n0
        JOIN as{iters} a ON a.node = n0.node
        JOIN hs{iters} h ON h.node = n0.node
        ORDER BY n0.node
    """


# DSIR weight chain (shared by text_dsir_weights / text_dsir_select):
# hashed unigram+bigram counts -> add-one multinomial log ratios
# (int64 micro) -> per-doc logw + hashed-uniform Gumbel key.
_DSIR_W_CTE = f"""
tokarr AS (
    SELECT doc_id,
           list_filter(
               regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
               x -> x <> '') AS arr
    FROM documents
),
grams AS (
    SELECT doc_id, t.term AS g FROM tokarr, unnest(arr) AS t(term)
    UNION ALL
    SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g
    FROM tokarr, unnest(range(1, len(arr))) AS t(i)
),
gf AS (
    SELECT doc_id,
           (md5_number_lower(g)::HUGEINT % 10000)::BIGINT AS f
    FROM grams
),
lab AS (
    SELECT doc_id,
           source IN ('src0','src1','src2','src3','src4') AS tgt
    FROM documents
),
cnt AS (
    SELECT f,
           count(*) FILTER (WHERE tgt)::BIGINT AS tc,
           count(*)::BIGINT AS rc
    FROM gf JOIN lab USING (doc_id) GROUP BY f
),
tot AS (SELECT sum(tc)::BIGINT AS ttot, sum(rc)::BIGINT AS rtot FROM cnt),
lam AS (
    SELECT f,
           floor(ln(((cnt.tc + 1)::DOUBLE * (10000 + tot.rtot)::DOUBLE)
                    / ((cnt.rc + 1)::DOUBLE * (10000 + tot.ttot)::DOUBLE))
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
               ((md5_number_lower('dsir1:' || d.doc_id::VARCHAR)::HUGEINT
                 % 9007199254740991) + 1)::DOUBLE
               / 9007199254740992::DOUBLE)) * 1e6)::BIGINT AS gumbel_micro
    FROM documents d LEFT JOIN docw ON d.doc_id = docw.doc_id
)"""

_BM25_BASE = f"""
WITH {_TOK_CTE},
tf AS (
    SELECT doc_id, term, count(*)::DOUBLE AS tf
    FROM tok GROUP BY doc_id, term
),
dl AS (
    SELECT doc_id, count(*)::DOUBLE AS doclen FROM tok GROUP BY doc_id
),
corpus AS (
    SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT sum(doclen) FROM dl)
           / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
),
df AS (
    SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
scores AS (
    SELECT tf.doc_id, tf.term,
           ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({K1} + 1)) /
             (tf.tf + {K1} * (1 - {B} + {B} * dl.doclen / corpus.avgdl)) AS score
    FROM tf
    JOIN dl USING (doc_id)
    JOIN df USING (term)
    CROSS JOIN corpus
)"""


def _anchor_ranked_cte() -> str:
    """Shared CTE: the pinned fixture link rule (stages/links.py — single
    source of truth for the constants) -> per-target ranked anchor rows.
    Fixture list slices are DuckDB 1-based inclusive: toks[3j-2 : 3j] ==
    python toks[3(j-1) : 3(j-1)+3]."""
    from oscar_ray.stages.links import (
        LINK_MULT,
        LINK_STEP,
        MAX_OUT_LINKS,
        TOKENS_PER_LINK,
    )

    return f"""
tl AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> '') AS toks
    FROM documents
),
nd AS (SELECT count(*) AS n FROM documents),
js AS (SELECT unnest(range(1, {MAX_OUT_LINKS + 1})) AS j),
links AS (
    SELECT tl.doc_id AS src_doc,
           (tl.doc_id * {LINK_MULT} + js.j * {LINK_STEP}) % nd.n AS dst_doc,
           array_to_string(tl.toks[3*js.j-2 : 3*js.j], ' ') AS anchor,
           js.j AS link_pos
    FROM tl CROSS JOIN nd CROSS JOIN js
    WHERE js.j <= least({MAX_OUT_LINKS}, len(tl.toks) // {TOKENS_PER_LINK})
),
ranked AS (
    SELECT dst_doc, anchor,
           row_number() OVER (PARTITION BY dst_doc
                              ORDER BY src_doc, link_pos) AS rk,
           count(*) OVER (PARTITION BY dst_doc) AS n_inlinks
    FROM links
)"""


def _anchor_stats_sql() -> str:
    from oscar_ray.pipelines.anchors import MAX_INLINKS

    return f"""
        WITH {_anchor_ranked_cte()}
        SELECT dst_doc AS doc_id, any_value(n_inlinks)::BIGINT AS n_inlinks,
               string_agg(anchor, ' ' ORDER BY rk)
                   FILTER (WHERE rk <= {MAX_INLINKS}) AS anchor_text
        FROM ranked GROUP BY dst_doc ORDER BY doc_id
    """


def _anchor_bm25_sql(term: str) -> str:
    """BM25 whose token stream UNIONs body tokens with the capped inherited
    anchor tokens — the SQL mirror of extra_text_columns concatenation."""
    from oscar_ray.pipelines.anchors import MAX_INLINKS

    return f"""
        WITH {_anchor_ranked_cte()},
        tok AS (
            SELECT doc_id, t.term
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
            WHERE t.term <> ''
            UNION ALL
            SELECT r.dst_doc AS doc_id, t.term
            FROM ranked r, unnest(string_split(r.anchor, ' ')) AS t(term)
            WHERE r.rk <= {MAX_INLINKS} AND t.term <> ''
        ),
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS doclen FROM tok GROUP BY doc_id
        ),
        corpus AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                   (SELECT sum(doclen) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (
            SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
        ),
        scores AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({K1} + 1)) /
                     (tf.tf + {K1} * (1 - {B} + {B} * dl.doclen / corpus.avgdl)) AS score
            FROM tf
            JOIN dl USING (doc_id)
            JOIN df USING (term)
            CROSS JOIN corpus
        )
        SELECT doc_id, round(score, 4) AS score
        FROM scores WHERE term = '{term}' ORDER BY doc_id
    """


def _anchor_boost_sql(term: str, weight: float) -> str:
    """Weighted-field (BM25F-style) oracle: body BM25 and anchor-only
    BM25 computed with SEPARATE tf/df/doclen/avgdl statistics over the
    same docid space, combined as coalesce(body,0) + W*coalesce(anchor,0)
    (the addition order the engine pins). Both avgdl denominators are
    the WHOLE corpus count — zero-doclen docs count, mirroring docmeta."""
    from oscar_ray.pipelines.anchors import MAX_INLINKS

    return f"""
        WITH {_anchor_ranked_cte()},
        tok_b AS (
            SELECT doc_id, t.term
            FROM documents,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
            WHERE t.term <> ''
        ),
        tok_a AS (
            SELECT r.dst_doc AS doc_id, t.term
            FROM ranked r, unnest(string_split(r.anchor, ' ')) AS t(term)
            WHERE r.rk <= {MAX_INLINKS} AND t.term <> ''
        ),
        tf_b AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                 FROM tok_b GROUP BY doc_id, term),
        tf_a AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                 FROM tok_a GROUP BY doc_id, term),
        dl_b AS (SELECT doc_id, count(*)::DOUBLE AS doclen
                 FROM tok_b GROUP BY doc_id),
        dl_a AS (SELECT doc_id, count(*)::DOUBLE AS doclen
                 FROM tok_a GROUP BY doc_id),
        corpus AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                   (SELECT sum(doclen) FROM dl_b)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl_b,
                   (SELECT sum(doclen) FROM dl_a)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl_a
        ),
        df_b AS (SELECT term, count(*)::DOUBLE AS df FROM tf_b GROUP BY term),
        df_a AS (SELECT term, count(*)::DOUBLE AS df FROM tf_a GROUP BY term),
        sb AS (
            SELECT tf_b.doc_id,
                   ln(1 + (corpus.n_docs - df_b.df + 0.5) / (df_b.df + 0.5))
                   * (tf_b.tf * ({K1} + 1)) /
                     (tf_b.tf + {K1} * (1 - {B} + {B} * dl_b.doclen
                                        / corpus.avgdl_b)) AS score
            FROM tf_b JOIN dl_b USING (doc_id) JOIN df_b USING (term)
            CROSS JOIN corpus WHERE tf_b.term = '{term}'
        ),
        sa AS (
            SELECT tf_a.doc_id,
                   ln(1 + (corpus.n_docs - df_a.df + 0.5) / (df_a.df + 0.5))
                   * (tf_a.tf * ({K1} + 1)) /
                     (tf_a.tf + {K1} * (1 - {B} + {B} * dl_a.doclen
                                        / corpus.avgdl_a)) AS score
            FROM tf_a JOIN dl_a USING (doc_id) JOIN df_a USING (term)
            CROSS JOIN corpus WHERE tf_a.term = '{term}'
        )
        SELECT doc_id,
               round(coalesce(sb.score, 0) + {weight} * coalesce(sa.score, 0),
                     4) AS score
        FROM sb FULL OUTER JOIN sa USING (doc_id)
        ORDER BY doc_id
    """


def _sql_stoplist(lang: str) -> str:
    """The pinned stopword list as a SQL IN-list (single source of truth:
    oscar_ray.stages.text_analysis._LANG_STOPWORDS)."""
    from oscar_ray.stages.text_analysis import _LANG_STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))


def _ngram_pairs_sql() -> str:
    """Exact token-3-gram Jaccard pairs (shared by two oracle entries)."""
    return f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
                FROM tokarr, unnest(range(1, greatest(len(arr) - 1, 1))) AS t(i)
                WHERE len(arr) >= {NGRAM_N}
            ),
            sz AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
            keep_sh AS (
                SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) BETWEEN 2 AND {MAX_SHINGLE_DF}
            ),
            pairs AS (
                SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*)::DOUBLE AS inter
                FROM sh x
                JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                WHERE x.shingle IN (SELECT shingle FROM keep_sh)
                GROUP BY 1, 2
            )
            SELECT a_id::BIGINT AS a_id, b_id::BIGINT AS b_id,
                   round(inter / (sa.set_size + sb.set_size - inter), 6) AS jaccard
            FROM pairs
            JOIN sz sa ON sa.doc_id = a_id
            JOIN sz sb ON sb.doc_id = b_id
            WHERE inter / (sa.set_size + sb.set_size - inter) >= {JACCARD_TAU}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "search_term_stats": f"""
            WITH {_TOK_CTE}
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
            FROM tok GROUP BY term ORDER BY term
        """,
        "search_doc_lengths": f"""
            WITH {_TOK_CTE}
            SELECT doc_id, count(*)::BIGINT AS doclen
            FROM tok GROUP BY doc_id ORDER BY doc_id
        """,
        "search_bm25_term": _BM25_BASE
        + f"""
            SELECT doc_id, round(score, 4) AS score
            FROM scores WHERE term = '{BM25_TERM}' ORDER BY doc_id
        """,
        "search_bm25_and": _BM25_BASE
        + f"""
            SELECT a.doc_id, round(a.score + b.score, 4) AS score
            FROM (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[0]}') a
            JOIN (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[1]}') b
              USING (doc_id)
            ORDER BY doc_id
        """,
        # doc-sharded serving must be invisible: the SAME whole-corpus
        # AND oracle, evaluated by the fan-out/merge actor pool
        "search_sharded_and": _BM25_BASE
        + f"""
            SELECT a.doc_id, round(a.score + b.score, 4) AS score
            FROM (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[0]}') a
            JOIN (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[1]}') b
              USING (doc_id)
            ORDER BY doc_id
        """,
        # federated serving must be invisible: the SAME whole-corpus AND
        # oracle, evaluated by the engine over split segment indexes
        "search_segmented_and": _BM25_BASE
        + f"""
            SELECT a.doc_id, round(a.score + b.score, 4) AS score
            FROM (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[0]}') a
            JOIN (SELECT doc_id, score FROM scores WHERE term = '{BM25_AND.split()[1]}') b
              USING (doc_id)
            ORDER BY doc_id
        """,
        "search_bm25_or": _BM25_BASE
        + f"""
            SELECT doc_id,
                   round(coalesce(a.score, 0) + coalesce(b.score, 0), 4) AS score
            FROM (SELECT doc_id, score FROM scores WHERE term = '{BM25_OR_TERMS[0]}') a
            FULL OUTER JOIN
                 (SELECT doc_id, score FROM scores WHERE term = '{BM25_OR_TERMS[1]}') b
              USING (doc_id)
            ORDER BY doc_id
        """,
        "search_bm25_andnot": _BM25_BASE
        + f"""
            SELECT doc_id, round(score, 4) AS score
            FROM scores a WHERE term = '{BM25_NOT[0]}'
              AND NOT EXISTS (
                SELECT 1 FROM scores b
                WHERE b.term = '{BM25_NOT[1]}' AND b.doc_id = a.doc_id)
            ORDER BY doc_id
        """,
        "search_bm25_prefix": _BM25_BASE
        + f"""
            SELECT doc_id, round(sum(score), 4) AS score
            FROM scores WHERE term IN (
                -- the engine caps prefix expansion at MAX_PREFIX_EXPANSIONS
                -- dictionary terms, ascending — mirror the cap here
                SELECT term FROM df WHERE term LIKE '{BM25_PREFIX}%'
                ORDER BY term LIMIT {MAX_PREFIX_EXPANSIONS_SQL})
            GROUP BY doc_id ORDER BY doc_id
        """,
        "search_more_like_this": _BM25_BASE
        + f""",
            src AS (
                SELECT tf.term,
                       tf.tf * ln(1 + (corpus.n_docs - df.df + 0.5)
                                      / (df.df + 0.5)) AS w
                FROM tf JOIN df USING (term) CROSS JOIN corpus
                WHERE tf.doc_id = {MLT_DOC}
            ),
            mlt AS (SELECT term FROM src ORDER BY w DESC, term LIMIT {MLT_M})
            SELECT doc_id, round(sum(score), 4) AS score
            FROM scores JOIN mlt USING (term)
            WHERE doc_id <> {MLT_DOC}
            GROUP BY doc_id ORDER BY doc_id
        """,
        "search_bm25_substring": _BM25_BASE
        + f""",
            -- suffix-index semantics (build.py _expand_suffix_pairs /
            -- tests/oracle.py): per (doc, suffix>=len {MIN_SUFFIX_LEN_SQL}) the tf sums
            -- over the doc's terms carrying that suffix; df counts docs;
            -- `*{SUBSTR_TOKEN}*` = OR over suffixes LIKE '{SUBSTR_TOKEN}%'
            -- ascending, capped at {MAX_PREFIX_EXPANSIONS_SQL} like any prefix scan
            sfx AS (
                SELECT doc_id, substr(term, i) AS s, sum(tf)::DOUBLE AS tf
                FROM tf, unnest(range(1, length(term)::BIGINT + 1)) AS u(i)
                WHERE length(term) - i + 1 >= {MIN_SUFFIX_LEN_SQL}
                GROUP BY doc_id, substr(term, i)
            ),
            sdf AS (SELECT s, count(*)::DOUBLE AS df FROM sfx GROUP BY s),
            expand AS (
                SELECT s FROM sdf WHERE s LIKE '{SUBSTR_TOKEN}%'
                ORDER BY s LIMIT {MAX_PREFIX_EXPANSIONS_SQL}
            ),
            sscores AS (
                SELECT sfx.doc_id,
                       ln(1 + (corpus.n_docs - sdf.df + 0.5) / (sdf.df + 0.5))
                       * (sfx.tf * ({K1} + 1)) /
                         (sfx.tf + {K1} * (1 - {B} + {B} * dl.doclen / corpus.avgdl))
                           AS score
                FROM sfx
                JOIN sdf USING (s)
                JOIN dl USING (doc_id)
                CROSS JOIN corpus
                WHERE sfx.s IN (SELECT s FROM expand)
            )
            SELECT doc_id, round(sum(score), 4) AS score
            FROM sscores GROUP BY doc_id ORDER BY doc_id
        """,
        "search_bm25_lang_filter": _BM25_BASE
        + f"""
            SELECT s.doc_id, round(s.score, 4) AS score
            FROM scores s JOIN documents d USING (doc_id)
            WHERE s.term = '{BM25_TERM}' AND d.lang = 'en'
            ORDER BY doc_id
        """,
        # phrase = ONE virtual term: tf counts adjacent-pair occurrences
        # (overlaps included), df counts matching docs; BM25 formula and
        # corpus stats identical to _BM25_BASE (engine: positional.py
        # phrase_postings + the pinned spec/bm25 kernels)
        "search_bm25_phrase": f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            dl AS (SELECT doc_id, len(arr)::DOUBLE AS doclen FROM tokarr),
            ptf AS (
                SELECT doc_id, count(*)::DOUBLE AS tf
                FROM tokarr, unnest(range(1, len(arr))) AS t(i)
                WHERE arr[i] = '{PHRASE_Q[0]}' AND arr[i + 1] = '{PHRASE_Q[1]}'
                GROUP BY doc_id
            ),
            corpus AS (
                SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                       (SELECT sum(doclen) FROM dl)
                       / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
            ),
            pdf AS (SELECT count(*)::DOUBLE AS df FROM ptf)
            SELECT ptf.doc_id,
                   round(ln(1 + (corpus.n_docs - pdf.df + 0.5) / (pdf.df + 0.5))
                         * (ptf.tf * ({K1} + 1)) /
                           (ptf.tf + {K1} * (1 - {B} + {B} * dl.doclen / corpus.avgdl)),
                         4) AS score
            FROM ptf JOIN dl USING (doc_id) CROSS JOIN corpus CROSS JOIN pdf
            ORDER BY doc_id
        """,
        # proximity = the two terms' AND scores, filtered to docs where
        # some occurrence pair sits within the slop window (positions are
        # token indices; 1- vs 0-based cancels in the difference)
        "search_bm25_near": _BM25_BASE
        + f""",
            tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            pos AS (
                SELECT doc_id, i, arr[i] AS term
                FROM tokarr, unnest(range(1, len(arr) + 1)) AS t(i)
            ),
            near AS (
                SELECT DISTINCT a.doc_id
                FROM pos a JOIN pos b USING (doc_id)
                WHERE a.term = '{NEAR_Q[0]}' AND b.term = '{NEAR_Q[1]}'
                  AND abs(a.i - b.i) <= {NEAR_SLOP}
            )
            SELECT s.doc_id, round(sum(s.score), 4) AS score
            FROM scores s JOIN near USING (doc_id)
            WHERE s.term IN ('{NEAR_Q[0]}', '{NEAR_Q[1]}')
            GROUP BY s.doc_id ORDER BY doc_id
        """,
        # fuzzy = OR over dictionary terms within Levenshtein distance,
        # ascending with the same expansion cap as a prefix scan (engine:
        # reader.terms_with_edit_distance — unit-cost DP == duckdb's
        # levenshtein)
        "search_bm25_fuzzy": _BM25_BASE
        + f"""
            SELECT doc_id, round(sum(score), 4) AS score
            FROM scores WHERE term IN (
                SELECT term FROM df
                WHERE levenshtein(term, '{FUZZY_TERM}') <= {FUZZY_DIST}
                ORDER BY term LIMIT {MAX_PREFIX_EXPANSIONS_SQL})
            GROUP BY doc_id ORDER BY doc_id
        """,
        # regex expansion: duckdb regexp_full_match is RE2, same engine
        # arrow's match_substring_regex uses — semantics identical
        "search_bm25_regex": _BM25_BASE
        + f"""
            SELECT doc_id, round(sum(score), 4) AS score
            FROM scores WHERE term IN (
                SELECT term FROM df
                WHERE regexp_full_match(term, '{REGEX_PAT}')
                ORDER BY term LIMIT {MAX_PREFIX_EXPANSIONS_SQL})
            GROUP BY doc_id ORDER BY doc_id
        """,
        "search_completions": f"""
            WITH {_TOK_CTE},
            vocab AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                FROM tok GROUP BY term
            )
            SELECT term, df FROM vocab
            WHERE term LIKE '{COMPLETE_PREFIX}%'
            ORDER BY df DESC, term LIMIT {COMPLETE_K}
        """,
        "search_suggest": f"""
            WITH {_TOK_CTE},
            vocab AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                FROM tok GROUP BY term
            )
            SELECT term, levenshtein(term, '{SUGGEST_TERM}')::BIGINT AS dist, df
            FROM vocab
            WHERE levenshtein(term, '{SUGGEST_TERM}') <= {SUGGEST_DIST}
            ORDER BY dist, df DESC, term LIMIT {SUGGEST_K}
        """,
        "search_snippets": f"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> ''
                       ) AS l
                FROM documents
            ),
            pos AS (
                SELECT doc_id, l,
                       least(
                           nullif(list_position(l, '{BM25_OR_TERMS[0]}'), 0),
                           nullif(list_position(l, '{BM25_OR_TERMS[1]}'), 0)
                       ) AS p
                FROM toks
            )
            SELECT doc_id, p::BIGINT AS match_pos,
                   array_to_string(
                       flatten([
                           l[greatest(1, p - 3):p - 1],
                           ['[' || l[p] || ']'],
                           l[p + 1:least(len(l), p + 3)]
                       ]),
                       ' ') AS snippet
            FROM pos WHERE p IS NOT NULL ORDER BY doc_id
        """,
        "search_facets": f"""
            WITH {_TOK_CTE},
            matched AS (
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[0]}'
                INTERSECT
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[1]}'
            ),
            f AS (
                SELECT 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
                FROM documents JOIN matched USING (doc_id) GROUP BY lang
                UNION ALL
                SELECT 'source', source, count(*)::BIGINT
                FROM documents JOIN matched USING (doc_id) GROUP BY source
            ),
            r AS (
                SELECT facet, value, n,
                       row_number() OVER (
                           PARTITION BY facet ORDER BY n DESC, value) AS rk
                FROM f
            )
            SELECT facet, value, n FROM r WHERE rk <= 10
            ORDER BY facet, n DESC, value
        """,
        "search_subset_tree": f"""
            WITH {_TOK_CTE},
            matched AS (
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[0]}'
                INTERSECT
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[1]}'
            ),
            h AS (
                SELECT 'w' || CAST(d.doc_id % 7 AS VARCHAR) || '.' || d.source
                           || '.' || list_extract(
                               ['com', 'co.uk', 'org', 'com.au'],
                               CAST(d.doc_id % 4 AS INTEGER) + 1) AS host,
                       d.source || '.' || list_extract(
                               ['com', 'co.uk', 'org', 'com.au'],
                               CAST(d.doc_id % 4 AS INTEGER) + 1) AS domain,
                       list_extract(['com', 'co.uk', 'org', 'com.au'],
                               CAST(d.doc_id % 4 AS INTEGER) + 1) AS suffix
                FROM documents d JOIN matched USING (doc_id)
            )
            SELECT 1::BIGINT AS level, '' AS parent, suffix AS node,
                   count(*)::BIGINT AS n
            FROM h GROUP BY suffix
            UNION ALL
            SELECT 2::BIGINT, suffix, domain, count(*)::BIGINT
            FROM h GROUP BY suffix, domain
            UNION ALL
            SELECT 3::BIGINT, domain, host, count(*)::BIGINT
            FROM h GROUP BY domain, host
            ORDER BY level, parent, node
        """,
        "mm_mixed_skips": """
            SELECT CASE doc_id % 5
                       WHEN 2 THEN 'unsupported image format: mp3'
                       WHEN 3 THEN 'unsupported image format: mp4'
                       WHEN 4 THEN 'unsupported image format: h264'
                       ELSE '' END AS skip_reason,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1 ORDER BY skip_reason
        """,
        "search_shannon_facets": f"""
            WITH {_TOK_CTE},
            matched AS (
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[0]}'
                INTERSECT
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[1]}'
            ),
            c1 AS (SELECT lang AS v, count(*)::DOUBLE AS n
                   FROM documents JOIN matched USING (doc_id) GROUP BY lang),
            c2 AS (SELECT source AS v, count(*)::DOUBLE AS n
                   FROM documents JOIN matched USING (doc_id) GROUP BY source)
            SELECT 'lang' AS facet, (SELECT count(*) FROM c1)::BIGINT AS n_values,
                   (SELECT round(sum(-(n / t) * ln(n / t)), 6)
                    FROM (SELECT n, (SELECT sum(n) FROM c1) AS t FROM c1)) AS entropy
            UNION ALL
            SELECT 'source', (SELECT count(*) FROM c2)::BIGINT,
                   (SELECT round(sum(-(n / t) * ln(n / t)), 6)
                    FROM (SELECT n, (SELECT sum(n) FROM c2) AS t FROM c2))
            ORDER BY facet
        """,
        "search_hybrid_rrf": _BM25_BASE
        + f""",
            lex AS (
                SELECT doc_id AS id, rk FROM (
                    SELECT doc_id,
                           row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                    FROM scores WHERE term = '{BM25_TERM}'
                ) WHERE rk <= {HYBRID_DEPTH}
            ),
            vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            vec AS (
                SELECT vec_id AS id, rk FROM (
                    SELECT e.vec_id,
                           row_number() OVER (
                               ORDER BY list_cosine_similarity(
                                   vq.qv::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                               e.vec_id) AS rk
                    FROM embeddings e CROSS JOIN vq
                ) WHERE rk <= {HYBRID_DEPTH}
            ),
            fused AS (
                SELECT coalesce(lex.id, vec.id) AS item_id,
                       -- pinned op order: lexical term + vector term
                       coalesce(1.0 / ({RRF_C} + lex.rk), 0)
                       + coalesce(1.0 / ({RRF_C} + vec.rk), 0) AS rrf,
                       coalesce(lex.rk, 0)::BIGINT AS lex_rank,
                       coalesce(vec.rk, 0)::BIGINT AS vec_rank
                FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
            )
            SELECT item_id, floor(rrf * 1e6)::BIGINT AS rrf_micro,
                   lex_rank, vec_rank
            FROM fused ORDER BY rrf DESC, item_id LIMIT 10
        """,
        "search_shannon_topkv": f"""
            WITH {_TOK_CTE},
            matched AS (
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[0]}'
                INTERSECT
                SELECT doc_id FROM tok WHERE term = '{BM25_AND.split()[1]}'
            ),
            tot AS (SELECT count(*)::BIGINT AS t FROM matched),
            f AS (
                SELECT 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
                FROM documents JOIN matched USING (doc_id) GROUP BY lang
                UNION ALL
                SELECT 'source', source, count(*)::BIGINT
                FROM documents JOIN matched USING (doc_id) GROUP BY source
            ),
            sp AS (SELECT floor(0.5 * t)::BIGINT AS s, t FROM tot)
            SELECT facet, value, n,
                   (100 * n) // greatest(sp.t, 1) AS pct,
                   abs(n - sp.s)::BIGINT AS splitdist
            FROM f, sp
            WHERE NOT (facet = 'lang' AND value = 'en')
            ORDER BY splitdist, facet, value LIMIT 10
        """,
        "search_hydrate": _BM25_BASE
        + f""",
            ranked AS (
                SELECT doc_id, score,
                       row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                FROM scores WHERE term = '{BM25_TERM}'
            )
            SELECT d.doc_id, d.lang, d.source, d.n_chars,
                   round(r.score, 4) AS score
            FROM ranked r JOIN documents d USING (doc_id)
            WHERE r.rk <= 10 ORDER BY d.doc_id
        """,
        "rel_lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
                   sum(floor((l_extendedprice * (1 - l_discount)) * 100)::BIGINT)::BIGINT
                       AS sum_revenue_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "rel_customer_order_join": """
            SELECT c.c_mktsegment,
                   sum(floor(o.o_totalprice * 100)::BIGINT)::BIGINT AS sum_totalprice_cents,
                   count(*)::BIGINT AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "rel_top_parts": """
            SELECT p_partkey, p_size FROM part
            ORDER BY p_size DESC, p_partkey LIMIT 100
        """,
        "rel_order_facets": """
            SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n
            FROM orders GROUP BY 1, 2
            ORDER BY n DESC, o_orderstatus, o_orderpriority LIMIT 10
        """,
        "rel_customer_setops": """
            WITH a AS (SELECT DISTINCT c_custkey AS id FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
                 b AS (SELECT DISTINCT o_custkey AS id FROM orders
                       WHERE o_orderstatus = 'O')
            SELECT (SELECT count(*) FROM a)::BIGINT AS n_building,
                   (SELECT count(*) FROM b)::BIGINT AS n_open,
                   (SELECT count(*) FROM (SELECT id FROM a INTERSECT SELECT id FROM b))::BIGINT AS n_and,
                   (SELECT count(*) FROM (SELECT id FROM a UNION SELECT id FROM b))::BIGINT AS n_or,
                   (SELECT count(*) FROM (SELECT id FROM a EXCEPT SELECT id FROM b))::BIGINT AS n_andnot,
                   ((SELECT count(*) FROM (SELECT id FROM a EXCEPT SELECT id FROM b))
                    + (SELECT count(*) FROM (SELECT id FROM b EXCEPT SELECT id FROM a)))::BIGINT AS n_xor
        """,
        "rel_facet_entropy": """
            WITH s1 AS (SELECT count(*)::DOUBLE AS n FROM orders GROUP BY o_orderstatus),
                 s2 AS (SELECT count(*)::DOUBLE AS n FROM orders GROUP BY o_orderpriority)
            SELECT 'o_orderstatus' AS facet,
                   (SELECT count(*) FROM s1)::BIGINT AS n_values,
                   (SELECT round(sum(-(n / t) * ln(n / t)), 6)
                    FROM (SELECT n, (SELECT sum(n) FROM s1) AS t FROM s1)) AS entropy
            UNION ALL
            SELECT 'o_orderpriority',
                   (SELECT count(*) FROM s2)::BIGINT,
                   (SELECT round(sum(-(n / t) * ln(n / t)), 6)
                    FROM (SELECT n, (SELECT sum(n) FROM s2) AS t FROM s2))
            ORDER BY facet
        """,
        "rel_events_window": """
            SELECT event_type AS k,
                   (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2 ORDER BY k, hour_bucket
        """,
        "rel_events_sliding": """
            -- 1h windows sliding by 30min: event at slot s lands in the
            -- windows starting at slots s and s-1
            SELECT event_type AS k,
                   (epoch_us(ts) // 1800000000 - t.d)::BIGINT AS win30,
                   count(*)::BIGINT AS n
            FROM events, unnest([0, 1]) AS t(d)
            GROUP BY 1, 2 ORDER BY k, win30
        """,
        "rel_events_asof": """
            SELECT a.event_id, b.event_id AS prev_event_id,
                   (epoch_us(a.ts) - epoch_us(b.ts))::BIGINT AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') a
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') b
              ON a.user_id = b.user_id AND a.ts >= b.ts
            ORDER BY a.event_id
        """,
        "rel_events_range_join": """
            SELECT a.event_id,
                   count(b.event_id)::BIGINT AS n_follow,
                   coalesce(sum(floor(b.value * 1000000)::BIGINT), 0)::BIGINT
                       AS sum_value_micro
            FROM events a
            LEFT JOIN events b
              ON b.user_id = a.user_id
             AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR
            GROUP BY a.event_id ORDER BY a.event_id
        """,
        "rel_events_sessions": """
            -- gap-based sessions: >12h inter-event gap opens a new session
            WITH e AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                 > 43200000000
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, ts_us, value,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts_us, event_id
                       ) AS session_idx
                FROM e
            )
            SELECT user_id, session_idx::BIGINT AS session_idx,
                   min(ts_us)::BIGINT AS session_start_us,
                   max(ts_us)::BIGINT AS session_end_us,
                   count(*)::BIGINT AS n_events,
                   sum(floor(value * 1000000)::BIGINT)::BIGINT
                       AS sum_value_micro
            FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx
        """,
        "rel_events_json": """
            SELECT event_type,
                   sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
                   max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "emb_label_centroids": """
            WITH ex AS (
                SELECT label,
                       generate_subscripts(embedding, 1) AS dim,
                       unnest(embedding)::DOUBLE AS v
                FROM embeddings
            ),
            c AS (SELECT label, dim, sum(v) / count(*) AS m FROM ex GROUP BY 1, 2),
            nn AS (SELECT label, count(*)::BIGINT AS n_vecs FROM embeddings GROUP BY 1)
            SELECT c.label::BIGINT AS label, nn.n_vecs,
                   floor(sqrt(sum(m * m)) * 1e6)::BIGINT AS centroid_norm_micro
            FROM c JOIN nn USING (label)
            GROUP BY c.label, nn.n_vecs ORDER BY label
        """,
        "dedup_exact": """
            SELECT md5(text) AS h, min(doc_id)::BIGINT AS keep_id,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1 ORDER BY h
        """,
        "dedup_ngram_jaccard": _ngram_pairs_sql() + " ORDER BY a_id, b_id",
        "dedup_bloom": """
            SELECT doc_id,
                   CAST(doc_id = min(doc_id) OVER (PARTITION BY text)
                        AS INTEGER) AS kept
            FROM documents ORDER BY doc_id
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE p AS (
                SELECT * FROM ({_ngram_pairs_sql()}) q
            ),
            nodes AS (SELECT a_id AS id FROM p UNION SELECT b_id FROM p),
            edges AS (SELECT a_id AS u, b_id AS v FROM p
                      UNION ALL SELECT b_id, a_id FROM p),
            reach(id, r) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
            ),
            cl AS (SELECT id AS doc_id, min(r) AS cluster_id
                   FROM reach GROUP BY id),
            alld AS (
                SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
                       d.n_chars
                FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (PARTITION BY cluster_id
                                          ORDER BY n_chars DESC, doc_id) AS rn,
                       count(*) OVER (PARTITION BY cluster_id) AS n_docs
                FROM alld
            )
            SELECT cluster_id::BIGINT AS cluster_id,
                   doc_id::BIGINT AS best_doc_id,
                   n_chars::BIGINT AS best_n_chars,
                   n_docs::BIGINT AS n_docs
            FROM ranked WHERE rn = 1 ORDER BY cluster_id
        """,
        "text_c4_filters": """
            WITH base AS (
                SELECT doc_id, text,
                       list_transform(string_split(text, ' line '),
                                      x -> trim(x, ' ' || chr(9) || chr(13))) AS ls
                FROM documents
            ),
            f AS (
                SELECT doc_id, text, len(ls)::BIGINT AS n_lines,
                       list_filter(ls, x ->
                           regexp_matches(x, '(data|merge|sort|join|key|row|table|scan|agg)$')
                           AND len(regexp_extract_all(x, '\\S+')) >= 2
                           AND NOT contains(lower(x), 'slow')) AS kept
                FROM base
            ),
            g AS (
                SELECT doc_id, text, n_lines, len(kept)::BIGINT AS n_kept,
                       coalesce(array_to_string(kept, chr(10)), '') AS text_clean
                FROM f
            )
            SELECT doc_id, n_lines, n_kept,
                   len(regexp_extract_all(text_clean,
                       '(data|merge|sort|join|key|row|table|scan|agg)'))::BIGINT
                       AS n_sentences,
                   CAST((len(regexp_extract_all(text_clean,
                             '(data|merge|sort|join|key|row|table|scan|agg)')) >= 3
                         AND NOT contains(text, '{')) AS INTEGER) AS keep,
                   text_clean
            FROM g ORDER BY doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE p AS (
                SELECT * FROM ({_ngram_pairs_sql()}) q
            ),
            nodes AS (SELECT a_id AS id FROM p UNION SELECT b_id FROM p),
            edges AS (SELECT a_id AS u, b_id AS v FROM p
                      UNION ALL SELECT b_id, a_id FROM p),
            reach(id, r) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
            )
            SELECT id::BIGINT AS doc_id, min(r)::BIGINT AS cluster_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        "text_token_stats": f"""
            WITH {_TOK_CTE}
            SELECT doc_id,
                   count(*)::BIGINT AS n_tokens,
                   count(DISTINCT term)::BIGINT AS n_unique_tokens,
                   floor((sum(length(term))::DOUBLE / count(*)) * 1e6)::BIGINT
                       AS mean_token_len_micro
            FROM tok GROUP BY doc_id ORDER BY doc_id
        """,
        "text_topk_terms": f"""
            WITH {_TOK_CTE}
            SELECT term, count(*)::BIGINT AS cf FROM tok
            GROUP BY term ORDER BY cf DESC, term LIMIT 20
        """,
        "text_topk_terms_by_lang": f"""
            WITH tokl AS (
                SELECT d.lang, t.term
                FROM documents d,
                     unnest(regexp_split_to_array(lower(d.text),
                            '{TOKEN_SPLIT_SQL}')) AS t(term)
                WHERE t.term <> ''
            ),
            cnt AS (
                SELECT lang, term, count(*)::BIGINT AS cf
                FROM tokl GROUP BY lang, term
            ),
            ranked AS (
                SELECT lang, term, cf,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY cf DESC, term) AS rn
                FROM cnt
            )
            SELECT lang, term, cf FROM ranked WHERE rn <= 10
            ORDER BY lang, cf DESC, term
        """,
        "text_repetition": f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            sh AS (
                SELECT doc_id,
                       arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
                FROM tokarr, unnest(range(1, greatest(len(arr) - 1, 1))) AS t(i)
                WHERE len(arr) >= {NGRAM_N}
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_ngrams,
                   count(DISTINCT shingle)::BIGINT AS n_distinct_ngrams,
                   floor((1 - count(DISTINCT shingle)::DOUBLE / count(*)) * 1e6)::BIGINT
                       AS dup_frac_micro
            FROM sh GROUP BY doc_id ORDER BY doc_id
        """,
        "text_quality": f"""
            WITH {_TOK_CTE},
            st AS (
                SELECT doc_id,
                       count(*)::DOUBLE AS n,
                       sum(CASE WHEN term IN ({_sql_stoplist('en')})
                           THEN 1 ELSE 0 END)::DOUBLE AS hits,
                       count(DISTINCT term)::DOUBLE AS u,
                       sum(length(term))::DOUBLE AS sl
                FROM tok GROUP BY doc_id
            ),
            -- identical float64 op order as the Ray stage: a/b ratios,
            -- *5, -2, /8, four 0.25-weighted clipped terms summed l-to-r
            q AS (
                SELECT doc_id,
                       n::BIGINT AS n_tokens,
                       floor((hits / n) * 1e6)::BIGINT AS stopword_ratio_micro,
                       floor((u / n) * 1e6)::BIGINT AS unique_ratio_micro,
                       floor((sl / n) * 1e6)::BIGINT AS mean_token_len_micro,
                       floor((
                           0.25 * least(n / 256.0, 1.0)
                           + 0.25 * least(u / n, 1.0)
                           + 0.25 * least((hits / n) * 5.0, 1.0)
                           + 0.25 * least(greatest(((sl / n) - 2.0) / 8.0, 0.0), 1.0)
                       ) * 1e6)::BIGINT AS quality_score_micro
                FROM st
            )
            SELECT d.doc_id,
                   coalesce(q.n_tokens, 0) AS n_tokens,
                   coalesce(q.stopword_ratio_micro, 0) AS stopword_ratio_micro,
                   coalesce(q.unique_ratio_micro, 0) AS unique_ratio_micro,
                   coalesce(q.mean_token_len_micro, 0) AS mean_token_len_micro,
                   coalesce(q.quality_score_micro, 0) AS quality_score_micro
            FROM documents d LEFT JOIN q USING (doc_id) ORDER BY d.doc_id
        """,
        "text_langid": f"""
            WITH {_TOK_CTE},
            st AS (
                SELECT doc_id,
                       count(*)::DOUBLE AS n,
                       sum(CASE WHEN term IN ({_sql_stoplist('de')})
                           THEN 1 ELSE 0 END)::DOUBLE AS hits_de,
                       sum(CASE WHEN term IN ({_sql_stoplist('en')})
                           THEN 1 ELSE 0 END)::DOUBLE AS hits_en
                FROM tok GROUP BY doc_id
            ),
            -- argmax over langs sorted asc ('de' first) -> de wins ties
            r AS (
                SELECT doc_id,
                       CASE WHEN hits_de / n >= hits_en / n
                            THEN 'de' ELSE 'en' END AS best,
                       CASE WHEN hits_de / n >= hits_en / n
                            THEN hits_de / n ELSE hits_en / n END AS conf
                FROM st
            )
            SELECT d.doc_id,
                   coalesce(
                       CASE WHEN r.conf < 0.03 THEN 'und' ELSE r.best END,
                       'und') AS pred_lang,
                   coalesce(floor(r.conf * 1e6)::BIGINT, 0) AS confidence_micro
            FROM documents d LEFT JOIN r USING (doc_id) ORDER BY d.doc_id
        """,
        "text_fingerprint": f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            maxn AS (SELECT coalesce(max(len(arr)), 0) AS m FROM tokarr),
            pw AS (
                WITH RECURSIVE rec(e, v) AS (
                    SELECT 0, 1::HUGEINT
                    UNION ALL
                    SELECT e + 1, (v * {FP_BASE_SQL}) % {FP_MOD_SQL}
                    FROM rec WHERE e < (SELECT m FROM maxn)
                ) SELECT * FROM rec
            ),
            tokpos AS (
                SELECT doc_id, arr[i] AS term, i, len(arr) AS n
                FROM tokarr, unnest(range(1, len(arr) + 1)) AS t(i)
            ),
            -- token hash = md5 lower 64 bits (little-endian) mod 2^61-1;
            -- fp = sum(hash_i * BASE^(n-1-i)) mod 2^61-1, per-term mod
            -- keeps every intermediate inside HUGEINT
            fp AS (
                SELECT doc_id,
                       (sum(((md5_number_lower(term)::HUGEINT % {FP_MOD_SQL})
                             * pw.v) % {FP_MOD_SQL}) % {FP_MOD_SQL})::BIGINT AS f
                FROM tokpos JOIN pw ON pw.e = tokpos.n - tokpos.i
                GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(fp.f, 0) AS fingerprint
            FROM documents d LEFT JOIN fp USING (doc_id) ORDER BY d.doc_id
        """,
        "text_winnowing": f"""
            WITH {_winnow_sel_cte()}
            SELECT doc_id, (mk % 1048576)::BIGINT AS pos,
                   (mk // 1048576)::BIGINT AS fp
            FROM sel ORDER BY doc_id, pos
        """,
        "dedup_winnowing_pairs": f"""
            WITH {_winnow_sel_cte()},
            fps AS (
                SELECT DISTINCT doc_id, (mk // 1048576)::BIGINT AS fp FROM sel
            ),
            okfp AS (
                SELECT fp FROM fps GROUP BY fp
                HAVING count(*) BETWEEN 2 AND {WINNOW_MAX_FP_DF}
            ),
            pr AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       count(*)::BIGINT AS n_shared
                FROM fps a JOIN fps b USING (fp) JOIN okfp USING (fp)
                WHERE a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT a_id, b_id, n_shared FROM pr
            WHERE n_shared >= {WINNOW_MIN_SHARED} ORDER BY a_id, b_id
        """,
        "text_decontaminate": f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       arr[i] || ' ' || arr[i + 1] || ' ' || arr[i + 2] AS shingle
                FROM tokarr, unnest(range(1, greatest(len(arr) - 1, 1))) AS t(i)
                WHERE len(arr) >= {NGRAM_N}
            ),
            bench AS (
                SELECT DISTINCT shingle FROM sh
                WHERE doc_id % {DECONTAM_MOD} = 0
            ),
            corpus AS (SELECT * FROM sh WHERE doc_id % {DECONTAM_MOD} <> 0),
            sz AS (
                SELECT doc_id, count(*)::BIGINT AS n_shingles
                FROM corpus GROUP BY doc_id
            ),
            hits AS (
                SELECT doc_id, count(*)::BIGINT AS n_contaminated
                FROM corpus
                WHERE shingle IN (SELECT shingle FROM bench)
                GROUP BY doc_id
            )
            SELECT s.doc_id, s.n_shingles, h.n_contaminated,
                   floor(h.n_contaminated::DOUBLE / s.n_shingles * 1e6)::BIGINT
                       AS contamination_micro
            FROM sz s JOIN hits h USING (doc_id)
            WHERE h.n_contaminated > 0
            ORDER BY s.doc_id
        """,
        "text_scrub": f"""
            WITH base AS (
                SELECT doc_id,
                       CASE WHEN doc_id % {SCRUB_PLANT_MOD} = 0 THEN
                           text || ' contact user' || doc_id
                                || '@mail.example.com from 10.'
                                || (doc_id % 200) || '.' || (doc_id * 7 % 200)
                                || '.' || (doc_id % 250)
                                || ' or call +1 (555) 010-'
                                || (1000 + doc_id % 9000)
                       ELSE text END AS text
                FROM documents
            ),
            -- staged redaction in the SAME fixed order as ScrubStage
            -- (email -> ipv4 -> phone -> denylist); RE2 on both sides
            s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}'))::BIGINT
                           AS n_email,
                       regexp_replace(text,
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}',
                           '<EMAIL>', 'g') AS t
                FROM base
            ),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t,
                           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b'))::BIGINT
                           AS n_ipv4,
                       regexp_replace(t,
                           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b',
                           '<IP>', 'g') AS t
                FROM s1
            ),
            s3 AS (
                SELECT doc_id, n_email, n_ipv4,
                       len(regexp_extract_all(t,
                           '\\+?[0-9][0-9()\\-\\s]{{6,}}[0-9]'))::BIGINT AS n_phone,
                       regexp_replace(t, '\\+?[0-9][0-9()\\-\\s]{{6,}}[0-9]',
                           '<PHONE>', 'g') AS t
                FROM s2
            ),
            s4 AS (
                SELECT doc_id, n_email, n_ipv4, n_phone,
                       len(regexp_extract_all(t,
                           '\\b(?:{'|'.join(SCRUB_DENYLIST)})\\b'))::BIGINT
                           AS n_denied,
                       regexp_replace(t, '\\b(?:{'|'.join(SCRUB_DENYLIST)})\\b',
                           '<DENIED>', 'g') AS text_scrubbed
                FROM s3
            )
            SELECT doc_id, n_email, n_ipv4, n_phone, n_denied, text_scrubbed
            FROM s4 ORDER BY doc_id
        """,
        "text_pack_sequences": f"""
            WITH {_TOK_CTE},
            c AS (
                SELECT d.doc_id, coalesce(cnt.n, 0)::BIGINT AS n_tokens
                FROM documents d LEFT JOIN (
                    SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
                ) cnt USING (doc_id)
            ),
            w AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::BIGINT AS cum_before
                FROM c
            )
            SELECT doc_id, n_tokens, cum_before,
                   (cum_before // {SEQ_BUDGET})::BIGINT AS seq_id,
                   (cum_before % {SEQ_BUDGET})::BIGINT AS seq_offset,
                   (CASE WHEN n_tokens > 0
                         THEN ((cum_before + n_tokens - 1) // {SEQ_BUDGET})
                              - (cum_before // {SEQ_BUDGET}) + 1
                         ELSE 0 END)::BIGINT AS n_seqs
            FROM w ORDER BY doc_id
        """,
        "text_bigram_lm": f"""
            WITH tokarr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '{TOKEN_SPLIT_SQL}'),
                           x -> x <> '') AS arr
                FROM documents
            ),
            big AS (
                SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
                FROM tokarr, unnest(range(1, len(arr))) AS t(i)
            ),
            cab AS (SELECT a, b, count(*)::BIGINT AS c FROM big GROUP BY a, b),
            caa AS (SELECT a, sum(c)::BIGINT AS ca FROM cab GROUP BY a),
            v AS (
                SELECT count(DISTINCT t.term)::BIGINT AS v
                FROM tokarr, unnest(arr) AS t(term)
            ),
            -- ln over exact-integer float64 operands, floored to an
            -- int64 micro-logprob ONCE per distinct bigram: every
            -- downstream sum is integer arithmetic (order-independent)
            lp AS (
                SELECT cab.a, cab.b,
                       floor(ln((cab.c + 1)::DOUBLE / (caa.ca + v.v)::DOUBLE)
                             * 1e6)::BIGINT AS lp
                FROM cab JOIN caa USING (a) CROSS JOIN v
            ),
            docb AS (
                SELECT doc_id, a, b, count(*)::BIGINT AS n
                FROM big GROUP BY doc_id, a, b
            )
            SELECT doc_id,
                   sum(n)::BIGINT AS n_bigrams,
                   sum(n * lp.lp)::BIGINT AS lp_total_micro
            FROM docb JOIN lp USING (a, b)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "text_tfidf_keywords": f"""
            WITH {_TOK_CTE},
            tf AS (
                SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM tok GROUP BY doc_id, term
            ),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            -- integer-micro idf: ln once per distinct term on exact-
            -- integer float64 operands; scores stay integer arithmetic
            s AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       (tf.tf * floor(ln((n.n + 1)::DOUBLE
                                         / (df.df + 1)::DOUBLE)
                                      * 1e6)::BIGINT)::BIGINT AS score_micro
                FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score_micro DESC, term
                ) AS rnk FROM s
            )
            SELECT doc_id, term, tf, score_micro, rnk::BIGINT AS rank
            FROM r WHERE rnk <= 5 ORDER BY doc_id, rank
        """,
        "text_nb_quality": f"""
            WITH {_TOK_CTE},
            lab AS (
                SELECT doc_id,
                       source IN ('src0','src1','src2','src3','src4') AS pos
                FROM documents
            ),
            feats AS (
                SELECT DISTINCT tok.doc_id,
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
            -- NB log-count ratio, ln once per distinct feature on
            -- float64 operands with the pinned association order; every
            -- downstream sum is integer arithmetic
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
            )
            SELECT feats.doc_id,
                   max(lab.pos::BIGINT)::BIGINT AS label,
                   count(*)::BIGINT AS n_feats,
                   (sum(r.r_micro) + max(bias.b))::BIGINT AS nb_score_micro,
                   ((sum(r.r_micro) + max(bias.b)) > 0)::BIGINT AS pred
            FROM feats
            JOIN r USING (f)
            JOIN lab USING (doc_id)
            CROSS JOIN bias
            GROUP BY feats.doc_id
            ORDER BY feats.doc_id
        """,
        # DSIR (Xie et al. 2023): hashed unigram+bigram multinomial
        # importance ratios. ln ONCE per distinct bucket / per doc
        # (integer-micro, order-independent sums); the Gumbel key's
        # nested-ln chain is the same float64 libm sequence on both
        # engines (verified bit-equal).
        "text_dsir_weights": f"""
            WITH {_DSIR_W_CTE}
            SELECT doc_id, n_grams, logw_micro, gumbel_micro,
                   (logw_micro + gumbel_micro)::BIGINT AS key_micro
            FROM allw ORDER BY doc_id
        """,
        # exact grouped percentiles: quantile_disc == the engine's
        # integer-ceil threshold rule (verified across n in pytest)
        "text_length_quantiles": """
            SELECT lang, count(*)::BIGINT AS n,
                   quantile_disc(length(text), 0.25)::BIGINT AS p25,
                   quantile_disc(length(text), 0.50)::BIGINT AS p50,
                   quantile_disc(length(text), 0.75)::BIGINT AS p75,
                   quantile_disc(length(text), 0.90)::BIGINT AS p90,
                   quantile_disc(length(text), 0.99)::BIGINT AS p99
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # distributed PageRank vs the unrolled integer CTE chain
        "graph_pagerank": _pagerank_sql(5),
        "graph_hits": _hits_sql(3),
        "url_canonicalize": r"""
            WITH u AS (
              SELECT doc_id,
                     (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
                     || '://WWW' || (doc_id % 5) || '.Example.COM'
                     || (CASE WHEN doc_id % 3 = 0
                              THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                              WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
                     || '/p/' || doc_id
                     || '?b=' || (doc_id % 3) || '&utm_source=feed&a=' || (doc_id % 7)
                     || (CASE WHEN doc_id % 2 = 0 THEN '#s1' ELSE '' END) AS url
              FROM documents),
            p AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                     regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS auth,
                     regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
                     regexp_extract(url, '\?([^#]*)', 1) AS q
              FROM u),
            c AS (
              SELECT doc_id, url,
                     lower(regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1)) AS host,
                     regexp_extract(auth, ':([0-9]+)$', 1) AS port,
                     (CASE WHEN contains(auth, '@')
                           THEN regexp_extract(auth, '^([^@]*)@', 1) || '@'
                           ELSE '' END) AS userpfx,
                     scheme, path,
                     array_to_string(
                       list_sort(list_filter(string_split(q, '&'),
                                 x -> x <> '' AND NOT starts_with(x, 'utm_'))),
                       '&') AS q2
              FROM p)
            SELECT doc_id, url,
                   scheme || '://' || userpfx || host
                   || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                                OR (scheme = 'https' AND port = '443')
                            THEN '' ELSE ':' || port END)
                   || (CASE WHEN path = '' THEN '/' ELSE path END)
                   || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS canonical_url
            FROM c ORDER BY doc_id
        """,
        "text_cooccurrence": """
            WITH tokarr AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS arr
              FROM documents),
            tokpos AS (
              SELECT doc_id, arr[i] AS term, i
              FROM tokarr, unnest(range(1, len(arr) + 1)) AS t(i)),
            firsts AS (
              SELECT doc_id, term, min(i) AS fi FROM tokpos GROUP BY doc_id, term),
            kept AS (
              SELECT doc_id, term FROM (
                SELECT doc_id, term,
                       row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS rk
                FROM firsts) WHERE rk <= 16),
            ca AS (SELECT term, count(*)::BIGINT AS term_docs FROM kept GROUP BY term),
            pairs AS (
              SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS pair_docs
              FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY a.term, b.term HAVING count(*) >= 5)
            SELECT p.term_a, p.term_b, p.pair_docs,
                   (floor(ln(p.pair_docs::DOUBLE) * 1000000)::BIGINT
                    + floor(ln((SELECT count(*) FROM documents)::DOUBLE) * 1000000)::BIGINT
                    - floor(ln(x.term_docs::DOUBLE) * 1000000)::BIGINT
                    - floor(ln(y.term_docs::DOUBLE) * 1000000)::BIGINT) AS pmi_micro
            FROM pairs p
            JOIN ca x ON x.term = p.term_a
            JOIN ca y ON y.term = p.term_b
            ORDER BY term_a, term_b
        """,
        "link_anchor_stats": _anchor_stats_sql(),
        "search_bm25_anchor": _anchor_bm25_sql(BM25_TERM),
        "search_bm25_anchor_boost": _anchor_boost_sql(BM25_TERM, ANCHOR_BOOST_W),
        "search_df_histogram": f"""
            WITH {_TOK_CTE},
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM tok GROUP BY doc_id, term),
            st AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
                   FROM tf GROUP BY term)
            -- exact floor(log2(df)): binary-digit count minus one
            SELECT (length(printf('%b', df)) - 1)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_terms,
                   sum(df)::BIGINT AS sum_df,
                   sum(cf)::BIGINT AS sum_cf
            FROM st GROUP BY bucket ORDER BY bucket
        """,
        "search_ql_dirichlet": f"""
            WITH {_TOK_CTE},
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                   FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS doclen
                   FROM tok GROUP BY doc_id),
            cstats AS (SELECT count(*)::DOUBLE AS c FROM tok),
            cf AS (SELECT term, count(*)::DOUBLE AS cf
                   FROM tok GROUP BY term),
            m AS (SELECT DISTINCT doc_id FROM tf
                  WHERE term IN ('{BM25_OR_TERMS[0]}', '{BM25_OR_TERMS[1]}')),
            s1 AS (
                SELECT m.doc_id,
                       ln((coalesce(tf.tf, 0) + {QL_MU} *
                           ((SELECT cf FROM cf WHERE term = '{BM25_OR_TERMS[0]}')
                            / (SELECT c FROM cstats)))
                          / (dl.doclen + {QL_MU})) AS l
                FROM m JOIN dl USING (doc_id)
                LEFT JOIN tf ON tf.doc_id = m.doc_id
                           AND tf.term = '{BM25_OR_TERMS[0]}'
            ),
            s2 AS (
                SELECT m.doc_id,
                       ln((coalesce(tf.tf, 0) + {QL_MU} *
                           ((SELECT cf FROM cf WHERE term = '{BM25_OR_TERMS[1]}')
                            / (SELECT c FROM cstats)))
                          / (dl.doclen + {QL_MU})) AS l
                FROM m JOIN dl USING (doc_id)
                LEFT JOIN tf ON tf.doc_id = m.doc_id
                           AND tf.term = '{BM25_OR_TERMS[1]}'
            )
            SELECT doc_id, round(s1.l + s2.l, 4) AS score
            FROM s1 JOIN s2 USING (doc_id) ORDER BY doc_id
        """,
        # CCNet perplexity buckets: LM chain + the SAME integer-ceil
        # tercile rule via window functions (no float quantile q)
        "text_ccnet_buckets": f"""
            WITH {_BIGRAM_SCORED_CTE},
            docs2 AS (
                SELECT s.doc_id, d.lang,
                       ((-s.lp_total_micro) * 1000) // s.n_bigrams AS ppl_milli
                FROM scored s JOIN documents d USING (doc_id)
                WHERE s.n_bigrams > 0
            ),
            ranked AS (
                SELECT lang, ppl_milli,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY ppl_milli, doc_id
                       ) AS rk,
                       count(*) OVER (PARTITION BY lang) AS cnt
                FROM docs2
            ),
            th AS (
                SELECT lang,
                       -- ceil(q*cnt) on positive ints ((a+b-1)//b:
                       -- DuckDB // truncates toward zero on negatives)
                       max(CASE WHEN rk = (333334 * cnt + 999999) // 1000000
                                THEN ppl_milli END) AS t33,
                       max(CASE WHEN rk = (666667 * cnt + 999999) // 1000000
                                THEN ppl_milli END) AS t66
                FROM ranked GROUP BY lang
            )
            SELECT d.doc_id, d.lang, d.ppl_milli,
                   CASE WHEN d.ppl_milli <= t.t33 THEN 'head'
                        WHEN d.ppl_milli <= t.t66 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM docs2 d JOIN th t USING (lang)
            ORDER BY d.doc_id
        """,
        # large-large partitioned equi-join (hash_join): lineitem x
        # orders, grouped integer-cents revenue
        "rel_order_lineitem_join": """
            SELECT o.o_orderpriority, l.l_returnflag,
                   sum(l.l_quantity::BIGINT)::BIGINT AS sum_qty,
                   sum(floor((l.l_extendedprice * (1 - l.l_discount)) * 100)::BIGINT)::BIGINT
                       AS sum_revenue_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority, l.l_returnflag
            ORDER BY o.o_orderpriority, l.l_returnflag
        """,
        # registered-domain reduction: the SQL rebuilds the same urls
        # closed-form and groups by the suffix-aware domain directly
        "text_domain_stats": """
            WITH u AS (
                SELECT source || '.' ||
                           (CASE doc_id % 4 WHEN 0 THEN 'com'
                                            WHEN 1 THEN 'co.uk'
                                            WHEN 2 THEN 'org'
                                            ELSE 'com.au' END) AS domain,
                       'w' || CAST(doc_id % 7 AS VARCHAR) AS sub,
                       n_chars
                FROM documents
            )
            SELECT domain,
                   COUNT(*)::BIGINT AS n_docs,
                   COUNT(DISTINCT sub)::BIGINT AS n_hosts,
                   SUM(n_chars)::BIGINT AS sum_chars
            FROM u GROUP BY domain ORDER BY domain
        """,
        # WARC container round trip: the engine-side WARC write/parse/
        # extract chain must reproduce the source table exactly
        "text_warc_roundtrip": """
            SELECT 'https://' || source || '.example/d/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   doc_id * 1000000 AS ts_us,
                   lang, text
            FROM documents ORDER BY url
        """,
        "text_dsir_select": f"""
            WITH {_DSIR_W_CTE},
            ranked AS (
                SELECT *,
                       (logw_micro + gumbel_micro)::BIGINT AS key_micro,
                       row_number() OVER (
                           ORDER BY (logw_micro + gumbel_micro) DESC, doc_id
                       )::BIGINT AS rank
                FROM allw
            )
            SELECT doc_id, n_grams, logw_micro, gumbel_micro, key_micro, rank
            FROM ranked WHERE rank <= 100 ORDER BY rank
        """,
        "text_dedup_substr": f"""
            WITH tokarr AS (
                SELECT doc_id, str_split(text, ' ') AS arr FROM documents
            ),
            toks AS (
                SELECT doc_id, i - 1 AS pos, arr[i] AS tok
                FROM tokarr, unnest(range(1, len(arr) + 1)) AS t(i)
            ),
            h AS (
                SELECT doc_id, pos, tok,
                       md5_number_lower(tok)::HUGEINT % 2305843009213693951 AS th
                FROM toks
            ),
            pre AS (
                SELECT doc_id, pos, th,
                       sum(th) OVER w AS s1,
                       sum(th * (pos + 1)) OVER w AS s2,
                       sum(th * (pos + 1) * (pos + 1)) OVER w AS s3
                FROM h
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING)
            ),
            wins AS (
                SELECT doc_id, pos,
                       lead(s1, {SUBSTR_W - 1}) OVER d - s1 + th AS a,
                       lead(s2, {SUBSTR_W - 1}) OVER d - s2
                           + th * (pos + 1) AS b,
                       lead(s3, {SUBSTR_W - 1}) OVER d - s3
                           + th * (pos + 1) * (pos + 1) AS c
                FROM pre
                WINDOW d AS (PARTITION BY doc_id ORDER BY pos)
            ),
            keys AS (
                SELECT doc_id, pos,
                       (b - pos * a)
                           % CAST('18446744073709551616' AS HUGEINT) AS key1,
                       (c - 2 * pos * b + pos * pos * a)
                           % CAST('18446744073709551616' AS HUGEINT) AS key2
                FROM wins WHERE a IS NOT NULL
            ),
            dup AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           row_number() OVER (PARTITION BY key1, key2
                                              ORDER BY doc_id, pos) AS rn
                    FROM keys)
                WHERE rn > 1
            ),
            flags AS (
                SELECT t.doc_id, t.pos, t.tok,
                       coalesce(max(d.one) OVER (
                           PARTITION BY t.doc_id ORDER BY t.pos
                           ROWS BETWEEN {SUBSTR_W - 1} PRECEDING
                                AND CURRENT ROW), 0) AS cut
                FROM toks t
                LEFT JOIN (SELECT doc_id, pos, 1 AS one FROM dup) d
                  USING (doc_id, pos)
            )
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY pos)
                       FILTER (WHERE cut = 0) AS text,
                   sum(cut)::BIGINT AS n_cut
            FROM flags
            GROUP BY doc_id
            HAVING count(*) FILTER (WHERE cut = 0) > 0
            ORDER BY doc_id
        """,
        "text_dedup_spans": f"""
            WITH tokarr AS (
                SELECT doc_id, str_split(text, ' ') AS arr FROM documents
            ),
            spans AS (
                SELECT doc_id, ((i - 1) // {SPAN_K})::BIGINT AS span_idx,
                       string_agg(arr[i], ' ' ORDER BY i) AS span
                FROM tokarr, unnest(range(1, len(arr) + 1)) AS t(i)
                GROUP BY doc_id, (i - 1) // {SPAN_K}
            ),
            kept AS (
                SELECT doc_id, span_idx, span,
                       row_number() OVER (
                           PARTITION BY
                               (md5_number_lower(span)::HUGEINT % {FP_MOD_SQL})
                           ORDER BY doc_id, span_idx) AS rn
                FROM spans
            )
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS text,
                   count(*)::BIGINT AS n_spans
            FROM kept WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id
        """,
        "pipeline_curate": f"""
            -- same pinned stage order as pipelines/curate.py:
            -- scrub -> quality gate -> seeded sample -> exact dedup
            -- keep-first -> span dedup rewrite -> sequence packing
            WITH s1 AS (
                SELECT doc_id, lang,
                       regexp_replace(text,
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}',
                           '<EMAIL>', 'g') AS t
                FROM documents
            ),
            s2 AS (
                SELECT doc_id, lang,
                       regexp_replace(t,
                           '\\b(?:[0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b',
                           '<IP>', 'g') AS t
                FROM s1
            ),
            s3 AS (
                SELECT doc_id, lang,
                       regexp_replace(t, '\\+?[0-9][0-9()\\-\\s]{{6,}}[0-9]',
                           '<PHONE>', 'g') AS t
                FROM s2
            ),
            scrubbed AS (
                SELECT doc_id, lang,
                       regexp_replace(t, '\\b(?:{'|'.join(SCRUB_DENYLIST)})\\b',
                           '<DENIED>', 'g') AS text
                FROM s3
            ),
            tokq AS (
                SELECT doc_id, t.term
                FROM scrubbed,
                     unnest(regexp_split_to_array(lower(text),
                            '{TOKEN_SPLIT_SQL}')) AS t(term)
                WHERE t.term <> ''
            ),
            stq AS (
                SELECT doc_id,
                       count(*)::DOUBLE AS n,
                       sum(CASE WHEN term IN ({_sql_stoplist('en')})
                           THEN 1 ELSE 0 END)::DOUBLE AS hits,
                       count(DISTINCT term)::DOUBLE AS u,
                       sum(length(term))::DOUBLE AS sl
                FROM tokq GROUP BY doc_id
            ),
            gate AS (
                SELECT s.doc_id, s.text
                FROM scrubbed s JOIN stq USING (doc_id)
                WHERE floor((
                          0.25 * least(stq.n / 256.0, 1.0)
                          + 0.25 * least(stq.u / stq.n, 1.0)
                          + 0.25 * least((stq.hits / stq.n) * 5.0, 1.0)
                          + 0.25 * least(greatest(((stq.sl / stq.n) - 2.0)
                                                  / 8.0, 0.0), 1.0)
                      ) * 1e6)::BIGINT >= {CURATE_QMIN_MICRO}
                  AND (md5_number_lower('{SAMPLE_SEED}:' || s.doc_id)::HUGEINT
                       % 1000000)
                      < CASE s.lang
                          {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_MICRO.items())}
                          ELSE {SAMPLE_DEFAULT_MICRO} END
            ),
            ed AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           row_number() OVER (
                               PARTITION BY text ORDER BY doc_id) AS rn
                    FROM gate
                ) WHERE rn = 1
            ),
            sparr AS (SELECT doc_id, str_split(text, ' ') AS arr FROM ed),
            spans AS (
                SELECT doc_id, ((i - 1) // {SPAN_K})::BIGINT AS span_idx,
                       string_agg(arr[i], ' ' ORDER BY i) AS span
                FROM sparr, unnest(range(1, len(arr) + 1)) AS t(i)
                GROUP BY doc_id, (i - 1) // {SPAN_K}
            ),
            spkept AS (
                SELECT doc_id, span_idx, span,
                       row_number() OVER (
                           PARTITION BY
                               (md5_number_lower(span)::HUGEINT % {FP_MOD_SQL})
                           ORDER BY doc_id, span_idx) AS rn
                FROM spans
            ),
            rw AS (
                SELECT doc_id,
                       string_agg(span, ' ' ORDER BY span_idx) AS text
                FROM spkept WHERE rn = 1 GROUP BY doc_id
            ),
            tok2 AS (
                SELECT doc_id, t.term
                FROM rw, unnest(regexp_split_to_array(lower(text),
                                '{TOKEN_SPLIT_SQL}')) AS t(term)
                WHERE t.term <> ''
            ),
            c AS (
                SELECT rw.doc_id, coalesce(cnt.n, 0)::BIGINT AS n_tokens
                FROM rw LEFT JOIN (
                    SELECT doc_id, count(*) AS n FROM tok2 GROUP BY doc_id
                ) cnt USING (doc_id)
            ),
            w AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::BIGINT AS cum_before
                FROM c
            )
            SELECT doc_id, n_tokens, cum_before,
                   (cum_before // {SEQ_BUDGET})::BIGINT AS seq_id,
                   (cum_before % {SEQ_BUDGET})::BIGINT AS seq_offset,
                   (CASE WHEN n_tokens > 0
                         THEN ((cum_before + n_tokens - 1) // {SEQ_BUDGET})
                              - (cum_before // {SEQ_BUDGET}) + 1
                         ELSE 0 END)::BIGINT AS n_seqs
            FROM w ORDER BY doc_id
        """,
        "text_sample_stratified": f"""
            WITH b AS (
                SELECT doc_id, lang,
                       (md5_number_lower('{SAMPLE_SEED}:' || doc_id)::HUGEINT
                        % 1000000)::BIGINT AS bucket,
                       CASE lang
                           {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES_MICRO.items())}
                           ELSE {SAMPLE_DEFAULT_MICRO} END AS thresh
                FROM documents
            )
            SELECT doc_id, lang, bucket FROM b
            WHERE bucket < thresh ORDER BY doc_id
        """,
        "text_source_cap": f"""
            WITH b AS (
                SELECT doc_id, source,
                       (md5_number_lower('{SAMPLE_SEED}:' || doc_id)::HUGEINT
                        % 1000000)::BIGINT AS bucket
                FROM documents
            ),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY bucket, doc_id
                )::BIGINT AS rk FROM b
            )
            SELECT doc_id, source, bucket, rk FROM r
            WHERE rk <= {SOURCE_CAP} ORDER BY doc_id
        """,
        "ann_cosine_topk": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < {ANN_NQ}
            ),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS raw
                FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
                SELECT query_id, vec_id, raw,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY raw DESC, vec_id
                       ) AS rank
                FROM scored
            )
            SELECT query_id, rank::BIGINT AS rank, vec_id,
                   round(raw, 4) AS score
            FROM ranked WHERE rank <= {ANN_K}
            ORDER BY query_id, rank
        """,
        "emb_dup_pairs": f"""
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  >= {COSINE_TAU}
            ORDER BY a_id, b_id
        """,
    }
