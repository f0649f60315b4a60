"""Anchor-text inheritance pipeline over the ``documents`` corpus.

The M6 webtext analog end-to-end (see stages/links.py for the operator
and the pinned fixture link rule): generate linked pages (html with a
``<nav>`` of fixture links), extract ``<a href>`` rows, aggregate
anchors per target, join them onto the corpus with the partitioned
``hash_join``, and build an index whose docs are ALSO searchable under
their inlink anchor text (``IndexBuildConfig.extra_text_columns``).

Everything is cached under /tmp keyed by the input fingerprint, like
the other per-sf index caches (pipelines/search.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from oscar_ray.index.build import IndexBuildConfig, build_index
from oscar_ray.pipelines.search import _CACHE_ROOT, documents_path
from oscar_ray.spec.extract import make_html
from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.links import (
    aggregate_anchors,
    doc_url,
    extract_links,
    fixture_links_for_tokens,
)

MAX_INLINKS = 8  # anchors kept per target (the aggregation cap)


def _docs_fingerprint(sf_dir: str) -> str:
    from oscar_ray.sources.pages import input_fingerprint, list_fragments

    return input_fingerprint(list_fragments(documents_path(sf_dir)))


def _commit_dir(tmp_dir: str, out_dir: str) -> None:
    """Atomic publish: rename the fully-written tmp dir into place."""
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        if not os.path.isdir(out_dir):  # lost a race for a different reason
            raise


def _gen_linked_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """documents rows -> pages rows with fixture <nav> links in the html.

    Token lists come from ONE vectorized tokenize pass; the per-row html
    assembly is a Python loop (the same cost class as the media fixture
    generators, sources/synth.py — generator-only, not an operator path).
    """
    doc_ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    parent, toks = flatten_tokens(batch["text"].combine_chunks())
    counts = np.bincount(np.asarray(parent), minlength=len(batch))
    offsets = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    toks_py = toks.to_pylist()
    htmls = []
    urls = []
    for i, d in enumerate(doc_ids):
        row_toks = toks_py[offsets[i] : offsets[i + 1]]
        links = fixture_links_for_tokens(int(d), row_toks, n_docs)
        urls.append(doc_url(int(d)))
        htmls.append(make_html(texts[i] or "", title=urls[-1], links=links))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": pa.array(urls, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
            "text": batch["text"],
            "lang": batch["lang"],
        }
    )


def linked_pages_dir(sf_dir: str) -> str:
    """Build (or reuse) the linked-pages fixture table for one sf dir."""
    fp = _docs_fingerprint(sf_dir)
    out = os.path.join(_CACHE_ROOT, f"linked-pages-{fp}")
    if os.path.isdir(out):
        return out
    src = documents_path(sf_dir)
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(src).metadata.num_rows
    tmp = f"{out}.tmp-{os.getpid()}"
    (
        ray.data.read_parquet(src, columns=["doc_id", "text", "lang"])
        .map_batches(
            lambda b: _gen_linked_batch(b, n_docs), batch_format="pyarrow"
        )
        .write_parquet(tmp)
    )
    _commit_dir(tmp, out)
    return out


def anchors_dataset(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_inlinks, anchor_text) — one row per link-target doc."""
    pages = ray.data.read_parquet(
        linked_pages_dir(sf_dir), columns=["url", "html"]
    )
    agg = aggregate_anchors(extract_links(pages), max_inlinks=MAX_INLINKS)

    def _parse_doc_id(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_replace_slice(batch["dst_url"], 0, 6, ""), pa.int64()
        )
        return pa.table(
            {
                "doc_id": ids,
                "n_inlinks": batch["n_inlinks"],
                "anchor_text": batch["anchor_text"],
            }
        )

    return agg.map_batches(_parse_doc_id, batch_format="pyarrow")


def enrich_corpus_with_anchors(
    input_paths: str | list[str],
    out_dir: str,
    url_col: str = "url",
    html_col: str = "html",
    max_inlinks: int = MAX_INLINKS,
    num_parts: int = 32,
) -> None:
    """Corpus rewrite: pages -> pages + inherited ``anchor_text`` column.

    The ``oscar_create --anchors`` pre-pass: extract links from the
    corpus's OWN html, aggregate anchors per target url, left-join them
    back on via the partitioned hash_join, and write the enriched corpus
    (all original columns + ``anchor_text`` + the layout docid as
    ``_docid``). The join reorders rows, so the docid travels WITH each
    row (sources/pages.pages_dataset_with_docids) and the subsequent
    build uses ``id_column="_docid"`` — artifacts are independent of the
    rewrite's row order. Scale: two corpus passes (extract + join) and
    one anchor exchange, all streaming; nothing corpus-sized on the
    driver.
    """
    from oscar_ray.stages.joins import hash_join
    from oscar_ray.sources.pages import pages_dataset_with_docids

    # two pruned corpus passes, separate lineages (a Dataset consumed
    # twice re-executes its read): extraction needs only (url, html)
    link_pages = pages_dataset_with_docids(
        input_paths, columns=[url_col, html_col]
    )
    pages = pages_dataset_with_docids(input_paths)
    anchors = aggregate_anchors(
        extract_links(link_pages, html_col=html_col, url_col=url_col),
        max_inlinks=max_inlinks,
        num_parts=num_parts,
    ).drop_columns(["n_inlinks"])
    enriched = hash_join(
        pages,
        anchors,
        on=(url_col, "dst_url"),
        how="left",
        num_parts=num_parts,
    )
    tmp = f"{out_dir}.tmp-{os.getpid()}"
    # bounded row groups: the join emits ONE block per part (num_parts
    # files); without a row-group cap the downstream build's stage-A
    # sharding (one shard per few row groups) would collapse to
    # num_parts-way parallelism regardless of corpus size
    enriched.write_parquet(tmp, row_group_size=16384)
    _commit_dir(tmp, out_dir)


def _anchored_corpus_dir(sf_dir: str) -> str:
    """Materialize (once, cached) the anchor-enriched documents corpus:
    (doc_id, text, lang, anchor_text) with anchors from the pinned
    link rule."""
    from oscar_ray.stages.joins import hash_join

    fp = _docs_fingerprint(sf_dir)
    corpus = os.path.join(_CACHE_ROOT, f"documents-anchored-{fp}")
    if not os.path.isdir(corpus):
        docs = ray.data.read_parquet(
            documents_path(sf_dir), columns=["doc_id", "text", "lang"]
        )
        joined = hash_join(
            docs, anchors_dataset(sf_dir), on="doc_id", how="left", num_parts=8
        )
        tmp = f"{corpus}.tmp-{os.getpid()}"
        joined.select_columns(["doc_id", "text", "lang", "anchor_text"]).write_parquet(
            tmp
        )
        _commit_dir(tmp, corpus)
    return corpus


def anchored_documents_index_dir(sf_dir: str) -> str:
    """Enriched corpus (text + inherited anchor_text) index, cached."""
    fp = _docs_fingerprint(sf_dir)
    corpus = _anchored_corpus_dir(sf_dir)

    out = os.path.join(_CACHE_ROOT, f"documents-anchored-idx-{fp}")
    cfg = IndexBuildConfig(
        num_partitions=8,
        block_span_bits=12,
        shard_fragments=2,
        id_column="doc_id",
        url_column=None,
        lang_column="lang",
        dedup_urls=False,
        field_columns=["lang"],
        extra_text_columns=["anchor_text"],
    )
    build_index(os.path.join(corpus, "*.parquet"), out, cfg)
    return out


def anchors_only_index_dir(sf_dir: str) -> str:
    """Anchor-text-ONLY index over the same docid space — the second
    field of the weighted-field (BM25F-style) pair; body field =
    ``search.documents_index_dir``. Docs with no inlinks keep doclen 0
    docmeta rows, so n_docs/avgdl match the SQL oracle's
    whole-corpus denominators."""
    fp = _docs_fingerprint(sf_dir)
    corpus = _anchored_corpus_dir(sf_dir)
    out = os.path.join(_CACHE_ROOT, f"documents-anchoronly-idx-{fp}")
    cfg = IndexBuildConfig(
        num_partitions=8,
        block_span_bits=12,
        shard_fragments=2,
        id_column="doc_id",
        url_column=None,
        lang_column="lang",
        dedup_urls=False,
        text_column="anchor_text",
        field_columns=["lang"],
    )
    build_index(os.path.join(corpus, "*.parquet"), out, cfg)
    return out
