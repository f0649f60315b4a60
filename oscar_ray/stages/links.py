"""Anchor-text inheritance over the web link graph (SURVEY.md M6 analog).

The reference inherits region strings into every contained item's
searchable string set (``OsmKeyValueObjectStore`` region-string
inheritance — SURVEY.md M6, previously marked n/a as geometry). The
webtext analog is the classic web-search feature: a page is indexed
under the anchor text of the links that POINT AT it. Pipeline:

1. :func:`extract_links` — map_batches over the pages table's ``html``
   column: one compiled-regex pass per document (the same cost class as
   the html->text extractors, spec/extract.py) emitting
   ``(src_url, link_pos, dst_url, anchor)`` rows.
2. :func:`aggregate_anchors` — ONE hash-routed exchange on
   ``dst_url`` (splitmix over the pinned string hash, the repo's
   standard routing discipline), then fully vectorized per-part work:
   arrow sort by (dst, src, pos), per-destination inlink counts, a cap
   of ``max_inlinks`` anchors per destination (spam/skew bound: a hub
   page with millions of inlinks contributes a bounded term stream),
   tokenizer-normalized anchors joined into one ``anchor_text`` string
   per destination.
3. Index inheritance — join ``anchor_text`` onto the corpus (the
   partitioned ``hash_join``) and build with
   ``IndexBuildConfig(extra_text_columns=["anchor_text"])``: anchor
   tokens then contribute tf / doclen / positions exactly like body
   tokens (build.py stage A concatenation).

Fixture link rule (pinned; what makes the SQL oracle possible): the
synthetic corpus wires doc ``d`` (normalized token list ``toks``,
``n = len(toks)``) to ``min(MAX_OUT_LINKS, n // TOKENS_PER_LINK)``
targets,

    dst(d, j)    = (d * LINK_MULT + j * LINK_STEP) % n_docs      j >= 1
    anchor(d, j) = " ".join(toks[3*(j-1) : 3*(j-1) + 3])

All-integer arithmetic and token slices of the already-normalized
stream, so DuckDB reproduces links, aggregation, and the enriched BM25
bit-identically (``__ray_entry__`` link_anchor_stats /
search_bm25_anchor oracles). Fixture urls zero-pad the docid
(``doc://%012d``) so lexicographic src-url order equals numeric doc
order — the aggregation orders lexicographically; the oracle orders
numerically.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens

LINK_MULT = 2654435761  # Knuth multiplicative hash constant (public)
LINK_STEP = 40503
MAX_OUT_LINKS = 3
TOKENS_PER_LINK = 8
ANCHOR_TOKENS = 3
DOC_URL_FMT = "doc://%012d"

_A_RE = re.compile(rb'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', re.S | re.I)


def doc_url(doc_id: int) -> str:
    return DOC_URL_FMT % doc_id


def fixture_links_for_tokens(
    doc_id: int, toks: list[str], n_docs: int
) -> list[tuple[str, str]]:
    """The pinned fixture link rule: (dst_url, anchor) pairs for one doc."""
    n_links = min(MAX_OUT_LINKS, len(toks) // TOKENS_PER_LINK)
    out = []
    for j in range(1, n_links + 1):
        dst = (doc_id * LINK_MULT + j * LINK_STEP) % n_docs
        anchor = " ".join(toks[3 * (j - 1) : 3 * (j - 1) + ANCHOR_TOKENS])
        out.append((doc_url(dst), anchor))
    return out


def _extract_links_batch(batch: pa.Table, html_col: str, url_col: str) -> pa.Table:
    """One compiled-regex findall per document (extractor cost class)."""
    src_urls: list[str] = []
    positions: list[int] = []
    dsts: list[str] = []
    anchors: list[str] = []
    urls = batch[url_col].to_pylist()
    for src, h in zip(urls, batch[html_col].to_pylist()):
        if not h:
            continue
        for pos, m in enumerate(_A_RE.finditer(h)):
            src_urls.append(src)
            positions.append(pos)
            dsts.append(_html.unescape(m.group(1).decode("utf-8", "replace")))
            anchors.append(_html.unescape(m.group(2).decode("utf-8", "replace")))
    return pa.table(
        {
            "src_url": pa.array(src_urls, type=pa.string()),
            "link_pos": pa.array(positions, type=pa.int32()),
            "dst_url": pa.array(dsts, type=pa.string()),
            "anchor": pa.array(anchors, type=pa.string()),
        }
    )


def extract_links(
    pages: ray.data.Dataset, html_col: str = "html", url_col: str = "url"
) -> ray.data.Dataset:
    """Pages -> (src_url, link_pos, dst_url, anchor) link rows.

    ``link_pos`` is the in-page link ordinal — the deterministic
    tiebreak for the aggregation order (two links from the same page to
    the same target keep their page order).
    """
    return pages.map_batches(
        lambda b: _extract_links_batch(b, html_col, url_col),
        batch_format="pyarrow",
    )


def _norm_join(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Tokenizer-normalize a string column, re-joining tokens with ' '.

    Vectorized: flatten_tokens (arrow kernels, '' dropped) -> rebuild
    per-row list offsets via bincount -> one binary_join.
    """
    n = len(col)
    parent, toks = flatten_tokens(col)
    counts = np.bincount(np.asarray(parent), minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.ListArray.from_arrays(pa.array(offsets), toks)
    return pc.binary_join(lists, " ")


def _aggregate_part(batch: pa.Table, max_inlinks: int) -> pa.Table:
    """Per-part anchor fold: sort, count, cap, join — all vectorized."""
    tbl = pa.table(
        {
            "dst_url": batch["dst_url"],
            "src_url": batch["src_url"],
            "link_pos": batch["link_pos"],
            # raw anchors here; ONE tokenizer-normalize pass runs on the
            # final per-destination join (separator-joined, so token
            # boundaries are preserved either way)
            "anchor": pc.fill_null(batch["anchor"].combine_chunks(), ""),
        }
    ).sort_by(
        [("dst_url", "ascending"), ("src_url", "ascending"), ("link_pos", "ascending")]
    )
    dst_codes_arr = pc.dictionary_encode(tbl["dst_url"].combine_chunks())
    codes = np.asarray(dst_codes_arr.indices, dtype=np.int64)
    n_dst = len(dst_codes_arr.dictionary)
    counts = np.bincount(codes, minlength=n_dst)
    starts = np.zeros(n_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(len(codes), dtype=np.int64) - starts[codes]
    keep = rank < max_inlinks
    kept_counts = np.minimum(counts, max_inlinks)
    offsets = np.zeros(n_dst + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    kept_anchors = tbl["anchor"].combine_chunks().filter(pa.array(keep))
    lists = pa.ListArray.from_arrays(pa.array(offsets), kept_anchors)
    return pa.table(
        {
            "dst_url": dst_codes_arr.dictionary,
            "n_inlinks": pa.array(counts, type=pa.int64()),
            "anchor_text": _norm_join(pc.binary_join(lists, " ")),
        }
    )


def aggregate_anchors(
    links: ray.data.Dataset, max_inlinks: int = 8, num_parts: int = 32
) -> ray.data.Dataset:
    """Link rows -> one (dst_url, n_inlinks, anchor_text) row per target.

    ``anchor_text`` concatenates the tokenizer-normalized anchors of the
    first ``max_inlinks`` inlinks in (src_url, link_pos) order;
    ``n_inlinks`` counts ALL inlinks (pre-cap). One hash-routed
    exchange; per-part work is arrow sort + numpy segment arithmetic
    (no per-destination Python).
    """
    from oscar_ray.stages.dedup import hash_strings_u64

    def _route(batch: pa.Table) -> pa.Table:
        h = hash_strings_u64(batch["dst_url"].combine_chunks())
        return batch.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int64))
        )

    return (
        links.map_batches(_route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: _aggregate_part(
                t.drop_columns(["part"]) if "part" in t.column_names else t,
                max_inlinks,
            ),
            batch_format="pyarrow",
        )
    )
