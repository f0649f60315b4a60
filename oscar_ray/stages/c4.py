"""C4-style line-level cleaning (Raffel et al. 2020 §2.2, the public C4
heuristics): split a document into lines, keep only lines that end in a
terminal punctuation mark, have at least ``min_words`` words and don't
mention a bad substring ("javascript"), then drop whole documents with
fewer than ``min_sentences`` sentences, a "lorem ipsum" placeholder, or a
curly brace (code leakage).

Shape: a stateless, shuffle-free ``map_batches`` stage — one
``split_pattern`` + RE2 kernel pass per batch, per-doc counts via
``bincount`` over ``list_parent_indices``, the cleaned text rebuilt with
``binary_join`` over re-offset kept lines. No Python loop over rows or
lines; no data movement beyond the block, so at 100 TB the stage is
embarrassingly parallel (the same envelope as stages/scrub.py).

Every rule is a pinned parameter (``C4Rules``) because the synthetic
bench corpus has neither newlines nor punctuation: pytests exercise the
REAL C4 defaults over a punctuation fixture, while the driver entry
(`text_c4_filters`) maps the same machinery onto the synthetic vocab
(line separator " line ", terminal words instead of terminal
punctuation) with a DuckDB ``list_filter`` oracle.

Determinism contract: Arrow and DuckDB both compile the regexes with
RE2 and both split on the literal separator left-to-right and
non-overlapping, so line sets, word counts and sentence counts match
bit-for-bit. Trimming uses a pinned character set (space, tab, CR) —
DuckDB's bare ``trim`` strips spaces only.

Reference analog: the per-line regex filter tables the reference applies
at extraction time (`oscar-create/readwritefuncs.cpp` key/value filter
tables); here they gate lines of web text instead of OSM tags.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: pinned trim set — mirror in SQL as trim(x, ' ' || chr(9) || chr(13))
TRIM_CHARS = " \t\r"


@dataclass(frozen=True)
class C4Rules:
    """One C4 cleaning configuration; defaults are the published rules."""

    line_sep: str = "\n"  # literal separator, not a regex
    terminal_regex: str = r'[.!?"]$'  # applied to the trimmed line
    min_words: int = 3  # words = RE2 \S+ runs in the trimmed line
    bad_line_substr: str = "javascript"  # case-insensitive; "" disables
    min_sentences: int = 5  # counted over the CLEANED text
    sentence_regex: str = r"[.!?]"
    bad_doc_substr: str = "lorem ipsum"  # case-insensitive; "" disables
    brace_doc_filter: bool = True  # drop docs containing "{"


def c4_line_filter(
    batch: pa.Table,
    rules: C4Rules = C4Rules(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Per-doc C4 cleaning -> (id, n_lines, n_kept, n_sentences, keep,
    text_clean). ``keep`` is int32 0/1 (document-level verdict);
    ``text_clean`` is the kept lines (trimmed) joined with "\\n"."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(pc.cast(text, pa.string()), "")
    lines = pc.split_pattern(text, rules.line_sep)
    parent = np.asarray(pc.list_parent_indices(lines))
    trimmed = pc.utf8_trim(pc.list_flatten(lines), TRIM_CHARS)

    keep_line = pc.match_substring_regex(trimmed, rules.terminal_regex)
    if rules.min_words > 0:
        n_words = pc.count_substring_regex(trimmed, r"\S+")
        keep_line = pc.and_(keep_line, pc.greater_equal(n_words, rules.min_words))
    if rules.bad_line_substr:
        hit = pc.match_substring(trimmed, rules.bad_line_substr, ignore_case=True)
        keep_line = pc.and_(keep_line, pc.invert(hit))
    keep_np = np.asarray(keep_line)

    n = len(batch)
    n_lines = np.bincount(parent, minlength=n).astype(np.int64)
    n_kept = np.bincount(parent[keep_np], minlength=n).astype(np.int64)

    # rebuild cleaned text: kept lines re-offset per doc, joined with \n
    kept_lines = pc.filter(trimmed, keep_line)
    offsets = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
    kept_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_lines)
    text_clean = pc.binary_join(kept_list, pa.scalar("\n"))

    n_sent = pc.count_substring_regex(text_clean, rules.sentence_regex)
    n_sent = n_sent.to_numpy(zero_copy_only=False).astype(np.int64)
    keep_doc = n_sent >= rules.min_sentences
    if rules.bad_doc_substr:
        hit = pc.match_substring(text, rules.bad_doc_substr, ignore_case=True)
        keep_doc &= ~np.asarray(hit)
    if rules.brace_doc_filter:
        keep_doc &= ~np.asarray(pc.match_substring(text, "{"))

    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: pc.cast(ids, pa.int64()),
            "n_lines": pa.array(n_lines),
            "n_kept": pa.array(n_kept),
            "n_sentences": pa.array(n_sent),
            "keep": pa.array(keep_doc.astype(np.int32)),
            "text_clean": text_clean,
        }
    )


def c4_clean_documents(
    ds,
    rules: C4Rules = C4Rules(),
    id_col: str = "doc_id",
    text_col: str = "text",
    stats_only: bool = False,
):
    """Dataset helper: C4 stats per doc; with ``stats_only`` drop the
    cleaned text column (cheap audit passes over huge corpora)."""
    import functools

    out = ds.map_batches(
        functools.partial(c4_line_filter, rules=rules, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    if stats_only:
        out = out.select_columns([id_col, "n_lines", "n_kept", "n_sentences", "keep"])
    return out
