"""Pinned tokenization spec.

This is the analog of the reference's StringsExtractor front-end
(``oscar-create/TextSearchTraits.h:61-112``: per item emit value strings,
case-fold with ``unicode_to_lower``) and its suffix-delimiter config
(``oscar-create/Config.cpp:1105-1109``). The reference pins a single
deterministic normalization used identically at build time and query
time; we do the same.

THE SPEC (normative, both engine and oracle MUST use these exact kernels):

    1. Unicode NFD decomposition        (pyarrow.compute.utf8_normalize)
    2. Strip combining marks            (replace_substring_regex ``\\p{M}`` -> "")
       — the DiacriticRemover analog (``TextSearchTraits.h:30-37,65``)
    3. Unicode lowercase                (pyarrow.compute.utf8_lower)
    4. Split on runs of non-(letter|digit): regex ``[^\\p{L}\\p{N}]+``
       (pyarrow.compute.split_pattern_regex, RE2 semantics)
    5. Drop empty tokens.

Both the scalar oracle path (`tokenize_text`) and the vectorized engine
path (`tokenize_column`) route through the same pyarrow kernels, so
byte-identity between oracle and engine holds by construction.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pyarrow as pa
import pyarrow.compute as pc

#: Normative token-delimiter pattern (RE2 syntax, applied to NFC+lowercased text).
TOKEN_SPLIT_REGEX = r"[^\p{L}\p{N}]+"


def normalize_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """NFD-decompose, strip combining marks, lowercase (steps 1-3 of the spec)."""
    decomposed = pc.utf8_normalize(col, form="NFD")
    stripped = pc.replace_substring_regex(decomposed, pattern=r"\p{M}", replacement="")
    return pc.utf8_lower(stripped)


def tokenize_column(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Vectorized tokenizer: utf8 column -> list<utf8> of tokens per row.

    Empty tokens are NOT yet removed here (split of "" yields [""], and
    leading/trailing delimiters yield boundary ""s); callers that flatten
    must drop empty strings. Use :func:`flatten_tokens` for the common
    (doc_index, token) exploded view with empties removed.
    """
    return pc.split_pattern_regex(normalize_column(col), pattern=TOKEN_SPLIT_REGEX)


def flatten_tokens(col: pa.ChunkedArray | pa.Array):
    """Explode a utf8 column into (parent_indices, token_array), empties dropped.

    Returns ``(parent_idx: pa.Int64Array-like, tokens: pa.StringArray)``
    where ``parent_idx[i]`` is the row index in ``col`` that produced
    ``tokens[i]``. Null rows produce no tokens.
    """
    lists = tokenize_column(col)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parent = pc.list_parent_indices(lists)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")
    return pc.filter(parent, keep), pc.filter(flat, keep)


def tokenize_text(text: str) -> list[str]:
    """Scalar oracle path: tokenize one string via the same arrow kernels.

    Results are LRU-cached: query parsing normalizes the same short terms
    over and over, and each arrow-kernel invocation on a 1-element array
    costs ~1ms of dispatch overhead.
    """
    if text is None:
        return []
    return list(_tokenize_text_cached(text))


_ASCII_TOKEN = re.compile(r"[A-Za-z0-9]+")


@lru_cache(maxsize=65536)
def _tokenize_text_cached(text: str) -> tuple[str, ...]:
    if text.isascii():
        # exact fast path: on ASCII, NFD is identity, \p{M} never matches,
        # utf8_lower == ASCII lower, and the delimiter class restricted to
        # ASCII is [^A-Za-z0-9] — so this equals the kernel chain bit-for-bit
        return tuple(t.lower() for t in _ASCII_TOKEN.findall(text))
    lists = tokenize_column(pa.array([text], type=pa.string()))
    toks = lists[0].as_py()
    return tuple(t for t in toks if t)
