"""Pinned deterministic specs: the "reference oracle" layer (no Ray).

These modules define the exact semantics the distributed engine must
reproduce bit-for-bit: tokenization (the StringsExtractor analog,
reference ``oscar-create/TextSearchTraits.h:61-112``), BM25 scoring, and
the html->text extraction invariant from BASELINE.json's input_hint.
"""

from oscar_ray.spec.tokenizer import tokenize_column, tokenize_text, TOKEN_SPLIT_REGEX
from oscar_ray.spec.bm25 import BM25Params, bm25_idf, bm25_score, bm25_tf_norm
from oscar_ray.spec.extract import extract_text, make_html

__all__ = [
    "tokenize_column",
    "tokenize_text",
    "TOKEN_SPLIT_REGEX",
    "BM25Params",
    "bm25_idf",
    "bm25_score",
    "bm25_tf_norm",
    "extract_text",
    "make_html",
]
