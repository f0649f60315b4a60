"""Pinned BM25 scoring spec (textbook / Lucene-style).

The reference ranks by a static docID order (score-sorted ids,
``oscar-create/OsmKeyValueObjectStore.cpp:1339-1399`` — "docID order is
rank order"); our web-scale analog is dynamic BM25 ranking with the same
determinism contract: float64 accumulation in pinned order, ties broken
by docid ascending.

Normative constants and formulas (both engine and oracle use these):

    k1 = 0.9, b = 0.4
    idf(df)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(tf,dl) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score          = idf * tf_norm, summed over query terms in query order
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Params:
    k1: float = 0.9
    b: float = 0.4


DEFAULT_PARAMS = BM25Params()


def bm25_idf(df: float | np.ndarray, n_docs: float) -> float | np.ndarray:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)); vectorized over df.

    Deliberately ``log(1 + x)`` (not log1p): the same two IEEE ops an SQL
    oracle writes as ``ln(1 + ...)``, so scores are bit-identical across
    engines. x >= 0.5/(N+0.5) here, so log1p's tiny-x accuracy advantage
    is irrelevant.
    """
    if isinstance(df, np.ndarray):
        return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(
    tf: np.ndarray | float,
    doclen: np.ndarray | float,
    avgdl: float,
    params: BM25Params = DEFAULT_PARAMS,
) -> np.ndarray | float:
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); float64, vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    doclen = np.asarray(doclen, dtype=np.float64)
    denom = tf + params.k1 * (1.0 - params.b + params.b * doclen / avgdl)
    return tf * (params.k1 + 1.0) / denom


def bm25_score(
    tf: np.ndarray | float,
    doclen: np.ndarray | float,
    df: float,
    n_docs: float,
    avgdl: float,
    params: BM25Params = DEFAULT_PARAMS,
) -> np.ndarray | float:
    """Full per-term BM25 contribution: idf(df) * tf_norm(tf, dl)."""
    return bm25_idf(float(df), float(n_docs)) * bm25_tf_norm(tf, doclen, avgdl, params)
