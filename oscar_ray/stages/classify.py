"""Model-based quality classifier: Naive-Bayes log-count ratios over
hashed unigram features (the NBSVM baseline of Wang & Manning 2012,
"Baselines and Bigrams"; the same shape as the fastText-style curated-vs-
crawl quality filters used by GPT-3/CCNet-style webtext pipelines).

Weak supervision comes from a pinned "curated source" set: documents
whose ``source`` is in :data:`POS_SOURCES` are the positive class, the
rest negative (the curated-reference-corpus vs raw-crawl discipline).
Training is closed-form — count-based, no SGD — so the model is exactly
deterministic at any parallelism:

    f(tok)     = md5_number_lower(tok) % D          (D = 2^20 buckets)
    F(d)       = distinct f over d's tokens          (binarized presence)
    p_f        = 1 + #{pos docs containing f}        (alpha = 1)
    q_f        = 1 + #{neg docs containing f}
    Ps         = D + total pos presence pairs        (= ||p||_1)
    Qs         = D + total neg presence pairs
    r_f        = floor(ln((p_f * Qs) / (q_f * Ps)) * 1e6)    int64 micro
    bias       = floor(ln(Npos / Nneg) * 1e6)
    score(d)   = bias + sum_{f in F(d)} r_f
    pred(d)    = 1 if score(d) > 0 else 0

The integer-micro trick (the lm.py discipline): ln is evaluated ONCE per
distinct feature on float64 operands built from exact integers with a
pinned association order, floored to int64 — every downstream sum is
integer arithmetic, order-independent, and bit-reproducible in DuckDB.

Distributed shape (two passes, the bigram-LM pattern):

1. *Totals pre-pass* — ``map_batches`` partials of four scalars
   (Npos, Nneg, pos/neg presence-pair totals); the driver sums a handful
   of rows. Callers at scale pass a materialized dataset or precomputed
   ``totals`` to avoid the second read (same caveat as
   ``bigram_lm_scores``).
2. *One routed exchange* — explode to distinct (doc, f, label) presence
   rows, route by ``f % P``: every count p_f/q_f is part-local, r_f is
   computed where the counts live, and only per-(doc, part) partial
   sums exit; partials combine by ``doc % P``. The model (2^20-sized r
   vector) is never materialized anywhere — each part holds only its
   slice, the driver holds nothing.

Docs with zero tokens emit no row (no features to score — the same
inner semantics as the SQL oracle).

Reference analog: the score-assignment pass of oscar-create
(`oscar-create/ScoreCreator.h`), upgraded from a static table to a
corpus-trained discriminative model.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens

SCORE_SCALE = 1_000_000  # micro-int score scale
N_BUCKETS = 1 << 20  # hashed-feature dimensionality D
ALPHA = 1  # add-one count smoothing

#: pinned "curated reference corpus" source set (the weak-label rule)
POS_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def _feature_ids(tokens_a: pa.Array, n_buckets: int) -> np.ndarray:
    """token array -> hashed feature id per token, md5 once per DISTINCT
    token (the doc_fingerprint np.fromiter budget; DuckDB parity:
    ``md5_number_lower(term) % D``)."""
    denc = pc.dictionary_encode(
        tokens_a if isinstance(tokens_a, pa.Array) else pa.chunked_array([tokens_a])
    )
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    vocab = denc.dictionary.to_pylist()
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
            for t in vocab
        ),
        dtype=np.uint64,
        count=len(vocab),
    )
    fids = (hs % np.uint64(n_buckets)).astype(np.int64)
    return fids[np.asarray(denc.indices, dtype=np.int64)]


def _doc_feature_rows(
    batch: pa.Table,
    id_col: str,
    text_col: str,
    label_col: str,
    pos_values: tuple[str, ...],
    n_buckets: int,
):
    """-> (doc ids, feature ids, labels) with (doc, f) DISTINCT."""
    ids = batch[id_col].to_numpy()
    pos = pc.is_in(
        batch[label_col], value_set=pa.array(pos_values, type=pa.string())
    ).to_numpy(zero_copy_only=False)
    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a, dtype=np.int64)
    if len(parent) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e.astype(bool)
    fids = _feature_ids(tokens_a, n_buckets)
    # distinct (doc, f) pairs: one presence row per doc per feature
    key = parent * np.int64(n_buckets) + fids
    uniq = np.unique(key)
    u_doc = (uniq // n_buckets).astype(np.int64)
    u_f = (uniq % n_buckets).astype(np.int64)
    return ids[u_doc], u_f, pos[u_doc]


class _TotalsStage:
    """map_batches: batch -> one partial-totals row (4 scalars)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        label_col: str = "source",
        pos_values: tuple[str, ...] = POS_SOURCES,
        n_buckets: int = N_BUCKETS,
    ):
        self.id_col, self.text_col, self.label_col = id_col, text_col, label_col
        self.pos_values, self.n_buckets = tuple(pos_values), n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        pos = pc.is_in(
            batch[self.label_col],
            value_set=pa.array(self.pos_values, type=pa.string()),
        ).to_numpy(zero_copy_only=False)
        _, _, row_pos = _doc_feature_rows(
            batch, self.id_col, self.text_col, self.label_col,
            self.pos_values, self.n_buckets,
        )
        return pa.table(
            {
                "npos": pa.array([int(pos.sum())], type=pa.int64()),
                "nneg": pa.array([int(len(pos) - pos.sum())], type=pa.int64()),
                "pos_rows": pa.array([int(row_pos.sum())], type=pa.int64()),
                "neg_rows": pa.array([int(len(row_pos) - row_pos.sum())], type=pa.int64()),
            }
        )


class _ExplodeStage:
    """map_batches: batch -> distinct (doc, f, label, part) presence rows."""

    def __init__(
        self,
        num_parts: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        label_col: str = "source",
        pos_values: tuple[str, ...] = POS_SOURCES,
        n_buckets: int = N_BUCKETS,
    ):
        self.num_parts = num_parts
        self.id_col, self.text_col, self.label_col = id_col, text_col, label_col
        self.pos_values, self.n_buckets = tuple(pos_values), n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc, f, pos = _doc_feature_rows(
            batch, self.id_col, self.text_col, self.label_col,
            self.pos_values, self.n_buckets,
        )
        return pa.table(
            {
                self.id_col: pa.array(doc, type=pa.int64()),
                "f": pa.array(f, type=pa.int64()),
                "pos": pa.array(pos),
                "part": pa.array(f % np.int64(self.num_parts)),
            }
        )


def _score_part(
    g: pa.Table,
    ps_total: int,
    qs_total: int,
    id_col: str,
    num_parts: int,
) -> pa.Table:
    """One routed part: count p_f/q_f, compute r_f, emit doc partials."""
    f = g["f"].to_numpy()
    pos = g["pos"].to_numpy(zero_copy_only=False)
    ids = g[id_col].to_numpy()
    uf, finv = np.unique(f, return_inverse=True)
    p_cnt = np.bincount(finv, weights=pos).astype(np.int64)
    q_cnt = np.bincount(finv, weights=~pos).astype(np.int64)
    # pinned association order == the SQL oracle's expression
    r_micro = np.floor(
        np.log(
            ((p_cnt + np.float64(ALPHA)) * np.float64(qs_total))
            / ((q_cnt + np.float64(ALPHA)) * np.float64(ps_total))
        )
        * SCORE_SCALE
    ).astype(np.int64)
    row_r = r_micro[finv]
    udoc, dinv = np.unique(ids, return_inverse=True)
    return pa.table(
        {
            id_col: pa.array(udoc, type=pa.int64()),
            "n_feats": pa.array(np.bincount(dinv).astype(np.int64)),
            "r_sum_micro": pa.array(np.bincount(dinv, weights=row_r).astype(np.int64)),
            "label": pa.array(
                np.bincount(dinv, weights=pos).astype(np.int64) > 0
            ).cast(pa.int64()),
            "dpart": pa.array(udoc % num_parts, type=pa.int64()),
        }
    )


def _combine_docs(g: pa.Table, bias_micro: int, id_col: str) -> pa.Table:
    ids = g[id_col].to_numpy()
    udoc, dinv = np.unique(ids, return_inverse=True)
    score = (
        np.bincount(dinv, weights=g["r_sum_micro"].to_numpy()).astype(np.int64)
        + np.int64(bias_micro)
    )
    label = (np.bincount(dinv, weights=g["label"].to_numpy()) > 0).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(udoc, type=pa.int64()),
            "label": pa.array(label),
            "n_feats": pa.array(
                np.bincount(dinv, weights=g["n_feats"].to_numpy()).astype(np.int64)
            ),
            "nb_score_micro": pa.array(score),
            "pred": pa.array((score > 0).astype(np.int64)),
        }
    )


def nb_quality_scores(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    pos_values: tuple[str, ...] = POS_SOURCES,
    n_buckets: int = N_BUCKETS,
    num_parts: int = 32,
    concurrency: int = 4,
    totals: tuple[int, int, int, int] | None = None,
) -> ray.data.Dataset:
    """-> (doc_id, label, n_feats, nb_score_micro, pred).

    ``totals`` = (npos, nneg, pos_rows, neg_rows) skips the pre-pass
    (pass it when a corpus manifest already knows the class masses).
    ``ds`` is consumed twice otherwise — materialize upstream at scale.
    """
    kwargs = {
        "id_col": id_col,
        "text_col": text_col,
        "label_col": label_col,
        "pos_values": tuple(pos_values),
        "n_buckets": n_buckets,
    }
    if totals is None:
        rows = ds.map_batches(
            _TotalsStage,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            concurrency=concurrency,
        ).take_all()  # one tiny row per input block
        npos = sum(r["npos"] for r in rows)
        nneg = sum(r["nneg"] for r in rows)
        pos_rows = sum(r["pos_rows"] for r in rows)
        neg_rows = sum(r["neg_rows"] for r in rows)
    else:
        npos, nneg, pos_rows, neg_rows = totals
    if npos == 0 or nneg == 0:
        raise ValueError("both classes need at least one document")
    ps_total = n_buckets + pos_rows
    qs_total = n_buckets + neg_rows
    bias_micro = int(
        np.floor(np.log(np.float64(npos) / np.float64(nneg)) * SCORE_SCALE)
    )
    exploded = ds.map_batches(
        _ExplodeStage,
        fn_constructor_kwargs={"num_parts": num_parts, **kwargs},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # bound the block count entering the exchange: sort-shuffle pieces
    # are ~bytes/B^2 and must stay past Ray's ~100 KB inline threshold
    # (the stages/spans.py discipline; measured 18x on the range join)
    exploded = exploded.repartition(num_parts)
    partials = exploded.groupby("part").map_groups(
        lambda g: _score_part(
            g.drop_columns(["part"]), ps_total, qs_total, id_col, num_parts
        ),
        batch_format="pyarrow",
    )
    return partials.groupby("dpart").map_groups(
        lambda g: _combine_docs(g.drop_columns(["dpart"]), bias_micro, id_col),
        batch_format="pyarrow",
    )
