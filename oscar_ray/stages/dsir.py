"""DSIR data selection: hashed-n-gram importance resampling (Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling", NeurIPS — the published target-distribution-matching
selector used to pick pretraining data that "looks like" a curated
reference corpus).

Features are hashed n-grams — unigrams AND bigrams, the paper's
feature set — counted multinomially (NOT binarized presence, unlike
the NB classifier in :mod:`classify`):

    f(g)        = md5_number_lower(g) % D          (D = 10,000 buckets)
    bigram g    = tok_i || ' ' || tok_{i+1}         (within one doc)
    c_{d,f}     = # occurrences of feature f in doc d

Two multinomial bag-of-hashed-ngrams distributions are fit with
add-one smoothing: p over the TARGET docs (``label_col`` value in
``target_values`` — the curated-reference-corpus weak-target
discipline of :mod:`classify`) and q over the RAW pool (the whole
corpus, target included — pinned). The per-feature log importance
ratio is evaluated ONCE per bucket on float64 operands built from
exact integers with a pinned association order, floored to int64
micro units (the lm.py / classify.py integer-micro discipline —
every downstream sum is order-independent integer arithmetic):

    lam_f       = floor(ln(((tc_f + 1) * (D + Rtot))
                           / ((rc_f + 1) * (D + Ttot))) * 1e6)
    logw(d)     = sum_f c_{d,f} * lam_f             (int64 micro)

where tc/rc are target/raw bucket counts and Ttot/Rtot the total
gram masses. Selection is the paper's Gumbel-top-k resample without
replacement, made deterministic (and SQL-reproducible) by hashed
uniforms instead of an RNG stream:

    u(d)        = (md5_number_lower('dsir<seed>:' || d) % (2^53-1) + 1)
                  / 2^53                              (exact division)
    gum(d)      = floor(-ln(-ln(u(d))) * 1e6)         (int64 micro)
    key(d)      = logw(d) + gum(d); keep top-k by (key desc, d asc)

The nested-ln Gumbel micro value is verified bit-equal numpy vs
DuckDB (both floor the same float64 libm chain). Zero-gram docs keep
logw = 0 (the empty product) and still draw a Gumbel key.

Distributed shape (zero data shuffle — the model is O(D), bounded):

1. *Counts pass* — ``map_batches`` emits ONE dense row per block
   (two int64[D] vectors + totals, ~160 KB); a fanin-8 Ray-task
   tree-reduce (`sketches._tree_reduce_tables`) hands the driver ONE
   row. The corpus never leaves its blocks.
2. *Score pass* — lam is ``ray.put`` once; an actor-pool
   ``map_batches`` scores each doc locally (bincount over feature
   ids x the broadcast lam slice). Output streams.
3. *Select* — per-block local top-k partials tree-reduce
   (concat + re-top-k is associative); the driver receives exactly
   k rows.

``ds`` is consumed twice (counts + score) — materialize upstream at
scale (the classify.py / lm.py caveat).

Reference analog: the score-assignment pass of oscar-create
(`oscar-create/ScoreCreator.h`), upgraded from a static table to a
distribution-matching selector.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.classify import POS_SOURCES, _feature_ids
from oscar_ray.stages.sketches import _tree_reduce_tables

SCORE_SCALE = 1_000_000  # micro-int scale
N_BUCKETS = 10_000  # hashed n-gram dimensionality D (the paper's scale)
ALPHA = 1  # add-one count smoothing
_U_MOD = (1 << 53) - 1  # hashed-uniform modulus (u in (0,1), exact division)
_U_DEN = float(1 << 53)


def _gram_features(batch: pa.Table, text_col: str, n_buckets: int):
    """batch -> (parent row idx, hashed feature id) per n-gram
    occurrence: all unigrams plus all within-doc bigrams."""
    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a, dtype=np.int64)
    if len(parent) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    uni_f = _feature_ids(tokens_a, n_buckets)
    # bigrams: adjacent token pairs that share a parent row
    idx = np.nonzero(parent[:-1] == parent[1:])[0]
    if len(idx):
        a = tokens_a.take(pa.array(idx))
        b = tokens_a.take(pa.array(idx + 1))
        big = pc.binary_join_element_wise(a, b, " ")
        big_f = _feature_ids(big, n_buckets)
        return (
            np.concatenate([parent, parent[idx]]),
            np.concatenate([uni_f, big_f]),
        )
    return parent, uni_f


class _GramCountStage:
    """map_batches: batch -> ONE dense-count row (target + raw)."""

    def __init__(
        self,
        text_col: str = "text",
        label_col: str = "source",
        target_values: tuple[str, ...] = POS_SOURCES,
        n_buckets: int = N_BUCKETS,
    ):
        self.text_col, self.label_col = text_col, label_col
        self.target_values, self.n_buckets = tuple(target_values), n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc, f = _gram_features(batch, self.text_col, self.n_buckets)
        tgt = pc.is_in(
            batch[self.label_col],
            value_set=pa.array(self.target_values, type=pa.string()),
        ).to_numpy(zero_copy_only=False)
        rcnt = np.bincount(f, minlength=self.n_buckets).astype(np.int64)
        tcnt = np.bincount(
            f[tgt[doc]], minlength=self.n_buckets
        ).astype(np.int64)
        return pa.table(
            {
                "tcnt": pa.array([tcnt.tolist()], type=pa.list_(pa.int64())),
                "rcnt": pa.array([rcnt.tolist()], type=pa.list_(pa.int64())),
            }
        )


def _merge_count_tables(tables: list[pa.Table]) -> pa.Table:
    t = sum(
        (np.asarray(r, dtype=np.int64) for tb in tables for r in tb["tcnt"].to_pylist()),
        start=np.int64(0),
    )
    r = sum(
        (np.asarray(x, dtype=np.int64) for tb in tables for x in tb["rcnt"].to_pylist()),
        start=np.int64(0),
    )
    return pa.table(
        {
            "tcnt": pa.array([t.tolist()], type=pa.list_(pa.int64())),
            "rcnt": pa.array([r.tolist()], type=pa.list_(pa.int64())),
        }
    )


def fit_dsir_lam(
    ds: ray.data.Dataset,
    text_col: str = "text",
    label_col: str = "source",
    target_values: tuple[str, ...] = POS_SOURCES,
    n_buckets: int = N_BUCKETS,
    concurrency: int = 4,
) -> np.ndarray:
    """Fit the int64-micro log importance-ratio vector lam[D]."""
    partials = ds.map_batches(
        _GramCountStage,
        fn_constructor_kwargs={
            "text_col": text_col,
            "label_col": label_col,
            "target_values": tuple(target_values),
            "n_buckets": n_buckets,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = _tree_reduce_tables(partials, _merge_count_tables)
    if merged is None:
        return np.zeros(n_buckets, dtype=np.int64)
    tcnt = np.asarray(merged["tcnt"].to_pylist()[0], dtype=np.int64)
    rcnt = np.asarray(merged["rcnt"].to_pylist()[0], dtype=np.int64)
    t_total, r_total = int(tcnt.sum()), int(rcnt.sum())
    # pinned association order == the SQL oracle's expression
    return np.floor(
        np.log(
            ((tcnt + np.float64(ALPHA)) * np.float64(n_buckets + r_total))
            / ((rcnt + np.float64(ALPHA)) * np.float64(n_buckets + t_total))
        )
        * SCORE_SCALE
    ).astype(np.int64)


def _gumbel_micro(ids: np.ndarray, seed: int) -> np.ndarray:
    """Hashed-uniform Gumbel draw per doc id, int64 micro (bit-equal
    to the DuckDB expression — verified)."""
    u_int = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"dsir{seed}:{int(i)}".encode()).digest()[8:16],
                "little",
            )
            % _U_MOD
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )
    u = (u_int + 1).astype(np.float64) / _U_DEN
    return np.floor(-np.log(-np.log(u)) * SCORE_SCALE).astype(np.int64)


class _DsirScoreStage:
    """Actor stage: broadcast lam slice in __init__, score per batch."""

    def __init__(
        self,
        lam_ref,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_buckets: int = N_BUCKETS,
        seed: int = 1,
    ):
        self.lam = ray.get(lam_ref) if not isinstance(lam_ref, np.ndarray) else lam_ref
        self.id_col, self.text_col = id_col, text_col
        self.n_buckets, self.seed = n_buckets, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        doc, f = _gram_features(batch, self.text_col, self.n_buckets)
        # int64-micro sums fit float64 exactly (|lam| <~ 2e7, grams/doc
        # <~ 1e4 -> |sum| << 2^53)
        logw = np.bincount(
            doc, weights=self.lam[f], minlength=len(ids)
        ).astype(np.int64)
        n_grams = np.bincount(doc, minlength=len(ids)).astype(np.int64)
        gum = _gumbel_micro(ids, self.seed)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_grams": pa.array(n_grams),
                "logw_micro": pa.array(logw),
                "gumbel_micro": pa.array(gum),
                "key_micro": pa.array(logw + gum),
            }
        )


def dsir_weights(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    target_values: tuple[str, ...] = POS_SOURCES,
    n_buckets: int = N_BUCKETS,
    seed: int = 1,
    concurrency: int = 4,
    lam: np.ndarray | None = None,
) -> ray.data.Dataset:
    """-> (doc_id, n_grams, logw_micro, gumbel_micro, key_micro) for
    EVERY doc (zero-gram docs score logw = 0). Pass a pre-fit ``lam``
    to skip the counts pass."""
    if lam is None:
        lam = fit_dsir_lam(
            ds, text_col, label_col, target_values, n_buckets, concurrency
        )
    lam_ref = ray.put(lam)
    return ds.map_batches(
        _DsirScoreStage,
        fn_constructor_kwargs={
            "lam_ref": lam_ref,
            "id_col": id_col,
            "text_col": text_col,
            "n_buckets": n_buckets,
            "seed": seed,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _topk_table(t: pa.Table, k: int, id_col: str) -> pa.Table:
    idx = pc.sort_indices(
        t,
        sort_keys=[("key_micro", "descending"), (id_col, "ascending")],
    )
    return t.take(idx[: min(k, len(idx))])


def dsir_select(
    ds: ray.data.Dataset,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    target_values: tuple[str, ...] = POS_SOURCES,
    n_buckets: int = N_BUCKETS,
    seed: int = 1,
    concurrency: int = 4,
    lam: np.ndarray | None = None,
) -> pa.Table:
    """Gumbel-top-k resample: the k docs with the largest
    logw + Gumbel keys (ties broken by ascending id). Returns a
    k-row table with a 1-based ``rank`` column; the driver holds
    only k-bounded partials (per-block local top-k, tree-reduced)."""
    scored = dsir_weights(
        ds, id_col, text_col, label_col, target_values,
        n_buckets, seed, concurrency, lam,
    )
    partials = scored.map_batches(
        lambda t: _topk_table(t, k, id_col),
        batch_format="pyarrow",
    )
    merged = _tree_reduce_tables(
        partials, lambda ts: _topk_table(pa.concat_tables(ts), k, id_col)
    )
    if merged is None:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_grams": pa.array([], type=pa.int64()),
                "logw_micro": pa.array([], type=pa.int64()),
                "gumbel_micro": pa.array([], type=pa.int64()),
                "key_micro": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    out = _topk_table(merged, k, id_col)
    return out.append_column(
        "rank", pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
    )
