"""Corpus-trained bigram-LM scoring (CCNet/RedPajama-style perplexity
filtering primitive).

Trains an add-one-smoothed bigram language model ON the corpus itself
and scores every document under it, entirely inside one partitioned
exchange:

    p(b | a) = (c(a,b) + 1) / (c(a,.) + V)          V = |distinct terms|
    lp(a,b)  = floor(ln(p(b|a)) * 1e6)              exact int64 per bigram
    doc score = (n_bigrams, sum of lp over the doc's bigram occurrences)

Distributed shape (one pass over the corpus for the LM *and* the
scores):

1. *Explode* — ``map_batches`` tokenizes each block (spec tokenizer),
   forms adjacent-token bigrams, and pre-aggregates to per-(doc, bigram)
   counts (np.unique over paired dictionary codes — repeated bigrams in
   a doc collapse before anything moves). Rows route by
   ``hash(a) % P``: every bigram sharing a first token lands in ONE
   part, so both c(a,b) and the denominator c(a,.) are part-local.
2. *Part scorer* — per part (bounded cardinality P), a vectorized pass
   computes the count tables, the integer lp per distinct bigram, and
   each doc's partial (n, sum-of-lp) — the LM slice never leaves its
   partition; only per-(doc, part) partial sums exit.
3. *Combine* — partials route by ``doc_id % P`` and sum per doc.

The integer-microlog trick makes the result hash-exact against a DuckDB
oracle: ln is evaluated once per DISTINCT bigram on exact-integer-valued
float64 operands (numpy log == DuckDB ln bit-for-bit on this platform,
verified over 200k samples), floored to int64, and every downstream sum
is integer arithmetic — order-independent across engines.

Skew note: routing by first token concentrates head-token bigrams
(Zipf) in one part. The part scorer is O(rows log rows) vectorized, so
a hot part degrades wall-clock, not correctness; at extreme scale the
mitigation is a two-level split (route by hash(a, b) and replicate the
c(a,.) table per sub-part), kept out of the default path for
simplicity.

Docs with fewer than two tokens have no bigrams and emit no row (they
are "too short" for any perplexity filter anyway); the SQL oracle uses
the same inner semantics.

Reference analog: the score-assignment pass of oscar-create
(`oscar-create/ScoreCreator.h`), upgraded from a static table to a
corpus-trained model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.dedup import hash_strings_u64

LP_SCALE = 1_000_000  # micro-int log-prob scale


class BigramExplodeStage:
    """map_batches actor: (id, text) -> per-(doc, bigram) counts + part."""

    def __init__(self, num_parts: int, id_col: str = "doc_id", text_col: str = "text"):
        self.num_parts = num_parts
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a, dtype=np.int64)
        if len(parent) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "a": pa.array([], type=pa.string()),
                    "b": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        denc = pc.dictionary_encode(tokens_a)
        codes = np.asarray(denc.indices, dtype=np.int64)
        vocab = denc.dictionary
        adj = parent[1:] == parent[:-1]  # adjacent tokens in the same doc
        doc = parent[:-1][adj]
        ca, cb = codes[:-1][adj], codes[1:][adj]
        if len(doc) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=pa.int64()),
                    "a": pa.array([], type=pa.string()),
                    "b": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                    "part": pa.array([], type=pa.int64()),
                }
            )
        # collapse repeated (doc, a, b) before anything moves
        nv = np.int64(len(vocab))
        key = (doc * nv + ca) * nv + cb
        uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        u_doc = uniq // (nv * nv)
        u_ab = uniq % (nv * nv)
        u_a, u_b = u_ab // nv, u_ab % nv
        a_str = vocab.take(pa.array(u_a))
        part = (hash_strings_u64(a_str) % np.uint64(self.num_parts)).astype(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids[u_doc], type=pa.int64()),
                "a": a_str,
                "b": vocab.take(pa.array(u_b)),
                "cnt": pa.array(cnt.astype(np.int64)),
                "part": pa.array(part),
            }
        )


def _score_part(g: pa.Table, vocab_size: int, id_col: str, num_parts: int) -> pa.Table:
    """One routed part: build the part-local LM slice, score its rows."""
    a = g["a"]
    b = g["b"]
    da = pc.dictionary_encode(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    db = pc.dictionary_encode(b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b)
    ca = np.asarray(da.indices, dtype=np.int64)
    cb = np.asarray(db.indices, dtype=np.int64)
    cnt = g["cnt"].to_numpy()
    nb = np.int64(len(db.dictionary))
    pair = ca * nb + cb
    upair, inv = np.unique(pair, return_inverse=True)
    c_ab = np.bincount(inv, weights=cnt).astype(np.int64)  # global c(a,b)
    c_a = np.bincount(ca, weights=cnt, minlength=len(da.dictionary)).astype(np.int64)
    # exact-integer float64 operands -> ln bits match DuckDB's
    lp = np.floor(
        np.log((c_ab + 1.0) / (c_a[(upair // nb)] + np.float64(vocab_size)))
        * LP_SCALE
    ).astype(np.int64)
    row_lp = lp[inv] * cnt
    # per-doc partials within this part
    ids = g[id_col].to_numpy()
    udoc, dinv = np.unique(ids, return_inverse=True)
    return pa.table(
        {
            id_col: pa.array(udoc, type=pa.int64()),
            "n_bigrams": pa.array(np.bincount(dinv, weights=cnt).astype(np.int64)),
            "lp_total_micro": pa.array(
                np.bincount(dinv, weights=row_lp).astype(np.int64)
            ),
            "dpart": pa.array(udoc % num_parts, type=pa.int64()),
        }
    )


def _combine_docs(g: pa.Table, id_col: str) -> pa.Table:
    ids = g[id_col].to_numpy()
    udoc, dinv = np.unique(ids, return_inverse=True)
    return pa.table(
        {
            id_col: pa.array(udoc, type=pa.int64()),
            "n_bigrams": pa.array(
                np.bincount(dinv, weights=g["n_bigrams"].to_numpy()).astype(np.int64)
            ),
            "lp_total_micro": pa.array(
                np.bincount(dinv, weights=g["lp_total_micro"].to_numpy()).astype(
                    np.int64
                )
            ),
        }
    )


def distinct_term_count(
    ds: ray.data.Dataset, text_col: str = "text", num_parts: int = 32
) -> int:
    """Global |distinct terms| via hash-routed per-part distinct counts."""

    def explode(batch: pa.Table) -> pa.Table:
        _, tokens_a = flatten_tokens(batch[text_col])
        d = pc.dictionary_encode(tokens_a)
        terms = d.dictionary
        return pa.table(
            {
                "term": terms,
                "part": pa.array(
                    (hash_strings_u64(terms) % np.uint64(num_parts)).astype(np.int64)
                ),
            }
        )

    def count_part(g: pa.Table) -> pa.Table:
        n = len(pc.unique(g["term"].combine_chunks()))
        return pa.table({"n": pa.array([n], type=pa.int64())})

    rows = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_part, batch_format="pyarrow")
        .take_all()
    )
    return int(sum(r["n"] for r in rows))


def bigram_lm_scores(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
    concurrency: int = 4,
    vocab_size: int | None = None,
) -> ray.data.Dataset:
    """-> (doc_id, n_bigrams, lp_total_micro) under the corpus bigram LM.

    ``vocab_size`` overrides the distinct-term pass (pass it when the
    caller already knows V, e.g. the oracle fixtures or a precomputed
    corpus manifest). ``ds`` is consumed twice when V must be computed —
    callers at scale should pass a materialized dataset or a known V.
    """
    v = vocab_size if vocab_size is not None else distinct_term_count(
        ds, text_col=text_col, num_parts=num_parts
    )
    exploded = ds.map_batches(
        BigramExplodeStage,
        fn_constructor_kwargs={
            "num_parts": num_parts,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # bound block count entering the exchange (sort-shuffle pieces are
    # ~bytes/B^2; see stages/spans.py inline-threshold discipline)
    exploded = exploded.repartition(num_parts)
    partials = exploded.groupby("part").map_groups(
        lambda g: _score_part(
            g.drop_columns(["part"]), v, id_col, num_parts
        ),
        batch_format="pyarrow",
    )
    return partials.groupby("dpart").map_groups(
        lambda g: _combine_docs(g.drop_columns(["dpart"]), id_col),
        batch_format="pyarrow",
    )


def perplexity_buckets(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    num_parts: int = 32,
    concurrency: int = 4,
    vocab_size: int | None = None,
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    score every doc under the corpus bigram LM, then split each
    language into head / middle / tail at its perplexity terciles.

    Composition of three of the repo's distributed primitives — the LM
    scorer (one term-routed exchange), :func:`~oscar_ray.stages.joins.
    hash_join` (one co-routed exchange to re-attach ``group_col``), and
    :func:`~oscar_ray.stages.quantiles.grouped_quantiles` (per-group
    tercile thresholds; the threshold table is ~#languages rows, the
    only thing the driver ever holds, broadcast back into the bucket
    stage). Integer-exact end to end: ``ppl_milli = (-lp_total_micro *
    1000) // n_bigrams`` (floor on non-negative operands == SQL ``//``),
    thresholds via the integer percentile_disc rule. Docs with no
    bigram (< 2 tokens) are excluded, as CCNet drops empty docs.

    -> (id, group, ppl_milli, bucket) with bucket in head|middle|tail
    (head = lowest perplexity, i.e. most-fluent tercile).
    """
    import pyarrow.compute as pc

    from oscar_ray.stages.joins import hash_join
    from oscar_ray.stages.quantiles import grouped_quantiles

    scores = bigram_lm_scores(
        ds,
        id_col=id_col,
        text_col=text_col,
        num_parts=num_parts,
        concurrency=concurrency,
        vocab_size=vocab_size,
    )
    joined = hash_join(
        scores,
        ds.map_batches(
            lambda t: t.select([id_col, group_col]), batch_format="pyarrow"
        ),
        on=id_col,
        num_parts=num_parts,
        concurrency=concurrency,
    )

    def _ppl(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["n_bigrams"], 0))
        n = batch["n_bigrams"].to_numpy()
        lp = batch["lp_total_micro"].to_numpy()
        ppl = (-lp) * np.int64(1000) // n
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "ppl_milli": pa.array(ppl.astype(np.int64)),
            }
        )

    scored = joined.map_batches(_ppl, batch_format="pyarrow")
    th_rows = grouped_quantiles(
        scored,
        group_col,
        "ppl_milli",
        qs_micro=(333_334, 666_667),
        names=("t33", "t66"),
        num_parts=num_parts,
        concurrency=concurrency,
    ).take_all()  # one row per language — driver-bounded by design
    t33 = {r[group_col]: r["t33"] for r in th_rows}
    t66 = {r[group_col]: r["t66"] for r in th_rows}

    def _bucket(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        denc = g.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        dvals = denc.dictionary.to_pylist()
        lo = np.array([t33[v] for v in dvals], dtype=np.int64)[codes]
        hi = np.array([t66[v] for v in dvals], dtype=np.int64)[codes]
        ppl = batch["ppl_milli"].to_numpy()
        bucket = np.where(ppl <= lo, "head", np.where(ppl <= hi, "middle", "tail"))
        return batch.append_column("bucket", pa.array(bucket.astype(object), type=pa.string()))

    return scored.map_batches(_bucket, batch_format="pyarrow")
