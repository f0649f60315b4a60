"""Embedding-encoder actor stage (stages/encoder.py): parity with a
sequential per-doc reference, partitioning invariance, and the
encode -> ANN chained pipeline (the GPU-model slot's plumbing)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox",  # shares tokens with doc 0
    "",  # zero-token doc -> zero vector
    "singleton",
    "pack my box with five dozen liquor jugs",  # exact dup of doc 1
]
DIM = 16
V = 1 << 10
SEED = 7


def _reference(texts: list[str]) -> np.ndarray:
    """Sequential per-doc reference: same hash, same weights, slow path."""
    from oscar_ray.spec.tokenizer import tokenize_text
    from oscar_ray.stages.dedup import hash_strings_u64

    rng = np.random.default_rng(SEED)
    w = rng.standard_normal((V, DIM)).astype(np.float32)
    out = np.zeros((len(texts), DIM), dtype=np.float32)
    for i, text in enumerate(texts):
        toks = [t for t in tokenize_text(text or "") if t]
        for t in toks:
            # % must stay in uint64: a python-int modulus promotes the
            # numpy uint64 to float64 and rounds the hash
            b = int(hash_strings_u64(pa.array([t]))[0] % np.uint64(V))
            out[i] += w[b]
        n = np.linalg.norm(out[i])
        if n > 0:
            out[i] /= n
    return out


def test_encoder_matches_sequential_reference():
    from oscar_ray.stages.encoder import HashProjEncoder

    enc = HashProjEncoder(dim=DIM, vocab_buckets=V, seed=SEED)
    t = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    got = enc(t)
    emb = np.array(got["embedding"].to_pylist(), dtype=np.float32)
    np.testing.assert_allclose(emb, _reference(TEXTS), rtol=0, atol=1e-5)
    # unit norm except the zero-token doc
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms[[0, 1, 2, 4, 5]], 1.0, atol=1e-5)
    assert norms[3] == 0.0
    # exact-dup texts -> identical vectors
    np.testing.assert_array_equal(emb[1], emb[5])


def test_encoder_partitioning_invariant(ray_session):
    """Same vectors whether the corpus streams as 1 block or many tiny
    batches (determinism under any partitioning/resume)."""
    import ray.data

    from oscar_ray.stages.encoder import encode_embeddings

    rows = [{"doc_id": i, "text": TEXTS[i % len(TEXTS)]} for i in range(40)]
    a = (
        encode_embeddings(
            ray.data.from_items(rows).repartition(1),
            dim=DIM, vocab_buckets=V, seed=SEED, batch_size=64, concurrency=1,
        )
        .sort("doc_id").take_all()
    )
    b = (
        encode_embeddings(
            ray.data.from_items(rows).repartition(8),
            dim=DIM, vocab_buckets=V, seed=SEED, batch_size=4, concurrency=2,
        )
        .sort("doc_id").take_all()
    )
    assert len(a) == len(b) == 40
    for ra, rb in zip(a, b):
        assert ra["doc_id"] == rb["doc_id"]
        np.testing.assert_allclose(ra["embedding"], rb["embedding"], atol=1e-6)


def test_encode_then_ann_chain(ray_session):
    """The chained GPU-slot pipeline: encode -> knn_brute_force. Each
    query vector (= an encoded doc) must retrieve itself at rank 1, and
    the exact-dup pair must be mutual top-2 with cosine ~1."""
    import ray.data

    from oscar_ray.stages.encoder import encode_embeddings
    from oscar_ray.stages.similarity import knn_brute_force

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS) if t]
    emb_ds = encode_embeddings(
        ray.data.from_items(rows), dim=DIM, vocab_buckets=V, seed=SEED, concurrency=1
    ).materialize()
    by_id = {r["doc_id"]: r["embedding"] for r in emb_ds.take_all()}
    queries = np.array([by_id[1], by_id[2]], dtype=np.float64)
    res = knn_brute_force(
        emb_ds, queries, k=2, id_col="doc_id", vec_col="embedding", concurrency=1
    ).to_pandas()
    q0 = res[res["query_id"] == 0].sort_values("rank")
    # doc 1 and doc 5 are exact dups: both score ~1.0 at the top
    assert set(q0["doc_id"].head(2)) == {1, 5}
    assert np.allclose(q0["score"].head(2), 1.0, atol=1e-5)
    q1 = res[res["query_id"] == 1].sort_values("rank")
    assert q1["doc_id"].iloc[0] == 2
