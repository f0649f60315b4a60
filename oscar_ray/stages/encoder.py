"""Batched embedding-encoder actor stage — the model-inference slot.

Every real curation pipeline has one stage shaped like this: a model's
weights load ONCE per actor (`__init__`), then batches of text stream
through a vectorized forward pass (`__call__`) producing an embedding
column that feeds semantic dedup / ANN / clustering. The container has
no ML runtime, so the "model" here is a deterministic hash-projection
encoder (feature-hashing bag-of-words -> seeded random projection ->
L2 normalize — the classic hashing-trick text embedding); the Ray-side
plumbing (actor-pool map_batches, weights-in-init, tuned
batch_size/concurrency, list<float32> output schema) is exactly what a
GPU sentence-encoder swap-in would use: replace ``_forward`` with the
real model call and set ``num_gpus`` on the stage.

Forward pass (all numpy, no per-row Python):
  bucket_i = splitmix-hash(token_i) mod V     (shared vectorized kernel)
  emb[doc] = sum over its tokens of W[bucket] (np.add.at scatter)
  emb[doc] /= ||emb[doc]||                    (zero-token docs stay 0)

W is a seeded ``default_rng(seed).standard_normal((V, D), float32)`` —
the "checkpoint": V x D x 4 bytes resident per actor (default 2^16 x 64
= 16 MB), built once in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.dedup import hash_strings_u64


class HashProjEncoder:
    """map_batches actor: text column -> L2-normalized embedding column.

    ``__init__`` = model load (once per actor); ``__call__`` = batched
    inference. Deterministic: same (seed, dim, vocab_buckets) -> same
    vectors on any partitioning, so rebuilds and resumes agree.
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        dim: int = 64,
        vocab_buckets: int = 1 << 16,
        seed: int = 42,
    ):
        self.text_col, self.id_col = text_col, id_col
        self.dim, self.v = dim, vocab_buckets
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((vocab_buckets, dim)).astype(np.float32)

    def _forward(self, texts: pa.Array) -> np.ndarray:
        parent_a, tokens = flatten_tokens(texts)
        parent = np.asarray(parent_a)
        emb = np.zeros((len(texts), self.dim), dtype=np.float32)
        if len(parent):
            buckets = (hash_strings_u64(tokens) % np.uint64(self.v)).astype(np.int64)
            np.add.at(emb, parent, self.w[buckets])
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        return emb / np.where(norms > 0, norms, 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        emb = self._forward(texts)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat = pa.array(emb.reshape(-1), type=pa.float32())
        offsets = pa.array(
            np.arange(0, (len(batch) + 1) * self.dim, self.dim, dtype=np.int32)
        )
        return pa.table(
            {
                self.id_col: ids.cast(pa.int64()),
                "embedding": pa.ListArray.from_arrays(offsets, flat),
            }
        )


def encode_embeddings(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    vocab_buckets: int = 1 << 16,
    seed: int = 42,
    batch_size: int = 1024,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """-> Dataset(id_col int64, embedding list<float32>[dim]).

    Actor-pool stage: weights built once per actor; ``batch_size`` keeps
    a batch's scatter buffer (batch x dim floats + tokens x dim gather)
    in worker heap — at GPU-model sizes tune it to the accelerator, the
    call-site contract is identical.
    """
    return ds.map_batches(
        HashProjEncoder,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "dim": dim,
            "vocab_buckets": vocab_buckets,
            "seed": seed,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
