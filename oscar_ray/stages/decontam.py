"""Benchmark decontamination: flag corpus docs sharing n-gram shingles
with a (small) benchmark/eval set.

The standard training-data hygiene step: before training, every document
whose token n-grams overlap a held-out benchmark is flagged (and usually
dropped) so eval numbers aren't contaminated by memorization. The
benchmark side is always tiny relative to the corpus (thousands of eval
documents vs billions of pages), which fixes the distributed shape:

1. shingle the benchmark set (same vectorized splitmix64 n-gram chain as
   the dedup family — ``ShingleStage``), reduce to the DISTINCT shingle
   hashes (a sorted uint64 array, a few MB), ``ray.put`` it ONCE;
2. stream the corpus through an actor-pool ``map_batches`` stage that
   fetches the broadcast array in ``__init__`` (once per actor, never
   per batch) and does a vectorized ``searchsorted`` membership test per
   batch — no shuffle, no join, the corpus never leaves its blocks.

At 100 TB the corpus side stays embarrassingly parallel; the only
all-gather is over the benchmark vocabulary, which is bounded by the
benchmark's size, not the corpus's.

Output per corpus doc (docs with >= 1 shingle): ``n_shingles`` (distinct
n-gram count), ``n_contaminated`` (distinct shingles also in the
benchmark set), ``contamination_micro`` (floor(ratio * 1e6) — the repo's
micro-int convention for hash-exact float oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from oscar_ray.spec.tokenizer import flatten_tokens
from oscar_ray.stages.dedup import ShingleStage, _batch_shingles, _token_hashes


def benchmark_shingle_set(
    bench_ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    concurrency: int = 2,
) -> np.ndarray:
    """Distinct shingle hashes of the benchmark set, sorted uint64.

    Per-batch ``np.unique`` partials keep each block's contribution
    deduplicated before the driver unions them; the driver array is
    bounded by the benchmark vocabulary (the thing being broadcast).
    """

    def distinct(t: pa.Table) -> pa.Table:
        u = np.unique(t["shingle"].to_numpy())
        return pa.table({"shingle": pa.array(u)})

    rows = (
        bench_ds.map_batches(
            ShingleStage,
            fn_constructor_kwargs={"id_col": id_col, "text_col": text_col, "n": n},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .select_columns(["shingle"])
        .map_batches(distinct, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([r["shingle"] for r in rows], dtype=np.int64).view(np.uint64))


class DecontaminateStage:
    """map_batches actor: per-doc shingle overlap vs the broadcast set.

    ``bench_ref`` is a ``ray.put`` ObjectRef of the sorted uint64 shingle
    array — fetched once per actor here, shared zero-copy from the object
    store across actors on a node.
    """

    def __init__(
        self,
        bench_ref,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
    ):
        self.bench = ray.get(bench_ref)
        self.id_col, self.text_col, self.n = id_col, text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        ids = batch[self.id_col].to_numpy()
        p, sh = _batch_shingles(parent, _token_hashes(tokens_a), self.n)
        sizes = (
            np.bincount(p, minlength=len(batch))
            if len(p)
            else np.zeros(len(batch), dtype=np.int64)
        )
        if len(sh) and len(self.bench):
            idx = np.searchsorted(self.bench, sh)
            idx_c = np.minimum(idx, len(self.bench) - 1)
            hit = self.bench[idx_c] == sh
            hits = np.bincount(p[hit], minlength=len(batch))
        else:
            hits = np.zeros(len(batch), dtype=np.int64)
        keep = sizes > 0
        sizes_k, hits_k = sizes[keep], hits[keep]
        return pa.table(
            {
                self.id_col: pa.array(ids[keep], type=pa.int64()),
                "n_shingles": pa.array(sizes_k.astype(np.int64)),
                "n_contaminated": pa.array(hits_k.astype(np.int64)),
                "contamination_micro": pa.array(
                    np.floor(hits_k / sizes_k * 1e6).astype(np.int64)
                ),
            }
        )


def decontaminate(
    corpus_ds: ray.data.Dataset,
    bench_ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    concurrency: int = 4,
    contaminated_only: bool = True,
) -> ray.data.Dataset:
    """Flag corpus docs whose n-gram shingles overlap ``bench_ds``.

    Returns (id, n_shingles, n_contaminated, contamination) for every
    corpus doc with at least one shingle; ``contaminated_only`` keeps
    only overlap > 0 rows (the typical drop-list).
    """
    bench = benchmark_shingle_set(
        bench_ds, id_col=id_col, text_col=text_col, n=n, concurrency=concurrency
    )
    out = corpus_ds.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={
            "bench_ref": ray.put(bench),
            "id_col": id_col,
            "text_col": text_col,
            "n": n,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if contaminated_only:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda t: t.filter(pc.greater(t["n_contaminated"], 0)),
            batch_format="pyarrow",
        )
    return out
