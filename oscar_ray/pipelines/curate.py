"""End-to-end training-data curation: one streaming Ray Data graph.

Composes the individually-oracled LLM-pipeline stages into the canonical
pre-training curation flow:

    scrub (PII + denylist)            \\
    quality gate (score >= threshold)  } ONE fused row-local actor stage
    seeded stratified sampling        /
    -> exact dedup (keep first occurrence per identical text)
    -> span-level dedup (C4-style K-token spans, doc rewrite)
    -> sequence packing (hierarchical distributed prefix sum)

Stage-fusion rationale: scrub, quality scoring and seeded sampling are
all row-local (no data movement), so they run inside a single
``map_batches`` actor — one pass over the block, no intermediate
materialization. The only exchanges in the whole pipeline are the two
hash-routed bounded-cardinality groupbys owned by the dedup stages and
packing's tiny per-part-totals scan, so at 100 TB the shuffled volume is
the (already scrubbed + sampled + deduped) survivor set, not the corpus.

Order is PINNED (gate before exact dedup): sampling does not commute
with keep-first dedup (dropping a group's min doc_id changes the
survivor), so the DuckDB oracle in ``__ray_entry__.py`` applies the same
order stage for stage.

Reference analog: oscar-create's single-config multi-stage processing
chain (filter tables -> dedup -> store construction,
``oscar-create/oscarcreate.cpp:82-116``), re-expressed as a lazy Dataset
graph under Ray's streaming executor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.stages.dedup import hash_strings_u64
from oscar_ray.stages.packing import DEFAULT_PART_SPAN, pack_sequences
from oscar_ray.stages.sampling import StratifiedSampleStage
from oscar_ray.stages.scrub import ScrubStage
from oscar_ray.stages.spans import dedup_spans
from oscar_ray.stages.text_analysis import QualityScorer


class CurateGate:
    """Fused row-local stage: scrub -> quality filter -> seeded sample.

    All three are per-row decisions, so they share one actor and one
    pass over each Arrow block; compiled regexes / stopword value sets /
    rate tables are built once per actor (SURVEY.md ST3 pattern).
    Emits ``(id, text, lang)`` with ``text`` already scrubbed.
    """

    def __init__(
        self,
        denylist: tuple[str, ...],
        quality_min_micro: int,
        rates_micro: dict[str, int],
        default_micro: int,
        seed: str = "s42",
        id_col: str = "doc_id",
        text_col: str = "text",
        lang_col: str = "lang",
    ):
        self.id_col, self.text_col, self.lang_col = id_col, text_col, lang_col
        self.qmin = quality_min_micro
        self.scrub = ScrubStage(
            denylist=denylist, id_col=id_col, text_col=text_col, counts=False
        )
        self.scorer = QualityScorer(id_col=id_col, text_col=text_col)
        self.sampler = StratifiedSampleStage(
            rates_micro, default_micro, seed, id_col=id_col, stratum_col=lang_col
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        scrubbed = self.scrub(batch)
        cur = pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                self.text_col: scrubbed["text_scrubbed"],
                self.lang_col: batch[self.lang_col],
            }
        )
        feats = self.scorer(cur)
        cur = cur.filter(pc.greater_equal(feats["quality_score_micro"], self.qmin))
        return self.sampler(cur).drop_columns(["bucket"])


def _keep_first_per_text(g: pa.Table, id_col: str) -> pa.Table:
    """Within one routing part: min-id survivor per DISTINCT text value.

    Identity is decided on the text bytes themselves (dictionary codes),
    not the routing hash, so a hash collision can never merge two
    different documents."""
    text = g["text"]
    d = pc.dictionary_encode(
        text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    )
    codes = np.asarray(d.indices, dtype=np.int64)
    ids = g[id_col].to_numpy()
    order = np.lexsort((ids, codes))
    cs = codes[order]
    first = np.concatenate([[True], cs[1:] != cs[:-1]])
    return g.take(pa.array(np.sort(order[first]))).drop_columns(["part"])


def exact_dedup_keep(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 32,
    coalesce_blocks: int | None = None,
) -> ray.data.Dataset:
    """Rewrite-style exact dedup: keep the min-id row per identical text,
    carrying all columns through. Identical texts share a routing part by
    construction (part = hash(text) % P), so the keep-first decision is
    globally exact with a bounded-cardinality groupby.

    ``coalesce_blocks`` sizes the pre-groupby coalesce (see
    ``stages/spans.dedup_spans`` for the piece-size arithmetic)."""

    def add_part(t: pa.Table) -> pa.Table:
        h = hash_strings_u64(t[text_col])
        return t.append_column(
            "part", pa.array((h % np.uint64(num_parts)).astype(np.int64))
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        # bound block count so sort sub-blocks exceed Ray's ~100 KB inline
        # threshold and stay plasma-resident (see stages/substr.py rewrite
        # note: corpus-text shuffles with many small blocks otherwise put
        # ~corpus bytes on the owner heap transiently; piece size is
        # ~corpus_bytes/B², so small corpora should pass a lower count)
        .repartition(coalesce_blocks or num_parts)
        .groupby("part")
        .map_groups(lambda g: _keep_first_per_text(g, id_col), batch_format="pyarrow")
    )


def curate_corpus(
    ds: ray.data.Dataset,
    *,
    denylist: tuple[str, ...] = (),
    quality_min_micro: int = 300_000,
    rates_micro: dict[str, int] | None = None,
    default_micro: int = 100_000,
    seed: str = "s42",
    span_k: int = 8,
    budget: int = 512,
    num_parts: int = 32,
    part_span: int = DEFAULT_PART_SPAN,
    concurrency: int = 4,
    output: str = "packed",
    coalesce_blocks: int | None = None,
    c4_rules=None,
    dedup: str = "exact",
    bloom_mbits: int = 1 << 26,
) -> ray.data.Dataset:
    """documents(doc_id, text, lang) -> packed training-sequence layout
    (doc_id, n_tokens, cum_before, seq_id, seq_offset, n_seqs) over the
    scrubbed, quality-gated, sampled, exact- and span-deduped corpus.

    ``output="corpus"`` stops after the span-dedup rewrite and returns
    the curated corpus itself (doc_id, text, n_spans) — the shape the
    index builder consumes (``oscar_create --id-column doc_id``), so
    curation chains straight into index construction.

    ``c4_rules`` (a :class:`oscar_ray.stages.c4.C4Rules`) prepends C4
    line-level cleaning: downstream stages see ``text_clean`` and only
    keep==1 docs. ``dedup="bloom"`` swaps the exact keep-first stage for
    the pinned-memory Bloom first-seen filter (``bloom_mbits`` bits per
    partition; stages/bloom.py for the FP contract)."""
    if c4_rules is not None:
        # C4 line-level cleaning FIRST (the published order: line rules,
        # then doc gates, then everything downstream sees text_clean)
        import pyarrow.compute as _pc

        from oscar_ray.stages.c4 import c4_line_filter

        def c4_pass(t: pa.Table) -> pa.Table:
            lang = t["lang"] if "lang" in t.column_names else None
            out = c4_line_filter(t, rules=c4_rules)
            cols = {"doc_id": out["doc_id"], "text": out["text_clean"]}
            if lang is not None:
                cols["lang"] = lang
            kept = pa.table(cols).filter(_pc.equal(out["keep"], 1))
            return kept

        ds = ds.map_batches(c4_pass, batch_format="pyarrow")
    gated = ds.map_batches(
        CurateGate,
        fn_constructor_kwargs={
            "denylist": denylist,
            "quality_min_micro": quality_min_micro,
            "rates_micro": rates_micro or {},
            "default_micro": default_micro,
            "seed": seed,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if dedup == "bloom":
        from oscar_ray.stages.bloom import bloom_dedup_keep

        deduped = bloom_dedup_keep(
            gated, m_bits=bloom_mbits, num_parts=num_parts
        )
    else:
        deduped = exact_dedup_keep(
            gated, num_parts=num_parts, coalesce_blocks=coalesce_blocks
        )
    rewritten = dedup_spans(
        deduped,
        k=span_k,
        num_parts=num_parts,
        rewrite=True,
        concurrency=concurrency,
        coalesce_blocks=coalesce_blocks,
        # corpus output keeps lang so the index builder can field-index it
        carry_cols=("lang",) if output == "corpus" else (),
    )
    if output == "corpus":
        return rewritten
    return pack_sequences(
        rewritten, budget=budget, part_span=part_span, concurrency=concurrency
    )
