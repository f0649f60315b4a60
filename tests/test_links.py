"""Anchor-text inheritance (stages/links.py + build extra_text_columns).

The M6 webtext analog: pages become searchable under their inlink
anchor text. Covers the fixture html contract, the extraction regex,
the aggregation cap/order/normalization, and the build-level
equivalence extra_text_columns == pre-concatenated text.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.spec.extract import extract_text, extract_text_generic, make_html
from oscar_ray.stages.links import (
    LINK_MULT,
    LINK_STEP,
    MAX_OUT_LINKS,
    TOKENS_PER_LINK,
    doc_url,
    fixture_links_for_tokens,
)


class TestLinkedHtml:
    def test_nav_links_do_not_perturb_extracted_text(self):
        text = "alpha beta gamma delta " * 20
        text = text.strip()
        links = [("doc://000000000007", "alpha beta"), ("doc://000000000008", "x y z")]
        h = make_html(text, title="t", links=links)
        assert extract_text(h) == text  # byte-identical invariant holds

    def test_generic_extractor_surfaces_anchor_text(self):
        h = make_html("body words", links=[("doc://000000000001", "anchor words")])
        out = extract_text_generic(h)
        assert "body words" in out
        assert "anchor words" in out  # a real boilerplate stripper keeps it

    def test_fixture_rule_gating(self):
        # < TOKENS_PER_LINK tokens -> no links; long docs cap at MAX_OUT_LINKS
        assert fixture_links_for_tokens(3, ["a"] * (TOKENS_PER_LINK - 1), 100) == []
        many = fixture_links_for_tokens(3, ["a"] * 100, 100)
        assert len(many) == MAX_OUT_LINKS
        dsts = [(3 * LINK_MULT + j * LINK_STEP) % 100 for j in (1, 2, 3)]
        assert [u for u, _ in many] == [doc_url(d) for d in dsts]


class TestExtractLinks:
    def test_roundtrips_fixture_rule(self, ray_session):
        import ray.data

        from oscar_ray.stages.links import extract_links

        texts = [
            "one two three four five six seven eight nine ten",
            "short",  # no links
            " ".join(f"tok{i}" for i in range(30)),
        ]
        n_docs = 50
        rows = []
        for d, t in enumerate(texts):
            toks = t.split()
            links = fixture_links_for_tokens(d, toks, n_docs)
            rows.append(
                {
                    "url": doc_url(d),
                    "html": make_html(t, links=links),
                }
            )
        got = (
            extract_links(ray.data.from_arrow(pa.Table.from_pylist(rows)))
            .to_pandas()
            .sort_values(["src_url", "link_pos"])
            .reset_index(drop=True)
        )
        want = []
        for d, t in enumerate(texts):
            for pos, (u, a) in enumerate(
                fixture_links_for_tokens(d, t.split(), n_docs)
            ):
                want.append((doc_url(d), pos, u, a))
        assert list(map(tuple, got.to_numpy())) == want

    def test_entity_escaped_href_and_anchor(self, ray_session):
        import ray.data

        from oscar_ray.stages.links import extract_links

        h = b'<html><body><a href="doc://1&amp;2">A &amp; B</a></body></html>'
        got = extract_links(
            ray.data.from_arrow(
                pa.table({"url": ["u"], "html": pa.array([h], type=pa.binary())})
            )
        ).to_pandas()
        assert got.dst_url[0] == "doc://1&2"
        assert got.anchor[0] == "A & B"


class TestAggregateAnchors:
    def test_cap_order_count_and_normalization(self, ray_session):
        import ray.data

        from oscar_ray.stages.links import aggregate_anchors

        # 12 inlinks to one target from shuffled sources, incl. two links
        # from the SAME source page (link_pos tiebreak), mixed-case and
        # punctuated anchors (normalization), plus a second target
        rng = np.random.default_rng(7)
        srcs = [f"src://{i:04d}" for i in range(11)] + ["src://0003"]
        pos = [0] * 11 + [1]
        anchors = [f"Word{i}, Mixed-{i}" for i in range(12)]
        order = rng.permutation(12)
        links = pa.table(
            {
                "src_url": pa.array([srcs[i] for i in order]),
                "link_pos": pa.array([pos[i] for i in order], type=pa.int32()),
                "dst_url": pa.array(["doc://000000000042"] * 12),
                "anchor": pa.array([anchors[i] for i in order]),
            }
        )
        extra = pa.table(
            {
                "src_url": ["src://9999"],
                "link_pos": pa.array([0], type=pa.int32()),
                "dst_url": ["doc://000000000001"],
                "anchor": ["Only One"],
            }
        )
        got = (
            aggregate_anchors(
                ray.data.from_arrow(pa.concat_tables([links, extra])),
                max_inlinks=8,
                num_parts=4,
            )
            .to_pandas()
            .sort_values("dst_url")
            .reset_index(drop=True)
        )
        assert list(got.n_inlinks) == [1, 12]
        assert got.anchor_text[0] == "only one"
        # first 8 in (src_url, link_pos) order: srcs 0,1,2,3(pos0),3(pos1),4,5,6
        kept = [0, 1, 2, 3, 11, 4, 5, 6]
        want = " ".join(f"word{i} mixed {i}" for i in kept)
        assert got.anchor_text[1] == want


class TestEnrichedBuild:
    def test_extra_text_columns_equals_preconcatenated_text(
        self, ray_session, tmp_path
    ):
        """extra_text_columns=['a'] must produce byte-identical index
        artifacts to a plain build over text||' '||a — the stage-A
        concatenation IS the semantics."""
        from oscar_ray.index.build import IndexBuildConfig, build_index

        rng = np.random.default_rng(11)
        vocab = np.array([f"w{i:03d}" for i in range(40)])
        n = 60
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(4, 30)))
            for _ in range(n)
        ]
        anchors = [
            "" if i % 5 == 0 else " ".join(rng.choice(vocab, size=3))
            for i in range(n)
        ]
        base = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "anchor_text": pa.array(
                    [a if i % 7 else None for i, a in enumerate(anchors)],
                    type=pa.string(),
                ),
            }
        )
        concat = pa.table(
            {
                "doc_id": base["doc_id"],
                "text": pa.array(
                    [
                        t + " " + (a if i % 7 else "")
                        for i, (t, a) in enumerate(zip(texts, anchors))
                    ]
                ),
            }
        )
        pq.write_table(base, tmp_path / "base.parquet")
        pq.write_table(concat, tmp_path / "concat.parquet")
        kw = dict(
            num_partitions=4,
            block_span_bits=10,
            shard_fragments=1,
            id_column="doc_id",
            url_column=None,
            lang_column=None,
            dedup_urls=False,
        )
        build_index(
            str(tmp_path / "base.parquet"),
            str(tmp_path / "idx_extra"),
            IndexBuildConfig(extra_text_columns=["anchor_text"], **kw),
        )
        build_index(
            str(tmp_path / "concat.parquet"),
            str(tmp_path / "idx_plain"),
            IndexBuildConfig(**kw),
        )
        for sub in ("postings", "dict"):
            a_dir = tmp_path / "idx_extra" / sub
            b_dir = tmp_path / "idx_plain" / sub
            a_files = sorted(os.listdir(a_dir))
            assert a_files == sorted(os.listdir(b_dir))
            for f in a_files:
                if not f.endswith(".parquet"):
                    continue
                assert (a_dir / f).read_bytes() == (b_dir / f).read_bytes(), f


class TestEnrichCorpusCLIPath:
    def _write_corpus(self, path):
        def html(text, links=None):
            return make_html(text, links=links)

        rows = [
            {
                "url": "page://a",
                "html": html(
                    "alpha beta gamma", links=[("page://b", "zeta eta")]
                ),
                "text": "alpha beta gamma",
                "lang": "en",
            },
            {
                "url": "page://b",
                "html": html("delta epsilon"),
                "text": "delta epsilon",
                "lang": "en",
            },
            {
                "url": "page://c",
                "html": html("iota kappa", links=[("page://b", "zeta")]),
                "text": "iota kappa",
                "lang": "en",
            },
        ]
        pq.write_table(pa.Table.from_pylist(rows), path)

    def test_anchor_only_term_finds_target_and_rebuild_identical(
        self, ray_session, tmp_path
    ):
        """A doc becomes searchable under a term that appears ONLY in its
        inlink anchors; the rewrite+build is byte-deterministic."""
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.pipelines.anchors import enrich_corpus_with_anchors
        from oscar_ray.query.engine import QueryEngine

        src = tmp_path / "pages.parquet"
        self._write_corpus(str(src))
        digests = []
        for run in ("r1", "r2"):
            corpus = tmp_path / run / "anchored_corpus"
            os.makedirs(tmp_path / run)
            enrich_corpus_with_anchors(str(src), str(corpus))
            cfg = IndexBuildConfig(
                num_partitions=2,
                block_span_bits=10,
                shard_fragments=1,
                id_column="_docid",
                extra_text_columns=["anchor_text"],
            )
            idx = tmp_path / run / "idx"
            build_index(str(corpus), str(idx), cfg)
            eng = QueryEngine(str(idx))
            ids, _ = eng.search("zeta", k=10)
            assert list(ids) == [1]  # page://b's layout docid
            ids2, _ = eng.search("delta", k=10)
            assert list(ids2) == [1]
            d = b""
            for sub in ("postings", "dict"):
                for f in sorted(os.listdir(idx / sub)):
                    if f.endswith(".parquet"):
                        d += (idx / sub / f).read_bytes()
            digests.append(d)
        assert digests[0] == digests[1]
