"""Positional search tests: phrase adjacency, proximity windows, fuzzy
term expansion — each checked against an exhaustive Python brute force
over the same tokenizer, plus codec round-trips and the don't-crash /
positions-unavailable contracts."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oscar_ray.query import parser as qp
from oscar_ray.query.engine import QueryEngine
from oscar_ray.spec.tokenizer import tokenize_text

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "quick brown foxes dance",
    "",
    "hash join and merge join win over nested loop join",
    "the the the quick quick brown",
    "merge sort beats quick sort on nearly sorted data",
    "a hash join is a join that uses a hash table",
    "brown quick",
    "join hash",  # reversed order: phrase must NOT match, proximity must
    "quick stop stops slow drop plop",  # fuzzy edit-distance cluster
    "over the lazy dog the quick brown fox jumps",
] * 3  # repetition spreads docids over several blocks at span_bits=3


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    from oscar_ray.index.build import IndexBuildConfig, build_index

    d = tmp_path_factory.mktemp("posidx")
    src = str(d / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                "text": TEXTS,
                "lang": ["en"] * len(TEXTS),
            }
        ),
        src,
    )
    out = str(d / "idx")
    build_index(
        src,
        out,
        IndexBuildConfig(
            num_partitions=4,
            block_span_bits=3,
            shard_fragments=1,
            id_column="doc_id",
            url_column=None,
            dedup_urls=False,
            index_positions=True,
            field_columns=["lang"],
        ),
        check=True,
    )
    return out


@pytest.fixture(scope="module")
def pos_engine(pos_index):
    return QueryEngine(pos_index)


def brute_phrase(tokens: tuple[str, ...]) -> dict[int, int]:
    out = {}
    m = len(tokens)
    for d, t in enumerate(TEXTS):
        tk = tokenize_text(t)
        c = sum(
            1
            for i in range(len(tk) - m + 1)
            if tuple(tk[i : i + m]) == tuple(tokens)
        )
        if c:
            out[d] = c
    return out


def brute_prox(tokens: tuple[str, ...], slop: int) -> set[int]:
    hits = set()
    for d, t in enumerate(TEXTS):
        tk = tokenize_text(t)
        plists = [[i for i, x in enumerate(tk) if x == w] for w in tokens]
        if any(not p for p in plists):
            continue
        for combo in itertools.product(*plists):
            if max(combo) - min(combo) <= slop:
                hits.add(d)
                break
    return hits


def lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


class TestParserPositional:
    def test_phrase(self):
        assert qp.parse_query('"hash join"') == qp.Phrase(("hash", "join"))

    def test_single_token_phrase_is_term(self):
        assert qp.parse_query('"hash"') == qp.Term("hash")

    def test_proximity(self):
        assert qp.parse_query('"a b"~3') == qp.Proximity(("a", "b"), 3)

    def test_proximity_dedups_tokens(self):
        assert qp.parse_query('"a b a"~4') == qp.Proximity(("a", "b"), 4)

    def test_fuzzy_default_and_explicit(self):
        assert qp.parse_query("merge~") == qp.Fuzzy("merge", 1)
        assert qp.parse_query("merge~2") == qp.Fuzzy("merge", 2)

    def test_quotes_shield_operators(self):
        assert qp.parse_query('"a-b"') == qp.Phrase(("a", "b"))

    @pytest.mark.parametrize(
        "bad", ['"unclosed', '"a b"~', '"a b"~0', "x~9", "a_b~1", '"a b"~x']
    )
    def test_malformed_positional_raises(self, bad):
        with pytest.raises(qp.QueryParseError):
            qp.parse_query(bad)

    def test_query_terms_includes_phrase_tokens(self):
        node = qp.parse_query('"hash join" + scan')
        assert qp.query_terms(node) == ["hash", "join", "scan"]


class TestPhrase:
    @pytest.mark.parametrize(
        "q,toks",
        [
            ('"hash join"', ("hash", "join")),
            ('"quick brown"', ("quick", "brown")),
            ('"the quick brown"', ("the", "quick", "brown")),
            ('"quick quick"', ("quick", "quick")),  # overlapping repeats
            ('"the the"', ("the", "the")),
            ('"join hash"', ("join", "hash")),  # order matters
            ('"lazy dog the"', ("lazy", "dog", "the")),
            ('"no such phrase"', ("no", "such", "phrase")),
        ],
    )
    def test_matches_brute_force(self, pos_engine, q, toks):
        ids, scores = pos_engine.search(q, k=1000, mode="exhaustive")
        want = brute_phrase(toks)
        assert set(ids.tolist()) == set(want)
        # scores: BM25 over phrase tf/df with the pinned kernels
        from oscar_ray.spec.bm25 import bm25_idf, bm25_tf_norm

        r = pos_engine.reader
        if want:
            idf = bm25_idf(float(len(want)), r.n_docs)
            by_id = dict(zip(ids.tolist(), scores.tolist()))
            for d, tf in want.items():
                dl = len(tokenize_text(TEXTS[d]))
                expect = idf * float(bm25_tf_norm(tf, dl, r.avgdl, r.params))
                assert by_id[d] == pytest.approx(expect, rel=1e-12)

    def test_pruned_equals_exhaustive(self, pos_engine):
        for q in ['"hash join"', '"quick brown" + merge', 'dog - "the quick"',
                  '"the quick brown" ^ fox']:
            a_ids, a_sc = pos_engine.search(q, k=1000, mode="exhaustive")
            b_ids, b_sc = pos_engine.search(q, k=1000)
            assert a_ids.tolist() == b_ids.tolist()
            np.testing.assert_allclose(a_sc, b_sc)

    def test_positional_cache_repeat_identical(self, pos_engine):
        """Repeated phrase/proximity queries serve from the leaf cache
        with byte-identical results (batch streams repeat phrases)."""
        pos_engine._positional_cache.clear()
        for q in ['"hash join"', '"quick brown"~3']:
            a_ids, a_sc = pos_engine.search(q, k=1000, mode="exhaustive")
            assert len(pos_engine._positional_cache) >= 1
            b_ids, b_sc = pos_engine.search(q, k=1000, mode="exhaustive")
            assert a_ids.tolist() == b_ids.tolist()
            np.testing.assert_array_equal(a_sc, b_sc)
        assert len(pos_engine._positional_cache) == 2
        pos_engine._positional_cache.clear()

    def test_phrase_composes_with_algebra(self, pos_engine):
        ids, _ = pos_engine.search('"hash join" - table', k=1000, mode="exhaustive")
        want = {
            d
            for d in brute_phrase(("hash", "join"))
            if "table" not in tokenize_text(TEXTS[d])
        }
        assert set(ids.tolist()) == want


class TestProximity:
    @pytest.mark.parametrize(
        "q,toks,slop",
        [
            ('"hash join"~1', ("hash", "join"), 1),  # includes reversed order
            ('"hash win"~10', ("hash", "win"), 10),
            ('"fox dog"~5', ("fox", "dog"), 5),
            ('"quick sort merge"~4', ("quick", "sort", "merge"), 4),
            ('"the quick fox brown"~6', ("the", "quick", "fox", "brown"), 6),
            ('"brown dance"~1', ("brown", "dance"), 1),
        ],
    )
    def test_matches_brute_force(self, pos_engine, q, toks, slop):
        ids, scores = pos_engine.search(q, k=1000, mode="exhaustive")
        assert set(ids.tolist()) == brute_prox(toks, slop)
        ids2, sc2 = pos_engine.search(q, k=1000)
        assert ids.tolist() == ids2.tolist()
        np.testing.assert_allclose(scores, sc2)

    def test_scores_equal_plain_and(self, pos_engine):
        """Proximity is a FILTER: surviving docs keep their AND scores."""
        and_ids, and_sc = pos_engine.search("hash join", k=1000, mode="exhaustive")
        nr_ids, nr_sc = pos_engine.search('"hash join"~2', k=1000, mode="exhaustive")
        by_id = dict(zip(and_ids.tolist(), and_sc.tolist()))
        assert set(nr_ids.tolist()) <= set(and_ids.tolist())
        for d, s in zip(nr_ids.tolist(), nr_sc.tolist()):
            assert s == pytest.approx(by_id[d], rel=1e-12)


class TestFuzzy:
    def test_expansion_matches_scalar_levenshtein(self, pos_engine):
        r = pos_engine.reader
        vocab = set()
        for t in TEXTS:
            vocab.update(tokenize_text(t))
        for q, d in [("join", 1), ("quick", 1), ("stop", 1), ("plop", 2),
                     ("merge", 2), ("zzz", 1), ("a", 2)]:
            got = r.terms_with_edit_distance(q, d)
            want = sorted(w for w in vocab if lev(q, w) <= d)
            assert got == want, (q, d, got, want)

    def test_fuzzy_query_equals_or_chain(self, pos_engine):
        r = pos_engine.reader
        expansion = r.terms_with_edit_distance("stop", 1)
        assert len(expansion) >= 2  # stop + 1-edit neighbours in TEXTS
        or_q = " + ".join(expansion)
        a_ids, a_sc = pos_engine.search("stop~", k=1000, mode="exhaustive")
        b_ids, b_sc = pos_engine.search(or_q, k=1000, mode="exhaustive")
        assert a_ids.tolist() == b_ids.tolist()
        np.testing.assert_allclose(a_sc, b_sc)

    def test_excludes_marker_namespaces(self, pos_engine):
        # "@lang:en" field-marker terms must never surface via fuzzy
        got = pos_engine.reader.terms_with_edit_distance("lang", 2)
        assert all(not t.startswith(("\x01", "\x02")) for t in got)


class TestRegex:
    def test_expansion_matches_python_fullmatch(self, pos_engine):
        import re

        vocab = set()
        for t in TEXTS:
            vocab.update(tokenize_text(t))
        for pat in [r"s(top|low)", r"qu.*", r"jo[a-z]+", r"fox(es)?", r"zz+",
                    r"d(og|ance|rop)"]:
            got = pos_engine.reader.terms_with_regex(pat)
            want = sorted(w for w in vocab if re.fullmatch(pat, w))
            assert got == want, (pat, got, want)

    def test_regex_query_equals_or_chain(self, pos_engine):
        a_ids, a_sc = pos_engine.search("%fox(es)?%", k=1000, mode="exhaustive")
        b_ids, b_sc = pos_engine.search("fox + foxes", k=1000, mode="exhaustive")
        assert a_ids.tolist() == b_ids.tolist()
        np.testing.assert_allclose(a_sc, b_sc)
        p_ids, p_sc = pos_engine.search("%fox(es)?%", k=1000)
        assert p_ids.tolist() == a_ids.tolist()

    def test_parse_and_failure_modes(self, pos_engine):
        assert qp.parse_query("%a.b%") == qp.Regex("a.b")
        with pytest.raises(qp.QueryParseError):
            qp.parse_query("%(%")
        with pytest.raises(qp.QueryParseError):
            qp.parse_query("%unterminated")
        # python-valid but RE2-invalid (lookbehind): empty, no crash
        ids, _ = pos_engine.search("%a(?<=b)%", k=5)
        assert len(ids) == 0

    def test_excludes_marker_namespaces(self, pos_engine):
        got = pos_engine.reader.terms_with_regex(".*")
        assert got and all(not t.startswith(("\x01", "\x02")) for t in got)


class TestPositionsContract:
    def test_positions_unavailable_is_empty_flagged(self, built_index_t1):
        index_dir, _ = built_index_t1  # built WITHOUT positions
        eng = QueryEngine(index_dir)
        # phrase over two terms that DO exist in this index's vocabulary —
        # the sidecar, not df==0, must be what empties the result
        from oscar_ray.index.layout import FIELD_MARKER, SUFFIX_MARKER

        terms = [
            t
            for t in eng.reader.terms_with_prefix("", limit=50)
            if not t.startswith((FIELD_MARKER, SUFFIX_MARKER))
        ][:2]
        assert len(terms) == 2
        ids, scores, timings = eng.search_timed(f'"{terms[0]} {terms[1]}"', k=10)
        assert len(ids) == 0 and timings.get("reason") == "positions_unavailable"

    def test_positions_roundtrip_vs_tokenizer(self, pos_engine):
        r = pos_engine.reader
        for term in ["the", "quick", "join", "hash", "dog"]:
            tp = r.postings(term)
            assert tp.has_positions
            for i in range(len(tp.block_ids)):
                docids, tfs, _ = tp.decode_block(i)
                flat = tp.positions_block(i, tfs)
                off = 0
                for d, tf in zip(docids.tolist(), tfs.tolist()):
                    got = flat[off : off + int(tf)].tolist()
                    off += int(tf)
                    toks = tokenize_text(TEXTS[int(d)])
                    assert got == [j for j, x in enumerate(toks) if x == term]

    def test_rebuild_identical(self, ray_session, pos_index, tmp_path):
        """Positional builds are deterministic byte-for-byte."""
        import filecmp
        import os

        from oscar_ray.index.build import IndexBuildConfig, build_index

        src = os.path.join(os.path.dirname(pos_index), "docs.parquet")
        out2 = str(tmp_path / "idx2")
        build_index(
            src,
            out2,
            IndexBuildConfig(
                num_partitions=4,
                block_span_bits=3,
                shard_fragments=1,
                id_column="doc_id",
                url_column=None,
                dedup_urls=False,
                index_positions=True,
                field_columns=["lang"],
            ),
        )
        for root, _dirs, files in os.walk(pos_index):
            rel = os.path.relpath(root, pos_index)
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                a = os.path.join(root, fn)
                b = os.path.join(out2, rel, fn)
                assert filecmp.cmp(a, b, shallow=False), (rel, fn)

    @pytest.mark.parametrize("codec", ["rlede", "eliasfano", "wah"])
    def test_positions_orthogonal_to_docid_codec(self, ray_session, tmp_path, codec):
        """The positions payload is always delta+varint; the docid stream
        codec must not perturb phrase results."""
        from oscar_ray.index.build import IndexBuildConfig, build_index

        src = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                    "text": TEXTS,
                }
            ),
            src,
        )
        out = str(tmp_path / f"idx-{codec}")
        build_index(
            src,
            out,
            IndexBuildConfig(
                num_partitions=4,
                block_span_bits=3,
                shard_fragments=1,
                id_column="doc_id",
                url_column=None,
                lang_column=None,
                dedup_urls=False,
                index_positions=True,
                docid_codec=codec,
            ),
        )
        eng = QueryEngine(out)
        for q, toks in [('"hash join"', ("hash", "join")),
                        ('"the quick brown"', ("the", "quick", "brown"))]:
            ids, _ = eng.search(q, k=1000, mode="exhaustive")
            assert set(ids.tolist()) == set(brute_phrase(toks)), (codec, q)

    def test_config_exclusivity(self, ray_session, tmp_path):
        from oscar_ray.index.build import IndexBuildConfig, build_index

        with pytest.raises(ValueError, match="mutually exclusive"):
            build_index(
                str(tmp_path),
                str(tmp_path / "y"),
                IndexBuildConfig(index_positions=True, payload_dedup=True),
            )

    def test_positions_compose_with_suffix_index(self, ray_session, tmp_path):
        """One index serves phrase AND substring queries: suffix-marker
        pairs carry empty position payloads, plain terms real ones."""
        from oscar_ray.index.build import IndexBuildConfig, build_index

        src = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                    "text": TEXTS,
                }
            ),
            src,
        )
        out = str(tmp_path / "idx")
        build_index(
            src,
            out,
            IndexBuildConfig(
                num_partitions=4,
                block_span_bits=3,
                shard_fragments=1,
                id_column="doc_id",
                url_column=None,
                lang_column=None,
                dedup_urls=False,
                index_positions=True,
                index_suffixes=True,
            ),
            check=True,
        )
        eng = QueryEngine(out)
        # phrase over the positional payloads
        ids, _ = eng.search('"hash join"', k=1000, mode="exhaustive")
        assert set(ids.tolist()) == set(brute_phrase(("hash", "join")))
        # substring over the suffix namespace, in the SAME index
        ids2, _ = eng.search("*uick*", k=1000, mode="exhaustive")
        want = {d for d, t in enumerate(TEXTS)
                if any("uick" in w for w in tokenize_text(t))}
        assert set(ids2.tolist()) == want
        # and composed
        ids3, _ = eng.search('"hash join" *uick*', k=1000, mode="exhaustive")
        assert set(ids3.tolist()) == set(ids.tolist()) & want


class TestPositionalMerge:
    def test_merged_positional_matches_single_build(self, ray_session, tmp_path):
        """Segment merge carries the positions sidecar through: positions
        are intra-doc, so the docid-offset splice leaves payload bytes
        untouched and phrase results equal a from-scratch union build."""
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.index.merge import merge_indexes

        a_texts = TEXTS[:16]  # multiple of block span (8) -> merge offset 16
        b_texts = TEXTS[16:]
        cfg = dict(
            num_partitions=4,
            block_span_bits=3,
            shard_fragments=1,
            id_column="doc_id",
            url_column=None,
            lang_column=None,
            dedup_urls=False,
            index_positions=True,
        )

        def write(texts, ids, name):
            p = str(tmp_path / name)
            pq.write_table(
                pa.table(
                    {"doc_id": pa.array(ids, type=pa.int64()), "text": texts}
                ),
                p,
            )
            return p

        sa = write(a_texts, range(16), "a.parquet")
        sb = write(b_texts, range(len(b_texts)), "b.parquet")
        su = write(
            a_texts + b_texts,
            list(range(16)) + [16 + i for i in range(len(b_texts))],
            "u.parquet",
        )
        ia, ib, iu = (str(tmp_path / n) for n in ("ia", "ib", "iu"))
        build_index(sa, ia, IndexBuildConfig(**cfg))
        build_index(sb, ib, IndexBuildConfig(**cfg))
        build_index(su, iu, IndexBuildConfig(**cfg))
        merged = str(tmp_path / "merged")
        merge_indexes([ia, ib], merged)
        em, eu = QueryEngine(merged), QueryEngine(iu)
        for q in ['"hash join"', '"quick brown"', '"the quick brown"',
                  '"hash join"~3', '"fox dog"~5', "stop~"]:
            im, iu_res = em.search(q, k=1000), eu.search(q, k=1000)
            assert im[0].tolist() == iu_res[0].tolist(), q
            np.testing.assert_allclose(im[1], iu_res[1], rtol=1e-12, err_msg=q)


class TestPositionCodecs:
    def test_roundtrip_random(self):
        from oscar_ray.stages.codecs import (
            concat_binary_segments_arrow,
            decode_positions,
            encode_positions_segmented,
        )

        rng = np.random.default_rng(11)
        tfs = rng.integers(1, 12, size=500)
        starts = np.zeros(len(tfs), dtype=np.int64)
        np.cumsum(tfs[:-1], out=starts[1:])
        pos = np.concatenate(
            [np.sort(rng.choice(1 << 20, size=t, replace=False)) for t in tfs]
        ).astype(np.uint64)
        arr = encode_positions_segmented(pos, starts)
        sb = np.arange(0, 500, 23)
        se = np.concatenate((sb[1:], [500]))
        blocks = concat_binary_segments_arrow(arr, sb, se)
        got = np.concatenate(
            [
                decode_positions(blocks[i].as_py(), tfs[s:e])
                for i, (s, e) in enumerate(zip(sb, se))
            ]
        )
        assert np.array_equal(got, pos)

    def test_mismatched_payload_raises(self):
        from oscar_ray.stages.codecs import decode_positions

        with pytest.raises(ValueError, match="positions payload"):
            decode_positions(b"", np.array([2, 1]))
