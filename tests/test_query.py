"""Query-engine tests: oracle parity, differential engines, set-op algebra,
parser robustness (the reference's differential/don't-crash strategy,
``Workfunctions.cpp:1169-1191``, ``dont_crash_test.txt``)."""

from __future__ import annotations

import numpy as np
import pytest

from oscar_ray.query import parser as qp
from oscar_ray.query import setops
from oscar_ray.query.engine import QueryEngine
from oscar_ray.sources.queryset import DONT_CRASH_QUERIES, generate_queries


@pytest.fixture(scope="module")
def engine(built_index_t1):
    index_dir, _ = built_index_t1
    return QueryEngine(index_dir)


@pytest.fixture(scope="module")
def query_set(oracle_t1):
    dfs = {t: len(p) for t, p in oracle_t1.postings.items()}
    return generate_queries(dfs, n_queries=120, seed=42)


class TestParser:
    def test_single(self):
        node = qp.parse_query("Hello")
        assert node == qp.Term("hello")

    def test_ops(self):
        node = qp.parse_query("a + b - c")
        assert isinstance(node, qp.Op) and node.kind == "andnot"
        assert node.left == qp.Op("or", qp.Term("a"), qp.Term("b"))

    def test_implicit_and_and_slash(self):
        assert qp.parse_query("a b") == qp.parse_query("a / b")

    def test_parens(self):
        node = qp.parse_query("a (b + c)")
        assert node.kind == "and" and node.right.kind == "or"

    def test_multi_token_term_becomes_and(self):
        # '.' and '_' are token delimiters but not query operators
        assert qp.parse_query("foo.bar") == qp.parse_query("foo bar")
        assert qp.parse_query("foo_bar") == qp.parse_query("foo bar")

    def test_dash_is_andnot_operator(self):
        node = qp.parse_query("foo-bar")
        assert isinstance(node, qp.Op) and node.kind == "andnot"

    def test_empty(self):
        assert qp.parse_query("") is None
        assert qp.parse_query("   %% !! ") is None

    @pytest.mark.parametrize("bad", ["((a (( b))", "()", "a + ()", ")(", "a +", "+ a", "a ^ ^ b"])
    def test_malformed_raises(self, bad):
        with pytest.raises(qp.QueryParseError):
            qp.parse_query(bad)

    def test_dont_crash_corpus(self, engine):
        """Adversarial corpus: engine returns empty-or-valid, never raises."""
        for q in DONT_CRASH_QUERIES:
            ids, scores = engine.search(q, k=10)
            assert len(ids) == len(scores)


class TestSetOps:
    @pytest.fixture()
    def rng(self):
        return np.random.default_rng(7)

    def _mk(self, rng, n, universe=200):
        ids = np.sort(
            rng.choice(universe, size=min(n, universe), replace=False).astype(np.uint64)
        )
        return ids, rng.random(len(ids))

    def test_random_differential_vs_python_sets(self, rng):
        """X1-X4 analog: engine kernels vs naive set algebra on random trees."""
        for _ in range(200):
            a, b = self._mk(rng, rng.integers(0, 60)), self._mk(rng, rng.integers(0, 60))
            sa, sb = set(a[0].tolist()), set(b[0].tolist())
            cases = {
                "and": (setops.intersect, sa & sb),
                "or": (setops.union, sa | sb),
                "andnot": (setops.andnot, sa - sb),
                "xor": (setops.xor, sa ^ sb),
            }
            for kind, (fn, expect) in cases.items():
                ids, scores = fn(a, b)
                assert set(ids.tolist()) == expect, kind
                assert (np.diff(ids.astype(np.int64)) > 0).all() if len(ids) > 1 else True
                assert len(scores) == len(ids)

    def test_scores(self):
        a = (np.array([1, 2, 3], dtype=np.uint64), np.array([1.0, 2.0, 3.0]))
        b = (np.array([2, 3, 4], dtype=np.uint64), np.array([10.0, 20.0, 30.0]))
        ids, sc = setops.intersect(a, b)
        assert ids.tolist() == [2, 3] and sc.tolist() == [12.0, 23.0]
        ids, sc = setops.union(a, b)
        assert ids.tolist() == [1, 2, 3, 4] and sc.tolist() == [1.0, 12.0, 23.0, 30.0]
        ids, sc = setops.andnot(a, b)
        assert ids.tolist() == [1] and sc.tolist() == [1.0]
        ids, sc = setops.xor(a, b)
        assert ids.tolist() == [1, 4] and sc.tolist() == [1.0, 30.0]

    def test_top_k_tiebreak_docid(self):
        ids = np.array([5, 1, 9, 3], dtype=np.uint64)
        sc = np.array([1.0, 1.0, 2.0, 1.0])
        got_ids, got_sc = setops.top_k(ids, sc, 3)
        assert got_ids.tolist() == [9, 1, 3]

    def test_top_k_tie_safe_selection(self):
        # many ties around the k-th position: fast path must keep docid order
        n = 10_000
        ids = np.arange(n, dtype=np.uint64)
        sc = np.full(n, 0.5)
        sc[:5] = 1.0
        got_ids, _ = setops.top_k(ids, sc, 10)
        assert got_ids.tolist() == list(range(5)) + list(range(5, 10))


class TestOracleParity:
    def test_rank_and_score_identity(self, engine, oracle_t1, query_set):
        """FIXTURES §3: rank-identical top-k docids and scores per query."""
        n_nonempty = 0
        for q in query_set:
            got_ids, got_sc = engine.search(q["query"], k=q["k"])
            want = oracle_t1.search(q["query"], k=q["k"])
            assert got_ids.tolist() == [d for d, _ in want], q
            np.testing.assert_allclose(
                got_sc, [s for _, s in want], rtol=1e-12, atol=0, err_msg=q["query"]
            )
            n_nonempty += bool(len(got_ids))
        assert n_nonempty > len(query_set) // 2  # the set is mostly non-trivial

    def test_pruned_equals_exhaustive(self, engine, query_set):
        """Differential engines (-ifq analog): block-max == exhaustive, bit-equal."""
        for q in query_set:
            a_ids, a_sc = engine.search(q["query"], k=q["k"], mode="auto")
            b_ids, b_sc = engine.search(q["query"], k=q["k"], mode="exhaustive")
            assert a_ids.tolist() == b_ids.tolist(), q
            assert a_sc.tolist() == b_sc.tolist(), q

    def test_unknown_term_empty(self, engine):
        ids, _ = engine.search("zzzznotaterm", k=10)
        assert len(ids) == 0

    def test_k_edge_cases(self, engine):
        ids, sc = engine.search("waaa", k=0)
        assert len(ids) == 0
        ids1, _ = engine.search("waaa", k=1)
        assert len(ids1) == 1
        ids_huge, _ = engine.search("waaa", k=10**6)
        assert len(ids_huge) >= len(ids1)

    def test_single_doc_index(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.query.engine import QueryEngine

        src = str(tmp_path / "one")
        os.makedirs(src)
        pq.write_table(
            pa.table({"url": ["u"], "text": ["hello world hello"]}),
            os.path.join(src, "p.parquet"),
        )
        out = str(tmp_path / "idx1")
        build_index(
            src, out, IndexBuildConfig(num_partitions=2, lang_column=None), check=True
        )
        eng = QueryEngine(out)
        ids, sc = eng.search("hello", k=5)
        assert ids.tolist() == [0]
        ids, _ = eng.search("hello - world", k=5)
        assert len(ids) == 0

    def test_duplicate_term_query(self, engine, oracle_t1):
        got_ids, got_sc = engine.search("waaa waaa", k=10)
        want = oracle_t1.search("waaa waaa", k=10)
        assert got_ids.tolist() == [d for d, _ in want]

    @pytest.mark.parametrize(
        "q", ["wab*", "wa* - waaa", "wzz* + waaa", "(wab* wac*) ^ waaa", "zzzz*", "*"]
    )
    def test_prefix_queries_match_oracle(self, engine, oracle_t1, q):
        """qt=prefix analog: dictionary range expansion == oracle expansion."""
        got_ids, got_sc = engine.search(q, k=25)
        want = oracle_t1.search(q, k=25)
        assert got_ids.tolist() == [d for d, _ in want], q
        np.testing.assert_allclose(got_sc, [s for _, s in want], rtol=1e-12, atol=0)

    def test_prefix_pruned_equals_exhaustive(self, engine):
        a_ids, a_sc = engine.search("wab* + wac*", k=30, mode="auto")
        b_ids, b_sc = engine.search("wab* + wac*", k=30, mode="exhaustive")
        assert a_ids.tolist() == b_ids.tolist()
        assert a_sc.tolist() == b_sc.tolist()


class TestRandomTreeDifferential:
    """Random deep query trees: engine (both modes) vs oracle (the
    reference's -ifq differential at higher intensity)."""

    def _random_query(self, rng, terms):
        def expr(depth):
            if depth == 0 or rng.random() < 0.4:
                t = str(terms[rng.integers(0, len(terms))])
                roll = rng.random()
                if roll < 0.15:
                    return t[: max(2, len(t) - 1)] + "*"
                return t
            op = ["+", "-", "^", " ", "/"][rng.integers(0, 5)]
            return f"({expr(depth - 1)} {op} {expr(depth - 1)})"

        return expr(int(rng.integers(1, 4)))

    def test_deep_random_trees(self, engine, oracle_t1):
        rng = np.random.default_rng(123)
        terms = np.array(sorted(oracle_t1.postings), dtype=object)
        for i in range(60):
            q = self._random_query(rng, terms)
            k = int(rng.choice([1, 7, 50]))
            got_ids, got_sc = engine.search(q, k=k)
            exh_ids, exh_sc = engine.search(q, k=k, mode="exhaustive")
            assert got_ids.tolist() == exh_ids.tolist(), q
            want = oracle_t1.search(q, k=k)
            assert got_ids.tolist() == [d for d, _ in want], q
            np.testing.assert_allclose(
                got_sc, [s for _, s in want], rtol=1e-12, atol=0, err_msg=q
            )


class TestBatchServing:
    def test_query_server_map_batches(self, ray_session, built_index_t1, query_set):
        import ray.data

        from oscar_ray.query.engine import QueryServer

        index_dir, _ = built_index_t1
        qds = ray.data.from_items(query_set[:40], override_num_blocks=4)
        out = qds.map_batches(
            QueryServer,
            fn_constructor_kwargs={"index_dir": index_dir},
            batch_format="pyarrow",
            concurrency=2,
        )
        rows = out.take_all()
        assert len(rows) > 0
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, lst in by_q.items():
            ranks = sorted(r["rank"] for r in lst)
            assert ranks == list(range(1, len(lst) + 1))


class TestFieldSearch:
    """@field:value scoped search (tag-string analog,
    ``TextSearchTraits.h:68-86``): zero-score filter semantics."""

    @pytest.fixture(scope="class")
    def field_index(self, ray_session, pages_t1, tmp_path_factory):
        from oscar_ray.index.build import IndexBuildConfig, build_index

        out = str(tmp_path_factory.mktemp("index_fields"))
        cfg = IndexBuildConfig(
            num_partitions=8, block_span_bits=8, shard_fragments=3,
            field_columns=["lang"],
        )
        build_index(pages_t1, out, cfg)
        return out

    @pytest.fixture(scope="class")
    def lang_of(self, pages_t1):
        from oscar_ray.sources.pages import list_fragments, read_fragment

        out = {}
        for f in list_fragments(pages_t1):
            t = read_fragment(f, columns=["lang"])
            out.update(zip(t["docid"].to_pylist(), t["lang"].to_pylist()))
        return out

    def test_parse_field_leaf(self):
        node = qp.parse_query("@lang:en")
        assert isinstance(node, qp.Field)
        assert node.field == "lang" and node.value == "en"
        assert node.token.startswith("\x02lang:")

    def test_lang_filter_narrows_without_score_change(
        self, field_index, lang_of, oracle_t1
    ):
        eng = QueryEngine(field_index)
        base_ids, base_scores = eng.search("waaa", k=1 << 30)
        filt_ids, filt_scores = eng.search("waaa @lang:de", k=1 << 30)
        base = dict(zip(base_ids.tolist(), base_scores.tolist()))
        # filtered = exactly the base hits whose lang is de, scores unchanged
        want = {d: s for d, s in base.items() if lang_of[d] == "de"}
        got = dict(zip(filt_ids.tolist(), filt_scores.tolist()))
        assert got == want
        assert len(got) < len(base)

    def test_field_or_and_andnot(self, field_index, lang_of):
        eng = QueryEngine(field_index)
        ids_not, _ = eng.search("waaa - @lang:de", k=1 << 30)
        ids_all, _ = eng.search("waaa", k=1 << 30)
        assert set(ids_not.tolist()) == {
            d for d in ids_all.tolist() if lang_of[d] != "de"
        }

    def test_unknown_field_value_matches_nothing(self, field_index):
        eng = QueryEngine(field_index)
        ids, _ = eng.search("waaa @lang:zz", k=10)
        assert len(ids) == 0

    def test_pruned_equals_exhaustive_with_field(self, field_index):
        eng = QueryEngine(field_index)
        a = eng.search("waaa @lang:en", k=25, mode="auto")
        b = eng.search("waaa @lang:en", k=25, mode="exhaustive")
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1])

    def test_field_name_verbatim_both_sides(self, ray_session, tmp_path):
        """A column whose name is NOT a single plain token (underscore)
        must be queryable: the parser keeps field names verbatim because
        the build side keys marker terms by the raw column name."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_ray.index.build import IndexBuildConfig, build_index

        src = str(tmp_path / "src")
        os.makedirs(src)
        pq.write_table(
            pa.table(
                {
                    "url": ["a", "b", "c"],
                    "text": ["alpha beta", "alpha gamma", "beta gamma"],
                    "sub_lang": ["en", "de", "en"],
                }
            ),
            os.path.join(src, "p.parquet"),
        )
        out = str(tmp_path / "idx")
        build_index(
            src,
            out,
            IndexBuildConfig(
                num_partitions=2, lang_column=None, field_columns=["sub_lang"]
            ),
        )
        node = qp.parse_query("@sub_lang:en")
        assert isinstance(node, qp.Field) and node.field == "sub_lang"
        eng = QueryEngine(out)
        ids, _ = eng.search("alpha @sub_lang:en", k=10)
        assert ids.tolist() == [0]
        ids, _ = eng.search("gamma @sub_lang:de", k=10)
        assert ids.tolist() == [1]


def test_drop_caches_cold_equals_warm(built_index_t1):
    """mdrop analog: after drop_caches the engine reopens everything and
    answers identically."""
    from oscar_ray.index.reader import IndexReader

    index_dir, _ = built_index_t1
    reader = IndexReader(index_dir)
    eng = QueryEngine(index_dir, reader)
    warm_ids, warm_sc = eng.search("waaa + wbaa", k=20)
    assert len(reader._postings_cache) > 0
    n = reader.drop_caches(page_cache=True)
    assert n > 0
    assert len(reader._postings_cache) == 0 and len(reader._files) == 0
    cold_ids, cold_sc = eng.search("waaa + wbaa", k=20)
    np.testing.assert_array_equal(warm_ids, cold_ids)
    np.testing.assert_allclose(warm_sc, cold_sc)
    # stale-closure safety: a TermPostings fetched BEFORE drop_caches
    # must still lazily hydrate payload bytes afterwards (the fetcher
    # reopens the evicted file handle)
    tp = reader.postings("waaa")
    reader.drop_caches()
    ids, _tf, _dl = tp.decode_block(0)
    assert len(ids) > 0


class TestFieldSearchFuzz:
    """Random set-op trees including @lang: leaves: pruned == exhaustive
    == brute-force semantics (filtering the plain-tree result by lang)."""

    def test_random_trees_with_field_leaves(self, pages_t1, tmp_path_factory, ray_session):
        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.sources.pages import list_fragments, read_fragment

        out = str(tmp_path_factory.mktemp("idx_fieldfuzz"))
        build_index(
            pages_t1, out,
            IndexBuildConfig(num_partitions=8, block_span_bits=8,
                             shard_fragments=3, field_columns=["lang"]),
        )
        lang_of = {}
        for f in list_fragments(pages_t1):
            t = read_fragment(f, columns=["lang"])
            lang_of.update(zip(t["docid"].to_pylist(), t["lang"].to_pylist()))
        eng = QueryEngine(out)
        rng = np.random.default_rng(17)
        terms = ["waaa", "wbaa", "wbab", "wcaa", "wa", "wzz"]
        ops = ["+", "-", "^", " "]
        n_nonempty = 0
        for _ in range(60):
            a, b = rng.choice(terms, size=2, replace=True)
            op = ops[rng.integers(0, 4)]
            lang = ["en", "de", "und"][rng.integers(0, 3)]
            base_q = f"{a} {op} {b}" if op != " " else f"{a} {b}"
            fq = f"({base_q}) @lang:{lang}"
            p_ids, p_sc = eng.search(fq, k=1 << 30, mode="auto")
            e_ids, e_sc = eng.search(fq, k=1 << 30, mode="exhaustive")
            assert p_ids.tolist() == e_ids.tolist(), fq
            np.testing.assert_allclose(p_sc, e_sc)
            # semantics: base result filtered by lang, scores unchanged
            b_ids, b_sc = eng.search(base_q, k=1 << 30)
            want = {
                int(d): s
                for d, s in zip(b_ids.tolist(), b_sc.tolist())
                if lang_of[int(d)] == lang
            }
            got = dict(zip(p_ids.tolist(), p_sc.tolist()))
            assert got.keys() == want.keys(), fq
            for d in want:
                assert abs(got[d] - want[d]) < 1e-12
            n_nonempty += bool(len(p_ids))
        assert n_nonempty > 20


class TestCmdCliWorkItems:
    """Smoke tests for the single-process oscar_cmd work items added for
    reference parity: dump-doc (Workfunctions.cpp:892-895), cqr-size
    (Workfunctions.cpp:254-292), interactive (LiveCompleter.cpp:276-310)."""

    def _run(self, built_index_t1, argv, stdin=""):
        import os
        import subprocess
        import sys as _sys

        idx_dir = built_index_t1[0]
        proc = subprocess.run(
            [_sys.executable, "scripts/oscar_cmd.py", "-i", idx_dir, *argv],
            input=stdin,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
        return proc.stdout

    def test_dump_doc(self, built_index_t1):
        import json

        row = json.loads(self._run(built_index_t1, ["dump-doc", "-d", "0"]))
        assert row["found"] and row["docid"] == 0 and "url" in row
        miss = json.loads(self._run(built_index_t1, ["dump-doc", "-d", "99999999"]))
        assert miss == {"docid": 99999999, "found": False}

    def test_cqr_size(self, built_index_t1):
        import json

        out = self._run(built_index_t1, ["cqr-size", "-q", "waaa + wbaa"])
        head = json.loads(out.splitlines()[0])
        assert head["terms"] == 2
        assert head["matched_docs"] > 0
        assert head["total_bytes"] == head["payload_bytes"] + head["metadata_bytes"]
        assert head["payload_bytes"] > 0

    def test_interactive_repl(self, built_index_t1):
        out = self._run(
            built_index_t1,
            ["interactive", "-k", "3"],
            stdin="waaa wbaa\n\nignored after quit\n",
        )
        lines = [l for l in out.splitlines() if l]
        assert 1 <= len(lines) <= 3
        rank, docid, score = lines[0].split("\t")
        assert rank == "1" and float(score) > 0

    def test_query_snippets(self, ray_session, tmp_path_factory):
        """--snippets CORPUS prints a bracketed KWIC line per hit (the
        item-print work item with contextual highlighting). Needs an
        id-column index so docids are corpus row ids."""
        import os
        import subprocess
        import sys as _sys

        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_ray.index.build import IndexBuildConfig, build_index

        root = tmp_path_factory.mktemp("snip")
        corpus = str(root / "docs")
        os.makedirs(corpus)
        rows = {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta scan gamma delta epsilon",
                "filter zeta",
                "nothing here at all",
                "x scan",
            ],
            "lang": ["en"] * 4,
        }
        pq.write_table(pa.table(rows), os.path.join(corpus, "d.parquet"))
        idx = str(root / "idx")
        build_index(
            corpus,
            idx,
            IndexBuildConfig(
                num_partitions=2,
                block_span_bits=8,
                id_column="doc_id",
                url_column=None,
                lang_column="lang",
                dedup_urls=False,
            ),
        )
        proc = subprocess.run(
            [
                _sys.executable, "scripts/oscar_cmd.py", "-i", idx,
                "query", "-q", "scan + filter", "-k", "10",
                "--snippets", corpus,
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
        lines = proc.stdout.strip().splitlines()
        snip_of = {}
        for line in lines[len(lines) // 2 :]:  # second half = snippet rows
            parts = line.split("\t")
            if len(parts) == 3 and "[" in parts[2]:
                snip_of[int(parts[1])] = parts[2]
        assert snip_of[0] == "alpha beta [scan] gamma delta epsilon"
        assert snip_of[1] == "[filter] zeta"
        assert snip_of[3] == "x [scan]"
        assert 2 not in snip_of

    def test_did_you_mean_on_zero_hits(self, built_index_t1):
        import os
        import subprocess
        import sys as _sys

        from oscar_ray.index.reader import IndexReader

        proc = subprocess.run(
            [
                _sys.executable, "scripts/oscar_cmd.py", "-i",
                built_index_t1[0], "query", "-q", "waabxy", "-k", "3",
            ],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
        assert "did you mean: waabxy ->" in proc.stderr
        # the hinted alternatives are exactly the reader's top suggestions
        want = [t for t, _d, _df in
                IndexReader(built_index_t1[0]).suggest("waabxy", 2, k=3)]
        line = next(l for l in proc.stderr.splitlines() if "did you mean" in l)
        assert line.split("-> ")[1] == ", ".join(want)
        # a query WITH hits prints no hint
        proc2 = subprocess.run(
            [
                _sys.executable, "scripts/oscar_cmd.py", "-i",
                built_index_t1[0], "query", "-q", "waaa", "-k", "3",
            ],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=120,
        )
        assert "did you mean" not in proc2.stderr

    def test_bench_live_keystroke_phase(self, built_index_t1, tmp_path):
        import json

        qf = tmp_path / "q.txt"
        qf.write_text("waaa wbaa\nwbab\n")
        out = json.loads(
            self._run(built_index_t1, ["bench", "-f", str(qf), "--live"])
        )
        # one completion timing per keystroke of each query's first term
        assert out["keystrokes"] == len("waaa") + len("wbab")
        cu = out["phases_us"]["complete_us"]
        assert cu["min"] > 0 and cu["max"] >= cu["p99"] >= cu["median"]
        # the serving phases are unaffected by the live flag
        assert out["result_rows"] > 0

    def test_suggest(self, built_index_t1):
        from oscar_ray.index.reader import IndexReader

        out = self._run(built_index_t1, ["suggest", "-q", "waab", "-d", "1", "-n", "5"])
        lines = out.strip().splitlines()
        assert 1 <= len(lines) <= 5
        reader = IndexReader(built_index_t1[0])
        want = set(reader.terms_with_edit_distance("waab", 1))
        cfs = []
        for line in lines:
            term, cf_s, df_s = line.split("\t")
            df_s = df_s.split(" ")[0]  # strip the "(exact)" marker
            assert term in want
            cf = int(cf_s.removeprefix("cf="))
            assert cf >= int(df_s.removeprefix("df=")) > 0
            cfs.append(cf)
        assert cfs == sorted(cfs, reverse=True)

    def test_complete(self, built_index_t1):
        out = self._run(built_index_t1, ["complete", "-p", "wa", "-n", "5"])
        lines = out.strip().splitlines()
        assert 1 <= len(lines) <= 5
        cfs = []
        for line in lines:
            term, cf_s, df_s = line.split("\t")
            assert term.startswith("wa")
            cf = int(cf_s.removeprefix("cf="))
            df = int(df_s.removeprefix("df="))
            assert cf >= df > 0
            cfs.append(cf)
        assert cfs == sorted(cfs, reverse=True)


class TestMoreLikeThis:
    SF = "/root/testdata/sf0.001"

    def test_excludes_source_and_matches_manual_or(self, ray_session):
        from collections import Counter

        import numpy as np
        import pyarrow.dataset as pads

        from oscar_ray.pipelines.search import (
            bm25_scores_table,
            documents_index_dir,
            more_like_this,
        )
        from oscar_ray.query.engine import QueryEngine
        from oscar_ray.spec.bm25 import bm25_idf
        from oscar_ray.spec.tokenizer import tokenize_text

        out = more_like_this(self.SF, doc_id=7, m=5, k=None).to_pandas()
        assert 7 not in set(out.doc_id)
        assert len(out) > 0

        # manual replica: same term selection -> same OR query result
        reader = QueryEngine(documents_index_dir(self.SF)).reader
        src = pads.dataset(f"{self.SF}/documents.parquet").to_table(
            columns=["doc_id", "text"], filter=pads.field("doc_id") == 7
        )
        tf = Counter(tokenize_text(src["text"][0].as_py()))
        w = sorted(
            (-(c * bm25_idf(reader.postings(t).df, reader.n_docs)), t)
            for t, c in tf.items()
        )[:5]
        terms = sorted(t for _, t in w)
        ref = bm25_scores_table(self.SF, " + ".join(terms), k=None).to_pandas()
        ref = ref[ref.doc_id != 7].reset_index(drop=True)
        assert out.doc_id.tolist() == ref.doc_id.tolist()
        assert np.allclose(out.score, ref.score)

    def test_topk_mode_is_rank_prefix(self, ray_session):
        from oscar_ray.pipelines.search import more_like_this

        full = more_like_this(self.SF, doc_id=7, m=5, k=None).to_pandas()
        top = more_like_this(self.SF, doc_id=7, m=5, k=5).to_pandas()
        assert len(top) == 5
        best = full.sort_values(["score", "doc_id"], ascending=[False, True])
        assert set(top.doc_id) <= set(best.head(20).doc_id)


class TestWeightedFieldSearch:
    SF = "/root/testdata/sf0.001"

    def test_weight_zero_equals_body_only(self, ray_session):
        import numpy as np

        from oscar_ray.pipelines.search import (
            bm25_scores_table,
            weighted_field_search,
        )

        body = bm25_scores_table(self.SF, "merge", k=None).to_pandas()
        combo = weighted_field_search(self.SF, "merge", weight=0.0).to_pandas()
        # weight 0: same scores, but the union set may add anchor-only
        # docs at score 0
        merged = combo[combo.doc_id.isin(body.doc_id)].reset_index(drop=True)
        assert merged.doc_id.tolist() == body.doc_id.tolist()
        assert np.allclose(merged.score, body.score)
        extra = combo[~combo.doc_id.isin(body.doc_id)]
        assert (extra.score == 0).all()

    def test_anchor_field_contributes(self, ray_session):
        from oscar_ray.pipelines.search import (
            bm25_scores_table,
            weighted_field_search,
        )

        body = bm25_scores_table(self.SF, "merge", k=None).to_pandas()
        combo = weighted_field_search(self.SF, "merge", weight=2.0).to_pandas()
        # anchor inheritance must add matches and raise some scores
        assert len(combo) >= len(body)
        both = combo.set_index("doc_id").score
        b = body.set_index("doc_id").score
        shared = b.index.intersection(both.index)
        assert (both[shared] >= b[shared] - 1e-9).all()
        assert (both[shared] > b[shared] + 1e-6).any()


class TestQLDirichlet:
    SF = "/root/testdata/sf0.001"

    def test_matches_rowwise_reference(self, ray_session):
        import math
        import re
        from collections import Counter

        import numpy as np
        import pyarrow.parquet as pq

        from oscar_ray.pipelines.search import ql_scores_table

        mu = 100.0
        terms = ("scan", "filter")
        got = ql_scores_table(self.SF, terms, mu=mu).to_pandas()

        t = pq.read_table(f"{self.SF}/documents.parquet")
        toks = {
            int(d): re.findall(r"[a-z0-9]+", s.lower())
            for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        }
        c_total = sum(len(v) for v in toks.values())
        cf = Counter(w for v in toks.values() for w in v)
        want = {}
        for d, v in toks.items():
            c = Counter(v)
            if not any(c[q] for q in terms):
                continue
            s = 0.0
            for q in terms:
                s = s + math.log((c[q] + mu * (cf[q] / c_total)) / (len(v) + mu))
            want[d] = round(s, 4)
        assert dict(zip(got.doc_id, got.score)) == want

    def test_single_term_monotonic(self, ray_session):
        """Fixing doc length and the OTHER term's count, more occurrences
        of one query term -> higher QL (per-term ln terms are monotone;
        total-hit count is NOT an ordering — ln concavity)."""
        import pyarrow.parquet as pq

        from oscar_ray.pipelines.search import ql_scores_table

        got = ql_scores_table(self.SF, ("scan", "filter")).to_pandas()
        t = pq.read_table(f"{self.SF}/documents.parquet").to_pandas()
        t["n"] = t.text.str.split().str.len()
        t["scan"] = t.text.str.count(r"\bscan\b")
        t["filter"] = t.text.str.count(r"\bfilter\b")
        j = t.merge(got, on="doc_id")
        checked = 0
        for (_n, _f), g in j.groupby(["n", "filter"]):
            if g["scan"].nunique() < 2:
                continue
            g = g.sort_values(["scan", "score"])
            assert (g.score.diff().dropna() >= -1e-9).all()
            checked += 1
        assert checked > 0


class TestRankedCompletionSuggest:
    """IndexReader.complete / .suggest — the df-ranked, distance-tiered
    dictionary surfaces behind the search_completions / search_suggest
    registry entries (term-level LiveCompletion + did-you-mean)."""

    @staticmethod
    def _text_vocab(reader) -> dict[str, int]:
        """(term -> df) over the text vocabulary, marker namespaces off."""
        out: dict[str, int] = {}
        for part in range(reader.num_partitions):
            d = reader._part_dict(part)
            lo = int(np.searchsorted(d.terms, "\x0f"))
            for t, df in zip(d.terms[lo:].tolist(), d.df[lo:].tolist()):
                out[t] = int(df)
        return out

    @staticmethod
    def _lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def test_complete_matches_bruteforce(self, built_index_t1):
        from oscar_ray.index.reader import IndexReader

        reader = IndexReader(built_index_t1[0])
        vocab = self._text_vocab(reader)
        hit_some = False
        for prefix in ("wa", "w", "waa", "zzzznope"):
            expect = sorted(
                ((t, df) for t, df in vocab.items() if t.startswith(prefix)),
                key=lambda r: (-r[1], r[0]),
            )
            hit_some = hit_some or bool(expect)
            assert reader.complete(prefix, k=None) == expect
            assert reader.complete(prefix, k=3) == expect[:3]
            assert reader.complete(prefix, k=1) == expect[:1]
        assert hit_some  # fixture vocabulary really exercised the ranking

    def test_complete_empty_prefix_is_whole_text_vocab(self, built_index_t1):
        from oscar_ray.index.reader import IndexReader

        reader = IndexReader(built_index_t1[0])
        rows = reader.complete("", k=None)
        vocab = self._text_vocab(reader)
        assert len(rows) == len(vocab) > 0
        # marker namespaces (field/suffix terms) never surface
        assert all(t >= "\x0f" for t, _ in rows)

    def test_suggest_matches_bruteforce(self, built_index_t1):
        from oscar_ray.index.reader import IndexReader

        reader = IndexReader(built_index_t1[0])
        vocab = self._text_vocab(reader)
        hit_tiers = False
        for q, d in (("waab", 1), ("waab", 2), ("qqqqqq", 1)):
            expect = sorted(
                (
                    (t, self._lev(t, q), df)
                    for t, df in vocab.items()
                    if self._lev(t, q) <= d
                ),
                key=lambda r: (r[1], -r[2], r[0]),
            )
            hit_tiers = hit_tiers or len({r[1] for r in expect}) > 1
            assert reader.suggest(q, max_dist=d, k=None) == expect
            assert reader.suggest(q, max_dist=d, k=2) == expect[:2]
        assert hit_tiers  # at least one probe spanned >1 distance tier

    def test_suggest_exact_term_ranks_first_at_distance_zero(
        self, built_index_t1
    ):
        from oscar_ray.index.reader import IndexReader

        reader = IndexReader(built_index_t1[0])
        vocab = self._text_vocab(reader)
        term = sorted(vocab)[0]
        top = reader.suggest(term, max_dist=2, k=5)[0]
        assert top == (term, 0, vocab[term])


class TestQgramFilterParity:
    """The q-gram count filter (reader._fuzzy_shortlist) must be lossless:
    suggest/fuzzy results over a random vocabulary — including
    repeated-character strings (multiset bigram stress) and non-ascii —
    must equal the brute-force Levenshtein scan."""

    @pytest.fixture(scope="class")
    def dict_index(self, tmp_path_factory):
        import json
        import pyarrow as pa
        import pyarrow.parquet as pq

        from oscar_ray.index import layout

        rng = np.random.default_rng(7)
        alphabet = list("abcdefgh01éß汉")  # small: forces near-collisions
        vocab = set()
        while len(vocab) < 3000:
            ln = int(rng.integers(2, 11))
            vocab.add("".join(rng.choice(alphabet, size=ln)))
        # adversarial: runs of one char (multiset-bound stress)
        vocab.update("a" * n for n in range(2, 9))
        vocab.update("ab" * n for n in range(1, 5))
        terms = sorted(vocab)
        parts = 4
        out = str(tmp_path_factory.mktemp("dict_idx"))
        import os as _os

        _os.makedirs(_os.path.join(out, "dict"))
        pids = layout.term_partitions_np(np.asarray(terms, dtype=object), parts)
        part_meta = []
        for p in range(parts):
            sel = [t for t, i in zip(terms, pids) if i == p]
            df = rng.integers(1, 1000, size=len(sel))
            t = pa.table(
                {
                    "term": pa.array(sel, type=pa.string()),
                    "df": pa.array(df, type=pa.int64()),
                    "cf": pa.array(df + 1, type=pa.int64()),
                }
            ).sort_by("term")
            pq.write_table(t, layout.dict_path(out, p))
            part_meta.append({"terms": len(sel)})
        with open(layout.manifest_path(out), "w") as f:
            json.dump(
                {
                    "complete": True,
                    "config": {
                        "num_partitions": parts,
                        "block_span_bits": 12,
                        "k1": 0.9,
                        "b": 0.4,
                    },
                    "stats": {"n_docs": 1000, "avgdl": 10.0},
                    "partitions": part_meta,
                },
                f,
            )
        return out, terms

    def test_suggest_equals_bruteforce_random(self, dict_index):
        from oscar_ray.index.reader import IndexReader

        out, terms = dict_index
        reader = IndexReader(out)
        lev = TestRankedCompletionSuggest._lev
        rng = np.random.default_rng(11)
        queries = [terms[i] for i in rng.integers(0, len(terms), size=25)]
        # mutate: substitution / extension / truncation, incl. short ones
        queries += [q[:-1] for q in queries[:8] if len(q) > 2]
        queries += [q + "x" for q in queries[8:16]]
        queries += ["a", "aa", "aaaa", "abab", "ééé"]
        dfs = {}
        for p in range(reader.num_partitions):
            d = reader._part_dict(p)
            dfs.update(zip(d.terms.tolist(), d.df.tolist()))
        for q in queries:
            for dist in (1, 2):
                got = reader.suggest(q, max_dist=dist, k=None)
                want = sorted(
                    (
                        (t, lev(t, q), int(dfs[t]))
                        for t in terms
                        if lev(t, q) <= dist
                    ),
                    key=lambda r: (r[1], -r[2], r[0]),
                )
                assert got == want, (q, dist)

    def test_terms_with_edit_distance_equals_bruteforce(self, dict_index):
        from oscar_ray.index.reader import IndexReader

        out, terms = dict_index
        reader = IndexReader(out)
        lev = TestRankedCompletionSuggest._lev
        for q in ("aaaa", "abab", "h01é", "汉汉"):
            got = reader.terms_with_edit_distance(q, 2)
            want = sorted(t for t in terms if lev(t, q) <= 2)
            assert got == want, q


class TestDecodedBlockCacheConcurrency:
    """The decoded-block LRU is shared across the engine's parallel_fetch
    thread pool: get()'s pop+reinsert recency touch must not race put()'s
    eviction (next(iter)->pop KeyError) — regression for the lock."""

    def test_threaded_get_put_under_eviction(self):
        import threading

        import numpy as np

        from oscar_ray.index.reader import _DecodedBlockCache

        val = (np.zeros(128, dtype=np.int64),)  # 1 KB per entry
        cache = _DecodedBlockCache(max_bytes=16 << 10)  # 16 entries -> churn
        errs: list[BaseException] = []

        def worker(seed: int) -> None:
            rng = np.random.default_rng(seed)
            try:
                for _ in range(4000):
                    key = ("t", int(rng.integers(0, 64)))
                    if cache.get(key) is None:
                        cache.put(key, val)
            except BaseException as e:  # noqa: BLE001 - recorded for assert
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        # byte accounting stayed consistent with the resident entries
        assert cache.bytes == sum(
            sum(a.nbytes for a in v) for v in cache._d.values()
        )
        assert cache.bytes <= cache.max_bytes


class TestDropCachesDecodeCold:
    """mdrop must evict the decoded-block LRU and q-gram CSRs too — a
    'cold' measurement that still serves decoded blocks from the LRU is
    a warm-decode number (regression for drop_caches completeness)."""

    def test_drop_then_identical_results(self, built_index_t1):
        from oscar_ray.index.reader import IndexReader
        from oscar_ray.query.engine import QueryEngine

        idx, _ = built_index_t1
        r = IndexReader(idx)
        e = QueryEngine(idx, reader=r)
        term = r.complete("w", k=1)[0][0]
        warm_ids, warm_scores = e.search(term, k=50)
        r.terms_with_edit_distance(term, 2)  # populate q-gram CSRs
        assert r._decoded_cache.bytes > 0
        assert r._qgram_csrs
        r.drop_caches()
        assert r._decoded_cache.bytes == 0 and not r._decoded_cache._d
        assert not r._qgram_csrs
        cold_ids, cold_scores = e.search(term, k=50)
        assert warm_ids.tolist() == cold_ids.tolist()
        import numpy as np

        np.testing.assert_allclose(warm_scores, cold_scores, rtol=1e-12)
