"""Stage tests: dedup (planted near-dups), similarity, text analysis,
multimodal plumbing — each vs a small driver-side brute-force oracle."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from oscar_ray.spec.tokenizer import tokenize_text


def _corpus_with_dups():
    """Docs 0..9 random-ish; 10/11 near-dup of 0 (small edits); 12 == 3 exactly."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(200)]
    docs = []
    for i in range(10):
        toks = [vocab[j] for j in rng.integers(0, 200, size=60)]
        docs.append(" ".join(toks))
    base = docs[0].split()
    near1 = base.copy()
    near1[5] = "changed"
    near2 = base.copy()
    near2[10] = "xxx"
    near2[40] = "yyy"
    docs.append(" ".join(near1))  # 10
    docs.append(" ".join(near2))  # 11
    docs.append(docs[3])  # 12 exact dup of 3
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )


def _shingle_set(text: str, n: int = 3) -> set:
    toks = tokenize_text(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_corpus_with_dups())


class TestDedup:
    def test_exact_dedup_groups(self, dup_ds):
        from oscar_ray.stages.dedup import exact_dedup_groups

        rows = exact_dedup_groups(dup_ds).take_all()
        tbl = _corpus_with_dups()
        texts = tbl["text"].to_pylist()
        by_h = {r["h"]: r for r in rows}
        h3 = hashlib.md5(texts[3].encode()).hexdigest()
        assert by_h[h3]["n_docs"] == 2 and by_h[h3]["keep_id"] == 3
        assert len(rows) == len(set(texts))

    def test_ngram_jaccard_matches_bruteforce(self, dup_ds):
        from oscar_ray.stages.dedup import ngram_jaccard_pairs

        got = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in ngram_jaccard_pairs(dup_ds, tau=0.3, concurrency=2).take_all()
        }
        tbl = _corpus_with_dups()
        texts = tbl["text"].to_pylist()
        sets = [_shingle_set(t) for t in texts]
        want = {}
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                j = _jaccard(sets[a], sets[b])
                if j >= 0.3:
                    want[(a, b)] = round(j, 6)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, k

    def test_minhash_lsh_finds_high_sim_pairs(self, dup_ds):
        from oscar_ray.stages.dedup import minhash_lsh_pairs

        rows = minhash_lsh_pairs(dup_ds, tau=0.3, concurrency=2).take_all()
        pairs = {(r["a_id"], r["b_id"]) for r in rows}
        # the planted pairs must be found (LSH at 128 perms / 32 bands has
        # ~certain recall at jaccard >= 0.5)
        assert (0, 10) in pairs
        assert (3, 12) in pairs
        # verified jaccard means no false positives below tau
        for r in rows:
            assert r["jaccard"] >= 0.3

    def test_cluster_pairs_connected_components(self, ray_session):
        import pyarrow as pa

        from oscar_ray.stages.dedup import cluster_pairs

        # components: {1,2,3,7} (chain), {5,9}, singleton edges preserved
        pairs = pa.table(
            {
                "a_id": pa.array([1, 2, 3, 5], type=pa.int64()),
                "b_id": pa.array([2, 3, 7, 9], type=pa.int64()),
            }
        )
        t = cluster_pairs(pairs)
        lab = dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))
        assert lab == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 9: 5}

    def test_cluster_pairs_ds_matches_numpy(self, ray_session):
        """Distributed label propagation == numpy fast path on a graph
        with long chains (exercises pointer jumping) + random edges."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import _numpy_components, cluster_pairs_ds

        rng = np.random.default_rng(7)
        # 3 chains of length 60 (deep components) + 200 random edges
        chains = []
        for c in range(3):
            base = 1000 * (c + 1)
            ids = np.arange(base, base + 60)
            chains.append(np.stack([ids[:-1], ids[1:]], axis=1))
        rand = rng.integers(0, 400, size=(200, 2))
        rand = rand[rand[:, 0] != rand[:, 1]]
        edges = np.concatenate(chains + [rand])
        a, b = edges[:, 0].astype(np.int64), edges[:, 1].astype(np.int64)

        nodes, labels = _numpy_components(a, b, max_rounds=50)
        want = dict(zip(nodes.tolist(), labels.tolist()))

        ds = ray.data.from_arrow(
            pa.table({"a_id": pa.array(a), "b_id": pa.array(b)})
        )
        got_rows = cluster_pairs_ds(ds, num_parts=8).take_all()
        got = {r["doc_id"]: r["cluster_id"] for r in got_rows}
        assert got == want

    def test_cluster_pairs_auto_distributed(self, ray_session):
        """driver_limit=0 forces the distributed path through the public
        API; output must equal the numpy path."""
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import cluster_pairs

        pairs = pa.table(
            {
                "a_id": pa.array([1, 2, 3, 5], type=pa.int64()),
                "b_id": pa.array([2, 3, 7, 9], type=pa.int64()),
            }
        )
        t = cluster_pairs(ray.data.from_arrow(pairs), driver_limit=0)
        lab = dict(zip(t["doc_id"].to_pylist(), t["cluster_id"].to_pylist()))
        assert lab == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 9: 5}

    def test_simhash_finds_exact_dup(self, dup_ds):
        from oscar_ray.stages.dedup import simhash_dup_pairs

        rows = simhash_dup_pairs(dup_ds, max_hamming=6, concurrency=2).take_all()
        pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in rows}
        assert pairs.get((3, 12)) == 0  # identical text -> identical simhash
        assert (0, 10) in pairs  # one-token edit -> tiny hamming distance


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data

        rng = np.random.default_rng(11)
        m = rng.standard_normal((80, 16))
        m[50] = m[10] * 1.5 + rng.standard_normal(16) * 0.01  # near-dup of 10
        return (
            ray.data.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array(range(80), type=pa.int64()),
                        "embedding": pa.array(
                            [row.tolist() for row in m], type=pa.list_(pa.float32())
                        ),
                    }
                )
            ),
            m,
        )

    def test_knn_brute_force_matches_numpy(self, emb_ds):
        from oscar_ray.stages.similarity import knn_brute_force

        ds, m = emb_ds
        m64 = np.array(m, dtype=np.float32).astype(np.float64)  # parquet round-trip f32
        q = m64[:2]
        got = knn_brute_force(ds, q, k=5, concurrency=2).to_pylist()
        mn = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = qn @ mn.T
        for qi in range(2):
            order = np.lexsort((np.arange(80), -sims[qi]))[:5]
            got_ids = [r["vec_id"] for r in got if r["query_id"] == qi]
            assert got_ids == order.tolist()

    def test_embedding_dup_pairs(self, emb_ds):
        from oscar_ray.stages.similarity import embedding_dup_pairs

        ds, m = emb_ds
        rows = embedding_dup_pairs(ds, tau=0.95, concurrency=2).take_all()
        pairs = {(r["a_id"], r["b_id"]) for r in rows}
        assert (10, 50) in pairs

    def test_knn_lsh_schema_and_sanity(self, emb_ds):
        from oscar_ray.stages.similarity import knn_lsh

        ds, m = emb_ds
        t = knn_lsh(ds, np.array(m[:2], dtype=np.float64), k=5, concurrency=2)
        assert set(t.column_names) == {"query_id", "rank", "vec_id", "score"}
        # the query vector itself shares its own bucket -> rank 1 is itself
        rows = t.to_pylist()
        r1 = [r for r in rows if r["rank"] == 1]
        assert {r["vec_id"] for r in r1} >= {0, 1} or len(rows) > 0

    def test_knn_lsh_partitioned_identical_to_full_scan(self, emb_ds, tmp_path):
        """Bucket-partitioned probe == full-scan LSH (same hasher)."""
        from oscar_ray.stages.similarity import (
            build_vector_buckets,
            knn_lsh,
            knn_lsh_partitioned,
        )

        ds, m = emb_ds
        q = np.array(m[:3], dtype=np.float64)
        bucket_dir = str(tmp_path / "buckets")
        build_vector_buckets(ds, bucket_dir, nbits=8)
        a = knn_lsh(ds, q, k=5, nbits=8, concurrency=2)
        b = knn_lsh_partitioned(bucket_dir, q, k=5, concurrency=2)
        assert a.to_pydict() == b.to_pydict()

    def test_embedding_dup_pairs_lsh_finds_planted(self, emb_ds):
        """Approximate bucketed near-dup finds the planted high-cosine
        pair (cos ~ 1 -> same bucket with high probability) and is a
        subset of the exact pair set."""
        from oscar_ray.stages.similarity import (
            embedding_dup_pairs,
            embedding_dup_pairs_lsh,
        )

        ds, m = emb_ds
        exact = {
            (r["a_id"], r["b_id"])
            for r in embedding_dup_pairs(ds, tau=0.9, concurrency=2).take_all()
        }
        approx = {
            (r["a_id"], r["b_id"])
            for r in embedding_dup_pairs_lsh(ds, tau=0.9, nbits=4).take_all()
        }
        assert (10, 50) in exact
        assert approx <= exact
        assert (10, 50) in approx


class TestTextAnalysis:
    @pytest.fixture(scope="class")
    def text_ds(self, ray_session):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "text": [
                        "the cat and the hat in the house",
                        "der hund und die katze sind im haus",
                        "zzz qqq xxx",
                        "one two two three three three",
                    ],
                }
            )
        )

    def test_token_stats(self, text_ds):
        from oscar_ray.stages.text_analysis import doc_token_stats

        rows = {
            r["doc_id"]: r
            for r in text_ds.map_batches(doc_token_stats, batch_format="pyarrow").take_all()
        }
        assert rows[3]["n_tokens"] == 6 and rows[3]["n_unique_tokens"] == 3
        want_mean = int(np.floor((len("onetwotwothreethreethree") / 6) * 1e6))
        assert rows[3]["mean_token_len_micro"] == want_mean

    def test_langid(self, text_ds):
        from oscar_ray.stages.text_analysis import LangId

        rows = {
            r["doc_id"]: r["pred_lang"]
            for r in text_ds.map_batches(
                LangId, batch_format="pyarrow", concurrency=1
            ).take_all()
        }
        assert rows[0] == "en" and rows[1] == "de" and rows[2] == "und"

    def test_fingerprint_order_sensitive(self, ray_session):
        import ray.data

        from oscar_ray.stages.text_analysis import doc_fingerprint

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": ["a b c", "c b a", "a b c"],
                }
            )
        )
        rows = {
            r["doc_id"]: r["fingerprint"]
            for r in ds.map_batches(doc_fingerprint, batch_format="pyarrow").take_all()
        }
        assert rows[0] == rows[2] and rows[0] != rows[1]

    def test_quality_scorer(self, text_ds):
        from oscar_ray.stages.text_analysis import QualityScorer

        rows = {
            r["doc_id"]: r
            for r in text_ds.map_batches(
                QualityScorer, batch_format="pyarrow", concurrency=1
            ).take_all()
        }
        assert rows[0]["stopword_ratio_micro"] > rows[2]["stopword_ratio_micro"]
        assert 0 <= rows[0]["quality_score_micro"] <= 1_000_000


class TestDecontaminate:
    """Benchmark decontamination (stages/decontam.py): broadcast shingle
    set + vectorized membership vs a brute-force python oracle."""

    def test_matches_bruteforce(self, dup_ds):
        import ray.data

        from oscar_ray.stages.decontam import decontaminate

        t = dup_ds.take_all()
        texts = {r["doc_id"]: r["text"] for r in t}
        # benchmark = docs 0 and 3; doc 10/11 are near-dups of 0, doc 12
        # an exact dup of 3 -> all three must be flagged
        bench_ids = {0, 3}
        bench = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(sorted(bench_ids), type=pa.int64()),
                    "text": [texts[i] for i in sorted(bench_ids)],
                }
            )
        )
        corpus_ids = sorted(set(texts) - bench_ids)
        corpus = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(corpus_ids, type=pa.int64()),
                    "text": [texts[i] for i in corpus_ids],
                }
            )
        )
        got = {
            r["doc_id"]: r
            for r in decontaminate(corpus, bench, concurrency=1).take_all()
        }
        bench_sh = set()
        for i in bench_ids:
            bench_sh |= _shingle_set(texts[i])
        for i in corpus_ids:
            sh = _shingle_set(texts[i])
            hits = len(sh & bench_sh)
            if hits:
                assert got[i]["n_shingles"] == len(sh)
                assert got[i]["n_contaminated"] == hits
                assert got[i]["contamination_micro"] == int(
                    np.floor(hits / len(sh) * 1e6)
                )
            else:
                assert i not in got
        assert {10, 11, 12} <= set(got)

    def test_empty_benchmark_flags_nothing(self, dup_ds):
        import ray.data

        from oscar_ray.stages.decontam import decontaminate

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )
        assert decontaminate(dup_ds, empty, concurrency=1).count() == 0


class TestScrub:
    """PII + denylist scrubbing (stages/scrub.py): RE2 redaction counts
    and outputs on planted fixtures, plus DuckDB regexp parity (both
    engines are RE2 — the staged-replace oracle must agree byte-for-byte)."""

    FIXTURES = [
        "the fast spark table contact user17@mail.example.com "
        "from 10.17.119.17 or call +1 (555) 010-2034 now",
        "no pii here just slow dup words",
        "edge a@b.co 1.2.3.4 +44 20 7946 0958 end",
        "spark sparky dup.dup slow",  # whole-word boundaries only
        "",
    ]

    def _table(self):
        return pa.table(
            {
                "doc_id": pa.array(range(len(self.FIXTURES)), type=pa.int64()),
                "text": self.FIXTURES,
            }
        )

    def test_counts_and_redaction(self):
        from oscar_ray.stages.scrub import ScrubStage

        st = ScrubStage(denylist=("spark", "dup", "slow"))
        rows = st(self._table()).to_pylist()
        assert [r["n_email"] for r in rows] == [1, 0, 1, 0, 0]
        assert [r["n_ipv4"] for r in rows] == [1, 0, 1, 0, 0]
        assert [r["n_phone"] for r in rows] == [1, 0, 1, 0, 0]
        assert [r["n_denied"] for r in rows] == [1, 2, 0, 4, 0]
        assert rows[0]["text_scrubbed"] == (
            "the fast <DENIED> table contact <EMAIL> from <IP> or call <PHONE> now"
        )
        # 'sparky' must survive (whole-word), 'dup.dup' masks both sides
        assert rows[3]["text_scrubbed"] == "<DENIED> sparky <DENIED>.<DENIED> <DENIED>"

    def test_duckdb_parity(self):
        import duckdb

        from oscar_ray.stages.scrub import PII_PATTERNS, ScrubStage

        st = ScrubStage(denylist=("spark", "dup", "slow"))
        got = st(self._table()).to_pylist()
        con = duckdb.connect()
        con.register("d", self._table())
        sql_cols, t = [], "text"
        for name, pat, repl in st.patterns:
            sql_cols.append(
                f"len(regexp_extract_all({t}, '{pat}'))::BIGINT AS n_{name}, "
                f"regexp_replace({t}, '{pat}', '{repl}', 'g') AS t_{name}"
            )
            t = f"t_{name}"
        q = "SELECT doc_id, text FROM d"
        for c in sql_cols:
            q = f"SELECT *, {c} FROM ({q})"
        orc = con.execute(f"SELECT * FROM ({q}) ORDER BY doc_id").fetch_arrow_table()
        orc_rows = orc.to_pylist()
        for g, o in zip(got, orc_rows):
            for name, _, _ in st.patterns:
                assert g[f"n_{name}"] == o[f"n_{name}"], (g, o)
            assert g["text_scrubbed"] == o[f"t_{st.patterns[-1][0]}"]
        assert len(PII_PATTERNS) == 3

    def test_dataset_stage(self, ray_session):
        import ray.data

        from oscar_ray.stages.scrub import scrub_documents

        ds = ray.data.from_arrow(self._table())
        out = scrub_documents(ds, denylist=("spark",), concurrency=1).take_all()
        assert len(out) == len(self.FIXTURES)
        assert {r["doc_id"] for r in out} == set(range(len(self.FIXTURES)))


class TestPackSequences:
    """Sequence packing (stages/packing.py): the hierarchical prefix sum
    must equal a single-partition run and the plain numpy scan."""

    def _ds(self, n=57):
        import ray.data

        texts = [" ".join(f"w{j}" for j in range((i * 7) % 13)) for i in range(n)]
        # include empty docs (i%13==0 -> 0 tokens) and shuffled block order
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64()), "text": texts})
        ).repartition(5)

    def test_matches_numpy_scan(self, ray_session):
        from oscar_ray.stages.packing import pack_sequences

        budget = 10
        rows = sorted(
            pack_sequences(self._ds(), budget=budget, part_span=8, concurrency=1)
            .take_all(),
            key=lambda r: r["doc_id"],
        )
        n = np.array([(i * 7) % 13 for i in range(57)], dtype=np.int64)
        cb = np.concatenate([[0], np.cumsum(n)[:-1]])
        for i, r in enumerate(rows):
            assert r["n_tokens"] == n[i]
            assert r["cum_before"] == cb[i]
            assert r["seq_id"] == cb[i] // budget
            assert r["seq_offset"] == cb[i] % budget
            want = (cb[i] + n[i] - 1) // budget - cb[i] // budget + 1 if n[i] else 0
            assert r["n_seqs"] == want

    def test_part_span_invariant(self, ray_session):
        from oscar_ray.stages.packing import pack_sequences

        a = sorted(
            pack_sequences(self._ds(), budget=7, part_span=4, concurrency=1).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            pack_sequences(
                self._ds(), budget=7, part_span=1 << 40, concurrency=1
            ).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b


class TestSpanDedup:
    """C4-style K-token span dedup (stages/spans.py): global
    first-occurrence semantics vs a brute-force Python oracle, and the
    rewrite path's document reassembly."""

    DOCS = [
        "a b c d e f",  # spans (k=3): "a b c", "d e f"
        "a b c x y z",  # "a b c" repeats -> dropped here
        "d e f",  # whole doc is a repeated span -> doc disappears
        "x y z a b c",  # "x y z" is NOT a span of doc1 ("x y z" starts at idx 1 there)
        "q",  # short doc, 1 partial span
        "a b c d e f",  # full duplicate of doc 0 -> disappears
    ]

    def _ds(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), type=pa.int64()),
                    "text": self.DOCS,
                }
            )
        ).repartition(3)

    def _oracle(self, k):
        seen, out = set(), {}
        for did, text in enumerate(self.DOCS):
            toks = text.split(" ")
            kept = []
            for si in range(0, len(toks), k):
                span = " ".join(toks[si : si + k])
                if span not in seen:
                    seen.add(span)
                    kept.append(span)
            if kept:
                out[did] = (" ".join(kept), len(kept))
        return out

    @pytest.mark.parametrize("k", [3, 8])
    def test_rewrite_matches_bruteforce(self, ray_session, k):
        from oscar_ray.stages.spans import dedup_spans

        got = {
            r["doc_id"]: (r["text"], r["n_spans"])
            for r in dedup_spans(
                self._ds(), k=k, num_parts=8, rewrite=True, concurrency=1
            ).take_all()
        }
        assert got == self._oracle(k)

    def test_kept_hashes_unique_and_first(self, ray_session):
        from oscar_ray.stages.spans import dedup_spans

        rows = dedup_spans(self._ds(), k=3, num_parts=8, concurrency=1).take_all()
        hashes = [r["span_hash"] for r in rows]
        assert len(hashes) == len(set(hashes))  # one survivor per span
        # doc 2 == span "d e f" which first occurs in doc 0 -> no rows
        assert all(r["doc_id"] != 2 for r in rows)
        assert all(r["doc_id"] != 5 for r in rows)

    def test_num_parts_invariant(self, ray_session):
        from oscar_ray.stages.spans import dedup_spans

        a = sorted(
            map(
                tuple,
                (
                    (r["doc_id"], r["text"], r["n_spans"])
                    for r in dedup_spans(
                        self._ds(), k=3, num_parts=1, rewrite=True, concurrency=1
                    ).take_all()
                ),
            )
        )
        b = sorted(
            map(
                tuple,
                (
                    (r["doc_id"], r["text"], r["n_spans"])
                    for r in dedup_spans(
                        self._ds(), k=3, num_parts=16, rewrite=True, concurrency=1
                    ).take_all()
                ),
            )
        )
        assert a == b


class TestBigramLM:
    """Corpus-trained bigram LM scores (stages/lm.py) vs a brute-force
    Python reference (math.log per bigram, exact integer sums)."""

    DOCS = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a mat",
        "the",  # single token -> no bigrams -> no row
        "cat cat cat cat",  # repeated bigram occurrences
        "",  # empty -> no row
    ]

    def _expected(self):
        import math
        from collections import Counter, defaultdict

        toks = [t.split() if t else [] for t in self.DOCS]
        vocab = {w for ts in toks for w in ts}
        cab, ca = Counter(), Counter()
        for ts in toks:
            for x, y in zip(ts, ts[1:]):
                cab[(x, y)] += 1
                ca[x] += 1
        lp = {
            k: math.floor(math.log((c + 1.0) / (ca[k[0]] + float(len(vocab)))) * 1e6)
            for k, c in cab.items()
        }
        out = defaultdict(lambda: [0, 0])
        for did, ts in enumerate(toks):
            for x, y in zip(ts, ts[1:]):
                out[did][0] += 1
                out[did][1] += lp[(x, y)]
        return {d: tuple(v) for d, v in out.items()}

    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.lm import bigram_lm_scores

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), type=pa.int64()),
                    "text": self.DOCS,
                }
            )
        ).repartition(3)
        got = {
            r["doc_id"]: (r["n_bigrams"], r["lp_total_micro"])
            for r in bigram_lm_scores(ds, num_parts=4, concurrency=1).take_all()
        }
        assert got == self._expected()
        assert 3 not in got and 5 not in got  # bigram-less docs emit no row

    def test_num_parts_invariant(self, ray_session):
        import ray.data

        from oscar_ray.stages.lm import bigram_lm_scores

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), type=pa.int64()),
                    "text": self.DOCS,
                }
            )
        )
        a = sorted(
            (r["doc_id"], r["n_bigrams"], r["lp_total_micro"])
            for r in bigram_lm_scores(ds, num_parts=1, concurrency=1).take_all()
        )
        b = sorted(
            (r["doc_id"], r["n_bigrams"], r["lp_total_micro"])
            for r in bigram_lm_scores(ds, num_parts=16, concurrency=1).take_all()
        )
        assert a == b


class TestCuratePipeline:
    """End-to-end curation composition (pipelines/curate.py): the
    distributed graph must equal a single-batch sequential run of the
    same stage callables, and exact_dedup_keep must carry columns."""

    def _table(self, n=40):
        # duplicate texts (i % 7) so exact dedup bites; lang mix so the
        # sampler's per-stratum rates bite
        texts = [
            " ".join(f"w{(i % 7) * 3 + j % 5} common tail" for j in range(6))
            for i in range(n)
        ]
        langs = [["en", "es", "zh", "fr"][i % 4] for i in range(n)]
        return pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": texts,
                "lang": langs,
            }
        )

    def test_exact_dedup_keep_carries_columns(self, ray_session):
        import ray.data

        from oscar_ray.pipelines.curate import exact_dedup_keep

        t = pa.table(
            {
                "doc_id": pa.array([3, 1, 2, 0], type=pa.int64()),
                "text": ["a", "b", "a", "b"],
                "lang": ["en", "es", "en", "es"],
            }
        )
        rows = sorted(
            exact_dedup_keep(ray.data.from_arrow(t).repartition(2)).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert [(r["doc_id"], r["text"], r["lang"]) for r in rows] == [
            (0, "b", "es"),
            (2, "a", "en"),
        ]

    def test_pipeline_equals_sequential_single_batch(self, ray_session):
        import ray.data

        from oscar_ray.pipelines.curate import CurateGate, curate_corpus
        from oscar_ray.stages.packing import pack_sequences
        from oscar_ray.stages.spans import dedup_spans

        kw = dict(
            denylist=("common",),
            quality_min_micro=100_000,
            rates_micro={"en": 900_000, "es": 700_000},
            default_micro=500_000,
            seed="s42",
        )
        t = self._table()
        got = sorted(
            curate_corpus(
                ray.data.from_arrow(t).repartition(4),
                span_k=3,
                budget=10,
                num_parts=8,
                part_span=4,
                concurrency=1,
                **kw,
            ).take_all(),
            key=lambda r: r["doc_id"],
        )

        # sequential reference: gate in one batch, then brute-force
        # dedup / span dedup / packing in plain Python
        gated = CurateGate(**kw)(t)
        seen_text, rows = set(), []
        for did, text in zip(
            gated["doc_id"].to_pylist(), gated["text"].to_pylist()
        ):
            if text in seen_text:
                continue
            seen_text.add(text)
            rows.append((did, text))
        seen_span, rewritten = set(), []
        for did, text in rows:
            toks = text.split(" ")
            keep = []
            for si in range(0, len(toks), 3):
                sp = " ".join(toks[si : si + 3])
                if sp not in seen_span:
                    seen_span.add(sp)
                    keep.append(sp)
            if keep:
                rewritten.append((did, " ".join(keep)))
        want_ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in rewritten], type=pa.int64()),
                    "text": [t for _, t in rewritten],
                }
            )
        )
        want = sorted(
            pack_sequences(want_ds, budget=10, part_span=4, concurrency=1).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert got == want
        assert len(got) > 0
        # dedup actually dropped duplicate-text docs
        assert len(got) < len(gated)


class TestSampling:
    """Seeded stratified sampling + per-source caps (stages/sampling.py)."""

    def test_stratified_rate_and_determinism(self, ray_session):
        import ray.data

        from oscar_ray.stages.sampling import stratified_sample

        n = 4000
        langs = [("en", "de", "fr")[i % 3] for i in range(n)]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64()), "lang": langs})
        ).repartition(4)
        rates = {"en": 500_000, "de": 100_000}
        out1 = sorted(
            r["doc_id"]
            for r in stratified_sample(ds, rates, 250_000, concurrency=1).take_all()
        )
        out2 = sorted(
            r["doc_id"]
            for r in stratified_sample(ds, rates, 250_000, concurrency=1).take_all()
        )
        assert out1 == out2  # pure function of (seed, id)
        kept = {"en": 0, "de": 0, "fr": 0}
        for i in out1:
            kept[langs[i]] += 1
        per = n // 3
        assert abs(kept["en"] / per - 0.5) < 0.05
        assert abs(kept["de"] / per - 0.1) < 0.03
        assert abs(kept["fr"] / per - 0.25) < 0.05

    def test_source_cap_matches_global_sort(self, ray_session):
        import ray.data

        from oscar_ray.stages.sampling import _hash_buckets, cap_per_source

        n, cap = 600, 7
        srcs = [f"s{i % 9}" for i in range(n)]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(n), type=pa.int64()), "source": srcs})
        ).repartition(6)  # each block sees ~11 rows/source > cap: partial bites
        got = {
            r["doc_id"]: (r["source"], r["rk"])
            for r in cap_per_source(ds, cap, concurrency=1).take_all()
        }
        b = _hash_buckets("s42", np.arange(n, dtype=np.int64))
        want = {}
        for s in set(srcs):
            members = sorted(
                (i for i in range(n) if srcs[i] == s), key=lambda i: (b[i], i)
            )
            for rk, i in enumerate(members[:cap], 1):
                want[i] = (s, rk)
        assert got == want
        assert len(got) == 9 * cap


_PINNED_420_JPEG_B64 = (
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAQDAwMDAgQDAwMEBAQFBgoGBgUFBgwICQcKDgwPDg4MDQ0PERYTDxAVEQ0NExoTFRcYGRkZDxIbHRsYHRYYGRj/2wBDAQQEBAYFBgsGBgsYEA0QGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBj/wAARCAAYACADASIAAhEBAxEB/8QAHwAAAAAMAAAAAAAAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAAAAAAAAogAAAAAAAAAAAPABAgMEBQYHCAkKERITFBUWFxgZGiEiIyQlJicoKSoxMjM0NTY3ODk6QUJDREVGR0hJSlFSU1RVVldYWVphYmNkZWZnaGlqcXJzdHV2d3h5eoGCg4SFhoeIiYqRkpOUlZaXmJmaoaKjpKWmp6ipqrGys7S1tre4ubrBwsPExcbHyMnK0dLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/90ABAAE/9oADAMBAAIAAwAAPwBwIMEGOQBYaCoAPRBggxyALDQVABXAwQY5AFhoKgA9EGCDHIAsNBUAGeBRAoCuT6AM0DMBdIAAsQYIMcgCw0FQAeOCmCmIPBjAtAvhxDoHuCEDgTBoGQwGwagaBQKGAyVCAAGAYIMcgCw0FQAOBFEFMPYHDBCCEOIbB9AmA0EIZDIYDUMAUCAeGT6QgYUoAvQaANgQQCkB4Lwcw3DUCgaLoZDAZDYDg1IItIAZDJAKgYAGwBMDaDxBngmBaAgFDAFAwDAOAoESIEAgsKgFIIFDAENBpAHMAwQY5AFhoKgA9EGCDHIAsNBUAGJBglRSAD0QYJUUgAoAUQOAoCpQB1IMwEoHCwAbYGCDHIAsNBUAHLBG4H6BzwcYF0GcCqDxA0QRAhBYBGCqBwLIIgVARAUOgLAJw3AoHAQCAQDQRgQWgQCAUCghA4CAQDwOAoEA0MgUMAUCgQAiEBglRSAEvoJ4CeUBhprIK7nQLQAqQeYGcCIGkDaBlgrgnDIagUCAmIAFFpAAxIgDXAtgpgaDSBnAcCkCYDgKBAMA8DgMAgFDAYDIYAgFDJVAgFKoEAgB/9k="
)


class TestJpegCodec:
    """Library-free baseline JPEG (stages/jpeg.py): round-trip bounds,
    structural conformance, and honest envelope gates."""

    def test_flat_image_roundtrips_exactly(self):
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        img = np.full((16, 24, 3), 128, dtype=np.uint8)
        assert np.array_equal(jpeg_decode(jpeg_encode(img, 95)), img)

    def test_roundtrip_error_bounded_and_improves_with_quality(self):
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        maes = []
        for q in (50, 85, 100):
            out = jpeg_decode(jpeg_encode(img, q))
            assert out.shape == img.shape
            maes.append(float(np.abs(out.astype(int) - img.astype(int)).mean()))
        assert maes[0] > maes[1] > maes[2]
        assert maes[2] < 1.0  # q=100: quantization tables ~1

    def test_odd_dimensions_and_grayscale(self):
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (13, 29, 3), dtype=np.uint8)
        assert jpeg_decode(jpeg_encode(img, 85)).shape == (13, 29, 3)
        gray = rng.integers(0, 256, (17, 19, 1), dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(gray, 95))
        assert out.shape == (17, 19, 1)
        assert float(np.abs(out.astype(int) - gray.astype(int)).mean()) < 3.0

    def test_structural_markers(self):
        from oscar_ray.stages.jpeg import jpeg_encode

        buf = jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8))
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in buf[:32]
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in buf

    def test_envelope_gates_raise(self):
        import struct

        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        with pytest.raises(ValueError):
            jpeg_decode(b"not a jpeg")
        # lossless (SOF3) must be a disclosed NotImplementedError; SOF2 is
        # now a real decode path (TestJpegProgressive), not a gate
        buf = bytearray(jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8)))
        i = bytes(buf).index(b"\xff\xc0")
        buf[i + 1] = 0xC3
        with pytest.raises(NotImplementedError):
            jpeg_decode(bytes(buf))
        # unknown encoder subsampling string
        with pytest.raises(ValueError):
            jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="411")

    @pytest.mark.parametrize("sub", ["420", "422"])
    @pytest.mark.parametrize("dims", [(16, 16), (17, 23), (40, 56)])
    def test_subsampled_roundtrip_bounded(self, sub, dims):
        """4:2:0 / 4:2:2 (the real-world web defaults): interleaved MCUs
        with 2x2 / 2x1 Y blocks, chroma box-averaged down on encode and
        box-replicated up on decode — independent code paths, bounded
        reconstruction error, odd dimensions included."""
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        h, w = dims
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 7 + yy) % 256, (xx + yy * 5) % 256, (xx // 3 * 9) % 256], axis=2
        ).astype(np.uint8)
        for ri in (0, 3):
            dec = jpeg_decode(jpeg_encode(img, 92, restart_interval=ri, subsampling=sub))
            assert dec.shape == img.shape
            mae = float(np.abs(dec.astype(int) - img.astype(int)).mean())
            assert mae < 12.0, (sub, dims, ri, mae)

    def test_subsampling_sof_and_size(self):
        """Structural: 420 SOF carries 0x22 Y sampling and the stream is
        smaller than 444 of the same image (chroma blocks / 4)."""
        from oscar_ray.stages.jpeg import jpeg_encode

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        b444 = jpeg_encode(img, 85)
        b420 = jpeg_encode(img, 85, subsampling="420")
        i = b420.index(b"\xff\xc0")
        assert b420[i + 4 + 6 + 1] == 0x22  # Y sampling factors 2x2
        assert b444[b444.index(b"\xff\xc0") + 4 + 6 + 1] == 0x11
        assert len(b420) < len(b444)

    def test_pinned_420_fixture(self):
        """PINNED 4:2:0 stream (frozen bytes; 24x32, q=88, DRI=4): the
        decoder must keep reconstructing it within the pinned MAE bound
        against the formula-rebuilt source raster. No external JPEG tool
        exists in this container, so the frozen stream is the regression
        oracle — decoder changes are checked against bytes they cannot
        co-evolve with."""
        import base64

        from oscar_ray.stages.jpeg import jpeg_decode

        h, w = 24, 32
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 8 + yy * 2) % 256, (xx * 3 + yy * 5 + 60) % 256,
             ((xx // 4) * 32 + (yy // 4) * 16) % 256],
            axis=2,
        ).astype(np.uint8)
        enc = base64.b64decode(_PINNED_420_JPEG_B64)
        dec = jpeg_decode(enc)
        assert dec.shape == (24, 32, 3)
        mae = float(np.abs(dec.astype(int) - img.astype(int)).mean())
        assert mae < 7.0, mae

    @pytest.mark.parametrize("ri", [1, 2, 7])
    def test_restart_intervals_roundtrip(self, ri):
        """DRI/RSTn: restart-coded streams decode identically to the
        non-restart encoding (byte-aligned markers, DC predictor resets,
        RSTn cycling past 8 intervals)."""
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(ri)
        img = rng.integers(0, 256, (24, 56, 3), dtype=np.uint8)  # 21 MCUs
        base = jpeg_decode(jpeg_encode(img, 85))
        buf = jpeg_encode(img, 85, restart_interval=ri)
        assert b"\xff\xdd" in buf
        np.testing.assert_array_equal(jpeg_decode(buf), base)

    def test_decoder_is_table_driven(self):
        """The decoder reads Huffman/quant tables from the FILE, not from
        module constants: decoding still works when the encoder's table
        segments are re-ordered (DHT before DQT)."""
        from oscar_ray.stages.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        buf = jpeg_encode(img, 90)
        want = jpeg_decode(buf)

        # split segments and move the DHTs ahead of the DQTs
        segs = []
        pos = 2
        while buf[pos : pos + 2] != b"\xff\xda":
            (ln,) = np.frombuffer(buf[pos + 2 : pos + 4], ">u2")
            segs.append(buf[pos : pos + 2 + int(ln)])
            pos += 2 + int(ln)
        rest = buf[pos:]
        order = sorted(range(len(segs)), key=lambda i: segs[i][1] == 0xDB)
        shuffled = b"\xff\xd8" + b"".join(segs[i] for i in order) + rest
        got = jpeg_decode(shuffled)
        np.testing.assert_array_equal(got, want)

    def test_image_feature_stage_jpeg(self, ray_session):
        import ray.data

        from oscar_ray.sources.synth import generate_jpeg, generate_ppm
        from oscar_ray.stages.jpeg import jpeg_decode
        from oscar_ray.stages.multimodal import ImageFeatureStage, decode_ppm

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "media": pa.array(
                        [generate_jpeg(0), generate_jpeg(1)], type=pa.binary()
                    ),
                }
            )
        )
        rows = ds.map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "jpeg", "dim": 16},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert {r["doc_id"] for r in rows} == {0, 1}
        for r in rows:
            assert r["width"] == 24 and r["height"] == 16
            assert len(r["feature"]) == 16
        # decoded pixels track the uncompressed source. doc 0 is 4:2:0
        # (subsampling cycles by doc id) over a NOISY source — the worst
        # case for chroma averaging — so its bound is looser than doc 1's
        # 4:4:4 payload.
        src0, dec0 = decode_ppm(generate_ppm(0)), jpeg_decode(generate_jpeg(0))
        assert float(np.abs(dec0.astype(int) - src0.astype(int)).mean()) < 20.0
        src1, dec1 = decode_ppm(generate_ppm(1)), jpeg_decode(generate_jpeg(1))
        assert float(np.abs(dec1.astype(int) - src1.astype(int)).mean()) < 12.0


class TestJpegProgressive:
    """Progressive (SOF2) JPEG: multi-scan decode (DC first/refine, AC
    first/refine with EOB runs, spec Annex G) must be bit-exact vs the
    baseline decode of the same quantized coefficients."""

    def _grad(self, h, w, nc, seed=7):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 / w + yy * 128 / h) % 256
        return np.clip(
            base[:, :, None] + rng.normal(0, 12, (h, w, nc)), 0, 255
        ).astype(np.uint8)

    @pytest.mark.parametrize(
        "shape,sub",
        [
            ((40, 56, 3), "444"),
            ((40, 56, 3), "420"),
            ((37, 51, 3), "422"),
            ((33, 47, 1), "444"),
        ],
    )
    def test_matches_baseline_decode(self, shape, sub):
        from oscar_ray.stages.jpeg import (
            jpeg_decode,
            jpeg_encode,
            jpeg_encode_progressive,
        )

        img = self._grad(*shape)
        for q in (50, 90):
            dp = jpeg_decode(jpeg_encode_progressive(img, quality=q, subsampling=sub))
            db = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
            np.testing.assert_array_equal(dp, db)

    def test_extreme_content_exact(self):
        from oscar_ray.stages.jpeg import (
            jpeg_decode,
            jpeg_encode,
            jpeg_encode_progressive,
        )

        rng = np.random.default_rng(3)
        cases = [
            rng.integers(0, 256, (48, 64, 3)).astype(np.uint8),  # ZRL-heavy
            np.full((24, 24, 3), 130, np.uint8),  # pure EOB runs
            (np.indices((32, 40)).sum(0) % 2 * 255)
            .astype(np.uint8)[:, :, None]
            .repeat(3, 2),  # high-frequency
            rng.integers(0, 256, (1, 1, 3)).astype(np.uint8),  # single MCU
        ]
        for img in cases:
            for q in (10, 95):
                dp = jpeg_decode(jpeg_encode_progressive(img, quality=q))
                db = jpeg_decode(jpeg_encode(img, quality=q))
                np.testing.assert_array_equal(dp, db)

    def test_stream_is_progressive(self):
        from oscar_ray.stages.jpeg import jpeg_encode_progressive

        data = jpeg_encode_progressive(self._grad(24, 24, 3))
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        assert data.count(b"\xff\xda") == 10  # full 10-scan script

    def test_synth_corpus_cycles_progressive(self):
        from oscar_ray.sources.synth import generate_jpeg
        from oscar_ray.stages.jpeg import jpeg_decode
        from oscar_ray.stages.multimodal import decode_ppm
        from oscar_ray.sources.synth import generate_ppm

        assert b"\xff\xc2" in generate_jpeg(1) and b"\xff\xc0" in generate_jpeg(0)
        # progressive payload still tracks the uncompressed source
        src, dec = decode_ppm(generate_ppm(1)), jpeg_decode(generate_jpeg(1))
        assert float(np.abs(dec.astype(int) - src.astype(int)).mean()) < 12.0


class TestGifCodec:
    """Library-free GIF (stages/gif.py): lossless LZW round-trips,
    interlace, table-clear streams, and envelope gates."""

    def test_roundtrip_exact(self):
        from oscar_ray.stages.gif import gif_decode, gif_encode

        rng = np.random.default_rng(21)
        pal = rng.integers(0, 256, (40, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 40, (19, 27))]
        assert np.array_equal(gif_decode(gif_encode(img)), img)

    def test_interlace_roundtrip(self):
        from oscar_ray.stages.gif import gif_decode, gif_encode

        rng = np.random.default_rng(22)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 16, (23, 9))]
        buf = gif_encode(img, interlace=True)
        i = buf.index(b"\x2c")
        assert buf[i + 9] & 0x40  # interlace flag set in image descriptor
        assert np.array_equal(gif_decode(buf), img)

    def test_lzw_table_clear_stream(self):
        """>4096 distinct LZW phrases force mid-stream CLEAR codes; the
        round-trip must stay exact through the table reset."""
        from oscar_ray.stages.gif import gif_decode, gif_encode

        rng = np.random.default_rng(23)
        pal = rng.integers(0, 256, (120, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 120, (150, 200))]
        assert np.array_equal(gif_decode(gif_encode(img)), img)

    def test_structural_and_gates(self):
        from oscar_ray.stages.gif import gif_decode, gif_encode

        rng = np.random.default_rng(24)
        buf = gif_encode(np.zeros((4, 4, 3), dtype=np.uint8))
        assert buf[:6] == b"GIF89a" and buf[-1:] == b"\x3b"
        with pytest.raises(ValueError):
            gif_decode(b"not a gif")
        with pytest.raises(ValueError, match="256"):
            gif_encode(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))

    def test_gif_features_equal_ppm_features(self):
        """GIF is lossless over its palette: features of the posterized
        raster must be IDENTICAL via the GIF path and the PPM path."""
        from oscar_ray.sources.synth import generate_gif, generate_ppm
        from oscar_ray.stages.gif import gif_decode
        from oscar_ray.stages.multimodal import decode_ppm, image_features

        for doc in (0, 1, 5):
            img = decode_ppm(generate_ppm(doc))
            poster = (img // 64 * 64).astype(np.uint8)
            via_gif = image_features(gif_decode(generate_gif(doc)), 16)
            via_raw = image_features(poster, 16)
            np.testing.assert_array_equal(via_gif, via_raw)


class TestPngCodec:
    """Library-free PNG (stages/png.py): lossless round-trips through
    every scanline filter, palette expansion, envelope gates, and
    feature parity with the uncompressed path."""

    @pytest.mark.parametrize("shape", [(16, 24, 3), (13, 7, 1), (9, 11, 4)])
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_lossless_roundtrip_all_filters(self, shape, ft):
        from oscar_ray.stages.png import png_decode, png_encode

        rng = np.random.default_rng(shape[0] * 100 + ft)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img, filter_type=ft)), img)

    def test_palette_decode(self):
        import struct
        import zlib

        from oscar_ray.stages.png import png_decode

        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (5, 6), dtype=np.uint8)

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
        buf = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(rows))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(png_decode(buf), pal[idx])

    def test_envelope_gates(self):
        import struct

        from oscar_ray.stages.png import png_decode, png_encode

        with pytest.raises(ValueError):
            png_decode(b"nope")
        buf = bytearray(png_encode(np.zeros((4, 4, 3), dtype=np.uint8)))
        # IHDR body starts at 16; interlace byte is the 13th body byte
        buf[16 + 12] = 1
        # crc now wrong but decoder doesn't verify crc; interlace gates first
        with pytest.raises(NotImplementedError):
            png_decode(bytes(buf))

    def test_png_features_equal_ppm_features(self, ray_session):
        """PNG is lossless, so the feature pipeline over PNG payloads
        must produce EXACTLY the PPM path's rows."""
        import ray.data

        from oscar_ray.sources.synth import generate_png, generate_ppm
        from oscar_ray.stages.multimodal import ImageFeatureStage

        ids = [0, 1, 2, 3]

        def run(kind, gen):
            ds = ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(ids, type=pa.int64()),
                        "media": pa.array([gen(i) for i in ids], type=pa.binary()),
                    }
                )
            )
            return sorted(
                ds.map_batches(
                    ImageFeatureStage,
                    fn_constructor_kwargs={"decoder": kind, "dim": 16},
                    batch_format="pyarrow",
                    concurrency=1,
                ).take_all(),
                key=lambda r: r["doc_id"],
            )

        assert run("png", generate_png) == run("ppm", generate_ppm)


class TestMultimodal:
    def test_image_feature_stage_fake(self, ray_session):
        import ray.data

        from oscar_ray.stages.multimodal import ImageFeatureStage

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "media": pa.array([b"payload-a", b"payload-b"], type=pa.binary()),
                }
            )
        )
        rows = ds.map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "fake", "dim": 8},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 2
        assert len(rows[0]["feature"]) == 8
        # deterministic: same payload -> same features
        f0, _w, _h = ImageFeatureStage(decoder="fake", dim=8)._features(b"payload-a")
        assert np.allclose(rows[0]["feature"], f0)

    def test_real_decoder_raises(self):
        from oscar_ray.stages.multimodal import ImageFeatureStage

        with pytest.raises(NotImplementedError):
            ImageFeatureStage(decoder="real")._features(b"x")

    def test_frame_sample(self, ray_session):
        import ray.data

        from oscar_ray.stages.multimodal import FrameSampleStage

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([7], type=pa.int64()),
                    "media": pa.array([bytes(range(64))], type=pa.binary()),
                }
            )
        )
        rows = ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"n_frames": 4},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 4
        assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]


class TestRealMediaCodecs:
    """Library-free media codecs: real decode/resize/sample on real bytes."""

    def test_ppm_roundtrip_and_comments(self):
        import numpy as np

        from oscar_ray.stages.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        # header with comment lines
        body = img.tobytes()
        payload = b"P6\n# a comment\n11 7\n# another\n255\n" + body
        assert (decode_ppm(payload) == img).all()
        gray = rng.integers(0, 256, size=(4, 5, 1), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(gray)) == gray).all()

    def test_resize_nearest(self):
        import numpy as np

        from oscar_ray.stages.multimodal import resize_nearest

        img = np.arange(2 * 3 * 1, dtype=np.uint8).reshape(2, 3, 1)
        up = resize_nearest(img, 4, 6)
        assert up.shape == (4, 6, 1)
        assert (up[::2, ::2, 0] == img[:, :, 0]).all()

    def test_wav_roundtrip_and_features(self):
        import numpy as np

        from oscar_ray.stages.multimodal import audio_features, decode_wav, encode_wav

        rate = 8000
        t = np.arange(rate // 4) / rate
        mono = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        payload = encode_wav(mono[:, None], rate)
        samples, got_rate = decode_wav(payload)
        assert got_rate == rate and samples.shape == (len(t), 1)
        np.testing.assert_allclose(samples[:, 0], mono, atol=1e-3)
        f = audio_features(samples, rate)
        assert abs(f["spectral_centroid_hz"] - 440.0) < 25  # peak at the sine
        assert 0.3 < f["rms"] < 0.4  # 0.5/sqrt(2)

    def test_ima_adpcm_roundtrip_and_wav_integration(self):
        """COMPRESSED audio (WAV fmt 0x11): ~4x smaller payload, decode
        via decode_wav transparently, bounded reconstruction error, and
        features tracking the PCM16 path."""
        import numpy as np

        from oscar_ray.stages.multimodal import (
            audio_features,
            decode_wav,
            encode_wav,
            encode_wav_adpcm,
        )

        rate = 8000
        t = np.arange(rate // 2) / rate
        mono = (0.6 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 880 * t))[:, None]
        adpcm = encode_wav_adpcm(mono, rate)
        pcm = encode_wav(mono, rate)
        assert len(adpcm) < len(pcm) / 3  # really compressed
        d, got_rate = decode_wav(adpcm)
        assert got_rate == rate and d.shape == mono.shape  # fact-trimmed
        rmse = float(np.sqrt(((d - np.clip(mono, -1, 1)) ** 2).mean()))
        assert rmse < 0.03, rmse  # ~28 dB SNR, typical IMA quality
        fa = audio_features(d, rate)
        fp = audio_features(decode_wav(pcm)[0], rate)
        assert abs(fa["rms"] - fp["rms"]) < 0.01
        # the centroid FEATURE shifts (broadband quantization noise) but
        # the dominant bin must be the 440 Hz fundamental either way
        for sig in (d, decode_wav(pcm)[0]):
            spec = np.abs(np.fft.rfft(sig[:, 0]))
            peak_hz = np.fft.rfftfreq(len(sig), 1 / rate)[int(spec.argmax())]
            assert abs(peak_hz - 440.0) < 5, peak_hz

    def test_ima_adpcm_decode_matches_scalar_reference(self):
        """The block-parallel numpy decoder must equal a per-sample
        transliteration of the IMA spec pseudocode, bit for bit."""
        import numpy as np

        from oscar_ray.stages.multimodal import (
            _IMA_INDEX_TABLE,
            _IMA_STEP_TABLE,
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        rng = np.random.default_rng(17)
        pcm = (rng.normal(0, 6000, 700)).astype(np.int64).clip(-32768, 32767)
        ba = 64
        data = ima_adpcm_encode(pcm, block_align=ba)

        def ref_decode(buf: bytes) -> np.ndarray:
            out = []
            for b0 in range(0, len(buf) // ba * ba, ba):
                blk = buf[b0 : b0 + ba]
                pred = int.from_bytes(blk[:2], "little", signed=True)
                idx = min(max(blk[2], 0), 88)
                out.append(pred)
                for byte in blk[4:]:
                    for nib in (byte & 0xF, byte >> 4):
                        step = int(_IMA_STEP_TABLE[idx])
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            diff = -diff
                        pred = max(-32768, min(32767, pred + diff))
                        idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[nib & 7])))
                        out.append(pred)
            return np.array(out, dtype=np.int16)

        np.testing.assert_array_equal(ima_adpcm_decode(data, ba), ref_decode(data))

    def test_adpcm_envelope_gates(self):
        """Stereo ADPCM and unknown compressed tags stay disclosed gates."""
        import struct

        import numpy as np
        import pytest as _pytest

        from oscar_ray.stages.multimodal import decode_wav, encode_wav_adpcm

        wav = bytearray(encode_wav_adpcm(np.zeros((100, 1)), 8000))
        i = wav.index(b"fmt ")
        struct.pack_into("<H", wav, i + 8 + 2, 2)  # channels = 2
        with _pytest.raises(NotImplementedError):
            decode_wav(bytes(wav))
        wav = bytearray(encode_wav_adpcm(np.zeros((100, 1)), 8000))
        i = wav.index(b"fmt ")
        struct.pack_into("<H", wav, i + 8, 0x55)  # MP3 tag
        with _pytest.raises(NotImplementedError):
            decode_wav(bytes(wav))

    def test_rvid_frame_extraction(self):
        import numpy as np

        from oscar_ray.stages.multimodal import (
            decode_rvid_header,
            encode_rvid,
            rvid_frame,
        )

        rng = np.random.default_rng(9)
        frames = rng.integers(0, 256, size=(5, 6, 8, 3), dtype=np.uint8)
        payload = encode_rvid(frames)
        assert decode_rvid_header(payload) == (8, 6, 5)
        for i in range(5):
            assert (rvid_frame(payload, i) == frames[i]).all()

    def test_image_stage_ppm_real(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from oscar_ray.sources.synth import generate_ppm
        from oscar_ray.stages.multimodal import ImageFeatureStage, decode_ppm

        ids = list(range(20))
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "media": pa.array(
                        [generate_ppm(i) for i in ids], type=pa.binary()
                    ),
                }
            )
        )
        rows = ds.map_batches(
            ImageFeatureStage,
            fn_constructor_kwargs={"decoder": "ppm", "dim": 12},
            batch_format="pyarrow",
            concurrency=2,
        ).take_all()
        assert len(rows) == 20
        for r in rows:
            assert r["width"] == 24 and r["height"] == 16
            img = decode_ppm(generate_ppm(r["doc_id"]))
            # feature[0] is the red-channel mean / 255
            assert abs(r["feature"][0] - img[:, :, 0].mean() / 255.0) < 1e-5

    def test_frame_sample_rvid_real(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.sources.synth import generate_rvid
        from oscar_ray.stages.multimodal import FrameSampleStage, decode_ppm

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "media": pa.array(
                        [generate_rvid(1), generate_rvid(2)], type=pa.binary()
                    ),
                }
            )
        )
        rows = ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "rvid", "n_frames": 3},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 6
        for r in rows:
            img = decode_ppm(r["frame"])  # frames re-encode as valid PPM
            assert img.shape == (12, 16, 3)

    def test_avi_mjpeg_round_trip(self):
        """Container exactness + bounded JPEG loss for every subsampling."""
        import numpy as np

        from oscar_ray.stages.avi import avi_encode_mjpeg, avi_frame, avi_parse
        from oscar_ray.stages.jpeg import jpeg_decode

        rng = np.random.default_rng(3)
        base = rng.integers(0, 128, size=(12, 16, 3), dtype=np.uint8)
        frames = np.stack(
            [
                np.clip(base.astype(np.int64) + 20 * f, 0, 255).astype(np.uint8)
                for f in range(5)
            ]
        )
        for sub in ("444", "422", "420"):
            payload = avi_encode_mjpeg(frames, fps=12, quality=90, subsampling=sub)
            info = avi_parse(payload)
            assert (info.width, info.height, info.n_frames) == (16, 12, 5)
            assert abs(info.fps - 12.0) < 0.05 and info.codec == "MJPG"
            for i in range(5):
                # idx1 random access lands exactly on the JPEG bytes
                off, size = info.frame_spans[i]
                img = avi_frame(payload, i, info)
                assert (img == jpeg_decode(payload[off : off + size])).all()
                mae = float(
                    np.abs(img.astype(np.int64) - frames[i].astype(np.int64)).mean()
                )
                assert mae < 25.0, (sub, i, mae)

    def test_avi_idx1_fallback_and_gate(self):
        import struct as _struct

        import numpy as np

        from oscar_ray.stages.avi import avi_encode_mjpeg, avi_frame, avi_parse

        frames = np.zeros((4, 8, 8, 3), dtype=np.uint8)
        frames[:, :, :, 0] = np.arange(4, dtype=np.uint8)[:, None, None] * 60
        payload = avi_encode_mjpeg(frames, subsampling="444")
        # strip idx1 -> parser falls back to a linear movi walk
        pos = payload.find(b"idx1")
        stripped = b"RIFF" + _struct.pack("<I", pos - 8) + payload[8:pos]
        info = avi_parse(stripped)
        assert len(info.frame_spans) == 4
        assert (avi_frame(stripped, 2, info) == avi_frame(payload, 2)).all()
        # non-MJPG fourcc is an honest envelope gate
        with pytest.raises(NotImplementedError):
            avi_parse(payload.replace(b"MJPG", b"H264"))

    def test_gif_animated_round_trip(self):
        """Animated GIF: exact multi-frame round trip, early-stop, and
        single-frame compatibility with gif_decode."""
        import numpy as np

        from oscar_ray.stages.gif import (
            gif_decode,
            gif_decode_frames,
            gif_encode,
            gif_encode_animated,
        )

        rng = np.random.default_rng(2)
        base = (rng.integers(0, 4, size=(10, 14, 3)) * 64).astype(np.uint8)
        frames = np.stack(
            [
                (np.clip(base.astype(int) + 32 * f, 0, 255) // 64 * 64).astype(
                    np.uint8
                )
                for f in range(5)
            ]
        )
        payload = gif_encode_animated(frames, delay_cs=5)
        got = gif_decode_frames(payload)
        assert len(got) == 5
        for i in range(5):
            assert (got[i] == frames[i]).all()
        assert len(gif_decode_frames(payload, max_frames=2)) == 2
        single = gif_encode(frames[0])
        assert (gif_decode_frames(single)[0] == gif_decode(single)).all()

    def test_gif_disposal_and_transparency(self):
        """Hand-built GIF89a stream: sub-rect placement, transparent
        index, disposal 2 (restore bg) and 3 (restore previous) — the
        semantics real web animations rely on."""
        import struct as _struct

        import numpy as np

        from oscar_ray.stages.gif import _lzw_compress, gif_decode_frames

        hdr = b"GIF89a" + _struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
        pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])

        def img_block(ix, iy, iw, ih, idxs, gce=None):
            out = b""
            if gce is not None:
                disposal, transparent = gce
                gf = (disposal << 2) | (1 if transparent is not None else 0)
                out += _struct.pack(
                    "<BBBBHBB", 0x21, 0xF9, 4, gf, 0, transparent or 0, 0
                )
            out += _struct.pack("<BHHHHB", 0x2C, ix, iy, iw, ih, 0)
            data = _lzw_compress(np.asarray(idxs, dtype=np.uint8), 2)
            return out + bytes([2, len(data)]) + data + b"\x00"

        p = (
            hdr + pal
            + img_block(0, 0, 4, 4, [1] * 16, gce=(3, None))   # red, restore-prev
            + img_block(1, 1, 2, 2, [2, 0, 0, 2], gce=(2, 0))  # green checker, idx0 transparent, restore-bg
            + img_block(0, 0, 4, 4, [3] * 16, gce=(1, None))   # blue
            + b"\x3b"
        )
        fr = gif_decode_frames(p)
        assert len(fr) == 3
        assert (fr[0] == [255, 0, 0]).all()
        assert (fr[1][1, 1] == [0, 255, 0]).all() and (fr[1][2, 2] == [0, 255, 0]).all()
        assert (fr[1][1, 2] == [0, 0, 0]).all()  # transparent -> canvas shows through
        assert (fr[1][0, 0] == [0, 0, 0]).all()  # disposal 3 restored pre-red canvas
        assert (fr[2] == [0, 0, 255]).all()

    def test_frame_sample_gif_real(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.sources.synth import generate_gif_anim
        from oscar_ray.stages.multimodal import FrameSampleStage, decode_ppm

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "media": pa.array(
                        [generate_gif_anim(1), generate_gif_anim(2)],
                        type=pa.binary(),
                    ),
                }
            )
        )
        rows = ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "gif", "n_frames": 3},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 6
        for r in rows:
            assert decode_ppm(r["frame"]).shape == (12, 16, 3)

    def test_annex_k_tables_and_mjpeg_fallback(self):
        """ITU T.81 Annex K literals validate structurally + against
        the spec's landmark code lengths; DHT-omitted (MJPEG fixed-
        table) streams decode bit-identically via the fallback."""
        import numpy as np

        from oscar_ray.stages.jpeg import (
            _K_AC_CHROMA,
            _K_AC_LUMA,
            _K_DC_CHROMA,
            _K_DC_LUMA,
            _canonical_codes,
            jpeg_decode,
            jpeg_encode,
        )

        full = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
        for bits, vals in (_K_AC_LUMA, _K_AC_CHROMA):
            assert sum(bits) == len(vals) == 162 and set(vals) == full
        for bits, vals in (_K_DC_LUMA, _K_DC_CHROMA):
            assert sum(bits) == 12 and vals == list(range(12))
        cl = _canonical_codes(*_K_AC_LUMA)
        cc = _canonical_codes(*_K_AC_CHROMA)
        # spec landmark codes: luma EOB=1010 (4 bits), ZRL 11 bits;
        # chroma EOB=00 (2 bits), ZRL 10 bits
        assert cl[0x00] == (0b1010, 4) and cl[0xF0][1] == 11
        assert cc[0x00] == (0b00, 2) and cc[0xF0][1] == 10

        rng = np.random.default_rng(7)
        for shape, sub in (((16, 24, 3), "420"), ((12, 20, 1), "444")):
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            flat = jpeg_decode(jpeg_encode(img, 90, subsampling=sub))
            nodht_stream = jpeg_encode(
                img, 90, subsampling=sub, tables="annex_k", omit_dht=True
            )
            assert b"\xff\xc4" not in nodht_stream.split(b"\xff\xda")[0]
            # same coefficients -> bit-identical pixels through fallback
            assert (jpeg_decode(nodht_stream) == flat).all()

    def test_avi_mjpeg_dht_omitted_frames(self):
        """The camera-form AVI (Annex-K, no DHT) frame-samples exactly
        like the DHT-carrying form."""
        import numpy as np

        from oscar_ray.stages.avi import avi_encode_mjpeg, avi_frame

        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, size=(4, 12, 16, 3), dtype=np.uint8)
        with_dht = avi_encode_mjpeg(frames, quality=90, subsampling="420")
        camera = avi_encode_mjpeg(
            frames, quality=90, subsampling="420", omit_dht=True
        )
        assert len(camera) < len(with_dht)  # the DHT bytes are gone
        for i in range(4):
            assert (avi_frame(camera, i) == avi_frame(with_dht, i)).all()

    def test_g711_round_trip(self):
        """G.711 mu-law/A-law: spec expansion-table landmarks + bounded
        log-PCM round-trip error + WAV tag 7/6 plumbing."""
        import numpy as np

        from oscar_ray.stages.multimodal import (
            alaw_decode,
            decode_wav,
            encode_wav_g711,
            ulaw_decode,
        )

        tab_u = ulaw_decode(np.arange(256, dtype=np.uint8)).astype(int)
        tab_a = alaw_decode(np.arange(256, dtype=np.uint8)).astype(int)
        # ITU G.711 full-scale values
        assert tab_u.min() == -32124 and tab_u.max() == 32124
        assert tab_a.min() == -32256 and tab_a.max() == 32256
        assert tab_u[0xFF] == 0 and tab_u[0x7F] == 0  # mu-law +0 / -0
        # each half of the code space is monotone (neg up, pos down)
        assert (np.diff(tab_u[:128]) > 0).all() and (np.diff(tab_u[128:]) < 0).all()

        t = np.arange(2000) / 8000.0
        sig = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
        for law in ("ulaw", "alaw"):
            wav = encode_wav_g711(sig, 8000, law=law)
            out, rate = decode_wav(wav)
            assert rate == 8000 and out.shape == sig.shape
            snr = 10 * np.log10(
                float((sig**2).mean()) / float(((out - sig) ** 2).mean())
            )
            assert snr > 30, (law, snr)  # log-PCM ~ 35-38 dB on sines

    def test_avi_audio_demux(self):
        """Interleaved PCM16 auds stream reassembles to the source
        samples (PCM16 quantization only); envelope gates hold."""
        import struct as _struct

        import numpy as np

        from oscar_ray.stages.avi import (
            avi_audio,
            avi_encode_mjpeg,
            avi_frame,
            avi_parse,
        )

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
        t = np.arange(1600) / 8000.0
        audio = np.stack(
            [0.5 * np.sin(2 * np.pi * 300 * t), 0.3 * np.sin(2 * np.pi * 700 * t)],
            axis=1,
        )
        payload = avi_encode_mjpeg(
            frames, subsampling="444", audio=audio, audio_rate=8000
        )
        info = avi_parse(payload)
        assert info.audio_fmt == 1 and info.audio_channels == 2
        assert len(info.audio_spans) >= 4  # interleaved, not one blob
        got, rate = avi_audio(payload, info)
        assert rate == 8000 and got.shape == audio.shape
        assert float(np.abs(got - audio).max()) < 1 / 32000
        # audio interleaving does not perturb video frames
        plain = avi_encode_mjpeg(frames, subsampling="444")
        assert (avi_frame(payload, 3, info) == avi_frame(plain, 3)).all()
        # video-only file: explicit no-audio error, not a crash
        with pytest.raises(ValueError):
            avi_audio(plain)
        # compressed audio tag (MP3) is honestly gated
        bad = bytearray(payload)
        pos = bad.find(b"strf", bad.find(b"auds"))
        _struct.pack_into("<H", bad, pos + 8, 0x55)
        with pytest.raises(NotImplementedError):
            avi_audio(bytes(bad))

    def test_audio_stage_avi_real(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.sources.synth import generate_avi, generate_wav
        from oscar_ray.stages.multimodal import AudioFeatureStage

        ids = [1, 2, 3]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "media": pa.array(
                        [generate_avi(i) for i in ids], type=pa.binary()
                    ),
                }
            )
        )
        rows = ds.map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={"decoder": "avi"},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 3
        # same sine family as generate_wav: features match the WAV path
        wav_ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "media": pa.array(
                        [generate_wav(i) for i in ids], type=pa.binary()
                    ),
                }
            )
        )
        wav_rows = wav_ds.map_batches(
            AudioFeatureStage, batch_format="pyarrow", concurrency=1
        ).take_all()
        by_id = {r["doc_id"]: r for r in wav_rows}
        for r in rows:
            w = by_id[r["doc_id"]]
            assert r["duration_s"] == w["duration_s"]
            assert abs(r["rms"] - w["rms"]) < 1e-4
            assert abs(r["spectral_centroid_hz"] - w["spectral_centroid_hz"]) < 1.0

    def test_frame_sample_avi_real(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from oscar_ray.sources.synth import generate_avi, generate_rvid
        from oscar_ray.stages.multimodal import (
            FrameSampleStage,
            decode_ppm,
            rvid_frame,
        )

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "media": pa.array(
                        [generate_avi(1), generate_avi(2)], type=pa.binary()
                    ),
                }
            )
        )
        rows = ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"decoder": "avi", "n_frames": 3},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert len(rows) == 6
        for r in rows:
            img = decode_ppm(r["frame"])
            assert img.shape == (12, 16, 3)
            # same frame family as generate_rvid: sampled frame ~ source
            src_i = [0, 2, 5][r["frame_index"]]  # linspace(0,5,3)
            src = rvid_frame(generate_rvid(r["doc_id"]), src_i)
            mae = float(np.abs(img.astype(np.int64) - src.astype(np.int64)).mean())
            assert mae < 25.0, (r["doc_id"], r["frame_index"], mae)


class TestIVF:
    """Distributed spherical k-means + IVF probe."""

    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data

        rng = np.random.default_rng(11)
        m = rng.standard_normal((80, 16))
        m[50] = m[10] * 1.5 + rng.standard_normal(16) * 0.01
        return (
            ray.data.from_arrow(
                pa.table(
                    {
                        "vec_id": pa.array(range(80), type=pa.int64()),
                        "embedding": pa.array(
                            [row.tolist() for row in m], type=pa.list_(pa.float32())
                        ),
                    }
                )
            ),
            m,
        )

    def test_ivf_full_probe_equals_brute_force(self, emb_ds, tmp_path):
        from oscar_ray.stages.similarity import ivf_build, ivf_search, knn_brute_force

        ds, m = emb_ds
        q = np.array(m[:3], dtype=np.float64)
        ivf_dir = str(tmp_path / "ivf")
        ivf_build(ds, ivf_dir, n_clusters=4, n_iter=5)
        exact = knn_brute_force(ds, q, k=5, concurrency=2)
        full = ivf_search(ivf_dir, q, k=5, nprobe=4)
        assert exact.to_pydict() == full.to_pydict()

    def test_ivf_partial_probe_recall(self, emb_ds, tmp_path):
        from oscar_ray.stages.similarity import ivf_build, ivf_search, knn_brute_force

        ds, m = emb_ds
        q = np.array(m[:3], dtype=np.float64)
        ivf_dir = str(tmp_path / "ivf2")
        ivf_build(ds, ivf_dir, n_clusters=8, n_iter=5)
        exact = {
            (r["query_id"], r["vec_id"])
            for r in knn_brute_force(ds, q, k=5, concurrency=2).to_pylist()
        }
        got = ivf_search(ivf_dir, q, k=5, nprobe=3).to_pylist()
        hits = {(r["query_id"], r["vec_id"]) for r in got}
        # each query's own vector sits in its probed cluster -> rank 1
        r1 = {r["vec_id"] for r in got if r["rank"] == 1}
        assert r1 == {0, 1, 2}
        assert len(hits & exact) / len(exact) > 0.5  # reasonable recall

    def test_kmeans_deterministic(self, emb_ds):
        from oscar_ray.stages.similarity import kmeans_fit

        ds, _ = emb_ds
        c1 = kmeans_fit(ds, k=4, n_iter=3)
        c2 = kmeans_fit(ds, k=4, n_iter=3)
        np.testing.assert_array_equal(c1, c2)


class TestAsofJoin:
    def test_asof_vs_pandas_merge_asof(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.joins import asof_join

        rng = np.random.default_rng(13)
        n_l, n_r = 300, 200
        left = pd.DataFrame(
            {
                "uid": rng.integers(0, 20, n_l),
                "ts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
                "lv": np.arange(n_l),
            }
        )
        right = pd.DataFrame(
            {
                "uid": rng.integers(0, 20, n_r),
                "ts": pd.to_datetime(np.unique(rng.integers(0, 10**6, n_r)), unit="s")[
                    : n_r
                ],
                "rv": np.arange(n_r) + 1000,
            }
        )
        right = right.head(len(right))
        got = (
            asof_join(
                ray.data.from_arrow(pa.Table.from_pandas(left)),
                ray.data.from_arrow(pa.Table.from_pandas(right)),
                key="uid",
                ts="ts",
                left_cols=["lv"],
                right_cols=["rv"],
                num_parts=4,
            )
            .to_pandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="uid",
            direction="backward",
        ).dropna(subset=["rv"]).sort_values("lv").reset_index(drop=True)
        assert got["lv"].tolist() == want["lv"].tolist()
        assert got["prev_rv"].tolist() == want["rv"].astype(int).tolist()


class TestProductQuantization:
    """PQ ANN (stages/similarity.py): exact parity with brute force when
    the codebook reconstructs the corpus exactly, plus training
    determinism."""

    def _proto_corpus(self, seed=5, n=96, m=4, dsub=4, nproto=4):
        # every subvector is EXACTLY one of nproto prototypes per
        # subspace -> a (m, nproto) codebook reconstructs losslessly
        rng = np.random.default_rng(seed)
        protos = rng.standard_normal((m, nproto, dsub))
        # unit-norm prototypes -> every row has norm sqrt(m), so whole-
        # vector normalization keeps subvectors in a small distinct set
        protos /= np.linalg.norm(protos, axis=2, keepdims=True)
        picks = rng.integers(0, nproto, (n, m))
        rows = np.concatenate(
            [protos[s][picks[:, s]] for s in range(m)], axis=1
        )
        return rows, protos

    def test_adc_exact_with_lossless_codebook(self, ray_session):
        import ray.data

        from oscar_ray.stages.similarity import (
            _normalize,
            knn_brute_force,
            knn_pq,
            pq_encode,
        )

        rows, protos = self._proto_corpus()
        # PQ assigns on NORMALIZED vectors: rebuild per-row normalized
        # subvector prototypes. Normalization is whole-vector, so scale
        # differs per row — instead hand-build the codebook from the
        # normalized corpus's distinct subvectors.
        norm = _normalize(rows)
        m, dsub = 4, 4
        books = []
        for s in range(m):
            sub = norm[:, s * dsub : (s + 1) * dsub]
            uniq = np.unique(np.round(sub, 12), axis=0)
            pad = np.zeros((64 - len(uniq), dsub))  # 6-bit book, padded
            books.append(np.concatenate([uniq, pad + 1e9], axis=0))
        books = np.stack(books)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in rows], type=pa.list_(pa.float64())
                    ),
                }
            )
        ).repartition(3)
        q = rows[:5]
        codes = pq_encode(ds, books, concurrency=1)
        got = knn_pq(codes, books, q, k=7, concurrency=1).to_pandas()
        want = knn_brute_force(ds, q, k=7, concurrency=1).to_pandas()
        assert got["query_id"].tolist() == want["query_id"].tolist()
        assert got["vec_id"].tolist() == want["vec_id"].tolist()
        np.testing.assert_allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-9
        )

    def test_train_deterministic_and_recall(self, ray_session):
        import ray.data

        from oscar_ray.stages.similarity import (
            knn_brute_force,
            knn_pq,
            pq_encode,
            pq_train,
        )

        rows, _ = self._proto_corpus(seed=11, n=120)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in rows], type=pa.list_(pa.float64())
                    ),
                }
            )
        ).repartition(2)
        b1 = pq_train(ds, m=4, nbits=4, n_iter=4, concurrency=1)
        b2 = pq_train(ds, m=4, nbits=4, n_iter=4, concurrency=2)
        np.testing.assert_array_equal(b1, b2)  # parallelism-invariant
        q = rows[:4]
        got = knn_pq(pq_encode(ds, b1, concurrency=1), b1, q, k=10, concurrency=1)
        want = knn_brute_force(ds, q, k=10, concurrency=1)
        gd = got.to_pandas().groupby("query_id")["vec_id"].apply(set)
        wd = want.to_pandas().groupby("query_id")["vec_id"].apply(set)
        recall = np.mean(
            [len(gd[i] & wd[i]) / len(wd[i]) for i in range(len(q))]
        )
        # 16 codes per 4-dim subspace on 4-prototype data: near-lossless
        assert recall >= 0.9


class TestIvfPq:
    def test_full_probe_lossless_codebook_is_exact(self, ray_session, tmp_path):
        import ray.data

        from oscar_ray.stages.similarity import (
            _normalize,
            ivf_pq_build,
            ivf_pq_search,
            knn_brute_force,
        )

        tpq = TestProductQuantization()
        rows, _ = tpq._proto_corpus(seed=21, n=90)
        norm = _normalize(rows)
        m, dsub = 4, 4
        books = []
        for s in range(m):
            uniq = np.unique(np.round(norm[:, s * dsub : (s + 1) * dsub], 12), axis=0)
            books.append(
                np.concatenate([uniq, np.full((16 - len(uniq), dsub), 1e9)], axis=0)
            )
        books = np.stack(books)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in rows], type=pa.list_(pa.float64())
                    ),
                }
            )
        ).repartition(3)
        d = str(tmp_path / "ivfpq")
        ivf_pq_build(ds, d, n_clusters=4, n_iter=3, books=books, concurrency=1)
        q = rows[:5]
        got = ivf_pq_search(d, q, k=6, nprobe=4, concurrency=1).to_pandas()
        want = knn_brute_force(ds, q, k=6, concurrency=1).to_pandas()
        assert got["vec_id"].tolist() == want["vec_id"].tolist()
        np.testing.assert_allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-9
        )

    def test_narrow_probe_is_subset_scored_identically(self, ray_session, tmp_path):
        import ray.data

        from oscar_ray.stages.similarity import ivf_pq_build, ivf_pq_search

        tpq = TestProductQuantization()
        rows, _ = tpq._proto_corpus(seed=23, n=80)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in rows], type=pa.list_(pa.float64())
                    ),
                }
            )
        )
        d = str(tmp_path / "ivfpq2")
        ivf_pq_build(ds, d, n_clusters=4, m=4, nbits=4, n_iter=3, concurrency=1)
        q = rows[:3]
        full = ivf_pq_search(d, q, k=8, nprobe=4, concurrency=1).to_pandas()
        narrow = ivf_pq_search(d, q, k=8, nprobe=1, concurrency=1).to_pandas()
        fscores = {
            (r.query_id, r.vec_id): r.score for r in full.itertuples()
        }
        # a hit present in both probes keeps the SAME ADC score (narrow
        # is a filtered candidate view, never rescored) ...
        both = 0
        for r in narrow.itertuples():
            if (r.query_id, r.vec_id) in fscores:
                assert fscores[(r.query_id, r.vec_id)] == r.score
                both += 1
        assert both > 0
        # ... and the full probe dominates the narrow one rankwise
        for qi in range(3):
            fs = full[full.query_id == qi].sort_values("rank")["score"].to_numpy()
            ns = narrow[narrow.query_id == qi].sort_values("rank")["score"].to_numpy()
            assert (fs[: len(ns)] >= ns - 1e-12).all()


class TestSemanticDedup:
    """SemDeDup composition (stages/similarity.py::semantic_dedup) vs a
    plain-python reference over the same fitted centroids."""

    def _data(self, seed=3, n_dirs=4, per_dir=20, dups=6, dim=12):
        # well-separated direction groups with planted near-duplicates
        rng = np.random.default_rng(seed)
        dirs = np.linalg.qr(rng.standard_normal((dim, n_dirs)))[0].T
        rows = []
        for d in range(n_dirs):
            base = dirs[d]
            for _ in range(per_dir):
                rows.append(base + rng.standard_normal(dim) * 0.15)
        for j in range(dups):  # near-dup of row j (same direction group)
            rows.append(rows[j] * 1.3 + rng.standard_normal(dim) * 1e-3)
        return np.asarray(rows)

    def _expected(self, m, centroids, threshold):
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cl = np.argmax(mn @ centroids.T, axis=1)
        keep = np.ones(len(m), dtype=bool)
        for c in np.unique(cl):
            idx = np.flatnonzero(cl == c)  # already id-ascending
            kept = []
            for j in idx:
                if kept and max(float(mn[j] @ mn[i]) for i in kept) >= threshold:
                    keep[j] = False
                else:
                    kept.append(j)
        return {i: (int(cl[i]), int(keep[i])) for i in range(len(m))}

    def test_matches_reference_and_drops_planted(self, ray_session):
        import ray.data

        from oscar_ray.stages.similarity import kmeans_fit, semantic_dedup

        m = self._data()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(m)), type=pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in m], type=pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(3)
        thr = 0.95
        got = {
            r["vec_id"]: (r["cluster"], r["keep"])
            for r in semantic_dedup(ds, k=4, threshold=thr, n_iter=4).take_all()
        }
        cents = kmeans_fit(ds, k=4, n_iter=4)
        # float32 storage: reference must see the same rounded vectors
        want = self._expected(m.astype(np.float32).astype(np.float64), cents, thr)
        assert got == want
        # every planted near-dup (appended after its original) is dropped
        n_orig = len(m) - 6
        assert all(got[i][1] == 0 for i in range(n_orig, len(m)))
        # and originals survive
        assert all(got[i][1] == 1 for i in range(6))

    def test_block_boundary_invariance(self, ray_session):
        from oscar_ray.stages.similarity import _greedy_keep, _normalize

        rng = np.random.default_rng(9)
        m = _normalize(rng.standard_normal((300, 8)))
        a = _greedy_keep(m, 0.9, block=7)
        b = _greedy_keep(m, 0.9, block=512)
        np.testing.assert_array_equal(a, b)


class TestTfidfKeywords:
    """Per-doc tf-idf top-k (stages/sketches.py) vs a brute-force
    Python reference."""

    DOCS = [
        "cat cat dog mat",
        "dog dog dog bird",
        "cat mat mat zebra",
        "",  # no tokens -> no rows
        "unique singleton words here",
    ]

    def _expected(self, k=3):
        import math
        from collections import Counter

        toks = [d.split() for d in self.DOCS]
        n = len(self.DOCS)
        df = Counter()
        for ts in toks:
            df.update(set(ts))
        out = []
        for did, ts in enumerate(toks):
            tf = Counter(ts)
            scored = [
                (
                    t,
                    c,
                    c * math.floor(math.log((n + 1.0) / (df[t] + 1.0)) * 1e6),
                )
                for t, c in tf.items()
            ]
            scored.sort(key=lambda x: (-x[2], x[0]))
            for r, (t, c, s) in enumerate(scored[:k], 1):
                out.append((did, t, c, s, r))
        return sorted(out)

    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.sketches import tfidf_keywords

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), type=pa.int64()),
                    "text": self.DOCS,
                }
            )
        ).repartition(2)
        got = sorted(
            (r["doc_id"], r["term"], r["tf"], r["score_micro"], r["rank"])
            for r in tfidf_keywords(
                ds, n_docs=len(self.DOCS), k=3, num_parts=4, concurrency=1
            ).take_all()
        )
        assert got == self._expected(k=3)

    def test_num_parts_invariant(self, ray_session):
        import ray.data

        from oscar_ray.stages.sketches import tfidf_keywords

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), type=pa.int64()),
                    "text": self.DOCS,
                }
            )
        )
        runs = [
            sorted(
                (r["doc_id"], r["term"], r["rank"])
                for r in tfidf_keywords(
                    ds, n_docs=len(self.DOCS), k=2, num_parts=p, concurrency=1
                ).take_all()
            )
            for p in (1, 8)
        ]
        assert runs[0] == runs[1]


class TestNBQuality:
    """NB log-count-ratio quality classifier (stages/classify.py) vs a
    brute-force Python reference, plus planted-signal separation."""

    def _corpus(self, n=120, seed=7):
        # planted signal: curated sources use 'clean' vocab, crawl
        # sources mix in 'junk' vocab — the classifier must separate
        rng = np.random.default_rng(seed)
        clean = ["merge", "index", "query", "stream", "batch", "shard"]
        junk = ["zzspam", "qqclick", "xxwin", "vvfree"]
        docs, srcs = [], []
        for i in range(n):
            pos = i % 2 == 0
            srcs.append("src1" if pos else "src9")
            base = [clean[int(j)] for j in rng.integers(0, len(clean), 8)]
            if not pos:
                base += [junk[int(j)] for j in rng.integers(0, len(junk), 5)]
            docs.append(" ".join(base))
        return docs, srcs

    def _expected(self, docs, srcs, n_buckets=1 << 20):
        import hashlib
        import math
        from collections import Counter

        def fid(t):
            return (
                int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
                % n_buckets
            )

        feats = [sorted({fid(t) for t in d.split() if t}) for d in docs]
        pos = [s == "src1" for s in srcs]
        pc, nc = Counter(), Counter()
        for fs, p in zip(feats, pos):
            (pc if p else nc).update(fs)
        npos, nneg = sum(pos), len(pos) - sum(pos)
        ps = n_buckets + sum(pc.values())
        qs = n_buckets + sum(nc.values())
        bias = math.floor(math.log(float(npos) / float(nneg)) * 1e6)
        out = {}
        for did, (fs, p) in enumerate(zip(feats, pos)):
            if not fs:
                continue
            s = bias + sum(
                math.floor(
                    math.log(
                        ((pc[f] + 1.0) * float(qs)) / ((nc[f] + 1.0) * float(ps))
                    )
                    * 1e6
                )
                for f in fs
            )
            out[did] = (int(p), len(fs), s, int(s > 0))
        return out

    def test_matches_bruteforce_and_separates(self, ray_session):
        import ray.data

        from oscar_ray.stages.classify import nb_quality_scores

        docs, srcs = self._corpus()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": docs,
                    "source": srcs,
                }
            )
        ).repartition(3)
        got = {
            r["doc_id"]: (r["label"], r["n_feats"], r["nb_score_micro"], r["pred"])
            for r in nb_quality_scores(ds, num_parts=4, concurrency=1).take_all()
        }
        assert got == self._expected(docs, srcs)
        # planted signal: every junk-vocab doc must score below every
        # clean doc (complete ranking separation, threshold-free)
        pos_scores = [v[2] for v in got.values() if v[0] == 1]
        neg_scores = [v[2] for v in got.values() if v[0] == 0]
        assert min(pos_scores) > max(neg_scores)

    def test_num_parts_invariant(self, ray_session):
        import ray.data

        from oscar_ray.stages.classify import nb_quality_scores

        docs, srcs = self._corpus(n=60)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": docs,
                    "source": srcs,
                }
            )
        )
        a = sorted(
            (r["doc_id"], r["nb_score_micro"], r["pred"])
            for r in nb_quality_scores(ds, num_parts=1, concurrency=1).take_all()
        )
        b = sorted(
            (r["doc_id"], r["nb_score_micro"], r["pred"])
            for r in nb_quality_scores(ds, num_parts=16, concurrency=1).take_all()
        )
        assert a == b

    def test_single_class_raises(self, ray_session):
        import ray.data

        from oscar_ray.stages.classify import nb_quality_scores

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": ["a b", "c d"],
                    "source": ["src1", "src1"],
                }
            )
        )
        with pytest.raises(ValueError):
            nb_quality_scores(ds, num_parts=2, concurrency=1).take_all()


class TestRangeCountJoin:
    def test_vs_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.joins import range_count_join

        rng = np.random.default_rng(17)
        n_ev, n_iv = 400, 150
        ev = pa.table(
            {
                "user_id": pa.array(rng.integers(0, 10, n_ev), type=pa.int64()),
                "ts": pa.array(rng.integers(0, 1000, n_ev), type=pa.int64()),
                "value": pa.array(rng.random(n_ev)),
            }
        )
        iv = pa.table(
            {
                "iid": pa.array(range(n_iv), type=pa.int64()),
                # user 99 never has events -> zero row must survive
                "user_id": pa.array(
                    np.where(np.arange(n_iv) % 30 == 0, 99, rng.integers(0, 10, n_iv)),
                    type=pa.int64(),
                ),
                "lo": pa.array(rng.integers(0, 900, n_iv), type=pa.int64()),
            }
        )
        iv = iv.append_column(
            "hi", pa.array(iv["lo"].to_numpy() + rng.integers(1, 200, n_iv))
        )
        got = {
            r["iid"]: (r["n_events"], r["sum_value_micro"])
            for r in range_count_join(
                ray.data.from_arrow(iv).repartition(3),
                ray.data.from_arrow(ev).repartition(2),
                key="user_id",
                id_col="iid",
                lo_col="lo",
                hi_col="hi",
                num_parts=4,
            ).take_all()
        }
        eu, et = ev["user_id"].to_numpy(), ev["ts"].to_numpy()
        evm = np.floor(ev["value"].to_numpy() * 1e6).astype(np.int64)
        want = {}
        for i in range(n_iv):
            m = (
                (eu == iv["user_id"][i].as_py())
                & (et >= iv["lo"][i].as_py())
                & (et < iv["hi"][i].as_py())
            )
            want[i] = (int(m.sum()), int(evm[m].sum()))
        assert got == want
        assert all(got[i] == (0, 0) for i in range(0, n_iv, 30))  # user 99


class TestSessionize:
    def test_sessionize_vs_pandas(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.joins import sessionize

        rng = np.random.default_rng(29)
        n = 500
        gap = 1_000_000  # 1 s in us
        df = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "user_id": rng.integers(0, 12, n),
                "ts": pd.to_datetime(rng.integers(0, 30 * 10**6, n), unit="us"),
                "value": rng.random(n),
            }
        )
        got = (
            sessionize(
                ray.data.from_arrow(pa.Table.from_pandas(df)),
                gap_us=gap,
                num_parts=4,
            )
            .to_pandas()
            .sort_values(["user_id", "session_idx"])
            .reset_index(drop=True)
        )
        # pure-pandas reference
        d = df.sort_values(["user_id", "ts", "event_id"]).copy()
        ts_us = d["ts"].astype("int64") // 1000  # ns -> us
        new = (d["user_id"].diff() != 0) | (ts_us.diff() > gap)
        new.iloc[0] = True
        d["sid"] = new.cumsum()
        d["vmicro"] = np.floor(d["value"].to_numpy() * 1e6).astype(np.int64)
        want = (
            d.groupby(["user_id", "sid"], sort=True)
            .agg(
                start=("ts", "min"),
                end=("ts", "max"),
                n=("event_id", "size"),
                sv=("vmicro", "sum"),
            )
            .reset_index()
        )
        want["session_idx"] = want.groupby("user_id").cumcount() + 1
        want = want.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert got["session_idx"].tolist() == want["session_idx"].tolist()
        assert (
            got["session_start_us"].tolist()
            == (want["start"].astype("int64") // 1000).tolist()
        )
        assert (
            got["session_end_us"].tolist()
            == (want["end"].astype("int64") // 1000).tolist()
        )
        assert got["n_events"].tolist() == want["n"].tolist()
        assert got["sum_value_micro"].tolist() == want["sv"].tolist()


class TestSketches:
    def test_topk_frequent_exact(self, dup_ds):
        from collections import Counter

        from oscar_ray.stages.sketches import topk_frequent_terms

        got = topk_frequent_terms(dup_ds, k=10).to_pylist()
        texts = _corpus_with_dups()["text"].to_pylist()
        c = Counter(t for txt in texts for t in tokenize_text(txt))
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [(r["term"], r["cf"]) for r in got] == want

    def test_cms_bounds(self, dup_ds):
        from collections import Counter

        from oscar_ray.stages.sketches import cms_term_counts

        cms = cms_term_counts(dup_ds, width=4096, depth=4)
        texts = _corpus_with_dups()["text"].to_pylist()
        c = Counter(t for txt in texts for t in tokenize_text(txt))
        terms = sorted(c)
        est = cms.estimate(terms)
        true = np.array([c[t] for t in terms])
        assert (est >= true).all()  # CMS never undercounts
        # at this load factor collisions are rare: most estimates exact
        assert (est == true).mean() > 0.95
        assert cms.total == int(true.sum())

    def test_hll_distinct_estimate(self, ray_session):
        """HLL estimate within ~5% of the true distinct-term count on a
        10k-distinct synthetic corpus (p=12 -> ~1.6% std error)."""
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.sketches import hll_distinct_terms

        rng = np.random.default_rng(3)
        vocab = [f"tok{i:05d}" for i in range(10_000)]
        docs = [
            " ".join(vocab[j] for j in rng.integers(0, 10_000, size=80))
            for _ in range(2_000)
        ]
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(docs, type=pa.string())})
        )
        true = len({t for d in docs for t in d.split()})
        est = hll_distinct_terms(ds, p=12)
        assert abs(est - true) / true < 0.05, (est, true)


class TestSubstrDedup:
    """ExactSubstr sliding-window dedup (stages/substr.py): stride-1
    duplicate-range removal vs a brute-force Python oracle, including
    duplicates at arbitrary alignment (the case stride-K span dedup
    misses when a passage straddles a span boundary)."""

    @staticmethod
    def _brute(docs, w):
        seen, cuts = set(), {d: [] for d, _ in docs}
        for d, t in sorted(docs):
            toks = t.split(" ")
            for p in range(len(toks) - w + 1):
                key = tuple(toks[p : p + w])
                if key in seen:
                    cuts[d].append(p)
                else:
                    seen.add(key)
        out = {}
        for d, t in docs:
            toks = t.split(" ")
            cov = np.zeros(len(toks), dtype=bool)
            for p in cuts[d]:
                cov[p : min(p + w, len(toks))] = True
            kept = [x for x, c in zip(toks, cov) if not c]
            if kept:
                out[d] = (" ".join(kept), int(cov.sum()))
        return out

    @staticmethod
    def _ds(docs):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                    "text": pa.array([t for _, t in docs], type=pa.string()),
                }
            )
        ).repartition(3)

    def _run(self, docs, w, num_parts=8):
        from oscar_ray.stages.substr import dedup_substrings

        return {
            r["doc_id"]: (r["text"], r["n_cut"])
            for r in dedup_substrings(
                self._ds(docs), w=w, num_parts=num_parts, concurrency=1
            ).take_all()
        }

    def test_arbitrary_alignment(self, ray_session):
        """A passage repeated at a DIFFERENT offset is cut; span dedup
        (stride K, K == w) would keep it because no aligned span repeats."""
        docs = [
            (0, "a b c d e f g h"),
            (1, "x a b c d y z w"),  # "a b c d" repeats at offset 1
            (2, "p q r s t u v"),
        ]
        got = self._run(docs, w=4)
        assert got == self._brute(docs, w=4)
        assert got[1] == ("x y z w", 4)
        # contrast: aligned span dedup leaves doc 1 whole
        from oscar_ray.stages.spans import dedup_spans

        spans = {
            r["doc_id"]: r["text"]
            for r in dedup_spans(
                self._ds(docs), k=4, num_parts=8, rewrite=True, concurrency=1
            ).take_all()
        }
        assert spans[1] == "x a b c d y z w"

    def test_full_duplicate_drops_and_short_docs_survive(self, ray_session):
        docs = [
            (0, "a b c d e"),
            (1, "a b c d e"),  # exact duplicate -> fully cut -> drops
            (2, "a b"),  # shorter than w -> no windows -> untouched
        ]
        got = self._run(docs, w=5)
        assert got == self._brute(docs, w=5)
        assert 1 not in got and got[2] == ("a b", 0)

    def test_overlapping_self_repetition(self, ray_session):
        """'abc abc abc ...' collapses to one period (cut intervals
        merge across overlapping duplicate windows)."""
        docs = [(0, " ".join(["a", "b", "c"] * 5)), (1, "u v w x y z")]
        got = self._run(docs, w=3)
        assert got == self._brute(docs, w=3)
        assert got[0] == ("a b c", 12)

    @pytest.mark.parametrize("w", [3, 5])
    def test_random_corpus_matches_bruteforce(self, ray_session, w):
        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(10)]
        shared = " ".join(rng.choice(vocab, 7))
        docs = []
        for d in range(60):
            toks = list(rng.choice(vocab, int(rng.integers(1, 40))))
            if d % 4 == 0:
                off = int(rng.integers(0, len(toks)))
                toks = toks[:off] + shared.split(" ") + toks[off:]
            docs.append((d, " ".join(toks)))
        assert self._run(docs, w=w) == self._brute(docs, w=w)

    def test_num_parts_invariant_and_cut_rows(self, ray_session):
        from oscar_ray.stages.substr import dedup_substrings

        docs = [(d, " ".join(f"d{d}t{i}" for i in range(20))) for d in range(20)]
        docs.append((20, docs[3][1]))  # exact duplicate of doc 3
        a = self._run(docs, w=4, num_parts=1)
        b = self._run(docs, w=4, num_parts=32)
        assert a == b
        cuts = dedup_substrings(
            self._ds(docs), w=4, num_parts=8, rewrite=False, concurrency=1
        ).take_all()
        assert all(r["doc_id"] != 3 for r in cuts)  # first occurrence kept
        assert {r["doc_id"] for r in cuts} >= {20}


class TestBPE:
    """Distributed BPE training (stages/bpe.py) vs a sequential
    reference implementation of Sennrich Algorithm 1 with the same
    pinned tie-break (count desc, symbol-string pair asc)."""

    TEXTS = [
        "the cat sat on the mat",
        "the cats sat",
        "that cat is the best cat",
        "matting the mats",
        "on and on and on",
        "cat cat cat dog dog",
    ] * 3

    @staticmethod
    def _ref_bpe(texts, num_merges, min_count=1):
        from collections import Counter

        from oscar_ray.spec.tokenizer import tokenize_text
        from oscar_ray.stages.bpe import EOW_ID, MERGE_BASE

        wc = Counter()
        for t in texts:
            for w in tokenize_text(t):
                wc[w] += 1
        wc = {w: c for w, c in wc.items() if c >= min_count}
        seqs = {w: [ord(ch) for ch in w] + [EOW_ID] for w in wc}
        sym = {}

        def s2s(x):
            if x in sym:
                return sym[x]
            return "</w>" if x == EOW_ID else chr(x)

        merges = []
        for m in range(num_merges):
            pc_ = Counter()
            for w, c in wc.items():
                for p in zip(seqs[w], seqs[w][1:]):
                    pc_[p] += c
            live = [(p, c) for p, c in pc_.items() if c >= 2]
            if not live:
                break
            (a, b), _ = min(
                live, key=lambda kv: (-kv[1], s2s(kv[0][0]), s2s(kv[0][1]))
            )
            nid = MERGE_BASE + m
            merges.append((a, b))
            sym[nid] = s2s(a) + s2s(b)
            for w in wc:
                seq, out, i = seqs[w], [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        out.append(nid)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = out
        return merges, sym, seqs

    def _ds(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.TEXTS)), type=pa.int64()),
                    "text": pa.array(self.TEXTS),
                }
            )
        ).repartition(4)

    @pytest.mark.parametrize("num_shards", [1, 4])
    def test_merges_match_reference(self, ray_session, num_shards):
        from oscar_ray.stages.bpe import train_bpe

        model = train_bpe(
            self._ds(), num_merges=30, num_shards=num_shards, concurrency=1
        )
        want, _, _ = self._ref_bpe(self.TEXTS, 30)
        assert model.merges == want

    def test_min_count_prunes_tail(self, ray_session):
        from oscar_ray.stages.bpe import train_bpe

        model = train_bpe(self._ds(), num_merges=10, min_count=3, concurrency=1)
        want, _, _ = self._ref_bpe(self.TEXTS, 10, min_count=3)
        assert model.merges == want

    def test_encode_reproduces_training_segmentation(self, ray_session):
        from oscar_ray.stages.bpe import encode_word, train_bpe

        model = train_bpe(self._ds(), num_merges=30, num_shards=2, concurrency=1)
        _, _, seqs = self._ref_bpe(self.TEXTS, 30)
        for w, seq in seqs.items():
            assert encode_word(w, model.ranks) == seq, w

    def test_token_counts(self, ray_session):
        from oscar_ray.spec.tokenizer import tokenize_text
        from oscar_ray.stages.bpe import bpe_token_counts, train_bpe

        model = train_bpe(self._ds(), num_merges=12, num_shards=2, concurrency=1)
        _, _, seqs = self._ref_bpe(self.TEXTS, 12)
        rows = bpe_token_counts(self._ds(), model, concurrency=1).sort(
            "doc_id"
        ).take_all()
        for r in rows:
            toks = tokenize_text(self.TEXTS[r["doc_id"]])
            assert r["n_words"] == len(toks)
            assert r["n_bpe_tokens"] == sum(len(seqs[w]) for w in toks)

    def test_tokenize_ids(self, ray_session):
        """bpe_tokenize emits the training ids verbatim: per doc the
        concatenation of encode_word over its tokens, in order; counts
        agree with bpe_token_counts; empty text -> empty list."""
        import pyarrow as pa
        import ray.data

        from oscar_ray.spec.tokenizer import tokenize_text
        from oscar_ray.stages.bpe import (
            bpe_tokenize,
            encode_word,
            train_bpe,
        )

        texts = self.TEXTS + [""]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        ).repartition(3)
        model = train_bpe(self._ds(), num_merges=12, num_shards=2, concurrency=1)
        rows = bpe_tokenize(ds, model, concurrency=1).sort("doc_id").take_all()
        assert len(rows) == len(texts)
        for r in rows:
            want = []
            for w in tokenize_text(texts[r["doc_id"]]):
                want.extend(encode_word(w, model.ranks))
            assert r["token_ids"] == want
            assert r["n_bpe_tokens"] == len(want)
        assert rows[-1]["token_ids"] == []  # empty doc -> empty list

    def test_tokenize_write_round_trip(self, ray_session, tmp_path):
        """Training-shard terminal step: write_parquet of the ids table
        reads back identically (list<int32> survives the format)."""
        import pyarrow.parquet as pq
        import ray.data

        from oscar_ray.stages.bpe import bpe_tokenize, train_bpe

        model = train_bpe(self._ds(), num_merges=8, num_shards=1, concurrency=1)
        out = str(tmp_path / "shards")
        bpe_tokenize(self._ds(), model, concurrency=1).write_parquet(out)
        back = pq.read_table(out).sort_by("doc_id")
        direct = (
            bpe_tokenize(self._ds(), model, concurrency=1).sort("doc_id").take_all()
        )
        assert back.num_rows == len(direct)
        for got, want in zip(back.to_pylist(), direct):
            assert got["doc_id"] == want["doc_id"]
            assert got["token_ids"] == want["token_ids"]


class TestTopkTermsByGroup:
    """Per-group exact top-k terms (sketches.py): routed partials vs a
    brute-force Counter, including the per-partition local-top-k cut."""

    def test_matches_bruteforce(self, ray_session):
        import collections

        import ray.data

        from oscar_ray.spec.tokenizer import tokenize_text
        from oscar_ray.stages.sketches import topk_terms_by_group

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(40)]
        langs = ["en", "de", "fr"]
        docs = [
            (langs[i % 3], " ".join(rng.choice(vocab, 30)))
            for i in range(300)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "lang": pa.array([l for l, _ in docs]),
                    "text": pa.array([t for _, t in docs]),
                }
            )
        ).repartition(4)
        k = 5
        got = topk_terms_by_group(ds, group_col="lang", k=k, concurrency=1)
        got_rows = list(
            zip(
                got["lang"].to_pylist(),
                got["term"].to_pylist(),
                got["cf"].to_pylist(),
            )
        )
        cnt: dict = collections.defaultdict(collections.Counter)
        for l, t in docs:
            for w in tokenize_text(t):
                cnt[l][w] += 1
        want = []
        for l in sorted(cnt):
            ranked = sorted(cnt[l].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            want += [(l, t, c) for t, c in ranked]
        assert got_rows == want


class TestDsir:
    """DSIR importance resampling (stages/dsir.py) vs a brute-force
    Python reference: hashed unigram+bigram multinomial ratios,
    integer-micro log weights, hashed-uniform Gumbel top-k."""

    def _corpus(self, n=100, seed=3):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(n):
            m = int(rng.integers(0, 30))
            rows.append(
                {
                    "doc_id": i,
                    "text": " ".join(rng.choice(vocab, m)),
                    "source": f"src{int(rng.integers(0, 8))}",
                }
            )
        rows.append({"doc_id": n, "text": "", "source": "src9"})  # zero grams
        return rows

    def _expected(self, rows, seed=1):
        import hashlib
        import math

        from oscar_ray.spec.tokenizer import tokenize_text
        from oscar_ray.stages.dsir import _U_DEN, _U_MOD, N_BUCKETS

        def h(s):
            return int.from_bytes(
                hashlib.md5(s.encode()).digest()[8:16], "little"
            )

        def grams(t):
            toks = tokenize_text(t)
            return [*toks, *[f"{a} {b}" for a, b in zip(toks, toks[1:])]]

        D = N_BUCKETS
        tc = np.zeros(D, dtype=np.int64)
        rc = np.zeros(D, dtype=np.int64)
        tgt = ("src0", "src1", "src2", "src3", "src4")
        for d in rows:
            for g in grams(d["text"]):
                f = h(g) % D
                rc[f] += 1
                if d["source"] in tgt:
                    tc[f] += 1
        tt, rt = tc.sum(), rc.sum()
        lam = np.floor(
            np.log(((tc + 1.0) * (D + rt)) / ((rc + 1.0) * (D + tt))) * 1e6
        ).astype(np.int64)
        exp = {}
        for d in rows:
            gs = grams(d["text"])
            lw = sum(int(lam[h(g) % D]) for g in gs)
            u = (h(f"dsir{seed}:{d['doc_id']}") % _U_MOD + 1) / _U_DEN
            gm = math.floor(-math.log(-math.log(u)) * 1e6)
            exp[d["doc_id"]] = (len(gs), lw, gm, lw + gm)
        return exp

    def test_weights_match_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.dsir import dsir_weights

        rows = self._corpus()
        exp = self._expected(rows)
        got = dsir_weights(
            ray.data.from_items(rows).repartition(4), concurrency=1
        ).take_all()
        assert len(got) == len(rows)
        for r in got:
            assert (
                r["n_grams"],
                r["logw_micro"],
                r["gumbel_micro"],
                r["key_micro"],
            ) == exp[r["doc_id"]]

    def test_block_count_invariant(self, ray_session):
        import ray.data

        from oscar_ray.stages.dsir import dsir_weights

        rows = self._corpus(n=60, seed=11)
        runs = [
            sorted(
                (r["doc_id"], r["logw_micro"], r["key_micro"])
                for r in dsir_weights(
                    ray.data.from_items(rows).repartition(p), concurrency=1
                ).take_all()
            )
            for p in (1, 6)
        ]
        assert runs[0] == runs[1]

    def test_select_is_topk_of_weights(self, ray_session):
        import ray.data

        from oscar_ray.stages.dsir import dsir_select

        rows = self._corpus()
        exp = self._expected(rows)
        want = sorted(exp.items(), key=lambda kv: (-kv[1][3], kv[0]))[:10]
        sel = dsir_select(
            ray.data.from_items(rows).repartition(4), k=10, concurrency=1
        )
        assert sel.num_rows == 10
        assert sel["doc_id"].to_pylist() == [i for i, _ in want]
        assert sel["rank"].to_pylist() == list(range(1, 11))
        assert sel["key_micro"].to_pylist() == [v[3] for _, v in want]

    def test_gumbel_micro_duckdb_parity(self):
        """The nested-ln Gumbel chain floors identically in numpy and
        DuckDB (same float64 libm sequence)."""
        import duckdb

        from oscar_ray.stages.dsir import _gumbel_micro

        ids = np.arange(0, 2000, dtype=np.int64)
        ours = _gumbel_micro(ids, seed=1)
        sql = duckdb.connect().execute(
            """
            SELECT floor(-ln(-ln(
                ((md5_number_lower('dsir1:' || i::VARCHAR)::HUGEINT
                  % 9007199254740991) + 1)::DOUBLE
                / 9007199254740992::DOUBLE)) * 1e6)::BIGINT
            FROM range(0, 2000) t(i) ORDER BY i
            """
        ).fetchnumpy()
        theirs = list(sql.values())[0].astype(np.int64)
        np.testing.assert_array_equal(ours, theirs)

    def test_curate_cli_dsir_preselect(self, ray_session, tmp_path):
        """--dsir-k on the curate CLI: the curated output is a subset
        of the DSIR top-K selection, and the manifest records the
        selection config."""
        import json
        import os
        import subprocess
        import sys as _sys

        import ray.data

        from oscar_ray.stages.dsir import dsir_select

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = "/root/testdata/sf0.001/documents.parquet"
        out = str(tmp_path / "dsir_cur")
        subprocess.run(
            [
                _sys.executable, "scripts/oscar_curate.py",
                "-i", src, "-o", out,
                "--dsir-k", "50", "--num-cpus", "4",
                "--concurrency", "1", "--output", "corpus",
            ],
            cwd=repo, capture_output=True, timeout=300, check=True,
        )
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert manifest["config"]["dsir_k"] == 50
        got_ids = set(
            r["doc_id"]
            for r in ray.data.read_parquet(out).select_columns(["doc_id"]).take_all()
        )
        ds = ray.data.read_parquet(src, columns=["doc_id", "text", "source"])
        want_ids = set(dsir_select(ds, k=50, concurrency=1)["doc_id"].to_pylist())
        assert got_ids <= want_ids
        assert 0 < len(got_ids) <= 50


class TestGroupedQuantiles:
    """Exact grouped percentiles (stages/quantiles.py) vs a brute-force
    reference + the DuckDB quantile_disc rule."""

    def test_disc_index_matches_duckdb_across_n(self):
        """The integer-ceil threshold rule == quantile_disc for every
        n in 1..400 at the pinned q set."""
        import duckdb

        from oscar_ray.stages.quantiles import QS_MICRO, disc_index

        con = duckdb.connect()
        rows = con.execute(
            """
            SELECT n, quantile_disc(x, [0.25,0.5,0.75,0.9,0.99])
            FROM range(1, 401) s(n) JOIN range(1, 401) t(x) ON t.x <= s.n
            GROUP BY n ORDER BY n
            """
        ).fetchall()
        for n, want in rows:
            got = [disc_index(q, n) + 1 for q in QS_MICRO]  # values 1..n
            assert got == list(want), (n, got, want)

    def _check(self, rows, got_rows):
        from collections import defaultdict

        from oscar_ray.stages.quantiles import QS_MICRO, disc_index

        by_g = defaultdict(list)
        for g, v in rows:
            by_g[g].append(v)
        want = {}
        for g, vs in by_g.items():
            vs.sort()
            want[g] = (
                len(vs),
                *[vs[disc_index(q, len(vs))] for q in QS_MICRO],
            )
        got = {
            r["grp"]: (r["n"], r["p25"], r["p50"], r["p75"], r["p90"], r["p99"])
            for r in got_rows
        }
        assert got == want

    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.quantiles import grouped_quantiles

        rng = np.random.default_rng(5)
        rows = [
            (f"g{int(rng.integers(0, 7))}", int(rng.integers(0, 500)))
            for _ in range(3000)
        ]
        rows.append(("lonely", 42))  # single-element group
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "grp": [g for g, _ in rows],
                    "val": pa.array([v for _, v in rows], type=pa.int64()),
                }
            )
        ).repartition(4)
        out = grouped_quantiles(
            ds, "grp", "val", num_parts=4, concurrency=1
        ).take_all()
        self._check(rows, out)

    def test_num_parts_invariant(self, ray_session):
        import ray.data

        from oscar_ray.stages.quantiles import grouped_quantiles

        rng = np.random.default_rng(9)
        rows = [
            (f"g{int(rng.integers(0, 5))}", int(rng.integers(-100, 100)))
            for _ in range(800)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "grp": [g for g, _ in rows],
                    "val": pa.array([v for _, v in rows], type=pa.int64()),
                }
            )
        )
        runs = [
            sorted(
                (r["grp"], r["n"], r["p50"], r["p99"])
                for r in grouped_quantiles(
                    ds, "grp", "val", num_parts=p, concurrency=1
                ).take_all()
            )
            for p in (1, 8)
        ]
        assert runs[0] == runs[1]


class TestUrls:
    """URL kernels + domain_stats (stages/urls.py)."""

    def test_host_and_domain_kernels(self):
        from oscar_ray.stages.urls import registered_domains, url_hosts

        urls = pa.array(
            [
                "https://a.b.example.com/path?q=1",
                "http://user:pw@sub.site.co.uk:8080/x",
                "https://localhost/",
                "ftp://files.archive.org/pub",
                "not a url",
                None,
                "https://bare.com",
                "https://deep.very.sub.com.au/y#frag",
            ]
        )
        hosts = url_hosts(urls)
        assert hosts.to_pylist() == [
            "a.b.example.com",
            "sub.site.co.uk",
            "localhost",
            "files.archive.org",
            None,
            None,
            "bare.com",
            "deep.very.sub.com.au",
        ]
        doms = registered_domains(hosts)
        assert doms.to_pylist() == [
            "example.com",
            "site.co.uk",  # two-level public suffix -> three labels
            "localhost",  # single label unchanged
            "archive.org",
            None,
            None,
            "bare.com",
            "sub.com.au",
        ]

    def test_domain_stats_bruteforce(self, ray_session):
        import ray.data

        from oscar_ray.stages.urls import domain_stats, registered_domains, url_hosts

        rng = np.random.default_rng(11)
        doms = ["x.com", "y.co.uk", "z.org"]
        rows = []
        for i in range(1500):
            d = doms[int(rng.integers(0, 3))]
            sub = f"s{int(rng.integers(0, 9))}"
            rows.append((f"https://{sub}.{d}/p/{i}", int(rng.integers(1, 100))))
        rows.append(("garbage", 5))  # unparseable row drops
        tbl = pa.table(
            {
                "url": [u for u, _ in rows],
                "n": pa.array([c for _, c in rows], type=pa.int64()),
            }
        )
        out = {
            r["domain"]: (r["n_docs"], r["n_hosts"], r["sum_chars"])
            for r in domain_stats(
                ray.data.from_arrow(tbl).repartition(4),
                chars_col="n",
                num_parts=4,
                concurrency=1,
            ).take_all()
        }
        from collections import defaultdict

        want = defaultdict(lambda: [0, set(), 0])
        for u, c in rows:
            if u == "garbage":
                continue
            host = u.split("//")[1].split("/")[0]
            d = ".".join(host.split(".")[-3 if host.endswith("co.uk") else -2 :])
            want[d][0] += 1
            want[d][1].add(host)
            want[d][2] += c
        assert out == {d: (n, len(h), s) for d, (n, h, s) in want.items()}

    def test_filter_denied_domains(self, ray_session):
        import ray.data

        from oscar_ray.stages.urls import filter_denied_domains

        tbl = pa.table(
            {
                "url": [
                    "https://a.spam.example/x",
                    "https://keep.me/y",
                    "https://www.spam.example/z",
                    "bad url",
                ],
                "i": pa.array([0, 1, 2, 3], type=pa.int64()),
            }
        )
        got = (
            filter_denied_domains(
                ray.data.from_arrow(tbl), ("spam.example",), concurrency=1
            )
            .to_pandas()["i"]
            .tolist()
        )
        assert got == [1, 3]  # unparseable rows are kept, not silently dropped


class TestHashJoin:
    """Large-large partitioned equi-join (stages/joins.py::hash_join)."""

    def _mk(self, rng, n_l, n_r, key_space, string_keys=False):
        import pyarrow as pa

        lk = rng.integers(0, key_space, n_l)
        rk = rng.integers(0, key_space, n_r)
        if string_keys:
            lk = np.array([f"k{v}" for v in lk], dtype=object)
            rk = np.array([f"k{v}" for v in rk], dtype=object)
        L = pa.table({"k": lk, "a": np.arange(n_l, dtype=np.int64)})
        R = pa.table({"kk": rk, "a": np.arange(n_r, dtype=np.int64) * 10})
        return L, R

    def _want(self, L, R, how):
        import pandas as pd

        ldf, rdf = L.to_pandas(), R.to_pandas().rename(columns={"kk": "k", "a": "a_r"})
        m = ldf.merge(rdf, on="k", how=how)
        return sorted(
            (r.k, r.a, -1 if pd.isna(r.a_r) else int(r.a_r)) for r in m.itertuples()
        )

    @pytest.mark.parametrize("how", ["inner", "left"])
    @pytest.mark.parametrize("string_keys", [False, True])
    def test_matches_pandas(self, ray_session, how, string_keys):
        import pandas as pd
        import ray.data

        from oscar_ray.stages.joins import hash_join

        rng = np.random.default_rng(3)
        L, R = self._mk(rng, 400, 300, 120, string_keys)
        out = hash_join(
            ray.data.from_arrow(L).repartition(3),
            ray.data.from_arrow(R).repartition(2),
            on=("k", "kk"),
            num_parts=8,
            how=how,
            concurrency=1,
        ).to_pandas()
        got = sorted(
            (r.k, r.a, -1 if pd.isna(r.a_r) else int(r.a_r))
            for r in out.itertuples()
        )
        assert got == self._want(L, R, how)

    def test_num_parts_invariance_and_nulls(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.joins import hash_join

        L = pa.table({"k": [1, None, 2, 2], "x": ["a", "b", "c", "d"]})
        R = pa.table({"k": [2, None, 3], "y": [9, 8, 7]})
        runs = []
        for p in (1, 7):
            out = hash_join(
                ray.data.from_arrow(L),
                ray.data.from_arrow(R),
                on="k",
                num_parts=p,
                concurrency=1,
            ).take_all()
            runs.append(sorted((r["k"], r["x"], r["y"]) for r in out))
        assert runs[0] == runs[1] == [(2, "c", 9), (2, "d", 9)]
        left = hash_join(
            ray.data.from_arrow(L),
            ray.data.from_arrow(R),
            on="k",
            how="left",
            num_parts=4,
            concurrency=1,
        ).take_all()
        got = sorted(
            (-1 if r["k"] is None else r["k"], r["x"], r["y"] or -1) for r in left
        )
        assert got == [(-1, "b", -1), (1, "a", -1), (2, "c", 9), (2, "d", 9)]

    def test_reserved_names_rejected(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.joins import hash_join

        ds = ray.data.from_arrow(pa.table({"k": [1], "part": [2]}))
        with pytest.raises(ValueError, match="reserved"):
            hash_join(ds, ds, on="k")


class TestPerplexityBuckets:
    def test_terciles_and_invariance(self, ray_session):
        """Buckets split each group at the integer tercile rule; the
        result is parallelism-invariant."""
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.lm import perplexity_buckets
        from oscar_ray.stages.quantiles import disc_index

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(300):
            k = int(rng.integers(2, 40))
            rows.append(
                (
                    i,
                    " ".join(vocab[int(rng.integers(0, 30))] for _ in range(k)),
                    ["aa", "bb"][i % 2],
                )
            )
        rows.append((300, "solo", "aa"))  # <2 tokens -> excluded
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        )
        outs = []
        for p in (4, 16):
            got = perplexity_buckets(
                ray.data.from_arrow(tbl).repartition(3),
                num_parts=p,
                concurrency=1,
            ).take_all()
            outs.append(sorted((r["doc_id"], r["ppl_milli"], r["bucket"]) for r in got))
        assert outs[0] == outs[1]
        got = outs[0]
        assert len(got) == 300 and all(d != 300 for d, _, _ in got)
        from collections import defaultdict

        by_lang = defaultdict(list)
        rows_by_id = {r["doc_id"]: r for r in perplexity_buckets(
            ray.data.from_arrow(tbl), num_parts=4, concurrency=1
        ).take_all()}
        for r in rows_by_id.values():
            by_lang[r["lang"]].append(r)
        for lang, rs in by_lang.items():
            ppl = np.sort(np.array([r["ppl_milli"] for r in rs]))
            t33 = ppl[disc_index(333_334, len(ppl))]
            t66 = ppl[disc_index(666_667, len(ppl))]
            for r in rs:
                want = (
                    "head"
                    if r["ppl_milli"] <= t33
                    else "middle" if r["ppl_milli"] <= t66 else "tail"
                )
                assert r["bucket"] == want, (lang, r)


class TestPageRank:
    """Distributed integer PageRank (stages/graph.py)."""

    def _reference(self, N, T, src, dst):
        from oscar_ray.stages.graph import SCALE

        r = np.full(N, SCALE // N, dtype=np.int64)
        outdeg = np.bincount(src, minlength=N).astype(np.int64)
        base = (np.int64(SCALE) * 15) // (np.int64(100) * N)
        for _ in range(T):
            share = np.zeros(N, dtype=np.int64)
            nz = outdeg > 0
            share[nz] = (r[nz] * np.int64(85)) // (np.int64(100) * outdeg[nz])
            newr = np.full(N, base, dtype=np.int64)
            np.add.at(newr, dst, share[src])
            r = newr
        return r

    @pytest.mark.parametrize("P", [1, 4, 16])
    def test_bit_exact_any_parallelism(self, ray_session, P):
        import ray.data

        from oscar_ray.stages.graph import pagerank

        N, T = 400, 5
        rng = np.random.default_rng(2)
        src = rng.integers(0, N, 1200).astype(np.int64)
        dst = rng.integers(0, N, 1200).astype(np.int64)
        edges = ray.data.from_arrow(
            pa.table({"src": src, "dst": dst})
        ).repartition(3)
        got = (
            pagerank(edges, N, iters=T, num_parts=P)
            .to_pandas()
            .sort_values("node")
        )
        assert (got["node"].values == np.arange(N)).all()
        assert (got["rank_micro"].values == self._reference(N, T, src, dst)).all()

    def test_structure(self, ray_session):
        """A sink node pulls rank; an isolated node holds the base."""
        import ray.data

        from oscar_ray.stages.graph import SCALE, pagerank

        # 0->2, 1->2; node 3 isolated
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 1], type=pa.int64()),
                    "dst": pa.array([2, 2], type=pa.int64()),
                }
            )
        )
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(edges, 4, iters=10, num_parts=2).take_all()
        }
        base = (SCALE * 15) // (100 * 4)
        assert got[3] == base and got[0] == base and got[1] == base
        assert got[2] > 2 * base  # the sink accumulates both shares


class TestPageRankStaticOrder:
    def test_pagerank_feeds_rank_column_build(self, ray_session, tmp_path):
        """The web-search composition: PageRank over the link graph ->
        rank_column build -> docids in rank order, so BM25 ties prefer
        high-PageRank docs (the applySort analog with a computed rank)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from oscar_ray.index.build import IndexBuildConfig, build_index
        from oscar_ray.query.engine import QueryEngine
        from oscar_ray.stages.graph import pagerank

        # star + chain: everyone links to node 3; 0 also gets a link
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 1, 2, 4, 1], type=pa.int64()),
                    "dst": pa.array([3, 3, 3, 3, 0], type=pa.int64()),
                }
            )
        )
        ranks = {
            r["node"]: r["rank_micro"]
            for r in pagerank(edges, 5, iters=8, num_parts=2).take_all()
        }
        assert ranks[3] == max(ranks.values())

        tbl = pa.table(
            {
                "url": [f"u{i}" for i in range(5)],
                "text": ["same text here"] * 5,  # identical BM25 scores
                "rank": pa.array(
                    [float(ranks[i]) for i in range(5)], type=pa.float64()
                ),
            }
        )
        src = str(tmp_path / "ranked_pages")
        os.makedirs(src)
        pq.write_table(tbl, os.path.join(src, "p.parquet"))
        out = str(tmp_path / "idx_pr")
        build_index(
            src,
            out,
            IndexBuildConfig(
                num_partitions=2, rank_column="rank", lang_column=None,
                dedup_urls=False,
            ),
        )
        ids, scores = QueryEngine(out).search("same", k=5)
        # docid 0 == highest PageRank (node 3); ties broken by docid
        # ascending => results come back in PageRank order
        assert list(ids) == [0, 1, 2, 3, 4]
        order = sorted(range(5), key=lambda i: -ranks[i])
        assert order[0] == 3  # and the engine's docid 0 IS node 3


class TestNswAnn:
    """Graph ANN (similarity.py nsw_build/knn_nsw)."""

    def _data(self, n=1200, d=20, seed=4):
        rng = np.random.default_rng(seed)
        m = rng.standard_normal((n, d))
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in m], type=pa.list_(pa.float32())
                ),
            }
        )
        q = m[rng.integers(0, n, 10)] + rng.standard_normal((10, d)) * 0.01
        return tbl, q

    def test_recall_vs_brute_force(self, ray_session, tmp_path):
        import ray.data

        from oscar_ray.stages.similarity import knn_brute_force, knn_nsw, nsw_build

        tbl, q = self._data()
        ds = ray.data.from_arrow(tbl).repartition(2)
        nsw_build(
            ds, str(tmp_path / "g"), m_links=8, ef_construction=40,
            shard_rows=512, concurrency=1,
        )
        got = knn_nsw(str(tmp_path / "g"), q, k=10, ef_search=64).to_pandas()
        # concurrency < session CPUs: a 4-actor pool at 4 CPUs starves
        # the upstream repartition (the documented pool-sizing deadlock)
        exact = knn_brute_force(ds, q, k=10, concurrency=2).to_pandas()
        hits = set(map(tuple, got[["query_id", "vec_id"]].values.tolist()))
        want = set(map(tuple, exact[["query_id", "vec_id"]].values.tolist()))
        assert len(hits & want) / len(want) >= 0.95
        # matched pairs carry the same rounded cosine as the exact path
        m = got.merge(exact, on=["query_id", "vec_id"], suffixes=("_g", "_e"))
        assert (m["score_g"] == m["score_e"]).all()

    def test_exhaustive_beam_equals_brute_force(self, ray_session, tmp_path):
        """ef_search == n degrades to exact search on a connected
        shard: top-k identical to brute force, ranks included."""
        import ray.data

        from oscar_ray.stages.similarity import knn_brute_force, knn_nsw, nsw_build

        tbl, q = self._data(n=300)
        ds = ray.data.from_arrow(tbl)
        nsw_build(
            ds, str(tmp_path / "g1"), m_links=8, ef_construction=60,
            shard_rows=4096, concurrency=1,  # ONE shard
        )
        got = knn_nsw(str(tmp_path / "g1"), q, k=10, ef_search=300).to_pandas()
        exact = knn_brute_force(ds, q, k=10).to_pandas()
        assert got[["query_id", "rank", "vec_id"]].values.tolist() == (
            exact[["query_id", "rank", "vec_id"]].values.tolist()
        )

    def test_build_deterministic(self, ray_session, tmp_path):
        import hashlib
        import glob

        import ray.data

        from oscar_ray.stages.similarity import nsw_build

        tbl, _ = self._data(n=400)
        for sub in ("a", "b"):
            nsw_build(
                ray.data.from_arrow(tbl), str(tmp_path / sub),
                m_links=6, ef_construction=30, shard_rows=200, concurrency=1,
            )

        def digest(d):
            h = hashlib.sha256()
            for p in sorted(glob.glob(f"{d}/shard=*/*.parquet")):
                h.update(open(p, "rb").read())
            return h.hexdigest()

        assert digest(tmp_path / "a") == digest(tmp_path / "b")


class TestHITS:
    """Distributed integer HITS (stages/graph.py::hits)."""

    def _reference(self, N, T, src, dst):
        from oscar_ray.stages.graph import HITS_SCALE, SCALE

        h = np.full(N, SCALE, dtype=np.int64)
        hmax = SCALE
        a_raw = np.zeros(N, dtype=np.int64)
        amax = 1
        for _ in range(T):
            hs = (h * np.int64(HITS_SCALE)) // np.int64(max(1, hmax))
            a_raw = np.zeros(N, dtype=np.int64)
            np.add.at(a_raw, dst, hs[src])
            amax = max(1, int(a_raw.max(initial=0)))
            asc = (a_raw * np.int64(HITS_SCALE)) // np.int64(amax)
            h = np.zeros(N, dtype=np.int64)
            np.add.at(h, src, asc[dst])
            hmax = max(1, int(h.max(initial=0)))
        return (
            (a_raw * np.int64(HITS_SCALE)) // amax,
            (h * np.int64(HITS_SCALE)) // hmax,
        )

    @pytest.mark.parametrize("P", [1, 4, 16])
    def test_bit_exact_any_parallelism(self, ray_session, P):
        import ray.data

        from oscar_ray.stages.graph import hits

        N, T = 300, 3
        rng = np.random.default_rng(9)
        src = rng.integers(0, N, 900).astype(np.int64)
        dst = rng.integers(0, N, 900).astype(np.int64)
        edges = ray.data.from_arrow(
            pa.table({"src": src, "dst": dst})
        ).repartition(3)
        got = (
            hits(edges, N, iters=T, num_parts=P)
            .to_pandas()
            .sort_values("node")
        )
        ra, rh = self._reference(N, T, src, dst)
        assert (got["node"].values == np.arange(N)).all()
        assert (got["authority_micro"].values == ra).all()
        assert (got["hub_micro"].values == rh).all()

    def test_structure(self, ray_session):
        """The pointed-at node is the top authority; the pointing nodes
        are the top hubs; an isolated node scores zero on both."""
        import ray.data

        from oscar_ray.stages.graph import HITS_SCALE, hits

        # 0->2, 1->2, 0->3; node 4 isolated
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 1, 0], type=pa.int64()),
                    "dst": pa.array([2, 2, 3], type=pa.int64()),
                }
            )
        )
        got = {
            r["node"]: (r["authority_micro"], r["hub_micro"])
            for r in hits(edges, 5, iters=3, num_parts=2).take_all()
        }
        assert got[2][0] == HITS_SCALE  # max authority
        assert got[0][1] == HITS_SCALE  # max hub (two out-links)
        assert got[4] == (0, 0)
        assert got[3][0] < got[2][0] and got[1][1] < got[0][1]


class TestCooccurrencePMI:
    """Collocation extraction (sketches.cooccurrence_pmi)."""

    def _brute(self, texts, K, min_pairs):
        from itertools import combinations

        from oscar_ray.spec.tokenizer import flatten_tokens

        kept_sets = []
        for t in texts:
            _, toks = flatten_tokens(pa.array([t], type=pa.string()))
            seen: list[str] = []
            for tok in toks.to_pylist():
                if tok not in seen:
                    seen.append(tok)
            kept_sets.append(set(seen[:K]))
        n = len(texts)
        from collections import Counter

        ca: Counter = Counter()
        cp: Counter = Counter()
        for s in kept_sets:
            for t in s:
                ca[t] += 1
            for a, b in combinations(sorted(s), 2):
                cp[(a, b)] += 1
        fln = lambda x: int(np.floor(np.log(np.float64(x)) * 1_000_000))
        out = {}
        for (a, b), c in cp.items():
            if c >= min_pairs:
                out[(a, b)] = (c, fln(c) + fln(n) - fln(ca[a]) - fln(ca[b]))
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from oscar_ray.stages.sketches import cooccurrence_pmi

        rng = np.random.default_rng(21)
        vocab = [f"t{i:02d}" for i in range(25)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(2, 40)))
            for _ in range(150)
        ] + ["", "t00"]  # empty + single-term docs contribute no pairs
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts),
                }
            )
        ).repartition(4)
        got = (
            cooccurrence_pmi(
                ds, n_docs=len(texts), max_terms_per_doc=8, min_pair_docs=3
            )
            .to_pandas()
            .sort_values(["term_a", "term_b"])
            .reset_index(drop=True)
        )
        want = self._brute(texts, K=8, min_pairs=3)
        assert len(got) == len(want)
        for r in got.itertuples():
            c, pmi = want[(r.term_a, r.term_b)]
            assert (r.pair_docs, r.pmi_micro) == (c, pmi), (r.term_a, r.term_b)

    def test_first_k_is_document_order(self, ray_session):
        """K=2 keeps the first two DISTINCT terms in document order —
        later repeats of an early term don't displace position-3 terms."""
        import ray.data

        from oscar_ray.stages.sketches import cooccurrence_pmi

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["b a b c", "a b"]),
                }
            )
        )
        got = cooccurrence_pmi(
            ds, n_docs=2, max_terms_per_doc=2, min_pair_docs=2
        ).to_pandas()
        # doc0 universe {b,a} (c is 3rd distinct), doc1 {a,b} -> pair (a,b) x2
        assert len(got) == 1
        assert (got.term_a[0], got.term_b[0], got.pair_docs[0]) == ("a", "b", 2)


class TestCanonicalizeUrls:
    """URL canonical form (urls.canonicalize_urls), pure-kernel op."""

    def test_pinned_rule(self):
        from oscar_ray.stages.urls import canonicalize_urls

        cases = {
            "HTTP://WWW.Ex.COM:80/p/1?b=2&utm_source=f&a=9#frag":
                "http://www.ex.com/p/1?a=9&b=2",
            "https://a.com": "https://a.com/",
            "https://a.com:443?z=1&y=2&y=2": "https://a.com/?y=2&y=2&z=1",
            "http://u:pw@H.io:8080/x": "http://u:pw@h.io:8080/x",
            "https://b.com/p?utm_a=1&utm_b=2": "https://b.com/p",
            "http://a.com:8080/": "http://a.com:8080/",
            "ftp://Host/Path": "ftp://host/Path",  # path case preserved
            "not a url": "not a url",  # non-URL passes through
            "": "",
        }
        got = canonicalize_urls(pa.array(list(cases), type=pa.string()))
        assert got.to_pylist() == list(cases.values())

    def test_idempotent_and_nulls(self):
        from oscar_ray.stages.urls import canonicalize_urls

        urls = pa.array(
            ["HTTPS://A.B:443/x?b=1&a=2#f", None, "http://q.r/?utm_x=1"],
            type=pa.string(),
        )
        once = canonicalize_urls(urls)
        assert canonicalize_urls(once).to_pylist() == once.to_pylist()
        assert once[1].as_py() is None


class TestC4Filters:
    """stages/c4.py: C4 line-level cleaning, REAL published rules."""

    DOCS = [
        # keeps 5 sentences -> survives
        "This is a good first sentence.\nShort.\nAnother fine sentence here!"
        "\nIs this kept?\nYes it is kept.\nAnd one more to pass five.",
        # javascript line dropped, still 5 kept -> survives
        "enable javascript to view this page.\nA real sentence stands here."
        "\nB real sentence stands here.\nC real sentence stands here."
        "\nD real sentence stands here.\nE real sentence stands here.",
        # lorem ipsum -> doc dropped even with 5 sentences
        "Lorem Ipsum dolor sit amet one.\nTwo more words here today fine."
        "\nThree more words here today fine.\nFour more words here today fine."
        "\nFive more words here today fine.",
        # curly brace -> doc dropped
        "function f() { return 1; }\nA real sentence stands here."
        "\nB real sentence stands here.\nC real sentence stands here."
        "\nD real sentence stands here.\nE real sentence stands here.",
        # no terminal punctuation anywhere -> nothing kept
        "no terminal punctuation at all\nstill none here\nnothing",
        # trimming: spaces/tabs/CR stripped; 2-word line dropped (min 3)
        '  Trimmed line with spaces.  \nTab\ttrailing.\r\nQuote ends "here."'
        "\nFour word sentence okay.\nFive word sentence okay too.",
    ]

    def _reference(self, text: str) -> dict:
        """Row-wise Python oracle of the published C4 rules."""
        import re

        lines = [ln.strip(" \t\r") for ln in text.split("\n")]
        kept = [
            ln
            for ln in lines
            if re.search(r'[.!?"]$', ln)
            and len(re.findall(r"\S+", ln)) >= 3
            and "javascript" not in ln.lower()
        ]
        clean = "\n".join(kept)
        n_sent = len(re.findall(r"[.!?]", clean))
        keep = (
            n_sent >= 5
            and "lorem ipsum" not in text.lower()
            and "{" not in text
        )
        return {
            "n_lines": len(lines),
            "n_kept": len(kept),
            "n_sentences": n_sent,
            "keep": int(keep),
            "text_clean": clean,
        }

    def test_real_rules_match_rowwise_reference(self):
        import pyarrow as pa

        from oscar_ray.stages.c4 import c4_line_filter

        t = pa.table({"doc_id": list(range(len(self.DOCS))), "text": self.DOCS})
        out = c4_line_filter(t).to_pandas()
        assert out.keep.tolist()[:6] == [1, 1, 0, 0, 0, 0]
        for i, row in out.iterrows():
            want = self._reference(self.DOCS[i])
            for k, v in want.items():
                assert row[k] == v, (i, k, row[k], v)

    def test_empty_and_null_text(self):
        import pyarrow as pa

        from oscar_ray.stages.c4 import c4_line_filter

        t = pa.table(
            {"doc_id": [0, 1], "text": pa.array(["", None], type=pa.string())}
        )
        out = c4_line_filter(t).to_pandas()
        assert out.n_kept.tolist() == [0, 0]
        assert out.keep.tolist() == [0, 0]
        assert out.text_clean.tolist() == ["", ""]

    def test_dataset_helper(self, ray_session):
        import ray.data

        from oscar_ray.stages.c4 import c4_clean_documents

        ds = ray.data.from_items(
            [{"doc_id": i, "text": d} for i, d in enumerate(self.DOCS)]
        )
        out = c4_clean_documents(ds, stats_only=True).to_pandas()
        assert set(out.columns) == {"doc_id", "n_lines", "n_kept", "n_sentences", "keep"}
        assert len(out) == len(self.DOCS)


class TestKeepBestPerCluster:
    def test_argmax_and_singletons(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import keep_best_per_cluster

        # clusters: {1,2,5} labeled 1, {3,7} labeled 3; 4 and 6 singletons
        labels = pa.table(
            {"doc_id": [1, 2, 5, 3, 7], "cluster_id": [1, 1, 1, 3, 3]}
        )
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "n_chars": 10},
                {"doc_id": 2, "n_chars": 30},
                {"doc_id": 3, "n_chars": 7},
                {"doc_id": 4, "n_chars": 99},
                {"doc_id": 5, "n_chars": 30},  # ties doc 2 -> min id wins
                {"doc_id": 6, "n_chars": 1},
                {"doc_id": 7, "n_chars": 7},  # ties doc 3 -> min id wins
            ]
        )
        out = (
            keep_best_per_cluster(docs, labels, num_parts=4)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        assert out.cluster_id.tolist() == [1, 3, 4, 6]
        assert out.best_doc_id.tolist() == [2, 3, 4, 6]
        assert out.best_n_chars.tolist() == [30, 7, 99, 1]
        assert out.n_docs.tolist() == [3, 2, 1, 1]

    def test_num_parts_invariant(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import keep_best_per_cluster

        rng = np.random.default_rng(7)
        n = 400
        ids = np.arange(n)
        # ~50 clusters of varying size over the first 300 docs
        cl = rng.integers(0, 50, size=300)
        lab = pa.table(
            {"doc_id": ids[:300], "cluster_id": cl.astype(np.int64)}
        )
        docs = ray.data.from_arrow(
            pa.table(
                {"doc_id": ids, "n_chars": rng.integers(1, 1000, size=n)}
            )
        )
        a = (
            keep_best_per_cluster(docs, lab, num_parts=2)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        b = (
            keep_best_per_cluster(docs, lab, num_parts=16)
            .to_pandas()
            .sort_values("cluster_id")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestBloomDedup:
    def _corpus(self):
        import numpy as np

        rng = np.random.default_rng(11)
        texts = [
            " ".join(rng.choice(["a", "b", "c", "d"], size=12).tolist()) + f" u{i}"
            for i in range(400)
        ]
        # plant dup groups: ids 400.. copy earlier texts
        dups = [(400 + j, texts[j * 3]) for j in range(30)]
        ids = list(range(400)) + [i for i, _ in dups]
        return ids, texts + [t for _, t in dups]

    def test_large_m_equals_exact_first_seen(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.bloom import bloom_dedup

        ids, texts = self._corpus()
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        out = (
            bloom_dedup(ds, m_bits=1 << 24)
            .to_pandas()
            .set_index("doc_id")
            .kept.sort_index()
        )
        first = {}
        for i, t in sorted(zip(ids, texts)):
            first.setdefault(t, i)
        for i, t in zip(ids, texts):
            assert out[i] == int(first[t] == i), i

    def test_no_false_negatives_under_fp_pressure(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.bloom import bloom_dedup

        ids, texts = self._corpus()
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        out = (
            bloom_dedup(ds, m_bits=1 << 8, k=4, num_parts=2, chunk_rows=16)
            .to_pandas()
            .set_index("doc_id")
            .kept
        )
        # every non-first copy of a duplicate group MUST be dropped
        for j in range(30):
            assert out[400 + j] == 0
        # and FPs exist at this fill level (the approximate regime is live)
        assert out.sum() < 400

    def test_deterministic(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.bloom import bloom_dedup

        ids, texts = self._corpus()
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        kw = dict(m_bits=1 << 10, k=3, num_parts=4, chunk_rows=32)
        a = bloom_dedup(ds, **kw).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = bloom_dedup(ds, **kw).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_power_of_two_guard(self, ray_session):
        import pytest
        import ray.data

        from oscar_ray.stages.bloom import bloom_dedup

        ds = ray.data.from_items([{"doc_id": 0, "text": "x"}])
        with pytest.raises(AssertionError):
            bloom_dedup(ds, m_bits=1000)


class TestCurateVariants:
    """curate_corpus with bloom dedup / C4 pre-cleaning options."""

    def _docs(self, n=60):
        texts = [
            " ".join(f"w{(i % 9) * 3 + j % 5} common tail" for j in range(6))
            for i in range(n)
        ]
        langs = [["en", "es"][i % 2] for i in range(n)]
        return pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": texts,
                "lang": langs,
            }
        )

    def test_bloom_dedup_keep_equals_exact(self, ray_session):
        import ray.data

        from oscar_ray.pipelines.curate import exact_dedup_keep
        from oscar_ray.stages.bloom import bloom_dedup_keep

        ds = ray.data.from_arrow(self._docs()).repartition(4)
        a = sorted(
            exact_dedup_keep(ds).take_all(), key=lambda r: r["doc_id"]
        )
        b = sorted(
            bloom_dedup_keep(ds, m_bits=1 << 22).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert [(r["doc_id"], r["text"], r["lang"]) for r in a] == [
            (r["doc_id"], r["text"], r["lang"]) for r in b
        ]

    def test_curate_bloom_equals_curate_exact(self, ray_session):
        import ray.data

        from oscar_ray.pipelines.curate import curate_corpus

        kw = dict(quality_min_micro=0, output="corpus", num_parts=4, concurrency=2)
        ds = ray.data.from_arrow(self._docs())
        a = sorted(
            curate_corpus(ds, dedup="exact", **kw).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            curate_corpus(ds, dedup="bloom", bloom_mbits=1 << 22, **kw).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b and len(a) > 0

    def test_curate_c4_prepass(self, ray_session):
        import ray.data

        from oscar_ray.pipelines.curate import curate_corpus
        from oscar_ray.stages.c4 import C4Rules

        # vocab-adapted rules: " tail " splits lines, "common" is the
        # terminal mark (the final "... common tail" line gets dropped)
        rules = C4Rules(
            line_sep=" tail ",
            terminal_regex=r"common$",
            min_words=1,
            bad_line_substr="",
            min_sentences=2,
            sentence_regex=r"common",
            bad_doc_substr="",
            brace_doc_filter=False,
        )
        ds = ray.data.from_arrow(self._docs())
        out = curate_corpus(
            ds,
            c4_rules=rules,
            quality_min_micro=0,
            output="corpus",
            num_parts=4,
            concurrency=2,
        ).take_all()
        assert len(out) > 0
        # every surviving text is rebuilt from kept (terminal) lines only
        for r in out:
            assert " tail " not in r["text"]
            assert r["text"].endswith("common")


class TestWinnowing:
    def _reference(self, texts, k=3, w=4):
        import hashlib
        import re

        from oscar_ray.stages.text_analysis import FP_BASE, FP_MOD

        out = []
        for d, text in enumerate(texts):
            toks = re.findall(r"[a-z0-9]+", text.lower())
            th = [
                int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
                % FP_MOD
                for t in toks
            ]
            hs = []
            for i in range(len(th) - k + 1):
                h = 0
                for j in range(k):
                    h = (h * FP_BASE + th[i + j]) % FP_MOD
                hs.append(h >> 21)
            sel = set()
            for i in range(len(hs) - w + 1):
                sel.add(min((hs[i + j] << 20) | (i + j) for j in range(w)))
            out += [(d, kk & ((1 << 20) - 1), kk >> 20) for kk in sorted(sel)]
        return sorted(out)

    def test_matches_rowwise_reference(self):
        import pyarrow as pa

        from oscar_ray.stages.text_analysis import winnowing_fingerprints

        texts = [
            "the quick brown fox jumps over the lazy dog the quick brown fox",
            "a b c",  # too short: no full window
            "x y z x y z x y z x y z",  # heavy repetition -> dedup bites
            "one two three four five six seven eight nine ten",
        ]
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = winnowing_fingerprints(t).to_pandas()
        assert sorted(zip(got.doc_id, got.pos, got.fp)) == self._reference(texts)

    def test_shared_substring_guarantee(self):
        import pyarrow as pa

        from oscar_ray.stages.text_analysis import winnowing_fingerprints

        # winnowing guarantee: any shared token run >= w+k-1 (=6) shares
        # at least one selected fingerprint
        core = "alpha beta gamma delta epsilon zeta eta theta"
        t = pa.table(
            {
                "doc_id": [0, 1],
                "text": ["xx yy " + core + " qq", "pp " + core + " rr ss tt"],
            }
        )
        g = winnowing_fingerprints(t).to_pandas()
        shared = set(g[g.doc_id == 0].fp) & set(g[g.doc_id == 1].fp)
        assert shared

    def test_batch_boundaries_are_free(self):
        import pandas as pd
        import pyarrow as pa

        from oscar_ray.stages.text_analysis import winnowing_fingerprints

        texts = [f"w{i} w{i+1} w{i+2} w{i%3} w{i%5} w{i%7} w{i+3}" for i in range(20)]
        t = pa.table({"doc_id": list(range(20)), "text": texts})
        whole = winnowing_fingerprints(t).to_pandas()
        parts = pd.concat(
            [
                winnowing_fingerprints(t.slice(0, 7)).to_pandas(),
                winnowing_fingerprints(t.slice(7, 6)).to_pandas(),
                winnowing_fingerprints(t.slice(13)).to_pandas(),
            ]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(whole, parts)


class TestWinnowingPairs:
    def test_planted_overlaps_found_and_ranked(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import winnowing_pairs

        core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = (
            [f"u{i} v{i} w{i} x{i} y{i} z{i} q{i} r{i}" for i in range(30)]
            + ["aa bb " + core, "cc dd " + core + " ee", core + " ff gg hh"]
        )
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(len(texts))), "text": texts})
        )
        out = winnowing_pairs(ds, min_shared=1, concurrency=2).to_pandas()
        pairs = set(zip(out.a_id, out.b_id))
        assert {(30, 31), (30, 32), (31, 32)} <= pairs
        # unrelated docs share nothing
        assert all(a >= 30 and b >= 30 for a, b in pairs)

    def test_max_fp_df_cap(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.dedup import winnowing_pairs

        # 10 copies of one text: fp df = 10 > cap 4 -> all fps stopped
        texts = ["one two three four five six seven eight"] * 10
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(10)), "text": texts})
        )
        out = winnowing_pairs(ds, min_shared=1, max_fp_df=4, concurrency=2)
        assert out.count() == 0
        full = winnowing_pairs(ds, min_shared=1, max_fp_df=16, concurrency=2)
        assert full.count() == 45  # all C(10,2) pairs


class TestMMR:
    def _data(self):
        import numpy as np

        rng = np.random.default_rng(3)
        # 3 tight clusters + noise; query near cluster 0
        base = rng.normal(size=(3, 16))
        vecs, ids = [], []
        vid = 0
        for c in range(3):
            for _ in range(6):
                vecs.append(base[c] + rng.normal(scale=0.01, size=16))
                ids.append(vid)
                vid += 1
        for _ in range(10):
            vecs.append(rng.normal(size=16))
            ids.append(vid)
            vid += 1
        q = base[0] + rng.normal(scale=0.01, size=16)
        return ids, np.array(vecs), q[None, :]

    def _reference(self, cid, rel, ids, vecs, k, lam):
        """Greedy MMR re-implemented row-wise over the SAME candidate
        list knn_brute_force produced (candidate generation has its own
        parity tests; this pins the greedy selection logic)."""
        import numpy as np

        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        lookup = {i: vn[j] for j, i in enumerate(ids)}
        V = np.stack([lookup[i] for i in cid])
        sim = V @ V.T
        out, max_sim, avail = [], None, np.ones(len(cid), dtype=bool)
        for rank in range(min(k, len(cid))):
            s = lam * rel if max_sim is None else lam * rel - (1 - lam) * max_sim
            s = np.where(avail, s, -np.inf)
            j = int(np.argmax(s))  # ties -> best knn rank
            out.append((rank + 1, int(cid[j])))
            avail[j] = False
            max_sim = sim[:, j].copy() if max_sim is None else np.maximum(max_sim, sim[:, j])
        return out

    def test_matches_reference_and_diversifies(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.similarity import mmr_rerank

        ids, vecs, q = self._data()
        ds = ray.data.from_arrow(
            pa.table({"vec_id": ids, "embedding": [list(v) for v in vecs]})
        )
        got = mmr_rerank(ds, q, k=6, depth=12, lam=0.5, concurrency=2).to_pandas()
        from oscar_ray.stages.similarity import knn_brute_force

        cand = knn_brute_force(ds, q, k=12, concurrency=2).to_pandas()
        want = self._reference(
            cand.vec_id.to_numpy(),
            cand.score.to_numpy().astype(np.float64),
            ids,
            vecs,
            k=6,
            lam=0.5,
        )
        assert list(zip(got["rank"], got.vec_id)) == want
        # diversification: pure-relevance top-6 is all cluster 0 (6 dups);
        # MMR must escape the cluster
        assert len(set(got.vec_id) - set(range(6))) >= 1

    def test_lambda_one_is_pure_relevance(self, ray_session):
        import pyarrow as pa
        import ray.data

        from oscar_ray.stages.similarity import knn_brute_force, mmr_rerank

        ids, vecs, q = self._data()
        ds = ray.data.from_arrow(
            pa.table({"vec_id": ids, "embedding": [list(v) for v in vecs]})
        )
        mmr = mmr_rerank(ds, q, k=5, depth=12, lam=1.0, concurrency=2).to_pandas()
        knn = knn_brute_force(ds, q, k=5, concurrency=2).to_pandas()
        assert mmr.vec_id.tolist() == knn.vec_id.tolist()


class TestMixedCorpusSkips:
    """Compressed-codec gates surfaced as counted skips: a mixed media
    column (decodable + mp3/mp4/h264) streams through decoder='auto'
    stages instead of dying; every row is preserved with a reason."""

    def _mixed_images(self):
        import pyarrow as pa

        from oscar_ray.sources.synth import generate_jpeg, generate_png, generate_ppm

        payloads = [
            generate_jpeg(0),
            b"ID3\x04" + bytes(60),                    # mp3
            generate_png(2),
            b"\x00\x00\x00\x18ftypisom" + bytes(40),   # mp4 (aac/h264)
            generate_ppm(4),
            b"\x00\x00\x00\x01\x67" + bytes(40),       # h264 annex-b
            b"\xffnoise-not-a-format",                 # unknown
        ]
        return pa.table({"doc_id": list(range(len(payloads))), "media": payloads})

    def test_sniff_media(self):
        from oscar_ray.sources.synth import (
            generate_avi,
            generate_gif,
            generate_jpeg,
            generate_png,
            generate_ppm,
            generate_rvid,
            generate_wav,
        )
        from oscar_ray.stages.multimodal import sniff_media

        assert sniff_media(generate_jpeg(1)) == "jpeg"
        assert sniff_media(generate_png(1)) == "png"
        assert sniff_media(generate_gif(1)) == "gif"
        assert sniff_media(generate_ppm(1)) == "ppm"
        assert sniff_media(generate_wav(1)) == "wav"
        assert sniff_media(generate_avi(1)) == "avi"
        assert sniff_media(generate_rvid(1)) == "rvid"
        assert sniff_media(b"ID3\x04" + bytes(10)) == "mp3"
        assert sniff_media(b"\x00\x00\x00\x18ftypmp42") == "mp4"
        assert sniff_media(b"OggS" + bytes(10)) == "ogg"
        assert sniff_media(b"\x1aE\xdf\xa3" + bytes(4)) == "webm"
        assert sniff_media(b"\x00\x00\x00\x01\x67") == "h264"
        assert sniff_media(b"") == "unknown"
        assert sniff_media(None) == "unknown"

    def test_image_stage_counts_skips(self):
        from oscar_ray.stages.multimodal import ImageFeatureStage

        t = self._mixed_images()
        out = ImageFeatureStage(decoder="auto", dim=8, on_unsupported="skip")(t)
        assert out.num_rows == t.num_rows  # every row preserved
        reasons = out["skip_reason"].to_pylist()
        feats = out["feature"].to_pylist()
        decoded = [i for i, r in enumerate(reasons) if r == ""]
        assert decoded == [0, 2, 4]
        assert all(len(feats[i]) == 8 for i in decoded)
        skipped = {i: r for i, r in enumerate(reasons) if r}
        assert skipped == {
            1: "unsupported image format: mp3",
            3: "unsupported image format: mp4",
            5: "unsupported image format: h264",
            6: "unsupported image format: unknown",
        }
        assert all(len(feats[i]) == 0 for i in skipped)

    def test_image_stage_raise_mode_unchanged(self):
        import pytest as _pytest

        from oscar_ray.stages.multimodal import ImageFeatureStage

        with _pytest.raises(NotImplementedError):
            ImageFeatureStage(decoder="auto", dim=8)(self._mixed_images())

    def test_audio_stage_counts_skips(self):
        import pyarrow as pa

        from oscar_ray.sources.synth import generate_avi, generate_wav, generate_wav_adpcm
        from oscar_ray.stages.multimodal import AudioFeatureStage

        t = pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "media": [
                    generate_wav(0),
                    b"ID3\x04" + bytes(60),
                    generate_wav_adpcm(2),
                    generate_avi(3),
                ],
            }
        )
        out = AudioFeatureStage(decoder="auto", on_unsupported="skip")(t)
        assert out.num_rows == 4
        r = dict(zip(out["doc_id"].to_pylist(), out.column("skip_reason").to_pylist()))
        assert r[1] == "unsupported audio format: mp3"
        assert r[0] == r[2] == r[3] == ""
        d = dict(zip(out["doc_id"].to_pylist(), out.column("duration_s").to_pylist()))
        assert d[0] > 0 and d[2] > 0 and d[3] > 0 and d[1] == 0.0

    def test_frame_stage_counts_skips(self):
        import numpy as np
        import pyarrow as pa

        from oscar_ray.sources.synth import generate_avi
        from oscar_ray.stages.multimodal import FrameSampleStage, encode_rvid

        t = pa.table(
            {
                "doc_id": [0, 1, 2],
                "media": [
                    b"\x00\x00\x00\x18ftypisom" + bytes(40),
                    generate_avi(1, n_frames=4),
                    encode_rvid(np.zeros((3, 4, 4, 3), np.uint8)),
                ],
            }
        )
        out = FrameSampleStage(decoder="auto", n_frames=2, on_unsupported="skip")(t)
        df = out.to_pandas()
        g0 = df[df["doc_id"] == 0]
        assert len(g0) == 1 and g0["frame_index"].iloc[0] == -1
        assert g0["skip_reason"].iloc[0] == "unsupported video format: mp4"
        for d in (1, 2):
            g = df[df["doc_id"] == d]
            assert list(g["frame_index"]) == [0, 1]
            assert (g["skip_reason"] == "").all()
            assert all(len(f) > 0 for f in g["frame"])
