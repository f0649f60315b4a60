"""Text-analysis stages over a documents Dataset (map_batches, Arrow-first).

Large-scale training-data pipeline operators: per-doc token statistics,
quality scoring, language ID (n-gram/stopword heuristic), rolling-hash
document fingerprints. All deterministic; token semantics come from the
pinned spec tokenizer, so stats agree with the index builder and with
the DuckDB oracle SQL (regexp_split on the same delimiter class).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oscar_ray.spec.tokenizer import flatten_tokens

# pinned stopword lists for the language-ID heuristic (tiny, deterministic)
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and or of to in is are was were be with for on at this that it as by".split()
    ),
    "de": frozenset(
        "der die das und oder von zu im ist sind war waren mit für auf bei dies als ein eine".split()
    ),
}

#: fingerprint modulus: the Mersenne prime 2^61 - 1 (values fit BIGINT,
#: so the DuckDB oracle computes the identical hash in HUGEINT arithmetic)
FP_MOD = (1 << 61) - 1
FP_BASE = 1_000_003


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized (a * b) mod (2^61 - 1) for a, b < 2^61 without 128-bit
    ints: split both operands 31/30, reduce the cross terms with
    2^61 ≡ 1 (mod p). All intermediates fit uint64 (max < 2^63)."""
    p = np.uint64(FP_MOD)
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a1 = a >> np.uint64(31)
    a0 = a & np.uint64((1 << 31) - 1)
    b1 = b >> np.uint64(31)
    b0 = b & np.uint64((1 << 31) - 1)
    with np.errstate(over="ignore"):
        t1 = a1 * b1  # * 2^62 == * 2 (mod p)
        t2 = a1 * b0 + a0 * b1  # * 2^31; < 2^62
        m1 = t2 >> np.uint64(30)
        m0 = t2 & np.uint64((1 << 30) - 1)
        s = np.uint64(2) * t1 + m1 + (m0 << np.uint64(31)) + a0 * b0
    s = (s >> np.uint64(61)) + (s & p)
    s = (s >> np.uint64(61)) + (s & p)
    return np.where(s >= p, s - p, s)


def doc_token_stats(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(id, n_tokens, n_unique_tokens, mean_token_len) per doc with >=1 token.

    Vectorized: one flatten + one int64-key unique per batch. Mirrors SQL
    ``GROUP BY doc_id`` over the unnested token table.
    """
    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a)
    ids = batch[id_col].to_numpy()
    n = len(batch)
    n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
    tok_lens = pc.utf8_length(tokens_a).to_numpy().astype(np.float64)
    sum_len = np.bincount(parent, weights=tok_lens, minlength=n)
    denc = pc.dictionary_encode(tokens_a)
    codes = np.asarray(denc.indices, dtype=np.int64)
    uniq_pairs = np.unique((parent.astype(np.int64) << np.int64(32)) | codes)
    n_unique = np.bincount(
        (uniq_pairs >> np.int64(32)).astype(np.int64), minlength=n
    ).astype(np.int64)
    keep = n_tokens > 0
    # mean as exact micro-units: floor((sum/count) * 1e6) — sum/count is an
    # exact-integer ratio in float64, so any engine computes the same bits
    mean_micro = np.floor((sum_len[keep] / n_tokens[keep]) * 1e6).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(ids[keep], type=pa.int64()),
            "n_tokens": pa.array(n_tokens[keep]),
            "n_unique_tokens": pa.array(n_unique[keep]),
            "mean_token_len_micro": pa.array(mean_micro),
        }
    )


class QualityScorer:
    """Actor-pool stage: heuristic quality features + score per document.

    Features (all deterministic, vectorized): token count, mean token
    length, unique-token ratio, stopword ratio, alnum character ratio.
    Score is a fixed linear blend in [0, 1] — a stand-in for a learned
    quality model; the Ray plumbing (actor pool, arrow batches) is the
    real deliverable, the weights are pinned constants.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.stop_en = pa.array(sorted(_LANG_STOPWORDS["en"]), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_col, text_col = self.id_col, self.text_col
        parent_a, tokens_a = flatten_tokens(batch[text_col])
        parent = np.asarray(parent_a)
        n = len(batch)
        n_tokens = np.bincount(parent, minlength=n).astype(np.float64)
        is_stop = pc.is_in(tokens_a, value_set=self.stop_en).to_numpy(zero_copy_only=False)
        stop_ratio = np.bincount(parent, weights=is_stop.astype(np.float64), minlength=n)
        stop_ratio = np.divide(stop_ratio, n_tokens, out=np.zeros(n), where=n_tokens > 0)
        tok_lens = pc.utf8_length(tokens_a).to_numpy().astype(np.float64)
        mean_len = np.divide(
            np.bincount(parent, weights=tok_lens, minlength=n),
            n_tokens,
            out=np.zeros(n),
            where=n_tokens > 0,
        )
        denc = pc.dictionary_encode(tokens_a)
        codes = np.asarray(denc.indices, dtype=np.int64)
        uniq = np.unique((parent.astype(np.int64) << np.int64(32)) | codes)
        n_unique = np.bincount((uniq >> np.int64(32)).astype(np.int64), minlength=n)
        uniq_ratio = np.divide(n_unique, n_tokens, out=np.zeros(n), where=n_tokens > 0)

        # pinned blend: favors mid-length tokens, diverse vocab, some stopwords
        score = (
            0.25 * np.clip(n_tokens / 256.0, 0, 1)
            + 0.25 * np.clip(uniq_ratio, 0, 1)
            + 0.25 * np.clip(stop_ratio * 5.0, 0, 1)
            + 0.25 * np.clip((mean_len - 2.0) / 8.0, 0, 1)
        )
        # micro-int outputs (floor(x * 1e6)): every input is an
        # exact-integer ratio/difference in float64, so the DuckDB oracle
        # (identical op order: a/b, *5, -2, /8, 0.25-weighted sum) computes
        # the same bits and the same floor — hash-stable across engines
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "stopword_ratio_micro": pa.array(
                    np.floor(stop_ratio * 1e6).astype(np.int64)
                ),
                "unique_ratio_micro": pa.array(
                    np.floor(uniq_ratio * 1e6).astype(np.int64)
                ),
                "mean_token_len_micro": pa.array(
                    np.floor(mean_len * 1e6).astype(np.int64)
                ),
                "quality_score_micro": pa.array(np.floor(score * 1e6).astype(np.int64)),
            }
        )


class LangId:
    """Actor-pool language-ID heuristic: stopword-hit voting per language.

    Deterministic n-gram-free heuristic: the language whose stopword set
    hits the most tokens wins; below ``min_hits`` hits -> 'und'. State
    (value sets) is built once per actor (SURVEY.md ST3 pattern).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", min_ratio: float = 0.03):
        self.id_col = id_col
        self.text_col = text_col
        self.min_ratio = min_ratio
        self.sets = {
            lang: pa.array(sorted(words), type=pa.string())
            for lang, words in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent_a, tokens_a = flatten_tokens(batch[self.text_col])
        parent = np.asarray(parent_a)
        n = len(batch)
        n_tokens = np.maximum(np.bincount(parent, minlength=n), 1).astype(np.float64)
        langs = sorted(self.sets)
        ratios = np.zeros((len(langs), n))
        for i, lang in enumerate(langs):
            hits = pc.is_in(tokens_a, value_set=self.sets[lang]).to_numpy(zero_copy_only=False)
            ratios[i] = np.bincount(parent, weights=hits.astype(np.float64), minlength=n) / n_tokens
        best = np.argmax(ratios, axis=0)
        best_ratio = ratios[best, np.arange(n)]
        pred = np.array(langs, dtype=object)[best]
        pred[best_ratio < self.min_ratio] = "und"
        # confidence as floor(ratio * 1e6): the ratio is an exact-integer
        # quotient in float64, so the SQL oracle reproduces it bit-exactly
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                "pred_lang": pa.array(pred, type=pa.string()),
                "confidence_micro": pa.array(
                    np.floor(best_ratio * 1e6).astype(np.int64)
                ),
            }
        )


def doc_fingerprint(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Rolling polynomial hash over the token stream -> (id, fingerprint).

    fp(doc) = sum_i token_hash_i * BASE^(n_doc-1-i)  mod (2^61 - 1), with
    token_hash = lower-64 bits of md5(token) (little-endian, DuckDB's
    ``md5_number_lower``) reduced mod 2^61-1. Order-sensitive (unlike a
    bag-of-words hash), fits BIGINT, and a DuckDB recursive-CTE oracle
    reproduces it exactly. Vectorized: md5 once per DISTINCT token,
    powers from one sequential modmul chain (max-doc-length long), the
    per-token products via branch-free 61-bit modular multiply, per-doc
    sums via overflow-safe hi/lo split scatter-adds.
    """
    import hashlib

    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a).astype(np.int64)
    denc = pc.dictionary_encode(tokens_a)
    codes = np.asarray(denc.indices, dtype=np.int64)
    n = len(batch)
    fps = np.zeros(n, dtype=np.uint64)
    if len(codes):
        uniq_hash = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
                % FP_MOD
                for t in denc.dictionary.to_pylist()
            ),
            dtype=np.uint64,
            count=len(denc.dictionary),
        )
        tok_hash = uniq_hash[codes]
        counts = np.bincount(parent, minlength=n)
        ends = np.cumsum(counts)
        # position from the end of each doc's token run
        idx = np.arange(len(parent), dtype=np.int64)
        pos_from_end = ends[parent] - 1 - idx
        max_pow = int(pos_from_end.max()) + 1
        pw, v = [], 1
        for _ in range(max_pow):
            pw.append(v)
            v = (v * FP_BASE) % FP_MOD
        powers = np.asarray(pw, dtype=np.uint64)
        contrib = _mulmod61(tok_hash, powers[pos_from_end])
        # per-doc sum without uint64 overflow: split each (< 2^61)
        # contribution into 32-bit halves, sum halves exactly, recombine
        # mod p (hi * 2^32 mod p via the same 61-bit modmul)
        acc_hi = np.zeros(n, dtype=np.uint64)
        acc_lo = np.zeros(n, dtype=np.uint64)
        np.add.at(acc_hi, parent, contrib >> np.uint64(32))
        np.add.at(acc_lo, parent, contrib & np.uint64(0xFFFFFFFF))
        p = np.uint64(FP_MOD)
        fps = (
            _mulmod61(acc_hi % p, np.full(n, (1 << 32) % FP_MOD, dtype=np.uint64))
            + acc_lo % p
        ) % p
    return pa.table(
        {
            id_col: batch[id_col].cast(pa.int64()),
            "fingerprint": pa.array(fps.astype(np.int64)),
        }
    )


def doc_repetition_stats(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> pa.Table:
    """Within-doc repetition signals (Gopher/RefinedWeb-style quality
    filters): per doc with >= n tokens, the total and distinct token
    n-gram counts and the duplicate fraction (micro-units, floor —
    exact-integer ratio in float64 so any engine computes the same bits).

    Vectorized: token hashes + one rolling splitmix64 chain per batch
    (shared machinery with the dedup shinglers), one lexsort for the
    distinct count — no per-doc Python.
    """
    from oscar_ray.stages.dedup import _token_hashes, _SHINGLE_SEED, _splitmix64

    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a).astype(np.int64)
    ids = batch[id_col].to_numpy()
    nb = len(batch)
    th = _token_hashes(tokens_a)
    N = len(th)
    n_total = np.zeros(nb, dtype=np.int64)
    n_distinct = np.zeros(nb, dtype=np.int64)
    if N >= n:
        W = N - n + 1
        acc = np.full(W, _SHINGLE_SEED, dtype=np.uint64)
        for j in range(n):
            acc = _splitmix64(acc ^ th[j : j + W])
        wparent = parent[:W]
        valid = parent[n - 1 :] == wparent
        acc, wparent = acc[valid], wparent[valid]
        n_total = np.bincount(wparent, minlength=nb).astype(np.int64)
        if len(acc):
            order = np.lexsort((acc, wparent))
            a_s, p_s = acc[order], wparent[order]
            first = np.ones(len(a_s), dtype=bool)
            first[1:] = (p_s[1:] != p_s[:-1]) | (a_s[1:] != a_s[:-1])
            n_distinct = np.bincount(p_s[first], minlength=nb).astype(np.int64)
    keep = n_total > 0
    dup_frac_micro = np.floor(
        (1.0 - n_distinct[keep] / n_total[keep]) * 1e6
    ).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(ids[keep], type=pa.int64()),
            "n_ngrams": pa.array(n_total[keep]),
            "n_distinct_ngrams": pa.array(n_distinct[keep]),
            "dup_frac_micro": pa.array(dup_frac_micro),
        }
    )


#: winnowing selection packs (fp40, pos) into one int64 key
WINNOW_FP_BITS = 40
WINNOW_POS_BITS = 20


def winnowing_fingerprints(
    batch: pa.Table,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    local fingerprinting scheme) -> (id, pos, fp) rows.

    Per doc: k-gram hashes over the token stream (polynomial in the
    per-token md5 hashes, mod 2^61-1 — the exact doc_fingerprint
    discipline, so DuckDB reproduces every value), reduced to
    ``WINNOW_FP_BITS`` bits; each length-``w`` window of consecutive
    k-gram hashes selects its minimum, tie broken toward the LEFTMOST
    position (pinned variant; classic winnowing picks rightmost — the
    guarantee, one fingerprint per w-window, is identical) by packing
    ``key = fp * 2^20 + pos`` and taking the window min. Distinct
    selected (pos, fp) pairs are the fingerprint set; any shared
    substring of length >= w + k - 1 tokens is guaranteed to share a
    fingerprint.

    Fully vectorized: md5 once per DISTINCT token, one modmul chain per
    k offset, ``sliding_window_view`` min per batch (w is small), doc
    boundaries masked. Per-doc complete -> embarrassingly parallel
    map_batches; no exchange. Docs need >= k + w - 1 tokens to emit.
    Position cap 2^20 tokens/doc (asserted), fp collision budget 2^-40.
    """
    import hashlib

    from numpy.lib.stride_tricks import sliding_window_view

    parent_a, tokens_a = flatten_tokens(batch[text_col])
    parent = np.asarray(parent_a).astype(np.int64)
    ids = batch[id_col].cast(pa.int64()).to_numpy()
    empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
            "fp": pa.array([], type=pa.int64()),
        }
    )
    n_tok = len(parent)
    if n_tok < k + w - 1:
        return empty
    denc = pc.dictionary_encode(tokens_a)
    codes = np.asarray(denc.indices, dtype=np.int64)
    uniq_hash = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
            % FP_MOD
            for t in denc.dictionary.to_pylist()
        ),
        dtype=np.uint64,
        count=len(denc.dictionary),
    )
    th = uniq_hash[codes]

    # k-gram polynomial hash per window start (same-doc starts only)
    n_sh = n_tok - k + 1
    base = np.full(n_sh, 0, dtype=np.uint64)
    for j in range(k):
        base = _mulmod61(base, np.full(n_sh, FP_BASE, dtype=np.uint64))
        with np.errstate(over="ignore"):
            base = base + th[j : j + n_sh]
        base = np.where(base >= np.uint64(FP_MOD), base - np.uint64(FP_MOD), base)
    same_doc = parent[:n_sh] == parent[k - 1 :]
    fp40 = base >> np.uint64(61 - WINNOW_FP_BITS)

    # position within the doc (token index of the k-gram start)
    starts = np.flatnonzero(np.diff(parent, prepend=-1))
    doc_start = np.zeros(n_tok, dtype=np.int64)
    doc_start[starts] = starts
    doc_start = np.maximum.accumulate(doc_start)
    pos = np.arange(n_sh, dtype=np.int64) - doc_start[:n_sh]
    if int(pos.max()) >= (1 << WINNOW_POS_BITS):  # explicit: asserts strip under -O
        raise ValueError(
            f"document exceeds the {1 << WINNOW_POS_BITS}-token winnowing "
            "position budget; split oversized docs upstream"
        )
    key = (fp40.astype(np.int64) << WINNOW_POS_BITS) | pos

    if n_sh < w:
        return empty
    wins = sliding_window_view(key, w).min(axis=1)  # window i covers [i, i+w)
    # full windows of w VALID shingles: all starts in one doc (parent
    # run) and the LAST shingle's k-gram inside it (validity within a
    # doc's start-run is monotone — only the tail k-1 starts cross out)
    ok = (parent[: n_sh - w + 1] == parent[w - 1 : n_sh]) & same_doc[w - 1 :]
    sel_doc = parent[: n_sh - w + 1][ok]
    sel_key = wins[ok]
    if not len(sel_key):
        return empty
    # distinct (doc, key) in (doc, pos) order: keys embed pos so one
    # lexsort orders and dedups both
    order = np.lexsort((sel_key, sel_doc))
    sd, sk = sel_doc[order], sel_key[order]
    first = np.ones(len(sk), dtype=bool)
    first[1:] = (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])
    sd, sk = sd[first], sk[first]
    return pa.table(
        {
            id_col: pa.array(ids[sd]),
            "pos": pa.array(sk & np.int64((1 << WINNOW_POS_BITS) - 1)),
            "fp": pa.array(sk >> np.int64(WINNOW_POS_BITS)),
        }
    )
