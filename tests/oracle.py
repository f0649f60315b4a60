"""Pure-Python/NumPy exact oracle for the search engine (FIXTURES.md §3).

Independent implementation of the pinned semantics: tokenize with the
spec kernels, exact tf/df, textbook BM25 in float64, naive set algebra
over Python dicts, exhaustive scoring, ties by docid ascending. The
distributed engine must match rank-identically and score-identically.
"""

from __future__ import annotations

import math
from collections import Counter

from oscar_ray.index.layout import SUFFIX_MARKER, term_partition  # noqa: F401
from oscar_ray.query.parser import (
    Node,
    Op,
    Prefix,
    Substring,
    Term,
    parse_query,
    QueryParseError,
)
from oscar_ray.spec.tokenizer import tokenize_text

MAX_PREFIX_EXPANSIONS = 256  # pinned, mirrors engine.MAX_PREFIX_EXPANSIONS


class OracleIndex:
    def __init__(
        self,
        rows: list[dict],
        dedup_urls: bool = True,
        k1: float = 0.9,
        b: float = 0.4,
        index_suffixes: bool = False,
        min_suffix_len: int = 2,
    ):
        """rows: dicts with docid, url, text (docid unique, any order)."""
        rows = sorted(rows, key=lambda r: r["docid"])
        self.k1, self.b = k1, b
        self.index_suffixes = index_suffixes
        self.min_suffix_len = min_suffix_len
        kept: list[dict] = []
        seen: dict[str, int] = {}
        self.tombstones: set[int] = set()
        for r in rows:
            if dedup_urls and r["url"] in seen:
                self.tombstones.add(r["docid"])
                continue
            seen[r["url"]] = r["docid"]
            kept.append(r)
        self.doclen: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for r in kept:
            toks = tokenize_text(r["text"])
            self.doclen[r["docid"]] = len(toks)
            for t, tf in Counter(toks).items():
                self.postings.setdefault(t, {})[r["docid"]] = tf
                if index_suffixes:
                    for i in range(len(t)):
                        s = t[i:]
                        if len(s) < min_suffix_len:
                            break
                        p = self.postings.setdefault(SUFFIX_MARKER + s, {})
                        p[r["docid"]] = p.get(r["docid"], 0) + tf
        self.n_docs = len(kept)
        self.avgdl = (sum(self.doclen.values()) / self.n_docs) if self.n_docs else 0.0

    @classmethod
    def from_parquet_dir(cls, path: str, **kw) -> "OracleIndex":
        """Load a pages dir with the same deterministic docid assignment."""
        from oscar_ray.sources.pages import list_fragments, read_fragment

        rows = []
        for frag in list_fragments(path):
            t = read_fragment(frag, columns=["url", "text"])
            rows.extend(t.to_pylist())
        return cls(rows, **kw)

    # ------------------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def term_scores(self, term: str) -> dict[int, float]:
        idf = self.idf(term)
        k1, b, avgdl = self.k1, self.b, max(self.avgdl, 1e-9)
        out = {}
        for d, tf in self.postings.get(term, {}).items():
            dl = self.doclen[d]
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            out[d] = idf * tfn
        return out

    def evaluate(self, node: Node | None) -> dict[int, float]:
        if node is None:
            return {}
        if isinstance(node, (Prefix, Substring)):
            if isinstance(node, Prefix):
                pre = node.prefix
            elif node.exact_suffix:
                return self.term_scores(SUFFIX_MARKER + node.token)
            else:
                pre = SUFFIX_MARKER + node.token
            terms = sorted(t for t in self.postings if t.startswith(pre))
            terms = terms[:MAX_PREFIX_EXPANSIONS]
            out: dict[int, float] = {}
            for t in terms:  # ascending — same accumulation order as engine
                for d, s in self.term_scores(t).items():
                    out[d] = out[d] + s if d in out else s
            return out
        if isinstance(node, Term):
            return self.term_scores(node.token)
        l = self.evaluate(node.left)
        r = self.evaluate(node.right)
        if node.kind == "and":
            return {d: l[d] + r[d] for d in l if d in r}
        if node.kind == "or":
            out = dict(l)
            for d, s in r.items():
                out[d] = out[d] + s if d in out else s
            return out
        if node.kind == "andnot":
            return {d: s for d, s in l.items() if d not in r}
        if node.kind == "xor":
            out = {d: s for d, s in l.items() if d not in r}
            out.update({d: s for d, s in r.items() if d not in l})
            return out
        raise AssertionError(node.kind)

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        try:
            node = parse_query(query)
        except QueryParseError:
            return []
        scored = self.evaluate(node)
        return sorted(scored.items(), key=lambda it: (-it[1], it[0]))[:k]
