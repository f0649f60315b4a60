"""Deterministic benchmark/correctness query-set generator (FIXTURES.md §2).

The S7 analog: the reference samples items with a fixed seed and emits
escaped completion strings for its benchmarker
(``oscar-cmd/Workfunctions.cpp:1091-1150``, ``oscarmain.cpp:23``
`srand(0)`). We stratify terms by document frequency and compose
set-algebra expressions: 40% single terms (head/mid/tail), 30% 2-term
ANDs (incl. head∧head — the skew path), 15% ORs, 10% ANDNOTs, 5%
nested trees; k in {1, 10, 100}.
"""

from __future__ import annotations

import numpy as np

#: adapted from the reference's adversarial corpus
#: ``data/tests/oscar-cmd/dont_crash_test.txt`` — parse must fail cleanly,
#: never crash, never return wrong results.
DONT_CRASH_QUERIES = [
    "((marabu (( nix))",
    "+-(%marabu - %+neug)",
    "()",
    "term + ()",
    '"unbalanced',
    "",
    "   ",
    "a " * 5000,
    ")(",
    "- - -",
    "^leading",
    "(a + b))",
    '"unterminated phrase',
    '"a b"~',
    '"a b"~0',
    '"a b"~x',
    'term~9',
    'a_b~1',
    '"" + term',
    '"a b" ~2',  # detached tilde: `~2` is its own (fuzzy-less) raw term
    "%(%",
    "%unterminated",
    "%%",
    "%a(?<=b)%",  # python-valid, RE2-invalid: empty, never a crash
]


def generate_queries(
    term_dfs: dict[str, int], n_queries: int = 100, seed: int = 42
) -> list[dict]:
    """-> [{query_id, query, k}] over the given term->df vocabulary."""
    rng = np.random.default_rng(seed)
    terms = np.array(sorted(term_dfs, key=lambda t: (-term_dfs[t], t)), dtype=object)
    n = len(terms)
    if n == 0:
        return []
    head = terms[: max(1, n // 20)]
    mid = terms[n // 20 : max(2, n // 2)]
    tail = terms[n // 2 :]
    strata = [head, mid, tail]

    def pick(stratum=None) -> str:
        s = stratum if stratum is not None else strata[int(rng.integers(0, 3))]
        if len(s) == 0:
            s = terms
        return str(s[int(rng.integers(0, len(s)))])

    out = []
    for qid in range(n_queries):
        r = rng.random()
        if r < 0.40:
            q = pick()
        elif r < 0.70:
            a = pick(head) if rng.random() < 0.3 else pick()
            q = f"{a} {pick()}"
        elif r < 0.85:
            q = f"{pick()} + {pick()}"
        elif r < 0.95:
            q = f"{pick()} - {pick()}"
        else:
            q = f"({pick()} + {pick()}) {'^' if rng.random() < 0.5 else '-'} ({pick()} {pick()})"
        k = int(rng.choice([1, 10, 100]))
        out.append({"query_id": qid, "query": q, "k": k})
    return out
