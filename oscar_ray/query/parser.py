"""Set-algebra query parser.

Re-expresses the reference's AdvancedCellOpTree operator set
(``oscar-cmd/DecelledACOT.cpp:73-95``: ``+`` union, ``/`` or
whitespace-adjacency intersection, ``-`` difference, ``^`` symmetric
difference, parenthesized subtrees) for web documents. Geometry leaves
(RECT/POLYGON/..., ``DecelledACOT.cpp:109-186``) are out of scope per
BASELINE.json north_rule.

Grammar (ops left-associative, single precedence level, like the
reference's sequential op-tree evaluation):

    expr  := item ((OP)? item)*        # missing OP == intersection
    item  := TERM | '(' expr ')'
    OP    := '+' | '-' | '^' | '/'
    TERM  := word | word'*' | '*'word('*')? | '@'field':'value
           | '"' words '"'             # phrase (adjacent tokens, in order)
           | '"' words '"' '~' K       # proximity (all tokens within span K)
           | word '~' (1|2)?           # fuzzy (edit distance <= d, default 1)
           | '%' pattern '%'           # regex over dictionary terms (RE2)

TERM text is normalized with the pinned tokenizer spec; a term that
normalizes to several tokens (e.g. "foo-bar") becomes their
intersection, a term that normalizes to nothing is dropped from its
parent (and an expression with no surviving leaves is empty).

Malformed input (unbalanced parens, empty groups, dangling operators)
raises QueryParseError — the engine maps that to an empty result, per
the reference's don't-crash corpus contract
(``data/tests/oscar-cmd/dont_crash_test.txt``).
"""

from __future__ import annotations

from dataclasses import dataclass

from oscar_ray.spec.tokenizer import tokenize_text


class QueryParseError(ValueError):
    pass


@dataclass(frozen=True)
class Term:
    token: str

    def __repr__(self):
        return f"T({self.token})"


@dataclass(frozen=True)
class Prefix:
    """Prefix leaf (`foo*`) — the reference's qt=prefix query type
    (``oscar-create/Config.h`` capability matrix; trie descent analog).
    Evaluated as the union of all dictionary terms with this prefix."""

    prefix: str

    def __repr__(self):
        return f"P({self.prefix}*)"


@dataclass(frozen=True)
class Substring:
    """Substring (`*foo*`) or exact-suffix (`*foo`) leaf — the reference's
    qt=substring/suffix query types, answered via the optional suffix
    index (IndexBuildConfig.index_suffixes)."""

    token: str
    exact_suffix: bool = False  # True for `*foo` (token ends with foo)

    def __repr__(self):
        return f"S(*{self.token}{'' if self.exact_suffix else '*'})"


@dataclass(frozen=True)
class Field:
    """Field-scoped leaf (`@lang:en`) — the reference's tag-string query
    surface (``oscar-create/TextSearchTraits.h:68-86`` inserts
    `"@"+key+":"+value` terms; ``TagStore``-style structured lookup).
    Evaluates as a zero-score FILTER posting list: AND with a Field
    narrows the doc set without perturbing BM25 scores."""

    field: str
    value: str  # normalized value tokens joined with '_'

    @property
    def token(self) -> str:
        from oscar_ray.index.layout import field_term

        return field_term(self.field, [self.value] if self.value else [])

    def __repr__(self):
        return f"F(@{self.field}:{self.value})"


@dataclass(frozen=True)
class Phrase:
    """Quoted-phrase leaf (`"hash join"`): docs containing the exact
    normalized token sequence (adjacent, in order). Needs the positions
    sidecar (IndexBuildConfig.index_positions). Scored as ONE virtual
    term: BM25 with tf = phrase occurrence count (overlaps counted) and
    df = matching-doc count."""

    tokens: tuple[str, ...]

    def __repr__(self):
        return f'Ph("{" ".join(self.tokens)}")'


@dataclass(frozen=True)
class Proximity:
    """Windowed leaf (`"web index"~4`): docs where ONE occurrence of every
    distinct token fits in a span of <= slop (max pos - min pos, unordered;
    adjacency == slop 1). Positional FILTER over the tokens' AND — scores
    are the plain AND scores (sum of member-term BM25), the window only
    narrows the doc set."""

    tokens: tuple[str, ...]  # distinct, first-appearance order
    slop: int

    def __repr__(self):
        return f'Px("{" ".join(self.tokens)}"~{self.slop})'


@dataclass(frozen=True)
class Regex:
    """Regex leaf (`%pat%`, Lucene RegexpQuery analog): union of all
    dictionary terms FULLY matching the RE2 pattern, ascending, with the
    prefix expansion cap. The pattern is matched against normalized
    dictionary terms (lowercase letters/digits), never raw text."""

    pattern: str

    def __repr__(self):
        return f"Rx(%{self.pattern}%)"


@dataclass(frozen=True)
class Fuzzy:
    """Fuzzy leaf (`merge~` / `merge~2`): union of all dictionary terms
    within Levenshtein distance max_dist (1 or 2, Lucene-style cap),
    ascending term order, capped at MAX_PREFIX_EXPANSIONS like a prefix —
    expand via engine.expand_prefixes before evaluation."""

    token: str
    max_dist: int

    def __repr__(self):
        return f"Fz({self.token}~{self.max_dist})"


@dataclass(frozen=True)
class Op:
    kind: str  # 'and' | 'or' | 'andnot' | 'xor'
    left: "Node"
    right: "Node"

    def __repr__(self):
        return f"({self.left} {self.kind} {self.right})"


Node = Term | Prefix | Substring | Field | Phrase | Proximity | Fuzzy | Regex | Op

_OPS = {"+": "or", "-": "andnot", "^": "xor", "/": "and"}


def _lex(q: str) -> list[str]:
    """Split into '(', ')', operator and raw-term tokens.

    A double-quoted region is ONE token (operators/whitespace inside are
    literal text for the phrase tokenizer), including a directly-attached
    ``~digits`` proximity suffix. An unterminated quote is a parse error
    (don't-crash contract: the engine maps it to an empty result).
    """
    out: list[str] = []
    buf: list[str] = []
    i = 0
    n = len(q)
    while i < n:
        ch = q[i]
        if ch == "%":
            # regex leaf `%pat%`: capture verbatim (op chars are pattern
            # syntax inside); unterminated -> parse error -> empty result
            if buf:
                out.append("".join(buf))
                buf.clear()
            j = q.find("%", i + 1)
            if j < 0:
                raise QueryParseError("unterminated % regex")
            out.append(q[i : j + 1])
            i = j + 1
            continue
        if ch == '"':
            if buf:
                out.append("".join(buf))
                buf.clear()
            j = q.find('"', i + 1)
            if j < 0:
                raise QueryParseError("unterminated quote")
            tok = q[i : j + 1]
            i = j + 1
            if i < n and q[i] == "~":
                k = i + 1
                while k < n and q[k].isdigit():
                    k += 1
                tok += q[i:k]
                i = k
            out.append(tok)
            continue
        if ch in "()+-^/" or ch.isspace():
            if buf:
                out.append("".join(buf))
                buf.clear()
            if ch in "()+-^/":
                out.append(ch)
        else:
            buf.append(ch)
        i += 1
    if buf:
        out.append("".join(buf))
    return out


def parse_query(q: str, max_len: int = 100_000, max_terms: int = 512) -> Node | None:
    """Parse a query string -> AST (None == empty query, no results).

    ``max_terms`` bounds tree size (evaluation is recursive per node);
    oversized queries are a parse error, never a crash.
    """
    if q is None:
        return None
    if len(q) > max_len:
        raise QueryParseError("query too long")
    toks = _lex(q)
    if sum(1 for t in toks if t not in "()+-^/") > max_terms:
        raise QueryParseError("too many terms")
    pos = 0

    def parse_expr(depth: int) -> Node | None:
        nonlocal pos
        if depth > 64:
            raise QueryParseError("query tree too deep")
        node: Node | None = None
        pending_op: str | None = None
        saw_item = False
        while pos < len(toks):
            t = toks[pos]
            if t == ")":
                break
            if t in _OPS:
                if node is None and pending_op is None and not saw_item:
                    raise QueryParseError(f"dangling operator {t!r}")
                if pending_op is not None:
                    raise QueryParseError(f"consecutive operators near {t!r}")
                pending_op = _OPS[t]
                pos += 1
                continue
            if t == "(":
                pos += 1
                sub = parse_expr(depth + 1)
                if pos >= len(toks) or toks[pos] != ")":
                    raise QueryParseError("unbalanced parentheses")
                pos += 1
                item = sub
            else:
                pos += 1
                item = _term_node(t)
            saw_item = True
            if item is None:
                # normalized to nothing: drop it (and its pending op)
                pending_op = None
                continue
            if node is None:
                if pending_op in ("andnot", "xor", "or"):
                    raise QueryParseError("operator without left operand")
                node = item
            else:
                node = Op(pending_op or "and", node, item)
            pending_op = None
        if pending_op is not None:
            raise QueryParseError("trailing operator")
        if not saw_item and depth > 0:
            raise QueryParseError("empty group")
        return node

    node = parse_expr(0)
    if pos != len(toks):
        raise QueryParseError("unbalanced parentheses")
    return node


def _term_node(raw: str) -> Node | None:
    if raw.startswith("@") and ":" in raw:
        fname, _, fval = raw[1:].partition(":")
        vtoks = tokenize_text(fval.replace("_", " "))
        if not fname:
            return None
        # field name stays VERBATIM: the build side keys marker terms by
        # the raw column name (build.py _append_field_pairs), so the query
        # side must not re-normalize it — a tokenized name would silently
        # miss any column that isn't a single plain lowercase token
        # (e.g. "page_rank" -> "pagerank" != the indexed "page_rank")
        # value normalizing to nothing -> impossible term (matches nothing)
        return Field(fname, "_".join(vtoks))
    if raw.startswith("%"):
        pattern = raw[1:-1] if raw.endswith("%") and len(raw) >= 2 else raw[1:]
        if not pattern:
            return None
        import re as _re

        try:
            _re.compile(pattern)
        except _re.error as e:
            raise QueryParseError(f"bad regex {pattern!r}: {e}") from None
        return Regex(pattern)
    if raw.startswith('"'):
        # phrase / proximity: `"..."` or `"..."~K` (the lexer guarantees
        # the closing quote and attaches any ~digits suffix verbatim)
        body, _, suffix = raw[1:].partition('"')
        toks = tuple(tokenize_text(body))
        if suffix:
            if suffix == "~" or not suffix[1:].isdigit():
                raise QueryParseError(f"proximity needs a number: {raw!r}")
            slop = int(suffix[1:])
            if not 1 <= slop <= 1 << 20:
                raise QueryParseError(f"proximity slop out of range: {slop}")
            distinct = tuple(dict.fromkeys(toks))
            if not distinct:
                return None
            if len(distinct) == 1:
                return Term(distinct[0])
            return Proximity(distinct, slop)
        if not toks:
            return None
        if len(toks) == 1:
            return Term(toks[0])
        return Phrase(toks)
    if "~" in raw:
        # fuzzy: `term~`, `term~1`, `term~2` (Lucene-style distance cap)
        base, _, d = raw.partition("~")
        if d not in ("", "1", "2"):
            raise QueryParseError(f"fuzzy distance must be 1 or 2: {raw!r}")
        toks = tokenize_text(base)
        if not toks:
            return None
        if len(toks) != 1:
            raise QueryParseError(f"fuzzy applies to a single token: {raw!r}")
        return Fuzzy(toks[0], int(d) if d else 1)
    lead = raw.startswith("*")
    trail = raw.endswith("*")
    tokens = tokenize_text(raw.strip("*"))
    if not tokens:
        return None
    leaves: list[Node] = [Term(t) for t in tokens]
    if lead and len(tokens) == 1:
        leaves[0] = Substring(tokens[0], exact_suffix=not trail)
    elif trail:
        leaves[-1] = Prefix(tokens[-1])
    node = leaves[0]
    for leaf in leaves[1:]:
        node = Op("and", node, leaf)
    return node


def query_terms(node: Node | None) -> list[str]:
    """All Term leaf tokens, left-to-right (duplicates preserved). Iterative —
    left-deep trees from long queries must not hit the recursion limit.
    Phrase/Proximity member tokens are included (callers highlighting or
    hydrating matches want them); Prefix/Fuzzy leaves are skipped (expand
    them first; see engine.expand_prefixes)."""
    if node is None:
        return []
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, (Term, Field)):
            out.append(n.token)
        elif isinstance(n, (Phrase, Proximity)):
            out.extend(n.tokens)
        elif isinstance(n, Op):
            stack.append(n.right)
            stack.append(n.left)
    return out
