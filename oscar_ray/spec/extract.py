"""Deterministic html -> text extraction (the input_hint per-row invariant).

BASELINE.json pins: "per-row invariant vs the reference: byte-identical
extracted text per url". The reference's analog is its deterministic
geometry/KV parse per item (``OsmKeyValueObjectStore.cpp:275-278``: values
snapped to a fixed grid so re-ingest is bit-stable).

Our pages fixture (FIXTURES.md §1) generates
``html = <html><head><title>T</title></head><body><p>chunk</p>...</body></html>``
where the ``<p>`` chunks partition the ``text`` column's tokens; so the
normative extractor is: take every ``<p>...</p>`` body in document order,
HTML-unescape it, and join with a single space. ``extract_text(make_html(t))
== t`` byte-identically for every generated row.

No external HTML libs (none are in the container); compiled regex only.
"""

from __future__ import annotations

import html as _html
import re

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_CHUNK_TOKENS = 50  # tokens per <p> chunk in the generator


def extract_text(html_bytes: bytes) -> str:
    """Extract body text from a generated page: concat <p> bodies with ' '."""
    if html_bytes is None:
        return ""
    parts = _P_RE.findall(html_bytes)
    return " ".join(_html.unescape(p.decode("utf-8")) for p in parts)


#: real-web extractor machinery (all compiled once; RE2-free stdlib
#: `re` is fine here — this is a per-actor compiled pattern, and the
#: hot path is a handful of C-level sub() passes per document)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_DROP_RE = re.compile(
    rb"<(script|style|head|noscript|template)\b.*?</\1\s*>", re.S | re.I
)
_BLOCK_RE = re.compile(
    rb"</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|header"
    rb"|footer|nav|blockquote|pre|figure|figcaption|aside|main|form|hr"
    rb"|dd|dt|dl|option|select|fieldset|legend|address|summary|details)"
    rb"\b[^>]*>",
    re.I,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_SPACE_RUN_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RUN_RE = re.compile(r" ?\n[ \n]*")


def extract_text_generic(html_bytes: bytes) -> str:
    """Real-web html -> text: the boilerplate-stripping extractor.

    For arbitrary (non-fixture) pages ingested from WARC: drops
    comments and non-content subtrees (head/script/style/noscript/
    template), turns block-level tags into newlines, strips remaining
    tags, unescapes entities, and collapses whitespace runs (space
    runs -> one space, newline runs -> one newline). Deterministic and
    dependency-free; selected via ``IndexBuildConfig(extractor=
    "generic")``.

    On fixture pages (:func:`make_html` output) this produces the same
    TOKEN stream as :func:`extract_text` (newline vs space separators
    are both non-token bytes), so the index artifacts are byte-identical
    — the pinned extractor remains the default per-row invariant.
    """
    if not html_bytes:
        return ""
    b = _COMMENT_RE.sub(b"", html_bytes)
    b = _DROP_RE.sub(b" ", b)
    b = _BLOCK_RE.sub(b"\n", b)
    b = _TAG_RE.sub(b" ", b)
    s = _html.unescape(b.decode("utf-8", errors="replace"))
    s = _SPACE_RUN_RE.sub(" ", s)
    s = _NL_RUN_RE.sub("\n", s)
    return s.strip()


#: extractor registry for IndexBuildConfig.extractor
EXTRACTORS = {"fixture": extract_text, "generic": extract_text_generic}


def make_html(
    text: str, title: str = "", links: list[tuple[str, str]] | None = None
) -> bytes:
    """Inverse of extract_text for the fixture generator: wrap text chunks in <p>.

    ``links`` (optional) appends a ``<nav>`` block of ``<a href>`` elements
    after the body paragraphs, in order. The fixture extractor reads ONLY
    ``<p>`` bodies, so links never perturb the byte-identical
    extracted-text invariant; :func:`extract_text_generic` (a different
    extractor contract) does surface anchor text as page text, as a real
    boilerplate stripper would.
    """
    toks = text.split(" ") if text else []
    chunks = [" ".join(toks[i : i + _CHUNK_TOKENS]) for i in range(0, len(toks), _CHUNK_TOKENS)]
    if text and not chunks:
        chunks = [text]
    body = "".join(f"<p>{_html.escape(c, quote=False)}</p>" for c in chunks)
    nav = ""
    if links:
        nav = "<nav>" + "".join(
            f'<a href="{_html.escape(u)}">{_html.escape(a, quote=False)}</a>'
            for u, a in links
        ) + "</nav>"
    return (
        "<html><head><title>"
        + _html.escape(title, quote=False)
        + "</title></head><body>"
        + body
        + nav
        + "</body></html>"
    ).encode("utf-8")
