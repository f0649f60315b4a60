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


def make_html(text: str, title: str = "") -> bytes:
    """Inverse of extract_text for the fixture generator: wrap text chunks in <p>."""
    toks = text.split(" ") if text else []
    chunks = [" ".join(toks[i : i + _CHUNK_TOKENS]) for i in range(0, len(toks), _CHUNK_TOKENS)]
    if text and not chunks:
        chunks = [text]
    body = "".join(f"<p>{_html.escape(c, quote=False)}</p>" for c in chunks)
    return (
        "<html><head><title>"
        + _html.escape(title, quote=False)
        + "</title></head><body>"
        + body
        + "</body></html>"
    ).encode("utf-8")
