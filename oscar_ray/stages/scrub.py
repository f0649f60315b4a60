"""PII + denylist scrubbing: redact sensitive spans from a text column.

The standard pre-training hygiene pass (emails / IPs / phone numbers plus
a configurable blocklist of terms) expressed as a stateless, shuffle-free
``map_batches`` stage: every pattern is compiled ONCE per actor in
``__init__`` and applied per batch with Arrow's RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex``) — no Python
loop over rows, no data movement beyond the block itself, so at 100 TB
the stage is embarrassingly parallel.

Determinism contract (so a DuckDB oracle can hash-match the output):
both Arrow and DuckDB compile patterns with RE2, so match semantics
(leftmost, non-overlapping, greedy) are identical; patterns are applied
in a FIXED order (email -> ipv4 -> phone -> denylist) because earlier
redactions can destroy later matches (an IP inside a phone-shaped digit
run, a denylist term inside an email local part).

Reference analog: the tag-filter + regex table machinery the reference
applies at extraction time (oscar-create's key/value regex filters,
`oscar-create/readwritefuncs.cpp` filter tables); here the same shape
scrubs rather than selects.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ordered: earlier patterns must not be re-matched by later ones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


class ScrubStage:
    """map_batches actor: count + redact PII patterns and denylist terms.

    Output per row: ``id_col``, ``n_<pattern>`` per PII pattern,
    ``n_denied`` (whole-word denylist hits), ``text_scrubbed``.
    """

    def __init__(
        self,
        denylist: tuple[str, ...] = (),
        id_col: str = "doc_id",
        text_col: str = "text",
        mask: str = "<DENIED>",
        counts: bool = True,
    ):
        self.id_col, self.text_col = id_col, text_col
        self.counts = counts  # False halves the RE2 passes (replace only)
        self.patterns = list(PII_PATTERNS)
        if denylist:
            # whole-word alternation; terms sorted for a pinned pattern
            alt = "|".join(sorted(denylist))
            self.patterns.append(("denied", rf"\b(?:{alt})\b", mask))

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            self.id_col: batch[self.id_col]
        }
        for name, pat, repl in self.patterns:
            if self.counts:
                cols[f"n_{name}"] = pc.cast(
                    pc.count_substring_regex(text, pat), pa.int64()
                )
            text = pc.replace_substring_regex(text, pat, repl)
        cols["text_scrubbed"] = text
        return pa.table(cols)


def scrub_documents(
    ds,
    denylist: tuple[str, ...] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Dataset -> (id, n_email, n_ipv4, n_phone, n_denied, text_scrubbed)."""
    return ds.map_batches(
        ScrubStage,
        fn_constructor_kwargs={
            "denylist": denylist,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
