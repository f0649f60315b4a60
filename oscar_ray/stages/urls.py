"""URL parsing + per-domain statistics (webtext curation primitives).

Every large-crawl curation pipeline groups by the *registered domain*
(site quotas, domain denylists, per-domain quality priors — the C4 /
Gopher recipes); the reference's analog surface is its per-key
kvstats work item (`oscar-cmd/Workfunctions.cpp` kvstats printers)
keyed here on a column the engine derives from the URL itself.

Kernels (all one ``pyarrow.compute`` pass, no per-row Python):

- :func:`url_hosts` — RFC-3986 authority host (scheme + optional
  userinfo + optional port stripped) via one anchored RE2
  ``extract_regex``.
- :func:`registered_domains` — host -> registered domain: last two
  labels, or last three when the last two are a known two-level
  public suffix (``co.uk``, ``com.au``, ...). The suffix set is the
  short public two-level list inlined below — swap in the full
  public-suffix list at deploy; the selection logic is the same
  ``is_in`` + ``if_else`` either way.

Operator :func:`domain_stats` follows the repo's routing pattern
(quantiles.py shape): batch-level distinct ``(domain, host)``
pre-aggregation — exchange volume ~distinct hosts per batch, never
~rows — then ONE hash(domain)-routed exchange and a vectorized
per-part finalize (n_docs, n_hosts, sum_chars per domain). Head-domain
skew is bounded by the pre-aggregation: a hot domain contributes at
most (blocks x its distinct hosts) exchange rows.

:func:`filter_denied_domains` is the shuffle-free denylist gate:
the (small) denied set rides into each task as a plain frozenset
argument; rows drop via one vectorized ``is_in``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from oscar_ray.stages.dedup import hash_strings_u64

#: common two-level public suffixes (public knowledge; representative
#: subset — the full list is a drop-in replacement)
TWO_LEVEL_SUFFIXES = (
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr", "com.sg",
    "co.in", "co.kr", "co.nz", "co.za",
)

_HOST_PAT = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?(?P<host>[^/:?#]+)"
_D2_PAT = r"(?P<d2>[^.]+\.[^.]+)$"
_D3_PAT = r"(?P<d3>[^.]+\.[^.]+\.[^.]+)$"


def _combine(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def url_hosts(urls) -> pa.Array:
    """URL strings -> authority host (null where not a parseable URL)."""
    urls = _combine(urls)
    st = pc.extract_regex(urls, _HOST_PAT)
    return pc.if_else(pc.is_valid(st), pc.struct_field(st, "host"), None)


def registered_domains(hosts) -> pa.Array:
    """Hosts -> registered domain (suffix-aware last-2/last-3 labels).

    Hosts with fewer than two labels (``localhost``) come back
    unchanged; null stays null.
    """
    hosts = _combine(hosts)
    d2s = pc.extract_regex(hosts, _D2_PAT)
    d2 = pc.if_else(pc.is_valid(d2s), pc.struct_field(d2s, "d2"), hosts)
    d3s = pc.extract_regex(hosts, _D3_PAT)
    d3 = pc.if_else(pc.is_valid(d3s), pc.struct_field(d3s, "d3"), d2)
    is_2l_suffix = pc.is_in(d2, value_set=pa.array(TWO_LEVEL_SUFFIXES))
    return pc.if_else(is_2l_suffix, d3, d2)


class _DomainPairStage:
    """map_batches: batch -> distinct (domain, host, c, chars, part)."""

    def __init__(self, url_col: str, chars_col: str | None, num_parts: int):
        self.url_col, self.chars_col = url_col, chars_col
        self.num_parts = num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        host = url_hosts(batch[self.url_col])
        dom = registered_domains(host)
        keep = pc.is_valid(dom)
        host, dom = host.filter(keep), dom.filter(keep)
        if self.chars_col is not None:
            chars = (
                batch[self.chars_col]
                .filter(keep)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        else:
            chars = np.zeros(len(dom), dtype=np.int64)
        empty = pa.table(
            {
                "domain": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
                "chars": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if not len(dom):
            return empty
        denc = _combine(host.dictionary_encode())
        codes = np.asarray(denc.indices, dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        codes_s, chars_s = codes[order], chars[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        c = np.diff(np.r_[starts, len(codes_s)]).astype(np.int64)
        csum = np.add.reduceat(chars_s, starts) if len(starts) else chars_s[:0]
        u_host = denc.dictionary.take(pa.array(codes_s[starts]))
        u_dom = registered_domains(u_host)
        part = (hash_strings_u64(u_dom) % np.uint64(self.num_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                "domain": u_dom,
                "host": u_host,
                "c": pa.array(c),
                "chars": pa.array(csum.astype(np.int64)),
                "part": pa.array(part),
            }
        )


def _part_stats(g: pa.Table) -> pa.Table:
    """One routed part: (domain, host, c, chars) -> per-domain stats."""
    dom_d = _combine(_combine(g["domain"]).dictionary_encode())
    dcodes = np.asarray(dom_d.indices, dtype=np.int64)
    host_d = _combine(_combine(g["host"]).dictionary_encode())
    hcodes = np.asarray(host_d.indices, dtype=np.int64)
    c = g["c"].to_numpy()
    chars = g["chars"].to_numpy()
    order = np.lexsort((hcodes, dcodes))
    dcodes, hcodes, c, chars = dcodes[order], hcodes[order], c[order], chars[order]
    d_starts = np.flatnonzero(np.r_[True, dcodes[1:] != dcodes[:-1]])
    n_docs = np.add.reduceat(c, d_starts) if len(d_starts) else c[:0]
    sum_chars = np.add.reduceat(chars, d_starts) if len(d_starts) else chars[:0]
    # distinct hosts per domain: count boundaries within each segment
    new_host = np.r_[True, (dcodes[1:] != dcodes[:-1]) | (hcodes[1:] != hcodes[:-1])]
    n_hosts = np.add.reduceat(new_host.astype(np.int64), d_starts) if len(d_starts) else c[:0]
    return pa.table(
        {
            "domain": dom_d.dictionary.take(pa.array(dcodes[d_starts])),
            "n_docs": pa.array(n_docs.astype(np.int64)),
            "n_hosts": pa.array(n_hosts),
            "sum_chars": pa.array(sum_chars.astype(np.int64)),
        }
    )


def domain_stats(
    ds: ray.data.Dataset,
    url_col: str = "url",
    chars_col: str | None = None,
    num_parts: int = 32,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """-> one row per registered domain: (domain, n_docs, n_hosts, sum_chars)."""
    pairs = ds.map_batches(
        _DomainPairStage,
        fn_constructor_kwargs={
            "url_col": url_col,
            "chars_col": chars_col,
            "num_parts": num_parts,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return pairs.groupby("part").map_groups(
        lambda g: _part_stats(g.drop_columns(["part"])),
        batch_format="pyarrow",
    )


def filter_denied_domains(
    ds: ray.data.Dataset,
    denied: tuple[str, ...],
    url_col: str = "url",
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Drop rows whose registered domain is in ``denied`` (shuffle-free).

    ``denied`` entries are registered domains (``spam.example``); the
    set ships inside the task closure (UT1-style denylists are a few
    MB — broadcast via ``ray.put`` if yours is bigger).
    """
    value_set = pa.array(sorted(set(denied)), type=pa.string())

    def _gate(batch: pa.Table) -> pa.Table:
        dom = registered_domains(url_hosts(batch[url_col]))
        bad = pc.is_in(dom, value_set=value_set)
        return batch.filter(pc.if_else(pc.is_valid(bad), pc.invert(bad), True))

    return ds.map_batches(_gate, batch_format="pyarrow", concurrency=concurrency)


# --------------------------------------------------------------------------
# URL canonicalization (the crawl-dedup pre-step): one pinned, vectorized
# normal form so syntactic variants of the same resource collapse before
# exact/URL dedup. Rule (documented envelope — no IDN/percent-encoding
# normalization, userinfo kept verbatim):
#   1. scheme and host lowercase
#   2. default ports stripped (http:80, https:443)
#   3. empty path -> "/"
#   4. query: params split on '&'; empties and 'utm_'-prefixed tracking
#      params dropped; remainder sorted lexicographically (whole "k=v"
#      string, duplicates kept); '?' dropped when nothing remains
#   5. fragment stripped
# Strings that don't parse as scheme://... URLs pass through UNCHANGED.
# --------------------------------------------------------------------------

_URL_PAT = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)
_AUTH_PAT = r"^(?:(?P<user>[^@]*)@)?(?P<host>[^:]*)(?::(?P<port>[0-9]*))?$"


def _canon_queries(query: pa.Array) -> pa.Array:
    """Vectorized param filter+sort: explode -> lexsort -> rebuild lists."""
    n = len(query)
    lists = pc.split_pattern(pc.fill_null(query, ""), pattern="&")
    parent = np.asarray(pc.list_parent_indices(lists), dtype=np.int64)
    flat = pc.list_flatten(lists)
    keep = pc.and_(
        pc.not_equal(flat, ""), pc.invert(pc.starts_with(flat, pattern="utm_"))
    )
    parent = parent[np.asarray(keep)]
    flat = flat.filter(keep)
    params = flat.to_numpy(zero_copy_only=False).astype(str)
    order = np.lexsort((params, parent))
    counts = np.bincount(parent, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    sorted_lists = pa.ListArray.from_arrays(pa.array(offsets), flat.take(pa.array(order)))
    return pc.binary_join(sorted_lists, "&")


def canonicalize_urls(urls) -> pa.Array:
    """One canonical string per input url (see module rule above)."""
    urls = _combine(urls)
    parts = pc.extract_regex(urls, pattern=_URL_PAT)
    valid = parts.is_valid()
    # null structs (non-URLs): run the kernels on "" placeholders, then
    # if_else the originals back in at the end
    def f(name):
        return pc.fill_null(pc.struct_field(parts, name), "")

    auth = pc.extract_regex(f("auth"), pattern=_AUTH_PAT)

    def a(name):
        return pc.fill_null(pc.struct_field(auth, name), "")

    scheme = pc.utf8_lower(f("scheme"))
    host = pc.utf8_lower(a("host"))
    port = a("port")
    user = a("user")
    default_port = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    port_sfx = pc.if_else(
        pc.or_(default_port, pc.equal(port, "")),
        "",
        pc.binary_join_element_wise(":", port, ""),
    )
    # the user group only matches when an '@' was present, but '' user
    # ("@host") still needs the separator — distinguish via raw auth
    has_at = pc.match_substring(f("auth"), pattern="@")
    user_pfx = pc.if_else(
        has_at, pc.binary_join_element_wise(user, "@", ""), ""
    )
    path = pc.if_else(pc.equal(f("path"), ""), "/", f("path"))
    q = _canon_queries(f("query"))
    q_sfx = pc.if_else(
        pc.equal(q, ""), "", pc.binary_join_element_wise("?", q, "")
    )
    canon = pc.binary_join_element_wise(
        scheme, "://", user_pfx, host, port_sfx, path, q_sfx, ""
    )
    return pc.if_else(valid, canon, urls)
