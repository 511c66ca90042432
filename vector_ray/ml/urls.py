"""URL normalization, registered-domain extraction and URL-level dedup
— the C4 / RefinedWeb-style web-corpus curation steps (Raffel et al.
2020; Penedo et al. 2023 — public specs). The reference engine has no
URL-curation counterpart; this layers on the same exact-dedup machinery
as ml/dedup.py (SURVEY §2 "beyond the reference" operators).

All per-batch work is vectorized Arrow compute (regex rewrites, one
flattened param sort per batch) — no per-row Python. The only shuffle
in ``url_dedup`` is the hash-bucket exchange of ``bucketed_first``,
keyed on the 64-bit fingerprint of the *normalized* URL, so at 100 TB
the canonical strings themselves never leave their blocks twice.

Normalization spec (exact — the golden oracle mirrors it with
urllib.parse):

- input: absolute ``http(s)://`` URLs without userinfo/IPv6 (out-of-
  shape rows pass through unchanged, lowercased scheme+host only if
  they parse);
- drop the ``#fragment``;
- lowercase scheme and netloc; strip one leading ``www.``; strip the
  scheme-default port (``:80`` for http, ``:443`` for https — other
  ports kept);
- strip trailing ``/``s from the path (root collapses to empty);
- query: split on ``&``; drop empty params and tracking params
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``); bytewise-
  sort the surviving ``k=v`` strings; rejoin with ``&`` (the ``?`` is
  dropped when nothing survives).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F
from vector_ray.stages.base import BatchStep

TRACKING_RE = r"^(?:utm_[^=&]*|fbclid|gclid|msclkid|ref)(?:=|$)"
_SCHEME_HOST_RE = r"^(?P<sh>[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)(?P<path>[^?]*)$"

# simplified public-suffix rule: these second-level labels are
# registries, so the registered domain takes three labels (documented
# approximation — the full PSL is a data file, not an algorithm change)
_SLD_SUFFIXES = ("co", "com", "org", "net", "ac", "gov", "edu")


def _join_params(query: pa.Array) -> pa.Array:
    """Per-row: split on '&', drop empty/tracking params, bytewise-sort
    the rest, rejoin. One flattened Arrow sort for the whole batch."""
    parts = pc.split_pattern(query, "&")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    n = len(query)
    offs = np.asarray(parts.offsets)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    keep = pc.and_(pc.not_equal(flat, ""),
                   pc.invert(pc.match_substring_regex(flat, TRACKING_RE)))
    keep_np = np.asarray(keep.to_numpy(zero_copy_only=False), bool)
    flat = flat.filter(keep)
    row_ids = row_ids[keep_np]
    order = pc.sort_indices(
        pa.table({"r": row_ids, "p": flat}),
        sort_keys=[("r", "ascending"), ("p", "ascending")])
    flat = flat.take(order)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = np.bincount(row_ids, minlength=n)
    new_offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=new_offs[1:])
    lst = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), flat)
    return pc.binary_join(lst, "&")


def normalize_urls(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form per the module spec. Null → null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = pc.is_valid(arr)
    s = pc.fill_null(arr, "")
    s = pc.replace_substring_regex(s, r"#[\s\S]*$", "")
    base = pc.replace_substring_regex(s, r"\?[\s\S]*$", "")
    query = pc.replace_substring_regex(s, r"^[^?]*\??", "")
    m = pc.extract_regex(base, _SCHEME_HOST_RE)
    parsed = pc.is_valid(m)
    sh = pc.fill_null(pc.struct_field(m, "sh"), "")
    path = pc.fill_null(pc.struct_field(m, "path"), "")
    sh = pc.utf8_lower(sh)
    sh = pc.replace_substring_regex(sh, r"^([a-z0-9+.\-]+://)www\.", r"\1")
    sh = pc.replace_substring_regex(sh, r"^(http://[^/:]*):80$", r"\1")
    sh = pc.replace_substring_regex(sh, r"^(https://[^/:]*):443$", r"\1")
    path = pc.replace_substring_regex(path, r"/+$", "")
    joined = _join_params(query)
    rebuilt = pc.binary_join_element_wise(
        sh, path,
        pc.if_else(pc.equal(joined, ""), pa.scalar(""),
                   pc.binary_join_element_wise("?", joined, "")),
        "")
    out = pc.if_else(parsed, rebuilt, s)
    return pc.if_else(valid, out, pa.scalar(None, pa.string()))


def registered_domains(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Registered domain of each URL's host (simplified PSL: two
    labels, or three when the second-level label is a known registry
    suffix like ``co``/``ac`` and the host has >= 3 labels). Unparsable
    rows → null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(arr, "")
    m = pc.extract_regex(pc.utf8_lower(s),
                         r"^[a-z][a-z0-9+.\-]*://(?P<host>[^/:?#]*)")
    host = pc.struct_field(m, "host")
    host = pc.replace_substring_regex(host, r"^www\.", "")
    d2 = pc.struct_field(
        pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$"), "d")
    d3 = pc.struct_field(
        pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d")
    sld = pc.struct_field(
        pc.extract_regex(host, r"(?P<s>[^.]+)\.[^.]+$"), "s")
    want3 = pc.and_(pc.is_in(sld, value_set=pa.array(_SLD_SUFFIXES)),
                    pc.is_valid(d3))
    return pc.if_else(want3, d3, d2)


class NormalizeUrls(BatchStep):
    """Append ``<out>`` = canonical URL and ``<out>_domain`` =
    registered domain for ``field``."""

    def __init__(self, field: str = "url", out: str = "norm_url"):
        self.field = field
        self.out = out

    def transform(self, tbl: pa.Table) -> pa.Table:
        norm = normalize_urls(tbl[self.field])
        tbl = F.set_(tbl, self.out, norm)
        return F.set_(tbl, self.out + "_domain", registered_domains(norm))


def url_dedup(ds, url_col: str = "url", *, id_col: str = "doc_id"):
    """URL-level exact dedup: normalize, then keep the first row (by
    ``id_col``) per canonical URL. Same scale plan as
    ml/dedup.exact_dedup — local pre-dedup bounds rows shuffled, then
    one hash-bucket exchange with vectorized keep-first (no per-key
    Python). Unlike text exact-dedup, the fingerprint is over the
    EXACT canonical string (URL paths are case-sensitive — no
    whitespace/case folding)."""
    normed = NormalizeUrls(url_col, "norm_url").apply(ds)

    def fp(t: pa.Table) -> pa.Table:
        return F.set_(t, "__fp", F.fingerprint(t["norm_url"]))

    def local_first(t: pa.Table) -> pa.Table:
        t = t.sort_by(id_col)
        h = np.asarray(
            t["__fp"].combine_chunks().to_numpy(zero_copy_only=False),
            np.uint64)
        first_idx = np.unique(h, return_index=True)[1]
        if len(first_idx) < len(t):
            t = t.take(pa.array(np.sort(first_idx)))
        return t

    pre = normed.map_batches(fp, batch_format="pyarrow",
                             zero_copy_batch=True)
    pre = pre.map_batches(local_first, batch_format="pyarrow",
                          zero_copy_batch=True)

    from vector_ray.stages.bucketed import bucketed_first

    return bucketed_first(pre, ["__fp"], order_by=id_col, drop=("__fp",))
