"""Vectorized column kernels — the VRL stdlib re-expressed over Arrow.

Each function takes/returns ``pyarrow.Array`` / ``ChunkedArray`` (or a
``pa.Table`` for the path ops) and is a thin composition of
``pyarrow.compute`` kernels, so every remap program built from these
stays vectorized inside ``map_batches(batch_format="pyarrow")``.

Coverage map (reference ``lib/vrl/stdlib/src/`` function families →
kernels here):

- string:  ``downcase upcase contains starts_with ends_with replace
  slice split join truncate strip_whitespace strip_ansi_escape_codes
  find``
- codec:   ``encode_base64 decode_base64 encode_json``
- type:    ``to_int to_float to_bool to_string to_timestamp
  is_null length`` + ``coerce`` (the ``Conversion`` table of
  ``lib/shared/src/conversion.rs:90-114``)
- math:    ``ceil floor round abs mod``
- hash:    ``md5 sha1 sha2 fingerprint`` (stable 64-bit FNV-1a,
  vectorized — the stand-in for seahash in sample/dedupe keys)
- path:    ``get set del_ rename exists_col merge_struct flatten``
- array:   ``array_length array_unique array_contains tally``
- template: ``render`` ({{field}} templating of
  ``src/template.rs:28-32``)
"""

from __future__ import annotations

import base64 as _b64
import hashlib
import json as _json
import re as _re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# helpers


def _arr(x):
    """Normalize ChunkedArray → Array (combined) for kernels that need numpy."""
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    return x


def const(n: int, value, type=None):
    """Typed constant column — safe for n == 0 (a bare
    ``pa.array([v] * 0)`` infers null type and breaks schema stability
    on empty batches)."""
    if type is None:
        type = pa.scalar(value).type
    return pa.array([value] * n, type=type)


# --------------------------------------------------------------------------
# string family


def downcase(a):
    return pc.utf8_lower(a)


def upcase(a):
    return pc.utf8_upper(a)


def contains(a, sub):
    return pc.match_substring(a, sub)


def starts_with(a, prefix):
    return pc.starts_with(a, prefix)


def ends_with(a, suffix):
    return pc.ends_with(a, suffix)


def replace(a, pattern, replacement, *, regex=False, max_replacements=None):
    if regex:
        return pc.replace_substring_regex(
            a, pattern, replacement, max_replacements=max_replacements
        )
    return pc.replace_substring(a, pattern, replacement, max_replacements=max_replacements)


def slice_(a, start, stop=None):
    return pc.utf8_slice_codeunits(a, start, stop if stop is not None else 2**31 - 1)


def split(a, sep, *, regex=False):
    """String → list<string>. VRL `split` (lib/vrl/stdlib/src/split.rs)."""
    if regex:
        return pc.split_pattern_regex(a, sep)
    return pc.split_pattern(a, sep)


def split_whitespace(a):
    return pc.utf8_split_whitespace(a)


def join(list_arr, joiner):
    return pc.binary_join(list_arr, joiner)


def concat(joiner, *cols):
    """VRL string concat / Vector `concat` transform (src/transforms/concat.rs)."""
    return pc.binary_join_element_wise(*cols, joiner)


def truncate(a, limit, *, ellipsis=False):
    out = pc.utf8_slice_codeunits(a, 0, limit)
    if ellipsis:
        needs = pc.greater(pc.utf8_length(a), limit)
        out = pc.if_else(needs, pc.binary_join_element_wise(out, "...", ""), out)
    return out


def strip_whitespace(a):
    return pc.utf8_trim_whitespace(a)


_ANSI_RE = r"\x1b\[[0-9;]*[A-Za-z]"


def strip_ansi_escape_codes(a):
    """src/transforms/ansi_stripper.rs semantics, vectorized."""
    return pc.replace_substring_regex(a, _ANSI_RE, "")


def find(a, sub):
    return pc.find_substring(a, sub)


def length(a):
    """Bytes/chars for strings, list length for lists (VRL `length`)."""
    t = a.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pc.list_value_length(a)
    return pc.utf8_length(a)


def extract_regex(a, pattern):
    """Named-capture regex extract → struct column (null on non-match)."""
    return pc.extract_regex(a, pattern)


# --------------------------------------------------------------------------
# codec family


def encode_base64(a):
    a = _arr(a)
    return pa.array(
        [None if v is None else _b64.b64encode(v.encode()).decode() for v in a.to_pylist()]
    )


def decode_base64(a):
    a = _arr(a)
    return pa.array(
        [None if v is None else _b64.b64decode(v).decode() for v in a.to_pylist()]
    )


def parse_grok(a, pattern: str):
    """VRL ``parse_grok``: expand %{NAME:field} references to named
    groups (vector_ray.grok's pattern library) and extract — struct
    column, null rows on non-match."""
    from vector_ray.grok import expand

    return pc.extract_regex(a, expand(pattern))


def parse_json(a):
    """JSON-object string column → struct column (VRL ``parse_json``;
    invalid or non-object rows → null). Fast path feeds the WHOLE
    column to pyarrow.json's C++ NDJSON reader in one shot; the
    per-row json.loads fallback only runs when rows are invalid,
    null, or contain embedded newlines (same strategy as
    stages/parsers.JsonParser)."""
    a = _arr(a)
    n = len(a)
    if n == 0:
        return pa.nulls(0, pa.struct([]))
    if a.null_count == 0 and not pc.any(
            pc.match_substring(a, "\n")).as_py():
        try:
            import io

            import pyarrow.json as pj

            buf = ("\n".join(a.to_pylist()) + "\n").encode()
            parsed = pj.read_json(io.BytesIO(buf))
            if parsed.num_rows == n:
                return parsed.to_struct_array().combine_chunks()
        except Exception:
            pass
    rows = []
    for v in a.to_pylist():
        try:
            obj = _json.loads(v) if v is not None else None
            rows.append(obj if isinstance(obj, dict) else None)
        except Exception:
            rows.append(None)
    return pa.array(rows)


def encode_json(tbl_or_arr):
    """Row → JSON string. Non-hot-path utility (metric_to_log etc.)."""
    if isinstance(tbl_or_arr, pa.Table):
        rows = tbl_or_arr.to_pylist()
    else:
        rows = _arr(tbl_or_arr).to_pylist()
    return pa.array([_json.dumps(r, default=str, sort_keys=True) for r in rows])


# --------------------------------------------------------------------------
# type family  (Conversion table, lib/shared/src/conversion.rs:90-114)


def to_int(a):
    return pc.cast(a, pa.int64())


def to_float(a):
    return pc.cast(a, pa.float64())


def to_string(a):
    return pc.cast(a, pa.string())


_TRUE = {"true", "t", "yes", "y", "1"}
_FALSE = {"false", "f", "no", "n", "0"}


def to_bool(a):
    """String → bool with Vector's truthy table (conversion.rs:parse_bool)."""
    t = _arr(a).type if not isinstance(a, pa.Table) else None
    if pa.types.is_boolean(a.type):
        return a
    if pa.types.is_integer(a.type) or pa.types.is_floating(a.type):
        return pc.not_equal(a, 0)
    low = pc.utf8_lower(pc.utf8_trim_whitespace(a))
    is_t = pc.is_in(low, value_set=pa.array(sorted(_TRUE)))
    is_f = pc.is_in(low, value_set=pa.array(sorted(_FALSE)))
    return pc.if_else(is_t, True, pc.if_else(is_f, False, pa.scalar(None, pa.bool_())))


def to_timestamp(a, fmt="%Y-%m-%d %H:%M:%S", unit="us"):
    return pc.strptime(a, format=fmt, unit=unit, error_is_null=True)


def coerce(a, kind, fmt=None):
    """The `types = {field = "int"}` option of every parser transform."""
    if kind in ("string", "bytes"):
        return to_string(a)
    if kind == "int":
        return to_int(a)
    if kind == "float":
        return to_float(a)
    if kind == "bool":
        return to_bool(a)
    if kind == "timestamp":
        return to_timestamp(a, fmt or "%Y-%m-%d %H:%M:%S")
    if kind.startswith("timestamp|"):
        return to_timestamp(a, kind.split("|", 1)[1])
    raise ValueError(f"unknown coercion kind: {kind}")


def is_null(a):
    return pc.is_null(a)


# --------------------------------------------------------------------------
# math family


def ceil(a):
    return pc.ceil(a)


def floor(a):
    return pc.floor(a)


def round_(a, ndigits=0):
    return pc.round(a, ndigits=ndigits)


def abs_(a):
    return pc.abs(a)


def mod(a, m):
    # Euclidean/floor modulo (VRL `mod` semantics: result has the sign of
    # the modulus). pc.divide truncates toward zero on int64, so correct
    # the C-style remainder where its sign mismatches the modulus.
    a64 = pc.cast(a, pa.int64())
    r = pc.subtract(a64, pc.multiply(pc.divide(a64, m), m))
    neg = pc.and_(pc.not_equal(r, 0), pc.less(pc.multiply(r, m), 0))
    return pc.if_else(neg, pc.add(r, m), r)


# --------------------------------------------------------------------------
# hash family


def md5(a):
    return pa.array(
        [None if v is None else hashlib.md5(v.encode()).hexdigest() for v in _arr(a).to_pylist()]
    )


def sha1(a):
    return pa.array(
        [None if v is None else hashlib.sha1(v.encode()).hexdigest() for v in _arr(a).to_pylist()]
    )


def sha2(a):
    return pa.array(
        [None if v is None else hashlib.sha256(v.encode()).hexdigest() for v in _arr(a).to_pylist()]
    )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fingerprint(a) -> pa.Array:
    """Stable vectorized 64-bit FNV-1a over utf8 — the engine's seahash
    stand-in for deterministic sampling / dedupe keys / salting
    (reference uses seahash at src/transforms/sample.rs:123,
    src/enrichment_tables/file.rs:301-326). Implemented with numpy over
    the raw Arrow string buffers, no per-row Python.
    """
    arr = _arr(a)
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover - combine_chunks covers
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if len(arr) == 0:
        return pa.array([], pa.uint64())
    from vector_ray.native import get_lib

    lib = get_lib()
    if lib is not None and arr.null_count == 0 and arr.offset == 0:
        import ctypes

        bufs = arr.buffers()
        if bufs[2] is not None:
            out = np.empty(len(arr), dtype=np.uint64)
            offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1)
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            lib.fnv1a_batch(
                data.ctypes.data_as(ctypes.c_void_p),
                offs.ctypes.data_as(ctypes.c_void_p),
                len(arr),
                out.ctypes.data_as(ctypes.c_void_p),
            )
            return pa.array(out, pa.uint64())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    out = np.full(len(arr), _FNV_OFFSET, dtype=np.uint64)
    lengths = np.diff(offsets)
    maxlen = int(lengths.max()) if len(lengths) else 0
    # byte-position-at-a-time FNV: maxlen iterations of fully vectorized ops
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = lengths > i
            idx = offsets[:-1][active] + i
            out[active] = (out[active] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    if arr.null_count:
        mask = np.asarray(arr.is_null())
        return pa.array(out, pa.uint64(), mask=mask)
    return pa.array(out, pa.uint64())


def fingerprint_mod(a, rate: int):
    """fingerprint(a) % rate — the `sample` transform's keep test."""
    f = fingerprint(a)
    return pc.if_else(
        pc.is_valid(f),
        pa.array(np.asarray(f.to_numpy(zero_copy_only=False), dtype=np.uint64) % np.uint64(rate), pa.uint64()),
        pa.scalar(None, pa.uint64()),
    )


# --------------------------------------------------------------------------
# path/table ops  (VRL get/set/del/exists; flat columns, dotted = struct field)


def get(tbl: pa.Table, path: str):
    """Column or dotted struct-field access: "a.b" → struct field b of a."""
    if "." in path and path not in tbl.column_names:
        head, rest = path.split(".", 1)
        col = tbl[head]
        for part in rest.split("."):
            col = pc.struct_field(col, part)
        return col
    return tbl[path]


def set_(tbl: pa.Table, name: str, values) -> pa.Table:
    if isinstance(values, (int, float, str, bool)):
        values = pa.array([values] * len(tbl))
    if name in tbl.column_names:
        i = tbl.column_names.index(name)
        return tbl.set_column(i, name, values)
    return tbl.append_column(name, values)


def del_(tbl: pa.Table, *names: str) -> pa.Table:
    keep = [n for n in tbl.column_names if n not in names]
    return tbl.select(keep)


def rename(tbl: pa.Table, mapping: dict) -> pa.Table:
    return tbl.rename_columns([mapping.get(n, n) for n in tbl.column_names])


def exists_col(tbl: pa.Table, name: str) -> bool:
    return name in tbl.column_names


def merge_struct(tbl: pa.Table, struct_col, *, prefix="", overwrite=True) -> pa.Table:
    """Flatten a struct column's fields into top-level columns (VRL
    `merge(., parsed)` / parser `target_field=None` semantics)."""
    sc = _arr(struct_col)
    for field in sc.type:
        name = prefix + field.name
        vals = pc.struct_field(sc, field.name)
        if name in tbl.column_names and not overwrite:
            continue
        tbl = set_(tbl, name, vals)
    return tbl


def flatten(tbl: pa.Table, col: str, *, sep=".") -> pa.Table:
    """VRL `flatten`: explode struct column `col` into `col.sub` columns."""
    sc = _arr(tbl[col])
    tbl = del_(tbl, col)
    for field in sc.type:
        tbl = set_(tbl, f"{col}{sep}{field.name}", pc.struct_field(sc, field.name))
    return tbl


# --------------------------------------------------------------------------
# array family


def array_length(a):
    return pc.list_value_length(a)


def array_unique(a):
    """Per-row distinct of a list column (VRL `unique`)."""
    arr = _arr(a)
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
        else:
            seen, u = set(), []
            for x in v:
                if x not in seen:
                    seen.add(x)
                    u.append(x)
            out.append(u)
    return pa.array(out, type=arr.type)


def array_contains(a, value):
    """VRL `includes`: list contains value — vectorized via flatten+parent."""
    arr = _arr(a)
    flat_match = pc.equal(pc.list_flatten(arr), value)
    # aggregate per parent row using list_parent_indices
    parents = pc.list_parent_indices(arr)
    out = np.zeros(len(arr), dtype=bool)
    np_match = np.asarray(flat_match.to_numpy(zero_copy_only=False), dtype=bool)
    np.logical_or.at(out, np.asarray(parents), np_match)
    return pa.array(out)


def tally(a):
    """VRL `tally`: per-row value-counts of a list<string> → map-like
    struct rows (returned as JSON strings for schema stability)."""
    arr = _arr(a)
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
        else:
            counts: dict = {}
            for x in v:
                counts[x] = counts.get(x, 0) + 1
            out.append(_json.dumps(counts, sort_keys=True))
    return pa.array(out, pa.string())


# --------------------------------------------------------------------------
# template rendering  (src/template.rs {{field}} substitution)

_TMPL_RE = _re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render(tbl: pa.Table, template: str):
    """Vectorized `{{field}}` template → string column.

    Splits the template into literal/field parts once, then one
    binary_join_element_wise call. Mirrors src/template.rs:28-32.
    """
    parts = []
    last = 0
    for m in _TMPL_RE.finditer(template):
        if m.start() > last:
            parts.append(("lit", template[last : m.start()]))
        parts.append(("field", m.group(1)))
        last = m.end()
    if last < len(template):
        parts.append(("lit", template[last:]))
    if not parts:
        return const(len(tbl), "")
    cols = []
    for kind, val in parts:
        if kind == "lit":
            cols.append(const(len(tbl), val))
        else:
            cols.append(pc.cast(tbl[val], pa.string()))
    if len(cols) == 1:
        return cols[0]
    return pc.binary_join_element_wise(*cols, "")


# --------------------------------------------------------------------------
# ip family  (lib/vrl/stdlib: ip_aton ip_ntoa ip_cidr_contains ip_subnet
# ip_to_ipv6 ipv6_to_ipv4)


_IPV4_RE = r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$"


def ip_aton(a):
    """Dotted-quad → uint32 (null for invalid), fully vectorized."""
    s = pc.extract_regex(pc.cast(a, pa.string()), _IPV4_RE)
    sc = _arr(s)
    quads = []
    for part in "abcd":
        quads.append(pc.cast(pc.struct_field(sc, part), pa.uint64()))
    ok = pc.is_valid(sc)
    for q in quads:
        ok = pc.and_(ok, pc.fill_null(pc.less_equal(q, 255), False))
    val = quads[0]
    for q in quads[1:]:
        val = pc.add(pc.multiply(val, 256), q)
    val = pc.cast(val, pa.uint32())
    return pc.if_else(ok, val, pa.scalar(None, pa.uint32()))


def ip_ntoa(a):
    """uint32 → dotted-quad string."""
    v = pc.cast(a, pa.uint64())
    parts = []
    for shift in (24, 16, 8, 0):
        parts.append(pc.cast(mod(pc.shift_right(v, shift), 256), pa.string()))
    return pc.binary_join_element_wise(*parts, ".")


def ip_cidr_contains(a, cidr: str):
    """check_fields ip_cidr_contains (check_fields.rs) — vectorized."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    lo, hi = int(net.network_address), int(net.broadcast_address)
    v = ip_aton(a)
    inside = pc.and_(pc.greater_equal(pc.cast(v, pa.uint64()), lo),
                     pc.less_equal(pc.cast(v, pa.uint64()), hi))
    return pc.fill_null(inside, False)


def ip_subnet(a, prefix: int):
    """Mask an IPv4 to its /prefix subnet address string."""
    v = pc.cast(ip_aton(a), pa.uint64())
    mask = (0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF
    masked = pc.bit_wise_and(v, mask)
    return ip_ntoa(masked)


# --------------------------------------------------------------------------
# parse family additions (parse_url, parse_query_string, parse_csv,
# parse_syslog, parse_duration)

_URL_RE = (
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
    r"(?:(?P<username>[^:@/]*)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/?#]*)(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)


def parse_url(a):
    """URL → struct(scheme, username, password, host, port, path, query,
    fragment) — one vectorized extract (lib/vrl/stdlib parse_url)."""
    return pc.extract_regex(pc.cast(a, pa.string()), _URL_RE)


def parse_query_string(a, key: str):
    """Extract one query-string parameter's (first) value."""
    pat = rf"(?:^|[&?]){_re.escape(key)}=(?P<v>[^&]*)"
    return pc.struct_field(pc.extract_regex(pc.cast(a, pa.string()), pat), "v")


def parse_csv_line(a, field_names):
    """Simple CSV split (no embedded quotes-with-commas beyond "..."):
    positional assignment like parse_csv (lib/vrl/stdlib parse_csv)."""
    tok = r'(?:"[^"]*"|[^,]*)'
    groups = ",".join(f"(?P<{n}>{tok})" for n in field_names)
    s = pc.extract_regex(pc.cast(a, pa.string()), "^" + groups)
    out = {}
    for n in field_names:
        v = pc.struct_field(s, n)
        out[n] = pc.replace_substring_regex(v, r'^"(.*)"$', r"\1")
    return out


_SYSLOG_RE = (
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<timestamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) "
    r"(?P<appname>[^\[\s:]+)(?:\[(?P<procid>\d+)\])?:?\s"
    r"(?P<message>.*)$"
)


def parse_syslog(a):
    """RFC3164-ish syslog line → struct(pri, timestamp, hostname,
    appname, procid, message) (lib/vrl/stdlib parse_syslog; the shape of
    src/sources/syslog decoding)."""
    return pc.extract_regex(pc.cast(a, pa.string()), _SYSLOG_RE)


_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_duration(a, output_unit: str = "s"):
    """'15ms' / '2.5h' → float in output_unit (parse_duration)."""
    s = pc.extract_regex(pc.cast(a, pa.string()), r"^(?P<n>\d+(?:\.\d+)?)\s*(?P<u>ns|us|µs|ms|s|m|h|d)$")
    n = pc.cast(pc.struct_field(s, "n"), pa.float64())
    u = pc.struct_field(s, "u")
    factor = pa.nulls(len(_arr(u)), pa.float64())
    for unit, mult in _DUR_UNITS.items():
        factor = pc.if_else(pc.equal(u, unit), mult, factor)
    out_div = _DUR_UNITS[output_unit]
    return pc.divide(pc.multiply(n, factor), out_div)


# --------------------------------------------------------------------------
# time/format family


def format_timestamp(a, fmt: str = "%Y-%m-%dT%H:%M:%S"):
    return pc.strftime(a, format=fmt)


def format_number(a, ndigits: int = 2):
    """Fixed-decimal string formatting, vectorized: float → decimal128
    cast (correctly rounded half-to-even — same result as Python's
    ``f"{v:.Nf}"``) → string, with negative-zero keeping its sign like
    Python's formatter. NaN/null → null, ±inf → 'inf'/'-inf' (matching
    the old per-row implementation). Magnitudes beyond decimal128 range
    fall back to the per-row formatter."""
    arr = _arr(a)
    if not pa.types.is_floating(arr.type):
        arr = pc.cast(arr, pa.float64())
    import numpy as np

    finite = pc.and_kleene(pc.is_valid(arr), pc.is_finite(arr))
    vals = pc.if_else(pc.fill_null(finite, False), arr, 0.0)
    hi = pc.max(pc.abs(vals)).as_py()
    if hi is not None and hi >= 1e30:  # decimal128(38, d) would overflow
        import pandas as pd

        ser = pd.Series(arr.to_pandas())
        return pa.array(
            ser.map(lambda v: None if pd.isna(v) else f"{v:.{ndigits}f}"),
            pa.string())
    s = pc.cast(pc.cast(vals, pa.decimal128(38, ndigits)), pa.string())
    zero = "0." + "0" * ndigits if ndigits else "0"
    negz = pc.and_(pc.less(vals, 0.0), pc.equal(s, zero))
    s = pc.if_else(
        negz,
        pc.binary_join_element_wise(
            pa.array(np.repeat("-", len(s)), pa.string()), s, ""),
        s)
    if pc.all(pc.fill_null(finite, False)).as_py():
        return s
    isinf = pc.fill_null(pc.is_inf(arr), False)
    s = pc.if_else(finite, s, pa.scalar(None, pa.string()))
    s = pc.if_else(isinf,
                   pc.if_else(pc.greater(arr, 0.0), "inf", "-inf"), s)
    return s


# --------------------------------------------------------------------------
# type predicates (is_* family)


def is_integer_type(a):
    return pa.types.is_integer(a.type)


def is_float_type(a):
    return pa.types.is_floating(a.type)


def is_string_type(a):
    return pa.types.is_string(a.type) or pa.types.is_large_string(a.type)


def is_match(a, pattern):
    """VRL `match`: regex test returning bool array."""
    return pc.match_substring_regex(pc.cast(a, pa.string()), pattern)


# --------------------------------------------------------------------------
# parse presets (lib/vrl/stdlib parse_apache_log / parse_nginx_log /
# parse_common_log / parse_glog / parse_klog / parse_linux_authorization)

_COMMON_LOG_RE = (
    r'^(?P<host>\S+) (?P<identity>\S+) (?P<user>\S+) \[(?P<timestamp>[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+)(?: (?P<protocol>[^"]*))?" '
    r"(?P<status>\d{3}) (?P<size>\d+|-)"
)

_COMBINED_EXTRA_RE = r'(?: "(?P<referrer>[^"]*)" "(?P<agent>[^"]*)")?'


def parse_common_log(a):
    """Apache common log format → struct."""
    return pc.extract_regex(pc.cast(a, pa.string()), _COMMON_LOG_RE)


def parse_apache_log(a, format: str = "combined"):
    """Apache common/combined → struct (combined adds referrer+agent)."""
    if format == "common":
        return parse_common_log(a)
    return pc.extract_regex(pc.cast(a, pa.string()), _COMMON_LOG_RE + _COMBINED_EXTRA_RE)


_NGINX_RE = (
    r'^(?P<client>\S+) - (?P<user>\S+) \[(?P<timestamp>[^\]]+)\] '
    r'"(?P<request>[^"]*)" (?P<status>\d{3}) (?P<size>\d+) '
    r'"(?P<referer>[^"]*)" "(?P<agent>[^"]*)"'
)


def parse_nginx_log(a):
    return pc.extract_regex(pc.cast(a, pa.string()), _NGINX_RE)


_GLOG_RE = (
    r"^(?P<level>[IWEF])(?P<month>\d{2})(?P<day>\d{2}) "
    r"(?P<time>\d{2}:\d{2}:\d{2}\.\d+)\s+(?P<thread>\d+) "
    r"(?P<file>[^:]+):(?P<line>\d+)\] (?P<message>.*)$"
)


def parse_glog(a):
    """google-glog lines (I0813 12:00:00.000000 1 main.cc:10] msg)."""
    return pc.extract_regex(pc.cast(a, pa.string()), _GLOG_RE)


_KLOG_RE = (
    r"^(?P<level>[IWEF])(?P<month>\d{2})(?P<day>\d{2}) "
    r"(?P<time>\d{2}:\d{2}:\d{2}\.\d+)\s+(?P<thread>\d+) "
    r"(?P<file>[^:]+):(?P<line>\d+)\] \"(?P<message>[^\"]*)\"(?P<rest>.*)$"
)


def parse_klog(a):
    return pc.extract_regex(pc.cast(a, pa.string()), _KLOG_RE)


_LINUX_AUTH_RE = (
    r"^(?P<timestamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) (?P<appname>[^\[\s:]+)(?:\[(?P<procid>\d+)\])?: "
    r"(?P<message>.*)$"
)


def parse_linux_authorization(a):
    return pc.extract_regex(pc.cast(a, pa.string()), _LINUX_AUTH_RE)


# --------------------------------------------------------------------------
# codec additions (encode_logfmt / encode_key_value / redact)


def encode_key_value(tbl: pa.Table, fields=None, *, field_sep: str = "=", pair_sep: str = " "):
    """Rows → key=value strings (VRL encode_key_value/encode_logfmt).
    Vectorized: one render-style join over the selected columns."""
    names = list(fields) if fields else list(tbl.column_names)
    parts = []
    for i, name in enumerate(names):
        prefix = f"{name}{field_sep}"
        vals = pc.cast(tbl[name], pa.string())
        vals = pc.fill_null(vals, "")
        parts.append(pc.binary_join_element_wise(const(len(tbl), prefix), vals, ""))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, pair_sep)


def encode_logfmt(tbl: pa.Table, fields=None):
    return encode_key_value(tbl, fields)


def redact(a, patterns, *, replacement: str = "[REDACTED]"):
    """VRL `redact`: replace every match of each pattern."""
    out = pc.cast(a, pa.string())
    for p in patterns:
        out = pc.replace_substring_regex(out, p, replacement)
    return out


# ordered: more-specific tokens first (Edge UAs contain "Chrome", Chrome
# UAs contain "Safari")
_UA_BROWSERS = [
    ("Firefox", r"Firefox/(?P<v>[0-9.]+)"),
    ("Edge", r"Edg[eA]?/(?P<v>[0-9.]+)"),
    ("Chrome", r"Chrome/(?P<v>[0-9.]+)"),
    ("Safari", r"Version/(?P<v>[0-9.]+).*Safari"),
    ("curl", r"curl/(?P<v>[0-9.]+)"),
    ("wget", r"Wget/(?P<v>[0-9.]+)"),
]
_UA_OS = [
    ("Windows", r"Windows NT"),
    ("iOS", r"iPhone OS|CPU OS"),
    ("macOS", r"Mac OS X"),
    ("Android", r"Android"),
    ("Linux", r"Linux"),
]


def parse_user_agent(a):
    """User-agent → struct(browser_family, browser_version, os_family,
    device). Vectorized first-match-wins over an ordered token table — a
    documented SIMPLIFICATION of the reference's uap/woothee database
    (lib/vrl/stdlib/src/parse_user_agent.rs); family coverage is the
    major desktop/mobile browsers + CLI clients, everything else is
    "Other"."""
    s = pc.cast(_arr(a), pa.string())
    n = len(s)
    fam = const(n, None, pa.string())
    ver = const(n, None, pa.string())
    for name, pat in _UA_BROWSERS:
        m = pc.extract_regex(s, pat)
        hit = pc.and_(pc.is_valid(m), pc.is_null(fam))
        fam = pc.if_else(hit, name, fam)
        ver = pc.if_else(hit, pc.struct_field(m, "v"), ver)
    fam = pc.fill_null(fam, "Other")
    osf = const(n, None, pa.string())
    for name, pat in _UA_OS:
        hit = pc.and_(pc.match_substring_regex(s, pat), pc.is_null(osf))
        osf = pc.if_else(hit, name, osf)
    osf = pc.fill_null(osf, "Other")
    mobile = pc.match_substring_regex(s, r"Mobile|iPhone|Android")
    tablet = pc.match_substring_regex(s, r"iPad|Tablet")
    device = pc.if_else(tablet, "Tablet", pc.if_else(mobile, "Mobile", "Other"))
    arrs = []
    for c in (fam, ver, osf, device):
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        arrs.append(c)
    return pa.StructArray.from_arrays(
        arrs, ["browser_family", "browser_version", "os_family", "device"]
    )


# --------------------------------------------------------------------------
# percent-encoding codecs (lib/vrl/stdlib/src/{encode,decode}_percent.rs)
# — fully vectorized over the flat utf8 byte buffer, no per-row Python.

_PERCENT_SAFE = np.zeros(256, dtype=bool)
for _c in (b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_.~"):
    _PERCENT_SAFE[_c] = True
_HEX_DIGITS = b"0123456789ABCDEF"
_HEX_VAL = np.full(256, -1, dtype=np.int16)
for _i, _c in enumerate(b"0123456789"):
    _HEX_VAL[_c] = _i
for _i, _c in enumerate(b"ABCDEF"):
    _HEX_VAL[_c] = 10 + _i
for _i, _c in enumerate(b"abcdef"):
    _HEX_VAL[_c] = 10 + _i


def _flat_utf8(arr: pa.Array):
    """(data bytes, offsets int64) of a string array (offset-normalized)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offs = offs[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return arr, data, offs


def _rebuild_string(arr, out_data: np.ndarray, out_offs: np.ndarray) -> pa.Array:
    """String array from transformed flat bytes + new offsets, keeping
    the source's validity bitmap.

    The output is built with offset 0, so a sliced source (arr.offset != 0)
    cannot share its parent's bitmap buffer verbatim — the bits would be
    misaligned (and for a null-free slice of a parent WITH nulls, wrong).
    Re-pack a fresh aligned bitmap in that case via pc.is_valid.
    """
    if arr.null_count == 0:
        null_buf = None
    elif arr.offset == 0:
        null_buf = arr.buffers()[0]
    else:
        null_buf = pc.is_valid(arr).buffers()[1]  # fresh offset-0 packed bitmap
    return pa.Array.from_buffers(
        pa.string(), len(out_offs) - 1,
        [null_buf, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
         pa.py_buffer(out_data.tobytes())],
        null_count=arr.null_count,
    )


def encode_percent(a):
    """Percent-encode every byte outside the RFC 3986 unreserved set."""
    arr, data, offs = _flat_utf8(_arr(a))
    if len(data) == 0:
        return arr
    lo, hi = int(offs[0]), int(offs[-1])
    body = data[lo:hi]
    safe = _PERCENT_SAFE[body]
    out_len_per_byte = np.where(safe, 1, 3).astype(np.int64)
    pos = np.concatenate([[0], np.cumsum(out_len_per_byte)])
    out = np.empty(int(pos[-1]), dtype=np.uint8)
    out[pos[:-1][safe]] = body[safe]
    up = ~safe
    upos = pos[:-1][up]
    ub = body[up].astype(np.int16)
    out[upos] = ord("%")
    hexd = np.frombuffer(_HEX_DIGITS, dtype=np.uint8)
    out[upos + 1] = hexd[ub >> 4]
    out[upos + 2] = hexd[ub & 0xF]
    # per-row output offsets: sum of out lengths per row
    rel = offs - lo
    new_offs = pos[rel]
    return _rebuild_string(arr, out, new_offs)


def decode_percent(a):
    """Decode %XX escapes (invalid escapes pass through literally)."""
    arr, data, offs = _flat_utf8(_arr(a))
    if len(data) == 0:
        return arr
    lo, hi = int(offs[0]), int(offs[-1])
    body = data[lo:hi]
    n = len(body)
    rel_ends = offs - lo
    pct = np.nonzero(body == ord("%"))[0]
    if len(pct):
        # valid escape: two hex digits follow, inside the same row
        row = np.searchsorted(rel_ends, pct, side="right")  # row index + 1... use ends
        row_end = rel_ends[np.minimum(row, len(rel_ends) - 1)]
        in_row = pct + 2 < row_end  # pct+2 must be <= row_end-1 (strict: stay inside the row)
        hx1 = np.where(pct + 1 < n, _HEX_VAL[body[np.minimum(pct + 1, n - 1)]], -1)
        hx2 = np.where(pct + 2 < n, _HEX_VAL[body[np.minimum(pct + 2, n - 1)]], -1)
        valid = in_row & (hx1 >= 0) & (hx2 >= 0)
        vp = pct[valid]
    else:
        vp = np.empty(0, np.int64)
    if len(vp) == 0:
        return arr
    out_body = body.copy()
    out_body[vp] = (_HEX_VAL[body[vp + 1]] << 4 | _HEX_VAL[body[vp + 2]]).astype(np.uint8)
    skip = np.zeros(n, dtype=bool)
    skip[vp + 1] = True
    skip[vp + 2] = True
    keep = ~skip
    out = out_body[keep]
    removed_before = np.concatenate([[0], np.cumsum(skip)])  # prefix removals
    new_offs = rel_ends - removed_before[rel_ends]
    return _rebuild_string(arr, out, new_offs)


# --------------------------------------------------------------------------
# ip family additions (lib/vrl/stdlib/src/{ip_to_ipv6,ipv6_to_ipv4}.rs)


def ip_to_ipv6(a):
    """Dotted-quad v4 → IPv4-mapped IPv6 (::ffff:a.b.c.d); v6 unchanged."""
    s = pc.cast(_arr(a), pa.string())
    is_v4 = pc.match_substring_regex(s, r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    mapped = pc.binary_join_element_wise(
        pa.array(["::ffff:"] * len(s)), pc.fill_null(s, ""), "")
    return pc.if_else(is_v4, mapped, s)


def ipv6_to_ipv4(a):
    """IPv4-mapped IPv6 → dotted quad; plain v4 passes; other v6 → null
    (the reference errors there; null is the batch-engine error value)."""
    s = pc.cast(_arr(a), pa.string())
    m = pc.extract_regex(s, r"^::[fF]{4}:(?P<v4>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})$")
    mapped = pc.struct_field(m, "v4")
    is_v4 = pc.match_substring_regex(s, r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    return pc.if_else(is_v4, s, mapped)


def match_array(a, pattern: str, *, all_: bool = False):
    """VRL match_array: does any (or every) element of a list<string>
    column match the regex. Vectorized: flatten once, one regex pass,
    segment any/all via reduceat."""
    arr = _arr(a)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    off0 = int(offs[0])
    offs = offs - off0
    flat = arr.values
    if off0 or len(flat) > int(offs[-1]):
        flat = flat.slice(off0, int(offs[-1]))
    hits = pc.fill_null(
        pc.match_substring_regex(pc.cast(flat, pa.string()), pattern), False
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    starts = np.minimum(offs[:-1], max(len(hits) - 1, 0))
    if len(hits) == 0:
        agg = np.zeros(n, dtype=np.int64)
    else:
        agg = np.add.reduceat(hits, starts)
        agg[lens == 0] = 0
    out = (agg == lens) & (lens > 0) if all_ else agg > 0
    return pa.array(out)


# --------------------------------------------------------------------------
# parse_xml (lib/vrl/stdlib/src/parse_xml.rs) — control-plane parser:
# per-row ElementTree walk (XML structure is inherently recursive; this
# is a config/enrichment-time kernel, NOT for hot log paths — use the
# regex/grok/json parsers there).


def parse_xml(a, *, include_attr: bool = True, attr_prefix: str = "@"):
    import json as _json
    import xml.etree.ElementTree as ET

    def node_to_obj(el):
        obj: dict = {}
        if include_attr:
            for k, v in el.attrib.items():
                obj[f"{attr_prefix}{k}"] = v
        for child in el:
            val = node_to_obj(child)
            if child.tag in obj:
                prev = obj[child.tag]
                if not isinstance(prev, list):
                    obj[child.tag] = [prev]
                obj[child.tag].append(val)
            else:
                obj[child.tag] = val
        text = (el.text or "").strip()
        if text and not obj:
            return text
        if text:
            obj["#text"] = text
        return obj

    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            root = ET.fromstring(v)
            out.append(_json.dumps({root.tag: node_to_obj(root)}, sort_keys=True))
        except ET.ParseError:
            out.append(None)
    return pa.array(out, pa.string())


_VPC_FLOW_FIELDS = [
    "version", "account_id", "interface_id", "srcaddr", "dstaddr",
    "srcport", "dstport", "protocol", "packets", "bytes",
    "start", "end", "action", "log_status",
]
_VPC_FLOW_RE = "^" + " ".join(f"(?P<{f}>\\S+)" for f in _VPC_FLOW_FIELDS) + "$"


def parse_aws_vpc_flow_log(a):
    """AWS VPC flow log (default v2 format) → struct
    (lib/vrl/stdlib/src/parse_aws_vpc_flow_log.rs). One regex pass."""
    return pc.extract_regex(pc.cast(_arr(a), pa.string()), _VPC_FLOW_RE)


# --------------------------------------------------------------------------
# timestamp family additions
# (lib/vrl/stdlib/src/{to_unix_timestamp,from_unix_timestamp}.rs)


def to_unix_timestamp(a, unit: str = "s"):
    """timestamp → epoch integer in s/ms/us/ns."""
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    div = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[unit]
    if unit == "ns":
        return pc.multiply(us, 1000)
    return pc.divide(us, div)


def from_unix_timestamp(a, unit: str = "s"):
    mult = {"s": 1_000_000, "ms": 1_000, "us": 1}[unit]
    us = pc.multiply(pc.cast(a, pa.int64()), mult) if mult != 1 else pc.cast(a, pa.int64())
    return pc.cast(us, pa.timestamp("us"))


# --------------------------------------------------------------------------
# case conversions (lib/vrl/stdlib/src/casing/*) — vectorized regex passes


def _boundary_split(a):
    """camelCase / PascalCase / sep-delimited → lowercase words joined
    by a single space (intermediate form)."""
    s = pc.cast(a, pa.string())
    s = pc.replace_substring_regex(s, r"([a-z0-9])([A-Z])", r"\1 \2")
    s = pc.replace_substring_regex(s, r"([A-Z]+)([A-Z][a-z])", r"\1 \2")
    s = pc.replace_substring_regex(s, r"[_\-\s]+", " ")
    return pc.utf8_lower(pc.utf8_trim_whitespace(s))


def snakecase(a):
    return pc.replace_substring(_boundary_split(a), " ", "_")


def kebabcase(a):
    return pc.replace_substring(_boundary_split(a), " ", "-")


def camelcase(a):
    return pa.array(
        [None if v is None else (v.split(" ")[0] + "".join(w.title() for w in v.split(" ")[1:]))
         for v in _arr(_boundary_split(a)).to_pylist()]
    )


def pascalcase(a):
    return pa.array(
        [None if v is None else "".join(w.title() for w in v.split(" "))
         for v in _arr(_boundary_split(a)).to_pylist()]
    )


# --------------------------------------------------------------------------
# radix ints (lib/vrl/stdlib/src/{parse_int,format_int}.rs)


def parse_int(a, base: int = 10):
    if base == 10:
        return pc.cast(pc.cast(_arr(a), pa.string()), pa.int64())

    def conv(v):
        try:
            return int(v, base)
        except (TypeError, ValueError):
            return None

    return pa.array([None if v is None else conv(v) for v in _arr(a).to_pylist()], pa.int64())


def format_int(a, base: int = 10):
    if base == 10:
        return pc.cast(_arr(a), pa.string())
    fmt = {2: "{:b}", 8: "{:o}", 16: "{:x}"}[base]
    return pa.array(
        [None if v is None else fmt.format(v) for v in _arr(a).to_pylist()], pa.string()
    )


# --------------------------------------------------------------------------
# hash additions (sha3 / sha512 / hmac / uuid_v5 — per-row like the md5
# family; hashing is codec-path, not hot-loop)


def sha3(a):
    return pa.array(
        [None if v is None else hashlib.sha3_256(v.encode()).hexdigest()
         for v in _arr(a).to_pylist()]
    )


def sha512(a):
    return pa.array(
        [None if v is None else hashlib.sha512(v.encode()).hexdigest()
         for v in _arr(a).to_pylist()]
    )


def hmac_(a, key: str, algorithm: str = "sha256"):
    import hmac as _hmac

    kb = key.encode()
    return pa.array(
        [None if v is None else _hmac.new(kb, v.encode(), algorithm).hexdigest()
         for v in _arr(a).to_pylist()]
    )


def uuid_v5(a, namespace: str = "dns"):
    import uuid as _uuid

    ns = {
        "dns": _uuid.NAMESPACE_DNS, "url": _uuid.NAMESPACE_URL,
        "oid": _uuid.NAMESPACE_OID, "x500": _uuid.NAMESPACE_X500,
    }[namespace]
    return pa.array(
        [None if v is None else str(_uuid.uuid5(ns, v)) for v in _arr(a).to_pylist()]
    )


# --------------------------------------------------------------------------
# encode_csv (lib/vrl/stdlib/src/encode_csv.rs) — vectorized RFC-4180
# quoting: fields containing , " or newline get doubled-quote wrapping


def encode_csv(tbl: pa.Table, fields=None):
    names = list(fields) if fields else list(tbl.column_names)
    parts = []
    for name in names:
        v = pc.fill_null(pc.cast(tbl[name], pa.string()), "")
        needs = pc.match_substring_regex(v, r'[",\n\r]')
        quoted = pc.binary_join_element_wise(
            const(len(tbl), '"'),
            pc.replace_substring(v, '"', '""'),
            const(len(tbl), '"'), "")
        parts.append(pc.if_else(needs, quoted, v))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, ",")


# --------------------------------------------------------------------------
# parse_aws_alb_log (lib/vrl/stdlib/src/parse_aws_alb_log.rs) — the
# standard ALB access-log line, one regex pass.

_ALB_RE = (
    r'^(?P<type>\S+) (?P<timestamp>\S+) (?P<elb>\S+) '
    r'(?P<client_host>\S+) (?P<target_host>\S+) '
    r'(?P<request_processing_time>\S+) (?P<target_processing_time>\S+) '
    r'(?P<response_processing_time>\S+) (?P<elb_status_code>\S+) '
    r'(?P<target_status_code>\S+) (?P<received_bytes>\S+) (?P<sent_bytes>\S+) '
    r'"(?P<request>[^"]*)" "(?P<user_agent>[^"]*)" '
    r'(?P<ssl_cipher>\S+) (?P<ssl_protocol>\S+) (?P<target_group_arn>\S+) '
    r'"(?P<trace_id>[^"]*)"(?: "(?P<domain_name>[^"]*)" "(?P<chosen_cert_arn>[^"]*)")?'
)


def parse_aws_alb_log(a):
    return pc.extract_regex(pc.cast(_arr(a), pa.string()), _ALB_RE)


# --------------------------------------------------------------------------
# community_id (lib/vrl/stdlib/src/community_id.rs — Zeek Community ID
# v1 flow hash, https://github.com/corelight/community-id-spec): sorted
# endpoint tuple → sha1 → base64 with "1:" prefix. IPv4 TCP/UDP/ICMP.


def community_id(src_ip, dst_ip, src_port, dst_port, proto, *, seed: int = 0):
    import socket
    import struct as _struct

    s_ips = pc.cast(_arr(src_ip), pa.string()).to_pylist()
    d_ips = pc.cast(_arr(dst_ip), pa.string()).to_pylist()
    s_ps = pc.cast(_arr(src_port), pa.int64()).to_pylist()
    d_ps = pc.cast(_arr(dst_port), pa.int64()).to_pylist()
    protos = pc.cast(_arr(proto), pa.int64()).to_pylist()
    out = []
    for si, di, sp, dp, pr in zip(s_ips, d_ips, s_ps, d_ps, protos):
        if None in (si, di, sp, dp, pr):
            out.append(None)
            continue
        try:
            sb = socket.inet_aton(si)
            db = socket.inet_aton(di)
        except OSError:
            out.append(None)
            continue
        if (sb, sp) > (db, dp):  # canonical order: smaller endpoint first
            sb, db, sp, dp = db, sb, dp, sp
        data = (_struct.pack("!H", seed) + sb + db
                + _struct.pack("!BBHH", pr, 0, sp, dp))
        out.append("1:" + _b64.b64encode(hashlib.sha1(data).digest()).decode())
    return pa.array(out, pa.string())


# --------------------------------------------------------------------------
# syslog level/severity/facility mappers
# (lib/vrl/stdlib/src/{to_syslog_level,to_syslog_severity,to_syslog_facility}.rs)

_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_level(a):
    """severity int (0-7) → level keyword."""
    lv = pa.array(_SYSLOG_LEVELS, pa.string())
    idx = pc.cast(_arr(a), pa.int64())
    ok = pc.and_(pc.greater_equal(idx, 0), pc.less_equal(idx, 7))
    safe = pc.if_else(ok, idx, pa.scalar(None, pa.int64()))
    return lv.take(safe.combine_chunks() if isinstance(safe, pa.ChunkedArray) else safe)


def to_syslog_severity(a):
    """level keyword → severity int (0-7)."""
    m = {k: i for i, k in enumerate(_SYSLOG_LEVELS)}
    m.update({"warn": 4, "error": 3, "emergency": 0, "critical": 2, "informational": 6})
    low = pc.utf8_lower(pc.cast(_arr(a), pa.string()))
    return pa.array([m.get(v) for v in low.to_pylist()], pa.int64())


def to_syslog_facility(a):
    """facility code (0-23) → keyword."""
    fv = pa.array(_SYSLOG_FACILITIES, pa.string())
    idx = pc.cast(_arr(a), pa.int64())
    ok = pc.and_(pc.greater_equal(idx, 0), pc.less_equal(idx, 23))
    safe = pc.if_else(ok, idx, pa.scalar(None, pa.int64()))
    return fv.take(safe.combine_chunks() if isinstance(safe, pa.ChunkedArray) else safe)


# --------------------------------------------------------------------------
# gzip / zlib codecs (lib/vrl/stdlib/src/{encode,decode}_{gzip,zlib}.rs)
# — per-row like the base64 family (codec path, not hot loop)

import zlib as _zlib


def encode_gzip(a):
    import gzip as _gz

    return pa.array(
        [None if v is None else _b64.b64encode(_gz.compress(v.encode(), mtime=0)).decode()
         for v in _arr(a).to_pylist()]
    )


def decode_gzip(a):
    import gzip as _gz

    return pa.array(
        [None if v is None else _gz.decompress(_b64.b64decode(v)).decode()
         for v in _arr(a).to_pylist()]
    )


def encode_zlib(a):
    return pa.array(
        [None if v is None else _b64.b64encode(_zlib.compress(v.encode())).decode()
         for v in _arr(a).to_pylist()]
    )


def decode_zlib(a):
    return pa.array(
        [None if v is None else _zlib.decompress(_b64.b64decode(v)).decode()
         for v in _arr(a).to_pylist()]
    )


# --------------------------------------------------------------------------
# parse_cef (lib/vrl/stdlib/src/parse_cef.rs) — ArcSight Common Event
# Format: CEF:version|vendor|product|dev_version|sig_id|name|severity|ext

_CEF_HEAD_RE = (
    r"^CEF:(?P<cef_version>\d+)\|(?P<device_vendor>[^|]*)\|(?P<device_product>[^|]*)\|"
    r"(?P<device_version>[^|]*)\|(?P<signature_id>[^|]*)\|(?P<name>[^|]*)\|"
    r"(?P<severity>[^|]*)\|(?P<extension>.*)$"
)


def parse_cef(a):
    """CEF header → struct; the extension blob stays a raw string
    (parse its key=value pairs with the kv parser)."""
    return pc.extract_regex(pc.cast(_arr(a), pa.string()), _CEF_HEAD_RE)


# --------------------------------------------------------------------------
# stdlib leaf tail (round-3): reverse_dns, parse_ruby_hash, to_regex,
# compact, only_fields, tag_types_externally, push, remove
# (lib/vrl/stdlib/src/{reverse_dns,parse_ruby_hash,to_regex,compact,
#  only_fields,tag_types_externally,push,remove}.rs)

_PTR_DEFAULT = {"127.0.0.1": "localhost", "::1": "localhost"}


def reverse_dns(a, table: dict | None = None):
    """Offline reverse_dns: vectorized lookup in a static PTR-style
    mapping table (this container has no resolver; the reference calls
    the system resolver, reverse_dns.rs:47-57). Unmapped IPs → null
    (the batch-engine error value)."""
    mapping = dict(_PTR_DEFAULT)
    if table:
        mapping.update(table)
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = pa.array(list(mapping.values()), pa.string())
    idx = pc.index_in(pc.cast(_arr(a), pa.string()), value_set=keys)
    return vals.take(idx)


def _ruby_parse(s: str):
    """Recursive-descent parser for Ruby hash literals:
    { "k" => v, :sym => v, nil/true/false, numbers, strings, nested
    hashes and arrays."""
    i = 0
    n = len(s)

    def skip_ws():
        nonlocal i
        while i < n and s[i] in " \t\r\n":
            i += 1

    def parse_value():
        nonlocal i
        skip_ws()
        if i >= n:
            raise ValueError("eof")
        c = s[i]
        if c == "{":
            return parse_hash()
        if c == "[":
            return parse_array()
        if c in "\"'":
            return parse_string(c)
        if c == ":":  # :symbol
            j = i + 1
            while j < n and (s[j].isalnum() or s[j] == "_"):
                j += 1
            sym = s[i + 1 : j]
            i = j
            return sym
        m = _re.match(r"-?\d+\.\d+([eE][+-]?\d+)?", s[i:])
        if m:
            i += m.end()
            return float(m.group(0))
        m = _re.match(r"-?\d+", s[i:])
        if m:
            i += m.end()
            return int(m.group(0))
        for lit, val in (("nil", None), ("true", True), ("false", False)):
            if s.startswith(lit, i):
                i += len(lit)
                return val
        raise ValueError(f"unexpected char {c!r} at {i}")

    def parse_string(q):
        nonlocal i
        i += 1
        out = []
        while i < n and s[i] != q:
            if s[i] == "\\" and i + 1 < n:
                out.append(s[i + 1])
                i += 2
            else:
                out.append(s[i])
                i += 1
        if i >= n:
            raise ValueError("unterminated string")
        i += 1
        return "".join(out)

    def parse_hash():
        nonlocal i
        i += 1  # {
        obj = {}
        skip_ws()
        if i < n and s[i] == "}":
            i += 1
            return obj
        while True:
            skip_ws()
            if i < n and s[i] in "\"'":
                key = parse_string(s[i])
            elif i < n and s[i] == ":":
                j = i + 1
                while j < n and (s[j].isalnum() or s[j] == "_"):
                    j += 1
                key = s[i + 1 : j]
                i = j
            else:
                raise ValueError("bad hash key")
            skip_ws()
            if not s.startswith("=>", i):
                raise ValueError("expected =>")
            i += 2
            obj[key] = parse_value()
            skip_ws()
            if i < n and s[i] == ",":
                i += 1
                continue
            if i < n and s[i] == "}":
                i += 1
                return obj
            raise ValueError("bad hash sep")

    def parse_array():
        nonlocal i
        i += 1  # [
        arr = []
        skip_ws()
        if i < n and s[i] == "]":
            i += 1
            return arr
        while True:
            arr.append(parse_value())
            skip_ws()
            if i < n and s[i] == ",":
                i += 1
                continue
            if i < n and s[i] == "]":
                i += 1
                return arr
            raise ValueError("bad array sep")

    v = parse_value()
    skip_ws()
    if i != n:
        raise ValueError("trailing input")
    return v


def parse_ruby_hash(a):
    """Ruby hash literal → JSON string (object-valued kernels emit JSON
    for schema stability, like parse_xml/tally). Invalid → null."""
    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(_json.dumps(_ruby_parse(v), sort_keys=True))
        except (ValueError, RecursionError):
            out.append(None)
    return pa.array(out, pa.string())


def to_regex(a):
    """VRL to_regex: validate each string as a regex — the pattern
    string passes through when it compiles, else null (a batch engine
    has no first-class regex value type; downstream kernels take the
    pattern string)."""
    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            _re.compile(v)
            out.append(v)
        except _re.error:
            out.append(None)
    return pa.array(out, pa.string())


def _is_nullish_scalar(v) -> bool:
    return v is None or (isinstance(v, str) and (v.strip() == "" or v.strip() == "-"))


def _compact_value(v, *, recursive, null, string, object_, array, nullish):
    """None return means 'drop me' at the parent level."""
    if isinstance(v, dict):
        if recursive:
            v = {
                k: cv for k, cv in (
                    (k, _compact_value(x, recursive=recursive, null=null,
                                       string=string, object_=object_,
                                       array=array, nullish=nullish))
                    for k, x in v.items()
                ) if cv is not _DROP
            }
        return _DROP if object_ and not v else v
    if isinstance(v, list):
        if recursive:
            v = [
                cv for cv in (
                    _compact_value(x, recursive=recursive, null=null,
                                   string=string, object_=object_,
                                   array=array, nullish=nullish)
                    for x in v
                ) if cv is not _DROP
            ]
        return _DROP if array and not v else v
    if v is None:
        return _DROP if null else v
    if isinstance(v, str):
        if string and v == "":
            return _DROP
        if nullish and _is_nullish_scalar(v):
            return _DROP
        return v
    return v


_DROP = object()


def compact(a, *, recursive: bool = True, null: bool = True,
            string: bool = True, object_: bool = True, array: bool = True,
            nullish: bool = False):
    """VRL compact over JSON-string object/array rows (compact.rs):
    drop null / empty-string / empty-object / empty-array members
    (each togglable; ``nullish`` additionally drops "-" and
    whitespace-only strings). Returns JSON strings."""
    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            parsed = _json.loads(v)
        except _json.JSONDecodeError:
            out.append(None)
            continue
        res = _compact_value(parsed, recursive=recursive, null=null,
                             string=string, object_=object_, array=array,
                             nullish=nullish)
        out.append(_json.dumps({} if res is _DROP else res, sort_keys=True))
    return pa.array(out, pa.string())


def only_fields(tbl: pa.Table, *names: str) -> pa.Table:
    """Keep only the listed columns (only_fields.rs; the table-level
    analogue of coercer drop_unspecified). Missing names are ignored."""
    keep = [c for c in tbl.column_names if c in names]
    return tbl.select(keep)


def _tag_type(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return {"boolean": v}
    if isinstance(v, int):
        return {"integer": v}
    if isinstance(v, float):
        return {"float": v}
    if isinstance(v, str):
        return {"string": v}
    if isinstance(v, dict):
        return {k: _tag_type(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_tag_type(x) for x in v]
    return {"string": str(v)}


def tag_types_externally(a):
    """tag_types_externally.rs: wrap every scalar leaf in a
    {"<type>": value} object (objects keep their keys, arrays map
    elementwise, null stays null). JSON-string in/out; a non-JSON
    string row is treated as a string scalar."""
    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            parsed = _json.loads(v)
        except _json.JSONDecodeError:
            parsed = v
        out.append(_json.dumps(_tag_type(parsed), sort_keys=True))
    return pa.array(out, pa.string())


def push(a, value):
    """VRL push: append ``value`` to every (non-null) list row —
    vectorized offset arithmetic, no per-row Python."""
    arr = _arr(a)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    n = len(arr)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    off0 = int(offs[0])
    offs = offs - off0
    flat = arr.values
    if off0 or len(flat) > int(offs[-1]):
        flat = flat.slice(off0, int(offs[-1]))
    valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False), bool)
    # null rows keep length 0 and stay null; each valid row gains 1 slot
    gain = np.cumsum(valid)  # appended slots in rows 0..r
    new_offs = offs + np.concatenate([[0], gain])
    total = int(offs[-1])
    # original value at flat pos i (in row r) shifts by gain[:r]
    parents = np.asarray(pc.list_parent_indices(arr))
    shift = np.concatenate([[0], gain])[parents] if total else np.empty(0, np.int64)
    out_len = total + int(gain[-1]) if n else 0
    pos_orig = np.arange(total) + shift
    append_pos = (new_offs[1:] - 1)[valid]
    take_idx = np.empty(out_len, dtype=np.int64)
    take_idx[pos_orig] = np.arange(total)
    take_idx[append_pos] = total  # the appended value, stored at the end
    ext = pa.concat_arrays([
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
        pa.array([value], arr.type.value_type),
    ])
    new_flat = ext.take(pa.array(take_idx, pa.int64()))
    mask = pa.array(~valid) if arr.null_count else None
    return pa.ListArray.from_arrays(
        pa.array(new_offs.astype(np.int32)), new_flat, mask=mask
    )


def append(a, items):
    """VRL append: concatenate the ``items`` sequence to every non-null
    list row (append.rs — ``push`` generalized to k items; same
    vectorized offset arithmetic, no per-row Python)."""
    items = list(items)
    arr = _arr(a)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if not items:
        return arr
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    n = len(arr)
    k = len(items)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    off0 = int(offs[0])
    offs = offs - off0
    flat = arr.values
    if off0 or len(flat) > int(offs[-1]):
        flat = flat.slice(off0, int(offs[-1]))
    valid = np.asarray(pc.is_valid(arr).to_numpy(zero_copy_only=False), bool)
    gain = np.cumsum(valid) * k  # appended slots in rows 0..r
    new_offs = offs + np.concatenate([[0], gain])
    total = int(offs[-1])
    parents = np.asarray(pc.list_parent_indices(arr))
    shift = np.concatenate([[0], gain])[parents] if total else np.empty(0, np.int64)
    out_len = total + (int(gain[-1]) if n else 0)
    take_idx = np.empty(out_len, dtype=np.int64)
    take_idx[np.arange(total) + shift] = np.arange(total)
    for j in range(k):
        take_idx[(new_offs[1:] - k + j)[valid]] = total + j
    ext = pa.concat_arrays([
        flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat,
        pa.array(items, arr.type.value_type),
    ])
    new_flat = ext.take(pa.array(take_idx, pa.int64()))
    mask = pa.array(~valid) if arr.null_count else None
    return pa.ListArray.from_arrays(
        pa.array(new_offs.astype(np.int32)), new_flat, mask=mask
    )


def parse_regex_all(a, pattern):
    """ALL matches of ``pattern`` per row as a list<string> column
    (parse_regex_all.rs; whole-match text per hit, null row → null).
    Inherently irregular output — compiled regex + per-row findall,
    same non-hot-path class as parse_ruby_hash/compact."""
    rx = _re.compile(pattern)
    out = []
    for v in _arr(a).to_pylist():
        if v is None:
            out.append(None)
        else:
            out.append([m.group(0) for m in rx.finditer(v)])
    return pa.array(out, pa.list_(pa.string()))


def remove(a, path, *, compact_: bool = False):
    """VRL remove: delete ``path`` (list of keys / int indexes) from
    JSON-string object/array rows; ``compact_`` drops containers
    emptied by the removal (remove.rs examples)."""
    if isinstance(path, (str, int)):
        path = [path]

    def rm(v, parts):
        head, rest = parts[0], parts[1:]
        if isinstance(v, dict) and isinstance(head, str) and head in v:
            if rest:
                v[head] = rm(v[head], rest)
                if compact_ and isinstance(v[head], (dict, list)) and not v[head]:
                    del v[head]
            else:
                del v[head]
        elif isinstance(v, list) and isinstance(head, int) and -len(v) <= head < len(v):
            if rest:
                v[head] = rm(v[head], rest)
                if compact_ and isinstance(v[head], (dict, list)) and not v[head]:
                    del v[head]
            else:
                del v[head]
        return v

    out = []
    for v in pc.cast(_arr(a), pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            parsed = _json.loads(v)
        except _json.JSONDecodeError:
            out.append(None)
            continue
        out.append(_json.dumps(rm(parsed, list(path)), sort_keys=True))
    return pa.array(out, pa.string())


# --------------------------------------------------------------------------
# stdlib completion (round-3b): match_any, is_nullish, is_regex,
# is_array/is_object type checks, uuid_v4, get_hostname, get_env_var
# (lib/vrl/stdlib/src/{match_any,is_nullish,is_regex,is_array,is_object,
#  uuid_v4,get_env_var,get_hostname}.rs)


def match_any(a, patterns):
    """True where the value matches ANY of the regex patterns — compiled
    into one alternation, a single vectorized pass."""
    pat = "|".join(f"(?:{p})" for p in patterns)
    return pc.match_substring_regex(pc.cast(_arr(a), pa.string()), pat)


def is_nullish(a):
    """VRL is_nullish: null, empty string, "-", or whitespace-only."""
    arr = _arr(a)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        return pc.is_null(arr)
    s = pc.cast(arr, pa.string())
    blank = pc.match_substring_regex(s, r"^(\s*|-)$")
    return pc.or_(pc.is_null(s), pc.fill_null(blank, False))


def is_regex(a):
    """True where the string compiles as a regex (see to_regex)."""
    return pc.is_valid(to_regex(a))


def is_array_type(a):
    """Typed-table engine: the column-level is_array check."""
    t = _arr(a).type
    return pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)


def is_object_type(a):
    t = _arr(a).type
    return pa.types.is_struct(t) or pa.types.is_map(t)


def is_boolean_type(a):
    return pa.types.is_boolean(_arr(a).type)


def is_timestamp_type(a):
    t = _arr(a).type
    return pa.types.is_timestamp(t) or pa.types.is_date(t)


def uuid_v4(n: int, *, seed: int | None = None):
    """n random v4 UUIDs as a string array. Deterministic when ``seed``
    is given (the batch-engine default for reproducible runs); the
    reference draws from the OS RNG (uuid_v4.rs)."""
    import uuid as _uuid

    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    raw[:, 6] = (raw[:, 6] & 0x0F) | 0x40  # version 4
    raw[:, 8] = (raw[:, 8] & 0x3F) | 0x80  # variant 10
    return pa.array([str(_uuid.UUID(bytes=bytes(r))) for r in raw], pa.string())


def get_hostname(n: int):
    """Resolve-once constant column (get_hostname.rs — like
    aws_ec2_metadata, environment facts resolve at build time)."""
    import socket

    return pa.array([socket.gethostname()] * n, pa.string())


def get_env_var(n: int, name: str, default: str | None = None):
    import os as _os

    return pa.array([_os.environ.get(name, default)] * n, pa.string())
