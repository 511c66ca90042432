"""Datadog log-search condition syntax → vectorized ``Cond``.

Rebuild of ``src/conditions/datadog_search.rs`` (which delegates to the
datadog-search-syntax crate): parses the Datadog log search query
grammar into the engine's composable Arrow predicate.

Supported (the documented grammar of Datadog log search):
- full-text terms on the default field: ``error``, ``"exact phrase"``,
  wildcards ``serv*`` (case-insensitive token match)
- facets: ``field:value``, ``field:"quoted value"``, ``field:val*``
- numeric comparisons: ``field:>5``, ``field:>=5``, ``field:<5``,
  ``field:<=5`` and ranges ``field:[1 TO 10]``
- existence: ``_exists_:field``, ``_missing_:field``
- boolean: ``AND`` (also implicit between adjacent terms), ``OR``,
  ``NOT`` / ``-`` prefix, parentheses; ``*`` / ``*:*`` matches all

Documented simplifications vs the reference: tag-array semantics
(``tags:a`` searching a list column) match when any element equals the
value; attribute path lookup is the engine's dotted-column ``F.get``;
no ``~`` fuzzy operator.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import kernels as F
from vector_ray.expr.conditions import C, Cond

_TOKEN_RE = re.compile(
    r"""\s*(?:
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<op>OR\b|AND\b|NOT\b) |
    (?P<neg>-) |
    (?P<kv>[@\w.*_][-@\w.*_]*:(?:"[^"]*"|\[[^\]]*\]|[^\s()]+)) |
    (?P<quoted>"[^"]*") |
    (?P<word>[^\s()]+)
    )""",
    re.X,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if m is None or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"bad datadog search syntax at {q[pos:]!r}")
        pos = m.end()
        for kind in ("lparen", "rparen", "op", "neg", "kv", "quoted", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def _wildcard_to_regex(value: str) -> str:
    parts = [re.escape(p) for p in value.split("*")]
    return ".*".join(parts)


_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def _safe_get(t: pa.Table, field: str):
    """Column or None when the facet is absent (absent facet = no
    match, like the reference's missing-attribute behavior)."""
    if field in t.column_names:
        return t[field]
    if "." in field:
        try:
            return F.get(t, field)
        except KeyError:
            return None
    return None


def _num_cast(col):
    """Column → float64, invalid entries → null (so they never match).
    String-typed numeric fields are the common case in parsed logs;
    Datadog compares numerically whenever the query operand is numeric."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        s = pc.cast(col, pa.string())
        ok = pc.match_substring_regex(s, r"^\s*-?\d+(\.\d+)?([eE][+-]?\d+)?\s*$")
        s = pc.if_else(pc.fill_null(ok, False), s, pa.nulls(len(s), pa.string()))
        return pc.cast(s, pa.float64())
    return pc.cast(col, pa.float64())


def _field_cmp(field: str, op: str, raw: str) -> Cond:
    val = float(raw) if _NUM_RE.match(raw) else raw

    def fn(t: pa.Table):
        col = _safe_get(t, field)
        if col is None:
            return pa.array([False] * len(t), pa.bool_())
        if isinstance(val, float):
            # numeric operand → numeric compare regardless of column type
            try:
                c = _num_cast(col)
                v = val
            except pa.ArrowInvalid:
                c = pc.cast(col, pa.string())
                v = str(raw)
        else:
            c = pc.cast(col, pa.string())
            v = str(raw)
        res = {
            ">": pc.greater, ">=": pc.greater_equal,
            "<": pc.less, "<=": pc.less_equal,
        }[op](c, v)
        return pc.fill_null(res, False)

    return Cond(fn, f"{field}{op}{raw}")


def _field_eq(field: str, value: str) -> Cond:
    """Facet equality; wildcards become anchored case-sensitive regex;
    list (tag) columns match if ANY element matches."""
    has_wild = "*" in value
    rx = "^" + _wildcard_to_regex(value) + "$" if has_wild else None

    def fn(t: pa.Table):
        col = _safe_get(t, field)
        if col is None:
            return pa.array([False] * len(t), pa.bool_())
        typ = col.type
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            pat = rx if rx is not None else "^" + re.escape(value) + "$"
            return F.match_array(col, pat)
        if rx is not None:
            return pc.match_substring_regex(pc.cast(col, pa.string()), rx)
        if _NUM_RE.match(value) and not pa.types.is_string(typ):
            return pc.equal(pc.cast(col, pa.float64()), float(value))
        return pc.equal(pc.cast(col, pa.string()), value)

    return Cond(fn, f"{field}:{value}")


def _text_term(default_field: str, value: str, *, phrase: bool) -> Cond:
    """Full-text term on the default field: case-insensitive token match
    (word boundaries) or phrase substring."""
    if phrase:
        pat = "(?i)" + re.escape(value)
    elif "*" in value:
        pat = r"(?i)\b" + _wildcard_to_regex(value) + r"\b"
    else:
        pat = r"(?i)\b" + re.escape(value) + r"\b"

    def fn(t: pa.Table):
        if default_field not in t.column_names:
            return pa.array([False] * len(t), pa.bool_())
        return pc.match_substring_regex(pc.cast(t[default_field], pa.string()), pat)

    return Cond(fn, f"text:{value}")


class _Parser:
    def __init__(self, tokens: list, default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Cond:
        c = self.or_expr()
        if self.i < len(self.toks):
            raise ValueError(f"unexpected token {self.toks[self.i]!r}")
        return c

    def or_expr(self) -> Cond:
        left = self.and_expr()
        while self.peek() == ("op", "OR"):
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Cond:
        left = self.unary()
        while True:
            kind, val = self.peek()
            if kind is None or kind == "rparen" or (kind == "op" and val == "OR"):
                return left
            if kind == "op" and val == "AND":
                self.next()
                left = left & self.unary()
            else:  # implicit AND
                left = left & self.unary()

    def unary(self) -> Cond:
        kind, val = self.peek()
        if kind == "neg" or (kind == "op" and val == "NOT"):
            self.next()
            return ~self.unary()
        return self.atom()

    def atom(self) -> Cond:
        kind, val = self.next()
        if kind == "lparen":
            c = self.or_expr()
            if self.next()[0] != "rparen":
                raise ValueError("unbalanced parentheses")
            return c
        if kind == "quoted":
            return _text_term(self.default_field, val[1:-1], phrase=True)
        if kind == "word":
            if val == "*":
                return C.true()
            return _text_term(self.default_field, val, phrase=False)
        if kind == "kv":
            field, value = val.split(":", 1)
            if field == "*" and value == "*":
                return C.true()
            if field == "_exists_":
                return C.exists(value)
            if field == "_missing_":
                return ~C.exists(value)
            if value.startswith('"') and value.endswith('"'):
                return _field_eq(field, value[1:-1])
            if value.startswith("[") and value.endswith("]"):
                m = re.match(r"^\[(\S+)\s+TO\s+(\S+)\]$", value)
                if not m:
                    raise ValueError(f"bad range {value!r}")
                lo, hi = m.group(1), m.group(2)
                conds = []
                if lo != "*":
                    conds.append(_field_cmp(field, ">=", lo))
                if hi != "*":
                    conds.append(_field_cmp(field, "<=", hi))
                if not conds:
                    return C.true()
                c = conds[0]
                for extra in conds[1:]:
                    c = c & extra
                return c
            for op in (">=", "<=", ">", "<"):
                if value.startswith(op):
                    return _field_cmp(field, op, value[len(op):])
            return _field_eq(field, value)
        raise ValueError(f"unexpected token {(kind, val)!r}")


def parse_datadog_search(query: str, *, default_field: str = "message") -> Cond:
    query = query.strip()
    if not query:
        return C.true()
    tokens = _tokenize(query)
    cond = _Parser(tokens, default_field).parse()
    cond.name = f"datadog_search({query!r})"
    return cond
