"""Parser transforms — regex_parser, grok_parser, json_parser,
key_value_parser, logfmt_parser, tokenizer, split — all stateless
vectorized ``map_batches`` stages built on ``pyarrow.compute``
(``extract_regex`` does the heavy lifting; regexes compile once per
stage at construction, mirroring the reference compiling at config
build).

Reference impls: src/transforms/{regex_parser.rs:242-300,
grok_parser.rs:107-148, json_parser.rs:13-20, key_value_parser.rs:16-29,
logfmt_parser.rs:15-20, tokenizer.rs:16-22, split.rs:16-23}.
"""

from __future__ import annotations

import io
import json as _json
import re
from typing import Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray import grok as _grok
from vector_ray.expr import F
from vector_ray.stages.base import BatchStep


def _group_names(pattern: str) -> List[str]:
    return list(re.compile(pattern).groupindex.keys())


def _null_str(n: int):
    return pa.nulls(n, pa.string())


class RegexParser(BatchStep):
    """Multi-pattern, first-match-wins named-capture extraction
    (regex_parser.rs:242-300; RegexSet first-match at :248).

    - ``patterns``: list of regexes with (?P<name>...) captures.
    - ``types``: per-capture Conversion coercion (int/float/bool/
      timestamp|fmt).
    - ``target_field``: nest captures under a struct column instead of
      top-level merge; ``overwrite_target`` guards an existing column.
    - ``drop_failed``: drop rows no pattern matched.
    - ``drop_field``: drop the source column unless recaptured
      (regex_parser.rs:222-228).
    """

    def __init__(
        self,
        field: str,
        patterns: Sequence[str],
        *,
        types: Optional[Dict[str, str]] = None,
        target_field: Optional[str] = None,
        overwrite_target: bool = True,
        drop_failed: bool = False,
        drop_field: bool = True,
        matched_col: Optional[str] = None,
    ):
        self.field = field
        self.patterns = list(patterns)
        self.capture_names = [_group_names(p) for p in self.patterns]
        self.all_names: List[str] = []
        for names in self.capture_names:
            for n in names:
                if n not in self.all_names:
                    self.all_names.append(n)
        self.types = types or {}
        self.target_field = target_field
        self.overwrite_target = overwrite_target
        self.drop_failed = drop_failed
        self.drop_field = drop_field
        self.matched_col = matched_col

    def transform(self, tbl: pa.Table) -> pa.Table:
        src = tbl[self.field]
        n = len(tbl)
        structs = [pc.extract_regex(src, p) for p in self.patterns]
        matched = [pc.is_valid(s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s) for s in structs]

        # first-match-wins overlay: apply in reverse so earlier patterns win
        values: Dict[str, pa.Array] = {name: _null_str(n) for name in self.all_names}
        for i in range(len(self.patterns) - 1, -1, -1):
            s = structs[i]
            for name in self.all_names:
                vi = pc.struct_field(s, name) if name in self.capture_names[i] else _null_str(n)
                values[name] = pc.if_else(matched[i], vi, values[name])

        any_match = matched[0]
        for m in matched[1:]:
            any_match = pc.or_(any_match, m)

        # typed coercion
        for name, kind in self.types.items():
            if name in values:
                values[name] = F.coerce(values[name], kind)

        out = tbl
        if self.drop_field and self.field not in values:
            out = F.del_(out, self.field)
        if self.target_field is not None:
            if self.target_field in out.column_names and not self.overwrite_target:
                pass  # reference logs + keeps original (regex_parser.rs target guard)
            else:
                struct = pa.StructArray.from_arrays(
                    [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in values.values()],
                    names=list(values.keys()),
                )
                out = F.set_(out, self.target_field, struct)
        else:
            for name, v in values.items():
                out = F.set_(out, name, v)
        if self.matched_col:
            out = F.set_(out, self.matched_col, any_match)
        if self.drop_failed:
            out = out.filter(any_match)
        return out


class GrokParser(RegexParser):
    """grok_parser.rs:107-148 — grok pattern expanded to a regex at
    construction (vector_ray.grok.expand), then identical machinery.
    Non-matching rows pass through unchanged (no drop_failed default),
    matching the reference."""

    def __init__(
        self,
        field: str,
        pattern: str,
        *,
        custom_patterns: Optional[Dict[str, str]] = None,
        types: Optional[Dict[str, str]] = None,
        drop_field: bool = False,
        **kw,
    ):
        regex = _grok.expand(pattern, library=custom_patterns)
        super().__init__(field, [regex], types=types, drop_field=drop_field, **kw)
        self.grok_pattern = pattern


class JsonParser(BatchStep):
    """json_parser.rs:13-20 — parse ``field`` as a JSON object into a
    struct (``target_field``) or merged top-level columns.

    Fast path: the whole column is fed to ``pyarrow.json.read_json``
    as newline-delimited JSON in one shot (vectorized C++ parse);
    falls back to per-row ``json.loads`` with an error mask when rows
    are invalid or contain embedded newlines. ``drop_invalid`` drops
    rows that fail to parse, else they pass through with nulls.
    """

    def __init__(
        self,
        field: str = "message",
        *,
        target_field: Optional[str] = None,
        drop_invalid: bool = False,
        drop_field: bool = True,
        overwrite_target: bool = True,
    ):
        self.field = field
        self.target_field = target_field
        self.drop_invalid = drop_invalid
        self.drop_field = drop_field
        self.overwrite_target = overwrite_target

    def _parse(self, src: pa.ChunkedArray):
        """→ (struct_array, ok_mask)"""
        n = len(src)
        vals = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        no_null = vals.null_count == 0
        has_newline = pc.any(pc.match_substring(pc.fill_null(vals, ""), "\n")).as_py()
        if no_null and not has_newline and n > 0:
            try:
                import pyarrow.json as pj

                buf = ("\n".join(vals.to_pylist()) + "\n").encode()
                parsed = pj.read_json(io.BytesIO(buf))
                if parsed.num_rows == n:
                    struct = parsed.to_struct_array().combine_chunks()
                    return struct, pa.array([True] * n)
            except Exception:
                pass
        # row fallback with error mask
        rows, ok = [], []
        for v in vals.to_pylist():
            try:
                obj = _json.loads(v) if v is not None else None
                if not isinstance(obj, dict):
                    raise ValueError
                rows.append(obj)
                ok.append(True)
            except Exception:
                rows.append(None)
                ok.append(False)
        return pa.array(rows), pa.array(ok)

    def transform(self, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            # JSON-derived columns are data-dependent; an empty batch has
            # no keys to derive (document: schema on empty blocks omits
            # parse outputs, as in any schema-on-read JSON path)
            return F.del_(tbl, self.field) if self.drop_field else tbl
        struct, ok = self._parse(tbl[self.field])
        out = tbl
        if self.drop_field:
            out = F.del_(out, self.field)
        if self.target_field is not None:
            if self.target_field in out.column_names and not self.overwrite_target:
                pass
            else:
                out = F.set_(out, self.target_field, struct)
        else:
            out = F.merge_struct(out, struct)
        if self.drop_invalid:
            out = out.filter(ok)
        return out


class KeyValueParser(BatchStep):
    """key_value_parser.rs:16-29 — split on ``separator`` then
    ``field_split``; vectorized one-regex-per-requested-key when
    ``fields`` is given (the scalable path), full per-row key discovery
    otherwise (small-data path, documented).
    """

    def __init__(
        self,
        field: str = "message",
        *,
        separator: str = " ",
        field_split: str = "=",
        fields: Optional[Sequence[str]] = None,
        types: Optional[Dict[str, str]] = None,
        drop_field: bool = True,
        trim_key: str = "",
        trim_value: str = "\"",
    ):
        self.field = field
        self.separator = separator
        self.field_split = field_split
        self.fields = list(fields) if fields else None
        self.types = types or {}
        self.drop_field = drop_field
        self.trim_key = trim_key
        self.trim_value = trim_value
        if self.fields:
            sep = re.escape(separator)
            fs = re.escape(field_split)
            self._pats = {
                k: rf"(?:^|{sep}){re.escape(k)}{fs}(?P<v>\"[^\"]*\"|[^{sep}]*)"
                for k in self.fields
            }

    def _strip_value(self, v):
        return pc.replace_substring_regex(v, r'^"(.*)"$', r"\1")

    def transform(self, tbl: pa.Table) -> pa.Table:
        src = tbl[self.field]
        out = tbl
        if self.fields:
            for k, pat in self._pats.items():
                s = pc.extract_regex(src, pat)
                v = self._strip_value(pc.struct_field(s, "v"))
                if k in self.types:
                    v = F.coerce(v, self.types[k])
                out = F.set_(out, k, v)
        else:
            # discovery path: per-row dict parse (small data / tests only)
            rows = []
            for v in (src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src).to_pylist():
                d = {}
                if v:
                    for part in v.split(self.separator):
                        if self.field_split in part:
                            key, _, val = part.partition(self.field_split)
                            key = key.strip(self.trim_key) if self.trim_key else key.strip()
                            val = val.strip(self.trim_value)
                            if key:
                                d[key] = val
                rows.append(d or None)
            struct = pa.array(rows)
            out = F.merge_struct(out, struct)
            for k, kind in self.types.items():
                if k in out.column_names:
                    out = F.set_(out, k, F.coerce(out[k], kind))
        if self.drop_field:
            out = F.del_(out, self.field)
        return out


class LogfmtParser(KeyValueParser):
    """logfmt_parser.rs:15-20 — logfmt = kv with space separator and
    '=' field split."""

    def __init__(self, field: str = "message", **kw):
        kw.setdefault("separator", " ")
        kw.setdefault("field_split", "=")
        super().__init__(field, **kw)


_TOK = r"(?:\"[^\"]*\"|\[[^\]]*\]|\S+)"


class Tokenizer(BatchStep):
    """tokenizer.rs:16-22 / lib/shared/src/tokenize.rs:11-35 —
    whitespace-tokenize respecting "…" and […] quoting; positional
    assignment to ``field_names``; '-' → null. Built as ONE anchored
    regex with a named group per field, executed vectorized."""

    def __init__(
        self,
        field: str,
        field_names: Sequence[str],
        *,
        types: Optional[Dict[str, str]] = None,
        drop_field: bool = True,
    ):
        self.field = field
        self.field_names = list(field_names)
        self.types = types or {}
        self.drop_field = drop_field
        groups = [rf"(?P<{name}>{_TOK})" for name in self.field_names]
        self._pattern = r"^\s*" + r"\s+".join(groups)

    def _clean(self, v):
        v = pc.replace_substring_regex(v, r'^"(.*)"$', r"\1")
        v = pc.replace_substring_regex(v, r"^\[(.*)\]$", r"\1")
        return pc.if_else(pc.equal(v, "-"), pa.scalar(None, pa.string()), v)

    def transform(self, tbl: pa.Table) -> pa.Table:
        s = pc.extract_regex(tbl[self.field], self._pattern)
        out = tbl
        for name in self.field_names:
            v = self._clean(pc.struct_field(s, name))
            if name in self.types:
                v = F.coerce(v, self.types[name])
            out = F.set_(out, name, v)
        if self.drop_field:
            out = F.del_(out, self.field)
        return out


class SplitParser(BatchStep):
    """split.rs:16-23 — split ``field`` on a literal separator (default
    any whitespace) and assign parts positionally to ``field_names``."""

    def __init__(
        self,
        field: str,
        field_names: Sequence[str],
        *,
        separator: Optional[str] = None,
        types: Optional[Dict[str, str]] = None,
        drop_field: bool = True,
    ):
        self.field = field
        self.field_names = list(field_names)
        self.types = types or {}
        self.drop_field = drop_field
        if separator is None:
            part, sep = r"\S+", r"\s+"
        else:
            esc = re.escape(separator)
            part, sep = rf"[^{esc}]*", esc
        groups = [rf"(?P<{name}>{part})" for name in self.field_names]
        self._pattern = r"^" + sep.join(groups)

    def transform(self, tbl: pa.Table) -> pa.Table:
        s = pc.extract_regex(tbl[self.field], self._pattern)
        out = tbl
        for name in self.field_names:
            v = pc.struct_field(s, name)
            if name in self.types:
                v = F.coerce(v, self.types[name])
            out = F.set_(out, name, v)
        if self.drop_field:
            out = F.del_(out, self.field)
        return out
