"""Composable vectorized predicates — the rebuild of Vector's condition
sub-language (``check_fields``: src/conditions/check_fields.rs:442-458;
VRL boolean conditions: src/conditions/vrl.rs) as Arrow boolean masks.

A ``Cond`` is a callable ``cond(tbl: pa.Table) -> pa.BooleanArray``
composable with ``& | ~``. Used by filter, route, sample.exclude,
reduce.ends_when/starts_when, and the behavior-test assertions —
exactly the places the reference uses ``AnyCondition``.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import kernels as F


class Cond:
    def __init__(self, fn: Callable[[pa.Table], pa.ChunkedArray], name: str = "cond"):
        self._fn = fn
        self.name = name

    def __call__(self, tbl: pa.Table):
        mask = self._fn(tbl)
        # nulls are "condition false" (check_fields treats missing as no-match)
        return pc.fill_null(mask, False)

    def __and__(self, other: "Cond") -> "Cond":
        return Cond(lambda t: pc.and_(self(t), other(t)), f"({self.name} && {other.name})")

    def __or__(self, other: "Cond") -> "Cond":
        return Cond(lambda t: pc.or_(self(t), other(t)), f"({self.name} || {other.name})")

    def __invert__(self) -> "Cond":
        return Cond(lambda t: pc.invert(self(t)), f"!{self.name}")

    def __repr__(self):
        return f"Cond<{self.name}>"


class C:
    """check_fields predicate factories (all AND-ed in the reference's
    config; here compose explicitly with & | ~)."""

    @staticmethod
    def true() -> Cond:
        return Cond(lambda t: pa.array([True] * len(t), pa.bool_()), "true")

    @staticmethod
    def false() -> Cond:
        return Cond(lambda t: pa.array([False] * len(t), pa.bool_()), "false")

    @staticmethod
    def eq(field: str, value) -> Cond:
        return Cond(lambda t: pc.equal(F.get(t, field), value), f"{field}=={value!r}")

    @staticmethod
    def neq(field: str, value) -> Cond:
        return Cond(lambda t: pc.not_equal(F.get(t, field), value), f"{field}!={value!r}")

    @staticmethod
    def gt(field: str, value) -> Cond:
        return Cond(lambda t: pc.greater(F.get(t, field), value), f"{field}>{value!r}")

    @staticmethod
    def ge(field: str, value) -> Cond:
        return Cond(lambda t: pc.greater_equal(F.get(t, field), value), f"{field}>={value!r}")

    @staticmethod
    def lt(field: str, value) -> Cond:
        return Cond(lambda t: pc.less(F.get(t, field), value), f"{field}<{value!r}")

    @staticmethod
    def le(field: str, value) -> Cond:
        return Cond(lambda t: pc.less_equal(F.get(t, field), value), f"{field}<={value!r}")

    @staticmethod
    def contains(field: str, sub: str) -> Cond:
        return Cond(lambda t: pc.match_substring(F.get(t, field), sub), f"{field} contains {sub!r}")

    @staticmethod
    def prefix(field: str, p: str) -> Cond:
        return Cond(lambda t: pc.starts_with(F.get(t, field), p), f"{field} starts {p!r}")

    starts_with = prefix

    @staticmethod
    def suffix(field: str, s: str) -> Cond:
        return Cond(lambda t: pc.ends_with(F.get(t, field), s), f"{field} ends {s!r}")

    ends_with = suffix

    @staticmethod
    def regex(field: str, pattern: str) -> Cond:
        return Cond(
            lambda t: pc.match_substring_regex(F.get(t, field), pattern),
            f"{field} ~ /{pattern}/",
        )

    @staticmethod
    def exists(field: str) -> Cond:
        """Field present and non-null (check_fields `exists`)."""

        def fn(t: pa.Table):
            if field not in t.column_names and "." not in field:
                return pa.array([False] * len(t), pa.bool_())
            return pc.is_valid(F.get(t, field))

        return Cond(fn, f"exists({field})")

    @staticmethod
    def is_in(field: str, values) -> Cond:
        vs = pa.array(list(values))
        return Cond(lambda t: pc.is_in(F.get(t, field), value_set=vs), f"{field} in {values!r}")

    @staticmethod
    def length_eq(field: str, n: int) -> Cond:
        return Cond(lambda t: pc.equal(F.length(F.get(t, field)), n), f"len({field})=={n}")

    @staticmethod
    def expr(fn: Callable[[pa.Table], pa.ChunkedArray], name: str = "expr") -> Cond:
        """Escape hatch: arbitrary vectorized boolean fn (the VRL-condition
        equivalent — src/conditions/vrl.rs)."""
        return Cond(fn, name)
