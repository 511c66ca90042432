"""Declarative data-quality audit — Great-Expectations-style rule
checks over a corpus, emitting a small per-rule violation report
(the "validate before you train on it" gate; no reference counterpart,
SURVEY §2 "beyond the reference").

Rules (name, kind, col, *params):

  ("lang_set",  "in_set",   "lang", ["en", "de"])   value outside set
  ("chars_pos", "range",    "n_chars", 1, 10_000)   value outside [lo, hi]
  ("has_lang",  "not_null", "lang")                 null value
  ("id_re",     "regex",    "source", r"^[a-z]")    no regex match
  ("id_uniq",   "unique",   "doc_id")               duplicate values

Plan: every rule except ``unique`` is a map-only counting pass — one
``map_batches`` evaluates ALL such rules per block and emits one
(rule, checked, violations) partial row per rule, pre-aggregated by a
tiny groupby (shuffle volume = rules × blocks rows of three scalars).
``unique`` needs a distinct count: per-block local ``pc.unique`` then
a hash-bucket shuffle of the distinct VALUES only (the exact-dedup
shape — never the payload), counting distinct per bucket. The report
is O(rules) rows and is returned as a driver-side Arrow table.

``checked`` is the total row count for ``not_null`` and the non-null
count for every other kind (violations are always a subset of
checked, so ``violations == 0`` means the expectation holds).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rule_counts(t: pa.Table, rule) -> tuple[int, int]:
    name, kind, col = rule[0], rule[1], rule[2]
    v = t[col]
    if kind == "not_null":
        return len(t), v.null_count
    nonnull = len(t) - v.null_count
    if kind == "unique":
        return nonnull, 0  # violations patched in from the distinct pass
    vv = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
    if kind == "in_set":
        ok = pc.is_in(vv, value_set=pa.array(rule[3], vv.type))
    elif kind == "range":
        lo, hi = rule[3], rule[4]
        ok = pc.and_(pc.greater_equal(vv, lo), pc.less_equal(vv, hi))
    elif kind == "regex":
        ok = pc.match_substring_regex(pc.cast(vv, pa.string()), rule[3])
    else:
        raise ValueError(f"audit: unknown rule kind {kind!r}")
    # count only NON-NULL failing rows (is_in maps null to False, the
    # comparison kernels to null — normalize both through is_valid)
    bad_mask = pc.and_(pc.invert(pc.fill_null(ok, True)), pc.is_valid(vv))
    bad = int(pc.sum(bad_mask).as_py() or 0)
    return nonnull, bad


def _distinct_count(ds, col: str, num_buckets: int = 64) -> int:
    """Exact global distinct (non-null) count: local unique per block,
    hash-bucket shuffle of distinct values only, distinct per bucket."""
    from vector_ray.stages.bucketed import _BKT, add_bucket

    def local(t: pa.Table) -> pa.Table:
        vv = t[col].combine_chunks() if isinstance(
            t[col], pa.ChunkedArray) else t[col]
        u = pc.unique(pc.drop_null(vv))
        return add_bucket(pa.table({col: u}), [col], num_buckets)

    keyed = ds.map_batches(local, batch_format="pyarrow",
                           zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        n = len(pc.unique(g[col].combine_chunks()))
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = keyed.groupby(_BKT).map_groups(per_bucket,
                                           batch_format="pyarrow")
    return sum(r["n"] for r in parts.take_all())


def audit(ds, rules: Sequence[tuple], *, num_buckets: int = 64) -> pa.Table:
    """Evaluate every rule; returns an Arrow table (rule, kind, col,
    checked, violations) sorted by rule name."""
    rules = [tuple(r) for r in rules]
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("audit: duplicate rule names")
    counting = [r for r in rules if r[1] != "unique"] + \
        [r for r in rules if r[1] == "unique"]  # unique emits checked only

    def partials(t: pa.Table) -> pa.Table:
        rows = {"rule": [], "checked": [], "violations": []}
        for r in counting:
            chk, bad = _rule_counts(t, r)
            rows["rule"].append(r[0])
            rows["checked"].append(chk)
            rows["violations"].append(bad)
        return pa.table({
            "rule": pa.array(rows["rule"]),
            "checked": pa.array(rows["checked"], pa.int64()),
            "violations": pa.array(rows["violations"], pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("rule")
           .aggregate(Sum("checked"), Sum("violations")))
    got = {r["rule"]: (r["sum(checked)"], r["sum(violations)"])
           for r in agg.take_all()}

    out = {"rule": [], "kind": [], "col": [], "checked": [],
           "violations": []}
    for r in sorted(rules, key=lambda x: x[0]):
        chk, bad = got.get(r[0], (0, 0))
        if r[1] == "unique":
            bad = chk - _distinct_count(ds, r[2], num_buckets)
        out["rule"].append(r[0])
        out["kind"].append(r[1])
        out["col"].append(r[2])
        out["checked"].append(int(chk))
        out["violations"].append(int(bad))
    return pa.table({
        "rule": pa.array(out["rule"]),
        "kind": pa.array(out["kind"]),
        "col": pa.array(out["col"]),
        "checked": pa.array(out["checked"], pa.int64()),
        "violations": pa.array(out["violations"], pa.int64()),
    })
