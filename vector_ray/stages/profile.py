"""Table profiling — the batch analogue of DuckDB ``SUMMARIZE`` /
pandas ``describe``: one streaming pass, one tiny row per column per
block (mergeable partials), a final grouped merge over O(#columns)
rows. No reference counterpart (the reference routes events, it never
inspects a whole table; SURVEY §2 "beyond the reference" — the
data-quality step every curation pipeline starts with).

Per column: total row count, null count, min, max (and sum/mean for
numerics). Min/max of every type is order-independent-exact, so a
plain-SQL oracle hash-matches; float sums are order-dependent and are
therefore exposed but NOT part of the oracle contract (documented).

Partials carry min/max in THREE typed channels (int64 / float64 /
string) — one active per column — because a single Arrow column can't
mix the source types without lossy casts (int64 > 2^53 would corrupt
through float64; string-casting before the merge would compare
lexicographically: "10" < "9")."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _fmt_float(v: float) -> str:
    return repr(float(v))


def profile(ds, columns: Optional[Sequence[str]] = None):
    """Returns a Dataset with one row per profiled column:
    ``(column, dtype, cnt, nulls, min, max, sum, mean)`` — min/max
    rendered as strings from the typed channel (integers without a
    float round-trip), sum/mean float64 (null for non-numerics)."""
    from vector_ray.stages.aggregate import grouped_aggregate

    schema = ds.schema()
    names = list(schema.names)
    cols = list(columns) if columns is not None else names
    types = {n: t for n, t in zip(names, schema.types)}

    def part(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("column", "cnt", "nulls", "imin", "imax",
                               "fmin", "fmax", "smin", "smax", "fsum")}
        for c in cols:
            col = t[c]
            ty = types[c]
            out["column"].append(c)
            out["cnt"].append(len(col))
            out["nulls"].append(col.null_count)
            imin = imax = fmin = fmax = smin = smax = fsum = None
            if len(col) > col.null_count:
                if pa.types.is_integer(ty):
                    mm = pc.min_max(col)
                    imin, imax = mm["min"].as_py(), mm["max"].as_py()
                    fsum = float(pc.sum(col).as_py())
                elif pa.types.is_floating(ty):
                    mm = pc.min_max(col)
                    fmin, fmax = mm["min"].as_py(), mm["max"].as_py()
                    fsum = float(pc.sum(col).as_py())
                elif pa.types.is_string(ty) or pa.types.is_large_string(ty):
                    mm = pc.min_max(col)
                    smin, smax = mm["min"].as_py(), mm["max"].as_py()
                elif pa.types.is_timestamp(ty):
                    mm = pc.min_max(pc.cast(col, pa.int64()))
                    imin, imax = mm["min"].as_py(), mm["max"].as_py()
                elif pa.types.is_boolean(ty):
                    mm = pc.min_max(pc.cast(col, pa.int64()))
                    imin, imax = mm["min"].as_py(), mm["max"].as_py()
                    fsum = float(pc.sum(pc.cast(col, pa.int64())).as_py())
                # nested/list/binary: count+nulls only
            out["imin"].append(imin)
            out["imax"].append(imax)
            out["fmin"].append(fmin)
            out["fmax"].append(fmax)
            out["smin"].append(smin)
            out["smax"].append(smax)
            out["fsum"].append(fsum)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "cnt": pa.array(out["cnt"], pa.int64()),
            "nulls": pa.array(out["nulls"], pa.int64()),
            "imin": pa.array(out["imin"], pa.int64()),
            "imax": pa.array(out["imax"], pa.int64()),
            "fmin": pa.array(out["fmin"], pa.float64()),
            "fmax": pa.array(out["fmax"], pa.float64()),
            "smin": pa.array(out["smin"], pa.string()),
            "smax": pa.array(out["smax"], pa.string()),
            "fsum": pa.array(out["fsum"], pa.float64()),
        })

    # Ray Data never calls the batch fn for zero-row blocks, so an
    # entirely EMPTY dataset would produce no per-column rows at all;
    # seed one all-empty partial per column so the merge always has
    # the full column set (duplicate seeds for non-empty inputs merge
    # away as +0 / null-min)
    import ray.data as rd

    seed = part(pa.table({n: pa.array([], t) for n, t in
                          zip(schema.names, schema.types)}))
    partials = ds.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True).union(
                                   rd.from_arrow(seed))
    merged = grouped_aggregate(partials, ["column"], {
        "cnt": ("sum", "cnt"), "nulls": ("sum", "nulls"),
        "imin": ("min", "imin"), "imax": ("max", "imax"),
        "fmin": ("min", "fmin"), "fmax": ("max", "fmax"),
        "smin": ("min", "smin"), "smax": ("max", "smax"),
        "fsum": ("sum", "fsum"),
    })

    def render(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("column", "dtype", "cnt", "nulls",
                                "min", "max", "sum", "mean")}
        for i in range(len(t)):  # O(#columns) rows total, not data-sized
            c = t["column"][i].as_py()
            ty = types.get(c)
            cnt = t["cnt"][i].as_py() or 0
            nulls = t["nulls"][i].as_py() or 0
            imin, imax = t["imin"][i].as_py(), t["imax"][i].as_py()
            fmin, fmax = t["fmin"][i].as_py(), t["fmax"][i].as_py()
            smin, smax = t["smin"][i].as_py(), t["smax"][i].as_py()
            fsum = t["fsum"][i].as_py()
            if imin is not None:
                mn, mx = str(imin), str(imax)
            elif fmin is not None:
                mn, mx = _fmt_float(fmin), _fmt_float(fmax)
            elif smin is not None:
                mn, mx = smin, smax
            else:
                mn = mx = None
            nonnull = cnt - nulls
            rows["column"].append(c)
            rows["dtype"].append(str(ty))
            rows["cnt"].append(cnt)
            rows["nulls"].append(nulls)
            rows["min"].append(mn)
            rows["max"].append(mx)
            rows["sum"].append(fsum)
            rows["mean"].append(
                fsum / nonnull if fsum is not None and nonnull else None)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "dtype": pa.array(rows["dtype"], pa.string()),
            "cnt": pa.array(rows["cnt"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "min": pa.array(rows["min"], pa.string()),
            "max": pa.array(rows["max"], pa.string()),
            "sum": pa.array(rows["sum"], pa.float64()),
            "mean": pa.array(rows["mean"], pa.float64()),
        })

    return merged.map_batches(render, batch_format="pyarrow",
                              zero_copy_batch=True)
