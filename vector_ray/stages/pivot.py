"""Pivot (long→wide) and unpivot/melt (wide→long) — the metric-table
reshapes between the engine's tall (name, tags, value) series form and
per-entity wide feature rows.

``pivot``: the distinct pivot-column values are collected first (one
small distinct pass — bounded by ``max_columns``, a pivot into
unbounded columns is a modeling error, not a scale problem), then ONE
map-only projection scatters each row's value into its column (null
elsewhere) and the existing two-phase grouped_aggregate sums/merges —
so the data pass count and shuffle shape are identical to a plain
grouped aggregate; column count, not key cardinality, is the bound.

``unpivot``: stateless map-only 1→N using one vectorized take per
value column (no shuffle).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.aggregate import grouped_aggregate


def pivot(ds, keys: Sequence[str], col: str, value: str, *,
          agg: str = "sum", max_columns: int = 1000,
          prefix: str = ""):
    """Wide table: one output column per distinct ``col`` value holding
    ``agg`` of ``value`` (agg ∈ {sum, count, min, max, mean}); rows
    grouped by ``keys``. Distinct values are sorted for a stable
    column order."""
    keys = list(keys)
    distinct = ds.select_columns([col]).unique(col)
    if len(distinct) > max_columns:
        raise ValueError(
            f"pivot would create {len(distinct)} columns "
            f"(max_columns={max_columns}) — pivot columns must be a "
            "bounded vocabulary, use groupby for open-ended keys")
    # null pivot values get no column (matching SQL PIVOT / FILTER
    # semantics: a null category matches nothing)
    vals = sorted(str(v) for v in distinct if v is not None)

    def scatter(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        cv = pc.cast(t[col], pa.string())
        for v in vals:
            m = pc.equal(cv, v)
            cols[prefix + v] = pc.if_else(
                m, t[value], pa.scalar(None, t[value].type))
        return pa.table(cols)

    specs = {prefix + v: (agg, prefix + v) for v in vals}
    wide = ds.map_batches(scatter, batch_format="pyarrow",
                          zero_copy_batch=True)
    return grouped_aggregate(wide, keys, specs)


def unpivot(ds, keys: Sequence[str], value_cols: Sequence[str], *,
            var_name: str = "name", value_name: str = "value"):
    """Long table: one row per (input row, value column); value columns
    are cast to a common type (float64 when mixed numerics)."""
    keys = list(keys)
    value_cols = list(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in keys}
            cols[var_name] = pa.array([c] * n, pa.string())
            cols[value_name] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow",
                          zero_copy_batch=True)
