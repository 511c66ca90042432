"""ROLLUP / GROUPING-SETS aggregation over key prefixes.

Scale plan: ONE two-phase pass over the data at the finest level
(stages/aggregate.grouped_aggregate — local mergeable partials, then a
bucketed merge shuffle of group rows only); every coarser level then
re-aggregates the FINEST RESULT, which is |distinct key combos| rows —
tiny next to the input — so a D-level rollup costs one real shuffle
plus D-1 shuffles of the aggregate table. Valid because every
supported kind is algebraic: sum/count re-sum, min/max re-min/max,
mean is carried as (sum, count) and divided once per level.

Output: all key columns (null = rolled away, like SQL ROLLUP) plus
``grouping_level`` = number of active keys (the GROUPING() bitmask
equivalent — it disambiguates genuine null key values from rollup
nulls, same as SQL).

Kinds: sum, count, min, max, mean.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.aggregate import grouped_aggregate

_ALL = "__rollup_all"


def _internal_specs(specs: Dict[str, Tuple[str, str]]):
    """Rewrite user specs to mergeable internal columns and the
    re-aggregation specs for coarser levels."""
    finest: dict = {}
    coarse: dict = {}
    finish: list = []  # (out_name, kind) in user order
    for name, (kind, col) in specs.items():
        if kind in ("sum", "min", "max"):
            finest[name] = (kind, col)
            coarse[name] = ("sum" if kind == "sum" else kind, name)
            finish.append((name, kind))
        elif kind == "count":
            finest[name] = ("count", col)
            coarse[name] = ("sum", name)  # counts re-SUM upward
            finish.append((name, kind))
        elif kind == "mean":
            finest[f"{name}__s"] = ("sum", col)
            finest[f"{name}__c"] = ("count", col)
            coarse[f"{name}__s"] = ("sum", f"{name}__s")
            coarse[f"{name}__c"] = ("sum", f"{name}__c")
            finish.append((name, "mean"))
        else:
            raise ValueError(f"rollup does not support kind {kind!r} "
                             "(needs an algebraic merge)")
    return finest, coarse, finish


def _finish_level(ds, keys_all: Sequence[str], keys_active: Sequence[str],
                  finish, key_types) -> "pa.Table":
    level = len(keys_active)

    def fin(t: pa.Table) -> pa.Table:
        cols = {}
        for k in keys_all:
            cols[k] = (t[k] if k in keys_active
                       else pa.nulls(len(t), key_types[k]))
        cols["grouping_level"] = pa.array([level] * len(t), pa.int32())
        for name, kind in finish:
            if kind == "mean":
                cols[name] = pc.divide(
                    pc.cast(t[f"{name}__s"], pa.float64()),
                    pc.cast(t[f"{name}__c"], pa.float64()))
            else:
                cols[name] = t[name]
        return pa.table(cols)

    return ds.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def rollup_aggregate(ds, keys: Sequence[str],
                     specs: Dict[str, Tuple[str, str]]):
    """SQL ``GROUP BY ROLLUP(keys...)`` (see module docstring)."""
    keys = list(keys)
    schema = ds.schema()
    key_types = {k: schema.types[schema.names.index(k)] for k in keys}
    finest_specs, coarse_specs, finish = _internal_specs(specs)

    finest = grouped_aggregate(ds, keys, finest_specs)
    out = _finish_level(finest, keys, keys, finish, key_types)
    level_in = finest
    for d in range(len(keys) - 1, -1, -1):
        sub = keys[:d]
        if sub:
            level_in = grouped_aggregate(level_in, sub, coarse_specs)
        else:
            # global level: constant key, dropped after the aggregate
            withc = level_in.map_batches(
                lambda t: t.append_column(_ALL, pa.array([0] * len(t),
                                                         pa.int8())),
                batch_format="pyarrow", zero_copy_batch=True)
            level_in = grouped_aggregate(withc, [_ALL], coarse_specs)
            level_in = level_in.drop_columns([_ALL])
        out = out.union(_finish_level(level_in, keys, sub, finish,
                                      key_types))
    return out
