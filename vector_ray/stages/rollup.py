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


def _fin_table(t: pa.Table, keys_all: Sequence[str],
               keys_active: Sequence[str], finish, key_types) -> pa.Table:
    """Render one rollup level: null out rolled-away keys, stamp
    grouping_level, finalize means from carried (sum, count)."""
    level = len(keys_active)
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


def _finish_level(ds, keys_all: Sequence[str], keys_active: Sequence[str],
                  finish, key_types):
    return ds.map_batches(
        lambda t: _fin_table(t, keys_all, keys_active, finish, key_types),
        batch_format="pyarrow", zero_copy_batch=True)


def _local_coarse(tbl: pa.Table, sub: Sequence[str], coarse_specs) -> pa.Table:
    """Re-aggregate the (small, driver-local) finest table to one
    coarser level with pyarrow group_by. coarse_specs is out → (kind,
    src) where src == out by construction, so the f"{src}_{kind}"
    output columns rename 1:1."""
    drop_all = False
    if not sub:
        tbl = tbl.append_column(_ALL, pa.array([0] * len(tbl), pa.int8()))
        sub, drop_all = [_ALL], True
    aggs = [(src, kind) for _, (kind, src) in coarse_specs.items()]
    out = tbl.group_by(list(sub), use_threads=False).aggregate(aggs)
    names = []
    for n in out.column_names:
        for name, (kind, src) in coarse_specs.items():
            if n == f"{src}_{kind}":
                n = name
                break
        names.append(n)
    out = out.rename_columns(names)
    if drop_all:
        out = out.drop_columns([_ALL])
    return out


def rollup_aggregate(ds, keys: Sequence[str],
                     specs: Dict[str, Tuple[str, str]],
                     *, local_threshold: int = 1_000_000):
    """SQL ``GROUP BY ROLLUP(keys...)`` (see module docstring).

    The finest level is ONE two-phase distributed aggregate,
    materialized so the coarser levels (and the final union) never
    re-execute its shuffle (Ray Datasets don't cache shared lineage —
    without the materialize a D-level rollup would re-run the real
    shuffle D+1 times). When the finest result has ≤ local_threshold
    rows it comes to the driver once and all coarser levels are local
    pyarrow group_bys — zero extra Ray stages; otherwise each coarser
    level is a distributed re-aggregate of the (materialized) previous
    level's table.
    """
    keys = list(keys)
    schema = ds.schema()
    key_types = {k: schema.types[schema.names.index(k)] for k in keys}
    finest_specs, coarse_specs, finish = _internal_specs(specs)

    finest = grouped_aggregate(ds, keys, finest_specs).materialize()

    if finest.count() <= local_threshold:
        import ray
        import ray.data

        blocks = [b for b in ray.get(finest.to_arrow_refs()) if len(b)]
        names = blocks[0].column_names if blocks else finest.schema().names
        tbl = pa.concat_tables(
            [b.select(names) for b in blocks]).combine_chunks()
        parts = [_fin_table(tbl, keys, keys, finish, key_types)]
        level_in = tbl
        for d in range(len(keys) - 1, -1, -1):
            sub = keys[:d]
            level_in = _local_coarse(level_in, sub, coarse_specs)
            parts.append(_fin_table(level_in, keys, sub, finish, key_types))
        return ray.data.from_arrow(
            pa.concat_tables(parts, promote_options="permissive"))

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
        level_in = level_in.materialize()
        out = out.union(_finish_level(level_in, keys, sub, finish,
                                      key_types))
    return out


def _grouping_id(keys: Sequence[str], active: Sequence[str]) -> int:
    """SQL GROUPING(keys...) bitmask: bit (D-1-i) set iff keys[i] is
    aggregated away (the ANSI convention DuckDB follows)."""
    act = set(active)
    gid = 0
    for i, k in enumerate(keys):
        if k not in act:
            gid |= 1 << (len(keys) - 1 - i)
    return gid


def grouping_sets_aggregate(ds, keys: Sequence[str],
                            sets: Sequence[Sequence[str]],
                            specs: Dict[str, Tuple[str, str]],
                            *, local_threshold: int = 1_000_000):
    """SQL ``GROUP BY GROUPING SETS (...)`` over subsets of ``keys``.

    Same plan as rollup_aggregate: ONE distributed aggregate at the
    finest level (all of ``keys``), materialized once; every requested
    set then re-aggregates that result — locally (pyarrow group_by)
    when it is ≤ local_threshold rows, else distributed. Output adds
    ``grouping_id`` (the ANSI GROUPING() bitmask over ``keys``), which
    disambiguates genuine null key values from aggregated-away nulls.
    Each set must be a subset of ``keys``; aggregates must be algebraic
    (sum/count/min/max/mean — see _internal_specs).
    """
    keys = list(keys)
    sets = [list(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} is not a subset of {keys}")
    schema = ds.schema()
    key_types = {k: schema.types[schema.names.index(k)] for k in keys}
    finest_specs, coarse_specs, finish = _internal_specs(specs)

    finest = grouped_aggregate(ds, keys, finest_specs).materialize()

    def _stamp(t: pa.Table, active) -> pa.Table:
        t = _fin_table(t, keys, active, finish, key_types)
        gid = pa.array([_grouping_id(keys, active)] * len(t), pa.int32())
        return t.set_column(t.column_names.index("grouping_level"),
                            "grouping_id", gid)

    if finest.count() <= local_threshold:
        import ray
        import ray.data

        blocks = [b for b in ray.get(finest.to_arrow_refs()) if len(b)]
        names = blocks[0].column_names if blocks else finest.schema().names
        tbl = pa.concat_tables(
            [b.select(names) for b in blocks]).combine_chunks()
        parts = []
        for s in sets:
            lvl = tbl if s == keys else _local_coarse(tbl, s, coarse_specs)
            parts.append(_stamp(lvl, s))
        return ray.data.from_arrow(
            pa.concat_tables(parts, promote_options="permissive"))

    out = None
    for s in sets:
        if s == keys:
            lvl = finest
        elif s:
            lvl = grouped_aggregate(finest, s, coarse_specs).materialize()
        else:
            withc = finest.map_batches(
                lambda t: t.append_column(_ALL, pa.array([0] * len(t),
                                                         pa.int8())),
                batch_format="pyarrow", zero_copy_batch=True)
            lvl = grouped_aggregate(withc, [_ALL], coarse_specs)
            lvl = lvl.drop_columns([_ALL]).materialize()
        fin = lvl.map_batches(
            lambda t, s=s: _stamp(t, s),
            batch_format="pyarrow", zero_copy_batch=True)
        out = fin if out is None else out.union(fin)
    return out


def cube_aggregate(ds, keys: Sequence[str],
                   specs: Dict[str, Tuple[str, str]],
                   *, local_threshold: int = 1_000_000):
    """SQL ``GROUP BY CUBE(keys...)`` — all 2^D key subsets. D is
    bounded (cube explodes combinatorially); practical D ≤ 5."""
    keys = list(keys)
    if len(keys) > 8:
        raise ValueError("cube over more than 8 keys (256 grouping "
                         "sets) — use explicit grouping_sets_aggregate")
    sets = []
    for m in range(1 << len(keys)):
        sets.append([k for i, k in enumerate(keys)
                     if not (m >> (len(keys) - 1 - i)) & 1])
    return grouping_sets_aggregate(ds, keys, sets, specs,
                                   local_threshold=local_threshold)
