"""Joins.

The reference's only join is the broadcast enrichment lookup
(lib/enrichment) — covered by ``stages.enrich``. A general engine also
needs large×large joins; two implementations:

- ``join()``: Ray Data's native hash-partitioned ``Dataset.join`` when
  available (Ray ≥ 2.46), with ``num_partitions`` controlling the
  shuffle fan-out.
- ``bucketed_join()``: the portable explicit pattern (per the Ray
  guide): both sides get a ``bucket = fingerprint(key) % B`` column,
  co-grouped per bucket, and joined pairwise with an Arrow hash join
  inside ``map_groups``. Salt-friendly: B spreads hot keys across
  aggregators only insofar as distinct keys differ — a single
  pathological key still lands in one bucket (callers with one giant
  key should pre-aggregate or use broadcast instead).
- ``broadcast_join()``: map-only fact×dim join — the small right side
  ships once via ``ray.put`` and the big side never shuffles.
- ``asof_join()``: sort-within-bucket + ``pandas.merge_asof`` per
  bucket — the as-of/range join for event streams.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F

_BUCKET = "__join_bucket"
_SIDE = "__join_side"


def join(
    left,
    right,
    on: Sequence[str],
    *,
    join_type: str = "inner",
    num_partitions: int = 16,
    right_on: Optional[Sequence[str]] = None,
):
    """Native hash join when the installed Ray has Dataset.join.
    Semi/anti/right/full always route through the bucketed plan (Ray's
    native join doesn't expose them or names them differently)."""
    if join_type in ("semi", "left semi", "anti", "left anti",
                     "right", "right outer", "full", "full outer",
                     "outer"):
        return bucketed_join(left, right, on, join_type=join_type,
                             buckets=num_partitions, right_on=right_on)
    if hasattr(left, "join"):
        return left.join(
            right,
            join_type=join_type,
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
        )
    return bucketed_join(left, right, on, join_type=join_type, buckets=num_partitions,
                         right_on=right_on)


def _with_bucket(ds, keys, buckets: int, side: int, pad_schema: "pa.Schema"):
    """Tag with (bucket, side) and pad to the union schema so the two
    sides can union (Ray union requires identical schemas)."""

    def add(t: pa.Table) -> pa.Table:
        parts = [pc.cast(t[k], pa.string()) for k in keys]
        combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
        fp = F.fingerprint(pc.fill_null(combo, "\x00"))
        b = np.asarray(fp.to_numpy(zero_copy_only=False), dtype=np.uint64) % np.uint64(buckets)
        cols = {}
        for f in pad_schema:
            if f.name == _BUCKET:
                cols[f.name] = pa.array(b.astype(np.int32))
            elif f.name == _SIDE:
                cols[f.name] = pa.array([side] * len(t), pa.int8())
            elif f.name in t.column_names:
                cols[f.name] = pc.cast(t[f.name], f.type)
            else:
                cols[f.name] = pa.nulls(len(t), f.type)
        return pa.table(cols)

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _union_schema(left, right) -> "pa.Schema":
    ls, rs = left.schema(), right.schema()
    fields = []
    seen = set()
    for name, typ in zip(ls.names, ls.types):
        fields.append(pa.field(name, typ))
        seen.add(name)
    for name, typ in zip(rs.names, rs.types):
        if name not in seen:
            fields.append(pa.field(name, typ))
            seen.add(name)
    fields.append(pa.field(_BUCKET, pa.int32()))
    fields.append(pa.field(_SIDE, pa.int8()))
    return pa.schema(fields)


def bucketed_join(
    left,
    right,
    on: Sequence[str],
    *,
    join_type: str = "inner",
    buckets: int = 16,
    right_on: Optional[Sequence[str]] = None,
):
    """Explicit partitioned hash join: union both (tagged) sides, group
    by bucket, Arrow-join the two sides inside each group."""
    on = list(on)
    r_on = list(right_on) if right_on else on
    l_names = left.schema().names
    r_names = right.schema().names
    schema = _union_schema(left, right)
    l = _with_bucket(left, on, buckets, 0, schema)
    r = _with_bucket(right, r_on, buckets, 1, schema)
    both = l.union(r)
    jt = {"inner": "inner", "left": "left outer", "left outer": "left outer",
          "semi": "left semi", "left semi": "left semi",
          "anti": "left anti", "left anti": "left anti",
          "right": "right outer", "right outer": "right outer",
          "full": "full outer", "full outer": "full outer",
          "outer": "full outer"}[join_type]
    l_cols = list(l_names)
    r_cols = [c for c in r_names if c in r_on or c not in l_names]
    out_cols = l_cols + [c for c in r_cols if c not in r_on]
    if jt in ("left semi", "left anti"):
        # Arrow emits only left columns; the right side still needs the
        # key columns for the probe
        out_cols = l_cols
    elif jt == "right outer":
        # Arrow drops the left keys and emits the RIGHT key names
        out_cols = [c for c in l_cols if c not in on] + r_cols
    # full outer: Arrow coalesces into the LEFT key names — the default
    # out_cols already matches

    def join_bucket(g: pa.Table) -> pa.Table:
        sides = g[_SIDE]
        lt = g.filter(pc.equal(sides, 0)).select(l_cols)
        rt = g.filter(pc.equal(sides, 1)).select(r_cols)
        # Arrow join handles empty sides and keeps the full joined schema
        # — no early return, or empty buckets would emit schema-divergent
        # blocks
        out = lt.join(rt, keys=on, right_keys=r_on, join_type=jt)
        return out.select([c for c in out_cols if c in out.column_names])

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")


def broadcast_join(
    left,
    right,
    on: Sequence[str],
    *,
    join_type: str = "inner",
    right_on: Optional[Sequence[str]] = None,
    max_broadcast_rows: int = 5_000_000,
):
    """Map-only join against a SMALL right side — the fact×dim scale
    plan: the right table ships to the object store ONCE (``ray.put``,
    zero-copy reads in every task) and the big left side never
    shuffles. Use for dimension/lookup tables that fit comfortably in
    a worker's heap; ``bucketed_join``/``join`` remain the
    large×large path.

    ``right`` may be a pyarrow Table or a (small) Dataset — a Dataset
    is materialized driver-side and refused above
    ``max_broadcast_rows``. join_type ∈ {inner, left, semi, anti}
    (the types where unmatched RIGHT rows never surface, so per-batch
    evaluation is exact); output columns follow bucketed_join: left
    columns then right non-key columns."""
    import ray

    on = list(on)
    r_on = list(right_on) if right_on else on
    if not isinstance(right, pa.Table):
        rt = pa.concat_tables(
            [b for b in ray.get(right.to_arrow_refs()) if len(b)],
            promote_options="permissive")
        right = rt.combine_chunks()
    if len(right) > max_broadcast_rows:
        raise ValueError(
            f"broadcast side has {len(right)} rows > max_broadcast_rows="
            f"{max_broadcast_rows}; use bucketed_join for large×large")
    jt = {"inner": "inner", "left": "left outer",
          "left outer": "left outer", "semi": "left semi",
          "left semi": "left semi", "anti": "left anti",
          "left anti": "left anti"}[join_type]
    r_cols = list(right.column_names)
    ref = ray.put(right)

    def probe(t: pa.Table) -> pa.Table:
        r = ray.get(ref)
        out = t.join(r, keys=on, right_keys=r_on, join_type=jt)
        keep = list(t.column_names)
        if jt not in ("left semi", "left anti"):
            keep += [c for c in r_cols
                     if c not in r_on and c not in t.column_names]
        return out.select([c for c in keep if c in out.column_names])

    return left.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)


def broadcast_cross_join(
    left,
    right,
    *,
    predicate=None,
    max_broadcast_rows: int = 100_000,
    max_product_rows: int = 1 << 20,
):
    """Theta join: cartesian product against a SMALL right side with an
    optional vectorized ``predicate(joined: pa.Table) -> BooleanArray``
    evaluated batch-wise (the non-equi join shape — banding rules,
    inequality lookups, grid expansion). The right side ships once via
    ``ray.put``; each left batch is chunked so a materialized product
    never exceeds ``max_product_rows`` rows. Column-name clashes raise
    (rename beforehand)."""
    import ray

    if not isinstance(right, pa.Table):
        rt = pa.concat_tables(
            [b for b in ray.get(right.to_arrow_refs()) if len(b)],
            promote_options="permissive")
        right = rt.combine_chunks()
    if len(right) > max_broadcast_rows:
        raise ValueError(
            f"cross-join side has {len(right)} rows > "
            f"max_broadcast_rows={max_broadcast_rows}")
    clash = set(left.schema().names) & set(right.column_names)
    if clash:
        raise ValueError(f"broadcast_cross_join: column clash {sorted(clash)}")
    ref = ray.put(right)

    def product(t: pa.Table) -> pa.Table:
        r = ray.get(ref)
        nr = max(len(r), 1)
        step = max(1, max_product_rows // nr)
        outs = []
        for s in range(0, len(t), step):
            lt = t.slice(s, step)
            nl = len(lt)
            li = pa.array(np.repeat(np.arange(nl, dtype=np.int64), len(r)))
            ri = pa.array(np.tile(np.arange(len(r), dtype=np.int64), nl))
            joined = pa.table({
                **{c: lt[c].take(li) for c in lt.column_names},
                **{c: r[c].take(ri) for c in r.column_names},
            })
            if predicate is not None:
                mask = predicate(joined)
                joined = joined.filter(mask)
            outs.append(joined)
        if not outs:
            return pa.table({
                **{c: pa.array([], left.schema().field(c).type)
                   for c in left.schema().names},
                **{c: pa.array([], right.schema.field(c).type)
                   for c in right.column_names},
            })
        return pa.concat_tables(outs)

    return left.map_batches(product, batch_format="pyarrow",
                            zero_copy_batch=True)


def asof_join(
    left,
    right,
    *,
    by: Sequence[str],
    on: str,
    direction: str = "backward",
    tolerance=None,
    buckets: int = 16,
):
    """As-of join: for each left row, the latest right row with
    right.on <= left.on (direction=backward) within the same `by` key.
    Sort + pandas.merge_asof per bucket (keys are hash-co-located)."""
    by = list(by)
    l_names = left.schema().names
    r_names = right.schema().names
    schema = _union_schema(left, right)
    l = _with_bucket(left, by, buckets, 0, schema)
    r = _with_bucket(right, by, buckets, 1, schema)
    both = l.union(r)
    l_cols = list(l_names)
    r_cols = list(r_names)
    # the union pads each side with the OTHER side's columns as nulls,
    # which upcasts int columns to float in the pandas block; after the
    # side split those columns are null-free again, so restore the
    # original dtypes (otherwise int keys/ids silently come out float)
    l_dtypes = {n: t.to_pandas_dtype() for n, t in zip(left.schema().names, left.schema().types)}
    r_dtypes = {n: t.to_pandas_dtype() for n, t in zip(right.schema().names, right.schema().types)}

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof handles empty right by emitting typed-null right
        # columns — every bucket keeps the identical output schema
        lt = g[g[_SIDE] == 0][l_cols].sort_values(on, kind="mergesort")
        rt = g[g[_SIDE] == 1][r_cols].sort_values(on, kind="mergesort")
        lt = lt.astype({c: d for c, d in l_dtypes.items() if c in lt and not lt[c].isna().any()})
        rt = rt.astype({c: d for c, d in r_dtypes.items() if c in rt and not rt[c].isna().any()})
        return pd.merge_asof(lt, rt, on=on, by=by, direction=direction, tolerance=tolerance)

    return both.groupby(_BUCKET).map_groups(merge_bucket, batch_format="pandas")


def range_join(
    left,
    right,
    *,
    by: Sequence[str],
    point: str,
    lo: str,
    hi: str,
    how: str = "inner",
    buckets: int = 16,
):
    """Interval-containment join (``left.point BETWEEN right.lo AND
    right.hi`` within the same ``by`` key) for per-key NON-OVERLAPPING
    intervals — the dimension-validity-window shape. Built on the asof
    machinery: merge_asof backward on ``lo`` picks the unique candidate
    (greatest lo <= point per key), then one vectorized ``hi >= point``
    filter. With overlapping intervals only the greatest-lo candidate
    is considered (documented limitation; use a key+filter join for
    the general O(pairs) case). ``how='left'`` keeps unmatched points
    with null interval columns; ``'inner'`` drops them."""
    import pyarrow.compute as pc_

    if how not in ("inner", "left"):
        raise ValueError(f"range_join: unknown how={how!r}")
    by = list(by)
    l_names = set(left.schema().names)
    r_payload = [c for c in right.schema().names if c not in by]
    clash = (l_names & set(r_payload)) - {point}
    if clash:
        raise ValueError(f"range_join: column clash {sorted(clash)}")

    def ren(t: pa.Table) -> pa.Table:
        names = [point if c == lo else c for c in t.column_names]
        return t.rename_columns(names)

    r2 = right.map_batches(ren, batch_format="pyarrow",
                           zero_copy_batch=True)
    if r2.schema() is None:  # empty right side: no blocks survive ren
        r_schema = right.schema()
        extra = [(c, t) for c, t in zip(r_schema.names, r_schema.types)
                 if c != lo and c not in by]

        def pad(t: pa.Table) -> pa.Table:
            for c, typ in extra:
                t = t.append_column(c, pa.nulls(len(t), typ))
            return t

        padded = left.map_batches(pad, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return padded if how == "left" else padded.limit(0)
    j = asof_join(left, r2, by=by, on=point, buckets=buckets)

    def finish(t: pa.Table) -> pa.Table:
        inside = pc_.and_kleene(pc_.is_valid(t[hi]),
                                pc_.greater_equal(t[hi], t[point]))
        if how == "inner":
            return t.filter(pc_.fill_null(inside, False))
        # left: null out interval columns for non-matches
        miss = pc_.invert(pc_.fill_null(inside, False))
        for c in [x for x in r_payload if x != lo]:
            i = t.column_names.index(c)
            col = t[c]
            t = t.set_column(
                i, c, pc_.if_else(miss, pa.nulls(len(t), col.type), col))
        return t

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)
