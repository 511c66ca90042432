"""Schema-evolution union — ``UNION ALL BY NAME``. Ray's
``Dataset.union`` requires byte-identical schemas; real corpus shards
drift (a column added in a later crawl, an int32 that became int64).
``union_align`` unifies the field list (first-seen order), pads
missing columns with typed nulls, and widens numeric types (any float
→ float64; ints → the wider width; otherwise types must match).
The alignment is one stateless map-only projection per dataset — no
shuffle, no driver materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _unify(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a == b:
        return a
    num = lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)
    if num(a) and num(b):
        if pa.types.is_floating(a) or pa.types.is_floating(b):
            return pa.float64()
        width = max(a.bit_width, b.bit_width)
        signed = (pa.types.is_signed_integer(a)
                  or pa.types.is_signed_integer(b))
        return getattr(pa, f"{'int' if signed else 'uint'}{width}")()
    if (pa.types.is_large_string(a) and pa.types.is_string(b)) or (
            pa.types.is_string(a) and pa.types.is_large_string(b)):
        return pa.large_string()
    raise TypeError(f"cannot unify column types {a} and {b}")


def union_align(*datasets):
    """Union datasets with drifting schemas (see module docstring)."""
    if not datasets:
        raise ValueError("union_align needs at least one dataset")
    fields: dict = {}
    for ds in datasets:
        s = ds.schema()
        for name, typ in zip(s.names, s.types):
            fields[name] = _unify(fields[name], typ) if name in fields \
                else typ
    schema = pa.schema(list(fields.items()))

    def align(t: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in t.column_names:
                c = t[f.name]
                cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
            else:
                cols[f.name] = pa.nulls(len(t), f.type)
        return pa.table(cols)

    aligned = [ds.map_batches(align, batch_format="pyarrow",
                              zero_copy_batch=True) for ds in datasets]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out


def intersect(left, right, on=None, *, num_partitions: int = 16):
    """SQL INTERSECT (set semantics — output deduplicated): distinct
    rows of ``left`` whose key tuple also appears in ``right``. One
    semi-join bucket exchange + the vectorized keep-first dedup."""
    from vector_ray.stages.dedupe import Dedupe
    from vector_ray.stages.join import join

    keys = list(on) if on else list(left.schema().names)
    hit = join(left, right, keys, right_on=keys, join_type="semi",
               num_partitions=num_partitions)
    return Dedupe(keys).apply(hit)


def except_(left, right, on=None, *, num_partitions: int = 16):
    """SQL EXCEPT (set semantics): distinct rows of ``left`` whose key
    tuple does NOT appear in ``right``."""
    from vector_ray.stages.dedupe import Dedupe
    from vector_ray.stages.join import join

    keys = list(on) if on else list(left.schema().names)
    miss = join(left, right, keys, right_on=keys, join_type="anti",
                num_partitions=num_partitions)
    return Dedupe(keys).apply(miss)
