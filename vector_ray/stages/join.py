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
- ``skew_join()``: hybrid plan for skewed keys — detected heavy
  hitters join map-only against a broadcast right slice, the cold
  tail goes through the bucketed shuffle.
- ``bucketed_join(bloom_prefilter=True)``: a Bloom filter built over
  the right side's keys drops never-matching left rows BEFORE the
  shuffle — the semi-join pushdown for selective joins.
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
    num_partitions: Optional[int] = None,
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
        if num_partitions is None:
            from vector_ray.stages.bucketed import default_num_buckets

            num_partitions = default_num_buckets()
        return left.join(
            right,
            join_type=join_type,
            num_partitions=num_partitions,
            on=tuple(on),
            right_on=tuple(right_on) if right_on else None,
        )
    return bucketed_join(left, right, on, join_type=join_type, buckets=num_partitions,
                         right_on=right_on)


def _combo_hash(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """One u64 fingerprint per row over the (stringified) key tuple —
    the shared hash for bucket assignment, Bloom prefilters and hot-key
    routing (all three MUST agree so routing stays consistent)."""
    parts = [pc.cast(t[k], pa.string()) for k in keys]
    combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    fp = F.fingerprint(pc.fill_null(combo, "\x00"))
    return np.asarray(fp.to_numpy(zero_copy_only=False), dtype=np.uint64)


def _with_bucket(ds, keys, buckets: int, side: int, pad_schema: "pa.Schema"):
    """Tag with (bucket, side) and pad to the union schema so the two
    sides can union (Ray union requires identical schemas)."""

    def add(t: pa.Table) -> pa.Table:
        b = _combo_hash(t, keys) % np.uint64(buckets)
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


def _key_bloom(ds, keys: Sequence[str], *, m_bits: int, k: int):
    """Distributed Bloom filter over a dataset's key-tuple fingerprints
    (reuses ml.bloom's sparse-word build; the hash fed in is
    ``_combo_hash`` so probe sites can reuse the same function)."""
    from vector_ray.ml.bloom import bloom_build

    keys = list(keys)

    def addh(t: pa.Table) -> pa.Table:
        # u64 travels as its int64 bit pattern (Arrow ints are signed);
        # ml.bloom's _key_hashes casts back modulo 2^64 = same bits
        return pa.table({"__key_hash": pa.array(_combo_hash(t, keys).view(np.int64))})

    return bloom_build(
        ds.map_batches(addh, batch_format="pyarrow", zero_copy_batch=True),
        "__key_hash", m_bits=m_bits, k=k)


def bucketed_join(
    left,
    right,
    on: Sequence[str],
    *,
    join_type: str = "inner",
    buckets: Optional[int] = None,
    right_on: Optional[Sequence[str]] = None,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 24,
    bloom_k: int = 4,
):
    """Explicit partitioned hash join: union both (tagged) sides, group
    by bucket, Arrow-join the two sides inside each group.

    ``buckets`` defaults to stages/bucketed.default_num_buckets()
    (~4 tasks per cluster core, min 32): per-bucket memory is
    total/buckets and a FIXED small count would both cap parallelism
    on a big node and make each bucket task hold data/16 at cluster
    scale. Measured sandbox cost of the adaptive default vs the old
    16: +0.2-0.6 s fixed per-group overhead at sf0.1 (BASELINE.md
    round-4 session 2) — amortized to noise at any real data size.

    ``bloom_prefilter=True`` is the semi-join pushdown for SELECTIVE
    joins: a Bloom filter is built over the right side's keys (sparse
    distributed build, ~``bloom_bits/8`` bytes broadcast once) and left
    rows whose key is definitely absent are dropped BEFORE the shuffle
    — at 100 TB the all-to-all exchange then carries only
    probable-match rows. False positives just ride the shuffle and are
    dropped by the real join, so results are exact; false negatives are
    impossible. Only valid for join types where unmatched LEFT rows
    never surface (inner / semi / right outer) — note it costs one
    extra pass over the right side's key columns (prune columns at the
    read when the right side is big)."""
    on = list(on)
    r_on = list(right_on) if right_on else on
    if buckets is None:
        # scale with the cluster (stages/bucketed convention): a fixed
        # small count caps join parallelism on a big node and makes the
        # all-to-all a 16-task bottleneck at cluster scale
        from vector_ray.stages.bucketed import default_num_buckets

        buckets = default_num_buckets()
    if bloom_prefilter:
        import ray

        from vector_ray.ml.bloom import Bloom

        if join_type not in ("inner", "semi", "left semi", "right", "right outer"):
            raise ValueError(
                f"bloom_prefilter drops unmatched left rows — invalid for "
                f"join_type={join_type!r} (inner/semi/right only)")
        bl = _key_bloom(right, r_on, m_bits=bloom_bits, k=bloom_k)
        bref = ray.put((bl.m_bits, bl.k, bl.words))

        def pre(t: pa.Table) -> pa.Table:
            m, kk, words = ray.get(bref)
            b = Bloom(m, kk, words)
            return t.filter(pa.array(b.contains_hashes(_combo_hash(t, on))))

        left = left.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
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
        if jt in ("left semi", "left anti"):
            # probe with (keys, row index) only and take the survivors:
            # payloads never enter the Acero join, so nested types
            # (list<...> token arrays) ride through untouched
            probe = lt.select(list(on)).append_column(
                "__ji", pa.array(np.arange(len(lt)), pa.int64()))
            hit = probe.join(rt.select(list(r_on)), keys=on,
                             right_keys=r_on, join_type=jt)
            return lt.take(hit["__ji"].combine_chunks())
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
    buckets: Optional[int] = None,
):
    """As-of join: for each left row, the latest right row with
    right.on <= left.on (direction=backward) within the same `by` key.
    Sort + pandas.merge_asof per bucket (keys are hash-co-located)."""
    if buckets is None:
        from vector_ray.stages.bucketed import default_num_buckets

        buckets = default_num_buckets()
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
    buckets: Optional[int] = None,
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


def skew_join(
    left,
    right,
    on: Sequence[str],
    *,
    join_type: str = "inner",
    right_on: Optional[Sequence[str]] = None,
    buckets: Optional[int] = None,
    hot_frac: float = 0.01,
    max_hot: int = 64,
    per_block_cap: int = 8,
    max_broadcast_rows: int = 5_000_000,
):
    """Skew-aware hybrid hash join. A hash-partitioned join sends ALL
    rows of one key to one bucket, so a key holding s% of a 100 TB left
    side turns into one s%-of-100-TB straggler task. Plan:

    1. detect heavy hitters with one cheap pass over the left key
       columns: per-block Arrow group-count keeps keys above
       ``hot_frac/2`` of their block (a key with global share >=
       ``hot_frac`` has that share in expectation in every block),
       capped at ``per_block_cap`` candidates per block — the driver
       sees O(blocks * per_block_cap) candidate rows, never the key
       space. Detection is PROBABILISTIC / best-effort: a globally-hot
       key can be evicted by the per-block cap in blocks with many
       local heavy hitters, and the driver-side sum only counts blocks
       where the key survived — a missed hot key simply takes the cold
       (ordinary bucketed) path, so RESULTS STAY EXACT; only the
       straggler protection degrades. Raise ``per_block_cap`` /
       lower ``hot_frac`` for adversarial skew profiles;
    2. rows are routed hot/cold by key FINGERPRINT membership (the
       same ``_combo_hash`` both sides, so a fingerprint collision
       routes both sides of that key identically — results stay
       exact);
    3. hot keys join map-only via ``broadcast_join`` (the right slice
       for <= ``max_hot`` keys ships once; no hot row ever shuffles),
       the cold tail goes through the ordinary ``bucketed_join``,
       and the two branches union.

    Valid for join types where unmatched RIGHT rows never surface
    (inner / left / semi / anti): every left row lands in exactly one
    branch. Keys that are NULL are never classified hot. With no key
    above ``hot_frac`` this degrades to a plain ``bucketed_join``
    (detection pass aside)."""
    import ray

    on = list(on)
    r_on = list(right_on) if right_on else on
    jt_ok = ("inner", "left", "left outer", "semi", "left semi",
             "anti", "left anti")
    if join_type not in jt_ok:
        raise ValueError(f"skew_join: join_type={join_type!r} not in {jt_ok}")

    ls = left.schema()
    key_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(ls.names, ls.types) if n in on])

    def candidates(t: pa.Table) -> pa.Table:
        g = t.select(on).group_by(on).aggregate([([], "count_all")])
        thresh = max(2, int(hot_frac * len(t) / 2))
        g = g.filter(pc.greater_equal(g["count_all"], thresh))
        if len(g) > per_block_cap:
            idx = pc.sort_indices(
                g, sort_keys=[("count_all", "descending")])[:per_block_cap]
            g = g.take(idx)
        marker = pa.table({
            **{k: pa.nulls(1, key_schema.field(k).type) for k in on},
            "count_all": pa.array([len(t)], pa.int64()),
        })
        cols = {k: pc.cast(g[k], key_schema.field(k).type) for k in on}
        cols["count_all"] = pc.cast(g["count_all"], pa.int64())
        return pa.concat_tables([pa.table(cols), marker])

    cand = pa.concat_tables(
        [b for b in ray.get(
            left.map_batches(candidates, batch_format="pyarrow",
                             zero_copy_batch=True).to_arrow_refs())
         if len(b)],
        promote_options="permissive")
    key_null = pc.is_null(cand[on[0]])
    for k in on[1:]:
        key_null = pc.and_(key_null, pc.is_null(cand[k]))
    total = pc.sum(cand.filter(key_null)["count_all"]).as_py() or 0
    real = cand.filter(pc.invert(key_null))
    summed = real.group_by(on).aggregate([("count_all", "sum")])
    hot = summed.filter(pc.greater_equal(
        summed["count_all_sum"], max(2.0, hot_frac * max(total, 1))))
    if len(hot) > max_hot:
        idx = pc.sort_indices(
            hot, sort_keys=[("count_all_sum", "descending")])[:max_hot]
        hot = hot.take(idx)
    if len(hot) == 0:
        return bucketed_join(left, right, on, join_type=join_type,
                             buckets=buckets, right_on=r_on)

    hot_hashes = np.unique(_combo_hash(hot.select(on), on))
    href = ray.put(hot_hashes)

    def splitter(keys):
        def split(t: pa.Table, keep_hot: bool) -> pa.Table:
            mask = np.isin(_combo_hash(t, keys), ray.get(href))
            return t.filter(pa.array(mask if keep_hot else ~mask))
        return split

    lsplit, rsplit = splitter(on), splitter(r_on)
    left_hot = left.map_batches(lambda t: lsplit(t, True),
                                batch_format="pyarrow", zero_copy_batch=True)
    left_cold = left.map_batches(lambda t: lsplit(t, False),
                                 batch_format="pyarrow", zero_copy_batch=True)
    right_hot = right.map_batches(lambda t: rsplit(t, True),
                                  batch_format="pyarrow", zero_copy_batch=True)
    right_cold = right.map_batches(lambda t: rsplit(t, False),
                                   batch_format="pyarrow", zero_copy_batch=True)

    jt_b = {"inner": "inner", "left": "left", "left outer": "left",
            "semi": "semi", "left semi": "semi",
            "anti": "anti", "left anti": "anti"}[join_type]
    hot_out = broadcast_join(left_hot, right_hot, on, join_type=jt_b,
                             right_on=r_on,
                             max_broadcast_rows=max_broadcast_rows)
    cold_out = bucketed_join(left_cold, right_cold, on,
                             join_type=join_type, buckets=buckets,
                             right_on=r_on)
    l_names = left.schema().names
    r_names = right.schema().names
    if jt_b in ("semi", "anti"):
        out_cols = list(l_names)
    else:
        out_cols = list(l_names) + [
            c for c in r_names if c not in r_on and c not in l_names]
    return hot_out.select_columns(out_cols).union(
        cold_out.select_columns(out_cols))
