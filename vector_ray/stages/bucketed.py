"""Bucketed group processing — replace per-GROUP Python callbacks with
per-BUCKET callbacks.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per distinct
key; at 10^12 mostly-unique keys that is billions of Python calls. The
scale-safe shape here hashes keys into ``num_buckets`` buckets (sized to
the cluster, NOT the key cardinality), shuffles by the small int bucket
id, and runs ONE vectorized callback per bucket that handles every key
inside it via sort + run-segmentation (the ``topk._local_topk`` trick
with k=1). Python invocations: O(num_buckets) ≈ O(cluster cores).

Per-bucket memory is ~1/num_buckets of the shuffled data — the same
bound as any shuffle partition. A single hot KEY adds at most one row
per upstream block when a local pre-dedup runs before bucketing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BKT = "__bkt"


def default_num_buckets() -> int:
    """Scale bucket count with the cluster: ~4 tasks per core, min 32."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(32, cpus * 4)


def _key_combo(t: pa.Table, key_cols: Sequence[str]) -> pa.Array:
    """Null-safe combined string key (one column passes through cast)."""
    parts = [pc.fill_null(pc.cast(t[k], pa.string()), "\x00\x01") for k in key_cols]
    combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    return combo.combine_chunks() if isinstance(combo, pa.ChunkedArray) else combo


def _all_numeric(t: pa.Table, key_cols: Sequence[str]) -> bool:
    return all(
        (pa.types.is_integer(t[k].type) or pa.types.is_floating(t[k].type))
        for k in key_cols
    )


def add_bucket(t: pa.Table, key_cols: Sequence[str], num_buckets: int) -> pa.Table:
    """Append ``__bkt = hash(key) % num_buckets`` (vectorized)."""
    if len(t) == 0:
        return t.append_column(_BKT, pa.array([], pa.int32()))
    if _all_numeric(t, key_cols):
        # numeric keys: chained splitmix64, no string materialization
        from vector_ray.sources.synth import _splitmix64

        h = np.zeros(len(t), np.uint64)
        with np.errstate(over="ignore"):
            for k in key_cols:
                raw = pc.fill_null(pc.cast(t[k], pa.uint64(), safe=False), 0)
                h = _splitmix64(
                    h ^ np.asarray(raw.combine_chunks().to_numpy(zero_copy_only=False), np.uint64)
                )
    else:
        from vector_ray.expr import F

        h = np.asarray(
            F.fingerprint(_key_combo(t, key_cols)).to_numpy(zero_copy_only=False), np.uint64
        )
    return t.append_column(_BKT, pa.array((h % np.uint64(num_buckets)).astype(np.int32)))


def keep_first_per_key(
    t: pa.Table, key_cols: Sequence[str], order_by: Optional[str] = None
) -> pa.Table:
    """Vectorized first-row-per-key over a whole table: sort by
    (keys, order_by) then keep run starts. No per-key Python work.
    ``order_by`` is a column name (ascending) or a list of
    (col, "ascending"|"descending") pairs for argmax-style picks."""
    if len(t) == 0:
        return t
    sort_keys = [(k, "ascending") for k in key_cols]
    if isinstance(order_by, str):
        if order_by in t.column_names:
            sort_keys.append((order_by, "ascending"))
    elif order_by:
        sort_keys.extend((c, d) for c, d in order_by
                         if c in t.column_names)
    t = t.sort_by(sort_keys)
    single = key_cols[0] if len(key_cols) == 1 else None
    if (
        single is not None
        and pa.types.is_integer(t[single].type)
        and t[single].null_count == 0
    ):
        # int-key fast path: run boundaries straight off the sorted values
        codes = np.asarray(
            pc.cast(t[single], pa.uint64(), safe=False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    else:
        codes = np.asarray(pc.dictionary_encode(_key_combo(t, key_cols)).indices)
    new_run = np.ones(len(t), dtype=bool)
    new_run[1:] = codes[1:] != codes[:-1]
    if new_run.all():
        return t
    return t.filter(pa.array(new_run))


def bucketed_first(
    ds,
    key_cols: Sequence[str],
    *,
    order_by: Optional[str] = None,
    num_buckets: Optional[int] = None,
    drop: Sequence[str] = (),
):
    """Global first-row-per-key: hash-bucket shuffle + one vectorized
    keep-first pass per bucket. Deterministic iff ``order_by`` is given
    (otherwise "first" depends on shuffle arrival, as any parallel
    engine)."""
    key_cols = list(key_cols)
    nb = num_buckets or default_num_buckets()
    drop = list(drop)

    keyed = ds.map_batches(
        lambda t: add_bucket(t, key_cols, nb), batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_first(g: pa.Table) -> pa.Table:
        g = keep_first_per_key(g, key_cols, order_by)
        to_drop = [_BKT] + [c for c in drop if c in g.column_names]
        return g.drop_columns([c for c in to_drop if c in g.column_names])

    return keyed.groupby(_BKT).map_groups(bucket_first, batch_format="pyarrow")


def _run_starts(t: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Boolean new-run mask over a table already SORTED by key_cols."""
    n = len(t)
    new_run = np.zeros(n, bool)
    new_run[0] = True
    # integer-only fast path: float→uint64 truncation could merge runs
    if all(pa.types.is_integer(t[k].type) for k in key_cols) and all(
        t[k].null_count == 0 for k in key_cols
    ):
        for k in key_cols:
            v = np.asarray(
                pc.cast(t[k], pa.uint64(), safe=False)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            new_run[1:] |= v[1:] != v[:-1]
    else:
        codes = np.asarray(pc.dictionary_encode(_key_combo(t, key_cols)).indices)
        new_run[1:] = codes[1:] != codes[:-1]
    return new_run


def bucketed_segment_groups(
    ds,
    key_cols: Sequence[str],
    seg_fn,
    empty: pa.Table,
    *,
    min_rows: int = 2,
    num_buckets: Optional[int] = None,
):
    """Per-key grouping where MOST keys are singletons (LSH buckets over
    mostly-unique data): hash-bucket shuffle, sort each bucket by the
    keys, slice contiguous per-key segments zero-copy, and call
    ``seg_fn`` ONLY on segments with ≥ ``min_rows`` rows. Python calls:
    O(num_buckets) + O(qualifying segments) — never one per singleton
    key. ``empty`` supplies the schema-stable result when a bucket has
    no qualifying segment."""
    key_cols = list(key_cols)
    nb = num_buckets or default_num_buckets()

    keyed = ds.map_batches(
        lambda t: add_bucket(t, key_cols, nb), batch_format="pyarrow", zero_copy_batch=True
    )

    def run(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_BKT]).combine_chunks()
        if len(g) < min_rows:
            return empty
        g = g.sort_by([(k, "ascending") for k in key_cols])
        new_run = _run_starts(g, key_cols)
        starts = np.nonzero(new_run)[0]
        ends = np.concatenate([starts[1:], [len(g)]])
        outs = [
            seg_fn(g.slice(int(s), int(e - s)))
            for s, e in zip(starts, ends)
            if e - s >= min_rows
        ]
        outs = [o for o in outs if len(o)]
        return pa.concat_tables(outs) if outs else empty

    return keyed.groupby(_BKT).map_groups(run, batch_format="pyarrow")


def bucketed_map_groups(
    ds,
    key_cols: Sequence[str],
    bucket_fn,
    *,
    num_buckets: Optional[int] = None,
):
    """Generic bucketed grouping: ``bucket_fn`` receives a whole bucket
    (many keys, ``__bkt`` already dropped) and must itself handle
    per-key semantics vectorized (e.g. run-segmentation)."""
    key_cols = list(key_cols)
    nb = num_buckets or default_num_buckets()

    keyed = ds.map_batches(
        lambda t: add_bucket(t, key_cols, nb), batch_format="pyarrow", zero_copy_batch=True
    )

    def run(g: pa.Table) -> pa.Table:
        return bucket_fn(g.drop_columns([_BKT]))

    return keyed.groupby(_BKT).map_groups(run, batch_format="pyarrow")
