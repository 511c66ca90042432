"""Skew handling: salted two-phase execution for wide operations.

The BASELINE.json north rule calls out "skewed `source` keys via salted
repartitioning". Two mechanisms exist in this engine:

1. ``grouped_aggregate`` (stages/aggregate.py) is inherently
   skew-proof: per-batch Arrow partial aggregation means a hot key
   contributes at most one row per block to the shuffle, regardless of
   its row share — the salt is implicit (the block id).

2. ``salted_group_reduce`` (here) covers the cases where per-group
   logic is NOT algebraically mergeable as-is (``Reduce`` merge
   strategies, ``map_groups`` UDFs): rows are grouped by
   (key, salt = fingerprint(order_col) % S) in a first shuffle —
   splitting a hot key across S sub-groups — then the S sub-results
   merge in a second, tiny shuffle on the true key. The caller provides
   the per-group ``reduce_fn`` AND the ``merge_fn`` that combines
   sub-results (for the built-in Reduce strategies the merge is the
   same strategy applied again: sum/min/max/array-concat are
   associative; `discard/retain` use the salt-ordered first/last).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F


def add_salt(ds, key_cols: Sequence[str], *, salt_col: str = "__salt", buckets: int = 16,
             salt_source: Optional[str] = None):
    """Append a deterministic salt column: fingerprint(salt_source or
    row-position-free hash of all key-adjacent data) % buckets."""

    def salt_batch(t: pa.Table) -> pa.Table:
        if salt_source and salt_source in t.column_names:
            f = F.fingerprint(pc.cast(t[salt_source], pa.string()))
            salted = np.asarray(f.to_numpy(zero_copy_only=False), dtype=np.uint64) % np.uint64(buckets)
        else:
            # no per-row salt source: round-robin within the batch. The
            # assignment is batching-dependent, which is fine — salt only
            # controls sub-grouping and the merge is associative; a
            # key-derived salt here would be CONSTANT per key and split
            # nothing.
            salted = np.arange(len(t), dtype=np.uint64) % np.uint64(buckets)
        return t.append_column(salt_col, pa.array(salted.astype(np.int32)))

    return ds.map_batches(salt_batch, batch_format="pyarrow", zero_copy_batch=True)


def salted_group_reduce(
    ds,
    keys: Sequence[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    *,
    buckets: int = 16,
    salt_source: Optional[str] = None,
):
    """Two-phase groupby().map_groups with a salted first phase.

    ``reduce_fn`` runs per (key, salt) sub-group; ``merge_fn`` (default:
    ``reduce_fn`` again — correct when the reduction is associative)
    runs per key over the sub-results. A key with 30% of all rows
    becomes `buckets` sub-groups of ~2% each — no single reducer
    receives the whole hot key.

    SCALE BOUND: this is the generic CUSTOM-UDF fallback — the inner
    loop iterates ``df.groupby`` per (key, salt) group in Python, so a
    bucket holding 10^5 distinct keys pays 10^5 ``fn(sub)`` calls. The
    built-in ``Reduce`` merge strategies no longer route through here:
    they run the fully vectorized two-phase plan
    (``Reduce._vector_partial_bucket`` / ``_vector_merge_bucket``,
    O(buckets) Python calls). Use this only for reductions that cannot
    be expressed with those strategies.
    """
    keys = list(keys)
    merge_fn = merge_fn or reduce_fn
    salted = add_salt(ds, keys, buckets=buckets, salt_source=salt_source)

    # hash-bucketed phases: Ray invokes ONE Python callback per bucket
    # (stages/bucketed.py); the per-(key,salt) reduce loop runs inside
    # it as a plain pandas groupby iteration — no per-group block
    # slicing/scheduling in the Ray layer.
    from vector_ray.stages.bucketed import bucketed_map_groups

    def _per_group(t: pa.Table, group_cols, fn, drop_cols) -> pa.Table:
        df = t.to_pandas()
        outs = []
        for _k, sub in df.groupby(group_cols, sort=False, dropna=False):
            outs.append(fn(sub.drop(columns=list(drop_cols))))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True), preserve_index=False)

    phase1 = bucketed_map_groups(
        salted, keys + ["__salt"],
        lambda t: _per_group(t, keys + ["__salt"], reduce_fn, ["__salt"]),
    )
    return bucketed_map_groups(
        phase1, keys, lambda t: _per_group(t, keys, merge_fn, [])
    )
