"""Grouped top-k — the "top N per key" log-analytics staple, as a
two-phase mergeable plan: each batch keeps only its local top-k rows
per key (vectorized run-segmentation over a sorted batch), so the
shuffle moves at most k × blocks rows per key regardless of skew; the
final per-key merge sorts ≤ k × blocks rows and slices k.

Capability absent in the reference (its topology has no ranked
selection; SURVEY.md §2.7)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _local_topk(t: pa.Table, keys, order_col: str, k: int, descending: bool,
                tiebreak: Optional[str]) -> pa.Table:
    if len(t) == 0:
        return t
    sort_keys = [(kc, "ascending") for kc in keys]
    sort_keys.append((order_col, "descending" if descending else "ascending"))
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))
    t = t.sort_by(sort_keys)
    # run starts of each key group in the sorted order
    parts = [pc.fill_null(pc.cast(t[kc], pa.string()), "\x00\x01") for kc in keys]
    combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    combo = combo.combine_chunks() if isinstance(combo, pa.ChunkedArray) else combo
    codes = np.asarray(pc.dictionary_encode(combo).indices)
    new_run = np.ones(len(t), dtype=bool)
    new_run[1:] = codes[1:] != codes[:-1]
    run_id = np.cumsum(new_run) - 1
    run_starts = np.nonzero(new_run)[0]
    idx_in_run = np.arange(len(t)) - run_starts[run_id]
    return t.filter(pa.array(idx_in_run < k))


def grouped_topk(
    ds,
    keys: Sequence[str],
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Top-k rows per key ordered by ``order_col`` (ties broken by
    ``tiebreak`` ascending for determinism)."""
    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        return _local_topk(t, keys, order_col, k, descending, tiebreak)

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        return _local_topk(g, keys, order_col, k, descending, tiebreak)

    # bucketed final merge: one vectorized _local_topk per hash bucket
    # (it already segments per key), not one Python call per key
    from vector_ray.stages.bucketed import bucketed_map_groups

    return bucketed_map_groups(pre, keys, merge, num_buckets=num_buckets)
