"""Interval algebra over keyed spans — merge overlapping/touching
intervals per key (gaps-and-islands), the span-union step behind
time-range dedup, session stitching, annotation-span cleanup and
coverage accounting.

Plan: ONE hash-bucket shuffle of the narrow (key, start, end) triples
(stages/bucketed.bucketed_map_groups — O(buckets) Python calls); each
bucket sorts by (key, start, end) once and segments islands with flat
numpy passes — the within-key running max of interval ends is a
segmented inclusive scan (Hillis-Steele doubling, O(n log n) fully
vectorized, no per-key Python loop), so key skew is fine: a hot key's
rows are one contiguous vectorized run. Payload columns never move —
join them back on the emitted span if needed.

Capability absent in the reference (no windowed/interval operators in
its topology; SURVEY.md §2.7). Pairs with stages/join.range_join
(point-in-interval lookup) and stages/window.session_windows (gap-based
event grouping): this is the set-union view of the spans themselves.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _segmented_cummax(x: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """Inclusive running max of ``x`` that resets where ``seg_start``
    is True. Hillis-Steele doubling scan: each pass is a synchronous
    whole-array np.maximum over a shifted copy, masked so a row never
    reads across its own segment start — O(n log L) for max segment
    length L, no per-segment Python loop."""
    n = len(x)
    res = x.copy()
    if n == 0:
        return res
    seg_id = np.cumsum(seg_start) - 1
    starts = np.flatnonzero(seg_start)
    pos = np.arange(n) - starts[seg_id]  # offset within own segment
    maxpos = int(pos.max())
    shift = 1
    while shift <= maxpos:
        idx = np.flatnonzero(pos >= shift)
        # RHS evaluates on the pre-pass snapshot (fancy indexing
        # copies), so the pass is synchronous
        res[idx] = np.maximum(res[idx], res[idx - shift])
        shift <<= 1
    return res


def merge_intervals(
    ds,
    keys: Union[str, Sequence[str]],
    start_col: str,
    end_col: str,
    *,
    out_start: Optional[str] = None,
    out_end: Optional[str] = None,
    min_gap: int = 0,
    count_col: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Union the [start, end] intervals per key: a span starts a new
    island iff its start exceeds the running max end of its key's
    previous spans by more than ``min_gap`` (so touching spans merge
    at the default 0, and ``min_gap > 0`` bridges small gaps — the
    session-stitching semantics). Returns one row per island:
    (keys..., out_start, out_end[, count_col]) where the island's end
    is the max member end and ``count_col`` (optional) counts merged
    source spans.

    Rows with a null key, start or end are dropped (a span must be
    fully specified); ``end < start`` raises inside the task; identical
    spans merge like any overlap."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    o_s = out_start or start_col
    o_e = out_end or end_col

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    def narrow(t: pa.Table) -> pa.Table:
        t = t.select(keys + [start_col, end_col])
        mask = pc.and_(pc.is_valid(t[start_col]), pc.is_valid(t[end_col]))
        for k in keys:
            mask = pc.and_(mask, pc.is_valid(t[k]))
        return t.filter(mask)

    def bucket(g: pa.Table) -> pa.Table:
        sch = g.schema
        if len(g) == 0:
            cols = {k: pa.array([], sch.field(k).type) for k in keys}
            cols[o_s] = pa.array([], sch.field(start_col).type)
            cols[o_e] = pa.array([], sch.field(end_col).type)
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        g = g.combine_chunks().sort_by(
            [(k, "ascending") for k in keys]
            + [(start_col, "ascending"), (end_col, "ascending")])
        s = np.asarray(g[start_col].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        e = np.asarray(g[end_col].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        if (e < s).any():
            bad = int(np.flatnonzero(e < s)[0])
            raise ValueError(
                f"merge_intervals: end < start at sorted row {bad} "
                f"({e[bad]!r} < {s[bad]!r})")
        new_key = _run_starts(g, keys)
        cme = _segmented_cummax(e, new_key)
        brk = new_key.copy()
        if len(s) > 1:
            same_key = ~new_key[1:]
            brk[1:] |= same_key & (s[1:] > cme[:-1] + min_gap)
        starts_idx = np.flatnonzero(brk)
        seg_end = np.maximum.reduceat(e, starts_idx)
        cnt = np.diff(np.append(starts_idx, len(s)))
        take = pa.array(starts_idx, pa.int64())
        cols = {k: g[k].combine_chunks().take(take) for k in keys}
        cols[o_s] = g[start_col].combine_chunks().take(take)
        cols[o_e] = pa.array(seg_end, type=sch.field(end_col).type)
        if count_col:
            cols[count_col] = pa.array(cnt.astype(np.int64), pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)
    return bucketed_map_groups(slim, keys, bucket,
                               num_buckets=num_buckets)
