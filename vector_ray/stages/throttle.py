"""Rate limiting and TTL-cache dedupe over keyed event streams.

``throttle`` — keep at most ``threshold`` events per key per fixed
time window (the rate-limit transform newer reference versions ship;
this vintage's closest analogue is the dedupe cache,
src/transforms/dedupe.rs:15-60). Deterministic batch semantics: the
FIRST ``threshold`` events per (key, window) in (ts, tiebreak) order
survive — not arrival order, which a distributed replay cannot
reproduce. Plan: window id is a map-side derived column, then the
grouped_topk two-phase plan (per-block local cap → one bucketed
merge), so at most ``threshold × blocks`` rows per (key, window)
cross the exchange regardless of skew.

``ttl_dedupe`` — the reference dedupe transform's cache-with-TTL
semantics at batch scale: an event is kept iff no PREVIOUSLY KEPT
event with the same key lies within ``ttl`` before it (greedy chain:
first event per key kept, then the next event ≥ ttl later, …). This
is sequential per key by definition, so the plan shuffles once by key
hash and resolves every key inside a bucket with a FRONTIER loop that
is vectorized ACROSS keys: one searchsorted over the bucket maps every
row to its chain successor, then each iteration advances all keys'
frontiers simultaneously — Python rounds = max kept-chain length in
the bucket, not rows (cf. stages/intervals.py's Hillis-Steele scan;
here the recurrence has data-dependent gaps, so a scan cannot replace
the chain walk).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WIN = "__thr_win"


def _ts_int(t: pa.Table, ts_col: str) -> pa.ChunkedArray:
    return pc.cast(t[ts_col], pa.int64())


def throttle(
    ds,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    *,
    threshold: int,
    window: int,
    tiebreak: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Keep the first ``threshold`` rows per (keys…, fixed window) in
    (``ts_col`` asc, ``tiebreak`` asc) order; drop the rest. ``window``
    is in ``ts_col``'s integer unit (microseconds for timestamp[us]);
    window id is ``floor(ts / window)``. Rows with a null timestamp
    are dropped (unorderable); null keys throttle as their own group,
    matching SQL PARTITION BY."""
    if threshold < 1:
        raise ValueError(f"throttle: threshold must be >= 1, got {threshold}")
    if window < 1:
        raise ValueError(f"throttle: window must be >= 1, got {window}")
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_window(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[ts_col]))
        ts = np.asarray(
            _ts_int(t, ts_col).combine_chunks().to_numpy(zero_copy_only=False),
            np.int64,
        )
        win = np.floor_divide(ts, np.int64(window))
        return t.append_column(_WIN, pa.array(win, pa.int64()))

    from vector_ray.stages.topk import grouped_topk

    out = grouped_topk(
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True),
        keys + [_WIN],
        ts_col,
        threshold,
        descending=False,
        tiebreak=tiebreak,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda t: t.drop_columns([_WIN]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _chain_keep(ts: np.ndarray, new_key: np.ndarray, ttl: int) -> np.ndarray:
    """Greedy TTL-chain keep mask over a (key, ts)-sorted bucket.

    Maps every segment into one globally sorted int64 space (segment k
    shifted by sum of earlier segments' span + ttl + 1 — the shift
    guarantees a successor probe never crosses into the next segment),
    finds each row's chain successor with ONE searchsorted, then walks
    all segments' chains together. Falls back to a per-segment
    searchsorted loop if the shifted space would overflow int64."""
    n = len(ts)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    starts = np.flatnonzero(new_key)
    seg_id = np.cumsum(new_key) - 1
    seg_end = np.append(starts[1:], n)
    seg_min = ts[starts]
    seg_max = ts[seg_end - 1]
    span = (seg_max - seg_min).astype(np.int64)
    # shifted-space overflow check (exact, in Python ints)
    total = int(np.sum(span.astype(object))) + (len(starts)) * (int(ttl) + 1)
    if total < np.iinfo(np.int64).max // 2:
        base = np.zeros(len(starts), np.int64)
        if len(starts) > 1:
            base[1:] = np.cumsum(span[:-1] + np.int64(ttl) + 1)
        tsp = ts - seg_min[seg_id] + base[seg_id]
        nxt = np.searchsorted(tsp, tsp + np.int64(ttl), side="left")
        nxt = np.where(nxt < seg_end[seg_id], nxt, n)
        frontier = starts
        while frontier.size:
            keep[frontier] = True
            frontier = nxt[frontier]
            frontier = frontier[frontier < n]
        return keep
    # overflow fallback: per-segment greedy (rare — needs ~4e18 total
    # span); Python-int targets so ts[i] + ttl can never wrap
    for a, b in zip(starts, seg_end):
        i = int(a)
        while i < b:
            keep[i] = True
            target = int(ts[i]) + int(ttl)
            if target > int(ts[b - 1]):
                break
            i = int(a) + int(np.searchsorted(ts[a:b], np.int64(target), side="left"))
    return keep


def ttl_dedupe(
    ds,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    *,
    ttl: int,
    tiebreak: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Greedy TTL dedupe: per key in (``ts_col``, ``tiebreak``) order,
    keep the first row, then every next row whose timestamp is at
    least ``ttl`` after the LAST KEPT row's. Equivalent to replaying
    the reference's dedupe cache with an entry TTL over a
    time-ordered stream. ``ttl`` is in ``ts_col``'s integer unit and
    must be >= 1 (ties at the same timestamp keep only the
    min-tiebreak row). Rows with a null timestamp are dropped; null
    keys dedupe as their own group.

    Scale note: surviving rows carry ALL columns through one key-hash
    exchange (no local pre-cap is sound — which member of a close pair
    survives depends on the key's full history), so project upstream.
    """
    if ttl < 1:
        raise ValueError(f"ttl_dedupe: ttl must be >= 1, got {ttl}")
    keys = [keys] if isinstance(keys, str) else list(keys)

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    def drop_null_ts(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[ts_col]))

    sort_keys = [(k, "ascending") for k in keys] + [(ts_col, "ascending")]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return g
        g = g.combine_chunks().sort_by(sort_keys)
        ts = np.asarray(
            _ts_int(g, ts_col).combine_chunks().to_numpy(zero_copy_only=False),
            np.int64,
        )
        keep = _chain_keep(ts, _run_starts(g, keys), int(ttl))
        return g.filter(pa.array(keep))

    slim = ds.map_batches(drop_null_ts, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_map_groups(slim, keys, bucket, num_buckets=num_buckets)
