"""Windowed aggregation over event streams — the batch expression of
stream-shaped workloads (the reference has only wall-clock flush
windows, aggregate.rs:24-26; these are the event-time equivalents a
batch engine can state exactly).

- ``TumblingWindow``: fixed-size event-time buckets → two-phase
  grouped_aggregate on (key, window_start) — fully parallel, no
  per-group materialization.
- ``SessionWindow``: gap-based sessions per key →
  ``groupby(key).map_groups`` with a sorted cumulative-gap
  segmentation inside the group (the documented partitioning
  assumption: one key's events fit one group; salt via
  stages.salt.salted_group_reduce is NOT applicable because sessions
  need the full key timeline).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.aggregate import grouped_aggregate
from vector_ray.stages.base import Step


class TumblingWindow(Step):
    fusable = False

    def __init__(self, keys: Sequence[str], ts_col: str, size_s: float,
                 specs: Dict[str, Tuple[str, str]], *, window_col: str = "window_start"):
        self.keys = list(keys)
        self.ts_col = ts_col
        self.size_us = int(size_s * 1_000_000)
        self.specs = specs
        self.window_col = window_col

    def apply(self, ds):
        size = self.size_us
        ts_col, wcol = self.ts_col, self.window_col

        def bucket(t: pa.Table) -> pa.Table:
            # numpy floor division, NOT pc.divide: Arrow int division
            # truncates toward zero, putting pre-epoch timestamps in the
            # wrong window (ts=-1 → 0 instead of -size). HoppingWindow
            # already floors; keep both consistent.
            ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
            start = (np.asarray(ts, np.int64) // size) * size
            return t.append_column(wcol, pa.array(start, pa.int64()))

        bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        return grouped_aggregate(bucketed, self.keys + [wcol], self.specs)


class HoppingWindow(Step):
    """Overlapping event-time windows (size, hop): each row belongs to
    ``size/hop`` windows; vectorized 1→N explode (np.repeat of window
    starts) feeding the same two-phase grouped aggregate as tumbling.
    The explode factor is the only cost multiplier — no per-group
    materialization, same shuffle shape as tumbling."""

    fusable = False

    def __init__(self, keys: Sequence[str], ts_col: str, size_s: float, hop_s: float,
                 specs: Dict[str, Tuple[str, str]], *, window_col: str = "window_start"):
        if size_s % hop_s != 0:
            raise ValueError("size_s must be a multiple of hop_s")
        self.keys = list(keys)
        self.ts_col = ts_col
        self.size_us = int(size_s * 1_000_000)
        self.hop_us = int(hop_s * 1_000_000)
        self.specs = specs
        self.window_col = window_col

    def apply(self, ds):
        size, hop = self.size_us, self.hop_us
        nwin = size // hop
        ts_col, wcol = self.ts_col, self.window_col

        def explode(t: pa.Table) -> pa.Table:
            n = len(t)
            ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
            base = (ts // hop) * hop
            idx = np.repeat(np.arange(n, dtype=np.int64), nwin)
            k = np.tile(np.arange(nwin, dtype=np.int64), n)
            starts = base[idx] - k * hop
            keep = starts > ts[idx] - size  # window [start, start+size) contains ts
            take = pa.array(idx[keep], pa.int64())
            out = t.take(take)
            return out.append_column(wcol, pa.array(starts[keep], pa.int64()))

        exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        return grouped_aggregate(exploded, self.keys + [wcol], self.specs)


class SessionWindow(Step):
    """Gap-based sessions per key.

    ``mode="bucketed"`` (default) is the DISTRIBUTED plan: events are
    sessionized per (key, coarse time bucket) — fully parallel — and a
    per-key phase 2 then sessionizes the SESSION SUMMARIES (sorted by
    first event time, merging consecutive summaries whose gap is within
    the threshold; correct because buckets partition time, so summaries
    never overlap and within-bucket sessions are already > gap apart).
    The per-key group holds one row per session, not per event — a
    continuously-active hot key costs one summary per bucket instead of
    its whole event timeline. ``mode="group"`` keeps the single-group
    r1 plan (whole key timeline in one reducer).

    aggs kinds: count | sum | min | max (all phase-2 mergeable).
    """

    fusable = False

    def __init__(self, keys: Sequence[str], ts_col: str, gap_s: float,
                 aggs: Dict[str, Tuple[str, str]], *, session_col: str = "session_id",
                 mode: str = "bucketed", bucket_s: float | None = None):
        self.keys = list(keys)
        self.ts_col = ts_col
        self.gap_us = int(gap_s * 1_000_000)
        self.aggs = aggs
        self.session_col = session_col
        if mode not in ("bucketed", "group"):
            raise ValueError("mode must be bucketed or group")
        self.mode = mode
        # bucket >> gap keeps the summary count low; any width is correct
        self.bucket_us = int((bucket_s if bucket_s is not None else gap_s * 256) * 1_000_000)

    def _sessions(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.ts_col, kind="mergesort")
        ts = g[self.ts_col].astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > self.gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        g = g.assign(**{self.session_col: sid})
        # one vectorized pandas groupby-agg over all sessions of the key
        # (no per-session Python loop)
        named = {}
        for name, (kind, col) in self.aggs.items():
            if kind == "count":
                named[name] = (self.session_col, "size")
            elif kind in ("sum", "min", "max"):
                named[name] = (col, kind)
            else:
                raise ValueError(kind)
        for k in self.keys:
            named[k] = (k, "first")
        out = g.groupby(self.session_col, sort=True).agg(**named).reset_index()
        out[self.session_col] = out[self.session_col].astype(np.int64)
        cols = self.keys + [self.session_col] + list(self.aggs)
        return out[cols]

    # -- bucketed (distributed) plan --------------------------------------

    def _bucket_summaries(self, g: pd.DataFrame) -> pd.DataFrame:
        """Per (key, bucket): one summary row per local session —
        first/last event ts + mergeable partials for every agg."""
        g = g.sort_values(self.ts_col, kind="mergesort")
        ts = g[self.ts_col].astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > self.gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        g = g.assign(__sid=sid, __tsi=ts)
        named = {"__first_ts": ("__tsi", "min"), "__last_ts": ("__tsi", "max")}
        for name, (kind, col) in self.aggs.items():
            if kind == "count":
                named[name] = ("__sid", "size")
            elif kind in ("sum", "min", "max"):
                named[name] = (col, kind)
            else:
                raise ValueError(kind)
        for k in self.keys:
            named[k] = (k, "first")
        out = g.groupby("__sid", sort=True).agg(**named).reset_index(drop=True)
        return out[self.keys + ["__first_ts", "__last_ts"] + list(self.aggs)]

    def _merge_summaries(self, m: pd.DataFrame) -> pd.DataFrame:
        """Per key: sessionize the session summaries (they never overlap
        — buckets partition time) and finish the aggregates."""
        m = m.sort_values("__first_ts", kind="mergesort")
        first = m["__first_ts"].to_numpy()
        last = m["__last_ts"].to_numpy()
        new_session = np.ones(len(m), dtype=np.int64)
        if len(m) > 1:
            new_session[1:] = (first[1:] - last[:-1] > self.gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        m = m.assign(**{self.session_col: sid})
        named = {}
        for name, (kind, _col) in self.aggs.items():
            merge_kind = "sum" if kind in ("count", "sum") else kind
            named[name] = (name, merge_kind)
        for k in self.keys:
            named[k] = (k, "first")
        out = m.groupby(self.session_col, sort=True).agg(**named).reset_index()
        out[self.session_col] = out[self.session_col].astype(np.int64)
        return out[self.keys + [self.session_col] + list(self.aggs)]

    # -- whole-bucket vectorized variants (many keys per Python call) -----

    def _summaries_all(self, t: pa.Table) -> pa.Table:
        """Phase 1 over a WHOLE hash bucket: one sort + one pandas
        groupby covers every (key, time-bucket) inside — no per-key
        Python callback."""
        df = t.to_pandas()
        df = df.sort_values(self.keys + ["__bucket", self.ts_col], kind="mergesort")
        ts = df[self.ts_col].astype("int64").to_numpy()
        boundary = np.zeros(len(df), bool)
        boundary[0] = True
        for k in self.keys + ["__bucket"]:
            v = df[k].to_numpy()
            boundary[1:] |= v[1:] != v[:-1]
        gap = np.zeros(len(df), bool)
        gap[1:] = (ts[1:] - ts[:-1]) > self.gap_us
        df = df.assign(__sid=np.cumsum(boundary | gap), __tsi=ts)
        named = {"__first_ts": ("__tsi", "min"), "__last_ts": ("__tsi", "max")}
        for name, (kind, col) in self.aggs.items():
            if kind == "count":
                named[name] = ("__sid", "size")
            elif kind in ("sum", "min", "max"):
                named[name] = (col, kind)
            else:
                raise ValueError(kind)
        for k in self.keys:
            named[k] = (k, "first")
        out = df.groupby("__sid", sort=True).agg(**named).reset_index(drop=True)
        out = out[self.keys + ["__first_ts", "__last_ts"] + list(self.aggs)]
        return pa.Table.from_pandas(out, preserve_index=False)

    def _merge_all(self, t: pa.Table) -> pa.Table:
        """Phase 2 over a whole hash bucket of summaries: sessionize all
        keys in one vectorized pass; ``session_id`` restarts at 1 per
        key (ascending by first event time)."""
        m = t.to_pandas()
        m = m.sort_values(self.keys + ["__first_ts"], kind="mergesort")
        first = m["__first_ts"].to_numpy()
        last = m["__last_ts"].to_numpy()
        key_change = np.zeros(len(m), bool)
        key_change[0] = True
        for k in self.keys:
            v = m[k].to_numpy()
            key_change[1:] |= v[1:] != v[:-1]
        gap = np.zeros(len(m), bool)
        gap[1:] = (first[1:] - last[:-1]) > self.gap_us
        sid = np.cumsum(key_change | gap)
        # per-key renumber: session_id = sid - sid@key_start + 1
        krun = np.cumsum(key_change) - 1
        key_start_sid = sid[np.nonzero(key_change)[0]]
        m = m.assign(**{self.session_col: sid - key_start_sid[krun] + 1}, __sid=sid)
        named = {}
        for name, (kind, _col) in self.aggs.items():
            named[name] = (name, "sum" if kind in ("count", "sum") else kind)
        for k in self.keys:
            named[k] = (k, "first")
        named[self.session_col] = (self.session_col, "first")
        out = m.groupby("__sid", sort=True).agg(**named).reset_index(drop=True)
        out[self.session_col] = out[self.session_col].astype(np.int64)
        out = out[self.keys + [self.session_col] + list(self.aggs)]
        return pa.Table.from_pandas(out, preserve_index=False)

    def apply(self, ds):
        if self.mode == "group":
            # non-default REFERENCE plan, kept deliberately: the
            # differential test (tests/test_stages.py) checks the
            # bucketed vectorized path against it; O(distinct keys)
            return ds.groupby(self.keys).map_groups(self._sessions, batch_format="pandas")
        bucket_us, ts_col = self.bucket_us, self.ts_col

        def add_time_bucket(t: pa.Table) -> pa.Table:
            ts = pc.cast(t[ts_col], pa.int64())
            return t.append_column("__bucket", pc.multiply(pc.divide(ts, bucket_us), bucket_us))

        from vector_ray.stages.bucketed import bucketed_map_groups

        bucketed = ds.map_batches(add_time_bucket, batch_format="pyarrow", zero_copy_batch=True)
        # phase 1 buckets by (key, time-bucket) so a hot key's timeline
        # still splits across tasks; phase 2 buckets by key over the
        # (tiny) summary rows — both are ONE vectorized call per bucket
        summaries = bucketed_map_groups(
            bucketed, self.keys + ["__bucket"], self._summaries_all
        )
        return bucketed_map_groups(summaries, self.keys, self._merge_all)


def resample(ds, ts_col: str, size_s: float,
             specs: Dict[str, Tuple[str, str]], *,
             keys: Sequence[str] = (), fill: str = "null",
             window_col: str = "window_start", buckets: int | None = None,
             max_grid: int = 50_000_000):
    """Dense-grid tumbling aggregate — the batch analogue of SQL
    ``generate_series + LEFT JOIN`` / pandas ``.resample()``: after the
    two-phase tumbling aggregate, every window between each key's first
    and last event is MATERIALIZED, empty windows included.

    ``fill``: ``"null"`` leaves empty windows null, ``"zero"`` fills
    every agg column with 0, ``"ffill"`` forward-fills each agg column
    from the key's last non-empty window (per-key sorted scan inside
    hash buckets — vectorized maximum.accumulate index carry, reset at
    key boundaries; rows before a key's first value stay null).

    Scale notes: the aggregate output is one row per (key, window) —
    the dense grid is inherently output-sized, guarded by ``max_grid``
    rows per key (loud failure). Grid generation is a 1→N expansion of
    the tiny per-key range table; the left join and the ffill reuse
    the bucketed hash-join / bucketed-group machinery (only grid +
    aggregate rows shuffle, never events)."""
    import ray  # noqa: F401  (parity with sibling stages)

    from vector_ray.stages.bucketed import bucketed_map_groups
    from vector_ray.stages.join import bucketed_join

    if fill not in ("null", "zero", "ffill"):
        raise ValueError(f"resample: unknown fill={fill!r}")
    keys = list(keys)
    size = int(size_s * 1_000_000)
    gkeys = keys if keys else ["__all"]

    base = ds
    if not keys:
        base = ds.map_batches(
            lambda t: t.append_column(
                "__all", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow", zero_copy_batch=True)
    agg = TumblingWindow(gkeys, ts_col, size_s, specs,
                         window_col=window_col).apply(base).materialize()
    ranges = grouped_aggregate(
        agg, gkeys, {"__lo": ("min", window_col),
                     "__hi": ("max", window_col)})

    def expand(t: pa.Table) -> pa.Table:
        lo = np.asarray(t["__lo"].to_numpy(zero_copy_only=False), np.int64)
        hi = np.asarray(t["__hi"].to_numpy(zero_copy_only=False), np.int64)
        m = (hi - lo) // size + 1
        if len(m) and int(m.max()) > max_grid:
            raise ValueError(
                f"resample: a key spans {int(m.max())} windows > "
                f"max_grid={max_grid}; raise size_s or max_grid")
        idx = np.repeat(np.arange(len(t), dtype=np.int64), m)
        offs = np.zeros(len(t) + 1, np.int64)
        np.cumsum(m, out=offs[1:])
        w = lo[idx] + (np.arange(int(offs[-1]), dtype=np.int64)
                       - np.repeat(offs[:-1], m)) * size
        out = t.select(gkeys).take(pa.array(idx))
        return out.append_column(window_col, pa.array(w))

    grid = ranges.map_batches(expand, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = bucketed_join(grid, agg, on=gkeys + [window_col],
                           buckets=buckets, join_type="left")
    agg_cols = list(specs.keys())

    def finish(t: pa.Table) -> pa.Table:
        if fill == "zero":
            for c in agg_cols:
                col = t[c]
                t = t.set_column(t.column_names.index(c), c,
                                 pc.fill_null(col, pa.scalar(
                                     0, col.type if not pa.types.is_null(
                                         col.type) else pa.int64())))
        if not keys:
            t = t.drop_columns(["__all"])
        return t

    if fill != "ffill":
        return joined.map_batches(finish, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def ffill_bucket(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(k, "ascending")
                                              for k in gkeys + [window_col]])
        g = g.take(order)
        n = len(g)
        if n == 0:
            return g
        kcols = [np.asarray(
            pc.cast(g[k], pa.string()).to_numpy(zero_copy_only=False))
            for k in gkeys]
        newkey = np.zeros(n, bool)
        newkey[0] = True
        for kc in kcols:
            newkey[1:] |= kc[1:] != kc[:-1]
        first_idx = np.repeat(
            np.nonzero(newkey)[0],
            np.diff(np.append(np.nonzero(newkey)[0], n)))
        ar = np.arange(n, dtype=np.int64)
        out = g
        for c in agg_cols:
            valid = np.asarray(
                pc.is_valid(g[c]).to_numpy(zero_copy_only=False))
            carry = np.maximum.accumulate(np.where(valid, ar, -1))
            ok = carry >= first_idx
            idx = pa.array(np.where(ok, carry, 0), pa.int64(),
                           mask=~ok)
            out = out.set_column(out.column_names.index(c), c,
                                 g[c].take(idx))
        if not keys:
            out = out.drop_columns(["__all"])
        return out

    return bucketed_map_groups(joined, gkeys, ffill_bucket,
                               num_buckets=buckets)
