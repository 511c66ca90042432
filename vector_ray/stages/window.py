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
            ts = pc.cast(t[ts_col], pa.int64())
            start = pc.multiply(pc.divide(ts, size), size)
            return t.append_column(wcol, start)

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
    fusable = False

    def __init__(self, keys: Sequence[str], ts_col: str, gap_s: float,
                 aggs: Dict[str, Tuple[str, str]], *, session_col: str = "session_id"):
        """aggs kinds: count | sum | min | max (pandas in-group)."""
        self.keys = list(keys)
        self.ts_col = ts_col
        self.gap_us = int(gap_s * 1_000_000)
        self.aggs = aggs
        self.session_col = session_col

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

    def apply(self, ds):
        return ds.groupby(self.keys).map_groups(self._sessions, batch_format="pandas")
