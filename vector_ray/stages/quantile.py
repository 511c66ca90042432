"""Exact distributed quantiles via histogram refinement.

Replaces the r1 driver-side ``ds.sort(col).limit(k).take(k)`` (which
pulled ~N rows to the driver per quantile) with a shuffle-free plan:

1. stats scan   — n / min / max of the column (tiny partials).
2. count scan   — fixed-bin histogram partials, merged on the driver
                  (``bins`` int64s per block — KBs).
3. fetch scan   — pull ONLY the rows of the bins containing the target
                  ranks; sort those few on the driver; pick the exact
                  rank. If a bin holds more than ``cap`` rows (heavy
                  skew), recurse into that bin with a fresh histogram
                  instead of fetching.

No sort, no shuffle, no driver materialization beyond ``cap`` values —
each scan is an embarrassingly parallel ``map_batches`` that reads one
column. At 100 TB this is 2-3 column scans vs. a full all-to-all sort.

Bin membership is decided by one shared float64 formula (``_bin_of``),
so the count and fetch scans can never disagree on boundaries.

Capability the reference lacks outright (SURVEY.md §2.7); also the
mergeable-quantile mechanism AggregatedSummary needs
(lib/vector-core/src/event/metric.rs:165-169).
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bin_of(v: np.ndarray, lo: float, hi: float, nb: int) -> np.ndarray:
    if hi <= lo:
        return np.zeros(len(v), np.int64)
    b = np.floor((v - lo) * (nb / (hi - lo))).astype(np.int64)
    return np.clip(b, 0, nb - 1)


def _scope_mask(v: np.ndarray, sel) -> np.ndarray:
    m = np.ones(len(v), bool)
    for (l, h, b, i) in sel:
        m &= _bin_of(v, l, h, b) == i
    return m


def _col_f64(t: pa.Table, col: str) -> np.ndarray:
    v = pc.drop_null(t[col])
    if len(v) == 0:
        return np.empty(0, np.float64)
    return pc.cast(v, pa.float64()).to_numpy(zero_copy_only=False)


def _stats_scan(ds, col: str):
    def part(t: pa.Table) -> pa.Table:
        arr = _col_f64(t, col)
        return pa.table({
            "n": pa.array([len(arr)], pa.int64()),
            "lo": pa.array([float(arr.min()) if len(arr) else None], pa.float64()),
            "hi": pa.array([float(arr.max()) if len(arr) else None], pa.float64()),
        })

    rows = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(r["n"] for r in rows)
    los = [r["lo"] for r in rows if r["lo"] is not None]
    his = [r["hi"] for r in rows if r["hi"] is not None]
    return n, (min(los) if los else 0.0), (max(his) if his else 0.0)


def _count_scan(ds, col: str, sel, lo: float, hi: float, nb: int):
    """Histogram of in-scope rows over [lo, hi) + in-scope min/max."""

    def part(t: pa.Table) -> pa.Table:
        v = _col_f64(t, col)
        v = v[_scope_mask(v, sel)]
        counts = np.bincount(_bin_of(v, lo, hi, nb), minlength=nb).astype(np.int64)
        return pa.table({
            "counts": pa.array([counts], pa.list_(pa.int64())),
            "lo": pa.array([float(v.min()) if len(v) else None], pa.float64()),
            "hi": pa.array([float(v.max()) if len(v) else None], pa.float64()),
        })

    rows = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    total = np.zeros(nb, np.int64)
    for r in rows:
        total += np.asarray(r["counts"], dtype=np.int64)
    los = [r["lo"] for r in rows if r["lo"] is not None]
    his = [r["hi"] for r in rows if r["hi"] is not None]
    return total, (min(los) if los else lo), (max(his) if his else hi)


def _fetch_scan(ds, col: str, sels: List) -> List[np.ndarray]:
    """One scan collecting the in-scope values of every selection."""

    def part(t: pa.Table) -> pa.Table:
        v = _col_f64(t, col)
        out = {}
        for si, sel in enumerate(sels):
            out[f"s{si}"] = pa.array([v[_scope_mask(v, sel)]], pa.list_(pa.float64()))
        return pa.table(out)

    rows = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    vals = []
    for si in range(len(sels)):
        chunks = [np.asarray(r[f"s{si}"], dtype=np.float64) for r in rows]
        vals.append(np.concatenate(chunks) if chunks else np.empty(0, np.float64))
    return vals


def exact_rank_values(
    ds,
    col: str,
    ranks: Sequence[int],
    *,
    bins: int = 2048,
    cap: int = 2_000_000,
    max_levels: int = 8,
    _stats=None,
) -> List[float]:
    """Exact values at the given 1-indexed global ranks of ``col``
    (nulls excluded), without sorting the dataset."""
    n, lo, hi = _stats if _stats is not None else _stats_scan(ds, col)
    out: dict = {}
    # active: (orig_idx, rank_within_scope, sel_chain, lo, hi)
    active = []
    for oi, k in enumerate(ranks):
        if n == 0:
            out[oi] = None
        elif not (1 <= k <= n):
            raise ValueError(f"rank {k} out of range 1..{n}")
        else:
            active.append((oi, int(k), [], lo, hi))
    to_fetch: list = []  # (orig_idx, rank_within, sel_chain)
    level = 0
    while active:
        nxt = []
        # group items sharing a scope so one count scan serves them all
        groups: dict = {}
        for item in active:
            key = (tuple(item[2]), item[3], item[4])
            groups.setdefault(key, []).append(item)
        for (sel_key, g_lo, g_hi), items in groups.items():
            sel = list(sel_key)
            counts, s_lo, s_hi = _count_scan(ds, col, sel, g_lo, g_hi, bins)
            if s_lo == s_hi:
                for (oi, _k, _s, _l, _h) in items:
                    out[oi] = s_lo
                continue
            cum = np.cumsum(counts)
            for (oi, k, _s, _l, _h) in items:
                b = int(np.searchsorted(cum, k))
                below = int(cum[b - 1]) if b > 0 else 0
                rank_within = k - below
                sub_sel = sel + [(g_lo, g_hi, bins, b)]
                if counts[b] <= cap or level + 1 >= max_levels:
                    to_fetch.append((oi, rank_within, sub_sel))
                else:
                    width = (g_hi - g_lo) / bins
                    nxt.append((oi, rank_within, sub_sel,
                                g_lo + b * width, g_lo + (b + 1) * width))
        active = nxt
        level += 1
    if to_fetch:
        vals = _fetch_scan(ds, col, [f[2] for f in to_fetch])
        for (oi, rank_within, _sel), v in zip(to_fetch, vals):
            v.sort()
            out[oi] = float(v[rank_within - 1])
    return [out[i] for i in range(len(ranks))]


def exact_quantiles(
    ds,
    col: str,
    ps: Sequence[float],
    *,
    rank_fn: Callable[[float, int], int] | None = None,
    **kw,
) -> List[float]:
    """p-quantiles with DuckDB ``quantile_disc``-compatible default
    rank rule k = ceil(p·n) (1-indexed)."""
    stats = _stats_scan(ds, col)
    n = stats[0]
    if n == 0:
        return [None for _ in ps]
    rf = rank_fn or (lambda p, n: max(1, math.ceil(p * n)))
    ranks = [rf(p, n) for p in ps]
    return exact_rank_values(ds, col, ranks, _stats=stats, **kw)
