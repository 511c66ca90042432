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


# ---------------------------------------------------------------------------
# grouped exact quantiles — per-key AggregatedSummary quantiles
# (metric.rs:165-169) as a distributed three-scan plan, no sort:
#   A. grouped min/max/count (two-phase, tiny result)
#   B. per-(key, bin) histogram counts (pre-aggregated per batch)
#   C. fetch ONLY the candidate bins' values per key, exact pick.
# A pathological (key, bin) wider than `cap` falls back to the global
# refinement machinery on that key's rows alone.


def grouped_exact_quantiles(
    ds,
    key: str,
    col: str,
    ps: Sequence[float],
    *,
    bins: int = 1024,
    cap: int = 2_000_000,
):
    """One row per key with a column per requested quantile
    (``p50``-style names), DuckDB ``quantile_disc`` rank rule."""
    import ray

    from vector_ray.stages.aggregate import grouped_aggregate

    stats_rows = grouped_aggregate(
        ds, [key], {"n": ("count", col), "lo": ("min", col), "hi": ("max", col)}
    ).take_all()
    ranges = {
        r[key]: (int(r["n"]), float(r["lo"]), float(r["hi"]))
        for r in stats_rows if r["n"]
    }
    rref = ray.put(ranges)

    def bin_counts(t: pa.Table) -> pa.Table:
        # vectorized per DISTINCT key (dictionary codes), not per row
        rr = ray.get(rref)
        d = pc.dictionary_encode(t[key].combine_chunks())
        codes = np.asarray(d.indices)
        uniq = d.dictionary.to_pylist()
        vals = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(vals) if vals.dtype.kind == "f" else np.ones(len(vals), bool)
        out_k, out_b, out_n = [], [], []
        for ci, kv in enumerate(uniq):
            if kv not in rr:
                continue
            _n, lo, hi = rr[kv]
            v = vals[(codes == ci) & valid]
            counts = np.bincount(_bin_of(v, lo, hi, bins), minlength=bins)
            nz = np.nonzero(counts)[0]
            out_k.extend([kv] * len(nz))
            out_b.extend(nz.tolist())
            out_n.extend(counts[nz].tolist())
        return pa.table({
            key: pa.array(out_k),
            "bin": pa.array(out_b, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        })

    per_bin = grouped_aggregate(
        ds.map_batches(bin_counts, batch_format="pyarrow", zero_copy_batch=True),
        [key, "bin"], {"n": ("sum", "n")},
    ).take_all()  # ≤ keys × bins tiny rows
    hist: dict = {}
    for r in per_bin:
        hist.setdefault(r[key], {})[int(r["bin"])] = int(r["n"])

    # locate the candidate bin per (key, p)
    needed: dict = {}  # (key, bin) -> list of (p, rank_within)
    fallbacks = []  # (key, p, global_rank) for over-cap bins
    for kv, (n, lo, hi) in ranges.items():
        counts = np.zeros(bins, np.int64)
        for b, c in hist.get(kv, {}).items():
            counts[b] = c
        cum = np.cumsum(counts)
        for p in ps:
            k = max(1, math.ceil(p * n))
            b = int(np.searchsorted(cum, k))
            rank_within = k - (int(cum[b - 1]) if b > 0 else 0)
            if counts[b] <= cap:
                needed.setdefault((kv, b), []).append((p, rank_within))
            else:
                fallbacks.append((kv, p, k))
    nref = ray.put(set(needed))

    def fetch(t: pa.Table) -> pa.Table:
        # vectorized per distinct key: bin every value at once, keep
        # only the wanted (key, bin) members
        rr = ray.get(rref)
        want = ray.get(nref)
        d = pc.dictionary_encode(t[key].combine_chunks())
        codes = np.asarray(d.indices)
        uniq = d.dictionary.to_pylist()
        vals = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(vals) if vals.dtype.kind == "f" else np.ones(len(vals), bool)
        out_k, out_b, out_v = [], [], []
        for ci, kv in enumerate(uniq):
            want_bins = np.array(sorted(b for (k2, b) in want if k2 == kv), np.int64)
            if kv not in rr or len(want_bins) == 0:
                continue
            _n, lo, hi = rr[kv]
            mask = (codes == ci) & valid
            v = vals[mask]
            b = _bin_of(v, lo, hi, bins)
            sel = np.isin(b, want_bins)
            out_k.extend([kv] * int(sel.sum()))
            out_b.extend(b[sel].tolist())
            out_v.extend(v[sel].tolist())
        return pa.table({key: pa.array(out_k), "bin": pa.array(out_b, pa.int64()),
                         "v": pa.array(out_v, pa.float64())})

    rows = ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True).take_all()
    buckets: dict = {}
    for r in rows:
        buckets.setdefault((r[key], int(r["bin"])), []).append(r["v"])
    results: dict = {kv: {} for kv in ranges}
    for (kv, b), targets in needed.items():
        vs = sorted(buckets.get((kv, b), []))
        for p, rank_within in targets:
            results[kv][p] = vs[rank_within - 1]
    for kv, p, k in fallbacks:
        sub = ds.map_batches(
            lambda t, kv=kv: t.filter(pc.equal(t[key], kv)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        results[kv][p] = exact_rank_values(sub, col, [k], bins=bins, cap=cap)[0]

    cols = {key: pa.array(sorted(results))}
    for p in ps:
        pct = round(p * 100, 6)
        name = f"p{int(pct)}" if pct == int(pct) else f"p{p}"
        cols[name] = pa.array([results[kv][p] for kv in sorted(results)], pa.float64())
    return pa.table(cols)
