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


def exact_quantiles_cont(
    ds,
    col: str,
    ps: Sequence[float],
    **kw,
) -> List[float]:
    """Interpolated p-quantiles — SQL ``quantile_cont`` /
    ``percentile_cont`` semantics: h = p·(n−1) (0-indexed), result =
    v[⌊h⌋]·(1−frac) + v[⌈h⌉]·frac in float64 — DuckDB's SYMMETRIC
    interpolation form (not lo + frac·(hi−lo), which differs in the
    last ulp), so the oracle hash-matches. Uses
    the same iterative histogram-refinement rank machinery as
    :func:`exact_quantiles` (no global sort): both neighbouring order
    statistics fetch in ONE exact_rank_values call (shared count
    scans). Returns None per entry on an empty/all-null column."""
    import math as _math

    stats = _stats_scan(ds, col)
    n = stats[0]
    if n == 0:
        return [None for _ in ps]
    lo_r, hi_r, fracs = [], [], []
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"quantile {p} outside [0, 1]")
        h = p * (n - 1)
        fl = int(_math.floor(h))
        lo_r.append(fl + 1)                    # 1-indexed ranks
        hi_r.append(min(fl + 2, n))
        fracs.append(h - fl)
    vals = exact_rank_values(ds, col, lo_r + hi_r, _stats=stats, **kw)
    out = []
    for i, frac in enumerate(fracs):
        vlo, vhi = vals[i], vals[len(fracs) + i]
        out.append(vlo * (1 - frac) + vhi * frac)
    return out


# ---------------------------------------------------------------------------
# grouped exact quantiles — per-key AggregatedSummary quantiles
# (metric.rs:165-169) as a distributed three-scan plan, no sort:
#   A. grouped min/max/count (two-phase, tiny result) → broadcast Arrow
#      range table, probed per batch with vectorized pc.index_in.
#   B. per-(key, bin) histogram counts (np.unique over a combined
#      key_idx*bins+bin id — no per-key Python), merged distributed.
#   C. candidate-bin location runs DISTRIBUTED (bucketed segment scan
#      over the per-bin table), then ONE fetch scan pulls candidate-bin
#      values and a DISTRIBUTED bucketed selection picks exact ranks.
# Driver state is bounded by O(keys × len(ps)) rows, enforced via
# ``max_keys`` (clear error beyond it — at higher cardinality use a
# sketch/approx path instead). A pathological (key, bin) wider than
# ``cap`` falls back to the global refinement machinery on that key's
# rows alone.


def _row_bins(v: np.ndarray, lo: np.ndarray, hi: np.ndarray, nb: int) -> np.ndarray:
    """Per-row bin with per-row [lo, hi) ranges — same formula as
    ``_bin_of`` so count/fetch scans can never disagree."""
    span = hi - lo
    with np.errstate(divide="ignore", invalid="ignore"):
        b = np.floor((v - lo) * (nb / span)).astype(np.int64)
    return np.where(span > 0, np.clip(b, 0, nb - 1), 0)


def _probe_str(col) -> pa.Array:
    s = pc.fill_null(pc.cast(col, pa.string()), "\x00\x01")
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def grouped_exact_quantiles(
    ds,
    key: str,
    col: str,
    ps: Sequence[float],
    *,
    bins: int = 1024,
    cap: int = 2_000_000,
    max_keys: int = 1_000_000,
    interpolation: str = "disc",
):
    """One row per key with a column per requested quantile
    (``p50``-style names). ``interpolation="disc"`` (default) is the
    DuckDB ``quantile_disc`` rank rule (an actual data value);
    ``"cont"`` is SQL ``quantile_cont``/``percentile_cont`` — the two
    neighbouring order statistics locate through the SAME distributed
    plan (each p just contributes two rank requests instead of one)
    and interpolate per key as v_lo·(1−frac) + v_hi·frac, DuckDB's
    symmetric float64 form.

    Driver memory is O(keys × len(ps)); ``max_keys`` (default 10^6)
    enforces that bound with an explicit error."""
    if interpolation not in ("disc", "cont"):
        raise ValueError(
            f"grouped_exact_quantiles: interpolation must be disc|cont,"
            f" got {interpolation!r}")
    import ray

    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.bucketed import bucketed_map_groups

    stats = grouped_aggregate(
        ds, [key], {"n": ("count", col), "lo": ("min", col), "hi": ("max", col)}
    ).materialize()
    n_keys = stats.count()
    if n_keys > max_keys:
        raise ValueError(
            f"grouped_exact_quantiles: {n_keys} distinct keys exceeds "
            f"max_keys={max_keys}; exact grouped quantiles keep O(keys) "
            "candidate state — raise max_keys, or use "
            "grouped_approx_quantiles (bottom-k sample, O(k) per key "
            "with no key-count bound) / the histogram sketch aggregate"
        )
    blocks = ray.get(stats.to_arrow_refs())
    rt = pa.concat_tables([b for b in blocks if len(b)]).combine_chunks()
    rt = rt.filter(pc.greater(pc.fill_null(rt["n"], 0), 0))
    if len(rt) == 0:
        cols = {key: pa.array([], pa.string())}
        for p in ps:
            pct = round(p * 100, 6)
            name = f"p{int(pct)}" if pct == int(pct) else f"p{p}"
            cols[name] = pa.array([], pa.float64())
        return pa.table(cols)
    rt = rt.append_column("__pk", _probe_str(rt[key]))
    rref = ray.put(rt)

    def _match(t: pa.Table, rtab: pa.Table):
        """Vectorized (key_idx, value, valid-mask) for a batch."""
        idx = pc.index_in(_probe_str(t[key]), value_set=rtab["__pk"].combine_chunks())
        ki = np.asarray(pc.fill_null(idx, -1).cast(pa.int64()).to_numpy(zero_copy_only=False))
        vals = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        m = (ki >= 0) & ~np.isnan(vals)
        return ki[m], vals[m]

    def bin_counts(t: pa.Table) -> pa.Table:
        rtab = ray.get(rref)
        if len(t) == 0:
            return pa.table({"ki": pa.array([], pa.int64()),
                             "bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lo_np = rtab["lo"].to_numpy(zero_copy_only=False)
        hi_np = rtab["hi"].to_numpy(zero_copy_only=False)
        ki, v = _match(t, rtab)
        b = _row_bins(v, lo_np[ki], hi_np[ki], bins)
        combo, counts = np.unique(ki * bins + b, return_counts=True)
        return pa.table({
            "ki": pa.array(combo // bins, pa.int64()),
            "bin": pa.array(combo % bins, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    per_bin = grouped_aggregate(
        ds.map_batches(bin_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["ki", "bin"], {"n": ("sum", "n")},
    )

    # locate the candidate bin per (key, request) — DISTRIBUTED
    # segment scan. disc: one rank request per p (ceil(p·n));
    # cont: two per p (floor(p·(n−1))+1 and +2, clipped to n).
    ps_l = list(ps)
    reqs = ([(pi, 0) for pi in range(len(ps_l))] if interpolation == "disc"
            else [(pi, side) for pi in range(len(ps_l))
                  for side in (0, 1)])

    def _req_ranks(pi: int, side: int, nkey: np.ndarray) -> np.ndarray:
        p = ps_l[pi]
        if interpolation == "disc":
            return np.maximum(1, np.ceil(p * nkey)).astype(np.int64)
        fl = np.floor(p * (nkey - 1)).astype(np.int64)
        r = fl + 1 + side
        return np.minimum(np.maximum(r, 1), nkey).astype(np.int64)

    def cand_fn(g: pa.Table) -> pa.Table:
        rtab = ray.get(rref)
        empty = pa.table({"ki": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
                          "pi": pa.array([], pa.int64()), "rw": pa.array([], pa.int64()),
                          "over": pa.array([], pa.bool_())})
        if len(g) == 0:
            return empty
        g = g.sort_by([("ki", "ascending"), ("bin", "ascending")])
        ki = np.asarray(g["ki"]); cnt = np.asarray(g["n"], dtype=np.int64)
        bn = np.asarray(g["bin"])
        n_np = rtab["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nkey = n_np[ki]
        new_run = np.ones(len(g), bool)
        new_run[1:] = ki[1:] != ki[:-1]
        run_starts = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        c = np.cumsum(cnt)
        base = np.where(run_starts > 0, c[run_starts - 1], 0)
        cum_within = c - base[run_id]
        below = cum_within - cnt
        outs = []
        for ri, (pi, side) in enumerate(reqs):
            ktarget = _req_ranks(pi, side, nkey)
            hit = (cum_within >= ktarget) & (below < ktarget)
            outs.append(pa.table({
                "ki": pa.array(ki[hit], pa.int64()),
                "bin": pa.array(bn[hit], pa.int64()),
                "pi": pa.array(np.full(int(hit.sum()), ri), pa.int64()),
                "rw": pa.array((ktarget - below)[hit], pa.int64()),
                "over": pa.array(cnt[hit] > cap),
            }))
        return pa.concat_tables(outs) if outs else empty

    needed_rows = bucketed_map_groups(per_bin, ["ki"], cand_fn).take_all()
    # bounded: ≤ keys × len(ps) rows (max_keys-enforced)
    nd_ki = np.array([r["ki"] for r in needed_rows], np.int64)
    nd_bin = np.array([r["bin"] for r in needed_rows], np.int64)
    nd_pi = np.array([r["pi"] for r in needed_rows], np.int64)
    nd_rw = np.array([r["rw"] for r in needed_rows], np.int64)
    nd_over = np.array([r["over"] for r in needed_rows], bool)

    fetchable = ~nd_over
    combos = np.unique(nd_ki[fetchable] * bins + nd_bin[fetchable])
    nref = ray.put({
        "combos": combos,
        "ki": nd_ki[fetchable], "bin": nd_bin[fetchable],
        "pi": nd_pi[fetchable], "rw": nd_rw[fetchable],
    })

    def fetch(t: pa.Table) -> pa.Table:
        rtab = ray.get(rref)
        nd = ray.get(nref)
        empty = pa.table({"ki": pa.array([], pa.int64()), "bin": pa.array([], pa.int64()),
                          "v": pa.array([], pa.float64())})
        if len(t) == 0 or len(nd["combos"]) == 0:
            return empty
        lo_np = rtab["lo"].to_numpy(zero_copy_only=False)
        hi_np = rtab["hi"].to_numpy(zero_copy_only=False)
        ki, v = _match(t, rtab)
        b = _row_bins(v, lo_np[ki], hi_np[ki], bins)
        combo = ki * bins + b
        pos = np.searchsorted(nd["combos"], combo)
        posc = np.clip(pos, 0, len(nd["combos"]) - 1)
        sel = nd["combos"][posc] == combo
        return pa.table({"ki": pa.array(ki[sel], pa.int64()),
                         "bin": pa.array(b[sel], pa.int64()),
                         "v": pa.array(v[sel], pa.float64())})

    fetched = ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)

    def pick_fn(g: pa.Table) -> pa.Table:
        nd = ray.get(nref)
        empty = pa.table({"ki": pa.array([], pa.int64()), "pi": pa.array([], pa.int64()),
                          "v": pa.array([], pa.float64())})
        if len(g) == 0:
            return empty
        g = g.sort_by([("ki", "ascending"), ("bin", "ascending"), ("v", "ascending")])
        ki = np.asarray(g["ki"]); bn = np.asarray(g["bin"])
        v = np.asarray(g["v"], dtype=np.float64)
        combo = ki * bins + bn
        new_run = np.ones(len(g), bool)
        new_run[1:] = combo[1:] != combo[:-1]
        seg_start = np.nonzero(new_run)[0]
        uniq = combo[seg_start]
        nd_combo = nd["ki"] * bins + nd["bin"]
        pos = np.searchsorted(uniq, nd_combo)
        posc = np.clip(pos, 0, len(uniq) - 1)
        present = uniq[posc] == nd_combo
        sel = seg_start[posc[present]] + nd["rw"][present] - 1
        return pa.table({"ki": pa.array(nd["ki"][present], pa.int64()),
                         "pi": pa.array(nd["pi"][present], pa.int64()),
                         "v": pa.array(v[sel], pa.float64())})

    picked = bucketed_map_groups(fetched, ["ki"], pick_fn).take_all()

    key_vals = rt[key].to_pylist()
    req_res: dict = {kv: {} for kv in key_vals}
    for r in picked:
        req_res[key_vals[r["ki"]]][int(r["pi"])] = float(r["v"])
    # over-cap (pathological) bins: per-key global refinement fallback
    n_np = rt["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    for i in np.nonzero(nd_over)[0]:
        kv = key_vals[int(nd_ki[i])]
        ri = int(nd_pi[i])
        pi, side = reqs[ri]
        nk = np.array([int(n_np[int(nd_ki[i])])], np.int64)
        k = int(_req_ranks(pi, side, nk)[0])
        sub = ds.map_batches(
            lambda t, kv=kv: t.filter(pc.equal(t[key], kv)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        req_res[kv][ri] = exact_rank_values(sub, col, [k], bins=bins,
                                            cap=cap)[0]

    n_by_kv = {kv: int(n) for kv, n in zip(key_vals, n_np)}
    results: dict = {kv: {} for kv in key_vals}
    for kv in key_vals:
        for ri, (pi, side) in enumerate(reqs):
            if interpolation == "disc":
                results[kv][ps_l[pi]] = req_res[kv][ri]
            elif side == 0:
                p = ps_l[pi]
                h = p * (n_by_kv[kv] - 1)
                frac = h - math.floor(h)
                vlo = req_res[kv][ri]
                vhi = req_res[kv][ri + 1]
                results[kv][p] = vlo * (1 - frac) + vhi * frac

    cols = {key: pa.array(sorted(results))}
    for p in ps:
        pct = round(p * 100, 6)
        name = f"p{int(pct)}" if pct == int(pct) else f"p{p}"
        cols[name] = pa.array([results[kv][p] for kv in sorted(results)], pa.float64())
    return pa.table(cols)


def quantile_band_filter(
    ds,
    col: str,
    lo_q: float | None = None,
    hi_q: float | None = None,
    **kw,
):
    """Keep rows whose ``col`` lies inside the [lo_q, hi_q] quantile
    band of the WHOLE dataset (either bound optional) — the CCNet-style
    "keep the middle-perplexity band" curation step (Wenzek et al.
    2020 §4.3), applicable to any score column (lm_perplexity output,
    quality scores, lengths).

    The band edges are exact quantiles (``quantile_disc`` rank rule)
    via the shuffle-free histogram-refinement plan (2-3 column scans,
    driver sees two scalars); the filter itself is a stateless map-only
    pass. Rows with null ``col`` never pass. Total cost: one extra
    pruned-column scan over the quantile passes; no shuffle anywhere."""
    ps = []
    if lo_q is not None:
        ps.append(lo_q)
    if hi_q is not None:
        ps.append(hi_q)
    if not ps:
        raise ValueError("quantile_band_filter: need lo_q and/or hi_q")
    vals = exact_quantiles(ds, col, ps, **kw)
    lo = vals[0] if lo_q is not None else None
    hi = vals[-1] if hi_q is not None else None

    def keep(t: pa.Table) -> pa.Table:
        c = t[col]
        mask = pc.is_valid(c)
        if lo is not None:
            mask = pc.and_kleene(mask, pc.greater_equal(c, lo))
        if hi is not None:
            mask = pc.and_kleene(mask, pc.less_equal(c, hi))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def mad_outlier_filter(ds, col: str, *, k: float = 3.0,
                       keep: str = "inlier", **kw):
    """Robust outlier trim on a score column: keep rows with
    ``|x - median| <= k * MAD`` (median absolute deviation), the
    scale-free alternative to z-score trimming when the score
    distribution has heavy tails (perplexity, tf-idf, page sizes).

    Two shuffle-free exact-quantile passes (median of ``col``, then
    median of ``|col - med|`` over a derived column — both DuckDB
    ``quantile_disc`` rank rule via histogram refinement, the driver
    sees two scalars) plus one stateless map-only filter. The deviation
    and threshold arithmetic is plain float64, so the kept set is
    bit-reproducible on any partitioning. ``keep="outlier"`` inverts
    the band (inspect what would be dropped). Null scores never pass
    either mode."""
    if keep not in ("inlier", "outlier"):
        raise ValueError("mad_outlier_filter: keep must be inlier|outlier")
    med = exact_quantiles(ds, col, [0.5], **kw)[0]

    def dev(t: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(pc.cast(t[col], pa.float64()), med))
        return pa.table({"__vr_dev": d})

    devs = ds.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True)
    mad = exact_quantiles(devs, "__vr_dev", [0.5], **kw)[0]
    thr = float(k) * float(mad)

    def flt(t: pa.Table) -> pa.Table:
        c = pc.cast(t[col], pa.float64())
        inl = pc.less_equal(pc.abs(pc.subtract(c, med)), thr)
        if keep == "outlier":
            inl = pc.invert(inl)
        mask = pc.and_kleene(pc.is_valid(c), inl)
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def _pcol_name(p: float) -> str:
    pct = round(p * 100, 6)
    return f"p{int(pct)}" if pct == int(pct) else f"p{p}"


def grouped_approx_quantiles(
    ds,
    key: str,
    col: str,
    ps: Sequence[float],
    *,
    id_col: str,
    k: int = 1024,
    seed: int = 0,
):
    """Per-key approximate quantiles from a deterministic bottom-k
    hash sample — the UNBOUNDED-cardinality scale path that
    :func:`grouped_exact_quantiles` (hard ``max_keys`` bound, O(keys)
    driver state) explicitly punts to.

    Plan: each block forwards at most ``k`` rows per key it contains
    (the local bottom-``k`` of a salted id hash — ml/sampling's
    bottom-k reservoir, here per key via ``grouped_topk``); the merged
    per-key sample (≤ k rows, uniform without replacement over the
    key's rows) is reduced to nearest-rank quantiles inside ONE
    bucketed vectorized pass. Nothing is ever O(keys) on the driver,
    no full sort, the data column never shuffles — only the sample.

    Rank rule matches DuckDB ``quantile_disc`` on the SAMPLE
    (idx = ceil(p·n)−1): every output is an actual data value. The
    sample — hence the output — is a pure function of the id set and
    ``seed``, independent of block layout, so results are
    bit-reproducible on any cluster shape. Error is the standard
    bottom-k-sample quantile bound (rank error O(1/√k) w.h.p.);
    keys with ≤ k rows are EXACT. Nulls in ``col`` are ignored.

    Returns one row per key: (key, p50-style column per requested p).
    """
    from vector_ray.ml.sampling import _salted_hash
    from vector_ray.stages.bucketed import bucketed_map_groups
    from vector_ray.stages.topk import grouped_topk

    _H = "__vr_qh"
    ps_l = [float(p) for p in ps]
    if not ps_l or any(not (0.0 <= p <= 1.0) for p in ps_l):
        raise ValueError("grouped_approx_quantiles: ps must be in [0, 1]")

    def keyed(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[col]))
        out = t.select([key, col, id_col] if id_col not in (key, col)
                       else [key, col])
        return out.append_column(
            _H, pa.array(_salted_hash(t, id_col, seed), pa.uint64()))

    sample = grouped_topk(
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        [key], _H, k, descending=False, tiebreak=id_col)

    def finish(g: pa.Table) -> pa.Table:
        gs = g.sort_by([(key, "ascending"), (col, "ascending")])
        kp = np.asarray(_probe_str(gs[key]).to_numpy(zero_copy_only=False),
                        object)
        v = pc.cast(gs[col], pa.float64()).to_numpy(zero_copy_only=False)
        if len(kp) == 0:
            cols = {key: gs[key]}
            for p in ps_l:
                cols[_pcol_name(p)] = pa.array([], pa.float64())
            return pa.table(cols)
        starts = np.flatnonzero(np.concatenate([[True], kp[1:] != kp[:-1]]))
        ends = np.append(starts[1:], len(kp))
        n = ends - starts
        cols = {key: gs[key].combine_chunks().take(
            pa.array(starts, pa.int64()))}
        for p in ps_l:
            idx = starts + np.clip(
                np.ceil(p * n).astype(np.int64) - 1, 0, n - 1)
            cols[_pcol_name(p)] = pa.array(v[idx], pa.float64())
        return pa.table(cols)

    return bucketed_map_groups(sample.drop_columns([_H]), [key], finish)


def approx_quantiles(ds, col: str, ps: Sequence[float], *,
                     id_col: str, k: int = 4096, seed: int = 0):
    """Global approximate quantiles from one deterministic bottom-k
    hash sample (see :func:`grouped_approx_quantiles`): a single-row
    table with a p50-style column per requested p. O(k) memory
    anywhere, one narrow pass + a ≤ k-row merge; exact when the
    dataset has ≤ k rows."""
    _ALL = "__vr_all"

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(_ALL, pa.array(np.zeros(len(t), np.int8)))

    out = grouped_approx_quantiles(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        _ALL, col, ps, id_col=id_col, k=k, seed=seed)
    return out.drop_columns([_ALL])


def grouped_mad_outlier_filter(ds, key: str, col: str, *, k: float = 3.0,
                               keep: str = "inlier",
                               max_keys: int = 1_000_000):
    """Per-KEY robust outlier trim: keep rows with
    ``|x - median_key| <= k * MAD_key`` — the grouped analogue of
    :func:`mad_outlier_filter` (per-service latency trims, per-source
    perplexity bands).

    Two grouped exact-quantile passes (per-key median, then per-key
    median of ``|x - med|`` over a projected scan) produce a
    ``max_keys``-bounded fit table that broadcasts once; apply is one
    stateless map-only ``index_in`` probe (the grouped_standardize
    Arrow-cast vocabulary convention, so boolean/float/null keys can
    never mismatch). Thresholds are data-value medians and one float64
    multiply, so the kept set is bit-reproducible on any partitioning
    and mirrors a SQL ``quantile_disc`` oracle op-for-op. Rows with a
    null score never pass; a key whose scores are ALL null has no fit
    row and its rows never pass either mode.
    """
    if keep not in ("inlier", "outlier"):
        raise ValueError(
            "grouped_mad_outlier_filter: keep must be inlier|outlier")

    med_t = grouped_exact_quantiles(ds, key, col, [0.5],
                                    max_keys=max_keys)
    if med_t is None or len(med_t) == 0:
        return ds.filter(lambda r: False)
    vocab = _probe_str(med_t[key])
    meds = np.asarray(pc.cast(med_t["p50"], pa.float64())
                      .to_numpy(zero_copy_only=False), np.float64)

    def dev(t: pa.Table) -> pa.Table:
        idx = pc.index_in(_probe_str(t[key]), value_set=vocab)
        m = pa.array(meds, pa.float64()).take(idx)
        d = pc.abs(pc.subtract(pc.cast(t[col], pa.float64()), m))
        return pa.table({key: t[key], "__vr_dev": d})

    devs = ds.map_batches(dev, batch_format="pyarrow",
                          zero_copy_batch=True)
    mad_t = grouped_exact_quantiles(devs, key, "__vr_dev", [0.5],
                                    max_keys=max_keys)
    mvocab = _probe_str(mad_t[key])
    mads = np.asarray(pc.cast(mad_t["p50"], pa.float64())
                      .to_numpy(zero_copy_only=False), np.float64)
    thrs = float(k) * mads

    def flt(t: pa.Table) -> pa.Table:
        c = pc.cast(t[col], pa.float64())
        mi = pc.index_in(_probe_str(t[key]), value_set=vocab)
        m = pa.array(meds, pa.float64()).take(mi)
        ti = pc.index_in(_probe_str(t[key]), value_set=mvocab)
        thr = pa.array(thrs, pa.float64()).take(ti)
        inl = pc.less_equal(pc.abs(pc.subtract(c, m)), thr)
        if keep == "outlier":
            inl = pc.invert(inl)
        mask = pc.and_kleene(pc.is_valid(c), inl)
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(flt, batch_format="pyarrow",
                          zero_copy_batch=True)
