"""Feature-engineering primitives over numeric columns — the
fit-then-transform pair every training-data pipeline needs before
numeric features reach a model: ``standardize`` (z-score) and
``bucketize`` (equal-width / equal-frequency discretization).

Both are fit-broadcast-map plans: ONE streaming scan reduces the
fitted statistics to O(1) driver state (moment partials / min-max /
quantile cut points), then a map-only pass applies them per batch —
nothing shuffles, payloads never move, and the transform composes
with any downstream stage.

Determinism notes (what makes these hash-gateable):
- standardize moments are float64 (Σx, Σx²) partials — EXACT (hence
  order-independent) whenever the column is integer-valued below
  2^53, the common case for counts/quantities; the final formula
  (x − Σx/n) / sqrt((Σx² − (Σx)²/n)/(n−1)) is mirrored verbatim in
  the SQL oracle so every IEEE op matches.
- bucketize "width" uses the quantile machinery's bin formula
  floor((x − lo) · (nb / (hi − lo))) (stages/quantile._row_bins — the
  count and transform scans can never disagree); "quantile" cut
  points are actual data values from stages/quantile.exact_quantiles
  (quantile_disc rank rule), so bin edges compare exactly — no float
  reconstruction anywhere.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _f64(t: pa.Table, col: str) -> np.ndarray:
    a = pc.cast(t[col], pa.float64()).combine_chunks()
    return np.asarray(a.to_numpy(zero_copy_only=False))


def standardize(ds, cols: Sequence[str], *, suffix: str = "_z",
                ddof: int = 1):
    """Append ``<col><suffix>: float64`` z-scores for each column.
    One moment scan (n, Σx, Σx² per column — a 3·len(cols)-value
    partial per block), then a map-only transform. Null inputs stay
    null; a zero-variance column yields nulls (no 0/0)."""
    cols = list(cols)

    def part(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = _f64(t, c)
            m = ~np.isnan(v)
            out[f"n_{c}"] = pa.array([int(m.sum())], pa.int64())
            out[f"sx_{c}"] = pa.array([float(v[m].sum())], pa.float64())
            out[f"sxx_{c}"] = pa.array([float((v[m] * v[m]).sum())],
                                       pa.float64())
        return pa.table(out)

    rows = ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    stats = {}
    for c in cols:
        n = sum(r[f"n_{c}"] for r in rows)
        sx = sum(r[f"sx_{c}"] for r in rows)
        sxx = sum(r[f"sxx_{c}"] for r in rows)
        if n >= 2:
            mu = sx / n
            var = (sxx - sx * sx / n) / (n - ddof)
            sd = float(np.sqrt(var)) if var > 0 else None
        else:
            mu, sd = (sx / n if n else None), None
        stats[c] = (mu, sd)

    def transform(t: pa.Table) -> pa.Table:
        for c in cols:
            mu, sd = stats[c]
            if sd is None:
                z = pa.array([None] * len(t), pa.float64())
            else:
                v = _f64(t, c)
                z = pa.array((v - mu) / sd, pa.float64(),
                             mask=np.isnan(v))
            t = t.append_column(c + suffix, z)
        return t

    return ds.map_batches(transform, batch_format="pyarrow",
                          zero_copy_batch=True)


def minmax_scale(ds, col: str, *, suffix: str = "_mm"):
    """Append ``<col><suffix>`` = (x − min)/(max − min) ∈ [0, 1] from
    one exact min/max scan (stages/quantile._stats_scan); constant
    columns yield nulls. Same IEEE op order as the SQL mirror."""
    from vector_ray.stages.quantile import _stats_scan

    n, lo, hi = _stats_scan(ds, col)
    span = hi - lo

    def tf(t: pa.Table) -> pa.Table:
        v = _f64(t, col)
        if span > 0:
            out = pa.array((v - lo) / span, pa.float64(),
                           mask=np.isnan(v))
        else:
            out = pa.array([None] * len(t), pa.float64())
        return t.append_column(col + suffix, out)

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_standardize(ds, keys, col: str, *, suffix: str = "_z",
                        ddof: int = 1, max_keys: int = 1_000_000):
    """Per-KEY z-score — normalize each series against its own mean
    and stddev (the anomaly-scoring step of a metrics pipeline). Fit
    is one grouped (n, Σx, Σx²) scan (stages/aggregate two-phase
    partials, result bounded by the key count — hard error past
    ``max_keys``); apply is a map-only vectorized index_in probe of
    the broadcast per-key (μ, σ) table. Exact for integer-valued
    columns; single-row or zero-variance keys yield null."""
    from vector_ray.stages.aggregate import grouped_aggregate

    keys = list(keys)
    if len(keys) != 1:
        raise ValueError("grouped_standardize: exactly one key column")
    key = keys[0]

    from vector_ray.stages.quantile import _probe_str

    def _collect(dset) -> pa.Table:
        # take_batch(pyarrow) streams the (max_keys-bounded) aggregate
        # into one Arrow table; to_arrow_refs() costs a full
        # materialize() — ~2x this whole stage's time at sf0.1.
        try:
            t = dset.take_batch(max_keys + 1, batch_format="pyarrow")
        except ValueError as e:
            if "empty" in str(e).lower():
                return None
            raise
        return t.combine_chunks()

    st = _collect(grouped_aggregate(ds, [key], {
        "n": ("count", col), "sx": ("sum", col)}))
    # second moment via a projected scan (sum of squares)
    def sq(t: pa.Table) -> pa.Table:
        v = pc.cast(t[col], pa.float64())
        return pa.table({key: t[key], "xx": pc.multiply(v, v)})

    st2 = _collect(grouped_aggregate(
        ds.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True),
        [key], {"sxx": ("sum", "xx")}))
    if st is not None and len(st) > max_keys:
        raise ValueError(
            f"grouped_standardize: {len(st)} keys (> max_keys)")
    if st is None:
        vocab = pa.array([], pa.string())
        mu_arr = pa.array([], pa.float64())
        sd_arr = pa.array([], pa.float64())
    else:
        # Probe vocabulary built from the ARROW key values themselves
        # (cast-to-string + null sentinel, quantile._probe_str) so the
        # fit-side and apply-side serializations can never disagree —
        # Python str(k) diverges from Arrow cast for booleans
        # ('True' vs 'true'), some floats, and a null key ('None').
        vocab = _probe_str(st[key])
        sxx = st2["sxx"].take(
            pc.index_in(vocab, _probe_str(st2[key])))
        n = st["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = pc.cast(st["sx"], pa.float64()).to_numpy(
            zero_copy_only=False)
        sxx_np = pc.cast(sxx, pa.float64()).to_numpy(
            zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mu = np.where(n > 0, sx / n, np.nan)
            var = np.where(n >= 2,
                           (sxx_np - sx * sx / np.maximum(n, 1))
                           / np.maximum(n - ddof, 1e-300), np.nan)
        sd = np.sqrt(np.where(var > 0, var, np.nan))
        mu_arr = pa.array(mu, pa.float64(), mask=~np.isfinite(mu))
        sd_arr = pa.array(sd, pa.float64(), mask=~np.isfinite(sd))

    def tf(t: pa.Table) -> pa.Table:
        idx = pc.index_in(_probe_str(t[key]), vocab)
        mu = mu_arr.take(idx)
        sd = sd_arr.take(idx)
        v = pc.cast(t[col], pa.float64())
        z = pc.divide(pc.subtract(v, mu), sd)
        return t.append_column(col + suffix, z)

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def robust_scale(ds, col: str, *, suffix: str = "_r"):
    """Append ``<col><suffix>`` = (x − median)/IQR — the
    outlier-insensitive sibling of :func:`standardize`. Median and the
    25/75 quartiles are actual data values from
    stages/quantile.exact_quantiles (quantile_disc rank rule), so the
    only float arithmetic is the mirrored (x − med)/(q3 − q1); a zero
    IQR yields nulls."""
    from vector_ray.stages.quantile import exact_quantiles

    q1, med, q3 = exact_quantiles(ds, col, [0.25, 0.5, 0.75])
    # empty / all-null column: quantiles are None — degrade to an
    # all-null output column (minmax_scale's constant-column behavior)
    iqr = (q3 - q1) if (q1 is not None and q3 is not None) else 0.0

    def tf(t: pa.Table) -> pa.Table:
        v = _f64(t, col)
        if iqr > 0:
            out = pa.array((v - med) / iqr, pa.float64(),
                           mask=np.isnan(v))
        else:
            out = pa.array([None] * len(t), pa.float64())
        return t.append_column(col + suffix, out)

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def one_hot(ds, col: str, *, max_categories: int = 64,
            prefix: str | None = None):
    """One-hot encode a categorical column: fit = one distinct scan
    (per-batch unique partials, driver keeps the sorted vocabulary,
    hard error beyond ``max_categories`` — one-hot is for bounded
    vocabularies; hash or target-encode anything wider), transform =
    map-only 0/1 int64 columns ``<prefix>_<value>`` in sorted-value
    order. Nulls encode as all-zeros."""
    pre = prefix if prefix is not None else col

    def uniq(t: pa.Table) -> pa.Table:
        u = pc.unique(pc.cast(t[col], pa.string()))
        u = u.filter(pc.is_valid(u))
        if len(u) > max_categories:
            # fail INSIDE the task: a single over-wide batch must not
            # ship batches x max_categories rows to the driver first
            raise ValueError(
                f"one_hot: {col!r} exceeds max_categories="
                f"{max_categories} within one batch ({len(u)} distinct)")
        return pa.table({"v": u})

    vals = sorted({r["v"] for r in ds.map_batches(
        uniq, batch_format="pyarrow", zero_copy_batch=True).take_all()})
    if len(vals) > max_categories:
        raise ValueError(
            f"one_hot: {col!r} has {len(vals)} categories "
            f"(> max_categories={max_categories})")

    def tf(t: pa.Table) -> pa.Table:
        s = pc.cast(t[col], pa.string())
        for v in vals:
            hit = pc.cast(pc.fill_null(pc.equal(s, v), False),
                          pa.int64())
            t = t.append_column(f"{pre}_{v}", hit)
        return t

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def target_encode(ds, col: str, target: str, *, smoothing: float = 0.0,
                  max_categories: int = 100_000, out: str | None = None):
    """Target (mean) encoding: each category maps to the smoothed mean
    of ``target`` — enc(c) = (Σ_target(c) + smoothing·global_mean) /
    (n(c) + smoothing). Fit is one grouped (Σ, n) scan whose result is
    bounded by the category count (hard error past
    ``max_categories``); transform is a map-only dictionary probe.
    Exact (hence hash-gateable) when the target is integer-valued;
    unseen/null categories get the global mean."""
    from vector_ray.stages.aggregate import grouped_aggregate

    if out is None:
        out = col + "_te"

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.cast(t[col], pa.string()),
                         target: pc.cast(t[target], pa.float64())})

    stats = grouped_aggregate(
        ds.map_batches(proj, batch_format="pyarrow",
                       zero_copy_batch=True),
        [col], {"s": ("sum", target), "n": ("count", target)}).take_all()
    if len(stats) > max_categories:
        raise ValueError(
            f"target_encode: {col!r} has {len(stats)} categories "
            f"(> max_categories={max_categories})")
    # r["s"] is None when every target value in the category is null
    # (grouped sum of no valid rows) — coalesce to 0.0 so the smoothed
    # mean doesn't TypeError on None + float; n is 0 for such
    # categories, so with smoothing they encode to the global mean.
    gs = sum(r["s"] or 0.0 for r in stats)
    gn = sum(r["n"] for r in stats)
    gmean = gs / gn if gn else 0.0
    enc = {r[col]: ((r["s"] or 0.0) + smoothing * gmean)
           / (r["n"] + smoothing)
           if (r["n"] + smoothing) > 0 else gmean
           for r in stats if r[col] is not None}

    vocab = pa.array(list(enc.keys()), pa.string())
    codes = pa.array(list(enc.values()), pa.float64())

    def tf(t: pa.Table) -> pa.Table:
        # vectorized dictionary probe: index_in + take, miss → gmean
        idx = pc.index_in(pc.cast(t[col], pa.string()), vocab)
        vals = pc.fill_null(codes.take(idx), gmean)
        return t.append_column(out, vals)

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize(ds, col: str, *, p_lo: float = 0.01, p_hi: float = 0.99,
              suffix: str = "_w"):
    """Append ``<col><suffix>``: the column clipped at its p_lo / p_hi
    quantiles (outlier capping before standardize). The cut points are
    actual data values from stages/quantile.exact_quantiles
    (quantile_disc rank rule), so the clip compares exactly — no float
    reconstruction. One refinement scan fits, then map-only."""
    from vector_ray.stages.quantile import exact_quantiles

    lo, hi = exact_quantiles(ds, col, [p_lo, p_hi])

    def tf(t: pa.Table) -> pa.Table:
        v = _f64(t, col)
        if lo is None or hi is None:
            # empty / all-null column: no cut points — all-null output
            return t.append_column(
                col + suffix, pa.array([None] * len(t), pa.float64()))
        return t.append_column(
            col + suffix,
            pa.array(np.clip(v, lo, hi), pa.float64(),
                     mask=np.isnan(v)))

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)


def bucketize(ds, col: str, *, bins: int = 10, mode: str = "width",
              out: str | None = None):
    """Append ``out`` (default ``<col>_bin``) int64 in [0, bins).

    mode="width": equal-width bins over the observed [min, max]
    (floor((x − lo) · bins/(hi − lo)), top edge clipped into the last
    bin — the quantile machinery's formula).
    mode="quantile": equal-frequency bins — cut points are the
    j/bins-quantiles (quantile_disc rank rule, actual data values);
    bin = #cuts < x, so ties sit with the lower bin exactly like a
    ``x > cut`` CASE ladder. Nulls stay null."""
    if out is None:
        out = col + "_bin"
    nb = int(bins)

    if mode == "width":
        from vector_ray.stages.quantile import _row_bins, _stats_scan

        n, lo, hi = _stats_scan(ds, col)

        def tf(t: pa.Table) -> pa.Table:
            v = _f64(t, col)
            b = _row_bins(v, np.full(len(v), lo), np.full(len(v), hi),
                          nb)
            return t.append_column(
                out, pa.array(b, pa.int64(), mask=np.isnan(v)))

    elif mode == "quantile":
        from vector_ray.stages.quantile import exact_quantiles

        cuts = exact_quantiles(ds, col, [j / nb for j in range(1, nb)])
        cuts_arr = np.asarray([c for c in cuts if c is not None],
                              np.float64)

        def tf(t: pa.Table) -> pa.Table:
            v = _f64(t, col)
            b = np.searchsorted(cuts_arr, v, side="left")
            return t.append_column(
                out, pa.array(b.astype(np.int64), pa.int64(),
                              mask=np.isnan(v)))

    else:
        raise ValueError(f"bucketize: unknown mode={mode!r}")

    return ds.map_batches(tf, batch_format="pyarrow",
                          zero_copy_batch=True)
