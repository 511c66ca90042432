"""Distributed evaluation metrics over scored datasets — the
"calibrate the quality classifier before trusting it to filter 100 TB"
step (pairs with ml/classify.py's NB scorer and ml/lm_score.py's
perplexity: score distributed, then evaluate distributed).

``auc_score`` computes the EXACT ROC-AUC via the rank statistic
(Mann-Whitney U), never materializing rows:

    AUC = [ Σ_s pos(s) · (2·neg_below(s) + neg(s)) ] / (2·P·N)

summed over DISTINCT scores s — the tie-aware trapezoidal AUC. All
arithmetic until the final division is int64, so the result is
bit-reproducible on any cluster shape.

Plan (the stages/rownum.rank_values shape): per-block (score-bits,
pos, neg) count partials → one narrow distinct-score shuffle
(grouped sum) → sort by score → ONE stats row per block gives the
driver the running-neg offsets and per-block partial sums —
O(#blocks) driver state, payloads never move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def auc_score(ds, score_col: str, label_col: str):
    """Exact ROC-AUC of ``score_col`` against the binary ``label_col``
    (bool, or any numeric where nonzero = positive). Rows with a null
    score or label are excluded. Returns a one-row pa.Table
    (auc: double, n_pos: int64, n_neg: int64); ``auc`` is null when
    either class is empty. Ties receive the standard half credit."""
    from vector_ray.stages.aggregate import grouped_aggregate

    _B, _P, _N, _V = "__vr_bits", "__vr_pos", "__vr_neg", "__vr_val"

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({_B: pa.array([], pa.int64()),
                          _P: pa.array([], pa.int64()),
                          _N: pa.array([], pa.int64())})
        mask = pc.and_(pc.is_valid(t[score_col]),
                       pc.is_valid(t[label_col]))
        t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        v = np.asarray(pc.cast(t[score_col], pa.float64())
                       .combine_chunks()
                       .to_numpy(zero_copy_only=False), np.float64)
        v = np.where(v == 0.0, 0.0, v)
        y = np.asarray(pc.cast(pc.cast(t[label_col], pa.bool_()),
                               pa.int64()).combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        bits, inv = np.unique(v.view(np.int64), return_inverse=True)
        pos = np.bincount(inv, weights=y).astype(np.int64)
        neg = np.bincount(inv, weights=1 - y).astype(np.int64)
        return pa.table({_B: pa.array(bits, pa.int64()),
                         _P: pa.array(pos, pa.int64()),
                         _N: pa.array(neg, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    dist = grouped_aggregate(parts, [_B], {_P: ("sum", _P),
                                           _N: ("sum", _N)})

    def add_val(t: pa.Table) -> pa.Table:
        b = np.asarray(t[_B].combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(_V, pa.array(b.view(np.float64)))

    srt = dist.map_batches(add_val, batch_format="pyarrow",
                           zero_copy_batch=True).sort(_V)

    def block_stat(t: pa.Table) -> pa.Table:
        empty = pa.table({_V: pa.array([], pa.float64()),
                          "pos_sum": pa.array([], pa.int64()),
                          "neg_sum": pa.array([], pa.int64()),
                          "local_u2": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        pos = np.asarray(t[_P].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        neg = np.asarray(t[_N].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        cum_below = np.concatenate(([0], np.cumsum(neg[:-1])))
        local = int(np.sum((2 * cum_below + neg) * pos))
        return pa.table({
            _V: t[_V].slice(0, 1).combine_chunks(),
            "pos_sum": pa.array([int(pos.sum())], pa.int64()),
            "neg_sum": pa.array([int(neg.sum())], pa.int64()),
            "local_u2": pa.array([local], pa.int64()),
        })

    stats = srt.map_batches(block_stat, batch_size=None,
                            batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    stats.sort(key=lambda r: r[_V])
    n_pos = sum(r["pos_sum"] for r in stats)
    n_neg = sum(r["neg_sum"] for r in stats)
    u2, base_neg = 0, 0
    for r in stats:
        u2 += 2 * base_neg * r["pos_sum"] + r["local_u2"]
        base_neg += r["neg_sum"]
    auc = (float(u2) / float(2 * n_pos * n_neg)
           if n_pos and n_neg else None)
    return pa.table({"auc": pa.array([auc], pa.float64()),
                     "n_pos": pa.array([n_pos], pa.int64()),
                     "n_neg": pa.array([n_neg], pa.int64())})


def grouped_auc(ds, key: str, score_col: str, label_col: str, *,
                num_buckets: int | None = None):
    """Per-key (sliced) exact ROC-AUC — "is the quality classifier
    calibrated on EVERY language/domain, not just in aggregate". Same
    tie-aware integer rank statistic as :func:`auc_score`, one row per
    key: (key, auc, n_pos, n_neg); ``auc`` null where a key lacks one
    of the classes. Rows with a null key, score or label are excluded.

    Plan: per-block distinct-(key, score) count partials (the only
    shuffle — narrow, pre-aggregated), ONE hash-bucket exchange
    (stages/bucketed), then per-bucket sort + run-segmented vectorized
    prefix sums — O(buckets) Python calls, hot keys stay inside one
    contiguous vectorized run."""
    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    _B, _P, _N, _V = "__vr_bits", "__vr_pos", "__vr_neg", "__vr_val"

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.string()),
                          _B: pa.array([], pa.int64()),
                          _P: pa.array([], pa.int64()),
                          _N: pa.array([], pa.int64())})
        mask = pc.and_(pc.and_(pc.is_valid(t[score_col]),
                               pc.is_valid(t[label_col])),
                       pc.is_valid(t[key]))
        t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        kd = pc.cast(t[key], pa.string()).combine_chunks() \
            .dictionary_encode()
        kcodes = np.asarray(kd.indices.to_numpy(zero_copy_only=False),
                            np.int64)
        v = np.asarray(pc.cast(t[score_col], pa.float64())
                       .combine_chunks()
                       .to_numpy(zero_copy_only=False), np.float64)
        v = np.where(v == 0.0, 0.0, v)
        bits = v.view(np.int64)
        y = np.asarray(pc.cast(pc.cast(t[label_col], pa.bool_()),
                               pa.int64()).combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        pair = np.stack([kcodes, bits], 1)
        u, inv = np.unique(pair, axis=0, return_inverse=True)
        inv = inv.ravel()
        pos = np.bincount(inv, weights=y).astype(np.int64)
        neg = np.bincount(inv, weights=1 - y).astype(np.int64)
        kw = kd.dictionary.take(pa.array(u[:, 0], pa.int64()))
        return pa.table({key: kw, _B: pa.array(u[:, 1], pa.int64()),
                         _P: pa.array(pos, pa.int64()),
                         _N: pa.array(neg, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.string()),
                          "auc": pa.array([], pa.float64()),
                          "n_pos": pa.array([], pa.int64()),
                          "n_neg": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        b = np.asarray(g[_B].combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        g = g.append_column(_V, pa.array(b.view(np.float64)))
        g = g.combine_chunks().sort_by([(key, "ascending"),
                                        (_V, "ascending")])
        pos = np.asarray(g[_P].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        neg = np.asarray(g[_N].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        new_run = _run_starts(g, [key])
        starts = np.flatnonzero(new_run)
        # per-(key,score) totals can repeat across partial blocks:
        # collapse equal (key, score) rows first
        same = ~new_run.copy()
        vals = np.asarray(g[_V].combine_chunks()
                          .to_numpy(zero_copy_only=False), np.float64)
        same[1:] &= vals[1:] == vals[:-1]
        seg = np.flatnonzero(~same)
        pos = np.add.reduceat(pos, seg)
        neg = np.add.reduceat(neg, seg)
        new_run = new_run[seg]
        starts = np.flatnonzero(new_run)
        # exclusive running neg within each key run (sum rebasing)
        cneg = np.cumsum(neg)
        excl = cneg - neg
        base = excl[starts]
        run_id = np.cumsum(new_run) - 1
        excl = excl - base[run_id]
        term = (2 * excl + neg) * pos
        u2 = np.add.reduceat(term, starts)
        p_run = np.add.reduceat(pos, starts)
        n_run = np.add.reduceat(neg, starts)
        # integer product FIRST, one float conversion — matches
        # auc_score's float(u2) / float(2*P*N) rounding exactly
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = u2.astype(np.float64) / \
                (2 * p_run * n_run).astype(np.float64)
        ok = (p_run > 0) & (n_run > 0)
        keys_out = g[key].combine_chunks().take(
            pa.array(seg[starts], pa.int64()))
        return pa.table({
            key: keys_out,
            "auc": pa.array(np.where(ok, auc, np.nan), pa.float64(),
                            mask=~ok),
            "n_pos": pa.array(p_run, pa.int64()),
            "n_neg": pa.array(n_run, pa.int64()),
        })

    return bucketed_map_groups(parts, [key], bucket,
                               num_buckets=num_buckets)


def classification_report(ds, score_col: str, label_col: str,
                          thresholds):
    """Per-threshold confusion counts + precision/recall/F1 for a
    scored binary dataset (predict positive iff score >= threshold).
    Returns a pa.Table with one row per threshold: (threshold, tp, fp,
    fn, tn, precision, recall, f1) — the operating-point companion to
    :func:`auc_score` when picking the filter cutoff for a quality
    classifier. Rows with a null score or label are excluded.

    Counts are exact int64 from one map-only pass (per-block partial
    confusion counts per threshold, one tiny grouped sum — the partial
    is |thresholds| rows per block regardless of data size);
    precision/recall/F1 are single float64 divisions of those integers
    (p = tp/(tp+fp), r = tp/(tp+fn), f1 = 2*tp/(2*tp+fp+fn)), so they
    reproduce an ANSI SQL oracle bit-for-bit. Empty denominators yield
    null."""
    from vector_ray.stages.aggregate import grouped_aggregate

    ths = [float(t) for t in thresholds]
    if not ths:
        raise ValueError("classification_report: thresholds required")
    tharr = np.asarray(ths, np.float64)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "threshold": pa.array([], pa.float64()),
            "tp": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
            "fn": pa.array([], pa.int64()),
            "tn": pa.array([], pa.int64()),
        })
        mask = pc.and_(pc.is_valid(t[score_col]),
                       pc.is_valid(t[label_col]))
        t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        s = np.asarray(pc.cast(t[score_col], pa.float64())
                       .combine_chunks()
                       .to_numpy(zero_copy_only=False), np.float64)
        y = np.asarray(pc.cast(pc.cast(t[label_col], pa.bool_()),
                               pa.int64()).combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64) \
            .astype(bool)
        tp = np.empty(len(tharr), np.int64)
        fp = np.empty(len(tharr), np.int64)
        fn = np.empty(len(tharr), np.int64)
        tn = np.empty(len(tharr), np.int64)
        for i, th in enumerate(tharr):
            pred = s >= th
            tp[i] = int(np.sum(pred & y))
            fp[i] = int(np.sum(pred & ~y))
            fn[i] = int(np.sum(~pred & y))
            tn[i] = int(np.sum(~pred & ~y))
        return pa.table({
            "threshold": pa.array(tharr, pa.float64()),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
            "fn": pa.array(fn, pa.int64()),
            "tn": pa.array(tn, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    summed = grouped_aggregate(parts, ["threshold"], {
        "tp": ("sum", "tp"), "fp": ("sum", "fp"),
        "fn": ("sum", "fn"), "tn": ("sum", "tn")})
    rows = summed.take_all()
    by = {r["threshold"]: r for r in rows}
    out = {"threshold": [], "tp": [], "fp": [], "fn": [], "tn": [],
           "precision": [], "recall": [], "f1": []}
    for th in tharr:
        r = by.get(float(th),
                   {"tp": 0, "fp": 0, "fn": 0, "tn": 0})
        tp, fp_, fn_, tn = (int(r["tp"]), int(r["fp"]),
                            int(r["fn"]), int(r["tn"]))
        out["threshold"].append(float(th))
        out["tp"].append(tp)
        out["fp"].append(fp_)
        out["fn"].append(fn_)
        out["tn"].append(tn)
        out["precision"].append(
            float(tp) / float(tp + fp_) if tp + fp_ else None)
        out["recall"].append(
            float(tp) / float(tp + fn_) if tp + fn_ else None)
        out["f1"].append(
            float(2 * tp) / float(2 * tp + fp_ + fn_)
            if 2 * tp + fp_ + fn_ else None)
    return pa.table({
        "threshold": pa.array(out["threshold"], pa.float64()),
        "tp": pa.array(out["tp"], pa.int64()),
        "fp": pa.array(out["fp"], pa.int64()),
        "fn": pa.array(out["fn"], pa.int64()),
        "tn": pa.array(out["tn"], pa.int64()),
        "precision": pa.array(out["precision"], pa.float64()),
        "recall": pa.array(out["recall"], pa.float64()),
        "f1": pa.array(out["f1"], pa.float64()),
    })


def ks_test(ds_a, ds_b, col: str):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``col`` distributions of two datasets — the distribution-drift
    check between corpus snapshots ("did the new crawl's length /
    perplexity / score distribution shift?"). Returns a one-row
    pa.Table (ks: double, n_a: int64, n_b: int64); ``ks`` is null when
    either side is empty. Nulls are excluded.

    KS = max over distinct observed values v of |F_a(v) − F_b(v)| —
    the exact statistic, not a binned approximation. Plan: per-side
    distinct-value count partials (float64-bit keyed), ONE narrow
    grouped-sum shuffle over the union, sort by value and checkpoint,
    then two O(#blocks)-driver-state passes over the sorted distinct
    table: pass 1 reduces each block to (first value, per-side count
    sums) so the driver knows n_a, n_b and each block's running
    offsets; pass 2 broadcasts those scalars and each block emits its
    LOCAL max of |off_a/n_a + cum_a/n_a − off_b/n_b − cum_b/n_b| —
    one float per block, max'd driver-side. Payloads never move and
    nothing data-sized touches the driver."""
    from vector_ray.stages.aggregate import grouped_aggregate

    _B, _CA, _CB, _V = "__vr_bits", "__vr_ca", "__vr_cb", "__vr_val"

    def partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            empty = pa.table({_B: pa.array([], pa.int64()),
                              _CA: pa.array([], pa.int64()),
                              _CB: pa.array([], pa.int64())})
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = arr.drop_null()
            if len(arr) == 0:
                return empty
            v = np.asarray(pc.cast(arr, pa.float64())
                           .to_numpy(zero_copy_only=False), np.float64)
            v = np.where(v == 0.0, 0.0, v)
            bits, cnt = np.unique(v.view(np.int64), return_counts=True)
            z = np.zeros(len(bits), np.int64)
            c = cnt.astype(np.int64)
            return pa.table({_B: pa.array(bits, pa.int64()),
                             _CA: pa.array(c if side == 0 else z),
                             _CB: pa.array(z if side == 0 else c)})

        return fn

    pa_ = ds_a.map_batches(partial(0), batch_format="pyarrow",
                           zero_copy_batch=True)
    pb_ = ds_b.map_batches(partial(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    dist = grouped_aggregate(pa_.union(pb_), [_B],
                             {_CA: ("sum", _CA), _CB: ("sum", _CB)})

    def add_val(t: pa.Table) -> pa.Table:
        b = np.asarray(t[_B].combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        return t.append_column(_V, pa.array(b.view(np.float64)))

    srt = dist.map_batches(add_val, batch_format="pyarrow",
                           zero_copy_batch=True).sort(_V).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({_V: pa.array([], pa.float64()),
                             "a_sum": pa.array([], pa.int64()),
                             "b_sum": pa.array([], pa.int64())})
        return pa.table({
            _V: t[_V].slice(0, 1).combine_chunks(),
            "a_sum": pa.array([int(pc.sum(t[_CA]).as_py() or 0)],
                              pa.int64()),
            "b_sum": pa.array([int(pc.sum(t[_CB]).as_py() or 0)],
                              pa.int64()),
        })

    stats = srt.map_batches(block_stat, batch_size=None,
                            batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    stats.sort(key=lambda r: r[_V])
    n_a = sum(r["a_sum"] for r in stats)
    n_b = sum(r["b_sum"] for r in stats)
    if n_a == 0 or n_b == 0:
        return pa.table({"ks": pa.array([None], pa.float64()),
                         "n_a": pa.array([n_a], pa.int64()),
                         "n_b": pa.array([n_b], pa.int64())})
    offs, oa, ob = {}, 0, 0
    for r in stats:
        offs[repr(r[_V])] = (oa, ob)
        oa += r["a_sum"]
        ob += r["b_sum"]

    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.float64())})
        base_a, base_b = offs[repr(t[_V][0].as_py())]
        ca = np.asarray(t[_CA].combine_chunks()
                        .to_numpy(zero_copy_only=False), np.int64)
        cb = np.asarray(t[_CB].combine_chunks()
                        .to_numpy(zero_copy_only=False), np.int64)
        cuma = base_a + np.cumsum(ca)
        cumb = base_b + np.cumsum(cb)
        d = np.abs(cuma.astype(np.float64) / float(n_a)
                   - cumb.astype(np.float64) / float(n_b))
        return pa.table({"m": pa.array([float(d.max())], pa.float64())})

    maxes = srt.map_batches(block_max, batch_size=None,
                            batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    ks = max((r["m"] for r in maxes), default=0.0)
    return pa.table({"ks": pa.array([ks], pa.float64()),
                     "n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64())})


def chi2_drift(ds_a, ds_b, col: str):
    """Two-sample chi-square homogeneity statistic over a CATEGORICAL
    column — the drift check for discrete distributions (language mix,
    source mix, label balance) next to :func:`ks_test`'s continuous
    one. Returns a one-row pa.Table (chi2: double, dof: int64,
    n_a: int64, n_b: int64); chi2 is null when either side is empty or
    there are fewer than 2 categories. Null categories are excluded.

        E_side(i) = tot(i) · n_side / N
        chi2      = Σ_i Σ_side (c_side(i) − E_side(i))² / E_side(i)
        dof       = #categories − 1

    All counts are exact int64 (per-side value_counts partials, one
    narrow grouped-sum shuffle); the statistic evaluates driver-side
    over the O(#categories) count table in one fixed float64
    expression order with categories SORTED BY NAME, so an independent
    mirror reproducing the same order is bit-identical."""
    from vector_ray.stages.aggregate import grouped_aggregate

    _CA, _CB = "__vr_ca", "__vr_cb"

    def partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            empty = pa.table({col: pa.array([], pa.string()),
                              _CA: pa.array([], pa.int64()),
                              _CB: pa.array([], pa.int64())})
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = pc.cast(arr, pa.string()).drop_null()
            if len(arr) == 0:
                return empty
            vc = arr.value_counts()
            c = pc.cast(vc.field("counts"), pa.int64())
            z = pa.array(np.zeros(len(vc), np.int64))
            return pa.table({col: vc.field("values"),
                             _CA: c if side == 0 else z,
                             _CB: z if side == 0 else c})

        return fn

    pa_ = ds_a.map_batches(partial(0), batch_format="pyarrow",
                           zero_copy_batch=True)
    pb_ = ds_b.map_batches(partial(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    counts = grouped_aggregate(pa_.union(pb_), [col],
                               {_CA: ("sum", _CA), _CB: ("sum", _CB)})
    rows = counts.take_all()
    # fixed category order (sorted by name) pins the float summation
    # order so the independent mirror is bit-identical
    rows.sort(key=lambda r: r[col])
    ca = np.array([r[_CA] for r in rows], np.int64)
    cb = np.array([r[_CB] for r in rows], np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    k = len(rows)
    if n_a == 0 or n_b == 0 or k < 2:
        chi2 = None
    else:
        n = float(n_a + n_b)
        tot = (ca + cb).astype(np.float64)
        ea = tot * float(n_a) / n
        eb = tot * float(n_b) / n
        da = ca.astype(np.float64) - ea
        db = cb.astype(np.float64) - eb
        chi2 = float(np.sum(da * da / ea) + np.sum(db * db / eb))
    return pa.table({"chi2": pa.array([chi2], pa.float64()),
                     "dof": pa.array([max(k - 1, 0)], pa.int64()),
                     "n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64())})


def psi_drift(ds_a, ds_b, col: str, *, eps: float = 1e-4):
    """Population Stability Index between the categorical ``col``
    distributions of two datasets — the ML-ops drift score that
    completes the family (:func:`ks_test` continuous, :func:`chi2_drift`
    significance, PSI effect size; rule of thumb: <0.1 stable, >0.25
    shifted). Returns a one-row pa.Table (psi: double, n_a: int64,
    n_b: int64); null when either side is empty.

        PSI = Σ_i (p_a(i) − p_b(i)) · ln(p_a(i) / p_b(i))

    over the union of observed categories, with zero proportions
    floored at ``eps`` (the standard guard — PSI is undefined at 0).
    Exact int64 counts via the chi2_drift plan (per-side value_counts
    partials, one narrow union shuffle); the float evaluation runs
    driver-side over the name-sorted category table in one fixed
    numpy expression order, so an independent mirror reproducing that
    order is bit-identical (array np.log, same shape)."""
    from vector_ray.stages.aggregate import grouped_aggregate

    _CA, _CB = "__vr_ca", "__vr_cb"

    def partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            empty = pa.table({col: pa.array([], pa.string()),
                              _CA: pa.array([], pa.int64()),
                              _CB: pa.array([], pa.int64())})
            arr = t[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            arr = pc.cast(arr, pa.string()).drop_null()
            if len(arr) == 0:
                return empty
            vc = arr.value_counts()
            c = pc.cast(vc.field("counts"), pa.int64())
            z = pa.array(np.zeros(len(vc), np.int64))
            return pa.table({col: vc.field("values"),
                             _CA: c if side == 0 else z,
                             _CB: z if side == 0 else c})

        return fn

    pa_ = ds_a.map_batches(partial(0), batch_format="pyarrow",
                           zero_copy_batch=True)
    pb_ = ds_b.map_batches(partial(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    counts = grouped_aggregate(pa_.union(pb_), [col],
                               {_CA: ("sum", _CA), _CB: ("sum", _CB)})
    rows = counts.take_all()
    rows.sort(key=lambda r: r[col])
    ca = np.array([r[_CA] for r in rows], np.int64)
    cb = np.array([r[_CB] for r in rows], np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        psi = None
    else:
        pa_p = np.maximum(ca.astype(np.float64) / float(n_a), eps)
        pb_p = np.maximum(cb.astype(np.float64) / float(n_b), eps)
        psi = float(np.sum((pa_p - pb_p) * np.log(pa_p / pb_p)))
    return pa.table({"psi": pa.array([psi], pa.float64()),
                     "n_a": pa.array([n_a], pa.int64()),
                     "n_b": pa.array([n_b], pa.int64())})
