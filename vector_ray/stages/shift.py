"""Per-key ordered window functions — SQL ``LAG/LEAD/SUM(...) OVER
(PARTITION BY key ORDER BY order_by)`` — the sequential-context
operators (previous event, next event, running total, per-key row
rank) the reference's stateful stream transforms get for free from
arrival order and a batch engine must reconstruct.

Plan: ONE hash-bucket shuffle on the partition key
(stages/bucketed.bucketed_map_groups), then each bucket is sorted by
(keys..., order_by...) ONCE and every window column is computed
vectorized over the contiguous per-key runs (shifted gathers masked at
run boundaries, cumsum rebased per run) — O(buckets) Python calls,
never one per key, keys with any cardinality/skew handled because the
per-bucket work is a flat sort + numpy passes.

Functions: ``lag``/``lead`` (offset 1, null at run edges), ``delta``
(value - lag, null on first row of a key), ``cumsum`` (inclusive
running sum), ``row_number`` (1-based within key, in order_by order),
``rolling_sum`` (spec ``("rolling_sum", col, N)`` — inclusive trailing
N-row window, clamped at the key start; SQL ``ROWS BETWEEN N-1
PRECEDING AND CURRENT ROW``), ``rate`` (counter-reset-aware delta: a decrease emits the
post-reset value), ``rank``/``dense_rank``/``percent_rank``
/``cume_dist`` (ANSI tie semantics over the ``order_by`` values; col
ignored), ``ntile`` (spec ``("ntile", None, N)``), ``nth_value``
(spec ``("nth_value", col, n)``), ``first_value``/``last_value``
(over the WHOLE key partition, i.e. SQL's ``ROWS BETWEEN UNBOUNDED
PRECEDING AND UNBOUNDED FOLLOWING`` frame), and VALUE-based trailing
windows ``rolling_sum_range``/``rolling_count_range`` (spec
``(fn, col, win)`` — SQL ``RANGE BETWEEN win PRECEDING AND CURRENT
ROW`` over the first ``order_by`` column incl. the later-peers rule;
integer order columns band exactly through int64, one global
searchsorted per bucket), and ``ewma`` (spec ``("ewma", col, alpha)``
— per-key exponential moving average y_i = α·x_i + (1−α)·y_{i−1},
y_0 = x_0, i.e. pandas ``ewm(alpha).mean(adjust=False)``; vectorized
via w^{-p} rescaling over run-relative chunks in a (runs × L)
rectangle so each key's float sequence is bit-identical on any
partitioning/bucket mix; nulls poison the key from their position on).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import pyarrow as pa

from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups


def _shift_bucket(g: pa.Table, keys, order_by, specs) -> pa.Table:
    if len(g) == 0:
        return g
    g = g.combine_chunks().sort_by(
        [(k, "ascending") for k in list(keys) + list(order_by)])
    new_run = _run_starts(g, keys)
    n = len(g)
    starts = np.nonzero(new_run)[0]
    run_id = np.cumsum(new_run) - 1
    idx = np.arange(n, dtype=np.int64)
    for out, spec in specs.items():
        fn, col = spec[0], spec[1]
        win = spec[2] if len(spec) > 2 else None
        v = g[col].combine_chunks() if col else None
        if fn == "lag":
            take = pa.array(np.maximum(idx - 1, 0), pa.int64())
            g = g.append_column(out, _mask(v.take(take), new_run))
        elif fn == "lead":
            last = np.zeros(n, bool)
            last[-1] = True
            last[:-1] = new_run[1:]
            take = pa.array(np.minimum(idx + 1, n - 1), pa.int64())
            g = g.append_column(out, _mask(v.take(take), last))
        elif fn == "delta":
            import pyarrow.compute as pc

            take = pa.array(np.maximum(idx - 1, 0), pa.int64())
            g = g.append_column(
                out, pc.subtract(v, _mask(v.take(take), new_run)))
        elif fn == "rate":
            # counter-reset-aware delta (monotonic-counter rate): x −
            # lag(x), except a DECREASE means the counter reset and the
            # increment since reset is the current value itself. First
            # row of a key → null (kleene: null delta stays null).
            import pyarrow.compute as pc

            take = pa.array(np.maximum(idx - 1, 0), pa.int64())
            d = pc.subtract(v, _mask(v.take(take), new_run))
            g = g.append_column(
                out, pc.if_else(pc.less(d, 0), v, d))
        elif fn == "cumsum":
            x = np.asarray(v.to_numpy(zero_copy_only=False))
            cs = np.cumsum(x)
            base = np.concatenate(([0], cs))[starts]  # sum before run
            g = g.append_column(out, pa.array(
                cs - np.repeat(base, np.diff(np.append(starts, n)))))
        elif fn == "rolling_sum":
            # inclusive trailing window of `win` rows, clamped at the
            # run start: cs[i] - cs[max(i-win, run_start)-1]
            x = np.asarray(v.to_numpy(zero_copy_only=False))
            cs = np.concatenate(([0], np.cumsum(x)))
            run_start = np.repeat(starts, np.diff(np.append(starts, n)))
            lo = np.maximum(idx - int(win) + 1, run_start)
            g = g.append_column(out, pa.array(cs[idx + 1] - cs[lo]))
        elif fn in ("rolling_sum_range", "rolling_count_range"):
            # VALUE-based trailing window (SQL RANGE BETWEEN win
            # PRECEDING AND CURRENT ROW) over the FIRST order_by
            # column, which must be numeric (timestamps: pass the
            # int64 epoch). Vectorized across every run at once: the
            # order values are sorted within each run, so shifting
            # each run onto its own non-overlapping numeric band
            # (+ run_id * span) makes the whole bucket globally
            # sorted and ONE searchsorted finds every window start.
            o_arr = g[order_by[0]].combine_chunks()
            if pa.types.is_timestamp(o_arr.type) or pa.types.is_date(o_arr.type):
                o_arr = o_arr.cast(pa.int64())
            o = np.asarray(o_arr.to_numpy(zero_copy_only=False))
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            if np.issubdtype(o.dtype, np.integer):
                # exact int64 banding; rebase to min so span * #runs
                # stays far from overflow for any realistic bucket
                o = o.astype(np.int64) - int(o.min())
                span = int(o.max()) + int(win) + 1
                if span * (int(run_id[-1]) + 1) >= 2**62:
                    raise ValueError(
                        "rolling range window: order range x runs "
                        "exceeds int64 banding capacity")
                shifted = o + run_id * span
                lo = np.searchsorted(shifted, shifted - int(win),
                                     side="left")
            else:
                o = o.astype(np.float64)
                span = (np.max(o) - np.min(o)) + float(win) + 1.0
                shifted = o + run_id * span
                lo = np.searchsorted(shifted, shifted - float(win),
                                     side="left")
            lo = np.maximum(lo, run_start)
            # ANSI RANGE frames end at the LAST PEER of the current
            # row (ties in the order value), not at the row itself
            hi = np.searchsorted(shifted, shifted, side="right")
            if fn == "rolling_count_range":
                g = g.append_column(out, pa.array(hi - lo, pa.int64()))
            else:
                x = np.asarray(v.to_numpy(zero_copy_only=False))
                cs = np.concatenate(([0], np.cumsum(x)))
                g = g.append_column(out, pa.array(cs[hi] - cs[lo]))
        elif fn == "ewma":
            # exponential moving average, recurrence y_i = α·x_i +
            # (1−α)·y_{i−1} with y_0 = x_0 (pandas ewm adjust=False).
            # Vectorized via the w^{-p} rescaling trick, processed in
            # run-relative CHUNKS laid out as a (runs × L) rectangle so
            # each run's cumsum is a self-contained axis-1 pass —
            # per-key results are bit-identical whatever other keys
            # share the bucket (trailing zero padding adds exactly 0.0),
            # which keeps the op golden-mirrorable per key. L bounds
            # w^{-p} ≤ 1e100 so the rescaling never overflows; loop
            # count is ceil(longest_run / L) — never per key.
            alpha = float(win)
            w = 1.0 - alpha
            x = np.asarray(v.to_numpy(zero_copy_only=False), np.float64)
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            pos = idx - run_start
            if w <= 0.0:  # α=1: y = x
                y = x.copy()
            elif w >= 1.0:  # α=0: y = first value of the run
                y = x[run_start]
            else:
                L = int(min(256, max(1, np.floor(230.0 / -np.log(w)))))
                nruns = len(starts)
                carry = np.zeros(nruns, np.float64)
                y = np.empty(n, np.float64)
                pw = w ** -np.arange(L, dtype=np.float64)  # w^{-p}
                pwin = w ** np.arange(L, dtype=np.float64)  # w^{+p}
                kmax = int(np.ceil(run_len.max() / L))
                for kk in range(kmax):
                    sel = np.nonzero((pos >= kk * L)
                                     & (pos < (kk + 1) * L))[0]
                    if not len(sel):
                        break
                    p = pos[sel] - kk * L
                    rid_sel = run_id[sel]
                    active = np.unique(rid_sel)
                    rix = np.searchsorted(active, rid_sel)
                    tm = np.zeros((len(active), L), np.float64)
                    tm[rix, p] = alpha * x[sel] * pw[p]
                    if kk == 0:
                        tm[rix[p == 0], 0] = x[sel[p == 0]]
                    else:
                        f = p == 0
                        tm[rix[f], 0] = (alpha * x[sel[f]]
                                         + w * carry[rid_sel[f]])
                    um = np.cumsum(tm, axis=1)
                    y[sel] = um[rix, p] * pwin[p]
                    lastp = np.minimum(run_len[active] - 1 - kk * L,
                                       L - 1)
                    carry[active] = (um[np.arange(len(active)), lastp]
                                     * pwin[lastp])
            g = g.append_column(out, pa.array(y))
        elif fn == "ffill":
            # last non-null value at-or-before each row within the key
            # run (SQL last_value(x IGNORE NULLS) OVER (... ROWS
            # UNBOUNDED PRECEDING)): vectorized index carry via
            # maximum.accumulate, reset at run boundaries; rows before
            # a run's first non-null stay null (null take-index)
            import pyarrow.compute as pc

            valid = np.asarray(pc.is_valid(v).to_numpy(zero_copy_only=False))
            run_start = np.repeat(starts, np.diff(np.append(starts, n)))
            carry = np.maximum.accumulate(np.where(valid, idx, -1))
            ok = carry >= run_start
            take = pa.array(np.where(ok, carry, 0), pa.int64(), mask=~ok)
            g = g.append_column(out, v.take(take))
        elif fn == "bfill":
            # mirror of ffill: first non-null at-or-after each row
            # within the key run (reversed index carry)
            import pyarrow.compute as pc

            valid = np.asarray(pc.is_valid(v).to_numpy(zero_copy_only=False))
            run_len = np.diff(np.append(starts, n))
            run_end = np.repeat(starts + run_len - 1, run_len)
            rcarry = np.minimum.accumulate(
                np.where(valid, idx, n)[::-1])[::-1]
            ok = rcarry <= run_end
            take = pa.array(np.where(ok, rcarry, 0), pa.int64(), mask=~ok)
            g = g.append_column(out, v.take(take))
        elif fn == "row_number":
            g = g.append_column(out, pa.array(
                idx - np.repeat(starts, np.diff(np.append(starts, n))) + 1,
                pa.int64()))
        elif fn in ("rank", "dense_rank", "percent_rank"):
            # tie groups: first row of each distinct order_by value
            # within a key run (both masks from the same run-boundary
            # helper, so this stays one vectorized pass)
            new_val = _run_starts(g, list(keys) + list(order_by))
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            if fn == "dense_rank":
                cnv = np.cumsum(new_val)
                g = g.append_column(out, pa.array(
                    cnv - cnv[run_start] + 1, pa.int64()))
            else:
                tie_idx = np.nonzero(new_val)[0]
                tie_start = np.repeat(tie_idx,
                                      np.diff(np.append(tie_idx, n)))
                rank = tie_start - run_start + 1
                if fn == "rank":
                    g = g.append_column(out, pa.array(rank, pa.int64()))
                else:  # percent_rank = (rank-1)/(run_len-1), 0 if len 1
                    rl = np.repeat(run_len, run_len)
                    pr = (rank - 1) / np.maximum(rl - 1, 1)
                    pr[rl == 1] = 0.0
                    g = g.append_column(out, pa.array(pr, pa.float64()))
        elif fn == "cume_dist":
            # ANSI CUME_DIST: rows with order value <= current, over the
            # partition size — i.e. (exclusive end of the tie group -
            # run start) / run_len, all from the same boundary masks
            new_val = _run_starts(g, list(keys) + list(order_by))
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            tie_idx = np.nonzero(new_val)[0]
            tie_len = np.diff(np.append(tie_idx, n))
            tie_end = np.repeat(tie_idx + tie_len, tie_len)  # exclusive
            g = g.append_column(out, pa.array(
                (tie_end - run_start) / np.repeat(run_len, run_len),
                pa.float64()))
        elif fn == "nth_value":
            # value of the win-th row (1-based) of the WHOLE partition
            # frame; null when the partition has fewer rows
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            rl = np.repeat(run_len, run_len)
            ok = rl >= int(win)
            take = pa.array(
                np.where(ok, run_start + int(win) - 1, 0), pa.int64(),
                mask=~ok)
            g = g.append_column(out, v.take(take))
        elif fn == "ntile":
            # ANSI NTILE(N): earlier tiles take the extra rows;
            # tile = floor(pos*N/run_len)+1 reproduces that exactly
            run_len = np.diff(np.append(starts, n))
            run_start = np.repeat(starts, run_len)
            pos = idx - run_start
            rl = np.repeat(run_len, run_len)
            g = g.append_column(out, pa.array(
                (pos * int(win)) // rl + 1, pa.int64()))
        elif fn in ("first_value", "last_value"):
            run_len = np.diff(np.append(starts, n))
            if fn == "first_value":
                take = np.repeat(starts, run_len)
            else:
                take = np.repeat(np.append(starts[1:], n) - 1, run_len)
            g = g.append_column(out, v.take(pa.array(take, pa.int64())))
        else:
            raise ValueError(f"unknown window fn {fn!r}")
    return g


def _mask(vals: pa.Array | pa.ChunkedArray, null_mask: np.ndarray):
    """vals with positions where null_mask is True replaced by null."""
    import pyarrow.compute as pc

    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    return pc.if_else(pa.array(~null_mask), vals,
                      pa.scalar(None, vals.type))


def partitioned_shift(ds, keys: Sequence[str], order_by: Sequence[str],
                      specs: Dict[str, Tuple[str, str]], *,
                      num_buckets=None):
    """Append window columns per ``specs``: out_col → (fn, col); fn ∈
    {lag, lead, delta, cumsum, rolling_sum, ffill, bfill, row_number,
    rank, dense_rank, percent_rank, cume_dist, ntile, nth_value,
    first_value, last_value} (col ignored for row_number — pass any
    column or None; ``("nth_value", col, n)`` takes the 1-based n-th
    row of the whole partition). ``order_by`` should be unique per key
    for deterministic results."""
    keys = list(keys)
    order_by = list(order_by)
    specs = {o: tuple(v) for o, v in specs.items()}
    return bucketed_map_groups(
        ds, keys, lambda g: _shift_bucket(g, keys, order_by, specs),
        num_buckets=num_buckets)
