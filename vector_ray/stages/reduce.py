"""Reduce — src/transforms/reduce/mod.rs:221-257 with the per-field
merge strategies of reduce/merge_strategy.rs:9-21:

  discard retain sum max min array concat concat_newline
  shortest_array longest_array flat_unique

Batch semantics: the reference closes a group on ``ends_when`` /
``starts_when`` conditions or staleness, and final-flushes everything at
stream end (reduce/mod.rs:204-208). In batch, with no timers, a group =
all rows with the same ``group_by`` key between boundary rows; intra-
group order comes from an explicit ``order_by`` column. Without
``ends_when``/``starts_when`` the whole key is one group — exactly the
reference's end-of-input flush.

Execution: ``groupby(group_by).map_groups`` (shuffle). Default field
strategy (per reference): first value (discard = keep first event's
field); numeric defaults can be overridden via ``merge_strategies``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import Cond
from vector_ray.stages.base import Step


def _merge_series(s: pd.Series, strategy: str):
    vals = s.dropna()
    if strategy == "discard":
        return s.iloc[0] if len(s) else None
    if strategy == "retain":
        return s.iloc[-1] if len(s) else None
    if strategy == "sum":
        return vals.sum() if len(vals) else None
    if strategy == "max":
        return vals.max() if len(vals) else None
    if strategy == "min":
        return vals.min() if len(vals) else None
    if strategy == "array":
        # plain Python lists (not ndarrays): ragged ndarray cells break
        # Ray's pandas-block conversion
        return [list(v) if isinstance(v, np.ndarray) else v for v in s]
    if strategy == "concat":
        return " ".join(str(v) for v in vals)
    if strategy == "concat_newline":
        return "\n".join(str(v) for v in vals)
    if strategy == "shortest_array":
        arrays = [v for v in vals if isinstance(v, (list, np.ndarray))]
        return list(min(arrays, key=len)) if arrays else None
    if strategy == "longest_array":
        arrays = [v for v in vals if isinstance(v, (list, np.ndarray))]
        return list(max(arrays, key=len)) if arrays else None
    if strategy == "flat_unique":
        out = []
        seen = set()
        for v in vals:
            items = v if isinstance(v, (list, np.ndarray)) else [v]
            for x in items:
                k = (type(x).__name__, str(x))
                if k not in seen:
                    seen.add(k)
                    out.append(x)
        return out
    raise ValueError(f"unknown merge strategy {strategy}")


class Reduce(Step):
    """See module docstring. Execution is auto-salted: unless
    ``ends_when``/``starts_when`` force whole-key segmentation (or
    ``salted=False``), the reduce runs as a two-phase salted plan
    (stages/salt.py) — every strategy has a mergeable partial form, with
    order keys carried alongside order-sensitive strategies so the
    phase-2 merge reconstructs the exact ``order_by`` interleaving. A
    hot key is split across ``salt_buckets`` sub-reducers instead of
    landing on one. Rows tied on ``order_by`` (or with no order_by)
    merge in unspecified relative order — same nondeterminism class as
    the unsalted shuffle-arrival order."""

    fusable = False

    def __init__(
        self,
        group_by: Sequence[str],
        *,
        merge_strategies: Optional[Dict[str, str]] = None,
        order_by: Optional[str] = None,
        ends_when: Optional[Cond] = None,
        starts_when: Optional[Cond] = None,
        count_col: str = "n_rows",
        salted: bool = True,
        salt_buckets: int = 16,
    ):
        self.group_by = list(group_by)
        self.merge_strategies = merge_strategies or {}
        self.order_by = order_by
        self.ends_when = ends_when
        self.starts_when = starts_when
        self.count_col = count_col
        self.salted = salted
        self.salt_buckets = salt_buckets

    def _reduce_group(self, g: pd.DataFrame) -> pd.DataFrame:
        if self.order_by:
            g = g.sort_values(self.order_by, kind="mergesort")
        # sub-group segmentation by boundary conditions
        if self.ends_when is not None or self.starts_when is not None:
            tbl = pa.Table.from_pandas(g, preserve_index=False)
            seg = np.zeros(len(g), dtype=np.int64)
            if self.starts_when is not None:
                starts = np.asarray(self.starts_when(tbl).to_numpy(zero_copy_only=False), bool)
                seg += np.cumsum(starts)
            if self.ends_when is not None:
                ends = np.asarray(self.ends_when(tbl).to_numpy(zero_copy_only=False), bool)
                closed = np.concatenate([[0], np.cumsum(ends)[:-1]])
                seg += closed
            g = g.assign(__seg=seg)
            seg_keys = ["__seg"]
        else:
            seg_keys = []

        rows = []
        groups = g.groupby(seg_keys, sort=True) if seg_keys else [((0,), g)]
        for _, sub in groups:
            row = {}
            for k in self.group_by:
                row[k] = sub[k].iloc[0]
            for col in sub.columns:
                if col in self.group_by or col == "__seg":
                    continue
                strat = self.merge_strategies.get(col, "discard")
                row[col] = _merge_series(sub[col], strat)
            if self.count_col:
                row[self.count_col] = len(sub)
            rows.append(row)
        return pd.DataFrame(rows)

    # -- salted two-phase plan --------------------------------------------

    def _strategy(self, col: str) -> str:
        return self.merge_strategies.get(col, "discard")

    def _data_cols(self, columns) -> list:
        return [c for c in columns
                if c not in self.group_by and c != "__seg" and not c.startswith("__o_")
                and c != self.count_col]

    def _partial_group(self, g: pd.DataFrame) -> pd.DataFrame:
        """Per (key, salt) sub-group → one mergeable partial row."""
        ob = self.order_by
        if ob:
            g = g.sort_values(ob, kind="mergesort")
        row = {k: g[k].iloc[0] for k in self.group_by}
        for col in self._data_cols(g.columns):
            s = self._strategy(col)
            ser = g[col]
            vals = ser.dropna()
            if s in ("sum", "min", "max"):
                row[col] = _merge_series(ser, s)
            elif s == "discard":
                row[col] = ser.iloc[0]
                if ob:
                    row[f"__o_{col}"] = g[ob].iloc[0]
            elif s == "retain":
                row[col] = ser.iloc[-1]
                if ob:
                    row[f"__o_{col}"] = g[ob].iloc[-1]
            elif s == "array":
                row[col] = list(ser)
                if ob:
                    row[f"__o_{col}"] = list(g[ob])
            elif s in ("concat", "concat_newline", "flat_unique"):
                row[col] = list(vals)
                if ob:
                    row[f"__o_{col}"] = list(g[ob][ser.notna()])
            elif s in ("shortest_array", "longest_array"):
                row[col] = _merge_series(ser, s)
                if ob:
                    arrays = ser.map(lambda v: isinstance(v, (list, np.ndarray)))
                    cand = g[arrays]
                    if len(cand):
                        lens = cand[col].map(len)
                        pick = lens.idxmin() if s == "shortest_array" else lens.idxmax()
                        row[f"__o_{col}"] = cand.loc[pick, ob]
                    else:
                        row[f"__o_{col}"] = None
            else:
                raise ValueError(f"unknown merge strategy {s}")
        if self.count_col:
            row[self.count_col] = len(g)
        return pd.DataFrame([row])

    def _merge_group(self, m: pd.DataFrame) -> pd.DataFrame:
        """Per key over partial rows → final row (order reconstructed
        from the carried __o_ keys)."""
        ob = self.order_by
        row = {k: m[k].iloc[0] for k in self.group_by}

        def ordered_concat(col):
            vals: list = []
            if ob:
                ords: list = []
                for v, o in zip(m[col], m[f"__o_{col}"]):
                    if isinstance(v, (list, np.ndarray)):
                        vals.extend(list(v))
                        ords.extend(list(o))
                if not vals:
                    return vals
                idx = np.argsort(np.asarray(ords), kind="stable")
                return [vals[i] for i in idx]
            for v in m[col]:
                if isinstance(v, (list, np.ndarray)):
                    vals.extend(list(v))
            return vals

        for col in self._data_cols(m.columns):
            s = self._strategy(col)
            if s in ("sum", "min", "max"):
                row[col] = _merge_series(m[col], s)
            elif s in ("discard", "retain"):
                if ob:
                    o = m[f"__o_{col}"]
                    pick = o.idxmin() if s == "discard" else o.idxmax()
                else:
                    pick = m.index[0] if s == "discard" else m.index[-1]
                row[col] = m.loc[pick, col]
            elif s == "array":
                row[col] = ordered_concat(col)
            elif s in ("concat", "concat_newline"):
                sep = " " if s == "concat" else "\n"
                row[col] = sep.join(str(v) for v in ordered_concat(col))
            elif s == "flat_unique":
                out, seen = [], set()
                for x in ordered_concat(col):
                    items = x if isinstance(x, (list, np.ndarray)) else [x]
                    for it in items:
                        key = (type(it).__name__, str(it))
                        if key not in seen:
                            seen.add(key)
                            out.append(it)
                row[col] = out
            elif s in ("shortest_array", "longest_array"):
                cand = m[m[col].map(lambda v: isinstance(v, (list, np.ndarray)))]
                if len(cand) == 0:
                    row[col] = None
                else:
                    lens = cand[col].map(len)
                    best = lens.min() if s == "shortest_array" else lens.max()
                    tied = cand[lens == best]
                    if ob and f"__o_{col}" in m.columns:
                        pick = tied[f"__o_{col}"].idxmin()
                    else:
                        pick = tied.index[0]
                    row[col] = tied.loc[pick, col]
        if self.count_col:
            row[self.count_col] = int(m[self.count_col].sum())
        return pd.DataFrame([row])

    # -- fully vectorized fast path ---------------------------------------
    # strategies ⊆ {sum, min, max, discard, retain} with an order_by and
    # no ends/starts_when (the common telemetry-reduce shape): per-BATCH
    # Arrow hash-agg partials (implicit block salt — a hot key emits one
    # row per block) + a bucketed vectorized merge. Zero per-key Python.

    _FAST = ("sum", "min", "max", "discard", "retain")

    def _fast_eligible(self) -> bool:
        return (
            self.salted
            and self.order_by is not None
            and self.ends_when is None
            and self.starts_when is None
            and all(s in self._FAST for s in self.merge_strategies.values())
        )

    def _fast_partial(self, t: pa.Table) -> pa.Table:
        ob = self.order_by
        t = t.sort_by(ob)
        data_cols = [c for c in t.column_names if c not in self.group_by]
        keep_null = pc.ScalarAggregateOptions(skip_nulls=False)
        aggs = []
        for c in data_cols:
            s = self._strategy(c)
            if s in ("sum", "min", "max"):
                aggs.append((c, s))
            elif s == "discard":
                aggs.append((c, "first", keep_null))
            else:  # retain
                aggs.append((c, "last", keep_null))
        t = t.append_column("__one", pa.array(np.ones(len(t), np.int64)))
        t = t.append_column("__obc", t[ob])
        aggs += [("__one", "sum"), ("__obc", "min"), ("__obc", "max")]
        raw = pa.TableGroupBy(t, self.group_by).aggregate(aggs)
        cols = {k: raw[k] for k in self.group_by}
        for c in data_cols:
            s = self._strategy(c)
            fn = s if s in ("sum", "min", "max") else ("first" if s == "discard" else "last")
            cols[c] = raw[f"{c}_{fn}"]
        cols["__of"] = raw["__obc_min"]
        cols["__ol"] = raw["__obc_max"]
        cols["__n"] = raw["__one_sum"]
        return pa.table(cols)

    def _fast_merge(self, g: pa.Table) -> pa.Table:
        """One vectorized merge over a whole hash bucket of partials."""
        from vector_ray.stages.bucketed import _key_combo

        data_cols = [c for c in g.column_names
                     if c not in self.group_by and c not in ("__of", "__ol", "__n")]
        g = g.append_column("__gk", _key_combo(g, self.group_by))
        disc = [c for c in data_cols if self._strategy(c) == "discard"]
        ret = [c for c in data_cols if self._strategy(c) == "retain"]
        aggs = [(k, "first") for k in self.group_by] + [("__n", "sum")]
        for c in data_cols:
            s = self._strategy(c)
            if s in ("sum", "min", "max"):
                aggs.append((c, s))
        raw = pa.TableGroupBy(
            g.select(["__gk"] + sorted({c for c, *_ in aggs})), "__gk"
        ).aggregate(aggs).sort_by("__gk")

        def pick(cols, order_col, descending):
            sub = g.select(["__gk", order_col] + cols).sort_by(
                [("__gk", "ascending"), (order_col, "descending" if descending else "ascending")]
            )
            codes = np.asarray(pc.dictionary_encode(sub["__gk"].combine_chunks()).indices)
            first = np.ones(len(sub), bool)
            first[1:] = codes[1:] != codes[:-1]
            return sub.filter(pa.array(first))

        out = {k: raw[f"{k}_first"] for k in self.group_by}
        disc_t = pick(disc, "__of", False) if disc else None
        ret_t = pick(ret, "__ol", True) if ret else None
        for c in data_cols:
            s = self._strategy(c)
            if s in ("sum", "min", "max"):
                out[c] = raw[f"{c}_{s}"]
            elif s == "discard":
                out[c] = disc_t[c]
            else:
                out[c] = ret_t[c]
        if self.count_col:
            out[self.count_col] = raw["__n_sum"]
        return pa.table(out)

    def _apply_fast(self, ds):
        from vector_ray.stages.bucketed import bucketed_map_groups

        partial = ds.map_batches(
            self._fast_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        return bucketed_map_groups(partial, self.group_by, self._fast_merge)

    # -- vectorized conditional path ---------------------------------------
    # ends_when / starts_when force whole-key co-location (a boundary can
    # only be found with every row of the key in order), but NOT per-key
    # Python: one hash-bucket shuffle, then per bucket ONE sort by
    # (keys, order_by), ONE vectorized condition evaluation, numpy
    # cumsum/searchsorted-style run segmentation, and run-based Arrow
    # aggregation. Sub-groups are CONTIGUOUS runs after the sort, so list
    # outputs build zero-copy via ListArray.from_arrays(run_offsets, col).
    # Python invocations: O(buckets), never O(distinct keys) — the shape
    # the reference's boundary conditions (reduce/mod.rs:221-257) need at
    # high-cardinality group_by.

    def _conditional_bucket(self, g: pa.Table) -> pa.Table:
        from vector_ray.stages.bucketed import _run_starts

        g = g.combine_chunks()
        n = len(g)
        if n == 0:
            return g
        sort_keys = [(k, "ascending") for k in self.group_by]
        if self.order_by:
            sort_keys.append((self.order_by, "ascending"))
        g = g.sort_by(sort_keys).combine_chunks()
        key_new = _run_starts(g, self.group_by)
        rs_idx = np.flatnonzero(key_new)
        run_len = np.diff(np.append(rs_idx, n))

        def _mask(cond) -> np.ndarray:
            m = cond(g)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            return np.asarray(
                pc.fill_null(m, False).to_numpy(zero_copy_only=False), bool)

        # per-key segment ids from the GLOBAL cumsums: subtract each
        # key-run's base so every key restarts at segment 0
        seg = np.zeros(n, np.int64)
        if self.starts_when is not None:
            s = _mask(self.starts_when)
            cs = np.cumsum(s)
            seg += cs - np.repeat((cs - s)[rs_idx], run_len)
        if self.ends_when is not None:
            e = _mask(self.ends_when)
            ce = np.cumsum(e)
            closed = ce - e  # exclusive prefix: an end row closes AFTER itself
            seg += closed - np.repeat(closed[rs_idx], run_len)

        new_sub = key_new.copy()
        new_sub[1:] |= seg[1:] != seg[:-1]
        offs = np.flatnonzero(new_sub)            # sub-group starts
        ends = np.append(offs[1:], n)
        counts = ends - offs
        gid = np.cumsum(new_sub) - 1
        G = len(offs)
        first_pa = pa.array(offs, pa.int64())
        last_pa = pa.array(ends - 1, pa.int64())

        data_cols = [c for c in g.column_names if c not in self.group_by]
        by_strat: dict = {}
        for c in data_cols:
            by_strat.setdefault(self._strategy(c), []).append(c)

        computed: dict = {}
        for c in by_strat.get("discard", []):
            computed[c] = g[c].take(first_pa)
        for c in by_strat.get("retain", []):
            computed[c] = g[c].take(last_pa)

        agg_cols = (by_strat.get("sum", []) + by_strat.get("min", [])
                    + by_strat.get("max", []))
        if agg_cols:
            t2 = pa.table({"__gid": pa.array(gid),
                           **{c: g[c] for c in agg_cols}})
            raw = pa.TableGroupBy(t2, "__gid").aggregate(
                [(c, self._strategy(c)) for c in agg_cols]).sort_by("__gid")
            for c in agg_cols:
                computed[c] = raw[f"{c}_{self._strategy(c)}"]

        list_offs = pa.array(np.append(offs, n).astype(np.int32))
        for c in by_strat.get("array", []):
            computed[c] = pa.ListArray.from_arrays(
                list_offs, g[c].combine_chunks())

        for strat in ("concat", "concat_newline"):
            sep = " " if strat == "concat" else "\n"
            for c in by_strat.get(strat, []):
                col = g[c].combine_chunks()
                valid = np.asarray(pc.is_valid(col).to_numpy(
                    zero_copy_only=False), bool)
                vcnt = np.add.reduceat(valid.astype(np.int64), offs)
                voff = pa.array(np.concatenate(
                    [[0], np.cumsum(vcnt)]).astype(np.int32))
                sv = pc.cast(col.filter(pa.array(valid)), pa.string())
                computed[c] = pc.binary_join(
                    pa.ListArray.from_arrays(voff, sv), sep)

        for c in by_strat.get("flat_unique", []):
            col = g[c].combine_chunks()
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                parents = np.asarray(pc.list_parent_indices(col)
                                     .to_numpy(zero_copy_only=False))
                flat = pc.list_flatten(col)
                egid = gid[parents]
            else:
                valid = np.asarray(pc.is_valid(col).to_numpy(
                    zero_copy_only=False), bool)
                flat = col.filter(pa.array(valid))
                egid = gid[valid]
            import pandas as _pd

            fv = flat.to_pandas()
            keep = ~_pd.DataFrame({"g": egid, "v": fv}).duplicated(
                ["g", "v"]).to_numpy()
            kept_idx = np.flatnonzero(keep)
            kcnt = np.bincount(egid[kept_idx], minlength=G)
            koff = pa.array(np.concatenate(
                [[0], np.cumsum(kcnt)]).astype(np.int32))
            computed[c] = pa.ListArray.from_arrays(
                koff, flat.take(pa.array(kept_idx, pa.int64())))

        for strat in ("shortest_array", "longest_array"):
            for c in by_strat.get(strat, []):
                col = g[c].combine_chunks()
                lens = pc.list_value_length(col)
                lnp = np.asarray(pc.cast(lens, pa.float64()).to_numpy(
                    zero_copy_only=False), np.float64)
                bad = np.isnan(lnp)
                key = np.where(bad, np.inf,
                               lnp if strat == "shortest_array" else -lnp)
                order = np.lexsort((np.arange(n), key, gid))
                sg = gid[order]
                firsts = np.ones(len(sg), bool)
                firsts[1:] = sg[1:] != sg[:-1]
                pick = np.full(G, -1, np.int64)
                pick[sg[firsts]] = order[firsts]
                has = np.add.reduceat((~bad).astype(np.int64), offs) > 0
                idx = pa.array(np.where(has, pick, 0), pa.int64(),
                               mask=~has)
                computed[c] = col.take(idx)

        out: dict = {}
        for k in self.group_by:
            out[k] = g[k].take(first_pa)
        for c in data_cols:
            out[c] = computed[c]
        if self.count_col:
            out[self.count_col] = pa.array(counts, pa.int64())
        return pa.table(out)

    # -- vectorized salted two-phase plan ----------------------------------
    # The generic (non-fast-eligible) strategy mix previously ran one
    # pandas callback per (key, salt) sub-group through
    # salted_group_reduce — a bucket with 10^5 distinct keys did 10^5
    # Python fn(sub) calls. Both phases are now single vectorized passes
    # per bucket: run-segmentation over the sorted bucket, Arrow hash
    # aggs for sum/min/max, offset takes for discard/retain, and
    # ListArray.from_arrays over contiguous runs for the list-shaped
    # strategies, with __o_<col> order carriers exactly mirroring the
    # pandas partial/merge contract. salted_group_reduce remains the
    # generic fallback for CUSTOM reduce_fn UDFs only (its per-group
    # bound is documented there).

    def _vector_partial_bucket(self, g: pa.Table) -> pa.Table:
        """Phase 1: one row per (key, salt) sub-group with mergeable
        partial columns (+ order carriers)."""
        from vector_ray.stages.bucketed import _run_starts

        g = g.combine_chunks()
        ob = self.order_by
        group_cols = self.group_by + ["__salt"]
        sort_keys = [(k, "ascending") for k in group_cols]
        if ob:
            sort_keys.append((ob, "ascending"))
        g = g.sort_by(sort_keys).combine_chunks()
        n = len(g)
        new_sub = _run_starts(g, group_cols)
        offs = np.flatnonzero(new_sub)
        ends = np.append(offs[1:], n)
        gid = np.cumsum(new_sub) - 1
        first_pa = pa.array(offs, pa.int64())
        last_pa = pa.array(ends - 1, pa.int64())
        list_offs = pa.array(np.append(offs, n).astype(np.int32))
        G = len(offs)
        ob_col = g[ob].combine_chunks() if ob else None

        data_cols = [c for c in g.column_names if c not in group_cols]
        out: dict = {}
        for k in self.group_by:
            out[k] = g[k].take(first_pa)

        agg_cols = [c for c in data_cols
                    if self._strategy(c) in ("sum", "min", "max")]
        agg_res = {}
        if agg_cols:
            t2 = pa.table({"__gid": pa.array(gid),
                           **{c: g[c] for c in agg_cols}})
            raw = pa.TableGroupBy(t2, "__gid").aggregate(
                [(c, self._strategy(c)) for c in agg_cols]).sort_by("__gid")
            for c in agg_cols:
                agg_res[c] = raw[f"{c}_{self._strategy(c)}"]

        for c in data_cols:
            s = self._strategy(c)
            if s in ("sum", "min", "max"):
                out[c] = agg_res[c]
            elif s in ("discard", "retain"):
                pick = first_pa if s == "discard" else last_pa
                out[c] = g[c].take(pick)
                if ob:
                    out[f"__o_{c}"] = ob_col.take(pick)
            elif s == "array":
                out[c] = pa.ListArray.from_arrays(
                    list_offs, g[c].combine_chunks())
                if ob:
                    out[f"__o_{c}"] = pa.ListArray.from_arrays(
                        list_offs, ob_col)
            elif s in ("concat", "concat_newline", "flat_unique"):
                col = g[c].combine_chunks()
                valid = np.asarray(pc.is_valid(col).to_numpy(
                    zero_copy_only=False), bool)
                vcnt = np.add.reduceat(valid.astype(np.int64), offs)
                voff = pa.array(np.concatenate(
                    [[0], np.cumsum(vcnt)]).astype(np.int32))
                vmask = pa.array(valid)
                out[c] = pa.ListArray.from_arrays(voff, col.filter(vmask))
                if ob:
                    out[f"__o_{c}"] = pa.ListArray.from_arrays(
                        voff, ob_col.filter(vmask))
            elif s in ("shortest_array", "longest_array"):
                col = g[c].combine_chunks()
                lens = pc.list_value_length(col)
                lnp = np.asarray(pc.cast(lens, pa.float64()).to_numpy(
                    zero_copy_only=False), np.float64)
                bad = np.isnan(lnp)
                key = np.where(bad, np.inf,
                               lnp if s == "shortest_array" else -lnp)
                order = np.lexsort((np.arange(n), key, gid))
                sg = gid[order]
                firsts = np.ones(len(sg), bool)
                firsts[1:] = sg[1:] != sg[:-1]
                pick = np.full(G, -1, np.int64)
                pick[sg[firsts]] = order[firsts]
                has = np.add.reduceat((~bad).astype(np.int64), offs) > 0
                idx = pa.array(np.where(has, pick, 0), pa.int64(),
                               mask=~has)
                out[c] = col.take(idx)
                if ob:
                    out[f"__o_{c}"] = ob_col.take(idx)
            else:
                raise ValueError(f"unknown merge strategy {s}")
        if self.count_col:
            out[self.count_col] = pa.array(ends - offs, pa.int64())
        return pa.table(out)

    def _vector_merge_bucket(self, g: pa.Table) -> pa.Table:
        """Phase 2: one row per key over phase-1 partial rows; order
        reconstructed from the __o_ carriers."""
        from vector_ray.stages.bucketed import _run_starts

        g = g.combine_chunks()
        ob = self.order_by
        g = g.sort_by(
            [(k, "ascending") for k in self.group_by]).combine_chunks()
        n = len(g)
        new_sub = _run_starts(g, self.group_by)
        offs = np.flatnonzero(new_sub)
        ends = np.append(offs[1:], n)
        gid = np.cumsum(new_sub) - 1
        first_pa = pa.array(offs, pa.int64())
        G = len(offs)

        data_cols = self._data_cols(g.column_names)
        out: dict = {}
        for k in self.group_by:
            out[k] = g[k].take(first_pa)

        def _onp(name):
            o = g[name].combine_chunks()
            return np.asarray(o.to_numpy(zero_copy_only=False))

        def _pick_rows(order_key, take_max=False) -> pa.Array:
            """Per-run row pick: the row with the min (or max) order
            key in each key-run (tie → arrival order)."""
            order = np.lexsort((np.arange(n), order_key, gid))
            sg = gid[order]
            mark = np.ones(len(sg), bool)
            if take_max:
                mark[:-1] = sg[1:] != sg[:-1]  # run lasts = max key
            else:
                mark[1:] = sg[1:] != sg[:-1]   # run firsts = min key
            pick = np.zeros(G, np.int64)
            pick[sg[mark]] = order[mark]
            return pa.array(pick, pa.int64())

        def _flatten_ordered(c: str):
            """Flatten the partial list cells of ``c`` (and its order
            carrier) to element level, ordered per key by the carried
            order (stable), → (elem_gid, elements pa.Array, counts)."""
            col = g[c].combine_chunks()
            parents = np.asarray(pc.list_parent_indices(col)
                                 .to_numpy(zero_copy_only=False))
            flat = pc.list_flatten(col)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            egid = gid[parents] if len(parents) else parents
            if ob and f"__o_{c}" in g.column_names:
                ocol = g[f"__o_{c}"].combine_chunks()
                oflat = pc.list_flatten(ocol)
                onp = np.asarray(oflat.to_numpy(zero_copy_only=False))
                order = np.lexsort((np.arange(len(egid)), onp, egid))
            else:
                order = np.lexsort((np.arange(len(egid)), egid))
            egid = egid[order]
            flat = flat.take(pa.array(order, pa.int64()))
            counts = np.bincount(egid, minlength=G)
            return egid, flat, counts

        agg_cols = [c for c in data_cols
                    if self._strategy(c) in ("sum", "min", "max")]
        agg_res = {}
        need_cnt = bool(self.count_col)
        if agg_cols or need_cnt:
            t2 = pa.table({"__gid": pa.array(gid),
                           **{c: g[c] for c in agg_cols},
                           **({self.count_col: g[self.count_col]}
                              if need_cnt else {})})
            aggs = [(c, self._strategy(c)) for c in agg_cols]
            if need_cnt:
                aggs.append((self.count_col, "sum"))
            raw = pa.TableGroupBy(t2, "__gid").aggregate(aggs).sort_by(
                "__gid")
            for c in agg_cols:
                agg_res[c] = raw[f"{c}_{self._strategy(c)}"]
            if need_cnt:
                agg_res[self.count_col] = pc.cast(
                    raw[f"{self.count_col}_sum"], pa.int64())

        for c in data_cols:
            s = self._strategy(c)
            if s in ("sum", "min", "max"):
                out[c] = agg_res[c]
            elif s in ("discard", "retain"):
                if ob and f"__o_{c}" in g.column_names:
                    pick = _pick_rows(_onp(f"__o_{c}"),
                                      take_max=(s == "retain"))
                else:
                    pick = (first_pa if s == "discard"
                            else pa.array(ends - 1, pa.int64()))
                out[c] = g[c].take(pick)
            elif s == "array":
                _, flat, counts = _flatten_ordered(c)
                loff = pa.array(np.concatenate(
                    [[0], np.cumsum(counts)]).astype(np.int32))
                out[c] = pa.ListArray.from_arrays(loff, flat)
            elif s in ("concat", "concat_newline"):
                sep = " " if s == "concat" else "\n"
                _, flat, counts = _flatten_ordered(c)
                loff = pa.array(np.concatenate(
                    [[0], np.cumsum(counts)]).astype(np.int32))
                out[c] = pc.binary_join(pa.ListArray.from_arrays(
                    loff, pc.cast(flat, pa.string())), sep)
            elif s == "flat_unique":
                egid, flat, _ = _flatten_ordered(c)
                # exactly ONE more flatten level: cells of a LIST
                # column dedupe at the element level (pandas-path
                # parity — deeper nesting is not recursed there either)
                if pa.types.is_list(flat.type) or \
                        pa.types.is_large_list(flat.type):
                    par2 = np.asarray(pc.list_parent_indices(flat)
                                      .to_numpy(zero_copy_only=False))
                    egid = egid[par2] if len(par2) else \
                        par2.astype(np.int64)
                    flat = pc.list_flatten(flat)
                    if isinstance(flat, pa.ChunkedArray):
                        flat = flat.combine_chunks()
                import pandas as _pd

                keep = ~_pd.DataFrame(
                    {"g": egid, "v": flat.to_pandas()}
                ).duplicated(["g", "v"]).to_numpy()
                if len(keep) == 0:
                    keep = np.zeros(0, bool)
                kept_idx = np.flatnonzero(keep)
                kcnt = np.bincount(egid[kept_idx], minlength=G)
                koff = pa.array(np.concatenate(
                    [[0], np.cumsum(kcnt)]).astype(np.int32))
                out[c] = pa.ListArray.from_arrays(
                    koff, flat.take(pa.array(kept_idx, pa.int64())))
            elif s in ("shortest_array", "longest_array"):
                col = g[c].combine_chunks()
                lens = pc.list_value_length(col)
                lnp = np.asarray(pc.cast(lens, pa.float64()).to_numpy(
                    zero_copy_only=False), np.float64)
                bad = np.isnan(lnp)
                key = np.where(bad, np.inf,
                               lnp if s == "shortest_array" else -lnp)
                if ob and f"__o_{c}" in g.column_names:
                    onp = _onp(f"__o_{c}")
                    order = np.lexsort((np.arange(n), onp, key, gid))
                else:
                    order = np.lexsort((np.arange(n), key, gid))
                sg = gid[order]
                firsts = np.ones(len(sg), bool)
                firsts[1:] = sg[1:] != sg[:-1]
                pick = np.full(G, -1, np.int64)
                pick[sg[firsts]] = order[firsts]
                has = np.zeros(G, bool)
                np.logical_or.at(has, gid, ~bad)
                idx = pa.array(np.where(has, pick, 0), pa.int64(),
                               mask=~has)
                out[c] = col.take(idx)
            else:
                raise ValueError(f"unknown merge strategy {s}")
        if self.count_col:
            out[self.count_col] = agg_res[self.count_col]
        return pa.table(out)

    def _apply_salted_vector(self, ds):
        from vector_ray.stages.bucketed import bucketed_map_groups
        from vector_ray.stages.salt import add_salt

        salted = add_salt(ds, self.group_by, buckets=self.salt_buckets,
                          salt_source=self.order_by)
        phase1 = bucketed_map_groups(
            salted, self.group_by + ["__salt"],
            self._vector_partial_bucket)
        return bucketed_map_groups(
            phase1, self.group_by, self._vector_merge_bucket)

    def apply(self, ds):
        if self._fast_eligible():
            return self._apply_fast(ds)
        if self.ends_when is not None or self.starts_when is not None:
            if not self.salted:
                # explicit unsalted path: per-key pandas REFERENCE
                # implementation, kept deliberately — the differential
                # tests (tests/test_stages.py) verify the salted
                # vectorized plan against it for every strategy; never
                # the default, documented O(distinct keys) driver cost
                return ds.groupby(self.group_by).map_groups(
                    self._reduce_group, batch_format="pandas")
            from vector_ray.stages.bucketed import bucketed_map_groups

            return bucketed_map_groups(
                ds, self.group_by, self._conditional_bucket)
        if self.salted:
            return self._apply_salted_vector(ds)
        return ds.groupby(self.group_by).map_groups(self._reduce_group, batch_format="pandas")
