"""Aggregation stages.

- ``grouped_aggregate``: the engine's general two-phase grouped
  aggregate — partial aggregation INSIDE ``map_batches`` via Arrow's
  hash-aggregate (``pa.TableGroupBy``), then a tiny final
  groupby+merge over the partials. The shuffle moves one row per
  (key, block) instead of every input row, which is also the skew
  defense BASELINE.json demands: a hot key contributes at most
  ``num_blocks`` partial rows regardless of its row share. (Mirrors
  Vector's mergeable incremental metrics, metric.rs:103-106.)

- ``LogToMetric``: src/transforms/log_to_metric.rs:71-78 — project log
  rows into metric-shaped rows (counter/gauge/set/histogram) with
  templated names/tags.

- ``Aggregate``: src/transforms/aggregate.rs:72-107 — merge metric rows
  by series (name+tags): Incremental → sum, Absolute → last-write.
  NOTE: "last" is last-in-batch-order within partials and
  last-partial-in-shuffle-order at the merge — like the reference's
  arrival-order replace, it is only deterministic if the caller
  provides an ordered input (sort on a sequence column first). Interval
  flushing (aggregate.rs:24-26) collapses to one end-of-input flush,
  exactly the reference's stream-end flush (aggregate.rs:128-134).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F
from vector_ray.stages.base import Step

# spec kinds → (partial arrow aggs, final merge)
_SIMPLE = {
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    "count": ("count", "sum"),
}


def _key_fingerprint(tbl: pa.Table, keys) -> np.ndarray:
    """Null-safe uint64 fingerprint of the combined group key. Used both
    to segment batches in ``_sketch_partial`` and as the join key when
    re-attaching sketch columns (Arrow joins never match null keys, so
    joining on the raw keys would drop null-keyed groups' sketches)."""
    from vector_ray.expr import F as _F

    parts = [pc.fill_null(pc.cast(tbl[k], pa.string()), "\x00\x01") for k in keys]
    combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    fp = _F.fingerprint(combo)
    return np.asarray(fp.to_numpy(zero_copy_only=False), dtype=np.uint64)


def _sketch_partial(tbl: pa.Table, keys, sketch_specs) -> pa.Table:
    """Per-(batch, group) mergeable sketches: group rows by a combined
    key fingerprint (argsort + segment slicing, no Python per row),
    one serialized sketch per group per batch. Output carries a
    ``__fp`` uint64 column for null-safe re-attachment."""
    from vector_ray.stages.sketch import HLL, Histogram

    if len(tbl) == 0:
        # schema-stable empty partial (empty upstream blocks must not crash)
        out = {k: pa.array([], tbl[k].type) for k in keys}
        for name in sketch_specs:
            out[f"{name}__sk"] = pa.array([], pa.binary())
        out["__fp"] = pa.array([], pa.uint64())
        return pa.table(out)

    fpv = _key_fingerprint(tbl, keys)
    order = np.argsort(fpv, kind="stable")
    sorted_fp = fpv[order]
    seg_starts = np.concatenate([[0], np.nonzero(np.diff(sorted_fp))[0] + 1])
    rows = {k: [] for k in keys}
    sketches: dict = {name: [] for name in sketch_specs}
    key_cols = {k: tbl[k] for k in keys}
    for si, start in enumerate(seg_starts):
        end = seg_starts[si + 1] if si + 1 < len(seg_starts) else len(sorted_fp)
        idx = order[start:end]
        first = int(idx[0])
        for k in keys:
            rows[k].append(key_cols[k][first].as_py())
        take = pa.array(idx, pa.int64())
        for name, (kind, col, *opts) in sketch_specs.items():
            vals = tbl[col].take(take)
            if kind == "approx_nunique":
                h = HLL()
                h.add_strings(vals)
                sketches[name].append(h.to_bytes())
            else:  # histogram
                hg = Histogram(opts[0])
                hg.add(pc.cast(vals, pa.float64()).to_numpy(zero_copy_only=False))
                import pickle

                sketches[name].append(pickle.dumps(hg))
    out = {k: pa.array(rows[k], tbl[k].type) for k in keys}
    for name in sketch_specs:
        out[f"{name}__sk"] = pa.array(sketches[name], pa.binary())
    out["__fp"] = pa.array(sorted_fp[seg_starts], pa.uint64())
    return pa.table(out)


def _set_partial_pieces(tbl: pa.Table, keys, set_specs) -> list:
    """Per-(batch, group) distinct-value lists, one piece per spec.
    Arrow's hash `distinct` aggregate emits CORRUPT list offsets when
    the aggregated column contains nulls (offsets span the raw value
    count), so distinct is computed explicitly: drop null values →
    groupby(keys+col) (unique rows) → groupby(keys) list. Each piece
    carries ``__fp`` for null-safe re-attachment."""
    pieces = []
    for name, (_kind, col) in set_specs.items():
        sub = tbl.select(list(keys) + [col]).filter(pc.is_valid(tbl[col]))
        dp = pa.TableGroupBy(sub, list(keys) + [col]).aggregate([])
        lists = pa.TableGroupBy(dp, list(keys)).aggregate([(col, "list")])
        pieces.append(pa.table({
            "__fp": pa.array(_key_fingerprint(lists, keys), pa.uint64()),
            f"{name}__set": lists[f"{col}_list"],
        }))
    return pieces


def _partial_batch(tbl: pa.Table, keys, specs) -> pa.Table:
    sketch_specs = {n: v for n, v in specs.items() if v[0] in ("approx_nunique", "histogram")}
    set_specs = {n: v for n, v in specs.items() if v[0] in ("set", "nunique")}
    specs = {n: v for n, v in specs.items() if n not in sketch_specs and n not in set_specs}
    # aux pieces: (__fp, data-cols) tables attached to the base groups by
    # null-safe fingerprint (raw-key Arrow joins never match null keys)
    aux_pieces: list = []
    if sketch_specs:
        sk = _sketch_partial(tbl, keys, sketch_specs)
        aux_pieces.append(sk.drop_columns(list(keys)))
    if set_specs:
        aux_pieces.extend(_set_partial_pieces(tbl, keys, set_specs))
    if specs:
        # collect UNIQUE (col, agg) pairs, then map each spec's target
        # columns onto them — two specs may need the same pair (e.g.
        # {"avg": ("mean", "v"), "total": ("sum", "v")} both need v_sum)
        pairs: list = []
        targets: list = []  # (target_name, (col, agg))
        for name, (kind, col, *_o) in specs.items():
            if kind in _SIMPLE:
                agg, _ = _SIMPLE[kind]
                need = [(name, (col, agg))]
            elif kind == "mean":
                need = [(f"{name}__sum", (col, "sum")), (f"{name}__count", (col, "count"))]
            elif kind in ("var", "std"):
                # mergeable (n, Σx, Σx²) partials; final =
                # (Σx² − (Σx)²/n)/(n−1) — sample variance (ddof=1).
                # For integer-valued data < 2^26 every partial is exact
                # in f64, so the result is partitioning-independent.
                sqcol = f"{name}__sq"
                if sqcol not in tbl.column_names:
                    x = pc.cast(tbl[col], pa.float64())
                    tbl = tbl.append_column(sqcol, pc.multiply(x, x))
                need = [(f"{name}__sum", (col, "sum")),
                        (f"{name}__count", (col, "count")),
                        (f"{name}__sumsq", (sqcol, "sum"))]
            elif kind == "wmean":
                # weighted mean (kind, value_col, weight_col):
                # mergeable (Σwx, Σw); null values OR weights excluded
                # pairwise like cov/corr
                wcol = _o[0]
                x = pc.cast(tbl[col], pa.float64())
                w = pc.cast(tbl[wcol], pa.float64())
                both = pc.and_kleene(pc.is_valid(x), pc.is_valid(w))
                xm = pc.if_else(both, x, pa.nulls(len(tbl), pa.float64()))
                wm = pc.if_else(both, w, pa.nulls(len(tbl), pa.float64()))
                pre = f"{name}__"
                tbl = tbl.append_column(pre + "wx", pc.multiply(xm, wm))
                tbl = tbl.append_column(pre + "w", wm)
                need = [(pre + "swx", (pre + "wx", "sum")),
                        (pre + "sw", (pre + "w", "sum"))]
            elif kind in ("cov", "corr", "slope", "intercept"):
                # two-column spec (kind, x_col, y_col): mergeable
                # (n, Σx, Σy, Σxy[, Σx², Σy²]) partials. Rows where
                # EITHER side is null are excluded (SQL covar_samp /
                # regr_* semantics): the pairwise mask is applied to
                # every partial column so n/Σ agree. slope/intercept =
                # least-squares y-on-x (SQL regr_slope/regr_intercept).
                ycol = _o[0]
                x = pc.cast(tbl[col], pa.float64())
                y = pc.cast(tbl[ycol], pa.float64())
                both = pc.and_kleene(pc.is_valid(x), pc.is_valid(y))
                xm = pc.if_else(both, x, pa.nulls(len(tbl), pa.float64()))
                ym = pc.if_else(both, y, pa.nulls(len(tbl), pa.float64()))
                pre = f"{name}__"
                tbl = tbl.append_column(pre + "x", xm)
                tbl = tbl.append_column(pre + "y", ym)
                tbl = tbl.append_column(pre + "xy", pc.multiply(xm, ym))
                need = [(pre + "n", (pre + "x", "count")),
                        (pre + "sx", (pre + "x", "sum")),
                        (pre + "sy", (pre + "y", "sum")),
                        (pre + "sxy", (pre + "xy", "sum"))]
                if kind in ("corr", "slope", "intercept"):
                    tbl = tbl.append_column(pre + "xx",
                                            pc.multiply(xm, xm))
                    need += [(pre + "sxx", (pre + "xx", "sum"))]
                if kind == "corr":
                    tbl = tbl.append_column(pre + "yy",
                                            pc.multiply(ym, ym))
                    need += [(pre + "syy", (pre + "yy", "sum"))]
            elif kind == "last":
                # value at max seq within batch: batch is already in row order
                need = [(name, (col, "last"))]
            elif kind == "first":
                need = [(name, (col, "first"))]
            else:
                raise ValueError(f"unknown agg kind {kind}")
            for tname, pair in need:
                if pair not in pairs:
                    pairs.append(pair)
            targets.extend(need)
        raw = pa.TableGroupBy(tbl, list(keys)).aggregate(pairs)
        cols = {k: raw[k] for k in keys}
        for tname, (col, agg) in targets:
            cols[tname] = raw[f"{col}_{agg}"]
        out = pa.table(cols)
    else:
        # no simple specs: the base is simply every group present
        out = pa.TableGroupBy(tbl, list(keys)).aggregate([])
    if aux_pieces:
        # positional attach via sorted-fingerprint lookup (Arrow joins
        # cannot carry list-typed payloads, and this is cheaper anyway)
        fp_out = _key_fingerprint(out, keys) if len(out) else np.empty(0, np.uint64)
        for piece in aux_pieces:
            if len(piece) == 0:  # e.g. a set spec whose values were all null
                for c, typ in zip(piece.column_names, piece.schema.types):
                    if c != "__fp":
                        out = out.append_column(c, pa.nulls(len(out), typ))
                continue
            fp_piece = np.asarray(
                piece["__fp"].combine_chunks().to_numpy(zero_copy_only=False), np.uint64
            )
            order = np.argsort(fp_piece, kind="stable")
            pos = np.searchsorted(fp_piece[order], fp_out)
            posc = np.clip(pos, 0, len(fp_piece) - 1)
            found = (pos < len(fp_piece)) & (fp_piece[order][posc] == fp_out)
            take_idx = pa.array(order[posc], pa.int64(), mask=~found)
            for c in piece.column_names:
                if c != "__fp":
                    out = out.append_column(c, piece[c].take(take_idx))
        return out
    return out


def _gk_batch(tbl: pa.Table, keys) -> pa.Table:
    """Append a null-safe combined string group key ``__gk`` (Ray Data's
    sort-based groupby can't order null keys; group on this instead)."""
    parts = [pc.fill_null(pc.cast(tbl[k], pa.string()), "\x00\x01") for k in keys]
    combo = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    return tbl.append_column("__gk", combo)


_ARROW_MERGEABLE = ("sum", "count", "min", "max", "mean", "last", "first",
                    "var", "std", "cov", "corr", "slope", "intercept",
                    "wmean")


def _merge_bucket(g: pa.Table, keys, specs) -> pa.Table:
    """Merge partial rows for EVERY group in one hash bucket at once:
    Arrow's hash aggregate handles sum/count/min/max/mean/last/first
    for all groups in one C++ pass; only sketch/set kinds (inherently
    per-group Python objects) fall back to a segment loop. Python work
    is O(buckets) + O(groups with sketch specs), never O(groups) for
    the plain-aggregate path."""
    arrow_specs = {n: v for n, v in specs.items() if v[0] in _ARROW_MERGEABLE}
    py_specs = {n: v for n, v in specs.items() if v[0] not in _ARROW_MERGEABLE}

    aggs = [(k, "first") for k in keys]
    for name, (kind, *_r) in arrow_specs.items():
        if kind in ("sum", "count"):
            aggs.append((name, "sum"))
        elif kind in ("min", "max", "last", "first"):
            aggs.append((name, kind))
        elif kind == "mean":
            aggs.append((f"{name}__sum", "sum"))
            aggs.append((f"{name}__count", "sum"))
        elif kind in ("var", "std"):
            aggs.append((f"{name}__sum", "sum"))
            aggs.append((f"{name}__count", "sum"))
            aggs.append((f"{name}__sumsq", "sum"))
        elif kind == "wmean":
            aggs.append((f"{name}__swx", "sum"))
            aggs.append((f"{name}__sw", "sum"))
        elif kind in ("cov", "corr", "slope", "intercept"):
            for suf in ("n", "sx", "sy", "sxy"):
                aggs.append((f"{name}__{suf}", "sum"))
            if kind in ("corr", "slope", "intercept"):
                aggs.append((f"{name}__sxx", "sum"))
            if kind == "corr":
                aggs.append((f"{name}__syy", "sum"))
    raw = pa.TableGroupBy(
        g.select(["__gk"] + sorted({c for c, _a in aggs})), "__gk"
    ).aggregate(aggs)
    raw = raw.sort_by("__gk")

    cols: dict = {}
    for k in keys:
        cols[k] = raw[f"{k}_first"]
    for name, (kind, *_r) in specs.items():
        if kind in ("sum", "count"):
            cols[name] = raw[f"{name}_sum"]
        elif kind in ("min", "max", "last", "first"):
            cols[name] = raw[f"{name}_{kind}"]
        elif kind == "mean":
            s = pc.cast(raw[f"{name}__sum_sum"], pa.float64())
            c = pc.cast(raw[f"{name}__count_sum"], pa.float64())
            ok = pc.greater(pc.fill_null(c, 0), 0)
            cols[name] = pc.if_else(ok, pc.divide(pc.fill_null(s, 0), c),
                                    pa.nulls(len(raw), pa.float64()))
        elif kind in ("var", "std"):
            s = pc.cast(raw[f"{name}__sum_sum"], pa.float64())
            c = pc.cast(raw[f"{name}__count_sum"], pa.float64())
            ss = pc.cast(raw[f"{name}__sumsq_sum"], pa.float64())
            ok = pc.greater(pc.fill_null(c, 0), 1)
            num = pc.subtract(pc.fill_null(ss, 0),
                              pc.divide(pc.multiply(pc.fill_null(s, 0),
                                                    pc.fill_null(s, 0)),
                                        pc.if_else(ok, c, pa.scalar(2.0))))
            v = pc.divide(num, pc.subtract(
                pc.if_else(ok, c, pa.scalar(2.0)), pa.scalar(1.0)))
            v = pc.if_else(ok, v, pa.nulls(len(raw), pa.float64()))
            cols[name] = pc.sqrt(v) if kind == "std" else v
        elif kind == "wmean":
            swx = pc.fill_null(pc.cast(raw[f"{name}__swx_sum"],
                                       pa.float64()), 0)
            sw = pc.fill_null(pc.cast(raw[f"{name}__sw_sum"],
                                      pa.float64()), 0)
            ok = pc.not_equal(sw, pa.scalar(0.0))
            cols[name] = pc.if_else(
                ok, pc.divide(swx, pc.if_else(ok, sw, pa.scalar(1.0))),
                pa.nulls(len(raw), pa.float64()))
        elif kind in ("cov", "corr", "slope", "intercept"):
            n = pc.cast(pc.fill_null(raw[f"{name}__n_sum"], 0),
                        pa.float64())
            sx = pc.fill_null(pc.cast(raw[f"{name}__sx_sum"],
                                      pa.float64()), 0)
            sy = pc.fill_null(pc.cast(raw[f"{name}__sy_sum"],
                                      pa.float64()), 0)
            sxy = pc.fill_null(pc.cast(raw[f"{name}__sxy_sum"],
                                       pa.float64()), 0)
            ok = pc.greater(n, 1)
            nn = pc.if_else(ok, n, pa.scalar(2.0))
            covn = pc.subtract(sxy, pc.divide(pc.multiply(sx, sy), nn))
            if kind == "cov":
                v = pc.divide(covn, pc.subtract(nn, pa.scalar(1.0)))
            elif kind in ("slope", "intercept"):
                # least-squares y-on-x; op order is the public contract
                # (oracles mirror it): slope = (Σxy − ΣxΣy/n) /
                # (Σx² − ΣxΣx/n); intercept = Σy/n − slope·(Σx/n).
                # Degenerate x (zero variance) → null, incl. n == 1.
                sxx = pc.fill_null(pc.cast(raw[f"{name}__sxx_sum"],
                                           pa.float64()), 0)
                vxn = pc.subtract(sxx, pc.divide(pc.multiply(sx, sx), nn))
                ok = pc.and_(ok, pc.not_equal(vxn, pa.scalar(0.0)))
                slope = pc.divide(covn,
                                  pc.if_else(ok, vxn, pa.scalar(1.0)))
                if kind == "slope":
                    v = slope
                else:
                    v = pc.subtract(pc.divide(sy, nn),
                                    pc.multiply(slope, pc.divide(sx, nn)))
            else:
                sxx = pc.fill_null(pc.cast(raw[f"{name}__sxx_sum"],
                                           pa.float64()), 0)
                syy = pc.fill_null(pc.cast(raw[f"{name}__syy_sum"],
                                           pa.float64()), 0)
                vx = pc.subtract(sxx, pc.divide(pc.multiply(sx, sx), nn))
                vy = pc.subtract(syy, pc.divide(pc.multiply(sy, sy), nn))
                v = pc.divide(covn, pc.sqrt(pc.multiply(vx, vy)))
            cols[name] = pc.if_else(ok, v, pa.nulls(len(raw),
                                                    pa.float64()))
        elif name in py_specs:
            cols[name] = None  # filled below, aligned on sorted __gk

    if py_specs:
        gk = g["__gk"].combine_chunks()
        codes = np.asarray(pc.dictionary_encode(gk).indices)
        # Arrow's sort order (consistent with raw.sort_by above)
        order = np.asarray(pc.sort_indices(gk))
        sorted_codes = codes[order]
        seg_starts = np.concatenate(
            [[0], np.nonzero(sorted_codes[1:] != sorted_codes[:-1])[0] + 1]
        )
        seg_ends = np.concatenate([seg_starts[1:], [len(sorted_codes)]])
        for name, (kind, *_r) in py_specs.items():
            vals = []
            if kind in ("set", "nunique"):
                col = g[f"{name}__set"].combine_chunks()
                for s0, s1 in zip(seg_starts, seg_ends):
                    flat = pc.list_flatten(col.take(pa.array(order[s0:s1], pa.int64())))
                    uniq = {str(v) for v in flat.to_pylist() if v is not None}
                    vals.append(sorted(uniq) if kind == "set" else len(uniq))
                cols[name] = pa.array(
                    vals, pa.list_(pa.string()) if kind == "set" else pa.int64()
                )
            elif kind == "approx_nunique":
                from vector_ray.stages.sketch import HLL

                col = g[f"{name}__sk"]
                for s0, s1 in zip(seg_starts, seg_ends):
                    h = HLL()
                    for i in order[s0:s1]:
                        blob = col[int(i)].as_py()
                        if blob is not None:
                            h.merge_bytes(blob)
                    vals.append(h.estimate())
                cols[name] = pa.array(vals, pa.int64())
            elif kind == "histogram":
                import json as _json
                import pickle

                col = g[f"{name}__sk"]
                for s0, s1 in zip(seg_starts, seg_ends):
                    hg = None
                    for i in order[s0:s1]:
                        blob = col[int(i)].as_py()
                        if blob is None:
                            continue
                        other = pickle.loads(blob)
                        hg = other if hg is None else hg.merge(other)
                    vals.append(_json.dumps(hg.to_dict()) if hg else None)
                cols[name] = pa.array(vals, pa.string())
            else:
                raise ValueError(f"unknown agg kind {kind}")
    return pa.table(cols)


def _final_merge_fn(keys, specs):
    """Per-group merge callback for direct ``groupby(keys).map_groups``
    use (flagship's ~150-group final merge): synthesizes ``__gk`` and
    delegates to the vectorized bucket merge. For high-cardinality keys
    use ``grouped_aggregate`` (bucketed) instead."""

    def merge(g: pa.Table) -> pa.Table:
        return _merge_bucket(_gk_batch(g, keys), keys, specs)

    return merge


def grouped_aggregate(
    ds,
    keys: Sequence[str],
    specs: Dict[str, Tuple[str, str]],
    *,
    batch_size: Optional[int] = None,
):
    """Two-phase grouped aggregate.

    ``specs``: out_col → (kind, in_col), kind ∈ {sum, count, min, max,
    mean, var, std, set, nunique, approx_nunique, histogram, last,
    first} plus the two-column kinds (kind, x_col, y_col) ∈ {cov,
    corr, wmean, slope, intercept} (least-squares y-on-x — SQL
    regr_slope / regr_intercept). `count` counts non-null of in_col;
    var/std are sample (ddof=1) via mergeable (n, Σx, Σx²) partials.
    """
    keys = list(keys)
    # spec tuple: (kind, col[, options]) — kinds: sum count min max mean
    # set nunique last first approx_nunique histogram(bounds)
    partial = ds.map_batches(
        lambda t: _gk_batch(_partial_batch(t, keys, specs), keys),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    # coalesce the (tiny) partial blocks so the final shuffle doesn't pay
    # per-block overhead for hundreds of near-empty blocks
    partial = partial.repartition(8)
    # bucketed final merge: one Arrow hash-aggregate per hash BUCKET of
    # group keys (O(buckets) Python calls), not one callback per group
    from vector_ray.stages.bucketed import bucketed_map_groups

    return bucketed_map_groups(
        partial, ["__gk"], lambda g: _merge_bucket(g, keys, specs)
    )


# ---------------------------------------------------------------------------
# log_to_metric


class LogToMetric(Step):
    """Project log rows → metric rows (log_to_metric.rs:27-78).

    Each metric config is a dict:
      {"type": "counter"|"gauge"|"set"|"histogram",
       "field": <source column>      (value source; counters without
                                      increment_by_value just count rows),
       "name": <metric name, may contain {{field}} templates>,
       "increment_by_value": bool,
       "tags": {tag: "{{field}}" | literal}}

    Output schema (one row per input row per metric config):
      name:string, kind:string ("incremental"/"absolute"),
      metric_type:string, value:float64, svalue:string (set member),
      + one column per tag key (missing tags null).
    """

    fusable = True

    def __init__(self, metrics: Sequence[dict]):
        self.metrics = list(metrics)
        self.tag_keys: list[str] = []
        for m in self.metrics:
            for k in m.get("tags", {}):
                if k not in self.tag_keys:
                    self.tag_keys.append(k)

    def batch_fn(self):
        return self.transform

    def transform(self, tbl: pa.Table) -> pa.Table:
        parts = []
        n = len(tbl)
        for m in (self.metrics if n > 0 else []):
            mtype = m["type"]
            name = m["name"]
            field = m.get("field")
            # rows where the source field exists (non-null) emit a metric
            if field is not None and field in tbl.column_names:
                valid = pc.is_valid(tbl[field])
            else:
                valid = pa.array([True] * n)
            sub = tbl.filter(valid)
            ln = len(sub)
            if ln == 0:
                continue
            name_col = F.render(sub, name) if "{{" in name else F.const(ln, name)
            if mtype == "counter" and m.get("increment_by_value"):
                value = pc.cast(sub[field], pa.float64())
            elif mtype == "counter":
                value = F.const(ln, 1.0, pa.float64())
            elif mtype in ("gauge", "histogram", "summary"):
                value = pc.cast(sub[field], pa.float64())
            elif mtype == "set":
                value = F.const(ln, 1.0, pa.float64())
            else:
                raise ValueError(f"unknown metric type {mtype}")
            svalue = (
                pc.cast(sub[field], pa.string())
                if mtype == "set"
                else pa.nulls(ln, pa.string())
            )
            kind = "absolute" if mtype == "gauge" else "incremental"
            cols = {
                "name": name_col,
                "kind": F.const(ln, kind),
                "metric_type": F.const(ln, mtype),
                "value": value,
                "svalue": svalue,
            }
            for tk in self.tag_keys:
                tv = m.get("tags", {}).get(tk)
                if tv is None:
                    cols[tk] = pa.nulls(ln, pa.string())
                elif isinstance(tv, str) and "{{" in tv:
                    cols[tk] = pc.cast(F.render(sub, tv), pa.string())
                else:
                    cols[tk] = F.const(ln, str(tv))
            parts.append(pa.table(cols))
        if not parts:
            # empty, schema-stable
            cols = {
                "name": pa.array([], pa.string()),
                "kind": pa.array([], pa.string()),
                "metric_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "svalue": pa.array([], pa.string()),
            }
            for tk in self.tag_keys:
                cols[tk] = pa.array([], pa.string())
            return pa.table(cols)
        return pa.concat_tables(parts)

    def apply(self, ds):
        return ds.map_batches(self.transform, batch_format="pyarrow", zero_copy_batch=True)


class Aggregate(Step):
    """Metric-series aggregate (aggregate.rs:72-107): group by
    (name, metric_type, tags...); counters/sets/histograms merge by
    kind; output one row per series.

    counter → sum(value); gauge (absolute) → last value; set →
    distinct count of svalue; histogram → count/sum/min/max of value.
    """

    fusable = False

    def __init__(self, tag_keys: Sequence[str] = ()):
        self.tag_keys = list(tag_keys)

    def apply(self, ds):
        keys = ["name", "metric_type"] + self.tag_keys
        specs = {
            "value_sum": ("sum", "value"),
            "value_last": ("last", "value"),
            "value_min": ("min", "value"),
            "value_max": ("max", "value"),
            "n": ("count", "value"),
            "distinct_members": ("set", "svalue"),
        }
        merged = grouped_aggregate(ds, keys, specs)

        def finalize(t: pa.Table) -> pa.Table:
            mt = t["metric_type"]
            is_counter = pc.equal(mt, "counter")
            is_gauge = pc.equal(mt, "gauge")
            is_set = pc.equal(mt, "set")
            set_sizes = pc.cast(pc.list_value_length(
                pc.if_else(pc.is_valid(t["distinct_members"]), t["distinct_members"],
                           pa.scalar([], pa.list_(pa.string())))
            ), pa.float64())
            value = pc.if_else(
                is_counter,
                t["value_sum"],
                pc.if_else(is_gauge, t["value_last"], pc.if_else(is_set, set_sizes, t["value_sum"])),
            )
            out = t.append_column("value", value)
            return out

        return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mode(ds, keys: Sequence[str], col: str, *, out: str = "mode",
                 buckets: int | None = None):
    """Most frequent ``col`` value per key (ties → smallest value —
    deterministic, unlike SQL ``mode()``): the grouped count table
    (one row per distinct (key, value) — already aggregate-sized, the
    only thing that shuffles) is bucketed by key hash and each bucket
    takes the (count desc, value asc) head of every key via one sort +
    run-start mask — no per-group Python."""
    import numpy as np

    from vector_ray.stages.bucketed import bucketed_map_groups

    keys = list(keys)
    counts = grouped_aggregate(ds, keys + [col], {"__n": ("count", col)})

    def head_per_key(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table({k: g[k] for k in keys} | {out: g[col]})
        order = pc.sort_indices(g, sort_keys=[(k, "ascending")
                                              for k in keys]
                                + [("__n", "descending"),
                                   (col, "ascending")])
        g = g.take(order)
        kcols = [np.asarray(pc.cast(g[k], pa.string())
                            .to_numpy(zero_copy_only=False)) for k in keys]
        first = np.zeros(len(g), bool)
        first[0] = True
        for kc in kcols:
            first[1:] |= kc[1:] != kc[:-1]
        sel = g.filter(pa.array(first))
        return pa.table({k: sel[k] for k in keys} | {out: sel[col]})

    return bucketed_map_groups(counts, keys, head_per_key,
                               num_buckets=buckets)


def grouped_argmax(ds, keys, x_col: str, *, tie_col: str,
                   keep=None, num_buckets=None):
    """Per key, the whole row at the MAXIMUM of ``x_col`` (SQL
    ``arg_max`` / ``QUALIFY row_number() OVER (PARTITION BY keys ORDER
    BY x DESC, tie) = 1``) — deterministic via the ascending
    ``tie_col``. One hash-bucket shuffle + a vectorized sorted-run
    keep-first per bucket (stages/bucketed.bucketed_first), never a
    per-group Python call. ``keep`` optionally projects columns first
    (do this — only shipped columns shuffle)."""
    from vector_ray.stages.bucketed import bucketed_first

    keys = list(keys)
    if keep is not None:
        cols = list(dict.fromkeys(keys + [x_col, tie_col] + list(keep)))
        ds = ds.map_batches(lambda t, _c=cols: t.select(_c),
                            batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_first(
        ds, keys,
        order_by=[(x_col, "descending"), (tie_col, "ascending")],
        num_buckets=num_buckets)


def grouped_argmin(ds, keys, x_col: str, *, tie_col: str,
                   keep=None, num_buckets=None):
    """Per key, the whole row at the MINIMUM of ``x_col`` — see
    :func:`grouped_argmax`."""
    from vector_ray.stages.bucketed import bucketed_first

    keys = list(keys)
    if keep is not None:
        cols = list(dict.fromkeys(keys + [x_col, tie_col] + list(keep)))
        ds = ds.map_batches(lambda t, _c=cols: t.select(_c),
                            batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_first(
        ds, keys,
        order_by=[(x_col, "ascending"), (tie_col, "ascending")],
        num_buckets=num_buckets)
