"""Interval algebra over keyed spans — merge overlapping/touching
intervals per key (gaps-and-islands), the span-union step behind
time-range dedup, session stitching, annotation-span cleanup and
coverage accounting.

Plan: ONE hash-bucket shuffle of the narrow (key, start, end) triples
(stages/bucketed.bucketed_map_groups — O(buckets) Python calls); each
bucket sorts by (key, start, end) once and segments islands with flat
numpy passes — the within-key running max of interval ends is a
segmented inclusive scan (Hillis-Steele doubling, O(n log n) fully
vectorized, no per-key Python loop), so key skew is fine: a hot key's
rows are one contiguous vectorized run. Payload columns never move —
join them back on the emitted span if needed.

Capability absent in the reference (no windowed/interval operators in
its topology; SURVEY.md §2.7). Pairs with stages/join.range_join
(point-in-interval lookup) and stages/window.session_windows (gap-based
event grouping): this is the set-union view of the spans themselves.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _segmented_cummax(x: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """Inclusive running max of ``x`` that resets where ``seg_start``
    is True. Hillis-Steele doubling scan: each pass is a synchronous
    whole-array np.maximum over a shifted copy, masked so a row never
    reads across its own segment start — O(n log L) for max segment
    length L, no per-segment Python loop."""
    n = len(x)
    res = x.copy()
    if n == 0:
        return res
    seg_id = np.cumsum(seg_start) - 1
    starts = np.flatnonzero(seg_start)
    pos = np.arange(n) - starts[seg_id]  # offset within own segment
    maxpos = int(pos.max())
    shift = 1
    while shift <= maxpos:
        idx = np.flatnonzero(pos >= shift)
        # RHS evaluates on the pre-pass snapshot (fancy indexing
        # copies), so the pass is synchronous
        res[idx] = np.maximum(res[idx], res[idx - shift])
        shift <<= 1
    return res


def merge_intervals(
    ds,
    keys: Union[str, Sequence[str]],
    start_col: str,
    end_col: str,
    *,
    out_start: Optional[str] = None,
    out_end: Optional[str] = None,
    min_gap: int = 0,
    count_col: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Union the [start, end] intervals per key: a span starts a new
    island iff its start exceeds the running max end of its key's
    previous spans by more than ``min_gap`` (so touching spans merge
    at the default 0, and ``min_gap > 0`` bridges small gaps — the
    session-stitching semantics). Returns one row per island:
    (keys..., out_start, out_end[, count_col]) where the island's end
    is the max member end and ``count_col`` (optional) counts merged
    source spans.

    Rows with a null key, start or end are dropped (a span must be
    fully specified); ``end < start`` raises inside the task; identical
    spans merge like any overlap."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    o_s = out_start or start_col
    o_e = out_end or end_col

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    def narrow(t: pa.Table) -> pa.Table:
        t = t.select(keys + [start_col, end_col])
        mask = pc.and_(pc.is_valid(t[start_col]), pc.is_valid(t[end_col]))
        for k in keys:
            mask = pc.and_(mask, pc.is_valid(t[k]))
        return t.filter(mask)

    def bucket(g: pa.Table) -> pa.Table:
        sch = g.schema
        if len(g) == 0:
            cols = {k: pa.array([], sch.field(k).type) for k in keys}
            cols[o_s] = pa.array([], sch.field(start_col).type)
            cols[o_e] = pa.array([], sch.field(end_col).type)
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        g = g.combine_chunks().sort_by(
            [(k, "ascending") for k in keys]
            + [(start_col, "ascending"), (end_col, "ascending")])
        s = np.asarray(g[start_col].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        e = np.asarray(g[end_col].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        if (e < s).any():
            bad = int(np.flatnonzero(e < s)[0])
            raise ValueError(
                f"merge_intervals: end < start at sorted row {bad} "
                f"({e[bad]!r} < {s[bad]!r})")
        new_key = _run_starts(g, keys)
        cme = _segmented_cummax(e, new_key)
        brk = new_key.copy()
        if len(s) > 1:
            same_key = ~new_key[1:]
            brk[1:] |= same_key & (s[1:] > cme[:-1] + min_gap)
        starts_idx = np.flatnonzero(brk)
        seg_end = np.maximum.reduceat(e, starts_idx)
        cnt = np.diff(np.append(starts_idx, len(s)))
        take = pa.array(starts_idx, pa.int64())
        cols = {k: g[k].combine_chunks().take(take) for k in keys}
        cols[o_s] = g[start_col].combine_chunks().take(take)
        cols[o_e] = pa.array(seg_end, type=sch.field(end_col).type)
        if count_col:
            cols[count_col] = pa.array(cnt.astype(np.int64), pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)
    return bucketed_map_groups(slim, keys, bucket,
                               num_buckets=num_buckets)


def _segment_searchsorted(
    vals: np.ndarray,
    vseg: np.ndarray,
    qry: np.ndarray,
    qseg: np.ndarray,
    nseg: int,
    lo_ext: np.ndarray,
    hi_ext: np.ndarray,
    side: str,
) -> np.ndarray:
    """Per-segment searchsorted: for each query value, the insertion
    index into ITS OWN segment's slice of ``vals`` (``vals`` sorted
    within segments, segments stored in id order). ONE global
    searchsorted over a shifted space where segment k's extent
    [lo_ext[k], hi_ext[k]] maps to a disjoint int64 range; a query in
    a value-less segment lands between neighbouring ranges, so its
    left/right insertion points coincide and the count is 0.
    ``lo_ext``/``hi_ext`` must bound BOTH arrays' values per segment.
    Raises OverflowError if the shifted space exceeds int64 (callers
    fall back to a per-segment loop)."""
    # subtract in object space — int64 (hi - lo) itself can wrap
    width_total = int(
        np.sum(hi_ext.astype(object) - lo_ext.astype(object))) + nseg
    if width_total >= np.iinfo(np.int64).max // 2:
        raise OverflowError("segment space exceeds int64")
    base = np.zeros(nseg, np.int64)
    if nseg > 1:
        base[1:] = np.cumsum((hi_ext - lo_ext + 1)[:-1])
    v2 = vals - lo_ext[vseg] + base[vseg]
    q2 = qry - lo_ext[qseg] + base[qseg]
    return np.searchsorted(v2, q2, side=side)


def interval_join(
    left,
    right,
    *,
    keys: Union[str, Sequence[str]],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    chunk: int,
    suffix: str = "_r",
    max_group: int = 2_000_000,
    num_buckets: Optional[int] = None,
):
    """Interval-OVERLAP inner join: every (left, right) row pair with
    the same key whose closed spans intersect (``l_start <= r_end AND
    r_start <= l_end``) — the span-annotation / outage-vs-deploy /
    time-range-reconciliation shape. stages/join.range_join covers
    only point-in-window with non-overlapping windows, and
    broadcast_cross_join is O(|L|·|R|); this is the scalable
    span-vs-span form.

    Plan: each side replicates its rows to every ``chunk``-sized time
    slab its span covers (replication factor = span/chunk + 1 — size
    ``chunk`` near the typical span), both sides are padded to ONE
    shared schema (typed nulls for the other side's payload — block
    schemas must be identical for the union) and make ONE hash
    exchange on (keys…, slab). Inside a bucket every (key, slab)
    group resolves with two contiguous-range enumerations over
    start-sorted sides: pairs with r.start >= l.start have r.start ∈
    [l.start, l.end]; pairs with l.start > r.start have l.start ∈
    (r.start, r.end] — candidate generation IS the result (no
    post-filter; work is O(output)). A pair is emitted only in the
    slab containing max(l.start, r.start) — a point both spans cover,
    so exactly one replica pair survives and cross-slab duplicates
    never exist. ``max_group`` caps per-(key, slab) rows per side and
    fails fast with advice to shrink ``chunk``. Rows with a null key
    or bound are dropped; ``end < start`` raises inside the task."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if chunk < 1:
        raise ValueError(f"interval_join: chunk must be >= 1, got {chunk}")

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    l_sch = left.schema()
    r_sch = right.schema()
    l_names = list(l_sch.names)
    r_names = list(r_sch.names)
    for k in keys + [l_start, l_end]:
        if k not in l_names:
            raise ValueError(f"interval_join: left lacks column {k!r}")
    for k in keys + [r_start, r_end]:
        if k not in r_names:
            raise ValueError(f"interval_join: right lacks column {k!r}")
    # right payload columns clashing with left names get the suffix
    ren = {c: c + suffix for c in r_names
           if c not in keys and c in set(l_names)}
    l_types = dict(zip(l_sch.names, l_sch.types))
    r_types = {ren.get(c, c): t for c, t in zip(r_sch.names, r_sch.types)}
    rs_name = ren.get(r_start, r_start)
    re_name = ren.get(r_end, r_end)
    l_payload = [c for c in l_names if c not in keys]
    r_payload = [ren.get(c, c) for c in r_names if c not in keys]
    out_cols = keys + l_payload + r_payload

    _SLAB = "__iv_slab"
    _SIDE = "__iv_side"

    def replicate(start_col, end_col, side_tag, rename):
        def fn(t: pa.Table) -> pa.Table:
            mask = pc.and_(pc.is_valid(t[start_col]),
                           pc.is_valid(t[end_col]))
            for k in keys:
                mask = pc.and_(mask, pc.is_valid(t[k]))
            t = t.filter(mask)
            s = np.asarray(pc.cast(t[start_col], pa.int64())
                           .combine_chunks()
                           .to_numpy(zero_copy_only=False), np.int64)
            e = np.asarray(pc.cast(t[end_col], pa.int64())
                           .combine_chunks()
                           .to_numpy(zero_copy_only=False), np.int64)
            if (e < s).any():
                bad = int(np.flatnonzero(e < s)[0])
                raise ValueError(
                    f"interval_join: end < start at row {bad} "
                    f"({e[bad]!r} < {s[bad]!r})")
            c0 = np.floor_divide(s, np.int64(chunk))
            reps = np.floor_divide(e, np.int64(chunk)) - c0 + 1
            idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
            off = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps)
            out = t.take(pa.array(idx))
            if rename:
                out = out.rename_columns(
                    [rename.get(c, c) for c in out.column_names])
            # pad to the shared union schema with typed nulls and fix
            # the column order — block schemas must line up exactly
            cols = {}
            for c in out_cols:
                typ = l_types.get(c, r_types.get(c))
                if c in out.column_names:
                    # cast (no-op when equal) so both sides' block
                    # schemas agree exactly for the union
                    cols[c] = pc.cast(out[c], typ)
                else:
                    cols[c] = pa.nulls(len(out), typ)
            cols[_SLAB] = pa.array(c0[idx] + off, pa.int64())
            cols[_SIDE] = pa.array(
                np.full(len(idx), side_tag, np.int8), pa.int8())
            return pa.table(cols)

        return fn

    lrep = left.map_batches(replicate(l_start, l_end, 0, None),
                            batch_format="pyarrow", zero_copy_batch=True)
    rrep = right.map_batches(replicate(r_start, r_end, 1, ren),
                             batch_format="pyarrow", zero_copy_batch=True)
    both = lrep.union(rrep)

    def col64(g: pa.Table, name: str) -> np.ndarray:
        arr = g[name]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return np.asarray(
            pc.cast(pc.fill_null(pc.cast(arr, pa.int64()), 0), pa.int64())
            .to_numpy(zero_copy_only=False), np.int64)

    def bucket(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table({
                c: pa.array([], l_types.get(c, r_types.get(c)))
                for c in out_cols})

        if len(g) == 0:
            return empty()
        g = g.combine_chunks()
        side0 = np.asarray(g[_SIDE].combine_chunks()
                           .to_numpy(zero_copy_only=False), np.int8)
        s_all = np.where(side0 == 0, col64(g, l_start), col64(g, rs_name))
        e_all = np.where(side0 == 0, col64(g, l_end), col64(g, re_name))
        g = g.append_column("__s_all", pa.array(s_all, pa.int64()))
        g = g.sort_by([(k, "ascending") for k in keys]
                      + [(_SLAB, "ascending"), (_SIDE, "ascending"),
                         ("__s_all", "ascending")])
        side = np.asarray(g[_SIDE].combine_chunks()
                          .to_numpy(zero_copy_only=False), np.int8)
        s_all = np.where(side == 0, col64(g, l_start), col64(g, rs_name))
        e_all = np.where(side == 0, col64(g, l_end), col64(g, re_name))
        slab = np.asarray(g[_SLAB].combine_chunks()
                          .to_numpy(zero_copy_only=False), np.int64)
        grp_start = _run_starts(g, keys + [_SLAB])
        grp_id = np.cumsum(grp_start) - 1
        nseg = int(grp_id[-1]) + 1
        starts_idx = np.flatnonzero(grp_start)
        lo_ext = np.minimum.reduceat(s_all, starts_idx)
        hi_ext = np.maximum.reduceat(e_all, starts_idx)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        if l_idx.size == 0 or r_idx.size == 0:
            return empty()
        cl = np.bincount(grp_id[l_idx], minlength=nseg).max()
        cr = np.bincount(grp_id[r_idx], minlength=nseg).max()
        if cl > max_group or cr > max_group:
            raise ValueError(
                "interval_join: a (key, slab) group exceeds max_group="
                f"{max_group} rows on one side; shrink chunk= so fewer "
                "spans share a slab, or raise max_group")

        def enum_pairs(q_idx, v_idx, q_s, q_e, strict):
            """For every query row, its contiguous v-range with v.start
            in [q_s, q_e] (strict: (q_s, q_e]) inside the same (key,
            slab) segment. Returns expanded (query, value) row ids."""
            vs = s_all[v_idx]
            vseg = grp_id[v_idx]
            qseg = grp_id[q_idx]
            try:
                lo = _segment_searchsorted(
                    vs, vseg, q_s, qseg, nseg, lo_ext, hi_ext,
                    "right" if strict else "left")
                hi = _segment_searchsorted(
                    vs, vseg, q_e, qseg, nseg, lo_ext, hi_ext, "right")
            except OverflowError:
                lo = np.empty(len(q_idx), np.int64)
                hi = np.empty(len(q_idx), np.int64)
                vbound = np.searchsorted(vseg, np.arange(nseg + 1))
                for j in range(len(q_idx)):
                    a, b = vbound[qseg[j]], vbound[qseg[j] + 1]
                    lo[j] = a + np.searchsorted(
                        vs[a:b], q_s[j],
                        side="right" if strict else "left")
                    hi[j] = a + np.searchsorted(vs[a:b], q_e[j],
                                                side="right")
            n_pair = (hi - lo).clip(min=0)
            qi = np.repeat(np.arange(len(q_idx), dtype=np.int64), n_pair)
            vi = (np.arange(int(n_pair.sum()), dtype=np.int64)
                  - np.repeat(np.cumsum(n_pair) - n_pair, n_pair)
                  + lo[qi])
            return q_idx[qi], v_idx[vi]

        # pairs with r.start >= l.start: r.start in [l.start, l.end]
        la, rb = enum_pairs(l_idx, r_idx, s_all[l_idx], e_all[l_idx],
                            strict=False)
        # pairs with l.start > r.start: l.start in (r.start, r.end]
        rb2, la2 = enum_pairs(r_idx, l_idx, s_all[r_idx], e_all[r_idx],
                              strict=True)
        L = np.concatenate([la, la2])
        R = np.concatenate([rb, rb2])
        # emit only in the slab containing max(l.start, r.start)
        mx = np.maximum(s_all[L], s_all[R])
        keep = np.floor_divide(mx, np.int64(chunk)) == slab[L]
        L, R = L[keep], R[keep]
        lt = pa.array(L, pa.int64())
        rt = pa.array(R, pa.int64())
        cols = {}
        for c in keys + l_payload:
            cols[c] = g[c].combine_chunks().take(lt)
        for c in r_payload:
            cols[c] = g[c].combine_chunks().take(rt)
        return pa.table(cols)

    return bucketed_map_groups(both, keys + [_SLAB], bucket,
                               num_buckets=num_buckets)
