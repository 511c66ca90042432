"""Ordered-sequence funnel analysis — "of the users who did A, how
many then did B, then C?" — the event-analytics staple the reference's
stream topology leaves to downstream warehouses. One row per key that
has at least one funnel-stage event, with the first timestamp of each
completed stage (stage i+1 must occur STRICTLY AFTER the first stage-i
completion) and a ``stages_completed`` count.

Plan: a map-only prefilter keeps only rows whose type is a funnel
stage and projects (key, ts, stage-code) — at 10^12 events the shuffle
carries just the funnel-relevant triples, never payloads — then ONE
hash-bucket shuffle (stages/bucketed.py) and, per bucket, one
(key, ts) lexsort plus one ``np.minimum.reduceat`` chain per stage
(first A per key; first B with ts > t_A; …), all vectorized across the
bucket's keys — a hot key is just a longer contiguous run. The chain
arithmetic is integer timestamp comparison, so results are
bit-identical on any partitioning (plain-SQL oracle: chained
MIN-after-threshold joins)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.bucketed import bucketed_map_groups

_SENT = np.iinfo(np.int64).max


def funnel(ds, stages: Sequence[str], *, key: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           num_buckets=None):
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel: need at least 2 stages")
    stage_arr = pa.array(stages, pa.string())

    def prefilter(t: pa.Table) -> pa.Table:
        code = pc.index_in(t[type_col], value_set=stage_arr)
        keep = pc.is_valid(code)
        return pa.table({
            key: t[key].filter(keep),
            "__ts": pc.cast(t[ts_col], pa.int64()).filter(keep),
            "__st": pc.cast(code, pa.int8()).filter(keep),
        })

    narrow = ds.map_batches(prefilter, batch_format="pyarrow",
                            zero_copy_batch=True)
    sch = ds.schema()
    ts_type = getattr(sch, "base_schema", sch).field(ts_col).type

    def per_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            cols = {key: g[key]}
            for name in stages:
                cols[f"t_{name}"] = pa.array([], pa.int64()).cast(ts_type)
            cols["stages_completed"] = pa.array([], pa.int64())
            return pa.table(cols)
        keys = np.asarray(g[key])
        ts = np.asarray(g["__ts"], np.int64)
        st = np.asarray(g["__st"], np.int64)
        o = np.lexsort((ts, keys))
        keys, ts, st = keys[o], ts[o], st[o]
        starts = np.flatnonzero(np.concatenate(
            [[True], keys[1:] != keys[:-1]]))
        seg_lens = np.diff(np.append(starts, len(keys)))
        seg_of_row = np.repeat(np.arange(len(starts)), seg_lens)

        firsts = []
        prev = np.full(len(starts), -1, np.int64)  # ts > -1: all pass
        for si in range(len(stages)):
            thresh = prev[seg_of_row]
            cand = np.where((st == si) & (ts > thresh), ts, _SENT)
            first = np.minimum.reduceat(cand, starts)
            firsts.append(first)
            prev = first
        done = np.zeros(len(starts), np.int64)
        alive = np.ones(len(starts), bool)
        for f in firsts:
            alive &= f != _SENT
            done += alive

        cols = {key: pa.array(keys[starts])}
        for name, f in zip(stages, firsts):
            valid = pa.array(f != _SENT)
            arr = pc.if_else(valid, pa.array(f, pa.int64()),
                             pa.scalar(None, pa.int64()))
            cols[f"t_{name}"] = arr.cast(ts_type)
        cols["stages_completed"] = pa.array(done, pa.int64())
        return pa.table(cols)

    return bucketed_map_groups(narrow, [key], per_bucket,
                               num_buckets=num_buckets)


def retention_cohorts(ds, *, key: str = "user_id", ts_col: str = "ts",
                      period_s: int = 604_800, num_buckets=None):
    """Cohort retention — "of the users whose FIRST event fell in
    period P, how many were active again in P+k?" — the other
    event-analytics staple. Output: one row per (cohort_period,
    period_offset) with the distinct-user count.

    Plan: map-only projection to (key, integer period index: floor of
    epoch-µs / period — exact integer arithmetic, partitioning-proof),
    ONE hash-bucket shuffle on the key, per bucket a lexsort +
    run-segmentation pass that emits each user's (cohort, offset)
    DISTINCT pairs pre-aggregated to (cohort, offset, n) partials, then
    a final small grouped sum — per-bucket output is bounded by
    (#cohorts × #offsets), never by user count, so the second exchange
    is tiny at any scale. Oracle: ANSI MIN-over-user + DISTINCT-period
    GROUP BY."""

    def prefilter(t: pa.Table) -> pa.Table:
        us = np.asarray(pc.cast(t[ts_col], pa.int64())
                        .to_numpy(zero_copy_only=False), np.int64)
        per = us // (period_s * 1_000_000)
        return pa.table({key: t[key],
                         "__per": pa.array(per, pa.int64())})

    narrow = ds.map_batches(prefilter, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table({"cohort_period": pa.array([], pa.int64()),
                             "period_offset": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        keys = np.asarray(g[key])
        per = np.asarray(g["__per"], np.int64)
        o = np.lexsort((per, keys))
        keys, per = keys[o], per[o]
        new_user = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.flatnonzero(new_user)
        seg_lens = np.diff(np.append(starts, len(keys)))
        cohort = np.repeat(per[starts], seg_lens)
        offset = per - cohort
        # distinct (user, offset): sorted within user, so dedupe runs
        first = new_user | np.concatenate([[True], offset[1:] != offset[:-1]])
        pairs = np.stack([cohort[first], offset[first]], axis=1)
        uq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({
            "cohort_period": pa.array(uq[:, 0], pa.int64()),
            "period_offset": pa.array(uq[:, 1], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    parts = bucketed_map_groups(narrow, [key], per_bucket,
                                num_buckets=num_buckets)
    from vector_ray.stages.aggregate import grouped_aggregate

    return grouped_aggregate(parts, ["cohort_period", "period_offset"],
                             {"n": ("sum", "n")})
