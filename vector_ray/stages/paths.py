"""Session-path mining — the "top user journeys" analytics staple:
sessionize a keyed event stream by inactivity gap, render each
session's first ``max_steps`` event types as an ordered path string,
and return the ``k`` most frequent paths with session counts.

Plan: ONE narrow (key, ts, type) key-hash exchange; each bucket sorts
once and does everything with flat vectorized passes — gap breaks via
a shifted compare, per-session truncation via run-offset arithmetic,
path rendering via a ListArray over the sorted type column +
``pc.binary_join`` (no per-session Python), and a local path→count
histogram so only (path, cnt) partials leave the bucket. Then a
bucketed per-path sum and the two-phase global top-k merge (the
ml/corpus.vocab_topk shape). Ties at the k boundary break by path
ascending for determinism.

Capability absent in the reference (no windowed/sessionized operators
in its topology; SURVEY.md §2.7); pairs with stages/funnel.py
(ordered-stage conversion) and stages/window.session_windows
(gap-based aggregates) — this is the sequence-of-events view.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _local_path_topk(t: pa.Table, k: int) -> pa.Table:
    if len(t) <= k:
        return t
    order = pc.sort_indices(
        t, sort_keys=[("n_sessions", "descending"), ("path", "ascending")]
    )
    return t.take(order[:k])


def session_paths(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap: int,
    max_steps: int = 8,
    k: int = 20,
    sep: str = ">",
    tiebreak: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Top-``k`` (path, n_sessions) over gap-sessionized events. A new
    session starts when the same key's inter-event gap exceeds ``gap``
    (strictly; ``ts_col``'s integer unit). Only the first
    ``max_steps`` events of a session (in (ts, tiebreak) order) enter
    its path. Rows with a null key, timestamp or type are dropped."""
    if gap < 0:
        raise ValueError(f"session_paths: gap must be >= 0, got {gap}")
    if max_steps < 1 or k < 1:
        raise ValueError("session_paths: max_steps and k must be >= 1")

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    def narrow(t: pa.Table) -> pa.Table:
        cols = [key, ts_col, type_col] + ([tiebreak] if tiebreak else [])
        t = t.select(cols)
        mask = pc.and_(
            pc.and_(pc.is_valid(t[key]), pc.is_valid(t[ts_col])),
            pc.is_valid(t[type_col]),
        )
        return t.filter(mask)

    sort_keys = [(key, "ascending"), (ts_col, "ascending")]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "n_sessions": pa.array([], pa.int64())}
            )
        g = g.combine_chunks().sort_by(sort_keys)
        n = len(g)
        ts = np.asarray(
            pc.cast(g[ts_col], pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False),
            np.int64,
        )
        brk = _run_starts(g, [key])
        if n > 1:
            with np.errstate(over="ignore"):
                brk[1:] |= (ts[1:] - ts[:-1]) > np.int64(gap)
        sess_starts = np.flatnonzero(brk)
        sess_id = np.cumsum(brk) - 1
        pos = np.arange(n) - sess_starts[sess_id]
        kept = pos < max_steps
        # per-session kept length = min(session length, max_steps)
        sess_len = np.diff(np.append(sess_starts, n))
        kept_len = np.minimum(sess_len, max_steps)
        offsets = np.zeros(len(sess_starts) + 1, np.int32)
        np.cumsum(kept_len, out=offsets[1:])
        types = g[type_col].combine_chunks().filter(pa.array(kept))
        paths = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), types), sep
        )
        # local histogram: only (path, cnt) partials leave the bucket
        enc = pc.dictionary_encode(paths)
        cnt = np.bincount(
            np.asarray(enc.indices), minlength=len(enc.dictionary)
        )
        return pa.table(
            {"path": enc.dictionary,
             "n_sessions": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    slim = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    partial = bucketed_map_groups(slim, [key], bucket, num_buckets=num_buckets)

    def sum_paths(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return g
        g = g.combine_chunks().sort_by([("path", "ascending")])
        new = _run_starts(g, ["path"])
        starts = np.flatnonzero(new)
        cnt = np.asarray(g["n_sessions"].to_numpy(zero_copy_only=False), np.int64)
        sums = np.add.reduceat(cnt, starts)
        return pa.table(
            {"path": g["path"].combine_chunks().take(pa.array(starts, pa.int64())),
             "n_sessions": pa.array(sums, pa.int64())}
        )

    summed = bucketed_map_groups(partial, ["path"], sum_paths,
                                 num_buckets=num_buckets)
    local = summed.map_batches(
        lambda t: _local_path_topk(t, k), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    withg = local.map_batches(
        lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return withg.groupby("__g").map_groups(
        lambda g: _local_path_topk(g.drop_columns(["__g"]), k),
        batch_format="pyarrow",
    )
