"""Session labeling — assign every event its (session ordinal,
position-in-session) under gap-based sessionization, the row-level
view that stages/window.session_windows (aggregates) and
stages/paths.session_paths (journey strings) summarize. Needed when
downstream wants the raw events WITH session identity (e.g. packing
per-session examples, intra-session features).

Plan: ONE narrow (key, ts, id) key-hash exchange; each bucket sorts
once and labels with flat numpy passes (gap breaks via a shifted
compare, ordinals via cumsum re-based at key starts). Payload columns
never move — join them back on the id if needed.

Capability absent in the reference (no windowed/sessionized operators
in its topology; SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def assign_sessions(
    ds,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    *,
    gap: int,
    id_cols: Optional[Sequence[str]] = None,
    out_session: str = "session_seq",
    out_pos: str = "session_pos",
    tiebreak: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Label each row with its 0-based session ordinal per key (a new
    session starts when the same key's inter-event gap strictly
    exceeds ``gap``, in ``ts_col``'s integer unit) and its 0-based
    position inside that session (ordered by (ts, tiebreak)). Returns
    (keys…, id_cols…, ts_col, out_session, out_pos); ``id_cols``
    defaults to every non-key non-ts column already selected in
    ``ds`` — select upstream so only identity columns ride the
    exchange. Rows with a null key or timestamp are dropped."""
    if gap < 0:
        raise ValueError(f"assign_sessions: gap must be >= 0, got {gap}")
    keys = [keys] if isinstance(keys, str) else list(keys)

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    schema_names = ds.schema().names
    if id_cols is None:
        id_cols = [c for c in schema_names
                   if c not in keys and c != ts_col]
    id_cols = list(id_cols)

    def narrow(t: pa.Table) -> pa.Table:
        t = t.select(keys + [ts_col] + id_cols)
        mask = pc.is_valid(t[ts_col])
        for k in keys:
            mask = pc.and_(mask, pc.is_valid(t[k]))
        return t.filter(mask)

    sort_keys = [(k, "ascending") for k in keys] + [(ts_col, "ascending")]
    if tiebreak:
        sort_keys.append((tiebreak, "ascending"))

    def bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return (g.append_column(out_session,
                                    pa.array([], pa.int64()))
                     .append_column(out_pos, pa.array([], pa.int64())))
        g = g.combine_chunks().sort_by(sort_keys)
        n = len(g)
        ts = np.asarray(pc.cast(g[ts_col], pa.int64()).combine_chunks()
                        .to_numpy(zero_copy_only=False), np.int64)
        new_key = _run_starts(g, keys)
        brk = new_key.copy()
        if n > 1:
            with np.errstate(over="ignore"):
                brk[1:] |= (ts[1:] - ts[:-1]) > np.int64(gap)
        sess_global = np.cumsum(brk) - 1
        key_starts = np.flatnonzero(new_key)
        key_id = np.cumsum(new_key) - 1
        session_seq = sess_global - sess_global[key_starts][key_id]
        sess_starts = np.flatnonzero(brk)
        pos = np.arange(n) - sess_starts[sess_global]
        return (g.append_column(out_session,
                                pa.array(session_seq, pa.int64()))
                 .append_column(out_pos, pa.array(pos, pa.int64())))

    slim = ds.map_batches(narrow, batch_format="pyarrow",
                          zero_copy_batch=True)
    return bucketed_map_groups(slim, keys, bucket,
                               num_buckets=num_buckets)
