"""Merge — src/transforms/merge.rs:18-37: stitch *partial* events
(flagged by ``partial_event_marker_field``) into the next non-partial
event within the same stream (``stream_discriminant_fields``).

Batch semantics: arrival order is defined by an explicit ``order_by``
sequence column (SURVEY.md §7.4 "Order-dependent TaskTransforms").
A trailing run of partials with no terminal event is dropped, matching
the reference (partials are held until a non-partial arrives).

Execution is fully vectorized: streams are hash-bucketed (one Python
call per BUCKET, not per stream — stages/bucketed.py), each bucket is
sorted by (stream, order), merge-group membership is computed with
numpy offset arithmetic, and the per-group concatenation is ONE Arrow
``binary_join`` over a ListArray — no per-row or per-stream Python.
Null merge-field values join as "" (the reference coerces to string).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.base import Step


class Merge(Step):
    fusable = False

    def __init__(
        self,
        partial_marker: str = "_partial",
        merge_fields: Sequence[str] = ("message",),
        stream_discriminant_fields: Sequence[str] = (),
        *,
        order_by: str,
        joiner: str = "",
    ):
        self.partial_marker = partial_marker
        self.merge_fields = list(merge_fields)
        self.discriminant = list(stream_discriminant_fields)
        self.order_by = order_by
        self.joiner = joiner

    def _stitch_bucket(self, t: pa.Table, keys: Sequence[str]) -> pa.Table:
        """Vectorized stitch of a whole bucket (many streams)."""
        drop_cols = [c for c in (self.partial_marker,) if c in t.column_names]
        if len(t) == 0:
            return t.drop_columns(drop_cols)
        t = t.sort_by(
            [(k, "ascending") for k in keys] + [(self.order_by, "ascending")]
        ).combine_chunks()
        from vector_ray.stages.bucketed import _run_starts

        stream_new = _run_starts(t, list(keys))
        run_id = np.cumsum(stream_new) - 1
        run_start = np.nonzero(stream_new)[0][run_id]  # stream start per row
        is_partial = np.asarray(
            pc.fill_null(pc.cast(t[self.partial_marker], pa.bool_()), False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
            bool,
        )
        term = np.nonzero(~is_partial)[0]
        if len(term) == 0:
            return t.slice(0, 0).drop_columns(drop_cols)
        # merge group of terminal k: rows (prev_terminal, k] clamped to
        # the terminal's own stream (a partial can never cross streams)
        prev_term = np.concatenate([[-1], term[:-1]])
        group_start = np.maximum(prev_term + 1, run_start[term])
        lengths = term + 1 - group_start
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        total = int(offsets[-1])
        take_idx = (
            np.arange(total)
            - np.repeat(offsets[:-1], lengths)
            + np.repeat(group_start, lengths)
        )
        out = t.take(pa.array(term, pa.int64()))
        take_arr = pa.array(take_idx, pa.int64())
        off_arr = pa.array(offsets.astype(np.int32))
        for f in self.merge_fields:
            s = pc.fill_null(pc.cast(t[f], pa.string()), "").combine_chunks()
            flat = s.take(take_arr)
            flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
            joined = pc.binary_join(
                pa.ListArray.from_arrays(off_arr, flat), self.joiner
            )
            out = out.set_column(out.column_names.index(f), f, joined)
        return out.drop_columns(drop_cols)

    def apply(self, ds):
        from vector_ray.stages.bucketed import bucketed_map_groups

        keys = self.discriminant
        if not keys:
            # single stream: constant key → one global group (small data
            # only; the reference's single-stream mode has the same
            # serialization point)
            ds = ds.map_batches(
                lambda t: t.append_column("__stream", pa.array([0] * len(t), pa.int8())),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            return bucketed_map_groups(
                ds, ["__stream"],
                lambda g: self._stitch_bucket(g, ["__stream"]).drop_columns(["__stream"]),
                num_buckets=1,
            )
        return bucketed_map_groups(ds, keys, lambda g: self._stitch_bucket(g, keys))
