"""Merge — src/transforms/merge.rs:18-37: stitch *partial* events
(flagged by ``partial_event_marker_field``) into the next non-partial
event within the same stream (``stream_discriminant_fields``).

Batch semantics: arrival order is defined by an explicit ``order_by``
sequence column (SURVEY.md §7.4 "Order-dependent TaskTransforms").
Execution: groupby(discriminant) → per-group stable sort → stitch.
A trailing run of partials with no terminal event is dropped, matching
the reference (partials are held until a non-partial arrives).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

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

    def _stitch(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        is_partial = g[self.partial_marker].fillna(False).astype(bool).to_numpy()
        rows = []
        buf: list = []
        for i in range(len(g)):
            if is_partial[i]:
                buf.append(i)
                continue
            row = g.iloc[i].to_dict()
            if buf:
                for f in self.merge_fields:
                    parts = [str(g.iloc[j][f]) for j in buf] + [str(row[f])]
                    row[f] = self.joiner.join(parts)
                buf = []
            row.pop(self.partial_marker, None)
            rows.append(row)
        # trailing partials (no terminal event) are dropped, as in the
        # reference where they'd wait forever for the rest of the event
        cols = [c for c in g.columns if c != self.partial_marker]
        if not rows:
            return pd.DataFrame(columns=cols)
        return pd.DataFrame(rows)[cols]

    def apply(self, ds):
        keys = self.discriminant
        if not keys:
            # single stream: constant key → one global group (small data
            # only; the reference's single-stream mode has the same
            # serialization point)
            import pyarrow as pa

            ds = ds.map_batches(
                lambda t: t.append_column("__stream", pa.array([0] * len(t), pa.int8())),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            keys = ["__stream"]

            def stitch_drop(g: pd.DataFrame) -> pd.DataFrame:
                return self._stitch(g).drop(columns="__stream")

            return ds.groupby(keys).map_groups(stitch_drop, batch_format="pandas")
        return ds.groupby(keys).map_groups(self._stitch, batch_format="pandas")
