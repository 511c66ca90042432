"""Route (swimlanes) — src/transforms/route.rs:57-65,101-120.

Reference semantics: an event is COPIED to every lane whose condition
matches (parallel expansion, ExpandType::Parallel at
src/config/compiler.rs:105-146) — NOT a partition split.

Three consumption shapes, all computing every lane mask in ONE pass
over each batch:

- ``explode(ds)`` → one dataset with a ``lane`` column, rows duplicated
  per matching lane. The scale path: a single downstream
  ``write_parquet(partition_cols=["lane"])`` or a lane-keyed groupby
  serves ALL sinks in one streaming pass — no per-lane re-execution
  of the upstream pipeline.
- ``mask(ds)`` → appends one boolean ``_route_<lane>`` column per lane
  (no row duplication; good when lanes feed different column
  projections).
- ``views(ds)`` → dict lane → filtered dataset (lazy; each lane
  re-executes upstream — fine for few lanes over cheap upstreams,
  documented tradeoff).
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import Cond
from vector_ray.stages.base import Step


class Route(Step):
    def __init__(self, lanes: Dict[str, Cond], *, unmatched_lane: str | None = None):
        if not lanes:
            raise ValueError("Route needs at least one lane (route.rs rejects empty route tables)")
        self.lanes = dict(lanes)
        self.unmatched_lane = unmatched_lane
        self.lane_col = "lane"

    # -- one-pass explode (the default scale path) -------------------------

    def _explode_batch(self, tbl: pa.Table) -> pa.Table:
        parts = []
        matched_any = None
        for name, cond in self.lanes.items():
            m = cond(tbl)
            matched_any = m if matched_any is None else pc.or_(matched_any, m)
            part = tbl.filter(m)
            parts.append(part.append_column(self.lane_col, pa.array([name] * len(part), pa.string())))
        if self.unmatched_lane is not None and matched_any is not None:
            rest = tbl.filter(pc.invert(matched_any))
            parts.append(
                rest.append_column(self.lane_col, pa.array([self.unmatched_lane] * len(rest), pa.string()))
            )
        return pa.concat_tables(parts) if parts else tbl

    def explode(self, ds):
        return ds.map_batches(self._explode_batch, batch_format="pyarrow", zero_copy_batch=True)

    def apply(self, ds):
        return self.explode(ds)

    # -- mask columns ------------------------------------------------------

    def _mask_batch(self, tbl: pa.Table) -> pa.Table:
        for name, cond in self.lanes.items():
            tbl = tbl.append_column(f"_route_{name}", cond(tbl))
        return tbl

    def mask(self, ds):
        return ds.map_batches(self._mask_batch, batch_format="pyarrow", zero_copy_batch=True)

    # -- independent lane views -------------------------------------------

    def views(self, ds) -> Dict[str, object]:
        out = {}
        for name, cond in self.lanes.items():
            out[name] = ds.map_batches(
                lambda t, c=cond: t.filter(c(t)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return out
