"""1→N row exploders.

- ``Unnest``: explode a list column into one row per element (VRL
  ``unnest``, lib/vrl/stdlib — the row exploder; also the shape of
  aws_cloudwatch_logs_subscription_parser's one-message→many-events,
  src/transforms/aws_cloudwatch_logs_subscription_parser.rs).
  Vectorized: list offsets → parent indices → ``take`` of the other
  columns, no Python per row.
- ``ExplodeJsonList``: parse a JSON-array column and emit one row per
  element (the cloudwatch subscription shape: envelope column +
  logEvents array).
"""

from __future__ import annotations

import json as _json

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.base import BatchStep


class Unnest(BatchStep):
    def __init__(self, column: str, *, keep_empty: bool = False, element_name: str | None = None):
        self.column = column
        self.keep_empty = keep_empty
        self.element_name = element_name or self.column

    def transform(self, tbl: pa.Table) -> pa.Table:
        col = tbl[self.column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        parents = pc.list_parent_indices(arr)
        flat = pc.list_flatten(arr)
        others = tbl.drop_columns([self.column]).take(parents)
        out = others.append_column(self.element_name, flat)
        if self.keep_empty:
            lens = pc.fill_null(pc.list_value_length(arr), 0)
            empty_mask = pc.equal(lens, 0)
            empties = tbl.filter(empty_mask).drop_columns([self.column])
            empties = empties.append_column(
                self.element_name, pa.nulls(len(empties), flat.type)
            )
            out = pa.concat_tables([out, empties])
        return out


class ExplodeJsonList(BatchStep):
    """Parse ``field`` as a JSON array of objects; one output row per
    element, envelope columns repeated (the cloudwatch-subscription
    explode). Per-row json.loads (envelope messages are few and large —
    this is not a hot inner loop at element granularity)."""

    def __init__(self, field: str, *, drop_field: bool = True):
        self.field = field
        self.drop_field = drop_field

    def transform(self, tbl: pa.Table) -> pa.Table:
        col = tbl[self.field]
        vals = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_pylist()
        parents: list[int] = []
        elements: list[dict] = []
        for i, v in enumerate(vals):
            if v is None:
                continue
            try:
                items = _json.loads(v)
            except Exception:
                continue
            if not isinstance(items, list):
                items = [items]
            for it in items:
                parents.append(i)
                elements.append(it if isinstance(it, dict) else {"value": it})
        base = tbl.drop_columns([self.field]) if self.drop_field else tbl
        out = base.take(pa.array(parents, pa.int64()))
        if elements:
            elem_tbl = pa.Table.from_pylist(elements)
            for name in elem_tbl.column_names:
                out = out.append_column(name, elem_tbl[name])
        return out
