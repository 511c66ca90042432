"""metric_to_log — src/transforms/metric_to_log.rs:18-21: serialize a
metric row into a structured log row (here: a JSON `message` column
plus the flattened fields), the inverse of log_to_metric."""

from __future__ import annotations

import pyarrow as pa

from vector_ray.expr import F
from vector_ray.stages.base import BatchStep


class MetricToLog(BatchStep):
    def __init__(self, *, message_col: str = "message"):
        self.message_col = message_col

    def transform(self, tbl: pa.Table) -> pa.Table:
        return F.set_(tbl, self.message_col, F.encode_json(tbl))
