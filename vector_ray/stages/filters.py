"""Filter (src/transforms/filter.rs:65-73) and Sample
(src/transforms/sample.rs:107-139) as vectorized mask stages."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import Cond, F
from vector_ray.stages.base import BatchStep


class Filter(BatchStep):
    """Keep rows where the condition is true."""

    def __init__(self, condition: Cond):
        self.condition = condition

    def transform(self, tbl: pa.Table) -> pa.Table:
        return tbl.filter(self.condition(tbl))


class Sample(BatchStep):
    """Keep 1-in-`rate` rows.

    Reference semantics (sample.rs:107-139): if ``key_field`` is set the
    keep test is deterministic ``hash(key) % rate == 0`` (seahash there,
    stable FNV-1a fingerprint here); otherwise a running counter — which
    is order-dependent and meaningless under parallel blocks, so this
    engine REQUIRES key_field (documented batch semantics). Rows matching
    ``exclude`` bypass sampling and are always kept. A ``sample_rate``
    column is stamped on kept rows, mirroring the reference.
    """

    def __init__(
        self,
        rate: int,
        key_field: str,
        *,
        exclude: Optional[Cond] = None,
        rate_col: str = "sample_rate",
    ):
        if rate < 1:
            raise ValueError("rate must be >= 1")
        self.rate = rate
        self.key_field = key_field
        self.exclude = exclude
        self.rate_col = rate_col

    def transform(self, tbl: pa.Table) -> pa.Table:
        keep = pc.equal(F.fingerprint_mod(F.to_string(tbl[self.key_field]), self.rate), 0)
        keep = pc.fill_null(keep, False)
        if self.exclude is not None:
            keep = pc.or_(keep, self.exclude(tbl))
        out = tbl.filter(keep)
        if self.rate_col:
            out = out.append_column(self.rate_col, pa.array([self.rate] * len(out), pa.int64()))
        return out
