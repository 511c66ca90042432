"""Remap — the VRL transform (src/transforms/remap.rs:123-176)
re-expressed as a vectorized Arrow batch UDF.

A remap *program* is a Python function built from ``vector_ray.expr.F``
kernels: ``prog(tbl: pa.Table) -> pa.Table`` or
``prog(tbl) -> (tbl, error_mask)``.

Error semantics mirror remap.rs:21-29,124-174:
- ``drop_on_error=True``  → rows where error_mask is true are dropped.
- ``drop_on_error=False`` → those rows are restored to their
  PRE-transform values (original columns back, program-added columns
  nulled) — vectorized via per-column ``if_else`` on the mask, no row
  loop.
An optional ``error_col`` tags surviving error rows (the metadata the
reference emits as an error event) so a downstream route can branch on
it (FallibleFunctionTransform's second output).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.base import BatchStep

ProgResult = Union[pa.Table, Tuple[pa.Table, pa.ChunkedArray]]


class Remap(BatchStep):
    def __init__(
        self,
        program: Callable[[pa.Table], ProgResult],
        *,
        drop_on_error: bool = False,
        error_col: Optional[str] = None,
        name: str = "remap",
    ):
        self.program = program
        self.drop_on_error = drop_on_error
        self.error_col = error_col
        self.name = name

    def transform(self, tbl: pa.Table) -> pa.Table:
        result = self.program(tbl)
        if isinstance(result, tuple):
            out, err = result
            err = pc.fill_null(err, False)
        else:
            out, err = result, None

        if err is None:
            return out

        if self.drop_on_error:
            out = out.filter(pc.invert(err))
            if self.error_col:
                out = out.append_column(self.error_col, pa.array([False] * len(out), pa.bool_()))
            return out

        # keep-original semantics: commit program output only where !err
        ok = pc.invert(err)
        cols = []
        names = []
        orig_names = set(tbl.column_names)
        for name in out.column_names:
            new = out[name]
            if name in orig_names:
                old = tbl[name]
                if new.type != old.type:
                    old = pc.cast(old, new.type)
                cols.append(pc.if_else(ok, new, old))
            else:
                cols.append(pc.if_else(ok, new, pa.scalar(None, new.type)))
            names.append(name)
        restored = pa.table(dict(zip(names, cols)))
        if self.error_col:
            restored = restored.append_column(self.error_col, err)
        return restored
