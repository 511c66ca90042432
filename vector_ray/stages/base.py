"""Step abstraction: a pipeline stage is ``apply(ds) -> ds``.

A ``BatchStep`` wraps a vectorized ``fn(pa.Table) -> pa.Table`` into
``Dataset.map_batches(batch_format="pyarrow", zero_copy_batch=True)``
— the Ray Data form of a Vector FunctionTransform
(lib/vector-core/src/transform/mod.rs:143-172). Consecutive BatchSteps
in a chain are fused into ONE map_batches call (``ChainStep``) so a
linear parse→coerce→filter sequence costs a single pass over each
block, mirroring how Vector fuses function transforms via
``ready_chunks(128)`` (src/topology/builder.rs:222-259).

The per-row invariant (BASELINE.json): the ``tokens`` ``list<int32>``
column must never be touched — BatchStep bodies only append/drop/replace
sibling columns, so ``tokens`` buffers pass through zero-copy.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa


class Step:
    """A pipeline stage. Subclasses implement apply() (dataset-level ops:
    shuffle, groupby, actor pools) or batch_fn() (fused map_batches)."""

    #: steps that are pure table→table functions set this; the planner fuses runs of them
    fusable = False

    def apply(self, ds):
        raise NotImplementedError

    def batch_fn(self) -> Callable[[pa.Table], pa.Table]:
        raise NotImplementedError


class BatchStep(Step):
    fusable = True

    #: map_batches kwargs a subclass may override
    batch_size = None  # None → Ray Data picks block-sized batches (cheapest)

    def transform(self, tbl: pa.Table) -> pa.Table:
        raise NotImplementedError

    def batch_fn(self):
        return self.transform

    def apply(self, ds):
        return ds.map_batches(
            self.transform,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=self.batch_size,
        )


class FnStep(BatchStep):
    """Adapter: plain ``fn(tbl)->tbl`` as a step (the Lua/UDF escape
    hatch — src/transforms/lua; Python is this engine's Lua)."""

    def __init__(self, fn: Callable[[pa.Table], pa.Table], name: str = "fn"):
        self.fn = fn
        self.name = name

    def transform(self, tbl: pa.Table) -> pa.Table:
        return self.fn(tbl)


class ChainStep(Step):
    """Fuse consecutive fusable steps into one map_batches (compound
    transform, src/transforms/compound.rs / ExpandType::Serial)."""

    fusable = True

    def __init__(self, steps: Sequence[Step]):
        self.steps = list(steps)
        self._fns = [s.batch_fn() for s in self.steps]

    def transform(self, tbl: pa.Table) -> pa.Table:
        # every step runs even on empty tables — schema stability across
        # blocks requires empty batches to flow through the full chain
        for fn in self._fns:
            tbl = fn(tbl)
        return tbl

    def batch_fn(self):
        return self.transform

    def apply(self, ds):
        return ds.map_batches(
            self.transform, batch_format="pyarrow", zero_copy_batch=True
        )


def compile_chain(steps: Sequence[Step]):
    """Plan a list of steps: fuse maximal runs of fusable steps."""
    planned: list[Step] = []
    run: list[Step] = []

    def flush():
        nonlocal run
        if len(run) == 1:
            planned.append(run[0])
        elif run:
            planned.append(ChainStep(run))
        run = []

    for s in steps:
        if s.fusable:
            run.append(s)
        else:
            flush()
            planned.append(s)
    flush()
    return planned


def apply_chain(ds, steps: Sequence[Step]):
    for s in compile_chain(steps):
        ds = s.apply(ds)
    return ds
