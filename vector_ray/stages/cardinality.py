"""tag_cardinality_limit — src/transforms/tag_cardinality_limit.rs:25-53.

Reference: per tag key, cap distinct values at ``value_limit`` (default
500); once the cap is hit, either drop that tag from further events
(``DropTag``) or drop the whole event (``DropEvent``). Exact HashSet
mode or probabilistic Bloom mode.

Batch semantics: "first N distinct values seen" depends on arrival
order; the deterministic batch equivalent implemented here is: compute
the per-tag distinct-value count (two-phase, via grouped partials); the
ACCEPTED value set per tag is the first ``value_limit`` values in a
deterministic order (ascending). Rows with a value outside the accepted
set get the action applied. This keeps the reference's invariant — at
most ``value_limit`` distinct values per tag survive — with
deterministic, order-free results.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray

from vector_ray.stages.base import Step


class TagCardinalityLimit(Step):
    fusable = False

    def __init__(self, tags: Sequence[str], *, value_limit: int = 500, action: str = "drop_tag"):
        if action not in ("drop_tag", "drop_event"):
            raise ValueError("action must be drop_tag or drop_event")
        self.tags = list(tags)
        self.value_limit = value_limit
        self.action = action

    def apply(self, ds):
        # phase 1: per-tag distinct values via per-batch partial distinct
        accepted: dict[str, object] = {}
        for tag in self.tags:
            def partial(t: pa.Table, tag=tag) -> pa.Table:
                return pa.table({tag: pc.unique(pc.cast(t[tag], pa.string()))})

            distinct = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            vals = distinct.unique(tag)
            vals = sorted(v for v in vals if v is not None)[: self.value_limit]
            accepted[tag] = ray.put(pa.array(vals, pa.string()))

        tags, action = self.tags, self.action

        class Limiter:
            def __init__(self, refs):
                self.sets = {t: ray.get(r) for t, r in refs.items()}

            def __call__(self, t: pa.Table) -> pa.Table:
                keep = None
                for tag in tags:
                    ok = pc.is_in(pc.cast(t[tag], pa.string()), value_set=self.sets[tag])
                    ok = pc.or_(ok, pc.is_null(t[tag]))
                    if action == "drop_tag":
                        i = t.column_names.index(tag)
                        t = t.set_column(i, tag, pc.if_else(ok, t[tag], pa.scalar(None, t[tag].type)))
                    else:
                        keep = ok if keep is None else pc.and_(keep, ok)
                if action == "drop_event" and keep is not None:
                    t = t.filter(keep)
                return t

        return ds.map_batches(
            Limiter,
            fn_constructor_kwargs={"refs": accepted},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=2,
        )
