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
        # phase 1: ONE pass emitting per-batch distinct (tag, value) pairs
        # for every guarded tag, then a single small distinct-pair shuffle
        tags = self.tags

        def partial(t: pa.Table) -> pa.Table:
            tcols, vcols = [], []
            for tag in tags:
                u = pc.unique(pc.cast(t[tag], pa.string()))
                u = u.drop_null()
                tcols.append(pa.array([tag] * len(u), pa.string()))
                vcols.append(u)
            return pa.table({"tag": pa.concat_arrays(tcols), "value": pa.concat_arrays(vcols)})

        pairs = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        distinct_pairs = pairs.groupby(["tag", "value"]).map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow"
        )
        by_tag: dict[str, list] = {tag: [] for tag in tags}
        for row in distinct_pairs.take_all():
            by_tag[row["tag"]].append(row["value"])
        accepted = {
            tag: ray.put(pa.array(sorted(vals)[: self.value_limit], pa.string()))
            for tag, vals in by_tag.items()
        }

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
