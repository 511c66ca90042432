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

    def __init__(self, tags: Sequence[str], *, value_limit: int = 500, action: str = "drop_tag",
                 mode: str = "exact"):
        if action not in ("drop_tag", "drop_event"):
            raise ValueError("action must be drop_tag or drop_event")
        if mode not in ("exact", "probabilistic"):
            raise ValueError("mode must be exact or probabilistic")
        self.tags = list(tags)
        self.value_limit = value_limit
        self.action = action
        # reference's Bloom mode (tag_cardinality_limit.rs:38-47) accepts an
        # arrival-order-arbitrary subset with O(1) memory; the deterministic
        # batch analogue here is KMV: accept the value_limit values with the
        # SMALLEST 64-bit fingerprints (still a mergeable truncated-min-set
        # partial, just hash-ordered — so the accepted subset is
        # value-distribution-independent like Bloom's, not lexicographic).
        self.mode = mode

    def apply(self, ds):
        # phase 1: mergeable truncated-min-set partials. Per (tag, batch)
        # keep only the value_limit SMALLEST distinct values — merging
        # truncated partials and re-truncating preserves the global
        # value_limit smallest distinct values exactly, so the driver
        # never sees the (unbounded!) pre-limit distinct set; every
        # intermediate is ≤ value_limit values per tag per block.
        tags, limit, mode = self.tags, self.value_limit, self.mode

        def trunc(u):
            if len(u) <= limit:
                return u
            if mode == "probabilistic":
                import numpy as np

                from vector_ray.expr import F

                from vector_ray.sources.synth import _splitmix64

                uc = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
                # splitmix-finalize the fingerprint: the raw fingerprint is
                # near-linear on short sequential strings, which would bias
                # the KMV subset toward a lexicographic prefix
                fp = _splitmix64(
                    np.asarray(F.fingerprint(uc).to_numpy(zero_copy_only=False), np.uint64)
                )
                idx = np.sort(np.argsort(fp, kind="stable")[:limit])
                return uc.take(pa.array(idx, pa.int64()))
            return u.take(pc.array_sort_indices(u)).slice(0, limit)

        def truncated_partial(t: pa.Table, value_col: str = None) -> pa.Table:
            tcols, vcols = [], []
            if value_col is None:  # raw input rows: one pass over every tag
                per_tag = {tag: pc.unique(pc.cast(t[tag], pa.string())).drop_null() for tag in tags}
            else:  # partial rows: regroup (tag, value) pairs
                per_tag = {}
                for tag in tags:
                    sub = t.filter(pc.equal(t["tag"], tag))
                    per_tag[tag] = pc.unique(sub[value_col]).drop_null()
            for tag, u in per_tag.items():
                u = trunc(u)
                tcols.append(pa.array([tag] * len(u), pa.string()))
                vcols.append(u)
            return pa.table({
                "tag": pa.concat_arrays(tcols) if tcols else pa.array([], pa.string()),
                "value": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in vcols]) if vcols else pa.array([], pa.string()),
            })

        pairs = ds.map_batches(truncated_partial, batch_format="pyarrow", zero_copy_batch=True)
        # intermediate merge: coalesce many tiny partial blocks and
        # re-truncate, so the final per-tag merge sees O(16·limit) rows
        # per tag even with millions of input blocks
        pre = pairs.repartition(16).map_batches(
            lambda t: truncated_partial(t, value_col="value"),
            batch_format="pyarrow", zero_copy_batch=True,
        )

        def final_set(g: pa.Table) -> pa.Table:
            u = trunc(pc.unique(g["value"]).drop_null())
            u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
            return pa.table({"tag": pa.array([str(g["tag"][0])] * len(u)), "value": u})

        merged = pre.groupby("tag").map_groups(final_set, batch_format="pyarrow")
        by_tag: dict[str, list] = {tag: [] for tag in tags}
        for row in merged.take_all():  # ≤ len(tags) × value_limit rows
            by_tag[row["tag"]].append(row["value"])
        accepted = {
            tag: ray.put(pa.array(sorted(vals), pa.string()))
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
