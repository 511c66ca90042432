"""Distributed connected components via hash-min label propagation.

Replaces the r1 driver-side union-find over the duplicate-edge set
(ml/dedup.py) — at 100 TB a near-dup-heavy corpus produces edge sets
that cannot live on the driver. Here every step is a Ray Data
exchange:

  L0(u) = u
  L_{t+1}(u) = min( L_t(u), min over edges (u,v) of L_t(v) )

iterated to fixpoint. One iteration = one bucketed hash join
(edges ⋈ labels, stages/join.py) + one two-phase grouped min
(stages/aggregate.py) — both shuffle only (node, label) pairs, never
documents. Converges in O(component diameter) rounds; duplicate
clusters are near-cliques so 2-4 rounds is typical. Fixpoint is
detected with a label checksum (sum of splitmix-finalized label
fingerprints): labels only ever decrease, so an unchanged checksum
means an unchanged labeling (modulo a ~2^-64 collision).

Comparable published pattern: "hash-min" of Rastogi et al.,
"Finding Connected Components in MapReduce" (ICDE 2013).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _label_checksum(labels) -> int:
    from vector_ray.expr import F
    from vector_ray.sources.synth import _splitmix64

    def part(t: pa.Table) -> pa.Table:
        fp = _splitmix64(np.asarray(
            F.fingerprint(pc.cast(t["label"], pa.string())).to_numpy(zero_copy_only=False),
            np.uint64,
        ))
        # python-int sum to avoid uint64 wraparound ambiguity per block
        return pa.table({"s": pa.array([int(fp.sum(dtype=np.uint64))], pa.uint64())})

    rows = labels.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return sum(int(r["s"]) for r in rows) & 0xFFFFFFFFFFFFFFFF


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 25, buckets: int | None = None):
    """``edges``: Dataset of undirected edges. Returns a Dataset with
    columns (node, label): label = component representative = the
    minimum node value in the component (so "keep the lowest id per
    duplicate cluster" falls out directly)."""
    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.join import bucketed_join

    def directed(t: pa.Table) -> pa.Table:
        a, b = t[a_col].combine_chunks(), t[b_col].combine_chunks()
        return pa.table({
            "src": pa.concat_arrays([a, b]),
            "dst": pa.concat_arrays([b, a]),
        })

    edges_dir = edges.map_batches(
        directed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    labels = grouped_aggregate(
        edges_dir.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        ),
        ["node"], {"label": ("min", "label")},
    ).materialize()

    prev_sum = _label_checksum(labels)
    for _ in range(max_iters):
        # message 1: every edge (src, dst) proposes L(dst) to src
        j = bucketed_join(edges_dir, labels, on=["dst"], right_on=["node"],
                          buckets=buckets)
        msgs = j.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["label"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # message 2 (pointer jumping): L(L(u)) → u, which halves the
        # remaining propagation distance each round — O(log diameter)
        # rounds instead of O(diameter) for path-shaped components
        jj = bucketed_join(
            labels.map_batches(
                lambda t: pa.table({"u": t["node"], "l": t["label"]}),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            labels, on=["l"], right_on=["node"], buckets=buckets,
        )
        jumps = jj.map_batches(
            lambda t: pa.table({"node": t["u"], "label": t["label"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        labels = grouped_aggregate(
            labels.union(msgs).union(jumps), ["node"], {"label": ("min", "label")}
        ).materialize()
        cur = _label_checksum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels
