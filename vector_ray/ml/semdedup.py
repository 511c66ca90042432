"""Semantic deduplication over an embedding column — the SemDeDup
shape (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
embeddings, then greedily drop items whose cosine similarity to an
already-kept item in the SAME cluster exceeds a threshold. Clustering
bounds the all-pairs comparison to within-cluster width, which is what
makes embedding dedup tractable at corpus scale — the existing
``embedding_dup_pairs`` (random-hyperplane LSH) finds near-dup PAIRS;
this operator makes the keep/drop DECISION per row.

Scale notes:
- Centroid training is a driver-side Lloyd fit on an unbiased
  bottom-k id-hash sample (``ml/ann._hash_sample_matrix`` /
  ``kmeans_fit``); the k x dim float32 matrix is broadcast ONCE via
  ``ray.put`` and read zero-copy in every assignment task.
- Assignment is map-only and vectorized (one matmul per batch). The
  similarity-to-centroid matmul runs in float64 so the argmax is
  stable across batch shapes (sgemm blocking differs by shape; a
  1e-7 float32 wobble on a near-tie must not flip the cluster).
- The only shuffle moves (cluster, id, normalized vector) rows,
  hash-bucketed over ``O(cores)`` buckets (``stages/bucketed``), never
  one Python call per cluster. Vectors must travel — within-cluster
  cosine needs them together; this is inherent to SemDeDup.
- Greedy within-cluster dedup is O(width^2) worst case, so cluster
  width is capped at ``max_cluster`` (rows past the cap are kept
  unconditionally and a warning is logged — mirroring the LSH bucket
  caps at ml/dedup.py:223-231). Size ``n_clusters`` ~ n_rows/1e3 at
  scale so expected width stays far below the cap.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

logger = logging.getLogger(__name__)

_EMPTY = None  # built lazily per id dtype


def _greedy_keep(m: np.ndarray, tau: float, chunk: int = 256) -> np.ndarray:
    """Sequential leader dedup over rows of a NORMALIZED float32 matrix
    (ascending-priority order): row i is kept iff its cosine to every
    previously-kept row is < ``tau``. Chunked so the hot work is
    matmuls against the kept set, not one dot per row; the intra-chunk
    dependency is resolved on the chunk's (chunk x chunk) gram matrix.
    Bit-equal to the naive one-row-at-a-time loop.
    """
    w = len(m)
    keep = np.zeros(w, bool)
    kept = np.empty((0, m.shape[1]), m.dtype)
    for s in range(0, w, chunk):
        c = m[s : s + chunk]
        if len(kept):
            vs_kept = (c @ kept.T).max(axis=1)
        else:
            vs_kept = np.full(len(c), -2.0, np.float32)
        g = c @ c.T
        loc: list[int] = []
        for i in range(len(c)):
            smax = vs_kept[i]
            if loc:
                smax = max(smax, g[i, loc].max())
            if smax < tau:
                keep[s + i] = True
                loc.append(i)
        kept = np.concatenate([kept, c[loc]]) if loc else kept
    return keep


def semantic_dedup(
    ds,
    *,
    tau: float = 0.9,
    n_clusters: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 8192,
    iters: int = 10,
    seed: int = 5,
    max_cluster: int = 8192,
    num_buckets: Optional[int] = None,
):
    """Per-row keep/drop decision: returns a Dataset of
    ``(id_col, cluster: int32, keep: bool)``. Within a cluster the
    lowest-id member of a near-dup group is kept (ascending-id greedy
    leader), so the decision is deterministic and partition-independent.
    """
    from vector_ray.ml.ann import (
        _as_matrix,
        _hash_sample_matrix,
        _normalize,
        kmeans_fit,
    )
    from vector_ray.stages.bucketed import bucketed_map_groups, _run_starts

    sample = _hash_sample_matrix(ds, vec_col, id_col, sample_size)
    cent = kmeans_fit(sample, n_clusters, iters=iters, seed=seed)
    cent_ref = ray.put(np.ascontiguousarray(cent, np.float32))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_as_matrix(t[vec_col])).astype(np.float32)
        # float64 matmul: argmax must not depend on batch shape
        a = np.argmax(m.astype(np.float64) @ c.T.astype(np.float64), axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(a.astype(np.int32)),
                "__vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1), pa.float32()), m.shape[1]
                ),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_fn(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    id_col: pa.array([], g.schema.field(id_col).type),
                    "cluster": pa.array([], pa.int32()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        g = g.combine_chunks().sort_by(
            [("cluster", "ascending"), (id_col, "ascending")]
        )
        new_run = _run_starts(g, ["cluster"])
        starts = np.nonzero(new_run)[0]
        ends = np.concatenate([starts[1:], [len(g)]])
        keep = np.ones(len(g), bool)
        mat = _as_matrix(g["__vec"])
        for s, e in zip(starts, ends):
            wdt = int(e - s)
            if wdt < 2:
                continue
            if wdt > max_cluster:
                logger.warning(
                    "semantic_dedup: cluster width %d > max_cluster=%d; "
                    "rows past the cap are kept unconditionally — raise "
                    "n_clusters for this corpus",
                    wdt,
                    max_cluster,
                )
                e = s + max_cluster
            keep[s:e] = _greedy_keep(mat[s:e], tau)
        return pa.table(
            {
                id_col: g[id_col],
                "cluster": g["cluster"],
                "keep": pa.array(keep),
            }
        )

    return bucketed_map_groups(
        assigned, ["cluster"], bucket_fn, num_buckets=num_buckets
    )
