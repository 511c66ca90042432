"""Diversity-aware subset selection over an embedding column.

``diverse_select`` picks ``k`` mutually-dissimilar rows — the
farthest-point-first (k-center greedy / Gonzalez) traversal used for
coreset construction and diverse few-shot / eval-set curation: start
from a deterministic seed row, then repeatedly add the candidate whose
maximum cosine similarity to the already-selected set is SMALLEST.

100-TB plan: the greedy step is inherently sequential, so it runs on a
BOUNDED candidate set, never the full dataset — stage 1 is the same
deterministic bottom-``candidates`` salted-id-hash sample used across
ml/ (each block forwards ≤ ``candidates`` rows, a bucketed bottom-k
merge bounds driver fan-in to O(buckets × candidates)); stage 2 is an
O(candidates × k) chain of vectorized matmuls on the driver. The
candidate sample — hence the selection — is a pure function of the id
set and ``seed``, independent of block layout.

No reference counterpart (SURVEY §2 "beyond the reference" — curation
family, alongside ml/semdedup.py and ml/dsir.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def diverse_select(
    ds,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: int = 1024,
    seed: int = 0,
) -> pa.Table:
    """Returns an Arrow table (id_col, rank) of the ``min(k, n)``
    selected rows in selection order (rank 0 = the seed row, the
    candidate with the smallest salted id hash). Embedding floats are
    deliberately NOT in the output (ids + integer ranks only — the
    knn_graph/semantic_join hash-stability convention). Rows with a
    null/empty vector are ignored.

    The greedy step maximises the minimum pairwise angular distance
    within the selected set (2-approximation of the k-center optimum —
    Gonzalez 1985, public result). Ties (equal max-similarity) break
    toward the candidate earlier in (hash, id) order; all scoring is
    float64 so the decision sequence is bit-deterministic.
    """
    from vector_ray.ml.ann import _as_matrix, _bottomk_table
    from vector_ray.ml.sampling import _salted_hash

    if k <= 0:
        raise ValueError("diverse_select: k must be positive")

    def part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[vec_col]))
        out = t.select([id_col, vec_col])
        h = _salted_hash(t, id_col, seed)
        if len(out) > candidates:
            idx = np.sort(np.argpartition(h, candidates - 1)[:candidates])
            out = out.take(pa.array(idx, pa.int64()))
            h = h[idx]
        return out.append_column("__h", pa.array(h, pa.uint64()))

    cand = ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)
    t = _bottomk_table(cand, candidates, tie_col=id_col)
    if t is None or t.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})

    hs = np.asarray(t["__h"].to_numpy(zero_copy_only=False), np.uint64)
    ids_all = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids_all, hs))[:candidates]
    ids = ids_all[order]
    x = _as_matrix(t[vec_col], dtype=np.float64)[order]
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    n = len(ids)
    k = min(k, n)
    sel = np.empty(k, np.int64)
    sel[0] = 0
    # max cosine similarity of every candidate to the selected set
    maxsim = x @ x[0]
    maxsim[0] = np.inf
    for r in range(1, k):
        i = int(np.argmin(maxsim))  # first occurrence wins ties
        sel[r] = i
        np.maximum(maxsim, x @ x[i], out=maxsim)
        maxsim[i] = np.inf

    return pa.table({
        id_col: pa.array(ids[sel]),
        "rank": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
    })
