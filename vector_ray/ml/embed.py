"""Distributed PCA / whitening over an embedding column (list<float>)
— the standard preprocessing for embedding dedup and ANN (SemDeDup
whitens before clustering; IVF recall improves in decorrelated space;
"dimensionality reduction before LSH" is the classic trick).

The hard part at 10^12 rows is making the FIT deterministic on any
partitioning, because float sums are order-dependent. Solution (the
ml/lm_score.py integer trick lifted to second moments):

  quantize   q = rint(x · 2^20) as int64 — float32 inputs carry 24
             mantissa bits, so a 2^20 grid under |x| ≲ 2 loses nothing
             that matters to a covariance; |q| < 2^21.
  moments    per block ONE int64 matmul q^T q (exact while
             rows_per_block · 2^42 < 2^63, i.e. blocks up to ~2M rows)
             plus the count and column sums — then the partial is
             converted ONCE to arbitrary-precision Python ints and
             pickled, so the shard-grouped SUM tree and the driver
             reduce are EXACT integer additions at any corpus size.
             d=64 → a 32 KB partial per block; embeddings never
             shuffle.
  finalize   covariance in float64 from the exact integer moments
             (correctly-rounded big-int → float conversions), one
             ``np.linalg.eigh`` on the driver's d×d matrix, components
             sign-canonicalized (largest-|loading| coordinate made
             positive) and ordered by descending eigenvalue.
  project    map-only: y = (q/2^20 − mean) @ W, evaluated as an
             EXPLICIT fixed-order loop over the d input coordinates
             (vectorized across rows) — per-row results are then
             bit-identical under any batch split, which a BLAS dgemm
             does not guarantee across different batch shapes.

The whole fit+project is therefore golden-oracle-able
(tools/golden.py pca_embeddings_sql mirrors each numeric op in the
same array shapes)."""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from vector_ray.ml.ann import _as_matrix

SCALE = 1 << 20
_CHUNK = 1 << 21  # int64-exactness bound for one matmul at |q| < 2^21


def _quantize(col: pa.ChunkedArray) -> np.ndarray:
    m = _as_matrix(col).astype(np.float64)
    return np.rint(m * SCALE).astype(np.int64)


def embed_moments(ds, *, vec_col: str = "embedding",
                  reducers: int = 8) -> tuple:
    """Exact integer (n, Σq, Σqqᵀ) over the whole dataset. Returns
    (n: int, s: object ndarray[d], M: object ndarray[d, d]) with
    arbitrary-precision Python-int entries."""

    def partial(t: pa.Table) -> pa.Table:
        import zlib

        q = _quantize(t[vec_col])
        d = q.shape[1] if q.size else 0
        s = np.zeros(d, object)
        m = np.zeros((d, d), object)
        for lo in range(0, len(q), _CHUNK):
            c = q[lo:lo + _CHUNK]
            s += c.sum(axis=0, dtype=np.int64).astype(object)
            m += (c.T @ c).astype(object)
        blob = pickle.dumps((len(q), s, m), protocol=4)
        return pa.table({
            "shard": pa.array([zlib.crc32(blob) % max(reducers, 1)],
                              pa.int32()),
            "mom": pa.array([blob], pa.large_binary()),
        })

    def sumgroup(g: pa.Table) -> pa.Table:
        tot_n, tot_s, tot_m = 0, None, None
        for blob in g["mom"].to_pylist():
            n, s, m = pickle.loads(blob)
            tot_n += n
            if not len(s):  # empty block
                continue
            tot_s = s if tot_s is None else tot_s + s
            tot_m = m if tot_m is None else tot_m + m
        blob = pickle.dumps((tot_n, tot_s, tot_m), protocol=4)
        return pa.table({"shard": g["shard"][:1],
                         "mom": pa.array([blob], pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = parts.groupby("shard").map_groups(sumgroup,
                                                batch_format="pyarrow")
    n, s, m = 0, None, None
    for row in reduced.take_all():
        bn, bs, bm = pickle.loads(row["mom"])
        n += bn
        if bs is not None and len(bs):
            s = bs if s is None else s + bs
            m = bm if m is None else m + bm
    if n == 0 or s is None:
        raise ValueError("embed_moments: empty input")
    return n, s, m


def pca_fit(ds, *, vec_col: str = "embedding", k: int = 8,
            whiten: bool = False, reducers: int = 8) -> dict:
    """Fit the top-k principal components. Returns
    ``{mean float64[d], components float64[d][k], eigvals float64[k],
    k, whiten}`` — a plain broadcastable dict."""
    n, s, m = embed_moments(ds, vec_col=vec_col, reducers=reducers)
    d = len(s)
    # correctly-rounded big-int -> float64 conversions, identical in
    # the golden oracle
    mu = np.array([float(v) for v in s], np.float64) / (n * SCALE)
    m2 = np.array([[float(v) for v in row] for row in m], np.float64)
    cov = m2 / (n * float(SCALE) ** 2) - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    eig = w[order]
    for j in range(comps.shape[1]):  # sign canon: top loading positive
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    if whiten:
        comps = comps / np.sqrt(np.maximum(eig, 1e-12))
    return {"mean": mu, "components": comps,
            "eigvals": eig, "k": int(comps.shape[1]),
            "whiten": bool(whiten)}


def pca_project(ds, model: dict, *, vec_col: str = "embedding",
                out_prefix: str = "p"):
    """Map-only projection appending ``p0..p{k-1}: float64``. The inner
    product runs as a fixed-order loop over input coordinates so row
    results are independent of the batch split."""
    import ray

    ref = ray.put((model["mean"], model["components"]))
    k = model["k"]

    def project(t: pa.Table) -> pa.Table:
        mu, comps = ray.get(ref)
        q = _quantize(t[vec_col])
        x = q.astype(np.float64) / SCALE - mu
        y = np.zeros((len(x), k), np.float64)
        for j in range(x.shape[1] if x.size else 0):
            y += x[:, j:j + 1] * comps[j]
        for c in range(k):
            t = t.append_column(f"{out_prefix}{c}",
                                pa.array(y[:, c], pa.float64()))
        return t

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)
