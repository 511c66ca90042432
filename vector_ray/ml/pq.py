"""Product quantization (PQ) ANN — Jégou, Douze & Schmid, "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011), the public
billion-scale recipe: split each d-dim vector into ``m`` subvectors,
k-means each subspace to ``ncent`` centroids, store one code byte per
subspace (64 float32 dims → m=8 bytes, a 32× compression), and answer
queries with asymmetric distance computation (ADC): one (nq × ncent)
lookup table per subspace, then a code-indexed gather-sum — no float
vectors touched at query time. This is the memory-side complement to
ml/ann.py's IVF partition pruning (FAISS composes both as IVF-PQ).

Ray plan:
  train   one deterministic bottom-k id-hash sample to the driver
          (ml/ann._hash_sample_matrix — unbiased across fragments),
          m small Lloyd fits in float64.
  encode  map-only: per batch one (n × ncent × sub) distance tensor
          per subspace, argmin codes (first-min tie-break) → a
          fixed-size list<uint8> column. Vectors never shuffle.
  search  codebooks + query LUTs broadcast once via ray.put; per block
          ADC gather-sum + local top-k (≤ nq·k rows leave each block),
          one driver merge — the knn_brute plan.

Determinism contract (tools/golden.py pq_search_sql mirrors every
array op): the sample is the deterministic hash bottom-k, Lloyd runs
in float64 with a seeded rng.choice init, and encode/ADC are
elementwise + fixed-axis reductions, so codes and distances are
bit-identical on any partitioning / batch split."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vector_ray.ml.ann import _as_matrix


def _hash_sorted_sample(ds, vec_col: str, id_col: str,
                        sample_size: int) -> np.ndarray:
    """Bottom-``sample_size`` rows by fnv1a(str(id)), returned SORTED
    by that hash — like ml/ann._hash_sample_matrix, the row ORDER is a
    pure function of the id set, independent of block layout and
    take_all ordering, which the seeded kmeans init needs to be
    reproducible (and golden-mirrorable). Driver fan-in is bounded by
    the bucketed two-level merge (ml/ann._bucketed_bottomk)."""
    import pyarrow.compute as pc

    from vector_ray.expr import F

    def part(t: pa.Table) -> pa.Table:
        out = t.select([id_col, vec_col])
        h = np.asarray(
            F.fingerprint(pc.fill_null(pc.cast(t[id_col], pa.string()),
                                       "\x00")).to_numpy(zero_copy_only=False),
            np.uint64)
        if len(t) > sample_size:
            idx = np.argpartition(h, sample_size - 1)[:sample_size]
            out = out.take(pa.array(idx, pa.int64()))
            h = h[idx]
        return out.append_column("__h", pa.array(h, pa.uint64()))

    from vector_ray.ml.ann import _as_matrix, _bottomk_table

    cand = ds.map_batches(part, batch_format="pyarrow",
                          zero_copy_batch=True)
    t = _bottomk_table(cand, sample_size)
    if t is None or t.num_rows == 0:
        return np.empty((0, 0), np.float32)
    hs = np.asarray(t["__h"].to_numpy(zero_copy_only=False), np.uint64)
    order = np.argsort(hs, kind="stable")[:sample_size]
    return _as_matrix(t[vec_col])[order]


def _kmeans_l2(x: np.ndarray, ncent: int, *, iters: int = 10,
               seed: int = 5) -> np.ndarray:
    """Plain Euclidean Lloyd in float64 (no normalization — PQ
    quantizes residual geometry, not direction)."""
    x = np.asarray(x, np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(ncent, len(x)),
                        replace=False)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(len(cent)):
            mem = x[assign == c]
            if len(mem):
                cent[c] = mem.mean(axis=0)
    return cent


def pq_train(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
             m: int = 8, ncent: int = 16, sample_size: int = 1024,
             iters: int = 10, seed: int = 5) -> dict:
    """Fit the ``m`` subspace codebooks on a deterministic sample.
    Returns ``{codebooks float64[m][ncent][sub], m, sub}``."""
    sample = _hash_sorted_sample(ds, vec_col, id_col, sample_size)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    books = [
        _kmeans_l2(sample[:, si * sub:(si + 1) * sub], ncent,
                   iters=iters, seed=seed)
        for si in range(m)
    ]
    return {"codebooks": books, "m": m, "sub": sub}


def _encode_matrix(x: np.ndarray, books: list, m: int,
                   sub: int) -> np.ndarray:
    codes = np.zeros((len(x), m), np.uint8)
    for si in range(m):
        xs = x[:, si * sub:(si + 1) * sub]
        d2 = ((xs[:, None, :] - books[si][None, :, :]) ** 2).sum(-1)
        codes[:, si] = np.argmin(d2, axis=1)
    return codes


def pq_encode(ds, model: dict, *, vec_col: str = "embedding",
              out: str = "pq_code"):
    """Map-only encode: appends ``out: fixed_size_list<uint8>[m]``."""
    import ray

    ref = ray.put(model["codebooks"])
    m, sub = model["m"], model["sub"]

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        x = _as_matrix(t[vec_col]).astype(np.float64)
        codes = _encode_matrix(x, books, m, sub)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), m)
        return t.append_column(out, col)

    return ds.map_batches(enc, batch_format="pyarrow",
                          zero_copy_batch=True)


def pq_search(ds, model: dict, queries: np.ndarray, *, k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """ADC top-k per query over the encoded dataset (codes computed
    in the same pass here; a production index stores the code column
    once via pq_encode and scans only it). Returns
    (query_idx, vec_id, adist, rank), ties broken by ascending id."""
    import ray

    m, sub = model["m"], model["sub"]
    q = np.asarray(queries, np.float64)
    luts = [
        ((q[:, si * sub:(si + 1) * sub][:, None, :]
          - model["codebooks"][si][None, :, :]) ** 2).sum(-1)
        for si in range(m)
    ]  # m × (nq, ncent)
    ref = ray.put((model["codebooks"], luts))
    nq = len(q)

    def topk(t: pa.Table) -> pa.Table:
        books, lt = ray.get(ref)
        x = _as_matrix(t[vec_col]).astype(np.float64)
        codes = _encode_matrix(x, books, m, sub)
        ids = np.asarray(t[id_col])
        adist = np.zeros((nq, len(x)), np.float64)
        for si in range(m):  # fixed subspace order
            adist += lt[si][:, codes[:, si]]
        kk = min(k, adist.shape[1])
        out = {"query_idx": [], "vec_id": [], "adist": []}
        for qi in range(nq):
            o = np.lexsort((ids, adist[qi]))[:kk]
            out["query_idx"] += [qi] * kk
            out["vec_id"] += list(ids[o])
            out["adist"] += list(adist[qi][o])
        return pa.table({
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "adist": pa.array(out["adist"], pa.float64()),
        })

    rows = ds.map_batches(topk, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: (r["query_idx"], r["adist"], r["vec_id"]))
    res = {"query_idx": [], "vec_id": [], "adist": [], "rank": []}
    seen = {}
    for r in rows:
        qi = r["query_idx"]
        n = seen.get(qi, 0)
        if n >= k:
            continue
        seen[qi] = n + 1
        res["query_idx"].append(qi)
        res["vec_id"].append(r["vec_id"])
        res["adist"].append(r["adist"])
        res["rank"].append(n)
    return pa.table({
        "query_idx": pa.array(res["query_idx"], pa.int64()),
        "vec_id": pa.array(res["vec_id"], pa.int64()),
        "adist": pa.array(res["adist"], pa.float64()),
        "rank": pa.array(res["rank"], pa.int64()),
    })
