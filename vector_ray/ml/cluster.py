"""Distributed k-means over an embedding column — full-data Lloyd
iterations, not the driver-side sample fit that seeds IVF
(ml/ann.kmeans_fit). The clustering step of SemDeDup-style semantic
curation and of building balanced training mixtures; also the honest
way to train IVF centroids when the corpus is too skewed for a sample.

The hard part at 10^12 rows is determinism on any partitioning
(ml/embed.py's problem, same fix): every numeric step that crosses a
block boundary is EXACT integer arithmetic.

  quantize   q = rint(x · 2^20) int64 (ml/embed.SCALE — float32
             inputs lose nothing that matters at |x| ≲ 2).
  init       the k rows with the globally smallest (fingerprint(id),
             id) — a bottom-k sketch, every block contributes ≤ k
             candidates, ties broken by id; no RNG.
  assign     argmin over exact integer squared distances
             ||q − qc||² = |q|² − 2 q·qc + |qc|² computed as int64
             matmuls (|q·qc| ≤ d·2^42 — exact for d < 2^20); equal
             distances break to the lowest cluster index. Per-row
             results are independent of the batch split.
  update     per-block per-cluster (count, Σq) partials converted to
             arbitrary-precision Python ints, shard-grouped sum tree,
             driver reduce — exact at any corpus size; new centroid
             = rint(SCALE · Σq / (count · SCALE)) re-quantized, so the
             next iteration's inputs are again integers. Empty
             clusters keep their previous centroid.

Each iteration is ONE streaming scan emitting a (k·d + k)-int partial
per block — embeddings never shuffle, driver state is O(k·d). The
whole fit/assign is golden-oracle-able (tools/golden.py kmeans_sql
mirrors each integer op single-threaded).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

from vector_ray.ml.ann import _as_matrix
from vector_ray.ml.embed import SCALE


def _quant(col) -> np.ndarray:
    m = _as_matrix(col).astype(np.float64)
    return np.rint(m * SCALE).astype(np.int64)


def _fingerprints(t: pa.Table, id_col: str) -> np.ndarray:
    import pyarrow.compute as pc

    from vector_ray.expr import F

    return np.asarray(
        F.fingerprint(pc.fill_null(pc.cast(t[id_col], pa.string()), "\x00"))
        .to_numpy(zero_copy_only=False), np.uint64)


def _bottomk_init(ds, n_clusters: int, vec_col: str, id_col: str) -> np.ndarray:
    """Quantized init centroids: the k rows with the globally smallest
    (fingerprint(id), id). Each block ships at most k candidates."""

    def part(t: pa.Table) -> pa.Table:
        t = t.select([id_col, vec_col])
        h = _fingerprints(t, id_col)
        if len(t) > n_clusters:
            idx = np.sort(np.argpartition(h, n_clusters - 1)[:n_clusters])
            t = t.take(pa.array(idx, pa.int64()))
            h = h[idx]
        return t.append_column("__h", pa.array(h, pa.uint64()))

    from vector_ray.ml.ann import _as_matrix, _bottomk_table

    cand_ds = ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
    # two-level merge: per-bucket bottom-k bounds the driver fan-in to
    # O(buckets * k) rows instead of O(blocks * k); the final
    # (h, id)-sorted pick below is unchanged, so the selected centroids
    # are identical to the one-level collect
    t = _bottomk_table(cand_ds, n_clusters, tie_col=id_col)
    if t is None or t.num_rows == 0:
        raise ValueError("kmeans: empty input")
    t = t.sort_by([("__h", "ascending"), (id_col, "ascending")])
    vecs = _as_matrix(t.slice(0, n_clusters)[vec_col], dtype=np.float64)
    return np.rint(vecs * SCALE).astype(np.int64)


def _assign_int(q: np.ndarray, qc: np.ndarray) -> np.ndarray:
    """Exact-integer argmin_c ||q - qc||²; ties → lowest cluster."""
    # |q|² is constant per row — argmin needs only −2 q·qc + |qc|²
    cross = q @ qc.T  # int64 exact while d·2^42 < 2^63
    cn = np.einsum("ij,ij->i", qc, qc)  # |qc|² per cluster
    return np.argmin(cn[None, :] - 2 * cross, axis=1)


def kmeans_train(ds, *, n_clusters: int = 8, iters: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 reducers: int = 8, cache: bool = True) -> np.ndarray:
    """Fit centroids; returns float64[k, d] (= quantized grid / SCALE).
    ``iters`` streaming scans of the dataset, O(k·d) driver state.

    ``cache=True`` (default) projects to (id, vec) and materializes
    that ONCE into the object store, so the per-iteration scans re-read
    Arrow blocks instead of re-decoding parquet ``iters`` times; Ray
    spills to disk if the projection outgrows the store. Pass False to
    stream from source every iteration (lowest memory footprint)."""
    if cache:
        ds = ds.map_batches(
            lambda t: t.select([id_col, vec_col]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
    qc = _bottomk_init(ds, n_clusters, vec_col, id_col)
    k = len(qc)

    for _ in range(iters):
        qc_ref = qc.copy()

        def partial(t: pa.Table, _qc=qc_ref) -> pa.Table:
            import zlib

            q = _quant(t[vec_col])
            if len(q) and q.ndim == 2 and q.shape[1]:
                a = _assign_int(q, _qc)
                cnt = np.bincount(a, minlength=k).astype(object)
                sums = np.zeros((k, _qc.shape[1]), object)
                for c in np.unique(a):
                    sums[c] = q[a == c].sum(axis=0, dtype=np.int64).astype(object)
            else:
                cnt = np.zeros(k, object)
                sums = np.zeros((k, _qc.shape[1]), object)
            blob = pickle.dumps((cnt, sums), protocol=4)
            return pa.table({
                "shard": pa.array([zlib.crc32(blob) % max(reducers, 1)],
                                  pa.int32()),
                "part": pa.array([blob], pa.large_binary())})

        def sumgroup(g: pa.Table) -> pa.Table:
            tc, ts = None, None
            for blob in g["part"].to_pylist():
                c, s = pickle.loads(blob)
                tc = c if tc is None else tc + c
                ts = s if ts is None else ts + s
            return pa.table({"shard": g["shard"][:1],
                             "part": pa.array([pickle.dumps((tc, ts), 4)],
                                              pa.large_binary())})

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
        reduced = parts.groupby("shard").map_groups(
            sumgroup, batch_format="pyarrow")
        cnt, sums = None, None
        for row in reduced.take_all():
            c, s = pickle.loads(row["part"])
            cnt = c if cnt is None else cnt + c
            sums = s if sums is None else sums + s
        new = qc.copy()
        for c in range(k):
            if cnt[c]:
                # correctly-rounded bigint ratio → float64 → regrid;
                # round-half-even exactly as the golden mirror
                mean = np.array([float(v) for v in sums[c]],
                                np.float64) / int(cnt[c])
                new[c] = np.rint(mean).astype(np.int64)
        qc = new
    return qc.astype(np.float64) / SCALE


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", out: str = "cluster"):
    """Map-only: append ``cluster:int64`` by exact-integer argmin
    against the (re-quantized) centroids."""
    import ray

    qc_ref = ray.put(np.rint(np.asarray(centroids, np.float64)
                             * SCALE).astype(np.int64))

    def assign(t: pa.Table) -> pa.Table:
        qc = ray.get(qc_ref)
        q = _quant(t[vec_col])
        a = (_assign_int(q, qc) if len(q) and q.ndim == 2 and q.shape[1]
             else np.zeros(len(t), np.int64))
        return t.append_column(out, pa.array(a.astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def kmeans_cluster_stats(ds, centroids: np.ndarray, *,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id"):
    """Fit-quality summary, fully assignment-sensitive but k rows
    small: per cluster (cluster, n, id_hash) where id_hash is the
    polynomial checksum (mod 2^64, int64 bit pattern) of the ascending
    member ids — any reassignment anywhere changes a hash. One
    id-bucketed exchange of (cluster, id) pairs; payloads never move."""
    from vector_ray.stages.bucketed import bucketed_map_groups

    assigned = kmeans_assign(ds, centroids, vec_col=vec_col)

    def pairs(t: pa.Table) -> pa.Table:
        return t.select(["cluster", id_col])

    def per_cluster(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.sort(np.asarray(
            pc.cast(g[id_col], pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False)))
        # h = Σ ids[i]·P^(n-1-i) (mod 2^64), vectorized: uint64
        # multiply/sum wrap exactly mod 2^64
        P = np.uint64(0x100000001B3)
        n = len(ids)
        with np.errstate(over="ignore"):
            pows = np.ones(n, np.uint64)
            if n > 1:
                pows[1:] = np.cumprod(np.full(n - 1, P, np.uint64))
            h = np.sum(ids.astype(np.uint64) * pows[::-1], dtype=np.uint64)
        return pa.table({
            "cluster": g["cluster"][:1],
            "n": pa.array([len(g)], pa.int64()),
            "id_hash": pa.array([int(h.astype(np.int64))], pa.int64())})

    return bucketed_map_groups(
        assigned.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["cluster"], per_cluster)
