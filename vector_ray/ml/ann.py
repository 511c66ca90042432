"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k — the query matrix is broadcast
  ONCE via ``ray.put``; each batch does one numpy matmul + argpartition
  and emits only its local top-k, so the driver-side merge sees
  (num_blocks × k) candidate rows, never the data.
- ``knn_ivf``: the scale path — coarse k-means centroids (trained on a
  sample, driver-side), each batch assigns its vectors to centroids and
  only batches owning a probed centroid do the matmul. At cluster
  scale the assignment becomes a bucketed layout (write vectors
  partitioned by centroid id; queries read only probed partitions).
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _as_matrix(col: pa.ChunkedArray, dtype=np.float32) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.FixedSizeListArray):
        flat = np.asarray(arr.values, dtype=dtype)
        return flat.reshape(len(arr), arr.type.list_size)
    flat = np.asarray(arr.flatten(), dtype=dtype)
    return flat.reshape(len(arr), flat.size // max(len(arr), 1))


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_brute(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Exact cosine top-k for each query row. Returns a pa.Table
    (query_idx, vec_id, cosine, rank) of len n_queries × k."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(q)  # broadcast once; tasks read zero-copy from plasma

    def topk(t: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        m = _normalize(_as_matrix(t[vec_col]))
        ids = np.asarray(t[id_col])
        sims = qm @ m.T  # (nq, nb)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = sims.shape[0]
        qi = np.repeat(np.arange(nq), kk)
        vi = idx.reshape(-1)
        return pa.table(
            {
                "query_idx": pa.array(qi, pa.int64()),
                id_col: pa.array(ids[vi]),
                "cosine": pa.array(sims[np.arange(nq)[:, None], idx].reshape(-1).astype(np.float64)),
            }
        )

    local = ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(len(g), dtype=np.int64)))

    return local.groupby("query_idx").map_groups(merge, batch_format="pyarrow")


def _bucketed_bottomk(cand, k: int, *, num_buckets: int = 32,
                      tie_col: str | None = None):
    """Two-level bottom-k merge for candidate streams carrying a
    ``__h`` uint64 column: coalesce the per-block candidate sets into
    ``num_buckets`` merged blocks (metadata-level repartition — no
    hash/sort exchange) and keep each merged block's bottom-``k``
    (sorted by ``__h`` [, tie_col]), so the driver's final merge reads
    O(num_buckets * k) rows instead of O(blocks * k) — at 10^5 blocks
    x 2048-row samples the one-level collect is hundreds of GB on one
    node; this is bounded. Selection is exact regardless of which
    candidates land in which merged block: any global bottom-k row is
    within its own block's bottom-k."""
    def keep(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        if len(t) <= k:
            return t
        keys = [("__h", "ascending")]
        if tie_col is not None:
            keys.append((tie_col, "ascending"))
        return t.sort_by(keys).slice(0, k)

    return cand.repartition(num_buckets).map_batches(
        keep, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)


def _bottomk_table(cand, k: int, *, num_buckets: int = 32,
                   tie_col: str | None = None) -> pa.Table | None:
    """`_bucketed_bottomk` + driver collection as ONE Arrow table
    (``take_batch(pyarrow)`` — no per-row Python dict conversion,
    which costs ~1 s at 65k rows x 64-dim vectors). The merged stream
    is bounded at num_buckets*k rows by construction; None when
    empty."""
    merged = _bucketed_bottomk(cand, k, num_buckets=num_buckets,
                               tie_col=tie_col)
    try:
        t = merged.take_batch(num_buckets * k + 1, batch_format="pyarrow")
    except ValueError as e:
        if "empty" in str(e).lower():
            return None
        raise
    return t.combine_chunks()


def _hash_sample_matrix(ds, vec_col: str, id_col: str, sample_size: int) -> np.ndarray:
    """Uniform deterministic training sample: the global bottom-
    ``sample_size`` rows by a hash of the id (a bottom-k sketch) —
    unbiased across fragments, unlike ``ds.limit`` which reads only the
    first blocks and inherits their key/cluster skew. Each block
    contributes at most ``sample_size`` candidates, an intermediate
    bucketed bottom-k (``_bucketed_bottomk``) bounds the driver fan-in
    to O(buckets * sample_size), and the returned rows are sorted by
    the id hash — like ``ml/pq._hash_sorted_sample``, the sample (and
    anything trained on it) is a pure function of the id SET, not of
    block layout or arrival order."""
    import pyarrow.compute as pc

    from vector_ray.expr import F

    def part(t: pa.Table) -> pa.Table:
        out = t.select([vec_col])
        h = np.asarray(
            F.fingerprint(pc.fill_null(pc.cast(t[id_col], pa.string()), "\x00"))
            .to_numpy(zero_copy_only=False),
            np.uint64,
        )
        if len(t) > sample_size:
            idx = np.sort(np.argpartition(h, sample_size - 1)[:sample_size])
            out = out.take(pa.array(idx, pa.int64()))
            h = h[idx]
        return out.append_column("__h", pa.array(h, pa.uint64()))

    cand = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    t = _bottomk_table(cand, sample_size)
    if t is None or t.num_rows == 0:
        return np.empty((0, 0), np.float32)
    hs = np.asarray(t["__h"].to_numpy(zero_copy_only=False), np.uint64)
    if len(hs) > sample_size:
        sel = np.argpartition(hs, sample_size - 1)[:sample_size]
    else:
        sel = np.arange(len(hs))
    keep = sel[np.argsort(hs[sel], kind="stable")]
    return _as_matrix(t[vec_col])[keep]


def kmeans_fit(sample: np.ndarray, n_clusters: int, *, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Tiny driver-side k-means (Lloyd) on a normalized sample."""
    x = _normalize(np.asarray(sample, dtype=np.float32))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def knn_ivf(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 5,
):
    """IVF approximate top-k: centroids from a driver-side sample;
    batches prune to vectors assigned to the probed centroids."""
    sample = _hash_sample_matrix(ds, vec_col, id_col, sample_size)
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probed = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    state = ray.put((q, cent, probed))

    def ivf_topk(t: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(state)
        m = _normalize(_as_matrix(t[vec_col]))
        ids = np.asarray(t[id_col])
        assign = np.argmax(m @ cm.T, axis=1)
        out = {"query_idx": [], id_col: [], "cosine": []}
        for qi in range(len(qm)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sub = m[mask]
            sims = sub @ qm[qi]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out["query_idx"].extend([qi] * kk)
            out[id_col].extend(ids[mask][idx].tolist())
            out["cosine"].extend(sims[idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], pa.int64()),
                id_col: pa.array(out[id_col]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    local = ds.map_batches(ivf_topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(len(g), dtype=np.int64)))

    return local.groupby("query_idx").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF bucketed layout — the 100-TB ANN story: vectors are WRITTEN
# partitioned by centroid id, so a query with n_probe probes reads only
# n_probe/n_clusters of the data from storage (verified by the
# rows_read/files_read stats ivf_search returns). Fulfils the layout
# promised in knn_ivf's docstring.


def ivf_build(
    ds,
    index_dir: str,
    *,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 5,
) -> np.ndarray:
    """Fit coarse centroids from a sample, then write the dataset
    partitioned by assigned centroid (one hive directory per cluster —
    also the resumable-output shape). Returns the centroid matrix and
    saves it beside the partitions."""
    import os

    sample = _hash_sample_matrix(ds, vec_col, id_col, sample_size)
    cent = kmeans_fit(sample, n_clusters, seed=seed)
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        m = _normalize(_as_matrix(t[vec_col]))
        a = np.argmax(m @ cm.T, axis=1).astype(np.int32)
        # partition col is stripped into the path on write; keep a data
        # copy so per-batch probing can see its cluster when partitions
        # are read individually
        t = t.append_column("centroid", pa.array(a))
        return t.append_column("centroid_id", pa.array(a))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        index_dir, partition_cols=["centroid"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    return cent


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Top-k over a bucketed IVF index: reads ONLY the partitions of the
    probed centroids. Returns (results_dataset, stats) where stats
    reports files/rows read vs the index total."""
    import glob
    import os

    import ray.data as rd

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probed = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_set = sorted({int(c) for row in probed for c in row})
    all_dirs = sorted(glob.glob(os.path.join(index_dir, "centroid=*")))
    probed_dirs = [d for d in all_dirs
                   if int(os.path.basename(d).split("=")[1]) in probe_set]
    paths = [f for d in probed_dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    all_files = [f for d in all_dirs for f in glob.glob(os.path.join(d, "*.parquet"))]
    stats = {
        "files_read": len(paths),
        "files_total": len(all_files),
        "clusters_probed": len(probe_set),
        "clusters_total": len(all_dirs),
    }
    state = ray.put((q, probed))

    def topk(t: pa.Table) -> pa.Table:
        qm, pr = ray.get(state)
        cc = t["centroid_id"]
        cc = cc.combine_chunks() if isinstance(cc, pa.ChunkedArray) else cc
        cents = np.asarray(pc.cast(cc, pa.int64()).to_numpy(zero_copy_only=False))
        m = _normalize(_as_matrix(t[vec_col]))
        ids = np.asarray(t[id_col])
        out = {"query_idx": [], id_col: [], "cosine": []}
        for qi in range(len(qm)):
            mask = np.isin(cents, pr[qi])
            if not mask.any():
                continue
            sims = m[mask] @ qm[qi]
            kk = min(k, len(sims))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out["query_idx"].extend([qi] * kk)
            out[id_col].extend(ids[mask][idx].tolist())
            out["cosine"].extend(sims[idx].astype(np.float64).tolist())
        return pa.table({
            "query_idx": pa.array(out["query_idx"], pa.int64()),
            id_col: pa.array(out[id_col]),
            "cosine": pa.array(out["cosine"], pa.float64()),
        })

    import pyarrow.parquet as _pq

    ds = rd.read_parquet(paths)
    # row counts from parquet footers only — no data read
    stats["rows_read"] = sum(_pq.ParquetFile(f).metadata.num_rows for f in paths)
    stats["rows_total"] = sum(_pq.ParquetFile(f).metadata.num_rows for f in all_files)
    local = ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        return g.append_column("rank", pa.array(np.arange(len(g), dtype=np.int64)))

    return local.groupby("query_idx").map_groups(merge, batch_format="pyarrow"), stats


# ---------------------------------------------------------------------------
# k-NN GRAPH — every row is both query and index member. The building
# block for graph-based curation (mutual-kNN clusters, kNN-density
# outlier scores, label propagation over neighbors).


def knn_graph(
    ds,
    *,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 5,
    max_cluster: int = 200_000,
    query_chunk: int = 256,
):
    """Cosine k-nearest-neighbor graph over the dataset itself:
    (src, dst, cosine, rank) with ``k`` neighbors per row, self
    excluded, ties broken by ascending dst id.

    Plan (IVF-partitioned all-pairs): coarse centroids from a
    bottom-k id-hash sample (driver k-means, broadcast once); one
    scatter pass emits each vector ONCE as a member of its argmax
    cluster and ``n_probe`` times as a query replica to its nearest
    centroids; one shuffle co-locates each cluster; per cluster ONE
    chunked float64 matmul finds each query's local top-k; the final
    bucketed merge keeps the global top-k per src. Shuffle volume is
    (1 + n_probe) x the (id, vec) projection — payload columns never
    move. ``n_probe=None`` probes every cluster, which makes the
    graph EXACT (the brute-force oracle shape); small n_probe is the
    scale path (recall < 1 like any IVF search).

    A cluster wider than ``max_cluster`` members is truncated with a
    logged warning (mirrors the LSH bucket caps in ml/dedup.py) —
    one degenerate centroid must not absorb the whole corpus into a
    single task."""
    sample = _hash_sample_matrix(ds, vec_col, id_col, sample_size)
    cent = kmeans_fit(sample, n_clusters, seed=seed).astype(np.float64)
    ncl = len(cent)
    probe = ncl if n_probe is None else min(int(n_probe), ncl)
    cref = ray.put(cent)

    def scatter(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        m = _as_matrix(t[vec_col]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        vecs = t[vec_col].combine_chunks() if isinstance(
            t[vec_col], pa.ChunkedArray) else t[vec_col]
        sims = m @ cm.T
        own = np.argmax(sims, axis=1).astype(np.int32)
        if probe >= ncl:
            pr = np.tile(np.arange(ncl, dtype=np.int32), len(t))
        else:
            # argmax (the member cluster) is always the first probe
            pr = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            pr = pr.astype(np.int32).reshape(-1)
        member = pa.table({
            "cluster": pa.array(own),
            id_col: ids,
            vec_col: vecs,
            "role": pa.array(np.zeros(len(t), np.int8)),
        })
        qidx = pa.array(np.repeat(np.arange(len(t), dtype=np.int64),
                                  probe if probe < ncl else ncl))
        query = pa.table({
            "cluster": pa.array(pr),
            id_col: ids.take(qidx),
            vec_col: vecs.take(qidx),
            "role": pa.array(np.ones(len(qidx), np.int8)),
        })
        return pa.concat_tables([member, query])

    proj = ds.select_columns([id_col, vec_col])
    scattered = proj.map_batches(scatter, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def cluster_knn(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        roles = np.asarray(g["role"].to_numpy(zero_copy_only=False))
        mem = g.filter(pa.array(roles == 0))
        qry = g.filter(pa.array(roles == 1))
        empty = pa.table({
            "src": pa.array([], g[id_col].type),
            "dst": pa.array([], g[id_col].type),
            "cosine": pa.array([], pa.float64()),
        })
        if len(mem) == 0 or len(qry) == 0:
            return empty
        if len(mem) > max_cluster:
            import logging

            logging.getLogger(__name__).warning(
                "knn_graph: cluster with %d members truncated to "
                "max_cluster=%d", len(mem), max_cluster)
            mem = mem.slice(0, max_cluster)
        mm = _as_matrix(mem[vec_col]).astype(np.float64)
        mm /= np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        mids = mem[id_col].combine_chunks() if isinstance(
            mem[id_col], pa.ChunkedArray) else mem[id_col]
        mid_np = np.asarray(mids.to_numpy(zero_copy_only=False))
        qm = _as_matrix(qry[vec_col]).astype(np.float64)
        qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
        qids = qry[id_col].combine_chunks() if isinstance(
            qry[id_col], pa.ChunkedArray) else qry[id_col]
        qid_np = np.asarray(qids.to_numpy(zero_copy_only=False))
        outs = []
        # chunk the query rows so the sims matrix stays bounded at
        # query_chunk x |members| regardless of cluster width
        for s in range(0, len(qm), query_chunk):
            qc = qm[s:s + query_chunk]
            qi = qid_np[s:s + query_chunk]
            sims = qc @ mm.T  # (cq, nm)
            sims[qi[:, None] == mid_np[None, :]] = -np.inf  # self
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(qc)), kk)
            cols = idx.reshape(-1)
            cos = sims[rows, cols]
            keep = np.isfinite(cos)  # width-1 clusters: only self
            outs.append(pa.table({
                "src": pa.array(np.repeat(qi, kk)[keep]),
                "dst": pa.array(mid_np[cols][keep]),
                "cosine": pa.array(cos[keep], pa.float64()),
            }))
        return pa.concat_tables(outs) if outs else empty

    local = scattered.groupby("cluster").map_groups(
        cluster_knn, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        # one vectorized pass per hash bucket: sort, run-segment by
        # src, keep the first k rows of each run, rank = pos in run
        if len(g) == 0:
            return g.append_column("rank", pa.array([], pa.int64()))
        g = g.combine_chunks().sort_by([
            ("src", "ascending"), ("cosine", "descending"),
            ("dst", "ascending")])
        from vector_ray.stages.bucketed import _run_starts

        new_run = _run_starts(g, ["src"])
        starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(starts, len(g)))
        pos = np.arange(len(g)) - np.repeat(starts, run_len)
        g = g.append_column("rank", pa.array(pos, pa.int64()))
        return g.filter(pa.array(pos < k))

    from vector_ray.stages.bucketed import bucketed_map_groups

    return bucketed_map_groups(local, ["src"], merge)


def semantic_join(
    left,
    right,
    *,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    right_vec_col: str | None = None,
    right_id_col: str | None = None,
    sample_size: int = 2048,
    seed: int = 5,
    max_cluster: int = 200_000,
    query_chunk: int = 256,
):
    """Cross-corpus ANN join: for every LEFT row, the top-k cosine
    neighbors among RIGHT rows — (src, dst, cosine, rank). The
    two-dataset generalization of :func:`knn_graph` (same IVF scatter
    plan, no self-exclusion): centroids train on RIGHT's id-hash
    sample; right vectors ship ONCE to their argmax cluster, left
    vectors replicate to their ``n_probe`` nearest centroids; one
    shuffle co-locates each cluster, a chunked float64 matmul finds
    local top-k, and a bucketed merge keeps the global top-k per src.
    ``n_probe=None`` probes every cluster → EXACT join (oracle shape);
    small n_probe is the scale path. The link step of RETRO-style
    retrieval corpus construction and cross-snapshot semantic dedup."""
    rvec = right_vec_col or vec_col
    rid = right_id_col or id_col
    sample = _hash_sample_matrix(right, rvec, rid, sample_size)
    cent = kmeans_fit(sample, n_clusters, seed=seed).astype(np.float64)
    ncl = len(cent)
    probe = ncl if n_probe is None else min(int(n_probe), ncl)
    cref = ray.put(cent)

    def scatter_member(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        m = _as_matrix(t[rvec]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        own = np.argmax(m @ cm.T, axis=1).astype(np.int32)
        ids = t[rid].combine_chunks() if isinstance(
            t[rid], pa.ChunkedArray) else t[rid]
        vecs = t[rvec].combine_chunks() if isinstance(
            t[rvec], pa.ChunkedArray) else t[rvec]
        return pa.table({
            "cluster": pa.array(own), "__jid": ids, "__jvec": vecs,
            "role": pa.array(np.zeros(len(t), np.int8))})

    def scatter_query(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        m = _as_matrix(t[vec_col]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        vecs = t[vec_col].combine_chunks() if isinstance(
            t[vec_col], pa.ChunkedArray) else t[vec_col]
        sims = m @ cm.T
        if probe >= ncl:
            pr = np.tile(np.arange(ncl, dtype=np.int32), len(t))
        else:
            pr = np.argsort(-sims, axis=1, kind="stable")[:, :probe]
            pr = pr.astype(np.int32).reshape(-1)
        qidx = pa.array(np.repeat(np.arange(len(t), dtype=np.int64),
                                  probe if probe < ncl else ncl))
        return pa.table({
            "cluster": pa.array(pr), "__jid": ids.take(qidx),
            "__jvec": vecs.take(qidx),
            "role": pa.array(np.ones(len(qidx), np.int8))})

    members = right.select_columns([rid, rvec]).map_batches(
        scatter_member, batch_format="pyarrow", zero_copy_batch=True)
    queries = left.select_columns([id_col, vec_col]).map_batches(
        scatter_query, batch_format="pyarrow", zero_copy_batch=True)
    scattered = members.union(queries)

    def cluster_knn(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        roles = np.asarray(g["role"].to_numpy(zero_copy_only=False))
        mem = g.filter(pa.array(roles == 0))
        qry = g.filter(pa.array(roles == 1))
        empty = pa.table({
            "src": pa.array([], g["__jid"].type),
            "dst": pa.array([], g["__jid"].type),
            "cosine": pa.array([], pa.float64())})
        if len(mem) == 0 or len(qry) == 0:
            return empty
        if len(mem) > max_cluster:
            if n_probe is None:
                # exact mode (probe all clusters) advertises brute-force
                # equality — silently dropping members would break it;
                # fail loud and tell the caller how to proceed
                raise ValueError(
                    f"semantic_join: cluster with {len(mem)} members "
                    f"exceeds max_cluster={max_cluster} in exact mode "
                    f"(n_probe=None); raise max_cluster, increase "
                    f"n_clusters, or set n_probe for the approximate "
                    f"path (which truncates oversized clusters)")
            import logging

            logging.getLogger(__name__).warning(
                "semantic_join: cluster with %d members truncated to "
                "max_cluster=%d", len(mem), max_cluster)
            mem = mem.slice(0, max_cluster)
        mm = _as_matrix(mem["__jvec"]).astype(np.float64)
        mm /= np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        mid_np = np.asarray(mem["__jid"].combine_chunks()
                            .to_numpy(zero_copy_only=False))
        qm = _as_matrix(qry["__jvec"]).astype(np.float64)
        qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
        qid_np = np.asarray(qry["__jid"].combine_chunks()
                            .to_numpy(zero_copy_only=False))
        outs = []
        for s in range(0, len(qm), query_chunk):
            qc = qm[s:s + query_chunk]
            qi = qid_np[s:s + query_chunk]
            sims = qc @ mm.T
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(qc)), kk)
            cols = idx.reshape(-1)
            outs.append(pa.table({
                "src": pa.array(np.repeat(qi, kk)),
                "dst": pa.array(mid_np[cols]),
                "cosine": pa.array(sims[rows, cols], pa.float64())}))
        return pa.concat_tables(outs) if outs else empty

    local = scattered.groupby("cluster").map_groups(
        cluster_knn, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return g.append_column("rank", pa.array([], pa.int64()))
        g = g.combine_chunks().sort_by([
            ("src", "ascending"), ("cosine", "descending"),
            ("dst", "ascending")])
        from vector_ray.stages.bucketed import _run_starts

        new_run = _run_starts(g, ["src"])
        starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(starts, len(g)))
        pos = np.arange(len(g)) - np.repeat(starts, run_len)
        g = g.append_column("rank", pa.array(pos, pa.int64()))
        return g.filter(pa.array(pos < k))

    from vector_ray.stages.bucketed import bucketed_map_groups

    return bucketed_map_groups(local, ["src"], merge)
