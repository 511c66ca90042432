"""Count-Min Sketch — mergeable point-frequency estimation (Cormode &
Muthukrishnan 2005 — public spec). Completes the engine's mergeable-
sketch family: HLL (distinct counts, stages/aggregate.py), Misra-Gries
(top-k, ml/corpus.py heavy_hitters), Bloom (membership, ml/bloom.py).

The 100-TB use-case: per-key frequency estimates (URL hits, token
document frequency, user event counts) when the distinct-key universe
is too wide to shuffle — the sketch is a fixed ``depth x width`` u64
matrix, partials merge by elementwise SUM, and estimates are upper
bounds (``est >= true``; error ``<= N/width`` with prob
``1 - 2^-depth``), so threshold filters built on it never miss a
genuinely heavy key.

Scale plan: per-block partial matrices (one fixed-size row per block;
keys never shuffle) → hash-sharded groupby SUM (two-level tree) →
driver SUM → ``ray.put`` broadcast for map-only estimate passes.
Unlike ml/bloom.py (whose partials are sparse nonzero words), DENSE
partials are the right encoding here: a CMS width is sized ~1/eps
(2^16..2^20) and a block with 10^5 mostly-distinct keys touches
~depth x distinct cells — the matrix saturates, and sparse
(cell, count) triples would be ~4x larger; the shuffle-volume lever
for CMS is bigger blocks, not sparsity.

Hash spec (exact — the golden oracle mirrors it): key hash ``h`` =
fnv1a(utf8) for strings / u64 bit pattern for ints (ml/bloom.py
_key_hashes); row ``i`` column = ``sm64(h ^ (GOLD * (i+1))) mod
width``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vector_ray.ml.bloom import _key_hashes

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _sm64(x: np.ndarray) -> np.ndarray:
    from vector_ray.ml.dedup import _sm64 as f

    return f(x)


class CountMin:
    def __init__(self, width: int, depth: int,
                 counts: np.ndarray | None = None):
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        self.width = width
        self.depth = depth
        self.counts = (np.zeros((depth, width), np.uint64)
                       if counts is None else counts)

    def _cols(self, h: np.ndarray) -> np.ndarray:
        """(depth, len(h)) column indices."""
        h = h.astype(np.uint64, copy=False)
        out = np.empty((self.depth, len(h)), np.int64)
        with np.errstate(over="ignore"):
            for i in range(self.depth):
                out[i] = (_sm64(h ^ (_GOLD * np.uint64(i + 1)))
                          & np.uint64(self.width - 1)).astype(np.int64)
        return out

    def add_hashes(self, h: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        if len(h) == 0:
            return
        cols = self._cols(h)
        w = (np.ones(len(h), np.uint64) if weights is None
             else weights.astype(np.uint64))
        for i in range(self.depth):
            # bincount-sum per row: O(width + n), no unbuffered add.at
            self.counts[i] += np.bincount(
                cols[i], weights=w.astype(np.float64),
                minlength=self.width).astype(np.uint64)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, np.uint64)
        cols = self._cols(h)
        est = self.counts[0][cols[0]]
        for i in range(1, self.depth):
            est = np.minimum(est, self.counts[i][cols[i]])
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth) == (other.width, other.depth)
        return CountMin(self.width, self.depth, self.counts + other.counts)


def cms_build(ds, col: str, *, width: int = 1 << 16, depth: int = 4,
              weight_col: str | None = None, reducers: int = 8) -> CountMin:
    """Distributed CMS build over ``ds[col]`` (optionally weighted by
    ``weight_col``). Returns the merged sketch on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        c = CountMin(width, depth)
        h = _key_hashes(t[col])
        w = (np.asarray(t[weight_col].to_numpy(zero_copy_only=False))
             if weight_col else None)
        c.add_hashes(h, w)
        shard = int(h[0] % np.uint64(max(reducers, 1))) if len(h) else 0
        return pa.table({
            "shard": pa.array([shard], pa.int32()),
            "counts": pa.array([c.counts.tobytes()], pa.large_binary()),
        })

    def sumgroup(g: pa.Table) -> pa.Table:
        acc = np.zeros((depth, width), np.uint64)
        for bm in g["counts"].to_pylist():
            acc += np.frombuffer(bm, np.uint64).reshape(depth, width)
        return pa.table({"shard": g["shard"][:1],
                         "counts": pa.array([acc.tobytes()],
                                            pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = parts.groupby("shard").map_groups(sumgroup,
                                                batch_format="pyarrow")
    out = CountMin(width, depth)
    for row in reduced.take_all():
        out.counts += np.frombuffer(row["counts"],
                                    np.uint64).reshape(depth, width)
    return out


def cms_estimate(ds, col: str, cms: CountMin, *, out: str = "est_count"):
    """Map-only pass appending the CMS upper-bound estimate of each
    row's key frequency."""
    import ray

    cref = ray.put((cms.width, cms.depth, cms.counts))

    def probe(t: pa.Table) -> pa.Table:
        width, depth, counts = ray.get(cref)
        c = CountMin(width, depth, counts)
        est = c.estimate_hashes(_key_hashes(t[col]))
        return t.append_column(out, pa.array(est.astype(np.int64),
                                             pa.int64()))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)
