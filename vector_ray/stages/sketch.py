"""Mergeable sketches for distributed aggregation.

The reference's only sketch is the Bloom filter in
tag_cardinality_limit (tag_cardinality_limit.rs:38-47) and the
mergeable AggregatedHistogram (metric.rs:160-164). At 10^12-row scale
the exact set/nunique aggregation in ``grouped_aggregate`` (distinct
lists in partials) stops being viable, so this module adds:

- ``HLL``: HyperLogLog (Flajolet et al., standard public algorithm)
  with numpy register arrays — per-batch partial sketches serialize to
  ``binary`` and merge by elementwise max, the canonical mergeable
  partial for COUNT DISTINCT.
- ``Histogram``: fixed-bucket mergeable histogram (the
  AggregatedHistogram semantics: bucket counts + count + sum merge by
  addition).

Both plug into ``grouped_aggregate`` via the ``approx_nunique`` and
``histogram`` spec kinds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F


class HLL:
    """HyperLogLog with 2^p registers (default p=12 → ~1.6% error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _alpha(m: int) -> float:
        if m >= 128:
            return 0.7213 / (1 + 1.079 / m)
        return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7)

    def add_hashes(self, h: np.ndarray):
        """Vectorized add of pre-hashed uint64 values."""
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1, via bit tricks on float64 exponent
        # (safe: rest has low bits set, never zero)
        # vectorized count-leading-zeros (standard binary descent)
        lz = np.zeros(len(h), dtype=np.uint32)
        v = rest.copy()
        with np.errstate(over="ignore"):
            for step in (32, 16, 8, 4, 2, 1):
                top_zero = (v >> np.uint64(64 - step)) == 0
                lz += np.where(top_zero, np.uint32(step), np.uint32(0))
                v = np.where(top_zero, v << np.uint64(step), v)
        rank = np.minimum(lz + 1, 255).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, arr):
        from vector_ray.sources.synth import _splitmix64

        f = F.fingerprint(pc.cast(arr, pa.string()))
        mask = pc.is_valid(f).to_numpy(zero_copy_only=False)
        vals = np.asarray(f.to_numpy(zero_copy_only=False)[mask], dtype=np.uint64)
        # FNV-1a avalanches poorly in the high bits (register index +
        # rank both live there) — finalize with splitmix64
        self.add_hashes(_splitmix64(vals))

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def merge_bytes(self, blob: bytes) -> "HLL":
        other = np.frombuffer(blob, dtype=np.uint8)
        np.maximum(self.registers, other, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h

    def estimate(self) -> int:
        m = self.m
        est = self._alpha(m) * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return int(round(est))


def hll_partial(arr, p: int = 12) -> bytes:
    """One batch → serialized HLL sketch of the column's values."""
    h = HLL(p)
    h.add_strings(arr)
    return h.to_bytes()


class Histogram:
    """Fixed-bucket mergeable histogram (AggregatedHistogram,
    metric.rs:160-164): counts per upper-bound bucket + count + sum."""

    def __init__(self, buckets):
        self.bounds = np.asarray(sorted(buckets), dtype=np.float64)
        self.counts = np.zeros(len(self.bounds) + 1, dtype=np.int64)
        self.count = 0
        self.sum = 0.0

    def add(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.searchsorted(self.bounds, v, side="left")
        np.add.at(self.counts, idx, 1)
        self.count += len(v)
        self.sum += float(v.sum())

    def merge(self, other: "Histogram") -> "Histogram":
        self.counts += other.counts
        self.count += other.count
        self.sum += other.sum
        return self

    def quantile(self, p: float) -> float:
        """Estimated quantile from bucket counts (upper-bound estimate —
        the mergeable stand-in for the reference's non-mergeable
        AggregatedSummary quantile snapshots, metric.rs:165-169)."""
        if self.count == 0:
            return float("nan")
        target = p * self.count
        cum = 0
        for i, c in enumerate(self.counts):
            cum += c
            if cum >= target:
                if i < len(self.bounds):
                    return float(self.bounds[i])
                return float("inf")  # above the last bound
        return float(self.bounds[-1]) if len(self.bounds) else float("nan")

    def to_dict(self) -> dict:
        return {
            "buckets": self.bounds.tolist(),
            "counts": self.counts.tolist(),
            "count": self.count,
            "sum": self.sum,
            "p50": self.quantile(0.5),
            "p90": self.quantile(0.9),
            "p99": self.quantile(0.99),
        }
