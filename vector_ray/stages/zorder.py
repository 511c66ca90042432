"""Z-order (Morton-curve) clustering for multi-column data pruning.

``zorder_key`` interleaves the bits of fixed-point-quantized column
ranks into one 64-bit key; ``zorder_sort`` sorts the dataset by that
key. Rows close on the space-filling curve are close on EVERY keyed
column at once, so a partitioned/row-grouped Parquet write of the
sorted stream gets tight per-file min/max statistics on ALL the keyed
columns — predicate pushdown then prunes fragments for filters on any
of them, not just the leading sort column. This is the standard lake
"OPTIMIZE ZORDER BY" layout technique (public: Morton 1966 curves;
widely documented in lakehouse engines).

100-TB plan: one cheap global min/max aggregate per keyed column (tiny
mergeable partials), then a map-only key stage (vectorized bit
interleave — no Python rows), then ONE Ray Data distributed sort on a
single uint64 column (range-partitioned all-to-all; the only wide
step, and it is the point: the sort IS the clustering). Quantization
is a pure function of the global min/max and ``bits``, so keys — and
the sorted order — are reproducible on any block layout.

Up to 4 columns at 16 bits each (or 2 at 32, etc.) fit the 64-bit
key; nulls quantize to bucket 0 (they cluster together at the curve
origin). Constant columns contribute a constant lane (no-op).

No reference counterpart (storage-layout optimizer — SURVEY SS2
"beyond the reference" family, write-path side).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_Z = "__vr_z"


def _spread_bits(v: np.ndarray, stride: int) -> np.ndarray:
    """Insert ``stride - 1`` zero bits between consecutive bits of each
    value (uint64), vectorized — the Morton expansion for ``stride``
    interleaved columns. Plain shift-or loop over the BIT positions
    (<= 32 iterations), every value at once."""
    if stride == 1:
        return v.astype(np.uint64)
    out = np.zeros_like(v, np.uint64)
    nbits = 64 // stride
    for b in range(nbits):
        out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * stride)
    return out


def _quantize(col, lo: float, hi: float, bits: int) -> np.ndarray:
    """Fixed-point rank in [0, 2^bits): linear over the global
    [lo, hi]; nulls (and NaNs) -> 0; constant columns -> 0."""
    v = pc.cast(col, pa.float64(), safe=False)
    x = np.asarray(v.combine_chunks().to_numpy(zero_copy_only=False),
                   np.float64)
    top = np.uint64((1 << bits) - 1)
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        return np.zeros(len(x), np.uint64)
    scaled = (x - lo) * (float(int(top)) / (hi - lo))
    with np.errstate(invalid="ignore"):
        q = np.clip(np.floor(scaled), 0, float(int(top)))
    q = np.where(np.isfinite(x), q, 0.0)
    return q.astype(np.uint64)


def zorder_key(t: pa.Table, cols: Sequence[str], ranges: dict,
               bits: int) -> np.ndarray:
    """uint64 Morton key per row from the quantized columns (column i
    occupies bit lanes i, i+stride, i+2*stride, ...)."""
    stride = len(cols)
    z = np.zeros(len(t), np.uint64)
    for i, c in enumerate(cols):
        lo, hi = ranges[c]
        q = _quantize(t[c], lo, hi, bits)
        z |= _spread_bits(q, stride) << np.uint64(i)
    return z


def column_ranges(ds, cols: Sequence[str]) -> dict:
    """Exact global (min, max) per column via one aggregate pass —
    fixed-size mergeable partials, never a materialization."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"__lo_{c}"),
                 Max(c, alias_name=f"__hi_{c}")]
    row = ds.aggregate(*aggs)
    out = {}
    for c in cols:
        lo, hi = row.get(f"__lo_{c}"), row.get(f"__hi_{c}")
        out[c] = (
            float(lo) if lo is not None else float("nan"),
            float(hi) if hi is not None else float("nan"),
        )
    return out


def zorder_sort(
    ds,
    cols: Sequence[str],
    *,
    bits: Optional[int] = None,
    keep_key: bool = False,
    ranges: Optional[dict] = None,
):
    """Sort the dataset along the Morton curve of ``cols`` (numeric
    columns; 1-4 of them). ``bits`` defaults to the largest per-column
    width that fits 64 bits (16 for 4 cols, 21 for 3, 32 for 2).
    ``keep_key`` retains the uint64 curve key as ``zkey``; pass
    ``ranges={col: (lo, hi)}`` to pin quantization bounds (e.g. reuse
    yesterday's bounds so today's incremental write stays aligned)."""
    cols = list(cols)
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_sort: need 1-4 key columns")
    b = bits or (64 // len(cols) if len(cols) > 1 else 32)
    if b * len(cols) > 64:
        raise ValueError(f"zorder_sort: {len(cols)} cols x {b} bits "
                         "exceeds the 64-bit key")
    rng = ranges or column_ranges(ds, cols)

    def key(t: pa.Table) -> pa.Table:
        return t.append_column(
            _Z, pa.array(zorder_key(t, cols, rng, b), pa.uint64()))

    out = ds.map_batches(key, batch_format="pyarrow",
                         zero_copy_batch=True).sort(_Z)
    if keep_key:
        def ren(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                ["zkey" if c == _Z else c for c in t.column_names])

        return out.map_batches(ren, batch_format="pyarrow",
                               zero_copy_batch=True)
    return out.drop_columns([_Z])


def zorder_write(ds, path: str, cols: Sequence[str], *,
                 bits: Optional[int] = None,
                 ranges: Optional[dict] = None, **write_kw):
    """Cluster-then-write: ``zorder_sort`` the stream and write
    Parquet. The sort range-partitions blocks along the curve, so each
    output file covers one compact curve segment — its min/max
    statistics are tight on EVERY keyed column, and predicate pushdown
    prunes files/row-groups for filters on any of them (the lakehouse
    "OPTIMIZE ZORDER BY" write path)."""
    out = zorder_sort(ds, cols, bits=bits, ranges=ranges)
    from vector_ray.sinks import write_parquet

    return write_parquet(out, path, **write_kw)
