"""Global row numbering — assign each row its contiguous 0..n-1 rank in
a total order, distributed (no driver materialization of the data).

Ray Data has no ROW_NUMBER(); the standard workaround
(``ds.take_all()`` + enumerate) puts the whole dataset on the driver.
This is the two-pass scale plan instead:

  1. one range-partitioned Sort on the order key (the only all-to-all);
     the sorted dataset is checkpointed (``materialize``) so pass 2
     does not re-run the sort — blocks live in the object store and
     spill to disk, never on the driver heap;
  2. a count pass reduces each sorted block to ONE (first-key, count)
     row — a few KB total — from which the driver computes per-block
     prefix offsets (driver work/state is O(#blocks));
  3. a map pass adds ``offset + arange(len(block))`` per block, keyed
     by each block's first row.

Correctness requires the combined (order_by + tiebreak) key to be
UNIQUE and non-null: sorted block ranges are then disjoint, so a block
is identified by its first key. A duplicated key could straddle a
block boundary and make the rank depend on the split — pass a unique
``tiebreak`` (e.g. the id column) when ``order_by`` alone can repeat.

Use after ml/sampling.deterministic_shuffle(keep_key=...) to turn the
hash order into contiguous training-example ids, or on any unique sort
key. The assigned numbering is deterministic and independent of block
layout / cluster shape.

Capability absent in the reference (no ranked/windowed operators in
its topology; SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa


def global_row_number(
    ds,
    order_by: Union[str, Sequence[str]],
    *,
    tiebreak: Optional[str] = None,
    out: str = "row_id",
    descending: bool = False,
    shard_size: Optional[int] = None,
    shard_col: str = "shard",
):
    """Append ``out``: the row's global 0-based rank in
    ``(order_by, tiebreak)`` order. The combined key must be unique
    and non-null.

    ``shard_size`` additionally appends ``shard_col = out // shard_size``
    — fixed-size training shards (every shard but the last has exactly
    ``shard_size`` rows); pass ``shard_col`` to the parquet sink's
    ``partition_cols`` for one directory per shard."""
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if tiebreak and tiebreak not in cols:
        cols.append(tiebreak)

    srt = ds.sort(cols, descending=descending).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        # one row per non-empty block: the block's first key + count
        head = t.select(cols).slice(0, min(1, t.num_rows))
        return head.append_column(
            "__vr_n", pa.array([t.num_rows] if t.num_rows else [], pa.int64()))

    # batch_size=None → one batch per block, so the first row
    # identifies the block; the stats table is one tiny row per block.
    stats = srt.map_batches(block_stat, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True)
    rows = stats.take_all()

    # Python tuple comparison must agree with the Arrow Sort order:
    # true for ints/floats/str (UTF-8 is codepoint-ordered) — the
    # unique+non-null contract rules out the null-placement divergence.
    rows.sort(key=lambda r: tuple(r[c] for c in cols), reverse=descending)
    offsets, acc = {}, 0
    for r in rows:
        ident = repr(tuple(r[c] for c in cols))
        if ident in offsets:
            raise ValueError(
                f"global_row_number: duplicate block-leading key {ident} — "
                "the (order_by, tiebreak) combination must be unique")
        offsets[ident] = acc
        acc += r["__vr_n"]

    def add_index(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            idx = np.empty(0, np.int64)
        else:
            off = offsets[repr(tuple(t[c][0].as_py() for c in cols))]
            idx = np.arange(off, off + t.num_rows, dtype=np.int64)
        t = t.append_column(out, pa.array(idx))
        if shard_size:
            t = t.append_column(shard_col, pa.array(idx // shard_size))
        return t

    return srt.map_batches(add_index, batch_size=None,
                           batch_format="pyarrow", zero_copy_batch=True)


def rank_values(
    ds,
    col: str,
    *,
    id_col: str,
    out_rank: str = "pct_rank",
    out_cume: str = "cume_dist",
    buckets: Optional[int] = None,
):
    """Exact GLOBAL ``percent_rank()`` / ``cume_dist()`` of ``col`` for
    every row — the rank-transform step of feature prep (and the exact
    complement of stages/quantile's cut-point estimators). Returns a
    Dataset (id_col, out_rank, out_cume) with

        out_rank = count(strictly below) / (n - 1)      [0 when n == 1]
        out_cume = count(below or equal) / n

    i.e. SQL ``percent_rank() OVER (ORDER BY col)`` / ``cume_dist()``
    with ties handled identically (all peers share one rank). Null
    values are EXCLUDED (no output row), matching a ``WHERE col IS NOT
    NULL`` oracle; values are ranked as float64.

    Scale plan — the payload never moves and nothing data-sized touches
    the driver:

      1. per-block value-count partials (one (value, count) row per
         DISTINCT value per block, value keyed by its float64 bit
         pattern so no string round-trip);
      2. grouped_aggregate merges partials → the distinct-value table
         (the first narrow shuffle — O(distinct) rows of 16 bytes);
      3. the distinct table sorts by value and gets an exact prefix
         sum by the global_row_number block-offset trick (driver sees
         ONE row per block);
      4. a bucketed join maps each (id, value) pair to its
         (below, count) — the second narrow shuffle.

    The per-key (grouped) variants of rank/cume_dist already live in
    stages/shift.partitioned_shift; this is the global-order version
    that a groupby cannot express. Capability absent in the reference
    (SURVEY.md §2.7)."""
    import pyarrow.compute as pc

    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.join import bucketed_join

    if buckets is None:
        from vector_ray.stages.bucketed import default_num_buckets

        buckets = default_num_buckets()

    _B, _C, _V, _BLW = "__vr_bits", "__vr_cnt", "__vr_val", "__vr_below"

    def _bits(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
        arr = pc.cast(arr, pa.float64())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        v = np.asarray(arr.to_numpy(zero_copy_only=False), np.float64)
        # normalize -0.0 → 0.0 so the bit key agrees with == semantics
        v = np.where(v == 0.0, 0.0, v)
        return v.view(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.drop_null()
        if len(arr) == 0:
            return pa.table({_B: pa.array([], pa.int64()),
                             _C: pa.array([], pa.int64())})
        vals = np.asarray(pc.cast(arr, pa.float64())
                          .to_numpy(zero_copy_only=False), np.float64)
        vals = np.where(vals == 0.0, 0.0, vals)
        u, c = np.unique(vals.view(np.int64), return_counts=True)
        return pa.table({_B: pa.array(u, pa.int64()),
                         _C: pa.array(c.astype(np.int64), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    dist = grouped_aggregate(parts, [_B], {_C: ("sum", _C)})

    def add_val(t: pa.Table) -> pa.Table:
        b = np.asarray(t[_B].combine_chunks()
                       .to_numpy(zero_copy_only=False)
                       if isinstance(t[_B], pa.ChunkedArray)
                       else t[_B].to_numpy(zero_copy_only=False),
                       np.int64)
        return t.append_column(_V, pa.array(b.view(np.float64)))

    srt = dist.map_batches(add_val, batch_format="pyarrow",
                           zero_copy_batch=True).sort(_V).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        head = t.select([_V]).slice(0, min(1, t.num_rows))
        tot = [int(pc.sum(t[_C]).as_py() or 0)] if t.num_rows else []
        return head.append_column("__vr_n", pa.array(tot, pa.int64()))

    stats = srt.map_batches(block_stat, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True)
    rows = stats.take_all()
    rows.sort(key=lambda r: r[_V])
    offsets, acc = {}, 0
    for r in rows:
        offsets[repr(r[_V])] = acc
        acc += r["__vr_n"]
    n = acc

    def add_below(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(_BLW, pa.array([], pa.int64()))
        off = offsets[repr(t[_V][0].as_py())]
        c = np.asarray(t[_C].combine_chunks()
                       .to_numpy(zero_copy_only=False)
                       if isinstance(t[_C], pa.ChunkedArray)
                       else t[_C].to_numpy(zero_copy_only=False),
                       np.int64)
        below = off + np.concatenate(([0], np.cumsum(c[:-1])))
        return t.append_column(_BLW, pa.array(below, pa.int64()))

    rank_tbl = srt.map_batches(add_below, batch_size=None,
                               batch_format="pyarrow",
                               zero_copy_batch=True).drop_columns([_V])

    def proj(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[col]))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids, _B: pa.array(_bits(t[col]))})

    pairs = ds.map_batches(proj, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = bucketed_join(pairs, rank_tbl, [_B], buckets=buckets)

    denom_rank = float(max(n - 1, 1))
    denom_cume = float(max(n, 1))

    def finish(t: pa.Table) -> pa.Table:
        below = pc.cast(t[_BLW], pa.float64())
        cnt = pc.cast(t[_C], pa.float64())
        return pa.table({
            id_col: t[id_col],
            out_rank: pc.divide(below, pa.scalar(denom_rank)),
            out_cume: pc.divide(pc.add(below, cnt),
                                pa.scalar(denom_cume)),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
