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
