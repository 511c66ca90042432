"""Dedupe — src/transforms/dedupe.rs:155-163.

Reference: drop an event when its key (the ``match``/``ignore`` field
list, dedupe.rs:18-23,102-129) was seen in an LRU cache of 5000
entries; the cache entries are TYPED so ``"123"`` and ``123`` are
distinct (dedupe.rs:131-143).

Batch semantics (documented approximation, SURVEY.md §7.4): the LRU
*window* has no meaning without arrival order — this engine implements
EXACT GLOBAL dedup: first row per key wins, "first" defined by an
explicit ``order_by`` column (row sequence / doc_id), so results are
deterministic under parallelism.

Scale path: a vectorized content-hash column (typed: the hash input is
``value + \\x1f + type_tag`` per field, preserving the reference's
type-distinction) is computed in ``map_batches``; then a per-batch
pre-dedup shrinks the shuffle; then ``stages/bucketed.bucketed_first``
finishes globally — a hash-bucket shuffle plus ONE vectorized
keep-first pass per bucket (O(buckets) Python calls, never one per
distinct key).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


from vector_ray.stages.base import Step

_HASH = "__dedupe_key"


def _type_tag(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    if pa.types.is_boolean(t):
        return "b"
    if pa.types.is_timestamp(t):
        return "t"
    return "s"


class Dedupe(Step):
    fusable = False

    def __init__(
        self,
        match: Sequence[str],
        *,
        order_by: Optional[str] = None,
        keep_key_col: bool = False,
    ):
        if not match:
            raise ValueError("dedupe needs at least one key field")
        self.match = list(match)
        self.order_by = order_by
        self.keep_key_col = keep_key_col

    def _key_batch(self, tbl: pa.Table) -> pa.Table:
        parts = []
        for f in self.match:
            col = tbl[f]
            tag = _type_tag(col.type)
            s = pc.cast(col, pa.string())
            s = pc.fill_null(s, "\x00null")
            parts.append(pc.binary_join_element_wise(s, tag, "\x1f"))
        key = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1e")
        tbl = tbl.append_column(_HASH, key)
        # local pre-dedup: keep first per key within the batch (cheap,
        # shrinks the shuffle; "first" by order_by if present else row order)
        if self.order_by and self.order_by in tbl.column_names:
            tbl = tbl.sort_by(self.order_by)
        # first-seen per key via dictionary codes (exact, no pandas
        # round-trip): np.unique returns the first occurrence index of
        # each code in row order
        import numpy as np

        codes = pc.dictionary_encode(tbl[_HASH].combine_chunks()).indices
        first_idx = np.unique(np.asarray(codes), return_index=True)[1]
        if len(first_idx) < len(tbl):
            tbl = tbl.take(pa.array(np.sort(first_idx)))
        return tbl

    def apply(self, ds):
        from vector_ray.stages.bucketed import bucketed_first

        keyed = ds.map_batches(self._key_batch, batch_format="pyarrow", zero_copy_batch=True)
        # global phase: hash-bucket shuffle + ONE vectorized keep-first
        # pass per bucket (O(buckets) Python calls, not O(distinct keys))
        return bucketed_first(
            keyed, [_HASH], order_by=self.order_by,
            drop=() if self.keep_key_col else (_HASH,),
        )
