"""Reduce — src/transforms/reduce/mod.rs:221-257 with the per-field
merge strategies of reduce/merge_strategy.rs:9-21:

  discard retain sum max min array concat concat_newline
  shortest_array longest_array flat_unique

Batch semantics: the reference closes a group on ``ends_when`` /
``starts_when`` conditions or staleness, and final-flushes everything at
stream end (reduce/mod.rs:204-208). In batch, with no timers, a group =
all rows with the same ``group_by`` key between boundary rows; intra-
group order comes from an explicit ``order_by`` column. Without
``ends_when``/``starts_when`` the whole key is one group — exactly the
reference's end-of-input flush.

Execution: ``groupby(group_by).map_groups`` (shuffle). Default field
strategy (per reference): first value (discard = keep first event's
field); numeric defaults can be overridden via ``merge_strategies``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from vector_ray.expr import Cond
from vector_ray.stages.base import Step


def _merge_series(s: pd.Series, strategy: str):
    vals = s.dropna()
    if strategy == "discard":
        return s.iloc[0] if len(s) else None
    if strategy == "retain":
        return s.iloc[-1] if len(s) else None
    if strategy == "sum":
        return vals.sum() if len(vals) else None
    if strategy == "max":
        return vals.max() if len(vals) else None
    if strategy == "min":
        return vals.min() if len(vals) else None
    if strategy == "array":
        return list(s)
    if strategy == "concat":
        return " ".join(str(v) for v in vals)
    if strategy == "concat_newline":
        return "\n".join(str(v) for v in vals)
    if strategy == "shortest_array":
        arrays = [v for v in vals if isinstance(v, (list, np.ndarray))]
        return min(arrays, key=len) if arrays else None
    if strategy == "longest_array":
        arrays = [v for v in vals if isinstance(v, (list, np.ndarray))]
        return max(arrays, key=len) if arrays else None
    if strategy == "flat_unique":
        out = []
        seen = set()
        for v in vals:
            items = v if isinstance(v, (list, np.ndarray)) else [v]
            for x in items:
                k = (type(x).__name__, str(x))
                if k not in seen:
                    seen.add(k)
                    out.append(x)
        return out
    raise ValueError(f"unknown merge strategy {strategy}")


class Reduce(Step):
    fusable = False

    def __init__(
        self,
        group_by: Sequence[str],
        *,
        merge_strategies: Optional[Dict[str, str]] = None,
        order_by: Optional[str] = None,
        ends_when: Optional[Cond] = None,
        starts_when: Optional[Cond] = None,
        count_col: str = "n_rows",
    ):
        self.group_by = list(group_by)
        self.merge_strategies = merge_strategies or {}
        self.order_by = order_by
        self.ends_when = ends_when
        self.starts_when = starts_when
        self.count_col = count_col

    def _reduce_group(self, g: pd.DataFrame) -> pd.DataFrame:
        if self.order_by:
            g = g.sort_values(self.order_by, kind="mergesort")
        # sub-group segmentation by boundary conditions
        if self.ends_when is not None or self.starts_when is not None:
            tbl = pa.Table.from_pandas(g, preserve_index=False)
            seg = np.zeros(len(g), dtype=np.int64)
            if self.starts_when is not None:
                starts = np.asarray(self.starts_when(tbl).to_numpy(zero_copy_only=False), bool)
                seg += np.cumsum(starts)
            if self.ends_when is not None:
                ends = np.asarray(self.ends_when(tbl).to_numpy(zero_copy_only=False), bool)
                closed = np.concatenate([[0], np.cumsum(ends)[:-1]])
                seg += closed
            g = g.assign(__seg=seg)
            seg_keys = ["__seg"]
        else:
            seg_keys = []

        rows = []
        groups = g.groupby(seg_keys, sort=True) if seg_keys else [((0,), g)]
        for _, sub in groups:
            row = {}
            for k in self.group_by:
                row[k] = sub[k].iloc[0]
            for col in sub.columns:
                if col in self.group_by or col == "__seg":
                    continue
                strat = self.merge_strategies.get(col, "discard")
                row[col] = _merge_series(sub[col], strat)
            if self.count_col:
                row[self.count_col] = len(sub)
            rows.append(row)
        return pd.DataFrame(rows)

    def apply(self, ds):
        return ds.groupby(self.group_by).map_groups(self._reduce_group, batch_format="pandas")
