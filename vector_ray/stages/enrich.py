"""Enrichment tables — the rebuild of lib/enrichment/src/lib.rs:37-74 +
src/enrichment_tables/file.rs as a broadcast hash join.

The reference loads a CSV once at topology build, hash-indexes the
declared equality keys (file.rs:301-326), and probes per event. Here the
small side is ``ray.put`` once on the driver and each actor in the pool
fetches it ONCE in ``__init__`` (object-store broadcast — never
re-shipped per batch); the probe is a vectorized per-batch
``pyarrow.Table.join`` (Arrow C++ hash join) instead of a per-row dict
lookup.

Semantics mirrored:
- ``mode="get"``  → exactly-one-row (get_enrichment_table_record):
  0 matches → nulls + ``_enrich_miss`` true; >1 matches per key is a
  config-time error (detected at table load).
- ``mode="find"`` → 0..N rows (find_enrichment_table_records): output
  row count can grow (left-outer multi-join).
- ``case_insensitive`` (Case::Insensitive, lib.rs:30-33) lowercases the
  join key on both sides.
- ``between=(probe_col, from_col, to_col)`` implements the
  BetweenDates condition (lib.rs:18-27) as a post-probe filter.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

import ray

from vector_ray.stages.base import Step

_KEY = "__enrich_key"


class EnrichmentTable:
    """Small-side table + declared key, loadable from CSV/Parquet
    (file.rs:109-158's schema handling → plain Arrow schema)."""

    def __init__(self, table: pa.Table, key: Sequence[str], *, case_insensitive: bool = False):
        self.key = list(key)
        self.case_insensitive = case_insensitive
        self.table = table

    @classmethod
    def from_csv(cls, path: str, key: Sequence[str], **kw) -> "EnrichmentTable":
        return cls(pacsv.read_csv(path), key, **kw)

    @classmethod
    def from_parquet(cls, path: str, key: Sequence[str], **kw) -> "EnrichmentTable":
        import pyarrow.parquet as pq

        return cls(pq.read_table(path), key, **kw)

    def _norm_key(self, cols: Sequence[pa.ChunkedArray]):
        parts = [pc.cast(c, pa.string()) for c in cols]
        if self.case_insensitive:
            parts = [pc.utf8_lower(p) for p in parts]
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, "\x1f")

    def prepared(self, select: Optional[Sequence[str]] = None, *, unique: bool) -> pa.Table:
        """Small side keyed by a single normalized __enrich_key column."""
        t = self.table
        keyed = t.append_column(_KEY, self._norm_key([t[k] for k in self.key]))
        cols = [c for c in (select or t.column_names) if c not in (_KEY,)]
        keyed = keyed.select([_KEY] + cols)
        if unique:
            # exactly-one semantics: duplicate keys are a config error
            n_keys = len(pc.unique(keyed[_KEY]))
            if n_keys != len(keyed):
                raise ValueError(
                    "enrichment table has duplicate keys under mode='get' "
                    "(get_enrichment_table_record requires exactly one row)"
                )
        return keyed


class _EnrichActor:
    """Actor-pool callable: fetch the broadcast table once, join per batch."""

    def __init__(
        self,
        table_ref,
        key_cols: Sequence[str],
        case_insensitive: bool,
        mode: str,
        miss_col: Optional[str],
        between: Optional[Tuple[str, str, str]],
        rename: Dict[str, str],
    ):
        self.small: pa.Table = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        self.key_cols = list(key_cols)
        self.case_insensitive = case_insensitive
        self.mode = mode
        self.miss_col = miss_col
        self.between = between
        self.rename = rename
        self.payload_cols = [c for c in self.small.column_names if c != _KEY]

    def _probe_key(self, tbl: pa.Table):
        parts = [pc.cast(tbl[k], pa.string()) for k in self.key_cols]
        if self.case_insensitive:
            parts = [pc.utf8_lower(p) for p in parts]
        return parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        # join only (key, row-idx) — wide/list payload (tokens!) stays out
        # of the join and is re-attached by row index, zero-copy.
        import numpy as np

        probe = pa.table(
            {_KEY: self._probe_key(tbl), "__row": pa.array(np.arange(n, dtype=np.int64))}
        )
        joined = probe.join(self.small, keys=_KEY, join_type="left outer")
        joined = joined.sort_by("__row")
        if self.mode == "get":
            base = tbl
        else:
            base = tbl.take(joined["__row"])
        for c in self.payload_cols:
            base = base.append_column(c, joined[c])
        joined = base
        if self.miss_col:
            first_payload = self.payload_cols[0]
            joined = joined.append_column(self.miss_col, pc.is_null(joined[first_payload]))
        if self.between:
            probe_col, lo, hi = self.between
            in_range = pc.and_(
                pc.less_equal(joined[lo], joined[probe_col]),
                pc.less_equal(joined[probe_col], joined[hi]),
            )
            if self.mode == "find":
                joined = joined.filter(pc.fill_null(in_range, False))
            else:
                # get: out-of-range → miss (null payload)
                for c in self.payload_cols:
                    joined = joined.set_column(
                        joined.column_names.index(c),
                        c,
                        pc.if_else(pc.fill_null(in_range, False), joined[c], pa.scalar(None, joined[c].type)),
                    )
        out = joined.drop_columns([c for c in (_KEY, "__row") if c in joined.column_names])
        if self.rename:
            out = out.rename_columns([self.rename.get(c, c) for c in out.column_names])
        return out


class Enrich(Step):
    """Actor-pool enrichment stage.

    >>> table = EnrichmentTable.from_csv("lookup.csv", key=["source"])
    >>> ds = Enrich(table, select=["region", "tier"]).apply(ds)
    """

    fusable = False

    def __init__(
        self,
        table: EnrichmentTable,
        *,
        select: Optional[Sequence[str]] = None,
        mode: str = "get",
        key_map: Optional[Dict[str, str]] = None,
        miss_col: Optional[str] = "_enrich_miss",
        between: Optional[Tuple[str, str, str]] = None,
        rename: Optional[Dict[str, str]] = None,
        concurrency: int = 4,
        batch_size: Optional[int] = None,
        num_cpus: float = 1,
    ):
        if mode not in ("get", "find"):
            raise ValueError("mode must be 'get' or 'find'")
        self.table = table
        self.mode = mode
        # probe-side key columns (default: same names as table key)
        self.key_cols = [key_map.get(k, k) for k in table.key] if key_map else list(table.key)
        small = table.prepared(select, unique=(mode == "get"))
        keep = [_KEY] + [c for c in small.column_names if c != _KEY and c not in self.key_cols]
        self.small = small.select(keep)
        self.miss_col = miss_col
        self.between = between
        self.rename = rename or {}
        self.concurrency = concurrency
        self.batch_size = batch_size
        self.num_cpus = num_cpus
        self._ref = None

    def _table_ref(self):
        if self._ref is None:
            self._ref = ray.put(self.small)
        return self._ref

    def apply(self, ds):
        return ds.map_batches(
            _EnrichActor,
            fn_constructor_kwargs=dict(
                table_ref=self._table_ref(),
                key_cols=self.key_cols,
                case_insensitive=self.table.case_insensitive,
                mode=self.mode,
                miss_col=self.miss_col,
                between=self.between,
                rename=self.rename,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=self.batch_size,
            concurrency=self.concurrency,
            num_cpus=self.num_cpus,
        )

    def probe_batch(self, tbl: pa.Table) -> pa.Table:
        """Single-process probe (for tests / fused local use)."""
        actor = _EnrichActor(
            self.small, self.key_cols, self.table.case_insensitive,
            self.mode, self.miss_col, self.between, self.rename,
        )
        return actor(tbl)
