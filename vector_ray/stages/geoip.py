"""GeoIP-style lookup — src/transforms/geoip.rs:92-123: enrich an IP
column with a nested target struct (city/country/continent/tz/latlon).

The MaxMind reader (`maxminddb`) is NOT in this container, so the real
database path is gated behind an import-try; ``GeoipLookup`` otherwise
uses a supplied CIDR-prefix table (list of (network, payload dict)) —
the same read-only-state actor-pool shape as the real thing: DB loaded
once per actor in ``__init__``, vectorized longest-prefix probe per
batch.
"""

from __future__ import annotations

import ipaddress
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from vector_ray.stages.base import Step

PAYLOAD_FIELDS = ["city_name", "country_code", "continent_code", "timezone", "latitude", "longitude"]


class _GeoipActor:
    def __init__(self, db_ref, field: str, target: str):
        db = ray.get(db_ref) if isinstance(db_ref, ray.ObjectRef) else db_ref
        # db: list of (cidr_str, payload dict). Longest-prefix match via
        # per-prefix-length exact lookup: for each prefix length L present
        # in the table keep a sorted array of network starts; probe
        # (ip & mask(L)) with searchsorted, longest L first. This is
        # correct for arbitrarily nested/sibling networks (unlike a
        # bounded backward walk over a single (start, end) ordering) and
        # stays fully vectorized: ≤33 searchsorted passes per batch.
        self.payloads: list = []
        by_len: dict = {}
        seen = set()
        for cidr, payload in db:
            net = ipaddress.ip_network(cidr)
            key = (net.prefixlen, int(net.network_address))
            if key in seen:  # first occurrence wins, deterministic
                continue
            seen.add(key)
            pidx = len(self.payloads)
            self.payloads.append(payload)
            by_len.setdefault(net.prefixlen, []).append((int(net.network_address), pidx))
        # (prefixlen, sorted starts, payload index aligned), longest first
        self.levels = []
        for L in sorted(by_len, reverse=True):
            entries = sorted(by_len[L])
            starts = np.array([e[0] for e in entries], dtype=np.uint32)
            pidxs = np.array([e[1] for e in entries], dtype=np.int64)
            self.levels.append((L, starts, pidxs))
        self.payload_type = pa.array(self.payloads).type if self.payloads else pa.struct([])
        self.field = field
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0 or not self.levels:
            return t.append_column(self.target, pa.nulls(n, self.payload_type))
        # vectorized dotted-quad → uint32 via one regex extract; invalid
        # rows (non-IPv4 strings, nulls) fall out as null → miss
        s = pc.extract_regex(
            pc.cast(t[self.field], pa.string()),
            r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$",
        )
        sc = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        valid = np.asarray(pc.is_valid(sc).to_numpy(zero_copy_only=False), dtype=bool)
        quads = np.zeros((n, 4), dtype=np.uint32)
        for j, part in enumerate("abcd"):
            col = pc.fill_null(pc.cast(pc.struct_field(sc, part), pa.uint32()), 0)
            quads[:, j] = col.to_numpy(zero_copy_only=False)
        valid &= (quads <= 255).all(axis=1)
        ipnum = (quads[:, 0] << 24) | (quads[:, 1] << 16) | (quads[:, 2] << 8) | quads[:, 3]
        match = np.full(n, -1, dtype=np.int64)
        remaining = valid.copy()
        for L, starts, pidxs in self.levels:  # longest prefix first
            if not remaining.any():
                break
            mask = np.uint32(0) if L == 0 else np.uint32(0xFFFFFFFF << (32 - L) & 0xFFFFFFFF)
            masked = ipnum & mask
            pos = np.searchsorted(starts, masked)
            posc = np.clip(pos, 0, len(starts) - 1)
            hit = remaining & (pos < len(starts)) & (starts[posc] == masked)
            match[hit] = pidxs[posc[hit]]
            remaining &= ~hit
        rows = [self.payloads[match[i]] if match[i] >= 0 else None for i in range(n)]
        struct = pa.array(rows)
        return t.append_column(self.target, struct)


class GeoipLookup(Step):
    fusable = False

    def __init__(
        self,
        field: str,
        *,
        database: Optional[str] = None,
        table: Optional[Sequence[Tuple[str, Dict]]] = None,
        target: str = "geoip",
        concurrency: int = 2,
    ):
        if database is not None:
            try:
                import maxminddb  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "maxminddb is not available in this container; pass "
                    "`table=[(cidr, payload), ...]` instead"
                ) from e
            raise NotImplementedError("mmdb path stub — use `table=` in this environment")
        if table is None:
            raise ValueError("need table=[(cidr, payload), ...]")
        self.table = list(table)
        self.field = field
        self.target = target
        self.concurrency = concurrency
        self._ref = None

    def apply(self, ds):
        if self._ref is None:
            self._ref = ray.put(self.table)
        return ds.map_batches(
            _GeoipActor,
            fn_constructor_kwargs=dict(db_ref=self._ref, field=self.field, target=self.target),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=self.concurrency,
        )

    def probe_batch(self, t: pa.Table) -> pa.Table:
        return _GeoipActor(self.table, self.field, self.target)(t)
