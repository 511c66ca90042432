"""Mergeable Bloom filter — bounded-memory corpus membership at 100 TB
(Bloom 1970; Kirsch & Mitzenmacher 2006 double hashing — public specs).

The use-case the exact-set broadcast in ml/tokens.decontaminate cannot
cover: filtering a NEW crawl snapshot against billions of previously-
seen keys (URLs, doc fingerprints, passage hashes). An exact set of
10^10 u64 hashes is 80 GB; a Bloom at 10 bits/key is 12 GB and at
k=4 holds the false-positive rate near (1-e^{-kn/m})^k — false
NEGATIVES are impossible, so "drop seen" never re-admits a duplicate.

Scale plan (build): per-block partial bitmaps (one fixed-size
``m_bits/8``-byte row per block, keys never shuffle) → hash-sharded
``groupby`` OR (R reducer rows — a two-level tree, so the driver sees
R bitmaps, not one per block) → final OR on the driver; the result
broadcasts once via ``ray.put`` for the probe pass (map-only).

Bit positions (exact spec — the golden oracle mirrors it):
``h = fnv1a(utf8(key))`` (the engine fingerprint kernel) for strings,
``uint64(key)`` for integers; ``h1 = sm64(h)``, ``h2 = sm64(h ^ GOLD)
| 1``; bit ``i`` (0 <= i < k) = ``(h1 + i*h2) mod m_bits``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _sm64(x: np.ndarray) -> np.ndarray:
    from vector_ray.ml.dedup import _sm64 as f

    return f(x)


class Bloom:
    """Fixed-size Bloom filter over u64 key hashes. ``words`` is the
    ``m_bits/64``-long uint64 bit array; OR-merge with ``merge``."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        self.m_bits = m_bits
        self.k = k
        self.words = (np.zeros(m_bits // 64, np.uint64)
                      if words is None else words)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(len(h), k) bit positions via Kirsch-Mitzenmacher."""
        h = h.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h1 = _sm64(h)
            h2 = _sm64(h ^ _GOLD) | np.uint64(1)
            ks = np.arange(self.k, dtype=np.uint64)
            pos = h1[:, None] + ks[None, :] * h2[:, None]
        return (pos & np.uint64(self.m_bits - 1)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.words, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, bool)
        pos = self._positions(h)
        bits = (self.words[pos >> 6]
                >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return bits.all(axis=1)

    def merge(self, other: "Bloom") -> "Bloom":
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        return Bloom(self.m_bits, self.k, self.words | other.words)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def _key_hashes(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """u64 hash per key: fingerprint (FNV-1a) for strings, the value
    itself (as u64 bit pattern) for integers — sm64 finalizes inside
    _positions either way."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from vector_ray.expr import F

        return np.asarray(F.fingerprint(col).to_numpy(zero_copy_only=False),
                          np.uint64)
    return np.asarray(col.to_numpy(zero_copy_only=False)).astype(np.uint64)


def bloom_build(ds, col: str, *, m_bits: int = 1 << 24, k: int = 4,
                reducers: int = 64) -> Bloom:
    """Distributed Bloom build over ``ds[col]``. Partials are SPARSE:
    each block emits only its NONZERO 64-bit words as (word_idx, word)
    rows — shuffle volume is O(set bits), never O(m_bits x blocks)
    like a dense bitmap exchange would be — sharded by word index
    (balanced regardless of key skew), OR-reduced per shard with one
    vectorized reduceat, then scattered into the final array on the
    driver (which holds m_bits/8 bytes once)."""

    def partial(t: pa.Table) -> pa.Table:
        b = Bloom(m_bits, k)
        b.add_hashes(_key_hashes(t[col]))
        nz = np.nonzero(b.words)[0]
        return pa.table({
            "shard": pa.array((nz % max(reducers, 1)).astype(np.int32)),
            "word_idx": pa.array(nz, pa.int64()),
            # u64 travels as its int64 bit pattern (Ray group keys /
            # Arrow ints are signed)
            "word": pa.array(b.words[nz].view(np.int64)),
        })

    def orgroup(g: pa.Table) -> pa.Table:
        idx = np.asarray(g["word_idx"].to_numpy(zero_copy_only=False))
        w = np.asarray(
            g["word"].to_numpy(zero_copy_only=False)).view(np.uint64)
        order = np.argsort(idx, kind="stable")
        idx, w = idx[order], w[order]
        new = np.ones(len(idx), bool)
        new[1:] = idx[1:] != idx[:-1]
        starts = np.nonzero(new)[0]
        merged = np.bitwise_or.reduceat(w, starts) if len(w) else w
        return pa.table({
            "word_idx": pa.array(idx[starts], pa.int64()),
            "word": pa.array(merged.view(np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = parts.groupby("shard").map_groups(orgroup,
                                                batch_format="pyarrow")
    out = Bloom(m_bits, k)
    for batch in reduced.iter_batches(batch_format="pyarrow"):
        idx = np.asarray(batch["word_idx"].to_numpy(zero_copy_only=False))
        w = np.asarray(
            batch["word"].to_numpy(zero_copy_only=False)).view(np.uint64)
        out.words[idx] |= w
    return out


def bloom_probe(ds, col: str, bloom: Bloom, *, out: str = "seen",
                mode: str = "flag"):
    """Map-only membership probe: ``mode="flag"`` appends boolean
    ``out``; ``"drop_seen"`` keeps only unseen rows (safe for
    incremental dedup — no false negatives means nothing seen is ever
    re-admitted); ``"keep_seen"`` the complement."""
    import ray

    bref = ray.put((bloom.m_bits, bloom.k, bloom.words))

    def probe(t: pa.Table) -> pa.Table:
        m_bits, k, words = ray.get(bref)
        b = Bloom(m_bits, k, words)
        seen = b.contains_hashes(_key_hashes(t[col]))
        if mode == "drop_seen":
            return t.filter(pa.array(~seen))
        if mode == "keep_seen":
            return t.filter(pa.array(seen))
        return t.append_column(out, pa.array(seen))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)
