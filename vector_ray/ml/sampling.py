"""Deterministic sampling / mixture operators for training-data curation
over any keyed table (documents, tokenized sequences):

  mixture_sample        per-domain sampling rates (the "data mixture
                        weights" step of corpus assembly) — keep a row
                        iff fnv1a(id|seed) % SCALE < rate[key]*SCALE
  split_holdout         deterministic train/holdout split on the same
                        hash predicate (complementary, seed-stable)
  per_key_cap           uniform k-without-replacement per key via
                        hash-min reservoir (domain quota capping):
                        the k rows with the smallest salted id-hash
                        per key ARE a uniform sample of that key
  deterministic_shuffle reproducible global shuffle: sort by the
                        salted id-hash (a range-partitioned sort —
                        the scale path; ``random_shuffle`` would
                        materialize every block twice and is not
                        seed-reproducible across cluster shapes)

All are hash-deterministic: same seed → same rows on any cluster shape,
which is what makes training-corpus assembly resumable and auditable.
The reference's `sample` transform keeps 1-in-N by seahash of a key
field (src/transforms/sample.rs:96-133); these generalize that to
per-key rates, quotas, splits and order.

Scale notes: mixture_sample / split_holdout are stateless filters (no
shuffle, one vectorized pass). per_key_cap shuffles at most k rows per
(key, block) — the grouped_topk two-phase plan. deterministic_shuffle
is one Sort (range partition + merge), the only all-to-all here.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import vector_ray.expr.kernels as F

_SCALE = np.uint64(1_000_000)


def _salted_hash(t: pa.Table, id_col: str, seed: int) -> np.ndarray:
    """fnv1a(str(id) + '|' + str(seed)) per row, vectorized, as u64."""
    ids = t[id_col]
    if not pa.types.is_string(ids.type) and not pa.types.is_large_string(ids.type):
        ids = pc.cast(ids, pa.string())
    salted = pc.binary_join_element_wise(ids, pa.scalar(str(seed)), pa.scalar("|"))
    return np.asarray(F.fingerprint(salted).to_numpy(zero_copy_only=False), np.uint64)


def mixture_sample(
    ds,
    rates: Dict[str, float],
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 0,
):
    """Keep each row with probability ``rates[key]`` (``default_rate``
    for unlisted keys), deterministically by id hash. Stateless filter:
    no shuffle, rates dict is captured in the task closure (tiny)."""
    thresholds = {k: np.uint64(int(round(min(max(v, 0.0), 1.0) * int(_SCALE)))) for k, v in rates.items()}
    default_t = np.uint64(int(round(min(max(default_rate, 0.0), 1.0) * int(_SCALE))))

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _salted_hash(t, id_col, seed) % _SCALE
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not pa.types.is_string(keys.type) and not pa.types.is_large_string(keys.type):
            keys = pc.cast(keys, pa.string())
        # null keys take the default rate via a sentinel no real key uses
        d = pc.fill_null(keys, "\x00").dictionary_encode()
        per_code = np.array(
            [thresholds.get(v, default_t) for v in d.dictionary.to_pylist()],
            np.uint64,
        )
        codes = np.asarray(d.indices.to_numpy(zero_copy_only=False))
        thr = per_code[codes] if len(per_code) else np.zeros(len(codes), np.uint64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def split_holdout(
    ds,
    frac: float,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    which: str = "train",
):
    """Deterministic train/holdout split: a row is holdout iff
    fnv1a(id|seed) % SCALE < frac*SCALE. ``which`` selects the side;
    the two sides are exactly complementary for a fixed seed."""
    if which not in ("train", "holdout"):
        raise ValueError(f"which must be 'train' or 'holdout', got {which!r}")
    thr = np.uint64(int(round(min(max(frac, 0.0), 1.0) * int(_SCALE))))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = _salted_hash(t, id_col, seed) % _SCALE
        mask = h < thr if which == "holdout" else h >= thr
        return t.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


_HKEY = "__vr_hkey"


def per_key_cap(
    ds,
    key_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
):
    """At most ``k`` rows per key, chosen uniformly without replacement
    (hash-min reservoir): keep the k smallest salted id-hashes per key.
    Two-phase — each block contributes ≤k rows per key to the shuffle
    (stages/topk.py), so a 10^9-row hot domain ships ≤ k·#blocks rows.
    Deterministic and stable across cluster shape / block layout."""
    from vector_ray.stages.topk import grouped_topk

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_HKEY, pa.array(_salted_hash(t, id_col, seed), pa.uint64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(keyed, [key_col], _HKEY, k, descending=False, tiebreak=id_col)
    return out.drop_columns([_HKEY])


def deterministic_shuffle(
    ds,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    keep_key: Optional[str] = None,
):
    """Reproducible global shuffle: order rows by fnv1a(id|seed).
    One range-partitioned Sort — same seed gives the same order on any
    cluster, unlike ``random_shuffle``. ``keep_key`` retains the sort
    key under that name (e.g. to derive shard/position downstream)."""
    out_col = keep_key or _HKEY

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pa.array(_salted_hash(t, id_col, seed), pa.uint64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = keyed.sort([out_col, id_col])
    if keep_key is None:
        out = out.drop_columns([_HKEY])
    return out
