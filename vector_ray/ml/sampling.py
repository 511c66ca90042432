"""Deterministic sampling / mixture operators for training-data curation
over any keyed table (documents, tokenized sequences):

  mixture_sample        per-domain sampling rates (the "data mixture
                        weights" step of corpus assembly) — keep a row
                        iff sm64(fnv1a(id|seed)) % SCALE < rate[key]*SCALE
  split_holdout         deterministic train/holdout split on the same
                        hash predicate (complementary, seed-stable)
  per_key_cap           uniform k-without-replacement per key via
                        hash-min reservoir (domain quota capping):
                        the k rows with the smallest salted id-hash
                        per key ARE a uniform sample of that key
  uniform_sample_k      exactly-k uniform global sample via bottom-k
                        of the salted id-hash — shuffle-free (≤k rows
                        leave each block)
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


def _sm64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized). FNV-1a alone is NOT enough
    here: the seed is a short suffix, and a last-byte change only
    perturbs the hash by O(prime) ≈ 2^42 — adjacent seeds would give
    nearly identical ORDERINGS, so every order-based sampler
    (per_key_cap, uniform_sample_k, deterministic_shuffle,
    token_budget_cap) would barely re-sample across seeds. The
    finalizer decorrelates them."""
    x = np.asarray(x, np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _salted_hash(t: pa.Table, id_col: str, seed: int) -> np.ndarray:
    """sm64(fnv1a(str(id) + '|' + str(seed))) per row, vectorized, u64."""
    ids = t[id_col]
    if not pa.types.is_string(ids.type) and not pa.types.is_large_string(ids.type):
        ids = pc.cast(ids, pa.string())
    salted = pc.binary_join_element_wise(ids, pa.scalar(str(seed)), pa.scalar("|"))
    return _sm64(np.asarray(F.fingerprint(salted).to_numpy(zero_copy_only=False), np.uint64))


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


_OVF = "__vr_ovf"


def _budget_pass(t: pa.Table, key_col: str, weight_col: str, id_col: str,
                 budget: int, *, emit_markers: bool) -> pa.Table:
    """One strict-prefix budget pass over a table carrying ``_HKEY``:
    sort by (key, hash, id), keep rows whose per-key inclusive prefix
    sum of ``weight_col`` is ≤ ``budget``. With ``emit_markers`` the
    FIRST overflowing row per key is kept too, flagged ``_OVF=True`` —
    the phase-1 → phase-2 cutoff signal (see ``token_budget_cap``).
    Without markers, rows at/after any incoming ``_OVF`` row are
    dropped before the prefix test (phase 2)."""
    if len(t) == 0:
        if emit_markers and _OVF not in t.column_names:
            return t.append_column(_OVF, pa.array([], pa.bool_()))
        if not emit_markers and _OVF in t.column_names:
            return t.drop_columns([_OVF])
        return t
    t = t.sort_by([(key_col, "ascending"), (_HKEY, "ascending"),
                   (id_col, "ascending")])
    from vector_ray.stages.bucketed import _run_starts

    new_run = _run_starts(t, [key_col])
    w = np.asarray(
        pc.cast(t[weight_col], pa.int64()).combine_chunks()
        .to_numpy(zero_copy_only=False)
        if isinstance(t[weight_col], pa.ChunkedArray)
        else pc.cast(t[weight_col], pa.int64()).to_numpy(zero_copy_only=False),
        np.int64,
    )
    if _OVF in t.column_names:
        ovf_in = np.asarray(t[_OVF].combine_chunks().to_numpy(zero_copy_only=False)
                            if isinstance(t[_OVF], pa.ChunkedArray)
                            else t[_OVF].to_numpy(zero_copy_only=False), bool)
    else:
        ovf_in = np.zeros(len(t), bool)
    starts = np.nonzero(new_run)[0]
    seg_id = np.cumsum(new_run) - 1
    # rows at/after a key's first marker are globally past the cutoff
    mcum = np.cumsum(ovf_in)
    blocked = (mcum - (mcum[starts] - ovf_in[starts])[seg_id]) >= 1
    live_w = np.where(blocked, 0, w)
    c = np.cumsum(live_w)
    prefix = c - (c[starts] - live_w[starts])[seg_id]
    keep = ~blocked & (prefix <= budget)
    if not emit_markers:
        out = t.filter(pa.array(keep))
        return out.drop_columns([_OVF]) if _OVF in out.column_names else out
    # first overflow per key = first ~keep row of each segment
    over = ~keep
    ocum = np.cumsum(over)
    first_over = over & ((ocum - (ocum[starts] - over[starts])[seg_id]) == 1)
    out = t.filter(pa.array(keep | first_over))
    return out.append_column(_OVF, pa.array(first_over[keep | first_over]))


def token_budget_cap(
    ds,
    key_col: str,
    budget: int,
    *,
    weight_col: str = "n_tok",
    id_col: str = "doc_id",
    seed: int = 0,
    num_buckets: Optional[int] = None,
):
    """Per-key token-budget sampling — "mix N tokens per domain": keep,
    per key, the maximal prefix in salted-id-hash order whose inclusive
    ``weight_col`` sum is ≤ ``budget`` (strict prefix: the first
    overflowing row and everything after it are dropped, so the kept
    set is a uniform hash-prefix of the key and is deterministic on any
    cluster shape).

    Two-phase scale plan (weights are nonnegative, so the per-key
    prefix sum is monotone): a row whose LOCAL in-block prefix already
    exceeds the budget can only be further along in the global order —
    phase 1 drops it before the shuffle, bounding each block's shuffle
    contribution to ~``budget`` weight per key. Because a survivor may
    still be past the TRUE cutoff (rows of other blocks interleave
    ahead of it), phase 1 also forwards the first overflowing row per
    (key, block) as an ``_OVF`` marker; in phase 2 any row at/after the
    smallest marker of its key is dropped before the exact prefix test
    — bit-equal to a single global pass. Call on a narrow projection
    (key, id, weight) and semi-join when rows carry token payloads.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    from vector_ray.stages.bucketed import bucketed_map_groups

    def phase1(t: pa.Table) -> pa.Table:
        t = t.append_column(_HKEY, pa.array(_salted_hash(t, id_col, seed), pa.uint64()))
        return _budget_pass(t, key_col, weight_col, id_col, budget,
                            emit_markers=True)

    pruned = ds.map_batches(phase1, batch_format="pyarrow", zero_copy_batch=True)
    out = bucketed_map_groups(
        pruned, [key_col],
        lambda g: _budget_pass(g, key_col, weight_col, id_col, budget,
                               emit_markers=False),
        num_buckets=num_buckets,
    )
    return out.drop_columns([_HKEY])


def uniform_sample_k(
    ds,
    k: int,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Exactly ``min(k, n)`` rows chosen uniformly without replacement
    over the WHOLE dataset: the k smallest salted id-hashes globally
    (bottom-k reservoir). Shuffle-free heavy path — every block
    forwards at most k rows (its local bottom-k) into one final
    ≤ k×blocks-row merge; the raw data never moves. Deterministic and
    stable across cluster shape / block layout, unlike
    ``Dataset.random_sample`` (rate-based, no exact count) or
    ``limit`` (first-blocks bias)."""
    from vector_ray.stages.topk import grouped_topk

    _ALL = "__vr_all"

    def add_key(t: pa.Table) -> pa.Table:
        t = t.append_column(_ALL, pa.array(np.zeros(len(t), np.int8)))
        return t.append_column(_HKEY, pa.array(_salted_hash(t, id_col, seed), pa.uint64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(keyed, [_ALL], _HKEY, k, descending=False, tiebreak=id_col)
    return out.drop_columns([_HKEY, _ALL])


def weighted_sample_k(
    ds,
    k: int,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    log_weights: bool = False,
):
    """Exactly ``min(k, n)`` rows sampled WITHOUT replacement with
    probability ∝ the row's weight (Gumbel top-k / Efraimidis-Spirakis
    — public results): perturb log-weights with deterministic Gumbel
    noise keyed by (id, seed), keep the global top-k. Shuffle-free
    (≤ k rows leave each block) and reproducible on any cluster shape.
    ``log_weights=True`` treats ``weight_col`` as already-log weights
    (e.g. ml/dsir.py importance log-weights); otherwise weights must be
    > 0 and are log-transformed in place of the key."""
    from vector_ray.ml.dsir import gumbel_topk

    if log_weights:
        return gumbel_topk(ds, k, logw_col=weight_col, id_col=id_col,
                           seed=seed)
    _LW = "__vr_logw"

    def add_log(t: pa.Table) -> pa.Table:
        w = np.asarray(t[weight_col].to_numpy(zero_copy_only=False),
                       np.float64)
        if len(w) and (not np.all(np.isfinite(w)) or w.min() <= 0):
            raise ValueError(f"{weight_col} must be finite and > 0")
        return t.append_column(_LW, pa.array(np.log(w), pa.float64()))

    keyed = ds.map_batches(add_log, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = gumbel_topk(keyed, k, logw_col=_LW, id_col=id_col, seed=seed)
    return out.drop_columns([_LW])


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


def weighted_per_key_cap(
    ds,
    key_col: str,
    k: int,
    weight_col: str,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    log_weights: bool = False,
):
    """At most ``k`` rows per key sampled WITHOUT replacement with
    probability ∝ the row's weight (Gumbel top-k within each key —
    the weighted refinement of :func:`per_key_cap`, e.g. "cap every
    domain at k docs but prefer the longer/higher-quality ones
    proportionally"). Deterministic by (id, seed); same two-phase
    grouped_topk plan as per_key_cap, so ≤ k rows per (key, block)
    enter the shuffle. ``log_weights=True`` treats ``weight_col`` as
    already-log weights; otherwise weights must be finite and > 0."""
    from vector_ray.stages.topk import grouped_topk

    _G = "__vr_gumbel"

    def add_key(t: pa.Table) -> pa.Table:
        h = _salted_hash(t, id_col, seed)
        u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
        g = -np.log(-np.log(u))
        w = np.asarray(pc.cast(t[weight_col], pa.float64())
                       .combine_chunks()
                       .to_numpy(zero_copy_only=False), np.float64)
        if not log_weights:
            if len(w) and (not np.all(np.isfinite(w)) or (w <= 0).any()):
                raise ValueError(
                    f"weighted_per_key_cap: {weight_col} must be finite "
                    "and > 0 (pass log_weights=True for log weights)")
            w = np.log(w)
        return t.append_column(_G, pa.array(w + g, pa.float64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = grouped_topk(keyed, [key_col], _G, k, descending=True,
                       tiebreak=id_col)
    return out.drop_columns([_G])
