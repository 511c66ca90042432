"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169 — public spec).

Selects raw-corpus documents whose hashed n-gram distribution looks
like a small TARGET corpus — the standard "make my 100-TB crawl look
like Wikipedia" pretraining-data step. The published recipe, followed
here exactly:

  1. features: hashed bag of word unigrams + bigrams into ``buckets``
     counts (the paper uses 10k buckets; we default to 8192 so the
     bucket mask is a power of two).
  2. fit bucket distributions p̂ (target) and q̂ (raw) with Laplace
     smoothing ``alpha``.
  3. importance weight per doc:  log w(x) = Σ_f c_x(f)·[log p̂(f) −
     log q̂(f)]  (c_x = the doc's hashed-feature counts).
  4. resample k docs WITHOUT replacement via the Gumbel top-k trick:
     key(x) = log w(x) + G(x) with G standard Gumbel noise; the k
     largest keys are a weighted sample without replacement
     (Efraimidis & Spirakis 2006 / Vieira 2014 — public results).

Ray plan — three passes, no all-to-all over documents:

  fit    per-block DENSE bucket-count partials (ONE uint64[buckets]
         row per block — the ml/cms.py encoding; buckets·8 B ≈ 64 KB)
         → shard-grouped SUM tree → ≤``reducers`` rows to the driver.
         Document keys never shuffle.
  score  log-ratio vector broadcast once (ray.put, buckets·8 B) →
         map-only pass; per-doc sums via one weighted bincount over
         the flat word-hash buffer (ml/dedup.flat_word_hashes — the
         vectorized simhash tokenizer), no per-row Python.
  select Gumbel keys are a pure function of (id, seed) — sm64-salted
         hash → uniform → Gumbel — so selection is deterministic on
         any cluster shape; global top-k is the bottom-k reservoir
         plan (stages/topk.grouped_topk): ≤ k rows leave each block.

Determinism contract (mirrored by tools/golden.py dsir_select_sql):
word hash = splitmix64(crc32(word) ^ seed); bigram hash =
splitmix64(h1 ^ (h2 · GOLD mod 2^64)); bucket = hash & (buckets−1);
per-doc log-w accumulates contributions in document order (unigrams
then bigrams), which both np.bincount(weights=…) and a scalar loop
reproduce bit-exactly in IEEE float64.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from vector_ray.ml.dedup import _sm64, flat_word_hashes

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bucket_ids(texts: list, buckets: int, seed: int):
    """Hashed unigram+bigram bucket ids for every doc in ``texts``.
    Returns (ids: int64[nfeat], doc: int64[nfeat], n_docs) — all
    unigrams (doc/word order) followed by all bigrams (doc order)."""
    if buckets & (buckets - 1):
        raise ValueError("buckets must be a power of two")
    mask = np.uint64(buckets - 1)
    hs, dow = flat_word_hashes(texts, seed=seed)
    uni = (hs & mask).astype(np.int64)
    if len(hs) >= 2:
        same = dow[1:] == dow[:-1]
        with np.errstate(over="ignore"):
            bg = _sm64(hs[:-1] ^ (hs[1:] * _GOLD))[same]
        bg_ids = (bg & mask).astype(np.int64)
        bg_doc = dow[1:][same]
    else:
        bg_ids = np.empty(0, np.int64)
        bg_doc = np.empty(0, np.int64)
    return (np.concatenate([uni, bg_ids]),
            np.concatenate([dow, bg_doc]),
            len(texts))


def count_features_table(texts: list, *, buckets: int = 1 << 13,
                         seed: int = 1) -> np.ndarray:
    """Dense hashed-feature counts over a (small, driver-local) list of
    texts — the target-corpus side of the fit."""
    ids, _, _ = _bucket_ids(texts, buckets, seed)
    return np.bincount(ids, minlength=buckets).astype(np.uint64)


def count_features(ds, *, col: str = "text", buckets: int = 1 << 13,
                   seed: int = 1, reducers: int = 8) -> np.ndarray:
    """Distributed dense hashed-feature counts over ``ds[col]``.
    One uint64[buckets] partial row per block, shard-grouped SUM tree
    (the ml/cms.py dense-partial plan), driver sees ≤ reducers rows.
    Each reduce task sums ~#blocks/reducers partials of buckets·8 B —
    size ``reducers`` ≈ #blocks/1000 on very large inputs to keep that
    bounded."""

    def partial(t: pa.Table) -> pa.Table:
        import zlib

        c = count_features_table(t[col], buckets=buckets,
                                 seed=seed)
        # content-derived shard (crc of a prefix): spreads blocks over
        # the reduce tree even when block totals are near-identical
        shard = zlib.crc32(c[:512].tobytes()) % max(reducers, 1)
        return pa.table({
            "shard": pa.array([shard], pa.int32()),
            "counts": pa.array([c.tobytes()], pa.large_binary()),
        })

    def sumgroup(g: pa.Table) -> pa.Table:
        acc = np.zeros(buckets, np.uint64)
        for bm in g["counts"].to_pylist():
            acc += np.frombuffer(bm, np.uint64)
        return pa.table({"shard": g["shard"][:1],
                         "counts": pa.array([acc.tobytes()],
                                            pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = parts.groupby("shard").map_groups(sumgroup,
                                                batch_format="pyarrow")
    out = np.zeros(buckets, np.uint64)
    for row in reduced.take_all():
        out += np.frombuffer(row["counts"], np.uint64)
    return out


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
              *, alpha: float = 1.0) -> np.ndarray:
    """log p̂(f) − log q̂(f) with Laplace smoothing ``alpha`` — the
    per-feature importance log-weight vector."""
    buckets = len(target_counts)
    p = ((target_counts.astype(np.float64) + alpha)
         / (float(target_counts.sum()) + alpha * buckets))
    q = ((raw_counts.astype(np.float64) + alpha)
         / (float(raw_counts.sum()) + alpha * buckets))
    return np.log(p) - np.log(q)


def dsir_score(ds, lr: np.ndarray, *, col: str = "text",
               out: str = "dsir_logw", seed: int = 1):
    """Map-only pass appending each doc's importance log-weight
    ``Σ_f c_x(f)·lr[f]``. ``lr`` is broadcast once (ray.put)."""
    import ray

    buckets = len(lr)
    ref = ray.put(lr)

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(ref)
        ids, doc, n = _bucket_ids(t[col], buckets, seed)
        s = np.bincount(doc, weights=v[ids], minlength=n)
        return t.append_column(out, pa.array(s, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def gumbel_topk(ds, k: int, *, logw_col: str = "dsir_logw",
                id_col: str = "doc_id", seed: int = 0,
                key_col: Optional[str] = None):
    """Weighted sampling WITHOUT replacement of ``k`` rows with
    probability ∝ w = exp(logw): perturb each row's log-weight with
    deterministic Gumbel noise keyed by (id, seed) and keep the global
    top-k (Gumbel top-k trick). Shuffle-free: ≤ k rows leave each
    block (stages/topk two-phase plan)."""
    from vector_ray.ml.sampling import _salted_hash
    from vector_ray.stages.topk import grouped_topk

    _ALL = "__vr_all"
    _KEY = key_col or "__vr_gumbel"

    def add_key(t: pa.Table) -> pa.Table:
        h = _salted_hash(t, id_col, seed)
        u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
        g = -np.log(-np.log(u))
        key = (np.asarray(t[logw_col].to_numpy(zero_copy_only=False),
                          np.float64) + g)
        t = t.append_column(_ALL, pa.array(np.zeros(len(t), np.int8)))
        return t.append_column(_KEY, pa.array(key, pa.float64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = grouped_topk(keyed, [_ALL], _KEY, k, descending=True,
                       tiebreak=id_col)
    drop = [_ALL] if key_col else [_ALL, _KEY]
    return out.drop_columns(drop)


def dsir_select(raw_ds, target_texts: list, k: int, *,
                col: str = "text", id_col: str = "doc_id",
                buckets: int = 1 << 13, alpha: float = 1.0,
                hash_seed: int = 1, sample_seed: int = 0,
                reducers: int = 8, logw_col: str = "dsir_logw"):
    """End-to-end DSIR: fit target (driver-local texts) and raw
    (distributed) hashed-ngram distributions, score every raw doc,
    Gumbel-top-k resample. Returns the selected rows with ``logw_col``
    appended. ``target_texts`` is the small in-memory target corpus —
    at scale fit it separately with count_features and compose."""
    tgt = count_features_table(target_texts, buckets=buckets,
                               seed=hash_seed)
    raw = count_features(raw_ds, col=col, buckets=buckets,
                         seed=hash_seed, reducers=reducers)
    lr = log_ratio(tgt, raw, alpha=alpha)
    scored = dsir_score(raw_ds, lr, col=col, out=logw_col,
                        seed=hash_seed)
    return gumbel_topk(scored, k, logw_col=logw_col, id_col=id_col,
                       seed=sample_seed)
