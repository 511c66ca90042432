"""Multinomial Naive Bayes text classification — the "model-based
domain/quality classifier" step of CCNet/LLaMA-style curation (train a
classifier on a trusted corpus, score the crawl; Wenzek et al. 2020 §4.4
and the LLaMA "classified as references by a linear classifier" filter
are the public recipes) — in the one classifier family whose TRAINING is
pure counting, hence exactly mergeable, commutative and
partitioning-independent (unlike SGD-trained linear models, whose
updates are order-dependent).

Spec (shared with tools/golden.py nb_classify_sql):
  features   hashed word unigrams + bigrams into ``buckets`` counts —
             the ml/dsir.py feature space (same hash: splitmix64(crc32)
             word hashes, GOLD-mixed bigrams, power-of-two mask).
  model      per class c: Laplace-smoothed multinomial log-likelihood
             ll[c][f] = rint(scale·(ln(count[c][f] + alpha)
                              − ln(Σ_f count[c][f] + alpha·buckets)))
             stored as int64 micro-nats (the ml/lm_score.py trick), plus
             an int64 micro-nat class prior ln(n_c / n_total).
  score      per doc: prior[c] + Σ_f ll[c][f] — an EXACT integer sum
             (feature contributions are ints and partial sums stay far
             below 2^53, so the vectorized float64 bincount is exact and
             order-independent), which is what makes the whole pipeline
             golden-oracle-able.
  predict    argmax over classes, ties → lexicographically smallest
             class (classes are sorted; np.argmax takes the first max).

Ray plan — train is 2 scans, score is map-only, documents never shuffle:
  classes    per-block ``pc.unique`` of the label column → driver set
             (``max_classes`` bound; no shuffle).
  counts     ONE pass emitting per-(class, shard) dense uint64[buckets]
             count partials + per-class doc counts (the cms.py/dsir.py
             dense-partial tree: C·buckets·8 B per block, ≈ 320 KB at
             C=5, buckets=8192) → grouped SUM → driver finalize.
  score      model broadcast once via ray.put (C·buckets·8 B); per
             batch one flat feature-id buffer, per class one weighted
             bincount; no per-row Python.

Reference parity: Vector has no classifier transform; this generalizes
its `sample`/`filter` gating to model-based gating, staying inside the
stateless-map execution taxonomy (SURVEY.md §2.1 class T)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.ml.dsir import _bucket_ids


def _finalize_loglik(counts: np.ndarray, *, alpha: float,
                     scale: int) -> np.ndarray:
    """int64 micro-nat log-likelihood row for one class. Array-shape
    contract (load-bearing for the golden oracle): ``np.log`` over the
    full float64 buckets-length array, scalar ``math.log`` denominator,
    one ``np.rint``."""
    buckets = len(counts)
    c = counts.astype(np.float64)
    denom = math.log(float(c.sum()) + alpha * buckets)
    v = np.log(c + alpha) - denom
    return np.rint(v * scale).astype(np.int64)


def nb_train(ds, *, text_col: str = "text", label_col: str = "lang",
             buckets: int = 1 << 13, seed: int = 1, alpha: float = 1.0,
             scale: int = 1_000_000, reducers: int = 8,
             max_classes: int = 1000) -> dict:
    """Fit the model over ``ds`` (every row with a non-null label
    contributes). Returns a plain dict (broadcastable, picklable):
    ``{classes, loglik int64[C][buckets], prior int64[C], buckets,
    seed, alpha, scale}``."""
    if buckets & (buckets - 1):
        raise ValueError("buckets must be a power of two")

    def labs(t: pa.Table) -> pa.Table:
        u = pc.unique(t[label_col])
        return pa.table({"lab": u.cast(pa.string())})

    classes = set()
    for r in ds.select_columns([label_col]).map_batches(
            labs, batch_format="pyarrow").take_all():
        if r["lab"] is not None:
            classes.add(r["lab"])
    classes = sorted(classes)
    if not classes:
        raise ValueError("nb_train: no non-null labels")
    if len(classes) > max_classes:
        raise ValueError(
            f"nb_train: {len(classes)} classes > max_classes="
            f"{max_classes} — a label this wide is a modeling error")
    idx = {c: i for i, c in enumerate(classes)}
    C = len(classes)

    def partial(t: pa.Table) -> pa.Table:
        import zlib

        texts = t[text_col].to_pylist()
        raw_labs = t[label_col].to_pylist()
        codes = np.array([idx.get(x, -1) for x in raw_labs], np.int64)
        ids, doc, _n = _bucket_ids(texts, buckets, seed)
        feat_lab = codes[doc] if len(doc) else np.empty(0, np.int64)
        cols = {"cls": [], "shard": [], "ndocs": [], "counts": []}
        for ci in np.unique(codes[codes >= 0]):
            cnt = np.bincount(ids[feat_lab == ci],
                              minlength=buckets).astype(np.uint64)
            cols["cls"].append(int(ci))
            cols["shard"].append(zlib.crc32(cnt[:512].tobytes())
                                 % max(reducers, 1))
            cols["ndocs"].append(int((codes == ci).sum()))
            cols["counts"].append(cnt.tobytes())
        return pa.table({
            "cls": pa.array(cols["cls"], pa.int32()),
            "shard": pa.array(cols["shard"], pa.int32()),
            "ndocs": pa.array(cols["ndocs"], pa.int64()),
            "counts": pa.array(cols["counts"], pa.large_binary()),
        })

    def sumgroup(g: pa.Table) -> pa.Table:
        acc = np.zeros(buckets, np.uint64)
        for bm in g["counts"].to_pylist():
            acc += np.frombuffer(bm, np.uint64)
        nd = int(pc.sum(g["ndocs"]).as_py() or 0)
        return pa.table({
            "cls": g["cls"][:1], "shard": g["shard"][:1],
            "ndocs": pa.array([nd], pa.int64()),
            "counts": pa.array([acc.tobytes()], pa.large_binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    reduced = parts.groupby(["cls", "shard"]).map_groups(
        sumgroup, batch_format="pyarrow")

    counts = np.zeros((C, buckets), np.uint64)
    ndocs = np.zeros(C, np.int64)
    for row in reduced.take_all():
        counts[row["cls"]] += np.frombuffer(row["counts"], np.uint64)
        ndocs[row["cls"]] += row["ndocs"]
    n_total = int(ndocs.sum())

    loglik = np.zeros((C, buckets), np.int64)
    prior = np.zeros(C, np.int64)
    for ci in range(C):
        loglik[ci] = _finalize_loglik(counts[ci], alpha=alpha, scale=scale)
        prior[ci] = int(round(math.log(ndocs[ci] / n_total) * scale))
    return {"classes": classes, "loglik": loglik, "prior": prior,
            "buckets": buckets, "seed": seed, "alpha": alpha,
            "scale": scale}


def nb_score(ds, model: dict, *, text_col: str = "text",
             out_prefix: str = "nb_"):
    """Map-only scoring pass: appends one int64 micro-nat score column
    per class (``nb_score_<class>``) and the argmax prediction
    (``nb_pred: string``). Model ships once via ray.put."""
    import ray

    classes = model["classes"]
    buckets, seed = model["buckets"], model["seed"]
    ref = ray.put((model["loglik"], model["prior"]))

    def score(t: pa.Table) -> pa.Table:
        ll, pr = ray.get(ref)
        texts = t[text_col].to_pylist()
        ids, doc, n = _bucket_ids(texts, buckets, seed)
        scores = np.empty((len(classes), n), np.int64)
        for ci in range(len(classes)):
            s = np.bincount(doc, weights=ll[ci][ids].astype(np.float64),
                            minlength=n)
            scores[ci] = np.rint(s).astype(np.int64) + pr[ci]
        pred = np.argmax(scores, axis=0)  # first max → smallest class
        for ci, cls in enumerate(classes):
            t = t.append_column(f"{out_prefix}score_{cls}",
                                pa.array(scores[ci], pa.int64()))
        t = t.append_column(
            f"{out_prefix}pred",
            pa.array([classes[i] for i in pred], pa.string()))
        return t

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
