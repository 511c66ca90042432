"""Language-model quality scoring for corpus curation — the CCNet
shape (Wenzek et al. 2020, arXiv:1911.00359): score every document's
perplexity under a small language model and filter/bucket on it. The
published pipeline uses a 5-gram KenLM; this engine uses a character
trigram model over a 33-symbol alphabet, which keeps the whole model a
flat ~36k-entry table — trained once, broadcast once, scored map-only.

Determinism contract (what makes this oracle-able): trigram log-probs
are quantized to INTEGER micro-nats in the broadcast table, so per-doc
scores are integer sums — independent of summation order, batch shape
and partitioning. The float ``ppl`` column is derived from the integer
sum at the end.

Scale notes:
- Training counts are partial per-block bincounts over the FIXED-SIZE
  symbol space (33^3 rows of int64 ≈ 0.3 MB per block), reduced on the
  driver with an O(blocks) streaming sum — never a shuffle, never a
  per-key group. The training sample is selected by content-stable id
  hash (``fingerprint(id) % sample_mod == 0``), unbiased across
  fragments.
- Scoring is a single map-only pass: the int64 log-prob table is
  ``ray.put`` once and read zero-copy by every task; per-batch work is
  one gather + one weighted bincount over the row index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

# 33-symbol alphabet: 26 letters (case-folded) + digit class + space +
# 4 punctuation classes + other. Chosen so the model table stays tiny
# (33^3 = 35 937 contexts) while still separating prose from noise.
_V = 33


def _byte_class_table() -> np.ndarray:
    t = np.full(256, 32, np.int64)  # other
    for i in range(26):
        t[ord("a") + i] = i
        t[ord("A") + i] = i
    for d in range(10):
        t[ord("0") + d] = 26
    for b in b" \t\n\r":
        t[b] = 27
    for b in b".,;:":
        t[b] = 28
    for b in b"!?":
        t[b] = 29
    for b in b"'\"":
        t[b] = 30
    for b in b"()[]{}<>-_/":
        t[b] = 31
    return t


_BCLASS = _byte_class_table()


def _row_trigrams(t: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(trigram ids, row index per trigram, symbols-per-row) for a batch
    — vectorized over the flat utf8 buffer, trigrams never cross a row
    boundary."""
    from vector_ray.expr.kernels import _flat_utf8

    col = t[text_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    _, data, offs = _flat_utf8(arr)
    sym = _BCLASS[data]
    lens = np.diff(offs)
    n = len(sym)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), lens)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    ends = np.repeat(offs[1:], lens)
    pos = np.arange(n, dtype=np.int64)
    valid = pos + 2 < ends  # trigram fully inside its row
    p = pos[valid]
    tri = sym[p] * (_V * _V) + sym[p + 1] * _V + sym[p + 2]
    return tri, rows[p], lens


def train_char_lm(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = 1,
    alpha: float = 0.5,
) -> np.ndarray:
    """Fit the trigram model on the id-hash sample and return the int64
    micro-nat log-prob table (length _V**3):
    ``q[tri] = round(1e6 * (ln(c[tri]+alpha) - ln(c_ctx+alpha*V)))``.
    """
    from vector_ray.expr import F

    def partial(t: pa.Table) -> pa.Table:
        if sample_mod > 1:
            h = np.asarray(
                F.fingerprint(pc.cast(t[id_col], pa.string()))
                .to_numpy(zero_copy_only=False),
                np.uint64,
            )
            t = t.filter(pa.array(h % np.uint64(sample_mod) == 0))
        tri, _, _ = _row_trigrams(t, text_col)
        c = np.bincount(tri, minlength=_V ** 3).astype(np.int64)
        return pa.table({"c": pa.array([c.tobytes()], pa.binary())})

    counts = np.zeros(_V ** 3, np.int64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["c"]:
            counts += np.frombuffer(buf.as_py(), np.int64)
    ctx = counts.reshape(_V * _V, _V).sum(axis=1, keepdims=True)
    logp = np.log(counts.reshape(_V * _V, _V) + alpha) - np.log(ctx + alpha * _V)
    return np.round(logp.reshape(-1) * 1e6).astype(np.int64)


def perplexity_score(
    ds,
    logq: np.ndarray,
    *,
    text_col: str = "text",
    keep_cols: tuple = (),
):
    """Map-only scoring pass. Emits per row: ``keep_cols...``,
    ``n_tri`` (trigrams scored), ``nll_micro`` (integer micro-nat
    negative log-likelihood — exact, order-independent) and ``ppl``
    (exp(nll/n_tri), null when the doc has < 3 symbols)."""
    ref = ray.put(np.ascontiguousarray(logq, np.int64))

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(ref)
        tri, rows, lens = _row_trigrams(t, text_col)
        nr = len(t)
        if len(tri):
            # float64 weighted bincount of integer addends: exact while
            # |sum| < 2^53 (micro-nats ~2e7/trigram → safe past 1e8
            # symbols/doc), and far faster than np.add.at
            nll = np.bincount(
                rows, weights=-q[tri].astype(np.float64), minlength=nr
            ).astype(np.int64)
        else:
            nll = np.zeros(nr, np.int64)
        n_tri = np.maximum(lens - 2, 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(nll / np.maximum(n_tri, 1) / 1e6)
        cols = {c: t[c] for c in keep_cols if c in t.column_names}
        cols["n_tri"] = pa.array(n_tri)
        cols["nll_micro"] = pa.array(nll)
        cols["ppl"] = pa.array(
            np.where(n_tri > 0, ppl, np.nan), pa.float64(), from_pandas=True
        )
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
