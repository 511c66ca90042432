"""Persisted inverted index for lexical retrieval: build once over the
standing corpus, then serve Okapi BM25 top-k queries reading ONLY the
term buckets the query probes — the text analogue of ml/ann.py's
ivf_build/ivf_search (hive-partitioned layout, partition-pruned reads)
and ml/dedup.py's minhash_index_* (persisted probe side).

Layout under ``index_dir``::

    postings/bucket=<h>/...parquet   (term, doc_id, tf, dl) — one row per
                                     (doc, distinct term); bucket =
                                     fnv1a(term) % num_buckets
    stats.json                       {n_docs, n_words, num_buckets}

Search cost is proportional to the probed buckets (≤ one per query
term), never the corpus: document frequencies come from the probed
postings themselves (df = #rows per term, exact), document length is
denormalized onto every posting row so no doc table is touched, and the
per-doc score sum runs in FIXED query-term order inside a bucketed
shuffle keyed on doc_id — bit-identical on any partitioning, so the
result is golden-oracle-able (same determinism contract as
ml/corpus.py bm25_score).

Capability absent in the reference (event routing, not retrieval;
SURVEY.md §2.7); BM25 per Robertson & Zaragoza 2009.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import vector_ray.expr.kernels as F

_DEFAULT_BUCKETS = 32


def _doc_postings(t: pa.Table, col: str, id_col: str,
                  num_buckets: int) -> pa.Table:
    """(bucket, term, doc_id, tf, dl) rows for one batch — exact
    per-(doc, distinct word) term frequencies via dictionary-encode +
    one ``np.unique`` over fused (row, code) keys; zero per-row
    Python."""
    wcol = t[col]
    if isinstance(wcol, pa.ChunkedArray):
        wcol = wcol.combine_chunks()
    words = pc.utf8_split_whitespace(wcol)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    empty = pa.table({
        "bucket": pa.array([], pa.int64()),
        "term": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "tf": pa.array([], pa.int64()),
        "dl": pa.array([], pa.int64()),
    })
    if len(flat) == 0:
        return empty
    parents = np.asarray(pc.list_parent_indices(words)
                         .to_numpy(zero_copy_only=False), np.int64)
    ok = np.asarray(pc.not_equal(flat, "").fill_null(False)
                    .to_numpy(zero_copy_only=False), bool)
    if not ok.any():
        return empty
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = flat.dictionary_encode()
    codes = np.asarray(d.indices.to_numpy(zero_copy_only=False), np.int64)
    vocab = d.dictionary
    nv = len(vocab)
    key = parents[ok] * nv + codes[ok]
    uniq, tf = np.unique(key, return_counts=True)
    docidx = uniq // nv
    code = uniq % nv
    dl = np.bincount(parents[ok], minlength=len(t)).astype(np.int64)
    doc_ids = np.asarray(pc.cast(t[id_col], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
    # bucket once per DISTINCT word in the batch, then gather
    fp = np.asarray(F.fingerprint(vocab).to_numpy(zero_copy_only=False),
                    np.uint64) % np.uint64(num_buckets)
    return pa.table({
        "bucket": pa.array(fp.astype(np.int64)[code], pa.int64()),
        "term": vocab.take(pa.array(code)),
        "doc_id": pa.array(doc_ids[docidx], pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
        "dl": pa.array(dl[docidx], pa.int64()),
    })


def inverted_index_build(
    ds,
    index_dir: str,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = _DEFAULT_BUCKETS,
) -> dict:
    """Write the inverted index (see module docstring). Two passes:
    postings (hive-partitioned by term bucket so searches prune) and a
    fixed-size corpus-stats pass (one (n, words) int row per block —
    exactly summable in any order). Ids must be int64-castable."""
    import json
    import os

    def explode(t: pa.Table) -> pa.Table:
        return _doc_postings(t, col, id_col, num_buckets)

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(explode, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["bucket"])

    def stat(t: pa.Table) -> pa.Table:
        wcol = t[col]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        words = pc.utf8_split_whitespace(wcol)
        flat = words.flatten()
        n_words = 0
        if len(flat):
            n_words = int(pc.sum(pc.cast(
                pc.not_equal(flat, "").fill_null(False), pa.int64()))
                .as_py() or 0)
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "words": pa.array([n_words], pa.int64())})

    n_docs = n_words = 0
    for r in ds.map_batches(stat, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        n_docs += r["n"]
        n_words += r["words"]
    stats = {"n_docs": int(n_docs), "n_words": int(n_words),
             "num_buckets": num_buckets}
    with open(os.path.join(index_dir, "stats.json"), "w") as fh:
        json.dump(stats, fh)
    return stats


def inverted_index_append(
    ds,
    index_dir: str,
    *,
    col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Append new docs to an existing inverted index: postings land as
    NEW files in their term-bucket hive dirs (map-only — existing
    files untouched), and the corpus stats (n_docs/n_words, the BM25
    idf/avgdl inputs) are summed into ``stats.json``. Searches after
    an append score over the grown corpus with no rebuild — the
    search path derives df from the probed postings at query time, so
    only the two corpus counters need updating. Ids must be disjoint
    from everything already indexed."""
    import json
    import os

    with open(os.path.join(index_dir, "stats.json")) as fh:
        st = json.load(fh)
    num_buckets = st["num_buckets"]

    def explode(t: pa.Table) -> pa.Table:
        return _doc_postings(t, col, id_col, num_buckets)

    ds.map_batches(explode, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["bucket"])

    def stat(t: pa.Table) -> pa.Table:
        wcol = t[col]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        words = pc.utf8_split_whitespace(wcol)
        flat = words.flatten()
        n_words = 0
        if len(flat):
            n_words = int(pc.sum(pc.cast(
                pc.not_equal(flat, "").fill_null(False), pa.int64()))
                .as_py() or 0)
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "words": pa.array([n_words], pa.int64())})

    add_docs = add_words = 0
    for r in ds.map_batches(stat, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        add_docs += r["n"]
        add_words += r["words"]
    st["n_docs"] = int(st["n_docs"] + add_docs)
    st["n_words"] = int(st["n_words"] + add_words)
    tmp = os.path.join(index_dir, ".stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(st, fh)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))
    return st


def inverted_index_search(
    index_dir: str,
    query: str,
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
):
    """Top-k BM25 over a persisted index, reading only the probed term
    buckets. Returns ``(table, stats)``: (doc_id, dl, bm25, rank) rows
    — docs sharing ≥1 query term, score DESC / id ASC, identical
    values to ml/corpus.bm25_search on the same corpus — and a stats
    dict reporting files read vs index total (the pruning evidence,
    mirroring ivf_search)."""
    import glob
    import json
    import os

    import ray.data as rd

    from vector_ray.stages.bucketed import bucketed_map_groups

    with open(os.path.join(index_dir, "stats.json")) as fh:
        st = json.load(fh)
    n_docs, n_words = st["n_docs"], st["n_words"]
    num_buckets = st["num_buckets"]
    if n_docs == 0:
        raise ValueError("inverted_index_search: empty index")

    terms_list: list[str] = []
    for w in query.split():
        if w and w not in terms_list:
            terms_list.append(w)
    if not terms_list:
        raise ValueError("inverted_index_search: empty query")
    terms = pa.array(terms_list, pa.string())
    m = len(terms_list)

    fp = np.asarray(F.fingerprint(terms).to_numpy(zero_copy_only=False),
                    np.uint64) % np.uint64(num_buckets)
    probe_set = sorted({int(x) for x in fp})
    all_dirs = sorted(glob.glob(
        os.path.join(index_dir, "postings", "bucket=*")))
    probed = [d for d in all_dirs
              if int(os.path.basename(d).split("=")[1]) in probe_set]
    paths = [f for d in probed
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    all_files = [f for d in all_dirs
                 for f in glob.glob(os.path.join(d, "*.parquet"))]
    stats = {
        "files_read": len(paths),
        "files_total": len(all_files),
        "buckets_probed": len(probed),
        "buckets_total": len(all_dirs),
    }
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "dl": pa.array([], pa.int64()),
        "bm25": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    })
    if not paths:
        return empty, stats

    def tag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["term"], value_set=terms).fill_null(-1)
        j = np.asarray(idx.to_numpy(zero_copy_only=False), np.int64)
        keep = j >= 0
        sub = t.filter(pa.array(keep))
        return pa.table({
            id_col: pc.cast(sub["doc_id"], pa.int64()),
            "j": pa.array(j[keep], pa.int64()),
            "tf": pc.cast(sub["tf"], pa.int64()),
            "dl": pc.cast(sub["dl"], pa.int64()),
        })

    tagged = rd.read_parquet(paths).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True)

    # df per term: fixed-size m-int partial per block, exact in any order
    def df_partial(t: pa.Table) -> pa.Table:
        j = np.asarray(t["j"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table({"df": pa.array(
            [np.bincount(j, minlength=m).astype(np.int64).tobytes()],
            pa.large_binary())})

    df = np.zeros(m, np.int64)
    for r in tagged.map_batches(df_partial, batch_format="pyarrow",
                                zero_copy_batch=True).take_all():
        df += np.frombuffer(r["df"], np.int64)
    # SAME-SHAPED array np.log as bm25_score/golden (1-ulp SIMD parity)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    avgdl = n_words / n_docs

    def score_bucket(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False), np.int64)
        j = np.asarray(g["j"].to_numpy(zero_copy_only=False), np.int64)
        tf = np.asarray(g["tf"].to_numpy(zero_copy_only=False), np.int64)
        dl = np.asarray(g["dl"].to_numpy(zero_copy_only=False), np.int64)
        uid, docidx = np.unique(ids, return_inverse=True)
        tfmat = np.zeros((len(uid), m), np.int64)
        tfmat[docidx, j] = tf
        dlv = np.zeros(len(uid), np.int64)
        dlv[docidx] = dl
        norm = k1 * (1.0 - b + b * (dlv / avgdl))
        s = np.zeros(len(uid), np.float64)
        for jj in range(m):  # fixed term order per doc — golden parity
            tfj = tfmat[:, jj]
            s += idf[jj] * (tfj * (k1 + 1.0)) / (tfj + norm)
        order = np.lexsort((uid, -s))[:k]
        return pa.table({
            id_col: pa.array(uid[order], pa.int64()),
            "dl": pa.array(dlv[order], pa.int64()),
            "bm25": pa.array(s[order], pa.float64()),
        })

    rows = bucketed_map_groups(tagged, [id_col], score_bucket).take_all()
    rows.sort(key=lambda r: (-r["bm25"], r[id_col]))
    out = rows[:k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in out], pa.int64()),
        "dl": pa.array([r["dl"] for r in out], pa.int64()),
        "bm25": pa.array([r["bm25"] for r in out], pa.float64()),
        "rank": pa.array(range(len(out)), pa.int64()),
    }), stats
