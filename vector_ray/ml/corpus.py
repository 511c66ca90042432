"""Corpus-level statistics for training-data curation: vocabulary
frequency top-k (words or token ids) and Gopher-style repetition
metrics (duplicate-word / top-word fractions per document).

Both are two-phase mergeable plans: per-batch vectorized partials
(Arrow value_counts / lexsort run segmentation — zero per-row Python)
followed by a bucketed vectorized merge, so the shuffle moves at most
one row per (distinct term, block), never raw text.

Capability absent in the reference (its topology is event routing, not
corpus analytics; SURVEY.md §2.7) — these mirror the repetition rules
of Rae et al., "Scaling Language Models" (Gopher), Appendix A.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.stages.bucketed import bucketed_map_groups


def _split_words(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """Whitespace-split to list<string>, empty tokens dropped (matches
    DuckDB ``regexp_split_to_array(trim(text), '\\s+')`` on non-empty
    docs). Sliced inputs are compacted first: non-zero-offset string
    batches through the object-store roundtrip have shown intermittent
    flatten/parent-index misalignment (see stages/templates.py)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if getattr(arr, "offset", 0):
        import numpy as np

        arr = arr.take(np.arange(len(arr), dtype=np.int64))
    return pc.utf8_split_whitespace(arr)


def _word_count_partial(t: pa.Table, col: str) -> pa.Table:
    flat = pc.list_flatten(_split_words(t[col]))
    if len(flat) > 0:
        flat = flat.filter(pc.not_equal(flat, ""))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    vc = flat.value_counts()
    return pa.table({
        "word": vc.field("values"),
        "cnt": pc.cast(vc.field("counts"), pa.int64()),
    })


def _token_count_partial(t: pa.Table, col: str) -> pa.Table:
    flat = pc.list_flatten(t[col]).combine_chunks()
    vc = flat.value_counts()
    return pa.table({
        "token": pc.cast(vc.field("values"), pa.int64()),
        "cnt": pc.cast(vc.field("counts"), pa.int64()),
    })


def _sum_per_term(g: pa.Table, term_col: str) -> pa.Table:
    return (
        pa.TableGroupBy(g, term_col)
        .aggregate([("cnt", "sum")])
        .rename_columns([term_col, "cnt"])
    )


def _local_global_topk(t: pa.Table, term_col: str, k: int) -> pa.Table:
    t = t.sort_by([("cnt", "descending"), (term_col, "ascending")])
    return t.slice(0, k) if len(t) > k else t


def vocab_topk(ds, *, col: str = "text", k: int = 50, mode: str = "words"):
    """Global term-frequency top-k over a corpus.

    ``mode="words"``: ``col`` is a string column, terms are whitespace
    words. ``mode="tokens"``: ``col`` is list<int>, terms are token ids
    (the vocabulary histogram of a pre-tokenized corpus).

    Plan: per-batch ``value_counts`` partial (≤ |vocab| rows/block) →
    bucketed vectorized sum per term → per-block local top-k → one
    final ≤ k×blocks-row merge. Ties broken by term ascending.
    """
    term = "word" if mode == "words" else "token"
    part = _word_count_partial if mode == "words" else _token_count_partial

    partial = ds.map_batches(
        lambda t: part(t, col), batch_format="pyarrow", zero_copy_batch=True
    )
    summed = bucketed_map_groups(partial, [term], lambda g: _sum_per_term(g, term))
    local = summed.map_batches(
        lambda t: _local_global_topk(t, term, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def final(g: pa.Table) -> pa.Table:
        return _local_global_topk(g, term, k)

    # single final merge over ≤ k×blocks rows (constant key → one group)
    withk = local.map_batches(
        lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return withk.groupby("__g").map_groups(
        lambda g: final(g.drop_columns(["__g"])), batch_format="pyarrow"
    )


def _mg_compress(t: pa.Table, term_col: str, capacity: int) -> pa.Table:
    """Misra-Gries summary compression: keep at most ``capacity``
    counters by decrementing every count by the (capacity+1)-th largest
    and dropping the non-positive remainder. Deterministic regardless
    of input order (threshold is by value). No-op when the table
    already fits — so with ``capacity ≥ distinct`` the summary is an
    exact histogram."""
    if t.num_rows <= capacity:
        return t
    cnt = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), np.int64)
    d = np.partition(cnt, -(capacity + 1))[-(capacity + 1)]
    mask = cnt > d
    kept = t.filter(pa.array(mask))
    return kept.set_column(
        kept.schema.get_field_index("cnt"), "cnt",
        pa.array(cnt[mask] - d, pa.int64()),
    )


def heavy_hitters(ds, *, col: str = "text", k: int = 20,
                  capacity: int = 4096, mode: str = "words"):
    """Approximate global top-k terms (heavy hitters) via mergeable
    Misra-Gries summaries — the bounded-memory scale path for
    ``vocab_topk`` when the distinct-term universe (token n-grams,
    URLs, 10^12-token vocabularies) doesn't fit a shuffle.

    Plan: per-block ``value_counts`` → MG-compress to ``capacity``
    (≤ capacity rows leave each block no matter how wide its local
    vocabulary) → bucketed per-term sum → per-block local top-k → one
    final ≤ k×blocks-row merge. No stage ever holds more than
    ``capacity`` counters per block.

    Guarantees (standard MG merge bounds): reported counts are lower
    bounds undercounting by at most ``n_total/(capacity+1)`` in sum,
    and every term with true frequency > ``n_total/(capacity+1)`` is
    present in the summary. With ``capacity ≥`` the global distinct
    count nothing is ever compressed and the result is the exact
    top-k (ties broken by term ascending), equal to a SQL
    GROUP BY / ORDER BY oracle.

    Capability absent in the reference (closest is
    tag_cardinality_limit's per-tag budget,
    src/transforms/tag_cardinality_limit.rs); sketch per Misra &
    Gries 1982 / Agarwal et al. "Mergeable Summaries" (PODS'12).
    """
    term = "word" if mode == "words" else "token"
    part = _word_count_partial if mode == "words" else _token_count_partial

    partial = ds.map_batches(
        lambda t: _mg_compress(part(t, col), term, capacity),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    summed = bucketed_map_groups(partial, [term], lambda g: _sum_per_term(g, term))
    local = summed.map_batches(
        lambda t: _local_global_topk(t, term, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    withk = local.map_batches(
        lambda t: t.append_column("__g", pa.array(np.zeros(len(t), np.int8))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return withk.groupby("__g").map_groups(
        lambda g: _local_global_topk(g.drop_columns(["__g"]), term, k),
        batch_format="pyarrow",
    )


def _distinct_word_doc_partial(t: pa.Table, col: str) -> pa.Table:
    """Per-batch (word, in-batch doc count) over DISTINCT (word, doc)
    pairs — the document-frequency partial. A doc's rows live in one
    batch, so summing these per word gives the exact global df."""
    words = t[col] if not isinstance(t[col], pa.ChunkedArray) else t[col].combine_chunks()
    words = _split_words(words)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = np.asarray(pc.list_parent_indices(words).to_numpy(zero_copy_only=False))
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    d = flat.dictionary_encode()
    codes = np.asarray(d.indices.to_numpy(zero_copy_only=False))
    m = np.asarray(pc.not_equal(flat, "").fill_null(False)
                   .to_numpy(zero_copy_only=False), bool)
    codes, rows = codes[m], parents[m]
    if len(codes) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    order = np.lexsort((codes, rows))
    c, r = codes[order], rows[order]
    keep = np.ones(len(c), bool)
    keep[1:] = (c[1:] != c[:-1]) | (r[1:] != r[:-1])
    uq, cnt = np.unique(c[keep], return_counts=True)
    return pa.table({
        "word": d.dictionary.take(pa.array(uq)),
        "cnt": pa.array(cnt.astype(np.int64)),
    })


def doc_frequency(ds, *, col: str = "text"):
    """Global document frequency per word: Dataset of (word, df) —
    two-phase: per-batch distinct-(word, doc) partials (≤ |batch vocab|
    rows shuffle per block), bucketed vectorized sum. The df table is
    bounded by corpus vocabulary, not corpus size."""
    partial = ds.map_batches(
        lambda t: _distinct_word_doc_partial(t, col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    summed = bucketed_map_groups(partial, ["word"],
                                 lambda g: _sum_per_term(g, "word"))
    return summed.map_batches(
        lambda t: t.rename_columns(["word", "df"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def tfidf_score(ds, *, col: str = "text", id_col: str = "doc_id",
                keep_cols: tuple = (), max_vocab: int = 20_000_000):
    """Per-document TF-IDF quality score (raw-tf · smoothed idf summed
    over word positions).

    Determinism contract (oracle-able, mirroring ml/lm_score.py): idf
    is quantized to INTEGER micro-units in the broadcast table —
    ``idf_micro[w] = round(1e6 · ln((N+1)/(df[w]+1)))`` — so the
    per-doc score ``tfidf_micro = Σ_positions idf_micro[word]`` is an
    exact integer sum, independent of batch shape and summation order;
    the float ``tfidf`` column (= micro / n_words / 1e6) is derived at
    the end. Emits (keep_cols..., id_col, n_words, tfidf_micro, tfidf
    — null when the doc has no words).

    Plan: one df pass (see ``doc_frequency``), vocabulary pulled once
    to the driver (guarded by ``max_vocab`` — vocabulary grows ~O(√N)
    by Heaps' law, but fail loudly rather than silently OOM), broadcast
    via ``ray.put``, then ONE map-only scoring pass: ``pc.index_in``
    hash lookup + weighted bincount per batch.
    """
    import ray

    n_docs = ds.count()
    parts_w, parts_d, total = [], [], 0
    for b in doc_frequency(ds, col=col).iter_batches(
            batch_format="pyarrow", batch_size=None):
        w = b["word"]
        parts_w.append(w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w)
        parts_d.append(np.asarray(pc.cast(b["df"], pa.int64())
                                  .to_numpy(zero_copy_only=False), np.int64))
        total += len(parts_w[-1])
        if total > max_vocab:
            raise ValueError(
                f"tfidf_score: vocabulary exceeds max_vocab={max_vocab}; "
                "pre-filter (min length / frequency) or raise the bound")
    if parts_w:
        vocab = pa.concat_arrays(parts_w)
        df = np.concatenate(parts_d)
    else:
        vocab, df = pa.array([], pa.string()), np.empty(0, np.int64)
    idf_micro = np.round(1e6 * np.log((n_docs + 1) / (df + 1.0))).astype(np.int64)
    ref = ray.put((vocab, idf_micro))

    def score(t: pa.Table) -> pa.Table:
        voc, idf = ray.get(ref)
        wcol = t[col] if not isinstance(t[col], pa.ChunkedArray) else t[col].combine_chunks()
        words = _split_words(wcol)
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = np.asarray(pc.list_parent_indices(words)
                             .to_numpy(zero_copy_only=False))
        nr = len(t)
        if len(flat):
            m = np.asarray(pc.not_equal(flat, "").fill_null(False)
                           .to_numpy(zero_copy_only=False), bool)
            idx = np.asarray(pc.index_in(flat, value_set=voc).fill_null(-1)
                             .to_numpy(zero_copy_only=False), np.int64)
            w = np.where(idx >= 0, idf[np.maximum(idx, 0)], 0)
            micro = np.bincount(parents[m], weights=w[m].astype(np.float64),
                                minlength=nr).astype(np.int64)
            nw = np.bincount(parents[m], minlength=nr).astype(np.int64)
        else:
            micro = np.zeros(nr, np.int64)
            nw = np.zeros(nr, np.int64)
        mean = micro / np.maximum(nw, 1) / 1e6
        cols = {c: t[c] for c in keep_cols if c in t.column_names}
        cols[id_col] = t[id_col]
        cols["n_words"] = pa.array(nw)
        cols["tfidf_micro"] = pa.array(micro)
        cols["tfidf"] = pa.array(np.where(nw > 0, mean, np.nan), pa.float64(),
                                 from_pandas=True)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _query_tf(t: pa.Table, col: str, terms: pa.Array):
    """(tf int64[nr][m], dl int64[nr]) — per-doc term frequencies for
    the m query terms plus whitespace word counts, one flat pass."""
    wcol = t[col]
    if isinstance(wcol, pa.ChunkedArray):
        wcol = wcol.combine_chunks()
    words = _split_words(wcol)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = np.asarray(pc.list_parent_indices(words)
                         .to_numpy(zero_copy_only=False))
    nr, m = len(t), len(terms)
    if not len(flat):
        return np.zeros((nr, m), np.int64), np.zeros(nr, np.int64)
    ok = np.asarray(pc.not_equal(flat, "").fill_null(False)
                    .to_numpy(zero_copy_only=False), bool)
    idx = np.asarray(pc.index_in(flat, value_set=terms).fill_null(-1)
                     .to_numpy(zero_copy_only=False), np.int64)
    dl = np.bincount(parents[ok], minlength=nr).astype(np.int64)
    hit = ok & (idx >= 0)
    tf = np.bincount(parents[hit] * m + idx[hit],
                     minlength=nr * m).astype(np.int64).reshape(nr, m)
    return tf, dl


def bm25_score(ds, query: str, *, col: str = "text",
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
               keep_cols: tuple = ()):
    """Okapi BM25 relevance of every document against a fixed query —
    the lexical-retrieval counterpart to ml/ann.py's embedding search
    (Robertson & Zaragoza 2009, the public BM25 spec).

    Scale plan: corpus stats (N, Σdl, per-query-term document
    frequencies) come from ONE pass of FIXED-SIZE integer partials —
    one (1 + 1 + m)-int row per block, exactly summable in any order —
    so unlike tf-idf there is no vocabulary broadcast at all; only the
    m query terms matter. Scoring is a second map-only pass (one
    ``pc.index_in`` + bincount per batch). Determinism: tf/dl/df are
    exact integers and the float64 score is evaluated per row in fixed
    query-term order (idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))), so
    results are bit-identical on any partitioning — golden-oracle-able.
    Emits (keep_cols..., id_col, dl, bm25: float64)."""
    import ray

    terms_list = []
    for w in query.split():
        if w and w not in terms_list:
            terms_list.append(w)
    if not terms_list:
        raise ValueError("bm25_score: empty query")
    terms = pa.array(terms_list, pa.string())
    m = len(terms_list)

    def stats(t: pa.Table) -> pa.Table:
        tf, dl = _query_tf(t, col, terms)
        return pa.table({
            "n": pa.array([len(dl)], pa.int64()),
            "words": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64)
                            .tobytes()], pa.large_binary()),
        })

    n_docs, n_words = 0, 0
    df = np.zeros(m, np.int64)
    for r in ds.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        n_docs += r["n"]
        n_words += r["words"]
        df += np.frombuffer(r["df"], np.int64)
    if n_docs == 0:
        raise ValueError("bm25_score: empty corpus")
    avgdl = n_words / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    ref = ray.put((terms, idf))

    def score(t: pa.Table) -> pa.Table:
        qterms, qidf = ray.get(ref)
        tf, dl = _query_tf(t, col, qterms)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        s = np.zeros(len(dl), np.float64)
        for j in range(len(qidf)):  # fixed term order per row
            tfj = tf[:, j]
            s += qidf[j] * (tfj * (k1 + 1.0)) / (tfj + norm)
        cols = {c: t[c] for c in keep_cols if c in t.column_names}
        cols[id_col] = t[id_col]
        cols["dl"] = pa.array(dl, pa.int64())
        cols["bm25"] = pa.array(s, pa.float64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def bm25_search(ds, query: str, *, k: int = 20, col: str = "text",
                id_col: str = "doc_id", **kw):
    """Top-k BM25 retrieval: score map-only, then per-block local
    top-k (≤k rows leave each block) and one driver merge — the
    knn_brute plan. Deterministic tie-break (score DESC, id ASC)."""
    scored = bm25_score(ds, query, col=col, id_col=id_col, **kw)

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        o = np.lexsort((np.asarray(t[id_col]),
                        -np.asarray(t["bm25"], np.float64)))
        return t.take(pa.array(o[:k]))

    rows = scored.map_batches(local_topk, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: (-r["bm25"], r[id_col]))
    out = rows[:k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in out], pa.int64()),
        "dl": pa.array([r["dl"] for r in out], pa.int64()),
        "bm25": pa.array([r["bm25"] for r in out], pa.float64()),
        "rank": pa.array(range(len(out)), pa.int64()),
    })


class RepetitionStats:
    """BatchStep-style wrapper: per-doc repetition metrics appended as
    columns is NOT what the metric table needs — this emits the compact
    (id, metrics) table per batch; fusable with neighbouring maps."""

    fusable = True

    def __init__(self, col: str = "text", id_col: str = "doc_id"):
        self.col = col
        self.id_col = id_col

    def apply(self, ds):
        col, id_col = self.col, self.id_col
        return ds.map_batches(
            lambda t: repetition_stats(t, col=col, id_col=id_col),
            batch_format="pyarrow", zero_copy_batch=True,
        )


def repetition_stats(t: pa.Table, *, col: str = "text", id_col: str = "doc_id",
                     round_to: Optional[int] = None) -> pa.Table:
    """Per-document word-repetition metrics (one vectorized pass):

      n_words         total whitespace words
      n_distinct      distinct words
      dup_word_frac   1 - n_distinct / n_words   (Gopher dup-word rule)
      top_word_frac   count(most frequent word) / n_words

    Stateless per-row — use via ``map_batches``; no shuffle. Documents
    with zero words get zero fractions.
    """
    n = len(t)
    text = pc.fill_null(t[col], "")
    words = _split_words(text)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    nonempty = pc.not_equal(flat, "")
    lens = np.zeros(n, np.int64)
    if len(flat):
        offs = np.asarray(words.offsets)
        row_ids = np.repeat(np.arange(n), np.diff(offs))
        keep = np.asarray(nonempty)
        row_ids = row_ids[keep]
        codes = np.asarray(pc.dictionary_encode(flat.filter(nonempty)).indices)
        np.add.at(lens, row_ids, 1)
        order = np.lexsort((codes, row_ids))
        rs, cs = row_ids[order], codes[order]
        new_pair = np.ones(len(rs), bool)
        new_pair[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        distinct = np.zeros(n, np.int64)
        np.add.at(distinct, rs[new_pair], 1)
        # run lengths of (row, word) pairs; max per row via reduceat over
        # the contiguous run-span of each row
        starts = np.nonzero(new_pair)[0]
        run_len = np.diff(np.append(starts, len(rs)))
        run_row = rs[starts]
        new_row = np.ones(len(run_row), bool)
        new_row[1:] = run_row[1:] != run_row[:-1]
        row_first_run = np.nonzero(new_row)[0]
        top = np.zeros(n, np.int64)
        if len(run_len):
            top[run_row[row_first_run]] = np.maximum.reduceat(run_len, row_first_run)
    else:
        distinct = np.zeros(n, np.int64)
        top = np.zeros(n, np.int64)
    safe = np.maximum(lens, 1).astype(np.float64)
    dup = np.where(lens > 0, 1.0 - distinct / safe, 0.0)
    topf = top / safe
    if round_to is not None:
        dup = np.round(dup, round_to)
        topf = np.round(topf, round_to)
    return pa.table({
        id_col: t[id_col],
        "n_words": pa.array(lens),
        "n_distinct": pa.array(distinct),
        "dup_word_frac": pa.array(dup),
        "top_word_frac": pa.array(topf),
    })


def _keyed_count_partial(t: pa.Table, key: str, col: str) -> pa.Table:
    """Per-batch (key, word, count) triples — the keyed analogue of
    ``_word_count_partial`` (same whitespace split, empty words
    dropped; Arrow C++ group-count per block)."""
    words = _split_words(t[col])
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = pc.list_parent_indices(words)
    keys = t[key].combine_chunks().take(parents)
    tt = pa.table({key: keys, "word": flat})
    if len(flat):
        tt = tt.filter(pc.and_kleene(pc.not_equal(flat, ""),
                                     pc.is_valid(flat)))
    g = pa.TableGroupBy(tt, [key, "word"]).aggregate([([], "count_all")])
    return g.rename_columns([key, "word", "cnt"]).set_column(
        2, "cnt", pc.cast(g.column(2), pa.int64()))


def _mg_compress_per_key(t: pa.Table, key: str, capacity: int) -> pa.Table:
    """Per-KEY Misra-Gries compression, vectorized across every key in
    the block at once: sort by (key, cnt desc), run-segment, subtract
    each oversized key's (capacity+1)-th largest count and drop the
    non-positive remainder. Each key forwards <= capacity rows."""
    if t.num_rows == 0:
        return t
    ts = t.sort_by([(key, "ascending"), ("cnt", "descending")])
    kp = np.asarray(
        pc.cast(ts[key], pa.string()).fill_null("\x00")
        .to_numpy(zero_copy_only=False), object)
    cnt = np.asarray(ts["cnt"].to_numpy(zero_copy_only=False), np.int64)
    starts = np.flatnonzero(np.concatenate([[True], kp[1:] != kp[:-1]]))
    lens = np.diff(np.append(starts, len(kp)))
    run = np.repeat(np.arange(len(starts)), lens)
    thresh_pos = np.minimum(starts + capacity, len(kp) - 1)
    d_run = np.where(lens > capacity, cnt[thresh_pos], 0)
    d = d_run[run]
    keep = cnt > d
    out = ts.filter(pa.array(keep))
    return out.set_column(
        out.schema.get_field_index("cnt"), "cnt",
        pa.array(cnt[keep] - d[keep], pa.int64()))


def grouped_heavy_hitters(ds, key: str, *, col: str = "text",
                          k: int = 10, capacity: int = 4096):
    """Top-k terms PER KEY (e.g. top words per language) with bounded
    per-block state — the grouped analogue of :func:`heavy_hitters`.

    Plan: per-block keyed count partial (Arrow C++ group-count) →
    per-key MG compression (<= capacity rows leave a block PER KEY it
    contains, no matter how wide the local vocabulary) → ONE bucketed
    shuffle by key where each bucket sums per (key, word) and takes
    the per-key top-k in the same vectorized callback. Python calls:
    O(num_buckets). The data column never shuffles — only (key, word,
    cnt) triples.

    Guarantees: per-key MG bounds — counts undercount by at most
    n_key/(capacity+1), every term with true per-key frequency above
    that is present; with ``capacity >=`` each key's distinct-term
    count the result is the EXACT per-key top-k (ties broken by word
    ascending), equal to a GROUP BY / row_number() SQL oracle.
    """
    from vector_ray.stages.bucketed import bucketed_map_groups
    from vector_ray.stages.topk import _local_topk

    partial = ds.map_batches(
        lambda t: _mg_compress_per_key(
            _keyed_count_partial(t, key, col), key, capacity),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def finish(g: pa.Table) -> pa.Table:
        summed = pa.TableGroupBy(g, [key, "word"]).aggregate(
            [("cnt", "sum")]).rename_columns([key, "word", "cnt"])
        return _local_topk(summed, [key], "cnt", k, True, "word")

    return bucketed_map_groups(partial, [key], finish)


def _pmi_scores(cnt: np.ndarray, ca: np.ndarray, cb: np.ndarray,
                n_tok: int, n_pairs: int) -> np.ndarray:
    """PMI = log( (c_ab / N_pairs) / ((c_a / N_tok) * (c_b / N_tok)) ),
    evaluated in one fixed float64 expression order so the golden
    mirror (same-shaped array, same op order) is bit-identical."""
    num = cnt.astype(np.float64) * (float(n_tok) * float(n_tok))
    den = (float(n_pairs) * ca.astype(np.float64)) * cb.astype(np.float64)
    return np.log(num / den)


def pmi_pairs(ds, *, col: str = "text", window: int = 2,
              vocab_size: int = 10_000, min_count: int = 5, k: int = 50,
              max_pairs: int = 2_000_000):
    """Top-``k`` word-pair collocations by pointwise mutual information
    (PMI) — the corpus-analytics step behind phrase mining and
    tokenizer-merge candidates. A pair is two word OCCURRENCES within
    ``window`` positions in the same document (unordered; identical
    words count as a self-pair); only the top ``vocab_size`` words by
    (count desc, word asc) participate, and a pair needs
    ``min_count`` co-occurrences. Output: (w1, w2, cnt, pmi) with
    w1/w2 in vocab-code order, ranked by (pmi desc, code asc).

    Scale plan: exact word counts via per-block value_counts partials +
    one bucketed sum (the vocab_topk plan); the vocab ships ONCE via
    ``ray.put`` and pair counting is a map-only pass — words map to
    vocab codes with ``pc.index_in``, the ``window`` shifted-array
    comparisons are flat numpy, and each block emits pre-aggregated
    (packed-code-pair, count) partials, so the only pair shuffle is
    O(distinct pairs) narrow rows. Pairs surviving ``min_count`` are
    collected driver-side for the final PMI ranking — bounded by
    ``max_pairs`` with an explicit error (raise ``min_count`` — the
    same bounded-fan-in convention as ml/dedup's max_candidates)."""
    import ray

    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.bucketed import bucketed_map_groups

    # pass 1: exact global word counts
    partial = ds.map_batches(
        lambda t: _word_count_partial(t, col), batch_format="pyarrow",
        zero_copy_batch=True)
    summed = bucketed_map_groups(
        partial, ["word"], lambda g: _sum_per_term(g, "word")
    ).materialize()
    n_tok = int(summed.sum("cnt") or 0)
    if n_tok == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    local = summed.map_batches(
        lambda t: _local_global_topk(t, "word", vocab_size),
        batch_format="pyarrow", zero_copy_batch=True)
    parts = [pa.table(b) for b in local.iter_batches(
        batch_size=None, batch_format="pyarrow")]
    vt = _local_global_topk(
        pa.concat_tables(parts).combine_chunks(), "word", vocab_size)
    vocab_words = vt["word"].combine_chunks()
    vocab_cnt = np.asarray(vt["cnt"].to_numpy(zero_copy_only=False),
                           np.int64)
    V = len(vocab_words)
    vref = ray.put(vocab_words)

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        lists = _split_words(t[col])
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n < 2:
            return empty
        lens = pc.fill_null(pc.list_value_length(lists), 0)
        offs = np.asarray(pc.cast(lens, pa.int64())
                          .to_numpy(zero_copy_only=False), np.int64)
        doc = np.repeat(np.arange(len(offs), dtype=np.int64), offs)
        codes_arr = pc.index_in(flat, value_set=ray.get(vref))
        codes = np.asarray(codes_arr.to_numpy(zero_copy_only=False))
        valid = ~np.isnan(codes) if codes.dtype.kind == "f" else \
            np.ones(n, bool)
        codes = np.where(valid, codes, -1).astype(np.int64)
        keys = []
        for d in range(1, window + 1):
            if n <= d:
                break
            a, b = codes[:-d], codes[d:]
            ok = (a >= 0) & (b >= 0) & (doc[:-d] == doc[d:])
            if not ok.any():
                continue
            lo = np.minimum(a[ok], b[ok])
            hi = np.maximum(a[ok], b[ok])
            keys.append(lo * V + hi)
        if not keys:
            return empty
        u, c = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"key": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    pp = ds.map_batches(pair_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
    pairs = grouped_aggregate(pp, ["key"],
                              {"cnt": ("sum", "cnt")}).materialize()
    n_pairs = int(pairs.sum("cnt") or 0)
    flt = pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"],
                                            pa.scalar(min_count))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_cand = flt.count()
    if n_cand > max_pairs:
        raise ValueError(
            f"pmi_pairs: {n_cand} candidate pairs exceed max_pairs="
            f"{max_pairs}; raise min_count or max_pairs")
    if n_cand == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    ct = flt.take_batch(n_cand, batch_format="pyarrow")
    key = np.asarray(ct["key"].to_numpy(zero_copy_only=False), np.int64)
    cnt = np.asarray(ct["cnt"].to_numpy(zero_copy_only=False), np.int64)
    order = np.argsort(key)
    key, cnt = key[order], cnt[order]
    lo, hi = key // V, key % V
    pmi = _pmi_scores(cnt, vocab_cnt[lo], vocab_cnt[hi], n_tok, n_pairs)
    top = np.lexsort((key, -pmi))[:k]
    return pa.table({
        "w1": vocab_words.take(pa.array(lo[top], pa.int64())),
        "w2": vocab_words.take(pa.array(hi[top], pa.int64())),
        "cnt": pa.array(cnt[top], pa.int64()),
        "pmi": pa.array(pmi[top], pa.float64()),
    })
