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
    docs)."""
    return pc.utf8_split_whitespace(arr)


def _word_count_partial(t: pa.Table, col: str) -> pa.Table:
    flat = pc.list_flatten(_split_words(t[col]))
    if len(flat) > 0:
        flat = flat.filter(pc.not_equal(flat, ""))
    vc = flat.combine_chunks().value_counts()
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
