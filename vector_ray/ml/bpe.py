"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016 "Neural Machine Translation of Rare Words with Subword Units",
public spec; byte-level initial alphabet as in GPT-2's public BPE).
The reference engine has no counterpart (SURVEY §2 "beyond the
reference" — tokenizer training is the step between corpus curation
and pack/chunk in a training-data pipeline, ml/tokens.py).

Exact semantics (the golden oracle mirrors them symbol-for-symbol):

- *words*: whitespace-separated tokens of the raw text (``str.split``),
  counted corpus-wide → the WORD-TYPE table (word, freq). BPE learns
  from word TYPES weighted by frequency, so the merge loop's working
  set is vocabulary-bounded, not corpus-bounded — the type table is a
  Dataset and every loop step is a map + small grouped sum.
- *symbols*: a word starts as its UTF-8 bytes (0..255); merge ``i``
  creates symbol id ``256 + i``.
- *pair counts*: every adjacent symbol pair, weighted by word freq
  (overlaps included: "aaa" contributes (a,a) twice).
- *best pair*: max count; ties broken by smallest (a, b) — fully
  deterministic.
- *merge application*: left-to-right non-overlapping ("aaa" under
  merge (a,a) → (aa, a)).

``bpe_train`` runs ``num_merges`` iterations; each is one vectorized
map over the type table (pair counts pre-aggregated per block) + one
small grouped sum + a driver argmax over the (tiny) candidate set +
one vectorized rewrite pass. ``bpe_encode`` never re-runs merges on
the corpus: encoding is context-free per word, so it joins each word
against the trained type→symbols mapping (broadcast via ``ray.put``)
and only OOV word types (not occurrences) pay the merge replay.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# vectorized merge application over a flattened symbol table


def _apply_merge_flat(vals: np.ndarray, offs: np.ndarray, a: int, b: int,
                      new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Apply one merge (a, b) → new_id to every row of a flattened
    list<int32> (vals, offs), left-to-right non-overlapping, fully
    vectorized: candidate positions → consecutive-run parity keeps
    alternate candidates → rewrite + compaction via boolean gather."""
    n_rows = len(offs) - 1
    if len(vals) == 0:
        return vals, offs
    cand = np.zeros(len(vals), bool)
    same_row = np.repeat(np.arange(n_rows), np.diff(offs))
    cand[:-1] = (vals[:-1] == a) & (vals[1:] == b)
    if len(vals) > 1:
        cand[:-1] &= same_row[:-1] == same_row[1:]
    if not cand.any():
        return vals, offs
    if a == b:
        # overlap chains (aaa…): keep every other candidate in each
        # consecutive-candidate run, starting from the run's first —
        # index-within-run parity via a carried run-start index
        run_start = cand & ~np.concatenate(([False], cand[:-1]))
        starts_idx = np.maximum.accumulate(
            np.where(run_start, np.arange(len(vals)), -1))
        keep_merge = cand & (((np.arange(len(vals)) - starts_idx) % 2) == 0)
    else:
        # a != b: candidates can't chain (a,b,a,b overlaps only if
        # b==a), adjacent candidates share no position
        keep_merge = cand
    drop = np.zeros(len(vals), bool)
    drop[1:] = keep_merge[:-1]  # the `b` of every applied merge
    out_vals = vals.copy()
    out_vals[keep_merge] = new_id
    keep_rows = ~drop
    new_vals = out_vals[keep_rows]
    # new offsets: per row, dropped count subtracted
    drop_per_row = np.bincount(same_row[drop], minlength=n_rows) \
        if drop.any() else np.zeros(n_rows, np.int64)
    new_lens = np.diff(offs) - drop_per_row
    new_offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    return new_vals, new_offs


def _pair_counts_block(vals: np.ndarray, offs: np.ndarray,
                       freqs: np.ndarray) -> pa.Table:
    """Weighted adjacent-pair counts of a flattened symbol table,
    pre-aggregated: pairs packed into one int64 key (a<<32 | b)."""
    if len(vals) < 2:
        return pa.table({"pair": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    n_rows = len(offs) - 1
    same_row = np.repeat(np.arange(n_rows), np.diff(offs))
    m = np.zeros(len(vals), bool)
    m[:-1] = same_row[:-1] == same_row[1:]
    idx = np.nonzero(m)[0]
    key = (vals[idx].astype(np.int64) << 32) | vals[idx + 1].astype(np.int64)
    w = freqs[same_row[idx]].astype(np.int64)
    order = np.argsort(key, kind="stable")
    k_s, w_s = key[order], w[order]
    first = np.ones(len(k_s), bool)
    first[1:] = k_s[1:] != k_s[:-1]
    starts = np.nonzero(first)[0]
    cs = np.concatenate(([0], np.cumsum(w_s)))
    sums = cs[np.append(starts[1:], len(w_s))] - cs[starts]
    return pa.table({"pair": pa.array(k_s[starts]),
                     "cnt": pa.array(sums.astype(np.int64))})


def _flat(col) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(arr.offsets, np.int64)
    offs = offs - offs[0]
    vals = np.asarray(arr.flatten().to_numpy(zero_copy_only=False),
                      np.int32)
    return vals, offs


def word_freqs(ds, field: str = "text"):
    """Corpus-wide word-type frequencies: per-block Arrow hash
    aggregate (C++ group_by over the split words), then the two-phase
    grouped sum — the shuffle moves (word, count) partials, one row
    per distinct word per block."""
    from vector_ray.stages.aggregate import grouped_aggregate

    def part(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern_regex(
            pc.cast(t[field], pa.string()), r"\s+"))
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        g = pa.table({"word": words}).group_by("word").aggregate(
            [("word", "count")])
        return pa.table({"word": g["word"],
                         "freq": pc.cast(g["word_count"], pa.int64())})

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_aggregate(parts, ["word"], {"freq": ("sum", "freq")})


def _types_table(freq_tbl: pa.Table) -> pa.Table:
    """(word, freq, syms:list<int32>) — initial byte symbols."""
    words = freq_tbl["word"]
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    bins = pc.cast(words, pa.binary())
    bufs = bins.buffers()
    boffs = np.frombuffer(
        bufs[1], np.int32,
        count=len(bins) + 1 + bins.offset)[bins.offset:].astype(np.int64)
    lo = int(boffs[0])
    boffs = boffs - lo
    bvals = (np.frombuffer(bufs[2], np.uint8)[lo:lo + int(boffs[-1])]
             if bufs[2] is not None else np.empty(0, np.uint8))
    syms = pa.ListArray.from_arrays(
        pa.array(boffs, pa.int32()),
        pa.array(bvals.astype(np.int32), pa.int32()))
    return pa.table({"word": words, "freq": freq_tbl["freq"], "syms": syms})


def bpe_train(ds, field: str = "text", *, num_merges: int = 100,
              min_freq: int = 1, candidate_cap: int = 1_000_000):
    """Learn ``num_merges`` BPE merges from the corpus. Returns a
    pyarrow Table (merge_idx:int64, a:int64, b:int64, new_id:int64) —
    a/b/new_id are symbol ids (bytes 0..255, merges 256+).

    Plan: ONE corpus pass (word_freqs), then every merge iteration
    touches only the word-TYPE Dataset: vectorized pair counting with
    in-block pre-aggregation → two-phase grouped sum → driver argmax
    (count desc, pair asc) → vectorized merge rewrite. The driver
    never sees more than ``candidate_cap`` candidate pairs (loud
    failure — raise min_freq)."""
    from vector_ray.stages.aggregate import grouped_aggregate

    freqs = word_freqs(ds, field)

    def to_types(t: pa.Table) -> pa.Table:
        if min_freq > 1:
            t = t.filter(pc.greater_equal(t["freq"], pa.scalar(min_freq)))
        return _types_table(t)

    types = freqs.map_batches(to_types, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    merges = []
    for mi in range(num_merges):
        def counts(t: pa.Table) -> pa.Table:
            vals, offs = _flat(t["syms"])
            f = np.asarray(t["freq"].to_numpy(zero_copy_only=False),
                           np.int64)
            return _pair_counts_block(vals, offs, f)

        summed = grouped_aggregate(
            types.map_batches(counts, batch_format="pyarrow",
                              zero_copy_batch=True),
            ["pair"], {"c": ("sum", "cnt")})
        best_pair, best_cnt, total = None, -1, 0
        for b in summed.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            p = np.asarray(b["pair"].to_numpy(zero_copy_only=False))
            c = np.asarray(b["c"].to_numpy(zero_copy_only=False))
            total += len(p)
            if total > candidate_cap:
                raise ValueError(
                    f"bpe_train: >{candidate_cap} candidate pairs; "
                    "raise min_freq or candidate_cap")
            if len(c) == 0:
                continue
            # block-local best under (count desc, pair asc)
            mx = c.max()
            cand = p[c == mx].min()
            if mx > best_cnt or (mx == best_cnt and cand < best_pair):
                best_cnt, best_pair = int(mx), int(cand)
        if best_pair is None or best_cnt < max(min_freq, 1):
            break
        a, bsym = best_pair >> 32, best_pair & 0xFFFFFFFF
        new_id = 256 + mi
        merges.append((mi, a, bsym, new_id))

        def apply(t: pa.Table, _a=a, _b=bsym, _n=new_id) -> pa.Table:
            vals, offs = _flat(t["syms"])
            nv, no = _apply_merge_flat(vals, offs, _a, _b, _n)
            syms = pa.ListArray.from_arrays(
                pa.array(no.astype(np.int32)),
                pa.array(nv.astype(np.int32), pa.int32()))
            return pa.table({"word": t["word"], "freq": t["freq"],
                             "syms": syms})

        types = types.map_batches(apply, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    out = pa.table({
        "merge_idx": pa.array([m[0] for m in merges], pa.int64()),
        "a": pa.array([m[1] for m in merges], pa.int64()),
        "b": pa.array([m[2] for m in merges], pa.int64()),
        "new_id": pa.array([m[3] for m in merges], pa.int64()),
    })
    return out, types


def encode_word_bytes(word: str, merges: list) -> list:
    """Single-word reference encoder (merge replay) — used for OOV
    types in ``bpe_encode`` and by tests/oracles."""
    syms = list(word.encode("utf-8"))
    for _, a, b, new_id in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(new_id)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(ds, merge_tbl: pa.Table, types, *, field: str = "text",
               out_col: str = "bpe", vocab_limit: int = 20_000_000):
    """Encode a corpus with trained merges. BPE is context-free per
    word, so the trained word-type → symbols mapping (the ``types``
    Dataset returned by ``bpe_train``) is broadcast ONCE and each
    batch is a vectorized dictionary lookup; only OOV word TYPES in
    the batch replay the merges (per distinct word, not per
    occurrence). Output: ``out_col`` list<int32> per doc."""
    import ray

    parts = [b for b in types.iter_batches(batch_format="pyarrow",
                                           batch_size=None)]
    tt = pa.concat_tables(parts) if parts else None
    if tt is not None and len(tt) > vocab_limit:
        raise ValueError(f"bpe_encode: type table {len(tt)} > "
                         f"vocab_limit={vocab_limit}")
    if tt is not None:
        words_np = np.asarray(tt["word"].to_numpy(zero_copy_only=False))
        order = np.argsort(words_np, kind="stable")
        vocab_words = words_np[order]
        sv, so = _flat(tt["syms"])
        lens = np.diff(so)
        starts = so[:-1]
        vocab_starts = starts[order]
        vocab_lens = lens[order]
        vocab_ref = ray.put((vocab_words, sv, vocab_starts, vocab_lens))
    else:
        vocab_ref = ray.put((np.empty(0, object), np.empty(0, np.int32),
                             np.empty(0, np.int64), np.empty(0, np.int64)))
    merges = list(zip(merge_tbl["merge_idx"].to_pylist(),
                      merge_tbl["a"].to_pylist(),
                      merge_tbl["b"].to_pylist(),
                      merge_tbl["new_id"].to_pylist()))

    def encode(t: pa.Table) -> pa.Table:
        vw, sv_, vs, vl = ray.get(vocab_ref)
        docs = pc.split_pattern_regex(pc.cast(t[field], pa.string()), r"\s+")
        if isinstance(docs, pa.ChunkedArray):
            docs = docs.combine_chunks()
        flat_words = docs.flatten()
        fw = np.asarray(flat_words.to_numpy(zero_copy_only=False))
        keep = fw != ""
        doffs = np.asarray(docs.offsets, np.int64)
        doffs = doffs - doffs[0]
        doc_of = np.repeat(np.arange(len(t)), np.diff(doffs))[keep]
        fw = fw[keep]
        pos = np.searchsorted(vw, fw) if len(vw) else np.zeros(
            len(fw), np.int64)
        pos = np.minimum(pos, max(len(vw) - 1, 0))
        hit = (vw[pos] == fw) if len(vw) else np.zeros(len(fw), bool)
        # OOV types replay merges once per distinct word
        oov_syms = {}
        for w in np.unique(fw[~hit]):
            oov_syms[w] = encode_word_bytes(w, merges)
        word_lens = np.where(hit, vl[pos] if len(vw) else 0, 0)
        if oov_syms:
            ln = np.fromiter((len(oov_syms[w]) if not h else 0
                              for w, h in zip(fw, hit)), np.int64,
                             count=len(fw))
            word_lens = word_lens + ln
        total = int(word_lens.sum())
        out_vals = np.empty(total, np.int32)
        out_pos = np.zeros(len(fw) + 1, np.int64)
        np.cumsum(word_lens, out=out_pos[1:])
        # vectorized gather for in-vocab words: output span
        # [out_pos[i], +len) ← vocab span [vs[p], +len)
        if hit.any() and len(sv_):
            h_idx = np.nonzero(hit)[0]
            g_len = vl[pos[h_idx]]
            r = _ranges(g_len)
            dst = np.repeat(out_pos[h_idx], g_len) + r
            src = np.repeat(vs[pos[h_idx]], g_len) + r
            out_vals[dst] = sv_[src]
        for i in np.nonzero(~hit)[0]:
            s = oov_syms[fw[i]]
            out_vals[out_pos[i]:out_pos[i] + len(s)] = s
        # per-doc offsets: sum of word lens per doc
        doc_lens = np.bincount(doc_of, weights=word_lens,
                               minlength=len(t)).astype(np.int64)
        d_offs = np.zeros(len(t) + 1, np.int64)
        np.cumsum(doc_lens, out=d_offs[1:])
        lst = pa.ListArray.from_arrays(
            pa.array(d_offs.astype(np.int32)),
            pa.array(out_vals, pa.int32()))
        return t.append_column(out_col, lst)

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def _ranges(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), … concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
