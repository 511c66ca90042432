"""Token-sequence operators for training-data preparation over the
north-rule input shape (doc_id:string, tokens:list<int32>, n_tok:int32,
source:string):

  pack_sequences   greedy first-fit packing of sequences into fixed-
                   length training examples (shard-local, deterministic)
  chunk_sequences  split long sequences into max_len windows with
                   overlap (stateless 1→N, fully vectorized)
  decontaminate    drop/flag documents sharing any token n-gram with a
                   benchmark set (broadcast hash membership)

All three are Ray-Data-first: chunking is a pure ``map_batches``
expansion (no shuffle); packing shuffles only (group, shard) buckets and
does O(#packs) Python work per bucket (searchsorted jumps, never
per-row); decontamination broadcasts the benchmark n-gram hashes once
via ``ray.put`` and filters with one vectorized membership probe per
batch. Capabilities absent in the reference (event topology, not corpus
prep; SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

import vector_ray.expr.kernels as F
from vector_ray.stages.bucketed import bucketed_map_groups

_P = np.uint64(0x100000001B3)  # FNV prime as the rolling-hash multiplier


# ---------------------------------------------------------------------------
# pack_sequences


def _assign_shard(t: pa.Table, id_col: str, num_shards: int) -> pa.Table:
    fp = np.asarray(F.fingerprint(t[id_col]).to_numpy(zero_copy_only=False), np.uint64)
    return t.append_column("shard", pa.array((fp % np.uint64(num_shards)).astype(np.int32)))


def _pack_bucket(g: pa.Table, group_col: str, id_col: str, tok_col: str,
                 max_len: int) -> pa.Table:
    """Greedy first-fit packing over one bucket of (group, shard)
    segments: sort, then jump pack boundaries via searchsorted on the
    token cumsum — O(#packs log n) work, no per-row Python."""
    g = g.sort_by([(group_col, "ascending"), ("shard", "ascending"),
                   (id_col, "ascending")])
    lens = np.asarray(pc.cast(g[tok_col], pa.int64()).to_numpy(zero_copy_only=False))
    grp = np.asarray(pc.dictionary_encode(
        g[group_col].combine_chunks() if isinstance(g[group_col], pa.ChunkedArray)
        else g[group_col]).indices)
    shd = np.asarray(g["shard"].to_numpy(zero_copy_only=False))
    seg_start = np.ones(len(g), bool)
    seg_start[1:] = (grp[1:] != grp[:-1]) | (shd[1:] != shd[:-1])
    seg_bounds = np.append(np.nonzero(seg_start)[0], len(g))
    c = np.zeros(len(g) + 1, np.int64)
    np.cumsum(lens, out=c[1:])

    pack_starts, pack_ends, pack_ids = [], [], []
    for s, e in zip(seg_bounds[:-1], seg_bounds[1:]):
        start, pid = int(s), 0
        while start < e:
            end = int(np.searchsorted(c, c[start] + max_len, side="right")) - 1
            end = min(max(end, start + 1), int(e))  # oversize row → own pack
            pack_starts.append(start)
            pack_ends.append(end)
            pack_ids.append(pid)
            pid += 1
            start = end
    ps = np.array(pack_starts, np.int64)
    pe = np.array(pack_ends, np.int64)
    ids = g[id_col].combine_chunks() if isinstance(g[id_col], pa.ChunkedArray) else g[id_col]
    return pa.table({
        group_col: g[group_col].take(pa.array(ps)),
        "shard": g["shard"].take(pa.array(ps)),
        "pack_id": pa.array(np.array(pack_ids, np.int64)),
        "n_seqs": pa.array(pe - ps),
        "n_tok": pa.array(c[pe] - c[ps]),
        "doc_first": ids.take(pa.array(ps)),
        "doc_last": ids.take(pa.array(pe - 1)),
    })


def pack_sequences(ds, max_len: int, *, group_col: str = "source",
                   id_col: str = "doc_id", tok_col: str = "n_tok",
                   num_shards: int = 8):
    """Pack sequences into training examples of ≤ ``max_len`` tokens.

    Deterministic contract: rows are sharded by
    ``fnv1a(doc_id) % num_shards``; within each (group, shard), rows
    ordered by ``doc_id`` are packed greedily first-fit in order (a row
    longer than ``max_len`` becomes its own pack, untruncated). Packs
    never cross shards — the shard is the unit of parallelism, so the
    plan scales by raising ``num_shards``, and a resumable run can
    re-pack any shard independently.

    Returns one row per pack: (group, shard, pack_id, n_seqs, n_tok,
    doc_first, doc_last).
    """
    sharded = ds.map_batches(
        lambda t: _assign_shard(t, id_col, num_shards),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return bucketed_map_groups(
        sharded, [group_col, "shard"],
        lambda g: _pack_bucket(g, group_col, id_col, tok_col, max_len),
    )


# ---------------------------------------------------------------------------
# chunk_sequences


def _chunk_batch(t: pa.Table, tok_col: str, id_col: str, max_len: int,
                 stride: int) -> pa.Table:
    toks = t[tok_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    lens = np.diff(offs)
    # 1 chunk if len ≤ max_len, else 1 + ceil((len - max_len) / stride)
    n_chunks = np.where(
        lens <= max_len, 1, 1 + (np.maximum(lens - max_len, 0) + stride - 1) // stride
    ).astype(np.int64)
    total = int(n_chunks.sum())
    row_of = np.repeat(np.arange(len(t)), n_chunks)
    chunk_id = (np.arange(total) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
    starts = offs[:-1][row_of] + chunk_id * stride
    ends = np.minimum(starts + max_len, offs[1:][row_of])
    out_lens = ends - starts
    # gather flat values: repeat(starts) + intra-offset (int32 indices —
    # a block's flat token buffer is far below 2^31 values)
    out_offs = np.zeros(total + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    base = offs[0]
    n_out = int(out_offs[-1])
    # gather[i] = start_of_chunk + (i - chunk_out_start): ONE repeat of
    # the fused per-chunk shift, not one per term (token-volume passes
    # are the cost here)
    shift = (starts - base - out_offs[:-1]).astype(np.int32)
    gather = np.repeat(shift, out_lens)
    gather += np.arange(n_out, dtype=np.int32)
    values = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
    chunk_vals = values[gather]
    chunks = pa.ListArray.from_arrays(
        pa.array(out_offs, pa.int32()), pa.array(chunk_vals)
    )
    ids = t[id_col].take(pa.array(row_of))
    return pa.table({
        id_col: ids,
        "chunk_id": pa.array(chunk_id),
        "tokens": chunks,
        "n_tok": pa.array(out_lens),
    })


def chunk_sequences(ds, max_len: int, *, overlap: int = 0,
                    tok_col: str = "tokens", id_col: str = "doc_id"):
    """Split each sequence into windows of ``max_len`` tokens advancing
    by ``max_len - overlap``; the final window may be shorter, and a
    sequence ≤ ``max_len`` yields exactly one chunk. Stateless per-row
    1→N expansion — no shuffle, vectorized gather over the flat token
    buffer."""
    if not 0 <= overlap < max_len:
        raise ValueError("require 0 <= overlap < max_len")
    stride = max_len - overlap
    return ds.map_batches(
        lambda t: _chunk_batch(t, tok_col, id_col, max_len, stride),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# decontaminate


def ngram_hashes(toks: pa.Array | pa.ChunkedArray, n: int, *,
                 return_pos: bool = False):
    """All length-``n`` token windows as u64 polynomial hashes.
    Returns (hashes, row_id) — vectorized: ``n`` shifted multiply-adds
    over the flat value buffer, windows crossing row boundaries masked
    out. With ``return_pos`` also returns each window's start position
    in the (rebased) flat token buffer."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    lens = np.diff(offs)
    values = np.asarray(toks.flatten().to_numpy(zero_copy_only=False)).astype(np.uint64)
    total = len(values)
    if total < n:
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64))
        return empty + (np.empty(0, np.int64),) if return_pos else empty
    w = total - n + 1
    acc = values[:w].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):  # in-place: no per-step allocations
            acc *= _P
            acc += values[j:j + w]
    row_of_pos = np.repeat(np.arange(len(lens), dtype=np.int32), lens)
    valid = row_of_pos[:w] == row_of_pos[n - 1:]
    if return_pos:
        return acc[valid], row_of_pos[:w][valid], np.nonzero(valid)[0]
    return acc[valid], row_of_pos[:w][valid]


def benchmark_ngram_set(bench: pa.Table, *, tok_col: str = "tokens",
                        n: int = 8) -> np.ndarray:
    """Sorted unique n-gram hashes of a (small) benchmark table."""
    h, _ = ngram_hashes(bench[tok_col], n)
    return np.unique(h)


def decontaminate(ds, bench: pa.Table, *, n: int = 8, tok_col: str = "tokens",
                  id_col: str = "doc_id", mode: str = "flag"):
    """Mark (``mode="flag"``) or drop (``mode="drop"``) documents that
    share any token ``n``-gram with the benchmark table — the standard
    eval-decontamination pass. The benchmark hash set is built once on
    the driver (benchmarks are small by definition) and broadcast via
    ``ray.put``; each batch does one vectorized rolling-hash +
    searchsorted membership probe. Sequences shorter than ``n`` cannot
    be contaminated."""
    bset = benchmark_ngram_set(bench, tok_col=tok_col, n=n)
    # L2-resident bitmap pre-filter: binary-searching every corpus window
    # against even a tiny benchmark set is the hot cost (measured ~3 s per
    # 32M windows); a low-bits membership bitmap rejects ~99.8% of windows
    # with one cached load each, searchsorted runs only on survivors.
    bits = max(16, int(np.ceil(np.log2(max(len(bset), 1) * 256 + 1))))
    bmask = np.zeros(1 << bits, np.bool_)
    if len(bset):
        bmask[bset & np.uint64((1 << bits) - 1)] = True
    bref = ray.put((bset, bmask, bits))

    def probe(t: pa.Table) -> pa.Table:
        bs, mask, nb = ray.get(bref)
        h, rows = ngram_hashes(t[tok_col], n)
        contaminated = np.zeros(len(t), bool)
        if len(h) and len(bs):
            cand = mask[h & np.uint64((1 << nb) - 1)]
            hc, rc = h[cand], rows[cand]
            pos = np.searchsorted(bs, hc)
            pos[pos == len(bs)] = 0
            hit = bs[pos] == hc
            contaminated[np.unique(rc[hit])] = True
        if mode == "drop":
            return t.filter(pa.array(~contaminated))
        return t.append_column("contaminated", pa.array(contaminated))

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def dup_passages(ds, *, n: int = 16, tok_col: str = "tokens",
                 id_col: str = "doc_id", min_docs: int = 2,
                 sample_mod: int = 1):
    """Intra-corpus duplicate-passage detection (repeated token
    ``n``-grams across documents — the substring-dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2022): for each document, how many of its distinct token
    ``n``-gram windows also occur in at least ``min_docs - 1`` OTHER
    documents. Returns (id, n_windows, n_dup, dup_frac) for every doc
    with ≥1 window (docs shorter than ``n`` have none).

    Plan — the two-pass candidate/verify shape (same as the LSH
    pipelines): (1) COUNT pass — per batch, distinct window hashes
    with their in-batch doc counts (whash, cnt) — pre-aggregated, so
    the groupby-sum shuffle moves one row per distinct whash per
    block, never one per (doc, window); a window shared by 10^8 docs
    is a handful of partial-count rows, not a 10^8-row group. (2) The
    dup-hash set (global count ≥ ``min_docs``) is pulled to the driver
    and broadcast via ``ray.put`` (it is bounded by the volume of
    ACTUALLY duplicated text, not corpus size — ``max_dup_hashes``
    guards the assumption and fails loudly). (3) PROBE pass — map-only
    second scan recomputes each row's window hashes and bincounts hits
    against the broadcast sorted array. Token payloads never shuffle.

    ``sample_mod`` > 1 keeps only windows with whash % sample_mod == 0
    — selection by CONTENT hash, so a shared passage is sampled
    identically in every doc containing it (a stride would misalign);
    dup_frac then estimates over ~1/sample_mod of the windows.
    """
    return _dup_passages_impl(ds, n=n, tok_col=tok_col, id_col=id_col,
                              min_docs=min_docs, sample_mod=sample_mod)


def _row_distinct_hashes(t: pa.Table, tok_col: str, n: int,
                         sample_mod: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (whash, row) pairs of a batch, row-major."""
    h, rows = ngram_hashes(t[tok_col], n)
    if sample_mod > 1:
        keep = h % np.uint64(sample_mod) == 0
        h, rows = h[keep], rows[keep]
    order = np.lexsort((h, rows))
    h, rows = h[order], rows[order]
    keep = np.ones(len(h), bool)
    keep[1:] = (h[1:] != h[:-1]) | (rows[1:] != rows[:-1])
    return h[keep], rows[keep]


def _dup_hash_broadcast(ds, *, n, tok_col, min_docs, sample_mod,
                        max_dup_hashes: int, op_name: str):
    """COUNT pass + threshold + driver pull + ``ray.put``: the sorted
    int64 array of window hashes occurring in ≥ ``min_docs`` docs.
    Shared by ``dup_passages`` (scoring) and ``strip_dup_passages``
    (rewriting)."""
    # whash travels through groupby/broadcast as an int64 REINTERPRETATION
    # of the u64 rolling hash (Ray Data's aggregate key path round-trips
    # through Python ints, which overflow for u64 > 2^63). Equality is
    # bit-identical under the view; both sides of the probe searchsorted
    # use the same int64 view, so ordering stays consistent too.
    def count_partial(t: pa.Table) -> pa.Table:
        h, _ = _row_distinct_hashes(t, tok_col, n, sample_mod)
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table({"whash": pa.array(uh.view(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    counts = ds.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    # two-phase grouped_aggregate, NOT ds.groupby().sum(): the native
    # sort-based aggregate is ~20x slower at millions of distinct keys
    # (measured 15.2s vs 0.7s on 1.8M distinct keys, 32 CPUs)
    from vector_ray.stages.aggregate import grouped_aggregate

    summed = grouped_aggregate(counts, ["whash"], {"c": ("sum", "cnt")})

    def threshold(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t["c"], pa.scalar(min_docs))
        return t.filter(mask).select(["whash"])

    dup_ds = summed.map_batches(threshold, batch_format="pyarrow",
                                zero_copy_batch=True)
    parts, total = [], 0
    for b in dup_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        parts.append(np.asarray(b["whash"].to_numpy(zero_copy_only=False),
                                np.int64))
        total += len(parts[-1])
        if total > max_dup_hashes:
            raise ValueError(
                f"{op_name}: >{max_dup_hashes} duplicated window hashes; "
                "raise sample_mod / n, or raise max_dup_hashes if the "
                "driver has memory for the broadcast")
    dup_sorted = (np.sort(np.concatenate(parts)) if parts
                  else np.empty(0, np.int64))
    return ray.put(dup_sorted)


def _dup_passages_impl(ds, *, n, tok_col, id_col, min_docs, sample_mod,
                       max_dup_hashes: int = 50_000_000):
    dup_ref = _dup_hash_broadcast(
        ds, n=n, tok_col=tok_col, min_docs=min_docs, sample_mod=sample_mod,
        max_dup_hashes=max_dup_hashes, op_name="dup_passages")

    def probe(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        h, rows = _row_distinct_hashes(t, tok_col, n, sample_mod)
        h = h.view(np.int64)
        nw = np.bincount(rows, minlength=len(t)).astype(np.int64)
        if len(dups) and len(h):
            pos = np.searchsorted(dups, h)
            pos[pos == len(dups)] = 0
            hit = dups[pos] == h
            ndup = np.bincount(rows[hit], minlength=len(t)).astype(np.int64)
        else:
            ndup = np.zeros(len(t), np.int64)
        has = nw > 0  # docs shorter than n have no windows and no row
        with np.errstate(invalid="ignore"):
            frac = ndup / np.where(nw == 0, 1, nw)
        return pa.table({
            id_col: t[id_col].filter(pa.array(has)),
            "n_windows": pa.array(nw[has]),
            "n_dup": pa.array(ndup[has]),
            "dup_frac": pa.array(frac[has].astype(np.float64)),
        })

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def row_token_hash(toks: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Order-sensitive u64 checksum per row of a list<int> column:
    ``h(row) = Σ_i tok_i · P^(L-1-i)  (mod 2^64)`` — the same
    polynomial family as ``ngram_hashes`` over the whole row.
    Vectorized: one power-table gather + int64 wraparound multiply
    (two's-complement multiply is bit-equal to u64 mod 2^64; numpy's
    native u64 array×array multiply is ~20× slower) + a cumsum
    range-difference per row (exact under wraparound)."""
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    n_rows = len(lens)
    values = np.asarray(toks.flatten().to_numpy(zero_copy_only=False)).astype(np.int64)
    total = len(values)
    if total == 0:
        return np.zeros(n_rows, np.uint64)
    maxlen = int(lens.max())
    with np.errstate(over="ignore"):
        powp = np.ones(maxlen, np.int64)
        for i in range(1, maxlen):
            powp[i] = powp[i - 1] * np.int64(_P)
        pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
        from_end = np.repeat(lens, lens) - 1 - pos_in_row
        prod = values * powp[from_end]
        c = np.zeros(total + 1, np.int64)
        np.cumsum(prod, out=c[1:])
        out = c[offs[1:]] - c[offs[:-1]]
    return out.view(np.uint64)


def strip_dup_passages(ds, *, n: int = 16, tok_col: str = "tokens",
                       id_col: str = "doc_id", min_docs: int = 2,
                       max_dup_hashes: int = 50_000_000,
                       emit_hash: bool = True):
    """Remove duplicated passages from the corpus — the curation ACTION
    behind ``dup_passages``'s score (Lee et al. 2022 exact-substring
    dedup, in its boilerplate-removal form): every token covered by a
    length-``n`` window whose distinct-doc count is ≥ ``min_docs`` is
    dropped from EVERY document containing it. Removing all occurrences
    (rather than all-but-one) keeps the rewrite deterministic and
    partition-independent — no global "first copy" election is needed.

    Same two-pass plan as ``dup_passages`` (shared
    ``_dup_hash_broadcast``): the shuffle moves only pre-aggregated
    (whash, cnt) partials; the rewrite pass is map-only — window-hash
    membership probe, interval coverage by bincount cumsum over the
    flat buffer, one vectorized gather of surviving tokens. Emits
    (id_col, tokens, n_tok, n_removed[, tok_hash]) — ``tok_hash`` is
    ``row_token_hash`` of the stripped sequence, the compact per-row
    equality witness used by the golden oracle.
    """
    dup_ref = _dup_hash_broadcast(
        ds, n=n, tok_col=tok_col, min_docs=min_docs, sample_mod=1,
        max_dup_hashes=max_dup_hashes, op_name="strip_dup_passages")

    def rewrite(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        col = t[tok_col]
        toks = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offs = np.asarray(toks.offsets, np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        flat = toks.flatten()
        values = np.asarray(flat.to_numpy(zero_copy_only=False))
        total = len(values)
        h, _, pos = ngram_hashes(toks, n, return_pos=True)
        covered = np.zeros(total, bool)
        if len(h) and len(dups):
            hi = h.view(np.int64)
            loc = np.searchsorted(dups, hi)
            loc[loc == len(dups)] = 0
            starts = pos[dups[loc] == hi]
            if len(starts):
                inc = np.bincount(starts, minlength=total + n)
                dec = np.bincount(starts + n, minlength=total + n)
                covered = np.cumsum(inc - dec)[:total] > 0
        keep = ~covered
        rows_flat = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        new_lens = np.bincount(rows_flat[keep], minlength=len(lens)).astype(np.int64)
        new_offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(new_lens, out=new_offs[1:])
        stripped = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()),
            pa.array(values[keep], flat.type),
        )
        cols = {
            id_col: t[id_col],
            tok_col: stripped,
            "n_tok": pa.array(new_lens),
            "n_removed": pa.array(lens - new_lens),
        }
        if emit_hash:
            cols["tok_hash"] = pa.array(
                row_token_hash(stripped).view(np.int64))
        return pa.table(cols)

    return ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)
