"""Deduplication operators for training-data pipelines.

- ``exact_dedup``: content-hash partition → first-per-key (scale path
  of the dedupe transform for document text).
- ``minhash_lsh_dedup``: char-shingle → MinHash signature → banded LSH
  buckets (groupby band) → candidate groups → exact Jaccard verify →
  keep-first. The shuffle moves (band_hash, doc_id, signature) rows —
  never the documents.
- ``simhash``: 64-bit SimHash per doc (vectorized bit votes).
- ``ngram_jaccard``: exact n-gram Jaccard between candidate pairs.
- ``embedding_dup``: near-duplicate detection over an embedding column
  via random-hyperplane LSH bucketing + within-bucket cosine.

All signature computation is numpy-vectorized per batch; the only
all-to-all exchanges are groupbys over narrow key/signature tables.
"""

from __future__ import annotations



import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import F
from vector_ray.ml.text import doc_fingerprint

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(ds, field: str = "text", *, id_col: str = "doc_id"):
    """Keep the first (by id_col) row per exact normalized content."""
    hashed = ds.map_batches(
        lambda t: doc_fingerprint(t, field, "__fp"), batch_format="pyarrow", zero_copy_batch=True
    )

    def local_first(t: pa.Table) -> pa.Table:
        t = t.sort_by(id_col)
        # first row per fingerprint in sorted order — same key the global
        # groupby uses; np.unique(return_index) gives first occurrences
        fp = np.asarray(t["__fp"].combine_chunks().to_numpy(zero_copy_only=False), np.uint64)
        first_idx = np.unique(fp, return_index=True)[1]
        if len(first_idx) < len(t):
            t = t.take(pa.array(np.sort(first_idx)))
        return t

    pre = hashed.map_batches(local_first, batch_format="pyarrow", zero_copy_batch=True)

    from vector_ray.stages.bucketed import bucketed_first

    # global phase: hash-bucket shuffle + vectorized keep-first per bucket
    # (no per-distinct-key Python callback; see stages/bucketed.py)
    return bucketed_first(pre, ["__fp"], order_by=id_col, drop=("__fp",))


# ---------------------------------------------------------------------------
# two-pass LSH shared machinery: candidates from bucket membership only
# (the shuffle never carries signatures), then a distributed vectorized
# verify against signatures recomputed for candidate ids alone.


def _collect_arrow(ds) -> pa.Table:
    import ray

    blocks = ray.get(ds.to_arrow_refs())
    blocks = [b for b in blocks if len(b)]
    if not blocks:
        return None
    return pa.concat_tables(blocks).combine_chunks()


def _verify_candidate_pairs(cand_ds, sig_tbl: pa.Table, *, est_name: str,
                            threshold: float, num_hashes: int):
    """Distributed verify: ``cand_ds`` has (a, b); ``sig_tbl`` has
    (id, sig:FixedSizeList<u64>) for every candidate id, sorted by id.
    The sig table is broadcast ONCE (ray.put); each batch looks pairs up
    via searchsorted and computes the agreement fraction vectorized."""
    import ray

    sig_tbl = sig_tbl.sort_by("id")
    ref = ray.put(sig_tbl)
    id_is_str = pa.types.is_string(sig_tbl["id"].type)

    def verify(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        ids = np.asarray(st["id"].to_pylist()) if id_is_str else np.asarray(st["id"])
        sig = np.asarray(st["sig"].combine_chunks().flatten()).reshape(len(st), num_hashes)
        a = np.asarray(t["a"].to_pylist()) if id_is_str else np.asarray(t["a"])
        b = np.asarray(t["b"].to_pylist()) if id_is_str else np.asarray(t["b"])
        ai = np.clip(np.searchsorted(ids, a), 0, len(ids) - 1)
        bi = np.clip(np.searchsorted(ids, b), 0, len(ids) - 1)
        ok = (ids[ai] == a) & (ids[bi] == b)
        est = (sig[ai] == sig[bi]).mean(axis=1)
        keep = ok & (est >= threshold)
        typ = pa.string() if id_is_str else pa.int64()
        return pa.table({
            "a": pa.array(a[keep].tolist(), typ),
            "b": pa.array(b[keep].tolist(), typ),
            est_name: pa.array(est[keep].astype(np.float64)),
        })

    return cand_ds.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# minhash


def _flat_lower_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 bytes, int64 offsets) of a lowercased Arrow string
    column, straight off the Arrow values buffer — ZERO per-row Python.
    ``pc.utf8_lower`` is the vectorized stand-in for Python
    ``str.lower()`` (identical on ASCII; a handful of exotic casings
    differ, which only shifts which shingles a non-ASCII doc hashes —
    signatures stay internally consistent)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    lc = pc.utf8_lower(pc.fill_null(col, ""))
    if isinstance(lc, pa.ChunkedArray):
        lc = lc.combine_chunks()
    if lc.offset != 0:  # compact slices: buffer math below assumes 0
        lc = lc.take(np.arange(len(lc)))
    bufs = lc.buffers()
    offs = np.frombuffer(bufs[1], np.int32, len(lc) + 1).astype(np.int64)
    if bufs[2] is None:
        return np.empty(0, np.uint8), offs - offs[0]
    data = np.frombuffer(bufs[2], np.uint8)
    base = offs[0]
    return data[base:offs[-1]], offs - base


def _texts_to_flat(texts) -> tuple[np.ndarray, np.ndarray]:
    """Flat lowercase utf8 bytes + offsets from either an Arrow string
    column (vectorized, the hot path) or a Python list (legacy)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        return _flat_lower_utf8(texts)
    bufs = [(t or "").lower().encode("utf-8", "ignore") for t in texts]
    offs = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offs[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return flat, offs


def _shingle_hashes_flat(flat: np.ndarray, offs: np.ndarray,
                         k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-char shingle hashes per doc → (flat uint64 hashes, output
    offsets), fully vectorized over the flat byte buffer: one rolling
    polynomial pass for every window in the corpus, gathered per doc by
    index arithmetic; docs shorter than ``k`` hash whole via the
    table-driven crc32 kernel. (Duplicate shingles are kept — the
    MinHash minimum is unaffected, so the old per-doc ``np.unique`` was
    pure overhead.)"""
    n = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    counts = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    out_offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=out_offs[1:])
    hashes = np.empty(out_offs[-1], np.uint64)

    long = lens >= k
    if long.any():
        N = len(flat) - k + 1
        f64 = flat.astype(np.uint64)
        mult = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                        dtype=np.uint64)
        acc = np.zeros(N, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc += f64[j:j + N] * mult[j]
        cnts = counts[long]
        within = (np.arange(cnts.sum(), dtype=np.int64)
                  - np.repeat(np.cumsum(cnts) - cnts, cnts))
        src = np.repeat(offs[:-1][long], cnts) + within
        dst = np.repeat(out_offs[:-1][long], cnts) + within
        hashes[dst] = acc[src]
    short = ~long
    if short.any():
        crc = _crc32_words(flat, offs[:-1][short],
                           lens[short]).astype(np.uint64)
        hashes[out_offs[:-1][short]] = crc
    return hashes, out_offs


def _sm64(x: np.ndarray) -> np.ndarray:
    from vector_ray.sources.synth import _splitmix64

    return _splitmix64(x)


def minhash_signature(texts, *, num_hashes: int = 64, k: int = 5, seed: int = 1) -> np.ndarray:
    """(n_docs, num_hashes) uint64 MinHash signatures. ``texts`` may be
    an Arrow string Array/ChunkedArray (the hot path: lowercased flat
    bytes come straight off the Arrow values buffer via
    ``pc.utf8_lower`` — no per-row Python) or a Python list (legacy).

    Fast path: the native fused kernel (vector_ray.native) runs the
    byte-shingle rolling hash + all minima in one C pass over the
    concatenated lowercase text bytes. Fallback: numpy rolling-poly +
    reduceat over the same flat buffer (``_shingle_hashes_flat``).
    (The two paths use different shingle hash functions, so signatures
    are internally consistent per process configuration but not
    interchangeable across paths — fine for LSH use.)"""
    from vector_ray.native import get_lib

    n_docs = len(texts)
    flat_u8, offsets = _texts_to_flat(texts)
    lib = get_lib()
    if lib is not None and hasattr(lib, "token_minhash_fused") and n_docs:
        import ctypes

        if len(flat_u8) == 0:
            return np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            mults = np.array(
                [np.uint64(0x9E3779B97F4A7C15) * np.uint64(j + 1) for j in range(k)],
                dtype=np.uint64,
            )
        seeds = np.array(
            [(seed * 1_000_003 + h * 2_654_435_761) & 0xFFFFFFFFFFFFFFFF for h in range(num_hashes)],
            dtype=np.uint64,
        )
        out = np.empty((n_docs, num_hashes), dtype=np.uint64)
        flat_c = np.ascontiguousarray(flat_u8.astype(np.int32))
        offs_c = np.ascontiguousarray(offsets)
        lib.token_minhash_fused(
            flat_c.ctypes.data_as(ctypes.c_void_p),
            offs_c.ctypes.data_as(ctypes.c_void_p), n_docs, k,
            mults.ctypes.data_as(ctypes.c_void_p),
            seeds.ctypes.data_as(ctypes.c_void_p), num_hashes,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out
    sig = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n_docs == 0:
        return sig
    flat, offs = _shingle_hashes_flat(flat_u8, offsets, k)
    if len(flat) == 0:
        return sig
    starts = offs[:-1]
    for i in range(num_hashes):
        with np.errstate(over="ignore"):
            perm = _sm64(flat ^ np.uint64(seed * 1_000_003 + i * 2_654_435_761))
        sig[:, i] = np.minimum.reduceat(perm, starts)[:len(starts)]
    return sig


def minhash_lsh_dedup(
    ds,
    field: str = "text",
    *,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.8,
    return_pairs: bool = False,
    components: str = "distributed",
    max_bucket: int = 512,
    broadcast_limit: int = 5_000_000,
    max_candidates: int = 2_000_000,
):
    """MinHash+LSH near-dup. Emits either the deduped dataset (keep
    lowest id per duplicate cluster) or the verified duplicate pairs.

    Two-pass candidate/verify plan: signature map_batches → explode to
    (band, band_hash, id) — the signature (num_hashes × 8 B, the
    dominant payload) NEVER enters the all-to-all — → candidate pairs
    from bucket membership → signatures recomputed for candidate ids
    only (pruned second scan) → distributed vectorized Jaccard-estimate
    verify → duplicate edges → connected components → filter.

    Scale guards:
    - ``components="distributed"`` (default) labels duplicate clusters
      with hash-min propagation (ml/components.py) — the edge set never
      lands on the driver. ``"driver"`` keeps the r1 union-find for
      tiny jobs.
    - Degenerate LSH buckets (identical band hash across > ``max_bucket``
      docs) are capped to the ``max_bucket`` lowest ids before the
      O(width²) pairing, with a logged warning — per the no-silent-caps
      rule. Capped docs still pair through their other bands.
    - ``max_candidates`` bounds the candidate-id broadcast with an
      explicit error (raise bands/threshold or exact-dedup first).
    - The final filter broadcasts the duplicate-id set when it is under
      ``broadcast_limit`` ids, else falls back to a bucketed anti-join
      so no unbounded set crosses the driver.
    """
    import ray
    import ray.data as rd

    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes

    def sigs(t: pa.Table) -> pa.Table:
        n = len(t)
        sig = minhash_signature(t[field], num_hashes=num_hashes, k=k)
        band_hashes = np.empty((n, bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(rows_per_band):
                    acc = _sm64(acc ^ chunk[:, j])
            band_hashes[:, b] = acc
        ids = np.repeat(np.asarray(t[id_col]), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hashes.reshape(-1), pa.uint64()),
                id_col: pa.array(ids),
            }
        )

    exploded = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(g: pa.Table) -> pa.Table:
        if len(g) > max_bucket:
            import logging

            logging.getLogger("vector_ray.dedup").warning(
                "LSH bucket of width %d capped to %d lowest ids (band=%s); "
                "capped docs can still pair via their other bands",
                len(g), max_bucket, g["band"][0].as_py() if "band" in g.column_names else "?",
            )
            g = g.sort_by(id_col).slice(0, max_bucket)
        ids = np.sort(np.asarray(g[id_col]))
        iu = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[iu[0]], pa.int64()),
                         "b": pa.array(ids[iu[1]], pa.int64())})

    # segment grouping: mostly-unique docs mean mostly width-1 LSH
    # buckets — one Python call per singleton bucket would be O(docs);
    # bucketed_segment_groups calls `candidates` only on width≥2 buckets
    from vector_ray.stages.bucketed import bucketed_first, bucketed_segment_groups

    _empty_cand = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    cand = bucketed_first(
        bucketed_segment_groups(exploded, ["band", "band_hash"], candidates, _empty_cand),
        ["a", "b"],
    ).materialize()
    _empty_jp = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "est_jaccard": pa.array([], pa.float64())})
    n_cand = cand.count()
    if n_cand == 0:
        pairs = rd.from_arrow(_empty_jp)
        if return_pairs:
            return pairs
        return ds
    if n_cand > max_candidates:
        raise ValueError(
            f"minhash_lsh_dedup: {n_cand} candidate pairs exceeds "
            f"max_candidates={max_candidates}; raise bands/threshold or "
            "run exact dedup first"
        )
    cand_t = _collect_arrow(cand)
    need = np.unique(np.concatenate([np.asarray(cand_t["a"]), np.asarray(cand_t["b"])]))
    need_ref = ray.put(pa.array(need, pa.int64()))

    def sigs_for_candidates(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        mask = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=want)
        sub = t.filter(pc.fill_null(mask, False))
        if len(sub) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.uint64(), num_hashes))})
        sig = minhash_signature(sub[field], num_hashes=num_hashes, k=k)
        return pa.table({
            "id": pc.cast(sub[id_col], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), pa.uint64()), num_hashes),
        })

    sig_tbl = _collect_arrow(
        ds.map_batches(sigs_for_candidates, batch_format="pyarrow", zero_copy_batch=True)
    )
    pairs = _verify_candidate_pairs(
        cand, sig_tbl, est_name="est_jaccard",
        threshold=jaccard_threshold, num_hashes=num_hashes,
    )
    if return_pairs:
        return pairs

    if components == "driver":
        # r1 path, for tiny jobs: edge set → driver union-find
        edge_rows = pairs.select_columns(["a", "b"]).take_all()
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        def union(x, y):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)

        for e in edge_rows:
            union(e["a"], e["b"])
        drop = {x for x in parent if find(x) != x}
        if not drop:
            return ds
        drop_arr = pa.array(sorted(drop), pa.int64())
        return ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=drop_arr))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    from vector_ray.ml.components import connected_components

    labels = connected_components(pairs.select_columns(["a", "b"]))
    dup_ids = labels.map_batches(
        lambda t: pa.table({"__dupid": t.filter(pc.not_equal(t["node"], t["label"]))["node"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _filter_out_ids(ds, id_col, dup_ids, broadcast_limit=broadcast_limit)


def _filter_out_ids(ds, id_col: str, dup_ids, *, broadcast_limit: int = 5_000_000):
    """Remove rows whose (int64-cast) ``id_col`` appears in ``dup_ids``
    (a Dataset with one ``__dupid`` column). Small sets broadcast via
    ray.put + is_in; large sets anti-join through the bucketed hash
    join so the driver never materializes them."""
    import ray

    n_dup = dup_ids.count()
    if n_dup == 0:
        return ds
    if n_dup <= broadcast_limit:
        drop_arr = pa.array(
            sorted(r["__dupid"] for r in dup_ids.take_all()), pa.int64()
        )
        ref = ray.put(drop_arr)

        def flt(t: pa.Table) -> pa.Table:
            arr = ray.get(ref)
            return t.filter(
                pc.invert(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=arr))
            )

        return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    from vector_ray.stages.join import bucketed_join

    marked = dup_ids.map_batches(
        lambda t: t.append_column("__dup", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    with_key = ds.map_batches(
        lambda t: t.append_column("__id64", pc.cast(t[id_col], pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = bucketed_join(with_key, marked, on=["__id64"], right_on=["__dupid"],
                           join_type="left outer")
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__dup"])).drop_columns(["__id64", "__dup"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# simhash


def _crc32_table() -> np.ndarray:
    t = np.empty(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        t[i] = c
    return t


_CRC_TABLE = _crc32_table()


def _crc32_words(flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """zlib.crc32 of each (start, length) slice of the flat byte buffer,
    vectorized across words: one table-lookup step per BYTE POSITION
    (max word length iterations), each step updating every still-active
    word at once."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    # sort by length ascending → at byte j the still-active words are a
    # contiguous SUFFIX (no boolean masks, slice assignment only)
    order = np.argsort(lengths, kind="stable")
    slen = lengths[order]
    sstart = starts[order]
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(int(slen[-1])):
        s = int(np.searchsorted(slen, j, side="right"))
        b = flat[sstart[s:] + j].astype(np.uint32)
        c = crc[s:]
        crc[s:] = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> np.uint32(8))
    out = np.empty(n, dtype=np.uint32)
    out[order] = crc ^ np.uint32(0xFFFFFFFF)
    return out


def flat_word_hashes(texts, *, seed: int = 1):
    """Per-word 64-bit hashes over every doc in ``texts``, fully
    vectorized (flat-buffer word runs + table-driven CRC32 → splitmix64
    — the simhash_batch tokenizer, shared with ml/dsir.py). ``texts``
    may be an Arrow string Array/ChunkedArray (the hot path — bytes
    come straight off the values buffer, ZERO per-row Python) or a
    Python list (legacy). Returns ``(hs: uint64[nwords],
    doc_of_word: int64[nwords])`` with words in document order.

    Words are maximal runs of word bytes ([a-z0-9_] after lowercasing,
    plus any byte ≥ 0x80) in the utf-8 encoding — for non-ASCII text
    this glues characters Python's unicode ``\\w`` would split (e.g.
    punctuation like €), a documented deviation. (Arrow vs list paths
    also differ in lowercasing backend — utf8_lower vs str.lower —
    identical on ASCII; see _flat_lower_utf8.)"""
    n = len(texts)
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64))
    if n == 0:
        return empty
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        flat, offs = _flat_lower_utf8(texts)
        doc_starts = offs[:-1]
        # no separator bytes between docs: word runs must be cut at
        # every interior doc boundary below
        boundaries = offs[1:-1]
    else:
        bufs = [(t or "").lower().encode("utf-8", "ignore") for t in texts]
        flat = np.frombuffer(b"\x00".join(bufs) + b"\x00", dtype=np.uint8)
        doc_starts = np.zeros(n, dtype=np.int64)
        np.cumsum([len(b) + 1 for b in bufs[:-1]], out=doc_starts[1:])
        boundaries = None  # \x00 separators already break runs
    if len(flat) == 0:
        return empty
    # word-char mask → word runs via diff
    wc = (
        ((flat >= 97) & (flat <= 122))
        | ((flat >= 48) & (flat <= 57))
        | (flat == 95)
        | (flat >= 128)
        | ((flat >= 65) & (flat <= 90))
    )
    d = np.diff(wc.astype(np.int8), prepend=np.int8(0))
    w_starts = np.nonzero(d == 1)[0]
    w_ends = np.nonzero(d == -1)[0]
    if len(w_ends) < len(w_starts):  # buffer ends inside a word
        w_ends = np.append(w_ends, len(flat))
    if len(w_starts) == 0:
        return empty
    if boundaries is not None and len(boundaries):
        # split any run spanning a doc boundary b: w_starts[i] < b <
        # w_ends[i] → two runs [s,b) and [b,e)
        i = np.searchsorted(w_starts, boundaries, side="right") - 1
        ok = i >= 0
        bb, ii = boundaries[ok], i[ok]
        # unique: an EMPTY doc between two word-adjacent docs repeats
        # its boundary offset — cutting twice would mint a zero-length
        # "word" that the list path (separator bytes) never produces
        cuts = np.unique(bb[(w_starts[ii] < bb) & (bb < w_ends[ii])])
        if len(cuts):
            w_starts = np.sort(np.concatenate([w_starts, cuts]))
            w_ends = np.sort(np.concatenate([w_ends, cuts]))
    w_lens = w_ends - w_starts
    doc_of_word = np.searchsorted(doc_starts, w_starts, side="right") - 1
    with np.errstate(over="ignore"):
        hs = _sm64(_crc32_words(flat, w_starts, w_lens).astype(np.uint64) ^ np.uint64(seed))
    return hs, doc_of_word


def simhash_batch(texts, *, seed: int = 1) -> np.ndarray:
    """64-bit SimHash per doc over word tokens (``texts``: Arrow string
    Array/ChunkedArray zero-copy, or a Python list) — fully vectorized
    (flat-buffer + reduceat, the TokenMinHash pattern; no per-row or
    per-word Python). Bit-identical to the r1 per-row loop
    (crc32-per-word → splitmix64 → majority bit votes) on ASCII text.
    Tokenization contract: see flat_word_hashes."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    hs, doc_of_word = flat_word_hashes(texts, seed=seed)
    if len(hs) == 0:
        return out
    counts = np.bincount(doc_of_word, minlength=n)
    nz = counts > 0
    word_offs = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=word_offs[1:])
    nz_offs = word_offs[nz]
    counts_nz = counts[nz].astype(np.uint64)
    # per-bit 1-D reduceat (2-D axis-0 reduceat is numpy's slow path);
    # majority vote: bit set iff 2·(ones) > word count
    res = np.zeros(int(nz.sum()), dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat((hs >> np.uint64(b)) & np.uint64(1), nz_offs)
        res |= (np.uint64(2) * ones > counts_nz).astype(np.uint64) << np.uint64(b)
    out[nz] = res
    return out


class SimHash:
    """map_batches body adding a `simhash:uint64` column."""

    def __init__(self, field: str = "text", out: str = "simhash"):
        self.field = field
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        return F.set_(t, self.out, pa.array(simhash_batch(t[self.field]), pa.uint64()))


# ---------------------------------------------------------------------------
# n-gram jaccard


def ngram_set(text: str, n: int = 3) -> set:
    toks = (text or "").lower().split()
    return {tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


# ---------------------------------------------------------------------------
# embedding near-dup


def embedding_dup_pairs(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 12,
    tables: int = 8,
    cosine_threshold: float = 0.95,
    seed: int = 3,
    max_bucket: int = 512,
    max_candidates: int = 2_000_000,
):
    """Near-dup pairs over an embedding column: multi-table
    random-hyperplane LSH (sign bits of `planes` projections per table,
    `tables` independent plane sets — OR-amplification so a near-dup
    pair missing one table's bucket is caught by another) →
    within-bucket pairwise cosine → pairs above threshold, deduped
    across tables. Dimensions inferred per batch; all plane sets are
    seed-deterministic."""
    plane_cache: dict = {}

    def get_planes(dim: int) -> np.ndarray:
        """(tables, dim, planes) seeded stack of hyperplane sets."""
        if dim not in plane_cache:
            plane_cache[dim] = np.stack([
                np.random.default_rng(seed + 7919 * tb).standard_normal((dim, planes))
                for tb in range(tables)
            ])
        return plane_cache[dim]

    def bucket(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t[vec_col].combine_chunks().flatten(), dtype=np.float32)
        n = len(t)
        dim = vecs.size // max(n, 1)
        m = vecs.reshape(n, dim)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.maximum(norms, 1e-12)
        keys = np.empty((n, tables), dtype=np.uint64)
        all_planes = get_planes(dim)
        for tb in range(tables):
            signs = (m @ all_planes[tb]) > 0
            bucket_id = np.packbits(
                np.pad(signs, ((0, 0), (0, (-planes) % 8)), constant_values=False),
                axis=1, bitorder="little",
            ).astype(np.uint64)
            key = np.zeros(n, dtype=np.uint64)
            for j in range(bucket_id.shape[1]):
                key = key << np.uint64(8) | bucket_id[:, j]
            keys[:, tb] = key
        ids_rep = np.repeat(np.asarray(t[id_col]), tables)
        return pa.table(
            {
                "table": pa.array(np.tile(np.arange(tables, dtype=np.int32), n)),
                "bucket": pa.array(keys.reshape(-1), pa.uint64()),
                id_col: pa.array(ids_rep),
            }
        )

    # two-pass candidate/verify: the shuffle moves (table, bucket, id)
    # rows only — the vector payload (dim × 4 B × tables per row) never
    # enters the all-to-all; candidates from bucket membership, cosine
    # verified distributed against vectors re-read for candidate ids
    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)

    def cand_fn(g: pa.Table) -> pa.Table:
        if len(g) > max_bucket:
            # degenerate bucket (e.g. many identical embeddings): the
            # O(width²) fan-out blows up one task — cap to the lowest
            # ids; capped vectors can still pair via their other tables
            import logging

            logging.getLogger("vector_ray.dedup").warning(
                "embedding LSH bucket of width %d capped to %d lowest ids "
                "(table=%s); capped vectors can still pair via other tables",
                len(g), max_bucket,
                g["table"][0].as_py() if "table" in g.column_names else "?",
            )
            g = g.sort_by(id_col).slice(0, max_bucket)
        ids = np.sort(np.asarray(g[id_col]))
        iu = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[iu[0]], pa.int64()),
                         "b": pa.array(ids[iu[1]], pa.int64())})

    import ray
    import ray.data as rd

    from vector_ray.stages.bucketed import bucketed_first, bucketed_segment_groups

    _empty_cand = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    cand = bucketed_first(
        bucketed_segment_groups(bucketed, ["table", "bucket"], cand_fn, _empty_cand),
        ["a", "b"],
    ).materialize()
    empty_out = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
    n_cand = cand.count()
    if n_cand == 0:
        return rd.from_arrow(empty_out)
    if n_cand > max_candidates:
        raise ValueError(
            f"embedding_dup_pairs: {n_cand} candidate pairs exceeds "
            f"max_candidates={max_candidates}; raise planes/threshold or "
            "run exact dedup first"
        )
    cand_t = _collect_arrow(cand)
    need = np.unique(np.concatenate([np.asarray(cand_t["a"]), np.asarray(cand_t["b"])]))
    need_ref = ray.put(pa.array(need, pa.int64()))

    def vecs_for_candidates(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        mask = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=want)
        sub = t.filter(pc.fill_null(mask, False))
        if len(sub) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        vecs = np.asarray(sub[vec_col].combine_chunks().flatten(), dtype=np.float32)
        m = vecs.reshape(len(sub), vecs.size // len(sub))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table({
            "id": pc.cast(sub[id_col], pa.int64()),
            "vec": pa.array([row for row in m.tolist()], pa.list_(pa.float32())),
        })

    vec_tbl = _collect_arrow(
        ds.map_batches(vecs_for_candidates, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("id")
    vref = ray.put(vec_tbl)

    def verify(t: pa.Table) -> pa.Table:
        vt = ray.get(vref)
        ids = np.asarray(vt["id"])
        flat = np.asarray(vt["vec"].combine_chunks().flatten(), dtype=np.float32)
        m = flat.reshape(len(vt), flat.size // max(len(vt), 1))
        a = np.asarray(t["a"]); b = np.asarray(t["b"])
        ai = np.clip(np.searchsorted(ids, a), 0, len(ids) - 1)
        bi = np.clip(np.searchsorted(ids, b), 0, len(ids) - 1)
        ok = (ids[ai] == a) & (ids[bi] == b)
        cos = (m[ai] * m[bi]).sum(axis=1)
        keep = ok & (cos >= cosine_threshold)
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "cosine": pa.array(cos[keep].astype(np.float64))})

    return cand.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# token-sequence minhash (tokenized-training-data near-dup signatures)


class TokenMinHash:
    """MinHash signatures over token n-gram shingles of a
    ``tokens:list<int32>`` column — sequence-level near-dup detection
    for pre-tokenized training data (the tokenized-table analogue of
    text MinHash; pairs with LSH banding exactly like
    ``minhash_lsh_dedup``).

    Fully vectorized over the FLAT token buffer: one rolling-window
    shingle hash pass + ``num_hashes`` splitmix permutations with
    ``np.minimum.reduceat`` per row. Window hashes that cross row
    boundaries are masked to u64::MAX so they never win a minimum.
    Emits ``sig_cols`` uint64 columns (sig0..sigH-1).
    """

    def __init__(self, tokens_col: str = "tokens", *, num_hashes: int = 8,
                 ngram: int = 4, seed: int = 17, out_prefix: str = "tok_sig"):
        self.tokens_col = tokens_col
        self.num_hashes = num_hashes
        self.ngram = ngram
        self.seed = seed
        self.out_prefix = out_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.tokens_col]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        n = len(t)
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        off0 = int(offsets[0])
        offsets = offsets - off0
        # fused native path: windows + minima straight off the raw int32
        # token buffer, one read pass, zero numpy temps
        from vector_ray.native import get_lib as _get_lib

        _lib = _get_lib()
        if _lib is not None and hasattr(_lib, "token_minhash_fused"):
            import ctypes

            toks32 = np.asarray(arr.values, dtype=np.int32)
            if off0:
                toks32 = toks32[off0:]
            toks32 = np.ascontiguousarray(toks32)
            offs_c = np.ascontiguousarray(offsets)
            k = self.ngram
            with np.errstate(over="ignore"):
                mults = np.array(
                    [np.uint64(0x9E3779B97F4A7C15) * np.uint64(j + 1) for j in range(k)],
                    dtype=np.uint64,
                )
            seeds = np.array(
                [(self.seed + h * 2_654_435_761) & 0xFFFFFFFFFFFFFFFF for h in range(self.num_hashes)],
                dtype=np.uint64,
            )
            outbuf = np.empty((n, self.num_hashes), dtype=np.uint64)
            _lib.token_minhash_fused(
                toks32.ctypes.data_as(ctypes.c_void_p),
                offs_c.ctypes.data_as(ctypes.c_void_p), n, k,
                mults.ctypes.data_as(ctypes.c_void_p),
                seeds.ctypes.data_as(ctypes.c_void_p), self.num_hashes,
                outbuf.ctypes.data_as(ctypes.c_void_p),
            )
            for h in range(self.num_hashes):
                t = t.append_column(
                    f"{self.out_prefix}{h}", pa.array(np.ascontiguousarray(outbuf[:, h]), pa.uint64())
                )
            return t
        flat = np.asarray(arr.values, dtype=np.uint64)
        if off0:
            flat = flat[off0:]  # sliced list arrays: values buffer keeps the prefix
        total = len(flat)
        k = self.ngram
        MAX = np.iinfo(np.uint64).max
        if total < k:
            for h in range(self.num_hashes):
                t = t.append_column(f"{self.out_prefix}{h}", pa.array(np.full(n, MAX, np.uint64), pa.uint64()))
            return t
        # rolling n-gram window hash over the flat buffer
        with np.errstate(over="ignore"):
            w = flat[: total - k + 1].copy()
            for j in range(1, k):
                w ^= flat[j : total - k + 1 + j] * np.uint64(0x9E3779B97F4A7C15 * (j + 1) & 0xFFFFFFFFFFFFFFFF)
        # mask windows that cross a row boundary
        ends = offsets[1:]  # row end positions in flat space
        boundary_mask = np.zeros(len(w), dtype=bool)
        for d in range(1, k):
            pos = ends - d  # windows starting here include the boundary
            pos = pos[(pos >= 0) & (pos < len(w))]
            boundary_mask[pos] = True
        starts = np.minimum(offsets[:-1], len(w) - 1)
        lens = np.diff(offsets)
        empty = lens < k
        out_cols = {}
        # native single-pass kernel (vector_ray.native): all hash minima
        # in one traversal — 16x less memory traffic than the numpy
        # multi-pass path, numerically identical
        from vector_ray.native import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            seeds = np.array(
                [(self.seed + h * 2_654_435_761) & 0xFFFFFFFFFFFFFFFF for h in range(self.num_hashes)],
                dtype=np.uint64,
            )
            bmask = boundary_mask.astype(np.uint8)
            outbuf = np.empty((n, self.num_hashes), dtype=np.uint64)
            w_c = np.ascontiguousarray(w)
            offs_c = np.ascontiguousarray(offsets)
            lib.token_minhash(
                w_c.ctypes.data_as(ctypes.c_void_p), len(w_c),
                bmask.ctypes.data_as(ctypes.c_void_p),
                offs_c.ctypes.data_as(ctypes.c_void_p), n,
                seeds.ctypes.data_as(ctypes.c_void_p), self.num_hashes,
                outbuf.ctypes.data_as(ctypes.c_void_p),
            )
            for h in range(self.num_hashes):
                t = t.append_column(f"{self.out_prefix}{h}", pa.array(np.ascontiguousarray(outbuf[:, h]), pa.uint64()))
            return t
        # scratch buffer reused across hash passes: the naive version
        # allocates ~4 large temporaries per pass (8+ GB/batch of
        # mmap/munmap churn → kernel page-zeroing storms under high
        # worker counts); in-place ops keep it to ONE resident buffer
        perm = np.empty_like(w)
        tmp = np.empty_like(w)
        for h in range(self.num_hashes):
            with np.errstate(over="ignore"):
                np.bitwise_xor(w, np.uint64((self.seed + h * 2_654_435_761) & 0xFFFFFFFFFFFFFFFF), out=perm)
                # inline splitmix64, all in-place on `perm`
                np.add(perm, np.uint64(0x9E3779B97F4A7C15), out=perm)
                np.right_shift(perm, np.uint64(30), out=tmp)
                np.bitwise_xor(perm, tmp, out=perm)
                np.multiply(perm, np.uint64(0xBF58476D1CE4E5B9), out=perm)
                np.right_shift(perm, np.uint64(27), out=tmp)
                np.bitwise_xor(perm, tmp, out=perm)
                np.multiply(perm, np.uint64(0x94D049BB133111EB), out=perm)
                np.right_shift(perm, np.uint64(31), out=tmp)
                np.bitwise_xor(perm, tmp, out=perm)
            perm[boundary_mask] = MAX
            mins = np.minimum.reduceat(perm, starts)[:n]
            mins[empty] = MAX
            out_cols[f"{self.out_prefix}{h}"] = mins
        for name, vals in out_cols.items():
            t = t.append_column(name, pa.array(vals, pa.uint64()))
        return t


def token_minhash_pairs(
    ds,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_hashes: int = 8,
    bands: int = 4,
    ngram: int = 4,
    sig_threshold: float = 0.75,
    max_bucket: int = 512,
    max_candidates: int = 5_000_000,
):
    """Near-duplicate PAIRS over a tokens:list<int32> column.

    Two-pass candidate/verify plan (the 100-TB LSH shape):

    1. TokenMinHash (fused pass) → banded buckets; the all-to-all
       shuffle moves ONLY (band:int32, band_hash:u64, id) rows — the
       signature (num_hashes × 8 B, the dominant payload) never enters
       the shuffle. Candidate pairs come from bucket membership alone.
    2. Verify: signatures are recomputed for the candidate ids only
       (a column-pruned second scan filtered by a broadcast id set —
       candidates are rare over mostly-unique data) and the agreement
       fraction is computed vectorized. Output identical to the
       verify-in-bucket plan: a pair survives iff it shares ≥1 band
       AND full-signature agreement ≥ ``sig_threshold``.

    ``max_candidates`` bounds the broadcast candidate state with an
    explicit error (raise the threshold or pre-dedup exactly first)."""
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes
    mh = TokenMinHash(tokens_col, num_hashes=num_hashes, ngram=ngram)
    sig_cols = [f"tok_sig{h}" for h in range(num_hashes)]

    MAXU = np.iinfo(np.uint64).max

    def explode_bands(t: pa.Table) -> pa.Table:
        t = mh(t)
        # rows shorter than the shingle width carry the sentinel signature
        # (no shingles): near-dup is undefined for them, and keeping them
        # would put EVERY short row into one giant identical-sig bucket
        t = t.filter(pc.not_equal(t[sig_cols[0]], pa.scalar(MAXU, pa.uint64())))
        n = len(t)
        sig = np.stack(
            [np.asarray(t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c])
             for c in sig_cols], axis=1
        ).astype(np.uint64)
        band_hashes = np.empty((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                acc = np.zeros(n, dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = _sm64(acc ^ sig[:, b * rows_per_band + j])
                band_hashes[:, b] = acc
        ids = np.repeat(np.asarray(t[id_col]), bands)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hashes.reshape(-1), pa.uint64()),
                id_col: pa.array(ids),
            }
        )

    exploded = ds.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
        if len(g) < 2:
            return empty
        if len(g) > max_bucket:
            # degenerate bucket (many identical signatures): cap the
            # O(width²) pair fan-out to the lowest ids; capped rows can
            # still pair via their other bands
            import logging

            logging.getLogger("vector_ray.dedup").warning(
                "token LSH bucket of width %d capped to %d lowest ids "
                "(band=%s); capped rows can still pair via other bands",
                len(g), max_bucket,
                g["band"][0].as_py() if "band" in g.column_names else "?",
            )
            g = g.append_column("__ids", pc.cast(g[id_col], pa.string()))
            g = g.sort_by("__ids").slice(0, max_bucket).drop_columns(["__ids"])
        ids = np.sort(np.asarray([str(v) for v in g[id_col].to_pylist()]))
        iu = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[iu[0]], pa.string()),
                         "b": pa.array(ids[iu[1]], pa.string())})

    from vector_ray.stages.bucketed import bucketed_first, bucketed_segment_groups

    _empty_cand = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    cand = bucketed_first(
        bucketed_segment_groups(exploded, ["band", "band_hash"], candidates, _empty_cand),
        ["a", "b"],
    ).materialize()
    n_cand = cand.count()
    empty_out = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                          "est_sim": pa.array([], pa.float64())})
    if n_cand == 0:
        import ray.data as _rd

        return _rd.from_arrow(empty_out)
    if n_cand > max_candidates:
        raise ValueError(
            f"token_minhash_pairs: {n_cand} candidate pairs exceeds "
            f"max_candidates={max_candidates}; raise sig_threshold/bands "
            "or run exact dedup first"
        )
    import ray as _ray

    cand_t = _collect_arrow(cand)
    need = sorted(set(cand_t["a"].to_pylist()) | set(cand_t["b"].to_pylist()))
    need_ref = _ray.put(pa.array(need, pa.string()))

    def sigs_for_candidates(t: pa.Table) -> pa.Table:
        want = _ray.get(need_ref)
        mask = pc.is_in(pc.cast(t[id_col], pa.string()), value_set=want)
        sub = t.filter(pc.fill_null(mask, False))
        if len(sub) == 0:
            return pa.table({"id": pa.array([], pa.string()),
                             "sig": pa.array([], pa.list_(pa.uint64(), num_hashes))})
        sub = mh(sub)
        sig = np.stack(
            [np.asarray(sub[c].combine_chunks() if isinstance(sub[c], pa.ChunkedArray)
                        else sub[c]) for c in sig_cols], axis=1
        ).astype(np.uint64)
        return pa.table({
            "id": pc.cast(sub[id_col], pa.string()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), pa.uint64()), num_hashes),
        })

    sig_tbl = _collect_arrow(
        ds.map_batches(sigs_for_candidates, batch_format="pyarrow", zero_copy_batch=True)
    )
    return _verify_candidate_pairs(
        cand, sig_tbl, est_name="est_sim",
        threshold=sig_threshold, num_hashes=num_hashes,
    )


# ---------------------------------------------------------------------------
# simhash near-dup pairs — banded hamming search over the 64-bit
# signature: pigeonhole over `bands` equal bit-chunks (hamming ≤
# bands-1 ⇒ at least one chunk identical, so recall is EXACT for the
# default max_hamming=3 / bands=4). Two-pass candidate/verify like the
# minhash flavors: the shuffle moves (band, chunk, id) rows only.

_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64))
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_dup_pairs(
    ds,
    field: str = "text",
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 512,
    max_candidates: int = 2_000_000,
):
    """Pairs of docs whose SimHash signatures differ in ≤ ``max_hamming``
    bits. Exact recall requires ``max_hamming <= bands - 1``."""
    if max_hamming > bands - 1:
        import logging

        logging.getLogger("vector_ray.dedup").warning(
            "simhash_dup_pairs: max_hamming=%d > bands-1=%d — banding can "
            "miss pairs whose differing bits touch every chunk",
            max_hamming, bands - 1,
        )
    chunk_bits = 64 // bands
    mask = np.uint64((1 << chunk_bits) - 1)

    def explode(t: pa.Table) -> pa.Table:
        sig = simhash_batch(t[field])
        n = len(sig)
        chunks = np.empty((n, bands), np.uint64)
        for b in range(bands):
            chunks[:, b] = (sig >> np.uint64(chunk_bits * b)) & mask
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "chunk": pa.array(chunks.reshape(-1), pa.uint64()),
            id_col: pa.array(np.repeat(np.asarray(t[id_col]), bands)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def cand_fn(g: pa.Table) -> pa.Table:
        if len(g) > max_bucket:
            import logging

            logging.getLogger("vector_ray.dedup").warning(
                "simhash chunk bucket of width %d capped to %d lowest ids",
                len(g), max_bucket,
            )
            g = g.append_column("__ids", pc.cast(g[id_col], pa.string()))
            g = g.sort_by("__ids").slice(0, max_bucket).drop_columns(["__ids"])
        ids = np.sort(np.asarray([str(v) for v in g[id_col].to_pylist()]))
        iu = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[iu[0]], pa.string()),
                         "b": pa.array(ids[iu[1]], pa.string())})

    import ray
    import ray.data as rd

    from vector_ray.stages.bucketed import bucketed_first, bucketed_segment_groups

    _empty_cand = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    cand = bucketed_first(
        bucketed_segment_groups(exploded, ["band", "chunk"], cand_fn, _empty_cand),
        ["a", "b"],
    ).materialize()
    empty_out = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                          "hamming": pa.array([], pa.int64())})
    n_cand = cand.count()
    if n_cand == 0:
        return rd.from_arrow(empty_out)
    if n_cand > max_candidates:
        raise ValueError(
            f"simhash_dup_pairs: {n_cand} candidate pairs exceeds "
            f"max_candidates={max_candidates}; lower max_hamming or run "
            "exact dedup first"
        )
    cand_t = _collect_arrow(cand)
    need = sorted(set(cand_t["a"].to_pylist()) | set(cand_t["b"].to_pylist()))
    need_ref = ray.put(pa.array(need, pa.string()))

    def sigs_for_candidates(t: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        m = pc.is_in(pc.cast(t[id_col], pa.string()), value_set=want)
        sub = t.filter(pc.fill_null(m, False))
        if len(sub) == 0:
            return pa.table({"id": pa.array([], pa.string()),
                             "sig": pa.array([], pa.uint64())})
        return pa.table({
            "id": pc.cast(sub[id_col], pa.string()),
            "sig": pa.array(simhash_batch(sub[field]), pa.uint64()),
        })

    sig_tbl = _collect_arrow(
        ds.map_batches(sigs_for_candidates, batch_format="pyarrow", zero_copy_batch=True)
    ).sort_by("id")
    sref = ray.put(sig_tbl)

    def verify(t: pa.Table) -> pa.Table:
        st = ray.get(sref)
        ids = np.asarray(st["id"].to_pylist())
        sig = np.asarray(st["sig"])
        a = np.asarray(t["a"].to_pylist())
        b = np.asarray(t["b"].to_pylist())
        ai = np.clip(np.searchsorted(ids, a), 0, len(ids) - 1)
        bi = np.clip(np.searchsorted(ids, b), 0, len(ids) - 1)
        ok = (ids[ai] == a) & (ids[bi] == b)
        hm = _hamming64(sig[ai], sig[bi])
        keep = ok & (hm <= max_hamming)
        return pa.table({"a": pa.array(a[keep].tolist(), pa.string()),
                         "b": pa.array(b[keep].tolist(), pa.string()),
                         "hamming": pa.array(hm[keep], pa.int64())})

    return cand.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def token_minhash_dedup(
    ds,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    **pair_kw,
):
    """Remove near-duplicate token sequences: ``token_minhash_pairs``
    edges → union-find over the verified pair set (already
    ``max_candidates``-bounded, so the driver never sees more than that)
    → keep the lexicographically smallest id per duplicate cluster and
    stream-filter the rest out (broadcast drop set)."""
    import ray

    pairs = token_minhash_pairs(ds, id_col=id_col, tokens_col=tokens_col, **pair_kw)
    rows = pairs.take_all()
    if not rows:
        return ds
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = sorted(x for x in parent if find(x) != x)
    dref = ray.put(pa.array(drop, pa.string()))

    def flt(t: pa.Table) -> pa.Table:
        arr = ray.get(dref)
        return t.filter(
            pc.invert(pc.is_in(pc.cast(t[id_col], pa.string()), value_set=arr))
        )

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Persisted MinHash index — INCREMENTAL near-dup: build the index once
# over the standing corpus, probe each new crawl/shard against it
# without touching the old payloads again (the RefinedWeb-style
# "dedup new data against everything seen so far" step; the exact-
# membership analogue is ml/bloom.py, this is the near-dup one).


def _band_hash_rows(texts, ids: np.ndarray, *, num_hashes: int,
                    bands: int, k: int) -> pa.Table:
    """(band, band_hash[int64 view], id) rows — bands per doc. The
    band hash folds the signature rows with the same sm64 chain the
    in-corpus LSH uses, so an index built here buckets identically."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(texts, num_hashes=num_hashes, k=k)
    band_hashes = np.empty((len(texts), bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
        acc = np.zeros(len(texts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(rows_per_band):
                acc = _sm64(acc ^ chunk[:, j])
        band_hashes[:, b] = acc
    n = len(texts)
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        # int64 REINTERPRETATION: u64 group keys overflow Python ints
        "band_hash": pa.array(
            band_hashes.reshape(-1).view(np.int64), pa.int64()),
        "id": pa.array(np.repeat(ids, bands), pa.int64()),
    })


def minhash_index_build(
    ds,
    index_dir: str,
    *,
    field: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
) -> dict:
    """Write a near-dup index: ``buckets/`` parquet (band, band_hash,
    id — the LSH join side) and ``sigs/`` parquet (id, sig
    FixedSizeList<u64> — the verify side), plus ``params.json``. Ids
    must be int64-castable and DISJOINT from any ids probed later.
    Payloads are never stored: the index costs bands x 12 B + 8
    B x num_hashes per doc."""
    import json
    import os

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        return _band_hash_rows(t[field], ids, num_hashes=num_hashes,
                               bands=bands, k=k)

    def sigrows(t: pa.Table) -> pa.Table:
        sig = minhash_signature(t[field], num_hashes=num_hashes, k=k)
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), pa.uint64()), num_hashes),
        })

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(explode, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "buckets"))
    ds.map_batches(sigrows, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "sigs"))
    params = {"num_hashes": num_hashes, "bands": bands, "k": k}
    with open(os.path.join(index_dir, "params.json"), "w") as fh:
        json.dump(params, fh)
    return params


def minhash_index_append(
    ds,
    index_dir: str,
    *,
    field: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append new docs' band buckets + signatures to an existing index
    (parameters come from the index's ``params.json``; parquet file
    names are unique so existing files are never touched). Map-only —
    the cross-run near-dup analogue of ``state/seen.seen_index_append``:
    build once, then each ingest probes and appends. Ids must stay
    disjoint from everything already indexed."""
    import json
    import os

    with open(os.path.join(index_dir, "params.json")) as fh:
        params = json.load(fh)
    num_hashes, bands, k = (params["num_hashes"], params["bands"],
                            params["k"])

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        return _band_hash_rows(t[field], ids, num_hashes=num_hashes,
                               bands=bands, k=k)

    def sigrows(t: pa.Table) -> pa.Table:
        sig = minhash_signature(t[field], num_hashes=num_hashes, k=k)
        return pa.table({
            "id": pc.cast(t[id_col], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), pa.uint64()), num_hashes),
        })

    ds.map_batches(explode, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "buckets"))
    ds.map_batches(sigrows, batch_format="pyarrow",
                   zero_copy_batch=True).write_parquet(
        os.path.join(index_dir, "sigs"))


def minhash_index_ingest(
    ds,
    index_dir: str,
    *,
    field: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    max_bucket: int = 512,
    max_candidates: int = 5_000_000,
):
    """One near-dup ingest step: probe the batch against the index,
    drop rows whose near-dup already lives there, append the SURVIVORS'
    buckets+signatures, and return the surviving rows (materialized —
    consumed by both the append and the caller). Cross-run MinHash
    dedup with keep-first semantics, mirroring
    ``state/seen.incremental_dedupe`` for exact keys."""
    dup = minhash_index_probe(ds, index_dir, field=field, id_col=id_col,
                              jaccard_threshold=jaccard_threshold,
                              max_bucket=max_bucket,
                              max_candidates=max_candidates)
    dup_ids = dup.select_columns(["new_id"]).map_batches(
        lambda t: t.rename_columns(["__dupid"]),
        batch_format="pyarrow", zero_copy_batch=True)
    survivors = _filter_out_ids(ds, id_col, dup_ids).materialize()
    minhash_index_append(survivors, index_dir, field=field, id_col=id_col)
    return survivors


def minhash_index_probe(
    ds,
    index_dir: str,
    *,
    field: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    max_bucket: int = 512,
    max_candidates: int = 5_000_000,
):
    """Probe new docs against a persisted index: returns a Dataset
    (index_id, new_id, est_jaccard) — every (old, new) pair sharing at
    least one LSH band bucket whose signature agreement clears the
    threshold. Same two-pass candidate/verify plan as in-corpus
    minhash: the all-to-all moves only (band, band_hash, id) rows;
    signatures are fetched for candidate ids only (new side recomputed,
    old side read back from ``sigs/``). Compose with
    ``_filter_out_ids(ds, id_col, dup_new_ids)`` to drop seen docs."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "params.json")) as fh:
        params = json.load(fh)
    num_hashes, bands, k = (params["num_hashes"], params["bands"],
                            params["k"])

    def explode_new(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        out = _band_hash_rows(t[field], ids, num_hashes=num_hashes,
                              bands=bands, k=k)
        return out.append_column("side", pa.array(
            np.ones(len(out), np.int8)))

    new_rows = ds.map_batches(explode_new, batch_format="pyarrow",
                              zero_copy_batch=True)
    idx_rows = rd.read_parquet(
        os.path.join(index_dir, "buckets")).map_batches(
        lambda t: t.append_column("side", pa.array(
            np.zeros(len(t), np.int8))),
        batch_format="pyarrow", zero_copy_batch=True)
    both = new_rows.union(idx_rows)

    def cross_pairs(g: pa.Table) -> pa.Table:
        sides = np.asarray(g["side"].to_numpy(zero_copy_only=False))
        ids = np.asarray(g["id"].to_numpy(zero_copy_only=False))
        old = np.sort(ids[sides == 0])
        new = np.sort(ids[sides == 1])
        if len(old) == 0 or len(new) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        if len(old) > max_bucket or len(new) > max_bucket:
            import logging

            logging.getLogger("vector_ray.dedup").warning(
                "index-probe LSH bucket capped (old=%d new=%d cap=%d)",
                len(old), len(new), max_bucket)
            old, new = old[:max_bucket], new[:max_bucket]
        return pa.table({
            "a": pa.array(np.repeat(old, len(new)), pa.int64()),
            "b": pa.array(np.tile(new, len(old)), pa.int64()),
        })

    from vector_ray.stages.bucketed import (bucketed_first,
                                            bucketed_segment_groups)

    _empty = pa.table({"a": pa.array([], pa.int64()),
                       "b": pa.array([], pa.int64())})
    cand = bucketed_first(
        bucketed_segment_groups(both, ["band", "band_hash"], cross_pairs,
                                _empty),
        ["a", "b"]).materialize()
    n_cand = cand.count()
    empty_out = rd.from_arrow(pa.table({
        "index_id": pa.array([], pa.int64()),
        "new_id": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64())}))
    if n_cand == 0:
        return empty_out
    if n_cand > max_candidates:
        raise ValueError(
            f"minhash_index_probe: {n_cand} candidates exceed "
            f"max_candidates={max_candidates}")
    cand_t = _collect_arrow(cand)
    need_new = np.unique(np.asarray(cand_t["b"]))
    need_old = np.unique(np.asarray(cand_t["a"]))
    new_ref = ray.put(pa.array(need_new, pa.int64()))

    def sigs_for_new(t: pa.Table) -> pa.Table:
        want = ray.get(new_ref)
        mask = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=want)
        sub = t.filter(pc.fill_null(mask, False))
        if len(sub) == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "sig": pa.array([], pa.list_(pa.uint64(), num_hashes))})
        sig = minhash_signature(sub[field],
                                num_hashes=num_hashes, k=k)
        return pa.table({
            "id": pc.cast(sub[id_col], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1), pa.uint64()), num_hashes)})

    new_sigs = _collect_arrow(ds.map_batches(
        sigs_for_new, batch_format="pyarrow", zero_copy_batch=True))
    old_ref = ray.put(pa.array(need_old, pa.int64()))

    def sigs_from_index(t: pa.Table) -> pa.Table:
        want = ray.get(old_ref)
        mask = pc.is_in(t["id"], value_set=want)
        return t.filter(pc.fill_null(mask, False))

    old_sigs = _collect_arrow(rd.read_parquet(
        os.path.join(index_dir, "sigs")).map_batches(
        sigs_from_index, batch_format="pyarrow", zero_copy_batch=True))
    sig_tbl = pa.concat_tables([old_sigs, new_sigs])
    pairs = _verify_candidate_pairs(
        cand, sig_tbl, est_name="est_jaccard",
        threshold=jaccard_threshold, num_hashes=num_hashes)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["index_id", "new_id", "est_jaccard"])

    return pairs.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True)


def dedup_keep_best(
    ds,
    pairs,
    *,
    id_col: str = "doc_id",
    quality_col: str,
    prefer_max: bool = True,
    driver_pairs_cap: int = 1_000_000,
    buckets: int | None = None,
):
    """Near-dup cluster CANONICALIZATION: given a verified
    duplicate-pair edge list (``token_minhash_pairs`` /
    ``simhash_dup_pairs`` / ``embedding_dup_pairs`` output — columns
    ``(a, b)`` of stringified ids), keep exactly ONE row per duplicate
    cluster — the member with the best ``quality_col`` (max by default,
    min with ``prefer_max=False``; ties break to the smallest id
    string) — and stream-filter the rest out. Rows in no pair pass
    through untouched. This is the "keep the highest-quality member"
    refinement of keep-first dedup (the FineWeb/RefinedWeb-style rule:
    when a cluster mixes a clean page with its boilerplate-ridden
    mirrors, drop the mirrors, not whichever id sorts first).

    Scale plan: the verified pair set is tiny relative to the corpus
    (the near-dup convention — producers cap it at
    ``max_candidates``), so clustering is driver union-find when the
    edge list fits ``driver_pairs_cap``; member qualities arrive via a
    broadcast member-id set + map-only projection (only cluster
    members' (id, quality) rows leave the data — never the payload);
    the final filter is a broadcast drop-set map. Above the cap it
    composes the distributed pieces: ml/components hash-min label
    propagation, one bucketed join of the narrow (id, quality)
    projection, grouped_argmax per label, and a bucketed anti-join —
    every exchange ships ids and one float only. Null quality never
    wins (treated as worst) unless the whole cluster is null, which
    falls back to the smallest id."""
    import ray
    import ray.data as rd

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ds

    def _idq(t: pa.Table) -> pa.Table:
        return pa.table({
            "__vr_id": pc.cast(t[id_col], pa.string()),
            "__vr_q": pc.cast(t[quality_col], pa.float64()),
        })

    if n_pairs <= driver_pairs_cap:
        et = pairs.take_batch(n_pairs, batch_format="pyarrow")
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(et["a"].to_pylist(), et["b"].to_pylist()):
            ra, rb = find(str(a)), find(str(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members = sorted(set(map(str, et["a"].to_pylist()))
                         | set(map(str, et["b"].to_pylist())))
        mref = ray.put(pa.array(members, pa.string()))

        def member_rows(t: pa.Table) -> pa.Table:
            t = _idq(t)
            return t.filter(pc.is_in(t["__vr_id"],
                                     value_set=ray.get(mref)))

        mq = ds.map_batches(member_rows, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
        worst = float("-inf") if prefer_max else float("inf")
        best: dict = {}
        for r in mq:
            lbl = find(r["__vr_id"])
            q = worst if r["__vr_q"] is None else r["__vr_q"]
            cur = best.get(lbl)
            better = (cur is None
                      or (q > cur[0] if prefer_max else q < cur[0])
                      or (q == cur[0] and r["__vr_id"] < cur[1]))
            if better:
                best[lbl] = (q, r["__vr_id"])
        winners = {v[1] for v in best.values()}
        drop = sorted(m for m in members if m not in winners)
        dref = ray.put(pa.array(drop, pa.string()))

        def flt(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(
                pc.cast(t[id_col], pa.string()),
                value_set=ray.get(dref))))

        return ds.map_batches(flt, batch_format="pyarrow",
                              zero_copy_batch=True)

    # distributed path: label propagation + argmax per label
    from vector_ray.stages.aggregate import grouped_argmax, grouped_argmin
    from vector_ray.stages.join import bucketed_join

    from .components import connected_components

    comp = connected_components(pairs, a_col="a", b_col="b",
                                buckets=buckets)
    idq = ds.map_batches(_idq, batch_format="pyarrow",
                         zero_copy_batch=True)
    j = bucketed_join(idq, comp, on=["__vr_id"], right_on=["node"],
                      buckets=buckets)
    # null quality sorts last either way: substitute the worst finite
    # sentinel so argmax/argmin never pick a null over a real value
    worst = float("-inf") if prefer_max else float("inf")

    def fillq(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("__vr_q"),
                            "__vr_q",
                            pc.fill_null(t["__vr_q"], worst))

    j = j.map_batches(fillq, batch_format="pyarrow",
                      zero_copy_batch=True)
    pick = grouped_argmax if prefer_max else grouped_argmin
    winners = pick(j, ["label"], "__vr_q", tie_col="__vr_id",
                   num_buckets=buckets)
    drops = bucketed_join(
        comp, winners.map_batches(
            lambda t: t.select(["__vr_id"]), batch_format="pyarrow",
            zero_copy_batch=True),
        on=["node"], right_on=["__vr_id"], join_type="anti",
        buckets=buckets)
    keyed = ds.map_batches(
        lambda t: t.append_column("__vr_id",
                                  pc.cast(t[id_col], pa.string())),
        batch_format="pyarrow", zero_copy_batch=True)
    kept = bucketed_join(keyed, drops, on=["__vr_id"],
                         right_on=["node"], join_type="anti",
                         buckets=buckets)
    return kept.drop_columns(["__vr_id"])
