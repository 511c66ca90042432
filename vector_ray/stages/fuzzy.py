"""Blocked edit-distance (fuzzy) join — record linkage at scale.

``fuzzy_join`` pairs rows whose string keys are within Levenshtein
distance ``max_dist`` WITHOUT the all-pairs cross product, using the
PassJoin segment-pigeonhole (Li, Deng, Feng 2011 — public result): if
``edit(s, t) <= d`` and ``s`` is split into ``d+1`` contiguous
segments, at least one segment survives unchanged inside ``t``, and
its position shifts by at most ``d``. So the INDEX side emits one
(segment-hash, segment-no, source-length) key per segment and the
PROBE side emits the keys of every substring a matching segment could
occupy — O(d^2) emissions per row, never O(rows^2) work. Recall is
EXACT (hash collisions only add false candidates, which verification
removes).

100-TB plan: one all-to-all moves (key, side, id, string) emission
rows — O(d) per index row, O(d^2 (2d+1)) per probe row, nothing
quadratic; candidate generation + verification run per hash BUCKET
(``bucketed_map_groups`` — O(num_buckets) Python calls), with the
banded O(len x (2d+1)) Levenshtein DP vectorized across candidate
pairs in ``max_pairs_per_bucket``-sized chunks, so verify memory is
bounded regardless of key skew. A hot key (e.g. every value sharing a
long constant prefix) makes its bucket's candidate set quadratic —
that work is semantically REQUIRED for an exact join (pairs whose only
surviving segment is the shared prefix must be verified) and it
serializes in that bucket's task: strip constant prefixes upstream
when the data has them. No pair is ever silently dropped. Duplicate
pairs across buckets are removed by a final keep-first exact dedupe
that ships only (l_id, r_id, dist) triples.

Distances are computed over UTF-8 BYTES (code units), which equals
character edit distance for ASCII keys; document keys are compared
as-is (no normalization). Null keys never match. Ids must be
integers (the knn_graph/semantic_join hash-stability convention —
output is ids + an integer distance, no floats, no payload strings).

Reference anchor: the reference has no fuzzy join; this is part of the
"beyond the reference" curation family (SURVEY SS2) next to
ml/dedup.py's MinHash-LSH (same two-pass candidate/verify shape).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_K, _SIDE, _ID, _S = "__vr_fk", "__vr_side", "__vr_fid", "__vr_fs"


def _seg_bounds(lens: np.ndarray, i: int, d: int):
    """Canonical even partition of length-L strings into d+1 segments:
    the first L mod (d+1) segments take the ceil. Returns (start, len)
    arrays for segment ``i`` of every length in ``lens``."""
    base = lens // (d + 1)
    rem = lens % (d + 1)
    start = i * base + np.minimum(i, rem)
    seglen = base + (i < rem)
    return start, seglen


def _seg_keys(crc: np.ndarray, i: int, src_len: np.ndarray) -> np.ndarray:
    """64-bit block key over (segment content, segment no, SOURCE
    length): both sides must agree on the index-string length the
    partition was derived from. Assumes lengths < 2^20 bytes."""
    from vector_ray.sources.synth import _splitmix64

    x = (
        crc.astype(np.uint64)
        | (np.uint64(i) << np.uint64(40))
        | (src_len.astype(np.uint64) << np.uint64(44))
    )
    return _splitmix64(x)


def _emit(t: pa.Table, on: str, id_col: str, d: int, side: int,
          probe: bool) -> pa.Table:
    """Emission rows (key, side, id, string) for one batch. Index rows
    emit d+1 segment keys; probe rows emit every (source-length,
    segment, +-d shift) substring key a matching segment could occupy.
    Per-row duplicate keys are dropped before the shuffle."""
    from vector_ray.expr.kernels import _flat_utf8
    from vector_ray.ml.dedup import _crc32_words

    t = t.filter(pc.is_valid(t[on]))
    if len(t) == 0:
        return pa.table({
            _K: pa.array([], pa.uint64()),
            _SIDE: pa.array([], pa.int8()),
            _ID: pa.array([], pa.int64()),
            _S: pa.array([], pa.string()),
        })
    arr = t[on].combine_chunks() if isinstance(t[on], pa.ChunkedArray) \
        else t[on]
    arr, flat, offs = _flat_utf8(arr)
    starts, lens = offs[:-1], np.diff(offs)
    n = len(lens)
    rows, keys = [], []
    if not probe:
        for i in range(d + 1):
            st, sl = _seg_bounds(lens, i, d)
            crc = _crc32_words(flat, starts + st, sl)
            keys.append(_seg_keys(crc, i, lens))
            rows.append(np.arange(n, dtype=np.int64))
    else:
        for dl in range(-d, d + 1):
            src_len = lens + dl
            ok_len = src_len >= 0
            for i in range(d + 1):
                st, sl = _seg_bounds(np.maximum(src_len, 0), i, d)
                # zero-length segments are position-free: one emission
                # iff ANY valid position exists (st - d <= len)
                zi = np.flatnonzero(ok_len & (sl == 0) & (st - d <= lens))
                if len(zi):
                    keys.append(_seg_keys(
                        np.zeros(len(zi), np.uint32), i, src_len[zi]))
                    rows.append(zi)
                for shift in range(-d, d + 1):
                    p = st + shift
                    idx = np.flatnonzero(
                        ok_len & (sl > 0) & (p >= 0) & (p + sl <= lens))
                    if len(idx) == 0:
                        continue
                    crc = _crc32_words(flat, (starts + p)[idx], sl[idx])
                    keys.append(_seg_keys(crc, i, src_len[idx]))
                    rows.append(idx)
    key = np.concatenate(keys) if keys else np.empty(0, np.uint64)
    row = np.concatenate(rows) if rows else np.empty(0, np.int64)
    # drop duplicate (row, key) emissions (shifted substrings coincide)
    uniq = np.unique(np.stack([row.astype(np.uint64), key], 1), axis=0)
    row, key = uniq[:, 0].astype(np.int64), uniq[:, 1]
    take = pa.array(row, pa.int64())
    return pa.table({
        _K: pa.array(key, pa.uint64()),
        _SIDE: pa.array(np.full(len(row), side, np.int8)),
        _ID: pc.cast(t[id_col].combine_chunks().take(take), pa.int64()),
        _S: arr.take(take),
    })


def _edit_band(aflat, astarts, alens, bflat, bstarts, blens,
               d: int) -> np.ndarray:
    """Banded Levenshtein distance, vectorized across pairs: returns
    int32 distances with d+1 meaning "> d" (values saturate at d+1).
    O(max_len x (2d+1)) numpy steps, each over every pair at once."""
    n = len(astarts)
    if n == 0:
        return np.empty(0, np.int32)
    inf = np.int32(d + 1)
    w = 2 * d + 1
    max_la, max_lb = int(alens.max()), int(blens.max())
    # padded 2-D byte matrices (pairs x len) via one fancy gather each
    ar = np.arange(max(max_la, 1), dtype=np.int64)
    a2 = aflat[np.minimum(astarts[:, None] + ar[None, :],
                          len(aflat) - 1)] if len(aflat) else \
        np.zeros((n, max(max_la, 1)), np.uint8)
    br = np.arange(max(max_lb, 1), dtype=np.int64)
    b2 = bflat[np.minimum(bstarts[:, None] + br[None, :],
                          len(bflat) - 1)] if len(bflat) else \
        np.zeros((n, max(max_lb, 1)), np.uint8)

    cur = np.empty((n, w), np.int32)
    for off in range(w):
        j = off - d
        cur[:, off] = j if j >= 0 else inf
        if j >= 0:
            cur[:, off] = np.where(j <= blens, np.int32(j), inf)
    la = alens.astype(np.int64)
    lb = blens.astype(np.int64)
    for i in range(1, max_la + 1):
        prev = cur
        cur = np.full((n, w), inf, np.int32)
        active = i <= la
        achar = a2[:, i - 1] if i - 1 < a2.shape[1] else \
            np.zeros(n, np.uint8)
        for off in range(w):
            j = i + off - d
            if j < 0:
                continue
            jv = np.int64(j)
            valid = active & (jv <= lb)
            if j == 0:
                val = np.full(n, min(i, d + 1), np.int32)
            else:
                bchar = b2[:, j - 1] if j - 1 < b2.shape[1] else \
                    np.zeros(n, np.uint8)
                sub = prev[:, off] + (achar != bchar)
                dele = (prev[:, off + 1] + 1) if off + 1 < w else \
                    np.full(n, inf)
                ins = (cur[:, off - 1] + 1) if off >= 1 else \
                    np.full(n, inf)
                val = np.minimum(np.minimum(sub, dele), ins)
            cur[:, off] = np.where(valid, np.minimum(val, inf),
                                   np.where(active, inf, prev[:, off]))
        # frozen pairs (i > la) keep their final row verbatim
        cur = np.where(active[:, None], cur, prev)
    diag = lb - la + d
    ok = (diag >= 0) & (diag < w)
    out = np.full(n, inf, np.int32)
    idx = np.flatnonzero(ok)
    out[idx] = cur[idx, diag[idx]]
    return out


def fuzzy_join(
    left,
    right=None,
    *,
    on: str,
    right_on: Optional[str] = None,
    id_col: str,
    right_id_col: Optional[str] = None,
    max_dist: int = 1,
    num_buckets: Optional[int] = None,
    max_pairs_per_bucket: int = 1_000_000,
):
    """Exact Levenshtein-threshold join. Returns a Dataset of
    (l_id, r_id, dist) triples with ``dist <= max_dist``. When
    ``right`` is None the join is a SELF join and emits each unordered
    pair once with ``l_id < r_id`` (self-pairs dropped)."""
    if max_dist < 0:
        raise ValueError("fuzzy_join: max_dist must be >= 0")
    d = int(max_dist)
    self_join = right is None
    r_on = right_on or on
    r_id = right_id_col or id_col

    if self_join:
        def both(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                _emit(t, on, id_col, d, 0, probe=False),
                _emit(t, on, id_col, d, 1, probe=True),
            ]).combine_chunks()

        emitted = left.map_batches(both, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        le = left.map_batches(
            lambda t: _emit(t, on, id_col, d, 0, probe=False),
            batch_format="pyarrow", zero_copy_batch=True)
        re = right.map_batches(
            lambda t: _emit(t, r_on, r_id, d, 1, probe=True),
            batch_format="pyarrow", zero_copy_batch=True)
        emitted = le.union(re)

    from vector_ray.expr.kernels import _flat_utf8
    from vector_ray.stages.bucketed import bucketed_first, bucketed_map_groups

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "l_id": pa.array([], pa.int64()),
            "r_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })
        if len(g) == 0:
            return empty
        gs = g.sort_by([(_K, "ascending"), (_SIDE, "ascending")])
        k = gs[_K].to_numpy(zero_copy_only=False)
        side = gs[_SIDE].to_numpy(zero_copy_only=False)
        ids = gs[_ID].to_numpy(zero_copy_only=False)
        run_start = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        run_end = np.append(run_start[1:], len(k))
        # within each equal-key run: side-0 rows lead (sorted), then
        # side-1 — the cross product is the candidate set
        split = run_start + np.add.reduceat(
            (side == 0).astype(np.int64), run_start)
        lcnt = split - run_start
        rcnt = run_end - split
        npair = lcnt * rcnt
        total = int(npair.sum())
        if total == 0:
            return empty
        runs = np.repeat(np.arange(len(npair)), npair)
        cum = np.zeros(len(npair), np.int64)
        np.cumsum(npair[:-1], out=cum[1:])
        o = np.arange(total, dtype=np.int64) - cum[runs]
        li = run_start[runs] + o // rcnt[runs]
        ri = split[runs] + o % rcnt[runs]
        lid, rid = ids[li], ids[ri]
        if self_join:
            keep = lid != rid
            swap = lid > rid
            li2 = np.where(swap, ri, li)
            ri2 = np.where(swap, li, ri)
            li, ri = li2[keep], ri2[keep]
            lid, rid = ids[li], ids[ri]
            if len(li) == 0:
                return empty
        pairkey = np.stack([lid, rid], 1)
        _, first = np.unique(pairkey, axis=0, return_index=True)
        li, ri = li[first], ri[first]
        arr, flat, offs = _flat_utf8(gs[_S])
        st, ln = offs[:-1], np.diff(offs)
        # length filter before the DP: |len diff| > d can never match
        lenok = np.abs(ln[li] - ln[ri]) <= d
        li, ri = li[lenok], ri[lenok]
        # verify in memory-bounded chunks: the DP's (pairs x len) byte
        # matrices are the only super-linear allocation — a hot key
        # (shared-prefix data) serializes its verification here but
        # never loses pairs (exact join, no truncation)
        parts = []
        step = max(int(max_pairs_per_bucket), 1)
        for lo in range(0, len(li), step):
            cl, cr = li[lo:lo + step], ri[lo:lo + step]
            dist = _edit_band(flat, st[cl], ln[cl], flat, st[cr],
                              ln[cr], d)
            hit = np.flatnonzero(dist <= d)
            if len(hit):
                parts.append(pa.table({
                    "l_id": pa.array(ids[cl][hit], pa.int64()),
                    "r_id": pa.array(ids[cr][hit], pa.int64()),
                    "dist": pa.array(dist[hit].astype(np.int64),
                                     pa.int64()),
                }))
        if not parts:
            return empty
        return pa.concat_tables(parts).combine_chunks()

    pairs = bucketed_map_groups(emitted, [_K], verify,
                                num_buckets=num_buckets)
    # the same pair can surface from different segment keys in
    # DIFFERENT buckets — one exact keep-first pass on the narrow
    # (l_id, r_id) triples removes cross-bucket duplicates
    return bucketed_first(pairs, ["l_id", "r_id"])


def resolve_entities(
    ds,
    *,
    on: str,
    id_col: str,
    max_dist: int = 1,
    num_buckets: Optional[int] = None,
    max_pairs_per_bucket: int = 1_000_000,
    driver_pairs_cap: int = 1_000_000,
):
    """Entity resolution: rows whose keys are transitively within
    ``max_dist`` edits collapse to one canonical id (the component
    MINIMUM). Returns a Dataset of (id_col, canonical) — singletons
    map to themselves; null keys are singletons.

    Composition of scale-safe stages: the exact blocked
    :func:`fuzzy_join` (self mode) produces the duplicate-pair edge
    list; clustering runs driver-side union-find when the edge list
    fits ``driver_pairs_cap`` (the ml/dedup near-dup convention —
    verified pairs are tiny relative to the corpus) and otherwise
    hash-min label propagation (ml/components, pointer-jumping,
    O(log diameter) rounds over (node, label) pairs); one bucketed
    left join maps every input id to its component label, defaulting
    to itself. Only ids and labels move after the fuzzy join — never
    the key strings.
    """
    pairs = fuzzy_join(ds, on=on, id_col=id_col, max_dist=max_dist,
                       num_buckets=num_buckets,
                       max_pairs_per_bucket=max_pairs_per_bucket)
    from vector_ray.stages.join import bucketed_join

    # bounded driver fast path (the ml/dedup near-dup convention: the
    # VERIFIED pair set is usually tiny relative to the corpus) —
    # union-find locally when the edge list fits, else the distributed
    # O(log diameter) label-propagation rounds
    pairs = pairs.materialize()
    if pairs.count() <= driver_pairs_cap:
        import ray.data as rd

        et = pairs.take_batch(driver_pairs_cap + 1,
                              batch_format="pyarrow") \
            if pairs.count() else None
        if et is None:
            comp = rd.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64())}))
        else:
            parent = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for a, b in zip(et["l_id"].to_pylist(),
                            et["r_id"].to_pylist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            nodes = sorted(set(et["l_id"].to_pylist())
                           | set(et["r_id"].to_pylist()))
            comp = rd.from_arrow(pa.table({
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array([find(n) for n in nodes],
                                  pa.int64())}))
    else:
        from vector_ray.ml.components import connected_components

        comp = connected_components(pairs, a_col="l_id", b_col="r_id")

    def ids_only(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pc.cast(t[id_col], pa.int64())})

    ids = ds.map_batches(ids_only, batch_format="pyarrow",
                         zero_copy_batch=True)
    joined = bucketed_join(ids, comp, [id_col], join_type="left outer",
                           right_on=["node"])

    def finish(t: pa.Table) -> pa.Table:
        canon = pc.coalesce(pc.cast(t["label"], pa.int64()),
                            t[id_col])
        return pa.table({id_col: t[id_col], "canonical": canon})

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
