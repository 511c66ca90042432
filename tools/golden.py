"""Golden-value oracles for queries whose semantics are not expressible
in DuckDB SQL (custom sketches / signature pipelines).

Each function here is an INDEPENDENT re-implementation of the
corresponding operator's documented spec — straightforward
per-row/per-doc code written against the hash-function definitions
(FNV-1a, splitmix64, the fused window-hash kernel contract in
vector_ray/native.py, the HLL estimator of stages/sketch.py's
docstring) — sharing no vectorized/C code paths with the engine. The
results are rendered as a `SELECT * FROM (VALUES ...)` SQL literal that
the driver's DuckDB oracle runner can execute; a hash match then means
the engine's batch/C implementation agrees with a simple single-threaded
reference on the same inputs.

The driver runs correctness at sf=0.01; golden oracles read the same
parquet (env VR_ORACLE_SF_DIR overrides, default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import re
import zlib

import numpy as np
import pyarrow.parquet as pq

M64 = (1 << 64) - 1
GOLD = 0x9E3779B97F4A7C15
FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def sf_dir() -> str:
    return os.environ.get("VR_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def sm64_int(x: int) -> int:
    """splitmix64 finalizer, pure-python ints."""
    x = (x + GOLD) & M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & M64
    x ^= x >> 31
    return x


def sm64_np(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(GOLD)
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def fnv1a_int(s: str) -> int:
    h = FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * FNV_PRIME) & M64
    return h


def salted_int(i, seed: int) -> int:
    """sm64(fnv1a("id|seed")) — mirrors ml/sampling._salted_hash. The
    sm64 finalizer is load-bearing: without it a seed suffix only
    perturbs the FNV hash by O(prime), so orderings barely change
    across seeds."""
    return sm64_int(fnv1a_int(f"{i}|{seed}"))


def _values_sql(rows: list, cols: list[str], types: list[str]) -> str:
    """Render rows as a DuckDB VALUES literal."""
    def lit(v, ty):
        if v is None:
            return f"CAST(NULL AS {ty})"
        if ty == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        if ty == "DOUBLE":
            # string-literal cast: a bare decimal literal in a VALUES
            # list unifies to DECIMAL across rows first and the
            # DECIMAL->DOUBLE conversion can be off by an ulp; the
            # string->double parse is correctly rounded
            return f"CAST('{repr(float(v))}' AS DOUBLE)"
        return f"{int(v)}::{ty}"

    body = ", ".join(
        "(" + ", ".join(lit(v, t) for v, t in zip(r, types)) + ")" for r in rows
    )
    names = ", ".join(cols)
    return f"SELECT * FROM (VALUES {body}) AS t({names})"


# ---------------------------------------------------------------------------
# simhash_docs — per-word crc32 → splitmix64 → majority bit vote


def simhash_docs_sql() -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    word_re = re.compile(r"\w+")
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        words = word_re.findall((text or "").lower())
        val = 0
        if words:
            votes = [0] * 64
            for w in words:
                h = sm64_int((zlib.crc32(w.encode()) ^ 1) & M64)
                for b in range(64):
                    votes[b] += (h >> b) & 1
            n = len(words)
            for b in range(64):
                if 2 * votes[b] > n:
                    val |= 1 << b
        signed = val - (1 << 64) if val >= (1 << 63) else val
        rows.append((doc_id, signed))
    return _values_sql(rows, ["doc_id", "simhash"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# fused window-hash MinHash (the native.py kernel contract):
#   w_i = v_i ^ XOR_{j=1..k-1} v_{i+j} * (GOLD*(j+1) mod 2^64)
#   sig[h] = min_i splitmix64(w_i ^ seed_h); rows with < k values → MAX


def _window_sig(vals: np.ndarray, k: int, seeds: np.ndarray) -> np.ndarray:
    n = len(vals)
    if n < k:
        return np.full(len(seeds), U64MAX, np.uint64)
    v = np.asarray(vals, np.uint64)
    with np.errstate(over="ignore"):
        w = v[: n - k + 1].copy()
        for j in range(1, k):
            w ^= v[j : n - k + 1 + j] * np.uint64((GOLD * (j + 1)) & M64)
    sig = np.empty(len(seeds), np.uint64)
    for h, s in enumerate(seeds):
        sig[h] = sm64_np(w ^ np.uint64(s)).min()
    return sig


def _band_hash(sig: np.ndarray, band: int, rows_per_band: int) -> int:
    acc = 0
    for j in range(rows_per_band):
        acc = sm64_int((acc ^ int(sig[band * rows_per_band + j])) & M64)
    return acc


def _lsh_pairs(ids: list, sigs: list, *, bands: int, num_hashes: int,
               threshold: float, max_bucket: int = 512) -> list:
    rows_per_band = num_hashes // bands
    buckets: dict = {}
    for i in range(len(ids)):
        for b in range(bands):
            buckets.setdefault((b, _band_hash(sigs[i], b, rows_per_band)), []).append(i)
    seen: dict = {}
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda i: ids[i])
        if len(members) > max_bucket:
            members = members[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    key = (ids[i], ids[j])
                    if key not in seen:
                        seen[key] = est
    return [(a, b, est) for (a, b), est in seen.items()]


def minhash_pairs_sql() -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    seeds = [(1 * 1_000_003 + h * 2_654_435_761) & M64 for h in range(64)]
    ids, sigs = [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        buf = np.frombuffer((text or "").lower().encode("utf-8", "ignore"), np.uint8)
        ids.append(int(doc_id))
        sigs.append(_window_sig(buf, 5, np.array(seeds, np.uint64)))
    rows = _lsh_pairs(ids, sigs, bands=16, num_hashes=64, threshold=0.7)
    return _values_sql(rows, ["a", "b", "est_jaccard"], ["BIGINT", "BIGINT", "DOUBLE"])


def token_near_dup_sql() -> str:
    # same input construction as q_token_near_dup (synth is the INPUT,
    # not the operator under test)
    import pyarrow as pa

    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table({
        "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
        "tokens": t["tokens"].slice(0, 100).combine_chunks(),
        "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
        "source": t["source"].slice(0, 100).combine_chunks(),
    })
    full = pa.concat_tables([t, dup])
    seeds = [(17 + h * 2_654_435_761) & M64 for h in range(8)]
    ids, sigs = [], []
    for doc_id, toks in zip(full["doc_id"].to_pylist(), full["tokens"].to_pylist()):
        v = np.asarray(toks, np.int64).astype(np.uint32).astype(np.uint64)
        sig = _window_sig(v, 4, np.array(seeds, np.uint64))
        if sig[0] == U64MAX:  # sentinel rows (too short) are filtered
            continue
        ids.append(str(doc_id))
        sigs.append(sig)
    rows = _lsh_pairs(ids, sigs, bands=4, num_hashes=8, threshold=0.75)
    return _values_sql(rows, ["a", "b", "est_sim"], ["VARCHAR", "VARCHAR", "DOUBLE"])


# ---------------------------------------------------------------------------
# approx_distinct_users — HLL p=12, FNV-1a(decimal) → splitmix64


def approx_distinct_users_sql() -> str:
    import math

    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["event_type", "user_id"])
    p, m = 12, 1 << 12
    regs: dict = {}
    for et, uid in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        if uid is None:
            continue
        r = regs.setdefault(et, [0] * m)
        h = sm64_int(fnv1a_int(str(uid)))
        idx = h >> (64 - p)
        rest = ((h << p) | ((1 << p) - 1)) & M64
        # rank = leading zeros + 1 over the 64-bit value
        rank = 65 - rest.bit_length()
        if rank > r[idx]:
            r[idx] = min(rank, 255)
    alpha = 0.7213 / (1 + 1.079 / m)
    rows = []
    for et in sorted(regs):
        r = regs[et]
        est = alpha * m * m / sum(2.0 ** -x for x in r)
        if est <= 2.5 * m:
            zeros = r.count(0)
            if zeros:
                est = m * math.log(m / zeros)
        rows.append((et, int(round(est))))
    return _values_sql(rows, ["event_type", "approx_users"], ["VARCHAR", "BIGINT"])


# ---------------------------------------------------------------------------
# media_features — synth spec + byte-histogram features, re-derived


def media_features_sql() -> str:
    n, seed, payload_bytes = 200, 21, 256
    kinds = ["image/jpeg", "audio/wav", "video/mp4"]
    rows = []
    for i in range(n):
        h = sm64_int(i ^ seed)
        rng = np.random.default_rng(h)
        payload = rng.integers(0, 256, payload_bytes, dtype=np.uint8)
        counts = np.bincount(payload >> 5, minlength=8)
        feats = (counts / payload_bytes).astype(np.float32).astype(np.float64)
        rows.append((f"m-{i:06d}", kinds[h % 3], *[float(f) for f in feats]))
    cols = ["media_id", "media_type"] + [f"f{j}" for j in range(8)]
    types = ["VARCHAR", "VARCHAR"] + ["DOUBLE"] * 8
    return _values_sql(rows, cols, types)


# ---------------------------------------------------------------------------
# config_syslog_metrics — independent single-threaded reimplementation of
# the examples/syslog_metrics.yaml topology over the deterministic
# generator: 20000 syslog lines → parse → log_to_metric (row counter
# tagged by host/status + set of procids) → aggregate by (host, status).


def config_syslog_metrics_sql() -> str:
    n = 20000
    hosts_tab = ["alpha", "bravo", "citrus", "delta", "ember", "fjord", "gale", "hazel"]
    statuses = [200, 200, 200, 301, 404, 500, 503]
    counts: dict = {}
    procids: set = set()
    for i in range(n):
        h = sm64_int(i ^ 42)
        host = hosts_tab[h % 8]
        status = statuses[(h >> 8) % 7]
        counts[(host, str(status))] = counts.get((host, str(status)), 0) + 1
        procids.add(str(100 + i % 900))
    rows = [
        ("requests", "counter", host, status, float(c))
        for (host, status), c in sorted(counts.items())
    ]
    rows.append(("apps_seen", "set", None, None, float(len(procids))))
    return _values_sql(
        rows,
        ["name", "metric_type", "host", "status", "value"],
        ["VARCHAR", "VARCHAR", "VARCHAR", "VARCHAR", "DOUBLE"],
    )


# ---------------------------------------------------------------------------
# simhash_pairs — brute-force hamming ≤ 3 over documents + 50 planted
# exact duplicates, using this module's OWN simhash reimplementation
# (per-word crc32 → splitmix64 → majority vote; proven bit-identical to
# the engine by simhash_docs). Banding with 4×16-bit chunks has exact
# recall at hamming ≤ 3 (pigeonhole), so brute force IS the truth.


def _simhash_golden(text: str) -> int:
    word_re = re.compile(r"\w+")
    words = word_re.findall((text or "").lower())
    if not words:
        return 0
    votes = [0] * 64
    for w in words:
        h = sm64_int((zlib.crc32(w.encode()) ^ 1) & M64)
        for b in range(64):
            votes[b] += (h >> b) & 1
    n = len(words)
    val = 0
    for b in range(64):
        if 2 * votes[b] > n:
            val |= 1 << b
    return val


def simhash_pairs_sql() -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = [str(x) for x in t["doc_id"].to_pylist()]
    texts = t["text"].to_pylist()
    ids += [f"shdup-{i:04d}" for i in range(50)]
    texts += texts[:50]
    sigs = np.array([_simhash_golden(x) for x in texts], dtype=np.uint64)
    pop = np.array([bin(i).count("1") for i in range(256)], np.uint8)
    rows = []
    n = len(sigs)
    order = np.arange(n)
    for i in range(n):
        d = (sigs ^ sigs[i]).view(np.uint8).reshape(n, 8)
        hm = pop[d].sum(axis=1)
        for j in np.nonzero((hm <= 3) & (order > i))[0]:
            a, b = sorted((ids[i], ids[int(j)]))
            rows.append((a, b, int(hm[int(j)])))
    rows.sort()
    return _values_sql(rows, ["a", "b", "hamming"], ["VARCHAR", "VARCHAR", "BIGINT"])


# ---------------------------------------------------------------------------
# pack_sequences — independent greedy first-fit reimplementation
# (plain row loop; the engine under test uses searchsorted jumps)


def pack_sequences_sql(n_rows: int = 4000, seed: int = 11, max_len: int = 2048,
                       num_shards: int = 8) -> str:
    from vector_ray.sources.synth import synth_table

    t = synth_table(n_rows, seed=seed)
    src = t["source"].to_pylist()
    docs = t["doc_id"].to_pylist()
    ntoks = t["n_tok"].to_pylist()
    recs = sorted(
        (s, fnv1a_int(str(d)) % num_shards, str(d), int(nt))
        for s, d, nt in zip(src, docs, ntoks)
    )
    out = []
    i = 0
    while i < len(recs):
        s, sh = recs[i][0], recs[i][1]
        pid = 0
        while i < len(recs) and recs[i][0] == s and recs[i][1] == sh:
            first = recs[i][2]
            tot = recs[i][3]
            nseq = 1
            i += 1
            while (i < len(recs) and recs[i][0] == s and recs[i][1] == sh
                   and tot + recs[i][3] <= max_len):
                tot += recs[i][3]
                nseq += 1
                i += 1
            out.append((s, sh, pid, nseq, tot, first, recs[i - 1][2]))
            pid += 1
    return _values_sql(
        out,
        ["source", "shard", "pack_id", "n_seqs", "n_tok", "doc_first", "doc_last"],
        ["VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BIGINT", "VARCHAR", "VARCHAR"],
    )


# ---------------------------------------------------------------------------
# token_dedup_collapse — pairs (as token_near_dup) → union-find →
# survivors; independent single-threaded reimplementation


def token_dedup_collapse_sql() -> str:
    import pyarrow as pa

    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table({
        "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
        "tokens": t["tokens"].slice(0, 100).combine_chunks(),
        "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
        "source": t["source"].slice(0, 100).combine_chunks(),
    })
    full = pa.concat_tables([t, dup])
    seeds = [(17 + h * 2_654_435_761) & M64 for h in range(8)]
    ids, sigs = [], []
    for doc_id, toks in zip(full["doc_id"].to_pylist(), full["tokens"].to_pylist()):
        v = np.asarray(toks, np.int64).astype(np.uint32).astype(np.uint64)
        sig = _window_sig(v, 4, np.array(seeds, np.uint64))
        if sig[0] == U64MAX:
            continue
        ids.append(str(doc_id))
        sigs.append(sig)
    pairs = _lsh_pairs(ids, sigs, bands=4, num_hashes=8, threshold=0.75)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}
    kept = [
        (str(d), int(nt))
        for d, nt in zip(full["doc_id"].to_pylist(), full["n_tok"].to_pylist())
        if str(d) not in drop
    ]
    return _values_sql(kept, ["doc_id", "n_tok"], ["VARCHAR", "BIGINT"])


# ---------------------------------------------------------------------------
# sampling / mixture operators (ml/sampling.py) — pure-Python FNV-1a
# over "id|seed", independent of the vectorized kernel


def _docs_id_source():
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "source"])
    return list(zip(t["doc_id"].to_pylist(), t["source"].to_pylist()))


def mixture_sample_sql(rates: dict, default_rate: float, seed: int) -> str:
    scale = 1_000_000
    rows = [
        (i, s)
        for i, s in _docs_id_source()
        if salted_int(i, seed) % scale
        < int(round(rates.get(s, default_rate) * scale))
    ]
    return _values_sql(rows, ["doc_id", "source"], ["BIGINT", "VARCHAR"])


def per_key_cap_sql(k: int, seed: int) -> str:
    per: dict = {}
    for i, s in _docs_id_source():
        per.setdefault(s, []).append((salted_int(i, seed), i))
    rows = []
    for s in sorted(per):
        for _, i in sorted(per[s])[:k]:
            rows.append((i, s))
    return _values_sql(rows, ["doc_id", "source"], ["BIGINT", "VARCHAR"])


def uniform_sample_k_sql(k: int, seed: int) -> str:
    """Global bottom-k of sm64(fnv1a(id|seed)) — mirrors
    ml/sampling.uniform_sample_k (k smallest salted hashes, ties by id)."""
    ranked = sorted((salted_int(i, seed), i, s) for i, s in _docs_id_source())
    rows = [(i, s) for _, i, s in ranked[:k]]
    return _values_sql(rows, ["doc_id", "source"], ["BIGINT", "VARCHAR"])


def strip_dup_passages_sql(parquet_path: str, n: int = 16,
                           min_docs: int = 2) -> str:
    """Single-threaded reference for ml/tokens.py strip_dup_passages:
    brute-force window hashes, coverage by interval union, per-row
    polynomial checksum of the stripped sequence (mod 2^64, rendered
    as the int64 bit pattern)."""
    t = pq.read_table(parquet_path, columns=["doc_id", "tokens"])
    ids = t["doc_id"].to_pylist()
    docs = t["tokens"].to_pylist()
    P = 0x100000001B3
    M = (1 << 64) - 1

    def whashes(d):
        out = []
        for s0 in range(max(0, len(d) - n + 1)):
            h = 0
            for j in range(n):
                h = (h * P + (d[s0 + j] & M)) & M
            out.append(h)
        return out

    from collections import Counter
    cnt = Counter()
    per_doc = [whashes(d) for d in docs]
    for ws in per_doc:
        for x in set(ws):
            cnt[x] += 1
    dups = {x for x, c in cnt.items() if c >= min_docs}
    rows = []
    for i, d in enumerate(docs):
        cov = [False] * len(d)
        for s0, h in enumerate(per_doc[i]):
            if h in dups:
                for j in range(s0, s0 + n):
                    cov[j] = True
        kept = [v for v, c in zip(d, cov) if not c]
        tok_hash = 0
        for v in kept:
            tok_hash = (tok_hash * P + (v & M)) & M
        if tok_hash >= 1 << 63:
            tok_hash -= 1 << 64
        rows.append((ids[i], len(kept), len(d) - len(kept), tok_hash))
    return _values_sql(rows, ["doc_id", "n_tok", "n_removed", "tok_hash"],
                       ["VARCHAR", "BIGINT", "BIGINT", "BIGINT"])


def tfidf_sql() -> str:
    """Single-threaded TF-IDF reference (ml/corpus.py tfidf_score):
    integer micro-idf sums over word positions; float mean derived
    last with the same double ops as the engine."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    docs = [(i, (txt or "").split())
            for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())]
    n = len(docs)
    df: dict = {}
    for _, ws in docs:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    # idf through the same ARRAY np.log as the engine: numpy's SIMD
    # log over arrays is not bit-identical to its scalar path
    ws_sorted = sorted(df)
    dfa = np.array([df[w] for w in ws_sorted], np.int64)
    idfa = np.round(1e6 * np.log((n + 1) / (dfa + 1.0))).astype(np.int64)
    idf = {w: int(v) for w, v in zip(ws_sorted, idfa)}
    rows = []
    for i, ws in docs:
        micro = sum(idf[w] for w in ws)
        nw = len(ws)
        mean = micro / nw / 1e6 if nw else None
        rows.append((i, nw, micro, mean))
    return _values_sql(rows, ["doc_id", "n_words", "tfidf_micro", "tfidf"],
                       ["BIGINT", "BIGINT", "BIGINT", "DOUBLE"])


def token_budget_cap_sql(budget: int, seed: int) -> str:
    """Strict-prefix per-key budget (ml/sampling.py token_budget_cap):
    per source, in (fnv1a(doc_id|seed), doc_id) order, keep rows while
    the inclusive n_chars prefix sum stays <= budget."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "source", "n_chars"])
    per: dict = {}
    for i, s, w in zip(t["doc_id"].to_pylist(), t["source"].to_pylist(),
                       t["n_chars"].to_pylist()):
        per.setdefault(s, []).append((salted_int(i, seed), i, int(w)))
    rows = []
    for s in sorted(per):
        tot = 0
        for _, i, w in sorted(per[s]):
            tot += w
            if tot > budget:
                break
            rows.append((i, s, w))
    return _values_sql(rows, ["doc_id", "source", "n_chars"],
                       ["BIGINT", "VARCHAR", "BIGINT"])


def shuffle_order_sql(seed: int, limit: int) -> str:
    order = sorted(
        (salted_int(i, seed), i) for i, _ in _docs_id_source()
    )[:limit]
    rows = [(pos, i) for pos, (_, i) in enumerate(order)]
    return _values_sql(rows, ["pos", "doc_id"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# semantic_dedup (ml/semdedup.py) — single-threaded SemDeDup reference:
# normalize, driver-style Lloyd k-means on the full (sub-cap) table,
# float64 argmax assignment, ascending-id greedy leader per cluster.
# Planted copies (vec_id < 25 re-appended as +10000) are the expected
# drops; the base table's max off-diagonal cosine is ~0.51 << tau.


def semantic_dedup_sql(tau: float = 0.9, n_clusters: int = 8,
                       iters: int = 10, seed: int = 5) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    base_ids = t["vec_id"].to_pylist()
    base_m = np.array(t["embedding"].to_pylist(), np.float32)
    planted = [i for i in base_ids if i < 25]
    ids = np.array(base_ids + [i + 10_000 for i in planted], np.int64)
    m = np.concatenate([base_m, base_m[[base_ids.index(i) for i in planted]]])

    x = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            mem = x[assign == c]
            if len(mem):
                v = mem.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)

    a = np.argmax(x.astype(np.float64) @ cent.T.astype(np.float64), axis=1)

    def greedy(mat: np.ndarray, chunk: int = 256) -> np.ndarray:
        w = len(mat)
        keep = np.zeros(w, bool)
        kept = np.empty((0, mat.shape[1]), mat.dtype)
        for s in range(0, w, chunk):
            c = mat[s:s + chunk]
            vs = (c @ kept.T).max(axis=1) if len(kept) else np.full(
                len(c), -2.0, np.float32)
            g = c @ c.T
            loc = []
            for i in range(len(c)):
                smax = vs[i]
                if loc:
                    smax = max(smax, g[i, loc].max())
                if smax < tau:
                    keep[s + i] = True
                    loc.append(i)
            kept = np.concatenate([kept, c[loc]]) if loc else kept
        return keep

    keep = np.ones(len(ids), bool)
    for c in np.unique(a):
        sel = np.nonzero(a == c)[0]
        order = sel[np.argsort(ids[sel], kind="stable")]
        if len(order) >= 2:
            keep[order] = greedy(x[order])
    rows = [(int(i), bool(k)) for i, k in zip(ids, keep)]
    return _values_sql(rows, ["vec_id", "keep"], ["BIGINT", "BOOLEAN"])


# ---------------------------------------------------------------------------
# lm_perplexity (ml/lm_score.py) — single-threaded char-trigram LM:
# same 33-symbol byte-class spec, FNV id-hash sample, add-alpha
# smoothing, integer micro-nat log-probs; per-doc NLL is an exact
# integer sum so ordering/partitioning can't perturb it.


def lm_perplexity_sql(sample_mod: int = 4, alpha: float = 0.5) -> str:
    V = 33
    cls = [32] * 256
    for k in range(26):
        cls[ord("a") + k] = k
        cls[ord("A") + k] = k
    for d in range(10):
        cls[ord("0") + d] = 26
    for b in b" \t\n\r":
        cls[b] = 27
    for b in b".,;:":
        cls[b] = 28
    for b in b"!?":
        cls[b] = 29
    for b in b"'\"":
        cls[b] = 30
    for b in b"()[]{}<>-_/":
        cls[b] = 31

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def tris(s: str):
        syms = [cls[x] for x in s.encode("utf-8")]
        return [syms[j] * V * V + syms[j + 1] * V + syms[j + 2]
                for j in range(max(len(syms) - 2, 0))]

    counts = np.zeros(V ** 3, np.int64)
    for i, s in docs:
        if fnv1a_int(str(i)) % sample_mod == 0:
            for g in tris(s):
                counts[g] += 1
    ctx = counts.reshape(V * V, V).sum(axis=1, keepdims=True)
    logp = np.log(counts.reshape(V * V, V) + alpha) - np.log(ctx + alpha * V)
    q = np.round(logp.reshape(-1) * 1e6).astype(np.int64)

    rows = []
    for i, s in docs:
        g = tris(s)
        rows.append((i, len(g), -int(sum(int(q[x]) for x in g))))
    return _values_sql(rows, ["doc_id", "n_tri", "nll_micro"],
                       ["BIGINT", "BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# repetition_signals — Gopher-style repetition counters (Rae et al.
# 2021 A1.1). The raw documents text is single-line word soup, so line
# repetition is PLANTED deterministically per doc index (the corpus
# builder below is the shared INPUT construction, imported by
# q_repetition_signals — not the operator under test).


def rep_corpus(parquet_dir: str, n_docs: int = 400):
    """Deterministic replanted corpus: first n_docs documents, words
    wrapped into 7-word lines; every 3rd doc repeats its first line,
    every 4th doc appends its first 5 words twice (a guaranteed
    duplicated 5-gram)."""
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()[:n_docs]
    out = []
    for i, txt in enumerate(t["text"].to_pylist()[:n_docs]):
        words = (txt or "").split()[:48]
        lines = [" ".join(words[j:j + 7]) for j in range(0, len(words), 7)]
        if i % 3 == 0 and lines:
            lines.append(lines[0])
        if i % 4 == 0 and len(words) >= 5:
            lines.append(" ".join(words[:5] + words[:5]))
        out.append("\n".join(lines))
    return ids, out


def rep_signals_py(text: str) -> tuple:
    """Plain-Python single-doc reference for
    ml/text.py repetition_signals_batch (content-compared where the
    engine hashes; definitions in that docstring)."""
    from collections import Counter

    b = (text or "").lower().encode("utf-8", "ignore")
    lines = [ln for ln in b.split(b"\n") if ln]
    lc = Counter(lines)
    n_lines = len(lines)
    line_chars = sum(len(ln) for ln in lines)
    dup_line_cnt = sum(c - 1 for c in lc.values())
    dup_line_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    words = re.findall(rb"[A-Za-z0-9_\x80-\xff]+", b)
    word_chars = sum(len(w) for w in words)
    g2 = Counter(zip(words, words[1:]))
    top2_cnt = max(g2.values()) if g2 else 0
    top2_chars = max(
        (c * (len(a) + len(bb)) for (a, bb), c in g2.items() if c == top2_cnt),
        default=0)
    g5 = Counter(tuple(words[j:j + 5]) for j in range(len(words) - 4))
    cov = [False] * len(words)
    for j in range(len(words) - 4):
        if g5[tuple(words[j:j + 5])] >= 2:
            for p in range(j, j + 5):
                cov[p] = True
    dup5_chars = sum(len(w) for w, c in zip(words, cov) if c)
    return (n_lines, dup_line_cnt, line_chars, dup_line_chars,
            word_chars, top2_cnt, top2_chars, dup5_chars)


def repetition_signals_sql() -> str:
    ids, texts = rep_corpus(sf_dir())
    rows = [(i,) + rep_signals_py(t) for i, t in zip(ids, texts)]
    cols = ["doc_id", "n_lines", "dup_line_cnt", "line_chars",
            "dup_line_chars", "word_chars", "top2_cnt", "top2_chars",
            "dup5_chars"]
    return _values_sql(rows, cols, ["BIGINT"] * 9)


# ---------------------------------------------------------------------------
# url_dedup — C4/RefinedWeb-style URL canonicalization + URL-level
# exact dedup (ml/urls.py). Documents carry no URL column, so the
# corpus is built deterministically: 200 canonical URLs, each emitted
# as 3 raw variants (case/www/default-port/tracking-param/param-order/
# trailing-slash/fragment decorations) that must all collapse. The
# builder below is shared INPUT construction (imported by
# q_url_dedup_docs); the normalizer here is an INDEPENDENT
# urllib.parse reimplementation of the spec in ml/urls.py.

_URL_TRACKING_RE = re.compile(r"^(?:utm_[^=&]*|fbclid|gclid|msclkid|ref)(?:=|$)")
_URL_SLDS = {"co", "com", "org", "net", "ac", "gov", "edu"}


def url_corpus(parquet_dir: str, n_docs: int = 600):
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t["doc_id"].to_pylist()[:n_docs]
    n = len(ids)
    urls = []
    for i in range(n):
        k = i % 200
        rep = i // 200
        scheme = "http" if k % 2 else "https"
        host = f"site{k % 7}.example." + ("co.uk" if k % 5 == 0 else "com")
        path = f"/docs/{k}" if k % 3 else f"/Docs/{k}"
        params = [f"q={k % 13}", "lang=en"] if k % 4 else [f"q={k % 13}"]
        raw_host = ("WWW." + host.upper()) if rep == 1 else (
            "www." + host if rep == 2 else host)
        port = {"http": ":80", "https": ":443"}[scheme] if rep == 1 else ""
        extra = ["utm_source=feed", "gclid=g1"] if rep >= 1 else []
        q = (params[::-1] + extra) if rep == 2 else (params + extra)
        frag = "#top" if rep == 2 else ""
        trail = "/" if rep == 1 else ""
        urls.append(f"{scheme}://{raw_host}{port}{path}{trail}"
                    + ("?" + "&".join(q) if q else "") + frag)
    return ids, urls


def norm_url_py(u: str) -> str:
    from urllib.parse import urlsplit

    sp = urlsplit(u)
    scheme = sp.scheme.lower()
    netloc = sp.netloc.lower()
    if netloc.startswith("www."):
        netloc = netloc[4:]
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    if scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = sp.path.rstrip("/")
    params = sorted(p for p in sp.query.split("&")
                    if p and not _URL_TRACKING_RE.match(p))
    q = "&".join(params)
    return f"{scheme}://{netloc}{path}" + (f"?{q}" if q else "")


def url_domain_py(norm: str):
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", norm)
    if not m:
        return None
    host = m.group(1)
    if host.startswith("www."):
        host = host[4:]
    labels = host.split(".")
    if len(labels) < 2:
        return None
    if len(labels) >= 3 and labels[-2] in _URL_SLDS:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def url_dedup_sql() -> str:
    ids, urls = url_corpus(sf_dir())
    best: dict = {}
    for i, u in zip(ids, urls):
        c = norm_url_py(u)
        if c not in best or i < best[c]:
            best[c] = i
    rows = sorted((i, c, url_domain_py(c)) for c, i in best.items())
    return _values_sql(rows, ["doc_id", "norm_url", "norm_url_domain"],
                       ["BIGINT", "VARCHAR", "VARCHAR"])


# ---------------------------------------------------------------------------
# c4_clean — C4-style line/doc cleaning (ml/clean.py). Word-soup docs
# are single-line and punctuation-free, so the corpus replants lines
# with deterministic terminal punctuation / short-line / javascript /
# brace / lorem-ipsum decorations (shared INPUT construction, imported
# by q_c4_clean_docs). The cleaner here is an independent plain-Python
# reimplementation of the spec.


def clean_corpus(parquet_dir: str, n_docs: int = 500):
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()[:n_docs]
    out = []
    for i, txt in enumerate(t["text"].to_pylist()[:n_docs]):
        words = (txt or "").split()[:60]
        lines = []
        for j in range(0, len(words), 6):
            chunk = words[j:j + 6]
            r = (i + j // 6) % 5
            if r == 0:
                lines.append(" ".join(chunk) + ".")
            elif r == 1:
                lines.append(" ".join(chunk) + "!")
            elif r == 2:
                lines.append(" ".join(chunk) + " JavaScript required.")
            elif r == 3:
                lines.append(" ".join(chunk[:3]) + "?")
            else:
                lines.append(" ".join(chunk))
        if i % 11 == 0:
            lines.append("template { placeholder } artifact.")
        if i % 13 == 0:
            lines.append("filler Lorem Ipsum dolor sit amet text.")
        out.append("\n".join(lines))
    return ids, out


def c4_clean_py(text: str, min_words: int = 5, min_sentences: int = 3):
    lines = [ln for ln in (text or "").split("\n") if ln]
    kept = []
    for ln in lines:
        if ln[-1] not in '.!?"':
            continue
        if len([w for w in re.split(r"[ \t\r]+", ln) if w]) < min_words:
            continue
        if "javascript" in ln.lower():
            continue
        kept.append(ln)
    clean = "\n".join(kept)
    n_sent = sum(clean.count(c) for c in ".!?")
    doc_kept = (n_sent >= min_sentences
                and "{" not in (text or "")
                and "lorem ipsum" not in (text or "").lower())
    return clean, len(lines), len(kept), n_sent, doc_kept


def c4_clean_sql() -> str:
    ids, texts = clean_corpus(sf_dir())
    rows = []
    for i, t in zip(ids, texts):
        clean, nl, nk, ns, kept = c4_clean_py(t)
        rows.append((i, clean, nl, nk, ns, kept))
    return _values_sql(
        rows,
        ["doc_id", "text_clean", "n_lines", "n_lines_kept",
         "n_sentences", "doc_kept"],
        ["BIGINT", "VARCHAR", "BIGINT", "BIGINT", "BIGINT", "BOOLEAN"])


# ---------------------------------------------------------------------------
# bloom_seen — mergeable Bloom membership (ml/bloom.py). Independent
# plain-Python bit-for-bit reimplementation (python-int bitset), so the
# flags match EXACTLY including any false positives.


def bloom_seen_sql(m_bits: int = 1 << 16, k: int = 4) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()

    def positions(h):
        h1 = sm64_int(h)
        h2 = sm64_int(h ^ GOLD) | 1
        return [((h1 + i * h2) & M64) & (m_bits - 1) for i in range(k)]

    bits = 0
    for i, txt in zip(ids, texts):
        if i % 5 != 0:  # snapshot = 80% of docs
            for p in positions(fnv1a_int(txt or "")):
                bits |= 1 << p
    rows = []
    for i, txt in zip(ids, texts):
        seen = all((bits >> p) & 1
                   for p in positions(fnv1a_int(txt or "")))
        rows.append((i, seen))
    return _values_sql(rows, ["doc_id", "seen"], ["BIGINT", "BOOLEAN"])


# ---------------------------------------------------------------------------
# cms_counts — Count-Min frequency estimates (ml/cms.py). Independent
# plain-Python reimplementation; estimates (including collision
# overcounts at the deliberately small width) match bit-for-bit.


def cms_counts_sql(width: int = 1 << 8, depth: int = 4) -> str:
    # width 2^8 < 150 distinct users => real collisions: the oracle
    # checks the exact collision overcounts, not just true counts
    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["event_id", "user_id"])
    eids = t["event_id"].to_pylist()
    uids = t["user_id"].to_pylist()

    def cols(h):
        return [sm64_int((h ^ ((GOLD * (i + 1)) & M64)) & M64) & (width - 1)
                for i in range(depth)]

    counts = [[0] * width for _ in range(depth)]
    for u in uids:
        for i, c in enumerate(cols(u & M64)):
            counts[i][c] += 1
    rows = []
    for e, u in zip(eids, uids):
        if e % 20 == 0:
            est = min(counts[i][c] for i, c in enumerate(cols(u & M64)))
            rows.append((e, u, est))
    return _values_sql(rows, ["event_id", "user_id", "est_count"],
                       ["BIGINT", "BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# DSIR importance resampling (ml/dsir.py) — hashed unigram+bigram
# bucket counts, Laplace-smoothed log ratio, Gumbel top-k. Single-
# threaded per-doc loops; the per-doc log-weight accumulates
# contributions in document order (unigrams then bigrams), matching
# np.bincount's input-order accumulation bit-for-bit in float64.


def _dsir_feature_ids(text: str, buckets: int, seed: int) -> list:
    words = re.findall(r"\w+", (text or "").lower())
    hs = [sm64_int((zlib.crc32(w.encode()) ^ seed) & M64) for w in words]
    ids = [h & (buckets - 1) for h in hs]
    for h1, h2 in zip(hs, hs[1:]):
        ids.append(sm64_int((h1 ^ ((h2 * GOLD) & M64)) & M64)
                   & (buckets - 1))
    return ids


def dsir_select_sql(k: int = 60, buckets: int = 1 << 13,
                    alpha: float = 1.0, hash_seed: int = 1,
                    sample_seed: int = 0,
                    target_lang: str = "de") -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()

    feats = [_dsir_feature_ids(x, buckets, hash_seed) for x in texts]
    tgt = np.zeros(buckets, np.uint64)
    raw = np.zeros(buckets, np.uint64)
    for ids, lang in zip(feats, langs):
        for f in ids:
            raw[f] += 1
            if lang == target_lang:
                tgt[f] += 1
    p = (tgt.astype(np.float64) + alpha) / (float(tgt.sum()) + alpha * buckets)
    q = (raw.astype(np.float64) + alpha) / (float(raw.sum()) + alpha * buckets)
    lr = np.log(p) - np.log(q)

    logws = []
    for ids in feats:
        s = 0.0
        for f in ids:  # document order: unigrams then bigrams
            s += float(lr[f])
        logws.append(s)

    h = np.array([salted_int(i, sample_seed) for i in doc_ids], np.uint64)
    u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
    g = -np.log(-np.log(u))
    key = np.asarray(logws, np.float64) + g
    order = sorted(range(len(doc_ids)), key=lambda i: (-key[i], doc_ids[i]))
    rows = [(doc_ids[i], logws[i]) for i in order[:k]]
    return _values_sql(rows, ["doc_id", "dsir_logw"], ["BIGINT", "DOUBLE"])


def nb_classify_sql(buckets: int = 1 << 13, seed: int = 1,
                    alpha: float = 1.0, scale: int = 1_000_000,
                    train_mod: int = 5) -> str:
    """Independent single-threaded Multinomial Naive Bayes (train on
    doc_id % train_mod != 0, label = lang, score ALL docs) mirroring
    ml/classify.py's spec: same hashed unigram+bigram feature ids, the
    same array-shaped np.log / np.rint micro-nat finalize (float64
    buckets-length array — the 1-ulp SIMD parity rule), plain-Python
    exact integer per-doc sums, first-max tie-break over sorted
    classes."""
    import math

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()

    feats = [_dsir_feature_ids(x, buckets, seed) for x in texts]
    train = [i for i, d in enumerate(doc_ids) if d % train_mod != 0]
    classes = sorted({langs[i] for i in train if langs[i] is not None})
    idx = {c: ci for ci, c in enumerate(classes)}
    C = len(classes)

    counts = np.zeros((C, buckets), np.uint64)
    ndocs = [0] * C
    for i in train:
        ci = idx.get(langs[i])
        if ci is None:
            continue
        ndocs[ci] += 1
        for f in feats[i]:
            counts[ci][f] += 1
    n_total = sum(ndocs)

    ll = np.zeros((C, buckets), np.int64)
    prior = [0] * C
    for ci in range(C):
        c = counts[ci].astype(np.float64)
        denom = math.log(float(c.sum()) + alpha * buckets)
        v = np.log(c + alpha) - denom
        ll[ci] = np.rint(v * scale).astype(np.int64)
        prior[ci] = int(round(math.log(ndocs[ci] / n_total) * scale))

    rows = []
    for i, d in enumerate(doc_ids):
        scores = [prior[ci] + sum(int(ll[ci][f]) for f in feats[i])
                  for ci in range(C)]
        best = max(range(C), key=lambda ci: (scores[ci], -ci))
        rows.append((d, *scores, classes[best]))
    cols = (["doc_id"] + [f"nb_score_{c}" for c in classes]
            + ["nb_pred"])
    types = ["BIGINT"] + ["BIGINT"] * C + ["VARCHAR"]
    return _values_sql(rows, cols, types)


def pq_search_sql(m: int = 8, ncent: int = 16, k: int = 10,
                  iters: int = 10, seed: int = 5) -> str:
    """Independent single-threaded PQ/ADC search mirroring ml/pq.py
    op-for-op: same float32 file-order training sample (the engine's
    bottom-k hash sample keeps file order when sample_size >= n), the
    same float64 Lloyd with seeded rng.choice init, the same
    elementwise encode / LUT / fixed-subspace-order ADC sums, global
    (adist, vec_id) tie-break."""
    t = pq.read_table(os.path.join(sf_dir(), "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), np.int64)
    base = np.array(t["embedding"].to_pylist(), np.float32)
    d = base.shape[1]
    sub = d // m
    # the engine trains on the hash-SORTED sample (ml/pq.py
    # _hash_sorted_sample): order is a pure function of the id set
    hs = np.array([fnv1a_int(str(i)) for i in ids], np.uint64)
    sample = base[np.argsort(hs, kind="stable")]

    def kmeans_l2(x, nc):
        x = np.asarray(x, np.float64)
        rng = np.random.default_rng(seed)
        cent = x[rng.choice(len(x), size=min(nc, len(x)),
                            replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mem = x[assign == c]
                if len(mem):
                    cent[c] = mem.mean(axis=0)
        return cent

    books = [kmeans_l2(sample[:, si * sub:(si + 1) * sub], ncent)
             for si in range(m)]
    x = base.astype(np.float64)
    codes = np.zeros((len(x), m), np.uint8)
    for si in range(m):
        xs = x[:, si * sub:(si + 1) * sub]
        d2 = ((xs[:, None, :] - books[si][None, :, :]) ** 2).sum(-1)
        codes[:, si] = np.argmin(d2, axis=1)

    order = np.argsort(ids[ids < 3])
    q = x[ids < 3][order]
    rows = []
    for qi in range(len(q)):
        adist = np.zeros(len(x), np.float64)
        for si in range(m):
            lut = ((q[qi:qi + 1, si * sub:(si + 1) * sub][:, None, :]
                    - books[si][None, :, :]) ** 2).sum(-1)[0]
            adist += lut[codes[:, si]]
        o = np.lexsort((ids, adist))[:k]
        for rank, i in enumerate(o):
            rows.append((qi, int(ids[i]), float(adist[i]), rank))
    return _values_sql(rows, ["query_idx", "vec_id", "adist", "rank"],
                       ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"])


def bm25_search_sql(query: str = "table scan fast merge",
                    k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    """Independent single-threaded Okapi BM25 mirroring
    ml/corpus.py bm25_score/bm25_search op-for-op: whitespace word
    split, exact integer tf/dl/df, idf via the SAME-SHAPED array
    np.log (1-ulp SIMD parity rule), per-doc fixed-term-order float64
    accumulation, (score DESC, id ASC) tie-break."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    terms = []
    for w in query.split():
        if w and w not in terms:
            terms.append(w)
    m = len(terms)
    tidx = {w: j for j, w in enumerate(terms)}

    tfs, dls = [], []
    df = np.zeros(m, np.int64)
    for s in texts:
        words = [w for w in (s or "").split() if w]
        tf = [0] * m
        for w in words:
            j = tidx.get(w)
            if j is not None:
                tf[j] += 1
        tfs.append(tf)
        dls.append(len(words))
        for j in range(m):
            if tf[j] > 0:
                df[j] += 1
    n_docs = len(texts)
    avgdl = sum(dls) / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    scored = []
    for i in range(n_docs):
        norm = k1 * (1.0 - b + b * (dls[i] / avgdl))
        s = 0.0
        for j in range(m):
            tfj = tfs[i][j]
            s += idf[j] * (tfj * (k1 + 1.0)) / (tfj + norm)
        scored.append((doc_ids[i], dls[i], float(s)))
    scored.sort(key=lambda r: (-r[2], r[0]))
    rows = [(d, dl, sc, rank) for rank, (d, dl, sc)
            in enumerate(scored[:k])]
    return _values_sql(rows, ["doc_id", "dl", "bm25", "rank"],
                       ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"])


def pca_embeddings_sql(k: int = 8) -> str:
    """Independent single-threaded PCA mirroring ml/embed.py's exact
    integer-moment spec op-for-op: same 2^20 quantization, exact
    integer (n, Σq, Σqqᵀ), the same float64 covariance/eigh/sign-canon
    array ops, and the same fixed-j-order projection loop."""
    t = pq.read_table(os.path.join(sf_dir(), "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    SCALE = 1 << 20
    m = np.array(t["embedding"].to_pylist(), np.float32).astype(np.float64)
    q = np.rint(m * SCALE).astype(np.int64)
    n, d = q.shape
    s = [int(v) for v in q.sum(axis=0)]
    M = q.T @ q  # exact in int64 at this size
    mu = np.array([float(v) for v in s], np.float64) / (n * SCALE)
    m2 = np.array([[float(int(v)) for v in row] for row in M],
                  np.float64)
    cov = m2 / (n * float(SCALE) ** 2) - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    x = q.astype(np.float64) / SCALE - mu
    y = np.zeros((n, comps.shape[1]), np.float64)
    for j in range(d):
        y += x[:, j:j + 1] * comps[j]
    rows = [(ids[i], *[float(y[i, c]) for c in range(comps.shape[1])])
            for i in range(n)]
    cols = ["vec_id"] + [f"p{c}" for c in range(comps.shape[1])]
    types = ["BIGINT"] + ["DOUBLE"] * comps.shape[1]
    return _values_sql(rows, cols, types)


def compression_ratio_sql(level: int = 6) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = (text or "").encode("utf-8", "ignore")
        r = (len(zlib.compress(b, level)) / len(b)) if b else 1.0
        rows.append((doc_id, r))
    return _values_sql(rows, ["doc_id", "comp_ratio"],
                       ["BIGINT", "DOUBLE"])


# ---------------------------------------------------------------------------
# line_dedup — RefinedWeb/MassiveText corpus-wide duplicated-line
# removal (ml/clean.py line_dedup). The raw word-soup text is
# single-line, so the corpus replants multi-line docs with BOTH
# within-doc repeats (rep_corpus) and cross-doc boilerplate (a cookie
# banner on every 2nd doc, a footer on every 5th). The oracle is PLAIN
# SQL — DuckDB recomputes the dedup itself over a VALUES CTE of the
# corpus (string_split + count + join), no golden reimplementation.

_LINE_BANNER = "accept all cookies to continue browsing this site."
_LINE_FOOTER = "copyright example site all rights reserved."


def line_corpus(parquet_dir: str, n_docs: int = 400):
    ids, texts = rep_corpus(parquet_dir, n_docs)
    out = []
    for i, txt in enumerate(texts):
        lines = txt.split("\n") if txt else []
        if i % 2 == 0:
            lines.insert(0, _LINE_BANNER)
        if i % 5 == 0:
            lines.append(_LINE_FOOTER)
        out.append("\n".join(lines))
    return ids, out


def para_corpus(parquet_dir: str, n_docs: int = 400):
    """Paragraph-granularity replant: rep_corpus lines paired into
    2-line paragraphs, the cross-doc banner/footer planted as WHOLE
    paragraphs (so they are the duplicated units)."""
    ids, texts = rep_corpus(parquet_dir, n_docs)
    out = []
    for i, t in enumerate(texts):
        lines = t.split("\n") if t else []
        paras = ["\n".join(lines[j:j + 2]) for j in range(0, len(lines), 2)]
        if i % 2 == 0:
            paras.insert(0, _LINE_BANNER)
        if i % 5 == 0:
            paras.append(_LINE_FOOTER)
        out.append("\n\n".join(paras))
    return ids, out


def _unit_dedup_sql(ids, texts, sep_sql: str, min_count: int) -> str:
    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    body = ", ".join(f"({i}::BIGINT, {lit(t)})" for i, t in zip(ids, texts))
    return f"""
WITH corpus(doc_id, text) AS (VALUES {body}),
ex AS (
  SELECT doc_id,
         unnest(string_split(text, {sep_sql})) AS line,
         generate_subscripts(string_split(text, {sep_sql}), 1)::BIGINT
           AS line_no
  FROM corpus
),
cnt AS (SELECT line, count(*) AS c FROM ex WHERE line <> '' GROUP BY line)
SELECT e.doc_id, e.line_no, e.line
FROM ex e JOIN cnt USING (line)
WHERE e.line <> '' AND cnt.c < {min_count}
"""


def line_dedup_sql(min_count: int = 2) -> str:
    ids, texts = line_corpus(sf_dir())
    return _unit_dedup_sql(ids, texts, "chr(10)", min_count)


def paragraph_dedup_sql(min_count: int = 2) -> str:
    ids, texts = para_corpus(sf_dir())
    return _unit_dedup_sql(ids, texts, "chr(10)||chr(10)", min_count)


# ---------------------------------------------------------------------------
# pagerank_hosts — fixed-point integer PageRank (ml/graph.py). Shared
# INPUT construction below (planted directed graph over document ids:
# 2 formula edges per node + a hub edge every 5th node, every 11th
# node dangling); the oracle is an INDEPENDENT plain-Python dict/loop
# reimplementation of the public integer update in the ml/graph.py
# docstring — integer ops make it bit-exact at any partitioning.


def pr_graph(parquet_dir: str, n_nodes: int = 300):
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t["doc_id"].to_pylist()[:n_nodes]
    n = len(ids)
    src, dst = [], []
    for i in range(n):
        if i % 11 == 0:  # dangling node (no out-edges)
            continue
        src += [ids[i], ids[i]]
        dst += [ids[(i * 7 + 3) % n], ids[(i * 3 + 11) % n]]
        if i % 5 == 0:
            src.append(ids[i])
            dst.append(ids[0])
    return src, dst


def pagerank_sql(iters: int = 10, scale: int = 10**12,
                 num: int = 85, den: int = 100) -> str:
    src, dst = pr_graph(sf_dir())
    nodes = sorted(set(src) | set(dst))
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for s in src:
        outdeg[s] += 1
    rank = {v: scale // n for v in nodes}
    tele = (scale * (den - num) // den) // n
    for _ in range(iters):
        out = {v: rank[v] * num // den for v in nodes}
        dang = sum(out[v] for v in nodes if outdeg[v] == 0)
        share = {v: out[v] // outdeg[v] for v in nodes if outdeg[v] > 0}
        nxt = {v: tele + dang // n for v in nodes}
        for s, d in zip(src, dst):
            nxt[d] += share[s]
        rank = nxt
    rows = [(v, rank[v]) for v in nodes]
    return _values_sql(rows, ["node", "rank"], ["BIGINT", "BIGINT"])


def line_dedup_keep_first_sql(min_count: int = 2) -> str:
    """keep_first mode: the globally first occurrence (doc_id,
    line_no) of each duplicated line survives. Plain SQL — DuckDB
    recomputes via window functions over the same VALUES corpus."""
    ids, texts = line_corpus(sf_dir())

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    body = ", ".join(f"({i}::BIGINT, {lit(t)})" for i, t in zip(ids, texts))
    return f"""
WITH corpus(doc_id, text) AS (VALUES {body}),
ex AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1)::BIGINT
           AS line_no
  FROM corpus
),
w AS (
  SELECT doc_id, line_no, line,
         count(*) OVER (PARTITION BY line) AS c,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, line_no) AS rn
  FROM ex WHERE line <> ''
)
SELECT doc_id, line_no, line FROM w WHERE c < {min_count} OR rn = 1
"""


def profile_orders_sql() -> str:
    """Plain-SQL mirror of stages/profile.py over orders' int/string
    columns (floats excluded: their min/max would hash but repr-vs-
    varchar-cast formatting differs; int sums are exact in f64 here)."""
    cols = [("o_orderkey", "int64"), ("o_custkey", "int64"),
            ("o_orderstatus", "string"), ("o_orderpriority", "string")]
    parts = []
    for c, ty in cols:
        if ty == "int64":
            s = f"sum({c})::DOUBLE"
            m = f"avg({c})::DOUBLE"
        else:
            s = "CAST(NULL AS DOUBLE)"
            m = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column, '{ty}' AS dtype,"
            f" count(*)::BIGINT AS cnt,"
            f" sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT"
            f" AS nulls, min({c})::VARCHAR AS min,"
            f" max({c})::VARCHAR AS max, {s} AS sum, {m} AS mean"
            f" FROM orders")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# bpe_merges — distributed BPE tokenizer training (ml/bpe.py). Oracle:
# independent plain-Python dict/Counter BPE (Sennrich 2016 semantics,
# byte alphabet, all-adjacent pair counts, (count desc, pair asc)
# tie-break, left-to-right non-overlapping application) over the SAME
# word-frequency table, rendered as VALUES.


def bpe_merges_py(word_freq: dict, num_merges: int):
    types = {w: list(w.encode("utf-8")) for w in word_freq}
    out = []
    for mi in range(num_merges):
        from collections import Counter

        cnt = Counter()
        for w, syms in types.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        best_c = max(cnt.values())
        a, b = min(p for p, c in cnt.items() if c == best_c)
        nid = 256 + mi
        out.append((mi, a, b, nid))
        for w, s in types.items():
            i, ns = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(nid)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            types[w] = ns
    return out


def bpe_merges_sql(num_merges: int = 24, n_docs: int = 400) -> str:
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["text"])
    wf = Counter(w for txt in t["text"].to_pylist()[:n_docs]
                 for w in (txt or "").split())
    rows = bpe_merges_py(dict(wf), num_merges)
    return _values_sql(rows, ["merge_idx", "a", "b", "new_id"],
                       ["BIGINT"] * 4)


# ---------------------------------------------------------------------------
# snapshot_diff — dataset-versioning diff (stages/diff.py). Shared
# INPUT construction: old = first 400 documents; new = old with every
# 7th id removed, every 5th text edited, 50 new ids appended. Oracle
# is PLAIN SQL (full outer join comparing the TEXT directly — the
# engine compares 64-bit fingerprints; equal verdicts absent a 2^-64
# collision).


def diff_corpus(parquet_dir: str, n_docs: int = 400):
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()[:n_docs]
    texts = [x or "" for x in t["text"].to_pylist()[:n_docs]]
    old = list(zip(ids, texts))
    new = []
    for i, (d, txt) in enumerate(old):
        if i % 7 == 0:
            continue  # removed
        new.append((d, txt + " edited") if i % 5 == 0 else (d, txt))
    base = max(ids) + 1
    for k in range(50):
        new.append((base + k, f"brand new page number {k} with text."))
    return old, new


def snapshot_diff_sql() -> str:
    old, new = diff_corpus(sf_dir())

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def vals(rows):
        return ", ".join(f"({d}::BIGINT, {lit(t)})" for d, t in rows)

    return f"""
WITH old_s(doc_id, text) AS (VALUES {vals(old)}),
new_s(doc_id, text) AS (VALUES {vals(new)})
SELECT doc_id, status FROM (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text <> n.text THEN 'changed' END AS status
  FROM old_s o FULL OUTER JOIN new_s n ON o.doc_id = n.doc_id
) WHERE status IS NOT NULL
"""


def range_intervals(parquet_dir: str):
    """Deterministic per-event-type maintenance windows over the events
    ts span: every EVEN 2-hour slot's first hour, inclusive micro-epoch
    bounds — shared INPUT construction for the range-join query."""
    import pyarrow.compute as _pc

    t = pq.read_table(os.path.join(parquet_dir, "events.parquet"),
                      columns=["ts", "event_type"])
    ts = _pc.cast(t["ts"], "int64")
    mm = _pc.min_max(ts)
    lo_ts, hi_ts = mm["min"].as_py(), mm["max"].as_py()
    H = 3_600_000_000
    k0, k1 = lo_ts // (2 * H), hi_ts // (2 * H)
    types = sorted(set(t["event_type"].to_pylist()))
    rows = []
    win = 0
    for et in types:
        for k in range(k0, k1 + 1):
            rows.append((et, 2 * H * k, 2 * H * k + H - 1, win))
            win += 1
    return rows


def range_join_sql() -> str:
    rows = range_intervals(sf_dir())
    body = ", ".join(f"('{et}', {lo}::BIGINT, {hi}::BIGINT, {w}::BIGINT)"
                     for et, lo, hi, w in rows)
    return f"""
WITH iv(event_type, lo, hi, win_id) AS (VALUES {body})
SELECT e.event_id, i.win_id
FROM events e JOIN iv i
  ON e.event_type = i.event_type AND epoch_us(e.ts) BETWEEN i.lo AND i.hi
"""


def bpe_encode_py(word: str, merges: list) -> list:
    """Independent single-word BPE encoder (left-to-right non-overlap
    replay of the merge list) — oracle mirror for ml/bpe.bpe_encode's
    vectorized vocab-join path."""
    syms = list(word.encode("utf-8"))
    for _mi, a, b, nid in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(nid)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_sql(num_merges: int = 24, n_docs: int = 400,
                   n_encode: int = 120) -> str:
    """Encode the LAST n_encode docs (so some word types are OOV w.r.t.
    the training slice) with merges learned from the FIRST n_docs;
    emit (doc_id, n_bpe, bpe_sum) — both order-independent ints."""
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = [x or "" for x in t["text"].to_pylist()]
    wf = Counter(w for txt in texts[:n_docs] for w in txt.split())
    merges = bpe_merges_py(dict(wf), num_merges)
    rows = []
    for d, txt in zip(ids[-n_encode:], texts[-n_encode:]):
        syms = [s for w in txt.split() for s in bpe_encode_py(w, merges)]
        rows.append((d, len(syms), sum(syms)))
    return _values_sql(rows, ["doc_id", "n_bpe", "bpe_sum"],
                       ["BIGINT"] * 3)


def gopher_filter_sql() -> str:
    """Kept doc ids under the Gopher repetition thresholds (integer
    cross-multiplication comparisons over rep_signals_py counters) —
    independent reimplementation rendered as VALUES."""
    ids, texts = rep_corpus(sf_dir())
    rows = []
    for d, t in zip(ids, texts):
        (n_lines, dup_cnt, line_chars, dup_chars,
         word_chars, top2_cnt, top2_chars, dup5_chars) = rep_signals_py(t)
        keep = not (dup_cnt * 100 > 30 * n_lines
                    or dup_chars * 100 > 20 * line_chars
                    or top2_chars * 100 > 20 * word_chars
                    or dup5_chars * 100 > 15 * word_chars)
        if keep:
            rows.append((d,))
    return _values_sql(rows, ["doc_id"], ["BIGINT"])


def blocklist_corpus(parquet_dir: str, n_docs: int = 400):
    """Shared INPUT: a blocklist phrase planted (mixed case) on every
    6th doc — suffix on i%6==0, prefix on i%6==3."""
    t = pq.read_table(os.path.join(parquet_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()[:n_docs]
    texts = [x or "" for x in t["text"].to_pylist()[:n_docs]]
    out = []
    for i, txt in enumerate(texts):
        if i % 6 == 0:
            txt = txt + " FORBIDDEN Widget on sale"
        elif i % 6 == 3:
            txt = "Buy CHEAP pills here " + txt
        out.append(txt)
    return ids, out


def blocklist_sql() -> str:
    ids, texts = blocklist_corpus(sf_dir())

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    body = ", ".join(f"({d}::BIGINT, {lit(t)})" for d, t in zip(ids, texts))
    return f"""
WITH corpus(doc_id, text) AS (VALUES {body})
SELECT doc_id FROM corpus
WHERE lower(text) NOT LIKE '%forbidden widget%'
  AND lower(text) NOT LIKE '%buy cheap pills%'
"""


def gopher_quality_sql() -> str:
    """Kept doc ids under the Gopher A1.2 quality gate — independent
    plain-Python reimplementation of the integer spec in
    ml/text.py gopher_quality_batch/gopher_quality_filter."""
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    ws_re = re.compile(r"[ \t\n\r\x0b\x0c]+")  # byte-level ASCII ws
    for d, txt in zip(t["doc_id"].to_pylist()[:400],
                      t["text"].to_pylist()[:400]):
        txt = txt or ""
        words = [w for w in ws_re.split(txt) if w]
        nw = len(words)
        wc = sum(len(w.encode('utf-8')) for w in words)
        alpha = sum(1 for w in words
                    if any(c.isascii() and c.isalpha() for c in w))
        nhash = txt.count("#")
        nell = txt.count("...")
        nstop = sum(1 for w in words if w.lower().strip(".,!?;:") in stop)
        keep = (50 <= nw <= 100_000 and 3 * nw <= wc <= 10 * nw
                and nhash * 10 <= len(txt.encode("utf-8"))
                and nell * 100 <= nw
                and alpha * 10 >= 8 * nw and nstop >= 2)
        if keep:
            rows.append((d,))
    return _values_sql(rows, ["doc_id"], ["BIGINT"])


def split_holdout_sql(frac: float = 0.2, seed: int = 5) -> str:
    """Both sides of the deterministic holdout split, as (doc_id,
    side) — independent salted-hash reimplementation (salted_int
    mirrors ml/sampling._salted_hash)."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id"])
    thr = int(round(frac * 1_000_000))
    rows = []
    for d in t["doc_id"].to_pylist():
        h = salted_int(d, seed) % 1_000_000
        rows.append((d, "holdout" if h < thr else "train"))
    return _values_sql(rows, ["doc_id", "side"], ["BIGINT", "VARCHAR"])


def weighted_sample_sql(k: int = 50, seed: int = 9) -> str:
    """Independent Gumbel top-k mirror (Efraimidis-Spirakis via the
    Gumbel trick) for ml/sampling.weighted_sample_k over documents
    weighted by n_chars. ARRAY numpy ops throughout — numpy's SIMD
    array log differs from scalar math.log by 1 ulp, so the mirror
    must take the same vectorized path as the engine."""
    import numpy as _np

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "n_chars"])
    ids = _np.asarray(t["doc_id"].to_numpy(), _np.int64)
    w = _np.asarray(t["n_chars"].to_numpy(), _np.float64)
    h = sm64_np(_np.array([fnv1a_int(f"{i}|{seed}") for i in ids],
                          _np.uint64))
    u = (h.astype(_np.float64) + 0.5) / 2.0 ** 64
    key = _np.log(w) + (-_np.log(-_np.log(u)))
    order = _np.lexsort((ids, -key))[:k]
    rows = [(int(ids[i]), int(w[i])) for i in order]
    return _values_sql(rows, ["doc_id", "n_chars"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# byte_entropy — integer micro-nat Shannon entropy of the UTF-8 byte
# distribution (ml/text.byte_entropy_batch). Independent per-doc
# Counter-based reimplementation; the log table uses the same ARRAY
# np.log (scalar math.log can differ by an ulp).


def byte_entropy_sql() -> str:
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = (text or "").encode("utf-8", "ignore")
        n = len(b)
        if n == 0:
            rows.append((doc_id, 0, 0))
            continue
        table = np.zeros(n + 1, np.int64)
        table[1:] = np.round(
            np.log(np.arange(1, n + 1, dtype=np.float64)) * 1_000_000
        ).astype(np.int64)
        c = Counter(b)
        ent = n * int(table[n]) - sum(
            cnt * int(table[cnt]) for cnt in c.values())
        rows.append((doc_id, n, ent))
    return _values_sql(rows, ["doc_id", "n_bytes", "ent_micro"],
                       ["BIGINT", "BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# minhash_index — incremental near-dup probe (ml/dedup.minhash_index_
# build/probe): old half of documents is the index, new half probes it.
# Identical LSH spec to minhash_pairs; the cross-split subset of the
# full-corpus pair list IS the probe result.


def minhash_index_sql(split: int = 250) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    seeds = [(1 * 1_000_003 + h * 2_654_435_761) & M64 for h in range(64)]
    ids, sigs = [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        buf = np.frombuffer((text or "").lower().encode("utf-8", "ignore"),
                            np.uint8)
        ids.append(int(doc_id))
        sigs.append(_window_sig(buf, 5, np.array(seeds, np.uint64)))
    rows = _lsh_pairs(ids, sigs, bands=16, num_hashes=64, threshold=0.7)
    cross = [(a, b, est) for a, b, est in rows if a < split <= b]
    return _values_sql(cross, ["index_id", "new_id", "est_jaccard"],
                       ["BIGINT", "BIGINT", "DOUBLE"])


def minhash_ingest_sql(split: int = 250) -> str:
    """Survivors of one index-ingest step (ml/dedup.minhash_index_
    ingest): docs >= split whose near-dup does NOT already live in the
    < split index — the batch ids minus the cross-split dup set of the
    SAME golden LSH pair list minhash_index_sql uses."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text", "n_chars"])
    seeds = [(1 * 1_000_003 + h * 2_654_435_761) & M64 for h in range(64)]
    ids, sigs = [], []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        buf = np.frombuffer((text or "").lower().encode("utf-8", "ignore"),
                            np.uint8)
        ids.append(int(doc_id))
        sigs.append(_window_sig(buf, 5, np.array(seeds, np.uint64)))
    rows = _lsh_pairs(ids, sigs, bands=16, num_hashes=64, threshold=0.7)
    dup_new = {b for a, b, _ in rows if a < split <= b}
    nchars = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    out = [(i, int(nchars[i])) for i in sorted(ids)
           if i >= split and i not in dup_new]
    return _values_sql(out, ["doc_id", "n_chars"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# inverted_search — persisted inverted-index BM25 (ml/search_index.py):
# same integer tf/dl/df + fixed-term-order float64 accumulation as
# bm25_search_sql, but candidates-only (docs sharing >= 1 query term —
# index semantics: no posting row, no score). The chosen query must
# match well over k docs so the candidates-only cut can't mask a
# ranking bug.


def inverted_search_sql(query: str = "index data stream block",
                        k: int = 20, k1: float = 1.2,
                        b: float = 0.75) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "text"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    terms = []
    for w in query.split():
        if w and w not in terms:
            terms.append(w)
    m = len(terms)
    tidx = {w: j for j, w in enumerate(terms)}

    tfs, dls = [], []
    df = np.zeros(m, np.int64)
    for s in texts:
        words = [w for w in (s or "").split() if w]
        tf = [0] * m
        for w in words:
            j = tidx.get(w)
            if j is not None:
                tf[j] += 1
        tfs.append(tf)
        dls.append(len(words))
        for j in range(m):
            if tf[j] > 0:
                df[j] += 1
    n_docs = len(texts)
    avgdl = sum(dls) / n_docs
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    scored = []
    for i in range(n_docs):
        if not any(tfs[i]):
            continue  # candidates-only: doc has no posting for any term
        norm = k1 * (1.0 - b + b * (dls[i] / avgdl))
        s = 0.0
        for j in range(m):
            tfj = tfs[i][j]
            s += idf[j] * (tfj * (k1 + 1.0)) / (tfj + norm)
        scored.append((doc_ids[i], dls[i], float(s)))
    assert len(scored) > 2 * k, "query must match well over k docs"
    scored.sort(key=lambda r: (-r[2], r[0]))
    rows = [(d, dl, sc, rank) for rank, (d, dl, sc)
            in enumerate(scored[:k])]
    return _values_sql(rows, ["doc_id", "dl", "bm25", "rank"],
                       ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"])


def kmeans_sql(n_clusters: int = 8, iters: int = 5) -> str:
    """Single-threaded mirror of ml/cluster.py kmeans_train +
    kmeans_cluster_stats over the embeddings table: same 2^20 integer
    grid, bottom-k-by-(fnv1a(id), id) init, exact-integer argmin
    assignment (ties to the lowest cluster), python-bigint centroid
    sums with float(bigint)/count → np.rint regrid, per-cluster
    polynomial checksum of the ascending member ids (mod 2^64, int64
    bit pattern)."""
    t = pq.read_table(os.path.join(sf_dir(), "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    x = np.asarray(t["embedding"].to_pylist(), np.float64)
    scale = 1 << 20
    q = np.rint(x * scale).astype(np.int64)

    order = sorted(range(len(ids)),
                   key=lambda i: (fnv1a_int(str(ids[i])), ids[i]))
    qc = q[order[:n_clusters]].copy()
    k = len(qc)

    def assign(qm, qcm):
        cross = qm @ qcm.T
        cn = np.einsum("ij,ij->i", qcm, qcm)
        return np.argmin(cn[None, :] - 2 * cross, axis=1)

    for _ in range(iters):
        a = assign(q, qc)
        new = qc.copy()
        for c in range(k):
            members = np.nonzero(a == c)[0]
            if len(members):
                sums = [sum(int(v) for v in q[members, j])
                        for j in range(q.shape[1])]
                mean = np.array([float(s) for s in sums],
                                np.float64) / len(members)
                new[c] = np.rint(mean).astype(np.int64)
        qc = new

    a = assign(q, qc)
    rows = []
    for c in range(k):
        members = sorted(int(ids[i]) for i in np.nonzero(a == c)[0])
        if not members:
            continue
        h = 0
        for v in members:
            h = (h * 0x100000001B3 + (v & M64)) & M64
        if h >= 1 << 63:
            h -= 1 << 64
        rows.append((c, len(members), h))
    return _values_sql(rows, ["cluster", "n", "id_hash"],
                       ["BIGINT", "BIGINT", "BIGINT"])


def ewma_sql(alpha: float = 0.25) -> str:
    """Single-threaded mirror of stages/shift.py fn=="ewma" over the
    events table (key=user_id, order=ts, col=value): identical chunked
    w^{-p} rescaling arithmetic (same L bound, same pw/pwin power
    arrays, same cumsum order — trailing-zero padding in the engine's
    rectangular layout adds exactly 0.0, so the 1-D per-key mirror is
    bit-identical)."""
    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["user_id", "ts", "value"])
    import pandas as pd
    df = t.to_pandas().sort_values(["user_id", "ts"], kind="stable")
    w = 1.0 - alpha
    rows = []
    for uid, g in df.groupby("user_id", sort=True):
        x = g["value"].to_numpy(np.float64)
        n = len(x)
        if w <= 0.0:
            y = x.copy()
        elif w >= 1.0:
            y = np.full(n, x[0])
        else:
            L = int(min(256, max(1, np.floor(230.0 / -np.log(w)))))
            pw = w ** -np.arange(L, dtype=np.float64)
            pwin = w ** np.arange(L, dtype=np.float64)
            y = np.empty(n, np.float64)
            c = 0.0
            for kk in range(int(np.ceil(n / L))):
                xs = x[kk * L:(kk + 1) * L]
                m = len(xs)
                p = np.arange(m)
                tt = alpha * xs * pw[p]
                tt[0] = xs[0] if kk == 0 else alpha * xs[0] + w * c
                um = np.cumsum(tt)
                y[kk * L:kk * L + m] = um * pwin[p]
                c = um[m - 1] * pwin[m - 1]
            # engine computes carry at lastp within the padded row —
            # identical to um[m-1]*pwin[m-1] above
        ts_us = (g["ts"].astype("int64")).to_numpy()
        for i in range(n):
            rows.append((int(uid), int(ts_us[i]), float(x[i]), float(y[i])))
    return _values_sql(rows, ["user_id", "ts_us", "value", "ewma"],
                       ["BIGINT", "BIGINT", "DOUBLE", "DOUBLE"])


# ---------------------------------------------------------------------------
# grouped_approx_quantiles (stages/quantile.py) — single-threaded
# reference: per-key bottom-k of sm64(fnv1a(id|seed)), nearest-rank
# (quantile_disc) over the sorted sample values.


def grouped_approx_quantiles_sql(key: str = "event_type",
                                 col: str = "value",
                                 ps: tuple = (0.5, 0.9, 0.99),
                                 k: int = 64, seed: int = 7) -> str:
    import math

    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["event_id", key, col])
    ids = t["event_id"].to_pylist()
    keys = t[key].to_pylist()
    vals = t[col].to_pylist()
    per_key: dict = {}
    for i, kk, v in zip(ids, keys, vals):
        if v is None:
            continue
        per_key.setdefault(kk, []).append((salted_int(i, seed), i, v))

    def pname(p: float) -> str:
        pct = round(p * 100, 6)
        return f"p{int(pct)}" if pct == int(pct) else f"p{p}"

    rows = []
    for kk in sorted(per_key):
        samp = sorted(per_key[kk])[:k]
        sv = sorted(v for _, _, v in samp)
        n = len(sv)
        rows.append(tuple([kk] + [
            float(sv[min(max(math.ceil(p * n) - 1, 0), n - 1)])
            for p in ps]))
    return _values_sql(rows, [key] + [pname(p) for p in ps],
                       ["VARCHAR"] + ["DOUBLE"] * len(ps))


# ---------------------------------------------------------------------------
# diverse_select (ml/select.py) — single-threaded farthest-point-first
# reference over the same bottom-`candidates` salted-hash sample.


def diverse_select_sql(k: int = 32, candidates: int = 256,
                       seed: int = 3) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids_all = np.asarray(t["vec_id"].to_pylist(), np.int64)
    hs = np.asarray([salted_int(int(i), seed) for i in ids_all],
                    np.uint64)
    order = np.lexsort((ids_all, hs))[:candidates]
    ids = ids_all[order]
    x = np.asarray(t["embedding"].to_pylist(), np.float64)[order]
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    n = len(ids)
    kk = min(k, n)
    sel = np.empty(kk, np.int64)
    sel[0] = 0
    maxsim = x @ x[0]
    maxsim[0] = np.inf
    for r in range(1, kk):
        i = int(np.argmin(maxsim))
        sel[r] = i
        np.maximum(maxsim, x @ x[i], out=maxsim)
        maxsim[i] = np.inf
    rows = [(int(ids[s]), r) for r, s in enumerate(sel)]
    return _values_sql(rows, ["vec_id", "rank"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# zorder_sort (stages/zorder.py) — single-threaded Morton-key mirror:
# exact global min/max, identical IEEE fixed-point quantization,
# bit-by-bit interleave.


def zorder_events_sql(bits: int = 16) -> str:
    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["event_id", "user_id", "value"])
    ids = t["event_id"].to_pylist()
    cols = []
    for name in ("user_id", "value"):
        xs = [v for v in t[name].to_pylist() if v is not None]
        lo, hi = float(min(xs)), float(max(xs))
        top = (1 << bits) - 1
        scale = float(top) / (hi - lo)
        q = []
        for v in t[name].to_pylist():
            if v is None or hi <= lo:
                q.append(0)
            else:
                s = np.floor((np.float64(v) - lo) * scale)
                q.append(int(min(max(s, 0.0), float(top))))
        cols.append(q)
    rows = []
    for i, (qa, qb) in enumerate(zip(*cols)):
        z = 0
        for b in range(bits):
            z |= ((qa >> b) & 1) << (2 * b)
            z |= ((qb >> b) & 1) << (2 * b + 1)
        rows.append((int(ids[i]), z))
    return _values_sql(rows, ["event_id", "zkey"], ["BIGINT", "BIGINT"])


# ---------------------------------------------------------------------------
# resolve_entities (stages/fuzzy.py) — single-threaded mirror:
# brute-force Levenshtein pairs + union-find, canonical = min id.


def _lev_py(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def resolve_entities_sql(table: str = "supplier", on: str = "s_name",
                         id_col: str = "s_suppkey",
                         max_dist: int = 1) -> str:
    t = pq.read_table(os.path.join(sf_dir(), f"{table}.parquet"),
                      columns=[id_col, on])
    ids = t[id_col].to_pylist()
    names = t[on].to_pylist()
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        if names[i] is None:
            continue
        for j in range(i + 1, len(ids)):
            if names[j] is None:
                continue
            if abs(len(names[i]) - len(names[j])) > max_dist:
                continue
            if _lev_py(names[i], names[j]) <= max_dist:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((int(i), int(find(i))) for i in ids)
    return _values_sql(rows, [id_col, "canonical"],
                       ["BIGINT", "BIGINT"])


def dedup_keep_best_sql() -> str:
    """Mirror of q_dedup_keep_best: the token_near_dup pair mirror →
    union-find → per-cluster argmax n_tok (tie: smallest id) → the
    kept (doc_id, n_tok) corpus as VALUES."""
    import pyarrow as pa

    from vector_ray.sources.synth import synth_table

    t = synth_table(5_000)
    dup = pa.table({
        "doc_id": pa.array([f"dup-{i:04d}" for i in range(100)]),
        "tokens": t["tokens"].slice(0, 100).combine_chunks(),
        "n_tok": t["n_tok"].slice(0, 100).combine_chunks(),
        "source": t["source"].slice(0, 100).combine_chunks(),
    })
    full = pa.concat_tables([t, dup])
    seeds = [(17 + h * 2_654_435_761) & M64 for h in range(8)]
    ids, sigs = [], []
    for doc_id, toks in zip(full["doc_id"].to_pylist(),
                            full["tokens"].to_pylist()):
        v = np.asarray(toks, np.int64).astype(np.uint32).astype(np.uint64)
        sig = _window_sig(v, 4, np.array(seeds, np.uint64))
        if sig[0] == U64MAX:
            continue
        ids.append(str(doc_id))
        sigs.append(sig)
    pairs = _lsh_pairs(ids, sigs, bands=4, num_hashes=8, threshold=0.75)

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _est in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ntok = dict(zip((str(d) for d in full["doc_id"].to_pylist()),
                    full["n_tok"].to_pylist()))
    members: dict = {}
    for a, b, _est in pairs:
        for m in (a, b):
            members.setdefault(find(m), set()).add(m)
    drop: set = set()
    for lbl, ms in members.items():
        best = min(ms, key=lambda i: (-ntok[i], i))
        drop |= ms - {best}
    rows = [(str(d), int(n)) for d, n in
            zip(full["doc_id"].to_pylist(), full["n_tok"].to_pylist())
            if str(d) not in drop]
    return _values_sql(rows, ["doc_id", "n_tok"], ["VARCHAR", "BIGINT"])


def weighted_per_key_cap_sql(k: int, seed: int) -> str:
    """Mirror of ml/sampling.weighted_per_key_cap over documents with
    weight = n_chars: per source, top-k by log(w) + Gumbel(salted id
    hash), ties by id ascending."""
    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["doc_id", "source", "n_chars"])
    per: dict = {}
    for i, s, w in zip(t["doc_id"].to_pylist(), t["source"].to_pylist(),
                       t["n_chars"].to_pylist()):
        h = np.uint64(salted_int(i, seed))
        u = (h.astype(np.float64) + np.float64(0.5)) / np.float64(2.0) ** 64
        g = -np.log(-np.log(u))
        key = np.log(np.float64(w)) + g
        per.setdefault(s, []).append((-key, i))
    rows = []
    for s in sorted(per):
        for _negkey, i in sorted(per[s])[:k]:
            rows.append((i, s))
    return _values_sql(rows, ["doc_id", "source"], ["BIGINT", "VARCHAR"])


def pmi_pairs_sql(window: int = 2, vocab_size: int = 500,
                  min_count: int = 5, k: int = 40) -> str:
    """Mirror of ml/corpus.pmi_pairs over documents.text: exact word
    counts, (count desc, word asc) vocab, windowed unordered pair
    counts, PMI over the key-sorted candidate array with the same
    float64 expression order as the engine."""
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "documents.parquet"),
                      columns=["text"])
    texts = t["text"].to_pylist()
    wc: Counter = Counter()
    for d in texts:
        if d:
            wc.update(d.split())
    n_tok = sum(wc.values())
    vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vwords = [w for w, _ in vocab]
    vcnt = np.array([c for _, c in vocab], np.int64)
    vid = {w: i for i, w in enumerate(vwords)}
    V = len(vwords)
    pcnt: Counter = Counter()
    for d in texts:
        if not d:
            continue
        cs = [vid.get(w, -1) for w in d.split()]
        for dd in range(1, window + 1):
            for i in range(len(cs) - dd):
                a, b = cs[i], cs[i + dd]
                if a >= 0 and b >= 0:
                    pcnt[min(a, b) * V + max(a, b)] += 1
    n_pairs = sum(pcnt.values())
    cand = sorted((kk, c) for kk, c in pcnt.items() if c >= min_count)
    if not cand:
        return ("SELECT CAST(NULL AS VARCHAR) AS w1, CAST(NULL AS VARCHAR)"
                " AS w2, CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE)"
                " AS pmi WHERE FALSE")
    key = np.array([kk for kk, _ in cand], np.int64)
    cnt = np.array([c for _, c in cand], np.int64)
    lo, hi = key // V, key % V
    num = cnt.astype(np.float64) * (float(n_tok) * float(n_tok))
    den = (float(n_pairs) * vcnt[lo].astype(np.float64)) \
        * vcnt[hi].astype(np.float64)
    pmi = np.log(num / den)
    top = np.lexsort((key, -pmi))[:k]
    rows = [(vwords[lo[i]], vwords[hi[i]], int(cnt[i]), float(pmi[i]))
            for i in top]
    return _values_sql(rows, ["w1", "w2", "cnt", "pmi"],
                       ["VARCHAR", "VARCHAR", "BIGINT", "DOUBLE"])


def triangles_sql(parquet_dir_env: bool = True) -> str:
    """Edge list of pr_graph rendered as VALUES + an independent ANSI
    three-way self-join triangle count (each triangle counted once at
    its id-ordered (u<v<w) corner pair)."""
    src, dst = pr_graph(sf_dir())
    rows = list(zip(src, dst))
    values = ", ".join(f"({a}, {b})" for a, b in rows)
    return (
        f"WITH raw(a, b) AS (VALUES {values}), "
        "e AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v "
        "FROM raw WHERE a <> b) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
        "FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v "
        "JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v"
    )


def chi2_drift_sql() -> str:
    """Mirror of q_chi2_drift: per-side event_type counts (sides =
    user_id parity), two-sample chi-square with the same sorted
    category order and float64 op order as ml/metrics.chi2_drift."""
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["user_id", "event_type"])
    ca: Counter = Counter()
    cb: Counter = Counter()
    for u, e in zip(t["user_id"].to_pylist(),
                    t["event_type"].to_pylist()):
        if u is None or e is None:
            continue
        (ca if u % 2 == 0 else cb)[str(e)] += 1
    cats = sorted(set(ca) | set(cb))
    a = np.array([ca.get(c, 0) for c in cats], np.int64)
    b = np.array([cb.get(c, 0) for c in cats], np.int64)
    n_a, n_b = int(a.sum()), int(b.sum())
    k = len(cats)
    if n_a == 0 or n_b == 0 or k < 2:
        chi2 = None
    else:
        n = float(n_a + n_b)
        tot = (a + b).astype(np.float64)
        ea = tot * float(n_a) / n
        eb = tot * float(n_b) / n
        da = a.astype(np.float64) - ea
        db = b.astype(np.float64) - eb
        chi2 = float(np.sum(da * da / ea) + np.sum(db * db / eb))
    return _values_sql([(chi2, max(k - 1, 0), n_a, n_b)],
                       ["chi2", "dof", "n_a", "n_b"],
                       ["DOUBLE", "BIGINT", "BIGINT", "BIGINT"])


def psi_drift_sql(eps: float = 1e-4) -> str:
    """Mirror of q_psi_drift: per-side event_type counts (sides =
    user_id parity), PSI with the same sorted order, eps floor and
    array-numpy op order as ml/metrics.psi_drift."""
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir(), "events.parquet"),
                      columns=["user_id", "event_type"])
    ca: Counter = Counter()
    cb: Counter = Counter()
    for u, e in zip(t["user_id"].to_pylist(),
                    t["event_type"].to_pylist()):
        if u is None or e is None:
            continue
        (ca if u % 2 == 0 else cb)[str(e)] += 1
    cats = sorted(set(ca) | set(cb))
    a = np.array([ca.get(c, 0) for c in cats], np.int64)
    b = np.array([cb.get(c, 0) for c in cats], np.int64)
    n_a, n_b = int(a.sum()), int(b.sum())
    if n_a == 0 or n_b == 0:
        psi = None
    else:
        pa_p = np.maximum(a.astype(np.float64) / float(n_a), eps)
        pb_p = np.maximum(b.astype(np.float64) / float(n_b), eps)
        psi = float(np.sum((pa_p - pb_p) * np.log(pa_p / pb_p)))
    return _values_sql([(psi, n_a, n_b)], ["psi", "n_a", "n_b"],
                       ["DOUBLE", "BIGINT", "BIGINT"])
