"""Deterministic synthetic tokenized-log table (FIXTURES.md F1, the
authoritative input shape from BASELINE.json):

    doc_id:string   "{app}-{host}.{tld}-{seq:08d}"  (grok/regex-parseable)
    tokens:list<int32>  values in [0, 50257), length n_tok
    n_tok:int32     log-uniform-ish in [1, 2048]
    source:string   skewed categorical over 50 keys — hot key ~30% of rows

All values are pure counter-based functions of the row id (splitmix64),
so generation is embarrassingly parallel AND identical regardless of
batch boundaries / parallelism — the property a 10^12-row generator on
a 256-node cluster needs (mirrors src/sources/generator.rs's role as
the deterministic load source; seeded there at generator.rs:24-36).

Everything is vectorized numpy; the tokens column is built as ONE flat
int32 buffer + offsets → pa.ListArray (no per-row Python).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)

APPS = np.array(["web", "api", "db", "cache", "auth"])
HOSTS = np.array(["alpha", "bravo", "citrus", "delta", "ember", "fjord", "gale", "hazel"])
TLDS = np.array(["com", "net", "io", "dev"])
N_SOURCES = 50
VOCAB = 50257
MAX_TOK = 2048


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain PRNG finalizer)."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U64) + _U64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
        return (z ^ (z >> _U64(31))) & _MASK


def _hash01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    h = _splitmix64(ids.astype(_U64) ^ _U64((seed * 1315423911 + stream * 2654435761) & 0xFFFFFFFFFFFFFFFF))
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


def synth_table(ids: np.ndarray | int, seed: int = 42) -> pa.Table:
    """Build the table for the given row ids (or range(n))."""
    if isinstance(ids, int):
        ids = np.arange(ids, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)

    # n_tok: log-uniform in [1, 2048] (zipf-ish: mass at short sequences)
    u = _hash01(ids, 1, seed)
    n_tok = np.floor(MAX_TOK ** u).astype(np.int32)
    n_tok = np.maximum(n_tok, 1)

    # tokens: flat counter-based fill
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    rep_ids = np.repeat(ids.astype(_U64), n_tok)
    intra = (np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)).astype(_U64)
    with np.errstate(over="ignore"):
        flat = _splitmix64((rep_ids * _U64(0x9E3779B97F4A7C15) + intra) ^ _U64(seed))
    tokens_flat = (flat % _U64(VOCAB)).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tokens_flat))

    # source: ~30% on the hot key, quadratic tail over the remaining 49
    us = _hash01(ids, 2, seed)
    src_idx = np.where(
        us < 0.30, 0, 1 + np.minimum((((us - 0.30) / 0.70) ** 2 * (N_SOURCES - 1)).astype(np.int64), N_SOURCES - 2)
    )
    source = np.array([f"syslog-{i:02d}" for i in range(N_SOURCES)])[src_idx]

    # doc_id: "{app}-{host}.{tld}-{seq:08d}"
    ha = _splitmix64(ids.astype(_U64) ^ _U64(seed * 7 + 3))
    app = APPS[(ha % _U64(len(APPS))).astype(np.int64)]
    host = HOSTS[((ha >> _U64(8)) % _U64(len(HOSTS))).astype(np.int64)]
    tld = TLDS[((ha >> _U64(16)) % _U64(len(TLDS))).astype(np.int64)]
    # %08d semantics: pad to 8, keep ALL digits beyond (np.char.zfill
    # alone truncates to U8 — ids past 10^8 would collide)
    strs = ids.astype("U20")
    seq = np.where(np.char.str_len(strs) >= 8, strs, np.char.zfill(strs, 8).astype("U20"))
    doc_id = np.char.add(
        np.char.add(np.char.add(np.char.add(np.char.add(app, "-"), host), "."), np.char.add(tld, "-")),
        seq,
    )

    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "tokens": tokens,
            "n_tok": pa.array(n_tok),
            "source": pa.array(source),
        }
    )


def _write_fragment(path: str, part: int, lo: int, hi: int, seed: int):
    tbl = synth_table(np.arange(lo, hi, dtype=np.int64), seed)
    pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))


def synth_parquet(n: int, seed: int = 42, *, rows_per_file: int = 250_000, root: str = "/tmp/vector_ray_synth") -> str:
    """Write (once, cached) the n-row table as a multi-fragment Parquet
    dir — multiple fragments so partition lineage/resume is exercised.
    Generation is counter-based per fragment, so when a Ray session is
    live the fragments are generated IN PARALLEL as Ray tasks (output is
    byte-identical to the serial path)."""
    path = os.path.join(root, f"n{n}_seed{seed}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    ranges = []
    i = part = 0
    while i < n:
        hi = min(i + rows_per_file, n)
        ranges.append((part, i, hi))
        i = hi
        part += 1
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(ranges) > 1
    except Exception:
        pass
    if use_ray:
        import ray

        frag = ray.remote(num_cpus=1)(_write_fragment)
        ray.get([frag.remote(path, p, lo, hi, seed) for p, lo, hi in ranges])
    else:
        for p, lo, hi in ranges:
            _write_fragment(path, p, lo, hi, seed)
    with open(done, "w") as f:
        f.write(str(n))
    return path


def synth_dataset(n: int, seed: int = 42, *, parallelism: int | None = None):
    """Ray Dataset over the cached Parquet (preferred: exercises the real
    read path). For tiny n (<100k) generates inline instead."""
    import ray.data as rd

    if n <= 100_000:
        ids = np.arange(n, dtype=np.int64)
        return rd.from_arrow(synth_table(ids, seed))
    path = synth_parquet(n, seed)
    import glob

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    return rd.read_parquet(files)


def source_lookup_table(*, n_sources: int = N_SOURCES) -> pa.Table:
    """Enrichment fixture (FIXTURES.md F3): source → region, tier, dates."""
    regions = ["us-east", "us-west", "eu-central", "ap-south"]
    rows = {
        "source": [f"syslog-{i:02d}" for i in range(n_sources)],
        "region": [regions[i % len(regions)] for i in range(n_sources)],
        "tier": ["hot" if i < 5 else ("warm" if i < 20 else "cold") for i in range(n_sources)],
        "start_date": ["2024-01-01"] * n_sources,
        "end_date": ["2026-12-31"] * n_sources,
    }
    return pa.table(rows)


def generator_lines(n: int, fmt: str = "apache", seed: int = 42) -> pa.Table:
    """src/sources/generator.rs:55-67 formats (apache/syslog/json/shuffle)
    as a deterministic message-line table for parser tests/benches."""
    ids = np.arange(n, dtype=np.int64)
    h = _splitmix64(ids.astype(_U64) ^ _U64(seed))
    hosts = HOSTS[(h % _U64(len(HOSTS))).astype(np.int64)]
    status = np.array([200, 200, 200, 301, 404, 500, 503])[((h >> _U64(8)) % _U64(7)).astype(np.int64)]
    nbytes = ((h >> _U64(16)) % _U64(100_000)).astype(np.int64)
    methods = np.array(["GET", "GET", "GET", "POST", "PUT"])[((h >> _U64(24)) % _U64(5)).astype(np.int64)]
    paths = np.array(["/", "/api/v1/items", "/login", "/static/app.js", "/health"])[
        ((h >> _U64(32)) % _U64(5)).astype(np.int64)
    ]
    if fmt == "apache":
        lines = [
            f'{hosts[i]}.example.com - frank [10/Oct/2000:13:55:36 -0700] "{methods[i]} {paths[i]}" {status[i]} {nbytes[i]}'
            for i in range(n)
        ]
    elif fmt == "syslog":
        lines = [
            f"<13>Feb  5 10:1{i % 10}:57 {hosts[i]} app[{100 + i % 900}]: status={status[i]} path={paths[i]}"
            for i in range(n)
        ]
    elif fmt == "json":
        lines = [
            f'{{"host": "{hosts[i]}", "method": "{methods[i]}", "path": "{paths[i]}", "status": {status[i]}, "bytes": {nbytes[i]}}}'
            for i in range(n)
        ]
    else:  # shuffle: word salad
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
        lines = [" ".join(words[(int(h[i]) >> (4 * k)) % 5] for k in range(6)) for i in range(n)]
    return pa.table({"message": pa.array(lines), "row_id": pa.array(ids)})


_WEB_WORDS = np.array(
    "data stream table merge sort index shard block cache query filter "
    "window batch token model train sample graph node edge vector".split())


def link_graph_table(n_edges: int = 20_000, n_nodes: int = 4_000,
                     seed: int = 7) -> pa.Table:
    """Deterministic directed link graph (src, dst) for graph-operator
    examples: Knuth-multiplicative src spread, formula dst with a hub
    skew (every 17th edge points at node 0), every 11th node left
    dangling. Counter-based — identical at any parallelism."""
    i = np.arange(n_edges, dtype=np.int64)
    src = (i * 2654435761 + seed) % n_nodes
    src = np.where(src % 11 == 0, (src + 1) % n_nodes, src)  # keep danglers
    dst = np.where(i % 17 == 0, 0, (src * 7 + i * 3 + 11) % n_nodes)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def web_docs_table(n: int = 2000, seed: int = 5) -> pa.Table:
    """Deterministic multi-line 'web page' corpus (doc_id, url, text)
    with planted curation signals for the web-curation operators:
    lines cycle through C4 outcomes (terminal punct / short / no punct
    / javascript), every 9th doc repeats a line, every 17th carries a
    brace artifact, every 4th carries a cross-doc cookie-banner line
    (corpus-wide boilerplate for line_dedup to strip — content lines
    embed a per-(doc,line) token so they are corpus-UNIQUE);
    URLs come as 3 raw variants per canonical
    (case / www / default port / tracking params / fragment) that must
    collapse under ml/urls normalization. Counter-based like every
    synth source — identical at any parallelism."""
    texts, urls = [], []
    ncanon = max(n // 3, 1)
    for i in range(n):
        lines = []
        for j in range(3 + i % 5):
            wl = [_WEB_WORDS[(i * 13 + j * 7 + w * 3 + seed) % len(_WEB_WORDS)]
                  for w in range(6)] + [f"v{i}n{j}"]
            r = (i + j) % 6
            if r == 0:
                lines.append(" ".join(wl) + ".")
            elif r == 1:
                lines.append(" ".join(wl) + "!")
            elif r == 2:
                lines.append(" ".join(wl[:3]))
            elif r == 3:
                lines.append("please enable javascript to continue.")
            elif r == 4:
                lines.append(" ".join(wl) + "?")
            else:
                lines.append(" ".join(wl))
        if i % 4 == 0:
            lines.append("accept all cookies to continue browsing this site.")
        if i % 9 == 0:
            lines.append(lines[0])
        if i % 17 == 0:
            lines.append("warning { token } artifact.")
        texts.append("\n".join(lines))

        k = i % ncanon
        rep = i // ncanon
        scheme = "http" if k % 2 else "https"
        host = f"site{k % 11}.example.com"
        path = f"/page/{k}"
        if rep == 1:
            port = ":80" if scheme == "http" else ":443"
            urls.append(f"{scheme}://WWW.{host.upper()}{port}{path}/"
                        f"?utm_source=gen&id={k}")
        elif rep == 2:
            urls.append(f"{scheme}://www.{host}{path}?id={k}&gclid=x#top")
        else:
            urls.append(f"{scheme}://{host}{path}?id={k}")
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array(urls),
        "text": pa.array(texts),
    })
