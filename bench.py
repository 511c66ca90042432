"""Benchmark harness.

Plain run: executes the headline flagship pipeline — parse → enrich →
route → aggregate (+ token-sequence MinHash signatures) over the
synthesized tokenized-log table (the BASELINE.json input shape) as ONE
fused actor-pool stage (vector_ray.pipelines.flagship.FlagshipWorker:
only KB-sized partial aggregates cross the object store) — plus a set
of sf-dir pipelines, and prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "flagship_rows": N, "flagship_rows_per_sec": R}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), VR_BENCH_ROWS (default 4_000_000 tokenized rows),
VR_BENCH_REPS (scaling repetitions per level, default 3).

--scaling: the sandbox stand-in for N vs 4N nodes — runs the flagship
in FRESH processes at num_cpus=8 and num_cpus=32 on the same cached
input, ALTERNATING the two levels VR_BENCH_REPS times and taking the
best per level (this host is a shared VM with 2x run-to-run variance —
see BASELINE.md "Measured"), plus a pure-CPU calibration (same
protocol, busy-loop tasks) that bounds what the host itself allows.
Prints throughputs at both levels + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _warm(path: str):
    """Warm the page cache so runs measure compute+shuffle, not first disk read."""
    import glob

    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def _flagship_files(bench_rows: int):
    import glob

    from vector_ray.sources.synth import synth_parquet

    # fragment size trades per-block overhead against fan-out: 62.5k
    # rows/fragment gives 32 CPUs >= 2 blocks/slot at the 4M default
    # while keeping blocks ~70 MB (VR_BENCH_ROWS_PER_FILE overrides)
    per_file = int(os.environ.get("VR_BENCH_ROWS_PER_FILE", "62500"))
    tok_path = synth_parquet(bench_rows, seed=42, rows_per_file=per_file)
    return sorted(glob.glob(os.path.join(tok_path, "part-*.parquet"))), tok_path


def run_flagship_bench(ncpu: int, bench_rows: int, sig_hashes: int = 8) -> float:
    """Timed fused flagship at the given parallelism; Ray must already
    be initialised. Returns seconds. ``sig_hashes`` > 8 raises the
    per-byte ALU work (the compute-bound scaling variant)."""
    import ray.data as rd

    from vector_ray.pipelines.flagship import run_streaming_fused
    from vector_ray.sources.synth import synth_parquet

    import glob

    # untimed warmup at FULL parallelism: enough tiny fragments that
    # every prestarted worker process spawns and imports before timing
    wsrc = synth_parquet(64_000, seed=13, rows_per_file=1_000)
    wfiles = sorted(glob.glob(os.path.join(wsrc, "part-*.parquet")))
    run_streaming_fused(wfiles, concurrency=max(2, ncpu - 2), token_sig=True,
                        sig_hashes=sig_hashes).to_pandas()

    files, tok_path = _flagship_files(bench_rows)
    _warm(tok_path)
    t0 = time.time()
    agg = run_streaming_fused(files, concurrency=max(2, ncpu - 2), token_sig=True,
                              sig_hashes=sig_hashes).to_pandas()
    sec = time.time() - t0
    assert len(agg) > 0
    return sec


def run_minhash_bench(ncpu: int, rows: int, num_hashes: int = 32) -> float:
    """Timed token-minhash near-dup pipeline (sig kernel + LSH band
    explode + all-to-all groupby + pair verify) — the second scaling
    SHAPE next to the map-only flagship: it contains a real shuffle.
    Ray must already be initialised. Returns seconds."""
    import glob

    import ray.data as rd

    from vector_ray.ml.dedup import token_minhash_pairs
    from vector_ray.sources.synth import synth_parquet

    # untimed warmup at full parallelism
    wsrc = synth_parquet(64_000, seed=13, rows_per_file=1_000)
    wfiles = sorted(glob.glob(os.path.join(wsrc, "part-*.parquet")))
    token_minhash_pairs(
        rd.read_parquet(wfiles, override_num_blocks=len(wfiles)),
        num_hashes=num_hashes, bands=4,
    ).count()

    # ≥64 fragments: at the smaller minhash row count the flagship's
    # 62.5k rows/file would give only ~8 blocks — the sig stage could
    # never use 32 CPUs and the scaling number measured the file count
    per_file = int(os.environ.get("VR_BENCH_MINHASH_ROWS_PER_FILE", str(max(4000, rows // 64))))
    tok_path = synth_parquet(rows, seed=42, rows_per_file=per_file)
    files = sorted(glob.glob(os.path.join(tok_path, "part-*.parquet")))
    _warm(tok_path)
    t0 = time.time()
    n = token_minhash_pairs(
        rd.read_parquet(files, override_num_blocks=len(files)),
        num_hashes=num_hashes, bands=4,
    ).count()
    sec = time.time() - t0
    assert n >= 0
    return sec


def run_curation_bench(ncpu: int, rows: int) -> float:
    """Timed corpus-curation pipeline: decontaminate (broadcast n-gram
    probe, drop) → chunk_sequences (vectorized 1→N window split) over
    the tokenized table — the map-only token-payload shape touching
    every token twice. Ray must already be initialised."""
    import glob

    import numpy as np
    import ray.data as rd

    from vector_ray.ml.tokens import chunk_sequences, decontaminate
    from vector_ray.sources.synth import synth_parquet, synth_table

    wsrc = synth_parquet(64_000, seed=13, rows_per_file=1_000)
    wfiles = sorted(glob.glob(os.path.join(wsrc, "part-*.parquet")))
    bench_tbl = synth_table(np.arange(100, 130), seed=42)
    chunk_sequences(
        decontaminate(rd.read_parquet(wfiles, override_num_blocks=len(wfiles)),
                      bench_tbl, n=8, mode="drop"),
        512, overlap=64,
    ).count()

    files, tok_path = _flagship_files(rows)
    _warm(tok_path)
    t0 = time.time()
    n = chunk_sequences(
        decontaminate(rd.read_parquet(files, override_num_blocks=len(files)),
                      bench_tbl, n=8, mode="drop"),
        512, overlap=64,
    ).count()
    sec = time.time() - t0
    assert n > 0
    return sec


def run_pack_bench(ncpu: int, rows: int) -> float:
    """Timed pack_sequences over (doc_id, n_tok, source) — columns
    pruned at the read; the cost is the (source, shard) bucket shuffle
    plus O(#packs) searchsorted jumps."""
    import glob

    import ray.data as rd

    from vector_ray.ml.tokens import pack_sequences
    from vector_ray.sources.synth import synth_parquet

    wsrc = synth_parquet(64_000, seed=13, rows_per_file=1_000)
    wfiles = sorted(glob.glob(os.path.join(wsrc, "part-*.parquet")))
    pack_sequences(
        rd.read_parquet(wfiles, columns=["doc_id", "n_tok", "source"],
                        override_num_blocks=len(wfiles)), 2048,
    ).count()

    files, tok_path = _flagship_files(rows)
    _warm(tok_path)
    t0 = time.time()
    n = pack_sequences(
        rd.read_parquet(files, columns=["doc_id", "n_tok", "source"],
                        override_num_blocks=len(files)),
        2048, num_shards=max(64, 4 * ncpu),
    ).count()
    sec = time.time() - t0
    assert n > 0
    return sec


def _line_corpus_parquet(n_docs: int, lines_per_doc: int = 10,
                         boiler_rate: int = 10, pool: int = 100) -> str:
    """Deterministic multi-line corpus for the line-dedup bench:
    every ``boiler_rate``-th line drawn from a ``pool`` of boilerplate
    lines (corpus-wide duplicates), the rest unique per (doc, line).
    Cached to /tmp keyed by shape — generation is untimed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/vr_bench_lines_{n_docs}_{lines_per_doc}_{boiler_rate}"
    done = os.path.join(root, "_done")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        per_file = max(n_docs // 32, 1)
        doc = 0
        fi = 0
        while doc < n_docs:
            hi = min(doc + per_file, n_docs)
            texts = []
            for i in range(doc, hi):
                lines = [
                    (f"boilerplate banner line number {(i * 7 + j) % pool} of the pool."
                     if j % boiler_rate == 0
                     else f"unique content line {i} {j} with some padding words here.")
                    for j in range(lines_per_doc)
                ]
                texts.append("\n".join(lines))
            t = pa.table({
                "doc_id": pa.array(range(doc, hi), pa.int64()),
                "text": pa.array(texts, pa.string()),
            })
            pq.write_table(t, os.path.join(root, f"part-{fi:05d}.parquet"))
            doc, fi = hi, fi + 1
        open(done, "w").close()
    return root


def run_linededup_bench(ncpu: int, n_docs: int) -> float:
    """Timed corpus-wide line dedup (count pass + rewrite pass) over a
    cached multi-line corpus — the RefinedWeb boilerplate-removal
    shape: text payload read twice, only (hash, count) rows shuffle."""
    import glob

    import ray.data as rd

    from vector_ray.ml.clean import line_dedup

    path = _line_corpus_parquet(n_docs)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    _warm(path)
    # full-size untimed warmup: this job's compute (~2-3 s) is small
    # enough that the fresh-session ramp (worker spawn + imports +
    # first-touch object-store allocation) would otherwise dominate
    # the measurement — an 8k-doc warmup demonstrably does NOT absorb
    # it (rep0 9.7 s vs rep1 3.7 s after a small warmup)
    line_dedup(rd.read_parquet(files, override_num_blocks=len(files))).count()
    t0 = time.time()
    n = line_dedup(
        rd.read_parquet(files, override_num_blocks=len(files))).count()
    sec = time.time() - t0
    assert n == n_docs
    return sec


def _edges_parquet(n_edges: int, n_nodes: int) -> str:
    """Deterministic directed edge table for the PageRank bench
    (formula edges + a hub skew). Cached; generation untimed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/vr_bench_edges_{n_edges}_{n_nodes}"
    done = os.path.join(root, "_done")
    if not os.path.exists(done):
        os.makedirs(root, exist_ok=True)
        per_file = max(n_edges // 32, 1)
        e = 0
        fi = 0
        while e < n_edges:
            hi = min(e + per_file, n_edges)
            i = np.arange(e, hi, dtype=np.int64)
            src = (i * 2654435761) % n_nodes
            dst = np.where(i % 17 == 0, 0, (src * 7 + i * 3 + 11) % n_nodes)
            pq.write_table(pa.table({"src": pa.array(src),
                                     "dst": pa.array(dst)}),
                           os.path.join(root, f"part-{fi:05d}.parquet"))
            e, fi = hi, fi + 1
        open(done, "w").close()
    return root


def run_pagerank_bench(ncpu: int, n_edges: int, n_nodes: int,
                       iters: int = 5) -> float:
    """Timed fixed-point PageRank (broadcast mode): per iteration one
    map-only pass over the index-encoded edges + an O(nodes) driver
    combine."""
    import glob

    import ray.data as rd

    from vector_ray.ml.graph import pagerank

    wpath = _edges_parquet(100_000, 20_000)
    wfiles = sorted(glob.glob(os.path.join(wpath, "part-*.parquet")))
    pagerank(rd.read_parquet(wfiles, override_num_blocks=len(wfiles)),
             iters=2).count()

    path = _edges_parquet(n_edges, n_nodes)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    _warm(path)
    t0 = time.time()
    n = pagerank(rd.read_parquet(files, override_num_blocks=len(files)),
                 iters=iters).count()
    sec = time.time() - t0
    assert n > 0
    return sec


def run_bench(sf_dir: str, ncpu: int, bench_rows: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    queries: dict[str, float] = {}
    flagship_reps = int(os.environ.get("VR_BENCH_FLAGSHIP_REPS", "3"))
    flagship_sec = min(run_flagship_bench(ncpu, bench_rows) for _ in range(flagship_reps))
    queries["flagship"] = round(flagship_sec, 3)
    queries["curation"] = round(
        min(run_curation_bench(ncpu, bench_rows) for _ in range(flagship_reps)), 3
    )
    queries["pack"] = round(
        min(run_pack_bench(ncpu, bench_rows) for _ in range(flagship_reps)), 3
    )
    queries["line_dedup"] = round(
        min(run_linededup_bench(ncpu, 200_000) for _ in range(flagship_reps)), 3
    )
    queries["pagerank"] = round(
        min(run_pagerank_bench(ncpu, 3_000_000, 500_000)
            for _ in range(flagship_reps)), 3
    )

    # ---- sf-dir pipelines (reuse the driver-contract queries) ----
    import __ray_entry__ as entrymod

    _warm(sf_dir)
    sf_queries = [
        "q1_lineitem",
        "agg_source_stats",
        "window_events",
        "route_events",
        "json_parse_props",
        "knn_embeddings",
        "exact_dedup_docs",
        "minhash_pairs",
        "grouped_percentiles",
        "topk_users",
        "hopping_window",
        "dd_search_events",
        "apache_log_parse",
        "semantic_dedup",
        "lm_perplexity",
        "tfidf_docs",
        "c4_clean_docs",
        "url_dedup_docs",
        "window_shift",
        "rollup_orders",
        "full_outer_join",
        "cube_orders",
        "rank_lineitem",
        "broadcast_join_parts",
        "dsir_select",
        "resample_events",
        "range_join_events",
        "grouped_var",
        "profile_orders",
        "ffill_events",
        "nb_classify_docs",
        "pca_embeddings",
        "bm25_search",
        "hist_quantiles",
        "pq_search",
        "funnel_events",
        "retention_cohorts",
        "knn_graph",
        "theta_join",
        "rolling_range",
        "entropy_docs",
        "apply_changeset",
        "audit_docs",
        "minhash_index",
        "inverted_search",
        "scd2_user_state",
        "kmeans_embeddings",
        "standardize_lineitem",
        "bucketize_events",
        "ewma_events",
        "winsorize_events",
        "rate_events",
        "argmax_events",
        "semantic_join",
        "log_templates",
        "one_hot_events",
        "target_encode",
        "minmax_events",
        "robust_scale_events",
        "grouped_standardize",
        "approx_quantiles",
        "diverse_select",
        "fuzzy_join_suppliers",
        "zorder_events",
        "vrl_remap_events",
        "grouped_heavy_hitters",
        "resolve_entities",
        "grouped_mad_outliers",
        "rank_orders",
        "merge_intervals",
        "dedup_keep_best",
        "weighted_key_cap",
        "pmi_pairs",
        "auc_events",
        "grouped_auc",
        "triangles_hosts",
        "classification_report",
        "quantiles_cont",
        "grouped_quantiles_cont",
        "ks_drift",
        "chi2_drift",
        "psi_drift",
        "throttle_events",
        "ttl_dedupe_events",
        "session_paths",
        "interval_join_events",
        "assign_sessions",
        "stats_pruned_read",
        "seen_filter_docs",
        "incremental_agg",
        "lake_delete_compact",
        "minhash_ingest",
        "template_novelty",
        "seen_ttl_users",
    ]
    qs = entrymod.queries()
    # best-of-N with ROUND-ROBIN reps (q1,q2,...,q1,q2,...): a host-noise
    # window hits one rep of every query instead of every rep of one
    # query, so no single query can print a phantom 2-3x swing
    query_reps = int(os.environ.get("VR_BENCH_QUERY_REPS", "3"))
    for rep in range(query_reps):
        for name in sf_queries:
            t0 = time.time()
            res = qs[name](sf_dir)
            try:
                res.to_pandas()
            except AttributeError:
                pass
            sec = round(time.time() - t0, 3)
            if rep == 0 or sec < queries[name]:
                queries[name] = sec

    ray.shutdown()
    return {
        "metric": "end-to-end parse→enrich→route→aggregate throughput (flagship sec; sequences/sec)",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "flagship_rows": bench_rows,
        "flagship_rows_per_sec": round(bench_rows / flagship_sec, 1),
    }


def _job_once_subprocess(job: str, ncpu: int, bench_rows: int, hashes: int) -> float:
    """One fresh-process timing of a named bench job (scaling unit)."""
    call = {
        "flagship": "bench.run_flagship_bench(%d, %d, sig_hashes=%d)" % (ncpu, bench_rows, hashes),
        "minhash": "bench.run_minhash_bench(%d, %d, num_hashes=%d)" % (ncpu, bench_rows, hashes),
        "line_dedup": "bench.run_linededup_bench(%d, %d)" % (ncpu, bench_rows),
    }[job]
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import ray, bench\n"
        "ray.init(address='local', num_cpus=%d, include_dashboard=False, logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "print(%s)\n"
        "ray.shutdown()\n" % (REPO, ncpu, call)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def _flagship_once_subprocess(ncpu: int, bench_rows: int, sig_hashes: int = 8) -> float:
    return _job_once_subprocess("flagship", ncpu, bench_rows, sig_hashes)


def _cpu_calibration(ncpu: int, seconds: float = 6.0) -> float:
    """Pure-ALU calibration: ncpu busy-loop processes; returns aggregate
    Miter/s. Bounds the host's deliverable CPU at this level."""
    code = (
        "import time\n"
        "t0=time.time(); n=0\n"
        f"while time.time()-t0<{seconds}:\n"
        "    for _ in range(100000): n+=1\n"
        "print(n)"
    )
    ps = [subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE) for _ in range(ncpu)]
    total = sum(int(p.communicate()[0]) for p in ps)
    return total / seconds / 1e6


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("VR_BENCH_ROWS", "4000000"))
    reps = int(os.environ.get("VR_BENCH_REPS", "3"))

    if "--scaling" in sys.argv:
        lo, hi = 8, 32

        def measure(rows: int, sig_hashes: int, job: str = "flagship") -> dict:
            best = {lo: float("inf"), hi: float("inf")}
            runs = {lo: [], hi: []}
            for _ in range(reps):  # alternate levels: the host is bursty
                for level in (hi, lo):
                    sec = _job_once_subprocess(job, level, rows, sig_hashes)
                    runs[level].append(round(sec, 2))
                    best[level] = min(best[level], sec)
            thr = {k: rows / v for k, v in best.items()}
            return {
                "sec_8": round(best[lo], 3),
                "sec_32": round(best[hi], 3),
                "runs_8": runs[lo],
                "runs_32": runs[hi],
                "rows_per_sec_8": round(thr[lo], 1),
                "rows_per_sec_32": round(thr[hi], 1),
                "scaling_efficiency": round((thr[hi] / thr[lo]) / (hi / lo), 3),
                "rows": rows,
                "sig_hashes": sig_hashes,
            }

        # memory-bound variant: the production config (8 sig hashes) —
        # dominated by parquet decode + Arrow passes, which saturate the
        # shared VM's memory bus near 8 workers (BASELINE.md "Measured").
        mem = measure(bench_rows, 8)
        # compute-bound variant: 128 sig hashes ≈ 16x the ALU per byte in
        # the fused C kernel; per-byte compute high enough that the
        # memory bus is no longer the binding constraint, isolating the
        # ENGINE's scaling from the host ceiling.
        comp = measure(max(bench_rows // 2, 250_000), 128)
        # second pipeline SHAPE (verdict r2 item 9): token-minhash
        # near-dup — compute-heavy sig kernel plus a real all-to-all
        # LSH groupby, so the ≥0.8 claim doesn't rest on the map-only
        # flagship alone. 32 hashes ≈ 4x the production sig work.
        mh = measure(max(bench_rows // 8, 250_000), 32, job="minhash")
        # third pipeline SHAPE: corpus-wide line dedup — text-curation
        # two-pass plan (buffer-speed line index + hash, pre-aggregated
        # count exchange, broadcast probe + rewrite); rows = docs.
        ld = measure(200_000, 0, job="line_dedup")
        cal_lo, cal_hi = _cpu_calibration(lo), _cpu_calibration(hi)
        cal_eff = (cal_hi / cal_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (flagship, num_cpus 8 vs 32, best of %d alternating)" % reps,
                    **{k: v for k, v in mem.items() if k != "sig_hashes"},
                    "flagship_rows": bench_rows,
                    "memory_bound": mem,
                    "compute_bound": comp,
                    "minhash_compute_bound": mh,
                    "line_dedup_text": ld,
                    "host_cpu_calibration_eff_8_to_32": round(cal_eff, 3),
                }
            )
        )
        return

    print(json.dumps(run_bench(sf_dir, ncpu, bench_rows)))


if __name__ == "__main__":
    main()
