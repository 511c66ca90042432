"""Benchmark harness.

Plain run: executes the headline flagship pipeline (parse → enrich →
route → aggregate over the synthesized tokenized-log table, the
BASELINE.json input shape) plus a set of sf-dir pipelines, and prints
ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "flagship_rows": N, "flagship_rows_per_sec": R}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), VR_BENCH_ROWS (default 1_000_000 tokenized rows).

--scaling: runs the same bench twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same (cached) input — the sandbox
stand-in for N vs 4N nodes — and prints throughputs + scaling
efficiency.
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
    """Warm the page cache so both scaling runs measure compute+shuffle."""
    import glob

    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


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

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from vector_ray.pipelines.flagship import flagship_aggregate, parse_enrich_route
    from vector_ray.sources.synth import synth_parquet, synth_table

    import ray.data as rd

    queries: dict[str, float] = {}

    # ---- untimed warmup: spin up worker processes + import the library
    # in every worker so the timed run measures compute, not cold start
    wds = rd.from_arrow(synth_table(20_000)).repartition(ncpu)
    flagship_aggregate(parse_enrich_route(wds, enrich_concurrency=2)).to_pandas()

    # ---- headline: flagship over the tokenized-log table ----
    tok_path = synth_parquet(bench_rows, seed=42, rows_per_file=125_000)
    _warm(tok_path)
    t0 = time.time()
    import glob as _g

    files = sorted(_g.glob(os.path.join(tok_path, "part-*.parquet")))
    # one block per fragment: ~140 MB decoded blocks; Ray's default
    # 200-way min split would shatter these into 2.8 MB blocks and the
    # per-block overhead would dominate (measured 4-5x slower)
    ds = rd.read_parquet(files, override_num_blocks=len(files))
    routed = parse_enrich_route(ds, enrich_concurrency=max(2, ncpu // 4))
    agg = flagship_aggregate(routed).to_pandas()
    flagship_sec = time.time() - t0
    queries["flagship"] = round(flagship_sec, 3)
    assert len(agg) > 0

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
    ]
    qs = entrymod.queries()
    for name in sf_queries:
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume
        try:
            res.to_pandas()
        except AttributeError:
            pass
        queries[name] = round(time.time() - t0, 3)

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


def run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("VR_BENCH_ROWS", "4000000"))

    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_subprocess(lo)
        r_hi = run_subprocess(hi)
        thr_lo = r_lo["flagship_rows_per_sec"]
        thr_hi = r_hi["flagship_rows_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (flagship, num_cpus 8 vs 32)",
                    "sec_8": r_lo["value"],
                    "sec_32": r_hi["value"],
                    "rows_per_sec_8": thr_lo,
                    "rows_per_sec_32": thr_hi,
                    "scaling_efficiency": round(eff, 3),
                    "flagship_rows": bench_rows,
                }
            )
        )
        return

    result = run_bench(sf_dir, ncpu, bench_rows)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
