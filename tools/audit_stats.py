"""Per-operator profiling audit for the headline pipelines.

Runs the flagship parse→enrich→route→aggregate bench shape (and,
with --curation, the decontaminate→chunk curation shape) and prints
Ray Data's ``ds.stats()`` plus a compact per-operator wall/cpu/rows
table — the "is wall time dominated by useful compute?" check. Use
this after touching any hot stage: a healthy flagship profile shows
the fused ReadParquet->MapBatches operator carrying ~all of the
wall time and the post-aggregate exchanges at aggregate scale
(KB-sized partials, milliseconds).

Usage:
    python tools/audit_stats.py [--rows 4000000] [--cpus 32] [--curation]

Owns its Ray session (tool entry point, like bench.py).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _summarize(stats: str) -> str:
    """Compact per-operator lines out of the verbose stats blob."""
    out = []
    for block in re.split(r"\n(?=Operator )", stats):
        m = re.match(r"Operator (\d+) (\S+?):", block)
        if not m:
            continue
        name = m.group(2)
        wall = re.search(r"\* Remote wall time: .*?, (\S+) total", block)
        udf = re.search(r"\* UDF time: .*?, (\S+) total", block)
        rows = re.search(r"\* Output num rows per block: .*?, (\d+) total", block)
        out.append(f"  op{m.group(1)} {name}: "
                   f"remote-wall={wall.group(1) if wall else '?'} "
                   f"udf={udf.group(1) if udf else '-'} "
                   f"rows={rows.group(1) if rows else '?'}")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--curation", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from vector_ray.pipelines.flagship import run_streaming_fused

    files, _ = bench._flagship_files(args.rows)
    bench._warm(os.path.dirname(files[0]))
    t0 = time.time()
    agg = run_streaming_fused(files, concurrency=args.cpus).materialize()
    n = agg.count()
    sec = time.time() - t0
    print(f"== flagship: {args.rows} rows in {sec:.3f}s "
          f"({args.rows / sec / 1e6:.2f}M seq/s), {n} aggregate rows ==")
    stats = agg.stats()
    print(_summarize(stats))
    print("\n---- full ds.stats() ----")
    print(stats)

    if args.curation:
        print("\n== curation ==")
        t0 = time.time()
        sec = bench.run_curation_bench(args.cpus, args.rows)
        print(f"curation: {sec:.3f}s (see per-op prints above; "
              "curation consumes internally)")
    ray.shutdown()


if __name__ == "__main__":
    main()
