"""Generic resumable partitioned execution — the flagship's
per-fragment manifest pattern (pipelines/flagship.py + state/manifest)
exposed as a reusable runner for ANY batch pipeline:

    run_resumable(files, out_dir, lambda ds: my_pipeline(ds))

Each input-fragment group becomes one partition: its output lands in
an idempotent per-partition directory, and an atomic manifest entry
(inputs → outputs, row counters, wall time) is written only after the
parquet is durable. A rerun skips every partition whose entry and
outputs exist — crash recovery costs only the unfinished partitions,
never a full recompute. This is the batch replacement for the
reference's file checkpointer (lib/file-source/src/checkpointer.rs:42)
and ack tree (finalization.rs)."""

from __future__ import annotations

import glob
import hashlib
import os
import time
from typing import Callable, Optional, Sequence

import ray.data as rd

from vector_ray.state.manifest import RunManifest


def _pid(paths: Sequence[str]) -> str:
    h = hashlib.sha1("\x1f".join(sorted(paths)).encode()).hexdigest()[:16]
    return f"p-{h}"


def run_resumable(
    files: Sequence[str],
    out_dir: str,
    pipeline: Callable,
    *,
    files_per_partition: int = 1,
    read_kwargs: Optional[dict] = None,
) -> dict:
    """Run ``pipeline(ds) -> Dataset`` over each fragment group,
    writing per-partition parquet with manifest lineage. Returns
    {"partitions": n, "skipped": n, "outputs": [dirs], "counters": {...}}.
    """
    files = sorted(files)
    manifest = RunManifest(out_dir)
    groups = [files[i : i + files_per_partition]
              for i in range(0, len(files), files_per_partition)]
    skipped = 0
    outputs = []
    for group in groups:
        pid = _pid(group)
        part_dir = os.path.join(out_dir, "parts", pid)
        if manifest.is_done(pid) and glob.glob(os.path.join(part_dir, "*.parquet")):
            skipped += 1
            outputs.append(part_dir)
            continue
        t0 = time.time()
        manifest.clear_partition_output(part_dir)
        ds = rd.read_parquet(group, override_num_blocks=len(group),
                             **(read_kwargs or {}))
        rows_in = ds.count()
        out_ds = pipeline(ds)
        os.makedirs(part_dir, exist_ok=True)
        out_ds.write_parquet(part_dir)
        rows_out = sum(
            __import__("pyarrow.parquet", fromlist=["ParquetFile"]).ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(part_dir, "*.parquet"))
        )
        manifest.mark_done(pid, inputs=group, outputs=[part_dir],
                           counters={"rows_in": rows_in, "rows_out": rows_out},
                           seconds=time.time() - t0)
        outputs.append(part_dir)
    totals = manifest.totals()
    return {"partitions": len(groups), "skipped": skipped,
            "outputs": outputs, "counters": totals}
