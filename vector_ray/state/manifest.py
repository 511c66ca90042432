"""Per-partition lineage manifest — the batch replacement for Vector's
file-offset checkpointer (lib/file-source/src/checkpointer.rs:42-46)
and end-to-end ack tree (lib/vector-core/src/event/finalization.rs).

A run over N input fragments records, per fragment, an atomic JSON
entry: input fragment path(s) → output directory, row counters per
stage, wall time. A rerun loads the manifest, SKIPS fragments whose
entry exists and whose outputs are present, and processes only the
remainder — "resumable from checkpoint with per-partition lineage +
counters" (BASELINE.json north_rule).

Entries are written atomically (tmp file + rename) AFTER the
fragment's outputs are durably written, so a crash mid-fragment leaves
no entry and the fragment is redone (exactly-once at the fragment
level via idempotent overwrite of the fragment's output dir).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, Optional


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, pid: str) -> str:
        return os.path.join(self.dir, f"{pid}.json")

    def is_done(self, pid: str) -> bool:
        return os.path.exists(self._path(pid))

    def entry(self, pid: str) -> Optional[dict]:
        p = self._path(pid)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def done_partitions(self) -> Dict[str, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out[name[:-5]] = json.load(f)
        return out

    def mark_done(self, pid: str, *, inputs, outputs, counters: dict, seconds: float):
        entry = {
            "partition": pid,
            "inputs": inputs,
            "outputs": outputs,
            "counters": counters,
            "seconds": round(seconds, 3),
            "completed_at": time.time(),
        }
        tmp = self._path(pid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._path(pid))

    def clear_partition_output(self, path: str):
        """Idempotent redo: drop a fragment's partial output dir."""
        if os.path.exists(path):
            shutil.rmtree(path)

    def totals(self) -> dict:
        """Aggregate counters across completed partitions."""
        agg: dict = {}
        for e in self.done_partitions().values():
            for k, v in e.get("counters", {}).items():
                agg[k] = agg.get(k, 0) + v
        return agg
