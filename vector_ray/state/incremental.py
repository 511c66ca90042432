"""Checkpointed incremental grouped aggregation.

An append-only log lake re-aggregated daily should not re-scan
yesterday's 100 TB: this keeps a per-group MERGEABLE-partial state
table on disk and, on each run, scans ONLY input fragments it has
not seen before, merges their partials into the state, checkpoints
the new state atomically, and finalizes the user-facing result from
state alone.

Same shape as the reference's interval-flush aggregate
(`src/transforms/aggregate.rs:72-107` — mergeable per-window
partials), lifted from process memory to durable parquet so the
"window" can span runs.

State channels per output column:
  count -> int64 (merge = sum)         sum -> input-typed (merge = sum)
  min/max -> input-typed (merge = min/max)
  mean -> decomposes to (sum, count) channels; finalized at read time.

100-TB plan: the scan of new fragments is the ordinary two-phase
grouped_aggregate (per-block partials, one bucketed merge); the state
merge unions the old state dataset (streamed from parquet — never
collected to the driver) with the new partials and re-aggregates with
the channel-merge kinds — one more bucketed exchange over
aggregate-sized rows. Checkpoints are whole directories swapped via a
pointer file (write new, flip pointer, prune old), so a killed run
leaves the previous state intact and simply re-scans its fragments.
Fragment identity is path+size+mtime (an overwritten file re-scans).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import shutil
from typing import Dict, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("count", "sum", "min", "max", "mean", "var", "std")


def _frag_id(path: str) -> str:
    # path+size+mtime: an overwritten file (even same byte size)
    # re-scans instead of silently keeping stale aggregates
    st = os.stat(path)
    h = hashlib.sha1(
        f"{path}\x1f{st.st_size}\x1f{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    return f"f-{h}"


def _is_hidden(path: str) -> bool:
    """Underscore/dot-prefixed path components are metadata sidecars
    (e.g. a _stats manifest written next to the data — datastats.py),
    never input fragments; mirroring datastats._list_parquet_files."""
    return any(part.startswith(("_", "."))
               for part in path.split(os.sep) if part)


def _expand(inputs) -> list:
    if isinstance(inputs, str):
        inputs = [inputs]
    out = []
    for p in inputs:
        if os.path.isdir(p):
            out.extend(
                f for f in _glob.glob(os.path.join(p, "**", "*.parquet"),
                                      recursive=True)
                if not _is_hidden(os.path.relpath(f, p)))
        else:
            out.extend(sorted(_glob.glob(p)) or [p])
    return sorted(out)


def _state_specs(aggs: Dict[str, Tuple[str, str]]):
    """(scan_specs, merge_specs, finalize plan). State column names are
    the output names except mean, which stores __<out>_sum/__<out>_cnt."""
    scan, merge, final = {}, {}, []
    for out, (kind, col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"incremental_aggregate: unsupported kind {kind!r}")
        if kind == "mean":
            scan[f"__{out}_sum"] = ("sum", col)
            scan[f"__{out}_cnt"] = ("count", col)
            merge[f"__{out}_sum"] = ("sum", f"__{out}_sum")
            merge[f"__{out}_cnt"] = ("sum", f"__{out}_cnt")
            final.append((out, "mean"))
        elif kind in ("var", "std"):
            # mergeable moments: n, float64 sum(x), sum(x^2) over a
            # derived squared column injected at scan time
            scan[f"__{out}_cnt"] = ("count", col)
            scan[f"__{out}_sum"] = ("sum", f"__f64_{col}")
            scan[f"__{out}_sq"] = ("sum", f"__sq_{col}")
            merge[f"__{out}_cnt"] = ("sum", f"__{out}_cnt")
            merge[f"__{out}_sum"] = ("sum", f"__{out}_sum")
            merge[f"__{out}_sq"] = ("sum", f"__{out}_sq")
            final.append((out, kind))
        else:
            scan[out] = (kind, col)
            merge[out] = ("sum" if kind == "count" else kind, out)
            final.append((out, kind))
    return scan, merge, final


class IncrementalAggregate:
    """``state_dir`` layout: ``current.json`` (pointer: state dir name +
    seen fragment ids), ``state-<n>/`` (parquet partial table)."""

    def __init__(self, state_dir: str, group_by: Sequence[str],
                 aggs: Dict[str, Tuple[str, str]]):
        self.state_dir = state_dir
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        self.scan_specs, self.merge_specs, self.final_plan = _state_specs(self.aggs)
        os.makedirs(state_dir, exist_ok=True)

    # -- pointer ------------------------------------------------------
    def _pointer(self) -> Optional[dict]:
        p = os.path.join(self.state_dir, "current.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _flip_pointer(self, state_name: str, frags: dict) -> None:
        p = os.path.join(self.state_dir, "current.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"state": state_name, "fragments": frags,
                       "group_by": self.group_by,
                       "aggs": {k: list(v) for k, v in self.aggs.items()}}, fh)
        os.replace(tmp, p)

    def _prune_old(self, keep: str) -> None:
        for name in os.listdir(self.state_dir):
            full = os.path.join(self.state_dir, name)
            if name.startswith("state-") and name != keep and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)

    # -- run ----------------------------------------------------------
    def update(self, inputs, *, read_columns: Optional[Sequence[str]] = None):
        """Scan unseen fragments of ``inputs``, merge into state,
        checkpoint. Returns {"new_fragments": n, "total_fragments": n,
        "state_path": dir}."""
        import ray.data as rd

        from vector_ray.stages.aggregate import grouped_aggregate

        files = _expand(inputs)
        ptr = self._pointer()
        seen = dict(ptr["fragments"]) if ptr else {}
        new = [(f, _frag_id(f)) for f in files]
        new = [(f, fid) for f, fid in new if fid not in seen]
        if not new:
            return {"new_fragments": 0, "total_fragments": len(files),
                    "state_path": os.path.join(self.state_dir, ptr["state"])
                    if ptr else None}
        cols = list(read_columns) if read_columns is not None else None
        if cols is None:
            need = set(self.group_by)
            for _out, (_k, c) in self.aggs.items():
                need.add(c)
            cols = sorted(need)
        ds = rd.read_parquet([f for f, _ in new], columns=cols)
        moment_cols = sorted({c for _o, (k, c) in self.aggs.items()
                              if k in ("var", "std")})
        if moment_cols:
            def add_moments(t: pa.Table) -> pa.Table:
                for c in moment_cols:
                    v = pc.cast(t[c], pa.float64(), safe=False)
                    t = t.append_column(f"__f64_{c}", v)
                    t = t.append_column(f"__sq_{c}", pc.multiply(v, v))
                return t

            ds = ds.map_batches(add_moments, batch_format="pyarrow",
                                zero_copy_batch=True)
        partials = grouped_aggregate(ds, self.group_by, self.scan_specs)
        # fixed column order on BOTH union sides (the union
        # schema-mismatch lesson from stages/diff.py)
        order = self.group_by + sorted(self.scan_specs)
        partials = partials.select_columns(order)
        if ptr is not None:
            old = rd.read_parquet(
                os.path.join(self.state_dir, ptr["state"])).select_columns(order)
            merged = grouped_aggregate(old.union(partials), self.group_by,
                                       self.merge_specs)
        else:
            merged = partials
        n = int(ptr["state"].split("-")[1]) + 1 if ptr else 0
        state_name = f"state-{n:06d}"
        out_dir = os.path.join(self.state_dir, state_name)
        # a crashed previous run may have left an ORPHAN dir under this
        # name (written but never pointed to); parquet writes append
        # files, so clear it or its stale rows would double-count
        shutil.rmtree(out_dir, ignore_errors=True)
        merged.write_parquet(out_dir)
        for f, fid in new:
            seen[fid] = f
        self._flip_pointer(state_name, seen)
        self._prune_old(state_name)
        return {"new_fragments": len(new), "total_fragments": len(files),
                "state_path": out_dir}

    def result(self):
        """Finalize the current state into the user-facing aggregate
        (a Dataset; mean channels divide out)."""
        import ray.data as rd

        ptr = self._pointer()
        if ptr is None:
            raise ValueError("incremental_aggregate: no state yet — call update()")
        st = rd.read_parquet(os.path.join(self.state_dir, ptr["state"]))
        plan = self.final_plan
        group_by = self.group_by

        def _finalize(t: pa.Table) -> pa.Table:
            cols = {k: t[k] for k in group_by}
            for out, kind in plan:
                if kind == "mean":
                    s = pc.cast(t[f"__{out}_sum"], pa.float64())
                    c = pc.cast(t[f"__{out}_cnt"], pa.float64())
                    cols[out] = pc.if_else(pc.greater(c, 0.0),
                                           pc.divide(s, c), pa.scalar(None, pa.float64()))
                elif kind in ("var", "std"):
                    import numpy as np

                    n = pc.cast(t[f"__{out}_cnt"], pa.float64()) \
                        .combine_chunks().to_numpy(zero_copy_only=False)
                    sm = pc.cast(pc.fill_null(t[f"__{out}_sum"], 0.0),
                                 pa.float64()).combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    sq = pc.cast(pc.fill_null(t[f"__{out}_sq"], 0.0),
                                 pa.float64()).combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        var = (sq - sm * sm / np.where(n > 0, n, 1.0)) \
                            / np.where(n > 1, n - 1.0, 1.0)
                        var = np.where(n > 1, np.maximum(var, 0.0), np.nan)
                        out_v = np.sqrt(var) if kind == "std" else var
                    cols[out] = pa.array(
                        [None if not np.isfinite(x) else float(x)
                         for x in out_v], pa.float64())
                else:
                    cols[out] = t[out]
            return pa.table(cols)

        return st.map_batches(_finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def incremental_aggregate(inputs, group_by: Sequence[str],
                          aggs: Dict[str, Tuple[str, str]],
                          state_dir: str, *,
                          read_columns: Optional[Sequence[str]] = None):
    """One-call form: update state with unseen fragments of ``inputs``
    and return the finalized aggregate Dataset."""
    inc = IncrementalAggregate(state_dir, group_by, aggs)
    inc.update(inputs, read_columns=read_columns)
    return inc.result()
