"""The daily production run: the north-rule pipeline composed with the
durable state layer.

Every day a new batch of tokenized-log fragments lands. One
``run_daily`` call:

1. drops every doc whose ``doc_id`` was emitted by ANY previous run
   (persistent seen-key index at ``<workdir>/seen`` — state/seen.py;
   within-batch duplicates collapse too, keep-first),
2. runs the flagship parse → enrich → route stages over the survivors
   (pipelines/flagship.parse_enrich_route — fused map_batches + actor
   pool + route explode),
3. commits the routed rows as parquet under ``<workdir>/routed/``
   (one sub-directory per run; history is never rewritten), THEN
   records the survivors' doc_ids in the seen index,
4. merges the per-(lane, source, region) aggregate into a durable
   checkpoint (state/incremental.IncrementalAggregate at
   ``<workdir>/agg``): the checkpoint's fragment registry sees only
   this run's new routed files, so history is never re-scanned.

Crash semantics — EFFECTIVELY-ONCE, not merely at-least-once. The
run directory name is a deterministic hash of the input fragment
identities, the routed write goes to a hidden temp dir and becomes
visible via one atomic rename, and a ``_committed`` marker records
that the run's keys reached the seen index:

* crash mid-write     → hidden ``.tmp-run-*`` orphan, removed on the
  next call; the batch re-runs from scratch. Nothing lost, nothing
  duplicated.
* crash between the rename and the key append → the run dir exists
  without its marker; the next call (ANY next call, not only a retry
  of the same batch) finishes it by appending the doc_ids read from
  the committed artifact itself and writing the marker. The retry's
  dedupe then admits nothing, so the batch is never written twice.
* crash after the marker → the batch is fully ingested; a replay
  admits zero rows end to end.

Re-running with yesterday's input is a no-op end to end: the dedupe
admits zero rows, no routed files are written, and the aggregate
replays from state. The result equals a one-shot flagship aggregate
over the distinct union of every batch ever ingested (pytest,
including the crash-window cases).

Each call is self-contained: every Ray Data execution it starts is
fully consumed before the function returns, and the aggregate comes
back as a small MATERIALIZED pyarrow.Table (it is aggregate-sized by
construction), so no live streaming executor / enrich actor pool
escapes the call. Sequential runs in one process therefore release
their CPUs before the next run (or a from-scratch reference job)
starts — composing runs on a small cluster cannot starve.

100-TB shape: (1) is a bucketed anti-join over key columns, (2) is
map-only + broadcast enrich, (3) writes per-run directories (no
rewrite of history; commit = one dir rename), (4) exchanges
aggregate-sized partials only. The survivors are materialized once
(they are consumed twice: the routed write and the seen-index
append) — batch-sized, not lake-sized, and the object store spills
if a day's batch exceeds memory. Recovery reads only the doc_id
column of the interrupted run.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Optional, Sequence

import pyarrow as pa

from vector_ray.pipelines.flagship import (
    _AGG_KEYS,
    flagship_aggregate,
    parse_enrich_route,
)

_AGG_STATE_SPECS = {
    "n_rows": ("count", "doc_id"),
    "tok_sum": ("sum", "n_tok"),
    "seq_min": ("min", "seq"),
    "seq_max": ("max", "seq"),
}

_MARKER = "_committed"
_META = "_run_meta.json"


def _collect(ds) -> pa.Table:
    """Drain a small (aggregate-sized) Dataset into a plain Arrow
    table so the streaming executor finishes and tears down before we
    return."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _run_id(files: Sequence[str]) -> str:
    """Deterministic id of this batch: the input fragment identities
    (path+size+mtime, the incremental-aggregate convention). A crashed
    attempt's retry lands on the SAME run directory — the idempotence
    anchor."""
    h = hashlib.sha1()
    for f in files:
        st = os.stat(f)
        h.update(f"{f}\x1f{st.st_size}\x1f{st.st_mtime_ns}".encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def _finish_interrupted_runs(routed_root: str, seen_root: str) -> dict:
    """Recovery pass: remove hidden temp orphans (crash mid-write) and
    finish any committed run dir whose keys never reached the seen
    index (crash between rename and append) by appending its doc_ids
    from the artifact itself and writing the marker. Idempotent — a
    key stored twice is harmless for anti-join semantics. Returns
    {run_name: admitted_docs} for the runs finished here."""
    import json

    import ray.data as rd

    from vector_ray.state.seen import seen_index_append

    finished = {}
    if not os.path.isdir(routed_root):
        return finished
    for name in sorted(os.listdir(routed_root)):
        full = os.path.join(routed_root, name)
        if name.startswith(".tmp-run-"):
            shutil.rmtree(full, ignore_errors=True)
            continue
        if not (name.startswith("run-") and os.path.isdir(full)):
            continue
        if os.path.exists(os.path.join(full, _MARKER)):
            continue
        if os.path.exists(os.path.join(seen_root, "seen.json")):
            import glob as _g

            parts = sorted(_g.glob(os.path.join(full, "*.parquet")))
            ids = rd.read_parquet(parts, columns=["doc_id"])
            seen_index_append(ids, ["doc_id"], seen_root)
        n = None
        meta_p = os.path.join(full, _META)
        if os.path.exists(meta_p):
            with open(meta_p) as fh:
                n = json.load(fh).get("new_docs")
        with open(os.path.join(full, _MARKER), "w"):
            pass
        finished[name] = n
    return finished


def run_daily(
    inputs,
    workdir: str,
    *,
    lookup: Optional[pa.Table] = None,
    enrich_concurrency: int = 2,
    refresh_stats: bool = False,
):
    """One ingest step. Returns {"new_docs": n, "routed_dir": path|None,
    "aggregate": pyarrow.Table (current cumulative per-sink aggregate)}.
    If this call finishes a previously interrupted attempt of the SAME
    batch, ``new_docs``/``routed_dir`` report that run."""
    import json

    import ray.data as rd

    from vector_ray.state.incremental import IncrementalAggregate
    from vector_ray.state.seen import incremental_dedupe, seen_index_append

    os.makedirs(workdir, exist_ok=True)
    routed_root = os.path.join(workdir, "routed")
    os.makedirs(routed_root, exist_ok=True)
    seen_root = os.path.join(workdir, "seen")

    if isinstance(inputs, str):
        import glob as _g

        files = sorted(_g.glob(os.path.join(inputs, "*.parquet"))) \
            if os.path.isdir(inputs) else sorted(_g.glob(inputs))
    else:
        files = sorted(inputs)

    run_name = f"run-{_run_id(files)}"
    recovered = _finish_interrupted_runs(routed_root, seen_root)

    agg_state = IncrementalAggregate(os.path.join(workdir, "agg"),
                                     _AGG_KEYS, _AGG_STATE_SPECS)

    if run_name in recovered:
        # this very batch crashed after its routed commit last time;
        # the recovery above completed it — nothing left to process
        routed_dir = os.path.join(routed_root, run_name)
        new_docs = recovered[run_name]
        if new_docs is None:  # pre-meta layout: count from the artifact
            from vector_ray.stages.bucketed import (
                bucketed_map_groups,
                keep_first_per_key,
            )

            import glob as _g

            parts = sorted(_g.glob(os.path.join(routed_dir, "*.parquet")))
            ids = rd.read_parquet(parts, columns=["doc_id"])
            new_docs = bucketed_map_groups(
                ids, ["doc_id"],
                lambda g: keep_first_per_key(g, ["doc_id"])).count()
    else:
        ds = rd.read_parquet(files)
        # 1. cross-run + within-batch exact dedup on doc_id. The index
        # is updated only AFTER the routed rename lands below. The
        # survivors come back materialized (consumed twice), so
        # count() is metadata and the anti-join runs once.
        fresh = incremental_dedupe(ds, ["doc_id"], seen_root, append=False)
        new_docs = fresh.count()
        routed_dir = None
        if new_docs:
            # 2./3. process survivors; write hidden, commit via rename
            routed = parse_enrich_route(fresh, lookup=lookup,
                                        enrich_concurrency=enrich_concurrency)
            routed_dir = os.path.join(routed_root, run_name)
            tmp_dir = os.path.join(routed_root, f".tmp-{run_name}")
            shutil.rmtree(tmp_dir, ignore_errors=True)
            # lane stays a DATA column (the aggregate checkpoint reads
            # the files directly, where a hive partition column would
            # vanish)
            routed.write_parquet(tmp_dir)
            del routed  # executor done; release the enrich actor pool
            with open(os.path.join(tmp_dir, _META), "w") as fh:
                json.dump({"new_docs": int(new_docs), "files": files}, fh)
            os.rename(tmp_dir, routed_dir)  # commit point
            # artifact durable — NOW record the keys, then the marker
            seen_index_append(fresh, ["doc_id"], seen_root)
            with open(os.path.join(routed_dir, _MARKER), "w"):
                pass
            if refresh_stats:
                from vector_ray.state.datastats import stats_index_build

                stats_index_build(routed_root, cols=["n_tok", "seq"])
        del fresh, ds
    # 4. merge (only unseen routed fragments scan — i.e. this run's)
    agg_state.update(routed_root)
    aggregate = _collect(agg_state.result())
    return {"new_docs": int(new_docs), "routed_dir": routed_dir,
            "aggregate": aggregate}


def oneshot_reference(files: Sequence[str], *,
                      lookup: Optional[pa.Table] = None,
                      enrich_concurrency: int = 2) -> pa.Table:
    """The from-scratch equivalent (distinct docs → flagship aggregate)
    — what run_daily's cumulative state must always equal. Returns a
    materialized Arrow table (aggregate-sized). enrich_concurrency
    defaults LOW: a pool of C actors × 1 CPU must leave CPUs free for
    the read/aggregate tasks on small clusters (C = cluster_CPUs would
    deadlock a 4-CPU test cluster)."""
    import ray.data as rd

    from vector_ray.stages.bucketed import bucketed_map_groups, keep_first_per_key

    ds = rd.read_parquet(sorted(files))
    uniq = bucketed_map_groups(
        ds, ["doc_id"], lambda g: keep_first_per_key(g, ["doc_id"]))
    agg = flagship_aggregate(
        parse_enrich_route(uniq, lookup=lookup,
                           enrich_concurrency=enrich_concurrency))
    return _collect(agg)
