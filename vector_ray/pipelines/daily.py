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
3. appends the routed rows as parquet under ``<workdir>/routed/`` (one
   sub-directory per run; history is never rewritten), THEN records the
   survivors' doc_ids in the seen index — at-least-once: a crash
   between the two re-emits the batch next run (duplicate rows in the
   sink, never silent loss),
4. merges the per-(lane, source, region) aggregate into a durable
   checkpoint (state/incremental.IncrementalAggregate at
   ``<workdir>/agg``): the checkpoint's fragment registry sees only
   this run's new routed files, so history is never re-scanned.

Re-running with yesterday's input is a no-op end to end: the dedupe
admits zero rows, no routed files are written, and the aggregate
replays from state. The result equals a one-shot flagship aggregate
over the distinct union of every batch ever ingested (pytest).

Each call is self-contained: every Ray Data execution it starts is
fully consumed before the function returns, and the aggregate comes
back as a small MATERIALIZED pyarrow.Table (it is aggregate-sized by
construction), so no live streaming executor / enrich actor pool
escapes the call. Sequential runs in one process therefore release
their CPUs before the next run (or a from-scratch reference job)
starts — composing runs on a small cluster cannot starve.

100-TB shape: (1) is a bucketed anti-join over key columns, (2) is
map-only + broadcast enrich, (3) writes per-run directories (no
rewrite of history), (4) exchanges aggregate-sized partials only.
The survivors are materialized once (they are consumed twice: the
routed write and the seen-index append) — batch-sized, not
lake-sized, and the object store spills if a day's batch exceeds
memory.
"""

from __future__ import annotations

import os
import uuid
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


def _collect(ds) -> pa.Table:
    """Drain a small (aggregate-sized) Dataset into a plain Arrow
    table so the streaming executor finishes and tears down before we
    return."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def run_daily(
    inputs,
    workdir: str,
    *,
    lookup: Optional[pa.Table] = None,
    enrich_concurrency: int = 2,
    refresh_stats: bool = False,
):
    """One ingest step. Returns {"new_docs": n, "routed_dir": path|None,
    "aggregate": pyarrow.Table (current cumulative per-sink aggregate)}."""
    import ray.data as rd

    from vector_ray.state.incremental import IncrementalAggregate
    from vector_ray.state.seen import incremental_dedupe, seen_index_append

    os.makedirs(workdir, exist_ok=True)
    routed_root = os.path.join(workdir, "routed")
    os.makedirs(routed_root, exist_ok=True)

    if isinstance(inputs, str):
        import glob as _g

        files = sorted(_g.glob(os.path.join(inputs, "*.parquet"))) \
            if os.path.isdir(inputs) else sorted(_g.glob(inputs))
    else:
        files = sorted(inputs)
    ds = rd.read_parquet(files)

    # 1. cross-run + within-batch exact dedup on doc_id. append=False:
    # the index is updated only AFTER the routed write lands (step 3)
    # — the at-least-once shape seen.py documents. The survivors come
    # back materialized (consumed twice below), so count() is metadata
    # and the pipeline does not re-execute the anti-join.
    seen_root = os.path.join(workdir, "seen")
    fresh = incremental_dedupe(ds, ["doc_id"], seen_root, append=False)
    new_docs = fresh.count()

    agg_state = IncrementalAggregate(os.path.join(workdir, "agg"),
                                     _AGG_KEYS, _AGG_STATE_SPECS)
    routed_dir = None
    if new_docs:
        # 2./3. process survivors, append this run's routed output
        routed = parse_enrich_route(fresh, lookup=lookup,
                                    enrich_concurrency=enrich_concurrency)
        routed_dir = os.path.join(routed_root, f"run-{uuid.uuid4().hex[:12]}")
        # lane stays a DATA column (the aggregate checkpoint reads the
        # files directly, where a hive partition column would vanish)
        routed.write_parquet(routed_dir)
        del routed  # executor is done; drop the ref so the enrich
        # actor pool releases before any later pipeline starts
        # routed output is durable — NOW record the keys (at-least-once)
        seen_index_append(fresh, ["doc_id"], seen_root)
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
