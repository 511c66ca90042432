"""The flagship north-rule pipeline: parse → enrich → route → aggregate
over the tokenized-log table (doc_id, tokens:list<int32>, n_tok,
source) — the Ray-Data restatement of Vector's soak topology
(soaks/syslog_regex_logs2metric_ddmetrics/terraform/vector.toml:10-31:
syslog → remap parse_regex → log_to_metric → sink).

Stage plan (SURVEY.md §7.3):
  read_parquet (fragment-pruned on resume)
  → [fused map_batches] grok-parse doc_id → app/host/tld/seq,
    remap derived cols, route-explode into lanes (copy semantics)
  → actor-pool enrichment probe (source → region/tier)
  → per-lane grouped aggregates (two-phase partial→final)
  → routed parquet sink partitioned by lane + per-fragment manifest.

The ``tokens`` column is never read by any kernel — it rides through
zero-copy, which is the BASELINE.json per-row invariant.
"""

from __future__ import annotations

import glob
import os
import time
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.expr import C, F
from vector_ray.sources.synth import source_lookup_table
from vector_ray.stages import (
    Enrich,
    EnrichmentTable,
    GrokParser,
    Remap,
    Route,
    grouped_aggregate,
)
from vector_ray.stages.base import ChainStep, FnStep
from vector_ray.state import RunManifest

#: route lanes (F4 semantics: copy to EVERY matching lane; catch-all lane
#: `rest` collects rows matching none)
LANES = {
    "hot": C.eq("tier", "hot"),
    "web": C.eq("app", "web"),
    "long": C.ge("n_tok", 1024),
}

_GROK = r"%{WORD:app}-%{WORD:host}\.%{WORD:tld}-%{INT:seq}"


def _build_steps():
    parser = GrokParser("doc_id", _GROK, types={"seq": "int"}, matched_col="parse_ok")

    def remap_prog(t: pa.Table) -> pa.Table:
        t = F.set_(t, "fqdn", F.concat("", t["host"], F.const(len(t), "."), t["tld"]))
        t = F.set_(t, "seq_bucket", F.mod(pc.fill_null(t["seq"], -1), 10))
        return t

    return parser, Remap(remap_prog, name="derive")


def parse_enrich_route(
    ds,
    *,
    lookup: Optional[pa.Table] = None,
    enrich_concurrency: int = 4,
    token_sig: bool = False,
):
    """parse + remap (+ optional token-minhash signatures) fused into one
    map_batches; enrich as actor pool; route explode (one pass, lane
    column). ``token_sig=True`` inserts the sequence-level MinHash
    signature stage (vector_ray.ml.dedup.TokenMinHash) — the dedupe
    prepass a training-data pipeline runs over ``tokens``."""
    parser, remap = _build_steps()
    route = Route(LANES, unmatched_lane="rest")
    steps = [parser, remap]
    if token_sig:
        from vector_ray.ml.dedup import TokenMinHash
        from vector_ray.stages.base import FnStep

        steps.append(FnStep(TokenMinHash(num_hashes=8), name="token_sig"))
    fused = ChainStep(steps)
    ds = fused.apply(ds)
    table = EnrichmentTable(lookup if lookup is not None else source_lookup_table(), key=["source"])
    enrich = Enrich(table, select=["region", "tier"], concurrency=enrich_concurrency)
    ds = enrich.apply(ds)
    ds = route.explode(ds)
    return ds


_AGG_KEYS = ["lane", "source", "region"]
_AGG_SPECS = {
    "n_rows": ("count", "doc_id"),
    "tok_sum": ("sum", "n_tok"),
    "seq_min": ("min", "seq"),
    "seq_max": ("max", "seq"),
}


def flagship_aggregate(routed_ds):
    """Per-sink aggregate: one row per (lane, source, region) with row
    count, token sum, and seq bounds — the log_to_metric+aggregate
    composition, two-phase so the shuffle only moves partials."""
    return grouped_aggregate(routed_ds, _AGG_KEYS, _AGG_SPECS)


def flagship_dataset(input_path: str | Sequence[str], *, columns=None):
    import ray.data as rd

    return rd.read_parquet(input_path)


def run_streaming(input_path, *, lookup=None, concurrency: int = 4, token_sig: bool = False):
    """One-shot lazy pipeline: read → parse → enrich → route →
    aggregate, consumed by the tiny final aggregate — nothing
    materializes the full dataset. Delegates to the fused
    FlagshipWorker path (see run_streaming_fused)."""
    import glob as _g

    if isinstance(input_path, str) and os.path.isdir(input_path):
        files = sorted(_g.glob(os.path.join(input_path, "*.parquet")))
    elif isinstance(input_path, str):
        files = [input_path]
    else:
        files = list(input_path)
    return run_streaming_fused(files, concurrency=concurrency, token_sig=token_sig, lookup=lookup)


def run_flagship(
    input_path: str,
    out_dir: str,
    *,
    lookup: Optional[pa.Table] = None,
    resume: bool = True,
    fragments_per_partition: int = 1,
    write_routed: bool = True,
    enrich_concurrency: int = 2,
):
    """Resumable run: per-fragment ETL checkpointed via RunManifest,
    then a final aggregate over the routed output.

    Partition unit = input fragment group. A rerun skips fragments whose
    manifest entry exists (idempotent redo otherwise). Counters (rows
    in/out per lane) are recorded per partition, mirroring Vector's
    per-stage EventsReceived/EventsSent counters
    (src/topology/builder.rs:229-246).
    """
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet"))) if os.path.isdir(input_path) else [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {input_path}")
    manifest = RunManifest(out_dir)

    groups = [files[i : i + fragments_per_partition] for i in range(0, len(files), fragments_per_partition)]
    # partition id = digest of the fragment paths ONLY (no ordinal):
    # adding/removing other fragments must not change an unchanged
    # group's id, or resumes would recompute into new dirs while the
    # final aggregate still reads the stale ones
    import hashlib

    pids = [
        "frag-" + hashlib.sha1("\n".join(group).encode()).hexdigest()[:12]
        for group in groups
    ]
    skipped = 0
    for gi, group in enumerate(groups):
        pid = pids[gi]
        frag_dir = os.path.join(out_dir, f"routed/{pid}")
        if resume and manifest.is_done(pid) and (not write_routed or os.path.isdir(frag_dir)):
            skipped += 1
            continue
        t0 = time.time()
        frag_out = os.path.join(out_dir, f"routed/{pid}")
        manifest.clear_partition_output(frag_out)
        import pyarrow.parquet as pq

        rows_in = sum(pq.read_metadata(f).num_rows for f in group)
        ds = rd.read_parquet(group)
        routed = parse_enrich_route(ds, lookup=lookup, enrich_concurrency=enrich_concurrency)
        if write_routed:
            # partition by a COPY of lane so the data files keep the lane
            # column (hive partition columns are path-only) — the resume
            # aggregate re-reads files directly.
            routed = routed.map_batches(
                lambda t: t.append_column("_lane", t["lane"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            routed.write_parquet(frag_out, partition_cols=["_lane"])
            lane_dirs = glob.glob(os.path.join(frag_out, "_lane=*"))
            counters = {"rows_in": rows_in}
            for ld in lane_dirs:
                lane = os.path.basename(ld).split("=", 1)[1]
                import pyarrow.parquet as pq

                nrows = sum(pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(ld, "*.parquet")))
                counters[f"rows_out_{lane}"] = nrows
            # per-partition aggregate PARTIAL (tiny), so the final
            # aggregate merges manifests instead of re-reading the routed
            # payload — resume cost is O(partitions), not O(data)
            part_files = sorted(glob.glob(os.path.join(frag_out, "_lane=*/*.parquet")))
            if part_files:
                from vector_ray.stages.aggregate import _partial_batch

                part_ds = rd.read_parquet(
                    part_files, columns=["lane", "source", "region", "doc_id", "n_tok", "seq"]
                )
                partial = part_ds.map_batches(
                    lambda t: _partial_batch(t, _AGG_KEYS, _AGG_SPECS),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                import ray as _ray

                # zero-copy arrow refs, no row-dict round trip
                _tables = _ray.get(partial.to_arrow_refs())
                pa_partial = pa.concat_tables(_tables)
                import pyarrow.parquet as pq

                pq.write_table(pa_partial, os.path.join(frag_out, "agg_partial.parquet"))
            outputs = [frag_out]
        else:
            counters = {"rows_in": rows_in, "rows_out": routed.count()}
            outputs = []
        manifest.mark_done(pid, inputs=group, outputs=outputs, counters=counters, seconds=time.time() - t0)

    # final aggregate over all routed output (re-read: cheap columnar scan
    # of only the agg columns; fragments completed in EARLIER runs are
    # included without recomputation — that's the resume win)
    agg = None
    if write_routed:
        # merge the per-partition aggregate partials for THIS run's
        # partitions (fall back to re-reading routed files for partitions
        # written before partials existed)
        from vector_ray.stages.aggregate import _final_merge_fn, _partial_batch

        partial_files = []
        legacy_routed = []
        for pid in pids:
            pf = os.path.join(out_dir, f"routed/{pid}/agg_partial.parquet")
            if os.path.exists(pf):
                partial_files.append(pf)
            else:
                legacy_routed.extend(
                    glob.glob(os.path.join(out_dir, f"routed/{pid}/_lane=*/*.parquet"))
                )
        pieces = []
        if partial_files:
            pieces.append(rd.read_parquet(partial_files))
        if legacy_routed:
            legacy = rd.read_parquet(
                legacy_routed, columns=["lane", "source", "region", "doc_id", "n_tok", "seq"]
            ).map_batches(
                lambda t: _partial_batch(t, _AGG_KEYS, _AGG_SPECS),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            pieces.append(legacy)
        if pieces:
            allp = pieces[0]
            for p_ in pieces[1:]:
                allp = allp.union(p_)
            agg = allp.repartition(4).groupby(_AGG_KEYS).map_groups(
                _final_merge_fn(_AGG_KEYS, _AGG_SPECS), batch_format="pyarrow"
            )
    return {"manifest": manifest, "skipped": skipped, "aggregate": agg, "partitions": len(groups)}


class FlagshipWorker:
    """Fully-fused flagship stage for the streaming/bench path: ONE
    actor-pool operator that parses, enriches (broadcast table fetched
    once per actor — the stateful actor-pool lookup of the north star),
    routes, and pre-aggregates each block. Only the tiny per-block
    partial-aggregate rows leave the process, so the object store
    carries KBs instead of the full routed payload — the fusion
    discipline that matters identically on a real multi-node cluster
    (no cross-node block shipping for the narrow stages).
    """

    def __init__(self, table_ref=None, token_sig: bool = False, sig_hashes: int = 8):
        import ray as _ray

        from vector_ray.stages.enrich import Enrich, _EnrichActor

        parser, remap = _build_steps()
        steps = [parser, remap]
        if token_sig:
            from vector_ray.ml.dedup import TokenMinHash

            steps.append(FnStep(TokenMinHash(num_hashes=sig_hashes), name="token_sig"))
        self.chain = ChainStep(steps)
        lookup = _ray.get(table_ref) if table_ref is not None else source_lookup_table()
        en = Enrich(EnrichmentTable(lookup, key=["source"]), select=["region", "tier"])
        self.enricher = _EnrichActor(en.small, en.key_cols, False, "get", "_enrich_miss", None, {})
        self.route = Route(LANES, unmatched_lane="rest")
        from vector_ray.stages.aggregate import _partial_batch

        self._partial = _partial_batch

    AGG_KEYS = ["lane", "source", "region"]
    AGG_SPECS = {
        "n_rows": ("count", "doc_id"),
        "tok_sum": ("sum", "n_tok"),
        "seq_min": ("min", "seq"),
        "seq_max": ("max", "seq"),
    }

    #: columns the aggregate consumes — the route-explode copy is
    #: projected to these BEFORE duplicating rows into lanes (projection
    #: pushdown through the fan-out: the aggregate-only path must not
    #: memcpy the token payload once per matching lane)
    NARROW = ["doc_id", "n_tok", "seq", "source", "region", "tier", "app"]

    def __call__(self, t: pa.Table) -> pa.Table:
        t = self.chain.transform(t)
        t = self.enricher(t)
        t = t.select([c for c in self.NARROW if c in t.column_names])
        t = self.route._explode_batch(t)
        return self._partial(t, self.AGG_KEYS, self.AGG_SPECS)


#: per-worker-process FlagshipWorker cache for the task-pool mode:
#: worker processes are prestarted and reused by Ray core, so the state
#: (enrich table fetch, compiled parser) is built once per process with
#: NO serial actor-pool ramp (measured ~1 s/actor — dominates short
#: runs at 30 actors).
_WORKER_CACHE: dict = {}


def _fused_task_fn(table_ref, token_sig: bool, sig_hashes: int):
    key = (table_ref.hex() if table_ref is not None else None, token_sig, sig_hashes)

    def fused(t: pa.Table) -> pa.Table:
        w = _WORKER_CACHE.get(key)
        if w is None:
            w = FlagshipWorker(table_ref=table_ref, token_sig=token_sig,
                               sig_hashes=sig_hashes)
            _WORKER_CACHE[key] = w
        return w(t)

    return fused


def run_streaming_fused(files, *, concurrency: int, token_sig: bool = False, lookup=None,
                        sig_hashes: int = 8, pool: str = "task"):
    """Bench/streaming mode: read → fused FlagshipWorker pool → final
    merge of partials. Returns the aggregate Dataset.

    ``pool="task"`` (default) runs the fused worker as a task pool with
    a per-process state cache — no actor ramp, full CPU fan-out;
    ``pool="actor"`` keeps the explicit actor pool (useful when state
    must NOT be shared process-wide)."""
    import ray as _ray
    import ray.data as rd

    from vector_ray.stages.aggregate import _final_merge_fn

    table_ref = _ray.put(lookup if lookup is not None else source_lookup_table())
    # one block per fragment: override_num_blocks above len(files)
    # triggers SplitBlocks, which re-copies the full list-column buffers
    # per sub-block (measured 4-5x slower); parallelism beyond the
    # fragment count must come from MORE fragments, not splits
    ds = rd.read_parquet(files, override_num_blocks=len(files) if isinstance(files, list) else None)
    if pool == "task":
        partial = ds.map_batches(
            _fused_task_fn(table_ref, token_sig, sig_hashes),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        partial = ds.map_batches(
            FlagshipWorker,
            fn_constructor_kwargs={"table_ref": table_ref, "token_sig": token_sig,
                                   "sig_hashes": sig_hashes},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    partial = partial.repartition(4)
    return partial.groupby(FlagshipWorker.AGG_KEYS).map_groups(
        _final_merge_fn(FlagshipWorker.AGG_KEYS, FlagshipWorker.AGG_SPECS),
        batch_format="pyarrow",
    )
