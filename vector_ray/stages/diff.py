"""Snapshot diff — dataset-versioning between two corpus snapshots
(the "what changed since the last crawl/curation run" step; pairs with
the incremental cross-snapshot Bloom dedup in ml/bloom.py). No
reference counterpart (SURVEY §2 "beyond the reference").

Each side reduces to (id, fingerprint) — the ONLY columns that shuffle
(payloads never move) — then one bucketed full outer join classifies:

  added     id present only in the new snapshot
  removed   id present only in the old snapshot
  changed   id in both, content fingerprint differs
  (equal rows are omitted — at 100 TB the diff is the small output)

Change detection uses the 64-bit content fingerprint
(expr/kernels.fingerprint, FNV-1a over the raw string buffer): a
collision masks a change with probability ~2^-64 per id — the
standard trade for never shuffling payloads.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def snapshot_diff(old, new, *, id_col: str = "doc_id",
                  field: str = "text", fp_col: str | None = None,
                  buckets: int | None = None):
    """Returns a Dataset (id_col, status) with status ∈
    {'added', 'removed', 'changed'}; unchanged ids are omitted.
    ``fp_col`` names an existing fingerprint column; otherwise the
    fingerprint of ``field`` is computed on the fly (vectorized)."""
    from vector_ray.expr import F
    from vector_ray.stages.join import bucketed_join

    def reduce_side(out_fp: str):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            fp = (t[fp_col] if fp_col
                  else F.fingerprint(pc.cast(t[field], pa.string())))
            if isinstance(fp, pa.ChunkedArray):
                fp = fp.combine_chunks()
            # int64 REINTERPRETATION of the u64 fingerprint (cast
            # overflows above 2^63; the bit pattern keeps equality)
            fnp = np.asarray(fp.to_numpy(zero_copy_only=False),
                             np.uint64).view(np.int64)
            return pa.table({id_col: t[id_col], out_fp: pa.array(fnp)})

        return fn

    a = old.map_batches(reduce_side("__fp_old"), batch_format="pyarrow",
                        zero_copy_batch=True)
    b = new.map_batches(reduce_side("__fp_new"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j = bucketed_join(a, b, on=[id_col], join_type="full",
                      buckets=buckets)

    def classify(t: pa.Table) -> pa.Table:
        fo, fn_ = t["__fp_old"], t["__fp_new"]
        in_old, in_new = pc.is_valid(fo), pc.is_valid(fn_)
        status = pc.if_else(
            pc.and_kleene(in_old, in_new),
            pc.if_else(pc.equal(fo, fn_), pa.scalar(None, pa.string()),
                       pa.scalar("changed")),
            pc.if_else(in_new, pa.scalar("added"), pa.scalar("removed")))
        out = pa.table({id_col: t[id_col], "status": status})
        return out.filter(pc.is_valid(out["status"]))

    return j.map_batches(classify, batch_format="pyarrow",
                         zero_copy_batch=True)


def apply_changeset(base, changes, *, id_col: str = "doc_id",
                    op_col: str = "op", mode: str = "broadcast",
                    buckets: int | None = None,
                    max_broadcast_rows: int = 5_000_000):
    """MERGE INTO: apply an insert/update/delete changeset to a base
    snapshot and return the new snapshot (base schema, ``op_col``
    dropped). The inverse of :func:`snapshot_diff` — ``apply_changeset
    (old, diff-with-payload)`` reconstructs the new snapshot, which is
    how incremental curation reruns avoid reprocessing the base corpus.

    Ops: ``'D'`` deletes the base row with that id; ``'U'``/``'I'``
    emit the changeset payload (an upsert — any base row with the same
    id is superseded). Ids must be unique within the changeset
    (standard MERGE precondition; violations produce duplicate rows
    rather than an error, same as SQL MERGE without a guard).

    Plan: only the changeset's ID COLUMN ever touches the base — in
    ``broadcast`` mode (default) the distinct-id table ships once via
    ``ray.put`` and the base is filtered map-only (base payload never
    shuffles); ``bucketed`` mode anti-joins by hash bucket for
    changesets too large to broadcast. Surviving changeset rows union
    in, schema-aligned to the base."""
    from vector_ray.stages.join import broadcast_join, bucketed_join

    bsch = base.schema()
    base_cols = list(bsch.names)
    # Arrow target schema for the upsert side: per-block literal/null
    # columns in the changeset (e.g. a zero-match filter producing a
    # null-typed array) would otherwise make union() see two different
    # block schemas and fail — align every surviving block explicitly.
    target = pa.schema(zip(bsch.names, bsch.types))

    def ids_only(t: pa.Table) -> pa.Table:
        return t.select([id_col])

    ch_ids = changes.map_batches(ids_only, batch_format="pyarrow",
                                 zero_copy_batch=True)
    if mode == "broadcast":
        kept = broadcast_join(base, ch_ids, on=[id_col],
                              join_type="anti",
                              max_broadcast_rows=max_broadcast_rows)
    elif mode == "bucketed":
        kept = bucketed_join(base, ch_ids, on=[id_col],
                             join_type="anti", buckets=buckets)
    else:
        raise ValueError(f"apply_changeset: unknown mode={mode!r}")

    def surviving(t: pa.Table) -> pa.Table:
        ops = pc.cast(t[op_col], pa.string())
        t = t.filter(pc.invert(pc.equal(pc.fill_null(ops, ""), "D")))
        t = t.select(base_cols)
        return t.cast(target)

    upserts = changes.map_batches(surviving, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return kept.union(upserts)


def scd2(changelog, *, id_col: str, ts_col: str,
         attr_cols: Sequence[str], collapse: bool = True,
         num_buckets: int | None = None):
    """SCD Type-2 history builder: turn an append-only changelog of
    (id, ts, attrs...) into validity intervals

        (id, attrs..., valid_from, valid_to, is_current)

    where ``valid_to`` is the next change's timestamp (null = open /
    current version). With ``collapse=True`` (default) rows whose
    attributes are identical to the id's immediately preceding row are
    dropped first, so back-to-back no-op updates don't split an
    interval.

    Plan: ONE hash-bucket shuffle on ``id_col``
    (stages/bucketed.bucketed_map_groups); each bucket sorts by
    (id, ts) once and does flat numpy passes — the collapse mask and
    the lead(ts) are both consecutive-row comparisons over the sorted
    runs (O(buckets) Python calls, any key skew fine because the work
    is per-bucket vectorized, never per-key). ``ts_col`` must be
    unique within an id (true of any event-sourced changelog).

    Completes the changelog family: snapshot_diff (what changed),
    apply_changeset (merge it in), scd2 (keep the full history).
    No reference counterpart (SURVEY §2 "beyond the reference").
    """
    import numpy as np

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    attr_cols = list(attr_cols)
    out_cols = [id_col] + attr_cols

    def bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.select([id_col, ts_col] + attr_cols)
        if len(g) == 0:
            sch = g.schema
            ts_t = sch.field(ts_col).type
            return pa.table(
                {c: pa.array([], sch.field(c).type) for c in out_cols}
                | {"valid_from": pa.array([], ts_t),
                   "valid_to": pa.array([], ts_t),
                   "is_current": pa.array([], pa.bool_())})
        g = g.combine_chunks().sort_by(
            [(id_col, "ascending"), (ts_col, "ascending")])
        if collapse:
            keep = _run_starts(g, [id_col] + attr_cols)
            g = g.filter(pa.array(keep)).combine_chunks()
        n = len(g)
        new_run = _run_starts(g, [id_col])
        run_end = np.zeros(n, bool)
        run_end[-1] = True
        run_end[:-1] = new_run[1:]
        ts = g[ts_col].combine_chunks()
        nxt = ts.take(pa.array(
            np.minimum(np.arange(n, dtype=np.int64) + 1, n - 1),
            pa.int64()))
        valid_to = pc.if_else(pa.array(~run_end), nxt,
                              pa.scalar(None, ts.type))
        return pa.table(
            {c: g[c] for c in out_cols}
            | {"valid_from": ts, "valid_to": valid_to,
               "is_current": pa.array(run_end)})

    return bucketed_map_groups(changelog, [id_col], bucket,
                               num_buckets=num_buckets)
