"""Log template mining — Drain-style pattern extraction re-expressed
as a deterministic batch plan (He et al., "Drain: An Online Log
Parsing Approach with Fixed Depth Tree", ICWS 2017; the batch variant
drops the online tree for an order-independent rule so results are
partitioning-invariant and oracle-checkable).

Rule: lines group by (token_count, first_token) — Drain's top tree
levels. Within a group, a position is CONSTANT iff every line agrees
on its token, else it becomes the ``<*>`` wildcard; the template is
the per-position constants/wildcards joined by single spaces.

Plan (mergeable min/max, never a token set):
  1. map_batches: whitespace-split (Arrow kernels, flat offsets — no
     per-row Python), explode to (n_tok, t0, pos, tok) and pre-reduce
     per batch with ONE Arrow hash-aggregate to
     (n_tok, t0, pos, tok_min, tok_max, cnt) — cnt counts the group's
     lines via the pos-0 rows, so only O(distinct templates × tokens)
     rows leave a batch no matter how many lines it held.
  2. grouped_aggregate merges partials distributed (min/max/sum are
     all mergeable) — "varied" is simply tok_min != tok_max.
  3. one bucket pass per (n_tok, t0) sorts by pos and joins the
     template string — Python work is per TEMPLATE, never per line.

At 100 TB the shuffle carries only the per-batch distinct partials —
the whole point of template mining is that distinct templates are few.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WILDCARD = "<*>"


def _explode_tokens(t: pa.Table, field: str, max_tokens: int):
    """(n_tok, t0, pos, tok) rows for every non-empty token of every
    line, positions past max_tokens dropped. Fully vectorized."""
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.offset:
        # compact sliced batches before the split: flatten/parent-index
        # pairs over a non-zero-offset source have shown intermittent
        # misalignment through the object-store roundtrip
        col = col.take(np.arange(len(col), dtype=np.int64))
    s = pc.utf8_split_whitespace(pc.cast(col, pa.string()))
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    flat = s.flatten()
    parent = np.asarray(pc.list_parent_indices(s)
                        .to_numpy(zero_copy_only=False))
    # utf8_split_whitespace yields '' tokens at line edges — drop them
    keep = np.asarray(pc.not_equal(flat, "").to_numpy(
        zero_copy_only=False))
    keep &= np.asarray(pc.is_valid(flat).to_numpy(zero_copy_only=False))
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    if len(parent) == 0:
        return None
    # per-line token counts and within-line positions (parents are
    # contiguous ascending in flat order)
    new_line = np.ones(len(parent), bool)
    new_line[1:] = parent[1:] != parent[:-1]
    starts = np.nonzero(new_line)[0]
    run_len = np.diff(np.append(starts, len(parent)))
    pos = np.arange(len(parent)) - np.repeat(starts, run_len)
    n_tok = np.repeat(run_len, run_len)
    t0 = flat.take(pa.array(np.repeat(starts, run_len), pa.int64()))
    ok = pos < max_tokens
    return pa.table({
        "n_tok": pa.array(n_tok[ok], pa.int64()),
        "t0": t0.filter(pa.array(ok)),
        "pos": pa.array(pos[ok], pa.int64()),
        "tok": flat.filter(pa.array(ok))})


def template_partials(ds, field: str = "message", *, max_tokens: int = 32):
    """The MERGEABLE representation of a template set: one
    (n_tok, t0, pos, tok_min, tok_max, cnt) row per position of each
    (token_count, first_token) group. min/min + max/max + sum merges
    two partial sets exactly — this is what a persisted template index
    stores, because rendered templates cannot merge (a new disagreeing
    line must widen a constant into the wildcard)."""
    from vector_ray.stages.aggregate import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        ex = _explode_tokens(t, field, max_tokens)
        if ex is None:
            return pa.table({
                "n_tok": pa.array([], pa.int64()),
                "t0": pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
                "tok_min": pa.array([], pa.string()),
                "tok_max": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64())})
        agg = ex.group_by(["n_tok", "t0", "pos"]).aggregate(
            [("tok", "min"), ("tok", "max"), ("tok", "count")])
        # cnt: each line contributes exactly one pos-0 token, so the
        # pos-0 token count IS the group's line count in this batch
        pos0 = pc.equal(agg["pos"], 0)
        cnt = pc.if_else(pos0, agg["tok_count"], pa.scalar(0, pa.int64()))
        return pa.table({
            "n_tok": agg["n_tok"], "t0": agg["t0"], "pos": agg["pos"],
            "tok_min": agg["tok_min"], "tok_max": agg["tok_max"],
            "cnt": pc.cast(cnt, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return grouped_aggregate(parts, ["n_tok", "t0", "pos"], {
        "tok_min": ("min", "tok_min"),
        "tok_max": ("max", "tok_max"),
        "cnt": ("sum", "cnt")})


def render_templates(merged, *, num_buckets=None):
    """Partials → (n_tok, t0, template, n_lines): one bucket pass per
    (n_tok, t0), Python work per TEMPLATE never per line."""
    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    def build(g: pa.Table) -> pa.Table:
        g = g.combine_chunks().sort_by([
            ("n_tok", "ascending"), ("t0", "ascending"),
            ("pos", "ascending")])
        new_run = _run_starts(g, ["n_tok", "t0"])
        starts = np.nonzero(new_run)[0]
        run_len = np.diff(np.append(starts, len(g)))
        mn = g["tok_min"].to_pylist()
        mx = g["tok_max"].to_pylist()
        cnt = np.asarray(pc.cast(g["cnt"], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        n_lines = np.add.reduceat(cnt, starts)
        toks = [m if m == x else WILDCARD for m, x in zip(mn, mx)]
        tpl = [" ".join(toks[s:s + L])
               for s, L in zip(starts, run_len)]
        first = pa.array(starts, pa.int64())
        return pa.table({
            "n_tok": g["n_tok"].take(first),
            "t0": g["t0"].take(first),
            "template": pa.array(tpl, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64())})

    return bucketed_map_groups(merged, ["n_tok", "t0"], build,
                               num_buckets=num_buckets)


def log_templates(ds, field: str = "message", *, max_tokens: int = 32,
                  num_buckets=None):
    """Mine templates from ``field``; returns
    (n_tok, t0, template, n_lines) — one row per (token_count,
    first_token) group, wildcards where lines disagree. Lines with no
    tokens are ignored; tokens past ``max_tokens`` don't participate
    (they'd always be wildcards in wide outlier lines)."""
    return render_templates(
        template_partials(ds, field, max_tokens=max_tokens),
        num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# persisted template index — "which log shapes are NEW today?"
#
# The index stores template_partials (the mergeable form), never
# rendered strings: update = union + min/max/sum re-merge, exactly the
# state/incremental.py checkpoint pattern (pointer file + orphan-safe
# dir swap). Novelty compares a batch against the index per
# (n_tok, t0) group:
#   new_group — the group key was never seen;
#   changed   — the batch widens at least one stored constant into the
#               wildcard (the classic "known error message, new
#               variable part" signal);
#   known     — the batch lines all match the stored template.


def _tpl_from(mn, mx):
    return " ".join(m if m == x else WILDCARD for m, x in zip(mn, mx))


def template_index_build(ds, index_dir: str, *,
                         field: str = "message",
                         max_tokens: int = 32) -> str:
    """Create (overwrite) the index from ``ds``. Returns the state
    path."""
    import json
    import os
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)
    out = os.path.join(index_dir, "state-000000")
    template_partials(ds, field, max_tokens=max_tokens).write_parquet(out)
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump({"max_tokens": max_tokens, "state": "state-000000"}, fh)
    return out


def _tpl_index_meta(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        return json.load(fh)


def template_index_update(ds, index_dir: str, *,
                          field: str = "message") -> str:
    """Merge a batch's partials into the index (min/min, max/max,
    sum; one aggregate-sized exchange) and swap the checkpoint
    atomically."""
    import json
    import os
    import shutil

    import ray.data as rd

    from vector_ray.stages.aggregate import grouped_aggregate

    meta = _tpl_index_meta(index_dir)
    old_dir = os.path.join(index_dir, meta["state"])
    new = template_partials(ds, field, max_tokens=meta["max_tokens"])
    cols = ["n_tok", "t0", "pos", "tok_min", "tok_max", "cnt"]
    both = rd.read_parquet(old_dir).select_columns(cols).union(
        new.select_columns(cols))
    merged = grouped_aggregate(both, ["n_tok", "t0", "pos"], {
        "tok_min": ("min", "tok_min"),
        "tok_max": ("max", "tok_max"),
        "cnt": ("sum", "cnt")})
    n = int(meta["state"].split("-")[1]) + 1
    state = f"state-{n:06d}"
    out = os.path.join(index_dir, state)
    shutil.rmtree(out, ignore_errors=True)  # orphan from a crashed run
    merged.write_parquet(out)
    meta["state"] = state
    tmp = os.path.join(index_dir, ".meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    shutil.rmtree(old_dir, ignore_errors=True)
    return out


def template_novelty(ds, index_dir: str, *,
                     field: str = "message",
                     num_buckets=None):
    """Classify every (n_tok, t0) group of the batch against the
    index: (n_tok, t0, status, template_batch, template_index,
    n_lines) with status ∈ {new_group, changed, known}. One tagged
    union of the two partial sets + one bucketed pass; Python work per
    template, never per line. The index is NOT modified — compose with
    ``template_index_update`` after triage."""
    import os

    import ray.data as rd

    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

    meta = _tpl_index_meta(index_dir)
    cap = int(meta["max_tokens"])
    cols = ["n_tok", "t0", "pos", "tok_min", "tok_max", "cnt"]

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            return t.select(cols).append_column(
                "side", pa.array(np.full(len(t), side, np.int8)))

        return fn

    idx = rd.read_parquet(
        os.path.join(index_dir, meta["state"])).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True)
    new = template_partials(ds, field, max_tokens=meta["max_tokens"]) \
        .map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)

    def classify(g: pa.Table) -> pa.Table:
        g = g.combine_chunks().sort_by([
            ("n_tok", "ascending"), ("t0", "ascending"),
            ("pos", "ascending"), ("side", "ascending")])
        nt = np.asarray(pc.cast(g["n_tok"], pa.int64()).combine_chunks()
                        .to_numpy(zero_copy_only=False))
        starts_mask = _run_starts(g, ["n_tok", "t0"])
        starts = np.nonzero(starts_mask)[0]
        bounds = np.append(starts, len(g))
        side = np.asarray(g["side"].to_numpy(zero_copy_only=False))
        pos = np.asarray(pc.cast(g["pos"], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        mn = g["tok_min"].to_pylist()
        mx = g["tok_max"].to_pylist()
        cnt = np.asarray(pc.cast(g["cnt"], pa.int64()).combine_chunks()
                         .to_numpy(zero_copy_only=False))
        o_nt, o_t0, o_status, o_tb, o_ti, o_n = [], [], [], [], [], []
        t0s = g["t0"].to_pylist()
        for a, b in zip(bounds[:-1], bounds[1:]):
            has_batch = (side[a:b] == 1).any()
            if not has_batch:
                continue  # index-only group: nothing new to report
            has_idx = (side[a:b] == 0).any()
            # positions past the index's max_tokens were dropped at
            # partial time — render only stored positions, matching
            # log_templates' behavior for wide outlier lines
            npos = min(int(nt[a]), int(cap))
            bat_mn = [None] * npos
            bat_mx = [None] * npos
            idx_mn = [None] * npos
            idx_mx = [None] * npos
            n_lines = 0
            for i in range(a, b):
                p = int(pos[i])
                if side[i] == 1:
                    bat_mn[p], bat_mx[p] = mn[i], mx[i]
                    if p == 0:
                        n_lines += int(cnt[i])
                else:
                    idx_mn[p], idx_mx[p] = mn[i], mx[i]
            tpl_batch = _tpl_from(bat_mn, bat_mx)
            if not has_idx:
                status, tpl_idx = "new_group", None
            else:
                tpl_idx = _tpl_from(idx_mn, idx_mx)
                mrg_mn = [m if i is None else min(m, i) if m is not None else i
                          for m, i in zip(bat_mn, idx_mn)]
                mrg_mx = [m if i is None else max(m, i) if m is not None else i
                          for m, i in zip(bat_mx, idx_mx)]
                status = ("changed" if _tpl_from(mrg_mn, mrg_mx) != tpl_idx
                          else "known")
            o_nt.append(int(nt[a]))  # the group key, not the render cap
            o_t0.append(t0s[a])
            o_status.append(status)
            o_tb.append(tpl_batch)
            o_ti.append(tpl_idx)
            o_n.append(n_lines)
        return pa.table({
            "n_tok": pa.array(o_nt, pa.int64()),
            "t0": pa.array(o_t0, pa.string()),
            "status": pa.array(o_status, pa.string()),
            "template_batch": pa.array(o_tb, pa.string()),
            "template_index": pa.array(o_ti, pa.string()),
            "n_lines": pa.array(o_n, pa.int64()),
        })

    return bucketed_map_groups(idx.union(new), ["n_tok", "t0"], classify,
                               num_buckets=num_buckets)
