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


def log_templates(ds, field: str = "message", *, max_tokens: int = 32,
                  num_buckets=None):
    """Mine templates from ``field``; returns
    (n_tok, t0, template, n_lines) — one row per (token_count,
    first_token) group, wildcards where lines disagree. Lines with no
    tokens are ignored; tokens past ``max_tokens`` don't participate
    (they'd always be wildcards in wide outlier lines)."""
    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.bucketed import _run_starts, bucketed_map_groups

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
    merged = grouped_aggregate(parts, ["n_tok", "t0", "pos"], {
        "tok_min": ("min", "tok_min"),
        "tok_max": ("max", "tok_max"),
        "cnt": ("sum", "cnt")})

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
