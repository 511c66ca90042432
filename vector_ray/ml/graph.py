"""Distributed PageRank over an edge Dataset — the host/page-graph
quality signal of web-corpus curation (Common Crawl publishes host-level
ranks used to prioritize crawl/cleaning; algorithm: Page et al. 1999,
public spec). The reference engine has no counterpart (SURVEY §2
"beyond the reference"); ml/components.py covers undirected
connectivity, this covers directed link-quality scoring.

Arithmetic is FIXED-POINT int64 ("micro-rank" units, ``scale`` total
mass): every step is integer floor-division / addition, so the result
is bit-identical at any partition count and any summation order — the
property that makes an exact golden oracle possible. (A float64
PageRank sums contributions in shuffle arrival order; its last-ulp
noise cannot be hash-gated.) Floors leak a little mass per iteration —
irrelevant for a ranking signal, and the leak is mirrored exactly by
the oracle's plain-Python reimplementation.

Exact update (all integer ops):

  N        = #distinct nodes (src ∪ dst)
  R0(v)    = scale // N
  t        = (scale * (den - num) // den) // N        teleport/node
  out(u)   = R(u) * num // den
  share(u) = out(u) // outdeg(u)        if outdeg(u) > 0
  D        = Σ_{outdeg(u)=0} out(u)                    dangling mass
  R'(v)    = t + D // N + Σ_{u→v} share(u)

Plan per iteration (mirrors ml/components.py hash-min):
  shares    one map over ranks (O(N) rows)
  D         per-block partial sums → driver scalar
  contrib   edges ⋈ shares (bucketed hash join, key = src) →
            grouped sum by dst — shuffles only (node, int64) pairs
  R'        nodes ⋈ contrib (left) + constants
Ranks materialize between iterations (O(nodes) rows — the node table
is the small side); the directed edge set materializes ONCE and every
iteration reuses the same bucketing key (src), so at cluster scale the
join co-partitions without re-shuffling the edge payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 10, damping_num: int = 85,
             damping_den: int = 100, scale: int = 10**12,
             buckets: int | None = None, broadcast_limit: int = 5_000_000):
    """``edges``: Dataset of directed edges. Returns a Dataset with
    columns ``(node, rank)`` — rank in integer micro-units of
    ``scale`` total initial mass (divide by ``scale`` for the ~[0,1]
    PageRank value).

    Two execution modes, bit-identical results (same integer update):

    - node count ≤ ``broadcast_limit``: the rank vector lives on the
      driver and broadcasts per iteration via ``ray.put``; each
      iteration is ONE map-only pass over the (index-encoded,
      materialized-once) edges emitting pre-aggregated sparse
      (dst_idx, contrib) partials — sort+reduceat, int64-exact. This
      is the common host-graph shape (edges are the 100-TB side,
      hosts are ~10^8) and costs O(nodes) driver memory.
    - above the limit: fully distributed — per iteration one bucketed
      hash join (edges ⋈ shares, key=src) + one grouped sum by dst +
      one left join; every shuffled row is a 16-byte (int64, int64)
      pair. Honest scale note: the bucketed join re-exchanges the edge
      pairs each iteration (same key, but Ray Data has no persistent
      partitioning); for many-iteration runs at extreme edge counts,
      write the edges hive-partitioned by hash(src) once (the
      ml/ann.py ivf_build layout) and join per partition instead.
    """
    import ray

    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.join import bucketed_join

    def normalize(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src_col], "dst": t[dst_col]})

    edges_m = edges.map_batches(normalize, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    # nodes + outdeg in ONE aggregation: src occurrences weigh 1,
    # dst occurrences weigh 0 (they only establish node existence)
    def degree_rows(t: pa.Table) -> pa.Table:
        s, d = t["src"].combine_chunks(), t["dst"].combine_chunks()
        one = np.ones(len(s), np.int64)
        zero = np.zeros(len(d), np.int64)
        return pa.table({
            "node": pa.concat_arrays([s, d]),
            "is_src": pa.array(np.concatenate([one, zero])),
        })

    deg = grouped_aggregate(
        edges_m.map_batches(degree_rows, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["node"], {"outdeg": ("sum", "is_src")},
    ).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "rank": pa.array([], pa.int64())}),
            batch_format="pyarrow")

    r0 = scale // n_nodes
    teleport = (scale * (damping_den - damping_num) // damping_den) // n_nodes

    if n_nodes <= broadcast_limit:
        return _pagerank_broadcast(
            edges_m, deg, n_nodes=n_nodes, r0=r0, teleport=teleport,
            iters=iters, num=damping_num, den=damping_den)

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "outdeg": t["outdeg"],
            "rank": pa.array(np.full(len(t), r0, np.int64)),
        })

    ranks = deg.map_batches(init, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def shares_fn(t: pa.Table) -> pa.Table:
        r = np.asarray(t["rank"].to_numpy(zero_copy_only=False), np.int64)
        od = np.asarray(t["outdeg"].to_numpy(zero_copy_only=False), np.int64)
        out = r * damping_num // damping_den
        m = od > 0
        return pa.table({
            "node": t["node"].filter(pa.array(m)),
            "share": pa.array(out[m] // od[m]),
        })

    def dangling_partial(t: pa.Table) -> pa.Table:
        r = np.asarray(t["rank"].to_numpy(zero_copy_only=False), np.int64)
        od = np.asarray(t["outdeg"].to_numpy(zero_copy_only=False), np.int64)
        out = r * damping_num // damping_den
        return pa.table({"d": pa.array([int(out[od == 0].sum())], pa.int64())})

    for _ in range(iters):
        dang = sum(
            r["d"] for r in ranks.map_batches(
                dangling_partial, batch_format="pyarrow",
                zero_copy_batch=True).take_all())
        dang_share = dang // n_nodes
        shares = ranks.map_batches(shares_fn, batch_format="pyarrow",
                                   zero_copy_batch=True)
        j = bucketed_join(edges_m, shares, on=["src"], right_on=["node"],
                          buckets=buckets)
        contrib = grouped_aggregate(
            j.map_batches(
                lambda t: pa.table({"node": t["dst"], "c": t["share"]}),
                batch_format="pyarrow", zero_copy_batch=True),
            ["node"], {"c": ("sum", "c")},
        )
        nxt = bucketed_join(ranks.select_columns(["node", "outdeg"]),
                            contrib, on=["node"], join_type="left",
                            buckets=buckets)
        base = teleport + dang_share

        def update(t: pa.Table, _base=base) -> pa.Table:
            c = np.asarray(
                pc.fill_null(t["c"], 0).to_numpy(zero_copy_only=False),
                np.int64)
            return pa.table({
                "node": t["node"],
                "outdeg": t["outdeg"],
                "rank": pa.array(c + _base),
            })

        ranks = nxt.map_batches(update, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    return ranks.select_columns(["node", "rank"])


def _pagerank_broadcast(edges_m, deg, *, n_nodes: int, r0: int,
                        teleport: int, iters: int, num: int, den: int):
    """Broadcast-mode iterations (see ``pagerank`` docstring): driver
    holds the O(nodes) rank/outdeg vectors; edges are index-encoded
    once and each iteration is one map-only pass emitting sparse
    int64-exact (dst_idx, contrib) partials."""
    import ray
    import ray.data as rd

    parts = [b for b in deg.iter_batches(batch_format="pyarrow",
                                         batch_size=None)]
    deg_tbl = pa.concat_tables(parts) if parts else pa.table(
        {"node": pa.array([], pa.int64()), "outdeg": pa.array([], pa.int64())})
    node_arr = np.asarray(deg_tbl["node"].to_numpy(zero_copy_only=False))
    order = np.argsort(node_arr, kind="stable")
    nodes_sorted = node_arr[order]
    outdeg = np.asarray(
        deg_tbl["outdeg"].to_numpy(zero_copy_only=False), np.int64)[order]
    nodes_ref = ray.put(nodes_sorted)

    def index_edges(t: pa.Table) -> pa.Table:
        ns = ray.get(nodes_ref)
        si = np.searchsorted(ns, np.asarray(
            t["src"].to_numpy(zero_copy_only=False)))
        di = np.searchsorted(ns, np.asarray(
            t["dst"].to_numpy(zero_copy_only=False)))
        return pa.table({"si": pa.array(si.astype(np.int64)),
                         "di": pa.array(di.astype(np.int64))})

    edges_idx = edges_m.map_batches(index_edges, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()

    rank = np.full(n_nodes, r0, np.int64)
    has_out = outdeg > 0
    for _ in range(iters):
        out = rank * num // den
        dang = int(out[~has_out].sum())
        share = np.zeros(n_nodes, np.int64)
        share[has_out] = out[has_out] // outdeg[has_out]
        share_ref = ray.put(share)

        def contrib(t: pa.Table) -> pa.Table:
            sh = ray.get(share_ref)
            si = np.asarray(t["si"].to_numpy(zero_copy_only=False))
            di = np.asarray(t["di"].to_numpy(zero_copy_only=False))
            o = np.argsort(di, kind="stable")
            di_s, c_s = di[o], sh[si[o]]
            first = np.ones(len(di_s), bool)
            first[1:] = di_s[1:] != di_s[:-1]
            idx = np.nonzero(first)[0]
            sums = np.add.reduceat(c_s, idx) if len(idx) else np.empty(
                0, np.int64)
            return pa.table({"i": pa.array(di_s[idx]),
                             "c": pa.array(sums.astype(np.int64))})

        acc = np.zeros(n_nodes, np.int64)
        for b in edges_idx.map_batches(
                contrib, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(
                    batch_format="pyarrow", batch_size=None):
            np.add.at(acc, np.asarray(b["i"].to_numpy(zero_copy_only=False)),
                      np.asarray(b["c"].to_numpy(zero_copy_only=False)))
        rank = acc + teleport + dang // n_nodes

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_sorted),
        "rank": pa.array(rank),
    }))


def triangle_count(edges, *, a_col: str = "src", b_col: str = "dst",
                   buckets: int | None = None):
    """Exact triangle count of the UNDIRECTED graph induced by the
    edge Dataset (direction, duplicate edges and self-loops are
    normalized away first). Returns a one-row pa.Table
    (n_triangles: int64).

    Classic degree-ordered compact-forward plan (Cohen's MapReduce
    triangle counting / Schank-Wagner — public results): orient every
    edge from the lower (degree, id) endpoint to the higher, so each
    triangle is counted exactly once and per-source out-degrees are
    bounded by O(√m) on any graph (arboricity bound) — the wedge
    fan-out never explodes on a high-degree hub, because a hub's edges
    point INTO it.

      1. canonicalize: (min, max), dedupe, drop loops — bucketed
         keep-first over (u, v) pairs;
      2. degrees: one grouped count over flattened endpoints;
      3. rank join: two bucketed joins attach (deg, id) ranks, the
         edge orients low→high;
      4. wedges: one bucketed exchange on src; per-bucket sorted-run
         pair enumeration (vectorized triu per run — the token-LSH
         candidate shape);
      5. count: wedges ⋈ oriented-edge set on (v, w) — matches ARE
         the triangles; per-block match counts sum driver-side.

    Every exchange ships (int64, int64) pairs only."""
    from vector_ray.stages.aggregate import grouped_aggregate
    from vector_ray.stages.bucketed import (bucketed_first,
                                            bucketed_map_groups)
    from vector_ray.stages.join import bucketed_join

    def canon(t: pa.Table) -> pa.Table:
        a = np.asarray(pc.cast(t[a_col], pa.int64()).combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(pc.cast(t[b_col], pa.int64()).combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": pa.array(np.minimum(a, b), pa.int64()),
                         "v": pa.array(np.maximum(a, b), pa.int64())})

    e = bucketed_first(
        edges.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["u", "v"]).materialize()

    ends = e.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t["u"].combine_chunks(), t["v"].combine_chunks()])}),
        batch_format="pyarrow", zero_copy_batch=True)
    deg = grouped_aggregate(ends, ["node"], {"deg": ("count", "node")})

    ju = bucketed_join(e, deg, on=["u"], right_on=["node"],
                       buckets=buckets)
    ju = ju.map_batches(
        lambda t: pa.table({"u": t["u"], "v": t["v"],
                            "du": pc.cast(t["deg"], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    jv = bucketed_join(ju, deg, on=["v"], right_on=["node"],
                       buckets=buckets)

    def orient(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(t["v"].combine_chunks()
                       .to_numpy(zero_copy_only=False), np.int64)
        du = np.asarray(t["du"].combine_chunks()
                        .to_numpy(zero_copy_only=False), np.int64)
        dv = np.asarray(pc.cast(t["deg"], pa.int64()).combine_chunks()
                        .to_numpy(zero_copy_only=False), np.int64)
        # low (deg, id) → high (deg, id)
        swap = (du > dv) | ((du == dv) & (u > v))
        src = np.where(swap, v, u)
        dst = np.where(swap, u, v)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    oriented = jv.map_batches(orient, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if len(g) < 2:
            return empty
        g = g.combine_chunks().sort_by([("src", "ascending"),
                                        ("dst", "ascending")])
        src = np.asarray(g["src"].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        dst = np.asarray(g["dst"].combine_chunks()
                         .to_numpy(zero_copy_only=False), np.int64)
        new = np.concatenate(([True], src[1:] != src[:-1]))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(src)))
        npair = cnt * (cnt - 1) // 2
        total = int(npair.sum())
        if total == 0:
            return empty
        # exact integer triu enumeration, two repeat levels:
        # level 1 — one row per (run, i) with i = 0..c_r-2
        n_i = cnt - 1
        runs1 = np.repeat(np.arange(len(cnt)), n_i)
        off1 = np.zeros(len(cnt), np.int64)
        np.cumsum(n_i[:-1], out=off1[1:])
        i_w = np.arange(len(runs1), dtype=np.int64) - off1[runs1]
        # level 2 — each (run, i) expands to j = i+1..c_r-1
        reps = cnt[runs1] - 1 - i_w
        runs2 = np.repeat(runs1, reps)
        i2 = np.repeat(i_w, reps)
        off2 = np.zeros(len(reps), np.int64)
        np.cumsum(reps[:-1], out=off2[1:])
        jloc = np.arange(total, dtype=np.int64) - np.repeat(off2, reps)
        j2 = i2 + 1 + jloc
        x = dst[starts[runs2] + i2]
        y = dst[starts[runs2] + j2]
        return pa.table({"x": pa.array(np.minimum(x, y), pa.int64()),
                         "y": pa.array(np.maximum(x, y), pa.int64())})

    w = bucketed_map_groups(oriented, ["src"], wedges,
                            num_buckets=buckets)
    # every wedge row is a distinct potential triangle, so count INNER
    # matches (a semi-join would collapse wedge multiplicity). The
    # closing edge is checked against the ID-canonical set ``e`` —
    # wedge endpoints are id-canonicalized, the oriented set is
    # DEGREE-ordered and would miss half the closures.
    closed = bucketed_join(
        w, e.map_batches(
            lambda t: pa.table({"x": t["u"], "y": t["v"]}),
            batch_format="pyarrow", zero_copy_batch=True),
        on=["x", "y"], buckets=buckets)
    n = closed.count()
    return pa.table({"n_triangles": pa.array([int(n)], pa.int64())})
