"""Direct tests for the bucketed group-processing helpers
(stages/bucketed.py) — the O(buckets)-Python-calls replacements for
per-distinct-key map_groups."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vector_ray.stages.bucketed import (
    add_bucket,
    bucketed_first,
    bucketed_map_groups,
    bucketed_segment_groups,
    keep_first_per_key,
)


class TestKeepFirst:
    def test_string_key_with_order(self):
        t = pa.table({"k": ["b", "a", "b", "a"], "o": [2, 9, 1, 3], "v": [20, 90, 10, 30]})
        out = keep_first_per_key(t, ["k"], "o")
        got = {r["k"]: r["v"] for r in out.to_pylist()}
        assert got == {"a": 30, "b": 10}

    def test_int_key_fast_path(self):
        t = pa.table({"k": pa.array([5, 5, 1, 1, 1], pa.int64()),
                      "o": [2, 1, 3, 1, 2], "v": [52, 51, 13, 11, 12]})
        out = keep_first_per_key(t, ["k"], "o")
        got = {r["k"]: r["v"] for r in out.to_pylist()}
        assert got == {1: 11, 5: 51}

    def test_null_keys_kept_distinct(self):
        t = pa.table({"k": ["a", None, "a", None], "o": [1, 2, 0, 1], "v": [1, 2, 3, 4]})
        out = keep_first_per_key(t, ["k"], "o")
        got = sorted(r["v"] for r in out.to_pylist())
        assert got == [3, 4]  # first per key incl. the null key group


class TestAddBucket:
    def test_same_key_same_bucket(self):
        t = pa.table({"k": ["x", "y", "x", "z", "y"]})
        out = add_bucket(t, ["k"], 7)
        b = out["__bkt"].to_pylist()
        assert b[0] == b[2] and b[1] == b[4]
        assert all(0 <= v < 7 for v in b)

    def test_multi_int_keys(self):
        t = pa.table({"a": pa.array([1, 1, 2], pa.int32()),
                      "b": pa.array([9, 9, 9], pa.int64())})
        out = add_bucket(t, ["a", "b"], 16)
        v = out["__bkt"].to_pylist()
        assert v[0] == v[1]
        assert all(0 <= x < 16 for x in v)


class TestBucketedFirst:
    def test_global_first_deterministic(self):
        n = 5000
        t = pa.table({
            "k": [f"k{i % 700}" for i in range(n)],
            "o": list(range(n))[::-1],
            "v": list(range(n)),
        })
        out = bucketed_first(rd.from_arrow(t).repartition(6), ["k"], order_by="o").take_all()
        assert len(out) == 700
        # first by o = the LAST original row of each key
        want = {}
        for r in t.to_pylist():
            cur = want.get(r["k"])
            if cur is None or r["o"] < cur["o"]:
                want[r["k"]] = r
        got = {r["k"]: r["v"] for r in out}
        assert got == {k: r["v"] for k, r in want.items()}


class TestBucketedSegmentGroups:
    def test_only_multi_segments_processed(self):
        calls = []

        def seg(g: pa.Table) -> pa.Table:
            calls.append(len(g))
            return pa.table({"k": g["k"].slice(0, 1),
                             "n": pa.array([len(g)], pa.int64())})

        t = pa.table({"k": pa.array([1, 2, 3, 4, 5, 5, 6, 7, 7, 7], pa.int64())})
        empty = pa.table({"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        out = bucketed_segment_groups(
            rd.from_arrow(t).repartition(3), ["k"], seg, empty
        ).take_all()
        got = {r["k"]: r["n"] for r in out}
        assert got == {5: 2, 7: 3}

    def test_empty_result_schema_stable(self):
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        empty = pa.table({"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        out = bucketed_segment_groups(
            rd.from_arrow(t), ["k"], lambda g: g, empty
        )
        assert out.count() == 0


class TestBucketedMapGroups:
    def test_whole_bucket_fn(self):
        t = pa.table({"k": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})

        def bucket_sum(g: pa.Table) -> pa.Table:
            gb = pa.TableGroupBy(g, "k").aggregate([("v", "sum")])
            return gb.rename_columns(["k", "v_sum"])

        out = bucketed_map_groups(rd.from_arrow(t).repartition(2), ["k"], bucket_sum).take_all()
        got = {r["k"]: r["v_sum"] for r in out}
        assert got == {"a": 4, "b": 2, "c": 4}


def test_grouped_argmax_argmin_ties_and_invariance():
    import pandas as pd

    from vector_ray.stages.aggregate import grouped_argmax, grouped_argmin

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "id": pa.array([10, 11, 12, 20, 21], pa.int64()),
        "x": pa.array([5.0, 9.0, 9.0, 1.0, 1.0], pa.float64())})
    outs = []
    for parts in (1, 4):
        ds = rd.from_arrow(t).repartition(parts)
        mx = grouped_argmax(ds, ["k"], "x", tie_col="id").to_pandas()
        mn = grouped_argmin(ds, ["k"], "x", tie_col="id").to_pandas()
        outs.append((mx.sort_values("k").reset_index(drop=True),
                     mn.sort_values("k").reset_index(drop=True)))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])
    mx, mn = outs[0]
    # ties break to the SMALLEST id
    assert mx.loc[mx["k"] == 1, "id"].item() == 11
    assert mx.loc[mx["k"] == 2, "id"].item() == 20
    assert mn.loc[mn["k"] == 1, "id"].item() == 10
    assert mn.loc[mn["k"] == 2, "id"].item() == 20
