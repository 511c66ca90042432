"""Join stage tests: native wrapper, bucketed hash join, as-of join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.join import asof_join, bucketed_join, join


def ds_of(tbl, blocks=2):
    return rd.from_arrow(tbl).repartition(blocks)


LEFT = pa.table({"k": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
RIGHT = pa.table({"k": ["a", "b", "d"], "rv": [10, 20, 40]})


class TestBucketedJoin:
    def test_inner(self):
        out = bucketed_join(ds_of(LEFT), ds_of(RIGHT), ["k"], buckets=4).take_all()
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
        assert got == [("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]

    def test_left_outer(self):
        out = bucketed_join(ds_of(LEFT), ds_of(RIGHT), ["k"], join_type="left").take_all()
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
        assert got == [("a", 1, 10), ("a", 4, 10), ("b", 2, 20), ("c", 3, None)]

    def test_different_key_names(self):
        right = pa.table({"rk": ["a", "b"], "rv": [10, 20]})
        out = bucketed_join(ds_of(LEFT), ds_of(right), ["k"], right_on=["rk"]).take_all()
        assert sorted((r["k"], r["rv"]) for r in out) == [("a", 10), ("a", 10), ("b", 20)]


class TestNativeJoin:
    def test_native_inner_matches_bucketed(self):
        out = join(ds_of(LEFT), ds_of(RIGHT), ["k"], num_partitions=4).take_all()
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
        assert got == [("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]


class TestAsofJoin:
    def test_backward(self):
        trades = pa.table(
            {"sym": ["x", "x", "y"], "t": [10, 20, 15], "price": [1.0, 2.0, 9.0]}
        )
        quotes = pa.table(
            {"sym": ["x", "x", "y"], "t": [8, 18, 11], "bid": [0.9, 1.9, 8.5]}
        )
        out = asof_join(ds_of(trades), ds_of(quotes), by=["sym"], on="t").take_all()
        got = {(r["sym"], r["t"]): r["bid"] for r in out}
        assert got[("x", 10)] == 0.9
        assert got[("x", 20)] == 1.9
        assert got[("y", 15)] == 8.5


class TestSemiAntiJoin:
    def _sides(self):
        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array(list("abcde")),
        })).repartition(2)
        right = rd.from_arrow(pa.table({
            "rk": pa.array([2, 4, 4, 9], pa.int64()),
            "w": pa.array(list("xyzq")),
        })).repartition(2)
        return left, right

    def test_semi(self):
        from vector_ray.stages.join import join
        left, right = self._sides()
        out = join(left, right, ["k"], right_on=["rk"], join_type="semi").take_all()
        assert sorted(r["k"] for r in out) == [2, 4]  # no dup from 4,4
        assert set(out[0]) == {"k", "v"}

    def test_anti(self):
        from vector_ray.stages.join import join
        left, right = self._sides()
        out = join(left, right, ["k"], right_on=["rk"], join_type="anti").take_all()
        assert sorted(r["k"] for r in out) == [1, 3, 5]

    def test_anti_empty_right(self):
        from vector_ray.stages.join import join
        left, _ = self._sides()
        right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64()),
                                        "w": pa.array([], pa.string())}))
        out = join(left, right, ["k"], right_on=["rk"], join_type="anti").take_all()
        assert sorted(r["k"] for r in out) == [1, 2, 3, 4, 5]


class TestOuterJoins:
    def _sides(self):
        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array(list("abc")),
        })).repartition(2)
        right = rd.from_arrow(pa.table({
            "rk": pa.array([2, 4], pa.int64()),
            "w": pa.array(list("xy")),
        })).repartition(2)
        return left, right

    def test_right_outer(self):
        from vector_ray.stages.join import join
        left, right = self._sides()
        out = join(left, right, ["k"], right_on=["rk"],
                   join_type="right outer").take_all()
        rows = sorted((r["rk"], r.get("v"), r["w"]) for r in out)
        assert rows == [(2, "b", "x"), (4, None, "y")]

    def test_full_outer_coalesces_key(self):
        from vector_ray.stages.join import join
        left, right = self._sides()
        out = join(left, right, ["k"], right_on=["rk"],
                   join_type="full outer").take_all()
        rows = sorted((r["k"], r.get("v"), r.get("w")) for r in out)
        assert rows == [(1, "a", None), (2, "b", "x"),
                        (3, "c", None), (4, None, "y")]


class TestBroadcastJoin:
    def test_matches_bucketed_per_type(self):
        from vector_ray.stages.join import broadcast_join

        for jt in ("inner", "left", "semi", "anti"):
            got = broadcast_join(ds_of(LEFT), RIGHT, ["k"],
                                 join_type=jt).take_all()
            want = bucketed_join(ds_of(LEFT), ds_of(RIGHT), ["k"],
                                 join_type=jt, buckets=4).take_all()
            norm = lambda rows: sorted(
                tuple(sorted(r.items(), key=lambda kv: kv[0]))
                for r in rows)
            assert norm(got) == norm(want), jt

    def test_right_on_and_dataset_right(self):
        from vector_ray.stages.join import broadcast_join

        right = pa.table({"rk": ["a", "b"], "rv": [10, 20]})
        out = broadcast_join(ds_of(LEFT), ds_of(right, 3), ["k"],
                             right_on=["rk"], join_type="inner").take_all()
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out)
        assert got == [("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]

    def test_size_guard(self):
        import pytest as _pt

        from vector_ray.stages.join import broadcast_join

        with _pt.raises(ValueError):
            broadcast_join(ds_of(LEFT), RIGHT, ["k"],
                           max_broadcast_rows=2)


class TestRangeJoin:
    def test_inner_left_and_partition_invariance(self):
        import pyarrow as pa
        import ray.data as rd

        from vector_ray.stages.join import range_join

        pts = pa.table({"k": pa.array(["a", "a", "a", "b"]),
                        "p": pa.array([5, 15, 25, 5], pa.int64()),
                        "eid": pa.array([1, 2, 3, 4], pa.int64())})
        iv = pa.table({"k": pa.array(["a", "a", "b"]),
                       "lo": pa.array([0, 20, 10], pa.int64()),
                       "hi": pa.array([9, 29, 19], pa.int64()),
                       "win": pa.array([100, 101, 200], pa.int64())})
        for parts in (1, 3):
            out = range_join(rd.from_arrow(pts).repartition(parts),
                             rd.from_arrow(iv), by=["k"], point="p",
                             lo="lo", hi="hi").to_pandas()
            assert sorted(zip(out["eid"], out["win"])) == \
                [(1, 100), (3, 101)], parts
        out2 = range_join(rd.from_arrow(pts).repartition(2),
                          rd.from_arrow(iv), by=["k"], point="p",
                          lo="lo", hi="hi", how="left").to_pandas()
        m = {e: (None if w != w else int(w))
             for e, w in zip(out2["eid"], out2["win"])}
        assert m == {1: 100, 2: None, 3: 101, 4: None}

    def test_clash_raises(self):
        import pyarrow as pa
        import pytest
        import ray.data as rd

        from vector_ray.stages.join import range_join

        pts = pa.table({"k": pa.array(["a"]), "p": pa.array([1], pa.int64()),
                        "win": pa.array([0], pa.int64())})
        iv = pa.table({"k": pa.array(["a"]), "lo": pa.array([0], pa.int64()),
                       "hi": pa.array([9], pa.int64()),
                       "win": pa.array([100], pa.int64())})
        with pytest.raises(ValueError, match="clash"):
            range_join(rd.from_arrow(pts), rd.from_arrow(iv), by=["k"],
                       point="p", lo="lo", hi="hi")


class TestJoinSkew:
    def test_hot_key_join_completes_and_matches(self):
        """Extreme key skew: one key holds 2/3 of the left side. The
        bucketed join's contract is that a hot key degrades to one big
        bucket (documented), not a wrong or hung result — verify exact
        parity with a single-process Arrow join."""
        import numpy as np

        rng = np.random.default_rng(3)
        hot = np.full(100_000, 7, np.int64)
        cold = rng.integers(0, 100, 50_000)
        keys = np.concatenate([hot, cold])
        left = pa.table({"k": pa.array(keys),
                         "lv": pa.array(np.arange(len(keys), dtype=np.int64))})
        right = pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                          "rv": pa.array(np.arange(100, dtype=np.int64) * 10)})
        out = bucketed_join(ds_of(left, blocks=8), ds_of(right, blocks=2),
                            ["k"], buckets=8)
        got = out.take_all()
        want = left.join(right, keys="k", join_type="inner")
        assert len(got) == len(want) == len(keys)  # every key matches
        s_got = sum(r["rv"] for r in got)
        s_want = int(pa.compute.sum(want["rv"]).as_py())
        assert s_got == s_want
        # hot-key rows all carried the right value
        assert all(r["rv"] == 70 for r in got[:10] if r["k"] == 7)


class TestSkewJoin:
    def _skewed(self):
        # 2/3 of left rows on key "hot"; right has one row per key
        n = 3000
        ks = np.where(np.arange(n) % 3 < 2, "hot",
                      np.char.add("c", (np.arange(n) % 7).astype(str)))
        left = pa.table({"k": ks.astype(object), "lv": np.arange(n)})
        rk = ["hot"] + [f"c{i}" for i in range(7)] + ["only_right"]
        right = pa.table({"k": rk, "rv": np.arange(len(rk)) * 10})
        return ds_of(left, 6), ds_of(right, 2)

    def test_matches_bucketed_per_type(self):
        from vector_ray.stages.join import skew_join

        l, r = self._skewed()
        for jt in ("inner", "left", "semi", "anti"):
            want = sorted(
                tuple(sorted(row.items()))
                for row in bucketed_join(l, r, ["k"], join_type=jt, buckets=4).take_all()
            )
            got = sorted(
                tuple(sorted(row.items()))
                for row in skew_join(l, r, ["k"], join_type=jt, buckets=4,
                                     hot_frac=0.05).take_all()
            )
            assert got == want, jt

    def test_no_hot_keys_falls_back(self):
        from vector_ray.stages.join import skew_join

        l = ds_of(pa.table({"k": [f"u{i}" for i in range(200)],
                            "lv": list(range(200))}), 4)
        r = ds_of(pa.table({"k": [f"u{i}" for i in range(0, 200, 2)],
                            "rv": list(range(100))}), 2)
        out = skew_join(l, r, ["k"], hot_frac=0.05).take_all()
        assert len(out) == 100

    def test_hot_key_routes_and_right_only_key_dropped(self):
        from vector_ray.stages.join import skew_join

        l, r = self._skewed()
        out = skew_join(l, r, ["k"], hot_frac=0.05).take_all()
        hot_rows = [row for row in out if row["k"] == "hot"]
        assert len(hot_rows) == 2000 and all(row["rv"] == 0 for row in hot_rows)
        assert not any(row["k"] == "only_right" for row in out)

    def test_bad_join_type_raises(self):
        from vector_ray.stages.join import skew_join

        l, r = self._skewed()
        try:
            skew_join(l, r, ["k"], join_type="full")
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")


class TestBloomPrefilterJoin:
    def test_inner_matches_plain(self):
        left = pa.table({"k": [f"u{i}" for i in range(500)],
                         "lv": list(range(500))})
        right = pa.table({"k": [f"u{i}" for i in range(0, 500, 25)],
                          "rv": list(range(20))})
        plain = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in bucketed_join(ds_of(left, 4), ds_of(right), ["k"]).take_all())
        bloomed = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in bucketed_join(ds_of(left, 4), ds_of(right), ["k"],
                                   bloom_prefilter=True,
                                   bloom_bits=1 << 16).take_all())
        assert bloomed == plain and len(plain) == 20

    def test_semi_and_multikey(self):
        left = pa.table({"a": ["x", "x", "y", "z"], "b": [1, 2, 1, 9],
                         "lv": [10, 20, 30, 40]})
        right = pa.table({"a": ["x", "y"], "b": [1, 1], "rv": [7, 8]})
        out = bucketed_join(ds_of(left), ds_of(right), ["a", "b"],
                            join_type="semi", bloom_prefilter=True,
                            bloom_bits=1 << 16).take_all()
        assert sorted(r["lv"] for r in out) == [10, 30]

    def test_outer_types_rejected(self):
        try:
            bucketed_join(ds_of(LEFT), ds_of(RIGHT), ["k"], join_type="left",
                          bloom_prefilter=True)
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")
