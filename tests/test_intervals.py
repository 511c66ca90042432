"""merge_intervals (stages/intervals.py): per-key span union."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.intervals import _segmented_cummax, merge_intervals


def _brute(key, s, e, min_gap=0):
    by = collections.defaultdict(list)
    for kk, ss, ee in zip(key, s, e):
        by[kk].append((ss, ee))
    out = []
    for kk in sorted(by):
        cur = None
        for ss, ee in sorted(by[kk]):
            if cur is None:
                cur = [ss, ee, 1]
            elif ss <= cur[1] + min_gap:
                cur[1] = max(cur[1], ee)
                cur[2] += 1
            else:
                out.append((kk, *cur))
                cur = [ss, ee, 1]
        if cur is not None:
            out.append((kk, *cur))
    return out


class TestSegmentedCummax:
    def test_resets_at_segments(self):
        x = np.array([3, 1, 5, 2, 9, 1, 1, 8], np.int64)
        seg = np.array([1, 0, 0, 1, 0, 1, 0, 0], bool)
        got = _segmented_cummax(x, seg)
        assert got.tolist() == [3, 3, 5, 2, 9, 1, 1, 8]

    def test_random_vs_loop(self):
        rng = np.random.default_rng(0)
        x = rng.integers(-100, 100, 500)
        seg = rng.random(500) < 0.1
        seg[0] = True
        ref, cur = [], None
        for v, st in zip(x, seg):
            cur = v if st else max(cur, v)
            ref.append(cur)
        assert _segmented_cummax(x, seg).tolist() == ref


class TestMergeIntervals:
    def _run(self, key, s, e, parts=6, **kw):
        t = pa.table({"k": pa.array(key, pa.int64()),
                      "s": pa.array(s, pa.int64()),
                      "e": pa.array(e, pa.int64())})
        out = merge_intervals(rd.from_arrow(t).repartition(parts),
                              "k", "s", "e", count_col="n", **kw)
        df = out.to_pandas().sort_values(["k", "s"])
        return list(map(tuple, df[["k", "s", "e", "n"]].values))

    def test_matches_brute_force(self):
        rng = np.random.default_rng(5)
        n = 5000
        key = rng.integers(0, 50, n)
        s = rng.integers(0, 20000, n).astype(np.int64)
        e = s + rng.integers(0, 300, n)
        assert self._run(key, s, e) == _brute(key, s, e)

    def test_min_gap_and_touching(self):
        key = [1, 1, 1, 2]
        s = [0, 10, 25, 0]
        e = [10, 20, 30, 5]       # [0,10] touches [10,20]; gap 5 to [25,30]
        assert self._run(key, s, e) == [(1, 0, 20, 2), (1, 25, 30, 1),
                                        (2, 0, 5, 1)]
        assert self._run(key, s, e, min_gap=5) == [(1, 0, 30, 3),
                                                   (2, 0, 5, 1)]

    def test_nulls_dropped_and_layout_invariant(self):
        t = pa.table({"k": pa.array([1, None, 1], pa.int64()),
                      "s": pa.array([0, 5, None], pa.int64()),
                      "e": pa.array([4, 9, 9], pa.int64())})
        for parts in (1, 3):
            out = merge_intervals(rd.from_arrow(t).repartition(parts),
                                  "k", "s", "e").take_all()
            assert out == [{"k": 1, "s": 0, "e": 4}]

    def test_end_before_start_raises(self):
        import pytest
        t = pa.table({"k": pa.array([1], pa.int64()),
                      "s": pa.array([10], pa.int64()),
                      "e": pa.array([3], pa.int64())})
        with pytest.raises(Exception, match="end < start"):
            merge_intervals(rd.from_arrow(t), "k", "s", "e").take_all()
