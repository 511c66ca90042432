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


class TestIntervalJoin:
    def _mk(self, keys, s, e, ident):
        import pyarrow as pa

        return rd.from_arrow(pa.table({
            "k": pa.array(keys, pa.int64()),
            f"{ident}_id": pa.array(range(len(keys)), pa.int64()),
            "s": pa.array(s, pa.int64()),
            "e": pa.array(e, pa.int64()),
        })).repartition(3)

    def _run(self, L, R, chunk, **kw):
        from vector_ray.stages.intervals import interval_join

        out = interval_join(L, R, keys="k", l_start="s", l_end="e",
                            r_start="s", r_end="e", chunk=chunk, **kw)
        return {(r["a_id"], r["b_id"]) for r in out.take_all()}

    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(2)
        nl, nr = 600, 500
        lk = rng.integers(0, 8, nl); rk = rng.integers(0, 8, nr)
        ls = rng.integers(0, 900, nl); le = ls + rng.integers(0, 80, nl)
        rs = rng.integers(0, 900, nr); re_ = rs + rng.integers(0, 80, nr)
        got = self._run(self._mk(lk, ls, le, "a"),
                        self._mk(rk, rs, re_, "b"), chunk=64)
        exp = {(i, j) for i in range(nl) for j in range(nr)
               if lk[i] == rk[j] and ls[i] <= re_[j] and rs[j] <= le[i]}
        assert got == exp

    def test_chunk_size_invariance(self, ray_session):
        # same pairs whatever the slab width (dedupe rule is exact)
        rng = np.random.default_rng(9)
        n = 300
        k = rng.integers(0, 5, n)
        s = rng.integers(0, 400, n)
        e = s + rng.integers(0, 150, n)  # spans cross many small slabs
        L = self._mk(k[:150], s[:150], e[:150], "a")
        R = self._mk(k[150:], s[150:], e[150:], "b")
        small = self._run(L, R, chunk=7)
        big = self._run(L, R, chunk=100_000)
        assert small == big and small

    def test_touching_endpoints_join(self, ray_session):
        # closed intervals: a.e == b.s counts as overlap
        got = self._run(self._mk([1], [0], [10], "a"),
                        self._mk([1], [10], [20], "b"), chunk=8)
        assert got == {(0, 0)}
        got = self._run(self._mk([1], [11], [20], "a"),
                        self._mk([1], [0], [10], "b"), chunk=8)
        assert got == set()

    def test_null_rows_dropped(self, ray_session):
        import pyarrow as pa

        L = rd.from_arrow(pa.table({
            "k": pa.array([1, None, 1], pa.int64()),
            "a_id": pa.array([0, 1, 2], pa.int64()),
            "s": pa.array([0, 0, None], pa.int64()),
            "e": pa.array([5, 5, 5], pa.int64()),
        }))
        R = self._mk([1], [3], [8], "b")
        assert self._run(L, R, chunk=16) == {(0, 0)}

    def test_end_before_start_raises(self, ray_session):
        import pytest

        with pytest.raises(Exception, match="end < start"):
            self._run(self._mk([1], [10], [5], "a"),
                      self._mk([1], [0], [1], "b"), chunk=4)

    def test_max_group_cap_raises(self, ray_session):
        import pytest

        n = 200
        L = self._mk([1] * n, [0] * n, [1] * n, "a")
        R = self._mk([1] * n, [0] * n, [1] * n, "b")
        with pytest.raises(Exception, match="max_group"):
            self._run(L, R, chunk=10, max_group=50)

    def test_payload_suffix_on_clash(self, ray_session):
        from vector_ray.stages.intervals import interval_join

        L = self._mk([1, 1], [0, 100], [10, 110], "a")
        R = self._mk([1], [5], [7], "b")
        out = interval_join(L, R, keys="k", l_start="s", l_end="e",
                            r_start="s", r_end="e", chunk=32).take_all()
        assert len(out) == 1
        row = out[0]
        assert row["s"] == 0 and row["e"] == 10
        assert row["s_r"] == 5 and row["e_r"] == 7


class TestSegmentSearchsorted:
    def test_matches_per_segment_loop(self):
        from vector_ray.stages.intervals import _segment_searchsorted

        rng = np.random.default_rng(4)
        nseg = 20
        vals, vseg = [], []
        for g in range(nseg):
            m = rng.integers(0, 30)
            vals.extend(np.sort(rng.integers(-50, 50, m)).tolist())
            vseg.extend([g] * m)
        vals = np.array(vals, np.int64); vseg = np.array(vseg, np.int64)
        qry = rng.integers(-60, 60, 200).astype(np.int64)
        qseg = rng.integers(0, nseg, 200).astype(np.int64)
        lo_ext = np.full(nseg, -60, np.int64)
        hi_ext = np.full(nseg, 60, np.int64)
        for side in ("left", "right"):
            got = _segment_searchsorted(vals, vseg, qry, qseg, nseg,
                                        lo_ext, hi_ext, side)
            bounds = np.searchsorted(vseg, np.arange(nseg + 1))
            for j in range(200):
                a, b = bounds[qseg[j]], bounds[qseg[j] + 1]
                assert got[j] == a + np.searchsorted(
                    vals[a:b], qry[j], side=side)

    def test_overflow_raises(self):
        import pytest

        from vector_ray.stages.intervals import _segment_searchsorted

        big = np.int64(2**62)
        with pytest.raises(OverflowError):
            _segment_searchsorted(
                np.array([0], np.int64), np.array([0], np.int64),
                np.array([0], np.int64), np.array([0], np.int64),
                4, np.array([-big] * 4, np.int64),
                np.array([big] * 4, np.int64), "left")
