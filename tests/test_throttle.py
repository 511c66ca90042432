"""throttle / ttl_dedupe (stages/throttle.py) and session_paths
(stages/paths.py) — brute-force mirrors over randomized keyed
streams, tie/null/skew edges, and the int64-overflow fallback of the
TTL chain."""

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.paths import session_paths
from vector_ray.stages.throttle import _chain_keep, throttle, ttl_dedupe


def _mk(ids, keys, ts, extra=None):
    cols = {
        "id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
    }
    if extra:
        cols.update(extra)
    return rd.from_arrow(pa.table(cols)).repartition(4)


def _brute_throttle(rows, threshold, window):
    seen = collections.Counter()
    keep = set()
    for i, k, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        w = t // window
        if seen[(k, w)] < threshold:
            seen[(k, w)] += 1
            keep.add(i)
    return keep


def _brute_ttl(rows, ttl):
    last = {}
    keep = set()
    for i, k, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        if k not in last or t >= last[k] + ttl:
            last[k] = t
            keep.add(i)
    return keep


class TestThrottle:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(7)
        n = 2000
        ids = list(range(n))
        keys = rng.integers(0, 12, n).tolist()
        ts = rng.integers(0, 500, n).tolist()
        out = throttle(_mk(ids, keys, ts), "k", "ts", threshold=3,
                       window=50, tiebreak="id").take_all()
        got = {r["id"] for r in out}
        assert got == _brute_throttle(list(zip(ids, keys, ts)), 3, 50)

    def test_ties_keep_min_tiebreak(self, ray_session):
        # 4 rows, same key, same ts — threshold 2 keeps the 2 lowest ids
        out = throttle(_mk([5, 3, 9, 1], [1] * 4, [10] * 4), "k", "ts",
                       threshold=2, window=100, tiebreak="id").take_all()
        assert sorted(r["id"] for r in out) == [1, 3]

    def test_null_ts_dropped_null_key_grouped(self, ray_session):
        t = pa.table({
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "k": pa.array([None, None, None, 1, 1], pa.int64()),
            "ts": pa.array([1, 2, None, 5, 6], pa.int64()),
        })
        out = throttle(rd.from_arrow(t), "k", "ts", threshold=1,
                       window=100, tiebreak="id").take_all()
        assert sorted(r["id"] for r in out) == [0, 3]

    def test_hot_key_skew(self, ray_session):
        # one key owns 90% of rows; plan caps per (key, window) locally
        rng = np.random.default_rng(1)
        n = 3000
        keys = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 50, n))
        ts = rng.integers(0, 1000, n)
        ids = np.arange(n)
        out = throttle(_mk(ids.tolist(), keys.tolist(), ts.tolist()),
                       "k", "ts", threshold=2, window=100,
                       tiebreak="id").take_all()
        got = {r["id"] for r in out}
        assert got == _brute_throttle(
            list(zip(ids.tolist(), keys.tolist(), ts.tolist())), 2, 100)


class TestTtlDedupe:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(3)
        n = 2000
        ids = list(range(n))
        keys = rng.integers(0, 15, n).tolist()
        ts = rng.integers(0, 400, n).tolist()
        out = ttl_dedupe(_mk(ids, keys, ts), "k", "ts", ttl=25,
                         tiebreak="id").take_all()
        assert {r["id"] for r in out} == _brute_ttl(
            list(zip(ids, keys, ts)), 25)

    def test_exact_boundary_kept(self, ray_session):
        # ts exactly last_kept + ttl is kept (>= semantics)
        out = ttl_dedupe(_mk([0, 1, 2], [1, 1, 1], [0, 10, 19]),
                         "k", "ts", ttl=10, tiebreak="id").take_all()
        assert sorted(r["ts"] for r in out) == [0, 10]

    def test_same_ts_keeps_one(self, ray_session):
        out = ttl_dedupe(_mk([7, 2, 9], [1, 1, 1], [5, 5, 5]),
                         "k", "ts", ttl=1, tiebreak="id").take_all()
        assert [r["id"] for r in out] == [2]

    def test_chain_keep_overflow_fallback(self):
        # spans sized so the shifted space exceeds int64: the
        # per-segment fallback must produce the same greedy chain
        big = np.int64(2**61)
        ts = np.array([0, 5, 12, 0, big - 3, big], np.int64)
        new_key = np.array([1, 0, 0, 1, 0, 0], bool)
        got = _chain_keep(ts, new_key, 5)
        # seg1 keeps 0, 5, 12; seg2 keeps 0 and big-3 (>= 0+5), then
        # big < (big-3)+5 is suppressed
        assert got.tolist() == [True, True, True, True, True, False]

    def test_chain_keep_vectorized_matches_loop(self):
        rng = np.random.default_rng(11)
        ts = np.sort(rng.integers(0, 300, 400)).astype(np.int64)
        # 5 segments of 80 sorted rows each
        ts = np.concatenate([np.sort(rng.integers(0, 300, 80))
                             for _ in range(5)]).astype(np.int64)
        new_key = np.zeros(400, bool)
        new_key[::80] = True
        got = _chain_keep(ts, new_key, 17)
        ref = np.zeros(400, bool)
        for a in range(0, 400, 80):
            last = None
            for i in range(a, a + 80):
                if last is None or ts[i] >= last + 17:
                    last = ts[i]
                    ref[i] = True
        assert got.tolist() == ref.tolist()


class TestSessionPaths:
    def _brute(self, rows, gap, max_steps, k, sep=">"):
        by = collections.defaultdict(list)
        for i, u, t, e in rows:
            by[u].append((t, i, e))
        paths = collections.Counter()
        for u in by:
            cur, last = [], None
            for t, i, e in sorted(by[u]):
                if last is not None and t - last > gap:
                    paths[sep.join(cur[:max_steps])] += 1
                    cur = []
                cur.append(e)
                last = t
            if cur:
                paths[sep.join(cur[:max_steps])] += 1
        ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(5)
        n = 3000
        ids = np.arange(n)
        users = rng.integers(0, 40, n)
        ts = rng.integers(0, 2000, n)
        # unique (user, ts) so tie order can't differ between sides
        ts = ts * 64 + (ids % 64)
        ets = np.array(list("abcd"))[rng.integers(0, 4, n)]
        t = pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "event_type": pa.array(ets.tolist()),
        })
        out = session_paths(rd.from_arrow(t).repartition(5),
                            key="user_id", ts_col="ts",
                            type_col="event_type", gap=300,
                            max_steps=3, k=10,
                            tiebreak="event_id").take_all()
        got = sorted(((r["path"], r["n_sessions"]) for r in out),
                     key=lambda kv: (-kv[1], kv[0]))
        rows = list(zip(ids.tolist(), users.tolist(), ts.tolist(),
                        ets.tolist()))
        assert got == self._brute(rows, 300, 3, 10)

    def test_truncation_and_gap_strictness(self, ray_session):
        # gap == diff does NOT break (strictly greater); max_steps cuts
        t = pa.table({
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "ts": pa.array([0, 10, 20, 31], pa.int64()),
            "event_type": pa.array(list("abcd")),
        })
        out = session_paths(rd.from_arrow(t), key="user_id",
                            ts_col="ts", type_col="event_type",
                            gap=10, max_steps=2, k=5,
                            tiebreak="event_id").take_all()
        got = {(r["path"], r["n_sessions"]) for r in out}
        assert got == {("a>b", 1), ("d", 1)}


class TestAssignSessions:
    def test_random_vs_brute(self, ray_session):
        from vector_ray.stages.sessions import assign_sessions

        rng = np.random.default_rng(13)
        n = 2500
        ids = np.arange(n)
        users = rng.integers(0, 30, n)
        ts = rng.integers(0, 3000, n) * 64 + (ids % 64)  # unique per user
        t = pa.table({
            "id": pa.array(ids, pa.int64()),
            "u": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
        })
        out = assign_sessions(rd.from_arrow(t).repartition(5), "u", "ts",
                              gap=500, tiebreak="id").take_all()
        got = {r["id"]: (r["session_seq"], r["session_pos"]) for r in out}
        by = collections.defaultdict(list)
        for i, u, tt in zip(ids.tolist(), users.tolist(), ts.tolist()):
            by[u].append((tt, i))
        exp = {}
        for u in by:
            sess, pos, last = 0, 0, None
            for tt, i in sorted(by[u]):
                if last is not None and tt - last > 500:
                    sess += 1
                    pos = 0
                exp[i] = (sess, pos)
                pos += 1
                last = tt
        assert got == exp

    def test_null_key_or_ts_dropped(self, ray_session):
        from vector_ray.stages.sessions import assign_sessions

        t = pa.table({
            "id": pa.array([0, 1, 2], pa.int64()),
            "u": pa.array([1, None, 1], pa.int64()),
            "ts": pa.array([5, 5, None], pa.int64()),
        })
        out = assign_sessions(rd.from_arrow(t), "u", "ts",
                              gap=10).take_all()
        assert [r["id"] for r in out] == [0]
