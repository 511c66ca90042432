"""Checkpointed incremental aggregation (state/incremental.py):
fragment-skipping correctness (incremental == single-shot for every
supported kind), pure-replay runs that scan nothing, crash-safe
pointer semantics, and mean decomposition with nulls."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.state.incremental import IncrementalAggregate, incremental_aggregate

AGGS = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "avg": ("mean", "v"),
}


def _write_frags(tmp_path, n_frags=4, rows=300, seed=5):
    rng = np.random.default_rng(seed)
    root = str(tmp_path / "in")
    os.makedirs(root, exist_ok=True)
    frames = []
    for i in range(n_frags):
        t = pa.table({
            "g": pa.array(rng.integers(0, 7, rows), pa.int64()),
            "v": pa.array(rng.normal(100, 20, rows), pa.float64()),
        })
        pq.write_table(t, os.path.join(root, f"frag-{i}.parquet"))
        frames.append(t)
    return root, pa.concat_tables(frames)


def _single_shot(full: pa.Table):
    import pyarrow.compute as pc

    out = {}
    g = np.asarray(full["g"])
    v = np.asarray(full["v"])
    for key in sorted(set(g.tolist())):
        sub = v[g == key]
        out[key] = (len(sub), sub.sum(), sub.min(), sub.max(), sub.mean())
    return out


def _collect(ds):
    rows = {r["g"]: r for r in ds.take_all()}
    return rows


class TestIncrementalAggregate:
    def test_incremental_equals_single_shot(self, tmp_path):
        root, full = _write_frags(tmp_path)
        state = str(tmp_path / "state")
        inc = IncrementalAggregate(state, ["g"], AGGS)
        files = sorted(os.path.join(root, f) for f in os.listdir(root))
        # feed fragments 2-at-a-time
        r1 = inc.update(files[:2])
        assert r1["new_fragments"] == 2
        r2 = inc.update(files)  # first two must be skipped
        assert r2["new_fragments"] == 2 and r2["total_fragments"] == 4
        got = _collect(inc.result())
        want = _single_shot(full)
        assert set(got) == set(want)
        for k, (n, s, lo, hi, avg) in want.items():
            r = got[k]
            assert r["n"] == n
            assert r["total"] == pytest.approx(s)
            assert r["lo"] == pytest.approx(lo)
            assert r["hi"] == pytest.approx(hi)
            assert r["avg"] == pytest.approx(avg)

    def test_pure_replay_scans_nothing(self, tmp_path):
        root, full = _write_frags(tmp_path)
        state = str(tmp_path / "state")
        inc = IncrementalAggregate(state, ["g"], AGGS)
        inc.update(root)
        r = inc.update(root)
        assert r["new_fragments"] == 0
        got = _collect(inc.result())
        want = _single_shot(full)
        for k in want:
            assert got[k]["n"] == want[k][0]

    def test_one_call_form(self, tmp_path):
        root, full = _write_frags(tmp_path, n_frags=2)
        state = str(tmp_path / "state")
        out = incremental_aggregate(root, ["g"], {"n": ("count", "v")}, state)
        got = _collect(out)
        want = _single_shot(full)
        assert {k: v["n"] for k, v in got.items()} == {
            k: w[0] for k, w in want.items()}

    def test_new_file_after_checkpoint(self, tmp_path):
        root, _ = _write_frags(tmp_path, n_frags=2)
        state = str(tmp_path / "state")
        inc = IncrementalAggregate(state, ["g"], {"total": ("sum", "v")})
        inc.update(root)
        # append a fragment with a brand-new group
        t = pa.table({"g": pa.array([99] * 10, pa.int64()),
                      "v": pa.array([1.0] * 10, pa.float64())})
        pq.write_table(t, os.path.join(root, "frag-z.parquet"))
        r = inc.update(root)
        assert r["new_fragments"] == 1
        got = _collect(inc.result())
        assert got[99]["total"] == pytest.approx(10.0)

    def test_old_state_dirs_pruned(self, tmp_path):
        root, _ = _write_frags(tmp_path, n_frags=3)
        state = str(tmp_path / "state")
        inc = IncrementalAggregate(state, ["g"], {"n": ("count", "v")})
        files = sorted(os.path.join(root, f) for f in os.listdir(root))
        for i in range(3):
            inc.update(files[: i + 1])
        dirs = [d for d in os.listdir(state) if d.startswith("state-")]
        assert len(dirs) == 1

    def test_mean_all_null_group(self, tmp_path):
        root = str(tmp_path / "in")
        os.makedirs(root)
        t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                      "v": pa.array([None, None, 5.0], pa.float64())})
        pq.write_table(t, os.path.join(root, "f.parquet"))
        state = str(tmp_path / "state")
        out = incremental_aggregate(root, ["g"], {"avg": ("mean", "v")}, state)
        got = _collect(out)
        assert got[1]["avg"] is None
        assert got[2]["avg"] == pytest.approx(5.0)

    def test_crash_between_state_and_pointer_is_safe(self, tmp_path, monkeypatch):
        """A kill after the new state dir is written but BEFORE the
        pointer flips must leave the previous checkpoint fully usable,
        and the interrupted fragments re-scan on the next run."""
        root, full = _write_frags(tmp_path, n_frags=3)
        state = str(tmp_path / "state")
        files = sorted(os.path.join(root, f) for f in os.listdir(root))
        inc = IncrementalAggregate(state, ["g"], {"n": ("count", "v")})
        inc.update(files[:1])
        before = _collect(inc.result())

        import vector_ray.state.incremental as mod

        boom = RuntimeError("simulated crash before pointer flip")

        def exploding_flip(self, *a, **k):
            raise boom

        monkeypatch.setattr(mod.IncrementalAggregate, "_flip_pointer",
                            exploding_flip)
        with pytest.raises(RuntimeError):
            inc.update(files)
        monkeypatch.undo()

        # old checkpoint still the visible one
        inc2 = IncrementalAggregate(state, ["g"], {"n": ("count", "v")})
        assert _collect(inc2.result()) == before
        # recovery: the interrupted fragments re-scan and the final
        # answer matches the one-shot reference
        r = inc2.update(files)
        assert r["new_fragments"] == 2
        got = _collect(inc2.result())
        want = _single_shot(full)
        assert {k: v["n"] for k, v in got.items()} == {
            k: w[0] for k, w in want.items()}
        # the recovered state dir must hold exactly one row per group —
        # an orphan dir from the crashed run must not leak stale rows
        st = pq.read_table(r["state_path"])
        assert st.num_rows == len(want)

    def test_var_std_incremental_equals_numpy(self, tmp_path):
        root, full = _write_frags(tmp_path, n_frags=3)
        state = str(tmp_path / "state")
        inc = IncrementalAggregate(state, ["g"], {
            "v_var": ("var", "v"), "v_std": ("std", "v"),
        })
        files = sorted(os.path.join(root, f) for f in os.listdir(root))
        for p in files:  # one at a time: worst-case merging
            inc.update([p])
        got = _collect(inc.result())
        g = np.asarray(full["g"])
        v = np.asarray(full["v"])
        for key in set(g.tolist()):
            sub = v[g == key]
            assert got[key]["v_var"] == pytest.approx(sub.var(ddof=1), rel=1e-9)
            assert got[key]["v_std"] == pytest.approx(sub.std(ddof=1), rel=1e-9)

    def test_var_single_row_group_is_null(self, tmp_path):
        root = str(tmp_path / "in")
        os.makedirs(root)
        t = pa.table({"g": pa.array([1, 2, 2], pa.int64()),
                      "v": pa.array([4.0, 1.0, 3.0], pa.float64())})
        pq.write_table(t, os.path.join(root, "f.parquet"))
        out = incremental_aggregate(root, ["g"], {"s2": ("var", "v")},
                                    str(tmp_path / "state"))
        got = _collect(out)
        assert got[1]["s2"] is None            # n=1: sample var undefined
        assert got[2]["s2"] == pytest.approx(2.0)


class TestFragmentRegistry:
    def test_expand_skips_stats_sidecars(self, tmp_path):
        """An underscore-prefixed sidecar (e.g. routed/_stats/
        manifest.parquet from stats_index_build) must never register
        as an input fragment — it lacks the aggregate's columns."""
        root, full = _write_frags(tmp_path, n_frags=2)
        # plant sidecars: a _stats subdir and an underscore file
        sd = os.path.join(root, "_stats")
        os.makedirs(sd)
        pq.write_table(pa.table({"path": pa.array(["x"], pa.string())}),
                       os.path.join(sd, "manifest.parquet"))
        pq.write_table(pa.table({"meta": pa.array([1], pa.int64())}),
                       os.path.join(root, "_meta.parquet"))
        out = incremental_aggregate(root, ["g"], AGGS,
                                    str(tmp_path / "state"))
        got = _collect(out)
        want = _single_shot(full)
        assert {k: v["n"] for k, v in got.items()} == {
            k: w[0] for k, w in want.items()}

    def test_overwritten_file_same_size_rescans(self, tmp_path):
        """_frag_id includes mtime: overwriting a fragment with
        different content of the SAME byte size re-scans it."""
        root = str(tmp_path / "in")
        os.makedirs(root)
        p = os.path.join(root, "f.parquet")
        t1 = pa.table({"g": pa.array([1, 1], pa.int64()),
                       "v": pa.array([10.0, 20.0], pa.float64())})
        pq.write_table(t1, p)
        size1 = os.path.getsize(p)
        inc = IncrementalAggregate(str(tmp_path / "state"), ["g"],
                                   {"total": ("sum", "v")})
        inc.update(root)
        # same schema/row-count, different values -> same byte size
        t2 = pa.table({"g": pa.array([1, 1], pa.int64()),
                       "v": pa.array([30.0, 40.0], pa.float64())})
        pq.write_table(t2, p)
        os.utime(p, ns=(os.stat(p).st_atime_ns,
                        os.stat(p).st_mtime_ns + 1_000_000))
        assert os.path.getsize(p) == size1
        res = inc.update(root)
        assert res["new_fragments"] == 1  # re-scanned, not skipped


class TestConfigSource:
    def test_incremental_agg_source(self, tmp_path):
        """Config source type incremental_agg: each run scans only new
        fragments; the topology consumes the current aggregate."""
        from vector_ray.pipelines.config import Topology

        root, full = _write_frags(tmp_path, n_frags=2)
        cfg = {
            "sources": {"stats": {
                "type": "incremental_agg", "input": root,
                "state": str(tmp_path / "state"),
                "group_by": ["g"],
                "aggs": {"n": ["count", "v"], "vsum": ["sum", "v"]},
            }},
            "sinks": {"out": {"type": "blackhole", "inputs": ["stats"]}},
        }
        topo = Topology(cfg)
        got = {r["g"]: r for r in topo.node_dataset("stats").take_all()}
        want = _single_shot(full)
        assert {k: v["n"] for k, v in got.items()} == {
            k: w[0] for k, w in want.items()}
        # second topology over the same config: pure replay, same result
        got2 = {r["g"]: r["n"] for r in
                Topology(cfg).node_dataset("stats").take_all()}
        assert got2 == {k: v["n"] for k, v in got.items()}
