"""Property tests for the state layer: incremental aggregation is
split-invariant (any fragmentation + any feeding order of new
fragments equals a one-shot aggregate), min/max pruning never drops a
file containing a matching row, and the per-file Bloom sidecar has no
false negatives. Examples are kept small — every example spins Ray
Data jobs."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def grouped_values(draw):
    n = draw(st.integers(4, 40))
    gs = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    vs = draw(st.lists(
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=n, max_size=n))
    cuts = sorted(draw(st.lists(st.integers(1, n - 1), min_size=0,
                                max_size=3, unique=True)))
    return gs, vs, cuts


class TestIncrementalProperties:
    @given(grouped_values())
    @settings(max_examples=12, deadline=None)
    def test_split_invariant(self, tmp_path_factory, data):
        from vector_ray.state.incremental import IncrementalAggregate

        gs, vs, cuts = data
        tmp = tmp_path_factory.mktemp("incprop")
        root = str(tmp / "in")
        os.makedirs(root)
        bounds = [0] + cuts + [len(gs)]
        frags = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            t = pa.table({"g": pa.array(gs[lo:hi], pa.int64()),
                          "v": pa.array(vs[lo:hi], pa.float64())})
            p = os.path.join(root, f"f{i}.parquet")
            pq.write_table(t, p)
            frags.append(p)
        inc = IncrementalAggregate(str(tmp / "state"), ["g"], {
            "n": ("count", "v"), "s": ("sum", "v"),
            "lo": ("min", "v"), "hi": ("max", "v"),
        })
        # feed one fragment at a time (worst-case merge count)
        for p in frags:
            inc.update([p])
        got = {r["g"]: r for r in inc.result().take_all()}
        # one-shot reference
        arrg, arrv = np.asarray(gs), np.asarray(vs, dtype=object)
        for key in set(gs):
            sub = [v for g, v in zip(gs, vs) if g == key and v is not None]
            r = got[key]
            assert r["n"] == len(sub)
            if sub:
                assert r["s"] == pytest.approx(sum(sub), rel=1e-9, abs=1e-9)
                assert r["lo"] == pytest.approx(min(sub))
                assert r["hi"] == pytest.approx(max(sub))
            else:
                assert r["s"] is None or r["s"] == 0 or np.isnan(r["s"])


@st.composite
def lake_and_range(draw):
    n_files = draw(st.integers(1, 5))
    files = []
    for _ in range(n_files):
        m = draw(st.integers(1, 20))
        vals = draw(st.lists(st.integers(-100, 100), min_size=m, max_size=m))
        files.append(vals)
    lo = draw(st.integers(-120, 120))
    hi = draw(st.integers(-120, 120))
    if lo > hi:
        lo, hi = hi, lo
    return files, lo, hi


class TestPruneProperties:
    @given(lake_and_range())
    @settings(max_examples=15, deadline=None)
    def test_minmax_never_drops_matches(self, tmp_path_factory, data):
        from vector_ray.state.datastats import prune_paths, stats_index_build

        files, lo, hi = data
        root = str(tmp_path_factory.mktemp("pruneprop") / "lake")
        os.makedirs(root)
        for i, vals in enumerate(files):
            pq.write_table(
                pa.table({"v": pa.array(vals, pa.int64())}),
                os.path.join(root, f"f{i}.parquet"))
        stats_index_build(root)
        kept, total = prune_paths(root, "v", float(lo), float(hi))
        kept = set(kept)
        for i, vals in enumerate(files):
            if any(lo <= v <= hi for v in vals):
                assert os.path.join(root, f"f{i}.parquet") in kept

    @given(st.lists(st.lists(st.integers(0, 10_000), min_size=1,
                             max_size=30), min_size=1, max_size=4),
           st.lists(st.integers(0, 10_000), min_size=1, max_size=8))
    @settings(max_examples=10, deadline=None)
    def test_bloom_never_drops_matches(self, tmp_path_factory, files, probe):
        from vector_ray.state.datastats import (bloom_index_build,
                                                bloom_prune_paths)

        root = str(tmp_path_factory.mktemp("bloomprop") / "lake")
        os.makedirs(root)
        for i, vals in enumerate(files):
            pq.write_table(
                pa.table({"k": pa.array(vals, pa.int64())}),
                os.path.join(root, f"f{i}.parquet"))
        bloom_index_build(root, "k")
        kept, _ = bloom_prune_paths(root, "k", probe)
        kept = set(kept)
        pset = set(probe)
        for i, vals in enumerate(files):
            if pset & set(vals):
                assert os.path.join(root, f"f{i}.parquet") in kept
