"""grouped_approx_quantiles (stages/quantile.py) and diverse_select
(ml/select.py): exactness on small keys, sampling determinism and
block-layout invariance, rank-error sanity, k-center selection
properties."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.ml.select import diverse_select
from vector_ray.stages.quantile import (
    approx_quantiles,
    grouped_approx_quantiles,
)


def _events(n=3000, n_keys=3, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array([f"k{i % n_keys}" for i in range(n)]),
        "value": pa.array(rng.normal(100.0, 25.0, n), pa.float64()),
    })


def _rank_value(vals, p):
    sv = sorted(vals)
    return sv[min(max(math.ceil(p * len(sv)) - 1, 0), len(sv) - 1)]


class TestGroupedApproxQuantiles:
    def test_exact_when_key_fits_in_k(self):
        t = _events(n=600)  # 200 rows/key < k
        out = grouped_approx_quantiles(
            rd.from_arrow(t).repartition(5), "event_type", "value",
            [0.5, 0.9], id_col="event_id", k=512, seed=3,
        ).take_all()
        got = {r["event_type"]: (r["p50"], r["p90"]) for r in out}
        vals = {}
        for k_, v in zip(t["event_type"].to_pylist(),
                         t["value"].to_pylist()):
            vals.setdefault(k_, []).append(v)
        for k_, vs in vals.items():
            assert got[k_] == (_rank_value(vs, 0.5), _rank_value(vs, 0.9))

    def test_layout_invariant_and_seeded(self):
        t = _events()
        mk = lambda parts, seed: sorted(
            (r["event_type"], r["p50"], r["p99"])
            for r in grouped_approx_quantiles(
                rd.from_arrow(t).repartition(parts), "event_type",
                "value", [0.5, 0.99], id_col="event_id", k=64,
                seed=seed).take_all())
        a, b = mk(3, 7), mk(11, 7)
        assert a == b  # pure function of the id set, not block layout
        assert mk(3, 8) != a  # seed changes the sample

    def test_sample_quantile_near_truth(self):
        t = _events(n=9000, n_keys=1)
        out = grouped_approx_quantiles(
            rd.from_arrow(t).repartition(6), "event_type", "value",
            [0.5], id_col="event_id", k=256, seed=1).take_all()
        truth = _rank_value(t["value"].to_pylist(), 0.5)
        sd = 25.0
        assert abs(out[0]["p50"] - truth) < sd  # ~0.5 rank-error band

    def test_nulls_ignored_and_global_wrapper(self):
        t = pa.table({
            "event_id": pa.array(range(8), pa.int64()),
            "value": pa.array([1.0, None, 3.0, None, 5.0, 7.0, 9.0,
                               11.0], pa.float64()),
        })
        out = approx_quantiles(rd.from_arrow(t).repartition(3), "value",
                               [0.0, 0.5, 1.0], id_col="event_id",
                               k=64).take_all()
        assert len(out) == 1
        r = out[0]
        assert (r["p0"], r["p50"], r["p100"]) == (1.0, 5.0, 11.0)


class TestGroupedMadOutliers:
    def test_matches_python_mirror(self):
        import math

        from vector_ray.stages.quantile import grouped_mad_outlier_filter

        t = _events(n=900, n_keys=3, seed=4)
        kept = sorted(r["event_id"] for r in grouped_mad_outlier_filter(
            rd.from_arrow(t).repartition(4), "event_type", "value",
            k=1.5).take_all())

        def q_disc(vs, p=0.5):
            sv = sorted(vs)
            return sv[min(max(math.ceil(p * len(sv)) - 1, 0),
                          len(sv) - 1)]

        per = {}
        for i, k_, v in zip(t["event_id"].to_pylist(),
                            t["event_type"].to_pylist(),
                            t["value"].to_pylist()):
            per.setdefault(k_, []).append((i, v))
        want = []
        for k_, rows in per.items():
            med = q_disc([v for _, v in rows])
            mad = q_disc([abs(v - med) for _, v in rows])
            want += [i for i, v in rows if abs(v - med) <= 1.5 * mad]
        assert kept == sorted(want)

    def test_outlier_mode_and_nulls(self):
        from vector_ray.stages.quantile import grouped_mad_outlier_filter

        t = pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "event_type": pa.array(["a"] * 5 + ["b"]),
            "value": pa.array([1.0, 1.0, 1.0, 100.0, None, None],
                              pa.float64()),
        })
        inl = grouped_mad_outlier_filter(
            rd.from_arrow(t), "event_type", "value", k=3.0).take_all()
        out = grouped_mad_outlier_filter(
            rd.from_arrow(t), "event_type", "value", k=3.0,
            keep="outlier").take_all()
        assert sorted(r["event_id"] for r in inl) == [0, 1, 2]
        assert sorted(r["event_id"] for r in out) == [3]  # nulls never


def _vecs(n=200, d=8, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })


class TestDiverseSelect:
    def test_ranks_and_determinism_across_layout(self):
        t = _vecs()
        a = diverse_select(rd.from_arrow(t).repartition(4), 16,
                           candidates=128, seed=2)
        b = diverse_select(rd.from_arrow(t).repartition(9), 16,
                           candidates=128, seed=2)
        assert a.equals(b)
        assert a["rank"].to_pylist() == list(range(16))
        ids = a["vec_id"].to_pylist()
        assert len(set(ids)) == 16

    def test_greedy_actually_diversifies(self):
        # two tight antipodal clusters: rank-1 pick must leave the
        # seed row's cluster immediately
        rng = np.random.default_rng(0)
        base = np.array([1.0, 0, 0, 0])
        m = np.concatenate([
            base + rng.normal(scale=0.01, size=(50, 4)),
            -base + rng.normal(scale=0.01, size=(50, 4)),
        ]).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        })
        out = diverse_select(rd.from_arrow(t).repartition(3), 2,
                             candidates=100, seed=1)
        ids = out["vec_id"].to_pylist()
        assert (ids[0] < 50) != (ids[1] < 50)

    def test_k_clamped_and_empty(self):
        t = _vecs(n=5)
        out = diverse_select(rd.from_arrow(t), 50, candidates=16)
        assert out.num_rows == 5
        empty = t.slice(0, 0)
        out0 = diverse_select(rd.from_arrow(empty), 3)
        assert out0.num_rows == 0


class TestExactQuantilesCont:
    def test_matches_duckdb_quantile_cont(self):
        import duckdb

        from vector_ray.stages.quantile import exact_quantiles_cont

        rng = np.random.default_rng(5)
        v = list(rng.normal(size=3333))
        v[3] = None
        t = pa.table({"v": pa.array(v, pa.float64())})
        ps = [0.0, 0.01, 0.25, 0.5, 0.777, 0.99, 1.0]
        for parts in (1, 5):
            got = exact_quantiles_cont(
                rd.from_arrow(t).repartition(parts), "v", ps)
            for p, g in zip(ps, got):
                ref = duckdb.sql(
                    f"SELECT quantile_cont(v, {p}) FROM t").fetchone()[0]
                assert g == ref, (p, g, ref)

    def test_empty_and_single(self):
        from vector_ray.stages.quantile import exact_quantiles_cont

        empty = pa.table({"v": pa.array([], pa.float64())})
        assert exact_quantiles_cont(rd.from_arrow(empty), "v",
                                    [0.5]) == [None]
        one = pa.table({"v": pa.array([7.5])})
        assert exact_quantiles_cont(rd.from_arrow(one), "v",
                                    [0.0, 0.5, 1.0]) == [7.5, 7.5, 7.5]


class TestGroupedQuantilesCont:
    def test_matches_duckdb(self):
        import duckdb
        import pandas as pd

        from vector_ray.stages.quantile import grouped_exact_quantiles

        rng = np.random.default_rng(9)
        n = 4000
        k = [f"g{v}" for v in rng.integers(0, 7, n)]
        v = list(rng.normal(size=n) * 100)
        v[5] = None
        t = pa.table({"k": pa.array(k), "v": pa.array(v, pa.float64())})
        out = grouped_exact_quantiles(
            rd.from_arrow(t).repartition(6), "k", "v", [0.25, 0.5, 0.9],
            interpolation="cont")
        ref = duckdb.sql("""
SELECT k, quantile_cont(v, 0.25) AS p25, quantile_cont(v, 0.5) AS p50,
       quantile_cont(v, 0.9) AS p90
FROM t WHERE v IS NOT NULL GROUP BY k ORDER BY k""").df()
        pd.testing.assert_frame_equal(
            out.to_pandas().sort_values("k").reset_index(drop=True),
            ref, check_exact=True)

    def test_bad_mode_raises(self):
        import pytest

        from vector_ray.stages.quantile import grouped_exact_quantiles

        t = pa.table({"k": pa.array(["a"]), "v": pa.array([1.0])})
        with pytest.raises(ValueError, match="disc|cont"):
            grouped_exact_quantiles(rd.from_arrow(t), "k", "v", [0.5],
                                    interpolation="nearest")
