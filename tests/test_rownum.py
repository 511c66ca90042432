"""global_row_number (stages/rownum.py): distributed ROW_NUMBER."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.rownum import global_row_number


def _t(n=100, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in ids]),
    })


class TestGlobalRowNumber:
    def test_matches_rank_and_layout_invariant(self):
        t = _t(200)
        for parts in (1, 7):
            out = global_row_number(
                rd.from_arrow(t).repartition(parts), "doc_id").take_all()
            got = {r["doc_id"]: r["row_id"] for r in out}
            assert got == {i: i for i in range(200)}

    def test_multi_column_and_descending(self):
        t = _t(60, seed=1)
        out = global_row_number(
            rd.from_arrow(t).repartition(4), "source",
            tiebreak="doc_id", descending=False).take_all()
        ranked = sorted(out, key=lambda r: (r["source"], r["doc_id"]))
        assert [r["row_id"] for r in ranked] == list(range(60))

        out_d = global_row_number(
            rd.from_arrow(t).repartition(4), "doc_id",
            descending=True).take_all()
        got = {r["doc_id"]: r["row_id"] for r in out_d}
        assert got == {i: 59 - i for i in range(60)}

    def test_string_keys(self):
        t = pa.table({"k": pa.array([f"k{i:03d}" for i in (5, 1, 9, 0, 3)])})
        out = global_row_number(rd.from_arrow(t).repartition(2), "k").take_all()
        got = {r["k"]: r["row_id"] for r in out}
        assert got == {"k000": 0, "k001": 1, "k003": 2, "k005": 3, "k009": 4}

    def test_pairs_with_deterministic_shuffle(self):
        from vector_ray.ml.sampling import deterministic_shuffle

        t = _t(80, seed=2)
        ds = deterministic_shuffle(rd.from_arrow(t).repartition(3),
                                   id_col="doc_id", seed=4, keep_key="h")
        out = global_row_number(ds, "h", tiebreak="doc_id").take_all()
        # positions are a contiguous permutation and follow hash order
        assert sorted(r["row_id"] for r in out) == list(range(80))
        by_pos = sorted(out, key=lambda r: r["row_id"])
        hs = [r["h"] for r in by_pos]
        assert hs == sorted(hs)

    def test_empty(self):
        t = pa.table({"doc_id": pa.array([], pa.int64())})
        out = global_row_number(rd.from_arrow(t), "doc_id").take_all()
        assert out == []

    def test_shard_assignment(self):
        t = _t(100, seed=3)
        out = global_row_number(rd.from_arrow(t).repartition(4), "doc_id",
                                shard_size=30).take_all()
        for r in out:
            assert r["shard"] == r["row_id"] // 30
        from collections import Counter
        sizes = Counter(r["shard"] for r in out)
        assert sizes == {0: 30, 1: 30, 2: 30, 3: 10}


class TestEwma:
    def test_matches_sequential_recurrence_all_alphas(self):
        import numpy as np

        from vector_ray.stages.shift import partitioned_shift

        rng = np.random.default_rng(3)
        n = 2000
        k = rng.integers(0, 5, n)
        ts = np.arange(n)
        x = rng.normal(size=n) * 10
        t = pa.table({"k": pa.array(k, pa.int64()),
                      "ts": pa.array(ts, pa.int64()),
                      "x": pa.array(x, pa.float64())})
        for alpha in (0.0, 0.3, 0.999, 1.0):
            outs = []
            for parts in (1, 6):
                o = partitioned_shift(
                    rd.from_arrow(t).repartition(parts), ["k"], ["ts"],
                    {"e": ("ewma", "x", alpha)}).to_pandas()
                o = o.sort_values(["k", "ts"])
                outs.append(o["e"].to_numpy())
            assert np.array_equal(outs[0], outs[1]), alpha
            o = partitioned_shift(rd.from_arrow(t), ["k"], ["ts"],
                                  {"e": ("ewma", "x", alpha)}).to_pandas()
            o = o.sort_values(["k", "ts"])
            for key in range(5):
                xs = x[k == key][np.argsort(ts[k == key])]
                got = o.loc[o["k"] == key, "e"].to_numpy()
                y = np.empty(len(xs))
                y[0] = xs[0]
                for i in range(1, len(xs)):
                    y[i] = alpha * xs[i] + (1 - alpha) * y[i - 1]
                assert np.allclose(got, y, rtol=1e-9, atol=1e-12), alpha

    def test_long_run_chunking(self):
        # one key longer than the chunk width L forces carry handoffs
        import numpy as np

        from vector_ray.stages.shift import partitioned_shift

        n, alpha = 1500, 0.9  # w=0.1 -> L = floor(230/ln10) = 99
        x = np.sin(np.arange(n))
        t = pa.table({"k": pa.array([1] * n, pa.int64()),
                      "ts": pa.array(np.arange(n), pa.int64()),
                      "x": pa.array(x, pa.float64())})
        o = partitioned_shift(rd.from_arrow(t).repartition(4), ["k"],
                              ["ts"], {"e": ("ewma", "x", alpha)})
        got = o.to_pandas().sort_values("ts")["e"].to_numpy()
        y = np.empty(n)
        y[0] = x[0]
        for i in range(1, n):
            y[i] = alpha * x[i] + (1 - alpha) * y[i - 1]
        assert np.allclose(got, y, rtol=1e-9, atol=1e-12)
        assert np.all(np.isfinite(got))


def test_rate_counter_resets():
    from vector_ray.stages.shift import partitioned_shift

    t = pa.table({"k": pa.array([1, 1, 1, 1, 2], pa.int64()),
                  "ts": pa.array([1, 2, 3, 4, 1], pa.int64()),
                  "x": pa.array([10.0, 15.0, 3.0, 8.0, 7.0],
                                pa.float64())})
    o = partitioned_shift(rd.from_arrow(t).repartition(2), ["k"],
                          ["ts"], {"r": ("rate", "x")}).to_pandas()
    o = o.sort_values(["k", "ts"]).reset_index(drop=True)
    # first row null; 15-10=5; 3<15 -> reset -> 3; 8-3=5; key 2 first
    assert o["r"].isna().tolist() == [True, False, False, False, True]
    assert o["r"].dropna().tolist() == [5.0, 3.0, 5.0]


class TestRankValues:
    def _check(self, vals, parts=5):
        import duckdb

        from vector_ray.stages.rownum import rank_values

        t = pa.table({
            "id": pa.array(range(len(vals)), pa.int64()),
            "v": pa.array(vals, pa.float64()),
        })
        out = (rank_values(rd.from_arrow(t).repartition(parts), "v",
                           id_col="id")
               .to_pandas().sort_values("id").reset_index(drop=True))
        ref = duckdb.sql(
            "SELECT id, percent_rank() OVER (ORDER BY v) AS pct_rank, "
            "cume_dist() OVER (ORDER BY v) AS cume_dist "
            "FROM t WHERE v IS NOT NULL ORDER BY id").df()
        assert len(out) == len(ref)
        assert np.array_equal(out["pct_rank"].values, ref["pct_rank"].values)
        assert np.array_equal(out["cume_dist"].values,
                              ref["cume_dist"].values)

    def test_ties_nulls_negzero(self):
        rng = np.random.default_rng(3)
        vals = list(rng.normal(size=400)) + [2.5] * 30 + [0.0, -0.0]
        vals[7] = None
        vals[250] = None
        self._check(vals)

    def test_single_value_and_constant(self):
        self._check([42.0])          # percent_rank of n=1 is 0
        self._check([7.0] * 50)      # all tied: pct 0, cume 1

    def test_layout_invariant(self):
        vals = list(np.linspace(-5, 5, 101))
        for parts in (1, 3, 11):
            self._check(vals, parts=parts)
