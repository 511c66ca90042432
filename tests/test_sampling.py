"""Sampling / mixture operator tests (ml/sampling.py): determinism,
rate accuracy, quota uniformity, split complementarity, shuffle
permutation + seed sensitivity + block-layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.ml.sampling import (
    deterministic_shuffle,
    token_budget_cap,
    mixture_sample,
    per_key_cap,
    split_holdout,
)


def _docs(n=2000, n_src=8):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % n_src}" for i in range(n)]),
    })


class TestMixtureSample:
    def test_rates_and_determinism(self):
        t = _docs()
        rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
        a = mixture_sample(rd.from_arrow(t).repartition(4), rates,
                           key_col="source", default_rate=0.25, seed=1).take_all()
        b = mixture_sample(rd.from_arrow(t).repartition(7), rates,
                           key_col="source", default_rate=0.25, seed=1).take_all()
        assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
        per = {}
        for r in a:
            per[r["source"]] = per.get(r["source"], 0) + 1
        assert per["s0"] == 250          # rate 1.0 keeps everything
        assert "s2" not in per           # rate 0.0 keeps nothing
        assert 85 <= per["s1"] <= 165    # ~125 expected
        assert 30 <= per.get("s3", 0) <= 95  # default 0.25 → ~62

    def test_seed_changes_selection(self):
        t = _docs(500, 1)
        a = {r["doc_id"] for r in mixture_sample(
            rd.from_arrow(t), {}, default_rate=0.5, seed=1).take_all()}
        b = {r["doc_id"] for r in mixture_sample(
            rd.from_arrow(t), {}, default_rate=0.5, seed=2).take_all()}
        assert a != b

    def test_null_key_uses_default(self):
        t = pa.table({
            "doc_id": pa.array(range(100), pa.int64()),
            "source": pa.array([None] * 100, pa.string()),
        })
        out = mixture_sample(rd.from_arrow(t), {"s0": 1.0},
                             default_rate=0.0, seed=1).take_all()
        assert out == []


class TestSplitHoldout:
    def test_complementary_and_sized(self):
        t = _docs(1000, 1)
        tr = {r["doc_id"] for r in split_holdout(
            rd.from_arrow(t).repartition(3), 0.1, seed=4, which="train").take_all()}
        ho = {r["doc_id"] for r in split_holdout(
            rd.from_arrow(t).repartition(5), 0.1, seed=4, which="holdout").take_all()}
        assert tr | ho == set(range(1000)) and not (tr & ho)
        assert 60 <= len(ho) <= 145  # ~100 expected


class TestPerKeyCap:
    def test_cap_and_determinism_across_layout(self):
        t = _docs(1600, 4)
        a = per_key_cap(rd.from_arrow(t).repartition(2), "source", 10, seed=2).take_all()
        b = per_key_cap(rd.from_arrow(t).repartition(9), "source", 10, seed=2).take_all()
        assert sorted((r["source"], r["doc_id"]) for r in a) == \
            sorted((r["source"], r["doc_id"]) for r in b)
        per = {}
        for r in a:
            per.setdefault(r["source"], []).append(r["doc_id"])
        assert all(len(v) == 10 for v in per.values())
        # hash-min reservoir is a uniform sample: ids should not be the
        # first 10 of any key (probability ~ (10/400)^10)
        assert any(max(v) > 100 for v in per.values())

    def test_small_groups_kept_whole(self):
        t = _docs(12, 6)  # 2 rows per key < k
        out = per_key_cap(rd.from_arrow(t), "source", 5, seed=0).take_all()
        assert len(out) == 12


class TestDeterministicShuffle:
    def test_permutation_reproducible_and_seeded(self):
        t = _docs(800, 1)
        a = [r["doc_id"] for r in
             deterministic_shuffle(rd.from_arrow(t).repartition(4), seed=9)
             .take_all()]
        b = [r["doc_id"] for r in
             deterministic_shuffle(rd.from_arrow(t).repartition(6), seed=9)
             .take_all()]
        c = [r["doc_id"] for r in
             deterministic_shuffle(rd.from_arrow(t).repartition(4), seed=10)
             .take_all()]
        assert a == b                      # layout-invariant order
        assert sorted(a) == list(range(800))  # a permutation
        assert a != c                      # seed changes the order
        assert a != list(range(800))       # actually shuffled
        # no serial correlation worth worrying about: mean |step| of a
        # uniform permutation is ~n/3
        steps = np.abs(np.diff(np.array(a)))
        assert steps.mean() > 800 / 6

    def test_keep_key_column(self):
        t = _docs(50, 1)
        out = deterministic_shuffle(rd.from_arrow(t), seed=1,
                                    keep_key="shuffle_key").take_all()
        assert all("shuffle_key" in r for r in out)
        ks = [r["shuffle_key"] for r in out]
        assert ks == sorted(ks)


class TestTokenBudgetCap:
    @staticmethod
    def _ref_keep(tbl, budget, seed):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from golden import salted_int

        per = {}
        for rid, key, w in zip(tbl["doc_id"].to_pylist(),
                               tbl["source"].to_pylist(),
                               tbl["w"].to_pylist()):
            per.setdefault(key, []).append((salted_int(rid, seed), rid, w))
        kept = set()
        for lst in per.values():
            tot = 0
            for _, rid, w in sorted(lst):
                tot += w
                if tot > budget:
                    break
                kept.add(rid)
        return kept

    def _wdocs(self, n=600, n_src=5, seed=0):
        rng = np.random.default_rng(seed)
        t = _docs(n, n_src)
        return t.append_column("w", pa.array(rng.integers(1, 50, n), pa.int64()))

    def test_matches_reference_and_layout_invariant(self):
        t = self._wdocs()
        want = self._ref_keep(t, 400, seed=3)
        for parts in (1, 4, 9):
            out = token_budget_cap(
                rd.from_arrow(t).repartition(parts), "source", 400,
                weight_col="w", id_col="doc_id", seed=3,
            ).take_all()
            assert {r["doc_id"] for r in out} == want, f"parts={parts}"
            assert all("__vr_ovf" not in r and "__vr_hkey" not in r for r in out)

    def test_budget_is_strict_prefix(self):
        t = self._wdocs(300, 3, seed=1)
        out = token_budget_cap(rd.from_arrow(t).repartition(5), "source", 250,
                               weight_col="w", id_col="doc_id", seed=7).take_all()
        per = {}
        for r in out:
            per.setdefault(r["source"], 0)
            per[r["source"]] += r["w"]
        assert per and all(v <= 250 for v in per.values())

    def test_zero_budget_and_oversize_rows(self):
        t = self._wdocs(50, 2, seed=2)
        assert token_budget_cap(rd.from_arrow(t), "source", 0,
                                weight_col="w", id_col="doc_id").count() == 0
        # budget below every weight → nothing kept (strict prefix, no skip)
        big = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                        "source": pa.array(["a", "a", "b"]),
                        "w": pa.array([100, 100, 100], pa.int64())})
        assert token_budget_cap(rd.from_arrow(big), "source", 99,
                                weight_col="w", id_col="doc_id").count() == 0


class TestUniformSampleK:
    def test_exact_k_uniform_and_layout_invariant(self):
        from vector_ray.ml.sampling import uniform_sample_k

        t = _docs(500)
        a = uniform_sample_k(rd.from_arrow(t).repartition(7), 37, seed=5).take_all()
        b = uniform_sample_k(rd.from_arrow(t).repartition(2), 37, seed=5).take_all()
        assert len(a) == len(b) == 37
        assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
        # brute-force reference: k smallest sm64(fnv1a(id|seed))
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from golden import salted_int
        h = [salted_int(i, 5) for i in range(500)]
        want = sorted(sorted(range(500), key=lambda i: (h[i], i))[:37])
        assert sorted(r["doc_id"] for r in a) == want

    def test_k_exceeds_n_returns_all(self):
        from vector_ray.ml.sampling import uniform_sample_k

        t = _docs(20)
        out = uniform_sample_k(rd.from_arrow(t).repartition(3), 100).take_all()
        assert sorted(r["doc_id"] for r in out) == list(range(20))

    def test_seed_changes_selection(self):
        from vector_ray.ml.sampling import uniform_sample_k

        t = _docs(800)
        a = {r["doc_id"] for r in uniform_sample_k(rd.from_arrow(t), 50, seed=1).take_all()}
        b = {r["doc_id"] for r in uniform_sample_k(rd.from_arrow(t), 50, seed=2).take_all()}
        assert a != b


class TestWeightedSampleK:
    def _tbl(self, n=600):
        import numpy as np
        import pyarrow as pa

        # 10% heavy rows with 50x the weight of the rest
        w = np.where(np.arange(n) % 10 == 0, 50.0, 1.0)
        return pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "w": pa.array(w, pa.float64()),
        })

    def test_heavy_rows_dominate_and_deterministic(self):
        import ray.data as rd

        from vector_ray.ml.sampling import weighted_sample_k

        t = self._tbl()
        a = weighted_sample_k(rd.from_arrow(t).repartition(5), 60, "w",
                              seed=3).take_all()
        b = weighted_sample_k(rd.from_arrow(t).repartition(2), 60, "w",
                              seed=3).take_all()
        assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
        assert len(a) == 60
        heavy = sum(1 for r in a if r["doc_id"] % 10 == 0)
        # heavy rows are 60/600 of the pop with 50x weight -> expect
        # the selection to be mostly heavy (50*60/(50*60+540) ~ 85%)
        assert heavy >= 40

    def test_rejects_bad_weights(self):
        import pytest as _pt
        import pyarrow as pa
        import ray.data as rd

        from vector_ray.ml.sampling import weighted_sample_k

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "w": pa.array([1.0, 0.0], pa.float64())})
        with _pt.raises(Exception):
            weighted_sample_k(rd.from_arrow(t), 1, "w").take_all()


class TestWeightedPerKeyCap:
    def _t(self, n=300):
        rng = np.random.default_rng(2)
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "key": pa.array([f"k{i % 4}" for i in range(n)]),
            "w": pa.array(rng.integers(1, 1000, n).astype(np.float64)),
        })

    def test_cap_determinism_layout(self):
        from vector_ray.ml.sampling import weighted_per_key_cap

        t = self._t()
        picks = []
        for parts in (1, 6):
            out = weighted_per_key_cap(
                rd.from_arrow(t).repartition(parts), "key", 7, "w",
                id_col="doc_id", seed=9)
            rows = sorted((r["key"], r["doc_id"])
                          for r in out.take_all())
            picks.append(rows)
            # exactly 7 per key
            from collections import Counter
            assert set(Counter(k for k, _ in rows).values()) == {7}
        assert picks[0] == picks[1]

    def test_weight_bias(self):
        # a huge-weight row should essentially always survive
        from vector_ray.ml.sampling import weighted_per_key_cap

        t = self._t(100)
        w = t["w"].to_pylist()
        w[0] = 1e12
        t = t.set_column(2, "w", pa.array(w, pa.float64()))
        out = weighted_per_key_cap(rd.from_arrow(t), "key", 3, "w",
                                   id_col="doc_id", seed=1)
        assert 0 in {r["doc_id"] for r in out.take_all()}

    def test_bad_weights_raise(self):
        from vector_ray.ml.sampling import weighted_per_key_cap

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "key": pa.array(["a", "a"]),
                      "w": pa.array([1.0, -3.0])})
        import pytest

        with pytest.raises(Exception, match="finite and > 0"):
            weighted_per_key_cap(rd.from_arrow(t), "key", 1, "w",
                                 id_col="doc_id").take_all()
