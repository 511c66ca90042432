"""auc_score (ml/metrics.py): exact distributed ROC-AUC."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.ml.metrics import auc_score


def _ref(t):
    return duckdb.sql("""
WITH d AS (SELECT s, CASE WHEN y THEN 1 ELSE 0 END AS yy FROM t
           WHERE s IS NOT NULL AND y IS NOT NULL),
g AS (SELECT s, SUM(yy) AS pos, COUNT(*)-SUM(yy) AS neg FROM d GROUP BY s),
o AS (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY s ROWS BETWEEN
      UNBOUNDED PRECEDING AND 1 PRECEDING),0) AS cumneg FROM g)
SELECT CAST(SUM(pos*(2*cumneg+neg)) AS DOUBLE) /
       CAST(2*(SELECT SUM(pos) FROM g)*(SELECT SUM(neg) FROM g) AS DOUBLE)
       AS auc FROM o""").df()["auc"][0]


class TestAucScore:
    def test_exact_vs_sql_with_ties_nulls(self):
        rng = np.random.default_rng(6)
        n = 5000
        y = rng.integers(0, 2, n)
        s = rng.normal(size=n) + y * 0.8
        s[::7] = np.round(s[::7], 1)
        sl, yl = list(s), [bool(v) for v in y]
        sl[3] = None
        yl[11] = None
        t = pa.table({"s": pa.array(sl, pa.float64()),
                      "y": pa.array(yl, pa.bool_())})
        for parts in (1, 9):
            out = auc_score(rd.from_arrow(t).repartition(parts),
                            "s", "y").to_pandas()
            assert out["auc"][0] == _ref(t)
            assert out["n_pos"][0] + out["n_neg"][0] == n - 2

    def test_perfect_and_degenerate(self):
        t = pa.table({"s": pa.array([1.0, 2.0, 3.0, 4.0]),
                      "y": pa.array([False, False, True, True])})
        assert auc_score(rd.from_arrow(t), "s", "y")["auc"][0].as_py() == 1.0
        t1 = pa.table({"s": pa.array([1.0, 2.0]),
                       "y": pa.array([True, True])})
        out = auc_score(rd.from_arrow(t1), "s", "y")
        assert out["auc"][0].as_py() is None
        assert out["n_neg"][0].as_py() == 0
        # all ties → 0.5
        t2 = pa.table({"s": pa.array([5.0] * 10),
                       "y": pa.array([i % 2 == 0 for i in range(10)])})
        assert auc_score(rd.from_arrow(t2), "s", "y")["auc"][0].as_py() == 0.5


class TestGroupedAuc:
    def test_exact_vs_sql(self):
        from vector_ray.ml.metrics import grouped_auc

        rng = np.random.default_rng(8)
        n = 8000
        k = rng.integers(0, 6, n)
        y = rng.integers(0, 2, n)
        s = rng.normal(size=n) + y * 0.5 * (k % 3)
        s[::5] = np.round(s[::5], 1)
        kl = [f"g{v}" for v in k]
        sl, yl = list(s), [bool(v) for v in y]
        kl[2] = None
        sl[3] = None
        yl[4] = None
        kl += ["solo"] * 3
        sl += [1.0, 2.0, 3.0]
        yl += [True] * 3
        t = pa.table({"k": pa.array(kl), "s": pa.array(sl, pa.float64()),
                      "y": pa.array(yl, pa.bool_())})
        out = (grouped_auc(rd.from_arrow(t).repartition(7), "k", "s", "y")
               .to_pandas().sort_values("k").reset_index(drop=True))
        ref = duckdb.sql("""
WITH d AS (SELECT k, s, CASE WHEN y THEN 1 ELSE 0 END AS yy FROM t
           WHERE s IS NOT NULL AND y IS NOT NULL AND k IS NOT NULL),
g AS (SELECT k, s, SUM(yy) AS pos, COUNT(*)-SUM(yy) AS neg
      FROM d GROUP BY k, s),
o AS (SELECT k, pos, neg, COALESCE(SUM(neg) OVER (PARTITION BY k
      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0)
      AS cumneg FROM g)
SELECT k, CASE WHEN SUM(pos)>0 AND SUM(neg)>0 THEN
       CAST(SUM(pos*(2*cumneg+neg)) AS DOUBLE) /
       CAST(2*SUM(pos)*SUM(neg) AS DOUBLE) END AS auc,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(neg) AS BIGINT) AS n_neg
FROM o GROUP BY k ORDER BY k""").df().reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(out, ref, check_exact=True)


class TestClassificationReport:
    def test_counts_and_rates(self):
        from vector_ray.ml.metrics import classification_report

        rng = np.random.default_rng(3)
        s = rng.uniform(0, 100, 4000)
        y = (s + rng.normal(0, 30, 4000)) > 50
        sl, yl = list(s), [bool(v) for v in y]
        sl[0] = None
        yl[1] = None
        t = pa.table({"s": pa.array(sl, pa.float64()),
                      "y": pa.array(yl, pa.bool_())})
        ths = [25.0, 50.0, 75.0]
        out = classification_report(
            rd.from_arrow(t).repartition(6), "s", "y", ths).to_pandas()
        ref = duckdb.sql("""
WITH d AS (SELECT s, CASE WHEN y THEN 1 ELSE 0 END AS yy FROM t
           WHERE s IS NOT NULL AND y IS NOT NULL),
t2(threshold) AS (VALUES (25.0),(50.0),(75.0)),
c AS (SELECT threshold,
 CAST(SUM(CASE WHEN s >= threshold AND yy=1 THEN 1 ELSE 0 END) AS BIGINT) tp,
 CAST(SUM(CASE WHEN s >= threshold AND yy=0 THEN 1 ELSE 0 END) AS BIGINT) fp,
 CAST(SUM(CASE WHEN s < threshold AND yy=1 THEN 1 ELSE 0 END) AS BIGINT) fn,
 CAST(SUM(CASE WHEN s < threshold AND yy=0 THEN 1 ELSE 0 END) AS BIGINT) tn
 FROM d CROSS JOIN t2 GROUP BY threshold)
SELECT CAST(threshold AS DOUBLE) AS threshold, tp, fp, fn, tn,
 CASE WHEN tp+fp>0 THEN CAST(tp AS DOUBLE)/CAST(tp+fp AS DOUBLE) END AS precision,
 CASE WHEN tp+fn>0 THEN CAST(tp AS DOUBLE)/CAST(tp+fn AS DOUBLE) END AS recall,
 CASE WHEN 2*tp+fp+fn>0 THEN CAST(2*tp AS DOUBLE)/CAST(2*tp+fp+fn AS DOUBLE) END AS f1
FROM c ORDER BY threshold""").df()
        import pandas as pd
        pd.testing.assert_frame_equal(
            out.sort_values("threshold").reset_index(drop=True),
            ref.reset_index(drop=True), check_exact=True)

    def test_degenerate(self):
        import pytest

        from vector_ray.ml.metrics import classification_report

        t = pa.table({"s": pa.array([1.0, 2.0]),
                      "y": pa.array([True, True])})
        out = classification_report(rd.from_arrow(t), "s", "y",
                                    [5.0]).to_pandas()
        assert out["tp"][0] == 0 and out["fn"][0] == 2
        assert out["precision"][0] is None or np.isnan(out["precision"][0])
        with pytest.raises(ValueError, match="thresholds required"):
            classification_report(rd.from_arrow(t), "s", "y", [])


class TestKsTest:
    def test_exact_vs_numpy(self):
        from vector_ray.ml.metrics import ks_test

        rng = np.random.default_rng(14)
        a = rng.normal(0, 1, 3000)
        b = rng.normal(0.3, 1.2, 2000)
        a[::9] = np.round(a[::9], 1)
        b[::9] = np.round(b[::9], 1)
        al = list(a)
        al[3] = None
        ta = pa.table({"v": pa.array(al, pa.float64())})
        tb = pa.table({"v": pa.array(b, pa.float64())})
        out = ks_test(rd.from_arrow(ta).repartition(7),
                      rd.from_arrow(tb).repartition(5), "v").to_pandas()
        av = np.sort(np.array([x for x in al if x is not None]))
        bv = np.sort(b)
        allv = np.unique(np.concatenate([av, bv]))
        fa = np.searchsorted(av, allv, side="right") / len(av)
        fb = np.searchsorted(bv, allv, side="right") / len(bv)
        want = float(np.abs(fa - fb).max())
        assert abs(out["ks"][0] - want) < 1e-15
        assert out["n_a"][0] == len(av) and out["n_b"][0] == len(bv)

    def test_identical_and_empty(self):
        from vector_ray.ml.metrics import ks_test

        t = pa.table({"v": pa.array([1.0, 2.0, 3.0] * 10)})
        out = ks_test(rd.from_arrow(t), rd.from_arrow(t), "v")
        assert out["ks"][0].as_py() == 0.0
        empty = pa.table({"v": pa.array([], pa.float64())})
        out2 = ks_test(rd.from_arrow(t), rd.from_arrow(empty), "v")
        assert out2["ks"][0].as_py() is None
        assert out2["n_b"][0].as_py() == 0


class TestChi2Drift:
    def test_matches_formula(self):
        from collections import Counter

        from vector_ray.ml.metrics import chi2_drift

        rng = np.random.default_rng(2)
        cats = ["a", "b", "c", "d"]
        a = [cats[i] for i in rng.integers(0, 4, 2000)]
        b = [cats[i] for i in rng.integers(0, 4, 1500)]
        a[0] = None
        ta = pa.table({"c": pa.array(a, pa.string())})
        tb = pa.table({"c": pa.array(b, pa.string())})
        out = chi2_drift(rd.from_arrow(ta).repartition(5),
                         rd.from_arrow(tb).repartition(3),
                         "c").to_pandas()
        ca, cb = Counter(x for x in a if x), Counter(b)
        order = sorted(set(ca) | set(cb))
        av = np.array([ca.get(c, 0) for c in order], np.int64)
        bv = np.array([cb.get(c, 0) for c in order], np.int64)
        n_a, n_b = int(av.sum()), int(bv.sum())
        n = float(n_a + n_b)
        tot = (av + bv).astype(np.float64)
        ea, eb = tot * float(n_a) / n, tot * float(n_b) / n
        da, db = av - ea, bv - eb
        want = float(np.sum(da * da / ea) + np.sum(db * db / eb))
        assert out["chi2"][0] == want
        assert out["dof"][0] == 3
        assert out["n_a"][0] == n_a and out["n_b"][0] == n_b

    def test_degenerate(self):
        from vector_ray.ml.metrics import chi2_drift

        one = pa.table({"c": pa.array(["x"] * 5)})
        out = chi2_drift(rd.from_arrow(one), rd.from_arrow(one), "c")
        assert out["chi2"][0].as_py() is None  # < 2 categories
        empty = pa.table({"c": pa.array([], pa.string())})
        out2 = chi2_drift(rd.from_arrow(one), rd.from_arrow(empty), "c")
        assert out2["chi2"][0].as_py() is None


class TestPsiDrift:
    def test_matches_formula_and_eps_floor(self):
        from collections import Counter

        from vector_ray.ml.metrics import psi_drift

        rng = np.random.default_rng(7)
        cats = ["a", "b", "c"]
        a = [cats[i] for i in rng.integers(0, 3, 1000)]
        b = [cats[i] for i in rng.integers(0, 2, 800)]  # 'c' absent → eps
        ta = pa.table({"c": pa.array(a)})
        tb = pa.table({"c": pa.array(b)})
        out = psi_drift(rd.from_arrow(ta).repartition(4),
                        rd.from_arrow(tb).repartition(3),
                        "c").to_pandas()
        ca, cb = Counter(a), Counter(b)
        order = sorted(set(ca) | set(cb))
        av = np.array([ca.get(c, 0) for c in order], np.int64)
        bv = np.array([cb.get(c, 0) for c in order], np.int64)
        pa_p = np.maximum(av / float(av.sum()), 1e-4)
        pb_p = np.maximum(bv / float(bv.sum()), 1e-4)
        want = float(np.sum((pa_p - pb_p) * np.log(pa_p / pb_p)))
        assert out["psi"][0] == want
        assert out["psi"][0] > 0.25  # a whole missing category = shifted

    def test_identical_is_zero(self):
        from vector_ray.ml.metrics import psi_drift

        t = pa.table({"c": pa.array(["x", "y"] * 50)})
        out = psi_drift(rd.from_arrow(t), rd.from_arrow(t), "c")
        assert out["psi"][0].as_py() == 0.0
