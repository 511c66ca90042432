"""zorder_sort (stages/zorder.py): Morton-key correctness vs a
bit-by-bit mirror, layout invariance, null/constant-column handling,
and the actual clustering property — consecutive chunks of the sorted
stream have tight spans on EVERY keyed column."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.zorder import (
    _spread_bits,
    column_ranges,
    zorder_key,
    zorder_sort,
)


def _interleave2_ref(a, b):
    """Bit-by-bit reference: a in even lanes, b in odd lanes."""
    out = 0
    for bit in range(32):
        out |= ((a >> bit) & 1) << (2 * bit)
        out |= ((b >> bit) & 1) << (2 * bit + 1)
    return out


class TestMorton:
    def test_spread_bits_matches_reference(self):
        rng = np.random.default_rng(1)
        v = rng.integers(0, 1 << 32, size=200).astype(np.uint64)
        got = _spread_bits(v, 2)
        for x, g in zip(v.tolist(), got.tolist()):
            assert g == _interleave2_ref(x, 0)

    def test_zorder_key_two_cols(self):
        t = pa.table({
            "a": pa.array([0.0, 1.0, 2.0, 3.0], pa.float64()),
            "b": pa.array([0.0, 3.0, 1.0, 2.0], pa.float64()),
        })
        rngs = {"a": (0.0, 3.0), "b": (0.0, 3.0)}
        z = zorder_key(t, ["a", "b"], rngs, 2)
        qa = [0, 1, 2, 3]
        qb = [0, 3, 1, 2]
        want = [_interleave2_ref(x, y) for x, y in zip(qa, qb)]
        assert z.tolist() == want

    def test_nulls_and_constant_column(self):
        t = pa.table({
            "a": pa.array([None, 5.0, 9.0], pa.float64()),
            "c": pa.array([7, 7, 7], pa.int64()),
        })
        rngs = column_ranges(rd.from_arrow(t), ["a", "c"])
        assert rngs["a"] == (5.0, 9.0)
        z = zorder_key(t, ["a", "c"], rngs, 4)
        assert z[0] == 0          # null -> curve origin
        assert z[1] < z[2]        # constant col adds nothing


class TestZorderSort:
    def _data(self, n=8000, seed=9):
        rng = np.random.default_rng(seed)
        return pa.table({
            "id": pa.array(range(n), pa.int64()),
            "x": pa.array(rng.uniform(0, 1000, n), pa.float64()),
            "y": pa.array(rng.integers(0, 100000, n), pa.int64()),
        })

    def test_layout_invariant_keys(self):
        t = self._data(2000)
        mk = lambda parts: sorted(
            (r["id"], r["zkey"]) for r in zorder_sort(
                rd.from_arrow(t).repartition(parts), ["x", "y"],
                keep_key=True).take_all())
        assert mk(3) == mk(8)

    def test_clustering_tightens_both_columns(self):
        t = self._data()
        out = zorder_sort(rd.from_arrow(t).repartition(6), ["x", "y"])
        rows = out.take_all()
        xs = np.array([r["x"] for r in rows])
        ys = np.array([r["y"] for r in rows])
        chunk = 500
        spans_x, spans_y = [], []
        for lo in range(0, len(xs), chunk):
            spans_x.append(np.ptp(xs[lo:lo + chunk]))
            spans_y.append(np.ptp(ys[lo:lo + chunk]))
        # a 500-row chunk of 8000 zordered rows must span far less
        # than the full range on BOTH columns (pruning proxy); an
        # x-only sort would leave y spans at ~full range
        assert np.mean(spans_x) < 0.45 * np.ptp(xs)
        assert np.mean(spans_y) < 0.45 * np.ptp(ys)

    def test_zorder_write_prunes_both_columns(self, tmp_path):
        """The point of the layout: after zorder_write, a narrow
        filter on EITHER column intersects only a small fraction of
        row groups' [min, max] ranges; a plain unsorted write leaves
        nearly every row group un-prunable."""
        import pyarrow.dataset as pads

        from vector_ray.stages.zorder import zorder_write

        t = self._data(16000, seed=4)

        def frac_hit(root, col, lo, hi):
            frs = list(pads.dataset(str(root),
                                    format="parquet").get_fragments())
            tot = hit = 0
            for fr in frs:
                for rg in fr.row_groups:
                    st = rg.statistics[col]
                    tot += 1
                    if st["min"] <= hi and st["max"] >= lo:
                        hit += 1
            assert tot >= 8, f"need row groups to prune, got {tot}"
            return hit / tot

        zdir = tmp_path / "z"
        zorder_write(rd.from_arrow(t).repartition(8), str(zdir),
                     ["x", "y"], row_group_size=1000)
        udir = tmp_path / "u"
        rd.from_arrow(t).repartition(8).write_parquet(
            str(udir), row_group_size=1000)
        for col, lo, hi in (("x", 100.0, 150.0), ("y", 5000, 10000)):
            z = frac_hit(zdir, col, lo, hi)
            u = frac_hit(udir, col, lo, hi)
            assert z <= 0.5 and z < u, (col, z, u)

    def test_sorted_by_key_and_validation(self):
        t = self._data(1000)
        out = zorder_sort(rd.from_arrow(t), ["x"], keep_key=True,
                          bits=16).take_all()
        ks = [r["zkey"] for r in out]
        assert ks == sorted(ks)
        with pytest.raises(ValueError, match="1-4"):
            zorder_sort(rd.from_arrow(t), [])
        with pytest.raises(ValueError, match="64-bit"):
            zorder_sort(rd.from_arrow(t), ["x", "y"], bits=40)
