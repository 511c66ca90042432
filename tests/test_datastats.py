"""stats_index_build / prune_paths / pruned_read (state/datastats.py):
footer-stats manifest correctness, actual file pruning on a clustered
layout, conservative keep without stats, residual exactness, and the
zorder_write composition (pruning works on BOTH keyed columns)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.state.datastats import (
    prune_paths,
    pruned_read,
    stats_index_build,
)


def _write_sorted_files(tmp_path, n_files=8, rows_per=500):
    """Files covering disjoint value ranges — the ideal pruning case."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    rng = np.random.default_rng(7)
    for i in range(n_files):
        lo = i * 100
        vals = rng.uniform(lo, lo + 100, rows_per)
        t = pa.table({
            "id": pa.array(np.arange(rows_per) + i * rows_per, pa.int64()),
            "v": pa.array(vals, pa.float64()),
            "tag": pa.array([f"t{i:02d}"] * rows_per, pa.string()),
        })
        pq.write_table(t, os.path.join(root, f"part-{i:02d}.parquet"))
    return root


class TestManifest:
    def test_build_and_prune_numeric(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        mpath = stats_index_build(root)
        assert os.path.exists(mpath)
        m = pq.read_table(mpath)
        # 8 files x 3 columns
        assert m.num_rows == 24
        kept, total = prune_paths(root, "v", 250.0, 349.0)
        assert len(total) == 8
        # ranges [200,300) and [300,400) overlap [250,349]
        assert len(kept) == 2
        assert all("part-02" in p or "part-03" in p for p in kept)

    def test_one_sided_bounds(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        stats_index_build(root)
        kept_lo, _ = prune_paths(root, "v", lo=650.0)
        assert len(kept_lo) == 2  # [600,700) and [700,800)
        kept_hi, _ = prune_paths(root, "v", hi=150.0)
        assert len(kept_hi) == 2  # [0,100) and [100,200)

    def test_string_channel(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        stats_index_build(root)
        kept, total = prune_paths(root, "tag", "t03", "t05")
        assert len(kept) == 3 and len(total) == 8

    def test_pruned_read_matches_full_filter(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        stats_index_build(root)
        lo, hi = 123.0, 456.0
        got = pruned_read(root, "v", lo, hi).take_all()
        full = rd.read_parquet(root, columns=["id", "v", "tag"]).take_all()
        want = sorted(r["id"] for r in full if lo <= r["v"] <= hi)
        assert sorted(r["id"] for r in got) == want
        # the read really opened fewer files
        kept, total = prune_paths(root, "v", lo, hi)
        assert len(kept) < len(total)

    def test_column_projection_keeps_filter_col_internal(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        stats_index_build(root)
        out = pruned_read(root, "v", 250.0, 349.0, columns=["id", "tag"])
        t = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                              batch_size=None))
        assert t.schema.names == ["id", "tag"]
        assert t.num_rows > 0

    def test_empty_prune_returns_empty_with_schema(self, tmp_path):
        root = _write_sorted_files(tmp_path)
        stats_index_build(root)
        out = pruned_read(root, "v", 10_000.0, 20_000.0)
        assert out.count() == 0

    def test_timestamp_column(self, tmp_path):
        import datetime as dt

        root = str(tmp_path / "ts_lake")
        os.makedirs(root)
        base = dt.datetime(2024, 1, 1)
        for i in range(4):
            ts = [base + dt.timedelta(hours=i * 10 + j) for j in range(10)]
            t = pa.table({
                "ts": pa.array(ts, pa.timestamp("us")),
                "x": pa.array(range(10), pa.int64()),
            })
            pq.write_table(t, os.path.join(root, f"f{i}.parquet"))
        stats_index_build(root)
        kept, total = prune_paths(
            root, "ts", base + dt.timedelta(hours=12),
            base + dt.timedelta(hours=18))
        assert len(total) == 4 and len(kept) == 1

    def test_zorder_write_prunes_both_columns(self, tmp_path):
        from vector_ray.stages.zorder import zorder_write

        rng = np.random.default_rng(3)
        n = 6000
        t = pa.table({
            "a": pa.array(rng.uniform(0, 1000, n), pa.float64()),
            "b": pa.array(rng.uniform(0, 1000, n), pa.float64()),
            "id": pa.array(np.arange(n), pa.int64()),
        })
        root = str(tmp_path / "zlake")
        ds = rd.from_arrow(t).repartition(12)
        zorder_write(ds, root, ["a", "b"], bits=16)
        stats_index_build(root)
        for col in ("a", "b"):
            kept, total = prune_paths(root, col, 100.0, 180.0)
            assert len(total) >= 4
            assert len(kept) < len(total), (
                f"no pruning on {col}: {len(kept)}/{len(total)}")


class TestBloomSidecar:
    def _unsorted_lake(self, tmp_path, n_files=6, rows=400):
        """Every file spans the FULL key domain — min/max pruning is
        useless here; only the bloom can prune point lookups."""
        import numpy as np
        root = str(tmp_path / "ulake")
        os.makedirs(root)
        rng = np.random.default_rng(13)
        for i in range(n_files):
            ids = rng.choice(100_000, rows, replace=False) * 10 + i
            t = pa.table({"id": pa.array(ids, pa.int64()),
                          "v": pa.array(ids * 0.5, pa.float64())})
            pq.write_table(t, os.path.join(root, f"f{i}.parquet"))
        return root

    def test_no_false_negatives(self, tmp_path):
        from vector_ray.state.datastats import bloom_index_build, bloom_prune_paths
        root = self._unsorted_lake(tmp_path)
        bloom_index_build(root, "id")
        # every real key's file must be kept
        t0 = pq.read_table(os.path.join(root, "f3.parquet"))
        some = t0["id"].to_pylist()[:20]
        kept, total = bloom_prune_paths(root, "id", some)
        assert os.path.join(root, "f3.parquet") in kept

    def test_point_lookup_prunes(self, tmp_path):
        from vector_ray.state.datastats import bloom_index_build, bloom_prune_paths
        root = self._unsorted_lake(tmp_path)
        bloom_index_build(root, "id")
        # a key ending in digit 2: only file 2 can contain it
        t2 = pq.read_table(os.path.join(root, "f2.parquet"))
        key = t2["id"].to_pylist()[0]
        kept, total = bloom_prune_paths(root, "id", [key])
        assert os.path.join(root, "f2.parquet") in kept
        assert len(kept) < len(total)

    def test_minmax_useless_bloom_prunes_delete(self, tmp_path):
        from vector_ray.state.datastats import bloom_index_build
        from vector_ray.state.maintain import delete_by_keys
        root = self._unsorted_lake(tmp_path)
        bloom_index_build(root, "id")
        t1 = pq.read_table(os.path.join(root, "f1.parquet"))
        key = t1["id"].to_pylist()[5]
        res = delete_by_keys(root, "id", [key])
        assert res["rows_deleted"] == 1
        assert res["files_scanned"] < 6  # bloom narrowed the rewrite set
        left = rd.read_parquet(root).take_all()
        assert key not in {r["id"] for r in left}

    def test_string_keys_bloom(self, tmp_path):
        from vector_ray.state.datastats import bloom_index_build, bloom_prune_paths
        root = str(tmp_path / "slake")
        os.makedirs(root)
        for i in range(3):
            t = pa.table({"k": pa.array([f"key-{i}-{j}" for j in range(50)],
                                        pa.string())})
            pq.write_table(t, os.path.join(root, f"f{i}.parquet"))
        bloom_index_build(root, "k")
        kept, total = bloom_prune_paths(root, "k", ["key-1-7"])
        assert os.path.join(root, "f1.parquet") in kept
        assert len(kept) < 3

    def test_distributed_probe_matches_driver_loop(self, tmp_path):
        from vector_ray.state.datastats import bloom_index_build, bloom_prune_paths
        root = self._unsorted_lake(tmp_path)
        bloom_index_build(root, "id")
        t2 = pq.read_table(os.path.join(root, "f2.parquet"))
        probe = t2["id"].to_pylist()[:3] + [99999999]
        a = bloom_prune_paths(root, "id", probe)
        b = bloom_prune_paths(root, "id", probe, distribute_over=0)
        assert a == b


class TestLargeIntExactness:
    def test_int64_beyond_float53_not_wrongly_pruned(self, tmp_path):
        """Bounds above 2^53 must compare exactly: a float64 manifest
        channel would round the file max down and wrongly prune the
        file that holds the probe key."""
        from vector_ray.state.datastats import prune_paths, stats_index_build

        root = str(tmp_path / "big")
        os.makedirs(root)
        base = (1 << 53) + 0  # float64 integer-precision limit
        key = base + 1        # rounds to base in float64
        pq.write_table(pa.table({"id": pa.array([base - 10, key], pa.int64())}),
                       os.path.join(root, "a.parquet"))
        pq.write_table(pa.table({"id": pa.array([base - 100, base - 50],
                                                pa.int64())}),
                       os.path.join(root, "b.parquet"))
        stats_index_build(root)
        kept, total = prune_paths(root, "id", key, key)
        assert os.path.join(root, "a.parquet") in kept
        # and pruning still works on the disjoint file
        assert os.path.join(root, "b.parquet") not in kept
