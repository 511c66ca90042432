"""Lake maintenance (state/maintain.py): delete_by_keys rewrites only
manifest-candidate files and removes exactly the requested keys;
compact_files merges small files per directory without crossing hive
partitions and preserves every row."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.state.datastats import stats_index_build
from vector_ray.state.maintain import compact_files, delete_by_keys


def _lake(tmp_path, n_files=6, rows=200):
    """Files with disjoint sorted id ranges (manifest prunes hard)."""
    root = str(tmp_path / "lake")
    os.makedirs(root)
    for i in range(n_files):
        ids = np.arange(i * rows, (i + 1) * rows)
        t = pa.table({
            "id": pa.array(ids, pa.int64()),
            "v": pa.array(ids * 0.5, pa.float64()),
        })
        pq.write_table(t, os.path.join(root, f"f{i}.parquet"))
    return root


class TestDelete:
    def test_delete_rewrites_only_candidates(self, tmp_path):
        root = _lake(tmp_path)
        stats_index_build(root)
        # keys all inside file 2's range
        res = delete_by_keys(root, "id", [450, 455, 460])
        assert res["files_scanned"] == 1
        assert res["files_rewritten"] == 1
        assert res["rows_deleted"] == 3
        left = rd.read_parquet(root).take_all()
        ids = {r["id"] for r in left}
        assert not ids & {450, 455, 460}
        assert len(left) == 6 * 200 - 3

    def test_delete_without_manifest_scans_all(self, tmp_path):
        root = _lake(tmp_path, n_files=3)
        res = delete_by_keys(root, "id", [10])
        assert res["files_scanned"] == 3
        assert res["rows_deleted"] == 1

    def test_delete_whole_file_unlinks(self, tmp_path):
        root = _lake(tmp_path, n_files=3, rows=5)
        stats_index_build(root)
        res = delete_by_keys(root, "id", list(range(5, 10)))  # all of f1
        assert res["rows_deleted"] == 5
        files = [f for f in os.listdir(root) if f.endswith(".parquet")]
        assert len(files) == 2

    def test_delete_refreshes_manifest(self, tmp_path):
        from vector_ray.state.datastats import prune_paths

        root = _lake(tmp_path)
        stats_index_build(root)
        delete_by_keys(root, "id", [0])  # file 0's min was 0
        kept, _ = prune_paths(root, "id", 0, 0)
        assert kept == []  # fresh manifest knows id=0 is gone

    def test_string_keys(self, tmp_path):
        root = str(tmp_path / "slake")
        os.makedirs(root)
        t = pa.table({"k": pa.array(["a", "b", "c", "d"], pa.string()),
                      "v": pa.array([1, 2, 3, 4], pa.int64())})
        pq.write_table(t, os.path.join(root, "f.parquet"))
        res = delete_by_keys(root, "k", ["b", "d"])
        assert res["rows_deleted"] == 2
        left = pq.read_table(os.path.join(root, "f.parquet"))
        assert left["k"].to_pylist() == ["a", "c"]


class TestCompact:
    def test_compact_preserves_rows(self, tmp_path):
        root = _lake(tmp_path, n_files=8, rows=50)
        before = rd.read_parquet(root).take_all()
        res = compact_files(root, target_bytes=1 << 30)
        assert res["files_removed"] == 8 and res["files_written"] == 1
        after = rd.read_parquet(root).take_all()
        assert sorted(r["id"] for r in after) == sorted(r["id"] for r in before)

    def test_compact_respects_partition_dirs(self, tmp_path):
        root = str(tmp_path / "hive")
        for part in ("p=a", "p=b"):
            d = os.path.join(root, part)
            os.makedirs(d)
            for i in range(3):
                t = pa.table({"x": pa.array([i], pa.int64())})
                pq.write_table(t, os.path.join(d, f"f{i}.parquet"))
        res = compact_files(root, target_bytes=1 << 30)
        assert res["files_written"] == 2  # one per partition dir
        for part in ("p=a", "p=b"):
            files = os.listdir(os.path.join(root, part))
            assert len(files) == 1
            t = pq.read_table(os.path.join(root, part, files[0]))
            assert sorted(t["x"].to_pylist()) == [0, 1, 2]

    def test_large_files_left_alone(self, tmp_path):
        root = _lake(tmp_path, n_files=4, rows=50)
        sizes = {f: os.path.getsize(os.path.join(root, f))
                 for f in os.listdir(root)}
        small = min(sizes.values())
        res = compact_files(root, target_bytes=small * 4,
                            small_bytes=small - 1)
        assert res["groups"] == 0
        assert sorted(os.listdir(root)) == sorted(sizes)

    def test_recover_after_swap_removes_duplicate_sources(self, tmp_path):
        # crash window: compacted file visible, sources not yet
        # unlinked, manifest committed — next pass must drop sources
        import json

        from vector_ray.state.maintain import _recover_compactions

        root = _lake(tmp_path, n_files=3, rows=10)
        srcs = ["f0.parquet", "f1.parquet"]
        merged = pa.concat_tables(
            [pq.read_table(os.path.join(root, s)) for s in srcs])
        out = os.path.join(root, "compacted-deadbeef0001.parquet")
        pq.write_table(merged, out)
        with open(os.path.join(root, "_compact-deadbeef0001.json"), "w") as fh:
            json.dump({"output": os.path.basename(out), "sources": srcs}, fh)
        assert _recover_compactions(root) == 1
        files = sorted(f for f in os.listdir(root) if f.endswith(".parquet"))
        assert files == ["compacted-deadbeef0001.parquet", "f2.parquet"]
        rows = rd.read_parquet(root).take_all()
        assert sorted(r["id"] for r in rows) == list(range(30))

    def test_delete_repairs_crashed_compaction_first(self, tmp_path):
        # delete_by_keys must heal the duplicate-row window before it
        # scans, or the duplicates would survive the delete
        import json

        root = _lake(tmp_path, n_files=3, rows=10)
        srcs = ["f0.parquet", "f1.parquet"]
        merged = pa.concat_tables(
            [pq.read_table(os.path.join(root, s)) for s in srcs])
        out = os.path.join(root, "compacted-deadbeef0003.parquet")
        pq.write_table(merged, out)  # crash left sources AND output
        with open(os.path.join(root, "_compact-deadbeef0003.json"), "w") as fh:
            json.dump({"output": os.path.basename(out), "sources": srcs}, fh)
        res = delete_by_keys(root, "id", [5])
        assert res["rows_deleted"] == 1  # once, not twice
        rows = rd.read_parquet(root).take_all()
        assert sorted(r["id"] for r in rows) == [i for i in range(30) if i != 5]

    def test_recover_before_swap_keeps_sources(self, tmp_path):
        # crash window: manifest committed but output never swapped in
        # — sources intact, orphan tmp discarded, no data change
        import json

        from vector_ray.state.maintain import _recover_compactions

        root = _lake(tmp_path, n_files=3, rows=10)
        out = os.path.join(root, "compacted-deadbeef0002.parquet")
        with open(out + ".tmp", "w") as fh:
            fh.write("partial")
        with open(os.path.join(root, "_compact-deadbeef0002.json"), "w") as fh:
            json.dump({"output": os.path.basename(out),
                       "sources": ["f0.parquet", "f1.parquet"]}, fh)
        assert _recover_compactions(root) == 1
        files = sorted(os.listdir(root))
        assert files == ["f0.parquet", "f1.parquet", "f2.parquet"]
        rows = rd.read_parquet(root).take_all()
        assert sorted(r["id"] for r in rows) == list(range(30))

    def test_compact_groups_to_target(self, tmp_path):
        root = _lake(tmp_path, n_files=9, rows=50)
        one = os.path.getsize(os.path.join(root, "f0.parquet"))
        res = compact_files(root, target_bytes=one * 3)
        assert res["groups"] == 3
        files = [f for f in os.listdir(root) if f.endswith(".parquet")]
        assert len(files) == 3
        total = sum(pq.read_table(os.path.join(root, f)).num_rows
                    for f in files)
        assert total == 9 * 50


class TestPartitionDelete:
    def test_partition_column_delete_removes_dirs(self, tmp_path):
        root = str(tmp_path / "hive")
        for part, n in (("p=alpha", 3), ("p=beta", 2), ("p=gamma", 4)):
            d = os.path.join(root, part)
            os.makedirs(d)
            t = pa.table({"x": pa.array(range(n), pa.int64())})
            pq.write_table(t, os.path.join(d, "f.parquet"))
        res = delete_by_keys(root, "p", ["beta", "gamma"])
        assert res["partitions_removed"] == 2
        assert res["rows_deleted"] == 6
        assert sorted(os.listdir(root)) == ["p=alpha"]

    def test_partition_delete_int_values(self, tmp_path):
        root = str(tmp_path / "hive")
        for b in range(4):
            d = os.path.join(root, f"bucket={b}")
            os.makedirs(d)
            pq.write_table(pa.table({"x": pa.array([b], pa.int64())}),
                           os.path.join(d, "f.parquet"))
        res = delete_by_keys(root, "bucket", [1, 3])
        assert res["partitions_removed"] == 2
        assert sorted(os.listdir(root)) == ["bucket=0", "bucket=2"]
