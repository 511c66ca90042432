"""Lake maintenance: targeted deletes and small-file compaction.

``delete_by_keys`` is the right-to-erasure / retention-purge path: at
100 TB you cannot rewrite the lake to drop a handful of keys. The
stats manifest (state/datastats.py) narrows the rewrite set to files
whose [min, max] range on the key column can contain a requested key;
only those files are rewritten (read → anti-filter → atomic replace),
each as an independent task over a broadcast key set — the rest of
the lake is untouched. Without a manifest every file is a candidate
(correct, just not pruned).

``compact_files`` is the post-ingest janitor: streaming writers leave
many small files; reads then pay per-file open/footer costs. Files
smaller than the threshold are grouped per DIRECTORY (hive partition
boundaries are never crossed) into target-size batches and each batch
is rewritten as one file — a map-only pass over file groups, no
shuffle, atomic per group (write new, then unlink olds).

Both refresh the stats manifest if one exists (footer-only rescan).

No reference counterpart (storage maintenance — SURVEY §2 "beyond the
reference" family; pairs with zorder_write/stats_index/seen_index).
"""

from __future__ import annotations

import os
import uuid
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _manifest_exists(root: str) -> bool:
    return os.path.exists(os.path.join(root, "_stats", "manifest.parquet"))


def _refresh_manifest(root: str) -> None:
    if _manifest_exists(root):
        from vector_ray.state.datastats import stats_index_build

        stats_index_build(root)
    _refresh_blooms(root)


def _refresh_blooms(root: str) -> None:
    """Rebuild every bloom-<col> sidecar present (full pass — a delete
    can only REMOVE keys, so stale blooms stay correct for pruning;
    rebuilding just restores tightness)."""
    import glob as _g

    from vector_ray.state.datastats import bloom_index_build

    for side in _g.glob(os.path.join(root, "_stats", "bloom-*.parquet")):
        col = os.path.basename(side)[len("bloom-"):-len(".parquet")]
        try:
            bloom_index_build(root, col)
        except ValueError:
            os.unlink(side)  # lake emptied


def _candidate_files(root: str, key_col: str, keys) -> list:
    """Files that could contain any of ``keys``: intersect min/max
    manifest pruning (clustered lakes) with the per-file Bloom sidecar
    when one exists for this column (unsorted lakes); with neither,
    every file is a candidate."""
    from vector_ray.state.datastats import (_list_parquet_files,
                                            bloom_prune_paths, prune_paths)

    cand = set(_list_parquet_files(root))
    if _manifest_exists(root):
        byrange: set = set()
        # per-key refinement for sparse key sets; one hull pass otherwise
        if len(keys) <= 64:
            for k in keys:
                kept, _ = prune_paths(root, key_col, k, k)
                byrange.update(kept)
        else:
            kept, _ = prune_paths(root, key_col, min(keys), max(keys))
            byrange.update(kept)
        cand &= byrange
    if os.path.exists(os.path.join(root, "_stats", f"bloom-{key_col}.parquet")):
        kept, _ = bloom_prune_paths(root, key_col, keys)
        cand &= set(kept)
    return sorted(cand)


def _hive_partition_dirs(root: str, key_col: str) -> list:
    """Directories named ``<key_col>=<value>`` anywhere under root —
    non-empty iff the lake is hive-partitioned ON key_col (the column
    then lives in dir names, not data pages)."""
    out = []
    prefix = f"{key_col}="
    for dirpath, dirnames, _files in os.walk(root):
        if os.sep + "_stats" in dirpath or dirpath.endswith("_stats"):
            continue
        for d in dirnames:
            if d.startswith(prefix):
                out.append(os.path.join(dirpath, d))
    return sorted(out)


def delete_by_keys(root: str, key_col: str, keys: Sequence, *,
                   refresh_stats: bool = True) -> dict:
    """Remove every row whose ``key_col`` value is in ``keys`` from the
    parquet lake at ``root``, rewriting ONLY candidate files. Returns
    {"files_scanned": n, "files_rewritten": n, "rows_deleted": n}.

    Distribution: candidate paths fan out as a Ray Data map over file
    names; the key set ships once to the object store (``ray.put``)
    and each task reads it zero-copy. A rewrite is atomic
    (tmp + os.replace); a file left with zero rows is unlinked.
    Runs ``_recover_compactions`` first so a crashed compaction's
    duplicate-row window is repaired before the scan."""
    import ray
    import ray.data as rd

    import shutil

    _recover_compactions(root)

    keys = sorted(set(keys))
    if not keys:
        return {"files_scanned": 0, "files_rewritten": 0, "rows_deleted": 0}
    part_dirs = _hive_partition_dirs(root, key_col)
    if part_dirs:
        # the key IS the hive partition: erase whole directories, no
        # data page ever read (the column isn't even in the files)
        want = {str(k) for k in keys}
        removed = rows = 0
        for d in part_dirs:
            val = os.path.basename(d).split("=", 1)[1]
            if val in want:
                import pyarrow.parquet as pq

                for f in os.listdir(d):
                    if f.endswith(".parquet"):
                        rows += pq.read_metadata(os.path.join(d, f)).num_rows
                shutil.rmtree(d)
                removed += 1
        if removed and refresh_stats:
            _refresh_manifest(root)
        return {"files_scanned": 0, "files_rewritten": 0,
                "partitions_removed": removed, "rows_deleted": int(rows)}
    cand = _candidate_files(root, key_col, keys)
    if not cand:
        return {"files_scanned": 0, "files_rewritten": 0, "rows_deleted": 0}
    key_arr = pa.array(keys)
    keys_ref = ray.put(key_arr)

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        kset = ray.get(keys_ref)
        out_path, out_rewritten, out_deleted = [], [], []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path)
            hit = pc.is_in(t[key_col], value_set=kset)
            n_hit = int(pc.sum(pc.cast(hit, pa.int64())).as_py() or 0)
            out_path.append(path)
            out_deleted.append(n_hit)
            if n_hit == 0:
                out_rewritten.append(False)
                continue
            kept = t.filter(pc.invert(pc.fill_null(hit, False)))
            if kept.num_rows == 0:
                os.unlink(path)
            else:
                tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
                pq.write_table(kept, tmp)
                os.replace(tmp, path)
            out_rewritten.append(True)
        return pa.table({
            "path": pa.array(out_path, pa.string()),
            "rewritten": pa.array(out_rewritten, pa.bool_()),
            "rows_deleted": pa.array(out_deleted, pa.int64()),
        })

    res = rd.from_items([{"path": p} for p in cand]).map_batches(
        rewrite, batch_format="pyarrow").take_all()
    rewritten = sum(1 for r in res if r["rewritten"])
    deleted = sum(r["rows_deleted"] for r in res)
    if rewritten and refresh_stats:
        _refresh_manifest(root)
    return {"files_scanned": len(cand), "files_rewritten": rewritten,
            "rows_deleted": int(deleted)}


def _recover_compactions(root: str) -> int:
    """Finish (or roll back) compaction groups interrupted mid-swap.
    For each committed ``_compact-<id>.json``: if the compacted output
    is visible, the group crashed between swap and unlink — remove any
    surviving source files (the duplicate-row window) and the
    manifest; if the output never became visible, the sources are
    intact — discard the orphan tmp and the manifest. Returns the
    number of manifests resolved."""
    import json as _json

    fixed = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not (f.startswith("_compact-") and f.endswith(".json")):
                continue
            man = os.path.join(dirpath, f)
            try:
                with open(man) as fh:
                    rec = _json.load(fh)
            except (OSError, ValueError):
                os.unlink(man)
                continue
            out = os.path.join(dirpath, rec["output"])
            if os.path.exists(out):
                for s in rec["sources"]:
                    sp = os.path.join(dirpath, s)
                    if os.path.exists(sp):
                        os.unlink(sp)
            elif os.path.exists(out + ".tmp"):
                os.unlink(out + ".tmp")
            os.unlink(man)
            fixed += 1
    return fixed


def compact_files(root: str, *, target_bytes: int = 128 << 20,
                  small_bytes: Optional[int] = None,
                  refresh_stats: bool = True) -> dict:
    """Merge small parquet files per directory into ~``target_bytes``
    outputs. ``small_bytes`` (default target/2) decides which files
    are compaction candidates; larger files are left alone. Hive
    partition directories are never mixed. Returns
    {"groups": n, "files_removed": n, "files_written": n}.

    Crash-safe: each group commits an underscore-prefixed manifest
    (``_compact-<id>.json`` — invisible to every reader, which skips
    underscore files) listing its source files BEFORE the compacted
    file becomes visible; sources are unlinked after, manifest last.
    A crash anywhere leaves either (a) manifest + no visible output →
    sources intact, tmp discarded, or (b) manifest + output + some
    sources → duplicates that the NEXT compact/maintenance pass
    repairs by finishing the unlinks. ``_recover_compactions`` runs at
    the top of every call."""
    import ray.data as rd

    _recover_compactions(root)
    small = small_bytes if small_bytes is not None else target_bytes // 2
    groups = []
    for dirpath, _dirs, files in os.walk(root):
        if os.sep + "_stats" in dirpath or dirpath.endswith("_stats"):
            continue
        cand = sorted(
            (os.path.join(dirpath, f), os.path.getsize(os.path.join(dirpath, f)))
            for f in files if f.endswith(".parquet") and not f.startswith("_"))
        cand = [(p, s) for p, s in cand if s < small]
        if len(cand) < 2:
            continue
        cur, cur_sz = [], 0
        for p, s in cand:
            cur.append(p)
            cur_sz += s
            if cur_sz >= target_bytes:
                groups.append(cur)
                cur, cur_sz = [], 0
        if len(cur) >= 2:
            groups.append(cur)

    if not groups:
        return {"groups": 0, "files_removed": 0, "files_written": 0}

    def merge(batch: pa.Table) -> pa.Table:
        import json as _json

        import pyarrow.parquet as pq

        done = []
        for blob in batch["paths"].to_pylist():
            paths = _json.loads(blob)
            t = pa.concat_tables([pq.read_table(p) for p in paths],
                                 promote_options="default")
            gid = uuid.uuid4().hex[:12]
            dirpath = os.path.dirname(paths[0])
            out = os.path.join(dirpath, f"compacted-{gid}.parquet")
            tmp = out + ".tmp"
            pq.write_table(t, tmp)
            # commit point: manifest names the sources this output
            # replaces — recovery finishes the unlinks if we die below
            man = os.path.join(dirpath, f"_compact-{gid}.json")
            man_tmp = man + ".tmp"
            with open(man_tmp, "w") as fh:
                _json.dump({"output": os.path.basename(out),
                            "sources": [os.path.basename(p) for p in paths]},
                           fh)
            os.replace(man_tmp, man)
            os.replace(tmp, out)
            for p in paths:
                os.unlink(p)
            os.unlink(man)
            done.append(len(paths))
        return pa.table({"removed": pa.array(done, pa.int64())})

    # each task receives ONLY its own group's paths (items payload) —
    # a closure capture would ship the whole group list to every task
    import json as _json

    res = rd.from_items(
        [{"paths": _json.dumps(g)} for g in groups]).map_batches(
        merge, batch_format="pyarrow").take_all()
    removed = sum(r["removed"] for r in res)
    if refresh_stats:
        _refresh_manifest(root)
    return {"groups": len(groups), "files_removed": int(removed),
            "files_written": len(groups)}
