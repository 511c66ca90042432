"""File-level min/max statistics manifest + pruned reads.

The lakehouse data-skipping pattern (public: Delta/Iceberg manifest
stats, parquet footer statistics): after (or independently of) a
partitioned Parquet write, collect each FILE's per-column min/max and
row count from the parquet FOOTERS — no data pages are read — into a
small manifest table stored next to the data (``<root>/_stats/
manifest.parquet``). A later filtered read consults the manifest
first and opens only the files whose [min, max] range can contain
matching rows, then applies the exact residual filter to the rows it
did read.

Pairs with ``stages/zorder.zorder_write``: the Morton-clustered
layout gives every file a tight range on ALL keyed columns, so the
manifest prunes hard on any of them.

100-TB plan: footer scanning is a map-only pass over FILE PATHS
(``ray.data.from_items(paths)``) — each task reads a few KB of footer
per file, emits one row per (file, column). The manifest is one row
per file×column (a 10^6-file lake → a few-MB table), so driver-side
pruning reads a small parquet file, never the data. Files lacking
statistics (stats disabled, unsupported types) are kept
conservatively — pruning is an optimization, never a correctness
gate.

No reference counterpart (storage-layout optimizer — SURVEY §2
"beyond the reference" family, read-path side of zorder_write).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MANIFEST = "_stats/manifest.parquet"


def _list_parquet_files(root: str) -> list:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if os.sep + "_stats" in dirpath or dirpath.endswith("_stats"):
            continue
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith("_"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def _to_epoch(v):
    """datetime/date footer stats -> epoch MICROSECONDS (float), so
    timestamp columns share the numeric channel; everything else
    passes through. Predicates on timestamp columns use the same
    convention (pass a datetime, or epoch-us float)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.timestamp() * 1e6
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day,
                            tzinfo=_dt.timezone.utc).timestamp() * 1e6
    return v


def _footer_stats_batch(batch: pa.Table, cols: Optional[Sequence[str]]) -> pa.Table:
    """One manifest row per (file, column) from row-group footer
    statistics. Numeric (int/float/ts-as-int) ranges go to the
    ``vmin_num``/``vmax_num`` channels, strings to ``vmin_str``/
    ``vmax_str``; a file×column without usable stats emits
    ``has_stats=False`` (kept conservatively at prune time)."""
    import pyarrow.parquet as pq

    paths, col_names, has = [], [], []
    vmin_int, vmax_int = [], []
    vmin_num, vmax_num, vmin_str, vmax_str, rows = [], [], [], [], []
    for path in batch["path"].to_pylist():
        md = pq.ParquetFile(path).metadata
        schema = md.schema.to_arrow_schema()
        want = list(cols) if cols is not None else list(schema.names)
        nrows = md.num_rows
        for name in want:
            if name not in schema.names:
                continue
            idx = schema.names.index(name)
            lo = hi = None
            ok = md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            paths.append(path)
            col_names.append(name)
            rows.append(nrows)
            lo, hi = _to_epoch(lo), _to_epoch(hi)
            if ok and isinstance(lo, (bool, np.bool_)):
                ok = False  # bool stats: not worth a channel
            if ok and isinstance(lo, (int, np.integer)) \
                    and not isinstance(lo, (bool, np.bool_)):
                # exact int64 channel — float64 would lose precision
                # above 2^53 and a lossy bound can WRONGLY prune
                has.append(True)
                vmin_int.append(int(lo))
                vmax_int.append(int(hi))
                vmin_num.append(float(lo))
                vmax_num.append(float(hi))
                vmin_str.append(None)
                vmax_str.append(None)
            elif ok and isinstance(lo, (int, float, np.integer, np.floating)):
                has.append(True)
                vmin_int.append(None)
                vmax_int.append(None)
                vmin_num.append(float(lo))
                vmax_num.append(float(hi))
                vmin_str.append(None)
                vmax_str.append(None)
            elif ok and isinstance(lo, (str, bytes)):
                has.append(True)
                vmin_int.append(None)
                vmax_int.append(None)
                vmin_num.append(None)
                vmax_num.append(None)
                vmin_str.append(lo if isinstance(lo, str) else lo.decode("utf-8", "replace"))
                vmax_str.append(hi if isinstance(hi, str) else hi.decode("utf-8", "replace"))
            else:
                has.append(False)
                vmin_int.append(None)
                vmax_int.append(None)
                vmin_num.append(None)
                vmax_num.append(None)
                vmin_str.append(None)
                vmax_str.append(None)
    return pa.table({
        "path": pa.array(paths, pa.string()),
        "column": pa.array(col_names, pa.string()),
        "has_stats": pa.array(has, pa.bool_()),
        "vmin_int": pa.array(vmin_int, pa.int64()),
        "vmax_int": pa.array(vmax_int, pa.int64()),
        "vmin_num": pa.array(vmin_num, pa.float64()),
        "vmax_num": pa.array(vmax_num, pa.float64()),
        "vmin_str": pa.array(vmin_str, pa.string()),
        "vmax_str": pa.array(vmax_str, pa.string()),
        "rows": pa.array(rows, pa.int64()),
    })


def stats_index_build(root: str, cols: Optional[Sequence[str]] = None) -> str:
    """Scan every parquet file under ``root`` (footers only, map-only
    over paths) and write ``<root>/_stats/manifest.parquet``
    atomically (tmp + rename). Returns the manifest path. Re-running
    after appends refreshes the whole manifest (footer scans are ~KB
    per file)."""
    import ray.data as rd

    paths = _list_parquet_files(root)
    if not paths:
        raise ValueError(f"stats_index_build: no parquet files under {root!r}")
    src = rd.from_items([{"path": p} for p in paths])
    stats = src.map_batches(lambda t: _footer_stats_batch(t, cols),
                            batch_format="pyarrow")
    # manifest is one row per file x column — aggregate-sized; stream
    # the small batches to the driver and write one compact file
    manifest = pa.concat_tables(
        stats.iter_batches(batch_format="pyarrow", batch_size=None))
    out_dir = os.path.join(root, "_stats")
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, ".manifest.parquet.tmp")
    pq.write_table(manifest, tmp)
    final = os.path.join(root, _MANIFEST)
    os.replace(tmp, final)
    return final


def prune_paths(root: str, col: str, lo=None, hi=None) -> tuple:
    """(kept_paths, total_paths) for a [lo, hi] range predicate on
    ``col`` using the manifest. Either bound may be None (one-sided).
    Files without usable stats for ``col`` are always kept."""
    import pyarrow.parquet as pq

    manifest = pq.read_table(os.path.join(root, _MANIFEST))
    m = manifest.filter(pc.equal(manifest["column"], col))
    all_paths = m["path"].to_pylist()
    lo_m, hi_m = _to_epoch(lo), _to_epoch(hi)
    is_str = isinstance(lo_m, str) or isinstance(hi_m, str)
    is_int = (not is_str
              and all(isinstance(v, (int, np.integer)) and
                      not isinstance(v, bool)
                      for v in (lo_m, hi_m) if v is not None))
    if is_str:
        vmin, vmax = m["vmin_str"], m["vmax_str"]
    elif is_int and "vmin_int" in m.column_names:
        # exact int64 compare — the float channel rounds above 2^53
        vmin, vmax = m["vmin_int"], m["vmax_int"]
    else:
        vmin, vmax = m["vmin_num"], m["vmax_num"]
    keep = pc.invert(m["has_stats"])  # no stats -> keep
    overlap = pa.array([True] * len(m), pa.bool_())
    if lo_m is not None:
        overlap = pc.and_kleene(overlap, pc.greater_equal(vmax, lo_m))
    if hi_m is not None:
        overlap = pc.and_kleene(overlap, pc.less_equal(vmin, hi_m))
    keep = pc.or_kleene(keep, pc.fill_null(overlap, True))
    kept = m.filter(pc.fill_null(keep, True))["path"].to_pylist()
    return sorted(kept), sorted(set(all_paths))


def bloom_index_build(root: str, col: str, *, bits_per_key: int = 16,
                      k: int = 4) -> str:
    """Per-FILE Bloom sidecar for point-key pruning on UNSORTED lakes
    (min/max ranges are useless when every file spans the key domain).
    One task per file reads ONLY the key column, builds a Bloom sized
    to that file's row count (``bits_per_key`` bits/row, power-of-two,
    ≥ 1024), and emits (path, m_bits, k, bitmap). Written to
    ``<root>/_stats/bloom-<col>.parquet`` atomically. False negatives
    are impossible, so pruning never drops a live file."""
    import ray.data as rd

    paths = _list_parquet_files(root)
    if not paths:
        raise ValueError(f"bloom_index_build: no parquet files under {root!r}")

    def build(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from vector_ray.ml.bloom import Bloom, _key_hashes

        out_p, out_m, out_k, out_w, out_n = [], [], [], [], []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=[col])
            n = t.num_rows
            m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, n) * bits_per_key))))
            b = Bloom(m_bits, k)
            arr = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
            b.add_hashes(_key_hashes(arr.drop_null()))
            out_p.append(path)
            out_m.append(m_bits)
            out_k.append(k)
            out_w.append(b.words.tobytes())
            out_n.append(n)
        return pa.table({
            "path": pa.array(out_p, pa.string()),
            "m_bits": pa.array(out_m, pa.int64()),
            "k": pa.array(out_k, pa.int64()),
            "words": pa.array(out_w, pa.large_binary()),
            "rows": pa.array(out_n, pa.int64()),
        })

    sidecar = pa.concat_tables(
        rd.from_items([{"path": p} for p in paths])
        .map_batches(build, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    out_dir = os.path.join(root, "_stats")
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    final = os.path.join(out_dir, f"bloom-{col}.parquet")
    tmp = final + ".tmp"
    pq.write_table(sidecar, tmp)
    os.replace(tmp, final)
    return final


def _bloom_test_batch(side: pa.Table, h: np.ndarray) -> tuple:
    """(paths, hit?) for one sidecar batch — shared by the driver loop
    and the distributed path."""
    from vector_ray.ml.bloom import Bloom

    paths, hits = [], []
    for i in range(side.num_rows):
        paths.append(side["path"][i].as_py())
        b = Bloom(int(side["m_bits"][i].as_py()), int(side["k"][i].as_py()),
                  np.frombuffer(side["words"][i].as_py(), np.uint64).copy())
        hits.append(bool(b.contains_hashes(h).any()))
    return paths, hits


def bloom_prune_paths(root: str, col: str, keys, *,
                      distribute_over: int = 4096) -> tuple:
    """(kept_paths, total_paths): files whose Bloom says at least one
    of ``keys`` may be present. Files missing from the sidecar (added
    after the build) are kept conservatively. Sidecars larger than
    ``distribute_over`` rows probe as a Ray Data map over the sidecar
    parquet (the key hashes broadcast once) instead of a driver loop —
    a 10^6-file lake tests 10^6 Blooms in parallel tasks."""
    import pyarrow.parquet as pq

    from vector_ray.ml.bloom import _key_hashes

    side_path = os.path.join(root, "_stats", f"bloom-{col}.parquet")
    h = _key_hashes(pa.array(sorted(set(keys))))
    n_side = pq.read_metadata(side_path).num_rows
    kept = []
    indexed = set()
    if n_side > distribute_over:
        import ray
        import ray.data as rd

        href = ray.put(h)

        def probe(t: pa.Table) -> pa.Table:
            paths, hits = _bloom_test_batch(t, ray.get(href))
            return pa.table({"path": pa.array(paths, pa.string()),
                             "hit": pa.array(hits, pa.bool_())})

        for r in rd.read_parquet(side_path).map_batches(
                probe, batch_format="pyarrow").take_all():
            indexed.add(r["path"])
            if r["hit"]:
                kept.append(r["path"])
    else:
        side = pq.read_table(side_path)
        paths, hits = _bloom_test_batch(side, h)
        indexed.update(paths)
        kept = [p for p, hit in zip(paths, hits) if hit]
    total = _list_parquet_files(root)
    kept.extend(p for p in total if p not in indexed)
    return sorted(kept), sorted(total)


def pruned_read(root: str, col: str, lo=None, hi=None, *,
                columns: Optional[Sequence[str]] = None,
                residual: bool = True):
    """read_parquet only the files whose footer range overlaps
    [lo, hi] on ``col``, then apply the exact residual filter (row
    groups inside a kept file may still contain non-matching rows).
    Returns a Dataset; the pruned file count is available via
    ``prune_paths``."""
    import ray.data as rd

    kept, _total = prune_paths(root, col, lo, hi)
    if not kept:
        # empty result with the right schema: read one file's schema,
        # slice every batch to zero rows
        any_path = _list_parquet_files(root)[:1]
        ds = rd.read_parquet(any_path, columns=list(columns) if columns else None)
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow", zero_copy_batch=True)
    read_cols = list(columns) if columns is not None else None
    if read_cols is not None and residual and col not in read_cols:
        read_cols = read_cols + [col]
    ds = rd.read_parquet(kept, columns=read_cols)
    if not residual:
        return ds

    def _residual(t: pa.Table) -> pa.Table:
        mask = pa.array([True] * len(t), pa.bool_())
        if lo is not None:
            mask = pc.and_kleene(mask, pc.greater_equal(t[col], lo))
        if hi is not None:
            mask = pc.and_kleene(mask, pc.less_equal(t[col], hi))
        out = t.filter(pc.fill_null(mask, False))
        if columns is not None:
            out = out.select(list(columns))
        return out

    return ds.map_batches(_residual, batch_format="pyarrow",
                          zero_copy_batch=True)
