"""Sinks — batch rebuilds of src/sinks/*.

File-family sinks (file, aws_s3, …) → partitioned ``write_parquet`` /
``write_json`` / ``write_csv``; the templated sink path
(src/sinks/file/mod.rs:35-44 `Template` paths like
``/out/{{ source }}/%Y-%m-%d``) maps to Hive partitioning on a derived
column (``partition_cols``). console → ``show``; blackhole → ``count``
(src/sinks/blackhole).

Outputs are laid out one directory per partition value so reruns can
skip finished partitions (see vector_ray.state.manifest).
"""

from __future__ import annotations

from typing import Optional, Sequence


def write_parquet(ds, path: str, *, partition_cols: Optional[Sequence[str]] = None, **kw):
    """Partitioned parquet sink. `partition_cols` is the rebuild of
    Vector's templated sink paths: one Hive directory per value."""
    if partition_cols:
        ds.write_parquet(path, partition_cols=list(partition_cols), **kw)
    else:
        ds.write_parquet(path, **kw)
    return path


def write_json(ds, path: str, **kw):
    ds.write_json(path, **kw)
    return path


def write_csv(ds, path: str, **kw):
    ds.write_csv(path, **kw)
    return path


def console(ds, limit: int = 20):
    """console sink (truncated)."""
    for row in ds.take(limit):
        print(row)


def blackhole(ds) -> int:
    """blackhole sink: consume the stream, report row count."""
    return ds.count()


# ---------------------------------------------------------------------------
# file sink — src/sinks/file/mod.rs: field-templated paths
# ("/out/{{ source }}/app.log"), encoding codecs (text / ndjson /
# logfmt / csv, src/sinks/util/encoding + lib/codecs), optional gzip
# (file/mod.rs Compression). Each rendered template value becomes a
# directory; every writer task appends its own uniquely-named part
# file, so parallel writers never contend and reruns are additive.


def _encode_lines(tbl, codec: str, text_field: str) -> bytes:
    import io
    import json as _json

    if codec == "text":
        col = tbl[text_field]
        vals = col.to_pylist()
        return ("\n".join("" if v is None else str(v) for v in vals) + "\n").encode()
    if codec == "ndjson":
        buf = io.StringIO()
        for row in tbl.to_pylist():
            buf.write(_json.dumps(row, sort_keys=True, default=str))
            buf.write("\n")
        return buf.getvalue().encode()
    if codec == "logfmt":
        from vector_ray.expr import F

        lines = F.encode_logfmt(tbl)
        return ("\n".join(v or "" for v in lines.to_pylist()) + "\n").encode()
    if codec == "csv":
        import csv as _csv

        buf = io.StringIO()
        w = _csv.writer(buf, lineterminator="\n")
        w.writerow(tbl.column_names)
        w.writerows(zip(*(tbl[c].to_pylist() for c in tbl.column_names)))
        return buf.getvalue().encode()
    raise ValueError(f"unknown file-sink codec {codec!r}")


class FileSink:
    """Templated file sink. ``path`` may contain ``{{ field }}``
    templates (one output directory per rendered value) and is treated
    as a directory; part files are ``part-<pid>-<seq>.<ext>``.

    >>> FileSink("/out/{{ source }}", codec="ndjson").write(ds)
    """

    def __init__(self, path: str, *, codec: str = "ndjson",
                 compression: str = "none", text_field: str = "message"):
        if compression not in ("none", "gzip"):
            raise ValueError("compression must be 'none' or 'gzip'")
        self.path = path
        self.codec = codec
        self.compression = compression
        self.text_field = text_field

    def _write_batch(self, tbl):
        import gzip
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_ray.expr import F

        if len(tbl) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        if "{{" in self.path:
            rendered = F.render(tbl, self.path)
        else:
            rendered = pa.array([self.path] * len(tbl))
        d = pc.dictionary_encode(
            rendered.combine_chunks() if isinstance(rendered, pa.ChunkedArray) else rendered
        )
        import numpy as np

        codes = np.asarray(d.indices)
        out_paths, out_rows = [], []
        ext = {"text": "log", "ndjson": "ndjson", "logfmt": "log",
               "csv": "csv"}[self.codec]
        if self.compression == "gzip":
            ext += ".gz"
        for ci, dirpath in enumerate(d.dictionary.to_pylist()):
            sub = tbl.filter(pa.array(codes == ci))
            payload = _encode_lines(sub, self.codec, self.text_field)
            if self.compression == "gzip":
                payload = gzip.compress(payload)
            os.makedirs(dirpath, exist_ok=True)
            fname = f"part-{os.getpid()}-{uuid.uuid4().hex[:8]}.{ext}"
            fpath = os.path.join(dirpath, fname)
            with open(fpath, "wb") as fh:
                fh.write(payload)
            out_paths.append(fpath)
            out_rows.append(len(sub))
        return pa.table({"path": pa.array(out_paths, pa.string()),
                         "rows": pa.array(out_rows, pa.int64())})

    def write(self, ds) -> list:
        """Execute: returns the manifest [(path, rows), ...]."""
        out = ds.map_batches(self._write_batch, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
        return [(r["path"], r["rows"]) for r in out]
