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
