"""vector_ray — a Ray-Data-native rebuild of Vector's (tupleapp/vector
v0.18.0) query/data-processing capabilities as a batch engine.

Reference semantics: /root/reference (read-only). This is NOT a port —
each Vector transform is re-expressed as an idiomatic Ray Data stage:

- Function transforms (remap, filter, parsers, field ops, sample,
  log_to_metric, route masks)  → stateless ``map_batches`` over
  zero-copy Arrow batches (``vector_ray.stages``).
- Stateful lookups (enrichment tables, geoip-like)  → actor-pool
  ``map_batches`` stages (``vector_ray.stages.enrich``).
- Task transforms (dedupe, reduce, aggregate, merge)  → groupby /
  shuffle stages with partial pre-aggregation and salted keys for skew
  (``vector_ray.stages.{dedupe,reduce,aggregate}``).
- Sources/sinks → ``ray.data.read_*`` / partitioned ``write_parquet``
  with a per-partition lineage manifest (``vector_ray.sinks``,
  ``vector_ray.state``).

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — the
driver, bench.py, and the pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"
