"""Persistent seen-key index — exact dedup ACROSS runs.

A daily-ingest pipeline must drop rows whose key was already emitted
by ANY previous run, not just this one. The reference's dedupe
transform holds its key cache in process memory
(`src/transforms/dedupe.rs:155-163` — an LRU of recent keys); this is
the durable, unbounded-history equivalent: distinct keys are stored
as plain parquet hive-partitioned by ``bucket = hash(key) %
num_buckets``, and each new batch anti-joins against the index before
its own keys are appended.

Exactness: the index stores the KEY VALUES (native columns), never
just hashes — a hash collision can't drop a live row. The bucket is
only a placement hint.

100-TB plan:
- build/append are MAP-ONLY (per-block local distinct, then a
  partitioned write) — no shuffle. Cross-block duplicate keys may be
  stored twice; an anti-join probe is idempotent in the right side,
  so results are unaffected. ``seen_index_compact`` rewrites each
  bucket to exact-distinct as a per-partition maintenance job (the
  bucket IS the shuffle partition, so compaction never moves data
  between buckets).
- filter is one bucketed anti-join (stages/join.bucketed_join): the
  only all-to-all, carrying key columns only. When the incoming batch
  is known to touch few buckets (e.g. key-range-local appends), pass
  ``buckets=[...]`` to read only those hive partitions of the index.
- the index grows with distinct-key count; buckets are independent
  directories, so it shards across nodes/storage trivially.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_DEFAULT_BUCKETS = 64


def _keys_dir(root: str) -> str:
    return os.path.join(root, "keys")


def _index_num_buckets(root: str) -> int:
    import json

    with open(os.path.join(root, "seen.json")) as fh:
        return int(json.load(fh)["num_buckets"])


def _local_distinct_keys(t: pa.Table, key_cols: Sequence[str],
                         num_buckets: int,
                         ts_col: Optional[str] = None) -> pa.Table:
    from vector_ray.stages.bucketed import add_bucket, keep_first_per_key

    key_cols = list(key_cols)
    if ts_col is not None:
        # keep the NEWEST sighting per key so TTL expiry is
        # last-seen-based (duplicate stored keys across appends are
        # still fine: the anti-join ignores them, expiry drops each
        # row independently and the newest row keeps the key alive)
        sub = t.select(key_cols + [ts_col])
        sub = keep_first_per_key(sub, key_cols,
                                 order_by=[(ts_col, "descending")])
        sub = add_bucket(sub, key_cols, num_buckets)
        return sub.rename_columns(key_cols + ["__seen_ts", "bucket"])
    t = keep_first_per_key(t.select(key_cols), key_cols)
    t = add_bucket(t, key_cols, num_buckets)
    return t.rename_columns(key_cols + ["bucket"])


def seen_index_build(ds, key_cols: Sequence[str], root: str, *,
                     num_buckets: int = _DEFAULT_BUCKETS,
                     ts_col: Optional[str] = None) -> dict:
    """Create the index at ``root`` from ``ds``'s keys (map-only:
    per-block distinct → hive-partitioned write). Overwrites any
    existing index at ``root``. With ``ts_col`` every stored key
    carries its newest sighting time, enabling
    ``seen_index_expire`` — the durable analogue of the reference
    dedupe cache's eviction."""
    import json
    import shutil

    key_cols = list(key_cols)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    keys = ds.map_batches(
        lambda t: _local_distinct_keys(t, key_cols, num_buckets, ts_col),
        batch_format="pyarrow", zero_copy_batch=True)
    keys.write_parquet(_keys_dir(root), partition_cols=["bucket"])
    meta = {"num_buckets": int(num_buckets), "key_cols": key_cols,
            "ts": ts_col is not None}
    with open(os.path.join(root, "seen.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _read_index(root: str, key_cols: Sequence[str],
                buckets: Optional[Sequence[int]] = None):
    import ray.data as rd

    kd = _keys_dir(root)
    if not os.path.isdir(kd):
        return None  # index created but never appended to
    if buckets is None:
        paths = [kd]
    else:
        # a list of paths must be FILES for read_parquet: expand each
        # hive partition dir
        dirs = [os.path.join(kd, f"bucket={int(b)}") for b in buckets]
        paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        if not paths:
            return None
    ds = rd.read_parquet(paths, columns=list(key_cols))
    return ds


def seen_index_filter(ds, key_cols: Sequence[str], root: str, *,
                      buckets: Optional[Sequence[int]] = None,
                      join_buckets: Optional[int] = None,
                      batch_bloom_bits: int = 0):
    """Rows of ``ds`` whose key is NOT in the index (bucketed
    anti-join; key columns only cross the exchange). ``buckets``
    restricts the index read to those hive partitions when the caller
    knows the batch's key locality.

    ``batch_bloom_bits`` > 0 enables the small-batch fast path: a
    Bloom filter is built over the BATCH's keys (one extra pass over
    ``ds`` — lazy datasets re-execute their lineage, so prefer this
    on a read or a cheap transform) and index rows that definitely
    match no batch key are dropped BEFORE the shuffle. Valid for an
    anti-join because an index row that matches nothing never affects
    which left rows survive; Bloom false positives just ride the
    exchange. At 100 TB this turns 'probe a 10^10-key index with a
    10^6-row batch' from an index-sized shuffle into a batch-sized
    one. Single-column keys only (the Bloom hashes one column)."""
    from vector_ray.stages.join import bucketed_join

    key_cols = list(key_cols)
    idx = _read_index(root, key_cols, buckets)
    if idx is None:
        return ds
    if batch_bloom_bits and len(key_cols) == 1:
        from vector_ray.ml.bloom import bloom_build, bloom_probe

        bloom = bloom_build(ds, key_cols[0], m_bits=int(batch_bloom_bits))
        idx = bloom_probe(idx, key_cols[0], bloom, mode="keep_seen")
    return bucketed_join(ds, idx, key_cols, join_type="anti",
                         buckets=join_buckets)


def seen_index_append(ds, key_cols: Sequence[str], root: str, *,
                      ts_col: Optional[str] = None) -> None:
    """Append ``ds``'s keys to the index (map-only local distinct +
    partitioned write; parquet file names are unique so existing
    bucket files are never touched). Keys already present are stored
    again — harmless for anti-join semantics; run
    ``seen_index_compact`` periodically to fold them. A ts-carrying
    index (built with ``ts_col``) requires ``ts_col`` here too."""
    import json

    key_cols = list(key_cols)
    with open(os.path.join(root, "seen.json")) as fh:
        meta = json.load(fh)
    nb = int(meta["num_buckets"])
    if meta.get("ts") and ts_col is None:
        raise ValueError("seen_index_append: this index stores sighting "
                         "times — pass ts_col")
    keys = ds.map_batches(
        lambda t: _local_distinct_keys(
            t, key_cols, nb, ts_col if meta.get("ts") else None),
        batch_format="pyarrow", zero_copy_batch=True)
    keys.write_parquet(_keys_dir(root), partition_cols=["bucket"])


def seen_index_compact(root: str) -> None:
    """Rewrite every bucket to exact-distinct keys. Per-partition
    maintenance: each bucket directory is read, deduped VECTORIZED
    (sort + run segmentation), and atomically swapped — no data ever
    moves between buckets, so this distributes as one task per
    bucket."""
    import json
    import shutil
    import uuid

    import pyarrow.parquet as pq

    with open(os.path.join(root, "seen.json")) as fh:
        meta = json.load(fh)
    key_cols = list(meta["key_cols"])
    kd = _keys_dir(root)
    from vector_ray.stages.bucketed import keep_first_per_key

    has_ts = bool(meta.get("ts"))
    for name in sorted(os.listdir(kd)):
        bdir = os.path.join(kd, name)
        if not (name.startswith("bucket=") and os.path.isdir(bdir)):
            continue
        cols = key_cols + (["__seen_ts"] if has_ts else [])
        t = pq.read_table(bdir, columns=cols)
        out = keep_first_per_key(
            t, key_cols,
            order_by=[("__seen_ts", "descending")] if has_ts else None)
        tmp = bdir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        pq.write_table(out, os.path.join(tmp, "compacted.parquet"))
        shutil.rmtree(bdir)
        os.replace(tmp, bdir)


def incremental_dedupe(ds, key_cols: Sequence[str], root: str, *,
                       num_buckets: int = _DEFAULT_BUCKETS,
                       append: bool = True,
                       ts_col: Optional[str] = None):
    """One ingest step: rows never seen before (within-batch keep-first
    + anti-join vs the index), with their keys appended to the index.
    Creates the index on first use. Returns the unseen-rows Dataset
    (materialized — it is consumed twice: once for the append, once by
    the caller).

    Crash semantics: with ``append=True`` keys are recorded BEFORE the
    caller sinks the rows — a crash in between drops those rows
    forever (at-most-once). For at-least-once, pass ``append=False``,
    sink the returned rows, then call ``seen_index_append`` on them
    yourself; a crash then re-emits the batch (duplicates in the sink,
    never silent loss)."""
    key_cols = list(key_cols)
    if not os.path.exists(os.path.join(root, "seen.json")):
        import json

        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "seen.json"), "w") as fh:
            json.dump({"num_buckets": int(num_buckets),
                       "key_cols": key_cols,
                       "ts": ts_col is not None}, fh)
    from vector_ray.stages.bucketed import bucketed_map_groups, keep_first_per_key

    within = bucketed_map_groups(
        ds, key_cols, lambda g: keep_first_per_key(g, key_cols))
    unseen = seen_index_filter(within, key_cols, root).materialize()
    if append:
        seen_index_append(unseen, key_cols, root, ts_col=ts_col)
    return unseen


def seen_index_expire(root: str, older_than) -> dict:
    """Drop keys whose NEWEST sighting is older than ``older_than``
    (same type/unit as the stored ts_col values) — TTL retention, the
    durable analogue of the reference dedupe cache's eviction
    (src/transforms/dedupe.rs LRU). Per-bucket rewrite, atomic swap,
    no cross-bucket movement; after expiry a re-ingested old key
    counts as new again. Compacts each bucket as a side effect (the
    newest row per key decides survival). Returns
    {"keys_dropped": n, "keys_kept": n}."""
    import json
    import shutil
    import uuid

    import pyarrow.parquet as pq

    with open(os.path.join(root, "seen.json")) as fh:
        meta = json.load(fh)
    if not meta.get("ts"):
        raise ValueError("seen_index_expire: index was built without ts_col")
    from vector_ray.stages.bucketed import keep_first_per_key

    key_cols = list(meta["key_cols"])
    kd = _keys_dir(root)
    dropped = kept = 0
    if not os.path.isdir(kd):
        return {"keys_dropped": 0, "keys_kept": 0}
    for name in sorted(os.listdir(kd)):
        bdir = os.path.join(kd, name)
        if not (name.startswith("bucket=") and os.path.isdir(bdir)):
            continue
        t = pq.read_table(bdir, columns=key_cols + ["__seen_ts"])
        newest = keep_first_per_key(t, key_cols,
                                    order_by=[("__seen_ts", "descending")])
        mask = pc.fill_null(
            pc.greater_equal(newest["__seen_ts"], older_than), True)
        out = newest.filter(mask)
        dropped += newest.num_rows - out.num_rows
        kept += out.num_rows
        tmp = bdir + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        pq.write_table(out, os.path.join(tmp, "expired.parquet"))
        shutil.rmtree(bdir)
        os.replace(tmp, bdir)
    return {"keys_dropped": int(dropped), "keys_kept": int(kept)}
