"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf dir and compare against oracle_sql() via
DuckDB — row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    import hashlib

    h = hashlib.sha1()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ["VR_ORACLE_SF_DIR"] = sf_dir  # golden oracles read the same dir

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("VR_CHECK_CPUS", "8")),
             include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(got)} rows, cols={list(got.columns)} [{dt:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        else:
            gt = {c: str(got[c].dtype) for c in sorted(got.columns)}
            wt = {c: str(want[c].dtype) for c in sorted(want.columns)}
            if gt != wt:
                problems.append(f"dtypes {gt} != {wt}")
            if value_hash(got) != value_hash(want):
                problems.append("value hash mismatch")
                merged = got.sort_values(sorted(got.columns)).reset_index(drop=True)
                mw = want.sort_values(sorted(want.columns)).reset_index(drop=True)
                if len(merged) == len(mw):
                    for c in sorted(got.columns):
                        if not merged[c].astype(str).equals(mw[c].astype(str)):
                            bad = (merged[c].astype(str) != mw[c].astype(str)).idxmax()
                            problems.append(
                                f"  first diff col={c} row={bad}: {merged[c][bad]!r} vs {mw[c][bad]!r}"
                            )
                            break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows match [{dt:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
