"""Full-scale flagship correctness check: run the fused flagship over
the cached synthetic tokenized table (default 2M rows) and compare the
aggregate against a DuckDB oracle that re-implements the whole
parse → enrich → route → aggregate pipeline in SQL over the same
parquet fragments.

Usage: python tools/check_flagship_full.py [n_rows]
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ORACLE = r"""
WITH parsed AS (
    SELECT doc_id, n_tok, source,
           regexp_extract(doc_id, '^(\w+)-', 1) AS app,
           CAST(regexp_extract(doc_id, '-(\d+)$', 1) AS BIGINT) AS seq
    FROM tok
), enriched AS (
    SELECT p.*, l.region, l.tier
    FROM parsed p LEFT JOIN lookup l ON l.source = p.source
), routed AS (
    SELECT 'hot' AS lane, * FROM enriched WHERE tier = 'hot'
    UNION ALL SELECT 'web', * FROM enriched WHERE app = 'web'
    UNION ALL SELECT 'long', * FROM enriched WHERE n_tok >= 1024
    UNION ALL SELECT 'rest', * FROM enriched
        WHERE NOT coalesce(tier = 'hot', FALSE)
          AND NOT coalesce(app = 'web', FALSE)
          AND NOT n_tok >= 1024
)
SELECT lane, source, region,
       COUNT(doc_id) AS n_rows,
       CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
       MIN(seq) AS seq_min, MAX(seq) AS seq_max
FROM routed GROUP BY lane, source, region
ORDER BY lane, source, region
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from vector_ray.pipelines.flagship import run_streaming_fused
    from vector_ray.sources.synth import source_lookup_table, synth_parquet

    path = synth_parquet(n, seed=42, rows_per_file=125_000)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))

    got = (
        run_streaming_fused(files, concurrency=12, token_sig=False)
        .to_pandas()
        .sort_values(["lane", "source", "region"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW tok AS SELECT * FROM read_parquet('{path}/part-*.parquet')")
    con.register("lookup", source_lookup_table().to_pandas())
    want = con.execute(ORACLE).df()

    ok = True
    if len(got) != len(want):
        print(f"FAIL: {len(got)} rows vs oracle {len(want)}")
        ok = False
    else:
        for col in ["lane", "source", "region", "n_rows", "tok_sum", "seq_min", "seq_max"]:
            if not (got[col].astype(str).values == want[col].astype(str).values).all():
                bad = (got[col].astype(str).values != want[col].astype(str).values).argmax()
                print(f"FAIL col {col} first diff row {bad}: {got[col][bad]} vs {want[col][bad]}")
                ok = False
    total_routed = int(got["n_rows"].sum())
    print(f"{'OK' if ok else 'FAIL'}: flagship@{n} rows — {len(got)} aggregate groups, "
          f"{total_routed} routed rows, all values {'match' if ok else 'MISMATCH'} vs DuckDB oracle")
    ray.shutdown()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
