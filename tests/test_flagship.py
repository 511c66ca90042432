"""End-to-end flagship pipeline tests (FIXTURES.md F7): per-sink
aggregate counts, routed-row equality, per-row token-array equality vs
a single-process pyarrow oracle, and resume-from-manifest."""

import collections
import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from vector_ray.pipelines.flagship import (
    LANES,
    flagship_aggregate,
    parse_enrich_route,
    run_flagship,
)
from vector_ray.sources.synth import source_lookup_table, synth_parquet, synth_table

N = 5000


def oracle_routed(t: pa.Table) -> dict:
    """Single-process oracle: lane → rows (python dicts, no Ray)."""
    import re

    lookup = {r["source"]: r for r in source_lookup_table().to_pylist()}
    pat = re.compile(r"^(?P<app>\w+)-(?P<host>\w+)\.(?P<tld>\w+)-(?P<seq>(?:[+-]?(?:[0-9]+)))")
    out = collections.defaultdict(list)
    for row in t.to_pylist():
        m = pat.match(row["doc_id"])
        app = m.group("app") if m else None
        seq = int(m.group("seq")) if m else None
        enr = lookup.get(row["source"], {})
        full = dict(row, app=app, seq=seq, region=enr.get("region"), tier=enr.get("tier"))
        lanes = []
        if full["tier"] == "hot":
            lanes.append("hot")
        if app == "web":
            lanes.append("web")
        if row["n_tok"] >= 1024:
            lanes.append("long")
        if not lanes:
            lanes = ["rest"]
        for lane in lanes:
            out[lane].append(full)
    return out


@pytest.fixture(scope="module")
def routed_rows():
    t = synth_table(N)
    ds = rd.from_arrow(t).repartition(4)
    routed = parse_enrich_route(ds, enrich_concurrency=2)
    rows = routed.take_all()
    return t, rows


class TestFlagshipStreaming:
    def test_routed_row_equality(self, routed_rows):
        t, rows = routed_rows
        oracle = oracle_routed(t)
        got = collections.defaultdict(list)
        for r in rows:
            got[r["lane"]].append(r)
        assert set(got) == set(oracle)
        for lane in oracle:
            g = sorted(r["doc_id"] for r in got[lane])
            o = sorted(r["doc_id"] for r in oracle[lane])
            assert g == o, f"lane {lane}: {len(g)} vs {len(o)} rows"

    def test_token_array_equality(self, routed_rows):
        # BASELINE.json per-row invariant: tokens bit-identical through the pipeline
        t, rows = routed_rows
        tokens_by_doc = dict(zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()))
        for r in rows[:500]:
            assert list(r["tokens"]) == tokens_by_doc[r["doc_id"]], r["doc_id"]

    def test_aggregate_counts(self, routed_rows):
        t, rows = routed_rows
        routed_tbl = pa.Table.from_pylist(
            [{k: r[k] for k in ("lane", "source", "region", "doc_id", "n_tok", "seq")} for r in rows]
        )
        agg = flagship_aggregate(rd.from_arrow(routed_tbl).repartition(3)).take_all()
        oracle = oracle_routed(t)
        truth = collections.Counter()
        tok = collections.Counter()
        for lane, rws in oracle.items():
            for r in rws:
                truth[(lane, r["source"], r["region"])] += 1
                tok[(lane, r["source"], r["region"])] += r["n_tok"]
        got_n = {(r["lane"], r["source"], r["region"]): r["n_rows"] for r in agg}
        got_tok = {(r["lane"], r["source"], r["region"]): r["tok_sum"] for r in agg}
        assert got_n == dict(truth)
        assert got_tok == dict(tok)


class TestFlagshipResume:
    def test_resume_skips_done_partitions(self, tmp_path):
        src = synth_parquet(4000, seed=7, rows_per_file=1000, root=str(tmp_path / "in"))
        out = str(tmp_path / "out")
        res1 = run_flagship(src, out)
        assert res1["skipped"] == 0
        assert res1["partitions"] == 4
        totals = res1["manifest"].totals()
        assert totals["rows_in"] == 4000

        # rerun: everything is skipped, aggregate identical
        res2 = run_flagship(src, out)
        assert res2["skipped"] == 4
        a1 = sorted(map(tuple, (r.values() for r in res1["aggregate"].take_all())))
        a2 = sorted(map(tuple, (r.values() for r in res2["aggregate"].take_all())))
        assert a1 == a2

    def test_partial_resume(self, tmp_path):
        src = synth_parquet(3000, seed=9, rows_per_file=1000, root=str(tmp_path / "in"))
        out = str(tmp_path / "out")
        res1 = run_flagship(src, out)
        # simulate a crash: delete one manifest entry + its output
        m = res1["manifest"]
        pid = sorted(m.done_partitions())[1]
        os.remove(os.path.join(m.dir, f"{pid}.json"))
        shutil.rmtree(os.path.join(out, f"routed/{pid}"))
        res2 = run_flagship(src, out)
        assert res2["skipped"] == 2
        # all three partitions' outputs exist again
        assert len(glob.glob(os.path.join(out, "routed/frag-*"))) == 3
        totals = res2["manifest"].totals()
        assert totals["rows_in"] == 3000

    def test_routed_output_token_equality(self, tmp_path):
        src = synth_parquet(2000, seed=11, rows_per_file=1000, root=str(tmp_path / "in"))
        out = str(tmp_path / "out")
        run_flagship(src, out)
        files = glob.glob(os.path.join(out, "routed/*/_lane=*/*.parquet"))
        routed = pa.concat_tables([pq.read_table(f, columns=["doc_id", "tokens"]) for f in files])
        orig = pa.concat_tables(
            [pq.read_table(f, columns=["doc_id", "tokens"]) for f in glob.glob(os.path.join(src, "*.parquet"))]
        )
        truth = dict(zip(orig["doc_id"].to_pylist(), orig["tokens"].to_pylist()))
        got = dict(zip(routed["doc_id"].to_pylist(), routed["tokens"].to_pylist()))
        assert set(got) == set(truth)
        for k in list(got)[:300]:
            assert got[k] == truth[k]


class TestResumeWithChangedInputList:
    def test_no_double_count_when_fragments_added(self, tmp_path):
        # reviewer scenario: resume after ADDING a fragment must not leave
        # stale partition outputs in the aggregate
        src = synth_parquet(3000, seed=21, rows_per_file=1000, root=str(tmp_path / "in"))
        files = sorted(glob.glob(os.path.join(src, "*.parquet")))
        out = str(tmp_path / "out")

        # first run with only fragments 0 and 2 present in the input dir
        live = str(tmp_path / "live")
        os.makedirs(live)
        for f in [files[0], files[2]]:
            shutil.copy(f, os.path.join(live, os.path.basename(f)))
        res1 = run_flagship(live, out)
        assert res1["partitions"] == 2

        # fragment 1 arrives later; rerun over the same dir + out dir
        shutil.copy(files[1], os.path.join(live, os.path.basename(files[1])))
        res2 = run_flagship(live, out)
        assert res2["partitions"] == 3
        assert res2["skipped"] == 2  # unchanged fragments keep their digest ids
        agg = res2["aggregate"].to_pandas()
        assert int(agg["n_rows"].sum()) >= 3000  # routed rows >= inputs (copy lanes)
        # row total equals a fresh run over all fragments (no stale double count)
        fresh_out = str(tmp_path / "fresh")
        res3 = run_flagship(live, fresh_out)
        fresh = res3["aggregate"].to_pandas()
        assert int(agg["n_rows"].sum()) == int(fresh["n_rows"].sum())


class TestGenericResumable:
    def test_run_resumable_skip_and_crash_recovery(self, tmp_path):
        import glob
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray.data as rd

        from vector_ray.state.resumable import run_resumable

        src = str(tmp_path / "in")
        os.makedirs(src)
        for i in range(4):
            pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}),
                           os.path.join(src, f"f{i}.parquet"))
        files = sorted(glob.glob(os.path.join(src, "*.parquet")))
        out = str(tmp_path / "out")

        def double(ds):
            return ds.map_batches(
                lambda t: t.append_column("y", pc.multiply(t["x"], 2)),
                batch_format="pyarrow", zero_copy_batch=True)

        r1 = run_resumable(files, out, double)
        assert r1["partitions"] == 4 and r1["skipped"] == 0
        assert r1["counters"]["rows_in"] == 40 and r1["counters"]["rows_out"] == 40
        # rerun skips everything, outputs unchanged
        r2 = run_resumable(files, out, double)
        assert r2["skipped"] == 4
        # simulate a crash: delete one manifest entry — only that
        # partition is redone, results identical
        entries = sorted(glob.glob(os.path.join(out, "_manifest", "*.json")))
        os.remove(entries[0])
        r3 = run_resumable(files, out, double)
        assert r3["skipped"] == 3
        got = sorted(r["y"] for r in rd.read_parquet(
            sorted(glob.glob(os.path.join(out, "parts", "*", "*.parquet")))).take_all())
        assert got == [2 * x for x in range(40)]
