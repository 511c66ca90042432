"""Stage tests over Ray Datasets — mirrors the reference's inline
transform tests (remap.rs:189-230, route.rs:167-221, dedupe.rs:209+,
aggregate.rs:146-200, reduce behavior corpus)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from vector_ray.expr import C, F
from vector_ray.sources.synth import source_lookup_table, synth_table
from vector_ray.stages import (
    AddFields,
    Aggregate,
    Coercer,
    Concat,
    Dedupe,
    Enrich,
    EnrichmentTable,
    Filter,
    LogToMetric,
    Reduce,
    RemoveFields,
    RenameFields,
    Route,
    Sample,
    TagCardinalityLimit,
    grouped_aggregate,
)
from vector_ray.stages.base import ChainStep, apply_chain
from vector_ray.stages.remap import Remap


def ds_of(tbl, blocks=2):
    return rd.from_arrow(tbl).repartition(blocks)


class TestRemap:
    def test_keep_original_on_error(self):
        # remap.rs:124-174: drop_on_error=false restores pre-transform row
        t = pa.table({"v": ["1", "2", "bad"], "w": ["a", "b", "c"]})

        def prog(tbl):
            out = F.set_(tbl, "v", pc.cast(F.to_int(F.replace(tbl["v"], "bad", "x")), pa.string()))
            out = F.set_(out, "doubled", pc.multiply(F.to_int(out["v"]), 2))
            err = pc.is_null(F.to_int(tbl["v"]))
            return out, err

        # arrow cast of "bad" raises → emulate with safe kernel: use coalesce path
        def prog2(tbl):
            ints = pc.cast(tbl["v"], pa.int64(), safe=False) if False else None
            parsed = pc.struct_field(pc.extract_regex(tbl["v"], r"^(?P<n>\d+)$"), "n")
            err = pc.is_null(parsed)
            out = F.set_(tbl, "doubled", pc.multiply(pc.cast(parsed, pa.int64()), 2))
            out = F.set_(out, "w", pc.utf8_upper(out["w"]))
            return out, err

        out = Remap(prog2, drop_on_error=False, error_col="_err").transform(t)
        assert out["doubled"].to_pylist() == [2, 4, None]
        assert out["w"].to_pylist() == ["A", "B", "c"]  # error row keeps original
        assert out["_err"].to_pylist() == [False, False, True]

    def test_drop_on_error(self):
        t = pa.table({"v": ["1", "bad"]})

        def prog(tbl):
            parsed = pc.struct_field(pc.extract_regex(tbl["v"], r"^(?P<n>\d+)$"), "n")
            return F.set_(tbl, "n", pc.cast(parsed, pa.int64())), pc.is_null(parsed)

        out = Remap(prog, drop_on_error=True).transform(t)
        assert out["n"].to_pylist() == [1]


class TestFieldOps:
    def test_add_remove_rename_concat(self):
        t = pa.table({"a": ["x"], "b": ["y"]})
        steps = [
            AddFields({"lit": 7, "tpl": "{{a}}-{{b}}"}),
            Concat("joined", ["a", "b"], joiner="/"),
            RenameFields({"b": "bb"}),
            RemoveFields(["a"]),
        ]
        out = ChainStep(steps).transform(t)
        assert out["lit"].to_pylist() == [7]
        assert out["tpl"].to_pylist() == ["x-y"]
        assert out["joined"].to_pylist() == ["x/y"]
        assert "a" not in out.column_names and "bb" in out.column_names

    def test_coercer_drop_unspecified(self):
        t = pa.table({"n": ["5"], "junk": ["z"]})
        out = Coercer({"n": "int"}, drop_unspecified=True).transform(t)
        assert out.column_names == ["n"]
        assert out["n"].to_pylist() == [5]

    def test_add_fields_no_overwrite(self):
        t = pa.table({"a": ["x"]})
        out = AddFields({"a": "new"}, overwrite=False).transform(t)
        assert out["a"].to_pylist() == ["x"]


class TestFilterSample:
    def test_filter_ds(self):
        ds = ds_of(pa.table({"x": list(range(10))}))
        out = Filter(C.ge("x", 5)).apply(ds)
        assert sorted(r["x"] for r in out.take_all()) == [5, 6, 7, 8, 9]

    def test_sample_deterministic(self):
        t = synth_table(2000)
        s = Sample(10, "doc_id")
        a = s.transform(t)
        b = s.transform(t)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert 100 < len(a) < 400
        assert a["sample_rate"].to_pylist()[0] == 10

    def test_sample_exclude(self):
        t = synth_table(500)
        s = Sample(1000000, "doc_id", exclude=C.eq("source", "syslog-00"))
        out = s.transform(t)
        # all hot-key rows bypass sampling
        assert set(out["source"].to_pylist()) >= {"syslog-00"}


class TestRoute:
    def test_multi_match_copies(self):
        # route.rs:101-120: event goes to EVERY matching lane
        t = pa.table({"status": [200, 500, 503], "tier": ["hot", "hot", "cold"]})
        route = Route(
            {"errors": C.ge("status", 500), "hot": C.eq("tier", "hot")},
            unmatched_lane="rest",
        )
        out = route._explode_batch(t)
        lanes = sorted(zip(out["status"].to_pylist(), out["lane"].to_pylist()))
        # row0: hot only; row1: errors+hot; row2: errors only
        assert lanes == [(200, "hot"), (500, "errors"), (500, "hot"), (503, "errors")]

    def test_views_and_mask(self):
        t = pa.table({"x": [1, 2, 3]})
        ds = ds_of(t)
        route = Route({"big": C.ge("x", 2), "odd": C.expr(lambda t: pc.equal(F.mod(t["x"], 2), 1))})
        views = route.views(ds)
        assert sorted(r["x"] for r in views["big"].take_all()) == [2, 3]
        assert sorted(r["x"] for r in views["odd"].take_all()) == [1, 3]
        masked = route.mask(ds).take_all()
        assert [r["_route_big"] for r in sorted(masked, key=lambda r: r["x"])] == [False, True, True]

    def test_empty_lanes_rejected(self):
        # ADVICE r1: empty lane table silently dropped the lane column and
        # the unmatched contract — now rejected at construction
        import pytest

        with pytest.raises(ValueError):
            Route({})


class TestEnrich:
    def test_get_semantics(self):
        t = synth_table(200)
        ds = ds_of(t)
        table = EnrichmentTable(source_lookup_table(), key=["source"])
        out = Enrich(table, select=["region", "tier"], concurrency=2).apply(ds)
        rows = out.take_all()
        assert all(r["region"] is not None for r in rows)
        assert all(r["_enrich_miss"] is False for r in rows)

    def test_miss_produces_nulls(self):
        t = pa.table({"source": ["syslog-00", "unknown-src"]})
        table = EnrichmentTable(source_lookup_table(), key=["source"])
        e = Enrich(table, select=["region"])
        out = e.probe_batch(t)
        assert out["region"].to_pylist()[0] is not None
        assert out["region"].to_pylist()[1] is None
        assert out["_enrich_miss"].to_pylist() == [False, True]

    def test_get_duplicate_keys_rejected(self):
        dup = pa.table({"k": ["a", "a"], "v": [1, 2]})
        with pytest.raises(ValueError):
            Enrich(EnrichmentTable(dup, key=["k"]))

    def test_find_semantics_multi_row(self):
        small = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
        t = pa.table({"k": ["a", "b", "c"], "other": ["x", "y", "z"]})
        e = Enrich(EnrichmentTable(small, key=["k"]), mode="find", miss_col=None)
        out = e.probe_batch(t)
        assert len(out) == 4  # a matches twice, b once, c miss-null row
        got = sorted(zip(out["k"].to_pylist(), out["v"].to_pylist()))
        assert got == [("a", 1), ("a", 2), ("b", 3), ("c", None)]

    def test_case_insensitive(self):
        small = pa.table({"k": ["AbC"], "v": [1]})
        t = pa.table({"k": ["abc", "ABC"]})
        e = Enrich(EnrichmentTable(small, key=["k"], case_insensitive=True))
        out = e.probe_batch(t)
        assert out["v"].to_pylist() == [1, 1]

    def test_between_dates(self):
        small = pa.table({"k": ["a"], "v": [1], "lo": [10], "hi": [20]})
        t = pa.table({"k": ["a", "a"], "ts": [15, 25]})
        e = Enrich(EnrichmentTable(small, key=["k"]), between=("ts", "lo", "hi"))
        out = e.probe_batch(t)
        assert out["v"].to_pylist() == [1, None]

    def test_between_real_date_types(self):
        # BetweenDates (lib/enrichment/src/lib.rs:18-27) with actual
        # Arrow date32 bounds, find-mode fan-out
        import datetime as dt

        d = dt.date
        small = pa.table({
            "k": ["a", "a"],
            "period": ["q1", "q2"],
            "lo": pa.array([d(2024, 1, 1), d(2024, 4, 1)], pa.date32()),
            "hi": pa.array([d(2024, 3, 31), d(2024, 6, 30)], pa.date32()),
        })
        t = pa.table({
            "k": ["a", "a", "a"],
            "ts": pa.array([d(2024, 2, 10), d(2024, 5, 5), d(2024, 8, 1)], pa.date32()),
        })
        e = Enrich(EnrichmentTable(small, key=["k"]), mode="find",
                   miss_col=None, between=("ts", "lo", "hi"))
        out = e.probe_batch(t)
        got = {(str(r["ts"]), r["period"]) for r in out.to_pylist()}
        assert got == {("2024-02-10", "q1"), ("2024-05-05", "q2")}


class TestDedupe:
    def test_exact_first_wins(self):
        t = pa.table(
            {"k": ["a", "b", "a", "c", "b"], "seq": [1, 2, 3, 4, 5], "v": ["p", "q", "r", "s", "t"]}
        )
        out = Dedupe(["k"], order_by="seq").apply(ds_of(t, blocks=3)).take_all()
        got = {r["k"]: r["v"] for r in out}
        assert got == {"a": "p", "b": "q", "c": "s"}

    def test_type_distinction(self):
        # dedupe.rs:131-143: "123" (string) and 123 (int) are distinct keys
        t1 = pa.table({"k": pa.array(["123"]), "seq": [1]})
        t2 = pa.table({"k": pa.array([123]), "seq": [2]})
        d = Dedupe(["k"], order_by="seq")
        k1 = d._key_batch(t1)["__dedupe_key"].to_pylist()
        k2 = d._key_batch(t2)["__dedupe_key"].to_pylist()
        assert k1 != k2


class TestReduce:
    def test_merge_strategies(self):
        t = pa.table(
            {
                "request_id": ["r1", "r1", "r2", "r1"],
                "seq": [1, 2, 1, 3],
                "bytes": [10, 20, 5, 30],
                "msg": ["a", "b", "x", "c"],
                "tags": [["u"], ["v", "u"], ["w"], ["z"]],
            }
        )
        r = Reduce(
            ["request_id"],
            merge_strategies={
                "bytes": "sum",
                "msg": "concat",
                "tags": "flat_unique",
                "seq": "max",
            },
            order_by="seq",
        )
        rows = {x["request_id"]: x for x in r.apply(ds_of(t, blocks=2)).take_all()}
        assert rows["r1"]["bytes"] == 60
        assert rows["r1"]["msg"] == "a b c"
        assert sorted(rows["r1"]["tags"]) == ["u", "v", "z"]
        assert rows["r1"]["seq"] == 3
        assert rows["r1"]["n_rows"] == 3
        assert rows["r2"]["bytes"] == 5

    def test_salted_matches_unsalted_all_strategies(self):
        import numpy as np

        n = 400
        rng = np.random.default_rng(5)
        t = pa.table(
            {
                "k": [f"k{i % 3}" for i in range(n)],
                "seq": list(range(n)),
                "v": rng.integers(0, 100, n).tolist(),
                "msg": [f"m{i}" for i in range(n)],
                "first_col": [f"f{i}" for i in range(n)],
                "last_col": [f"l{i}" for i in range(n)],
                "arr": [[f"a{i % 7}", f"b{i % 5}"] for i in range(n)],
            }
        )
        strategies = {
            "v": "sum", "msg": "concat", "first_col": "discard",
            "last_col": "retain", "arr": "flat_unique", "seq": "max",
        }
        salted = Reduce(["k"], merge_strategies=strategies, order_by="seq",
                        salted=True, salt_buckets=8)
        unsalted = Reduce(["k"], merge_strategies=strategies, order_by="seq",
                          salted=False)
        a = {r["k"]: r for r in salted.apply(ds_of(t, blocks=4)).take_all()}
        b = {r["k"]: r for r in unsalted.apply(ds_of(t, blocks=4)).take_all()}
        assert set(a) == set(b)
        for k in a:
            for col in ("v", "msg", "first_col", "last_col", "seq", "n_rows"):
                assert a[k][col] == b[k][col], (k, col, a[k][col], b[k][col])
            assert list(a[k]["arr"]) == list(b[k]["arr"])

    def test_salted_skew_hot_key(self):
        # one key = 50% of rows: the salted plan must still be exact
        import numpy as np

        n = 2000
        keys = ["hot" if i % 2 == 0 else f"cold{i % 11}" for i in range(n)]
        t = pa.table({"k": keys, "seq": list(range(n)), "v": [1.0] * n,
                      "m": [f"x{i}" for i in range(n)]})
        r = Reduce(["k"], merge_strategies={"v": "sum", "m": "retain", "seq": "min"},
                   order_by="seq", salt_buckets=16)
        rows = {x["k"]: x for x in r.apply(ds_of(t, blocks=8)).take_all()}
        assert rows["hot"]["v"] == 1000.0
        assert rows["hot"]["n_rows"] == 1000
        assert rows["hot"]["m"] == f"x{n - 2}"  # last by seq among evens
        assert rows["hot"]["seq"] == 0

    def test_salted_vector_all_strategies_match_reference(self):
        # r4: the salted two-phase plan is fully vectorized; every
        # strategy (incl. array / concat_newline / shortest_array /
        # longest_array over list columns) must match the per-key
        # pandas reference
        import numpy as np

        rng = np.random.default_rng(23)
        n = 400
        t = pa.table({
            "k": [f"k{i % 5}" for i in range(n)],
            "seq": list(range(n)),
            "v": pa.array(
                [None if i % 13 == 0 else int(x)
                 for i, x in enumerate(rng.integers(0, 50, n))],
                pa.int64()),
            "ar": pa.array(
                [None if i % 7 == 0 else [f"e{j}" for j in range(i % 4)]
                 for i in range(n)], pa.list_(pa.string())),
            "la": pa.array(
                [None if i % 11 == 3
                 else [float(j) for j in range((i * 3) % 5)]
                 for i in range(n)], pa.list_(pa.float64())),
            "msg": pa.array(
                [None if i % 6 == 0 else f"w{i % 9}" for i in range(n)]),
        })
        strategies = {"v": "min", "ar": "shortest_array",
                      "la": "longest_array", "msg": "concat_newline",
                      "seq": "array"}
        a = {r["k"]: r for r in Reduce(
            ["k"], merge_strategies=strategies, order_by="seq",
            salted=True, salt_buckets=8).apply(
                ds_of(t, blocks=4)).take_all()}
        b = {r["k"]: r for r in Reduce(
            ["k"], merge_strategies=strategies, order_by="seq",
            salted=False).apply(ds_of(t, blocks=4)).take_all()}
        assert set(a) == set(b)
        for k in a:
            assert a[k]["v"] == b[k]["v"], k
            assert a[k]["msg"] == b[k]["msg"], k
            assert list(a[k]["seq"]) == list(b[k]["seq"]), k
            for col in ("ar", "la"):
                av, bv = a[k][col], b[k][col]
                if bv is None:
                    assert av is None, (k, col)
                else:
                    assert list(av) == list(bv), (k, col, av, bv)
            assert a[k]["n_rows"] == b[k]["n_rows"], k

    def test_ends_when_segments(self):
        t = pa.table(
            {
                "k": ["a"] * 4,
                "seq": [1, 2, 3, 4],
                "done": [False, True, False, False],
                "v": [1, 1, 1, 1],
            }
        )
        r = Reduce(["k"], merge_strategies={"v": "sum"}, order_by="seq", ends_when=C.eq("done", True))
        rows = r.apply(ds_of(t, blocks=1)).take_all()
        sums = sorted(x["v"] for x in rows)
        assert sums == [2, 2]  # rows 1-2 close a group; rows 3-4 flush at end

    def test_conditional_bucketed_matches_pandas_reference(self):
        # the vectorized conditional path (salted=True, r4) must agree
        # with the per-key pandas reference (salted=False) across every
        # strategy, with both ends_when and starts_when active
        import numpy as np

        rng = np.random.default_rng(11)
        n = 600
        t = pa.table({
            "k": [f"k{i % 7}" for i in range(n)],
            "seq": list(range(n)),
            "done": [i % 5 == 3 for i in range(n)],
            "fresh": [i % 11 == 7 for i in range(n)],
            "v": pa.array(
                [None if i % 13 == 0 else int(x)
                 for i, x in enumerate(rng.integers(0, 100, n))],
                pa.int64()),
            "msg": pa.array(
                [None if i % 9 == 0 else f"m{i}" for i in range(n)]),
            "fc": [f"f{i}" for i in range(n)],
            "lc": [f"l{i}" for i in range(n)],
            "fl": pa.array(
                [None if i % 17 == 0 else [f"a{i % 4}", f"b{i % 3}"]
                 for i in range(n)], pa.list_(pa.string())),
            "ar": pa.array(
                [None if i % 19 == 0
                 else [float(j) for j in range(i % 4)]
                 for i in range(n)], pa.list_(pa.float64())),
        })
        strategies = {
            "v": "sum", "msg": "concat_newline", "fc": "discard",
            "lc": "retain", "fl": "flat_unique", "ar": "longest_array",
            "done": "max", "fresh": "min",
        }
        kw = dict(merge_strategies=strategies, order_by="seq",
                  ends_when=C.eq("done", True),
                  starts_when=C.eq("fresh", True))
        fast = Reduce(["k"], salted=True, **kw)
        ref = Reduce(["k"], salted=False, **kw)

        def keyed(ds):
            return {(r["k"], r["seq"]): r for r in ds.take_all()}

        a = keyed(fast.apply(ds_of(t, blocks=4)))
        b = keyed(ref.apply(ds_of(t, blocks=4)))
        assert set(a) == set(b) and len(a) > 7
        for key in a:
            for col in ("v", "msg", "fc", "lc", "n_rows", "done",
                        "fresh"):
                av, bv = a[key][col], b[key][col]
                if isinstance(bv, float) and np.isnan(bv):
                    assert av is None or (isinstance(av, float)
                                          and np.isnan(av))
                else:
                    assert av == bv, (key, col, av, bv)
            assert list(a[key]["fl"]) == list(b[key]["fl"]), key
            ae, be = a[key]["ar"], b[key]["ar"]
            if be is None or (isinstance(be, float) and np.isnan(be)):
                assert ae is None, key
            else:
                assert list(ae) == list(be), key

    def test_conditional_high_cardinality_keys(self):
        # 10^5 distinct keys with ends_when: must run O(buckets) Python
        # (the bucketed plan), finish fast, and stay exact
        import numpy as np

        n = 200_000  # 2 rows per key
        key = np.repeat(np.arange(100_000, dtype=np.int64), 2)
        seq = np.tile(np.array([0, 1], np.int64), 100_000)
        done = np.tile(np.array([True, False]), 100_000)
        t = pa.table({"k": pa.array(key), "seq": pa.array(seq),
                      "done": pa.array(done),
                      "v": pa.array(np.ones(n, np.int64))})
        r = Reduce(["k"], merge_strategies={"v": "sum"}, order_by="seq",
                   ends_when=C.eq("done", True))
        out = r.apply(ds_of(t, blocks=8))
        df = out.to_pandas()
        # every key: row0 (done) closes a 1-row group, row1 flushes
        assert len(df) == 200_000
        assert (df["v"] == 1).all()
        assert (df["n_rows"] == 1).all()


class TestAggregate:
    def test_mean_and_all_null_group(self):
        t = pa.table({
            "k": ["a", "a", "b", "b", "c"],
            "v": pa.array([1.0, 3.0, 10.0, None, None], pa.float64()),
            "o": [1, 2, 3, 4, 5],
        })
        out = grouped_aggregate(
            ds_of(t, blocks=2),
            ["k"],
            {"avg": ("mean", "v"), "last_v": ("last", "o"), "first_v": ("first", "o")},
        ).take_all()
        by = {r["k"]: r for r in out}
        assert by["a"]["avg"] == 2.0
        assert by["b"]["avg"] == 10.0
        assert by["c"]["avg"] is None  # all-null group must not divide by zero

    def test_two_phase_grouped(self):
        t = synth_table(3000)
        ds = ds_of(t, blocks=4)
        out = grouped_aggregate(
            ds,
            ["source"],
            {"n": ("count", "doc_id"), "tok": ("sum", "n_tok"), "mx": ("max", "n_tok"),
             "apps": ("set", "doc_id")},
        ).take_all()
        import collections

        truth_n = collections.Counter(t["source"].to_pylist())
        got_n = {r["source"]: r["n"] for r in out}
        assert got_n == dict(truth_n)
        truth_tok = collections.defaultdict(int)
        for s, n in zip(t["source"].to_pylist(), t["n_tok"].to_pylist()):
            truth_tok[s] += n
        assert {r["source"]: r["tok"] for r in out} == dict(truth_tok)

    def test_log_to_metric_aggregate(self):
        # aggregate.rs:146-200 semantics: incremental sums, absolute last
        t = pa.table({"host": ["h1", "h1", "h2"], "bytes": [10, 20, 5]})
        lm = LogToMetric(
            [
                {"type": "counter", "name": "requests", "tags": {"host": "{{host}}"}},
                {"type": "counter", "name": "bytes_total", "field": "bytes",
                 "increment_by_value": True, "tags": {"host": "{{host}}"}},
                {"type": "set", "name": "hosts_seen", "field": "host"},
            ]
        )
        ds = lm.apply(ds_of(t, blocks=2))
        rows = Aggregate(tag_keys=["host"]).apply(ds).take_all()
        by = {(r["name"], r.get("host")): r["value"] for r in rows}
        assert by[("requests", "h1")] == 2.0
        assert by[("requests", "h2")] == 1.0
        assert by[("bytes_total", "h1")] == 30.0
        assert by[("hosts_seen", None)] == 2.0  # distinct set size

    def test_sketch_partial_empty_batch(self):
        # ADVICE r1: an empty upstream block must yield a schema-stable
        # empty partial, not IndexError
        from vector_ray.stages.aggregate import _partial_batch

        t = pa.table({"k": pa.array([], pa.string()), "u": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
        out = _partial_batch(t, ["k"], {"u_n": ("approx_nunique", "u"), "s": ("sum", "v")})
        assert len(out) == 0
        assert set(out.column_names) == {"k", "s", "u_n__sk"}
        out2 = _partial_batch(t, ["k"], {"u_n": ("approx_nunique", "u")})
        assert len(out2) == 0 and set(out2.column_names) == {"k", "u_n__sk"}

    def test_null_group_key_gets_sketch(self):
        # ADVICE r1: Arrow joins never match null keys — null-keyed groups
        # must still carry their sketch through mixed simple+sketch specs
        t = pa.table({"k": ["a", None, None, "a"], "u": ["x", "y", "z", "x"],
                      "v": [1, 2, 3, 4]})
        out = grouped_aggregate(
            ds_of(t, blocks=2), ["k"],
            {"s": ("sum", "v"), "u_n": ("approx_nunique", "u")},
        ).take_all()
        by = {r["k"]: r for r in out}
        assert by[None]["s"] == 5 and by[None]["u_n"] == 2
        assert by["a"]["s"] == 5 and by["a"]["u_n"] == 1


class TestTagCardinality:
    def test_drop_tag(self):
        t = pa.table({"tag": [f"v{i}" for i in range(10)], "x": list(range(10))})
        out = TagCardinalityLimit(["tag"], value_limit=3).apply(ds_of(t, blocks=2)).take_all()
        kept = [r["tag"] for r in out if r["tag"] is not None]
        assert len(out) == 10
        assert sorted(kept) == ["v0", "v1", "v2"]

    def test_drop_event(self):
        t = pa.table({"tag": [f"v{i}" for i in range(10)]})
        out = TagCardinalityLimit(["tag"], value_limit=3, action="drop_event").apply(ds_of(t)).take_all()
        assert len(out) == 3

    def test_two_phase_no_driver_blowup(self):
        # VERDICT r1: pre-limit distinct cardinality is unbounded; the
        # truncated-min-set partials must still produce exactly the
        # value_limit smallest values with many distinct values per block
        n = 20_000
        t = pa.table({"tag": [f"v{i:06d}" for i in range(n)], "x": list(range(n))})
        out = TagCardinalityLimit(["tag"], value_limit=5).apply(ds_of(t, blocks=8)).take_all()
        kept = sorted(r["tag"] for r in out if r["tag"] is not None)
        assert kept == [f"v{i:06d}" for i in range(5)]
        assert len(out) == n

    def test_probabilistic_mode(self):
        t = pa.table({"tag": [f"v{i}" for i in range(1000)]})
        lim = TagCardinalityLimit(["tag"], value_limit=10, action="drop_event",
                                  mode="probabilistic")
        out1 = sorted(r["tag"] for r in lim.apply(ds_of(t, blocks=4)).take_all())
        assert len(out1) == 10
        # deterministic (hash-ordered, not arrival-ordered): same subset
        # on re-run and with different block structure
        lim2 = TagCardinalityLimit(["tag"], value_limit=10, action="drop_event",
                                   mode="probabilistic")
        out2 = sorted(r["tag"] for r in lim2.apply(ds_of(t, blocks=7)).take_all())
        assert out1 == out2
        # hash-ordered acceptance is not the lexicographic prefix
        assert out1 != [f"v{i}" for i in range(10)]


class TestQuantileBandFilter:
    def test_band_matches_brute_force(self):
        import math

        from vector_ray.stages.quantile import quantile_band_filter

        np = __import__("numpy")
        rng = np.random.default_rng(3)
        vals = rng.normal(50, 20, 5_000)
        t = pa.table({"v": pa.array(vals, pa.float64()),
                      "i": pa.array(range(5_000), pa.int64())})
        out = quantile_band_filter(ds_of(t, blocks=6), "v", 0.25, 0.75).take_all()
        s = sorted(vals)
        lo = s[max(1, math.ceil(0.25 * len(s))) - 1]
        hi = s[max(1, math.ceil(0.75 * len(s))) - 1]
        want = {i for i, v in enumerate(vals) if lo <= v <= hi}
        assert {r["i"] for r in out} == want

    def test_one_sided_and_nulls(self):
        from vector_ray.stages.quantile import quantile_band_filter

        t = pa.table({"v": pa.array([1.0, None, 3.0, 9.0, 5.0]),
                      "i": pa.array(range(5), pa.int64())})
        out = quantile_band_filter(ds_of(t), "v", hi_q=0.5).take_all()
        # quantile_disc(0.5) over 4 non-nulls -> rank 2 -> 3.0
        assert sorted(r["i"] for r in out) == [0, 2]
        import pytest as _pt
        with _pt.raises(ValueError):
            quantile_band_filter(ds_of(t), "v")


class TestMadOutlierFilter:
    def test_matches_brute_force(self):
        import math

        from vector_ray.stages.quantile import mad_outlier_filter

        np = __import__("numpy")
        rng = np.random.default_rng(11)
        vals = np.concatenate([rng.normal(100, 5, 2_000),
                               rng.normal(100, 400, 50)])  # heavy tail
        t = pa.table({"v": pa.array(vals, pa.float64()),
                      "i": pa.array(range(len(vals)), pa.int64())})
        out = mad_outlier_filter(ds_of(t, blocks=5), "v", k=3.0).take_all()

        def disc(xs, p):
            s = sorted(xs)
            return s[max(1, math.ceil(p * len(s))) - 1]

        med = disc(vals, 0.5)
        mad = disc([abs(v - med) for v in vals], 0.5)
        want = {i for i, v in enumerate(vals) if abs(v - med) <= 3.0 * mad}
        got = {r["i"] for r in out}
        assert got == want
        assert 0 < len(got) < len(vals)

        inv = mad_outlier_filter(ds_of(t, blocks=5), "v", k=3.0,
                                 keep="outlier").take_all()
        assert {r["i"] for r in inv} == set(range(len(vals))) - want

    def test_nulls_never_pass(self):
        from vector_ray.stages.quantile import mad_outlier_filter

        t = pa.table({"v": pa.array([1.0, None, 1.0, 1.0, 50.0]),
                      "i": pa.array(range(5), pa.int64())})
        out = mad_outlier_filter(ds_of(t), "v", k=3.0).take_all()
        ids = sorted(r["i"] for r in out)
        assert 1 not in ids  # null dropped
        assert 4 not in ids  # outlier vs MAD=0 band
        out2 = mad_outlier_filter(ds_of(t), "v", k=3.0,
                                  keep="outlier").take_all()
        assert sorted(r["i"] for r in out2) == [4]  # null still dropped


class TestExactQuantiles:
    def test_matches_numpy_rank(self):
        from vector_ray.stages.quantile import exact_quantiles

        rng = __import__("numpy").random.default_rng(7)
        vals = rng.normal(0, 100, 10_001)
        t = pa.table({"v": pa.array(vals, pa.float64())})
        got = exact_quantiles(ds_of(t, blocks=5), "v", [0.5, 0.9, 0.99])
        import math

        s = sorted(vals)
        want = [s[max(1, math.ceil(p * len(s))) - 1] for p in (0.5, 0.9, 0.99)]
        assert got == want

    def test_refinement_path_and_ties(self):
        # tiny cap forces bin refinement; heavy ties + nulls exercised
        from vector_ray.stages.quantile import exact_quantiles
        import numpy as np

        vals = np.concatenate([np.full(5000, 42.0), np.arange(5000, dtype=np.float64)])
        arr = pa.array(list(vals) + [None], pa.float64())
        t = pa.table({"v": arr})
        got = exact_quantiles(ds_of(t, blocks=4), "v", [0.5, 0.99], cap=100, bins=16)
        import math

        s = sorted(vals)
        want = [s[max(1, math.ceil(p * len(s))) - 1] for p in (0.5, 0.99)]
        assert got == want

    def test_all_equal_and_empty(self):
        from vector_ray.stages.quantile import exact_quantiles

        t = pa.table({"v": pa.array([7.0] * 100)})
        assert exact_quantiles(ds_of(t), "v", [0.5, 0.99]) == [7.0, 7.0]
        te = pa.table({"v": pa.array([], pa.float64())})
        assert exact_quantiles(ds_of(te, blocks=1), "v", [0.5]) == [None]

    def test_grouped_exact_quantiles(self):
        import math

        import numpy as np

        from vector_ray.stages.quantile import grouped_exact_quantiles

        rng = np.random.default_rng(11)
        keys = [f"k{i % 3}" for i in range(6000)]
        vals = rng.normal(0, 50, 6000)
        t = pa.table({"k": keys, "v": pa.array(vals, pa.float64())})
        out = grouped_exact_quantiles(ds_of(t, blocks=5), "k", "v", [0.5, 0.99])
        got = {r["k"]: (r["p50"], r["p99"]) for r in out.to_pylist()}
        for kv in ("k0", "k1", "k2"):
            s = sorted(v for k2, v in zip(keys, vals) if k2 == kv)
            want = tuple(s[max(1, math.ceil(p * len(s))) - 1] for p in (0.5, 0.99))
            assert got[kv] == want

    def test_grouped_quantiles_high_cardinality(self):
        # 10^5 distinct keys: exercises the distributed candidate-bin and
        # selection path; driver holds only O(keys × ps) small rows
        import numpy as np

        from vector_ray.stages.quantile import grouped_exact_quantiles

        n_keys = 100_000
        rng = np.random.default_rng(5)
        # 3 values per key: quantile_disc p50 = middle value
        kcol = np.repeat(np.arange(n_keys), 3)
        vals = rng.normal(0, 10, n_keys * 3)
        t = pa.table({"k": pa.array([f"s{k:06d}" for k in kcol]),
                      "v": pa.array(vals, pa.float64())})
        out = grouped_exact_quantiles(ds_of(t, blocks=8), "k", "v", [0.5])
        assert len(out) == n_keys
        got = {r["k"]: r["p50"] for r in out.to_pylist()}
        # spot-check 50 keys against the exact middle value
        for k in range(0, n_keys, 2000):
            s = sorted(vals[3 * k : 3 * k + 3])
            assert got[f"s{k:06d}"] == s[1]

    def test_grouped_quantiles_max_keys_enforced(self):
        import pytest as _pytest

        from vector_ray.stages.quantile import grouped_exact_quantiles

        t = pa.table({"k": [f"k{i}" for i in range(100)],
                      "v": pa.array([float(i) for i in range(100)], pa.float64())})
        with _pytest.raises(ValueError, match="max_keys"):
            grouped_exact_quantiles(ds_of(t, blocks=2), "k", "v", [0.5], max_keys=10)

    def test_grouped_quantiles_fallback_path(self):
        # cap=10 forces the over-cap per-key refinement fallback
        import math

        import numpy as np

        from vector_ray.stages.quantile import grouped_exact_quantiles

        vals = np.concatenate([np.full(500, 3.0), np.arange(500, dtype=np.float64)])
        t = pa.table({"k": ["a"] * 1000, "v": pa.array(vals, pa.float64())})
        out = grouped_exact_quantiles(ds_of(t, blocks=3), "k", "v", [0.5], bins=4, cap=10)
        s = sorted(vals)
        assert out.to_pylist()[0]["p50"] == s[max(1, math.ceil(0.5 * len(s))) - 1]


class TestWindowAndTopk:
    def test_hopping_window_membership(self):
        import numpy as np

        from vector_ray.stages.window import HoppingWindow

        # ts in seconds-as-us: size 10s, hop 5s → each event in 2 windows
        ts = pa.array(np.array([0, 4, 5, 9, 10, 14], dtype="int64") * 1_000_000,
                      pa.timestamp("us"))
        t = pa.table({"k": ["a"] * 6, "ts": ts, "v": [1.0] * 6})
        hw = HoppingWindow(["k"], "ts", 10.0, 5.0, {"n": ("count", "v")})
        rows = {(r["k"], r["window_start"]): r["n"] for r in hw.apply(ds_of(t, blocks=2)).take_all()}
        # windows (start in us): -5s:{0,4}, 0:{0,4,5,9}, 5s:{5,9,10,14}, 10s:{10,14}
        assert rows[("a", -5_000_000)] == 2
        assert rows[("a", 0)] == 4
        assert rows[("a", 5_000_000)] == 4
        assert rows[("a", 10_000_000)] == 2

    def test_grouped_topk_matches_sort(self):
        import numpy as np

        from vector_ray.stages.topk import grouped_topk

        np = __import__("numpy")
        rng = np.random.default_rng(3)
        n = 5000
        t = pa.table({
            "k": [f"g{i % 4}" for i in range(n)],
            "score": rng.integers(0, 1000, n).tolist(),
            "id": list(range(n)),
        })
        out = grouped_topk(ds_of(t, blocks=6), ["k"], "score", 5, tiebreak="id").take_all()
        got = {}
        for r in out:
            got.setdefault(r["k"], []).append((r["score"], r["id"]))
        rows = list(zip(t["k"].to_pylist(), t["score"].to_pylist(), t["id"].to_pylist()))
        for kv in ("g0", "g1", "g2", "g3"):
            want = sorted(((s, i) for k2, s, i in rows if k2 == kv),
                          key=lambda x: (-x[0], x[1]))[:5]
            assert sorted(got[kv], key=lambda x: (-x[0], x[1])) == want


class TestSessionWindowBucketed:
    def _mk(self, n=4000, seed=9):
        import numpy as np

        rng = np.random.default_rng(seed)
        # bursty inter-arrival times so sessions frequently CROSS the
        # coarse bucket boundary (the merge-phase correctness case)
        gaps = rng.choice([1, 2, 5, 40], size=n, p=[0.5, 0.3, 0.1, 0.1])
        ts = np.cumsum(gaps) * 1_000_000
        keys = [f"u{i % 7}" for i in range(n)]
        return pa.table({
            "k": keys,
            "ts": pa.array(ts, pa.timestamp("us")),
            "v": rng.integers(0, 100, n).tolist(),
        })

    def test_bucketed_equals_single_group(self):
        from vector_ray.stages.window import SessionWindow

        t = self._mk()
        aggs = {"n": ("count", "v"), "vs": ("sum", "v"),
                "vmin": ("min", "v"), "vmax": ("max", "v")}
        a = SessionWindow(["k"], "ts", 10.0, aggs, mode="bucketed", bucket_s=60.0)
        b = SessionWindow(["k"], "ts", 10.0, aggs, mode="group")
        ra = sorted(map(tuple, (r.values() for r in
                    (dict(x) for x in a.apply(ds_of(t, blocks=5)).take_all()))))
        rb = sorted(map(tuple, (r.values() for r in
                    (dict(x) for x in b.apply(ds_of(t, blocks=5)).take_all()))))
        assert ra == rb

    def test_session_spanning_many_buckets(self):
        # continuous activity: ONE session crossing dozens of buckets —
        # the chain-merge in phase 2 must collapse it
        import numpy as np

        from vector_ray.stages.window import SessionWindow

        ts = np.arange(5000, dtype=np.int64) * 1_000_000  # 1s apart, gap 10s
        t = pa.table({"k": ["hot"] * 5000, "ts": pa.array(ts, pa.timestamp("us")),
                      "v": [1] * 5000})
        sw = SessionWindow(["k"], "ts", 10.0, {"n": ("count", "v")},
                           mode="bucketed", bucket_s=30.0)
        rows = sw.apply(ds_of(t, blocks=4)).take_all()
        assert len(rows) == 1
        assert rows[0]["n"] == 5000 and rows[0]["session_id"] == 1


class TestReduceFastPath:
    def _data(self, n=4000, keys=37):
        import numpy as np

        rng = np.random.default_rng(8)
        order = rng.permutation(n)  # unique order values → deterministic
        return pa.table({
            "k": pa.array([f"req{i % keys}" for i in range(n)]),
            "seq": pa.array(order, pa.int64()),
            "bytes": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "msg": pa.array([f"m{i}" for i in range(n)]),
            "code": pa.array([None if i % 11 == 0 else int(i % 7) for i in range(n)],
                             pa.int64()),
        })

    def test_matches_general_path(self):
        t = self._data()
        strategies = {"bytes": "sum", "msg": "retain", "code": "max"}
        fast = Reduce(["k"], merge_strategies=strategies, order_by="seq")
        assert fast._fast_eligible()
        general = Reduce(["k"], merge_strategies=strategies, order_by="seq",
                         salted=False)
        a = {r["k"]: r for r in fast.apply(ds_of(t, blocks=5)).take_all()}
        b = {r["k"]: r for r in general.apply(ds_of(t, blocks=5)).take_all()}
        assert set(a) == set(b)
        for k in a:
            for col in ("bytes", "msg", "code", "seq", "n_rows"):
                assert a[k][col] == b[k][col], (k, col, a[k][col], b[k][col])

    def test_discard_default_and_null_first_row(self):
        # default strategy (discard) keeps the value at MIN order even
        # when that value is null (skip_nulls=False semantics)
        t = pa.table({"k": ["a", "a", "b"], "seq": [2, 1, 5],
                      "v": pa.array([10, None, 7], pa.int64())})
        r = Reduce(["k"], order_by="seq")
        assert r._fast_eligible()
        out = {x["k"]: x for x in r.apply(ds_of(t, blocks=2)).take_all()}
        assert out["a"]["v"] is None  # seq=1 row has null v
        assert out["a"]["n_rows"] == 2
        assert out["b"]["v"] == 7

    def test_ineligible_configs_fall_back(self):
        r1 = Reduce(["k"], merge_strategies={"v": "concat"}, order_by="seq")
        assert not r1._fast_eligible()
        r2 = Reduce(["k"], order_by=None)
        assert not r2._fast_eligible()
        r3 = Reduce(["k"], order_by="seq", ends_when=C.eq("done", True))
        assert not r3._fast_eligible()


class TestWindowPreEpoch:
    def test_tumbling_floors_negative_timestamps(self):
        import ray.data as rd
        from vector_ray.stages.window import TumblingWindow

        t = pa.table({
            "k": pa.array(["a"] * 5),
            "ts": pa.array([-1, -10_000_000, -10_000_001, 9_999_999, 10_000_000],
                           pa.int64()),
            "v": pa.array([1.0] * 5),
        })
        out = TumblingWindow(["k"], "ts", 10.0, {"n": ("count", "v")}) \
            .apply(rd.from_arrow(t)).take_all()
        got = {r["window_start"]: r["n"] for r in out}
        # floor semantics: -1 and -10s belong to [-10s, 0); -10.000001s
        # to [-20s, -10s); 9.999999s to [0, 10s); 10s to [10s, 20s)
        assert got == {-10_000_000: 2, -20_000_000: 1, 0: 1, 10_000_000: 1}


class TestRollup:
    def test_levels_and_values(self):
        import ray.data as rd

        from vector_ray.stages.rollup import rollup_aggregate

        t = pa.table({
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", None],
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        })
        out = rollup_aggregate(rd.from_arrow(t).repartition(3),
                               ["a", "b"], {
            "n": ("count", "v"),
            "s": ("sum", "v"),
            "mx": ("max", "v"),
            "m": ("mean", "v"),
        }).take_all()
        by = {(r["a"], r["b"], r["grouping_level"]): r for r in out}
        assert by[("x", "p", 2)]["s"] == 1
        assert by[("y", "p", 2)]["s"] == 7 and by[("y", "p", 2)]["n"] == 2
        # genuine null key at level 2 vs rollup null at level 1
        assert by[("y", None, 2)]["s"] == 5
        assert by[("y", None, 1)]["s"] == 12 and by[("y", None, 1)]["mx"] == 5
        assert by[("x", None, 1)]["s"] == 3
        assert by[(None, None, 0)]["s"] == 15
        assert by[(None, None, 0)]["m"] == 3.0
        assert len(out) == 4 + 2 + 1

    def test_distributed_path_matches_local(self):
        import ray.data as rd

        from vector_ray.stages.rollup import rollup_aggregate

        t = pa.table({
            "a": ["x", "x", "y", "y", "y", "z"],
            "b": ["p", "q", "p", "p", None, "q"],
            "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        })
        specs = {"n": ("count", "v"), "s": ("sum", "v"),
                 "mx": ("max", "v"), "m": ("mean", "v")}

        def norm(rows):
            return sorted(
                ((r["a"], r["b"], r["grouping_level"], r["n"], r["s"],
                  r["mx"], r["m"]) for r in rows),
                key=str,
            )

        loc = rollup_aggregate(rd.from_arrow(t).repartition(3),
                               ["a", "b"], specs).take_all()
        dist = rollup_aggregate(rd.from_arrow(t).repartition(3),
                                ["a", "b"], specs,
                                local_threshold=0).take_all()
        assert norm(loc) == norm(dist)


class TestGroupingSets:
    def _table(self):
        return pa.table({
            "a": ["x", "x", "y", "y", "y", "z"],
            "b": ["p", "q", "p", "p", None, "q"],
            "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        })

    def test_cube_all_subsets(self):
        import ray.data as rd

        from vector_ray.stages.rollup import cube_aggregate

        out = cube_aggregate(rd.from_arrow(self._table()).repartition(3),
                             ["a", "b"], {"s": ("sum", "v")}).take_all()
        by = {(r["a"], r["b"], r["grouping_id"]): r["s"] for r in out}
        assert by[("x", "p", 0)] == 1          # (a,b)
        assert by[("y", None, 0)] == 5         # genuine null b
        assert by[("y", None, 1)] == 12        # b aggregated away
        assert by[(None, "p", 2)] == 8         # a aggregated away
        assert by[(None, None, 3)] == 21       # grand total
        # (a,b): 5 combos; (a): 3; (b): p,q,NULL=3; (): 1
        assert len(out) == 5 + 3 + 3 + 1

    def test_explicit_sets_and_distributed_path(self):
        import ray.data as rd

        from vector_ray.stages.rollup import grouping_sets_aggregate

        sets = [["a", "b"], ["b"], []]
        specs = {"s": ("sum", "v"), "m": ("mean", "v")}

        def run(thresh):
            rows = grouping_sets_aggregate(
                rd.from_arrow(self._table()).repartition(3),
                ["a", "b"], sets, specs, local_threshold=thresh,
            ).take_all()
            return sorted(((r["a"], r["b"], r["grouping_id"], r["s"],
                            r["m"]) for r in rows), key=str)

        loc = run(1_000_000)
        assert loc == run(0)
        gids = {g for (_, _, g, _, _) in loc}
        assert gids == {0, 2, 3}

    def test_rejects_non_subset(self):
        import pytest as _pt
        import ray.data as rd

        from vector_ray.stages.rollup import grouping_sets_aggregate

        with _pt.raises(ValueError):
            grouping_sets_aggregate(
                rd.from_arrow(self._table()), ["a"], [["a", "b"]],
                {"s": ("sum", "v")})


class TestPartitionedShift:
    def test_lag_lead_cumsum_rownum(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        t = pa.table({
            "k": ["a", "a", "a", "b", "b"],
            "o": pa.array([3, 1, 2, 10, 5], pa.int64()),
            "v": pa.array([30.0, 10.0, 20.0, 100.0, 50.0]),
        })
        out = partitioned_shift(rd.from_arrow(t).repartition(3),
                                ["k"], ["o"], {
            "prev": ("lag", "v"),
            "nxt": ("lead", "v"),
            "d": ("delta", "v"),
            "cs": ("cumsum", "o"),
            "rn": ("row_number", "o"),
        }).take_all()
        by = {(r["k"], r["o"]): r for r in out}
        assert by[("a", 1)]["prev"] is None and by[("a", 1)]["rn"] == 1
        assert by[("a", 2)]["prev"] == 10.0 and by[("a", 2)]["nxt"] == 30.0
        assert by[("a", 3)]["nxt"] is None and by[("a", 3)]["rn"] == 3
        assert by[("a", 3)]["d"] == 10.0 and by[("a", 1)]["d"] is None
        assert by[("a", 3)]["cs"] == 6
        assert by[("b", 5)]["prev"] is None and by[("b", 10)]["prev"] == 50.0
        assert by[("b", 10)]["cs"] == 15 and by[("b", 10)]["rn"] == 2

    def test_rank_tie_semantics(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        # key a order values: 1, 2, 2, 4  (tie at 2); key b: single row
        t = pa.table({
            "k": ["a", "a", "a", "a", "b"],
            "o": pa.array([2, 1, 4, 2, 7], pa.int64()),
            "i": pa.array([0, 1, 2, 3, 4], pa.int64()),
        })
        out = partitioned_shift(rd.from_arrow(t).repartition(2),
                                ["k"], ["o"], {
            "rnk": ("rank", None),
            "drnk": ("dense_rank", None),
            "prnk": ("percent_rank", None),
        }).take_all()
        by = {(r["k"], r["o"], r["i"]): r for r in out}
        assert by[("a", 1, 1)]["rnk"] == 1
        assert by[("a", 2, 0)]["rnk"] == 2 and by[("a", 2, 3)]["rnk"] == 2
        assert by[("a", 4, 2)]["rnk"] == 4        # gap after the tie
        assert by[("a", 4, 2)]["drnk"] == 3       # dense: no gap
        assert by[("a", 1, 1)]["prnk"] == 0.0
        assert by[("a", 4, 2)]["prnk"] == 1.0
        assert by[("a", 2, 0)]["prnk"] == (2 - 1) / 3
        assert by[("b", 7, 4)]["rnk"] == 1 and by[("b", 7, 4)]["prnk"] == 0.0

    def test_cume_dist_and_nth_value(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        # key a order values 1, 2, 2, 4 (tie), key b single row
        t = pa.table({
            "k": ["a", "a", "a", "a", "b"],
            "o": pa.array([2, 1, 4, 2, 7], pa.int64()),
            "v": pa.array([20.0, 10.0, 40.0, 21.0, 70.0]),
            "i": pa.array([0, 1, 2, 3, 4], pa.int64()),
        })
        out = partitioned_shift(rd.from_arrow(t).repartition(2),
                                ["k"], ["o"], {
            "cd": ("cume_dist", None),
            "nv2": ("nth_value", "v", 2),
            "nv5": ("nth_value", "v", 5),
        }).take_all()
        by = {(r["k"], r["o"], r["i"]): r for r in out}
        assert by[("a", 1, 1)]["cd"] == 1 / 4
        # both tie rows share cume_dist = rows-with-value<=2 / 4 = 3/4
        assert by[("a", 2, 0)]["cd"] == 3 / 4
        assert by[("a", 2, 3)]["cd"] == 3 / 4
        assert by[("a", 4, 2)]["cd"] == 1.0
        assert by[("b", 7, 4)]["cd"] == 1.0
        # nth_value(2): second row in order (one of the o=2 ties —
        # deterministic because the sort is stable on the sorted table)
        assert by[("a", 1, 1)]["nv2"] in (20.0, 21.0)
        assert by[("a", 1, 1)]["nv2"] == by[("a", 4, 2)]["nv2"]
        assert by[("b", 7, 4)]["nv2"] is None    # partition too small
        assert by[("a", 1, 1)]["nv5"] is None

    def test_broadcast_cross_join(self):
        import ray.data as rd

        from vector_ray.stages.join import broadcast_cross_join

        left = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
        right = pa.table({"y": pa.array([10, 20], pa.int64())})
        # unfiltered product
        out = broadcast_cross_join(
            rd.from_arrow(left).repartition(2), right).to_pandas()
        assert sorted(zip(out["x"], out["y"])) == [
            (1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20)]
        # theta predicate + tiny product chunking
        out2 = broadcast_cross_join(
            rd.from_arrow(left), right,
            predicate=lambda t: pc.greater(pc.multiply(t["x"], 10), t["y"]),
            max_product_rows=2).to_pandas()
        assert sorted(zip(out2["x"], out2["y"])) == [
            (2, 10), (3, 10), (3, 20)]
        # guards
        with pytest.raises(ValueError):
            broadcast_cross_join(rd.from_arrow(left), right,
                                 max_broadcast_rows=1)
        with pytest.raises(ValueError):
            broadcast_cross_join(rd.from_arrow(left),
                                 pa.table({"x": pa.array([1])}))

    def test_rolling_range_window_with_peers(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        # key a times: 0, 10, 10 (peers), 25, 100 ; win = 20
        t = pa.table({
            "k": ["a"] * 5 + ["b"],
            "o": pa.array([0, 10, 10, 25, 100, 7], pa.int64()),
            "v": pa.array([1, 2, 4, 8, 16, 32], pa.int64()),
            "i": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        })
        out = partitioned_shift(rd.from_arrow(t).repartition(2),
                                ["k"], ["o"], {
            "c": ("rolling_count_range", None, 20),
            "s": ("rolling_sum_range", "v", 20),
        }).take_all()
        by = {(r["k"], r["i"]): (r["c"], r["s"]) for r in out}
        # o=0: frame [-20, 0] -> itself
        assert by[("a", 0)] == (1, 1)
        # o=10 peers: frame [-10, 10] includes BOTH peers (ANSI rule)
        assert by[("a", 1)] == (3, 7)
        assert by[("a", 2)] == (3, 7)
        # o=25: frame [5, 25] -> the two 10s and itself
        assert by[("a", 3)] == (3, 14)
        # o=100: frame [80, 100] -> itself only
        assert by[("a", 4)] == (1, 16)
        assert by[("b", 5)] == (1, 32)

    def test_asof_tolerance(self):
        import pandas as pd
        import ray.data as rd

        from vector_ray.stages.join import asof_join

        left = pa.table({
            "k": ["u", "u", "u"],
            "t": pa.array([10, 20, 100], pa.int64()),
        })
        right = pa.table({
            "k": ["u", "u"],
            "t": pa.array([8, 15], pa.int64()),
            "val": pa.array([1.0, 2.0]),
        })
        out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                        by=["k"], on="t", tolerance=10,
                        buckets=2).to_pandas().sort_values("t")
        vals = [None if pd.isna(x) else x for x in out["val"]]
        # t=10 matches 8 (gap 2), t=20 matches 15 (gap 5),
        # t=100's candidate 15 is outside tolerance 10 -> null
        assert vals == [1.0, 2.0, None]

    def test_ntile_first_last(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        t = pa.table({
            "k": ["a"] * 5 + ["b"],
            "o": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 90.0]),
        })
        out = partitioned_shift(rd.from_arrow(t).repartition(2),
                                ["k"], ["o"], {
            "t2": ("ntile", None, 2),
            "t3": ("ntile", None, 3),
            "fv": ("first_value", "v"),
            "lv": ("last_value", "v"),
        }).take_all()
        by = {(r["k"], r["o"]): r for r in out}
        # 5 rows / NTILE(2) -> sizes 3,2 ; NTILE(3) -> 2,2,1
        assert [by[("a", i)]["t2"] for i in range(1, 6)] == [1, 1, 1, 2, 2]
        assert [by[("a", i)]["t3"] for i in range(1, 6)] == [1, 1, 2, 2, 3]
        assert by[("a", 3)]["fv"] == 10.0 and by[("a", 3)]["lv"] == 50.0
        assert by[("b", 9)]["t3"] == 1
        assert by[("b", 9)]["fv"] == 90.0 and by[("b", 9)]["lv"] == 90.0

    def test_single_rows_and_one_key(self):
        import ray.data as rd

        from vector_ray.stages.shift import partitioned_shift

        t = pa.table({"k": ["x"], "o": pa.array([1], pa.int64()),
                      "v": pa.array([5.0])})
        out = partitioned_shift(rd.from_arrow(t), ["k"], ["o"],
                                {"prev": ("lag", "v")}).take_all()
        assert out[0]["prev"] is None


class TestPivot:
    def test_pivot_sum_and_mean(self):
        import ray.data as rd

        from vector_ray.stages.pivot import pivot

        t = pa.table({
            "k": ["a", "a", "b", "a"],
            "c": ["x", "y", "x", "x"],
            "v": pa.array([1, 2, 3, 5], pa.int64()),
        })
        out = pivot(rd.from_arrow(t).repartition(2), ["k"], "c", "v",
                    agg="sum").take_all()
        by = {r["k"]: r for r in out}
        assert by["a"]["x"] == 6 and by["a"]["y"] == 2
        assert by["b"]["x"] == 3 and by["b"]["y"] is None

    def test_pivot_max_columns_guard(self):
        import pytest as _pytest
        import ray.data as rd

        from vector_ray.stages.pivot import pivot

        t = pa.table({"k": ["a"] * 10, "c": [str(i) for i in range(10)],
                      "v": pa.array(range(10), pa.int64())})
        with _pytest.raises(ValueError, match="max_columns"):
            pivot(rd.from_arrow(t), ["k"], "c", "v", max_columns=5)

    def test_unpivot_roundtrip_counts(self):
        import ray.data as rd

        from vector_ray.stages.pivot import unpivot

        t = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "p": pa.array([1.5, 2.5]),
                      "q": pa.array([10, 20], pa.int64())})
        out = unpivot(rd.from_arrow(t), ["id"], ["p", "q"]).take_all()
        assert len(out) == 4
        by = {(r["id"], r["name"]): r["value"] for r in out}
        assert by[(1, "p")] == 1.5 and by[(2, "q")] == 20.0


class TestUnionAlign:
    def test_pads_and_widens(self):
        import ray.data as rd

        from vector_ray.stages.align import union_align

        a = rd.from_arrow(pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "x": pa.array([1.0, 2.0], pa.float32()),
        }))
        b = rd.from_arrow(pa.table({
            "id": pa.array([3], pa.int64()),
            "x": pa.array([3.5], pa.float64()),
            "y": pa.array(["s"]),
        }))
        out = union_align(a, b)
        sch = out.schema()
        assert dict(zip(sch.names, sch.types)) == {
            "id": pa.int64(), "x": pa.float64(), "y": pa.string()}
        rows = sorted(out.take_all(), key=lambda r: r["id"])
        assert rows[0]["x"] == 1.0 and rows[0]["y"] is None
        assert rows[2]["x"] == 3.5 and rows[2]["y"] == "s"

    def test_type_conflict_raises(self):
        import pytest as _pytest
        import ray.data as rd

        from vector_ray.stages.align import union_align

        a = rd.from_arrow(pa.table({"v": pa.array([1], pa.int64())}))
        b = rd.from_arrow(pa.table({"v": pa.array(["x"])}))
        with _pytest.raises(TypeError, match="cannot unify"):
            union_align(a, b)


def test_rolling_sum_clamps_at_key_start(ray_session=None):
    import ray.data as rd

    from vector_ray.stages.shift import partitioned_shift

    t = pa.table({"k": ["a"] * 5 + ["b"] * 2,
                  "o": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50, 7, 9], pa.int64())})
    out = partitioned_shift(rd.from_arrow(t).repartition(2), ["k"], ["o"],
                            {"r3": ("rolling_sum", "v", 3)}).take_all()
    got = {(r["k"], r["o"]): r["r3"] for r in out}
    assert got[("a", 1)] == 10 and got[("a", 2)] == 30
    assert got[("a", 3)] == 60 and got[("a", 4)] == 90
    assert got[("a", 5)] == 120
    assert got[("b", 1)] == 7 and got[("b", 2)] == 16


class TestResample:
    US = 1_000_000

    def _ds(self, parts=2):
        rows = [("a", 0.5, 1.0), ("a", 0.7, 2.0), ("a", 2.3, 4.0),
                ("b", 5.5, 8.0)]
        t = pa.table({
            "k": pa.array([r[0] for r in rows]),
            "ts": pa.array([int(r[1] * self.US) for r in rows],
                           pa.timestamp("us")),
            "v": pa.array([r[2] for r in rows]),
        })
        return rd.from_arrow(t).repartition(parts)

    def _run(self, fill, parts=2):
        from vector_ray.stages.window import resample

        out = resample(self._ds(parts), "ts", 1.0,
                       {"n": ("count", "v"), "vmax": ("max", "v")},
                       keys=["k"], fill=fill).to_pandas()
        def norm(x):
            return None if x is None or (isinstance(x, float) and x != x) \
                else float(x)
        return {(r.k, int(r.window_start) // self.US):
                (norm(r.n), norm(r.vmax)) for r in out.itertuples()}

    def test_null_zero_ffill_and_partition_invariance(self):
        assert self._run("null") == {
            ("a", 0): (2.0, 2.0), ("a", 1): (None, None),
            ("a", 2): (1.0, 4.0), ("b", 5): (1.0, 8.0)}
        assert self._run("zero") == {
            ("a", 0): (2.0, 2.0), ("a", 1): (0.0, 0.0),
            ("a", 2): (1.0, 4.0), ("b", 5): (1.0, 8.0)}
        for parts in (1, 4):
            assert self._run("ffill", parts) == {
                ("a", 0): (2.0, 2.0), ("a", 1): (2.0, 2.0),
                ("a", 2): (1.0, 4.0), ("b", 5): (1.0, 8.0)}

    def test_global_grid_no_keys(self):
        from vector_ray.stages.window import resample

        out = resample(self._ds(), "ts", 1.0, {"n": ("count", "v")},
                       fill="zero").to_pandas()
        g = dict(zip(out["window_start"] // self.US, out["n"]))
        assert g == {0: 2, 1: 0, 2: 1, 3: 0, 4: 0, 5: 1}

    def test_max_grid_guard(self):
        from vector_ray.stages.window import resample

        with pytest.raises(Exception, match="max_grid"):
            resample(self._ds(), "ts", 1.0, {"n": ("count", "v")},
                     keys=["k"], max_grid=2).to_pandas()


class TestProfile:
    def test_mixed_types_nulls_and_big_ints(self):
        from vector_ray.stages.profile import profile

        t = pa.table({
            "i": pa.array([5, None, 2**60, -3], pa.int64()),
            "f": pa.array([1.5, 2.25, None, -0.5], pa.float64()),
            "s": pa.array(["10", "9", None, "abc"]),
            "b": pa.array([True, False, True, None]),
            "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "lst": pa.array([[1], [2], [3], None], pa.list_(pa.int32())),
        })
        out = (profile(rd.from_arrow(t).repartition(3)).to_pandas()
               .set_index("column"))
        assert set(out.index) == {"i", "f", "s", "b", "ts", "lst"}
        assert (out["cnt"] == 4).all()
        # int64 min/max exact beyond 2^53 (typed channel, no float hop)
        assert out.loc["i", "min"] == "-3"
        assert out.loc["i", "max"] == str(2**60)
        # string min/max compare as strings, not numbers
        assert out.loc["s", "min"] == "10" and out.loc["s", "max"] == "abc"
        assert out.loc["f", "mean"] == (1.5 + 2.25 - 0.5) / 3
        assert out.loc["lst", "nulls"] == 1 and out.loc["lst", "min"] is None
        assert out.loc["b", "sum"] == 2.0

    def test_partition_invariance(self):
        from vector_ray.stages.profile import profile

        t = pa.table({"x": pa.array(list(range(100)), pa.int64())})
        a = profile(rd.from_arrow(t).repartition(1)).to_pandas()
        b = profile(rd.from_arrow(t).repartition(7)).to_pandas()
        assert a.to_dict() == b.to_dict()


class TestFfillShift:
    def test_ffill_resets_at_key_boundaries(self):
        from vector_ray.stages.shift import partitioned_shift

        t = pa.table({
            "k": pa.array(["a", "a", "a", "b", "b"]),
            "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
            "v": pa.array([None, 5.0, None, None, 7.0], pa.float64()),
        })
        out = (partitioned_shift(rd.from_arrow(t).repartition(3),
                                 ["k"], ["o"], {"f": ("ffill", "v")})
               .to_pandas().sort_values(["k", "o"]))
        import math
        got = [None if isinstance(x, float) and math.isnan(x) else x
               for x in out["f"]]
        # 'b' must NOT inherit a's 5.0
        assert got == [None, 5.0, 5.0, None, 7.0]


class TestVarStdAggregate:
    def test_var_std_matches_numpy_and_partition_invariant(self):
        from vector_ray.stages.aggregate import grouped_aggregate

        rng = list(range(40))
        t = pa.table({
            "k": pa.array(["a" if i % 2 else "b" for i in rng]),
            "v": pa.array([float((i * 7) % 13) for i in rng]),
        })
        want = {}
        import numpy as np
        for k in ("a", "b"):
            xs = np.array([float((i * 7) % 13) for i in rng
                           if ("a" if i % 2 else "b") == k])
            want[k] = ((xs.sum() ** 2 / len(xs) * -1 + (xs ** 2).sum())
                       / (len(xs) - 1))
        for parts in (1, 5):
            out = grouped_aggregate(
                rd.from_arrow(t).repartition(parts), ["k"],
                {"v_var": ("var", "v"), "v_std": ("std", "v")}).to_pandas()
            got = dict(zip(out["k"], out["v_var"]))
            gstd = dict(zip(out["k"], out["v_std"]))
            for k in ("a", "b"):
                assert got[k] == want[k], (parts, k)
                assert gstd[k] == want[k] ** 0.5

    def test_var_single_row_group_is_null(self):
        from vector_ray.stages.aggregate import grouped_aggregate

        t = pa.table({"k": pa.array(["x", "y", "y"]),
                      "v": pa.array([1.0, 2.0, 4.0])})
        out = grouped_aggregate(rd.from_arrow(t), ["k"],
                                {"v_var": ("var", "v")}).to_pandas()
        m = dict(zip(out["k"], out["v_var"]))
        assert m["x"] != m["x"] or m["x"] is None  # NaN/null for n=1
        assert m["y"] == 2.0


class TestCovCorrAggregate:
    def test_matches_numpy_pairwise_nulls_partition_invariant(self):
        import numpy as np

        from vector_ray.stages.aggregate import grouped_aggregate

        xs = [1.0, 2.0, None, 4.0, 5.0, 6.0]
        ys = [2.0, 4.0, 5.0, None, 11.0, 10.0]
        t = pa.table({"k": pa.array(["g"] * 6),
                      "x": pa.array(xs, pa.float64()),
                      "y": pa.array(ys, pa.float64())})
        m = [(a, b) for a, b in zip(xs, ys)
             if a is not None and b is not None]
        ax = np.array([a for a, _ in m])
        ay = np.array([b for _, b in m])
        want_cov = ((ax * ay).sum() - ax.sum() * ay.sum() / len(m)) \
            / (len(m) - 1)
        vx = (ax * ax).sum() - ax.sum() ** 2 / len(m)
        vy = (ay * ay).sum() - ay.sum() ** 2 / len(m)
        want_corr = ((ax * ay).sum() - ax.sum() * ay.sum() / len(m)) \
            / (vx * vy) ** 0.5
        for parts in (1, 3):
            out = grouped_aggregate(
                rd.from_arrow(t).repartition(parts), ["k"],
                {"c": ("cov", "x", "y"),
                 "r": ("corr", "x", "y")}).to_pandas()
            assert out.loc[0, "c"] == want_cov, parts
            assert abs(out.loc[0, "r"] - want_corr) < 1e-12, parts

    def test_slope_intercept_match_polyfit(self):
        import numpy as np

        from vector_ray.stages.aggregate import grouped_aggregate

        rng = np.random.default_rng(7)
        x = rng.integers(0, 50, 200).astype(float)
        y = 3.0 * x + 5.0 + rng.integers(-4, 5, 200)
        t = pa.table({"k": pa.array(["g"] * 200),
                      "x": pa.array(x), "y": pa.array(y)})
        for parts in (1, 4):
            out = grouped_aggregate(
                rd.from_arrow(t).repartition(parts), ["k"],
                {"m": ("slope", "x", "y"),
                 "b": ("intercept", "x", "y")}).to_pandas()
            m_ref, b_ref = np.polyfit(x, y, 1)
            assert abs(out.loc[0, "m"] - m_ref) < 1e-9, parts
            assert abs(out.loc[0, "b"] - b_ref) < 1e-9, parts

    def test_slope_degenerate_x_is_null(self):
        import math

        from vector_ray.stages.aggregate import grouped_aggregate

        t = pa.table({"k": pa.array(["a"] * 3 + ["b"]),
                      "x": pa.array([2.0, 2.0, 2.0, 1.0]),
                      "y": pa.array([1.0, 2.0, 3.0, 4.0])})
        out = grouped_aggregate(rd.from_arrow(t), ["k"], {
            "m": ("slope", "x", "y"),
            "b": ("intercept", "x", "y"),
        }).to_pandas().set_index("k")
        # constant x and single-row groups both have zero x-variance
        assert math.isnan(out.loc["a", "m"]) and math.isnan(out.loc["a", "b"])
        assert math.isnan(out.loc["b", "m"]) and math.isnan(out.loc["b", "b"])


def test_bfill_resets_at_key_boundaries(ray_session=None):
    from vector_ray.stages.shift import partitioned_shift

    t = pa.table({
        "k": pa.array(["a", "a", "a", "b", "b"]),
        "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
        "v": pa.array([None, 5.0, None, 7.0, None], pa.float64()),
    })
    out = (partitioned_shift(rd.from_arrow(t).repartition(3),
                             ["k"], ["o"], {"f": ("bfill", "v")})
           .to_pandas().sort_values(["k", "o"]))
    import math
    got = [None if isinstance(x, float) and math.isnan(x) else x
           for x in out["f"]]
    # a's trailing null must NOT inherit b's 7.0
    assert got == [5.0, 5.0, None, 7.0, None]


class TestSnapshotDiff:
    def test_added_removed_changed_and_partition_invariant(self):
        from vector_ray.stages.diff import snapshot_diff

        old = pa.table({"doc_id": pa.array([1, 2, 3, 5], pa.int64()),
                        "text": pa.array(["a", "b", "c", "e"])})
        new = pa.table({"doc_id": pa.array([2, 3, 4, 5], pa.int64()),
                        "text": pa.array(["b", "cc", "d", "e"])})
        want = {1: "removed", 3: "changed", 4: "added"}
        for pa_, pb in ((1, 1), (3, 2)):
            out = snapshot_diff(
                rd.from_arrow(old).repartition(pa_),
                rd.from_arrow(new).repartition(pb)).to_pandas()
            got = dict(zip(out["doc_id"], out["status"]))
            assert got == want, (pa_, pb)

    def test_fp_col_passthrough(self):
        from vector_ray.stages.diff import snapshot_diff

        old = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "fp": pa.array([10, 20], pa.int64())})
        new = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                        "fp": pa.array([10, 21], pa.int64())})
        out = snapshot_diff(rd.from_arrow(old), rd.from_arrow(new),
                            fp_col="fp").to_pandas()
        assert dict(zip(out["doc_id"], out["status"])) == {2: "changed"}


class TestAudit:
    def test_all_rule_kinds(self):
        from vector_ray.stages.expect import audit

        t = pa.table({
            "id": pa.array([1, 2, 2, 3, None], pa.int64()),
            "lang": pa.array(["en", "xx", None, "de", "en"]),
            "n": pa.array([5, 50, 500, 5000, None], pa.int64()),
            "src": pa.array(["a1", "b2", "a3", "zz", "a4"]),
        })
        out = audit(rd.from_arrow(t).repartition(3), [
            ("id_uniq", "unique", "id"),
            ("lang_nn", "not_null", "lang"),
            ("lang_set", "in_set", "lang", ["en", "de"]),
            ("n_range", "range", "n", 10, 1000),
            ("src_re", "regex", "src", r"^a"),
        ]).to_pandas().set_index("rule")
        # id: 4 non-null, 3 distinct -> 1 duplicate
        assert (out.loc["id_uniq", "checked"],
                out.loc["id_uniq", "violations"]) == (4, 1)
        assert (out.loc["lang_nn", "checked"],
                out.loc["lang_nn", "violations"]) == (5, 1)
        assert (out.loc["lang_set", "checked"],
                out.loc["lang_set", "violations"]) == (4, 1)
        # n: 4 non-null; 5 and 5000 outside [10, 1000]
        assert (out.loc["n_range", "checked"],
                out.loc["n_range", "violations"]) == (4, 2)
        # src: b2 and zz don't match ^a
        assert (out.loc["src_re", "checked"],
                out.loc["src_re", "violations"]) == (5, 2)

    def test_duplicate_rule_names_rejected(self):
        from vector_ray.stages.expect import audit

        t = pa.table({"x": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            audit(rd.from_arrow(t), [("r", "not_null", "x"),
                                     ("r", "unique", "x")])

    def test_empty_dataset(self):
        from vector_ray.stages.expect import audit

        t = pa.table({"x": pa.array([], pa.int64())})
        out = audit(rd.from_arrow(t), [("nn", "not_null", "x"),
                                       ("uq", "unique", "x")]).to_pandas()
        assert list(out["checked"]) == [0, 0]
        assert list(out["violations"]) == [0, 0]


class TestApplyChangeset:
    BASE = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                     "text": pa.array(["a", "b", "c", "d"])})
    CH = pa.table({"doc_id": pa.array([2, 3, 9], pa.int64()),
                   "text": pa.array(["B2", None, "new"]),
                   "op": pa.array(["U", "D", "I"])})

    def test_delete_upsert_insert_both_modes(self):
        from vector_ray.stages.diff import apply_changeset

        for mode in ("broadcast", "bucketed"):
            out = apply_changeset(
                rd.from_arrow(self.BASE).repartition(2),
                rd.from_arrow(self.CH).repartition(2),
                id_col="doc_id", mode=mode).to_pandas()
            got = dict(zip(out["doc_id"], out["text"]))
            assert got == {1: "a", 2: "B2", 4: "d", 9: "new"}, mode
            assert list(out.columns) == ["doc_id", "text"]

    def test_broadcast_guard(self):
        from vector_ray.stages.diff import apply_changeset

        with pytest.raises(ValueError):
            apply_changeset(
                rd.from_arrow(self.BASE), rd.from_arrow(self.CH),
                id_col="doc_id", max_broadcast_rows=2,
            ).to_pandas()

    def test_divergent_block_schemas_union_cleanly(self):
        # r3 driver regression: a changeset block whose literal column
        # came out null-typed (zero-match filter + untyped pa.array)
        # made kept.union(upserts) fail on block-schema mismatch.
        # surviving() must cast every block to the base schema.
        from vector_ray.stages.diff import apply_changeset

        base = pa.table({
            "doc_id": pa.array(range(1, 33), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(1, 33)]),
        })
        ch_good = pa.table({
            "doc_id": pa.array([2], pa.int64()),
            "text": pa.array(["B2"], pa.string()),
            "op": pa.array(["U"], pa.string()),
        })
        # null-typed text AND op columns (what an untyped empty /
        # all-None literal produces)
        ch_bad = pa.table({
            "doc_id": pa.array([5], pa.int64()),
            "text": pa.array([None]),
            "op": pa.array([None]),
        })
        changes = rd.from_arrow([ch_good, ch_bad])
        for mode in ("broadcast", "bucketed"):
            out = apply_changeset(
                rd.from_arrow(base).repartition(8), changes,
                id_col="doc_id", mode=mode).to_pandas()
            got = dict(zip(out["doc_id"], out["text"]))
            assert got[2] == "B2" and got[5] is None, mode
            assert len(out) == 32, mode

    def test_roundtrip_with_snapshot_diff_payload(self):
        # apply_changeset(old, changes) == new when changes carries the
        # new payload for added/changed ids and D rows for removed ids
        from vector_ray.stages.diff import apply_changeset

        old = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                        "text": pa.array(["a", "b", "c"])})
        new = pa.table({"doc_id": pa.array([2, 3, 4], pa.int64()),
                        "text": pa.array(["b", "C!", "d"])})
        ch = pa.table({"doc_id": pa.array([1, 3, 4], pa.int64()),
                       "text": pa.array([None, "C!", "d"]),
                       "op": pa.array(["D", "U", "I"])})
        out = apply_changeset(rd.from_arrow(old), rd.from_arrow(ch),
                              id_col="doc_id").to_pandas()
        got = sorted(zip(out["doc_id"], out["text"]))
        assert got == sorted(zip(new["doc_id"].to_pylist(),
                                 new["text"].to_pylist()))


class TestGroupedMode:
    def test_ties_to_smallest_and_partition_invariant(self):
        from vector_ray.stages.aggregate import grouped_mode

        t = pa.table({"k": pa.array(["a"] * 5 + ["b"] * 4),
                      "v": pa.array(["x", "y", "y", "z", "x",
                                     "q", "q", "r", "r"])})
        for parts in (1, 4):
            out = grouped_mode(rd.from_arrow(t).repartition(parts),
                               ["k"], "v").to_pandas()
            assert dict(zip(out["k"], out["mode"])) == {"a": "x", "b": "q"}


class TestNewOpsDegenerateInputs:
    """sf0.001-style tiny/empty inputs must not crash any late-round op."""

    def test_profile_empty_dataset(self):
        from vector_ray.stages.profile import profile

        t = pa.table({"x": pa.array([], pa.int64()),
                      "s": pa.array([], pa.string())})
        out = profile(rd.from_arrow(t)).to_pandas()
        assert set(out["column"]) == {"x", "s"}
        assert (out["cnt"] == 0).all()

    def test_resample_single_row(self):
        from vector_ray.stages.window import resample

        t = pa.table({"ts": pa.array([123], pa.timestamp("us")),
                      "v": pa.array([1.0])})
        out = resample(rd.from_arrow(t), "ts", 1.0,
                       {"n": ("count", "v")}, fill="zero").to_pandas()
        assert len(out) == 1 and out.loc[0, "n"] == 1

    def test_pagerank_empty_edges(self):
        from vector_ray.ml.graph import pagerank

        t = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
        out = pagerank(rd.from_arrow(t), iters=2).to_pandas()
        assert len(out) == 0

    def test_line_dedup_all_empty_docs(self):
        from vector_ray.ml.clean import line_dedup

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["", ""])})
        out = (line_dedup(rd.from_arrow(t)).to_pandas()
               .sort_values("doc_id"))
        assert list(out["text_line_dedup"]) == ["", ""]
        ex = line_dedup(rd.from_arrow(t), output="explode").to_pandas()
        assert len(ex) == 0

    def test_bpe_train_empty_corpus(self):
        from vector_ray.ml.bpe import bpe_train

        t = pa.table({"text": pa.array(["", ""])})
        merges, types = bpe_train(rd.from_arrow(t), "text", num_merges=4)
        assert len(merges) == 0

    def test_snapshot_diff_identical(self):
        from vector_ray.stages.diff import snapshot_diff

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a", "b"])})
        out = snapshot_diff(rd.from_arrow(t), rd.from_arrow(t)).to_pandas()
        assert len(out) == 0

    def test_grouped_mode_single_group(self):
        from vector_ray.stages.aggregate import grouped_mode

        t = pa.table({"k": pa.array(["a"]), "v": pa.array(["x"])})
        out = grouped_mode(rd.from_arrow(t), ["k"], "v").to_pandas()
        assert dict(zip(out["k"], out["mode"])) == {"a": "x"}

    def test_range_join_empty_intervals(self):
        from vector_ray.stages.join import range_join

        pts = pa.table({"k": pa.array(["a"]), "p": pa.array([1], pa.int64()),
                        "eid": pa.array([9], pa.int64())})
        iv = pa.table({"k": pa.array([], pa.string()),
                       "lo": pa.array([], pa.int64()),
                       "hi": pa.array([], pa.int64()),
                       "win": pa.array([], pa.int64())})
        out = range_join(rd.from_arrow(pts), rd.from_arrow(iv), by=["k"],
                         point="p", lo="lo", hi="hi", how="left").to_pandas()
        assert len(out) == 1
        inner = range_join(rd.from_arrow(pts), rd.from_arrow(iv), by=["k"],
                           point="p", lo="lo", hi="hi").to_pandas()
        assert len(inner) == 0


def test_wmean_pairwise_nulls_partition_invariant(ray_session=None):
    from vector_ray.stages.aggregate import grouped_aggregate

    t = pa.table({"k": pa.array(["g"] * 5),
                  "x": pa.array([1.0, 2.0, None, 4.0, 8.0], pa.float64()),
                  "w": pa.array([1.0, 3.0, 5.0, None, 2.0], pa.float64())})
    want = (1 * 1 + 2 * 3 + 8 * 2) / (1 + 3 + 2)
    for parts in (1, 3):
        out = grouped_aggregate(rd.from_arrow(t).repartition(parts), ["k"],
                                {"m": ("wmean", "x", "w")}).to_pandas()
        assert out.loc[0, "m"] == want, parts


class TestScd2:
    def _run(self, rows, **kw):
        from vector_ray.stages.diff import scd2

        t = pa.table({
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "state": pa.array([r[2] for r in rows], pa.string())})
        out = scd2(rd.from_arrow(t).repartition(3), id_col="id",
                   ts_col="ts", attr_cols=["state"], **kw).to_pandas()
        return out.sort_values(["id", "valid_from"]).reset_index(drop=True)

    def test_collapse_and_intervals(self):
        rows = [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "b"),
                (1, 50, "a"), (2, 5, "x")]
        out = self._run(rows)
        assert list(out["valid_from"]) == [10, 30, 50, 5]
        assert list(out["state"]) == ["a", "b", "a", "x"]
        # valid_to = next change's ts, open (NaN) on the last version
        assert list(out["valid_to"].fillna(-1)) == [30, 50, -1, -1]
        assert list(out["is_current"]) == [False, False, True, True]

    def test_no_collapse_keeps_every_row(self):
        rows = [(1, 10, "a"), (1, 20, "a"), (1, 30, "a")]
        out = self._run(rows, collapse=False)
        assert len(out) == 3
        assert list(out["valid_to"].fillna(-1)) == [20, 30, -1]

    def test_partition_invariant(self):
        import pandas as pd

        from vector_ray.stages.diff import scd2

        rows = [(i % 7, i * 3 + (i % 7), "s" + str((i * 5) % 3))
                for i in range(200)]
        t = pa.table({
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "state": pa.array([r[2] for r in rows], pa.string())})
        outs = []
        for parts in (1, 8):
            o = scd2(rd.from_arrow(t).repartition(parts), id_col="id",
                     ts_col="ts", attr_cols=["state"]).to_pandas()
            outs.append(o.sort_values(["id", "valid_from"])
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestFeature:
    def test_standardize_nulls_and_invariance(self):
        import pandas as pd

        from vector_ray.stages.feature import standardize

        t = pa.table({"x": pa.array([1.0, 2.0, None, 4.0, 8.0],
                                    pa.float64())})
        outs = []
        for parts in (1, 4):
            o = standardize(rd.from_arrow(t).repartition(parts),
                            ["x"]).to_pandas().sort_values(
                "x", na_position="last").reset_index(drop=True)
            outs.append(o)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        vals = [1.0, 2.0, 4.0, 8.0]
        mu = sum(vals) / 4
        sd = (sum((v - mu) ** 2 for v in vals) / 3) ** 0.5
        got = outs[0].dropna().reset_index(drop=True)
        for i, v in enumerate(vals):
            assert abs(got["x_z"][i] - (v - mu) / sd) < 1e-12
        assert outs[0]["x_z"].isna().sum() == 1

    def test_standardize_zero_variance(self):
        from vector_ray.stages.feature import standardize

        t = pa.table({"x": pa.array([3.0, 3.0, 3.0], pa.float64())})
        o = standardize(rd.from_arrow(t), ["x"]).to_pandas()
        assert o["x_z"].isna().all()

    def test_bucketize_width(self):
        from vector_ray.stages.feature import bucketize

        t = pa.table({"x": pa.array([0.0, 1.0, 4.9, 5.0, 9.99, 10.0],
                                    pa.float64())})
        o = bucketize(rd.from_arrow(t).repartition(2), "x", bins=10,
                      mode="width").to_pandas().sort_values("x")
        assert list(o["x_bin"]) == [0, 1, 4, 5, 9, 9]  # max clips to 9

    def test_bucketize_quantile_ties(self):
        from vector_ray.stages.feature import bucketize

        # heavy tie on the cut value: ties sit in the LOWER bin
        t = pa.table({"x": pa.array([1.0] * 6 + [2.0, 3.0],
                                    pa.float64())})
        o = bucketize(rd.from_arrow(t).repartition(3), "x", bins=4,
                      mode="quantile").to_pandas().sort_values("x")
        b = list(o["x_bin"])
        assert all(v == b[0] for v in b[:6])  # all 1.0s share a bin
        assert b[6] > b[0] and b[7] >= b[6]

    def test_winsorize_clips_at_data_values(self):
        from vector_ray.stages.feature import winsorize

        vals = [float(i) for i in range(1, 101)]
        t = pa.table({"x": pa.array(vals, pa.float64())})
        o = winsorize(rd.from_arrow(t).repartition(3), "x",
                      p_lo=0.10, p_hi=0.90).to_pandas().sort_values("x")
        # quantile_disc rank rule: k = ceil(p*n) -> 10th and 90th values
        assert o["x_w"].min() == 10.0 and o["x_w"].max() == 90.0
        mid = o[(o["x"] > 10) & (o["x"] < 90)]
        assert (mid["x_w"] == mid["x"]).all()


class TestLogTemplates:
    def test_mining_and_invariance(self):
        import pandas as pd

        from vector_ray.stages.templates import log_templates

        lines = (["auth user u%d login ok" % i for i in range(20)]
                 + ["auth user u7 login failed"]
                 + ["db conn pool exhausted"] * 3
                 + ["db conn pool exhausted"]
                 + ["", "   "])
        t = pa.table({"message": pa.array(lines)})
        outs = []
        for parts in (1, 5):
            o = log_templates(rd.from_arrow(t).repartition(parts),
                              "message").to_pandas()
            outs.append(o.sort_values(["n_tok", "t0"])
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        o = outs[0]
        assert list(o["template"]) == [
            "db conn pool exhausted",  # fully constant group
            "auth user <*> login <*>"]
        assert list(o["n_lines"]) == [4, 21]

    def test_max_tokens_truncates(self):
        from vector_ray.stages.templates import log_templates

        lines = ["a " + " ".join(str(i) for i in range(50)),
                 "a " + " ".join(str(i) for i in range(50))]
        t = pa.table({"message": pa.array(lines)})
        o = log_templates(rd.from_arrow(t), "message",
                          max_tokens=4).to_pandas()
        assert len(o) == 1
        assert o["template"][0] == "a 0 1 2"  # positions past cap dropped
        assert o["n_tok"][0] == 51  # group key keeps the true length

    def test_one_hot_nulls_and_cap(self):
        import pytest as _pytest

        from vector_ray.stages.feature import one_hot

        t = pa.table({"c": pa.array(["a", "b", None, "a"], pa.string())})
        o = one_hot(rd.from_arrow(t).repartition(2), "c").to_pandas()
        assert list(o["c_a"]) == [1, 0, 0, 1]
        assert list(o["c_b"]) == [0, 1, 0, 0]
        big = pa.table({"c": pa.array([str(i) for i in range(100)])})
        # the cap fires INSIDE the fit task, so Ray surfaces it as a
        # RayTaskError wrapping the ValueError
        with _pytest.raises(Exception, match="max_categories"):
            one_hot(rd.from_arrow(big), "c", max_categories=10)

    def test_target_encode_smoothing_and_unseen(self):
        from vector_ray.stages.feature import target_encode

        t = pa.table({"c": pa.array(["a", "a", "b", None], pa.string()),
                      "y": pa.array([1.0, 3.0, 10.0, 100.0],
                                    pa.float64())})
        o = target_encode(rd.from_arrow(t).repartition(2), "c", "y",
                          smoothing=0.0).to_pandas()
        gmean = (1 + 3 + 10 + 100) / 4
        got = dict(zip(o["c"].fillna("<null>"), o["c_te"]))
        assert got["a"] == 2.0 and got["b"] == 10.0
        assert got["<null>"] == gmean  # null category -> global mean
        o2 = target_encode(rd.from_arrow(t), "c", "y",
                           smoothing=2.0).to_pandas()
        got2 = dict(zip(o2["c"].fillna("<null>"), o2["c_te"]))
        assert abs(got2["a"] - (4 + 2 * gmean) / 4) < 1e-12

    def test_minmax_scale(self):
        from vector_ray.stages.feature import minmax_scale

        t = pa.table({"x": pa.array([2.0, 4.0, None, 6.0], pa.float64())})
        o = minmax_scale(rd.from_arrow(t).repartition(2),
                         "x").to_pandas().sort_values(
            "x", na_position="last").reset_index(drop=True)
        assert list(o["x_mm"].dropna()) == [0.0, 0.5, 1.0]
        c = pa.table({"x": pa.array([3.0, 3.0], pa.float64())})
        oc = minmax_scale(rd.from_arrow(c), "x").to_pandas()
        assert oc["x_mm"].isna().all()

    def test_robust_scale(self):
        from vector_ray.stages.feature import robust_scale

        vals = [float(i) for i in range(1, 101)]
        t = pa.table({"x": pa.array(vals, pa.float64())})
        o = robust_scale(rd.from_arrow(t).repartition(3),
                         "x").to_pandas().sort_values("x")
        # quantile_disc: q1=25, med=50, q3=75 -> (x-50)/50
        assert o["x_r"].iloc[0] == (1 - 50) / 50
        assert o["x_r"].iloc[-1] == (100 - 50) / 50

    def test_grouped_standardize(self):
        from vector_ray.stages.feature import grouped_standardize

        t = pa.table({"k": pa.array(["a"] * 4 + ["b"] * 2 + ["c"]),
                      "x": pa.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0,
                                     7.0], pa.float64())})
        o = grouped_standardize(rd.from_arrow(t).repartition(3), ["k"],
                                "x").to_pandas()
        a = o[o["k"] == "a"].sort_values("x")
        mu, sd = 2.5, (sum((v - 2.5) ** 2 for v in [1, 2, 3, 4]) / 3) ** 0.5
        assert abs(a["x_z"].iloc[0] - (1 - mu) / sd) < 1e-12
        b = o[o["k"] == "b"].sort_values("x")
        assert abs(b["x_z"].iloc[1] - (20 - 15) / (50 ** 0.5)) < 1e-9
        assert o.loc[o["k"] == "c", "x_z"].isna().all()  # single row

    def test_grouped_standardize_bool_and_null_keys(self):
        # ADVICE r3: str(k) fit-vocab vs Arrow cast probe disagreed on
        # boolean keys ('True' vs 'true') and a null-key group matched
        # rows whose string key is literally 'None'. Both must z-score
        # against their OWN group now.
        from vector_ray.stages.feature import grouped_standardize

        t = pa.table({"k": pa.array([True, True, False, False],
                                    pa.bool_()),
                      "x": pa.array([1.0, 3.0, 10.0, 30.0])})
        o = grouped_standardize(rd.from_arrow(t).repartition(2), ["k"],
                                "x").to_pandas()
        tr = o[o["k"] == True].sort_values("x")  # noqa: E712
        sd = (((1 - 2) ** 2 + (3 - 2) ** 2) / 1) ** 0.5
        assert abs(tr["x_z"].iloc[0] - (1 - 2) / sd) < 1e-12

        t2 = pa.table({"k": pa.array([None, None, "None", "None"],
                                     pa.string()),
                       "x": pa.array([1.0, 3.0, 100.0, 300.0])})
        o2 = grouped_standardize(rd.from_arrow(t2).repartition(2),
                                 ["k"], "x").to_pandas()
        nullg = o2[o2["k"].isna()].sort_values("x")
        litg = o2[o2["k"] == "None"].sort_values("x")
        sdn = (((1 - 2) ** 2 + (3 - 2) ** 2) / 1) ** 0.5
        sdl = (((100 - 200) ** 2 + (300 - 200) ** 2) / 1) ** 0.5
        assert abs(nullg["x_z"].iloc[0] - (1 - 2) / sdn) < 1e-12
        assert abs(litg["x_z"].iloc[0] - (100 - 200) / sdl) < 1e-12

    def test_target_encode_all_null_category(self):
        # ADVICE r3: a category whose target values are ALL null made
        # the smoothed mean TypeError (None + float)
        from vector_ray.stages.feature import target_encode

        t = pa.table({"c": pa.array(["a", "a", "b", "b"]),
                      "y": pa.array([1.0, 3.0, None, None])})
        o = target_encode(rd.from_arrow(t).repartition(2), "c", "y",
                          smoothing=2.0).to_pandas()
        gmean = 2.0
        enc_b = (0.0 + 2.0 * gmean) / (0 + 2.0)
        assert abs(o.loc[o["c"] == "b", "c_te"].iloc[0] - enc_b) < 1e-12
        enc_a = (4.0 + 2.0 * gmean) / (2 + 2.0)
        assert abs(o.loc[o["c"] == "a", "c_te"].iloc[0] - enc_a) < 1e-12

    def test_robust_scale_winsorize_all_null(self):
        # ADVICE r3: all-null column crashed on None cut points; must
        # degrade to an all-null output like minmax_scale
        from vector_ray.stages.feature import robust_scale, winsorize

        t = pa.table({"x": pa.array([None, None], pa.float64())})
        o = robust_scale(rd.from_arrow(t), "x").to_pandas()
        assert o["x_r"].isna().all()
        o2 = winsorize(rd.from_arrow(t), "x").to_pandas()
        assert o2["x_w"].isna().all()

    def test_semantic_join_exact_mode_rejects_truncation(self):
        import numpy as np

        from vector_ray.ml.ann import semantic_join

        rng = np.random.default_rng(7)
        n, d = 40, 8
        t = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [rng.standard_normal(d).tolist() for _ in range(n)],
                pa.list_(pa.float32()))})
        ds = rd.from_arrow(t)
        with pytest.raises(Exception, match="max_cluster"):
            semantic_join(ds, ds, k=3, n_clusters=1, n_probe=None,
                          max_cluster=10).to_pandas()
        # approximate path still truncates (warns, no raise)
        out = semantic_join(ds, ds, k=3, n_clusters=1, n_probe=1,
                            max_cluster=10).to_pandas()
        assert len(out) > 0
