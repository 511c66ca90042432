"""Config-topology tests: load/validate/graph/run + the `vector test`
behavior harness (mirrors tests/behavior/transforms/*.toml)."""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.pipelines.config import (
    ConfigError,
    Topology,
    build_condition,
    graph,
    load_config,
    run_unit_tests,
    validate,
)

CFG = {
    "sources": {"in": {"type": "generator", "format": "apache", "count": 200}},
    "transforms": {
        "parsed": {
            "type": "regex_parser",
            "inputs": ["in"],
            "field": "message",
            "patterns": [
                r'^(?P<host>[\w.]+) - (?P<user>[\w-]+) \[(?P<timestamp>.*)\] "(?P<method>\w+) (?P<path>.*)" (?P<status>\d+) (?P<bytes_out>\d+)$'
            ],
            "types": {"status": "int", "bytes_out": "int"},
        },
        "routed": {
            "type": "route",
            "inputs": ["parsed"],
            "route": {
                "errors": {"field": "status", "op": "gte", "value": 500},
                "gets": {"field": "method", "op": "eq", "value": "GET"},
            },
            "unmatched_lane": "rest",
        },
    },
    "sinks": {
        "err_sink": {"type": "memory", "inputs": ["routed.errors"]},
        "all_sink": {"type": "blackhole", "inputs": ["parsed"]},
    },
}


class TestValidate:
    def test_valid(self):
        assert validate(CFG) == []

    def test_unknown_type(self):
        bad = {"sources": {"s": {"type": "parquet", "path": "x"}},
               "transforms": {"t": {"type": "nope", "inputs": ["s"]}}, "sinks": {}}
        with pytest.raises(ConfigError):
            validate(bad)

    def test_unknown_input(self):
        bad = {"sources": {"s": {"type": "parquet", "path": "x"}},
               "transforms": {"t": {"type": "filter", "inputs": ["ghost"],
                                    "condition": {"field": "x", "op": "eq", "value": 1}}},
               "sinks": {}}
        with pytest.raises(ConfigError):
            validate(bad)

    def test_cycle(self):
        bad = {"sources": {"s": {"type": "parquet", "path": "x"}},
               "transforms": {
                   "a": {"type": "remove_fields", "inputs": ["b"], "fields": ["x"]},
                   "b": {"type": "remove_fields", "inputs": ["a"], "fields": ["x"]},
               }, "sinks": {}}
        with pytest.raises(ConfigError):
            validate(bad)

    def test_graph_dot(self):
        dot = graph(CFG)
        assert '"in" -> "parsed"' in dot
        assert '"parsed" -> "routed"' in dot


class TestRun:
    def test_run_sinks(self):
        topo = Topology(CFG)
        results = topo.run()
        assert results["all_sink"] == 200
        errs = results["err_sink"]
        assert (errs["status"] >= 500).all()

    def test_yaml_load(self):
        yaml_text = """
sources:
  g: {type: generator, format: json, count: 50}
transforms:
  parsed:
    type: json_parser
    inputs: [g]
sinks:
  out: {type: memory, inputs: [parsed]}
"""
        topo = load_config(yaml_text)
        out = topo.run()["out"]
        assert len(out) == 50
        assert "status" in out.columns

    def test_compound_macro(self):
        cfg = {
            "sources": {"g": {"type": "generator", "format": "json", "count": 30}},
            "transforms": {
                "pipe": {
                    "type": "compound",
                    "inputs": ["g"],
                    "steps": [
                        {"type": "json_parser"},
                        {"type": "add_fields", "fields": {"tagged": "yes"}},
                        {"type": "remove_fields", "fields": ["row_id"]},
                    ],
                }
            },
            "sinks": {"out": {"type": "memory", "inputs": ["pipe"]}},
        }
        out = Topology(cfg).run()["out"]
        assert (out["tagged"] == "yes").all()
        assert "row_id" not in out.columns

    def test_fan_in_union(self):
        cfg = {
            "sources": {
                "a": {"type": "generator", "format": "json", "count": 10},
                "b": {"type": "generator", "format": "json", "count": 20},
            },
            "transforms": {
                "both": {"type": "json_parser", "inputs": ["a", "b"]},
            },
            "sinks": {"n": {"type": "blackhole", "inputs": ["both"]}},
        }
        assert Topology(cfg).run()["n"] == 30


class TestUnitHarness:
    def test_behavior_style(self):
        # mirrors tests/behavior/transforms/route.toml structure
        tests = [
            {
                "name": "error routing",
                "input": {
                    "insert_at": "parsed",
                    "rows": [
                        {"message": 'h - u [t] "GET /a" 500 1'},
                        {"message": 'h - u [t] "POST /b" 200 2'},
                    ],
                },
                "outputs": [
                    {
                        "extract_from": "routed.errors",
                        "n_rows": 1,
                        "conditions": [{"field": "status", "op": "gte", "value": 500}],
                    },
                    {"extract_from": "routed.gets", "n_rows": 1},
                ],
            },
            {
                "name": "no errors lane when all 2xx",
                "input": {
                    "insert_at": "parsed",
                    "rows": [{"message": 'h - u [t] "PUT /a" 200 9'}],
                },
                "no_outputs_from": ["routed.errors", "routed.gets"],
            },
        ]
        results = run_unit_tests(CFG, tests)
        assert all(r["passed"] for r in results), results

    def test_failing_assertion_reported(self):
        tests = [
            {
                "name": "wrong expectation",
                "input": {"insert_at": "parsed",
                          "rows": [{"message": 'h - u [t] "GET /a" 500 1'}]},
                "outputs": [
                    {"extract_from": "routed.errors",
                     "conditions": [{"field": "status", "op": "lt", "value": 100}]}
                ],
            }
        ]
        results = run_unit_tests(CFG, tests)
        assert not results[0]["passed"]


class TestConditionSpecs:
    def test_nested(self):
        t = pa.table({"x": [1, 5, 9], "s": ["a", "ab", "b"]})
        cond = build_condition(
            {"any": [
                {"all": [{"field": "x", "op": "gte", "value": 5},
                         {"field": "s", "op": "prefix", "value": "a"}]},
                {"not": {"field": "x", "op": "gt", "value": 2}},
            ]}
        )
        assert cond(t).to_pylist() == [True, True, False]


class TestTimePartitionedSink:
    def test_strftime_partitioning(self, tmp_path):
        import glob
        import pyarrow as pa

        out = str(tmp_path / "out")
        cfg = {
            "sources": {"ev": {"type": "parquet", "path": "/root/testdata/sf0.001/events.parquet"}},
            "transforms": {},
            "sinks": {
                "by_day": {
                    "type": "parquet",
                    "inputs": ["ev"],
                    "path": out,
                    "partition_by_time": {"field": "ts", "format": "%Y-%m-%d"},
                }
            },
        }
        Topology(cfg).run()
        days = glob.glob(out + "/dt=*")
        assert len(days) > 1, days
        # every directory name is a valid date
        import re

        assert all(re.match(r".*dt=\d{4}-\d{2}-\d{2}$", d) for d in days)


class TestInsertAtBypassesUpstream:
    def test_injection_is_direct(self):
        # rows that the upstream filter would drop must still reach the
        # insert_at node (unit_test.rs injects AT the node, not upstream)
        cfg = {
            "sources": {"g": {"type": "generator", "format": "json", "count": 5}},
            "transforms": {
                "parsed": {"type": "json_parser", "inputs": ["g"]},
                "only_errors": {
                    "type": "filter", "inputs": ["parsed"],
                    "condition": {"field": "status", "op": "gte", "value": 500},
                },
                "tagged": {
                    "type": "add_fields", "inputs": ["only_errors"],
                    "fields": {"seen": "yes"},
                },
            },
            "sinks": {"out": {"type": "blackhole", "inputs": ["tagged"]}},
        }
        tests = [
            {
                "name": "rows bypass the error filter",
                "input": {"insert_at": "tagged", "rows": [{"status": 200}]},
                "outputs": [
                    {"extract_from": "tagged", "n_rows": 1,
                     "conditions": [{"field": "seen", "op": "eq", "value": "yes"}]}
                ],
            }
        ]
        results = run_unit_tests(cfg, tests)
        assert all(r["passed"] for r in results), results


class TestCurationTransforms:
    def test_semantic_dedup_and_lm_score_registered(self):
        import numpy as np
        import ray.data as rd

        from vector_ray.pipelines.config import TRANSFORMS

        rng = np.random.default_rng(2)
        m = rng.normal(size=(60, 8)).astype(np.float32)
        emb = pa.table({
            "vec_id": pa.array(list(range(60)) + [9000, 9001], pa.int64()),
            "embedding": pa.array(list(np.concatenate([m, m[:2]])),
                                  pa.list_(pa.float32())),
        })
        sd = TRANSFORMS["semantic_dedup"]({"n_clusters": 4, "sample_size": 128})
        out = sd.apply(rd.from_arrow(emb).repartition(3)).take_all()
        keep = {r["vec_id"]: r["keep"] for r in out}
        assert not keep[9000] and not keep[9001] and keep[0] and keep[1]

        docs = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(["hello world this is doc %d" % i for i in range(30)]),
        })
        lm = TRANSFORMS["lm_score"]({"sample_mod": 2})
        rows = lm.apply(rd.from_arrow(docs).repartition(2)).take_all()
        assert len(rows) == 30
        assert all(r["n_tri"] > 0 and r["nll_micro"] > 0 for r in rows)


def test_registered_knn_graph_and_byte_entropy(ray_session):
    import numpy as np
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    rng = np.random.default_rng(4)
    m = rng.normal(size=(40, 8)).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    kg = TRANSFORMS["knn_graph"]({"k": 3, "n_clusters": 2,
                                  "sample_size": 64})
    out = kg.apply(rd.from_arrow(emb).repartition(2)).take_all()
    assert len(out) == 40 * 3
    assert all(r["src"] != r["dst"] for r in out)

    be = TRANSFORMS["byte_entropy"]({})
    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["aaaa", "abcd"])})
    rows = be.transform(docs)
    assert rows["ent_micro"].to_pylist()[0] == 0
    assert rows["ent_micro"].to_pylist()[1] > 0


def test_registered_reshape_transforms(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    def build_transform(cfg):
        return TRANSFORMS[cfg["type"]](cfg)

    t = pa.table({"k": ["a", "a", "b"], "c": ["x", "y", "x"],
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    piv = build_transform({"type": "pivot", "keys": ["k"], "column": "c",
                           "value": "v", "agg": "sum"}).apply(ds)
    by = {r["k"]: r for r in piv.take_all()}
    assert by["a"]["x"] == 1 and by["a"]["y"] == 2 and by["b"]["y"] is None
    roll = build_transform({"type": "rollup", "keys": ["k"],
                            "aggs": {"s": ["sum", "v"]}}).apply(ds)
    rows = {(r["k"], r["grouping_level"]): r["s"] for r in roll.take_all()}
    assert rows[(None, 0)] == 6 and rows[("a", 1)] == 3
    sh = build_transform({"type": "window_shift", "keys": ["k"],
                          "order_by": ["v"],
                          "columns": {"prev": ["lag", "v"]}}).apply(ds)
    got = {(r["k"], r["v"]): r["prev"] for r in sh.take_all()}
    assert got[("a", 1)] is None and got[("a", 2)] == 1


def test_registered_nb_classify_transform(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    t = pa.table({
        "text": pa.array(["goal match team", "code server bug",
                          "goal team score", "bug deploy cache",
                          "match league goal", "server cache code"]),
        "lab": pa.array(["sport", "tech", "sport", "tech", None, None]),
    })
    ds = rd.from_arrow(t).repartition(2)
    out = TRANSFORMS["nb_classify"](
        {"type": "nb_classify", "label": "lab",
         "train_filter": {"exists": "lab"}}
    ).apply(ds)
    rows = out.take_all()
    by_text = {r["text"]: r["nb_pred"] for r in rows}
    assert by_text["match league goal"] == "sport"
    assert by_text["server cache code"] == "tech"
    assert all("nb_score_sport" in r and "nb_score_tech" in r
               for r in rows)


def test_registered_cube_and_dsir_transforms(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    def build_transform(cfg):
        return TRANSFORMS[cfg["type"]](cfg)

    t = pa.table({"k": ["a", "a", "b"], "c": ["x", "y", "x"],
                  "v": pa.array([1, 2, 3], pa.int64())})
    ds = rd.from_arrow(t)
    cube = build_transform({"type": "cube", "keys": ["k", "c"],
                            "aggs": {"s": ["sum", "v"]}}).apply(ds)
    by = {(r["k"], r["c"], r["grouping_id"]): r["s"]
          for r in cube.take_all()}
    assert by[("a", "x", 0)] == 1 and by[("a", None, 1)] == 3
    assert by[(None, "x", 2)] == 4 and by[(None, None, 3)] == 6

    gsets = build_transform({"type": "cube", "keys": ["k", "c"],
                             "sets": [["k"], []],
                             "aggs": {"s": ["sum", "v"]}}).apply(ds)
    gids = {r["grouping_id"] for r in gsets.take_all()}
    assert gids == {1, 3}

    # dsir_score: target = the 'a' docs; their vocab should score high
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": ["apple banana apple", "banana apple fruit",
                 "car truck wheel", "wheel truck engine",
                 "apple fruit banana", "truck engine car"],
    })
    tgt_path = str(tmp_path / "target.parquet")
    pq.write_table(docs.slice(0, 2), tgt_path)
    scored = build_transform({"type": "dsir_score",
                              "target": tgt_path}).apply(
        rd.from_arrow(docs).repartition(2))
    got = {r["doc_id"]: r["dsir_logw"] for r in scored.take_all()}
    fruity = [got[0], got[1], got[4]]
    autoish = [got[2], got[3], got[5]]
    assert min(fruity) > max(autoish)


def test_registered_minhash_dedup_transform(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    rng = np.random.default_rng(1)
    vocab = [f"w{j}" for j in range(500)]
    texts = [" ".join(vocab[x] for x in rng.integers(0, 500, 40))
             for _ in range(40)]
    texts += [texts[0], texts[1] + " extra"]  # dup of 0, near-dup of 1
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = TRANSFORMS["minhash_dedup"]({"type": "minhash_dedup"}).apply(
        rd.from_arrow(t).repartition(3))
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == list(range(40))


def test_registered_line_dedup_transform(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    texts = ["banner\nkeep one", "banner\nkeep two", "solo doc"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": texts})
    out = TRANSFORMS["line_dedup"]({"type": "line_dedup"}).apply(
        rd.from_arrow(t).repartition(2))
    got = {r["doc_id"]: r["text_line_dedup"] for r in out.take_all()}
    assert got == {0: "keep one", 1: "keep two", 2: "solo doc"}


def test_registered_bpe_train_transform(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    t = pa.table({"text": pa.array(["aa ab aa", "ab aa aa"])})
    out = TRANSFORMS["bpe_train"](
        {"type": "bpe_train", "num_merges": 2}).apply(
        rd.from_arrow(t).repartition(2))
    rows = sorted((r["merge_idx"], r["a"], r["b"], r["new_id"])
                  for r in out.take_all())
    # 'aa' freq 4, 'ab' freq 2 -> first merge (97,97); 'aa'->[256],
    # 'ab' stays (97,98) -> second merge (97,98)
    assert rows == [(0, 97, 97, 256), (1, 97, 98, 257)]


def test_registered_grouped_mode_transform(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.pipelines.config import TRANSFORMS

    t = pa.table({"k": pa.array(["a", "a", "b"]),
                  "v": pa.array(["x", "x", "y"])})
    out = TRANSFORMS["grouped_mode"](
        {"type": "grouped_mode", "keys": ["k"], "field": "v"}).apply(
        rd.from_arrow(t).repartition(2))
    assert {r["k"]: r["mode"] for r in out.take_all()} == {"a": "x", "b": "y"}


class TestIntervalJoinTransform:
    def test_tag_union_split_overlap(self):
        # two tagged span branches from one source union into the
        # transform; overlap pairs come back with suffixed right cols
        cfg = {
            "sources": {
                "ev": {"type": "parquet",
                       "path": "/root/testdata/sf0.001/events.parquet",
                       "columns": ["event_id", "ts", "user_id"]},
            },
            "transforms": {
                "a_side": {
                    "type": "remap", "inputs": ["ev"],
                    "ops": [{"fn": "set", "field": "side",
                             "value": "left"}],
                },
                "b_side": {
                    "type": "remap", "inputs": ["ev"],
                    "ops": [{"fn": "set", "field": "side",
                             "value": "right"}],
                },
            },
            "sinks": {},
        }
        import pyarrow as pa
        import pyarrow.compute as pc

        topo = Topology(cfg)

        def widen(t):
            s = pc.cast(t["ts"], pa.int64())
            return pa.table({
                "user_id": t["user_id"], "side": t["side"],
                "s": s, "e": pc.add(s, 7_200_000_000)})

        left = topo.node_dataset("a_side").map_batches(
            widen, batch_format="pyarrow")
        right = topo.node_dataset("b_side").map_batches(
            widen, batch_format="pyarrow")
        from vector_ray.pipelines.config import TRANSFORMS

        step = TRANSFORMS["interval_join"]({
            "keys": "user_id", "start_col": "s", "end_col": "e",
            "chunk": 14_400_000_000, "side_field": "side",
            "right_value": "right",
        })
        out = step.apply(left.union(right)).take_all()
        assert out, "expected at least one overlapping span pair"
        row = out[0]
        assert {"user_id", "s", "e", "s_r", "e_r"} <= set(row.keys())
        assert row["s"] <= row["e_r"] and row["s_r"] <= row["e"]


class TestJoinNode:
    """`join` — the one config node whose fan-in is NOT a union:
    inputs[0] ⋈ inputs[1] (bucketed or broadcast)."""

    @staticmethod
    def _write(tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        lp = str(tmp_path / "l.parquet")
        rp = str(tmp_path / "r.parquet")
        pq.write_table(pa.table({
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        }), lp)
        pq.write_table(pa.table({
            "k": pa.array([2, 3, 5], pa.int64()),
            "tag": pa.array(["b", "c", "e"], pa.string()),
        }), rp)
        return lp, rp

    def _cfg(self, lp, rp, **join_extra):
        return {
            "sources": {
                "l": {"type": "parquet", "path": lp},
                "r": {"type": "parquet", "path": rp},
            },
            "transforms": {
                "j": {"type": "join", "inputs": ["l", "r"], "on": ["k"],
                      **join_extra},
            },
            "sinks": {"out": {"type": "blackhole", "inputs": ["j"]}},
        }

    def test_bucketed_inner(self, tmp_path):
        from vector_ray.pipelines.config import Topology

        lp, rp = self._write(tmp_path)
        topo = Topology(self._cfg(lp, rp))
        rows = sorted((r["k"], r["v"], r["tag"]) for r in
                      topo.node_dataset("j").take_all())
        assert rows == [(2, 20.0, "b"), (3, 30.0, "c")]

    def test_broadcast_left(self, tmp_path):
        from vector_ray.pipelines.config import Topology

        lp, rp = self._write(tmp_path)
        topo = Topology(self._cfg(lp, rp, mode="broadcast", how="left"))
        rows = {r["k"]: r["tag"] for r in topo.node_dataset("j").take_all()}
        assert rows == {1: None, 2: "b", 3: "c", 4: None}

    def test_validate_rejects_bad_join(self, tmp_path):
        from vector_ray.pipelines.config import ConfigError, validate

        lp, rp = self._write(tmp_path)
        cfg = self._cfg(lp, rp)
        del cfg["transforms"]["j"]["on"]
        with pytest.raises(ConfigError):
            validate(cfg)
        cfg2 = self._cfg(lp, rp)
        cfg2["transforms"]["j"]["inputs"] = ["l"]
        with pytest.raises(ConfigError):
            validate(cfg2)

    def test_explain_labels_join(self, tmp_path):
        from vector_ray.pipelines.config import explain

        lp, rp = self._write(tmp_path)
        assert "partitioned hash join" in explain(self._cfg(lp, rp))
        assert "broadcast right side" in explain(
            self._cfg(lp, rp, mode="broadcast"))

    def test_yaml_bare_on_key_normalizes(self, tmp_path):
        """YAML 1.1 parses a bare `on:` mapping key as boolean True —
        the join validator folds it back to 'on'."""
        from vector_ray.pipelines.config import Topology

        lp, rp = self._write(tmp_path)
        cfg = self._cfg(lp, rp)
        cfg["transforms"]["j"][True] = cfg["transforms"]["j"].pop("on")
        topo = Topology(cfg)
        rows = sorted(r["k"] for r in topo.node_dataset("j").take_all())
        assert rows == [2, 3]
