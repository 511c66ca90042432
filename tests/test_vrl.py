"""expr/vrl.py — VRL-source parser/compiler: expressions, masks,
conditional del, coalesce, stdlib dispatch, compile-time errors, the
remap `source:` config shape, and the .vrl CLI path."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from vector_ray.expr.vrl import VrlError, compile_vrl, parse_vrl


def _t():
    return pa.table({
        "event_type": pa.array(["click", "purchase", None, "view"]),
        "value": pa.array([10.0, 80.0, None, 55.0]),
        "props": pa.array(['{"a":1}', '{"b":2}', None, "{}"]),
    })


class TestCompile:
    def test_headline_program(self):
        out = compile_vrl("""
            # full shape: assign, arith, if/else-if/else, ??, del
            .sev = upcase(.event_type)
            .score = .value * 2.0 + 1.0
            if .value > 75.0 { .band = "high" }
            else if .value > 25.0 { .band = "mid" }
            else { .band = "low" }
            .fallback = .absent ?? "dflt"
            del(.props)
        """)(_t())
        assert out["sev"].to_pylist() == ["CLICK", "PURCHASE", None,
                                          "VIEW"]
        assert out["score"].to_pylist() == [21.0, 161.0, None, 111.0]
        assert out["band"].to_pylist() == ["low", "high", "low", "mid"]
        assert out["fallback"].to_pylist() == ["dflt"] * 4
        assert "props" not in out.column_names

    def test_string_concat_compare_bool_ops(self):
        out = compile_vrl("""
            .tag = .event_type + "-x"
            .big = .value >= 55.0 && !(.event_type == "view")
            .neg = -.value
            .m = 7 % 3
        """)(_t())
        assert out["tag"].to_pylist() == ["click-x", "purchase-x", None,
                                          "view-x"]
        assert out["big"].to_pylist() == [False, True, None, False]
        assert out["neg"].to_pylist() == [-10.0, -80.0, None, -55.0]
        assert out["m"].to_pylist() == [1] * 4

    def test_conditional_del_nulls_rows(self):
        # values [10, 80, None, 55]: rows 1 and 3 exceed 50 -> nulled
        out = compile_vrl(
            'if .value > 50.0 { del(.event_type) }')(_t())
        assert out["event_type"].to_pylist() == ["click", None, None,
                                                 None]

    def test_stdlib_dispatch_and_fallible_mark(self):
        out = compile_vrl("""
            .h = sha2(.event_type)
            .n = to_int!(.value)
            .r = round(.value / 3.0)
        """)(_t())
        assert out["h"][0].as_py() is not None
        assert out["n"].to_pylist() == [10, 80, None, 55]
        assert out["r"].to_pylist() == [3.0, 27.0, None, 18.0]

    def test_nested_struct_read(self):
        t = pa.table({
            "s": pa.array([{"a": 1}, {"a": 2}],
                          pa.struct([("a", pa.int64())])),
        })
        out = compile_vrl(".x = .s.a + 1")(t)
        assert out["x"].to_pylist() == [2, 3]

    def test_compile_time_errors(self):
        for bad, frag in [
            (".x = nosuchfn(.y)", "unknown function"),
            ("for_each(.a)", "subset"),
            (".a.b = 1", "flat field"),
            ("del(.a.b)", "flat field"),
            (".x = @meta", "unexpected character"),
            (".x = (1 + ", "unexpected token"),
        ]:
            with pytest.raises(VrlError, match=frag):
                compile_vrl(bad)

    def test_mixed_type_conditional(self):
        # castable old->new coerces the column (columnar analogue of
        # VRL's dynamic typing) ...
        out = compile_vrl('if .value > 50.0 { .value = "big" }')(_t())
        assert out["value"].to_pylist() == ["10", "big", None, "big"]
        # ... an uncastable mix raises with the type pair named
        with pytest.raises(VrlError, match="mixes Arrow types"):
            compile_vrl(
                'if .value > 50.0 { .event_type = 1.5 }')(_t())

    def test_parse_only(self):
        stmts = parse_vrl('.a = 1\ndel(.b)')
        assert [s[0] for s in stmts] == ["set", "del"]

    def test_root_merge_and_exists(self):
        t = pa.table({
            "msg": pa.array(['{"user":"u1","n":3}',
                             '{"user":"u2","n":5}', "not json"]),
            "opt": pa.array(["x", None, "y"]),
        })
        out = compile_vrl("""
            . = merge(., parse_json!(.msg))
            .has = exists(.opt)
            if exists(.user) { .tag = "parsed" } else { .tag = "raw" }
            del(.msg)
        """)(t)
        assert out["user"].to_pylist() == ["u1", "u2", None]
        assert out["n"].to_pylist() == [3, 5, None]
        assert out["has"].to_pylist() == [True, False, True]
        assert out["tag"].to_pylist() == ["parsed", "parsed", "raw"]
        assert "msg" not in out.column_names
        with pytest.raises(VrlError, match="root write"):
            compile_vrl(". = .a")
        with pytest.raises(VrlError, match="unconditional"):
            compile_vrl(
                'if .opt == "x" { . = merge(., parse_json(.msg)) }')(t)

    def test_parse_grok_in_vrl(self):
        t = pa.table({"msg": pa.array(["alice 42", "bob 7", "zzz"])})
        out = compile_vrl(
            '. = merge(., parse_grok!(.msg, "%{WORD:user} %{INT:n}"))'
        )(t)
        assert out["user"].to_pylist() == ["alice", "bob", None]
        assert out["n"].to_pylist() == ["42", "7", None]

    def test_parse_json_kernel(self):
        from vector_ray.expr import F

        s = pa.array(['{"a":1}', None, "[]", "{bad"])
        out = F.parse_json(s)
        assert out[0].as_py() == {"a": 1}
        assert out[1].as_py() is None and out[3].as_py() is None


class TestSurfaces:
    def test_remap_source_config(self):
        import ray.data as rd

        from vector_ray.pipelines.config import TRANSFORMS

        step = TRANSFORMS["remap"]({
            "type": "remap",
            "source": '.up = upcase(.event_type)',
        })
        rows = step.apply(rd.from_arrow(_t())).take_all()
        assert rows[0]["up"] == "CLICK"

    def test_cli_vrl_file(self, tmp_path):
        prog = tmp_path / "p.vrl"
        prog.write_text('.sev = upcase(.event_type)\ndel(.props)\n')
        inp = tmp_path / "e.json"
        inp.write_text(json.dumps(
            {"event_type": "click", "props": "{}"}) + "\n")
        res = subprocess.run(
            [sys.executable, "-m", "vector_ray", "vrl", str(prog),
             "--input", str(inp)],
            capture_output=True, text=True, timeout=120)
        assert res.returncode == 0, res.stderr
        ev = json.loads(res.stdout.strip().splitlines()[-1])
        assert ev["sev"] == "CLICK" and "props" not in ev
