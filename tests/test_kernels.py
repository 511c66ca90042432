"""Expression-layer unit tests — mirrors the VRL conformance corpus
style (lib/vrl/tests/tests/**: input object → program → result)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vector_ray.expr import C, F


def tbl(**cols):
    return pa.table(cols)


class TestStringFamily:
    def test_case(self):
        a = pa.array(["Hello", "WORLD"])
        assert F.downcase(a).to_pylist() == ["hello", "world"]
        assert F.upcase(a).to_pylist() == ["HELLO", "WORLD"]

    def test_contains_prefix_suffix(self):
        a = pa.array(["foobar", "baz"])
        assert F.contains(a, "oba").to_pylist() == [True, False]
        assert F.starts_with(a, "foo").to_pylist() == [True, False]
        assert F.ends_with(a, "az").to_pylist() == [False, True]

    def test_replace_and_regex(self):
        a = pa.array(["a-b-c"])
        assert F.replace(a, "-", "_").to_pylist() == ["a_b_c"]
        assert F.replace(a, r"[-]", ".", regex=True).to_pylist() == ["a.b.c"]

    def test_split_join(self):
        a = pa.array(["a,b,c"])
        parts = F.split(a, ",")
        assert parts.to_pylist() == [["a", "b", "c"]]
        assert F.join(parts, "|").to_pylist() == ["a|b|c"]

    def test_truncate_strip(self):
        assert F.truncate(pa.array(["abcdef"]), 3).to_pylist() == ["abc"]
        assert F.truncate(pa.array(["abcdef"]), 3, ellipsis=True).to_pylist() == ["abc..."]
        assert F.strip_whitespace(pa.array(["  x "])).to_pylist() == ["x"]

    def test_strip_ansi(self):
        assert F.strip_ansi_escape_codes(pa.array(["\x1b[31mred\x1b[0m"])).to_pylist() == ["red"]

    def test_slice(self):
        assert F.slice_(pa.array(["abcdef"]), 2, 4).to_pylist() == ["cd"]


class TestTypeFamily:
    def test_conversions(self):
        assert F.to_int(pa.array(["42"])).to_pylist() == [42]
        assert F.to_float(pa.array(["3.14"])).to_pylist() == [3.14]
        assert F.to_bool(pa.array(["true", "no", "1"])).to_pylist() == [True, False, True]

    def test_timestamp(self):
        out = F.to_timestamp(pa.array(["2015-12-12 18:32:56"]))
        assert out.to_pylist()[0].year == 2015

    def test_coerce_dispatch(self):
        assert F.coerce(pa.array(["7"]), "int").to_pylist() == [7]
        with pytest.raises(ValueError):
            F.coerce(pa.array(["x"]), "nope")


class TestHashFamily:
    def test_fingerprint_stable(self):
        a = pa.array(["abc", "abc", "xyz", None])
        f = F.fingerprint(a)
        assert f[0] == f[1]
        assert f[0] != f[2]
        assert f[3].as_py() is None

    def test_fingerprint_mod(self):
        a = pa.array([f"k{i}" for i in range(1000)])
        kept = pc.sum(pc.equal(F.fingerprint_mod(a, 10), 0)).as_py()
        assert 50 < kept < 200  # ~1/10

    def test_md5(self):
        assert F.md5(pa.array(["abc"])).to_pylist() == ["900150983cd24fb0d6963f7d28e17f72"]

    def test_mod_floor_semantics(self):
        # ADVICE r1: mod is Euclidean/floor mod (sign of the modulus),
        # matching VRL's `mod` rather than C-style truncation
        a = pa.array([-1, -10, -11, 0, 7, 23])
        assert F.mod(a, 10).to_pylist() == [9, 0, 9, 0, 7, 3]
        assert F.mod(pa.array([7, -7]), -3).to_pylist() == [-2, -1]


class TestPathOps:
    def test_set_del_rename(self):
        t = tbl(a=[1], b=[2])
        t = F.set_(t, "c", pa.array([3]))
        assert t.column_names == ["a", "b", "c"]
        t = F.del_(t, "b", "zz")
        assert t.column_names == ["a", "c"]
        t = F.rename(t, {"c": "d"})
        assert t.column_names == ["a", "d"]

    def test_merge_struct(self):
        t = tbl(a=[1, 2])
        s = pa.array([{"x": 1, "y": "u"}, {"x": 2, "y": "v"}])
        out = F.merge_struct(t, s)
        assert out["x"].to_pylist() == [1, 2]
        assert out["y"].to_pylist() == ["u", "v"]

    def test_get_dotted(self):
        t = tbl(a=pa.array([{"b": {"c": 5}}]))
        assert F.get(t, "a.b.c").to_pylist() == [5]


class TestArrayFamily:
    def test_length(self):
        assert F.length(pa.array([[1, 2], [3]])).to_pylist() == [2, 1]
        assert F.length(pa.array(["abc"])).to_pylist() == [3]

    def test_unique_contains_tally(self):
        a = pa.array([["a", "b", "a"], ["c"]])
        assert F.array_unique(a).to_pylist() == [["a", "b"], ["c"]]
        assert F.array_contains(a, "b").to_pylist() == [True, False]
        assert F.tally(a).to_pylist() == ['{"a": 2, "b": 1}', '{"c": 1}']


class TestTemplate:
    def test_render(self):
        t = tbl(host=["h1", "h2"], n=[1, 2])
        out = F.render(t, "{{host}}-x-{{n}}")
        assert out.to_pylist() == ["h1-x-1", "h2-x-2"]


class TestConditions:
    def test_basic(self):
        t = tbl(status=[200, 404, 500], path=["/a", "/api/x", "/api/y"])
        assert C.eq("status", 404)(t).to_pylist() == [False, True, False]
        assert (C.ge("status", 400) & C.prefix("path", "/api"))(t).to_pylist() == [
            False, True, True,
        ]
        assert (~C.lt("status", 500))(t).to_pylist() == [False, False, True]
        assert C.is_in("status", [200, 500])(t).to_pylist() == [True, False, True]

    def test_null_is_false(self):
        t = tbl(x=pa.array([1, None]))
        assert C.gt("x", 0)(t).to_pylist() == [True, False]

    def test_exists_and_regex(self):
        t = tbl(x=pa.array(["ab1", None]))
        assert C.exists("x")(t).to_pylist() == [True, False]
        assert C.exists("nope")(t).to_pylist() == [False, False]
        assert C.regex("x", r"\d")(t).to_pylist() == [True, False]
