"""Parser-stage tests mirroring tests/behavior/transforms/*.toml of the
reference (grok_parser.toml, regex_parser behavior, json_parser.toml,
key_value_parser.toml, tokenizer semantics from
lib/shared/src/tokenize.rs tests)."""

import pyarrow as pa

from vector_ray.grok import expand
from vector_ray.stages.parsers import (
    GrokParser,
    JsonParser,
    KeyValueParser,
    LogfmtParser,
    RegexParser,
    SplitParser,
    Tokenizer,
)

APACHE = r'^(?P<host>[\w.]+) - (?P<user>[\w-]+) \[(?P<timestamp>.*)\] "(?P<method>\w+) (?P<path>.*)" (?P<status>\d+) (?P<bytes_out>\d+)$'


class TestRegexParser:
    def t(self):
        return pa.table(
            {
                "message": [
                    'h1.example.com - frank [10/Oct/2000:13:55:36 -0700] "GET /x" 200 1234',
                    "not a log line",
                ]
            }
        )

    def test_captures_and_types(self):
        p = RegexParser("message", [APACHE], types={"status": "int", "bytes_out": "int"})
        out = p.transform(self.t())
        assert out["status"].to_pylist() == [200, None]
        assert out["bytes_out"].to_pylist() == [1234, None]
        assert out["host"].to_pylist() == ["h1.example.com", None]
        assert "message" not in out.column_names  # drop_field default

    def test_drop_failed(self):
        p = RegexParser("message", [APACHE], drop_failed=True)
        assert len(p.transform(self.t())) == 1

    def test_non_match_passes_through(self):
        p = RegexParser("message", [APACHE], drop_field=False)
        out = p.transform(self.t())
        assert out["message"].to_pylist()[1] == "not a log line"

    def test_first_match_wins(self):
        t = pa.table({"m": ["a=1", "b=2"]})
        p = RegexParser("m", [r"a=(?P<v>\d)", r"(?P<v>\d)"], drop_field=False)
        out = p.transform(t)
        assert out["v"].to_pylist() == ["1", "2"]

    def test_target_field_struct(self):
        p = RegexParser("message", [APACHE], target_field="parsed")
        out = p.transform(self.t())
        assert out["parsed"][0]["method"].as_py() == "GET"


class TestGrok:
    def test_expand_named(self):
        rx = expand("%{INT:n} %{WORD:w}")
        import re

        m = re.match(rx, "42 hello")
        assert m.group("n") == "42" and m.group("w") == "hello"

    def test_httpdate_case(self):
        # tests/behavior/transforms/grok_parser.toml:1-37
        t = pa.table({"message": ["12/Dec/2015:18:32:56 +0100 hello world"]})
        p = GrokParser("message", "%{HTTPDATE:timestamp} %{GREEDYDATA:msg}")
        out = p.transform(t)
        assert out["timestamp"].to_pylist() == ["12/Dec/2015:18:32:56 +0100"]
        assert out["msg"].to_pylist() == ["hello world"]

    def test_nested_path_flattened(self):
        t = pa.table({"message": ["12/Dec/2015:18:32:56 +0100 x"]})
        p = GrokParser("message", "%{HTTPDATE:nested.timestamp} %{GREEDYDATA:rest}")
        out = p.transform(t)
        assert out["nested_timestamp"].to_pylist() == ["12/Dec/2015:18:32:56 +0100"]

    def test_custom_patterns(self):
        t = pa.table({"message": ["foo=XY"]})
        p = GrokParser("message", "foo=%{PAIR:p}", custom_patterns={"PAIR": "[A-Z]{2}"})
        assert p.transform(t)["p"].to_pylist() == ["XY"]


class TestJsonParser:
    def test_merge_and_invalid(self):
        t = pa.table({"message": ['{"a": 1, "b": "x"}', "not json", '{"a": 2, "b": "y"}']})
        out = JsonParser("message").transform(t)
        assert out["a"].to_pylist() == [1, None, 2]
        assert out["b"].to_pylist() == ["x", None, "y"]

    def test_drop_invalid(self):
        t = pa.table({"message": ['{"a": 1}', "nope"]})
        out = JsonParser("message", drop_invalid=True).transform(t)
        assert len(out) == 1

    def test_target_field(self):
        t = pa.table({"message": ['{"a": 1}']})
        out = JsonParser("message", target_field="parsed").transform(t)
        assert out["parsed"][0]["a"].as_py() == 1

    def test_fast_path_vectorized(self):
        rows = [f'{{"k": {i}}}' for i in range(500)]
        out = JsonParser("message").transform(pa.table({"message": rows}))
        assert out["k"].to_pylist() == list(range(500))


class TestKvLogfmt:
    def test_specified_fields_vectorized(self):
        t = pa.table({"message": ["at=info method=GET bytes=12", 'at=warn method=POST note="a b"']})
        p = LogfmtParser("message", fields=["at", "method", "bytes", "note"], types={"bytes": "int"})
        out = p.transform(t)
        assert out["at"].to_pylist() == ["info", "warn"]
        assert out["bytes"].to_pylist() == [12, None]
        assert out["note"].to_pylist() == [None, "a b"]

    def test_discovery_path(self):
        t = pa.table({"message": ["a=1 b=2", "b=3 c=4"]})
        out = KeyValueParser("message").transform(t)
        assert out["a"].to_pylist() == ["1", None]
        assert out["c"].to_pylist() == [None, "4"]

    def test_custom_separators(self):
        t = pa.table({"message": ["a:1,b:2"]})
        out = KeyValueParser("message", separator=",", field_split=":", fields=["a", "b"]).transform(t)
        assert out["a"].to_pylist() == ["1"]
        assert out["b"].to_pylist() == ["2"]


class TestTokenizerSplit:
    def test_tokenizer_quoting(self):
        # lib/shared/src/tokenize.rs:37-80 semantics
        t = pa.table({"message": ['1.2.3.4 - [10/Oct/2000] "GET /" 200']})
        p = Tokenizer("message", ["ip", "user", "ts", "req", "status"], types={"status": "int"})
        out = p.transform(t)
        assert out["ip"].to_pylist() == ["1.2.3.4"]
        assert out["user"].to_pylist() == [None]  # "-" → null
        assert out["ts"].to_pylist() == ["10/Oct/2000"]
        assert out["req"].to_pylist() == ["GET /"]
        assert out["status"].to_pylist() == [200]

    def test_split_literal(self):
        t = pa.table({"message": ["a,b,c"]})
        out = SplitParser("message", ["x", "y", "z"], separator=",").transform(t)
        assert out["y"].to_pylist() == ["b"]

    def test_split_whitespace(self):
        t = pa.table({"message": ["a b   c"]})
        out = SplitParser("message", ["x", "y"]).transform(t)
        assert out["x"].to_pylist() == ["a"]
        assert out["y"].to_pylist() == ["b"]
