"""Raw-line ingestion: framers (newline / character / length / octet,
mirroring src/codecs/framers/*) and the lines→parse→route→aggregate
topology."""

import os
import struct

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vector_ray.expr import C, F
from vector_ray.sources.lines import (
    _frames_character,
    _frames_length,
    _frames_octet,
    read_lines,
)


class TestFramers:
    def test_character(self):
        assert _frames_character(b"a\x00bb\x00ccc\x00", b"\x00") == [b"a", b"bb", b"ccc"]
        assert _frames_character(b"a\x00bb", b"\x00") == [b"a", b"bb"]
        assert _frames_character(b"", b"\x00") == []

    def test_length_delimited(self):
        payload = b"".join(struct.pack(">I", len(m)) + m for m in [b"one", b"", b"three33"])
        assert _frames_length(payload) == [b"one", b"", b"three33"]
        with pytest.raises(ValueError):
            _frames_length(struct.pack(">I", 10) + b"short")

    def test_octet_counting(self):
        payload = b"3 foo11 hello world0 4 ab c"
        assert _frames_octet(payload) == [b"foo", b"hello world", b"", b"ab c"]
        with pytest.raises(ValueError):
            _frames_octet(b"9 short")


class TestReadLines:
    def _write(self, tmp, name, data: bytes):
        p = os.path.join(tmp, name)
        with open(p, "wb") as f:
            f.write(data)
        return p

    def test_newline(self, tmp_path):
        p = self._write(str(tmp_path), "a.log", b"l1\nl2\nl3\n")
        out = read_lines(p).take_all()
        assert sorted(r["line"] for r in out) == ["l1", "l2", "l3"]

    def test_length_framing(self, tmp_path):
        msgs = [f"msg{i}".encode() for i in range(5)]
        p = self._write(str(tmp_path), "a.bin",
                        b"".join(struct.pack(">I", len(m)) + m for m in msgs))
        out = read_lines(p, framing="length").take_all()
        assert sorted(r["line"] for r in out) == sorted(m.decode() for m in msgs)

    def test_octet_framing(self, tmp_path):
        msgs = [b"<13>Feb  5 x", b"hello"]
        p = self._write(str(tmp_path), "a.syslog",
                        b"".join(str(len(m)).encode() + b" " + m for m in msgs))
        out = read_lines(p, framing="octet").take_all()
        assert sorted(r["line"] for r in out) == sorted(m.decode() for m in msgs)

    def test_lines_to_pipeline(self, tmp_path):
        # the Vector topology: file source → parse → route → aggregate
        from vector_ray.stages import Route, grouped_aggregate

        lines = []
        for i in range(60):
            sev = "err" if i % 3 == 0 else "ok"
            lines.append(f"Feb  5 10:15:5{i % 10} host{i % 2} app[{i}]: status={sev}")
        p = self._write(str(tmp_path), "app.log", ("\n".join(lines) + "\n").encode())
        ds = read_lines(p)

        def parse(t: pa.Table) -> pa.Table:
            s = F.parse_linux_authorization(t["line"])
            s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            status = pc.struct_field(
                pc.extract_regex(pc.struct_field(s, "message"), r"status=(?P<v>\S+)"), "v")
            return pa.table({"host": pc.struct_field(s, "hostname"), "status": status})

        parsed = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
        routed = Route({"errors": C.eq("status", "err")}, unmatched_lane="rest").apply(parsed)
        agg = grouped_aggregate(routed, ["lane"], {"n": ("count", "status")}).take_all()
        by = {r["lane"]: r["n"] for r in agg}
        assert by == {"errors": 20, "rest": 40}


class TestFileSourceConfig:
    def test_file_source_with_framing(self, tmp_path):
        import struct

        import yaml

        from vector_ray.pipelines.config import load_config

        msgs = [b"status=ok host=a", b"status=err host=b", b"status=err host=a"]
        p = tmp_path / "frames.bin"
        p.write_bytes(b"".join(struct.pack(">I", len(m)) + m for m in msgs))
        cfg = {
            "sources": {"in": {"type": "file", "path": str(p), "framing": "length"}},
            "transforms": {
                "kv": {"type": "key_value_parser", "inputs": ["in"]},
                "errs": {"type": "filter", "inputs": ["kv"],
                         "condition": {"datadog_search": "status:err"}},
            },
            "sinks": {"out": {"type": "memory", "inputs": ["errs"]}},
        }
        res = load_config(cfg).run()
        df = res["out"]
        assert len(df) == 2
        assert sorted(df["host"]) == ["a", "b"]


class TestGzipLines:
    def test_auto_gzip_newline_and_octet(self, tmp_path):
        import gzip

        from vector_ray.sources.lines import read_lines

        lines = [f"line-{i}" for i in range(50)]
        gz = tmp_path / "a.log.gz"
        gz.write_bytes(gzip.compress(("\n".join(lines) + "\n").encode()))
        got = sorted(r["line"]
                     for r in read_lines(str(gz)).take_all())
        assert got == sorted(lines)
        oc = tmp_path / "c.dat.gz"
        oc.write_bytes(gzip.compress(b"5 hello5 world"))
        got2 = [r["line"] for r in read_lines(str(oc),
                                              framing="octet").take_all()]
        assert got2 == ["hello", "world"]

    def test_plain_unaffected_and_bad_mode(self, tmp_path):
        import pytest

        from vector_ray.sources.lines import read_lines

        p = tmp_path / "b.log"
        p.write_text("x\ny\n")
        assert sorted(r["line"] for r in read_lines(str(p)).take_all()) \
            == ["x", "y"]
        with pytest.raises(ValueError, match="compression"):
            read_lines(str(p), compression="zstd")
