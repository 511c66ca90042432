"""Slice/chunk invariance sweep over the kernel library.

Round-2 advice found two kernels (decode_percent, encode_percent) that
corrupted output on SLICED inputs (arr.offset != 0) with nulls — the
buffer-reuse helpers (_flat_utf8 / _rebuild_string) are exactly where
such bugs hide. This sweep pins the invariant for every single-array
kernel: ``fn(arr.slice(k)) == fn(fresh_copy_of_slice)`` and
``fn(two_chunk_chunked_array) == fn(fresh_copy)``, with nulls in every
input.
"""

import inspect

import pyarrow as pa
import pytest

import vector_ray.expr.kernels as F

GEN = ["hello world", None, "a%4", "1xyz", "", None, "Foo_Bar-baz qux",
       "x" * 40, "ab%20cd", None, "tail"]
IPS = ["1.2.3.4", None, "255.255.255.255", "10.0.0.1", None, "8.8.8.8"]
LISTS = pa.array([["a", "b"], None, ["c"], ["d", "e", "f"], None, []])
FLOATS = pa.array([1.5, None, 2.25, 3.125, None, 9.75])
TS = pa.array([1600000000000000, None, 1700000000000000, 1500000000000000,
               None, 1650000000000000], pa.timestamp("us"))
APACHE = ['127.0.0.1 - f [10/Oct/2000:13:55:36 -0700] "GET /p HTTP/1.0" 200 2326 "-" "UA"',
          None,
          '10.0.0.1 - - [10/Oct/2000:13:55:36 -0700] "POST /q HTTP/1.1" 404 1 "r" "u"',
          '1.1.1.1 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 500 0 "-" "-"',
          None,
          '2.2.2.2 - - [10/Oct/2000:13:55:36 -0700] "GET /z HTTP/1.0" 301 5 "-" "x"']

# kernel -> (input array, extra positional args); kernels not listed use
# (GEN, ()). Table-level / generator kernels are skipped.
CASES = {
    "ip_aton": (IPS, ()), "ip_cidr_contains": (IPS, ("10.0.0.0/8",)),
    "ip_subnet": (IPS, (8,)), "ip_to_ipv6": (IPS, ()),
    "ipv6_to_ipv4": (["::ffff:1.2.3.4", None, "::ffff:10.0.0.1",
                      "2001:db8::1", None, "::ffff:8.8.8.8"], ()),
    "parse_url": (["http://a.com/p?q=1", None, "https://u:p@h.io:8080/x#f",
                   "ftp://z.org", None, "http://b.c/d"], ()),
    "parse_query_string": (["a=1&b=2", None, "x=9", "a=7&c=3", None, "b=0"], ("a",)),
    "parse_duration": (["5s", None, "3ms", "2h", None, "10m"], ()),
    "parse_int": (["12", None, "99", "7", None, "42"], ()),
    "from_unix_timestamp": (pa.array([1600000000, None, 1700000000,
                                      1500000000, None, 1650000000]), ()),
    "format_timestamp": (TS, ()), "to_unix_timestamp": (TS, ()),
    "format_int": (pa.array([255, None, 16, 7, None, 1024]), ()),
    "format_number": (FLOATS, ()), "round_": (FLOATS, ()),
    "ceil": (FLOATS, ()), "floor": (FLOATS, ()),
    "abs_": (pa.array([-1.5, None, 2.25, -3.0, None, 9.0]), ()),
    "mod": (pa.array([10, None, 7, 22, None, 5]), (3,)),
    "to_syslog_facility": (pa.array([16, None, 0, 23, None, 4]), ()),
    "to_syslog_level": (pa.array([16, None, 0, 23, None, 4]), ()),
    "to_syslog_severity": (["info", None, "err", "warning", None, "debug"], ()),
    "join": (LISTS, (",",)), "array_contains": (LISTS, ("a",)),
    "array_length": (LISTS, ()), "match_array": (LISTS, ("a",)),
    "push": (LISTS, ("NEW",)),
    "append": (LISTS, (["X", "Y"],)),
    "parse_regex_all": (GEN, (r"\w+",)),
    "parse_grok": (GEN, ("%{WORD:head} %{GREEDYDATA:rest}",)),
    "array_unique": (pa.array([["a", "b", "a"], None, ["c"],
                               ["d", "e", "d"], None, []]), ()),
    "tally": (pa.array([["a", "b", "a"], None, ["c"],
                        ["d", "e", "d"], None, []]), ()),
    "compact": (['{"a":null,"b":""}', None, '["x","",null]', '{"c":1}',
                 None, '{}'], ()),
    "remove": (['{"a":1,"b":2}', None, '{"a":3}', '{"b":4}', None, '{}'], ("a",)),
    "parse_ruby_hash": (['{"a" => 1}', None, '{"b" => "x"}', '{:c => 2}',
                         None, '{}'], ()),
    "parse_xml": (["<a>1</a>", None, "<b x='2'>t</b>", "<c/>", None,
                   "<d>z</d>"], ()),
    "parse_cef": (["CEF:0|V|P|1|sig|nm|3|src=1.2.3.4", None,
                   "CEF:0|a|b|2|s|n|5|dst=2.3.4.5", "CEF:0|q|w|1|e|r|7|",
                   None, "CEF:0|x|y|0|z|k|1|src=9.9.9.9"], ()),
    "parse_syslog": (["<34>Oct 11 22:14:15 host app: msg", None,
                      "<13>Feb  5 17:32:18 h2 ap2: m2",
                      "<165>1 2003-10-11T22:14:15.003Z h3 a3 - - - m3",
                      None, "<34>Oct 11 22:14:15 h4 a4: m4"], ()),
    "parse_common_log": ([r.replace(' "-" "UA"', "").replace(' "r" "u"', "")
                          .replace(' "-" "-"', "").replace(' "-" "x"', "")
                          if r else None for r in APACHE], ()),
    "parse_apache_log": (APACHE, ()), "parse_nginx_log": (APACHE, ()),
    "parse_glog": (["I0101 12:00:00.000000 1 f.cc:1] m", None,
                    "W0202 13:01:02.000003 22 g.cc:9] n",
                    "E0303 14:02:03.000004 333 h.cc:7] o", None,
                    "I0404 15:03:04.000005 4 i.cc:2] p"], ()),
    "parse_klog": (["I0101 12:00:00.000000 1 f.go:1] m", None,
                    "W0202 13:01:02.000003 22 g.go:9] n",
                    "E0303 14:02:03.000004 333 h.go:7] o", None,
                    "I0404 15:03:04.000005 4 i.go:2] p"], ()),
    "parse_linux_authorization": (["Oct 11 22:14:15 host sshd[1]: msg", None,
                                   "Feb  5 17:32:18 h2 su: m2",
                                   "Mar  1 01:02:03 h3 sudo[9]: m3", None,
                                   "Apr  2 03:04:05 h4 sshd[2]: m4"], ()),
    "parse_aws_vpc_flow_log": ((
        ["2 123 eni-1 1.2.3.4 5.6.7.8 20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK",
         None,
         "2 124 eni-2 9.9.9.9 8.8.8.8 443 53 17 1 2 1 2 REJECT OK",
         "2 125 eni-3 1.1.1.1 2.2.2.2 80 81 6 3 4 5 6 ACCEPT OK", None,
         "2 126 eni-4 3.3.3.3 4.4.4.4 1 2 6 7 8 9 10 REJECT OK"]), ()),
    "parse_user_agent": (["Mozilla/5.0 (Windows NT 10.0) Chrome/91.0", None,
                          "curl/7.68.0", "Mozilla/5.0 (Macintosh) Safari/605.1",
                          None, "python-requests/2.25"], ()),
    "to_timestamp": (["2020-01-01 00:00:00", None, "2021-06-15 12:30:45",
                      "1999-12-31 23:59:59", None, "2010-05-05 05:05:05"], ()),
    "to_bool": (["true", None, "false", "yes", None, "0"], ()),
    "to_float": (["1.5", None, "2", "7.25", None, "9"], ()),
    "to_int": (["12", None, "99", "7", None, "42"], ()),
    "reverse_dns": (["8.8.8.8", None, "1.1.1.1", "9.9.9.9", None, "8.8.4.4"], ()),
    "ip_ntoa": (pa.array([16909060, None, 4294967295, 167772161, None,
                          134744072], pa.uint32()), ()),
    "to_regex": (["a.*b", None, "^x$", "[0-9]+", None, "z"], ()),
    "contains": (GEN, ("lo",)), "ends_with": (GEN, ("ld",)),
    "starts_with": (GEN, ("he",)), "find": (GEN, ("o",)),
    "extract_regex": (GEN, (r"(?P<w>\w+)",)), "is_match": (GEN, (r"\w+",)),
    "match_any": (GEN, ([r"\d+", r"hello"],)),
    "replace": (GEN, ("o", "0")), "split": (GEN, (" ",)),
    "slice_": (GEN, (1, 5)), "truncate": (GEN, (5,)),
    "redact": (GEN, ([r"\d+"],)), "hmac_": (GEN, ("k",)),
    "parse_csv_line": (["a,b", None, "c,d", "e,f", None, "g,h"], (["x", "y"],)),
}

SKIP = {"del_", "encode_csv", "encode_json", "encode_key_value",
        "encode_logfmt", "exists_col", "flatten", "get", "merge_struct",
        "only_fields", "rename", "render", "set_", "const", "get_env_var",
        "get_hostname", "uuid_v4", "concat", "community_id",
        "fingerprint_mod", "coerce", "decode_gzip", "decode_zlib",
        "decode_base64", "parse_aws_alb_log"}


def _all_kernels():
    for name, fn in sorted(vars(F).items()):
        if name.startswith("_") or not inspect.isfunction(fn):
            continue
        if inspect.getmodule(fn) is not F or name in SKIP:
            continue
        yield name, fn


def _as_array(dom):
    return dom if isinstance(dom, pa.Array) else pa.array(dom)


def _vals(x):
    if isinstance(x, dict):
        return {k: _vals(v) for k, v in x.items()}
    return x.to_pylist() if hasattr(x, "to_pylist") else x


@pytest.mark.parametrize("name", [n for n, _ in _all_kernels()])
def test_slice_invariance(name):
    fn = getattr(F, name)
    arr = _as_array(CASES.get(name, (GEN, ()))[0])
    extra = CASES.get(name, (GEN, ()))[1]
    for k in (1, 2, 3):
        sl = arr.slice(k)
        fresh = pa.array(sl.to_pylist(), type=arr.type)
        assert _vals(fn(sl, *extra)) == _vals(fn(fresh, *extra)), \
            f"{name} diverges on arr.slice({k})"


@pytest.mark.parametrize("name", [n for n, _ in _all_kernels()])
def test_chunked_invariance(name):
    fn = getattr(F, name)
    arr = _as_array(CASES.get(name, (GEN, ()))[0])
    extra = CASES.get(name, (GEN, ()))[1]
    ch = pa.chunked_array([arr.slice(0, 2), arr.slice(2)])
    fresh = pa.array(arr.to_pylist(), type=arr.type)
    assert _vals(fn(ch, *extra)) == _vals(fn(fresh, *extra)), \
        f"{name} diverges on a two-chunk ChunkedArray"
