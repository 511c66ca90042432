"""CLI — the rebuild of the `vector` binary's subcommands
(src/cli.rs, src/validate.rs, src/config/unit_test.rs):

  python -m vector_ray run      <config.yaml|toml>   # build + execute all sinks
  python -m vector_ray validate <config.yaml|toml>   # schema/graph check, no execution
  python -m vector_ray graph    <config.yaml|toml>   # DOT export
  python -m vector_ray test     <config.yaml|toml>   # run the [tests] section
                                                     # (unit_test harness)
  python -m vector_ray vrl [program.yaml|.vrl] [--input event.json]
                                                     # remap-program REPL /
                                                     # one-shot evaluator
  python -m vector_ray list [--format text|json]     # available components
  python -m vector_ray generate <src/trans1,trans2/sink> [--file out.yaml]
                                                     # config skeleton
  python -m vector_ray tap <config> <node[.port]> [--limit N]
                                                     # sample a component's
                                                     # output as NDJSON
  python -m vector_ray top <config>                  # per-component rows/sec
                                                     # table (batch analogue
                                                     # of live `vector top`)

``vrl`` is the analogue of the reference's `vector vrl` REPL
(src/cli.rs:176-208): it speaks BOTH this engine's declarative remap
ops (inline YAML/JSON, `{fn: upcase, field: message}`) and actual VRL
source for the supported subset (expr/vrl.py — `.sev = upcase(.t)`,
`if`/`del`, stdlib calls); a `.vrl` program file runs verbatim. Start
from an event (--input JSON file or `{}`), type one op or statement
per line, and the updated event prints after each step. `.` reprints,
`.reset` restores the input, `.exit` quits.
With a program file argument it runs one-shot: apply the op list to
every input event and print NDJSON. Runs without Ray (single-event
Arrow evaluation).

This CLI owns its Ray session (guarded init), unlike the library.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    import yaml

    with open(path) as f:
        text = f.read()
    if path.endswith(".toml"):
        import tomllib

        return tomllib.loads(text)
    if path.endswith(".json"):
        return json.loads(text)
    return yaml.safe_load(text)


def _event_to_table(ev: dict):
    import pyarrow as pa

    return pa.table({k: [v] for k, v in ev.items()})


def _table_to_event(t) -> dict:
    return {c: t[c][0].as_py() for c in t.column_names} if len(t) else {}


def _vrl_apply(ops, ev: dict) -> dict:
    from vector_ray.pipelines.config import compile_remap_op

    t = _event_to_table(ev)
    for op in ops:
        t = compile_remap_op(op)(t)
    return _table_to_event(t)


def vrl_main(args) -> int:
    import yaml

    events = [{}]
    if args.input:
        with open(args.input) as f:
            text = f.read().strip()
        if text.startswith("["):
            events = json.loads(text)
        else:
            events = [json.loads(line) for line in text.splitlines()
                      if line.strip()]
    if args.config:  # one-shot: program file over every event
        if args.config.endswith(".vrl"):
            # reference-parity: an actual VRL program string
            from vector_ray.expr.vrl import compile_vrl

            with open(args.config) as f:
                fn = compile_vrl(f.read())
            for ev in events:
                print(json.dumps(_table_to_event(fn(_event_to_table(ev))),
                                 default=str))
            return 0
        prog = _load(args.config)
        ops = prog["ops"] if isinstance(prog, dict) else prog
        for ev in events:
            print(json.dumps(_vrl_apply(ops, ev), default=str))
        return 0

    # REPL
    ev = dict(events[0])
    initial = dict(ev)
    print(json.dumps(ev, default=str))
    prompt = "vrl> " if sys.stdin.isatty() else ""
    while True:
        try:
            line = input(prompt)
        except EOFError:
            return 0
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line in (".exit", ".quit"):
            return 0
        if line == ".":
            print(json.dumps(ev, default=str))
            continue
        if line == ".reset":
            ev = dict(initial)
            print(json.dumps(ev, default=str))
            continue
        try:
            op = None
            try:
                op = yaml.safe_load(line)
            except Exception:
                pass
            if isinstance(op, dict) and "fn" in op:
                ev = _vrl_apply([op], ev)
            else:  # fall back to VRL source (".f = upcase(.g)", if, del)
                from vector_ray.expr.vrl import compile_vrl

                t = compile_vrl(line)(_event_to_table(ev))
                ev = _table_to_event(t)
            print(json.dumps(ev, default=str))
        except Exception as e:  # keep the session alive on bad ops
            print(f"error: {e}", file=sys.stderr)


# `vector generate` (src/generate.rs): expression
# "sources/transforms/sinks" (comma lists, optional "name:" prefixes)
# → runnable config skeleton. Skeletons carry each type's required
# fields with placeholder values; unlisted types emit {"type": t}.
_GEN_SRC = {
    "parquet": {"path": "/path/to/*.parquet"},
    "csv": {"path": "/path/to/*.csv"},
    "json": {"path": "/path/to/*.ndjson"},
    "text": {"path": "/path/to/*.log"},
    "file": {"path": "/path/to/*.log", "framing": "newline"},
    "generator": {"count": 1000, "format": "apache"},
    "tokens_synth": {"count": 10_000},
    "web_docs": {"count": 2000},
    "link_graph": {"edges": 20_000, "nodes": 4000},
}
_GEN_TRANS = {
    "filter": {"condition": {"field": "message", "op": "exists"}},
    "field_filter": {"field": "message", "value": "error"},
    "sample": {"rate": 10, "key_field": "message"},
    "remap": {"ops": [{"fn": "set", "field": "processed", "value": True}]},
    "route": {"route": {"errors": {"field": "message", "op": "exists"}}},
    "regex_parser": {"field": "message", "regex": r"^(?P<word>\S+)"},
    "log_to_metric": {"metrics": [{"type": "counter", "name": "events"}]},
}
_GEN_SINK = {
    "parquet": {"path": "/tmp/vector_ray_out"},
    "csv": {"path": "/tmp/vector_ray_out"},
    "json": {"path": "/tmp/vector_ray_out"},
    "file": {"path": "/tmp/vector_ray_out/{source}.ndjson",
             "encoding": {"codec": "ndjson"}},
    "console": {"limit": 20},
}


def generate_config(expression: str) -> dict:
    """Build the config dict for a generate expression. Topology rules
    mirror the reference (src/generate.rs:46-57): the first transform
    consumes every source, each later transform its predecessor; sinks
    consume the last transform, or every source if none."""

    def parse_seg(seg: str, kind: str):
        comps = []
        for i, item in enumerate(x for x in seg.split(",") if x.strip()):
            name, _, typ = item.rpartition(":")
            comps.append((name or f"{kind}{i + 1}", typ.strip()))
        return comps

    segs = expression.split("/")
    if len(segs) > 3:
        raise ValueError("expression has more than 3 '/'-separated parts")
    segs += [""] * (3 - len(segs))
    sources = parse_seg(segs[0], "source")
    transforms = parse_seg(segs[1], "transform")
    sinks = parse_seg(segs[2], "sink")

    cfg: dict = {}
    if sources:
        cfg["sources"] = {
            n: {"type": t, **_GEN_SRC.get(t, {})} for n, t in sources
        }
    prev = [n for n, _ in sources]
    if transforms:
        cfg["transforms"] = {}
        for n, t in transforms:
            cfg["transforms"][n] = {
                "type": t, "inputs": prev, **_GEN_TRANS.get(t, {})
            }
            prev = [n]
    if sinks:
        cfg["sinks"] = {
            n: {"type": t, "inputs": prev, **_GEN_SINK.get(t, {})}
            for n, t in sinks
        }
    return cfg


def list_main(args) -> int:
    from vector_ray.pipelines.config import component_inventory

    inv = component_inventory()
    if args.format == "json":
        print(json.dumps(inv))
        return 0
    for kind in ("sources", "transforms", "sinks"):
        print(f"{kind.capitalize()}:")
        for name in inv[kind]:
            print(f"- {name}")
    return 0


def generate_main(args) -> int:
    import yaml

    from vector_ray.pipelines.config import validate

    cfg = generate_config(args.config)
    validate(cfg)  # a skeleton that doesn't validate is a bug
    text = yaml.safe_dump(cfg, sort_keys=False)
    if args.file:
        with open(args.file, "w") as f:
            f.write(text)
        print(args.file)
    else:
        print(text, end="")
    return 0


def lake_main(args):
    """`vector_ray lake <action> <root>` — storage maintenance over a
    parquet lake (state/datastats.py + state/maintain.py):

      stats   --col?        rebuild the footer min/max manifest
      bloom   --col C       build the per-file Bloom sidecar for C
      compact --target-mb N merge small files per directory
      delete  --col C --keys a,b,c  targeted key erasure
      seen-compact          fold duplicate keys in a seen index
    """
    import ray

    action, root = args.config, args.node
    if not action or not root:
        print("usage: vector_ray lake <stats|bloom|compact|delete|"
              "seen-compact> <root> [--col C] [--keys ...]")
        return 2
    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False,
                  logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if action == "stats":
            from vector_ray.state.datastats import stats_index_build

            path = stats_index_build(root, cols=[args.col] if args.col else None)
            print(f"manifest: {path}")
        elif action == "bloom":
            if not args.col:
                print("lake bloom requires --col")
                return 2
            from vector_ray.state.datastats import bloom_index_build

            path = bloom_index_build(root, args.col)
            print(f"bloom sidecar: {path}")
        elif action == "compact":
            from vector_ray.state.maintain import compact_files

            res = compact_files(root, target_bytes=args.target_mb << 20)
            print(json.dumps(res))
        elif action == "delete":
            if not args.col or not args.keys:
                print("lake delete requires --col and --keys")
                return 2
            from vector_ray.state.maintain import delete_by_keys

            raw = [k.strip() for k in args.keys.split(",") if k.strip()]
            try:
                keys = [int(k) for k in raw]
            except ValueError:
                keys = raw
            res = delete_by_keys(root, args.col, keys)
            print(json.dumps(res))
        elif action == "seen-compact":
            from vector_ray.state.seen import seen_index_compact

            seen_index_compact(root)
            print("compacted")
        elif action == "seen-expire":
            if args.older_than is None:
                print("lake seen-expire requires --older-than")
                return 2
            from vector_ray.state.seen import seen_index_expire

            print(json.dumps(seen_index_expire(root, args.older_than)))
        else:
            print(f"unknown lake action: {action}")
            return 2
        return 0
    finally:
        ray.shutdown()


def daily_main(args) -> int:
    """`vector_ray daily <input> <workdir>`: one effectively-once
    ingest step of the composed daily pipeline (pipelines/daily.py) —
    persistent dedupe, flagship parse/enrich/route, per-run routed
    commit, checkpointed aggregate. Prints the step summary and the
    cumulative aggregate head; replaying the same input admits 0."""
    if not args.config or not args.node:
        print("usage: vector_ray daily <input-dir-or-glob> <workdir>",
              file=sys.stderr)
        return 2
    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False,
                  logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from vector_ray.pipelines.daily import run_daily

        res = run_daily(args.config, args.node)
        print(f"new_docs: {res['new_docs']}")
        print(f"routed_dir: {res['routed_dir']}")
        agg = res["aggregate"]
        print(f"aggregate: {agg.num_rows} rows "
              f"({', '.join(agg.column_names)})")
        for row in agg.sort_by([("lane", "ascending"),
                                ("source", "ascending")]).to_pylist()[:5]:
            print(f"  {row}")
        return 0
    finally:
        ray.shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vector_ray")
    ap.add_argument("command",
                    choices=["run", "validate", "graph", "explain", "test",
                             "vrl", "list", "generate", "tap", "top",
                             "lake", "daily"])
    ap.add_argument("config", nargs="?",
                    help="config file (run/validate/graph/test/tap/top), "
                         "program file (vrl), expression (generate), "
                         "lake action (stats|bloom|compact|delete|seen-compact|"
                         "seen-expire), or daily: the input dir/glob of "
                         "parquet fragments")
    ap.add_argument("node", nargs="?",
                    help="tap: component reference, e.g. parse or "
                         "route1.errors; lake: the lake root directory; "
                         "daily: the durable workdir")
    ap.add_argument("--col", default=None,
                    help="lake stats/bloom/delete: the key column")
    ap.add_argument("--keys", default=None,
                    help="lake delete: comma-separated key values "
                         "(ints auto-detected)")
    ap.add_argument("--target-mb", type=int, default=128,
                    help="lake compact: output file size target")
    ap.add_argument("--older-than", type=float, default=None,
                    help="lake seen-expire: drop keys last seen before "
                         "this value (stored ts_col units)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--input", default=None,
                    help="vrl: JSON event file (object, array, or NDJSON)")
    ap.add_argument("--format", default="text", choices=["text", "json"],
                    help="list: output encoding")
    ap.add_argument("--file", default=None,
                    help="generate: write the config here instead of stdout")
    ap.add_argument("--limit", type=int, default=10,
                    help="tap: number of events to print")
    args = ap.parse_args(argv)

    if args.command == "lake":
        return lake_main(args)
    if args.command == "daily":
        return daily_main(args)
    if args.command == "vrl":
        return vrl_main(args)
    if args.command == "list":
        return list_main(args)
    if not args.config:
        ap.error(f"{args.command} requires a config file")
    if args.command == "generate":
        return generate_main(args)
    if args.command == "tap" and not args.node:
        ap.error("tap requires a component reference")

    from vector_ray.pipelines.config import Topology, graph, run_unit_tests, validate

    cfg = _load(args.config)

    if args.command == "validate":
        warnings = validate(cfg)
        for w in warnings:
            print(f"warning: {w}")
        print("ok")
        return 0

    if args.command == "graph":
        print(graph(cfg), end="")
        return 0

    if args.command == "explain":
        from vector_ray.pipelines.config import explain

        print(explain(cfg), end="")
        return 0

    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.command == "test":
            tests = cfg.pop("tests", [])
            results = run_unit_tests(cfg, tests)
            failed = 0
            for r in results:
                status = "PASS" if r["passed"] else "FAIL"
                print(f"{status} {r['name']}")
                for e in r["errors"]:
                    print(f"    {e}")
                failed += not r["passed"]
            print(f"{len(results) - failed}/{len(results)} tests passed")
            return 1 if failed else 0

        if args.command == "tap":
            # `vector tap` (src/tap/): observe a component's output.
            # Batch form: build just that node's sub-graph and print a
            # sample of its output rows as NDJSON.
            topo = Topology(cfg)
            for row in topo.node_dataset(args.node).take(args.limit):
                print(json.dumps(row, default=str))
            return 0

        if args.command == "top":
            from vector_ray.pipelines.config import component_stats

            stats = component_stats(cfg)
            wc = max(len(s["component"]) for s in stats) + 2
            tc = max(len(s["type"]) for s in stats) + 2
            print(f"{'COMPONENT':<{wc}}{'KIND':<11}{'TYPE':<{tc}}"
                  f"{'ROWS_OUT':>10}  {'WALL_S':>7}  {'ROWS/S':>10}")
            for s in stats:
                rate = (f"{s['rows_out'] / s['wall_s']:.0f}"
                        if s["wall_s"] else "-")
                print(f"{s['component']:<{wc}}{s['kind']:<11}"
                      f"{s['type']:<{tc}}{s['rows_out']:>10}  "
                      f"{s['wall_s']:>7.3f}  {rate:>10}")
            return 0

        # run
        topo = Topology(cfg)
        results = topo.run()
        for name, res in results.items():
            if isinstance(res, (int, str)):
                print(f"{name}: {res}")
            else:
                print(f"{name}: {len(res)} rows")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
