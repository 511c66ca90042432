"""CLI — the rebuild of the `vector` binary's subcommands
(src/cli.rs, src/validate.rs, src/config/unit_test.rs):

  python -m vector_ray run      <config.yaml|toml>   # build + execute all sinks
  python -m vector_ray validate <config.yaml|toml>   # schema/graph check, no execution
  python -m vector_ray graph    <config.yaml|toml>   # DOT export
  python -m vector_ray test     <config.yaml|toml>   # run the [tests] section
                                                     # (unit_test harness)
  python -m vector_ray vrl [program.yaml] [--input event.json]
                                                     # remap-program REPL /
                                                     # one-shot evaluator

``vrl`` is the analogue of the reference's `vector vrl` REPL
(src/cli.rs:176-208) for this engine's DECLARATIVE remap programs
(SURVEY §2.4: the Python kernel API replaces the VRL parser, so the
REPL speaks remap ops, not VRL source): start from an event (--input
JSON file or `{}`), type one op per line as inline YAML/JSON
(`{fn: upcase, field: message}`), and the updated event prints after
each step. `.` reprints, `.reset` restores the input, `.exit` quits.
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
            op = yaml.safe_load(line)
            if not isinstance(op, dict) or "fn" not in op:
                raise ValueError(
                    "op must be a mapping with an 'fn' key, e.g. "
                    "{fn: upcase, field: message}")
            ev = _vrl_apply([op], ev)
            print(json.dumps(ev, default=str))
        except Exception as e:  # keep the session alive on bad ops
            print(f"error: {e}", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vector_ray")
    ap.add_argument("command",
                    choices=["run", "validate", "graph", "test", "vrl"])
    ap.add_argument("config", nargs="?")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--input", default=None,
                    help="vrl: JSON event file (object, array, or NDJSON)")
    args = ap.parse_args(argv)

    if args.command == "vrl":
        return vrl_main(args)
    if not args.config:
        ap.error(f"{args.command} requires a config file")

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
