"""CLI — the rebuild of the `vector` binary's subcommands
(src/cli.rs, src/validate.rs, src/config/unit_test.rs):

  python -m vector_ray run      <config.yaml|toml>   # build + execute all sinks
  python -m vector_ray validate <config.yaml|toml>   # schema/graph check, no execution
  python -m vector_ray graph    <config.yaml|toml>   # DOT export
  python -m vector_ray test     <config.yaml|toml>   # run the [tests] section
                                                     # (unit_test harness)

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


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vector_ray")
    ap.add_argument("command", choices=["run", "validate", "graph", "test"])
    ap.add_argument("config")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

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
