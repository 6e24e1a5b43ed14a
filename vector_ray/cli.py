"""CLI — the ``vector`` binary's top-3 subcommands, Ray-style.

Mirrors the reference entry points (SURVEY §3):
- ``run``      → ``vector`` daemon run (src/main.rs:9-44): load config,
  compile DAG, execute sinks, print per-sink counters.
- ``validate`` → ``vector validate`` (src/validate.rs): config + graph
  dry-run (cycle/ref/type checks) without executing.
- ``graph``    → ``vector graph`` (src/graph.rs): emit the DAG as DOT.

Cluster launch (the ``ray job submit`` path of the north rule)::

    ray job submit --working-dir . -- \
        python -m vector_ray.cli run pipelines/flagship.yaml \
        --var sf_dir=/data/transcripts

Only this CLI owns ``ray.init`` (guarded); library code never calls it.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_vars(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def cmd_validate(args) -> int:
    from vector_ray.topology import ConfigError, Topology

    try:
        topo = Topology.from_yaml(args.config)
    except ConfigError as e:
        print(f"invalid: {e}", file=sys.stderr)
        return 1
    print(f"ok: {len(topo.components)} components, order: {' -> '.join(topo.order)}")
    return 0


def cmd_graph(args) -> int:
    from vector_ray.topology import Topology

    topo = Topology.from_yaml(args.config)
    print("digraph topology {")
    for c in topo.components.values():
        shape = {"source": "box", "transform": "ellipse", "sink": "cds"}[c.kind]
        print(f'  "{c.name}" [shape={shape}, label="{c.name}\\n({c.type})"];')
        for ref in c.inputs:
            up, _, port = ref.partition(".")
            label = f' [label="{port}"]' if port else ""
            print(f'  "{up}" -> "{c.name}"{label};')
    print("}")
    return 0


def cmd_run(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(args.config)
    res = run_topology(topo, variables=_parse_vars(args.var))
    out = {"sink_counts": res.sink_counts}
    if getattr(args, "metrics", False):
        # `vector top` analogue: component_sent_events_total rows
        out["metrics"] = res.metrics.to_pylist()
    print(json.dumps(out))
    if args.shutdown:
        ray.shutdown()
    return 0


def cmd_tap(args) -> int:
    """``vector tap`` analogue: sample the events flowing out of one
    component (src/tap) — builds the DAG up to the component, prints
    ``--limit`` rows as JSON lines, executes no sinks."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(args.config)
    res = run_topology(topo, variables=_parse_vars(args.var),
                       execute_sinks=False, tap=args.component)
    key = args.component
    if key not in res.outputs:
        avail = sorted(res.outputs)
        print(json.dumps({"error": f"no tapped output {key!r}",
                          "available": avail}))
        ray.shutdown()
        return 1
    for row in res.outputs[key].take(args.limit):
        print(json.dumps(row, default=str))
    ray.shutdown()
    return 0


def cmd_vrl(args) -> int:
    """One-shot VRL program evaluation over a JSON event — the
    ``vector vrl`` runner's batch analogue (lib/vector-vrl/cli)."""
    import pyarrow as pa

    from vector_ray.vrl import compile_vrl

    event = json.loads(args.event)
    prog = compile_vrl(args.program)
    batch = pa.Table.from_pylist([event])
    out, err, msg = prog(batch)
    row = out.to_pylist()[0]
    if err[0].as_py():
        print(json.dumps({"error": msg[0].as_py(), "event": row}))
        return 1
    print(json.dumps(row, default=str))
    return 0


def cmd_test(args) -> int:
    """``vector test`` analogue: run the config's ``tests:`` blocks
    through the real component graph (src/unit_test.rs surface)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import yaml

    from vector_ray.topology import Topology
    from vector_ray.topology.unit_test import run_unit_tests

    raw = args.config
    try:
        with open(raw) as f:
            raw = f.read()
    except OSError:
        pass
    cfg = yaml.safe_load(raw)
    tests = cfg.pop("tests", [])
    if not tests:
        print("no tests: blocks in config", file=sys.stderr)
        return 1
    topo = Topology.from_yaml(yaml.safe_dump(cfg))
    results = run_unit_tests(topo, tests)
    failed = 0
    for r in results:
        status = "passed" if r.passed else "FAILED"
        print(f"test {r.name} ... {status}")
        for msg in r.failures:
            print(f"  {msg}")
        failed += 0 if r.passed else 1
    print(f"{len(results) - failed} passed, {failed} failed")
    return 1 if failed else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in (("run", cmd_run), ("validate", cmd_validate), ("graph", cmd_graph)):
        sp = sub.add_parser(name)
        sp.add_argument("config", help="pipeline YAML path or inline YAML")
        sp.set_defaults(fn=fn)
        if name == "run":
            sp.add_argument("--var", action="append", default=[],
                            help="substitution var, e.g. --var sf_dir=/data")
            sp.add_argument("--num-cpus", type=int, default=None)
            sp.add_argument("--no-shutdown", dest="shutdown", action="store_false")
            sp.add_argument("--metrics", action="store_true",
                            help="print component metrics (vector top)")

    sp = sub.add_parser("vrl", help="evaluate a VRL program over one JSON event")
    sp.add_argument("--program", required=True)
    sp.add_argument("--event", required=True, help="JSON object")
    sp.set_defaults(fn=cmd_vrl)

    sp = sub.add_parser("tap", help="sample events at a component (vector tap)")
    sp.add_argument("config", help="pipeline YAML path or inline YAML")
    sp.add_argument("component", help="component name (or name.port)")
    sp.add_argument("--limit", type=int, default=10)
    sp.add_argument("--var", action="append", default=[])
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_tap)

    sp = sub.add_parser("test", help="run the config's tests: blocks (vector test)")
    sp.add_argument("config", help="pipeline YAML (with tests:) path or inline")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_test)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
