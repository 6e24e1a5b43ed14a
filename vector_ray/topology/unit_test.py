"""Behavioral unit-test runner — the ``vector test`` analogue.

Reference (src/unit_test.rs:1-60, src/config/unit_test/mod.rs): a
config may carry ``[[tests]]`` blocks; each test injects synthetic
events at a named component (``insert_at``), runs the real topology,
and asserts VRL conditions on the events extracted at ``extract_from``
(plus ``no_outputs_from`` emptiness checks).  Behavior corpus examples:
tests/behavior/transforms/route.toml:1-80.

Rebuild: tests are YAML dicts::

    tests:
      - name: errors routed
        insert_at: parse            # replaces that component's inputs
        input_rows:                 # list of row dicts
          - {conv_id: c, turn_idx: 0, role: user, text: "...", tool: "", ts: ...}
        outputs:
          - extract_from: split.errors
            conditions: ['.level == "error"']   # every extracted row must pass
            count: 2                            # optional exact row count
        no_outputs_from: [split._unmatched]     # optional emptiness asserts
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import ray.data as rd

from vector_ray.conditions import compile_condition
from vector_ray.topology.config import ComponentSpec, ConfigError, Topology
from vector_ray.topology.runner import _build_transform, _union


@dataclass
class TestResult:
    name: str
    passed: bool
    failures: list[str] = field(default_factory=list)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    import pandas as pd

    df = pd.DataFrame(rows)
    if "ts" in df.columns:
        df["ts"] = pd.to_datetime(df["ts"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    # align common transcript column types
    casts = {"turn_idx": pa.int32(), "text": pa.large_string()}
    for c, typ in casts.items():
        if c in t.column_names:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, t[c].cast(typ))
    return t


def _input_rows(inp: dict) -> list[dict]:
    """A test input is either literal ``rows`` or a VRL program that
    BUILDS the event (``type: vrl`` + ``source``, the
    vrl_test_input.toml shape: ``. = {...}`` merges the object into
    the synthesized row)."""
    if "rows" in inp:
        return inp["rows"]
    if inp.get("type") == "vrl" and "source" in inp:
        from vector_ray.vrl import compile_vrl

        seed = pa.table({"__seed": pa.array([0], pa.int64())})
        out, _err, _msg = compile_vrl(inp["source"])(seed)
        if "__seed" in out.column_names:
            out = out.drop_columns(["__seed"])
        return out.to_pylist()
    raise ConfigError("test input needs `rows` or {type: vrl, source}")


def run_unit_tests(topo: Topology, tests: list[dict],
                   *, tables=None) -> list[TestResult]:
    """Run each behavioral test against the real component graph."""
    from vector_ray.enrichment.table import FileTable

    tables = tables or {}
    results = []
    for spec in tests:
        name = spec.get("name", "<unnamed>")
        failures: list[str] = []
        # injection points: either the single insert_at/input_rows shape
        # or a list of {insert_at, rows} (task_transform.toml's
        # multi-input tests inject at several components)
        if "inputs" in spec:
            injections: dict[str, list[dict]] = {}
            for inp in spec["inputs"]:
                injections.setdefault(inp["insert_at"], []).extend(
                    _input_rows(inp))
        else:
            injections = {spec["insert_at"]: spec["input_rows"]}
        for point in injections:
            if point not in topo.components:
                raise ConfigError(f"insert_at {point!r} not in topology")
        injected = {k: rd.from_arrow(_rows_to_table(v))
                    for k, v in injections.items()}

        # build the graph downstream of the injection points
        ports: dict[str, dict[str, rd.Dataset]] = {}
        for comp_name in topo.order:
            comp = topo.components[comp_name]
            if comp.kind == "source":
                continue
            if comp.kind == "sink":
                continue
            resolved = []
            if comp_name in injected:
                resolved.append(injected[comp_name])
            for ref in comp.inputs:
                up, _, port = ref.partition(".")
                if up in ports and port in ports[up]:
                    resolved.append(ports[up][port])
            if not resolved:
                continue  # upstream not part of this test's slice
            ins = _union(resolved)
            ports[comp_name] = _build_transform(comp, ins, tables)

        def extract(ref: str) -> pa.Table:
            up, _, port = ref.partition(".")
            if up not in ports or port not in ports[up]:
                raise ConfigError(f"extract_from {ref!r} unreachable")
            ds = ports[up][port]
            return pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)

        for out in spec.get("outputs", []):
            t = extract(out["extract_from"])
            want_count = out.get("count")
            if want_count is not None and t.num_rows != want_count:
                failures.append(
                    f"{out['extract_from']}: expected {want_count} rows, got {t.num_rows}"
                )
            if t.num_rows == 0 and out.get("conditions"):
                failures.append(f"{out['extract_from']}: no rows to assert on")
            for cond_src in out.get("conditions", []):
                mask = compile_condition(cond_src)(t)
                bad = t.num_rows - (len([v for v in mask.to_pylist() if v]))
                if bad:
                    failures.append(
                        f"{out['extract_from']}: {bad} rows fail {cond_src!r}"
                    )
        for ref in spec.get("no_outputs_from", []):
            t = extract(ref)
            if t.num_rows:
                failures.append(f"{ref}: expected no rows, got {t.num_rows}")
        results.append(TestResult(name, not failures, failures))
    return results
