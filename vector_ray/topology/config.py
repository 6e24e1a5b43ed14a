"""Vector-shaped config → validated component DAG.

Mirrors the reference's config compile pipeline: TOML/YAML/JSON files
→ ``ConfigBuilder`` → ``Config`` with a typechecked, cycle-free graph
(src/config/compiler.rs; src/config/graph.rs:219 typecheck,
:244-295 check_for_cycles; input wiring :296-360 valid_inputs).

The rebuild reads the same YAML shape::

    enrichment_tables:
      tools: {type: file, path: ..., schema: {...}, key: tool}
    sources:
      in: {type: parquet, path: "{sf_dir}/transcripts.parquet"}
    transforms:
      parse: {type: remap, inputs: [in], program: transcript_parse}
      split: {type: route, inputs: [parse], route: {errors: '.level == "error"'}}
    sinks:
      errors_out: {type: parquet, inputs: [split.errors], path: /tmp/out}

Inputs may reference ``name`` or ``name.port`` (route ports, remap's
``dropped`` port) exactly like Vector's ``transform_name.port`` refs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import yaml


class ConfigError(ValueError):
    pass


@dataclass
class ComponentSpec:
    name: str
    kind: str                      # source | transform | sink
    type: str
    config: dict[str, Any] = field(default_factory=dict)
    inputs: list[str] = field(default_factory=list)


@dataclass
class Topology:
    components: dict[str, ComponentSpec]
    enrichment_tables: dict[str, dict]
    order: list[str]               # topological

    @classmethod
    def from_dict(cls, cfg: Mapping[str, Any]) -> "Topology":
        comps: dict[str, ComponentSpec] = {}
        for kind, plural in (("source", "sources"), ("transform", "transforms"),
                             ("sink", "sinks")):
            for name, c in (cfg.get(plural) or {}).items():
                if name in comps:
                    raise ConfigError(f"duplicate component name {name!r}")
                c = dict(c)
                ctype = c.pop("type", None)
                if not ctype:
                    raise ConfigError(f"component {name!r} missing `type`")
                inputs = list(c.pop("inputs", []) or [])
                if kind == "source" and inputs:
                    raise ConfigError(f"source {name!r} cannot have inputs")
                if kind != "source" and not inputs:
                    raise ConfigError(f"{kind} {name!r} requires `inputs`")
                comps[name] = ComponentSpec(name, kind, ctype, c, inputs)
        if not comps:
            raise ConfigError("empty topology")
        topo = cls(
            components=comps,
            enrichment_tables=dict(cfg.get("enrichment_tables") or {}),
            order=[],
        )
        topo._validate()
        return topo

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "Topology":
        if "\n" not in text_or_path and text_or_path.endswith((".yml", ".yaml")):
            with open(text_or_path) as f:
                text = f.read()
        else:
            text = text_or_path
        return cls.from_dict(yaml.safe_load(text))

    # -- graph checks mirroring config/graph.rs --
    def _validate(self) -> None:
        names = set(self.components)
        edges: dict[str, list[str]] = {n: [] for n in names}
        for c in self.components.values():
            for ref in c.inputs:
                up = ref.split(".", 1)[0]
                if up not in names:
                    raise ConfigError(
                        f"{c.kind} {c.name!r}: input {ref!r} references "
                        f"unknown component {up!r}"
                    )
                if self.components[up].kind == "sink":
                    raise ConfigError(f"{c.name!r} cannot consume from sink {up!r}")
                edges[up].append(c.name)

        # Kahn toposort doubles as the cycle check (graph.rs:244-295)
        indeg = {n: 0 for n in names}
        for ups in self.components.values():
            for ref in ups.inputs:
                indeg[ups.name] += 1
        order, ready = [], sorted(n for n, d in indeg.items() if d == 0)
        indeg2 = dict(indeg)
        while ready:
            n = ready.pop(0)
            order.append(n)
            for dn in sorted(set(edges[n])):
                # count one per edge (parallel edges via multiple input refs)
                cnt = sum(1 for r in self.components[dn].inputs
                          if r.split(".", 1)[0] == n)
                indeg2[dn] -= cnt
                if indeg2[dn] == 0:
                    ready.append(dn)
        if len(order) != len(names):
            cyc = sorted(set(names) - set(order))
            raise ConfigError(f"cycle detected involving {cyc}")
        self.order = order

    def sinks(self) -> list[ComponentSpec]:
        return [c for c in self.components.values() if c.kind == "sink"]
