"""Topology runner — compile the component DAG into Dataset stages and
execute sinks.

The Ray mapping of Vector's ``RunningTopology`` (src/topology/
builder.rs:113,328): instead of one tokio task per component with
bounded channels, each component becomes a lazy Dataset transformation;
fan-out (lib/vector-core/src/fanout.rs:196-313 clones the event array
per consumer) becomes multiple consumers of the same (materialized-once)
Dataset; per-sink counters (component_sent_events_total) are collected
into a metrics table at the end of the run.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from vector_ray.enrichment.stage import enrich
from vector_ray.enrichment.table import FileTable
from vector_ray.sinks.parquet import ParquetSink
from vector_ray.stages.cardinality import tag_cardinality_limit
from vector_ray.stages.dedupe import dedupe_exact
from vector_ray.stages.filter import filter_stage
from vector_ray.stages.hash_replace import hash_replace
from vector_ray.stages.log_metric import MetricSpec, log_to_metric, metric_to_log
from vector_ray.stages.reduce import reduce_stage
from vector_ray.stages.remap import remap
from vector_ray.stages.route import exclusive_route, route
from vector_ray.stages.sample import sample_hash, sample_modulo
from vector_ray.stages.throttle import throttle_stage
from vector_ray.topology.config import ComponentSpec, ConfigError, Topology

# Named remap programs — the Python-UDF analogue of VRL program strings
# (the lua/remap user-extension surface, SURVEY §2.10).
_PROGRAMS: dict[str, Callable] = {}


def register_program(name: str, fn: Callable) -> None:
    _PROGRAMS[name] = fn


def _program(name: str) -> Callable:
    if name not in _PROGRAMS:
        # lazy-register built-ins
        from vector_ray.pipelines.flagship import transcript_parse_program

        _PROGRAMS.setdefault("transcript_parse", transcript_parse_program)
    if name not in _PROGRAMS:
        raise ConfigError(f"unknown remap program {name!r}")
    return _PROGRAMS[name]


@dataclass
class RunResult:
    sink_counts: dict[str, int] = field(default_factory=dict)
    outputs: dict[str, Dataset] = field(default_factory=dict)

    @property
    def metrics(self) -> pa.Table:
        """component_sent_events_total analogue as a table."""
        names = sorted(self.sink_counts)
        return pa.table({
            "component_id": pa.array(names, pa.string()),
            "metric": pa.array(["component_sent_events_total"] * len(names)),
            "value": pa.array([self.sink_counts[n] for n in names], pa.int64()),
        })


def _union(dss: list[Dataset]) -> Dataset:
    out = dss[0]
    for d in dss[1:]:
        out = out.union(d)
    return out


def run_topology(
    topo: Topology,
    *,
    variables: dict[str, str] | None = None,
    execute_sinks: bool = True,
    tap: str | None = None,
) -> RunResult:
    """Execute the DAG.  ``variables`` substitute into source paths
    (e.g. ``{sf_dir}``)."""
    variables = variables or {}
    tables: dict[str, FileTable] = {}
    for tname, tcfg in topo.enrichment_tables.items():
        path = tcfg["path"].format(**variables)
        if tcfg.get("type") == "cidr":
            from vector_ray.enrichment.cidr import CidrTable

            tables[tname] = CidrTable.from_csv(
                path, cidr_col=tcfg.get("cidr_col", "cidr"))
        elif tcfg.get("type") in ("mmdb", "geoip"):
            # src/enrichment_tables/mmdb.rs:33-40 / geoip.rs — binary
            # MaxMind database read by the pure-Python spec reader
            from vector_ray.enrichment.mmdb import MmdbTable

            tables[tname] = MmdbTable.open(path)
        else:
            tables[tname] = FileTable(path, tcfg.get("schema"))

    # component name -> {port: Dataset}; default port is ""
    ports: dict[str, dict[str, Dataset]] = {}
    # components with >1 consumer get materialized once (fanout clone)
    consumers: dict[str, int] = {}
    for c in topo.components.values():
        for ref in c.inputs:
            consumers[ref.split(".", 1)[0]] = consumers.get(ref.split(".", 1)[0], 0) + 1

    def resolve(ref: str) -> Dataset:
        name, _, port = ref.partition(".")
        if name not in ports:
            raise ConfigError(f"component {name!r} not yet built")
        out = ports[name]
        if port not in out:
            raise ConfigError(
                f"component {name!r} has no output port {port or '<default>'!r}; "
                f"available: {sorted(out)}"
            )
        return out[port]

    result = RunResult()

    for name in topo.order:
        spec = topo.components[name]
        if spec.kind == "source":
            ports[name] = {"": _build_source(spec, variables)}
        elif spec.kind == "transform":
            ins_list = [resolve(r) for r in spec.inputs]
            # two-input joins keep their sides separate (different
            # schemas — a union would reject them)
            ins = ins_list[0] if spec.type in _TWO_INPUT_TRANSFORMS \
                else _union(ins_list)
            ports[name] = _build_transform(spec, ins, tables,
                                           ins_list=ins_list)
            # fanout: materialize once when multiple consumers read this node
            if consumers.get(name, 0) > 1:
                ports[name] = {p: d.materialize() for p, d in ports[name].items()}
        else:  # sink
            ins = _union([resolve(r) for r in spec.inputs])
            result.outputs[name] = ins
            if execute_sinks:
                result.sink_counts[name] = _run_sink(spec, ins, variables)
        if tap is not None and name == tap.split(".", 1)[0] \
                and name in ports:
            # `vector tap` analogue: expose this component's ports
            for pname, d in ports[name].items():
                key = name if pname == "" else f"{name}.{pname}"
                result.outputs[key] = d
    return result


def _build_source(spec: ComponentSpec, variables: dict) -> Dataset:
    if spec.type == "parquet":
        path = spec.config["path"].format(**variables)
        zone = spec.config.get("zone_predicate")
        if zone:
            # manifested sink dir with zone maps: [[col, op, value]...]
            # skips whole files before any byte leaves storage (the
            # may-match filter; exact row filters follow downstream)
            from vector_ray.sinks.parquet import read_pruned

            return read_pruned(
                path,
                predicate=[(p[0], p[1], p[2]) for p in zone],
                columns=spec.config.get("columns"))
        return rd.read_parquet(path, columns=spec.config.get("columns"))
    if spec.type == "transcripts":
        from vector_ray.data.transcripts import ensure_transcripts

        sf_dir = spec.config.get("sf_dir", variables.get("sf_dir", "/root/testdata/sf0.001"))
        if isinstance(sf_dir, str):
            sf_dir = sf_dir.format(**variables)  # honor --var substitution
        return rd.read_parquet(ensure_transcripts(sf_dir),
                               columns=spec.config.get("columns"))
    if spec.type == "csv":
        return rd.read_csv(spec.config["path"].format(**variables))
    if spec.type == "json":
        return rd.read_json(spec.config["path"].format(**variables))
    if spec.type == "avro":
        import glob as _glob

        from vector_ray.sources.avro import read_avro

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else path
        return read_avro(paths, columns=spec.config.get("columns"))
    if spec.type == "orc":
        import glob as _glob

        from vector_ray.sources.orc import read_orc

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else path
        return read_orc(paths, columns=spec.config.get("columns"))
    if spec.type == "demo_logs":
        from vector_ray.sources.demo_logs import demo_logs

        return demo_logs(
            int(spec.config.get("count", 1000)),
            spec.config.get("format", "json"),
            seed=int(spec.config.get("seed", 42)),
            lines=spec.config.get("lines"),
            sequence=bool(spec.config.get("sequence", False)),
        )
    if spec.type == "native_json":
        # vector→vector interop NDJSON (functions/native_json.py);
        # project: raw (kind+payload) | metrics | traces
        import glob as _glob

        from vector_ray.functions.native_json import (
            native_metrics_to_table, native_traces_to_table,
            read_native_json)

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else path
        ds = read_native_json(paths)
        proj = spec.config.get("project", "events")
        if proj == "metrics":
            return native_metrics_to_table(ds)
        if proj == "traces":
            return native_traces_to_table(ds)
        return ds
    if spec.type == "framed_file":
        # byte-stream/datagram captures: framing = octet_counting |
        # length_delimited | chunked_gelf (sources/framing.py)
        import glob as _glob

        from vector_ray.sources.framing import read_framed

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
        opts = {k: spec.config[k] for k in (
            "max_length", "length_field_length", "length_field_offset",
            "length_field_is_big_endian", "max_frame_length",
            "decompression", "pending_messages_limit")
            if k in spec.config}
        return read_framed(
            paths, framing=spec.config.get("framing", "octet_counting"),
            include_paths=bool(spec.config.get("include_paths", True)),
            emit_errors=bool(spec.config.get("emit_errors", False)),
            **opts)
    if spec.type == "native":
        # binary vector→vector interop: length-delimited EventArray
        # frames (functions/native_proto.py); same projections as the
        # native_json source so the two are drop-in interchangeable
        import glob as _glob

        from vector_ray.functions.native_json import (
            native_metrics_to_table, native_traces_to_table)
        from vector_ray.functions.native_proto import read_native

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else path
        ds = read_native(paths)
        proj = spec.config.get("project", "events")
        if proj == "metrics":
            return native_metrics_to_table(ds)
        if proj == "traces":
            return native_traces_to_table(ds)
        return ds
    if spec.type == "strata":
        # header-enriched NDJSON capture, optionally strata_snappy-
        # framed (functions/strata.py)
        import glob as _glob

        from vector_ray.functions.strata import read_strata

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else path
        return read_strata(
            paths, framing=spec.config.get("framing", "bytes"),
            header_field_name=spec.config.get(
                "header_field_name", "strata_file_header"),
            include_paths=bool(spec.config.get("include_paths", False)))
    if spec.type == "json_paths":
        # path-routed JSON decode (functions/json_paths.py): one
        # event per matched value, {"expr", "data"} columns
        import glob as _glob

        import pyarrow as _pa
        import ray.data as _rd

        from vector_ray.functions.json_paths import (compile_paths,
                                                     json_paths_events_table)

        path = spec.config["path"].format(**variables)
        paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?[") else [path]
        ops = compile_paths(spec.config["paths"])

        def _decode(batch: _pa.Table) -> _pa.Table:
            out = []
            for p in batch["item"].to_pylist():
                with open(p, "rb") as f:
                    t = json_paths_events_table(
                        _pa.array([f.read()], _pa.binary()), ops)
                out.append(t.drop_columns(["row_idx"]))
            if not out:
                out = [json_paths_events_table(
                    _pa.array([], _pa.binary()), ops)
                    .drop_columns(["row_idx"])]
            return _pa.concat_tables(out)

        return _rd.from_items(list(paths)).map_batches(
            _decode, batch_format="pyarrow", batch_size=None)
    raise ConfigError(f"unknown source type {spec.type!r}")


# transforms consuming their 2 inputs as distinct (left, right) sides
# instead of the reference's union-of-inputs stream semantics
_TWO_INPUT_TRANSFORMS = frozenset(
    {"asof_join", "interval_join", "decontaminate", "hash_join",
     "set_op", "snapshot_diff", "cross_dedup"})


def _build_transform(
    spec: ComponentSpec, ds: Dataset, tables: dict[str, FileTable],
    ins_list: list[Dataset] | None = None,
) -> dict[str, Dataset]:
    c = spec.config
    t = spec.type
    if t == "decontaminate":
        # two-input: inputs[0] = corpus, inputs[1] = benchmark set
        if ins_list is None or len(ins_list) != 2:
            raise ConfigError(
                f"decontaminate component {spec.name!r} needs exactly "
                f"2 inputs (corpus, benchmark); got {len(ins_list or [])}")
        from vector_ray.ml.decontam import decontaminate

        return {"": decontaminate(
            ins_list[0], ins_list[1],
            text_col=c.get("text_col", "text"), n=c.get("n", 3),
            seed=c.get("seed", 0), annotate=c.get("annotate", False))}
    if t == "snapshot_diff":
        if ins_list is None or len(ins_list) != 2:
            raise ConfigError(
                f"snapshot_diff component {spec.name!r} needs exactly "
                f"2 inputs (old, new); got {len(ins_list or [])}")
        from vector_ray.stages.diff_snapshots import snapshot_diff

        key = c.get("key")
        compare = c.get("compare")
        if not key or not compare:
            raise ConfigError(
                f"snapshot_diff component {spec.name!r} needs `key` "
                "and `compare`")
        return {"": snapshot_diff(
            ins_list[0], ins_list[1],
            key=[key] if isinstance(key, str) else list(key),
            compare=[compare] if isinstance(compare, str)
            else list(compare),
            keep=c.get("keep", "all"),
            num_partitions=c.get("num_partitions"))}
    if t == "cross_dedup":
        if ins_list is None or len(ins_list) != 2:
            raise ConfigError(
                f"cross_dedup component {spec.name!r} needs exactly 2 "
                f"inputs (corpus, reference); got {len(ins_list or [])}")
        from vector_ray.ml.ngram_join import cross_dedup

        return {"": cross_dedup(
            ins_list[0], ins_list[1],
            text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            shingle_n=c.get("shingle_n", 3),
            threshold=c.get("threshold", 0.8),
            ref_id_offset=c.get("ref_id_offset", 10_000_000))}
    if t == "set_op":
        if ins_list is None or len(ins_list) != 2:
            raise ConfigError(
                f"set_op component {spec.name!r} needs exactly 2 "
                f"inputs (left, right); got {len(ins_list or [])}")
        from vector_ray.stages.setops import set_op

        cols = c.get("columns")
        if not cols:
            raise ConfigError(
                f"set_op component {spec.name!r} needs `columns`")
        return {"": set_op(
            ins_list[0], ins_list[1],
            columns=[cols] if isinstance(cols, str) else list(cols),
            op=c.get("op", "intersect"), all=bool(c.get("all", False)),
            num_partitions=c.get("num_partitions"))}
    if t in ("asof_join", "interval_join", "hash_join"):
        # two-input components: inputs[0] is the left/points side,
        # inputs[1] the right/intervals side (every other transform
        # unions its inputs into one stream, reference-style)
        if ins_list is None or len(ins_list) != 2:
            raise ConfigError(
                f"{t} component {spec.name!r} needs exactly 2 inputs "
                f"(left, right); got {len(ins_list or [])}")
        if t == "hash_join":
            from vector_ray.stages.hash_join import hash_partition_join

            on = c.get("on", c.get(True, c.get("on_col")))
            if on is None:
                raise ConfigError(
                    f"hash_join component {spec.name!r} needs `on`")
            on = [on] if isinstance(on, str) else list(on)
            return {"": hash_partition_join(
                ins_list[0], ins_list[1], on=on,
                right_on=c.get("right_on"),
                how=c.get("how", "inner"),
                right_suffix=c.get("right_suffix", "_r"),
                num_partitions=c.get("num_partitions"),
                salt_hot_keys=c.get("salt_hot_keys"),
                bloom_prefilter=bool(c.get("bloom_prefilter", False)))}
        if t == "asof_join":
            from vector_ray.stages.asof import asof_join

            # YAML 1.1 parses a bare `on:` key as boolean True — accept
            # it, plus an unambiguous `on_col` alias
            on_col = c.get("on", c.get(True, c.get("on_col")))
            if on_col is None:
                raise ConfigError(
                    f"asof_join component {spec.name!r} needs `on` "
                    "(or `on_col`)")
            return {"": asof_join(
                ins_list[0], ins_list[1], on=on_col,
                by=c.get("by", ()), strategy=c.get("strategy", "backward"),
                tolerance=c.get("tolerance"), suffix=c.get("suffix", "_r"),
                how=c.get("how", "left"))}
        from vector_ray.stages.interval_join import interval_join

        return {"": interval_join(
            ins_list[0], ins_list[1], point_col=c["point_col"],
            start_col=c["start_col"], end_col=c["end_col"],
            by=c.get("by", ()), how=c.get("how", "inner"),
            point_id_col=c.get("point_id_col"),
            num_chunks=c.get("num_chunks", 64),
            suffix=c.get("suffix", "_r"))}
    if t == "remap":
        if "source" in c:
            from vector_ray.vrl import compile_vrl

            prog = compile_vrl(c["source"], tables=tables)
        elif "file" in c:
            # VRL program from a file (remap.rs `file` config option)
            from vector_ray.vrl import compile_vrl

            with open(c["file"]) as f:
                prog = compile_vrl(f.read(), tables=tables)
        else:
            prog = _program(c["program"])
        res = remap(
            ds,
            prog,
            drop_on_error=c.get("drop_on_error", False),
            reroute_dropped=c.get("reroute_dropped", False),
            component_id=spec.name,
        )
        if c.get("reroute_dropped"):
            # two ports consume the same labeled dataset: materialize it
            # ONCE so primary and dropped don't each re-execute upstream
            # (the fanout clone, lib/vector-core/src/fanout.rs:303)
            res._labeled = res.labeled.materialize()
            return {"": res.primary, "dropped": res.dropped}
        return {"": res.primary}
    if t == "filter":
        return {"": filter_stage(ds, c["condition"])}
    if t == "unnest":
        # one-event-to-many expansion (VRL unnest as a component: the
        # row-expanding shape lives at the Dataset level, not inside a
        # 1:1 remap program)
        from vector_ray.functions.collections import unnest

        return {"": unnest(ds, c["field"])}
    if t == "route":
        res = route(ds, c["route"], reroute_unmatched=c.get("reroute_unmatched", True))
        if len(res.ports) > 1:
            res._labeled = res.labeled.materialize()  # fanout: execute upstream once
        return {p: res.port(p) for p in res.ports}
    if t == "exclusive_route":
        routes = [(r["name"], r["condition"]) for r in c["routes"]]
        res = exclusive_route(ds, routes,
                              reroute_unmatched=c.get("reroute_unmatched", True))
        if len(res.ports) > 1:
            res._labeled = res.labeled.materialize()
        return {p: res.port(p) for p in res.ports}
    if t == "sample":
        if c.get("key_field"):
            return {"": sample_hash(ds, rate=c["rate"], key_field=c["key_field"],
                                    exclude=c.get("exclude"))}
        if c.get("impl") == "sorted":
            from vector_ray.stages.sorted_ops import sample_modulo_sorted

            return {"": sample_modulo_sorted(
                ds, rate=c["rate"], group_by=c.get("group_by"),
                order_by=c.get("order_by", ("conv_id", "turn_idx")),
                exclude=c.get("exclude"),
            )}
        return {"": sample_modulo(
            ds, rate=c["rate"], group_by=c.get("group_by"),
            order_by=c.get("order_by", ("conv_id", "turn_idx")),
            exclude=c.get("exclude"),
        )}
    if t == "dedupe":
        order = c.get("order_by", ("conv_id", "turn_idx"))
        cache = c.get("cache", {})
        if cache.get("num_events"):
            # reference semantics (windowed LRU, dedupe/transform.rs:77-88)
            from vector_ray.stages.dedupe import dedupe_lru

            return {"": dedupe_lru(
                ds, c["fields"], cache_size=int(cache["num_events"]),
                order_by=order,
                num_partitions=int(c.get("num_partitions", 1)))}
        return {"": dedupe_exact(ds, c["fields"], order_by=order)}
    if t == "reduce":
        if c.get("impl") == "sorted":
            from vector_ray.stages.sorted_ops import reduce_sorted

            return {"": reduce_sorted(
                ds, group_by=c["group_by"],
                merge_strategies=c.get("merge_strategies"),
                order_by=c.get("order_by", ("conv_id", "turn_idx")),
                timestamp_fields=c.get("timestamp_fields", ("ts",)),
            )}
        return {"": reduce_stage(
            ds, group_by=c["group_by"],
            merge_strategies=c.get("merge_strategies"),
            order_by=c.get("order_by"),
            timestamp_fields=c.get("timestamp_fields", ("ts",)),
            window_ms=c.get("window_ms"),
            starts_when=c.get("starts_when"),
            ends_when=c.get("ends_when"),
            max_events=c.get("max_events"),
        )}
    if t == "aggregate":
        from vector_ray.stages.aggregate import aggregate_stage

        return {"": aggregate_stage(
            ds, series_keys=c["series_keys"], value_col=c.get("value_col", "value"),
            ts_col=c.get("ts_col", "ts"), interval_ms=c.get("interval_ms", 10_000),
            mode=c.get("mode", "sum"), kind_col=c.get("kind_col"),
        )}
    if t == "throttle":
        if c.get("impl") == "sorted":
            from vector_ray.stages.sorted_ops import throttle_sorted

            return {"": throttle_sorted(
                ds, threshold=c["threshold"], window_secs=c.get("window_secs", 1.0),
                key_field=c.get("key_field"), ts_col=c.get("ts_col", "ts"),
                order_by=c.get("order_by", ()), exclude=c.get("exclude"),
            )}
        return {"": throttle_stage(
            ds, threshold=c["threshold"], window_secs=c.get("window_secs", 1.0),
            key_field=c.get("key_field"), ts_col=c.get("ts_col", "ts"),
            order_by=c.get("order_by", ()), exclude=c.get("exclude"),
        )}
    if t == "tag_cardinality_limit":
        return {"": tag_cardinality_limit(
            ds, c["tags"], value_limit=c.get("value_limit", 500),
            order_col=c.get("order_col", "ts"),
            action=c.get("action", "drop_tag"),
            mode=c.get("mode", "exact"),
        )}
    if t == "log_to_metric":
        specs = [MetricSpec(**m) for m in c["metrics"]]
        return {"": log_to_metric(ds, specs, ts_col=c.get("ts_col", "ts"))}
    if t == "metric_to_log":
        return {"": metric_to_log(ds)}
    if t == "hash_replace":
        return {"": hash_replace(ds, c["keys"],
                                 keep_original=c.get("keep_original", False),
                                 sample_rate=c.get("sample_rate"))}
    if t == "enrich":
        tbl = tables[c["table"]]
        from vector_ray.enrichment.cidr import CidrTable, enrich_cidr
        from vector_ray.enrichment.mmdb import MmdbTable, enrich_mmdb

        if isinstance(tbl, MmdbTable):
            return {"": enrich_mmdb(
                ds, tbl.buf, ip_field=c["key_field"],
                select=c["select"], prefix=c.get("prefix", ""))}
        if isinstance(tbl, CidrTable):
            return {"": enrich_cidr(
                ds, tbl, ip_field=c["key_field"],
                select=c.get("select"), prefix=c.get("prefix", ""))}
        return {"": enrich(
            ds, tbl, key_field=c["key_field"],
            batch_key=c.get("batch_key", c["key_field"]),
            select=c["select"], case_sensitive=c.get("case_sensitive", True),
            prefix=c.get("prefix", ""), concurrency=tuple(c.get("concurrency", (1, 8))),
        )}
    # --- training-data ML family as YAML components (beyond the
    # reference; the Python API in vector_ray/ml/ is the primary
    # surface, these make end-to-end prep pipelines CLI-runnable) ---
    if t == "funnel":
        from vector_ray.stages.funnel import funnel

        steps = c.get("steps")
        if not steps:
            raise ConfigError(
                f"funnel component {spec.name!r} needs `steps`")
        out = funnel(ds, entity_col=c.get("entity_col", "user_id"),
                     ts_col=c.get("ts_col", "ts"),
                     step_col=c.get("step_col", "event_type"),
                     steps=list(steps))
        return {"": rd.from_arrow(out)}
    if t == "cohort_retention":
        from vector_ray.stages.funnel import cohort_retention

        return {"": cohort_retention(
            ds, entity_col=c.get("entity_col", "user_id"),
            ts_col=c.get("ts_col", "ts"),
            bucket=int(c["bucket"]))}
    if t == "bpe_apply":
        from vector_ray.ml.bpe import apply_merges, to_symbols
        from vector_ray.ml.bpe import token_count as bpe_token_count

        merges = c.get("merges")
        if not merges:
            raise ConfigError(
                f"bpe_apply component {spec.name!r} needs `merges` "
                "(list of 'a b' pair strings in rank order)")
        out = apply_merges(
            to_symbols(ds, text_col=c.get("text_col", "text")),
            [str(m) for m in merges])
        if c.get("count_tokens", True):
            out = bpe_token_count(out)
        return {"": out}
    if t == "exact_dedup":
        from vector_ray.ml.dedup import exact_dedup_docs

        return {"": exact_dedup_docs(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            hash=c.get("hash", "fast"))}
    if t == "minhash_dedup":
        from vector_ray.ml.dedup import minhash_lsh_dedup

        deduped, _clusters = minhash_lsh_dedup(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            num_hashes=c.get("num_hashes", 128),
            bands=c.get("bands", 32),
            shingle_n=c.get("shingle_n", 3),
            threshold=c.get("threshold", 0.8),
            seed=c.get("seed", 42),
            verify=c.get("verify", "jaccard"),
            verify_in=c.get("verify_in", "auto"),
            components=c.get("components", "driver"))
        return {"": deduped}
    if t in ("quality_score", "lang_id", "token_count",
             "doc_fingerprint"):
        from vector_ray.ml import text as _mltext

        fn = getattr(_mltext, t)
        kw = {"text_col": c.get("text_col", "text")}
        if t == "lang_id" and "concurrency" in c:
            kw["concurrency"] = tuple(c["concurrency"])
        if t == "token_count" and "pattern" in c:
            kw["pattern"] = c["pattern"]
        if t == "doc_fingerprint" and "window" in c:
            kw["window"] = c["window"]
        return {"": fn(ds, **kw)}
    if t == "window_functions":
        from vector_ray.stages.window_fns import window_functions

        return {"": window_functions(
            ds, keys=c["keys"], order_by=c["order_by"],
            value_col=c["value_col"],
            rolling_window=c.get("rolling_window", 4),
            rank_col=c.get("rank_col"),
            dense_rank_col=c.get("dense_rank_col"),
            ntile=c.get("ntile"),
            ntile_col=c.get("ntile_col", "ntile"),
            percent_rank_col=c.get("percent_rank_col"),
            cume_dist_col=c.get("cume_dist_col"),
            first_value_col=c.get("first_value_col"),
            lag_offset=c.get("lag_offset", 1),
            lead_offset=c.get("lead_offset", 1),
            nth_value=c.get("nth_value"),
            nth_value_col=c.get("nth_value_col", "nth_value"),
            last_value_col=c.get("last_value_col"))}
    if t == "stratified_sample":
        from vector_ray.stages.sample import stratified_sample

        return {"": stratified_sample(
            ds, keys=c["keys"], frac=tuple(c.get("frac", (1, 10))),
            id_col=c["id_col"])}
    if t == "token_counts":
        from vector_ray.ml.vocab import token_counts

        return {"": token_counts(
            ds, c.get("text_col", "text"),
            pattern=c.get("pattern", " "),
            min_count=c.get("min_count", 1), top_n=c.get("top_n"))}
    if t == "top_terms":
        from vector_ray.ml.vocab import top_terms

        return {"": top_terms(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"), k=c.get("k", 3),
            pattern=c.get("pattern", " "))}
    if t == "kmeans":
        from vector_ray.ml.kmeans import kmeans

        labeled, _cents = kmeans(
            ds, c["k"], vec_col=c.get("vec_col", "embedding"),
            id_col=c.get("id_col", "vec_id"),
            n_iter=c.get("n_iter", 10))
        return {"": labeled}
    if t == "pivot":
        from vector_ray.stages.pivot import pivot

        return {"": pivot(ds, keys=c["keys"], pivot_col=c["pivot_col"],
                          value_col=c["value_col"],
                          columns=c["columns"],
                          agg=c.get("agg", "sum"))}
    if t == "grouped_corr":
        from vector_ray.stages.stats import grouped_corr

        return {"": grouped_corr(ds, keys=c["keys"], x=c["x"],
                                 y=c["y"])}
    if t == "global_topk":
        from vector_ray.stages.topk import global_topk

        return {"": global_topk(ds, k=int(c["k"]), keys=c["keys"],
                                descending=c.get("descending"))}
    if t == "unpivot":
        from vector_ray.stages.pivot import unpivot

        return {"": unpivot(ds, keys=c["keys"],
                            value_cols=c["value_cols"],
                            var_col=c.get("var_col", "variable"),
                            value_col=c.get("value_col", "value"))}
    if t == "rollup":
        from vector_ray.stages.pivot import rollup

        return {"": rollup(ds, keys=c["keys"],
                           value_col=c["value_col"],
                           total_marker=c.get("total_marker",
                                              "__all__"))}
    if t == "cube":
        from vector_ray.stages.pivot import cube

        return {"": cube(ds, keys=c["keys"],
                         value_col=c["value_col"],
                         total_marker=c.get("total_marker",
                                            "__all__"))}
    if t == "grouping_sets":
        from vector_ray.stages.pivot import grouping_sets

        return {"": grouping_sets(ds, keys=c["keys"],
                                  value_col=c["value_col"],
                                  masks=c["masks"],
                                  total_marker=c.get("total_marker",
                                                     "__all__"))}
    if t == "time_range_sum":
        from vector_ray.stages.window_fns import time_range_sum

        return {"": time_range_sum(
            ds, keys=c["keys"], ts_col=c["ts_col"],
            value_col=c["value_col"], preceding=int(c["preceding"]),
            following=int(c.get("following", 0)),
            tiebreak=c.get("tiebreak"),
            out_col=c.get("out_col", "range_sum"),
            impl=c.get("impl", "fused"))}
    if t == "gopher_filter":
        from vector_ray.ml.gopher import gopher_filter, gopher_stats

        fn = gopher_stats if c.get("stats_only") else gopher_filter
        return {"": fn(ds, text_col=c.get("text_col", "text"))}
    if t == "c4_clean":
        from vector_ray.ml.c4 import c4_clean

        return {"": c4_clean(
            ds, text_col=c.get("text_col", "text"),
            min_words=int(c.get("min_words", 5)),
            min_lines=int(c.get("min_lines", 3)))}
    if t == "string_agg":
        from vector_ray.stages.sorted_ops import concat_sorted

        return {"": concat_sorted(
            ds, group_by=c["group_by"], value_col=c["value_col"],
            order_by=c["order_by"], sep=c.get("sep", " "),
            sum_cols=c.get("sum_cols", ()),
            count_field=c.get("count_field", "events"))}
    if t == "expect":
        from vector_ray.stages.expect import expect as _expect

        res = _expect(ds, c["rules"])
        return {"passed": res.passed, "quarantine": res.quarantined}
    if t == "zorder_cluster":
        from vector_ray.stages.zorder import cluster_by_zorder

        return {"": cluster_by_zorder(
            ds, c["cols"], bits=int(c.get("bits", 16)),
            keep_key=bool(c.get("keep_key", False)))}
    if t == "cooccurrence_edges":
        from vector_ray.stages.graph import cooccurrence_edges

        return {"": cooccurrence_edges(
            ds, group_col=c["group_col"], item_col=c["item_col"])}
    if t in ("pagerank", "bfs_levels"):
        import pyarrow as _pa
        import ray.data as _rd

        sc, dc = c.get("src_col", "src"), c.get("dst_col", "dst")
        if (sc, dc) != ("src", "dst"):
            # rename inside a UDF — Dataset.rename_columns breaks on
            # pandas-backed blocks (CLAUDE.md invariant)
            def _ren(tb: "_pa.Table") -> "_pa.Table":
                return _pa.table({"src": tb[sc], "dst": tb[dc]})

            ds = ds.map_batches(_ren, batch_format="pyarrow",
                                batch_size=None)
        if t == "pagerank":
            from vector_ray.stages.graph import pagerank

            return {"": _rd.from_arrow(pagerank(
                ds, iters=int(c.get("iters", 5)),
                damping=int(c.get("damping", 85)),
                impl=c.get("impl", "auto")))}
        from vector_ray.stages.graph import bfs_levels

        return {"": _rd.from_arrow(bfs_levels(
            ds, sources=c["sources"],
            max_hops=int(c.get("max_hops", 4)),
            impl=c.get("impl", "broadcast")))}
    if t == "triangle_counts":
        from vector_ray.stages.graph import triangle_counts

        return {"": triangle_counts(
            ds, bloom_prefilter=bool(c.get("bloom_prefilter", True)))}
    if t == "running_minmax":
        from vector_ray.stages.sorted_ops import running_minmax

        return {"": running_minmax(
            ds, keys=c["keys"], order_by=c["order_by"],
            value_col=c["value_col"], op=c.get("op", "min"),
            out_col=c.get("out_col"))}
    if t == "cusum":
        from vector_ray.stages.anomaly import cusum_flags

        return {"": cusum_flags(
            ds, keys=c["keys"], order_by=c["order_by"],
            value_col=c["value_col"], k_ref=int(c["k_ref"]),
            h=int(c["h"]),
            flag_col=c.get("flag_col", "cusum_alarm"),
            cusum_col=c.get("cusum_col", "cusum"))}
    if t == "rolling_anomaly":
        from vector_ray.stages.anomaly import rolling_anomaly

        return {"": rolling_anomaly(
            ds, keys=c["keys"], order_by=c["order_by"],
            value_col=c["value_col"],
            window=int(c.get("window", 20)),
            k_sigma=int(c.get("k_sigma", 3)),
            min_rows=int(c.get("min_rows", 3)),
            flag_col=c.get("flag_col", "is_anomaly"))}
    if t == "transition_counts":
        import ray.data as _rd

        from vector_ray.stages.paths import transition_counts

        return {"": _rd.from_arrow(transition_counts(
            ds, key=c["key"], order_by=c["order_by"],
            state_col=c["state_col"]))}
    if t == "cap_per_group":
        from vector_ray.ml.mixing import cap_per_group

        return {"": cap_per_group(
            ds, group_col=c["group_col"], id_col=c["id_col"],
            cap=int(c["cap"]), hash=c.get("hash", "md5"))}
    if t == "grouped_bitops":
        from vector_ray.stages.stats import grouped_bitops

        return {"": grouped_bitops(
            ds, keys=c["keys"], x=c["x"], flag=c.get("flag"))}
    if t == "grouped_gini":
        from vector_ray.stages.stats import grouped_gini

        return {"": grouped_gini(ds, keys=c["keys"], x=c["x"])}
    if t == "chi2_independence":
        import ray.data as _rd

        from vector_ray.stages.stats import chi2_independence

        return {"": _rd.from_arrow(chi2_independence(
            ds, a_col=c["a_col"], b_col=c["b_col"]))}
    if t == "time_weighted_avg":
        from vector_ray.stages.stats import time_weighted_avg

        return {"": time_weighted_avg(
            ds, keys=c["keys"], ts_col=c["ts_col"],
            value_col=c["value_col"],
            out_col=c.get("out_col", "twa_micro"))}
    if t == "benford_deviation":
        from vector_ray.stages.stats import benford_deviation

        return {"": benford_deviation(
            ds, keys=c["keys"], value_col=c["value_col"])}
    if t == "grouped_share":
        from vector_ray.stages.stats import grouped_share

        return {"": grouped_share(
            ds, key=c["key"], value_col=c["value_col"],
            out_col=c.get("out_col", "share_micro"))}
    if t == "fuzzy_pairs":
        from vector_ray.ml.fuzzy import fuzzy_pairs

        return {"": fuzzy_pairs(
            ds, id_col=c.get("id_col", "doc_id"),
            text_col=c.get("text_col", "text"),
            max_len=int(c.get("max_len", 64)))}
    if t == "inverted_index":
        from vector_ray.ml.vocab import inverted_index

        return {"": inverted_index(
            ds, id_col=c.get("id_col", "doc_id"),
            text_col=c.get("text_col", "text"),
            pattern=c.get("pattern", " "),
            max_postings=int(c.get("max_postings", 32)))}
    if t == "weighted_median":
        import ray.data as _rd

        from vector_ray.stages.stats import grouped_weighted_median

        return {"": _rd.from_arrow(grouped_weighted_median(
            ds, key=c["key"], value_col=c["value_col"],
            weight_col=c["weight_col"], tiebreak=c["tiebreak"],
            out_col=c.get("out_col", "wmedian")))}
    if t == "winsorize":
        from vector_ray.stages.stats import winsorize_group

        return {"": winsorize_group(
            ds, key=c["key"], value_col=c["value_col"],
            lo_q=tuple(c.get("lo_q", (1, 20))),
            hi_q=tuple(c.get("hi_q", (19, 20))),
            out_col=c.get("out_col", "winsorized"))}
    if t == "sequence_match":
        from vector_ray.stages.paths import sequence_match

        return {"": sequence_match(
            ds, key=c["key"], order_by=c["order_by"],
            state_col=c["state_col"], pattern=c["pattern"],
            alphabet=c["alphabet"], other=c.get("other", "_"))}
    if t == "assign_splits":
        from vector_ray.ml.mixing import assign_splits

        return {"": assign_splits(
            ds, id_col=c.get("id_col", "doc_id"),
            splits=[(s["name"], int(s["part"]))
                    for s in c["splits"]],
            denom=int(c.get("denom", 1_000_000)),
            hash=c.get("hash", "md5"),
            out_col=c.get("out_col", "split"))}
    if t == "rolling_stat":
        from vector_ray.stages.rolling import rolling_stat

        return {"": rolling_stat(
            ds, keys=c["keys"], order_by=c["order_by"],
            value_col=c["value_col"], window=int(c["window"]),
            stat=c.get("stat", "median"))}
    if t == "scd2":
        from vector_ray.stages.scd import scd2_intervals

        return {"": scd2_intervals(
            ds, keys=c["keys"], ts_col=c["ts_col"],
            value_col=c["value_col"],
            tiebreak=c.get("tiebreak", ()))}
    if t == "spearman_corr":
        from vector_ray.stages.stats import spearman_corr

        return {"": spearman_corr(
            ds, keys=c["keys"], x=c["x"], y=c["y"],
            tiebreak=c["tiebreak"])}
    if t == "log_templates":
        from vector_ray.stages.templates import (DEFAULT_RULES,
                                                 log_templates)

        rules = [(r["pattern"], r["replacement"])
                 for r in c["rules"]] if "rules" in c \
            else DEFAULT_RULES
        return {"": log_templates(
            ds, text_col=c.get("text_col", "text"),
            k=c.get("k", 50), rules=rules)}
    if t == "gap_fill":
        from vector_ray.stages.gapfill import gap_fill

        return {"": gap_fill(
            ds, keys=c["keys"], ts_col=c["ts_col"],
            value_col=c["value_col"], every_us=int(c["every_us"]),
            agg=c.get("agg", "sum"))}
    if t == "rank_sum_u2":
        import ray.data as _rd

        from vector_ray.stages.stats import rank_sum_u2

        return {"": _rd.from_arrow(rank_sum_u2(
            ds, value_col=c["value_col"], side_col=c["side_col"],
            side_a=c["side_a"], side_b=c["side_b"]))}
    if t == "ks_statistic":
        import ray.data as _rd

        from vector_ray.stages.stats import ks_statistic

        return {"": _rd.from_arrow(ks_statistic(
            ds, value_col=c["value_col"], side_col=c["side_col"],
            side_a=c["side_a"], side_b=c["side_b"]))}
    if t == "interval_union_length":
        from vector_ray.stages.windows import interval_union_length

        return {"": interval_union_length(
            ds, key=c["key"], start_col=c["start_col"],
            end_col=c["end_col"],
            out_col=c.get("out_col", "covered"))}
    if t == "max_streak":
        from vector_ray.stages.paths import max_streak

        return {"": max_streak(ds, key=c["key"],
                               seq_col=c["seq_col"],
                               out_col=c.get("out_col", "max_streak"))}
    if t == "profile":
        import ray.data as _rd

        from vector_ray.stages.profile import profile as _profile

        return {"": _rd.from_arrow(_profile(ds, c["columns"]))}
    if t == "exact_quantiles":
        import ray.data as _rd

        from vector_ray.stages.quantile_exact import grouped_quantiles

        qs = {name: (int(nd[0]), int(nd[1]))
              for name, nd in c.get("qs", {"p50": (1, 2)}).items()}
        out_df = grouped_quantiles(ds, keys=c["keys"],
                                   value_col=c["value_col"], qs=qs)
        return {"": _rd.from_pandas(out_df)}
    if t == "lm_score":
        from vector_ray.ml.lm_score import lm_score

        return {"": lm_score(ds, c.get("text_col", "text"),
                             c.get("id_col", "doc_id"),
                             pattern=c.get("pattern", " "))}
    if t == "sft_pairs":
        from vector_ray.ml.sft import conversation_pairs

        return {"": conversation_pairs(
            ds, conv_col=c.get("conv_col", "conv_id"),
            turn_col=c.get("turn_col", "turn_idx"),
            role_col=c.get("role_col", "role"),
            text_col=c.get("text_col", "text"),
            target_role=c.get("target_role", "assistant"))}
    if t == "chunk_documents":
        from vector_ray.ml.chunking import chunk_documents

        return {"": chunk_documents(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            window=c.get("window", 64), stride=c.get("stride"),
            sep=c.get("sep", " "))}
    if t == "repetition_filter":
        from vector_ray.ml.repetition import (repetition_filter,
                                              repetition_stats)

        fn = (repetition_stats if c.get("stats_only")
              else repetition_filter)
        return {"": fn(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"), sep=c.get("sep", " "))}
    if t == "mix_sources":
        from vector_ray.ml.mixing import mix_sources

        return {"": mix_sources(
            ds, weights={k: int(v) for k, v in c["weights"].items()},
            source_col=c.get("source_col", "source"),
            id_col=c.get("id_col", "doc_id"),
            hash=c.get("hash", "md5"))}
    if t == "weighted_sample":
        from vector_ray.ml.mixing import weighted_sample

        return {"": weighted_sample(
            ds, weight_col=c["weight_col"],
            id_col=c.get("id_col", "doc_id"),
            rate=tuple(c.get("rate", (1, 1))),
            hash=c.get("hash", "md5"))}
    if t == "span_dedup":
        from vector_ray.ml.span_dedup import span_dedup

        return {"": span_dedup(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            window=c.get("window", 32), sep=c.get("sep", " "))}
    if t == "pack_documents":
        from vector_ray.ml.packing import pack_documents

        return {"": pack_documents(
            ds, text_col=c.get("text_col", "text"),
            id_col=c.get("id_col", "doc_id"),
            budget=c.get("budget", 2048), sep=c.get("sep", " "))}
    if t == "conv_dedup":
        from vector_ray.ml.dedup import conv_exact_dedup

        return {"": conv_exact_dedup(
            ds, conv_col=c.get("conv_col", "conv_id"),
            turn_col=c.get("turn_col", "turn_idx"),
            role_col=c.get("role_col", "role"),
            text_col=c.get("text_col", "text"),
            turn_digest=c.get("turn_digest", "md5"))}
    if t == "media_decode":
        from vector_ray.ml.multimodal import decode_media

        return {"": decode_media(
            ds, decode_fn=c.get("decode_fn", "codec"),
            batch_size=c.get("batch_size", 64))}
    if t == "image_resize":
        from vector_ray.ml.multimodal import resize_images

        return {"": resize_images(
            ds, target_w=c.get("target_w", 224),
            target_h=c.get("target_h", 224),
            resize_fn=c.get("resize_fn", "codec"),
            batch_size=c.get("batch_size", 64))}
    raise ConfigError(f"unknown transform type {t!r}")


def _run_sink(spec: ComponentSpec, ds: Dataset, variables: dict) -> int:
    c = spec.config
    if spec.type == "parquet":
        # template partitioning: strftime-rendered ts columns become
        # partition cols (KeyPartitioner/Template analogue,
        # src/sinks/util/partitioner.rs:5-46, src/template.rs:149-168)
        part_cols = list(c.get("partition_cols", ()))
        for t in c.get("strftime_partitions", []):
            from vector_ray.sinks.parquet import add_strftime_column

            ds = add_strftime_column(ds, t.get("col", "ts"), t["fmt"], t["as"])
            part_cols.append(t["as"])
        sink = ParquetSink(c["path"].format(**variables),
                           partition_cols=part_cols,
                           name=spec.name)
        return sink.write(ds, inputs=spec.inputs)
    if spec.type == "file":
        # reference `file` sink with codec selection
        # (src/sinks/file/mod.rs; lib/codecs/src/encoding/format/)
        from vector_ray.sinks.textfile import write_text_sink

        enc_cfg = c.get("encoding", {})
        encoding = enc_cfg.get("codec", "json") if isinstance(enc_cfg, dict) \
            else str(enc_cfg)
        kwargs = {k: v for k, v in (enc_cfg.items()
                                    if isinstance(enc_cfg, dict) else ())
                  if k != "codec"}
        return write_text_sink(ds, c["path"].format(**variables),
                               encoding=encoding, **kwargs)
    if spec.type == "csv":
        path = c["path"].format(**variables)
        mat = ds.materialize()
        mat.write_csv(path)
        return mat.count()
    if spec.type == "json":
        path = c["path"].format(**variables)
        mat = ds.materialize()
        mat.write_json(path)
        return mat.count()
    if spec.type == "blackhole":
        return ds.count()
    if spec.type == "console":
        rows = ds.take(int(c.get("limit", 10)))
        for r in rows:
            print(r)
        return len(rows)
    raise ConfigError(f"unknown sink type {spec.type!r}")


def run_topology_sharded(
    topo: Topology,
    *,
    variables: dict[str, str] | None = None,
    num_shards: int | None = None,
) -> RunResult:
    """Shard-resumable execution: the source file list splits into
    shards; each shard runs the FULL DAG and lands in per-shard sink
    partition directories (``<sink>/shard=<i>/``) recorded in the sink
    manifest only after the whole shard's writes succeed.  A rerun
    skips shards every sink already recorded — the batch rebuild of
    Vector's checkpoint/ack durability (SURVEY §4; manifest docs in
    state/manifest.py).

    Requires exactly one source of type parquet/transcripts; shards are
    its part files (the natural partition at 100 TB: one shard per
    input object / key range).
    """
    import glob as _glob
    import os as _os

    variables = variables or {}
    sources = [c for c in topo.components.values() if c.kind == "source"]
    if len(sources) != 1:
        raise ConfigError("sharded run requires exactly one source")
    src = sources[0]
    if src.type == "transcripts":
        from vector_ray.data.transcripts import ensure_transcripts

        sf_dir = src.config.get("sf_dir", variables.get("sf_dir", "/root/testdata/sf0.001"))
        if isinstance(sf_dir, str):
            sf_dir = sf_dir.format(**variables)
        base = ensure_transcripts(sf_dir)
    elif src.type == "parquet":
        base = src.config["path"].format(**variables)
    else:
        raise ConfigError(f"sharded run unsupported for source type {src.type!r}")
    files = sorted(_glob.glob(_os.path.join(base, "*.parquet"))) or [base]
    n = num_shards or len(files)
    shards = [files[i::n] for i in range(n)]
    shards = [s for s in shards if s]

    from vector_ray.sinks.parquet import ParquetSink
    from vector_ray.state.manifest import RunManifest

    tables = {
        tname: FileTable(tcfg["path"].format(**variables), tcfg.get("schema"))
        for tname, tcfg in topo.enrichment_tables.items()
    }

    result = RunResult()
    total: dict[str, int] = {}
    parquet_sinks = {
        c.name: c for c in topo.sinks() if c.type == "parquet"
    }
    all_resumable = parquet_sinks and all(
        c.type == "parquet" for c in topo.sinks()
    )
    consumers: dict[str, int] = {}
    for comp in topo.components.values():
        for ref in comp.inputs:
            up = ref.split(".", 1)[0]
            consumers[up] = consumers.get(up, 0) + 1

    for i, shard_files in enumerate(shards):
        pid = f"shard-{i:05d}"
        # skip only when EVERY sink can be restored from a manifest —
        # blackhole counts are not durable, so their presence forces a
        # recompute of incomplete shards
        done = all_resumable and all(
            RunManifest(c.config["path"].format(**variables)).is_complete(pid)
            for c in parquet_sinks.values()
        )
        if done:
            for c in parquet_sinks.values():
                m = RunManifest(c.config["path"].format(**variables))
                total[c.name] = total.get(c.name, 0) + m.row_count(pid)
            continue

        ports: dict[str, dict[str, Dataset]] = {}
        for name in topo.order:
            spec = topo.components[name]
            if spec.kind == "source":
                ports[name] = {"": rd.read_parquet(
                    shard_files, columns=spec.config.get("columns"))}
            elif spec.kind == "transform":
                ins_list = [ports[r.partition(".")[0]][r.partition(".")[2]]
                            for r in spec.inputs]
                ins = ins_list[0] if spec.type in _TWO_INPUT_TRANSFORMS \
                    else _union(ins_list)
                ports[name] = _build_transform(spec, ins, tables,
                                               ins_list=ins_list)
                if consumers.get(name, 0) > 1:
                    # fanout: execute this node once per shard, not once
                    # per consumer (mirrors run_topology's materialize)
                    ports[name] = {p: d.materialize()
                                   for p, d in ports[name].items()}
            else:
                ins = _union([ports[r.partition(".")[0]][r.partition(".")[2]]
                              for r in spec.inputs])
                if spec.type == "parquet":
                    out_root = spec.config["path"].format(**variables)
                    sink = ParquetSink(_os.path.join(out_root, f"shard={i:05d}"),
                                       partition_cols=spec.config.get("partition_cols", ()),
                                       name=name)
                    rows = sink.write(ins, partition_id=pid, inputs=shard_files)
                    # record at the sink ROOT manifest for resume checks
                    root_m = RunManifest(out_root, name)
                    if not root_m.is_complete(pid):
                        root_m.mark_complete(pid, inputs=shard_files,
                                             row_count=rows, output_files=[f"shard={i:05d}"])
                    total[name] = total.get(name, 0) + rows
                elif spec.type == "blackhole":
                    total[name] = total.get(name, 0) + ins.count()
                else:
                    raise ConfigError(f"sharded run unsupported sink {spec.type!r}")
    result.sink_counts = total
    return result
