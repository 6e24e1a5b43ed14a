"""native_json codec (functions/native_json.py) vs the reference's own
fixture corpus (lib/codecs/tests/data/native_encoding/json/ — 1027
generated log/metric/trace events) plus the is_trace condition and the
topology source/sink wiring."""

import glob
import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.functions.native_json import (encode_native_json,
                                              encode_native_json_lines,
                                              native_metrics_to_table,
                                              native_traces_to_table,
                                              parse_native_json,
                                              read_native_json)

_FIXTURE_DIR = "/root/reference/lib/codecs/tests/data/native_encoding/json"
_has_fixtures = os.path.isdir(_FIXTURE_DIR)


class TestParse:
    # native_json.rs: parses_top_level_arrays
    def test_top_level_array(self):
        frame = json.dumps([{"log": {"a": "b", "c": "d"}},
                            {"log": {"foo": "bar", "baz": "quux"}}])
        events = parse_native_json(frame)
        assert events == [("log", {"a": "b", "c": "d"}),
                          ("log", {"foo": "bar", "baz": "quux"})]

    def test_empty_frame_yields_no_events(self):
        assert parse_native_json("") == []
        assert parse_native_json("   \n") == []

    def test_lossy_utf8(self):
        frame = b'{"log": {"m": "ok"}}' + b""  # valid passes through
        assert parse_native_json(frame) == [("log", {"m": "ok"})]

    def test_unknown_kind_rejected(self):
        with pytest.raises(ValueError, match="unknown native"):
            parse_native_json('{"bogus": {}}')

    def test_roundtrip(self):
        ev = {"name": "x", "kind": "absolute", "gauge": {"value": 1.5}}
        line = encode_native_json("metric", ev)
        assert parse_native_json(line) == [("metric", ev)]


@pytest.mark.skipif(not _has_fixtures,
                    reason="reference fixture corpus not present")
class TestReferenceFixtureCorpus:
    def _load(self):
        return sorted(glob.glob(os.path.join(_FIXTURE_DIR, "*.json")))

    def test_all_fixtures_parse_and_roundtrip(self):
        paths = self._load()
        assert len(paths) > 1000
        kinds = {"log": 0, "metric": 0, "trace": 0}
        for p in paths:
            with open(p, "rb") as f:
                raw = f.read()
            events = parse_native_json(raw)
            assert len(events) == 1, p
            kind, inner = events[0]
            kinds[kind] += 1
            # decode → encode → decode must be value-identical
            re = parse_native_json(encode_native_json(kind, inner))
            assert re == [(kind, inner)], p
        # the generated corpus covers logs and metrics (its generator
        # emits no trace fixtures; traces are covered by our own tests)
        assert kinds["log"] > 0 and kinds["metric"] > 0

    def test_metric_projection_over_corpus(self):
        paths = self._load()
        ds = read_native_json(paths)
        mt = native_metrics_to_table(ds).to_pandas()
        assert len(mt) > 0
        assert set(mt["mtype"].dropna()) <= {
            "counter", "gauge", "set", "distribution",
            "aggregated_histogram", "aggregated_summary", "sketch"}
        assert mt["kind"].isin(["incremental", "absolute"]).all()
        # scalar metrics carry the scalar, structured ones stay null
        scalar = mt[mt["mtype"].isin(["counter", "gauge"])]
        assert scalar["value"].notna().all()


class TestIsTrace:
    def test_is_trace_condition(self):
        from vector_ray.conditions import compile_condition

        log_t = pa.table({"text": ["a"]})
        metric_t = pa.table({"mtype": ["counter"], "value": [1.0]})
        trace_t = pa.table({"ttype": ["trace"], "payload": ["{}"]})
        for src, want in (("is_log()", (True, False, False)),
                          ("is_metric()", (False, True, False)),
                          ("is_trace()", (False, False, True))):
            cond = compile_condition(src)
            got = (cond(log_t)[0].as_py(), cond(metric_t)[0].as_py(),
                   cond(trace_t)[0].as_py())
            assert got == want, src

    def test_typed_condition_config(self):
        from vector_ray.conditions import compile_condition

        cond = compile_condition({"type": "is_trace",
                                  "source": "is_trace()"})
        assert cond(pa.table({"ttype": ["t"]}))[0].as_py() is True
        assert cond(pa.table({"x": [1]}))[0].as_py() is False

    def test_trace_projection(self, tmp_path):
        lines = [encode_native_json("trace", {"span": i})
                 for i in range(3)]
        lines.append(encode_native_json("log", {"m": "x"}))
        p = tmp_path / "native.ndjson"
        p.write_text("\n".join(lines) + "\n")
        tt = native_traces_to_table(
            read_native_json(str(p))).to_pandas()
        assert len(tt) == 3 and (tt["ttype"] == "trace").all()


class TestTopologyNativeJson:
    def test_source_and_route(self, tmp_path):
        from vector_ray.topology import Topology, run_topology

        lines = [encode_native_json("log", {"m": "hello"}),
                 encode_native_json("metric",
                                    {"name": "n", "kind": "absolute",
                                     "counter": {"value": 2.0}}),
                 encode_native_json("trace", {"span": 1})]
        src = tmp_path / "events.ndjson"
        src.write_text("\n".join(lines) + "\n")
        yaml_cfg = f"""
sources:
  native_in:
    type: native_json
    path: "{src}"
transforms:
  split:
    type: route
    inputs: [native_in]
    route:
      metrics: '.event_kind == "metric"'
      traces: '.event_kind == "trace"'
sinks:
  m_out:
    type: parquet
    inputs: [split.metrics]
    path: "{tmp_path}/m"
  t_out:
    type: parquet
    inputs: [split.traces]
    path: "{tmp_path}/t"
  rest:
    type: blackhole
    inputs: [split._unmatched]
"""
        topo = Topology.from_yaml(yaml_cfg)
        run_topology(topo)
        import pyarrow.parquet as pq

        m = pq.read_table(glob.glob(f"{tmp_path}/m/**/*.parquet",
                                    recursive=True))
        t = pq.read_table(glob.glob(f"{tmp_path}/t/**/*.parquet",
                                    recursive=True))
        assert m.num_rows == 1 and t.num_rows == 1
        assert json.loads(m["payload"][0].as_py())["name"] == "n"

    def test_sink_encoder_roundtrip(self, tmp_path):
        from vector_ray.sinks.textfile import encode_lines

        t = pa.table({
            "event_kind": ["log", "metric"],
            "payload": [json.dumps({"m": "x"}),
                        json.dumps({"name": "c", "kind": "incremental",
                                    "counter": {"value": 1.0}},
                                   sort_keys=True)],
        })
        lines = encode_lines(t, "native_json")
        back = [e for ln in lines for e in parse_native_json(ln)]
        assert back[0] == ("log", {"m": "x"})
        assert back[1][0] == "metric" and back[1][1]["name"] == "c"

    def test_sink_encoder_plain_log_table(self):
        t = pa.table({"msg": ["a", "b"], "n": [1, None]})
        lines = encode_native_json_lines(t).to_pylist()
        assert json.loads(lines[0]) == {"log": {"msg": "a", "n": 1}}
        assert json.loads(lines[1]) == {"log": {"msg": "b"}}
