"""Declarative behavior corpus — the tests/behavior/transforms/*.toml
analogue (route.toml:1-80 shape), run through the real component graph."""

import yaml

from vector_ray.topology import Topology
from vector_ray.topology.unit_test import run_unit_tests

TOPO = Topology.from_yaml("""
sources:
  ingest: {type: transcripts}
transforms:
  parse:
    type: remap
    inputs: [ingest]
    program: transcript_parse
    drop_on_error: true
    reroute_dropped: true
  split:
    type: route
    inputs: [parse]
    route:
      errors: '.level == "error"'
      tool_calls: '.tool != ""'
      assistant: '.role == "assistant"'
sinks:
  out: {type: blackhole, inputs: [split.errors]}
""")

ROWS = [
    {"conv_id": "c", "turn_idx": 0, "role": "user",
     "text": "2024-01-01T00:00:00Z level=error tool=bash latency_ms=5 msg=x",
     "tool": "bash", "ts": "2024-01-01"},
    {"conv_id": "c", "turn_idx": 1, "role": "assistant",
     "text": "free text", "tool": "", "ts": "2024-01-01"},
    {"conv_id": "c", "turn_idx": 2, "role": "user",
     "text": "level= tool latency_ms=oops {broken json x", "tool": "", "ts": "2024-01-01"},
]

CORPUS = yaml.safe_load("""
tests:
  - name: error rows reach the errors port with parsed level
    insert_at: parse
    outputs:
      - extract_from: split.errors
        count: 1
        conditions: ['.level == "error"', '.latency_ms == 5']
      - extract_from: split.assistant
        count: 1
        conditions: ['.role == "assistant"']
      - extract_from: parse.dropped
        count: 1
        conditions: ['.metadata_dropped_reason == "error"']
  - name: multi-match clones into both ports
    insert_at: parse
    outputs:
      - extract_from: split.errors
        count: 1
      - extract_from: split.tool_calls
        count: 1
    no_outputs_from: []
""")


def test_behavior_corpus_passes():
    tests = [dict(t, input_rows=ROWS) for t in CORPUS["tests"]]
    results = run_unit_tests(TOPO, tests)
    for r in results:
        assert r.passed, f"{r.name}: {r.failures}"


def test_behavior_corpus_detects_failure():
    bad = [{
        "name": "wrong expectation",
        "insert_at": "parse",
        "input_rows": ROWS,
        "outputs": [{"extract_from": "split.errors", "count": 99}],
        "no_outputs_from": ["split.assistant"],
    }]
    res = run_unit_tests(TOPO, bad)[0]
    assert not res.passed
    assert len(res.failures) == 2  # bad count + non-empty port


def test_vrl_test_input_toml_canary():
    """Mirror of tests/behavior/transforms/vrl_test_input.toml
    (canary): the test INPUT is built by a VRL program, the output
    condition checks a nested path and a timestamp type."""
    from vector_ray.topology import Topology
    from vector_ray.topology.unit_test import run_unit_tests

    topo = Topology.from_yaml("""
sources:
  stub: {type: transcripts, sf_dir: /root/testdata/sf0.001}
transforms:
  canary:
    type: remap
    inputs: [stub]
    source: ".passthrough = true"
sinks:
  out: {type: blackhole, inputs: [canary]}
""")
    tests = [{
        "name": "canary",
        "inputs": [{
            "insert_at": "canary",
            "type": "vrl",
            "source": '. = {"a": {"b": "c"}, "d": now()}',
        }],
        "outputs": [{
            "extract_from": "canary",
            "conditions": [{
                "type": "vrl",
                "source": '.a.b == "c" && is_timestamp(.d)',
            }],
        }],
    }]
    results = run_unit_tests(topo, tests)
    assert results[0].passed, results[0].failures
