"""Parse kernels + remap error policy (src/transforms/remap.rs semantics)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vector_ray.functions.grok import grok_to_regex
from vector_ray.functions.parse import (
    parse_grok,
    parse_json_fields,
    parse_key_value,
    parse_int,
    parse_timestamp,
)
from vector_ray.model import DROPPED_REASON, DROPPED_COMPONENT_ID
from vector_ray.pipelines.flagship import transcript_parse_program
from vector_ray.stages.remap import remap


def test_grok_compile():
    rx = grok_to_regex("%{INT:n} %{WORD:w}")
    assert rx == r"(?P<n>[+-]?\d+) (?P<w>\w+)"


def test_parse_grok_extract():
    col = pa.array(["42 foo", "nope", None])
    s = parse_grok(col, "^%{INT:n} %{WORD:w}$")
    assert pc.struct_field(s, "n").to_pylist() == ["42", None, None]
    assert pc.struct_field(s, "w").to_pylist() == ["foo", None, None]


def test_parse_json_fields():
    col = pa.array(
        ['{"a": 1, "b": {"c": "x"}}', "not json", '{"broken', '["array"]', None]
    )
    fields, attempted, ok = parse_json_fields(col, ["a", "b.c"], with_masks=True)
    assert fields["a"].to_pylist() == ["1", None, None, None, None]
    assert fields["b.c"].to_pylist() == ["x", None, None, None, None]
    assert attempted.to_pylist() == [True, False, True, False, False]
    assert ok.to_pylist() == [True, False, False, False, False]


def test_parse_key_value():
    col = pa.array(["event=call tool=bash duration=5", "other"])
    out = parse_key_value(col, ["event", "duration"])
    assert out["event"].to_pylist() == ["call", None]
    assert out["duration"].to_pylist() == ["5", None]


def test_parse_int_null_on_error():
    assert parse_int(pa.array(["5", "x", None])).to_pylist() == [5, None, None]


def test_parse_timestamp():
    out = parse_timestamp(pa.array(["2024-01-02T03:04:05", "bad"]))
    assert out[0].as_py().year == 2024
    assert out[1].as_py() is None


def _mini_table():
    return pa.table(
        {
            "conv_id": ["c", "c", "c", "c", "c"],
            "turn_idx": pa.array([0, 1, 2, 3, 4], pa.int32()),
            "role": ["user", "assistant", "tool", "user", "assistant"],
            "text": pa.array(
                [
                    "2024-01-01T00:00:00Z level=error tool=bash latency_ms=9 msg=boom",
                    '{"action": "invoke", "status": "ok", "latency_ms": 3, "args": {"q": "w"}}',
                    "event=tool_result tool=bash duration=7 status=ok",
                    "free text — passes through",
                    "level= tool latency_ms=oops {broken json xyz",
                ],
                pa.large_string(),
            ),
            "tool": ["bash", "", "bash", "", "Bash"],
            "ts": pa.array([0, 1, 2, 3, 4], pa.timestamp("us")),
        }
    )


def test_parse_program_columns():
    out, err, _msg = transcript_parse_program(_mini_table())
    assert out["level"].to_pylist() == ["error", None, None, None, None]
    assert out["latency_ms"].to_pylist() == [9, 3, None, None, None]
    assert out["action"].to_pylist() == [None, "invoke", None, None, None]
    assert out["status"].to_pylist() == [None, "ok", "ok", None, None]
    assert out["event"].to_pylist() == [None, None, "tool_result", None, None]
    assert out["duration"].to_pylist() == [None, None, 7, None, None]
    assert err.to_pylist() == [False, False, False, False, True]


def test_remap_keep_original():
    ds = rd.from_arrow(_mini_table())
    res = remap(ds, transcript_parse_program)
    out = res.primary.sort("turn_idx").to_pandas()
    assert len(out) == 5  # error row kept, original text unmodified
    assert out["text"].iloc[4].startswith("level= tool")
    assert "__remap_error" not in out.columns


def test_remap_drop_on_error():
    ds = rd.from_arrow(_mini_table())
    out = remap(ds, transcript_parse_program, drop_on_error=True).primary.to_pandas()
    assert len(out) == 4


def test_remap_reroute_dropped():
    ds = rd.from_arrow(_mini_table())
    res = remap(
        ds, transcript_parse_program, drop_on_error=True, reroute_dropped=True,
        component_id="p1",
    )
    dropped = res.dropped.to_pandas()
    assert len(dropped) == 1
    assert dropped[DROPPED_REASON].iloc[0] == "error"
    assert dropped[DROPPED_COMPONENT_ID].iloc[0] == "p1"
    assert len(res.primary.to_pandas()) == 4
