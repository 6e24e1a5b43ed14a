"""native (binary protobuf) codec — cross-checked against the
reference's 1024 paired fixtures (lib/codecs/tests/data/
native_encoding/{proto,json}: same event serialized both ways; the
reference's own roundtrip test pins that they decode identically)."""

import glob
import json
import os

import pytest

from vector_ray.functions.native_json import parse_native_json
from vector_ray.functions.native_proto import (encode_native,
                                               parse_native, read_native)

_FIXDIR = "/root/reference/lib/codecs/tests/data/native_encoding"

pytestmark = []


def _pairs():
    pbs = sorted(glob.glob(os.path.join(_FIXDIR, "proto", "*.pb")))
    return [(p, os.path.join(_FIXDIR, "json",
                             os.path.basename(p)[:-3] + ".json"))
            for p in pbs]


def _normalize_empty_sketch(events):
    """The reference's proto encoder omits the derived ``sum``/``avg``
    stats when an AgentDDSketch is EMPTY (count == 0): fixture 0605.pb
    (and 5 peers) carry only the ±DBL_MAX min/max sentinels on the
    wire while the paired JSON still shows the in-memory sum/avg — the
    information simply is not in the .pb, and the reference's own
    cross-format equality doesn't see sketch derived stats.  Zero them
    on both sides for empty sketches."""
    for _, inner in events:
        sk = (isinstance(inner, dict) and
              (inner.get("sketch") or {}).get("sketch", {})
              .get("AgentDDSketch"))
        if sk and sk.get("count") == 0:
            sk["sum"] = 0.0
            sk["avg"] = 0.0
    return events


@pytest.mark.skipif(not os.path.isdir(_FIXDIR),
                    reason="reference fixtures not on disk")
def test_all_reference_fixture_pairs_decode_identically():
    pairs = _pairs()
    assert len(pairs) >= 1000
    mismatches = []
    for pb_path, json_path in pairs:
        with open(pb_path, "rb") as f:
            got = _normalize_empty_sketch(parse_native(f.read()))
        with open(json_path, "r") as f:
            want = _normalize_empty_sketch(parse_native_json(f.read()))
        if got != want:
            mismatches.append((os.path.basename(pb_path), want, got))
    assert not mismatches, mismatches[:3]


@pytest.mark.skipif(not os.path.isdir(_FIXDIR),
                    reason="reference fixtures not on disk")
def test_reference_fixtures_roundtrip_through_encoder():
    # decode → encode → decode is a fixed point (old metric variants
    # re-encode as the modern ones, which decode to the same shape;
    # log timestamp strings re-encode as strings — same info the JSON
    # form carries)
    for pb_path, _ in _pairs():
        with open(pb_path, "rb") as f:
            events = parse_native(f.read())
        again = parse_native(encode_native(events))
        assert again == events, pb_path


def test_empty_frame():
    assert parse_native(b"") == []
    assert encode_native([]) == b""


def test_log_value_types_roundtrip():
    inner = {"": False, "big": 4522510993884453307, "f": 2.5,
             "s": "héllo", "n": None, "arr": [1, "a", None],
             "obj": {"k": {"deep": True}}}
    events = [("log", inner)]
    assert parse_native(encode_native(events)) == events


def test_metric_variants_roundtrip():
    metrics = [
        {"name": "c", "kind": "incremental", "counter": {"value": 1.0}},
        {"name": "g", "namespace": "ns", "kind": "absolute",
         "timestamp": "1969-12-31T15:49:26Z",
         "gauge": {"value": -2.5}},
        {"name": "s", "kind": "incremental",
         "tags": {"a": "x", "b": ["y", None]},
         "set": {"values": ["p", "q"]}},
        {"name": "d", "kind": "absolute", "interval_ms": 10,
         "distribution": {"samples": [{"value": 1.0, "rate": 2}],
                          "statistic": "summary"}},
        {"name": "h", "kind": "incremental",
         "aggregated_histogram": {
             "buckets": [{"upper_limit": 1.5, "count": 7}],
             "count": 7, "sum": 9.5}},
        {"name": "q", "kind": "incremental",
         "aggregated_summary": {
             "quantiles": [{"quantile": 0.5, "value": 3.0}],
             "count": 4, "sum": 12.0}},
        {"name": "k", "kind": "incremental",
         "timestamp": "2024-06-01T12:00:00.000000001Z",
         "sketch": {"sketch": {"AgentDDSketch": {
             "bins": {"k": [-2229, 2139], "n": [1, 2]},
             "count": 3, "min": -1.0, "max": 2.0,
             "sum": 1.0, "avg": 0.25}}}},
    ]
    events = [("metric", m) for m in metrics]
    got = parse_native(encode_native(events))
    assert [k for k, _ in got] == ["metric"] * len(metrics)
    for (_, g), m in zip(got, metrics):
        assert g == m


def test_trace_roundtrip():
    events = [("trace", {"name": "a_trace", "foo": 42})]
    assert parse_native(encode_native(events)) == events


def test_timestamp_autosi_digits():
    # chrono AutoSi: 0/3/6/9 fractional digits
    from vector_ray.functions.native_proto import _parse_rfc3339, _rfc3339
    for s in ("1969-12-31T15:49:26Z", "2024-01-02T03:04:05.500Z",
              "2024-01-02T03:04:05.000001Z",
              "1969-12-31T15:12:39.000024987Z"):
        assert _rfc3339(_parse_rfc3339(s)) == s


def test_mixed_kinds_rejected():
    with pytest.raises(ValueError, match="one event kind"):
        encode_native([("log", {}), ("metric", {"name": "x"})])


def test_read_native_dataset(tmp_path, ray_session):
    import struct

    frames = [
        encode_native([("log", {"msg": "a", "n": 1}),
                       ("log", {"msg": "b", "n": 2})]),
        encode_native([("metric", {"name": "m", "kind": "absolute",
                                   "counter": {"value": 3.0}})]),
    ]
    path = tmp_path / "capture.native"
    with open(path, "wb") as f:
        for fr in frames:
            f.write(struct.pack(">I", len(fr)) + fr)

    ds = read_native(str(path))
    rows = ds.take_all()
    assert [r["event_kind"] for r in rows] == ["log", "log", "metric"]
    payloads = [json.loads(r["payload"]) for r in rows]
    assert payloads[0] == {"msg": "a", "n": 1}
    assert payloads[2]["counter"] == {"value": 3.0}
