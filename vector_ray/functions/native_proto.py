"""``native`` codec — Vector's binary protobuf interop format.

Reference semantics (behavior only):
- decode: ``lib/codecs/src/decoding/format/native.rs`` — a frame is
  one ``event.EventArray`` protobuf message
  (``lib/vector-core/proto/event.proto``, a public schema); empty
  frames yield no events.
- encode: the encoding peer emits one ``EventArray`` per frame.

Decoded events use the SAME ``(kind, inner_value)`` shape as the
``native_json`` codec (functions/native_json.py), so the two formats
are interchangeable downstream — exactly the reference's contract,
which its 1024 paired fixtures
(``lib/codecs/tests/data/native_encoding/{json,proto}``) pin:
decoding ``NNNN.pb`` must equal parsing ``NNNN.json``.

Conversion rules mirrored from the reference's proto→event mapping:
- ``Value`` oneof → JSON value: ``raw_bytes`` → lossy UTF-8 string,
  ``timestamp`` → RFC3339 string (chrono ``AutoSi``: 0/3/6/9
  fractional digits), integer/float/boolean/null as-is, map/array
  recursively.
- ``Log``: ``value`` when set, else the ``fields`` map (both absent →
  empty object).  ``Trace``: the ``fields`` map.
- ``Metric``: ``namespace``/``timestamp``/``interval_ms`` omitted
  when absent (empty string / 0 are proto3 absence); ``kind`` always
  present (default ``incremental``); ``tags_v2`` preferred over
  ``tags_v1``; each versioned value variant converts to the single
  modern shape (Distribution1 zips values/sample_rates into samples,
  AggregatedHistogram1 zips buckets/counts, AggregatedSummary1 zips
  quantiles/values, Sketch bins stay as parallel k/n arrays).

The encoder emits the modern variants (Distribution2,
AggregatedHistogram3, AggregatedSummary3) plus both tag fields, like
the reference's encoder.  Log/trace string values re-encode as
``raw_bytes`` — the JSON interop shape cannot distinguish a timestamp
that was decoded to a string from a genuine string, so a
proto→json→proto roundtrip downgrades timestamp-typed LOG fields to
strings (metric ``timestamp`` fields stay typed; this is the same
information loss native_json itself has).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone
from typing import Any

from vector_ray.functions.protobuf import decode_message, encode_message

__all__ = ["parse_native", "encode_native", "read_native"]

# --------------------------------------------------------------- schema
# event.proto (public), expressed in the repo's schema-dict form.

_TIMESTAMP = {"seconds": (1, "int64"), "nanos": (2, "int32")}
_VALUE_ENTRY = {"key": (1, "string"), "value": (2, ("message", "Value"))}
_STR_ENTRY = {"key": (1, "string"), "value": (2, "string")}

REGISTRY: dict[str, dict] = {
    "Timestamp": _TIMESTAMP,
    "ValueEntry": _VALUE_ENTRY,
    "StrEntry": _STR_ENTRY,
    "Value": {
        "raw_bytes": (1, "bytes"),
        "timestamp": (2, ("message", "Timestamp")),
        "integer": (4, "int64"),
        "float": (5, "double"),
        "boolean": (6, "bool"),
        "map": (7, ("message", "ValueMap")),
        "array": (8, ("message", "ValueArray")),
        "null": (9, "enum"),
    },
    "ValueMap": {"fields": (1, ("message", "ValueEntry"), "repeated")},
    "ValueArray": {"items": (1, ("message", "Value"), "repeated")},
    "Log": {
        "fields": (1, ("message", "ValueEntry"), "repeated"),
        "value": (2, ("message", "Value")),
    },
    "Trace": {"fields": (1, ("message", "ValueEntry"), "repeated")},
    "TagValue": {"value": (1, "string")},
    "TagValues": {"values": (1, ("message", "TagValue"), "repeated")},
    "TagsEntry": {"key": (1, "string"),
                  "value": (2, ("message", "TagValues"))},
    "Counter": {"value": (1, "double")},
    "Gauge": {"value": (1, "double")},
    "Set": {"values": (1, "string", "repeated")},
    "DistributionSample": {"value": (1, "double"), "rate": (2, "uint32")},
    "Distribution1": {"values": (1, "double", "repeated"),
                      "sample_rates": (2, "uint32", "repeated"),
                      "statistic": (3, "enum")},
    "Distribution2": {
        "samples": (1, ("message", "DistributionSample"), "repeated"),
        "statistic": (2, "enum")},
    "HistogramBucket": {"upper_limit": (1, "double"), "count": (2, "uint32")},
    "HistogramBucket3": {"upper_limit": (1, "double"),
                         "count": (2, "uint64")},
    "AggregatedHistogram1": {"buckets": (1, "double", "repeated"),
                             "counts": (2, "uint32", "repeated"),
                             "count": (3, "uint32"), "sum": (4, "double")},
    "AggregatedHistogram2": {
        "buckets": (1, ("message", "HistogramBucket"), "repeated"),
        "count": (2, "uint32"), "sum": (3, "double")},
    "AggregatedHistogram3": {
        "buckets": (1, ("message", "HistogramBucket3"), "repeated"),
        "count": (2, "uint64"), "sum": (3, "double")},
    "SummaryQuantile": {"quantile": (1, "double"), "value": (2, "double")},
    "AggregatedSummary1": {"quantiles": (1, "double", "repeated"),
                           "values": (2, "double", "repeated"),
                           "count": (3, "uint32"), "sum": (4, "double")},
    "AggregatedSummary2": {
        "quantiles": (1, ("message", "SummaryQuantile"), "repeated"),
        "count": (2, "uint32"), "sum": (3, "double")},
    "AggregatedSummary3": {
        "quantiles": (1, ("message", "SummaryQuantile"), "repeated"),
        "count": (2, "uint64"), "sum": (3, "double")},
    "AgentDDSketch": {"count": (1, "uint32"), "min": (2, "double"),
                      "max": (3, "double"), "sum": (4, "double"),
                      "avg": (5, "double"),
                      "k": (6, "sint32", "repeated"),
                      "n": (7, "uint32", "repeated")},
    "Sketch": {"agent_dd_sketch": (1, ("message", "AgentDDSketch"))},
    "Metric": {
        "name": (1, "string"),
        "timestamp": (2, ("message", "Timestamp")),
        "tags_v1": (3, ("message", "StrEntry"), "repeated"),
        "kind": (4, "enum"),
        "counter": (5, ("message", "Counter")),
        "gauge": (6, ("message", "Gauge")),
        "set": (7, ("message", "Set")),
        "distribution1": (8, ("message", "Distribution1")),
        "aggregated_histogram1": (9, ("message", "AggregatedHistogram1")),
        "aggregated_summary1": (10, ("message", "AggregatedSummary1")),
        "namespace": (11, "string"),
        "distribution2": (12, ("message", "Distribution2")),
        "aggregated_histogram2": (13, ("message", "AggregatedHistogram2")),
        "aggregated_summary2": (14, ("message", "AggregatedSummary2")),
        "sketch": (15, ("message", "Sketch")),
        "aggregated_histogram3": (16, ("message", "AggregatedHistogram3")),
        "aggregated_summary3": (17, ("message", "AggregatedSummary3")),
        "interval_ms": (18, "uint32"),
        "tags_v2": (20, ("message", "TagsEntry"), "repeated"),
    },
    "LogArray": {"logs": (1, ("message", "Log"), "repeated")},
    "MetricArray": {"metrics": (1, ("message", "Metric"), "repeated")},
    "TraceArray": {"traces": (1, ("message", "Trace"), "repeated")},
    "EventArray": {
        "logs": (1, ("message", "LogArray")),
        "metrics": (2, ("message", "MetricArray")),
        "traces": (3, ("message", "TraceArray")),
    },
    "EventWrapper": {
        "log": (1, ("message", "Log")),
        "metric": (2, ("message", "Metric")),
        "trace": (3, ("message", "Trace")),
    },
}

_EVENT_ARRAY = REGISTRY["EventArray"]

# ----------------------------------------------------------- timestamps

_STAT = {0: "histogram", 1: "summary"}
_KIND = {0: "incremental", 1: "absolute"}
_TS_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?Z$")


def _rfc3339(ts: dict) -> str:
    """proto Timestamp → chrono ``to_rfc3339_opts(AutoSi, true)``:
    0/3/6/9 fractional digits.  ``nanos`` is always non-negative, even
    for pre-epoch times (proto semantics: instant = seconds + nanos)."""
    seconds = ts.get("seconds", 0)
    nanos = ts.get("nanos", 0)
    base = datetime.fromtimestamp(seconds, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S")
    if nanos == 0:
        frac = ""
    elif nanos % 1_000_000 == 0:
        frac = f".{nanos // 1_000_000:03d}"
    elif nanos % 1000 == 0:
        frac = f".{nanos // 1000:06d}"
    else:
        frac = f".{nanos:09d}"
    return f"{base}{frac}Z"


def _parse_rfc3339(s: str) -> dict | None:
    m = _TS_RE.match(s)
    if m is None:
        return None
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    seconds = calendar.timegm((y, mo, d, h, mi, sec, 0, 0, 0))
    frac = m.group(7) or ""
    nanos = int(frac.ljust(9, "0")) if frac else 0
    out: dict = {}
    if seconds:
        out["seconds"] = seconds
    if nanos:
        out["nanos"] = nanos
    return out

# ----------------------------------------------------------- proto → json


def _from_value(v: dict) -> Any:
    if "raw_bytes" in v:
        b = v["raw_bytes"]
        return b.decode("utf-8", errors="replace") \
            if isinstance(b, (bytes, bytearray)) else b
    if "timestamp" in v:
        return _rfc3339(v["timestamp"])
    if "integer" in v:
        return v["integer"]
    if "float" in v:
        return v["float"]
    if "boolean" in v:
        return v["boolean"]
    if "map" in v:
        return _from_fields(v["map"].get("fields", []))
    if "array" in v:
        return [_from_value(x) for x in v["array"].get("items", [])]
    return None  # explicit null or empty oneof


def _from_fields(entries: list[dict]) -> dict:
    return {e.get("key", ""): _from_value(e.get("value", {}))
            for e in entries}


def _from_tags(msg: dict) -> dict | None:
    tags: dict[str, Any] = {}
    for e in msg.get("tags_v2", []):
        vals = [tv.get("value") for tv in
                e.get("value", {}).get("values", [])]
        if not vals:
            continue
        tags[e.get("key", "")] = vals[0] if len(vals) == 1 else vals
    if not tags:
        for e in msg.get("tags_v1", []):
            tags[e.get("key", "")] = e.get("value", "")
    return tags or None


def _from_metric(m: dict) -> dict:
    out: dict[str, Any] = {"name": m.get("name", "")}
    if m.get("namespace"):
        out["namespace"] = m["namespace"]
    tags = _from_tags(m)
    if tags is not None:
        out["tags"] = tags
    if "timestamp" in m:
        out["timestamp"] = _rfc3339(m["timestamp"])
    if m.get("interval_ms"):
        out["interval_ms"] = m["interval_ms"]
    out["kind"] = _KIND[m.get("kind", 0)]
    if "counter" in m:
        out["counter"] = {"value": m["counter"].get("value", 0.0)}
    elif "gauge" in m:
        out["gauge"] = {"value": m["gauge"].get("value", 0.0)}
    elif "set" in m:
        out["set"] = {"values": m["set"].get("values", [])}
    elif "distribution1" in m:
        d = m["distribution1"]
        out["distribution"] = {
            "samples": [{"value": v, "rate": r} for v, r in
                        zip(d.get("values", []), d.get("sample_rates", []))],
            "statistic": _STAT[d.get("statistic", 0)]}
    elif "distribution2" in m:
        d = m["distribution2"]
        out["distribution"] = {
            "samples": [{"value": s.get("value", 0.0),
                         "rate": s.get("rate", 0)}
                        for s in d.get("samples", [])],
            "statistic": _STAT[d.get("statistic", 0)]}
    elif "aggregated_histogram1" in m:
        h = m["aggregated_histogram1"]
        out["aggregated_histogram"] = {
            "buckets": [{"upper_limit": u, "count": c} for u, c in
                        zip(h.get("buckets", []), h.get("counts", []))],
            "count": h.get("count", 0), "sum": h.get("sum", 0.0)}
    elif "aggregated_histogram2" in m or "aggregated_histogram3" in m:
        h = m.get("aggregated_histogram2") or m["aggregated_histogram3"]
        out["aggregated_histogram"] = {
            "buckets": [{"upper_limit": b.get("upper_limit", 0.0),
                         "count": b.get("count", 0)}
                        for b in h.get("buckets", [])],
            "count": h.get("count", 0), "sum": h.get("sum", 0.0)}
    elif "aggregated_summary1" in m:
        s = m["aggregated_summary1"]
        out["aggregated_summary"] = {
            "quantiles": [{"quantile": q, "value": v} for q, v in
                          zip(s.get("quantiles", []), s.get("values", []))],
            "count": s.get("count", 0), "sum": s.get("sum", 0.0)}
    elif "aggregated_summary2" in m or "aggregated_summary3" in m:
        s = m.get("aggregated_summary2") or m["aggregated_summary3"]
        out["aggregated_summary"] = {
            "quantiles": [{"quantile": q.get("quantile", 0.0),
                           "value": q.get("value", 0.0)}
                          for q in s.get("quantiles", [])],
            "count": s.get("count", 0), "sum": s.get("sum", 0.0)}
    elif "sketch" in m:
        sk = m["sketch"].get("agent_dd_sketch", {})
        out["sketch"] = {"sketch": {"AgentDDSketch": {
            "bins": {"k": sk.get("k", []), "n": sk.get("n", [])},
            "count": sk.get("count", 0), "min": sk.get("min", 0.0),
            "max": sk.get("max", 0.0), "sum": sk.get("sum", 0.0),
            "avg": sk.get("avg", 0.0)}}}
    return out


def _from_log(m: dict) -> Any:
    if "value" in m:
        return _from_value(m["value"])
    return _from_fields(m.get("fields", []))


def parse_native(frame: bytes) -> list[tuple[str, Any]]:
    """One ``EventArray`` frame → ``[(kind, inner_value), ...]`` in the
    native_json shape.  Empty frames yield no events."""
    if not frame:
        return []
    arr = decode_message(frame, _EVENT_ARRAY, REGISTRY)
    if "logs" in arr:
        return [("log", _from_log(x))
                for x in arr["logs"].get("logs", [])]
    if "metrics" in arr:
        return [("metric", _from_metric(x))
                for x in arr["metrics"].get("metrics", [])]
    if "traces" in arr:
        return [("trace", _from_fields(x.get("fields", [])))
                for x in arr["traces"].get("traces", [])]
    return []

# ----------------------------------------------------------- json → proto


def _to_value(v: Any) -> dict:
    if v is None:
        return {"null": 0}
    if isinstance(v, bool):
        return {"boolean": v}
    if isinstance(v, int):
        return {"integer": v}
    if isinstance(v, float):
        return {"float": v}
    if isinstance(v, str):
        return {"raw_bytes": v.encode("utf-8")}
    if isinstance(v, dict):
        return {"map": {"fields": _to_fields(v)}}
    if isinstance(v, (list, tuple)):
        return {"array": {"items": [_to_value(x) for x in v]}}
    raise TypeError(f"cannot encode {type(v).__name__} as native Value")


def _to_fields(obj: dict) -> list[dict]:
    return [{"key": k, "value": _to_value(v)} for k, v in obj.items()]


def _to_metric(inner: dict) -> dict:
    out: dict[str, Any] = {"name": inner.get("name", "")}
    if inner.get("namespace"):
        out["namespace"] = inner["namespace"]
    ts = inner.get("timestamp")
    if ts is not None:
        parsed = _parse_rfc3339(ts) if isinstance(ts, str) else None
        if parsed is None:
            raise ValueError(f"unparseable metric timestamp {ts!r}")
        out["timestamp"] = parsed
    if inner.get("interval_ms"):
        out["interval_ms"] = inner["interval_ms"]
    kind = inner.get("kind", "incremental")
    out["kind"] = {"incremental": 0, "absolute": 1}[kind]
    tags = inner.get("tags")
    if tags:
        v1, v2 = [], []
        for k, tv in tags.items():
            vals = tv if isinstance(tv, list) else [tv]
            v2.append({"key": k, "value": {"values": [
                {} if x is None else {"value": x} for x in vals]}})
            scalar = [x for x in vals if x is not None]
            if scalar:  # tags_v1 single-value compat view
                v1.append({"key": k, "value": scalar[-1]})
        out["tags_v1"] = v1
        out["tags_v2"] = v2
    stat = {"histogram": 0, "summary": 1}
    if "counter" in inner:
        out["counter"] = {"value": float(inner["counter"]["value"])}
    elif "gauge" in inner:
        out["gauge"] = {"value": float(inner["gauge"]["value"])}
    elif "set" in inner:
        out["set"] = {"values": list(inner["set"]["values"])}
    elif "distribution" in inner:
        d = inner["distribution"]
        out["distribution2"] = {
            "samples": [{"value": float(s["value"]), "rate": s["rate"]}
                        for s in d["samples"]],
            "statistic": stat[d["statistic"]]}
    elif "aggregated_histogram" in inner:
        h = inner["aggregated_histogram"]
        out["aggregated_histogram3"] = {
            "buckets": [{"upper_limit": float(b["upper_limit"]),
                         "count": b["count"]} for b in h["buckets"]],
            "count": h["count"], "sum": float(h["sum"])}
    elif "aggregated_summary" in inner:
        s = inner["aggregated_summary"]
        out["aggregated_summary3"] = {
            "quantiles": [{"quantile": float(q["quantile"]),
                           "value": float(q["value"])}
                          for q in s["quantiles"]],
            "count": s["count"], "sum": float(s["sum"])}
    elif "sketch" in inner:
        sk = inner["sketch"]["sketch"]["AgentDDSketch"]
        out["sketch"] = {"agent_dd_sketch": {
            "count": sk["count"], "min": float(sk["min"]),
            "max": float(sk["max"]), "sum": float(sk["sum"]),
            "avg": float(sk["avg"]),
            "k": list(sk["bins"]["k"]), "n": list(sk["bins"]["n"])}}
    return out


def encode_native(events: list[tuple[str, Any]]) -> bytes:
    """``[(kind, inner_value), ...]`` (one kind per frame, like the
    reference's EventArray) → one ``EventArray`` frame."""
    if not events:
        return b""
    kinds = {k for k, _ in events}
    if len(kinds) != 1:
        raise ValueError(f"an EventArray holds one event kind, got {kinds}")
    kind = kinds.pop()
    if kind == "log":
        arr = {"logs": {"logs": [{"value": _to_value(v)}
                                 for _, v in events]}}
    elif kind == "metric":
        arr = {"metrics": {"metrics": [_to_metric(v) for _, v in events]}}
    elif kind == "trace":
        arr = {"traces": {"traces": [{"fields": _to_fields(v)}
                                     for _, v in events]}}
    else:
        raise ValueError(f"unknown native event kind {kind!r}")
    return encode_message(arr, _EVENT_ARRAY, REGISTRY)


def read_native(paths, *, include_paths: bool = False):
    """Length-delimited ``EventArray`` capture file(s) → Dataset with
    ``event_kind`` + lossless ``payload`` JSON columns (the same shape
    ``read_native_json`` yields, so the two sources are drop-in
    interchangeable).  One decode task per file; frames are
    u32-BE length-prefixed (the ``length_delimited`` framing that the
    reference pairs with binary codecs)."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from vector_ray.sources.framing import decode_bytes

    if isinstance(paths, str):
        paths = [paths]

    def decode_one(batch: pa.Table) -> pa.Table:
        out_path: list[str] = []
        out_kind: list[str] = []
        out_payload: list[str] = []
        for p in batch["item"].to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            frames, errors = decode_bytes(data, framing="length_delimited")
            if errors:
                raise ValueError(f"torn native frame in {p}: {errors}")
            for frame in frames:
                for kind, inner in parse_native(frame):
                    out_path.append(p)
                    out_kind.append(kind)
                    out_payload.append(_json.dumps(
                        inner, separators=(",", ":"), ensure_ascii=False,
                        sort_keys=True))
        t = pa.table({
            "path": pa.array(out_path, pa.string()),
            "event_kind": pa.array(out_kind, pa.string()),
            "payload": pa.array(out_payload, pa.string()),
        })
        return t if include_paths else t.select(["event_kind", "payload"])

    return rd.from_items(list(paths)).map_batches(
        decode_one, batch_format="pyarrow", batch_size=None)
