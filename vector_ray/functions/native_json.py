"""``native_json`` codec — Vector's vector→vector interop format.

Reference semantics (behavior only):
- decode: lib/codecs/src/decoding/format/native_json.rs — a frame is
  one JSON value; an empty frame yields no events; a top-level array
  yields one event per element; invalid UTF-8 is replaced (lossy
  default).  Each event is ``{"log": {...}}`` | ``{"metric": {...}}``
  | ``{"trace": {...}}`` (tests/data/native_encoding/schema.cue).
- encode: the encoding peer emits the same shape, one JSON per frame.

The decoder is LOSSLESS: every event keeps its kind plus the full
inner value as a JSON string (the repo's open-keyed residual
convention), so decode→encode roundtrips bit-equal modulo JSON key
order.  ``native_metrics_to_table`` additionally projects the typed
metric columns (name/namespace/kind/mtype/value/ts/tags) used by the
log_to_metric/metric_to_log family, and trace events get the ``ttype``
marker column the ``is_trace`` condition keys on."""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

_KINDS = ("log", "metric", "trace")

# scalar-valued metric payload keys → mtype (schema.cue #Metric)
_METRIC_VALUE_KEYS = (
    "counter", "gauge", "set", "distribution",
    "aggregated_histogram", "aggregated_summary", "sketch")


def parse_native_json(frame: str | bytes) -> list[tuple[str, dict]]:
    """One frame → list of ``(kind, inner_value)`` events."""
    if isinstance(frame, bytes):
        frame = frame.decode("utf-8", errors="replace")  # lossy default
    if not frame.strip():
        return []  # empty NDJSON frames are fine, no warning
    v = json.loads(frame)
    items = v if isinstance(v, list) else [v]
    out = []
    for it in items:
        if not isinstance(it, dict) or len(it) != 1:
            raise ValueError(f"native event must be a single-key "
                             f"log/metric/trace object, got {it!r}")
        kind, inner = next(iter(it.items()))
        if kind not in _KINDS:
            raise ValueError(f"unknown native event kind {kind!r}")
        out.append((kind, inner))
    return out


def encode_native_json(kind: str, inner: dict) -> str:
    if kind not in _KINDS:
        raise ValueError(f"unknown native event kind {kind!r}")
    return json.dumps({kind: inner}, separators=(",", ":"),
                      ensure_ascii=False)


def _events_table(events: list[tuple[str, dict]]) -> pa.Table:
    return pa.table({
        "event_kind": pa.array([k for k, _ in events], pa.string()),
        "payload": pa.array(
            [json.dumps(v, separators=(",", ":"), ensure_ascii=False,
                        sort_keys=True) for _, v in events],
            pa.string()),
    })


def read_native_json(paths, *, include_paths: bool = False) -> Dataset:
    """NDJSON file(s) of native events → Dataset with ``event_kind``
    + lossless ``payload`` JSON columns (one decode task per file; a
    line holding a top-level array fans out).  Framing splits on the
    BYTE ``\\n`` only — generic text readers split on unicode line
    separators (U+2028 etc.), which tears JSON strings containing
    them."""
    ds = rd.read_binary_files(paths, include_paths=include_paths)

    def decode(t: pa.Table) -> pa.Table:
        events = []
        for blob in t["bytes"].to_pylist():
            for line in blob.split(b"\n"):
                events.extend(parse_native_json(line))
        return _events_table(events)

    return ds.map_batches(decode, batch_format="pyarrow",
                          batch_size=None)


def native_metrics_to_table(ds: Dataset) -> Dataset:
    """Project metric events into the typed metric columns
    (name/namespace/kind/mtype/value/ts/tags) — ``value`` is the
    counter/gauge scalar, null for the structured types whose full
    payload stays in the ``payload`` column."""

    def project(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("name", "namespace", "kind", "mtype",
                                "value", "ts", "tags", "payload")}
        kinds = t["event_kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        for k, p in zip(kinds, payloads):
            if k != "metric":
                continue
            m = json.loads(p)
            mtype = next((x for x in _METRIC_VALUE_KEYS if x in m), None)
            if mtype == "counter":
                value = m["counter"].get("value")
            elif mtype == "gauge":
                value = m["gauge"].get("value")
            else:
                value = None
            rows["name"].append(m.get("name"))
            rows["namespace"].append(m.get("namespace"))
            rows["kind"].append(m.get("kind"))
            rows["mtype"].append(mtype)
            rows["value"].append(value)
            rows["ts"].append(m.get("timestamp"))
            rows["tags"].append(
                json.dumps(m["tags"], separators=(",", ":"),
                           sort_keys=True) if "tags" in m else None)
            rows["payload"].append(p)
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "namespace": pa.array(rows["namespace"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "mtype": pa.array(rows["mtype"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "ts": pa.array(rows["ts"], pa.string()),
            "tags": pa.array(rows["tags"], pa.string()),
            "payload": pa.array(rows["payload"], pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None)


def native_traces_to_table(ds: Dataset) -> Dataset:
    """Trace events with the ``ttype`` marker column (the is_trace
    condition's columnar analogue of the metric ``mtype`` marker)."""

    def project(t: pa.Table) -> pa.Table:
        kinds = t["event_kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        traces = [p for k, p in zip(kinds, payloads) if k == "trace"]
        return pa.table({
            "ttype": pa.array(["trace"] * len(traces), pa.string()),
            "payload": pa.array(traces, pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          batch_size=None)


def encode_native_json_table(t: pa.Table) -> list[str]:
    """Encoding peer over the (event_kind, payload) columns — one
    frame per event, roundtrip-stable with read_native_json."""
    return [encode_native_json(k, json.loads(p))
            for k, p in zip(t["event_kind"].to_pylist(),
                            t["payload"].to_pylist())]


def encode_native_json_lines(t: pa.Table) -> pa.Array:
    """Sink-encoder entry (sinks/textfile.py codec registry): a
    (event_kind, payload) table encodes losslessly; any other table is
    treated as log events — one ``{"log": {...}}`` frame per row,
    null columns dropped, non-JSON scalars stringified (the reference
    serializes its Value tree the same way for timestamps)."""
    if ("event_kind" in t.column_names and "payload" in t.column_names
            and t.num_columns == 2):
        return pa.array(encode_native_json_table(t), pa.string())
    marker = ("metric" if "mtype" in t.column_names
              else "trace" if "ttype" in t.column_names else "log")
    out = []
    for r in t.to_pylist():
        inner = {k: v for k, v in r.items() if v is not None}
        out.append(json.dumps({marker: inner}, separators=(",", ":"),
                              ensure_ascii=False, default=str))
    return pa.array(out, pa.string())
