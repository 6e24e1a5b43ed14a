"""``strata`` deserializer — header-enriched NDJSON log files.

Reference semantics (behavior only):
``lib/codecs/src/decoding/format/strata.rs`` — a frame is a whole
file body: the FIRST line is a JSON header object, every following
non-empty line is one JSON log event, and each event is enriched with
the full header object under ``header_field_name`` (default
``strata_file_header``).  Empty frames yield no events; an invalid
header or an invalid log line is an error for the whole frame.  The
reference also stamps a wall-clock ingest timestamp on events missing
one (Legacy namespace) — wall-clock stamping has no deterministic
batch analogue, so events here keep exactly the fields they carry.

Pairs with the ``strata_snappy`` framing (sources/framing.py): that
framing yields one decompressed file body per capture file, which
this format decodes.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

__all__ = ["decode_strata", "strata_events_table", "read_strata"]

DEFAULT_HEADER_FIELD = "strata_file_header"


def decode_strata(data: str | bytes, *,
                  header_field_name: str = DEFAULT_HEADER_FIELD,
                  lossy: bool = True) -> list[dict[str, Any]]:
    """One frame (file body) → list of event dicts, each carrying the
    header object under ``header_field_name``."""
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode(
            "utf-8", errors="replace" if lossy else "strict")
    if not data:
        return []
    lines = data.split("\n")
    try:
        header = json.loads(lines[0])
    except ValueError as e:
        raise ValueError(f"error parsing strata header JSON: {e}") from e
    events: list[dict[str, Any]] = []
    for line in lines[1:]:
        if not line.strip():
            continue  # skip empty lines
        try:
            payload = json.loads(line)
        except ValueError as e:
            raise ValueError(f"error parsing strata log JSON: {e}") from e
        if not isinstance(payload, dict):
            payload = {"message": payload}
        event = dict(payload)
        event[header_field_name] = header
        events.append(event)
    return events


def strata_events_table(col, *,
                        header_field_name: str = DEFAULT_HEADER_FIELD,
                        lossy: bool = True) -> pa.Table:
    """Vectorized wrapper for ``map_batches``: a string/binary column
    of file bodies → flat ``(row_idx, event_idx, payload)`` with the
    lossless JSON residual convention (header already merged in)."""
    row_idx: list[int] = []
    event_idx: list[int] = []
    payloads: list[str] = []
    for i, frame in enumerate(col.to_pylist()):
        if frame is None:
            continue
        for j, ev in enumerate(decode_strata(
                frame, header_field_name=header_field_name, lossy=lossy)):
            row_idx.append(i)
            event_idx.append(j)
            payloads.append(json.dumps(ev, separators=(",", ":"),
                                       ensure_ascii=False, sort_keys=True))
    return pa.table({
        "row_idx": pa.array(row_idx, pa.int64()),
        "event_idx": pa.array(event_idx, pa.int64()),
        "payload": pa.array(payloads, pa.string()),
    })


def read_strata(paths, *, framing: str = "bytes",
                header_field_name: str = DEFAULT_HEADER_FIELD,
                include_paths: bool = False, **framing_opts) -> Dataset:
    """Dataset of strata events: one decode task per file (the file is
    the parallel unit).  ``framing="bytes"`` reads the raw file body;
    ``framing="strata_snappy"`` decompresses the reference's
    snappy-block capture format first (sources/framing.py).  Columns:
    ``payload`` (header-merged JSON string) + optional ``path``."""
    if isinstance(paths, str):
        paths = [paths]

    def decode_one(batch: pa.Table) -> pa.Table:
        out_path: list[str] = []
        out_payload: list[str] = []
        for p in batch["item"].to_pylist():
            with open(p, "rb") as f:
                data = f.read()
            if framing == "strata_snappy":
                from vector_ray.sources.framing import decode_bytes
                frames, errors = decode_bytes(
                    data, framing="strata_snappy", **framing_opts)
                if errors:
                    raise ValueError(
                        f"strata_snappy framing failed for {p}: {errors}")
            elif framing == "bytes":
                frames = [data]
            else:
                raise ValueError(
                    f"unsupported strata framing {framing!r}")
            for frame in frames:
                for ev in decode_strata(
                        frame, header_field_name=header_field_name):
                    out_path.append(p)
                    out_payload.append(json.dumps(
                        ev, separators=(",", ":"), ensure_ascii=False,
                        sort_keys=True))
        t = pa.table({
            "path": pa.array(out_path, pa.string()),
            "payload": pa.array(out_payload, pa.string()),
        })
        return t if include_paths else t.select(["payload"])

    return rd.from_items(list(paths)).map_batches(
        decode_one, batch_format="pyarrow", batch_size=None)
