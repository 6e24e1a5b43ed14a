"""``json_paths`` deserializer — path-routed JSON decode.

Reference semantics (behavior only, no code):
``lib/codecs/src/decoding/format/json_paths.rs`` — the config maps
JSON paths to one of three operations and the decoder emits one event
per matched value, as ``{"expr": <path>, "data": <value>}``:

- ``identity``: emit the value as-is when it completes.
- ``explode``: the value at the path must be an array; emit one event
  per element (the array itself is never emitted).  Explode on a
  non-array emits nothing (test ``test_explode_on_non_array``).
- ``bytes``: emit the value as its string rendering (strings pass
  through; everything else is JSON-encoded).

Path keys normalize exactly like the reference
(``normalize_config_key``): ``.`` and the empty string both mean root,
a single leading ``.`` is stripped (``.meta`` == ``meta``), and two
keys that normalize to the same path are rejected at load time.

Emission order is the reference's streaming order: a value is emitted
when it COMPLETES in the document, i.e. a postorder walk in document
order (``test_order_preservation``: meta → records[0] → records[1] →
tail).  Array elements do not extend the path, so elements of an array
at path ``p`` also complete at path ``p`` — which is why ``identity``
on an array path emits every element AND the full array, matching the
reference's ``test_identity_for_array``.

Multiple concatenated top-level documents (and NDJSON) in one frame
decode in sequence (``test_multiple_concatenated_json``).  The
reference additionally keeps parser state across *torn* frames — a
streaming-transport concern; in this batch engine every input row is
a complete capture, so a torn trailing document is an error.

Nested arrays directly under a matched array path are left undefined
by the reference (its path bookkeeping pops the field segment at the
inner array's end, a corner its tests never cover); here an array
element that is itself an array is emitted whole — only DIRECT
elements of the matched array share its path.  Documented divergence
on an undefined corner.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pyarrow as pa

__all__ = [
    "normalize_path_key", "compile_paths", "decode_json_paths",
    "json_paths_events_table",
]

_OPS = ("identity", "explode", "bytes")


def normalize_path_key(key: str) -> str:
    """``.``/```` → root (``""``); one leading ``.`` stripped."""
    if key in (".", ""):
        return ""
    if key.startswith("."):
        return key[1:]
    return key


def compile_paths(paths: dict[str, str]) -> dict[str, str]:
    """Validate + normalize a ``{path: operation}`` config.

    Rejects empty configs, unknown operations, and two keys that
    normalize to the same path (reference ``deserialize_paths``)."""
    if not paths:
        raise ValueError("at least one path must be configured")
    out: dict[str, str] = {}
    originals: dict[str, str] = {}
    for key, op in paths.items():
        if op not in _OPS:
            raise ValueError(f"unknown json_paths operation {op!r} "
                             f"(expected one of {_OPS})")
        norm = normalize_path_key(key)
        if norm in originals:
            raise ValueError(
                f"duplicate path key after normalization: "
                f"{originals[norm]!r} and {key!r} both map to {norm!r}")
        originals[norm] = key
        out[norm] = op
    return out


def _stringify(value: Any) -> str:
    """The ``bytes`` operation's rendering: strings pass through,
    everything else JSON-encodes (the reference stringifies the VRL
    value, whose display form for containers is JSON)."""
    if isinstance(value, str):
        return value
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def _iter_documents(data: str) -> Iterable[Any]:
    """All top-level JSON documents in ``data`` (concatenated and/or
    newline-separated), in order."""
    dec = json.JSONDecoder()
    n = len(data)
    pos = 0
    while pos < n:
        while pos < n and data[pos] in " \t\r\n":
            pos += 1
        if pos >= n:
            break
        doc, pos = dec.raw_decode(data, pos)
        yield doc


def decode_json_paths(data: str | bytes, paths: dict[str, str],
                      *, lossy: bool = True) -> list[tuple[str, Any]]:
    """Decode one frame → ``[(expr, data_value), ...]`` in the
    reference's completion order."""
    pmap = compile_paths(paths)
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode(
            "utf-8", errors="replace" if lossy else "strict")
    if not data:
        return []

    events: list[tuple[str, Any]] = []

    def join(segs: tuple[str, ...]) -> str:
        return ".".join(segs)

    def complete(value: Any, path: tuple[str, ...],
                 is_array_element: bool) -> None:
        """A value finished building at ``path``."""
        p = join(path)
        op = pmap.get(p)
        if op is None:
            return
        if isinstance(value, list) and not is_array_element:
            # the array value itself
            if op == "identity":
                events.append((p, value))
            elif op == "bytes":
                events.append((p, _stringify(value)))
            # explode: the array is consumed, elements were emitted
            return
        if op == "explode":
            if is_array_element:
                events.append((p, value))
            # explode on a non-array value: nothing
            return
        if op == "identity":
            events.append((p, value))
        else:  # bytes
            events.append((p, _stringify(value)))

    def walk(value: Any, path: tuple[str, ...],
             is_array_element: bool = False) -> None:
        if isinstance(value, dict):
            for k, v in value.items():
                walk(v, path + (k,))
        elif isinstance(value, list) and not is_array_element:
            # elements complete at the ARRAY's path (elements do not
            # extend the path — reference ParserState semantics); an
            # element that is itself an array is emitted whole
            for elem in value:
                walk(elem, path, is_array_element=True)
        complete(value, path, is_array_element)

    for doc in _iter_documents(data):
        walk(doc, ())
    return events


def json_paths_events_table(col, paths: dict[str, str],
                            *, lossy: bool = True) -> pa.Table:
    """Vectorized wrapper for ``map_batches``: a string/binary column
    of frames → flat events table ``(row_idx, event_idx, expr, data)``
    with ``data`` JSON-encoded (the lossless residual convention used
    by the native_json codec)."""
    row_idx: list[int] = []
    event_idx: list[int] = []
    exprs: list[str] = []
    datas: list[str] = []
    for i, frame in enumerate(col.to_pylist()):
        if frame is None:
            continue
        for j, (expr, value) in enumerate(
                decode_json_paths(frame, paths, lossy=lossy)):
            row_idx.append(i)
            event_idx.append(j)
            exprs.append(expr)
            datas.append(json.dumps(value, separators=(",", ":"),
                                    ensure_ascii=False, sort_keys=True))
    return pa.table({
        "row_idx": pa.array(row_idx, pa.int64()),
        "event_idx": pa.array(event_idx, pa.int64()),
        "expr": pa.array(exprs, pa.string()),
        "data": pa.array(datas, pa.string()),
    })
