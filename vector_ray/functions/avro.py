"""Pure-Python Apache Avro binary datum codec (no avro runtime).

Behavioral reference: `lib/codecs/src/decoding/format/avro.rs` and
`lib/codecs/src/encoding/format/avro.rs` — one Avro DATUM per event
(no container-file framing) against a JSON schema string, with
optional Confluent schema-registry prefix stripping (magic byte 0 +
4-byte big-endian schema id) on decode.  The binary encoding is
public (Avro 1.11 spec "Binary encoding"):

- null -> zero bytes; boolean -> one byte
- int / long -> zigzag varint
- float / double -> 4 / 8 bytes little-endian
- bytes / string -> long(length) + data; fixed -> raw size bytes
- enum -> int(symbol index)
- array / map -> blocks of long(count) + items, 0-count terminator;
  negative counts carry a long(byte size) per spec (accepted on
  decode, never produced on encode)
- union -> long(branch index) + value
- record -> fields in declaration order

Schemas are the standard JSON forms: primitive name strings, full
objects, union lists, named-type references; logical types decode as
their underlying primitive (the reference's unsupported-variant list —
date/decimal/duration — stays unsupported here too).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Mapping

import pyarrow as pa

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}

CONFLUENT_MAGIC = 0
CONFLUENT_PREFIX_LEN = 5


# ---------------------------------------------------------------------------
# schema parsing: JSON -> plain dict tree + named-type registry
# ---------------------------------------------------------------------------

def parse_schema(schema) -> tuple[Any, dict]:
    """(schema_tree, named_registry) from a JSON string / dict / list.

    The tree keeps the JSON shape; named types (record/enum/fixed) are
    registered under their full name so references ("com.x.Rec") and
    recursive schemas resolve lazily at encode/decode time.
    """
    if isinstance(schema, str) and (schema.lstrip()[:1] in "{["
                                    or schema.strip().startswith('"')):
        schema = json.loads(schema)
    registry: dict[str, Any] = {}

    def walk(node, namespace=""):
        if isinstance(node, str):
            return node  # primitive or named reference
        if isinstance(node, list):
            return [walk(b, namespace) for b in node]
        t = node.get("type")
        if t in ("record", "error", "enum", "fixed"):
            ns = node.get("namespace", namespace)
            name = node["name"]
            full = name if "." in name else (f"{ns}.{name}" if ns else name)
            out = dict(node)
            out["_full_name"] = full
            registry[full] = out
            registry.setdefault(name, out)
            if t in ("record", "error"):
                out["fields"] = [
                    {**f, "type": walk(f["type"], ns)}
                    for f in node.get("fields", [])
                ]
            return out
        if t == "array":
            return {"type": "array", "items": walk(node["items"], namespace)}
        if t == "map":
            return {"type": "map", "values": walk(node["values"], namespace)}
        if isinstance(t, (dict, list)):
            return walk(t, namespace)  # {"type": {...}} wrapper
        # primitive-with-annotations (logical types) -> underlying base
        return t

    return walk(schema), registry


def _resolve(node, registry):
    if isinstance(node, str) and node not in _PRIMITIVES:
        if node not in registry:
            raise ValueError(f"unresolved avro type {node!r}")
        return registry[node]
    return node


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def _encode_long(v: int, out: bytearray) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _decode_long(data: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated avro varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (result >> 1) ^ -(result & 1), pos
        shift += 7
        if shift >= 70:
            raise ValueError("avro varint too long")


# ---------------------------------------------------------------------------
# datum encode/decode
# ---------------------------------------------------------------------------

def _union_branch(v, branches, registry) -> int:
    """Pick the union branch for a Python value (the reference relies
    on apache_avro's equivalent resolution)."""

    def matches(b) -> bool:
        b = _resolve(b, registry)
        if isinstance(b, dict):
            t = b.get("type")
            if t in ("record", "error"):
                return isinstance(v, Mapping)
            if t == "enum":
                return isinstance(v, str) and v in b.get("symbols", [])
            if t == "fixed":
                return isinstance(v, (bytes, bytearray))
            if t == "array":
                return isinstance(v, (list, tuple))
            if t == "map":
                return isinstance(v, Mapping)
            return False
        if b == "null":
            return v is None
        if b == "boolean":
            return isinstance(v, bool)
        if b in ("int", "long"):
            return isinstance(v, int) and not isinstance(v, bool)
        if b in ("float", "double"):
            return isinstance(v, float) or (
                isinstance(v, int) and not isinstance(v, bool))
        if b == "string":
            return isinstance(v, str)
        if b == "bytes":
            return isinstance(v, (bytes, bytearray))
        return False

    # exact-kind pass, then a float-accepts-int pass (ints preferred
    # into int/long branches)
    for i, b in enumerate(branches):
        if matches(b):
            return i
    raise ValueError(f"value {v!r} matches no union branch {branches!r}")


def encode_datum(v: Any, schema, registry=None, out: bytearray | None = None,
                 ) -> bytes:
    top = out is None
    if out is None:
        out = bytearray()
    registry = registry or {}
    schema = _resolve(schema, registry)

    if isinstance(schema, list):  # union
        i = _union_branch(v, schema, registry)
        _encode_long(i, out)
        encode_datum(v, schema[i], registry, out)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error"):
            for f in schema["fields"]:
                name = f["name"]
                if name in v:
                    fv = v[name]
                elif "default" in f:
                    fv = f["default"]
                else:
                    raise ValueError(
                        f"missing field {name!r} with no default")
                encode_datum(fv, f["type"], registry, out)
        elif t == "enum":
            syms = schema.get("symbols", [])
            try:
                _encode_long(syms.index(v), out)
            except ValueError:
                raise ValueError(f"{v!r} not in enum {syms}") from None
        elif t == "fixed":
            b = bytes(v)
            if len(b) != int(schema["size"]):
                raise ValueError("fixed size mismatch")
            out += b
        elif t == "array":
            items = list(v)
            if items:
                _encode_long(len(items), out)
                for x in items:
                    encode_datum(x, schema["items"], registry, out)
            _encode_long(0, out)
        elif t == "map":
            if v:
                _encode_long(len(v), out)
                for k, x in v.items():
                    _encode_long(len(str(k).encode()), out)
                    out += str(k).encode()
                    encode_datum(x, schema["values"], registry, out)
            _encode_long(0, out)
        else:
            raise ValueError(f"unknown complex avro type {t!r}")
    elif schema == "null":
        if v is not None:
            raise ValueError("non-null value for null schema")
    elif schema == "boolean":
        out.append(1 if v else 0)
    elif schema in ("int", "long"):
        _encode_long(int(v), out)
    elif schema == "float":
        out += struct.pack("<f", float(v))
    elif schema == "double":
        out += struct.pack("<d", float(v))
    elif schema == "string":
        b = str(v).encode()
        _encode_long(len(b), out)
        out += b
    elif schema == "bytes":
        b = bytes(v)
        _encode_long(len(b), out)
        out += b
    else:
        raise ValueError(f"unknown avro type {schema!r}")
    return bytes(out) if top else b""


def decode_datum(data: bytes, schema, registry=None, pos: int = 0,
                 ) -> tuple[Any, int]:
    registry = registry or {}
    schema = _resolve(schema, registry)

    if isinstance(schema, list):  # union
        i, pos = _decode_long(data, pos)
        if not 0 <= i < len(schema):
            raise ValueError(f"union branch {i} out of range")
        return decode_datum(data, schema[i], registry, pos)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error"):
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = decode_datum(
                    data, f["type"], registry, pos)
            return rec, pos
        if t == "enum":
            i, pos = _decode_long(data, pos)
            syms = schema.get("symbols", [])
            if not 0 <= i < len(syms):
                raise ValueError(f"enum index {i} out of range")
            return syms[i], pos
        if t == "fixed":
            n = int(schema["size"])
            if pos + n > len(data):
                raise ValueError("truncated fixed")
            return bytes(data[pos:pos + n]), pos + n
        if t == "array":
            items = []
            while True:
                n, pos = _decode_long(data, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # negative count: long(byte size) follows
                    n = -n
                    _, pos = _decode_long(data, pos)
                for _ in range(n):
                    x, pos = decode_datum(data, schema["items"],
                                          registry, pos)
                    items.append(x)
        if t == "map":
            m = {}
            while True:
                n, pos = _decode_long(data, pos)
                if n == 0:
                    return m, pos
                if n < 0:
                    n = -n
                    _, pos = _decode_long(data, pos)
                for _ in range(n):
                    ln, pos = _decode_long(data, pos)
                    if pos + ln > len(data):
                        raise ValueError("truncated map key")
                    k = data[pos:pos + ln].decode()
                    pos += ln
                    m[k], pos = decode_datum(data, schema["values"],
                                             registry, pos)
        raise ValueError(f"unknown complex avro type {t!r}")
    if schema == "null":
        return None, pos
    if schema == "boolean":
        if pos >= len(data):
            raise ValueError("truncated boolean")
        return data[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return _decode_long(data, pos)
    if schema == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if schema == "string":
        n, pos = _decode_long(data, pos)
        if pos + n > len(data):
            raise ValueError("truncated string")
        return data[pos:pos + n].decode("utf-8", errors="replace"), pos + n
    if schema == "bytes":
        n, pos = _decode_long(data, pos)
        if pos + n > len(data):
            raise ValueError("truncated bytes")
        return bytes(data[pos:pos + n]), pos + n
    raise ValueError(f"unknown avro type {schema!r}")


# ---------------------------------------------------------------------------
# batch (Arrow) surface
# ---------------------------------------------------------------------------

def encode_avro_rows(t: pa.Table, schema, cols=None) -> pa.Array:
    """One Avro datum per row (record schema); null columns fall back
    to the field default / null union branch via per-row dict build."""
    tree, registry = parse_schema(schema)
    names = [f["name"] for f in tree.get("fields", [])] \
        if isinstance(tree, dict) else list(cols or t.column_names)
    use = [c for c in names if c in t.column_names]
    pydata = {c: t[c].to_pylist() for c in use}
    out = []
    for i in range(t.num_rows):
        obj = {c: pydata[c][i] for c in use}
        out.append(encode_datum(obj, tree, registry))
    return pa.array(out, pa.large_binary())


def decode_avro_rows(col, schema, *, strip_schema_id_prefix: bool = False,
                     ) -> list:
    """Wire datums -> Python values (dicts for record schemas);
    undecodable rows -> None.  ``strip_schema_id_prefix`` drops the
    Confluent magic-0 + 4-byte schema-id header when present
    (decoding/format/avro.rs CONFLUENT_SCHEMA_PREFIX_LEN)."""
    tree, registry = parse_schema(schema)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_pylist() if isinstance(col, pa.Array) else list(col)
    out = []
    for v in vals:
        if v is None or len(v) == 0:
            out.append(None)
            continue
        b = bytes(v)
        if (strip_schema_id_prefix and len(b) >= CONFLUENT_PREFIX_LEN
                and b[0] == CONFLUENT_MAGIC):
            b = b[CONFLUENT_PREFIX_LEN:]
        try:
            out.append(decode_datum(b, tree, registry)[0])
        except (ValueError, struct.error, IndexError, UnicodeDecodeError):
            out.append(None)
    return out
