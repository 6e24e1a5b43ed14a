"""Pure-Python protobuf wire-format codec (no protobuf runtime).

Behavioral reference: `lib/codecs/src/encoding/format/protobuf.rs` and
`lib/codecs/src/decoding/format/protobuf.rs` (encode/decode one message
per event against a compiled descriptor set) and the VRL
`encode_proto`/`parse_proto` functions.  The wire format itself is
public and tiny — varints, zigzag, fixed 32/64, length-delimited — so
this module implements it directly instead of shipping a runtime:

- a **schema dict** maps field names to ``(number, type)`` /
  ``(number, type, "repeated")`` specs, with nested messages as
  ``(number, ("message", subschema_or_name))``;
- ``schema_from_descriptor`` turns a real compiled
  ``FileDescriptorSet`` (the output of ``protoc --descriptor_set_out``)
  into schema dicts **using this module's own decoder** — descriptor
  sets are themselves protobuf messages, so the reader is
  self-hosting and needs no toolchain.

Scalar types: int32 int64 uint32 uint64 sint32 sint64 bool enum
fixed64 sfixed64 double fixed32 sfixed32 float string bytes.
Repeated numeric fields use packed encoding on encode (proto3
default) and accept both packed and unpacked on decode, per spec.
Unknown fields are skipped by wire type on decode.
"""

from __future__ import annotations

import struct
from typing import Any, Mapping

import pyarrow as pa

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32",
                 "sint64", "bool", "enum"}
_I64_TYPES = {"fixed64", "sfixed64", "double"}
_I32_TYPES = {"fixed32", "sfixed32", "float"}
_LEN_TYPES = {"string", "bytes"}
_PACKABLE = _VARINT_TYPES | _I64_TYPES | _I32_TYPES


def _wire_type(ftype) -> int:
    if isinstance(ftype, tuple):  # ("message", ...)
        return _WT_LEN
    if ftype in _VARINT_TYPES:
        return _WT_VARINT
    if ftype in _I64_TYPES:
        return _WT_I64
    if ftype in _I32_TYPES:
        return _WT_I32
    if ftype in _LEN_TYPES:
        return _WT_LEN
    raise ValueError(f"unknown protobuf field type {ftype!r}")


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def encode_varint(v: int, out: bytearray) -> None:
    v &= (1 << 64) - 1  # negative int32/int64 encode as 10-byte varints
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int) -> int:
    if v >= (1 << (bits - 1)):
        v -= 1 << bits
    return v


# ---------------------------------------------------------------------------
# single-value encode/decode
# ---------------------------------------------------------------------------

def _encode_scalar(ftype: str, v: Any, out: bytearray) -> None:
    if ftype in ("int32", "int64", "uint32", "uint64", "enum"):
        encode_varint(int(v), out)
    elif ftype in ("sint32", "sint64"):
        encode_varint(_zigzag(int(v)), out)
    elif ftype == "bool":
        encode_varint(1 if v else 0, out)
    elif ftype == "double":
        out += struct.pack("<d", float(v))
    elif ftype == "float":
        out += struct.pack("<f", float(v))
    elif ftype == "fixed64":
        out += struct.pack("<Q", int(v) & ((1 << 64) - 1))
    elif ftype == "sfixed64":
        out += struct.pack("<q", int(v))
    elif ftype == "fixed32":
        out += struct.pack("<I", int(v) & ((1 << 32) - 1))
    elif ftype == "sfixed32":
        out += struct.pack("<i", int(v))
    elif ftype == "string":
        b = str(v).encode()
        encode_varint(len(b), out)
        out += b
    elif ftype == "bytes":
        b = bytes(v)
        encode_varint(len(b), out)
        out += b
    else:
        raise ValueError(f"unknown scalar type {ftype!r}")


def _decode_scalar(ftype: str, data: bytes, pos: int) -> tuple[Any, int]:
    if ftype in ("int32", "int64", "uint32", "uint64", "enum"):
        v, pos = decode_varint(data, pos)
        if ftype == "int32":
            v = _to_signed(v & ((1 << 64) - 1), 64)  # sign from 64-bit wire
        elif ftype == "int64":
            v = _to_signed(v, 64)
        return v, pos
    if ftype in ("sint32", "sint64"):
        v, pos = decode_varint(data, pos)
        return _unzigzag(v), pos
    if ftype == "bool":
        v, pos = decode_varint(data, pos)
        return bool(v), pos
    if ftype == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if ftype == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if ftype == "fixed64":
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    if ftype == "sfixed64":
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    if ftype == "fixed32":
        return struct.unpack_from("<I", data, pos)[0], pos + 4
    if ftype == "sfixed32":
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if ftype == "string":
        n, pos = decode_varint(data, pos)
        return data[pos:pos + n].decode("utf-8", errors="replace"), pos + n
    if ftype == "bytes":
        n, pos = decode_varint(data, pos)
        return bytes(data[pos:pos + n]), pos + n
    raise ValueError(f"unknown scalar type {ftype!r}")


# ---------------------------------------------------------------------------
# message encode/decode against a schema dict
# ---------------------------------------------------------------------------

def _norm_spec(spec) -> tuple[int, Any, bool]:
    """(number, type_or_message, repeated) from a schema-dict value."""
    if len(spec) == 3:
        number, ftype, rep = spec
        return int(number), ftype, rep == "repeated"
    number, ftype = spec
    return int(number), ftype, False


def _resolve(ftype, registry):
    """('message', name) -> ('message', schema_dict) via the registry
    (lazy so recursive message types terminate)."""
    if isinstance(ftype, tuple) and isinstance(ftype[1], str):
        if registry is None or ftype[1] not in registry:
            raise ValueError(f"unresolved message type {ftype[1]!r}")
        return ("message", registry[ftype[1]])
    return ftype


def encode_message(obj: Mapping[str, Any], schema: Mapping[str, Any],
                   registry: Mapping[str, Any] | None = None) -> bytes:
    """Serialize a dict to protobuf wire bytes.  ``None`` / missing
    fields are omitted (proto3 absence); repeated packable scalars use
    packed encoding."""
    out = bytearray()
    for name, spec in schema.items():
        v = obj.get(name)
        if v is None:
            continue
        number, ftype, repeated = _norm_spec(spec)
        ftype = _resolve(ftype, registry)
        is_msg = isinstance(ftype, tuple)
        if repeated:
            vals = list(v)
            if not vals:
                continue
            if not is_msg and ftype in _PACKABLE:
                payload = bytearray()
                for x in vals:
                    _encode_scalar(ftype, x, payload)
                encode_varint((number << 3) | _WT_LEN, out)
                encode_varint(len(payload), out)
                out += payload
            else:
                for x in vals:
                    encode_varint((number << 3) | _WT_LEN, out)
                    if is_msg:
                        b = encode_message(x, ftype[1], registry)
                        encode_varint(len(b), out)
                        out += b
                    else:
                        _encode_scalar(ftype, x, out)
        elif is_msg:
            b = encode_message(v, ftype[1], registry)
            encode_varint((number << 3) | _WT_LEN, out)
            encode_varint(len(b), out)
            out += b
        else:
            encode_varint((number << 3) | _wire_type(ftype), out)
            _encode_scalar(ftype, v, out)
    return bytes(out)


def _skip(data: bytes, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        _, pos = decode_varint(data, pos)
        return pos
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    if wt == _WT_LEN:
        n, pos = decode_varint(data, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wt}")


def decode_message(data: bytes, schema: Mapping[str, Any],
                   registry: Mapping[str, Any] | None = None,
                   ) -> dict[str, Any]:
    """Parse protobuf wire bytes into a dict.  Later occurrences of a
    singular field overwrite earlier ones; repeated fields accumulate
    (packed and unpacked both accepted); unknown field numbers are
    skipped by wire type."""
    by_number: dict[int, tuple[str, Any, bool]] = {}
    for name, spec in schema.items():
        number, ftype, repeated = _norm_spec(spec)
        by_number[number] = (name, _resolve(ftype, registry), repeated)
    out: dict[str, Any] = {}
    pos, n = 0, len(data)
    while pos < n:
        tag, pos = decode_varint(data, pos)
        number, wt = tag >> 3, tag & 7
        entry = by_number.get(number)
        if entry is None:
            pos = _skip(data, pos, wt)
            continue
        name, ftype, repeated = entry
        is_msg = isinstance(ftype, tuple)
        if is_msg:
            ln, pos = decode_varint(data, pos)
            v = decode_message(data[pos:pos + ln], ftype[1], registry)
            pos += ln
            if repeated:
                out.setdefault(name, []).append(v)
            else:
                out[name] = v
        elif repeated and wt == _WT_LEN and ftype in _PACKABLE:
            ln, pos = decode_varint(data, pos)
            end = pos + ln
            vals = out.setdefault(name, [])
            while pos < end:
                v, pos = _decode_scalar(ftype, data, pos)
                vals.append(v)
        else:
            v, pos = _decode_scalar(ftype, data, pos)
            if repeated:
                out.setdefault(name, []).append(v)
            else:
                out[name] = v
    return out


# ---------------------------------------------------------------------------
# FileDescriptorSet reader (self-hosting: a descriptor set is itself a
# protobuf message, decoded with the schema below — the public subset
# of google/protobuf/descriptor.proto this codec needs)
# ---------------------------------------------------------------------------

_FIELD_DESC = {
    "name": (1, "string"),
    "number": (3, "int32"),
    "label": (4, "enum"),      # 1 optional / 2 required / 3 repeated
    "type": (5, "enum"),
    "type_name": (6, "string"),
}
_DESC: dict[str, Any] = {
    "name": (1, "string"),
    "field": (2, ("message", _FIELD_DESC), "repeated"),
}
_DESC["nested_type"] = (3, ("message", _DESC), "repeated")
_FILE_DESC = {
    "name": (1, "string"),
    "package": (2, "string"),
    "message_type": (4, ("message", _DESC), "repeated"),
}
_FILE_DESC_SET = {"file": (1, ("message", _FILE_DESC), "repeated")}

# FieldDescriptorProto.Type enum values (descriptor.proto, public)
_TYPE_BY_ENUM = {
    1: "double", 2: "float", 3: "int64", 4: "uint64", 5: "int32",
    6: "fixed64", 7: "fixed32", 8: "bool", 9: "string", 11: "message",
    12: "bytes", 13: "uint32", 14: "enum", 15: "sfixed32",
    16: "sfixed64", 17: "sint32", 18: "sint64",
}


def schema_from_descriptor(desc_bytes: bytes, message_type: str,
                           ) -> tuple[dict, dict]:
    """(schema, registry) for ``message_type`` (fully qualified, with
    or without the leading dot) from a compiled FileDescriptorSet."""
    fds = decode_message(desc_bytes, _FILE_DESC_SET)
    registry: dict[str, dict] = {}

    def walk(prefix: str, msg: dict) -> None:
        fq = f"{prefix}.{msg.get('name', '')}"
        schema: dict[str, Any] = {}
        for f in msg.get("field", []):
            t = _TYPE_BY_ENUM.get(f.get("type"))
            if t is None:  # group / unsupported: skip the field
                continue
            rep = ("repeated",) if f.get("label") == 3 else ()
            if t == "message":
                spec = (f["number"], ("message", f.get("type_name", "")),
                        *rep)
            else:
                spec = (f["number"], t, *rep)
            schema[f["name"]] = spec
        registry[fq] = schema
        for nested in msg.get("nested_type", []):
            walk(fq, nested)

    for file in fds.get("file", []):
        pkg = file.get("package", "")
        prefix = f".{pkg}" if pkg else ""
        for msg in file.get("message_type", []):
            walk(prefix, msg)

    key = message_type if message_type.startswith(".") \
        else "." + message_type
    if key not in registry:
        raise ValueError(f"message type {message_type!r} not in "
                         f"descriptor set (have {sorted(registry)})")
    return registry[key], registry


# ---------------------------------------------------------------------------
# batch (Arrow) surface — the sink/source codec shape
# ---------------------------------------------------------------------------

def encode_protobuf_rows(t: pa.Table, schema: Mapping[str, Any],
                         cols=None,
                         registry: Mapping[str, Any] | None = None,
                         ) -> pa.Array:
    """One wire-format message per row over the schema's (or ``cols``)
    columns; null fields are omitted.  Per-row byte assembly is
    inherent to the format — the batch boundary keeps it off the
    driver."""
    names = [c for c in (cols or schema) if c in t.column_names]
    pydata = {c: t[c].to_pylist() for c in names}
    out = []
    for i in range(t.num_rows):
        obj = {c: pydata[c][i] for c in names if pydata[c][i] is not None}
        out.append(encode_message(obj, schema, registry))
    return pa.array(out, pa.large_binary())


def decode_protobuf_rows(col, schema: Mapping[str, Any],
                         registry: Mapping[str, Any] | None = None,
                         ) -> list[dict]:
    """Wire bytes -> dicts (one per row); undecodable rows -> None."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(decode_message(v, schema, registry))
        except (ValueError, struct.error, IndexError):
            out.append(None)
    return out
