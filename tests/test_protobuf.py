"""Pure-Python protobuf wire codec (functions/protobuf.py)."""

import math

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ray.functions.protobuf import (
    decode_message,
    decode_protobuf_rows,
    decode_varint,
    encode_message,
    encode_protobuf_rows,
    encode_varint,
    schema_from_descriptor,
    _FILE_DESC_SET,
)

SCHEMA = {
    "id": (1, "int64"),
    "name": (2, "string"),
    "score": (3, "double"),
    "flags": (4, "uint32"),
    "ok": (5, "bool"),
    "delta": (6, "sint64"),
    "payload": (7, "bytes"),
    "tags": (8, "string", "repeated"),
    "values": (9, "int32", "repeated"),
    "ratio": (10, "float"),
    "fixed": (11, "fixed64"),
    "sfixed": (12, "sfixed32"),
}


def test_varint_roundtrip_edges():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, 2**64 - 1):
        buf = bytearray()
        encode_varint(v, buf)
        got, pos = decode_varint(bytes(buf), 0)
        assert got == v and pos == len(buf)


def test_message_roundtrip_all_scalar_kinds():
    obj = {"id": -5, "name": "héllo", "score": 2.5, "flags": 7,
           "ok": True, "delta": -1234567890123, "payload": b"\x00\xff",
           "tags": ["a", "b"], "values": [1, -2, 300],
           "ratio": 1.5, "fixed": 2**63, "sfixed": -42}
    wire = encode_message(obj, SCHEMA)
    back = decode_message(wire, SCHEMA)
    assert back == obj


def test_negative_int64_ten_byte_varint():
    wire = encode_message({"id": -1}, SCHEMA)
    # tag(1) + ten 0xFF-ish bytes, per spec for negative varints
    assert len(wire) == 11
    assert decode_message(wire, SCHEMA)["id"] == -1


def test_unknown_fields_skipped():
    wire = encode_message(
        {"id": 9, "name": "x", "score": 1.0, "values": [5, 6]}, SCHEMA)
    subset = {"name": (2, "string")}
    assert decode_message(wire, subset) == {"name": "x"}


def test_unpacked_repeated_accepted():
    # encode values=[7, 8] UNPACKED by hand (tag wt=0 per element)
    buf = bytearray()
    for v in (7, 8):
        encode_varint((9 << 3) | 0, buf)
        encode_varint(v, buf)
    assert decode_message(bytes(buf), SCHEMA)["values"] == [7, 8]


def test_nested_and_recursive_messages():
    inner = {"x": (1, "int32"), "s": (2, "string")}
    node: dict = {"val": (1, "int32")}
    node["child"] = (2, ("message", node))
    outer = {"meta": (1, ("message", inner)),
             "items": (2, ("message", inner), "repeated"),
             "tree": (3, ("message", node))}
    obj = {"meta": {"x": 1, "s": "a"},
           "items": [{"x": 2}, {"s": "b"}],
           "tree": {"val": 1, "child": {"val": 2, "child": {"val": 3}}}}
    assert decode_message(encode_message(obj, outer), outer) == obj


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.text(max_size=40),
       st.floats(allow_nan=False, allow_infinity=False),
       st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                max_size=8))
def test_roundtrip_property(i, s, f, vals):
    obj = {"id": i, "name": s, "score": f, "values": vals or None}
    obj = {k: v for k, v in obj.items() if v is not None}
    back = decode_message(encode_message(obj, SCHEMA), SCHEMA)
    assert back == obj


def test_float32_precision_boundary():
    wire = encode_message({"ratio": 0.1}, SCHEMA)
    back = decode_message(wire, SCHEMA)
    assert math.isclose(back["ratio"], 0.1, rel_tol=1e-6)


def test_batch_encode_decode_rows():
    t = pa.table({"id": [1, 2, None], "name": ["a", None, "c"],
                  "score": [1.0, 2.0, None]})
    wire = encode_protobuf_rows(t, SCHEMA)
    assert wire.type == pa.large_binary()
    rows = decode_protobuf_rows(wire, SCHEMA)
    assert rows[0] == {"id": 1, "name": "a", "score": 1.0}
    assert rows[1] == {"id": 2, "score": 2.0}
    assert rows[2] == {"name": "c"}
    # garbage bytes -> None, not an exception
    bad = pa.array([b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff"],
                   pa.large_binary())
    assert decode_protobuf_rows(bad, SCHEMA) == [None]


def test_vrl_parse_encode_proto_roundtrip(tmp_path):
    """encode_proto / parse_proto through the VRL compiler against a
    descriptor file on disk (the reference's desc_file + message_type
    surface, vrl parse_proto.cue / encode_proto.cue)."""
    from vector_ray.vrl import compile_vrl

    fds = {"file": [{
        "name": "t.proto", "package": "demo",
        "message_type": [{
            "name": "Msg",
            "field": [
                {"name": "id", "number": 1, "label": 1, "type": 3},
                {"name": "text", "number": 2, "label": 1, "type": 9},
            ],
        }],
    }]}
    desc = tmp_path / "msg.desc"
    desc.write_bytes(encode_message(fds, _FILE_DESC_SET))

    schema = {"id": (1, "int64"), "text": (2, "string")}
    wire = [encode_message({"id": i, "text": f"m{i}"}, schema)
            for i in range(3)]
    prog = compile_vrl(f"""
.msg = parse_proto!(.payload, "{desc}", "demo.Msg")
.id2 = .msg.id
.back = encode_proto!(.msg, "{desc}", "demo.Msg")
""")
    out, err, _ = prog(pa.table({"payload": pa.array(wire,
                                                     pa.large_binary())}))
    assert not any(err.to_pylist())
    assert out["id2"].to_pylist() == [0, 1, 2]
    assert [bytes(b) for b in out["back"].to_pylist()] == wire


def test_descriptor_set_reader_is_self_hosting():
    """Build a FileDescriptorSet with OUR encoder (a descriptor set is
    itself a protobuf message), then read schemas back from it —
    exactly what `protoc --descriptor_set_out` would produce for the
    same .proto."""
    # enum values from descriptor.proto: 3=int64 5=int32 9=string
    # 11=message 1=double 8=bool; label 3=repeated
    fds = {"file": [{
        "name": "test.proto", "package": "demo",
        "message_type": [{
            "name": "Event",
            "field": [
                {"name": "id", "number": 1, "label": 1, "type": 3},
                {"name": "msg", "number": 2, "label": 1, "type": 9},
                {"name": "vals", "number": 3, "label": 3, "type": 5},
                {"name": "inner", "number": 4, "label": 1, "type": 11,
                 "type_name": ".demo.Event.Inner"},
            ],
            "nested_type": [{
                "name": "Inner",
                "field": [
                    {"name": "flag", "number": 1, "label": 1, "type": 8},
                    {"name": "weight", "number": 2, "label": 1, "type": 1},
                ],
            }],
        }],
    }]}
    desc_bytes = encode_message(fds, _FILE_DESC_SET)
    schema, registry = schema_from_descriptor(desc_bytes, "demo.Event")
    obj = {"id": 10, "msg": "hi", "vals": [1, 2, 3],
           "inner": {"flag": True, "weight": 0.25}}
    wire = encode_message(obj, schema, registry)
    assert decode_message(wire, schema, registry) == obj
    with pytest.raises(ValueError):
        schema_from_descriptor(desc_bytes, "demo.Missing")
