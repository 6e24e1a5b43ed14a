"""Pure-Python Avro binary datum codec (functions/avro.py)."""

import json
import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ray.functions.avro import (
    decode_avro_rows,
    decode_datum,
    encode_avro_rows,
    encode_datum,
    parse_schema,
)

RECORD = json.dumps({
    "type": "record", "name": "Event", "namespace": "demo",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "msg", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tag", "type": ["null", "string"], "default": None},
        {"name": "vals", "type": {"type": "array", "items": "int"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {"name": "level", "type": {"type": "enum", "name": "Level",
                                   "symbols": ["low", "mid", "high"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "mark", "type": {"type": "fixed", "name": "Mark",
                                  "size": 4}},
    ],
})

OBJ = {"id": -42, "msg": "héllo", "score": 2.5, "ok": True, "tag": "x",
       "vals": [1, -2, 300], "attrs": {"a": "1", "b": "2"},
       "level": "mid", "blob": b"\x00\xff", "mark": b"abcd"}


def _roundtrip(obj, schema=RECORD):
    tree, reg = parse_schema(schema)
    wire = encode_datum(obj, tree, reg)
    back, pos = decode_datum(wire, tree, reg)
    assert pos == len(wire)
    return back


def test_record_roundtrip_all_kinds():
    assert _roundtrip(OBJ) == OBJ


def test_union_null_branch_and_default():
    assert _roundtrip({**OBJ, "tag": None})["tag"] is None
    # missing field with default encodes the default
    obj = dict(OBJ)
    del obj["tag"]
    assert _roundtrip(obj)["tag"] is None


def test_long_zigzag_spec_vectors():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    tree, reg = parse_schema('"long"')
    for v, b in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")):
        assert encode_datum(v, tree, reg) == b
        assert decode_datum(b, tree, reg)[0] == v


def test_negative_array_block_count_accepted():
    # writers may emit -count + byte-size per block; never produced here
    # but accepted per spec
    tree, reg = parse_schema('{"type": "array", "items": "long"}')
    items = bytearray()
    encode_datum(7, "long", {}, items)
    encode_datum(8, "long", {}, items)
    buf = bytearray()
    encode_datum(-2, "long", {}, buf)          # negative block count
    encode_datum(len(items), "long", {}, buf)  # block byte size
    buf += items
    encode_datum(0, "long", {}, buf)           # terminator
    assert decode_datum(bytes(buf), tree, reg)[0] == [7, 8]


def test_recursive_named_reference():
    schema = json.dumps({
        "type": "record", "name": "Node",
        "fields": [
            {"name": "val", "type": "int"},
            {"name": "next", "type": ["null", "Node"], "default": None},
        ],
    })
    obj = {"val": 1, "next": {"val": 2, "next": None}}
    assert _roundtrip(obj, schema) == obj


def test_batch_rows_and_confluent_prefix():
    t = pa.table({"id": [1, 2], "msg": ["a", "b"]})
    schema = json.dumps({
        "type": "record", "name": "M",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "msg", "type": "string"}],
    })
    wire = encode_avro_rows(t, schema)
    assert wire.type == pa.large_binary()
    assert decode_avro_rows(wire, schema) == [
        {"id": 1, "msg": "a"}, {"id": 2, "msg": "b"}]
    # confluent wire format: magic 0 + 4-byte schema id + datum
    prefixed = pa.array(
        [b"\x00" + struct.pack(">I", 17) + bytes(w) for w in
         wire.to_pylist()], pa.large_binary())
    assert decode_avro_rows(prefixed, schema,
                            strip_schema_id_prefix=True) == [
        {"id": 1, "msg": "a"}, {"id": 2, "msg": "b"}]
    # garbage -> None, not an exception
    assert decode_avro_rows(pa.array([b"\x81"], pa.large_binary()),
                            schema) == [None]


def test_enum_out_of_range_rejected():
    tree, reg = parse_schema(RECORD)
    with pytest.raises(ValueError):
        encode_datum({**OBJ, "level": "nope"}, tree, reg)
    with pytest.raises(ValueError):
        encode_datum({**OBJ, "mark": b"toolong!"}, tree, reg)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.text(max_size=30),
       st.floats(allow_nan=False, allow_infinity=False),
       st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                max_size=6),
       st.dictionaries(st.text(max_size=8), st.text(max_size=8),
                       max_size=4),
       st.booleans(), st.binary(max_size=16))
def test_roundtrip_property(i, s, f, vals, attrs, ok, blob):
    obj = {"id": i, "msg": s, "score": f, "ok": ok, "tag": None,
           "vals": vals, "attrs": attrs, "level": "low", "blob": blob,
           "mark": b"\x01\x02\x03\x04"}
    assert _roundtrip(obj) == obj


def test_encode_avro_encoder_entry():
    from vector_ray.functions.encode import encode_avro

    schema = json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "a", "type": "long"}]})
    wire = encode_avro(pa.table({"a": [5]}), schema=schema)
    assert decode_avro_rows(wire, schema) == [{"a": 5}]
