"""Avro Object Container File source (sources/avro.py)."""
import json
import struct
import zlib

import pytest

from vector_ray.sources.avro import (MAGIC, decode_container, read_avro,
                                     write_container)

SCHEMA = {
    "type": "record", "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "msg", "type": "string"},
        {"name": "ok", "type": "boolean"},
    ],
}
ROWS = [{"id": i, "msg": f"m{i}", "ok": i % 2 == 0} for i in range(2500)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_multi_block(tmp_path, codec):
    p = str(tmp_path / f"a_{codec}.avro")
    write_container(ROWS, SCHEMA, p, codec=codec, rows_per_block=1000)
    rows, meta = decode_container(open(p, "rb").read())
    assert rows == ROWS          # 3 blocks (1000/1000/500)
    assert meta["codec"] == codec
    assert json.loads(meta["schema"])["name"] == "Ev"


def test_snappy_block(tmp_path):
    # hand-build a snappy OCF block (writer emits null/deflate only)
    import pyarrow as pa

    from vector_ray.functions.avro import encode_datum, parse_schema
    from vector_ray.sources.avro import _decode_meta, _encode_long

    p = str(tmp_path / "s.avro")
    write_container(ROWS[:5], SCHEMA, p, codec="null")
    data = open(p, "rb").read()
    meta, pos = _decode_meta(data, 4)
    sync = data[pos:pos + 16]

    sch, reg = parse_schema(SCHEMA)
    raw = bytearray()
    for r in ROWS[:5]:
        encode_datum(r, sch, reg, raw)
    comp = pa.compress(bytes(raw), codec="snappy", asbytes=True)
    payload = comp + struct.pack(">I", zlib.crc32(bytes(raw)) & 0xFFFFFFFF)

    out = bytearray(MAGIC)
    m = {"avro.schema": json.dumps(SCHEMA).encode(),
         "avro.codec": b"snappy"}
    _encode_long(len(m), out)
    for k, v in m.items():
        kb = k.encode()
        _encode_long(len(kb), out); out += kb
        _encode_long(len(v), out); out += v
    _encode_long(0, out)
    out += sync
    _encode_long(5, out)
    _encode_long(len(payload), out)
    out += payload + sync
    rows, meta2 = decode_container(bytes(out))
    assert rows == ROWS[:5] and meta2["codec"] == "snappy"


def test_corrupt_sync_marker_raises(tmp_path):
    p = str(tmp_path / "c.avro")
    write_container(ROWS[:10], SCHEMA, p, codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF             # flip a sync byte
    with pytest.raises(ValueError, match="sync marker"):
        decode_container(bytes(data))


def test_read_avro_dataset(tmp_path, ray_session):
    for i in range(3):
        write_container(
            [{"id": 100 * i + j, "msg": "x", "ok": True}
             for j in range(50)],
            SCHEMA, str(tmp_path / f"part{i}.avro"))
    ds = read_avro([str(tmp_path / f"part{i}.avro") for i in range(3)],
                   columns=["id", "msg"])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == 150
    assert list(df.columns) == ["id", "msg"]
    assert df.id.iloc[0] == 0 and df.id.iloc[-1] == 249


def test_avro_topology_source(tmp_path, ray_session):
    from vector_ray.topology import Topology, run_topology

    for i in range(2):
        write_container(
            [{"id": 10 * i + j, "msg": "y", "ok": True}
             for j in range(5)],
            SCHEMA, str(tmp_path / f"in{i}.avro"))
    topo = Topology.from_yaml(f"""
sources:
  ev:
    type: avro
    path: "{tmp_path}/in*.avro"
    columns: [id, msg]
sinks:
  out:
    type: parquet
    inputs: [ev]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 10
