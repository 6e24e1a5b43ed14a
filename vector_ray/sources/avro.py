"""Apache Avro Object Container File source (and a writer for tests /
sink parity) — the FILE framing on top of the pure-Python datum codec
in ``functions/avro.py``.

Behavioral reference: the reference decodes Avro DATUMS from transport
framing (`lib/codecs/src/decoding/format/avro.rs`); batch pipelines
read Avro *files*, so this closes the natural file-source analog.
Format per the public Avro 1.11 spec "Object Container Files":

- header: magic ``Obj\\x01`` + file-metadata map (string -> bytes;
  ``avro.schema`` JSON, ``avro.codec``) + 16-byte sync marker
- each block: long(object count) + long(compressed byte size) + data
  + the sync marker (verified — a mismatch means a torn/corrupt file)
- codecs: ``null``, ``deflate`` (raw zlib, wbits=-15), ``snappy``
  (4-byte big-endian CRC32 suffix) via pyarrow's bundled codec

Scale shape: one decode task per FILE (``read_binary_files`` →
``flat_map``-style batch decode); OCF blocks inside a file decode
sequentially — fine for many-file corpora, documented as the
parallelism unit.  Row decoding is per-datum Python like the datum
codec itself (the codec boundary, not a hot analytics path).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any

import pyarrow as pa

from vector_ray.functions.avro import (_decode_long, _encode_long,
                                       decode_datum, encode_datum,
                                       parse_schema)

MAGIC = b"Obj\x01"


def _decode_meta(data: bytes, pos: int) -> tuple[dict, int]:
    """The header's map<bytes> (block-form like any avro map)."""
    meta: dict[str, bytes] = {}
    while True:
        cnt, pos = _decode_long(data, pos)
        if cnt == 0:
            return meta, pos
        if cnt < 0:          # negative count carries a byte size
            _, pos = _decode_long(data, pos)
            cnt = -cnt
        for _ in range(cnt):
            n, pos = _decode_long(data, pos)
            key = data[pos:pos + n].decode("utf-8"); pos += n
            n, pos = _decode_long(data, pos)
            meta[key] = bytes(data[pos:pos + n]); pos += n


def _decompress(block: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":
        return zlib.decompress(block, wbits=-15)
    if codec == "snappy":
        if len(block) < 4:
            raise ValueError("snappy OCF block shorter than its CRC")
        raw = _snappy_raw(block[:-4])
        crc = struct.unpack(">I", block[-4:])[0]
        if zlib.crc32(raw) & 0xFFFFFFFF != crc:
            raise ValueError("snappy OCF block CRC mismatch")
        return raw
    raise ValueError(f"unsupported avro codec: {codec}")


def _snappy_raw(payload: bytes) -> bytes:
    # pyarrow's snappy codec is raw-format (no framing) — matches
    # OCF; the uncompressed size rides in the raw-snappy preamble
    from vector_ray.functions.codecs import _snappy_len

    return pa.decompress(payload, decompressed_size=_snappy_len(payload),
                         codec="snappy", asbytes=True)


def decode_container(data: bytes) -> tuple[list[Any], dict]:
    """All datums of one OCF + its metadata (schema json, codec)."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    meta, pos = _decode_meta(data, 4)
    sync = data[pos:pos + 16]; pos += 16
    schema_json = meta.get("avro.schema", b"null").decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    schema, registry = parse_schema(json.loads(schema_json))
    rows: list[Any] = []
    n_total = len(data)
    while pos < n_total:
        cnt, pos = _decode_long(data, pos)
        size, pos = _decode_long(data, pos)
        raw = _decompress(data[pos:pos + size], codec); pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("avro OCF sync marker mismatch "
                             "(torn or corrupt block)")
        pos += 16
        p = 0
        for _ in range(cnt):
            v, p = decode_datum(raw, schema, registry, p)
            rows.append(v)
        if p != len(raw):
            raise ValueError("avro OCF block has trailing bytes")
    return rows, {"schema": schema_json, "codec": codec}


def write_container(rows: list[Any], schema, path: str, *,
                    codec: str = "deflate",
                    sync: bytes = b"\x00" * 16,
                    rows_per_block: int = 1000) -> None:
    """Writer (tests / sink parity): spec-conformant OCF."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    schema_json = json.dumps(schema) if not isinstance(schema, str) \
        else schema
    sch, registry = parse_schema(json.loads(schema_json))
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    _encode_long(len(meta), out)
    for k, v in meta.items():
        kb = k.encode()
        _encode_long(len(kb), out); out += kb
        _encode_long(len(v), out); out += v
    _encode_long(0, out)
    out += sync
    for i in range(0, len(rows), rows_per_block):
        chunk = rows[i:i + rows_per_block]
        raw = bytearray()
        for r in chunk:
            encode_datum(r, sch, registry, raw)
        raw = bytes(raw)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(raw) + comp.flush()
        elif codec in ("", "null"):
            payload = raw
        else:
            raise ValueError(f"writer supports null/deflate, not {codec}")
        _encode_long(len(chunk), out)
        _encode_long(len(payload), out)
        out += payload
        out += sync
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_avro(paths, *, columns=None):
    """``ray.data.Dataset`` over Avro object container files — one
    decode task per file (`read_binary_files` keeps the read streaming
    and per-file parallel); records must be avro records (dicts)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        batches: list[pa.Table] = []
        for blob in t["bytes"].to_pylist():
            rows, _ = decode_container(blob)
            if not rows:
                continue
            tab = pa.Table.from_pylist(rows)
            if columns:
                tab = tab.select(columns)
            batches.append(tab)
        if not batches:
            return pa.table({})
        return pa.concat_tables(batches, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow",
                          batch_size=None)
