"""strata format decoder — reference-documented behaviors
(lib/codecs/src/decoding/format/strata.rs tests, re-expressed)."""

import json

import pytest

from vector_ray.functions.strata import (decode_strata, read_strata,
                                         strata_events_table)


def test_simple():
    data = ('{"bucket":"test-bucket","region":"us-east-1",'
            '"timestamp":"2024-01-01T00:00:00Z"}\n'
            '{"level":"info","message":"Log entry 1"}\n'
            '{"level":"warn","message":"Log entry 2"}')
    ev = decode_strata(data)
    assert len(ev) == 2
    assert ev[0]["level"] == "info"
    assert ev[0]["message"] == "Log entry 1"
    assert ev[0]["strata_file_header"]["bucket"] == "test-bucket"
    assert ev[1]["level"] == "warn"
    assert ev[1]["strata_file_header"]["region"] == "us-east-1"


def test_custom_field_name():
    data = '{"bucket":"b","region":"us-west-2"}\n{"event":"test"}'
    ev = decode_strata(data, header_field_name="metadata")
    assert len(ev) == 1
    assert ev[0]["metadata"]["bucket"] == "b"
    assert "strata_file_header" not in ev[0]


def test_nested_message_stays_string():
    data = ('{"bucket":"t","message":'
            '"{\\"compression\\":\\"snappy\\",\\"num_records\\":2}"}\n'
            '{"event":"test"}')
    ev = decode_strata(data)
    assert isinstance(ev[0]["strata_file_header"]["message"], str)


def test_empty_lines_skipped():
    ev = decode_strata('{"bucket":"t"}\n{"event":"x"}\n\n')
    assert len(ev) == 1


def test_empty_frame():
    assert decode_strata("") == []
    assert decode_strata(b"") == []


def test_invalid_header_raises():
    with pytest.raises(ValueError, match="header"):
        decode_strata('not valid json\n{"event":"test"}')


def test_invalid_log_line_raises():
    with pytest.raises(ValueError, match="log JSON"):
        decode_strata('{"bucket":"t"}\nnot valid json')


def test_events_table():
    import pyarrow as pa
    col = pa.array(['{"h":1}\n{"a":1}\n{"a":2}', None, '{"h":2}\n{"a":3}'])
    t = strata_events_table(col)
    assert t["row_idx"].to_pylist() == [0, 0, 2]
    rows = [json.loads(p) for p in t["payload"].to_pylist()]
    assert rows[0] == {"a": 1, "strata_file_header": {"h": 1}}
    assert rows[2] == {"a": 3, "strata_file_header": {"h": 2}}


def test_read_strata_plain_and_snappy(tmp_path, ray_session):
    header = '{"bucket":"cap","region":"r1"}'
    logs = '{"level":"info","n":1}\n{"level":"error","n":2}\n'
    plain = tmp_path / "a.strata"
    plain.write_bytes((header + "\n" + logs).encode())

    # strata_snappy capture: the file's first line is the strata
    # header (carried through by the framing), the ONE raw snappy
    # block holds the NDJSON log lines
    # (sources/framing.decode_strata_snappy returns header+payload)
    import pyarrow as pa
    from vector_ray.sources.framing import decode_strata_snappy
    comp = pa.Codec("snappy").compress(logs.encode(), asbytes=True)
    snap = tmp_path / "b.strata.snappy"
    snap.write_bytes((header + "\n").encode() + comp)
    frame = decode_strata_snappy(snap.read_bytes())
    assert frame == (header + "\n" + logs).encode()

    ds = read_strata(str(plain))
    rows = [json.loads(r["payload"]) for r in ds.take_all()]
    assert len(rows) == 2
    assert rows[0]["strata_file_header"]["bucket"] == "cap"
    assert rows[1]["level"] == "error"

    ds2 = read_strata(str(snap), framing="strata_snappy")
    rows2 = [json.loads(r["payload"]) for r in ds2.take_all()]
    assert rows2 == rows  # plain and snappy captures decode identically
