"""Encoder family: logfmt / json / csv serialization."""

import json

import pyarrow as pa

from vector_ray.functions.encode import encode_csv, encode_json, encode_logfmt

T = pa.table({
    "level": ["info", "error", None],
    "msg": ["all good", 'said "hi"', "plain"],
    "n": [1, None, 3],
})


def test_encode_logfmt():
    out = encode_logfmt(T).to_pylist()
    assert out[0] == 'level=info msg="all good" n=1'
    assert out[1] == 'level=error msg="said \\"hi\\""'  # null n omitted
    assert out[2] == "msg=plain n=3"                    # null level omitted


def test_encode_json_roundtrip():
    out = encode_json(T).to_pylist()
    assert json.loads(out[0]) == {"level": "info", "msg": "all good", "n": 1}
    assert json.loads(out[1]) == {"level": "error", "msg": 'said "hi"'}
    assert json.loads(out[2]) == {"msg": "plain", "n": 3}


def test_encode_csv():
    out = encode_csv(T).to_pylist()
    assert out[0] == "info,all good,1"
    assert out[1] == 'error,"said ""hi""",'
    assert out[2] == ",plain,3"
    # column subset + delimiter
    assert encode_csv(T, ["n", "level"], delimiter="|").to_pylist()[0] == "1|info"


def test_encode_text():
    from vector_ray.functions.encode import encode_text

    t = pa.table({"message": ["hello", None]})
    assert encode_text(t).to_pylist() == ["hello", ""]


def test_encode_gelf():
    import json as _json

    from vector_ray.functions.encode import encode_gelf

    t = pa.table({
        "host": ["h1", None],
        "message": ["boom", "quiet"],
        "ts": pa.array([1_700_000_000_000_000, None], pa.timestamp("us")),
        "svc": ["api", None],
    })
    out = [_json.loads(s) for s in
           encode_gelf(t, extra_cols=["svc"]).to_pylist()]
    assert out[0]["version"] == "1.1"
    assert out[0]["host"] == "h1"
    assert out[0]["short_message"] == "boom"
    assert out[0]["timestamp"] == 1_700_000_000.0
    assert out[0]["_svc"] == "api"
    assert out[1]["host"] == "unknown"
    assert "timestamp" not in out[1] and "_svc" not in out[1]


def test_encode_syslog_5424_and_3164():
    from vector_ray.functions.encode import encode_syslog

    t = pa.table({
        "host": ["web1"],
        "app": ["nginx"],
        "severity": pa.array([3], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
        "message": ["it broke"],
    })
    line = encode_syslog(t, severity_col="severity", app_col="app",
                         facility=4).to_pylist()[0]
    assert line.startswith("<35>1 2023-11-14T")  # 4*8+3
    assert line.endswith(" web1 nginx - - - it broke")
    line3 = encode_syslog(t, rfc="rfc3164", severity_col="severity",
                          app_col="app", facility=4).to_pylist()[0]
    assert line3.startswith("<35>Nov 14 ")
    assert line3.endswith(" web1 nginx: it broke")


def test_encode_cef_roundtrips_through_parser():
    from vector_ray.functions.encode import encode_cef
    from vector_ray.functions.parse_logs import parse_cef

    t = pa.table({
        "cls": ["100"],
        "nm": ["detected | pipe"],
        "sev": ["7"],
        "src": ["10.0.0.1"],
        "duser": ["bob=admin"],
    })
    line = encode_cef(
        t, device_vendor="acme", device_product="ids", device_version="1.0",
        event_class_id_col="cls", name_col="nm", severity_col="sev",
        extension_cols=["src", "duser"],
    ).to_pylist()[0]
    parsed = parse_cef(pa.array([line]), keys=["src", "duser"])
    assert parsed["deviceVendor"][0].as_py() == "acme"
    assert parsed["name"][0].as_py() == "detected | pipe"
    assert parsed["src"][0].as_py() == "10.0.0.1"
    assert parsed["duser"][0].as_py() == "bob=admin"


def test_encode_protobuf_inline_schema():
    import pytest as _pytest

    from vector_ray.functions.encode import encode_protobuf
    from vector_ray.functions.protobuf import decode_protobuf_rows

    schema = {"a": (1, "int64"), "b": (2, "string")}
    t = pa.table({"a": [1, 2], "b": ["x", None]})
    wire = encode_protobuf(t, schema=schema)
    assert decode_protobuf_rows(wire, schema) == [
        {"a": 1, "b": "x"}, {"a": 2}]
    with _pytest.raises(ValueError):
        encode_protobuf(pa.table({"a": [1]}))  # no schema, no desc_file


def test_encode_logfmt_quotes_custom_delimiters():
    """Values containing a non-default kv/field delimiter must be
    quoted, or the encoding is ambiguous: with field_delimiter=','
    the value 'a,b' used to encode unquoted as k1=a,b,k2=x."""
    t = pa.table({"k1": ["a,b"], "k2": ["x"], "k3": ["p:q"]})
    out = encode_logfmt(t, kv_sep=":", field_sep=",").to_pylist()
    assert out[0] == 'k1:"a,b",k2:x,k3:"p:q"'
    # defaults unchanged: '=' in a value stays unquoted (split on
    # FIRST '=' is unambiguous), space still quotes
    t2 = pa.table({"k": ["a=b"], "m": ["two words"]})
    assert encode_logfmt(t2).to_pylist()[0] == 'k=a=b m="two words"'
