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
