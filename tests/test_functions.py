"""VRL function-library subset: strings, codecs, datetime, ip (SURVEY §2.7)."""

import base64
import json

import pyarrow as pa
import pytest

from vector_ray.functions import codecs, datetime_fns as dt, ip, strings as s


A = pa.array(["Hello World", "FOO_bar-baz", "", None])


def test_case_functions():
    assert s.upcase(A).to_pylist() == ["HELLO WORLD", "FOO_BAR-BAZ", "", None]
    assert s.downcase(A).to_pylist() == ["hello world", "foo_bar-baz", "", None]
    assert s.snakecase(pa.array(["fooBarBaz", "Hello World"])).to_pylist() == \
        ["foo_bar_baz", "hello_world"]
    assert s.kebabcase(pa.array(["fooBar baz"])).to_pylist() == ["foo-bar-baz"]
    assert s.camelcase(pa.array(["foo_bar_baz", "Hello World"])).to_pylist() == \
        ["fooBarBaz", "helloWorld"]


def test_string_edit_functions():
    assert s.truncate(A, 5).to_pylist() == ["Hello", "FOO_b", "", None]
    assert s.truncate(pa.array(["abcdef"]), 3, suffix="...").to_pylist() == ["abc..."]
    assert s.replace(A, "o", "0").to_pylist() == ["Hell0 W0rld", "FOO_bar-baz", "", None]
    assert s.replace(pa.array(["a1b2"]), r"\d", "#", regex=True).to_pylist() == ["a#b#"]
    assert s.slice_(A, 0, 5).to_pylist() == ["Hello", "FOO_b", "", None]
    assert s.strip_whitespace(pa.array(["  x  "])).to_pylist() == ["x"]
    assert s.strip_ansi_escape_codes(pa.array(["\x1b[31mred\x1b[0m"])).to_pylist() == ["red"]


def test_split_join():
    parts = s.split(pa.array(["a,b,c"]), ",")
    assert parts.to_pylist() == [["a", "b", "c"]]
    assert s.join(parts, "-").to_pylist() == ["a-b-c"]


def test_redact_sieve():
    col = pa.array(["card 4111-1111-1111-1111 used", "none"])
    out = s.redact(col, [r"\d{4}-\d{4}-\d{4}-\d{4}"])
    assert out.to_pylist() == ["card [REDACTED] used", "none"]
    assert s.sieve(pa.array(["a1b22c333"]), r"\d+", replace_with=",").to_pylist() == ["1,22,333"]


def test_codecs_roundtrip():
    col = pa.array(["hello", "wörld", None])
    assert codecs.decode_base64(codecs.encode_base64(col)).to_pylist() == \
        ["hello", "wörld", None]
    assert codecs.decode_base16(codecs.encode_base16(col)).to_pylist() == \
        ["hello", "wörld", None]
    assert codecs.decode_percent(codecs.encode_percent(col)).to_pylist() == \
        ["hello", "wörld", None]
    assert codecs.decode_gzip(codecs.encode_gzip(col)).to_pylist() == \
        ["hello", "wörld", None]
    assert codecs.decode_zlib(codecs.encode_zlib(col)).to_pylist() == \
        ["hello", "wörld", None]


def test_decode_errors_null():
    # runtime error -> null, matching VRL error-to-null coercion
    assert codecs.decode_base64(pa.array(["!!!not-base64!!!"])).to_pylist() == [None]
    assert codecs.decode_base16(pa.array(["zz"])).to_pylist() == [None]


def test_hashes():
    import hashlib

    col = pa.array(["abc"])
    assert codecs.md5(col).to_pylist() == [hashlib.md5(b"abc").hexdigest()]
    assert codecs.sha1(col).to_pylist() == [hashlib.sha1(b"abc").hexdigest()]
    assert codecs.sha2(col, 256).to_pylist() == [hashlib.sha256(b"abc").hexdigest()]
    assert codecs.sha3(col, 256).to_pylist() == [hashlib.sha3_256(b"abc").hexdigest()]
    h1 = codecs.hmac_sha256(col, "key").to_pylist()[0]
    import hmac

    assert h1 == hmac.new(b"key", b"abc", hashlib.sha256).hexdigest()
    u1 = codecs.uuid_v5(col).to_pylist()[0]
    assert u1 == codecs.uuid_v5(col).to_pylist()[0]  # deterministic


def test_datetime_functions():
    ts = pa.array([1_700_000_000_000_000, 1_700_000_123_456_789], pa.timestamp("us"))
    assert dt.to_unix_timestamp(ts).to_pylist() == [1_700_000_000, 1_700_000_123]
    rt = dt.from_unix_timestamp(dt.to_unix_timestamp(ts))
    assert rt[0].as_py().timestamp() == 1_700_000_000
    assert dt.format_timestamp(ts)[0].as_py() == "2023-11-14T22:13:20Z"
    fl = dt.floor_ts(ts, 3600)
    assert fl[0].as_py().minute == 0 and fl[0].as_py().second == 0
    assert dt.mod_num(pa.array([10, 7]), 3).to_pylist() == [1, 1]


def test_ip_functions():
    col = pa.array(["10.1.2.3", "256.1.1.1", "not-an-ip", "192.168.0.77", None])
    aton = ip.ip_aton(col)
    assert aton.to_pylist() == [0x0A010203, None, None, 0xC0A8004D, None]
    assert ip.ip_ntoa(pa.array([0x0A010203])).to_pylist() == ["10.1.2.3"]
    assert ip.ip_cidr_contains(col, "192.168.0.0/24").to_pylist() == \
        [False, False, False, True, False]
    assert ip.ip_subnet(pa.array(["10.1.2.3"]), 8).to_pylist() == ["10.0.0.0"]


def test_cli_validate_and_graph(tmp_path, capsys):
    from vector_ray.cli import main

    cfg = tmp_path / "p.yaml"
    cfg.write_text("""
sources:
  a: {type: parquet, path: /x}
sinks:
  s: {type: blackhole, inputs: [a]}
""")
    assert main(["validate", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "2 components" in out
    assert main(["graph", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert 'digraph topology' in out and '"a" -> "s"' in out


def test_cli_vrl_oneshot(capsys):
    from vector_ray.cli import main

    assert main(["vrl", "--program", '.x = upcase(.name)',
                 "--event", '{"name": "ada"}']) == 0
    assert json.loads(capsys.readouterr().out) == {"name": "ada", "x": "ADA"}
    assert main(["vrl", "--program", ".n = to_int!(.num)",
                 "--event", '{"num": "nope"}']) == 1
    assert "error" in json.loads(capsys.readouterr().out)
