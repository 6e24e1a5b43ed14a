"""Log-format parser family (parse_syslog / apache / url / duration / bytes)."""

import pyarrow as pa
import pytest

from vector_ray.functions import parse_logs as pl


def test_parse_syslog():
    col = pa.array([
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<13>Feb  5 17:32:18 host app: hello",
        "not syslog",
    ])
    out = pl.parse_syslog(col)
    assert out["host"].to_pylist() == ["mymachine", "host", None]
    assert out["tag"].to_pylist() == ["su", "app", None]
    assert out["pid"].to_pylist() == [230, None, None]
    assert out["facility"].to_pylist() == [4, 1, None]
    assert out["severity"].to_pylist() == [2, 5, None]
    assert out["message"].to_pylist() == ["'su root' failed", "hello", None]


def test_parse_common_log():
    col = pa.array([
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326',
        "garbage",
    ])
    out = pl.parse_common_log(col)
    assert out["host"].to_pylist() == ["127.0.0.1", None]
    assert out["user"].to_pylist() == ["frank", None]
    assert out["method"].to_pylist() == ["GET", None]
    assert out["path"].to_pylist() == ["/apache_pb.gif", None]
    assert out["status"].to_pylist() == [200, None]
    assert out["size"].to_pylist() == [2326, None]
    assert out["ts"][0].as_py() is not None


def test_parse_combined_log():
    col = pa.array([
        '1.2.3.4 - - [10/Oct/2000:13:55:36 +0000] "POST /x HTTP/1.1" 404 - "http://ref" "curl/8"',
    ])
    out = pl.parse_apache_log(col, fmt="combined")
    assert out["referrer"].to_pylist() == ["http://ref"]
    assert out["agent"].to_pylist() == ["curl/8"]
    assert out["size"].to_pylist() == [None]  # '-' size -> null


def test_parse_url():
    col = pa.array([
        "https://user:pw@example.com:8443/a/b?x=1&y=2#frag",
        "http://plain.org",
        "nope",
    ])
    out = pl.parse_url(col)
    assert out["scheme"].to_pylist() == ["https", "http", None]
    assert out["host"].to_pylist() == ["example.com", "plain.org", None]
    assert out["port"].to_pylist() == [8443, None, None]
    assert out["path"].to_pylist() == ["/a/b", None, None]
    assert out["query"].to_pylist() == ["x=1&y=2", None, None]
    assert out["username"].to_pylist() == ["user", None, None]


def test_parse_query_string():
    col = pa.array(["x=1&y=two&z=", "y=only"])
    out = pl.parse_query_string(col, ["x", "y", "z"])
    assert out["x"].to_pylist() == ["1", None]
    assert out["y"].to_pylist() == ["two", "only"]
    assert out["z"].to_pylist() == ["", None]


def test_parse_duration():
    col = pa.array(["300ms", "2.5s", "1h", "oops"])
    out = pl.parse_duration(col, "s")
    assert out.to_pylist() == [pytest.approx(0.3), pytest.approx(2.5),
                               pytest.approx(3600.0), None]
    ms = pl.parse_duration(pa.array(["1.5s"]), "ms")
    assert ms.to_pylist() == [pytest.approx(1500.0)]


def test_parse_bytes():
    col = pa.array(["5MiB", "1.5GB", "42B", "x"])
    out = pl.parse_bytes(col)
    assert out.to_pylist() == [5 * 2**20, 1_500_000_000, 42, None]
