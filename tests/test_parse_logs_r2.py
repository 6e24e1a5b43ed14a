"""Round-2 parser breadth — unit tests mirroring the reference cue docs
(website/cue/reference/remap/functions/parse_{nginx_log,cef,user_agent,
xml,klog,glog}.cue examples)."""

import pyarrow as pa

from vector_ray.functions.parse_logs import (
    parse_cef,
    parse_glog,
    parse_klog,
    parse_nginx_log,
    parse_user_agent,
    parse_xml,
)

NGINX_COMBINED = (
    '172.17.0.1 - alice [01/Apr/2021:12:02:31 +0000] "POST /not-found HTTP/1.1" '
    '404 153 "http://localhost/somewhere" "Mozilla/5.0 (Windows NT 6.1) '
    'AppleWebKit/537.36 (KHTML, like Gecko) Chrome/72.0.3626.119 Safari/537.36" "2.75"'
)

NGINX_ERROR = (
    '2021/04/01 13:02:31 [error] 31#31: *1 open() '
    '"/usr/share/nginx/html/not-found" failed (2: No such file or directory), '
    'client: 172.17.0.1, server: localhost, request: "POST /not-found HTTP/1.1", '
    'host: "localhost:8081"'
)


def test_parse_nginx_combined():
    out = parse_nginx_log(pa.array([NGINX_COMBINED]), "combined")
    assert out["client"][0].as_py() == "172.17.0.1"
    assert out["user"][0].as_py() == "alice"
    assert out["request"][0].as_py() == "POST /not-found HTTP/1.1"
    assert out["status"][0].as_py() == 404
    assert out["size"][0].as_py() == 153
    assert out["referer"][0].as_py() == "http://localhost/somewhere"
    assert out["compression"][0].as_py() == "2.75"
    assert "2021-04-01" in str(out["ts"][0])


def test_parse_nginx_error():
    out = parse_nginx_log(pa.array([NGINX_ERROR]), "error")
    assert out["severity"][0].as_py() == "error"
    assert out["pid"][0].as_py() == 31
    assert out["tid"][0].as_py() == 31
    assert out["cid"][0].as_py() == 1
    assert out["client"][0].as_py() == "172.17.0.1"
    assert out["server"][0].as_py() == "localhost"
    assert out["request"][0].as_py() == "POST /not-found HTTP/1.1"
    assert out["host"][0].as_py() == "localhost:8081"
    assert out["message"][0].as_py().startswith("open()")


CEF = (
    "CEF:0|CyberArk|PTA|12.6|1|Suspected credentials theft|8|"
    "suser=mike2@prod1.domain.com shost=prod1.domain.com src=1.1.1.1 "
    "cs1Label=ExtraData cs1=None cs2Label=EventID cs2=52b06812ec3500ed864c461e"
)


def test_parse_cef_header_and_extension():
    out = parse_cef(pa.array([CEF]),
                    keys=["suser", "shost", "src", "cs1Label", "cs2"])
    assert out["cefVersion"][0].as_py() == "0"
    assert out["deviceVendor"][0].as_py() == "CyberArk"
    assert out["deviceProduct"][0].as_py() == "PTA"
    assert out["deviceVersion"][0].as_py() == "12.6"
    assert out["deviceEventClassId"][0].as_py() == "1"
    assert out["name"][0].as_py() == "Suspected credentials theft"
    assert out["severity"][0].as_py() == "8"
    assert out["suser"][0].as_py() == "mike2@prod1.domain.com"
    assert out["shost"][0].as_py() == "prod1.domain.com"
    assert out["src"][0].as_py() == "1.1.1.1"
    assert out["cs1Label"][0].as_py() == "ExtraData"
    assert out["cs2"][0].as_py() == "52b06812ec3500ed864c461e"


def test_parse_cef_escaped_pipe():
    line = r"CEF:1|Security|threat\|->manager|1.0|100|detected a \| in name|10|src=10.0.0.1"
    out = parse_cef(pa.array([line]), keys=["src"])
    assert out["deviceProduct"][0].as_py() == "threat|->manager"
    assert out["name"][0].as_py() == "detected a | in name"
    assert out["src"][0].as_py() == "10.0.0.1"


UA_FIREFOX = ("Mozilla Firefox 1.0.1 Mozilla/5.0 (X11; U; Linux i686; de-DE; "
              "rv:1.7.6) Gecko/20050223 Firefox/1.0.1")
UA_CHROME_WIN = ("Mozilla/5.0 (Windows NT 6.1) AppleWebKit/537.36 "
                 "(KHTML, like Gecko) Chrome/72.0.3626.119 Safari/537.36")


def test_parse_user_agent():
    out = parse_user_agent(pa.array([UA_FIREFOX, UA_CHROME_WIN, "Googlebot/2.1"]))
    assert out["browser_family"][0].as_py() == "Firefox"
    assert out["browser_version"][0].as_py() == "1.0.1"
    assert out["os_family"][0].as_py() == "Linux"
    assert out["browser_family"][1].as_py() == "Chrome"
    assert out["os_family"][1].as_py() == "Windows"
    assert out["os_version"][1].as_py() == "6.1"
    assert out["device_category"].to_pylist() == ["pc", "pc", "bot"]


XML = ('<book category="CHILDREN"><title lang="en">Harry Potter</title>'
       '<author>J K. Rowling</author><year>2005</year></book>')


def test_parse_xml():
    import json

    out = parse_xml(pa.array([XML, "not xml", None]), parse_number=False)
    doc = json.loads(out[0].as_py())
    assert doc == {"book": {
        "@category": "CHILDREN",
        "title": {"@lang": "en", "value": "Harry Potter"},
        "author": "J K. Rowling",
        "year": "2005",
    }}
    assert out[1].as_py() is None and out[2].as_py() is None
    # parse_number=True lifts numerics
    doc2 = json.loads(parse_xml(pa.array([XML]))[0].as_py())
    assert doc2["book"]["year"] == 2005


def test_parse_klog():
    out = parse_klog(
        pa.array(["I0505 17:59:40.692994   28133 klog.go:70] hello from klog"]),
        year=2026,
    )
    assert out["level"][0].as_py() == "info"
    assert out["id"][0].as_py() == 28133
    assert out["file"][0].as_py() == "klog.go"
    assert out["line"][0].as_py() == 70
    assert out["message"][0].as_py() == "hello from klog"
    assert out["timestamp"][0].as_py() == "2026-05-05T17:59:40.692994"


def test_parse_glog():
    out = parse_glog(
        pa.array(["I20210131 14:48:54.411655 15520 main.c++:9] Hello world!"]))
    assert out["level"][0].as_py() == "info"
    assert out["timestamp"][0].as_py() == "2021-01-31T14:48:54.411655"
    assert out["id"][0].as_py() == 15520
    assert out["file"][0].as_py() == "main.c++"
    assert out["line"][0].as_py() == 9
    assert out["message"][0].as_py() == "Hello world!"


def test_parse_nginx_no_match_is_null():
    out = parse_nginx_log(pa.array(["free text", NGINX_COMBINED]), "combined")
    assert out["client"][0].as_py() is None
    assert out["client"][1].as_py() == "172.17.0.1"


def test_parse_gelf():
    lines = pa.array([
        '{"version":"1.1","host":"h1","short_message":"boom",'
        '"timestamp":1700000000.0,"level":"6","_svc":"api"}',
        '{"version":"1.1","host":"h2"}',   # missing short_message
        "not json",
    ])
    from vector_ray.functions.parse_logs import parse_gelf

    out = parse_gelf(lines, extra_keys=["svc"])
    assert out["host"][0].as_py() == "h1"
    assert out["short_message"][0].as_py() == "boom"
    assert out["svc"][0].as_py() == "api"
    assert out["__valid"].to_pylist() == [True, False, False]


def test_parse_influxdb():
    from vector_ray.functions.parse_logs import parse_influxdb

    lines = pa.array([
        'cpu,host=server01,region=us-west usage=0.64,count=2i 1556813561098000000',
        'mem value=1.25',
        'disk,host=db01 used="mostly full" 123',
    ])
    out = parse_influxdb(lines, tags=["host", "region"],
                         fields=["usage", "count", "value", "used"])
    assert out["measurement"].to_pylist() == ["cpu", "mem", "disk"]
    assert out["host"].to_pylist() == ["server01", None, "db01"]
    assert out["region"][0].as_py() == "us-west"
    assert out["usage"][0].as_py() == "0.64"
    assert out["count"][0].as_py() == "2"       # trailing i stripped
    assert out["value"][1].as_py() == "1.25"
    assert out["used"][2].as_py() == "mostly full"
    assert out["timestamp"].to_pylist() == [1556813561098000000, None, 123]


def test_demo_logs_source_roundtrip():
    import ray

    from vector_ray.functions.parse_logs import parse_common_log
    from vector_ray.sources.demo_logs import demo_logs, generate_lines

    # deterministic: same seed -> identical tables
    a = generate_lines(50, "apache_common", seed=7)
    b = generate_lines(50, "apache_common", seed=7)
    assert a.equals(b)
    # every generated line parses back through the matching parser
    parsed = parse_common_log(a["message"])
    assert parsed["status"].null_count == 0
    # dataset form: sharded, reproducible total
    ds = demo_logs(100, "json", num_shards=4)
    assert ds.count() == 100
    ds2 = demo_logs(100, "syslog", num_shards=4)
    from vector_ray.functions.parse_logs import parse_influxdb  # noqa: F401
    assert ds2.count() == 100
