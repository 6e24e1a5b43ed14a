"""Round-2 stdlib breadth (functions/stdlib_extra.py via the VRL
function table); names/semantics per website/cue/reference/remap/
functions/*.cue."""

import pyarrow as pa
import pytest

from vector_ray.vrl import VrlError, compile_vrl


def _t():
    return pa.table({
        "s": ["Hello World", "foo_bar", ""],
        "n": pa.array([42, 7, 255], pa.int64()),
        "f": pa.array([1234.5, 0.125, -3.0], pa.float64()),
        "ip": ["10.1.2.3", "::1", "nope"],
        "js": ['{"a":1}', "junk", "[1,2]"],
        "tags": [["a", "b"], ["c"], []],
        "more": [["x"], ["y", "z"], ["w"]],
        "obj": pa.array([{"u": "1", "v": "2"}] * 3),
        "sev": pa.array([3, 6, 99], pa.int64()),
        "lvl": ["error", "warn", "unknown"],
    })


def test_type_predicates():
    out, _, _ = compile_vrl("""
.ii = is_integer(.n)
.ff = is_float(.f)
.ia = is_array(.tags)
.io = is_object(.obj)
.ie = is_empty(.s)
.inl = is_nullish(.s)
.v4 = is_ipv4(.ip)
.v6 = is_ipv6(.ip)
.ij = is_json(.js)
""")(_t())
    assert out["ii"].to_pylist() == [True] * 3
    assert out["ff"].to_pylist() == [True] * 3
    assert out["ia"].to_pylist() == [True] * 3
    assert out["io"].to_pylist() == [True] * 3
    assert out["ie"].to_pylist() == [False, False, True]
    assert out["inl"].to_pylist() == [False, False, True]
    assert out["v4"].to_pylist() == [True, False, False]
    assert out["v6"].to_pylist() == [False, True, False]
    assert out["ij"].to_pylist() == [True, False, True]


def test_type_assertions():
    t = _t()
    out, err, _ = compile_vrl(".x = int!(.n)")(t)
    assert out["x"].to_pylist() == [42, 7, 255]
    assert not any(err.to_pylist())
    _, err2, _ = compile_vrl(".x = int!(.s)")(t)
    assert all(err2.to_pylist())  # wrong-typed column errors every row
    out3, _, _ = compile_vrl('.x = to_bool(.lvl) ?? false')(
        pa.table({"lvl": ["true", "no", "bogus"]}))
    assert out3["x"].to_pylist() == [True, False, False]


def test_collections_keys_values_merge():
    out, _, _ = compile_vrl("""
.k = keys(.obj)
.v = values(.obj)
.m = merge(.obj, {"v": "9", "w": "3"})
""")(_t())
    assert out["k"].to_pylist()[0] == ["u", "v"]
    assert out["v"].to_pylist()[0] == ["1", "2"]
    assert out["m"].to_pylist()[0] == {"u": "1", "v": "9", "w": "3"}


def test_collections_push_append_zip():
    out, _, _ = compile_vrl("""
.p = push(.tags, "END")
.a = append(.tags, .more)
.z = zip(.tags, .more)
""")(_t())
    assert out["p"].to_pylist() == [["a", "b", "END"], ["c", "END"], ["END"]]
    assert out["a"].to_pylist() == [["a", "b", "x"], ["c", "y", "z"], ["w"]]
    assert out["z"].to_pylist() == [[["a", "x"]], [["c", "y"]], []]


def test_collections_get_remove_unflatten():
    t = pa.table({"o": pa.array([{"a.b": "1", "a.c": "2", "d": "3"}] * 2,
                                pa.struct([("a.b", pa.string()),
                                           ("a.c", pa.string()),
                                           ("d", pa.string())]))})
    out, _, _ = compile_vrl("""
.g = get(.o, ["d"])
.r = remove(.o, ["d"])
.u = unflatten(.o)
""")(t)
    assert out["g"].to_pylist() == ["3", "3"]
    assert out["r"].to_pylist()[0] == {"a.b": "1", "a.c": "2"}
    assert out["u"].to_pylist()[0] == {"a.b": None, "a.c": None,
                                       "d": "3", "a": {"b": "1", "c": "2"}} \
        or out["u"].to_pylist()[0] == {"d": "3", "a": {"b": "1", "c": "2"}}


def test_string_matching():
    out, _, _ = compile_vrl("""
.i = find(.s, "o")
.ca = contains_all(.s, ["o", "l"])
.ma = match_any(.s, ["^Hello", "^zzz"])
.mr = match_array(.tags, "^a$")
""")(_t())
    assert out["i"].to_pylist() == [4, 1, -1]
    assert out["ca"].to_pylist() == [True, False, False]
    assert out["ma"].to_pylist() == [True, False, False]
    assert out["mr"].to_pylist() == [True, False, False]


def test_case_and_format():
    out, _, _ = compile_vrl("""
.pc = pascalcase(.s)
.sc = screamingsnakecase(.s)
.hex = format_int(.n, 16)
.fn = format_number(.f, 2)
""")(_t())
    assert out["pc"].to_pylist() == ["HelloWorld", "FooBar", ""]
    assert out["sc"].to_pylist() == ["HELLO_WORLD", "FOO_BAR", ""]
    assert out["hex"].to_pylist() == ["2a", "7", "ff"]
    assert out["fn"].to_pylist() == ["1,234.50", "0.12", "-3.00"]


def test_syslog_tables():
    out, _, _ = compile_vrl("""
.lv = to_syslog_level(.sev)
.sv = to_syslog_severity(.lvl)
.fa = to_syslog_facility(.sev)
""")(_t())
    assert out["lv"].to_pylist() == ["err", "info", None]
    assert out["sv"].to_pylist() == [3, 4, None]
    assert out["fa"].to_pylist() == ["daemon", "lpr", None]


def test_misc_value_functions():
    out, _, _ = compile_vrl("""
.c = crc(.s)
.u = uuid_v4()
.h = get_hostname()
.ts = now()
""")(_t())
    import zlib
    assert out["c"].to_pylist()[0] == str(zlib.crc32(b"Hello World"))
    us = out["u"].to_pylist()
    assert len(set(us)) == 3 and all(len(u) == 36 and u[14] == "4" for u in us)
    assert all(isinstance(h, str) and h for h in out["h"].to_pylist())
    assert pa.types.is_timestamp(out.schema.field("ts").type)


def test_match_datadog_query_function():
    t = pa.table({"status": ["error", "info", "error"],
                  "service": ["web", "web", "db"]})
    out, _, _ = compile_vrl(
        '.hit = match_datadog_query(., "status:error AND service:web")')(t)
    assert out["hit"].to_pylist() == [True, False, False]


def test_batch3_parsers_csv_tokens():
    t = pa.table({"c": ['a,b,c', 'x,"y,z",w', ''],
                  "tok": ['plain words here',
                          'A "with \\"a\\" inside" [some brackets]',
                          'one']})
    out, _, _ = compile_vrl(".l = parse_csv(.c)\n.t = parse_tokens(.tok)")(t)
    assert out["l"].to_pylist() == [["a", "b", "c"], ["x", "y,z", "w"], [""]]
    assert out["t"].to_pylist() == [
        ["plain", "words", "here"],
        ["A", 'with "a" inside', "some brackets"],
        ["one"]]


def test_batch3_vpc_flow_log():
    line = ("2 123456789010 eni-1235b8ca123456789 - - - - - - - "
            "1431280876 1431280934 - NODATA")
    out, err, _ = compile_vrl(". = parse_aws_vpc_flow_log!(.m)")(
        pa.table({"m": [line]}))
    row = {c: out[c].to_pylist()[0] for c in out.column_names}
    assert row["version"] == 2
    assert row["account_id"] == "123456789010"
    assert row["interface_id"] == "eni-1235b8ca123456789"
    assert row["srcaddr"] is None and row["srcport"] is None
    assert row["start"] == 1431280876 and row["end"] == 1431280934
    assert row["log_status"] == "NODATA"
    assert not any(err.to_pylist())


def test_batch3_alb_log():
    line = ('http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 '
            '192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 '
            '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
            'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 '
            '"Root=1-58337364-23a8c76965a2ef7629b185e3" "-" "-" 0 '
            '2018-11-30T22:22:48.364000Z "forward" "-" "-" "-" "-" "-" "-"')
    out, err, _ = compile_vrl(". = parse_aws_alb_log!(.m)")(
        pa.table({"m": [line]}))
    row = {c: out[c].to_pylist()[0] for c in out.column_names}
    assert row["type"] == "http"
    assert row["elb"] == "app/my-loadbalancer/50dc6c495c0c9188"
    assert row["client_host"] == "192.168.131.39:2817"
    assert row["target_host"] is None
    assert row["target_processing_time"] == 0.001
    assert row["received_bytes"] == 34 and row["sent_bytes"] == 366
    assert row["request_method"] == "GET"
    assert row["request_url"] == "http://www.example.com:80/"
    assert row["user_agent"] == "curl/7.46.0"
    assert row["ssl_cipher"] is None
    assert row["trace_id"] == "Root=1-58337364-23a8c76965a2ef7629b185e3"
    assert row["matched_rule_priority"] == "0"
    assert row["actions_executed"] == "forward"
    assert not any(err.to_pylist())


def test_batch3_parse_groks_first_match_wins():
    t = pa.table({"m": ["level=ERROR code=7", "GET /x 200", "junk here ok"]})
    out, err, _ = compile_vrl(
        '. = parse_groks!(.m, ["level=%{WORD:lvl} code=%{INT:code}",'
        ' "%{WORD:method} %{NOTSPACE:path} %{INT:status}"])')(t)
    assert out["lvl"].to_pylist() == ["ERROR", None, None]
    assert out["method"].to_pylist() == [None, "GET", None]
    assert err.to_pylist() == [False, False, True]


def test_batch3_linux_authorization():
    t = pa.table({"m": ["Mar 23 01:49:58 host sshd[1234]: Accepted publickey for user"]})
    out, _, _ = compile_vrl(". = parse_linux_authorization!(.m)")(t)
    assert out["appname"].to_pylist() == ["sshd"]
    assert out["pid"].to_pylist() == [1234]
    assert out["message"].to_pylist() == ["Accepted publickey for user"]


def test_batch3_ip_v6_interop():
    t = pa.table({"ip": ["10.1.2.3", "::ffff:192.0.2.1", "2001:db8::1", "bad"]})
    out, err, _ = compile_vrl("""
.v6 = ip_to_ipv6(.ip)
.v4 = ipv6_to_ipv4(.ip)
.packed = ip_pton(.ip)
""")(t)
    assert out["v6"].to_pylist() == [
        "::ffff:10.1.2.3", "::ffff:192.0.2.1", "2001:db8::1", None]
    assert out["v4"].to_pylist() == ["10.1.2.3", "192.0.2.1", None, None]
    assert out["packed"].to_pylist()[0] == b"\x0a\x01\x02\x03"
    rt, _, _ = compile_vrl(".back = ip_ntop!(.p)")(
        pa.table({"p": pa.array([b"\x0a\x01\x02\x03"], pa.binary())}))
    assert rt["back"].to_pylist() == ["10.1.2.3"]


def test_batch3_codecs():
    t = pa.table({"host": ["bücher.example"],
                  "mime": ["=?utf-8?Q?hello_=C3=A9?="]})
    out, _, _ = compile_vrl("""
.puny = encode_punycode(.host)
.back = decode_punycode(.puny)
.dec = decode_mime_q(.mime)
""")(t)
    assert out["puny"].to_pylist() == ["xn--bcher-kva.example"]
    assert out["back"].to_pylist() == ["bücher.example"]
    assert out["dec"].to_pylist()[0].startswith("hello")


def test_enrichment_lookup_functions(tmp_path):
    csv = tmp_path / "geo.csv"
    csv.write_text("code,name,region\nus,United States,AMER\nde,Germany,EMEA\n")
    from vector_ray.enrichment.table import FileTable
    tbl = FileTable(str(csv))
    t = pa.table({"cc": ["us", "de", "xx"], "CC": ["US", "DE", "XX"]})
    prog = compile_vrl("""
. = get_enrichment_table_record!("geo", {"code": .cc})
.hits = find_enrichment_table_records("geo", {"code": .cc})
""", tables={"geo": tbl})
    out, err, _ = prog(t)
    assert out["name"].to_pylist() == ["United States", "Germany", None]
    assert err.to_pylist() == [False, False, True]  # no-match errors on !
    assert out["hits"].to_pylist()[2] == []
    assert out["hits"].to_pylist()[0][0]["region"] == "AMER"
    # unknown table is a compile-visible error at run
    bad = compile_vrl('. = get_enrichment_table_record!("nope", {"code": .cc})')
    with pytest.raises(VrlError):
        bad(t)


def test_enrichment_lookup_in_topology(tmp_path):
    csv = tmp_path / "roles.csv"
    csv.write_text("role,team\nuser,customers\ntool,infra\n")
    from vector_ray.topology import Topology, run_topology
    topo = Topology.from_yaml(f"""
enrichment_tables:
  roles: {{path: "{csv}"}}
sources:
  t: {{type: transcripts, sf_dir: /root/testdata/sf0.001}}
transforms:
  tag:
    type: remap
    inputs: [t]
    source: |
      .rec = get_enrichment_table_record("roles", {{"role": .role}})
      .team = .rec.team
      del(.rec)
sinks:
  out: {{type: blackhole, inputs: [tag]}}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 6000


def test_batch4_encrypt_decrypt_roundtrip():
    t = pa.table({"m": ["secret message", "another", None]})
    out, err, _ = compile_vrl("""
key = "sixteen byte key"
iv = "initialization v"
.enc = encrypt!(.m, "AES-128-CBC-PKCS7", key, iv: iv)
.dec = decrypt!(.enc, "AES-128-CBC-PKCS7", key, iv: iv)
.plain = to_string(.dec)
""")(t)
    assert out["plain"].to_pylist()[:2] == ["secret message", "another"]
    enc = out["enc"].to_pylist()
    assert isinstance(enc[0], bytes) and enc[0] != b"secret message"
    # GCM mode roundtrip
    out2, _, _ = compile_vrl("""
key = "0123456789abcdef0123456789abcdef"
.enc = encrypt!(.m, "AES-256-GCM", key, iv: "twelve bytes")
.dec = to_string(decrypt!(.enc, "AES-256-GCM", key, iv: "twelve bytes"))
""")(pa.table({"m": ["hello gcm"]}))
    assert out2["dec"].to_pylist() == ["hello gcm"]


def test_batch4_assertions():
    t = pa.table({"n": pa.array([1, 2, 3], pa.int64())})
    _, err, _ = compile_vrl("assert!(.n > 1)")(t)
    assert err.to_pylist() == [True, False, False]
    _, err2, _ = compile_vrl("assert_eq!(.n, 2)")(t)
    assert err2.to_pylist() == [True, False, True]


def test_batch4_uuid_v7_and_random_bytes():
    t = pa.table({"x": [1, 2]})
    out, _, _ = compile_vrl(".u = uuid_v7()\n.b = random_bytes(8)")(t)
    us = out["u"].to_pylist()
    assert all(len(u) == 36 and u[14] == "7" for u in us)
    assert us[0][:13] == us[1][:13]  # shared ms timestamp prefix
    assert all(len(b) == 8 for b in out["b"].to_pylist())


def test_batch4_object_from_array():
    t = pa.table({"pairs": [[["a", "1"], ["b", "2"]], [["a", "3"], ["b", "4"]]]})
    out, _, _ = compile_vrl(".o = object_from_array(.pairs)")(t)
    assert out["o"].to_pylist() == [{"a": "1", "b": "2"}, {"a": "3", "b": "4"}]


def test_batch4_snappy_zstd_roundtrip():
    """pyarrow's bundled codecs back encode_/decode_snappy|zstd; the
    snappy bytes match encode_snappy.cue's documented example exactly."""
    import base64

    t = pa.table({"m": ["The quick brown fox jumps over 13 lazy dogs.",
                        None, "", "x" * 1000]})
    out, err, _ = compile_vrl("""
.s = encode_snappy!(.m)
.sd = decode_snappy!(.s)
.z = encode_zstd!(.m)
.zd = decode_zstd!(.z)
""")(t)
    assert out["sd"].to_pylist() == out["zd"].to_pylist() == t["m"].to_pylist()
    assert base64.b64encode(out["s"].to_pylist()[0]) == \
        b"LKxUaGUgcXVpY2sgYnJvd24gZm94IGp1bXBzIG92ZXIgMTMgbGF6eSBkb2dzLg=="
    # corrupt input -> VRL error/null, not a crash
    t2 = pa.table({"b": [b"\xff\xff\xff\xff"]})
    out2, err2, _ = compile_vrl(".d = decode_snappy(.b)\n.e = decode_zstd(.b)")(t2)
    assert out2["d"].to_pylist() == [None] and out2["e"].to_pylist() == [None]


def test_batch5_inventory_tail():
    t = pa.table({"a": ["x=1&y=2", "y=9"], "n": [1.24, 2.75],
                  "obj": pa.array([{"u": "1"}, {"u": "2"}]),
                  "host": ["www.example.co.uk", "a.b.example.com"],
                  "rb": ['{"x" => "y", "z" => nil}', "notahash"],
                  "ms": ["a1b2 c3", "zzz"]})
    out, err, _ = compile_vrl("""
.qs = parse_query_string(.a, ["x", "y"])
.c = ceil(.n)
.f = floor(.n)
.obj2 = set(.obj, ["v"], "9")
.etld = parse_etld(.host)
.rbj = parse_ruby_hash(.rb)
.all = parse_regex_all(.ms, r"([a-z])(\\d)")
.j = encode_json(.obj)
.kv = encode_logfmt(.obj)
""")(t)
    assert out["qs"].to_pylist() == [{"x": "1", "y": "2"},
                                     {"x": None, "y": "9"}]
    assert out["c"].to_pylist() == [2.0, 3.0]
    assert out["f"].to_pylist() == [1.0, 2.0]
    assert out["obj2"].to_pylist()[0] == {"u": "1", "v": "9"}
    assert out["etld"].to_pylist() == ["example.co.uk", "example.com"]
    assert out["rbj"].to_pylist() == ['{"x" : "y", "z" : null}', None]
    assert out["all"].to_pylist() == [[["a", "1"], ["b", "2"], ["c", "3"]], []]
    assert out["j"].to_pylist() == ['{"u":"1"}', '{"u":"2"}']
    assert out["kv"].to_pylist() == ["u=1", "u=2"]


def test_batch5_community_id_spec_vector():
    # corelight/community-id-spec published test vector
    from vector_ray.functions.stdlib_extra import community_id
    out = community_id(pa.array(["128.232.110.120"]),
                       pa.array(["66.35.250.204"]),
                       pa.array([34855]), pa.array([80]), protocol=6)
    assert out.to_pylist() == ["1:LQU9qZlK+B5F3KDmev6m5PMibrg="]
    # direction-invariant
    rev = community_id(pa.array(["66.35.250.204"]),
                       pa.array(["128.232.110.120"]),
                       pa.array([80]), pa.array([34855]), protocol=6)
    assert rev.to_pylist() == out.to_pylist()


def test_batch5_secrets():
    t = pa.table({"x": [1, 2]})
    out, err, _ = compile_vrl("""
.tok = get_secret("token")
set_secret("other", "v2")
.o = get_secret("other")
remove_secret("other")
.gone = get_secret("other") ?? "none"
""", secrets={"token": "s3cr3t"})(t)
    assert out["tok"].to_pylist() == ["s3cr3t"] * 2
    assert out["o"].to_pylist() == ["v2"] * 2
    assert out["gone"].to_pylist() == ["none"] * 2


def test_batch5_cloudwatch_subscription():
    import json
    msg = json.dumps({
        "messageType": "DATA_MESSAGE", "owner": "111111111111",
        "logGroup": "test", "logStream": "stream",
        "subscriptionFilters": ["Destination"],
        "logEvents": [
            {"id": "35683643798", "timestamp": 1600110569039,
             "message": "{\"bytes\":26780}"}]})
    out, err, _ = compile_vrl(
        ". = parse_aws_cloudwatch_log_subscription_message!(.m)")(
        pa.table({"m": [msg]}))
    assert out["owner"].to_pylist() == ["111111111111"]
    assert out["log_group"].to_pylist() == ["test"]
    ev = out["log_events"].to_pylist()[0]
    assert ev[0]["timestamp"] == 1600110569039
    assert not any(err.to_pylist())


def test_batch5_seahash_deterministic():
    t = pa.table({"s": ["to be or not to be", "to be or not to be", "x"]})
    out, _, _ = compile_vrl(".h = seahash(.s)")(t)
    hs = out["h"].to_pylist()
    assert hs[0] == hs[1] != hs[2]
    assert all(h.isdigit() for h in hs)


def test_parse_logfmt_schema_less_key_discovery():
    """parse_key_value.cue returns every key; the columnar analogue
    discovers the key set from a bounded sample, then extracts
    vectorized."""
    t = pa.table({"m": ["a=1 b=two c=3", 'a=9 d="quoted val"', "junk"]})
    out, err, _ = compile_vrl(". = parse_logfmt(.m)")(t)
    assert out["a"].to_pylist() == ["1", "9", None]
    assert out["b"].to_pylist() == ["two", None, None]
    assert out["d"].to_pylist() == [None, "quoted val", None]
    assert not any(err.to_pylist())


def test_parse_json_schema_less_key_discovery():
    t = pa.table({"a": ['{"x": 1, "y": "two"}', '{"x": 9}', "junk"]})
    out, err, _ = compile_vrl(
        ".obj = parse_json(.a)\n.back = encode_json(.obj)")(t)
    assert out["obj"].to_pylist()[0] == {"x": "1", "y": "two"}
    assert out["back"].to_pylist()[:2] == ['{"x":"1","y":"two"}',
                                          '{"x":"9"}']


def test_tag_types_externally():
    # tag_types_externally.cue: every value wraps in a one-field object
    # named by its type
    t = pa.table({"s": ["x"], "n": pa.array([3], pa.int64()),
                  "f": pa.array([1.5], pa.float64()),
                  "b": pa.array([True])})
    out, _, _ = compile_vrl(".tagged = tag_types_externally(.)")(t)
    tagged = out["tagged"].to_pylist()[0]
    assert tagged["s"] == {"string": "x"}
    assert tagged["n"] == {"integer": 3}
    assert tagged["f"] == {"float": 1.5}
    assert tagged["b"] == {"boolean": True}


def test_encode_key_value_custom_delimiters():
    t = pa.table({"o": pa.array([{"a": "x y", "b": "2"}])})
    out, _, _ = compile_vrl(
        '.s = encode_key_value(.o, key_value_delimiter: ":", '
        'field_delimiter: ",")')(t)
    assert out["s"].to_pylist() == ['a:"x y",b:2']
