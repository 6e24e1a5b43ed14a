"""parse_dnstap golden tests.

The two base64 frames + expected outputs are the reference's own
documented VRL examples
(/root/reference/lib/dnstap-parser/src/vrl_functions/parse_dnstap.rs:
34-136, 316-385) — behavioral fixtures, decoded here by the
from-scratch parser in vector_ray/functions/dnstap.py.
"""
import base64

import pyarrow as pa
import pytest

from vector_ray.functions.dnstap import (
    parse_dns_query_message,
    parse_dnstap_frame,
)
from vector_ray.functions.stdlib_extra import parse_dnstap

QUERY_FRAME_B64 = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEA"
    "AAAAAAAAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3W"
    "NlI2kwIAAAABAAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACO"
    "xjCAG9zVgzWgUDY29tAGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2Nv"
    "bQAABgABAAApBNABAUAAADkADwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW"
    "5kIGZvciBkbnNzZWMtZmFpbGVkLm9yZy54AQ=="
)

UPDATE_FRAME_B64 = (
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zcmsIDhABGAEiBH8AAA"
    "EqBH8AAAEwrG44AEC+iu73BU14gfofUh1wi6gAAAEAAAAAAAAHZXhhbXBsZQNjb20A"
    "AAYAAWC+iu73BW0agDwvch1wi6gAAAEAAAAAAAAHZXhhbXBsZQNjb20AAAYAAXgB"
)

EXPECTED_QUERY = {
    "dataType": "Message",
    "dataTypeId": 1,
    "extraInfo": "",
    "messageType": "ResolverQuery",
    "messageTypeId": 3,
    "queryZone": "com.",
    "requestData": {
        "fullRcode": 0,
        "header": {
            "aa": False, "ad": False, "anCount": 0, "arCount": 1,
            "cd": False, "id": 37634, "nsCount": 0, "opcode": 0,
            "qdCount": 1, "qr": 0, "ra": False, "rcode": 0,
            "rd": False, "tc": False,
        },
        "opt": {
            "do": True,
            "ednsVersion": 0,
            "extendedRcode": 0,
            "options": [{
                "optCode": 10,
                "optName": "Cookie",
                "optValue": "7GMIAb3NWDM=",
            }],
            "udpPayloadSize": 512,
        },
        "question": [{
            "class": "IN",
            "domainName": "facebook1.com.",
            "questionType": "A",
            "questionTypeId": 1,
        }],
        "rcodeName": "NoError",
    },
    "responseData": {
        "fullRcode": 16,
        "header": {
            "aa": False, "ad": False, "anCount": 0, "arCount": 1,
            "cd": False, "id": 45880, "nsCount": 0, "opcode": 0,
            "qdCount": 1, "qr": 0, "ra": False, "rcode": 16,
            "rd": False, "tc": False,
        },
        "opt": {
            "do": False,
            "ednsVersion": 1,
            "extendedRcode": 1,
            "ede": [{
                "extraText": "no SEP matching the DS found for "
                             "dnssec-failed.org.",
                "infoCode": 9,
                "purpose": "DNSKEY Missing",
            }],
            "udpPayloadSize": 1232,
        },
        "question": [{
            "class": "IN",
            "domainName": "h5.example.com.",
            "questionType": "SOA",
            "questionTypeId": 6,
        }],
        "rcodeName": "BADSIG",
    },
    "responseAddress": "2001:502:7094::30",
    "responsePort": 53,
    "serverId": "james-Virtual-Machine",
    "serverVersion": "BIND 9.16.3",
    "socketFamily": "INET6",
    "socketProtocol": "UDP",
    "sourceAddress": "::",
    "sourcePort": 46835,
    "time": 1593489007920014129,
    "timePrecision": "ns",
    "timestamp": "2020-06-30T03:50:07.920014129Z",
}

EXPECTED_UPDATE = {
    "dataType": "Message",
    "dataTypeId": 1,
    "messageType": "UpdateResponse",
    "messageTypeId": 14,
    "requestData": {
        "fullRcode": 0,
        "header": {
            "adCount": 0, "id": 28811, "opcode": 5, "prCount": 0,
            "qr": 1, "rcode": 0, "upCount": 0, "zoCount": 1,
        },
        "zone": {
            "zClass": "IN", "zName": "example.com.",
            "zType": "SOA", "zTypeId": 6,
        },
        "rcodeName": "NoError",
    },
    "responseAddress": "127.0.0.1",
    "responseData": {
        "fullRcode": 0,
        "header": {
            "adCount": 0, "id": 28811, "opcode": 5, "prCount": 0,
            "qr": 1, "rcode": 0, "upCount": 0, "zoCount": 1,
        },
        "zone": {
            "zClass": "IN", "zName": "example.com.",
            "zType": "SOA", "zTypeId": 6,
        },
        "rcodeName": "NoError",
    },
    "responsePort": 0,
    "serverId": "james-Virtual-Machine",
    "serverVersion": "BIND 9.16.3",
    "socketFamily": "INET",
    "socketProtocol": "UDP",
    "sourceAddress": "127.0.0.1",
    "sourcePort": 14124,
    "time": 1593541950792494106,
    "timePrecision": "ns",
    "timestamp": "2020-06-30T18:32:30.792494106Z",
}


def test_golden_resolver_query():
    got = parse_dnstap_frame(base64.b64decode(QUERY_FRAME_B64))
    assert got == EXPECTED_QUERY


def test_golden_update_response():
    got = parse_dnstap_frame(base64.b64decode(UPDATE_FRAME_B64))
    assert got == EXPECTED_UPDATE


def test_invalid_protobuf_and_base64_are_null_rows():
    col = pa.array([
        QUERY_FRAME_B64,
        "non base64 string",
        base64.b64encode(b"non dnstap data").decode(),
        None,
    ])
    out = parse_dnstap(col)
    rows = out.to_pylist()
    assert rows[0] is not None
    assert rows[0]["messageType"] == "ResolverQuery"
    assert rows[1] is None
    assert rows[2] is None
    assert rows[3] is None


def test_invalid_dnstap_payload_raises():
    with pytest.raises(ValueError):
        parse_dnstap_frame(b"non dnstap data")


def test_lowercase_hostnames():
    # build a minimal DNS query for MiXeD.Example.COM A IN
    name = b"\x05MiXeD\x07Example\x03COM\x00"
    msg = (b"\x12\x34" b"\x01\x00" b"\x00\x01\x00\x00\x00\x00\x00\x00"
           + name + b"\x00\x01\x00\x01")
    parsed = parse_dns_query_message(msg, lowercase=True)
    assert parsed["question"][0]["domainName"] == "mixed.example.com."
    parsed2 = parse_dns_query_message(msg, lowercase=False)
    assert parsed2["question"][0]["domainName"] == "MiXeD.Example.COM."


def _mk_record(name: bytes, rtype: int, rdata: bytes,
               rclass: int = 1, ttl: int = 300) -> bytes:
    return (name + rtype.to_bytes(2, "big") + rclass.to_bytes(2, "big")
            + ttl.to_bytes(4, "big") + len(rdata).to_bytes(2, "big")
            + rdata)


def _mk_response(answers: list[bytes]) -> bytes:
    q = b"\x03foo\x03com\x00" + b"\x00\x01\x00\x01"
    header = (b"\xab\xcd" b"\x84\x00"
              + b"\x00\x01" + len(answers).to_bytes(2, "big")
              + b"\x00\x00\x00\x00")
    return header + q + b"".join(answers)


def test_rdata_formats():
    name = b"\x03foo\x03com\x00"
    answers = [
        _mk_record(name, 1, bytes([93, 184, 216, 34])),            # A
        _mk_record(name, 28, bytes.fromhex(                        # AAAA
            "20010db8000000000000000000000001")),
        _mk_record(name, 5, b"\x03bar\x03com\x00"),                # CNAME
        _mk_record(name, 15, b"\x00\x0a" + b"\x04mail\x03com\x00"),  # MX
        _mk_record(name, 16, b"\x05hello\x05wo\"ld"),              # TXT
        _mk_record(name, 33, b"\x00\x01\x00\x02\x00\x35"           # SRV
                   + b"\x03srv\x03com\x00"),
        _mk_record(name, 6,                                        # SOA
                   b"\x02ns\x03com\x00" + b"\x05admin\x03com\x00"
                   + (2024010101).to_bytes(4, "big")
                   + (7200).to_bytes(4, "big") + (3600).to_bytes(4, "big")
                   + (1209600).to_bytes(4, "big")
                   + (86400).to_bytes(4, "big")),
        _mk_record(name, 52, b"\x03\x01\x01\xab\xcd"),             # TLSA
        _mk_record(name, 65280, b"\xde\xad\xbe\xef"),              # unknown
    ]
    parsed = parse_dns_query_message(_mk_response(answers))
    rd = {r["recordTypeId"]: r for r in parsed["answers"]}
    assert rd[1]["rData"] == "93.184.216.34"
    assert rd[28]["rData"] == "2001:db8::1"
    assert rd[5]["rData"] == "bar.com."
    assert rd[15]["rData"] == "10 mail.com."
    assert rd[16]["rData"] == '"hello" "wo\\"ld"'
    assert rd[33]["rData"] == "1 2 53 srv.com."
    assert rd[6]["rData"] == ("ns.com. admin.com. 2024010101 7200 "
                              "3600 1209600 86400")
    assert rd[52]["rData"] == "3 1 1 ABCD"
    assert "recordType" not in rd[65280]
    assert rd[65280]["rDataBytes"] == base64.b64encode(
        b"\xde\xad\xbe\xef").decode()
    assert rd[1]["class"] == "IN"
    assert rd[1]["ttl"] == 300
    assert rd[1]["domainName"] == "foo.com."


def test_name_compression():
    # answer name points back into the question via a compression ptr
    q = b"\x03foo\x03com\x00" + b"\x00\x01\x00\x01"
    ptr = b"\xc0\x0c"  # offset 12 = question name
    ans = _mk_record(ptr, 5, b"\x03bar" + b"\xc0\x10")  # bar.<com.>
    msg = (b"\xab\xcd\x84\x00\x00\x01\x00\x01\x00\x00\x00\x00"
           + q + ans)
    parsed = parse_dns_query_message(msg)
    assert parsed["answers"][0]["domainName"] == "foo.com."
    assert parsed["answers"][0]["rData"] == "bar.com."


def test_compression_loop_rejected():
    q = b"\xc0\x0c" + b"\x00\x01\x00\x01"  # name points at itself
    msg = b"\xab\xcd\x01\x00\x00\x01\x00\x00\x00\x00\x00\x00" + q
    frame = _wrap_frame(msg)
    out = parse_dnstap_frame(frame)
    assert "error" in out and "rawData" in out


def _wrap_frame(dns_msg: bytes) -> bytes:
    """Hand-encode a minimal Dnstap{type=MESSAGE, message{type=
    ClientQuery, query_message=dns_msg}} envelope."""
    inner = (b"\x08\x05"                       # type = 5 ClientQuery
             + b"\x52" + _varint(len(dns_msg)) + dns_msg)  # field 10
    return (b"\x78\x01"                        # type = 1 MESSAGE
            + b"\x72" + _varint(len(inner)) + inner)       # field 14


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_fixture_roundtrips_ground_truth():
    from vector_ray.functions.dnstap import synthesize_dnstap_frames

    t = synthesize_dnstap_frames(30, seed=7)
    for i in range(30):
        out = parse_dnstap_frame(
            base64.b64decode(t["frame_b64"][i].as_py()))
        assert out["messageType"] == t["mt"][i].as_py()
        assert out["messageTypeId"] == t["mt_id"][i].as_py()
        assert out["sourcePort"] == t["src_port"][i].as_py()
        q = out["requestData"]["question"][0]
        assert q["domainName"] == t["qname"][i].as_py()
        assert out["requestData"]["header"]["id"] == t["qid"][i].as_py()
        assert out["timePrecision"] == "ns"
