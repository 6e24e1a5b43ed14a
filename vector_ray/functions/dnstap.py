"""parse_dnstap: decode a dnstap protobuf frame + embedded DNS wire
messages into the nested event shape Vector's VRL function emits.

Built from public specs only: the dnstap schema is the CC0
public-domain proto (mirrored read-only at
/root/reference/lib/dnstap-parser/proto/dnstap.proto), the DNS wire
format is RFC 1035/2136/6891/8914.  Behavioral reference for field
naming and text rendering:
/root/reference/lib/dnstap-parser/src/parser.rs:100-470 (envelope ->
event mapping, time/timestamp selection) and
/root/reference/lib/dnsmsg-parser/src/dns_message_parser.rs (header /
question / record decode, rdata presentation formats, rcode names).

Divergences (documented, lenient-by-construction):
- rdata types the reference cannot format make the whole DNS message
  fall back to base64 rawData; here an unformattable type degrades to
  just that record's ``rDataBytes`` (base64) and the rest of the
  message survives.
- EDE extra-text is decoded UTF-8-lossy instead of failing the parse.
"""
from __future__ import annotations

import base64
import binascii
import datetime as _dt
import ipaddress
from struct import error as struct_error

from vector_ray.functions.protobuf import decode_message

# ---------------------------------------------------------------------------
# dnstap envelope (proto2, field numbers from the public CC0 schema)
# ---------------------------------------------------------------------------

_DNSTAP_MESSAGE_SCHEMA = {
    "type": (1, "enum"),
    "socket_family": (2, "enum"),
    "socket_protocol": (3, "enum"),
    "query_address": (4, "bytes"),
    "response_address": (5, "bytes"),
    "query_port": (6, "uint32"),
    "response_port": (7, "uint32"),
    "query_time_sec": (8, "uint64"),
    "query_time_nsec": (9, "fixed32"),
    "query_message": (10, "bytes"),
    "query_zone": (11, "bytes"),
    "response_time_sec": (12, "uint64"),
    "response_time_nsec": (13, "fixed32"),
    "response_message": (14, "bytes"),
}
_DNSTAP_SCHEMA = {
    "identity": (1, "bytes"),
    "version": (2, "bytes"),
    "extra": (3, "bytes"),
    "message": (14, ("message", _DNSTAP_MESSAGE_SCHEMA)),
    "type": (15, "enum"),
}

_MESSAGE_TYPE_NAMES = {
    1: "AuthQuery", 2: "AuthResponse",
    3: "ResolverQuery", 4: "ResolverResponse",
    5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse",
    9: "StubQuery", 10: "StubResponse",
    11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
_REQUEST_TYPE_IDS = frozenset({1, 3, 5, 7, 9, 11, 13})
_RESPONSE_TYPE_IDS = frozenset({2, 4, 6, 8, 10, 12, 14})
_SOCKET_FAMILIES = {1: "INET", 2: "INET6"}
_SOCKET_PROTOCOLS = {
    1: "UDP", 2: "TCP", 3: "DOT", 4: "DOH",
    5: "DNSCryptUDP", 6: "DNSCryptTCP",
}

_RCODE_NAMES = {
    0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain",
    4: "NotImp", 5: "Refused", 6: "YXDomain", 7: "YXRRSet",
    8: "NXRRSet", 9: "NotAuth", 10: "NotZone", 16: "BADSIG",
    17: "BADKEY", 18: "BADTIME", 19: "BADMODE", 20: "BADNAME",
    21: "BADALG", 22: "BADTRUNC", 23: "BADCOOKIE",
}

_RECORD_TYPE_NAMES = {
    1: "A", 2: "NS", 3: "MD", 4: "MF", 5: "CNAME", 6: "SOA", 7: "MB",
    8: "MG", 9: "MR", 10: "NULL", 11: "WKS", 12: "PTR", 13: "HINFO",
    14: "MINFO", 15: "MX", 16: "TXT", 17: "RP", 18: "AFSDB",
    19: "X25", 20: "ISDN", 21: "RT", 22: "NSAP", 23: "NSAP-PTR",
    24: "SIG", 25: "KEY", 26: "PX", 27: "GPOS", 28: "AAAA",
    29: "LOC", 30: "NXT", 31: "EID", 32: "NIMLOC", 33: "SRV",
    34: "ATMA", 35: "NAPTR", 36: "KX", 37: "CERT", 38: "A6",
    39: "DNAME", 40: "SINK", 41: "OPT", 42: "APL", 43: "DS",
    44: "SSHFP", 45: "IPSECKEY", 46: "RRSIG", 47: "NSEC",
    48: "DNSKEY", 49: "DHCID", 50: "NSEC3", 51: "NSEC3PARAM",
    52: "TLSA", 53: "SMIMEA", 55: "HIP", 56: "NINFO", 57: "RKEY",
    58: "TALINK", 59: "CDS", 60: "CDNSKEY", 61: "OPENPGPKEY",
    62: "CSYNC", 63: "ZONEMD", 99: "SPF", 100: "UINFO", 101: "UID",
    102: "GID", 103: "UNSPEC", 104: "NID", 105: "L32", 106: "L64",
    107: "LP", 108: "EUI48", 109: "EUI64", 249: "TKEY", 250: "TSIG",
    251: "IXFR", 252: "AXFR", 253: "MAILB", 254: "MAILA",
    255: "ANY", 256: "URI", 257: "CAA", 258: "AVC", 259: "DOA",
    260: "AMTRELAY", 32768: "TA", 32769: "DLV",
}

_CLASS_NAMES = {1: "IN", 2: "CS", 3: "CH", 4: "HS",
                254: "NONE", 255: "ANY"}

_EDNS_OPTION_NAMES = {
    0: "Zero", 1: "LLQ", 2: "UL", 3: "NSID", 5: "DAU", 6: "DHU",
    7: "N3U", 8: "Subnet", 9: "Expire", 10: "Cookie",
    11: "Keepalive", 12: "Padding", 13: "Chain",
}

# DNSSEC algorithm mnemonics (IANA registry) for DAU/DHU/N3U rendering
_DNSSEC_ALG_NAMES = {
    5: "RSASHA1", 7: "RSASHA1-NSEC3-SHA1", 8: "RSASHA256",
    10: "RSASHA512", 13: "ECDSAP256SHA256", 14: "ECDSAP384SHA384",
    15: "ED25519", 16: "ED448",
}

# Extended DNS Error purposes (IANA extended-dns-error-codes registry)
_EDE_PURPOSES = {
    0: "Other Error", 1: "Unsupported DNSKEY Algorithm",
    2: "Unsupported DS Digest Type", 3: "Stale Answer",
    4: "Forged Answer", 5: "DNSSEC Indeterminate", 6: "DNSSEC Bogus",
    7: "Signature Expired", 8: "Signature Not Yet Valid",
    9: "DNSKEY Missing", 10: "RRSIGs Missing",
    11: "No Zone Key Bit Set", 12: "NSEC Missing", 13: "Cached Error",
    14: "Not Ready", 15: "Blocked", 16: "Censored", 17: "Filtered",
    18: "Prohibited", 19: "Stale NXDomain Answer",
    20: "Not Authoritative", 21: "Not Supported",
    22: "No Reachable Authority", 23: "Network Error",
    24: "Invalid Data", 25: "Signature Expired before Valid",
    26: "Too Early", 27: "Unsupported NSEC3 Iterations Value",
    28: "Unable to conform to policy", 29: "Synthesized",
    30: "Invalid Query Type",
}


class DnsWireError(ValueError):
    pass


# ---------------------------------------------------------------------------
# DNS wire-format primitives
# ---------------------------------------------------------------------------

def _escape_label(label: bytes) -> str:
    out = []
    for b in label:
        c = chr(b)
        if c in ".\\":
            out.append("\\" + c)
        elif 0x20 <= b <= 0x7E:
            out.append(c)
        else:
            out.append(f"\\{b:03}")
    return "".join(out)


def _read_name(msg: bytes, pos: int, lowercase: bool) -> tuple[str, int]:
    """Decompress a domain name at `pos`; returns (presentation form
    with trailing dot, position after the name in the original
    stream)."""
    labels: list[str] = []
    end = -1
    seen: set[int] = set()
    n = len(msg)
    while True:
        if pos >= n:
            raise DnsWireError("name runs past end of message")
        b = msg[pos]
        if b & 0xC0 == 0xC0:
            if pos + 1 >= n:
                raise DnsWireError("truncated compression pointer")
            ptr = ((b & 0x3F) << 8) | msg[pos + 1]
            if ptr in seen or ptr >= n:
                raise DnsWireError("bad compression pointer")
            seen.add(ptr)
            if end < 0:
                end = pos + 2
            pos = ptr
        elif b == 0:
            if end < 0:
                end = pos + 1
            break
        elif b & 0xC0:
            raise DnsWireError(f"unsupported label type {b >> 6}")
        else:
            if pos + 1 + b > n:
                raise DnsWireError("truncated label")
            labels.append(_escape_label(msg[pos + 1:pos + 1 + b]))
            pos += 1 + b
    name = ".".join(labels) + "." if labels else "."
    if lowercase:
        name = name.lower()
    return name, end


def _u8(msg: bytes, pos: int) -> tuple[int, int]:
    if pos + 1 > len(msg):
        raise DnsWireError("truncated u8")
    return msg[pos], pos + 1


def _u16(msg: bytes, pos: int) -> tuple[int, int]:
    if pos + 2 > len(msg):
        raise DnsWireError("truncated u16")
    return int.from_bytes(msg[pos:pos + 2], "big"), pos + 2


def _u32(msg: bytes, pos: int) -> tuple[int, int]:
    if pos + 4 > len(msg):
        raise DnsWireError("truncated u32")
    return int.from_bytes(msg[pos:pos + 4], "big"), pos + 4


def _char_string(msg: bytes, pos: int) -> tuple[str, int]:
    ln, pos = _u8(msg, pos)
    if pos + ln > len(msg):
        raise DnsWireError("truncated character-string")
    return msg[pos:pos + ln].decode("utf-8", errors="replace"), pos + ln


def _escape_text(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def _b64(data: bytes) -> str:
    return base64.b64encode(data).decode("ascii")


def _hexupper(data: bytes) -> str:
    return binascii.hexlify(data).decode("ascii").upper()


# ---------------------------------------------------------------------------
# rdata presentation formats (dig-style, matching the reference's text
# renderings in dns_message_parser.rs:559-845)
# ---------------------------------------------------------------------------

def _fmt_name_at(msg: bytes, off: int, lc: bool) -> str:
    return _read_name(msg, off, lc)[0]


def _fmt_rdata(rtype: int, rdata: bytes, msg: bytes, off: int,
               lc: bool) -> tuple[str | None, bytes | None]:
    """(text, raw) — exactly one is non-None; raw means 'emit
    rDataBytes base64'.  `off` is rdata's absolute offset in `msg` so
    compressed names inside rdata resolve."""
    if rtype == 1:  # A
        if len(rdata) < 4:
            raise DnsWireError("short A rdata")
        return ".".join(str(b) for b in rdata[:4]), None
    if rtype == 28:  # AAAA
        if len(rdata) < 16:
            raise DnsWireError("short AAAA rdata")
        return str(ipaddress.IPv6Address(rdata[:16])), None
    if rtype in (2, 5, 12, 39, 7, 8, 9):  # NS CNAME PTR DNAME MB MG MR
        return _fmt_name_at(msg, off, lc), None
    if rtype == 6:  # SOA
        mname, p = _read_name(msg, off, lc)
        rname, p = _read_name(msg, p, lc)
        serial, p = _u32(msg, p)
        refresh, p = _u32(msg, p)
        retry, p = _u32(msg, p)
        expire, p = _u32(msg, p)
        minimum, p = _u32(msg, p)
        return (f"{mname} {rname} {serial} {refresh} {retry} "
                f"{expire} {minimum}"), None
    if rtype in (15, 18, 21, 36):  # MX AFSDB RT KX: u16 + name
        pref, p = _u16(msg, off)
        return f"{pref} {_fmt_name_at(msg, p, lc)}", None
    if rtype in (14, 17):  # MINFO RP: two names
        a, p = _read_name(msg, off, lc)
        b, _ = _read_name(msg, p, lc)
        return f"{a} {b}", None
    if rtype in (16, 99):  # TXT SPF: quoted character-strings
        parts, p, end = [], off, off + len(rdata)
        while p < end:
            s, p = _char_string(msg, p)
            if p > end:
                raise DnsWireError("character-string overruns rdata")
            parts.append(f'"{_escape_text(s)}"')
        return " ".join(parts), None
    if rtype == 13:  # HINFO
        cpu, p = _char_string(msg, off)
        os_, p = _char_string(msg, p)
        if p > off + len(rdata):
            raise DnsWireError("character-string overruns rdata")
        return f'"{_escape_text(cpu)}" "{_escape_text(os_)}"', None
    if rtype == 33:  # SRV
        prio, p = _u16(msg, off)
        weight, p = _u16(msg, p)
        port, p = _u16(msg, p)
        return (f"{prio} {weight} {port} "
                f"{_fmt_name_at(msg, p, lc)}"), None
    if rtype == 35:  # NAPTR
        order, p = _u16(msg, off)
        pref, p = _u16(msg, p)
        flags, p = _char_string(msg, p)
        services, p = _char_string(msg, p)
        regexp, p = _char_string(msg, p)
        repl = _fmt_name_at(msg, p, lc)
        return (f'{order} {pref} "{_escape_text(flags)}" '
                f'"{_escape_text(services)}" "{_escape_text(regexp)}" '
                f"{repl}"), None
    if rtype == 10:  # NULL
        return _b64(rdata), None
    if rtype == 257:  # CAA: flags, tag, value (wire text already in
        # "name; k=v" presentation per RFC 8659)
        if len(rdata) < 2:
            raise DnsWireError("short CAA rdata")
        critical = rdata[0] >> 7
        tlen = rdata[1]
        tag = rdata[2:2 + tlen].decode("ascii", errors="replace")
        value = rdata[2 + tlen:].decode("utf-8", errors="replace")
        return f'{critical} {tag} "{value}"', None
    if rtype == 52:  # TLSA
        if len(rdata) < 3:
            raise DnsWireError("short TLSA rdata")
        return (f"{rdata[0]} {rdata[1]} {rdata[2]} "
                f"{_hexupper(rdata[3:])}"), None
    if rtype == 44:  # SSHFP
        if len(rdata) < 2:
            raise DnsWireError("short SSHFP rdata")
        return f"{rdata[0]} {rdata[1]} {_hexupper(rdata[2:])}", None
    if rtype in (43, 59):  # DS CDS
        if len(rdata) < 4:
            raise DnsWireError("short DS rdata")
        keytag = int.from_bytes(rdata[0:2], "big")
        return (f"{keytag} {rdata[2]} {rdata[3]} "
                f"{_hexupper(rdata[4:])}"), None
    if rtype in (48, 60):  # DNSKEY CDNSKEY (display flags re-derived
        # from revoke/zone-key/SEP bits like the reference)
        if len(rdata) < 4:
            raise DnsWireError("short DNSKEY rdata")
        wire_flags = int.from_bytes(rdata[0:2], "big")
        if wire_flags & 0x0080:  # revoked
            disp = 0
        elif (wire_flags & 0x0100) and (wire_flags & 0x0001):
            disp = 257
        else:
            disp = 256
        return f"{disp} 3 {rdata[3]} {_b64(rdata[4:])}", None
    if rtype in (46, 24):  # RRSIG SIG
        tc, p = _u16(msg, off)
        alg, p = _u8(msg, p)
        nlabels, p = _u8(msg, p)
        ottl, p = _u32(msg, p)
        exp, p = _u32(msg, p)
        inc, p = _u32(msg, p)
        keytag, p = _u16(msg, p)
        signer, p = _read_name(msg, p, lc)
        sig = msg[p:off + len(rdata)]
        tname = _RECORD_TYPE_NAMES.get(tc, "Unknown record type")
        return (f"{tname} {alg} {nlabels} {ottl} {exp} {inc} "
                f"{keytag} {signer} {_b64(sig)}"), None
    if rtype == 25:  # KEY
        if len(rdata) < 4:
            raise DnsWireError("short KEY rdata")
        flags = int.from_bytes(rdata[0:2], "big")
        return (f"{flags} {rdata[2]} {rdata[3]} "
                f"{_b64(rdata[4:])}"), None
    return None, rdata


# ---------------------------------------------------------------------------
# EDNS OPT pseudo-section (RFC 6891) + Extended DNS Errors (RFC 8914)
# ---------------------------------------------------------------------------

def _parse_opt_record(rclass: int, ttl: int, rdata: bytes) -> dict:
    opt: dict = {
        "extendedRcode": (ttl >> 24) & 0xFF,
        "ednsVersion": (ttl >> 16) & 0xFF,
        "do": bool(ttl & 0x8000),
        "udpPayloadSize": rclass,
    }
    ede: list[dict] = []
    options: list[dict] = []
    pos, n = 0, len(rdata)
    while pos + 4 <= n:
        code = int.from_bytes(rdata[pos:pos + 2], "big")
        ln = int.from_bytes(rdata[pos + 2:pos + 4], "big")
        data = rdata[pos + 4:pos + 4 + ln]
        if len(data) < ln:
            raise DnsWireError("truncated EDNS option")
        pos += 4 + ln
        if code == 15:  # EDE
            if len(data) < 2:
                raise DnsWireError("truncated EDE option")
            info_code = int.from_bytes(data[0:2], "big")
            entry: dict = {"infoCode": info_code}
            purpose = _EDE_PURPOSES.get(info_code)
            if purpose is not None:
                entry["purpose"] = purpose
            if len(data) > 2:
                entry["extraText"] = data[2:].decode(
                    "utf-8", errors="replace")
            ede.append(entry)
        elif code in (5, 6, 7):  # DAU/DHU/N3U: algorithm mnemonics
            names = " ".join(
                _DNSSEC_ALG_NAMES.get(b, str(b)) for b in data)
            options.append({
                "optCode": code,
                "optName": _EDNS_OPTION_NAMES[code],
                "optValue": names,
            })
        else:
            options.append({
                "optCode": code,
                "optName": _EDNS_OPTION_NAMES.get(
                    code, f"Unknown({code})"),
                "optValue": _b64(data),
            })
    if ede:
        opt["ede"] = ede
    if options:
        opt["options"] = options
    return opt


# ---------------------------------------------------------------------------
# DNS message decode (query/response form and UPDATE form)
# ---------------------------------------------------------------------------

def _parse_header_and_sections(raw: bytes, lc: bool):
    """Shared wire walk: returns (flags dict pieces, question list,
    three record-section lists, opt section or None)."""
    if len(raw) < 12:
        raise DnsWireError("message shorter than header")
    hid = int.from_bytes(raw[0:2], "big")
    flags = int.from_bytes(raw[2:4], "big")
    qd = int.from_bytes(raw[4:6], "big")
    an = int.from_bytes(raw[6:8], "big")
    ns = int.from_bytes(raw[8:10], "big")
    ar = int.from_bytes(raw[10:12], "big")

    pos = 12
    questions = []
    for _ in range(qd):
        name, pos = _read_name(raw, pos, lc)
        qtype, pos = _u16(raw, pos)
        qclass, pos = _u16(raw, pos)
        questions.append((name, qtype, qclass))

    opt = None
    sections: list[list[dict]] = [[], [], []]
    for sec_i, count in enumerate((an, ns, ar)):
        for _ in range(count):
            name, pos = _read_name(raw, pos, lc)
            rtype, pos = _u16(raw, pos)
            rclass, pos = _u16(raw, pos)
            ttl, pos = _u32(raw, pos)
            rdlen, pos = _u16(raw, pos)
            if pos + rdlen > len(raw):
                raise DnsWireError("truncated rdata")
            rdata = raw[pos:pos + rdlen]
            if rtype == 41:  # OPT lives in the pseudo-section
                opt = _parse_opt_record(rclass, ttl, rdata)
                pos += rdlen
                continue
            rec: dict = {"domainName": name}
            tname = _RECORD_TYPE_NAMES.get(rtype)
            if tname is not None:
                rec["recordType"] = tname
            rec["recordTypeId"] = rtype
            rec["ttl"] = ttl
            rec["class"] = _CLASS_NAMES.get(rclass, str(rclass))
            try:
                text, raw_rd = _fmt_rdata(rtype, rdata, raw, pos, lc)
            except DnsWireError:
                text, raw_rd = None, rdata
            if text is not None:
                rec["rData"] = text
            if raw_rd is not None:
                rec["rDataBytes"] = _b64(raw_rd)
            pos += rdlen
            sections[sec_i].append(rec)

    header = {
        "id": hid,
        "qr": (flags >> 15) & 1,
        "opcode": (flags >> 11) & 0xF,
        "aa": bool(flags & 0x0400),
        "tc": bool(flags & 0x0200),
        "rd": bool(flags & 0x0100),
        "ra": bool(flags & 0x0080),
        "ad": bool(flags & 0x0020),
        "cd": bool(flags & 0x0010),
        "rcode_low": flags & 0xF,
        "qdCount": qd, "anCount": an, "nsCount": ns, "arCount": ar,
    }
    return header, questions, sections, opt


def _question_entry(q: tuple, lc: bool) -> dict:
    name, qtype, qclass = q
    entry: dict = {"domainName": name}
    tname = _RECORD_TYPE_NAMES.get(qtype)
    if tname is not None:
        entry["questionType"] = tname
    entry["questionTypeId"] = qtype
    entry["class"] = _CLASS_NAMES.get(qclass, str(qclass))
    return entry


def parse_dns_query_message(raw: bytes, lowercase: bool = False) -> dict:
    h, questions, sections, opt = _parse_header_and_sections(
        raw, lowercase)
    ext = opt["extendedRcode"] if opt else 0
    full_rcode = (ext << 4) | h["rcode_low"]
    out: dict = {"fullRcode": full_rcode}
    name = _RCODE_NAMES.get(full_rcode)
    if name is not None:
        out["rcodeName"] = name
    out["header"] = {
        "id": h["id"], "opcode": h["opcode"], "rcode": full_rcode,
        "qr": h["qr"], "aa": h["aa"], "tc": h["tc"], "rd": h["rd"],
        "ra": h["ra"], "ad": h["ad"], "cd": h["cd"],
        "qdCount": h["qdCount"], "anCount": h["anCount"],
        "nsCount": h["nsCount"], "arCount": h["arCount"],
    }
    if questions:
        out["question"] = [_question_entry(q, lowercase)
                           for q in questions]
    for key, sec in zip(("answers", "authority", "additional"),
                        sections):
        if sec:
            out[key] = sec
    if opt is not None:
        out["opt"] = opt
    return out


def parse_dns_update_message(raw: bytes, lowercase: bool = False) -> dict:
    h, questions, sections, opt = _parse_header_and_sections(
        raw, lowercase)
    # UPDATE semantics (RFC 2136): zone/prereq/update reuse the four
    # wire sections; fullRcode keeps only the 4 header bits while the
    # header mirrors the EDNS-merged value (reference parity).
    ext = opt["extendedRcode"] if opt else 0
    merged = (ext << 4) | h["rcode_low"]
    out: dict = {"fullRcode": h["rcode_low"]}
    name = _RCODE_NAMES.get(h["rcode_low"])
    if name is not None:
        out["rcodeName"] = name
    out["header"] = {
        "id": h["id"], "opcode": h["opcode"], "rcode": merged,
        "qr": h["qr"],
        "zoCount": h["qdCount"], "prCount": h["anCount"],
        "upCount": h["nsCount"], "adCount": h["arCount"],
    }
    if questions:
        zname, ztype, zclass = questions[0]
        zone: dict = {"zName": zname}
        tname = _RECORD_TYPE_NAMES.get(ztype)
        if tname is not None:
            zone["zType"] = tname
        zone["zTypeId"] = ztype
        zone["zClass"] = _CLASS_NAMES.get(zclass, str(zclass))
        out["zone"] = zone
    for key, sec in zip(("prerequisite", "update", "additional"),
                        sections):
        if sec:
            out[key] = sec
    return out


# ---------------------------------------------------------------------------
# dnstap envelope -> event
# ---------------------------------------------------------------------------

def _rfc3339_ns(sec: int, nsec: int) -> str:
    """chrono-style RFC3339 with AutoSi fraction (none / milli /
    micro / nano)."""
    base = _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc)
    s = base.strftime("%Y-%m-%dT%H:%M:%S")
    if nsec == 0:
        return s + "Z"
    if nsec % 1_000_000 == 0:
        return f"{s}.{nsec // 1_000_000:03d}Z"
    if nsec % 1_000 == 0:
        return f"{s}.{nsec // 1_000:06d}Z"
    return f"{s}.{nsec:09d}Z"


def _ip_str(data: bytes, family: int) -> str:
    if family == 1:
        return str(ipaddress.IPv4Address(data[:4]))
    return str(ipaddress.IPv6Address(data[:16]))


def parse_dnstap_frame(frame: bytes,
                       lowercase_hostnames: bool = False) -> dict:
    """Full dnstap frame -> nested event dict (the VRL parse_dnstap
    return shape).  Raises ValueError for an undecodable protobuf
    envelope; DNS-message-level failures degrade to `error` +
    base64 `rawData` keys like the reference's source path."""
    try:
        env = decode_message(frame, _DNSTAP_SCHEMA)
    except (ValueError, IndexError, struct_error) as e:
        raise ValueError(f"failed to decode Protobuf message: {e}")

    out: dict = {}
    if "identity" in env:
        out["serverId"] = env["identity"].decode("utf-8",
                                                 errors="replace")
    if "version" in env:
        out["serverVersion"] = env["version"].decode("utf-8",
                                                     errors="replace")
    if "extra" in env:
        out["extraInfo"] = env["extra"].decode("utf-8",
                                               errors="replace")
    dtype_id = env.get("type", 0)
    out["dataTypeId"] = dtype_id
    if dtype_id != 1:
        out["rawData"] = _b64(frame)
        return out
    out["dataType"] = "Message"

    msg = env.get("message")
    if msg is None:
        return out
    try:
        _parse_message_into(out, msg, lowercase_hostnames)
    except (DnsWireError, ValueError) as e:
        out["error"] = str(e)
        out["rawData"] = _b64(frame)
    return out


def _parse_message_into(out: dict, msg: dict, lc: bool) -> None:
    family = msg.get("socket_family")
    if family is not None:
        fam_name = _SOCKET_FAMILIES.get(family)
        if fam_name is None:
            raise DnsWireError(f"unknown socket family: {family}")
        out["socketFamily"] = fam_name
        proto = msg.get("socket_protocol")
        if proto is not None:
            proto_name = _SOCKET_PROTOCOLS.get(proto)
            if proto_name is None:
                raise DnsWireError(f"unknown socket protocol: {proto}")
            out["socketProtocol"] = proto_name
        if "query_address" in msg:
            out["sourceAddress"] = _ip_str(msg["query_address"], family)
        if "query_port" in msg:
            out["sourcePort"] = msg["query_port"]
        if "response_address" in msg:
            out["responseAddress"] = _ip_str(msg["response_address"],
                                             family)
        if "response_port" in msg:
            out["responsePort"] = msg["response_port"]

    if "query_zone" in msg:
        out["queryZone"], _ = _read_name(msg["query_zone"], 0, lc)

    type_id = msg.get("type", 0)
    out["messageTypeId"] = type_id
    out["messageType"] = _MESSAGE_TYPE_NAMES.get(
        type_id, f"Unknown dnstap message type: {type_id}")

    def log_time(sec: int, nsec: int, is_event_time: bool,
                 message_absent: bool) -> None:
        t_ns = sec * 1_000_000_000 + nsec
        if is_event_time:
            out["time"] = t_ns
            out["timePrecision"] = "ns"
            out["timestamp"] = _rfc3339_ns(sec, nsec)
        if message_absent:
            rd = out.setdefault("requestData", {})
            rd["time"] = t_ns
            rd["timePrecision"] = "ns"

    if "query_time_sec" in msg:
        log_time(msg["query_time_sec"], msg.get("query_time_nsec", 0),
                 type_id in _REQUEST_TYPE_IDS,
                 "query_message" not in msg)
    if "response_time_sec" in msg:
        log_time(msg["response_time_sec"],
                 msg.get("response_time_nsec", 0),
                 type_id in _RESPONSE_TYPE_IDS,
                 "response_message" not in msg)

    if type_id in range(1, 13):
        parse_fn = parse_dns_query_message
    elif type_id in (13, 14):
        parse_fn = parse_dns_update_message
    else:
        raise DnsWireError(
            f"unsupported dnstap message type id: {type_id}")

    for field, key in (("query_message", "requestData"),
                       ("response_message", "responseData")):
        raw = msg.get(field)
        if raw is None:
            continue
        try:
            parsed = parse_fn(raw, lc)
        except DnsWireError:
            out.setdefault(key, {})["rawData"] = _b64(raw)
            raise
        out.setdefault(key, {}).update(parsed)


# ---------------------------------------------------------------------------
# Fixture generator: REAL dnstap frames with generator ground truth
# (the media-oracle pattern — a decode stage can be value-checked
# against metadata stored beside the payloads; the two golden frames
# in tests/test_dnstap.py anchor spec conformance)
# ---------------------------------------------------------------------------

DNSTAP_FIXTURE_VERSION = 1


def _encode_name(name: str) -> bytes:
    out = bytearray()
    for label in name.rstrip(".").split("."):
        if label:
            out.append(len(label))
            out += label.encode()
    out.append(0)
    return bytes(out)


def _encode_query(qid: int, qname: str, qtype: int, rd: bool) -> bytes:
    flags = 0x0100 if rd else 0x0000
    return (qid.to_bytes(2, "big") + flags.to_bytes(2, "big")
            + b"\x00\x01\x00\x00\x00\x00\x00\x00"
            + _encode_name(qname) + qtype.to_bytes(2, "big")
            + b"\x00\x01")


def synthesize_dnstap_frames(n: int, seed: int = 42):
    """pyarrow table: base64 frames + the generator's ground truth
    (message type, ports, qname, query id) for consistency oracles."""
    import random

    from vector_ray.functions.protobuf import encode_message

    rng = random.Random(seed)
    rows = {"frame_id": [], "frame_b64": [], "mt": [], "mt_id": [],
            "src_port": [], "qname": [], "qid": []}
    qtypes = [1, 28, 15, 16]
    for i in range(n):
        mt_id = rng.choice([1, 3, 5, 9, 11])   # *_QUERY types
        qid = rng.randrange(1, 65536)
        port = rng.randrange(1024, 65536)
        qname = f"host{i}.example{rng.randrange(10)}.com"
        sec = 1_600_000_000 + rng.randrange(10**6)
        msg = {
            "type": mt_id,
            "socket_family": 1,
            "socket_protocol": rng.choice([1, 2]),
            "query_address": bytes(rng.randrange(1, 255)
                                   for _ in range(4)),
            "query_port": port,
            "query_time_sec": sec,
            "query_time_nsec": rng.randrange(10**9),
            "query_message": _encode_query(
                qid, qname, rng.choice(qtypes), bool(i % 2)),
        }
        frame = encode_message(
            {"type": 1, "message": msg}, _DNSTAP_SCHEMA)
        rows["frame_id"].append(i)
        rows["frame_b64"].append(base64.b64encode(frame).decode())
        rows["mt"].append(_MESSAGE_TYPE_NAMES[mt_id])
        rows["mt_id"].append(mt_id)
        rows["src_port"].append(port)
        rows["qname"].append(qname.lower() + ".")
        rows["qid"].append(qid)

    import pyarrow as pa
    return pa.table({
        "frame_id": pa.array(rows["frame_id"], pa.int64()),
        "frame_b64": pa.array(rows["frame_b64"], pa.string()),
        "mt": pa.array(rows["mt"], pa.string()),
        "mt_id": pa.array(rows["mt_id"], pa.int64()),
        "src_port": pa.array(rows["src_port"], pa.int64()),
        "qname": pa.array(rows["qname"], pa.string()),
        "qid": pa.array(rows["qid"], pa.int64()),
    })


def ensure_dnstap_fixture(n: int = 400, seed: int = 42) -> str:
    import os

    import pyarrow.parquet as pq

    from vector_ray.model import scratch_dir

    path = os.path.join(
        scratch_dir(), f"dnstap_v{DNSTAP_FIXTURE_VERSION}",
        f"frames_{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    table = synthesize_dnstap_frames(n, seed=seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
