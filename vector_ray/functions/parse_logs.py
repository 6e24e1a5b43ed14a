"""Log-format parsers — the parse_syslog / parse_apache_log /
parse_common_log / parse_url / parse_query_string / parse_duration /
parse_bytes members of the VRL stdlib (SURVEY §2.7), as vectorized
regex extractions over Arrow columns.  Null where a row doesn't match.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.functions.parse import parse_timestamp


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _nullif_empty(col):
    """RE2 optional groups extract as '' — normalize to null."""
    return pc.if_else(pc.equal(col, ""), pa.scalar(None, pa.string()), col)


def _opt_int(col):
    return pc.cast(_nullif_empty(col), pa.int64())


# RFC 3164-ish syslog: <pri>MMM dd HH:MM:SS host tag[pid]: message
_SYSLOG = (
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<stamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) "
    r"(?P<tag>[^\[:\s]+)(?:\[(?P<pid>\d+)\])?: ?"
    r"(?P<message>.*)$"
)


def parse_syslog(col) -> dict[str, pa.Array]:
    """RFC3164 syslog fields incl. derived facility/severity."""
    g = pc.extract_regex(_arr(col), pattern=_SYSLOG)
    out = {n: pc.struct_field(g, n) for n in
           ("pri", "stamp", "host", "tag", "pid", "message")}
    pri = pc.cast(out.pop("pri"), pa.int64())
    out["facility"] = pc.cast(pc.floor(pc.divide(pri, 8.0)), pa.int64())
    out["severity"] = pc.subtract(pri, pc.multiply(out["facility"], 8))
    out["pid"] = _opt_int(out["pid"])
    return out


# Apache common log format:
# host ident user [dd/Mon/yyyy:HH:MM:SS +0000] "METHOD path HTTP/v" status size
_COMMON_LOG = (
    r'^(?P<host>\S+) (?P<identity>\S+) (?P<user>\S+) '
    r'\[(?P<timestamp>[^\]]+)\] '
    r'"(?P<method>[A-Z]+) (?P<path>\S+) (?P<protocol>[^"]+)" '
    r'(?P<status>\d{3}) (?P<size>\d+|-)'
)


def parse_common_log(col) -> dict[str, pa.Array]:
    g = pc.extract_regex(_arr(col), pattern=_COMMON_LOG)
    out = {n: pc.struct_field(g, n) for n in
           ("host", "identity", "user", "timestamp", "method", "path",
            "protocol", "status", "size")}
    out["status"] = pc.cast(out["status"], pa.int64())
    size = out["size"]
    out["size"] = pc.cast(
        pc.if_else(pc.equal(size, "-"), pa.scalar(None, pa.string()), size),
        pa.int64(),
    )
    out["ts"] = parse_timestamp(out.pop("timestamp"), "%d/%b/%Y:%H:%M:%S %z")
    return out


# apache combined adds "referrer" "agent"
_COMBINED_TAIL = r' "(?P<referrer>[^"]*)" "(?P<agent>[^"]*)"$'


def parse_apache_log(col, fmt: str = "common") -> dict[str, pa.Array]:
    if fmt == "common":
        return parse_common_log(col)
    g = pc.extract_regex(_arr(col), pattern=_COMMON_LOG + _COMBINED_TAIL)
    out = {n: pc.struct_field(g, n) for n in
           ("host", "user", "method", "path", "status", "size",
            "referrer", "agent")}
    out["status"] = pc.cast(out["status"], pa.int64())
    out["size"] = pc.cast(
        pc.if_else(pc.equal(out["size"], "-"), pa.scalar(None, pa.string()),
                   out["size"]), pa.int64())
    return out


_URL = (
    r"^(?P<scheme>[a-z][a-z0-9+.-]*)://"
    r"(?:(?P<username>[^:@/]*)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>[^:/?#]+)"
    r"(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$"
)


def parse_url(col) -> dict[str, pa.Array]:
    g = pc.extract_regex(_arr(col), pattern=_URL)
    out = {n: pc.struct_field(g, n) for n in
           ("scheme", "username", "password", "host", "port", "path",
            "query", "fragment")}
    for opt in ("username", "password", "path", "query", "fragment"):
        out[opt] = _nullif_empty(out[opt])
    out["port"] = _opt_int(out["port"])
    return out


def parse_query_string(col, keys: list[str]) -> dict[str, pa.Array]:
    """Extract given keys from a query string column (k=v&k2=v2)."""
    col = _arr(col)
    out = {}
    for k in keys:
        g = pc.extract_regex(col, pattern=rf"(?:^|&){k}=(?P<v>[^&]*)")
        out[k] = pc.struct_field(g, "v")
    return out


_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
              "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}


def parse_duration(col, output_unit: str = "s") -> pa.Array:
    """'300ms' / '2.5s' / '1h' → float in output_unit."""
    g = pc.extract_regex(
        _arr(col), pattern=r"^(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>ns|us|µs|ms|s|m|h|d)$"
    )
    num = pc.cast(pc.struct_field(g, "num"), pa.float64())
    unit = pc.struct_field(g, "unit")
    factor = pa.array([_DUR_UNITS[u] for u in _DUR_UNITS], pa.float64())
    unit_keys = pa.array(list(_DUR_UNITS), pa.string())
    f = factor.take(pc.index_in(unit, value_set=unit_keys))
    return pc.divide(pc.multiply(num, f), _DUR_UNITS[output_unit])


_BYTES_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40,
                "kB": 10**3, "KB": 10**3, "MB": 10**6, "GB": 10**9, "TB": 10**12}


def parse_bytes(col) -> pa.Array:
    """'5MiB' / '1.5GB' → int64 bytes."""
    g = pc.extract_regex(
        _arr(col),
        pattern=r"^(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>B|KiB|MiB|GiB|TiB|kB|KB|MB|GB|TB)$",
    )
    num = pc.cast(pc.struct_field(g, "num"), pa.float64())
    unit = pc.struct_field(g, "unit")
    factor = pa.array([float(v) for v in _BYTES_UNITS.values()], pa.float64())
    unit_keys = pa.array(list(_BYTES_UNITS), pa.string())
    f = factor.take(pc.index_in(unit, value_set=unit_keys))
    return pc.cast(pc.round(pc.multiply(num, f)), pa.int64())


# ---------------------------------------------------------------------------
# round-2 parser breadth: nginx / cef / user_agent / xml / klog / glog
# (reference behaviors: website/cue/reference/remap/functions/*.cue;
#  native impls under vrl stdlib — re-expressed as Arrow regex kernels)
# ---------------------------------------------------------------------------

# nginx combined:
# client - user [ts] "request" status size "referer" "agent" ["compression"]
_NGINX_COMBINED = (
    r'^(?P<client>\S+) - (?P<user>\S+) '
    r'\[(?P<timestamp>[^\]]+)\] '
    r'"(?P<request>[^"]*)" '
    r'(?P<status>\d{3}) (?P<size>\d+)'
    r' "(?P<referer>[^"]*)" "(?P<agent>[^"]*)"'
    r'(?: "(?P<compression>[^"]*)")?$'
)

# nginx error:
# YYYY/MM/DD HH:MM:SS [level] pid#tid: *cid message[, kv-tail]
_NGINX_ERROR = (
    r'^(?P<timestamp>\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) '
    r'\[(?P<severity>\w+)\] '
    r'(?P<pid>\d+)#(?P<tid>\d+):'
    r'(?: \*(?P<cid>\d+))? '
    r'(?P<message>.*?)'
    r'(?:, client: (?P<client>[^,]+))?'
    r'(?:, server: (?P<server>[^,]+))?'
    r'(?:, request: "(?P<request>[^"]*)")?'
    r'(?:, host: "(?P<host>[^"]*)")?$'
)


def parse_nginx_log(col, fmt: str = "combined") -> dict[str, pa.Array]:
    """Nginx access (combined) / error log lines
    (parse_nginx_log.cue semantics; timestamps stay strings)."""
    col = _arr(col)
    if fmt == "combined":
        g = pc.extract_regex(col, pattern=_NGINX_COMBINED)
        out = {n: pc.struct_field(g, n) for n in
               ("client", "user", "timestamp", "request", "status", "size",
                "referer", "agent", "compression")}
        out["status"] = _opt_int(out["status"])
        out["size"] = _opt_int(out["size"])
        out["compression"] = _nullif_empty(out["compression"])
        out["ts"] = parse_timestamp(out.pop("timestamp"), "%d/%b/%Y:%H:%M:%S %z")
        return out
    if fmt == "error":
        g = pc.extract_regex(col, pattern=_NGINX_ERROR)
        out = {n: pc.struct_field(g, n) for n in
               ("timestamp", "severity", "pid", "tid", "cid", "message",
                "client", "server", "request", "host")}
        out["pid"] = _opt_int(out["pid"])
        out["tid"] = _opt_int(out["tid"])
        out["cid"] = _opt_int(out["cid"])
        return out
    raise ValueError(f"unknown nginx format {fmt!r}")


# CEF: CEF:version|vendor|product|device_version|event_class_id|name|severity|ext
_CEF_HEADER = (
    r'^(?:.*?)?CEF:(?P<cefVersion>\d+)\|'
    r'(?P<deviceVendor>(?:\\.|[^|])*)\|'
    r'(?P<deviceProduct>(?:\\.|[^|])*)\|'
    r'(?P<deviceVersion>(?:\\.|[^|])*)\|'
    r'(?P<deviceEventClassId>(?:\\.|[^|])*)\|'
    r'(?P<name>(?:\\.|[^|])*)\|'
    r'(?P<severity>(?:\\.|[^|])*)\|'
    r'(?P<extension>.*)$'
)

_CEF_HEADER_FIELDS = ("cefVersion", "deviceVendor", "deviceProduct",
                      "deviceVersion", "deviceEventClassId", "name",
                      "severity")


def parse_cef(col, keys: list[str] | None = None) -> dict[str, pa.Array]:
    """ArcSight CEF lines (parse_cef.cue): the 7 header fields plus the
    requested extension ``keys`` (extension values run until the next
    ``key=``; ``\\``-escapes unescaped).  Pass ``keys=None`` to get the
    raw ``extension`` string column instead of individual keys."""
    col = _arr(col)
    g = pc.extract_regex(col, pattern=_CEF_HEADER)
    out = {n: pc.struct_field(g, n) for n in _CEF_HEADER_FIELDS}
    for n in ("deviceVendor", "deviceProduct", "deviceVersion",
              "deviceEventClassId", "name", "severity"):
        out[n] = pc.replace_substring_regex(out[n], pattern=r"\\(.)",
                                            replacement=r"\1")
    ext = pc.struct_field(g, "extension")
    if keys is None:
        out["extension"] = ext
        return out
    for k in keys:
        kg = pc.extract_regex(
            ext, pattern=rf"(?:^|\s){re.escape(k)}=(?P<v>(?:\\.|[^=])*?)(?:\s+\w+=|$)")
        v = pc.struct_field(kg, "v")
        out[k] = pc.replace_substring_regex(v, pattern=r"\\(.)",
                                            replacement=r"\1")
    return out


# user agent: heuristic "fast mode" family/version extraction
_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/(?P<v>[\d.]+)"),
    ("Chrome", r"Chrome/(?P<v>[\d.]+)"),
    ("Firefox", r"Firefox/(?P<v>[\d.]+)"),
    ("Safari", r"Version/(?P<v>[\d.]+).*Safari"),
    ("Opera", r"(?:Opera[/ ]|OPR/)(?P<v>[\d.]+)"),
    ("IE", r"MSIE (?P<v>[\d.]+)"),
]

_UA_OS = [
    ("Windows", r"Windows NT (?P<v>[\d.]+)"),
    ("iOS", r"(?:iPhone|iPad).*OS (?P<v>[\d_]+)"),
    ("Mac OS X", r"Mac OS X (?P<v>[\d_.]+)"),
    ("Android", r"Android (?P<v>[\d.]+)"),
    ("Linux", r"(?P<v>)Linux"),
]


def parse_user_agent(col) -> dict[str, pa.Array]:
    """Heuristic user-agent classification (parse_user_agent.cue "fast
    mode" shape, flattened to columns): browser_family/browser_version,
    os_family/os_version, device_category (pc/mobile/bot)."""
    col = _arr(col)
    n = len(col)

    def pick(pairs):
        fam = pa.nulls(n, pa.string())
        ver = pa.nulls(n, pa.string())
        for name, pat in pairs:
            g = pc.extract_regex(col, pattern=pat)
            hit = pc.and_(pc.is_valid(g), pc.is_null(fam))
            fam = pc.if_else(hit, pa.scalar(name, pa.string()), fam)
            v = _nullif_empty(pc.struct_field(g, "v"))
            v = pc.replace_substring(v, "_", ".")
            ver = pc.if_else(hit, v, ver)
        return fam, ver

    bf, bv = pick(_UA_BROWSERS)
    of, ov = pick(_UA_OS)
    is_bot = pc.fill_null(pc.match_substring_regex(
        col, r"(?i)bot|crawler|spider|slurp|curl|wget"), False)
    is_mobile = pc.fill_null(pc.match_substring_regex(
        col, r"Mobile|Android|iPhone|iPad"), False)
    cat = pc.if_else(is_bot, pa.scalar("bot", pa.string()),
                     pc.if_else(is_mobile, pa.scalar("mobile", pa.string()),
                                pa.scalar("pc", pa.string())))
    return {"browser_family": bf, "browser_version": bv,
            "os_family": of, "os_version": ov, "device_category": cat}


def parse_xml(col, text_key: str = "value",
              parse_number: bool = True) -> pa.Array:
    """XML → JSON-string column (parse_xml.cue object shape:
    attributes keyed ``@attr``, text under ``text_key``).  Arrow needs a
    uniform schema, so the dynamic object is returned JSON-encoded —
    feed it to ``parse_json`` to lift known fields (documented
    divergence from VRL's dynamic object)."""
    import json
    import xml.etree.ElementTree as ET

    def conv(el):
        node: dict = {}
        for k, v in el.attrib.items():
            node["@" + k] = v
        children = list(el)
        text = (el.text or "").strip()
        for c in children:
            v = conv(c)
            if c.tag in node:
                prev = node[c.tag]
                node[c.tag] = prev + [v] if isinstance(prev, list) else [prev, v]
            else:
                node[c.tag] = v
        if text:
            val = text
            if parse_number:
                try:
                    val = int(text)
                except ValueError:
                    try:
                        val = float(text)
                    except ValueError:
                        pass
            if node:
                node[text_key] = val
            else:
                return val
        return node

    col = _arr(col)
    out = []
    for s in col.to_pylist():
        if s is None:
            out.append(None)
            continue
        try:
            root = ET.fromstring(s)
            out.append(json.dumps({root.tag: conv(root)}, sort_keys=True))
        except ET.ParseError:
            out.append(None)
    return pa.array(out, pa.string())


# klog:  I0505 17:59:40.692994   28133 klog.go:70] message
_KLOG = (
    r'^(?P<level>[IWEF])(?P<mmdd>\d{4}) '
    r'(?P<time>\d{2}:\d{2}:\d{2}\.\d+)\s+'
    r'(?P<id>\d+) (?P<file>[^:]+):(?P<line>\d+)\] (?P<message>.*)$'
)

# glog:  I20210131 14:48:54.411655 15520 main.c++:9] message
_GLOG = (
    r'^(?P<level>[IWEF])(?P<date>\d{8}) '
    r'(?P<time>\d{2}:\d{2}:\d{2}\.\d+) '
    r'(?P<id>\d+) (?P<file>[^:]+):(?P<line>\d+)\] (?P<message>.*)$'
)

_KLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def _klog_level(col) -> pa.Array:
    out = pa.nulls(len(col), pa.string())
    for k, v in _KLOG_LEVELS.items():
        out = pc.if_else(pc.equal(col, k), pa.scalar(v, pa.string()), out)
    return out


def parse_klog(col, year: int | None = None) -> dict[str, pa.Array]:
    """Kubernetes klog lines (parse_klog.cue).  klog omits the year, so
    the reference stamps the CURRENT year; pass ``year`` explicitly for
    deterministic pipelines."""
    import datetime

    col = _arr(col)
    g = pc.extract_regex(col, pattern=_KLOG)
    out = {n: pc.struct_field(g, n) for n in
           ("level", "mmdd", "time", "id", "file", "line", "message")}
    y = str(year if year is not None else datetime.date.today().year)
    stamp = pc.binary_join_element_wise(
        pa.scalar(y), pc.utf8_slice_codeunits(out["mmdd"], 0, 2),
        pc.utf8_slice_codeunits(out["mmdd"], 2, 4), out.pop("time"), "-")
    # "YYYY-MM-DD-HH:MM:SS.ffffff" -> ISO-ish timestamp string
    out["timestamp"] = pc.replace_substring_regex(
        stamp, pattern=r"^(\d{4})-(\d{2})-(\d{2})-", replacement=r"\1-\2-\3T")
    out["level"] = _klog_level(out["level"])
    out["id"] = _opt_int(out["id"])
    out["line"] = _opt_int(out["line"])
    out.pop("mmdd")
    return out


def parse_glog(col) -> dict[str, pa.Array]:
    """Google glog lines (parse_glog.cue)."""
    col = _arr(col)
    g = pc.extract_regex(col, pattern=_GLOG)
    out = {n: pc.struct_field(g, n) for n in
           ("level", "date", "time", "id", "file", "line", "message")}
    d = out.pop("date")
    stamp = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(d, 0, 4), pc.utf8_slice_codeunits(d, 4, 6),
        pc.utf8_slice_codeunits(d, 6, 8), "-")
    out["timestamp"] = pc.binary_join_element_wise(stamp, out.pop("time"), "T")
    out["level"] = _klog_level(out["level"])
    out["id"] = _opt_int(out["id"])
    out["line"] = _opt_int(out["line"])
    return out


# GELF decode (lib/codecs/src/decoding/format/gelf.rs): JSON payloads
# with mandatory version/host/short_message; additional fields carry a
# leading underscore which the decoder strips.
def parse_gelf(col, extra_keys: list[str] | None = None) -> dict[str, pa.Array]:
    from vector_ray.functions.parse import parse_json_fields

    keys = ["version", "host", "short_message", "timestamp", "level"]
    fields, attempted, ok = parse_json_fields(col, keys, with_masks=True)
    out = dict(fields)
    if extra_keys:
        extras, _a, _o = parse_json_fields(
            col, ["_" + k for k in extra_keys], with_masks=True)
        for k in extra_keys:
            out[k] = extras["_" + k]
    # valid GELF = parseable JSON with the three mandatory fields
    out["__valid"] = pc.and_(
        ok, pc.and_(pc.is_valid(out["version"]),
                    pc.and_(pc.is_valid(out["host"]),
                            pc.is_valid(out["short_message"]))))
    return out


# InfluxDB line protocol (lib/codecs/src/decoding/format/influxdb.rs):
#   measurement[,tag=v...] field=value[,field=value...] [timestamp_ns]
_INFLUX = (
    r"^(?P<measurement>[^,\s]+)"
    r"(?:,(?P<tags>[^\s]+))?"
    r' (?P<fields>(?:[^\s"]|"[^"]*")+)'
    r"(?: (?P<timestamp>\d+))?$"
)


def parse_influxdb(col, *, tags: list[str] | None = None,
                   fields: list[str] | None = None) -> dict[str, pa.Array]:
    """Line-protocol decode: measurement + requested tag/field keys.

    Field values: ``1.5`` float, ``2i`` integer (suffix stripped),
    ``"str"`` quoted strings; all surfaced as strings here (callers
    cast) except the trailing ``i`` which is removed."""
    col = _arr(col)
    g = pc.extract_regex(col, pattern=_INFLUX)
    out = {
        "measurement": pc.struct_field(g, "measurement"),
        "timestamp": _opt_int(pc.struct_field(g, "timestamp")),
    }
    tag_str = pc.struct_field(g, "tags")
    for k in tags or []:
        kg = pc.extract_regex(
            tag_str, pattern=rf"(?:^|,){re.escape(k)}=(?P<v>[^,]*)")
        out[k] = pc.struct_field(kg, "v")
    field_str = pc.struct_field(g, "fields")
    for k in fields or []:
        kg = pc.extract_regex(
            field_str, pattern=rf'(?:^|,){re.escape(k)}=(?P<v>"[^"]*"|[^,]*)')
        v = pc.struct_field(kg, "v")
        v = pc.replace_substring_regex(v, pattern=r'^"(.*)"$', replacement=r"\1")
        v = pc.replace_substring_regex(v, pattern=r"^(-?\d+)i$", replacement=r"\1")
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# round-2 batch 3 parsers
# ---------------------------------------------------------------------------

def _dash_null(col):
    """AWS log conventions: '-' (and '') mean absent."""
    col = _nullif_empty(col)
    return pc.if_else(pc.equal(pc.fill_null(col, ""), "-"),
                      pa.scalar(None, pa.string()), col)


def parse_csv(col, delimiter: str = ",") -> pa.Array:
    """parse_csv.cue -> list<string>.  Unquoted rows (the overwhelming
    majority in log streams) split with one Arrow kernel; only rows
    containing a double-quote fall back to Python's csv reader."""
    import csv as _csv
    import io as _io

    col = _arr(col)
    s = pc.cast(col, pa.string())
    quoted = pc.fill_null(pc.match_substring(s, '"'), False)
    fast = pc.split_pattern(s, pattern=delimiter)
    if not pc.any(quoted).as_py():
        return fast
    out = fast.to_pylist()
    for i in np.flatnonzero(np.asarray(quoted)):
        v = s[int(i)].as_py()
        try:
            out[int(i)] = next(_csv.reader(_io.StringIO(v),
                                           delimiter=delimiter))
        except StopIteration:
            out[int(i)] = []
    return pa.array(out, pa.list_(pa.string()))


_TOKEN_RX = re.compile(r'"((?:[^"\\]|\\.)*)"|\[([^\]]*)\]|(\S+)')


def parse_tokens(col) -> pa.Array:
    """parse_tokens.cue -> list<string>: whitespace words, double-quoted
    strings (escapes resolved), [bracketed] groups.  Rows without quote
    or bracket characters split with one Arrow kernel; the rest walk
    the (non-regular, RE2-inexpressible) quote grammar in Python."""
    col = _arr(col)
    s = pc.cast(col, pa.string())
    special = pc.fill_null(pc.match_substring_regex(s, r'["\[]'), False)
    fast = pc.utf8_split_whitespace(s)
    if not pc.any(special).as_py():
        return fast
    out = fast.to_pylist()
    for i in np.flatnonzero(np.asarray(special)):
        v = s[int(i)].as_py()
        toks = []
        for m in _TOKEN_RX.finditer(v):
            if m.group(1) is not None:
                toks.append(m.group(1).replace('\\"', '"').replace("\\\\", "\\"))
            elif m.group(2) is not None:
                toks.append(m.group(2))
            else:
                toks.append(m.group(3))
        out[int(i)] = toks
    return pa.array(out, pa.list_(pa.string()))


def parse_linux_authorization(col) -> dict[str, pa.Array]:
    """parse_linux_authorization.cue: auth.log lines are RFC3164 syslog
    without the <pri> prefix."""
    col = _arr(col)
    g = pc.extract_regex(col, pattern=(
        r"^(?P<timestamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
        r"(?P<host>\S+) "
        r"(?P<appname>[^\[:\s]+)(?:\[(?P<pid>\d+)\])?: ?"
        r"(?P<message>.*)$"))
    out = {n: pc.struct_field(g, n)
           for n in ("timestamp", "host", "appname", "pid", "message")}
    out["pid"] = _opt_int(out["pid"])
    return out


_VPC_FLOW_V2 = ["version", "account_id", "interface_id", "srcaddr",
                "dstaddr", "srcport", "dstport", "protocol", "packets",
                "bytes", "start", "end", "action", "log_status"]
_VPC_INT_FIELDS = {"version", "srcport", "dstport", "protocol", "packets",
                   "bytes", "start", "end"}


def parse_aws_vpc_flow_log(col, format: str | None = None) -> dict[str, pa.Array]:
    """parse_aws_vpc_flow_log.cue: space-separated v2 default format (or
    a caller-supplied field list); '-' fields are null.  Fully
    vectorized: one split + positional list_element per field."""
    col = _arr(col)
    names = format.split() if format else _VPC_FLOW_V2
    parts = pc.split_pattern(pc.cast(col, pa.string()), pattern=" ")
    out: dict[str, pa.Array] = {}
    for i, name in enumerate(names):
        v = _dash_null(pc.list_element(parts, i))
        out[name] = pc.cast(v, pa.int64()) if name in _VPC_INT_FIELDS else v
    return out


# AWS ALB access log (parse_aws_alb_log.cue); single-pass RE2 with
# named groups over the documented space/quote layout.
_ALB_RX = (
    r'^(?P<type>\S+) (?P<timestamp>\S+) (?P<elb>\S+) '
    r'(?P<client_host>\S+) (?P<target_host>\S+) '
    r'(?P<request_processing_time>[\d.-]+) '
    r'(?P<target_processing_time>[\d.-]+) '
    r'(?P<response_processing_time>[\d.-]+) '
    r'(?P<elb_status_code>\S+) (?P<target_status_code>\S+) '
    r'(?P<received_bytes>\d+) (?P<sent_bytes>\d+) '
    r'"(?P<request_method>\S+) (?P<request_url>\S+) (?P<request_protocol>[^"]*)" '
    r'"(?P<user_agent>[^"]*)" (?P<ssl_cipher>\S+) (?P<ssl_protocol>\S+) '
    r'(?P<target_group_arn>\S+) "(?P<trace_id>[^"]*)" '
    r'"(?P<domain_name>[^"]*)" "(?P<chosen_cert_arn>[^"]*)" '
    r'(?P<matched_rule_priority>\S+) (?P<request_creation_time>\S+) '
    r'"(?P<actions_executed>[^"]*)" "(?P<redirect_url>[^"]*)" '
    r'"(?P<error_reason>[^"]*)"'
    r'(?: "(?P<target_port_list>[^"]*)" "(?P<target_status_code_list>[^"]*)")?'
    r'(?: "(?P<classification>[^"]*)" "(?P<classification_reason>[^"]*)")?'
)

_ALB_FLOAT = {"request_processing_time", "target_processing_time",
              "response_processing_time"}
_ALB_INT = {"received_bytes", "sent_bytes"}
_ALB_LIST = {"target_port_list", "target_status_code_list"}


def parse_aws_alb_log(col) -> dict[str, pa.Array]:
    col = _arr(col)
    g = pc.extract_regex(pc.cast(col, pa.string()), pattern=_ALB_RX)
    out: dict[str, pa.Array] = {}
    for f in g.type:
        name = f.name
        v = pc.struct_field(g, name)
        if name in _ALB_FLOAT:
            out[name] = pc.cast(
                pc.if_else(pc.equal(pc.fill_null(v, ""), "-1"),
                           pa.scalar(None, pa.string()), v), pa.float64())
        elif name in _ALB_INT:
            out[name] = _opt_int(v)
        elif name in _ALB_LIST:
            nonempty = np.asarray(pc.fill_null(pc.invert(pc.is_in(
                pc.fill_null(v, "-"), value_set=pa.array(["-", ""]))), False))
            lists = pc.split_pattern(pc.fill_null(v, ""), pattern=" ")
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            # zero out the '-'/empty rows in flat space
            flat = lists.flatten()
            parent = np.asarray(pc.list_parent_indices(lists))
            keep = nonempty[parent]
            counts = np.where(
                nonempty, np.asarray(pc.list_value_length(lists)), 0)
            offsets = pa.array(
                np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
            out[name] = pa.ListArray.from_arrays(
                offsets, flat.filter(pa.array(keep)))
        else:
            out[name] = _dash_null(v)
    return out


def parse_groks(col, patterns: list[str]) -> tuple[dict[str, pa.Array], pa.Array]:
    """parse_groks.cue: try each grok pattern in order, first match
    wins.  Vectorized: one extract_regex per pattern, per-field
    first-match coalesce."""
    from vector_ray.functions.grok import grok_to_regex

    col = _arr(col)
    s = pc.cast(col, pa.string())
    n = len(s)
    structs, matched = [], []
    for p in patterns:
        g = pc.extract_regex(s, pattern=grok_to_regex(p))
        structs.append(g)
        matched.append(pc.is_valid(g))
    claimed = pa.array(np.zeros(n, dtype=bool))
    out: dict[str, pa.Array] = {}
    order: list[str] = []
    for g, m in zip(structs, matched):
        use = pc.and_(m, pc.invert(claimed))
        for f in g.type:
            v = pc.if_else(use, pc.struct_field(g, f.name),
                           pa.nulls(n, pa.string()))
            if f.name in out:
                out[f.name] = pc.if_else(pc.is_valid(out[f.name]),
                                         out[f.name], v)
            else:
                out[f.name] = v
                order.append(f.name)
        claimed = pc.or_(claimed, m)
    return {k: out[k] for k in order}, claimed
