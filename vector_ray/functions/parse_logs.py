"""Log-format parsers — the parse_syslog / parse_apache_log /
parse_common_log / parse_url / parse_query_string / parse_duration /
parse_bytes members of the VRL stdlib (SURVEY §2.7), as vectorized
regex extractions over Arrow columns.  Null where a row doesn't match.
"""

from __future__ import annotations

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
