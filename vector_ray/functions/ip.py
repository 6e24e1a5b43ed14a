"""VRL IP function subset — ip_aton/ntoa, ip_cidr_contains, ip_subnet.

IPv4 parsing is fully vectorized (regex extract of the four octets +
integer math); CIDR membership is then a range check on the uint32
form — no per-row Python on the hot path.
"""

from __future__ import annotations

import ipaddress

import pyarrow as pa
import pyarrow.compute as pc


_V4 = r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$"


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def ip_aton(col) -> pa.Array:
    """dotted-quad string → uint32 (null on malformed / out-of-range)."""
    g = pc.extract_regex(_arr(col), pattern=_V4)
    parts = []
    ok = pc.is_valid(g)
    for name in ("a", "b", "c", "d"):
        p = pc.cast(pc.struct_field(g, name), pa.int64())
        ok = pc.and_(ok, pc.fill_null(pc.less_equal(p, 255), False))
        parts.append(p)
    val = parts[0]
    for p in parts[1:]:
        val = pc.add(pc.multiply(val, 256), p)
    return pc.if_else(ok, val, pa.scalar(None, pa.int64()))


def ip_ntoa(col) -> pa.Array:
    """uint32 → dotted-quad string."""
    x = pc.cast(_arr(col), pa.int64())
    octs = []
    for shift in (24, 16, 8, 0):
        o = pc.bit_wise_and(pc.shift_right(x, shift), 255)
        octs.append(pc.cast(o, pa.string()))
    return pc.binary_join_element_wise(*octs, pa.scalar("."))


def ip_cidr_contains(col, cidr: str) -> pa.Array:
    """True where the IPv4 address column falls inside ``cidr``."""
    net = ipaddress.ip_network(cidr, strict=False)
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    x = ip_aton(col)
    m = pc.and_(pc.greater_equal(x, lo), pc.less_equal(x, hi))
    return pc.fill_null(m, False)


def ip_subnet(col, prefix: int) -> pa.Array:
    """Mask the address column to its /prefix network address string."""
    mask = (0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF
    x = ip_aton(col)
    return ip_ntoa(pc.bit_wise_and(x, mask))


# ---- round-2 batch 3: v6 interop (ip_to_ipv6.cue / ipv6_to_ipv4.cue /
# ip_ntop.cue / ip_pton.cue).  General v6 textual forms are not
# regular-expression friendly; parse per UNIQUE value (log streams
# carry few distinct addresses relative to rows).

def _map_unique_ip(col, fn, out_type=pa.string()):
    col = _arr(col)
    uniq = pc.unique(col)
    mapped = pa.array(
        [None if v is None else fn(v) for v in uniq.to_pylist()], out_type)
    return mapped.take(pc.index_in(col, value_set=uniq))


def ip_to_ipv6(col) -> pa.Array:
    """v4 -> ::ffff:a.b.c.d mapped form; v6 passes through."""
    def conv(v):
        try:
            ip = ipaddress.ip_address(v)
        except ValueError:
            return None
        if isinstance(ip, ipaddress.IPv4Address):
            return f"::ffff:{ip}"
        if ip.ipv4_mapped is not None:
            return f"::ffff:{ip.ipv4_mapped}"
        return str(ip)
    return _map_unique_ip(col, conv)


def ipv6_to_ipv4(col) -> pa.Array:
    """v4-mapped/compatible v6 -> dotted quad; v4 passes through;
    non-mappable v6 -> null (fallible in VRL)."""
    def conv(v):
        try:
            ip = ipaddress.ip_address(v)
        except ValueError:
            return None
        if isinstance(ip, ipaddress.IPv4Address):
            return str(ip)
        mapped = ip.ipv4_mapped
        if mapped is not None:
            return str(mapped)
        return None
    return _map_unique_ip(col, conv)


def ip_pton(col) -> pa.Array:
    """presentation -> packed bytes (4 or 16), null on malformed."""
    def conv(v):
        try:
            return ipaddress.ip_address(v).packed
        except ValueError:
            return None
    return _map_unique_ip(col, conv, pa.binary())


def ip_ntop(col) -> pa.Array:
    """packed bytes (4 or 16) -> presentation string."""
    def conv(v):
        if len(v) == 4:
            return str(ipaddress.IPv4Address(v))
        if len(v) == 16:
            return str(ipaddress.IPv6Address(v))
        return None
    return _map_unique_ip(col, conv)
