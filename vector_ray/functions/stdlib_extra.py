"""Round-2 VRL stdlib breadth: type predicates/assertions, collection
kernels, syslog mappings, formatting, and misc value functions.

Behavioral reference: website/cue/reference/remap/functions/*.cue
(is_*.cue, bool.cue/int.cue/float.cue/string.cue/timestamp.cue,
keys.cue/values.cue/merge.cue/push.cue/append.cue/get.cue,
to_syslog_*.cue, format_int.cue/format_number.cue, find.cue,
contains_all.cue, match_any.cue, uuid_v4.cue, now.cue, ...).

All list/array kernels operate in FLAT space over Arrow list columns
(one numpy pass, no per-row Python); per-row Python appears only in
inherently formatting-bound functions and is commented as such.
"""

from __future__ import annotations

import base64
import binascii
import json
import os
import re
import socket
import struct
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.functions.codecs import _map_unique


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _n_of(col):
    return len(_arr(col))


# ---------------------------------------------------------------------------
# type predicates (is_*.cue) — column types are uniform, so most are
# constant per column; is_nullish/is_empty/is_ipv4/is_ipv6/is_json are
# value-dependent and vectorized
# ---------------------------------------------------------------------------

def _const(col, flag: bool) -> pa.Array:
    return pa.array(np.full(_n_of(col), flag))


def is_integer(col):
    return _const(col, pa.types.is_integer(_arr(col).type))


def is_float(col):
    return _const(col, pa.types.is_floating(_arr(col).type))


def is_boolean(col):
    return _const(col, pa.types.is_boolean(_arr(col).type))


def is_array(col):
    t = _arr(col).type
    return _const(col, pa.types.is_list(t) or pa.types.is_large_list(t))


def is_object(col):
    return _const(col, pa.types.is_struct(_arr(col).type))


def is_timestamp(col):
    return _const(col, pa.types.is_timestamp(_arr(col).type))


def is_regex(col):
    return _const(col, False)  # regexes are literals, never column values


def is_empty(col):
    """Empty string / array / object (is_empty.cue)."""
    col = _arr(col)
    t = col.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pc.equal(pc.fill_null(pc.list_value_length(col), 0), 0)
    if pa.types.is_struct(t):
        return _const(col, col.type.num_fields == 0)
    return pc.equal(pc.utf8_length(pc.fill_null(pc.cast(col, pa.string()),
                                                "")), 0)


def is_nullish(col):
    """null, empty/whitespace-only string, or "-" (is_nullish.cue)."""
    col = _arr(col)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        return pc.is_null(col)
    stripped = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
    blank = pc.or_(pc.equal(stripped, ""), pc.equal(stripped, "-"))
    return pc.or_(pc.is_null(col), pc.fill_null(blank, False))


_IPV4_RX = r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"


def is_ipv4(col):
    return pc.fill_null(pc.match_substring_regex(
        pc.cast(_arr(col), pa.string()), _IPV4_RX), False)


def is_ipv6(col):
    # colon-hex heuristic + parse confirmation on uniques
    import ipaddress

    def chk(v):
        try:
            ipaddress.IPv6Address(v)
            return True
        except ValueError:
            return False
    return pc.fill_null(_map_unique(_arr(col), chk, pa.bool_()), False)


def is_json(col):
    def chk(v):
        try:
            json.loads(v)
            return True
        except (ValueError, TypeError):
            return False
    return pc.fill_null(_map_unique(_arr(col), chk, pa.bool_()), False)


# ---------------------------------------------------------------------------
# type assertions (bool.cue/int.cue/float.cue/string.cue/timestamp.cue/
# array.cue/object.cue): value passes through; wrong-typed columns error
# every row (fallible — pair with `!` or `??` as in VRL)
# ---------------------------------------------------------------------------

def _assert_type(col, pred) -> tuple[pa.Array, pa.Array]:
    col = _arr(col)
    ok = pred(col.type)
    n = len(col)
    return col, pa.array(np.full(n, ok))


def assert_bool(col):
    return _assert_type(col, pa.types.is_boolean)


def assert_int(col):
    return _assert_type(col, pa.types.is_integer)


def assert_float(col):
    return _assert_type(col, pa.types.is_floating)


def assert_string(col):
    return _assert_type(
        col, lambda t: pa.types.is_string(t) or pa.types.is_large_string(t))


def assert_timestamp(col):
    return _assert_type(col, pa.types.is_timestamp)


def assert_array(col):
    return _assert_type(
        col, lambda t: pa.types.is_list(t) or pa.types.is_large_list(t))


def assert_object(col):
    return _assert_type(col, pa.types.is_struct)


def to_bool(col):
    """to_bool.cue: "true"/"t"/"yes"/"y"/"1" -> true, inverse -> false,
    numbers by non-zero-ness; unparseable -> null (fallible)."""
    col = _arr(col)
    if pa.types.is_boolean(col.type):
        return col
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        return pc.not_equal(col, 0)
    s = pc.utf8_lower(pc.cast(col, pa.string()))
    true_m = pc.is_in(s, value_set=pa.array(["true", "t", "yes", "y", "1"]))
    false_m = pc.is_in(s, value_set=pa.array(["false", "f", "no", "n", "0"]))
    out = pc.if_else(true_m, True,
                     pc.if_else(false_m, False, pa.nulls(len(col), pa.bool_())))
    return out


# ---------------------------------------------------------------------------
# collections (keys.cue / values.cue / merge.cue / push.cue / append.cue
# / get.cue / remove.cue / unflatten.cue / zip.cue)
# ---------------------------------------------------------------------------

def keys_(col) -> pa.Array:
    """Object keys as a per-row list (constant across rows)."""
    col = _arr(col)
    if not pa.types.is_struct(col.type):
        raise ValueError("keys() requires an object")
    names = [f.name for f in col.type]
    n, k = len(col), len(names)
    base = pa.array(names, pa.string())
    vals = base.take(pa.array(np.tile(np.arange(k), n)))
    offsets = pa.array(np.arange(0, n * k + 1, k, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, vals)


def values_(col) -> pa.Array:
    """Object values as a per-row list (common-type cast)."""
    col = _arr(col)
    if not pa.types.is_struct(col.type):
        raise ValueError("values() requires an object")
    n = len(col)
    arrs = [pc.struct_field(col, f.name) for f in col.type]
    if not arrs:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], pa.string()))
    common = arrs[0].type
    for a in arrs[1:]:
        if a.type != common:
            common = pa.string()
            break
    arrs = [pc.cast(a, common) for a in arrs]
    k = len(arrs)
    concat = pa.concat_arrays([_arr(a) for a in arrs])
    p = np.arange(n * k)
    flat = concat.take(pa.array((p % k) * n + p // k))
    offsets = pa.array(np.arange(0, n * k + 1, k, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, flat)


def merge_objects(a, b, *, deep: bool = False) -> pa.Array:
    """merge.cue: fields of `b` override fields of `a` (shallow; `deep`
    recurses into struct-typed fields present in both)."""
    a, b = _arr(a), _arr(b)
    if not (pa.types.is_struct(a.type) and pa.types.is_struct(b.type)):
        raise ValueError("merge() requires two objects")
    n = len(a)
    fields: dict[str, pa.Array] = {
        f.name: pc.struct_field(a, f.name) for f in a.type}
    for f in b.type:
        newv = pc.struct_field(b, f.name)
        if (deep and f.name in fields
                and pa.types.is_struct(fields[f.name].type)
                and pa.types.is_struct(newv.type)):
            fields[f.name] = merge_objects(fields[f.name], newv, deep=True)
        else:
            fields[f.name] = newv
    names = list(fields)
    return pa.StructArray.from_arrays([_arr(fields[k]) for k in names],
                                      names=names)


def _list_parts(col):
    col = _arr(col)
    flat = col.flatten()
    counts = np.asarray(pc.fill_null(pc.list_value_length(col), 0),
                        dtype=np.int64)
    parent = np.asarray(pc.list_parent_indices(col))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return col, flat, counts, parent, starts


def push_(col, item) -> pa.Array:
    """push.cue: append one value to each row's array (flat-space
    scatter — no per-row Python)."""
    col, flat, counts, parent, starts = _list_parts(col)
    n = len(col)
    L = len(flat)
    items = item if isinstance(item, pa.Array) else pa.array([item] * n)
    items = pc.cast(_arr(items), flat.type) if len(flat) else _arr(items)
    new_counts = counts + 1
    new_starts = np.concatenate([[0], np.cumsum(new_counts)[:-1]])
    out_idx = np.empty(L + n, dtype=np.int64)
    if L:
        out_idx[new_starts[parent] + (np.arange(L) - starts[parent])] = \
            np.arange(L)
    out_idx[new_starts + counts] = L + np.arange(n)
    merged = pa.concat_arrays([flat, pc.cast(items, flat.type)]) \
        if L else items
    vals = merged.take(pa.array(out_idx))
    offsets = pa.array(np.concatenate([[0], np.cumsum(new_counts)])
                       .astype(np.int32))
    return pa.ListArray.from_arrays(offsets, vals)


def append_(a, b) -> pa.Array:
    """append.cue: element-wise array concatenation (flat-space scatter)."""
    a, fa, ca, pa_, sa = _list_parts(a)
    b, fb, cb, pb, sb = _list_parts(b)
    n = len(a)
    fb = pc.cast(fb, fa.type) if len(fa) else fb
    La, Lb = len(fa), len(fb)
    new_counts = ca + cb
    new_starts = np.concatenate([[0], np.cumsum(new_counts)[:-1]])
    out_idx = np.empty(La + Lb, dtype=np.int64)
    if La:
        out_idx[new_starts[pa_] + (np.arange(La) - sa[pa_])] = np.arange(La)
    if Lb:
        out_idx[new_starts[pb] + ca[pb] + (np.arange(Lb) - sb[pb])] = \
            La + np.arange(Lb)
    merged = pa.concat_arrays([fa, fb]) if La else fb
    vals = merged.take(pa.array(out_idx))
    offsets = pa.array(np.concatenate([[0], np.cumsum(new_counts)])
                       .astype(np.int32))
    return pa.ListArray.from_arrays(offsets, vals)


def get_(col, path) -> pa.Array:
    """get.cue with a constant path: struct fields by name, list
    elements by integer index."""
    col = _arr(col)
    if isinstance(path, (pa.Array, pa.ChunkedArray)):
        path = _arr(path)[0].as_py() if len(path) else []
    if not isinstance(path, (list, tuple)):
        path = [path]
    for seg in path:
        t = col.type
        if pa.types.is_struct(t):
            col = pc.struct_field(col, str(seg))
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            col = pc.list_element(col, int(seg))
        else:
            return pa.nulls(len(col), pa.string())
    return col


def remove_(col, path) -> pa.Array:
    """remove.cue with a constant single-segment path over an object."""
    col = _arr(col)
    if isinstance(path, (pa.Array, pa.ChunkedArray)):
        path = _arr(path)[0].as_py() if len(path) else []
    seg = path[0] if isinstance(path, (list, tuple)) else path
    if not pa.types.is_struct(col.type):
        return col
    kept = [(f.name, pc.struct_field(col, f.name)) for f in col.type
            if f.name != seg]
    if not kept:
        return pa.nulls(len(col), pa.struct([]))
    return pa.StructArray.from_arrays([_arr(v) for _k, v in kept],
                                      names=[k for k, _v in kept])


def unflatten_(col, separator: str = ".") -> pa.Array:
    """unflatten.cue: dotted keys of an object into nested objects."""
    col = _arr(col)
    if not pa.types.is_struct(col.type):
        raise ValueError("unflatten() requires an object")
    n = len(col)

    def build(items: list[tuple[list[str], pa.Array]]) -> pa.Array:
        leaves: dict[str, pa.Array] = {}
        groups: dict[str, list[tuple[list[str], pa.Array]]] = {}
        for parts, arr in items:
            if len(parts) == 1:
                leaves[parts[0]] = arr
            else:
                groups.setdefault(parts[0], []).append((parts[1:], arr))
        fields = dict(leaves)
        for head, sub in groups.items():
            fields[head] = build(sub)
        names = list(fields)
        return pa.StructArray.from_arrays([_arr(fields[k]) for k in names],
                                          names=names)

    items = [(f.name.split(separator), pc.struct_field(col, f.name))
             for f in col.type]
    return build(items)


def zip_(a, b) -> pa.Array:
    """zip.cue (two-array form): element-wise pairing into a list of
    [x, y] string pairs, truncated to the shorter side per row."""
    a, fa, ca, pa_, sa = _list_parts(a)
    b, fb, cb, pb, sb = _list_parts(b)
    n = len(a)
    fa = pc.cast(fa, pa.string())
    fb = pc.cast(fb, pa.string())
    counts = np.minimum(ca, cb)
    m = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # flat index of pair j of row i: a at sa[i]+j, b at sb[i]+j
    parent = np.repeat(np.arange(n), counts)
    within = np.arange(m) - starts[parent]
    ai = sa[parent] + within
    bi = sb[parent] + within
    # interleave a,b per pair -> inner lists of length 2
    pair_vals = pa.concat_arrays([fa, fb]).take(
        pa.array(np.column_stack([ai, len(fa) + bi]).ravel()))
    inner = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * m + 1, 2, dtype=np.int32)), pair_vals)
    outer = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)),
        inner)
    return outer


# ---------------------------------------------------------------------------
# strings / matching
# ---------------------------------------------------------------------------

def find_(col, substring: str, *, from_: int = 0) -> pa.Array:
    """find.cue: first byte index of substring, -1 when absent."""
    return pc.find_substring(pc.cast(_arr(col), pa.string()),
                             pattern=substring)


def contains_all(col, substrings: list[str]) -> pa.Array:
    s = pc.cast(_arr(col), pa.string())
    out = None
    for sub in substrings:
        m = pc.fill_null(pc.match_substring(s, sub), False)
        out = m if out is None else pc.and_(out, m)
    if out is None:
        out = pa.array(np.ones(len(s), dtype=bool))
    return out


def match_any(col, patterns: list) -> pa.Array:
    s = pc.cast(_arr(col), pa.string())
    out = None
    for p in patterns:
        if isinstance(p, tuple) and p and p[0] == "__regex__":
            p = p[1]
        m = pc.fill_null(pc.match_substring_regex(s, str(p)), False)
        out = m if out is None else pc.or_(out, m)
    if out is None:
        out = pa.array(np.zeros(len(s), dtype=bool))
    return out


def match_array(col, pattern) -> pa.Array:
    """match_array.cue: true when any element of the array matches."""
    col, flat, counts, parent, _starts = _list_parts(col)
    if isinstance(pattern, tuple) and pattern and pattern[0] == "__regex__":
        pattern = pattern[1]
    m = np.asarray(pc.fill_null(pc.match_substring_regex(
        pc.cast(flat, pa.string()), str(pattern)), False))
    hit = np.zeros(len(col), dtype=bool)
    if m.any():
        np.logical_or.at(hit, parent[m], True)
    return pa.array(hit)


def pascalcase(col):
    from vector_ray.functions.strings import camelcase
    cc = camelcase(col)
    head = pc.utf8_upper(pc.utf8_slice_codeunits(cc, 0, 1))
    return pc.binary_join_element_wise(head,
                                       pc.utf8_slice_codeunits(cc, 1, 1 << 30),
                                       "")


def screamingsnakecase(col):
    from vector_ray.functions.strings import snakecase
    return pc.utf8_upper(snakecase(col))


def format_int(col, base: int = 10) -> pa.Array:
    col = _arr(col)
    ints = pc.cast(col, pa.int64())
    if base == 10:
        return pc.cast(ints, pa.string())
    # non-decimal bases are formatting-bound; map unique values only
    fmt = {16: "{:x}", 8: "{:o}", 2: "{:b}"}.get(base)
    if fmt is None:
        raise ValueError(f"unsupported base {base}")
    return _map_unique(ints, lambda v: fmt.format(v))


def format_number(col, scale: int = 2, *, decimal_separator: str = ".",
                  grouping_separator: str = ",") -> pa.Array:
    col = pc.cast(_arr(col), pa.float64())

    # locale-style formatting is inherently per-value; dedup first
    def one(v):
        s = f"{v:,.{scale}f}"
        return (s.replace(",", "\x00").replace(".", decimal_separator)
                 .replace("\x00", grouping_separator))
    return _map_unique(col, one)


# ---------------------------------------------------------------------------
# syslog mappings (to_syslog_level.cue / to_syslog_severity.cue /
# to_syslog_facility.cue) — RFC 5424 tables
# ---------------------------------------------------------------------------

_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice",
                  "info", "debug"]
_SYSLOG_SEVERITIES = {
    "emerg": 0, "panic": 0, "alert": 1, "crit": 2, "err": 3, "error": 3,
    "warning": 4, "warn": 4, "notice": 5, "info": 6, "debug": 7,
}
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def _table_lookup(col, table: list[str]) -> pa.Array:
    idx = np.asarray(pc.cast(_arr(col), pa.int64()).fill_null(-1))
    ok = (idx >= 0) & (idx < len(table))
    base = pa.array(table, pa.string())
    out = base.take(pa.array(np.where(ok, idx, 0)))
    return pc.if_else(pa.array(ok), out, pa.nulls(len(idx), pa.string()))


def to_syslog_level(col) -> pa.Array:
    return _table_lookup(col, _SYSLOG_LEVELS)


def to_syslog_facility(col) -> pa.Array:
    return _table_lookup(col, _SYSLOG_FACILITIES)


def to_syslog_severity(col) -> pa.Array:
    s = pc.utf8_lower(pc.cast(_arr(col), pa.string()))
    keys = pa.array(list(_SYSLOG_SEVERITIES))
    vals = pa.array(list(_SYSLOG_SEVERITIES.values()), pa.int64())
    idx = pc.index_in(s, value_set=keys)
    return vals.take(idx)


# ---------------------------------------------------------------------------
# misc value functions
# ---------------------------------------------------------------------------

def crc_(col, *, algorithm: str = "crc32") -> pa.Array:
    if algorithm not in ("crc32", "crc-32"):
        raise ValueError(f"unsupported crc algorithm {algorithm!r}")
    return _map_unique(_arr(col),
                       lambda v: str(zlib.crc32(v.encode()) & 0xFFFFFFFF))


def now_(col=None):
    import datetime as _dt
    return _dt.datetime.utcnow()


def uuid_v4(col) -> pa.Array:
    """Random v4 UUIDs, vectorized: one RNG draw + one hexlify for the
    whole batch, split with numpy fixed-width views."""
    n = _n_of(col)
    b = np.random.randint(0, 256, size=(n, 16), dtype=np.int64).astype(np.uint8)
    b[:, 6] = (b[:, 6] & 0x0F) | 0x40
    b[:, 8] = (b[:, 8] & 0x3F) | 0x80
    hx = np.frombuffer(binascii.hexlify(b.tobytes()), dtype="S32").astype("U32")
    chars = hx.view("U1").reshape(n, 32)
    out = np.empty((n, 36), dtype="U1")
    out[:, [8, 13, 18, 23]] = "-"
    out[:, :8] = chars[:, :8]
    out[:, 9:13] = chars[:, 8:12]
    out[:, 14:18] = chars[:, 12:16]
    out[:, 19:23] = chars[:, 16:20]
    out[:, 24:] = chars[:, 20:]
    return pa.array(out.view("U36").ravel())


def get_hostname(col=None) -> str:
    return socket.gethostname()


def get_timezone_name(col=None) -> str:
    return time.tzname[0] or "UTC"


def get_env_var(name) -> str | None:
    if isinstance(name, (pa.Array, pa.ChunkedArray)):
        name = _arr(name)[0].as_py()
    return os.environ.get(str(name))


def log_(col, *args, **kwargs):
    """log.cue: emit and pass through. Batch engines have no per-event
    logger; this is a no-op passthrough by design."""
    return col


def random_int(col, lo: int = 0, hi: int = 1 << 31) -> pa.Array:
    return pa.array(np.random.randint(lo, hi, size=_n_of(col)))


def random_float(col, lo: float = 0.0, hi: float = 1.0) -> pa.Array:
    return pa.array(np.random.uniform(lo, hi, size=_n_of(col)))


def random_bool(col) -> pa.Array:
    return pa.array(np.random.randint(0, 2, size=_n_of(col)).astype(bool))


# ---------------------------------------------------------------------------
# round-2 batch 4: crypto (encrypt.cue / decrypt.cue — the AES modes in
# wide use), assertions, regex/uuid/bytes misc
# ---------------------------------------------------------------------------

def _aes_parts(algorithm: str):
    """'AES-256-CBC-PKCS7' -> (key_bytes, mode, padding)."""
    parts = algorithm.upper().split("-")
    if len(parts) < 3 or parts[0] != "AES":
        raise ValueError(f"unsupported algorithm {algorithm!r}")
    bits = int(parts[1])
    if bits not in (128, 192, 256):
        raise ValueError(f"unsupported key size {bits}")
    mode = parts[2]
    pad = parts[3] if len(parts) > 3 else None
    return bits // 8, mode, pad


def _as_bytes(v) -> bytes:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        v = _arr(v)[0].as_py()
    if isinstance(v, str):
        return v.encode()
    return bytes(v)


def encrypt_(col, algorithm: str, key, *, iv=None) -> pa.Array:
    """AES-{128,192,256}-{CBC-PKCS7,CTR,GCM}.  Crypto is per-value by
    nature; values loop in Python over the (usually short) batch list —
    key/IV/cipher objects build once per call."""
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    from cryptography.hazmat.primitives import padding as _padding

    klen, mode, pad = _aes_parts(algorithm)
    kb, ivb = _as_bytes(key), (_as_bytes(iv) if iv is not None else b"")
    if len(kb) != klen:
        raise ValueError(f"key must be {klen} bytes for {algorithm}")
    col = _arr(col)
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        data = v.encode() if isinstance(v, str) else bytes(v)
        if mode == "GCM":
            c = Cipher(algorithms.AES(kb), modes.GCM(ivb)).encryptor()
            ct = c.update(data) + c.finalize()
            out.append(ct + c.tag)
        elif mode == "CTR":
            c = Cipher(algorithms.AES(kb), modes.CTR(ivb)).encryptor()
            out.append(c.update(data) + c.finalize())
        elif mode == "CBC":
            if pad == "PKCS7" or pad is None:
                p = _padding.PKCS7(128).padder()
                data = p.update(data) + p.finalize()
            c = Cipher(algorithms.AES(kb), modes.CBC(ivb)).encryptor()
            out.append(c.update(data) + c.finalize())
        else:
            raise ValueError(f"unsupported mode {mode}")
    return pa.array(out, pa.binary())


def decrypt_(col, algorithm: str, key, *, iv=None) -> pa.Array:
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)
    from cryptography.hazmat.primitives import padding as _padding

    klen, mode, pad = _aes_parts(algorithm)
    kb, ivb = _as_bytes(key), (_as_bytes(iv) if iv is not None else b"")
    col = _arr(col)
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        data = bytes(v)
        try:
            if mode == "GCM":
                ct, tag = data[:-16], data[-16:]
                c = Cipher(algorithms.AES(kb), modes.GCM(ivb, tag)).decryptor()
                out.append(c.update(ct) + c.finalize())
            elif mode == "CTR":
                c = Cipher(algorithms.AES(kb), modes.CTR(ivb)).decryptor()
                out.append(c.update(data) + c.finalize())
            elif mode == "CBC":
                c = Cipher(algorithms.AES(kb), modes.CBC(ivb)).decryptor()
                plain = c.update(data) + c.finalize()
                if pad == "PKCS7" or pad is None:
                    up = _padding.PKCS7(128).unpadder()
                    plain = up.update(plain) + up.finalize()
                out.append(plain)
            else:
                raise ValueError(f"unsupported mode {mode}")
        except Exception:
            out.append(None)
    return pa.array(out, pa.binary())


def assert_(cond, message: str = "assertion failed"):
    """assert.cue: fallible — rows where the condition is false error."""
    cond = _arr(cond) if isinstance(cond, (pa.Array, pa.ChunkedArray)) else cond
    if isinstance(cond, pa.Array):
        ok = pc.fill_null(pc.cast(cond, pa.bool_()), False)
    else:
        ok = pa.array([bool(cond)])
    return pa.array(np.full(len(ok), True)), ok


def assert_eq(a, b, message: str = "assertion failed"):
    n = _n_of(a) if isinstance(a, (pa.Array, pa.ChunkedArray)) else \
        (_n_of(b) if isinstance(b, (pa.Array, pa.ChunkedArray)) else 1)
    aa = a if isinstance(a, (pa.Array, pa.ChunkedArray)) else pa.array([a] * n)
    ok = pc.fill_null(pc.equal(_arr(aa), b), False)
    return pa.array(np.full(n, True)), ok


def to_regex(col):
    """to_regex.cue: strings pass through tagged for `match`-style use;
    regexes are compile-time literals in this engine."""
    return _arr(col)


def uuid_v7(col) -> pa.Array:
    """Time-ordered UUIDs (uuid_v7.cue): millisecond timestamp prefix +
    random tail, vectorized like uuid_v4."""
    n = _n_of(col)
    ms = int(time.time() * 1000)
    b = np.random.randint(0, 256, size=(n, 16), dtype=np.int64).astype(np.uint8)
    ts = np.full(n, ms, dtype=np.uint64)
    for i in range(6):  # 48-bit big-endian timestamp in bytes 0..5
        b[:, 5 - i] = (ts >> (8 * i)).astype(np.uint8)
    b[:, 6] = (b[:, 6] & 0x0F) | 0x70
    b[:, 8] = (b[:, 8] & 0x3F) | 0x80
    hx = np.frombuffer(binascii.hexlify(b.tobytes()), dtype="S32").astype("U32")
    chars = hx.view("U1").reshape(n, 32)
    out = np.empty((n, 36), dtype="U1")
    out[:, [8, 13, 18, 23]] = "-"
    out[:, :8] = chars[:, :8]
    out[:, 9:13] = chars[:, 8:12]
    out[:, 14:18] = chars[:, 12:16]
    out[:, 19:23] = chars[:, 16:20]
    out[:, 24:] = chars[:, 20:]
    return pa.array(out.view("U36").ravel())


def random_bytes(col, length: int = 16) -> pa.Array:
    n = _n_of(col)
    b = np.random.randint(0, 256, size=(n, int(length)),
                          dtype=np.int64).astype(np.uint8)
    raw = b.tobytes()
    L = int(length)
    return pa.array([raw[i * L:(i + 1) * L] for i in range(n)], pa.binary())


def object_from_array(col) -> pa.Array:
    """object_from_array.cue over [[k, v], ...] lists: columnar schemas
    need a uniform key set, so keys are taken from the FIRST row's pairs
    and values positionally matched per row (documented divergence for
    ragged inputs)."""
    col = _arr(col)
    if len(col) == 0:
        return pa.nulls(0, pa.struct([]))
    first = col[0].as_py() or []
    names = [str(p[0]) for p in first]
    k = len(names)
    # flatten two levels: outer list of pairs, inner [k, v]
    outer = col.flatten()
    vals = outer.flatten()
    n = len(col)
    arrs = []
    for j in range(k):
        # value of pair j of row i sits at flat position (i*k + j)*2 + 1
        pos = (np.arange(n) * k + j) * 2 + 1
        arrs.append(pc.cast(vals, pa.string()).take(pa.array(pos)))
    return pa.StructArray.from_arrays(arrs, names=names)


# snappy/zstd ride pyarrow's bundled codecs (functions/codecs.py) —
# no external compression library needed
from vector_ray.functions.codecs import (  # noqa: F401
    decode_snappy, decode_zstd, encode_snappy, encode_zstd)


# ---------------------------------------------------------------------------
# round-2 batch 5: the tail of the documented inventory
# ---------------------------------------------------------------------------

def ceil_(col, precision: int = 0) -> pa.Array:
    col = pc.cast(_arr(col), pa.float64())
    if precision:
        f = 10.0 ** precision
        return pc.divide(pc.ceil(pc.multiply(col, f)), f)
    return pc.ceil(col)


def floor_(col, precision: int = 0) -> pa.Array:
    col = pc.cast(_arr(col), pa.float64())
    if precision:
        f = 10.0 ** precision
        return pc.divide(pc.floor(pc.multiply(col, f)), f)
    return pc.floor(col)


def set_path(col, path, value) -> pa.Array:
    """set.cue with a constant path: insert/overwrite an object field."""
    col = _arr(col)
    if isinstance(path, (pa.Array, pa.ChunkedArray)):
        path = _arr(path)[0].as_py() if len(path) else []
    seg = path[0] if isinstance(path, (list, tuple)) else path
    if not pa.types.is_struct(col.type):
        raise ValueError("set() requires an object")
    n = len(col)
    varr = value if isinstance(value, pa.Array) else pa.array([value] * n)
    fields = {f.name: pc.struct_field(col, f.name) for f in col.type}
    fields[str(seg)] = _arr(varr)
    names = list(fields)
    return pa.StructArray.from_arrays([_arr(fields[k]) for k in names],
                                      names=names)


def seahash_(col) -> pa.Array:
    """SeaHash (public domain algorithm, ticki 2016): per-unique pure
    Python port — sequential chunk diffusion is not batch-vectorizable,
    and hash inputs dedup heavily in log streams."""
    M = (1 << 64) - 1

    def diffuse(x):
        x = (x * 0x6eed0e9da4d94a4f) & M
        a, b = x >> 32, x >> 60
        x ^= a >> b
        return (x * 0x6eed0e9da4d94a4f) & M

    def one(v):
        data = v.encode() if isinstance(v, str) else bytes(v)
        a, b = 0x16f11fe89b0d677c, 0xb480a793d8e6c86c
        c, d = 0x6fe2e5aaf078ebc9, 0x14f994a4c5259381
        state = [a, b, c, d]
        i = 0
        ln = len(data)
        while i + 8 <= ln:
            chunk = int.from_bytes(data[i:i + 8], "little")
            state[(i // 8) % 4] = diffuse(state[(i // 8) % 4] ^ chunk)
            i += 8
        if i < ln:
            chunk = int.from_bytes(data[i:] + b"\x00" * (8 - (ln - i)),
                                   "little")
            state[(i // 8) % 4] = diffuse(state[(i // 8) % 4] ^ chunk)
        h = diffuse(state[0] ^ state[1] ^ state[2] ^ state[3] ^ ln)
        return str(h)
    return _map_unique(_arr(col), one)


def community_id(src_ip, dst_ip, src_port, dst_port,
                 protocol: int = 6, seed: int = 0) -> pa.Array:
    """Community ID v1 (public spec, corelight/community-id-spec):
    sha1 over the ordered 5-tuple, base64, "1:" prefix.  Multi-column
    input — per-row by nature (one sha1 per flow tuple)."""
    import base64
    import hashlib as _hl
    import socket as _so
    import struct as _st

    def ipb(v):
        try:
            return _so.inet_aton(v)
        except OSError:
            try:
                return _so.inet_pton(_so.AF_INET6, v)
            except OSError:
                return None

    sips = pc.cast(_arr(src_ip), pa.string()).to_pylist()
    dips = pc.cast(_arr(dst_ip), pa.string()).to_pylist()
    sps = pc.cast(_arr(src_port), pa.int64()).to_pylist()
    dps = pc.cast(_arr(dst_port), pa.int64()).to_pylist()
    out = []
    for si, di, sp, dp in zip(sips, dips, sps, dps):
        sb, db = (ipb(si) if si else None), (ipb(di) if di else None)
        if sb is None or db is None or sp is None or dp is None:
            out.append(None)
            continue
        if (sb, sp) > (db, dp):
            sb, db, sp, dp = db, sb, dp, sp
        payload = (_st.pack("!H", seed) + sb + db
                   + _st.pack("!BBHH", protocol, 0, sp, dp))
        out.append("1:" + base64.b64encode(
            _hl.sha1(payload).digest()).decode())
    return pa.array(out, pa.string())


# tiny embedded multi-label public-suffix subset: the full Mozilla PSL
# is a data file the container lacks; these cover the common two-level
# suffixes, everything else falls back to the last label
_PSL2 = {"co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
         "com.au", "net.au", "org.au", "edu.au", "gov.au",
         "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
         "com.br", "net.br", "org.br", "gov.br",
         "co.in", "net.in", "org.in", "gen.in",
         "com.cn", "net.cn", "org.cn", "gov.cn",
         "co.kr", "or.kr", "com.mx", "com.ar", "com.tr",
         "co.za", "co.nz", "com.sg", "com.hk", "com.tw"}


def parse_etld(col, levels: int = 1) -> pa.Array:
    """parse_etld.cue approximation: eTLD(+levels) with an embedded
    common-suffix subset (documented divergence: niche PSL entries fall
    back to single-label TLD)."""
    def one(host):
        labels = host.lower().rstrip(".").split(".")
        if len(labels) < 2:
            return host
        two = ".".join(labels[-2:])
        etld_len = 2 if two in _PSL2 else 1
        take = min(len(labels), etld_len + levels)
        return ".".join(labels[-take:])
    return _map_unique(_arr(col), one)


def uuid_from_friendly_id(col) -> pa.Array:
    """base64url-packed 22-char friendly id -> canonical uuid string."""
    import base64

    def one(v):
        try:
            raw = base64.urlsafe_b64decode(v + "==")
            if len(raw) != 16:
                return None
            h = raw.hex()
            return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"
        except Exception:
            return None
    return _map_unique(_arr(col), one)


def set_semantic_meaning(col, *a, **k):
    """set_semantic_meaning.cue is a compile-time schema annotation in
    the reference; columnar schemas carry types already — no-op."""
    return col


_PROTO_DESC_CACHE: dict = {}


def _proto_schema(desc_file: str, message_type: str):
    """(schema, registry) from a compiled FileDescriptorSet path,
    cached per (path, type) — descriptor parsing runs once per worker,
    not per batch."""
    from vector_ray.functions.protobuf import schema_from_descriptor

    key = (str(desc_file), str(message_type))
    if key not in _PROTO_DESC_CACHE:
        with open(desc_file, "rb") as f:
            _PROTO_DESC_CACHE[key] = schema_from_descriptor(
                f.read(), str(message_type))
    return _PROTO_DESC_CACHE[key]


def parse_proto(col, desc_file, message_type) -> pa.Array:
    """parse_proto.cue semantics on the pure-Python wire codec
    (functions/protobuf.py): binary column + compiled descriptor-set
    path + fully-qualified message type -> struct rows; undecodable
    rows null (fallible)."""
    from vector_ray.functions.protobuf import decode_protobuf_rows

    schema, registry = _proto_schema(desc_file, message_type)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.large_binary())
    rows = decode_protobuf_rows(col, schema, registry)
    return pa.array(rows)


def encode_proto(col, desc_file, message_type) -> pa.Array:
    """encode_proto.cue: struct column -> wire bytes per row against
    the descriptor's message type; unencodable rows null."""
    from vector_ray.functions.protobuf import encode_message

    schema, registry = _proto_schema(desc_file, message_type)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for obj in col.to_pylist():
        if obj is None:
            out.append(None)
            continue
        try:
            out.append(encode_message(
                {k: v for k, v in obj.items() if v is not None},
                schema, registry))
        except (ValueError, TypeError, KeyError, struct.error):
            out.append(None)
    return pa.array(out, pa.large_binary())


def parse_dnstap(col, lowercase_hostnames=False) -> pa.Array:
    """parse_dnstap.cue: base64 dnstap frame -> nested event struct
    (pure-Python dnstap protobuf + RFC 1035 wire decode in
    functions/dnstap.py); undecodable rows null (fallible)."""
    from vector_ray.functions.dnstap import parse_dnstap_frame

    lc = bool(lowercase_hostnames)
    rows = []
    for v in col.to_pylist():
        if v is None:
            rows.append(None)
            continue
        try:
            if isinstance(v, (bytes, bytearray, memoryview)):
                frame = bytes(v)
            else:
                frame = base64.b64decode(str(v), validate=True)
            rows.append(parse_dnstap_frame(frame, lc))
        except (ValueError, IndexError, KeyError, OverflowError,
                binascii.Error, OSError):
            rows.append(None)
    return pa.array(rows)


def parse_ruby_hash(col) -> pa.Array:
    """parse_ruby_hash.cue: {"a" => "b"} literals -> JSON string->struct
    is not schema-stable per row; returns the JSON-converted STRING
    (pair with parse_json for fields).  Conversion per unique value."""
    def one(v):
        s = v.replace("=>", ":").replace("nil", "null")
        s = re.sub(r":(\w+)\s*:", r'"\1":', s)  # :sym keys
        try:
            json.loads(s)
            return s
        except ValueError:
            return None
    return _map_unique(_arr(col), one)


def parse_aws_cloudwatch_log_subscription_message(col) -> dict:
    """CloudWatch Logs subscription envelope (JSON): scalar fields +
    the log_events list as (id, timestamp, message) structs."""
    raw = pc.cast(_arr(col), pa.string()).to_pylist()
    owner, group, stream, mtype, filters, events = [], [], [], [], [], []
    for v in raw:
        try:
            d = json.loads(v)
        except (TypeError, ValueError):
            d = {}
        owner.append(d.get("owner"))
        group.append(d.get("logGroup"))
        stream.append(d.get("logStream"))
        mtype.append(d.get("messageType"))
        filters.append(d.get("subscriptionFilters") or [])
        events.append([
            {"id": str(e.get("id")), "timestamp": e.get("timestamp"),
             "message": e.get("message")}
            for e in (d.get("logEvents") or [])])
    ev_type = pa.list_(pa.struct([("id", pa.string()),
                                  ("timestamp", pa.int64()),
                                  ("message", pa.string())]))
    return {
        "owner": pa.array(owner, pa.string()),
        "log_group": pa.array(group, pa.string()),
        "log_stream": pa.array(stream, pa.string()),
        "message_type": pa.array(mtype, pa.string()),
        "subscription_filters": pa.array(filters, pa.list_(pa.string())),
        "log_events": pa.array(events, ev_type),
    }
