"""MaxMind DB (.mmdb) binary reader + fixture writer — pure Python.

Reference behavior: src/enrichment_tables/mmdb.rs and geoip.rs wrap the
maxminddb crate (IP -> record lookups with lookup-miss passthrough).
No mmdb library ships in this container, but the FILE FORMAT is
publicly specified (MaxMind DB File Format Specification 2.0), so this
module reads it directly:

    [search tree: node_count nodes x 2 records of record_size bits]
    [16 zero bytes  — data-section separator]
    [data section   — typed values, offsets pointer-addressable]
    [\\xab\\xcd\\xefMaxMind.com marker][metadata map]

Record resolution per spec: value < node_count -> next node;
value == node_count -> no data; value > node_count -> data at
(value - node_count - 16) into the data section.  IPv4 addresses in an
IPv6 database traverse 96 zero bits first (::a.b.c.d).

``build_mmdb`` writes the same format (24/28/32-bit records) from
(cidr -> record) pairs — used for test fixtures so reader correctness
is provable without shipping any MaxMind data, and longest-prefix
semantics come from leaf-splitting on insert exactly like routing
tables.
"""

from __future__ import annotations

import ipaddress
import struct
from typing import Any, Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
DATA_SEPARATOR_SIZE = 16

# control-byte types (spec §"Data types")
_T_EXTENDED, _T_POINTER, _T_UTF8, _T_DOUBLE = 0, 1, 2, 3
_T_BYTES, _T_UINT16, _T_UINT32, _T_MAP = 4, 5, 6, 7
# extended types: second byte + 7
_T_INT32, _T_UINT64, _T_UINT128, _T_ARRAY = 8, 9, 10, 11
_T_CONTAINER, _T_END, _T_BOOL, _T_FLOAT = 12, 13, 14, 15


# ---------------------------------------------------------------------------
# data-section decoder
# ---------------------------------------------------------------------------

def _read_size(buf: bytes, pos: int, ctrl: int) -> tuple[int, int]:
    size = ctrl & 0x1F
    if size < 29:
        return size, pos
    if size == 29:
        return 29 + buf[pos], pos + 1
    if size == 30:
        return 285 + int.from_bytes(buf[pos:pos + 2], "big"), pos + 2
    return 65821 + int.from_bytes(buf[pos:pos + 3], "big"), pos + 3


def decode_value(buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode one value at ``pos`` (offset within the data section /
    metadata section).  Pointers resolve against the same buffer."""
    ctrl = buf[pos]
    pos += 1
    typ = ctrl >> 5

    if typ == _T_POINTER:
        psz = (ctrl >> 3) & 0x3
        vbits = ctrl & 0x7
        if psz == 0:
            ptr = (vbits << 8) | buf[pos]
            pos += 1
        elif psz == 1:
            ptr = ((vbits << 16) | int.from_bytes(buf[pos:pos + 2], "big")
                   ) + 2048
            pos += 2
        elif psz == 2:
            ptr = ((vbits << 24) | int.from_bytes(buf[pos:pos + 3], "big")
                   ) + 526336
            pos += 3
        else:
            ptr = int.from_bytes(buf[pos:pos + 4], "big")
            pos += 4
        val, _ = decode_value(buf, ptr)
        return val, pos

    if typ == _T_EXTENDED:
        typ = buf[pos] + 7
        pos += 1
    size, pos = _read_size(buf, pos, ctrl)

    if typ == _T_UTF8:
        return buf[pos:pos + size].decode("utf-8"), pos + size
    if typ == _T_DOUBLE:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if typ == _T_FLOAT:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if typ == _T_BYTES:
        return bytes(buf[pos:pos + size]), pos + size
    if typ in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
        return int.from_bytes(buf[pos:pos + size], "big"), pos + size
    if typ == _T_INT32:
        v = int.from_bytes(buf[pos:pos + size], "big")
        if size == 4 and v >= 1 << 31:
            v -= 1 << 32
        return v, pos + size
    if typ == _T_MAP:
        out = {}
        for _ in range(size):
            k, pos = decode_value(buf, pos)
            out[k], pos = decode_value(buf, pos)
        return out, pos
    if typ == _T_ARRAY:
        items = []
        for _ in range(size):
            v, pos = decode_value(buf, pos)
            items.append(v)
        return items, pos
    if typ == _T_BOOL:
        return size != 0, pos  # value stored in the size bits
    raise ValueError(f"unsupported mmdb type {typ}")


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class MmdbReader:
    """Search-tree + data-section reader over an in-memory .mmdb image.

    Construction parses only the metadata (cheap); lookups memoize
    decoded records per data offset, so dense IP columns hitting the
    same networks decode each record once per reader instance.
    """

    def __init__(self, buf: bytes):
        self.buf = bytes(buf)
        idx = self.buf.rfind(METADATA_MARKER)
        if idx < 0:
            raise ValueError("not an mmdb file (metadata marker missing)")
        meta, _ = decode_value(self.buf[idx + len(METADATA_MARKER):], 0)
        self.metadata: dict = meta
        self.node_count = int(meta["node_count"])
        self.record_size = int(meta["record_size"])
        if self.record_size not in (24, 28, 32):
            raise ValueError(f"bad record_size {self.record_size}")
        self.ip_version = int(meta.get("ip_version", 6))
        self._node_bytes = self.record_size * 2 // 8
        self._tree_size = self.node_count * self._node_bytes
        self._data_start = self._tree_size + DATA_SEPARATOR_SIZE
        self._data = self.buf[self._data_start:idx]
        self._cache: dict[int, Any] = {}

    @classmethod
    def open(cls, path: str) -> "MmdbReader":
        with open(path, "rb") as f:
            return cls(f.read())

    def _record(self, node: int, right: bool) -> int:
        base = node * self._node_bytes
        b = self.buf
        if self.record_size == 24:
            off = base + (3 if right else 0)
            return int.from_bytes(b[off:off + 3], "big")
        if self.record_size == 28:
            if right:
                return ((b[base + 3] & 0x0F) << 24) | int.from_bytes(
                    b[base + 4:base + 7], "big")
            return ((b[base + 3] >> 4) << 24) | int.from_bytes(
                b[base:base + 3], "big")
        off = base + (4 if right else 0)
        return int.from_bytes(b[off:off + 4], "big")

    def _data_at(self, record: int):
        off = record - self.node_count - DATA_SEPARATOR_SIZE
        if off not in self._cache:
            self._cache[off], _ = decode_value(self._data, off)
        return self._cache[off]

    def lookup_bits(self, addr_int: int, nbits: int):
        node = 0
        for i in range(nbits - 1, -1, -1):
            node = self._record(node, bool((addr_int >> i) & 1))
            if node == self.node_count:
                return None
            if node > self.node_count:
                return self._data_at(node)
        return None

    def v4_spans(self) -> list[tuple[int, int, Any]]:
        """Flatten the search tree's IPv4-space leaves into DISJOINT
        (start_ip, end_ip, record) spans — the whole tree for a v4
        database, the ::/96 v4-mapped subtree for a v6 one.

        Trie leaves never overlap, so a sorted-starts + ends pair plus
        ``np.searchsorted`` answers longest-prefix lookups exactly;
        this is the vectorized scale path for dense IP columns (one
        tree walk per worker at init, C-speed lookups per batch)."""
        node = 0
        if self.ip_version != 4:
            for _ in range(96):
                node = self._record(node, False)
                if node == self.node_count:
                    return []
                if node > self.node_count:
                    # one record covers the entire v4-mapped region
                    return [(0, 0xFFFFFFFF, self._data_at(node))]
        spans: list[tuple[int, int, Any]] = []
        stack: list[tuple[int, int, int]] = [(node, 0, 0)]
        while stack:
            n, prefix, depth = stack.pop()
            for bit in (0, 1):
                r = self._record(n, bool(bit))
                p = (prefix << 1) | bit
                if r < self.node_count:
                    if depth + 1 < 32:
                        stack.append((r, p, depth + 1))
                elif r > self.node_count:
                    d = depth + 1
                    start = p << (32 - d)
                    spans.append((start, start + (1 << (32 - d)) - 1,
                                  self._data_at(r)))
        spans.sort(key=lambda sp: sp[0])
        return spans

    def lookup(self, ip: str):
        """Record dict for ``ip`` or None (lookup-miss passthrough,
        mmdb.rs/geoip.rs semantics).  IPv4 in an IPv6 db traverses the
        96 leading zero bits of ::a.b.c.d per spec."""
        try:
            addr = ipaddress.ip_address(ip)
        except ValueError:
            return None
        if addr.version == 4:
            if self.ip_version == 4:
                return self.lookup_bits(int(addr), 32)
            return self.lookup_bits(int(addr), 128)  # ::mapped, 96 zeros
        if self.ip_version == 4:
            return None
        return self.lookup_bits(int(addr), 128)


# ---------------------------------------------------------------------------
# writer (fixtures): trie with leaf-splitting -> longest-prefix-match
# ---------------------------------------------------------------------------

def _encode_value(v: Any, out: bytearray) -> None:
    def emit(typ: int, size: int, payload: bytes = b"") -> None:
        ext = typ >= 8
        t = _T_EXTENDED if ext else typ
        if size < 29:
            head = bytes([(t << 5) | size])
            szb = b""
        elif size - 29 < 256:
            head = bytes([(t << 5) | 29])
            szb = bytes([size - 29])
        else:
            raise ValueError("fixture writer caps sizes at 284")
        out.extend(head)
        if ext:
            out.append(typ - 7)
        out.extend(szb)
        out.extend(payload)

    if isinstance(v, bool):
        emit(_T_BOOL, 1 if v else 0)
    elif isinstance(v, str):
        b = v.encode()
        emit(_T_UTF8, len(b), b)
    elif isinstance(v, float):
        emit(_T_DOUBLE, 8, struct.pack(">d", v))
    elif isinstance(v, int):
        if v < 0:
            emit(_T_INT32, 4, struct.pack(">i", v))
        elif v < 1 << 16:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big") if v else b""
            emit(_T_UINT16, len(b), b)
        elif v < 1 << 32:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big")
            emit(_T_UINT32, len(b), b)
        else:
            b = v.to_bytes((v.bit_length() + 7) // 8, "big")
            emit(_T_UINT64, len(b), b)
    elif isinstance(v, (bytes, bytearray)):
        emit(_T_BYTES, len(v), bytes(v))
    elif isinstance(v, Mapping):
        emit(_T_MAP, len(v))
        for k, x in v.items():
            _encode_value(str(k), out)
            _encode_value(x, out)
    elif isinstance(v, (list, tuple)):
        emit(_T_ARRAY, len(v))
        for x in v:
            _encode_value(x, out)
    else:
        raise ValueError(f"unsupported fixture value {type(v)}")


class _Trie:
    __slots__ = ("left", "right", "data")

    def __init__(self):
        self.left = None    # None | _Trie | ("data", idx)
        self.right = None
        self.data = None


def build_mmdb(
    entries: Sequence[tuple[str, Mapping[str, Any]]],
    *,
    ip_version: int = 4,
    record_size: int = 24,
    database_type: str = "vector-ray-fixture",
    build_epoch: int = 1_700_000_000,
) -> bytes:
    """Serialize (cidr, record) pairs into a spec-conformant .mmdb
    image.  Longest prefix wins on overlap (leaf-splitting insert)."""
    nbits = 32 if ip_version == 4 else 128
    records: list[bytes] = []      # encoded data records
    offsets: list[int] = []
    data = bytearray()

    def data_index(rec: Mapping[str, Any]) -> int:
        buf = bytearray()
        _encode_value(dict(rec), buf)
        b = bytes(buf)
        try:
            return records.index(b)
        except ValueError:
            records.append(b)
            offsets.append(len(data))
            data.extend(b)
            return len(records) - 1

    root = _Trie()
    # shorter prefixes first so longer ones split their leaves
    parsed = sorted(
        ((ipaddress.ip_network(c, strict=False), r) for c, r in entries),
        key=lambda nr: nr[0].prefixlen)
    for net, rec in parsed:
        if (net.version == 4) != (ip_version == 4):
            raise ValueError("mixed IP versions in fixture")
        di = data_index(rec)
        addr = int(net.network_address)
        node = root
        for i in range(nbits - 1, nbits - 1 - net.prefixlen, -1):
            bit = (addr >> i) & 1
            side = "right" if bit else "left"
            child = getattr(node, side)
            last = i == nbits - net.prefixlen
            if last:
                setattr(node, side, ("data", di))
                break
            if child is None:
                child = _Trie()
                setattr(node, side, child)
            elif not isinstance(child, _Trie):
                # split: replicate the covering record into both halves
                split = _Trie()
                split.left = child
                split.right = child
                setattr(node, side, split)
                child = split
            node = child

    # number nodes (preorder) and emit records
    nodes: list[_Trie] = []

    def number(n: _Trie) -> None:
        nodes.append(n)
        for side in ("left", "right"):
            c = getattr(n, side)
            if isinstance(c, _Trie):
                number(c)

    number(root)
    node_no = {id(n): i for i, n in enumerate(nodes)}
    node_count = len(nodes)

    def record_value(child) -> int:
        if child is None:
            return node_count                      # no data
        if isinstance(child, _Trie):
            return node_no[id(child)]
        return node_count + DATA_SEPARATOR_SIZE + offsets[child[1]]

    tree = bytearray()
    for n in nodes:
        lv, rv = record_value(n.left), record_value(n.right)
        if record_size == 24:
            tree += lv.to_bytes(3, "big") + rv.to_bytes(3, "big")
        elif record_size == 28:
            tree += (lv & 0xFFFFFF).to_bytes(3, "big")
            tree.append(((lv >> 24) << 4) | (rv >> 24))
            tree += (rv & 0xFFFFFF).to_bytes(3, "big")
        elif record_size == 32:
            tree += lv.to_bytes(4, "big") + rv.to_bytes(4, "big")
        else:
            raise ValueError(f"bad record_size {record_size}")

    meta = bytearray()
    _encode_value({
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": build_epoch,
        "database_type": database_type,
        "description": {"en": "deterministic test fixture"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }, meta)

    return (bytes(tree) + b"\x00" * DATA_SEPARATOR_SIZE + bytes(data)
            + METADATA_MARKER + bytes(meta))


# ---------------------------------------------------------------------------
# Table protocol (find_table_row/rows) — src/enrichment_tables/mmdb.rs:87-135
# ---------------------------------------------------------------------------

def _dig(record: Mapping[str, Any] | None, path: str):
    """Resolve a dotted select path ('location.latitude') into a nested
    record, mirroring mmdb.rs's Value::remove on dotted fields."""
    cur: Any = record
    for part in path.split("."):
        if not isinstance(cur, Mapping):
            return None
        cur = cur.get(part)
    return cur


class MmdbTable:
    """Enrichment-table wrapper over :class:`MmdbReader`.

    Implements the same protocol as ``FileTable`` (find_table_row /
    find_table_rows with Equals conditions) so the topology layer and
    VRL's ``get_enrichment_table_record`` can treat an mmdb database as
    just another table — reference src/enrichment_tables/mmdb.rs:87-135:
    exactly ONE equality condition whose value is the IP; ``select``
    names dotted record paths.  Divergence (documented): selected dotted
    paths land as flat dotted-named fields, matching the columnar model,
    instead of re-nested objects.
    """

    def __init__(self, buf: bytes):
        self.buf = bytes(buf)
        self.reader = MmdbReader(self.buf)

    @classmethod
    def open(cls, path: str) -> "MmdbTable":
        with open(path, "rb") as f:
            return cls(f.read())

    def find_table_rows(
        self,
        conditions,
        *,
        select: Sequence[str] | None = None,
        case_sensitive: bool = True,
    ) -> list[dict[str, Any]]:
        conds = list(conditions)
        if len(conds) != 1:
            raise LookupError("mmdb tables take exactly one IP condition")
        c = conds[0]
        value = getattr(c, "value", c[1] if isinstance(c, tuple) else None)
        rec = self.reader.lookup(str(value))
        if rec is None:
            return []
        if select:
            return [{p: _dig(rec, p) for p in select}]
        return [dict(rec)]

    def find_table_row(self, conditions, *, select=None,
                       case_sensitive=True) -> dict:
        rows = self.find_table_rows(conditions, select=select,
                                    case_sensitive=case_sensitive)
        if not rows:
            raise LookupError("IP not found")
        return rows[0]

    # vectorized batch hook used by VRL's get_enrichment_table_record
    def lookup_batch(self, ips: Sequence[str | None],
                     select: Sequence[str] | None):
        """One memoized lookup per unique IP; returns (list of record
        dicts keyed by select path, found mask)."""
        memo: dict[str, Any] = {}
        recs, found = [], []
        for s in ips:
            if s is None:
                recs.append(None)
                found.append(False)
                continue
            if s not in memo:
                memo[s] = self.reader.lookup(s)
            r = memo[s]
            recs.append(r)
            found.append(r is not None)
        names = list(select) if select else sorted(
            {k for r in recs if r for k in r})
        cols = {p: [None if r is None else _dig(r, p) for r in recs]
                for p in names}
        return cols, found


# ---------------------------------------------------------------------------
# enrichment stage (mirrors enrich_cidr: broadcast once, map_batches)
# ---------------------------------------------------------------------------

class _MmdbIndex:
    """Per-worker vectorized lookup state: the search tree flattened
    once into disjoint IPv4 spans (`v4_spans`), selected fields
    pre-extracted per distinct record, batch lookups via a single
    ``np.searchsorted``.  IPv6 literal addresses (rare in log streams)
    fall back to the memoized tree walk."""

    def __init__(self, buf: bytes, select: Sequence[str]):
        self.reader = MmdbReader(buf)
        self.select = list(select)
        spans = self.reader.v4_spans()
        recs: list[Any] = []
        rec_no: dict[int, int] = {}   # id(record) -> index (records are
        span_rec = []                 # memoized per offset in the reader)
        for _s, _e, rec in spans:
            i = rec_no.get(id(rec))
            if i is None:
                i = rec_no[id(rec)] = len(recs)
                recs.append(rec)
            span_rec.append(i)
        self.starts = np.fromiter((s for s, _e, _r in spans), np.int64,
                                  len(spans))
        self.ends = np.fromiter((e for _s, e, _r in spans), np.int64,
                                len(spans))
        self.span_rec = np.asarray(span_rec, dtype=np.int64)
        # one extra null slot at the end for misses
        self.cols = {
            f: pa.array([None if (v := _dig(r, f)) is None else str(v)
                         for r in recs] + [None], pa.string())
            for f in self.select}
        self.miss = len(recs)

    def lookup_columns(self, col: pa.StringArray) -> dict[str, pa.Array]:
        n = len(col)
        ints = _ip4_ints(col)
        if len(self.starts):
            idx = np.searchsorted(self.starts, ints, side="right") - 1
            safe = np.maximum(idx, 0)
            hit = (idx >= 0) & (ints >= 0) & (ints <= self.ends[safe])
            rec_idx = np.where(hit, self.span_rec[safe], self.miss)
        else:
            rec_idx = np.full(n, self.miss, dtype=np.int64)
        take = pa.array(rec_idx)
        out = {f: self.cols[f].take(take) for f in self.select}
        # per-address tree walk only for IPv6 literals (rare in logs)
        v6_mask = pc.fill_null(pc.match_substring(col, ":"), False)
        if pc.any(v6_mask).as_py():
            v6_rows = np.flatnonzero(np.asarray(v6_mask)).tolist()
            strs = col.to_pylist()
            memo: dict[str, Any] = {}
            for f in self.select:
                vals = out[f].to_pylist()
                for i in v6_rows:
                    s = strs[i]
                    if s not in memo:
                        memo[s] = self.reader.lookup(s)
                    v = None if memo[s] is None else _dig(memo[s], f)
                    vals[i] = None if v is None else str(v)
                out[f] = pa.array(vals, pa.string())
        return out


# dotted quad with ipaddress-strict octets (no leading zeros, <= 255)
_OCT = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_IP4_RE = (rf"^(?P<a>{_OCT})\.(?P<b>{_OCT})\.(?P<c>{_OCT})"
           rf"\.(?P<d>{_OCT})$")


def _ip4_ints(col: pa.StringArray) -> np.ndarray:
    """IPv4 strings -> int64 (-1 for null/invalid/v6) in one vectorized
    RE2 pass — no per-row ipaddress parsing."""
    ex = pc.extract_regex(col, _IP4_RE)
    va = pc.is_valid(ex)
    valid = np.asarray(va)
    # children of null struct rows hold garbage ('' not null) — mask
    # through the struct validity before casting
    octs = [np.asarray(pc.cast(pc.if_else(va, ex.field(i), "0"), pa.int64()))
            for i in range(4)]
    ints = (octs[0] << 24) | (octs[1] << 16) | (octs[2] << 8) | octs[3]
    ints[~valid] = -1
    return ints


def enrich_mmdb(
    ds: Dataset,
    mmdb_bytes: bytes,
    *,
    ip_field: str,
    select: Sequence[str],
    prefix: str = "",
) -> Dataset:
    """Broadcast the mmdb image (`ray.put` once — never per batch);
    each worker flattens the search tree into a vectorized interval
    index at init (see :class:`_MmdbIndex`) and answers batches with a
    single ``searchsorted``.  ``select`` names dotted record paths to
    append as string columns; misses/unparseable IPs pass through with
    nulls (geoip.rs semantics)."""
    ref = ray.put(mmdb_bytes)
    state: dict[int, _MmdbIndex] = {}
    sel = list(select)

    def apply(t: pa.Table) -> pa.Table:
        ix = state.get(0)
        if ix is None:  # one index per worker process
            ix = state[0] = _MmdbIndex(ray.get(ref), sel)
        col = t[ip_field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols = ix.lookup_columns(pc.cast(col, pa.string()))
        for f in sel:
            t = t.append_column(prefix + f, cols[f])
        return t

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
