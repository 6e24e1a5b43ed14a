"""CIDR-interval enrichment table — the geoip/mmdb analogue.

Reference: src/enrichment_tables/geoip.rs wraps a MaxMind mmdb reader
(IP → city/ISP/connection-type records).  No mmdb library ships in
this container, so the rebuild provides the same *enrichment surface*
over an open CSV shape: rows of ``(cidr, field, field, ...)`` compile
into a sorted interval index over integer IPs; lookups are vectorized
``np.searchsorted`` per batch (longest-prefix match wins, like routing
tables / MaxMind semantics).

The stage mirrors ``enrichment/stage.py``: a broadcast table
(``ray.put`` once) + a ``map_batches`` lookup — never a shuffle join.
"""

from __future__ import annotations

import csv
import ipaddress
from typing import Any, Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _ip_to_int(ip: str) -> int | None:
    try:
        return int(ipaddress.IPv4Address(ip))
    except (ipaddress.AddressValueError, ValueError):
        return None


class CidrTable:
    """Sorted-interval index over IPv4 CIDR blocks.

    Overlapping blocks resolve to the LONGEST prefix (the most specific
    block), matching routing-table semantics.  Build once, broadcast.
    """

    def __init__(self, rows: Sequence[Mapping[str, Any]], *, cidr_col: str = "cidr"):
        # expand to (start, end, prefix_len, row) and sort by (start,
        # -prefix) so the most specific block at an address sorts first
        spans = []
        self.columns: list[str] = []
        for row in rows:
            net = ipaddress.IPv4Network(row[cidr_col], strict=False)
            data = {k: v for k, v in row.items() if k != cidr_col}
            if not self.columns:
                self.columns = list(data)
            spans.append((int(net.network_address),
                          int(net.broadcast_address),
                          net.prefixlen, data))
        # flatten into disjoint intervals with an O(n log n) stack sweep.
        # CIDR blocks either NEST or are DISJOINT (never partial
        # overlap), so sorting by (start, prefixlen) puts parents before
        # their children and a stack of open blocks always has the most
        # specific cover on top.
        spans.sort(key=lambda sp: (sp[0], sp[2]))
        starts: list[int] = []
        winners: list = []

        def emit(bound: int, win) -> None:
            if winners and starts[-1] == bound:
                winners[-1] = win
                return
            if not winners or winners[-1] is not win:
                starts.append(bound)
                winners.append(win)

        stack: list[tuple[int, Any]] = []  # (end, data)
        for s, e, _p, d in spans:
            while stack and stack[-1][0] < s:
                closed_end = stack.pop()[0]
                emit(closed_end + 1, stack[-1][1] if stack else None)
            emit(s, d)
            stack.append((e, d))
        while stack:
            closed_end = stack.pop()[0]
            emit(closed_end + 1, stack[-1][1] if stack else None)
        self._starts = np.asarray(starts, dtype=np.int64)
        self._winners = winners

    @classmethod
    def from_csv(cls, path: str, *, cidr_col: str = "cidr",
                 delimiter: str = ",") -> "CidrTable":
        with open(path, newline="") as f:
            reader = csv.DictReader(f, delimiter=delimiter)
            return cls(list(reader), cidr_col=cidr_col)

    def lookup_ints(self, ips: np.ndarray) -> list:
        """row-dict (or None) per integer IP — one searchsorted call."""
        if len(self._starts) == 0:
            return [None] * len(ips)
        idx = np.searchsorted(self._starts, ips, side="right") - 1
        out = []
        for i, ip in zip(idx.tolist(), ips.tolist()):
            out.append(self._winners[i] if i >= 0 else None)
        return out

    def lookup(self, ip: str):
        v = _ip_to_int(ip)
        if v is None:
            return None
        return self.lookup_ints(np.asarray([v], dtype=np.int64))[0]


def enrich_cidr(
    ds: Dataset,
    table: CidrTable,
    *,
    ip_field: str,
    select: Sequence[str] | None = None,
    prefix: str = "",
) -> Dataset:
    """Broadcast-join the CIDR table onto ``ip_field``.

    Adds one column per selected table field (``prefix`` + name);
    unmatched / unparseable IPs get nulls — geoip.rs lookup-miss
    semantics (the event passes through unenriched).
    """
    fields = list(select) if select else list(table.columns)
    ref = ray.put(table)

    def apply(t: pa.Table) -> pa.Table:
        tbl: CidrTable = ray.get(ref)
        col = t[ip_field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        strs = pc.cast(col, pa.string()).to_pylist()
        ints = np.asarray(
            [(-1 if (v := None if s is None else _ip_to_int(s)) is None else v)
             for s in strs], dtype=np.int64)
        rows = tbl.lookup_ints(ints)
        valid = ints >= 0
        for f in fields:
            vals = [None if (r is None or not ok) else r.get(f)
                    for r, ok in zip(rows, valid.tolist())]
            t = t.append_column(prefix + f, pa.array(vals, pa.string()))
        return t

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
