"""File (CSV) enrichment table — Vector's ``enrichment_tables.file``.

Reference semantics (src/enrichment_tables/file.rs):
- CSV loaded wholly into memory at build time (load_file :184-235);
- per-column type coercion via a schema map — ``string, integer,
  float, boolean, date|<fmt>, timestamp|<fmt>`` (:73-180);
- a hash index over the index-field values → row-id postings
  (index_data :370-408); lookups may be ``Case::Sensitive`` or
  ``Case::Insensitive`` (row_equals :292-316);
- lookup conditions are ``Equals{field,value}`` and
  ``BetweenDates{field,from,to}`` AND-combined
  (lib/enrichment/src/lib.rs:20-29);
- ``find_table_row`` errors unless exactly one row matches;
  ``find_table_rows`` returns all matches
  (lib/enrichment/src/lib.rs:39-68).

The registry mirrors ``TableRegistry`` (lib/enrichment/src/tables.rs:213-247):
tables are loaded once at config build and read-only during a run.
The index hash is Python's tuple hash rather than seahash — the hash
function is an implementation detail; the observable semantics
(equality + case folding) are what is preserved.
"""

from __future__ import annotations

import bisect
import csv
from dataclasses import dataclass
from datetime import datetime, date
from typing import Any, Iterable, Mapping, Sequence


@dataclass(frozen=True)
class Equals:
    field: str
    value: Any


@dataclass(frozen=True)
class BetweenDates:
    field: str
    from_date: datetime
    to_date: datetime


Condition = Any  # Equals | BetweenDates


def _coerce(value: str, spec: str):
    """Type coercion per the schema map (file.rs:73-180)."""
    if value == "":
        return None
    kind, _, fmt = spec.partition("|")
    if kind == "string":
        return value
    if kind == "integer":
        return int(value)
    if kind == "float":
        return float(value)
    if kind in ("bool", "boolean"):
        return value.strip().lower() in ("true", "t", "yes", "y", "1")
    if kind == "date":
        return datetime.strptime(value, fmt or "%Y-%m-%d").date()
    if kind == "timestamp":
        return datetime.strptime(value, fmt or "%Y-%m-%dT%H:%M:%S")
    raise ValueError(f"unknown schema type {spec!r}")


def _fold(v, case_sensitive: bool):
    if not case_sensitive and isinstance(v, str):
        return v.lower()
    return v


class FileTable:
    """In-memory CSV table with case-aware hash indexes."""

    def __init__(self, path: str, schema: Mapping[str, str] | None = None,
                 *, delimiter: str = ","):
        self.path = path
        with open(path, newline="") as f:
            reader = csv.reader(f, delimiter=delimiter)
            header = next(reader)
            raw_rows = list(reader)
        schema = dict(schema or {})
        self.columns = header
        self.rows: list[dict[str, Any]] = []
        for raw in raw_rows:
            row = {}
            for col, val in zip(header, raw):
                spec = schema.get(col, "string")
                row[col] = _coerce(val, spec)
            self.rows.append(row)
        # (fields, case_sensitive) -> {key tuple: [row ids]}
        self._indexes: dict[tuple[tuple[str, ...], bool], dict[tuple, list[int]]] = {}

    # -- indexing (file.rs:370-408 index_data / add_index :546-556) --
    def add_index(self, fields: Sequence[str], *, case_sensitive: bool = True) -> None:
        key = (tuple(fields), case_sensitive)
        if key in self._indexes:
            return
        idx: dict[tuple, list[int]] = {}
        for i, row in enumerate(self.rows):
            k = tuple(_fold(row.get(f), case_sensitive) for f in fields)
            idx.setdefault(k, []).append(i)
        self._indexes[key] = idx

    # -- lookup (lib/enrichment/src/lib.rs:39-68) --
    def find_table_rows(
        self,
        conditions: Iterable[Condition],
        *,
        select: Sequence[str] | None = None,
        case_sensitive: bool = True,
    ) -> list[dict[str, Any]]:
        conds = list(conditions)
        eqs = [c for c in conds if isinstance(c, Equals)]
        dates = [c for c in conds if isinstance(c, BetweenDates)]
        if eqs:
            fields = tuple(c.field for c in eqs)
            ikey = (fields, case_sensitive)
            if ikey not in self._indexes:
                self.add_index(fields, case_sensitive=case_sensitive)
            k = tuple(_fold(c.value, case_sensitive) for c in eqs)
            candidates = self._indexes[ikey].get(k, [])
        else:
            candidates = range(len(self.rows))
        out = []
        for i in candidates:
            row = self.rows[i]
            ok = True
            for c in dates:
                v = row.get(c.field)
                if isinstance(v, date) and not isinstance(v, datetime):
                    v = datetime(v.year, v.month, v.day)
                # inclusive [from, to]
                if v is None or not (c.from_date <= v <= c.to_date):
                    ok = False
                    break
            if ok:
                out.append({k: row[k] for k in (select or self.columns)})
        return out

    def find_table_row(self, conditions, *, select=None, case_sensitive=True) -> dict:
        rows = self.find_table_rows(conditions, select=select, case_sensitive=case_sensitive)
        if len(rows) != 1:
            raise LookupError(f"expected exactly 1 row, found {len(rows)}")
        return rows[0]


class TableRegistry:
    """Read-only registry of enrichment tables (tables.rs:213-247)."""

    def __init__(self, tables: Mapping[str, FileTable] | None = None):
        self._tables = dict(tables or {})

    def add(self, name: str, table: FileTable) -> None:
        self._tables[name] = table

    def __getitem__(self, name: str) -> FileTable:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)
