"""Encoder family — the sink-side codec surface (SURVEY §2.5).

Mirrors the encode side of lib/codecs (json, logfmt, csv serializers,
lib/codecs/src/encoding/format/): each function renders selected
columns of a batch into one serialized string column, the event-level
payload a text sink would emit.  Parquet remains the primary sink; these
cover the "switchable encoder" surface for text/json sinks.
"""

from __future__ import annotations

import json
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _cols(t: pa.Table, cols: Sequence[str] | None) -> list[str]:
    return list(cols) if cols else list(t.column_names)


def encode_logfmt(t: pa.Table, cols: Sequence[str] | None = None) -> pa.Array:
    """``key=value`` pairs, space-separated; values with spaces are
    double-quoted; null fields are omitted — the logfmt encoder's
    public behavior.  Vectorized: per-column string casts + quoting
    masks, one final element-wise join."""
    parts = []
    for c in _cols(t, cols):
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.cast(col, pa.string())
        needs_quote = pc.fill_null(
            pc.or_(pc.match_substring(s, " "), pc.match_substring(s, '"')), False
        )
        quoted = pc.binary_join_element_wise(
            pa.scalar('"'),
            pc.replace_substring(s, pattern='"', replacement='\\"'),
            pa.scalar('"'), pa.scalar(""),
        )
        val = pc.if_else(needs_quote, quoted, s)
        pair = pc.binary_join_element_wise(pa.scalar(c + "="), val, pa.scalar(""))
        # null value -> empty pair (dropped by the final join of non-empties)
        parts.append(pc.fill_null(pair, ""))
    joined = pc.binary_join_element_wise(*parts, pa.scalar(" "))
    # collapse runs of spaces left by omitted (null) fields
    joined = pc.replace_substring_regex(joined, pattern=" {2,}", replacement=" ")
    return pc.utf8_trim_whitespace(joined)


def encode_json(t: pa.Table, cols: Sequence[str] | None = None) -> pa.Array:
    """One compact JSON object per row (ndjson payload).  Null fields
    are omitted, keys serialize in column order — matching the json
    encoder's object output."""
    names = _cols(t, cols)
    pydata = {c: t[c].to_pylist() for c in names}
    n = t.num_rows
    out = []
    for i in range(n):
        obj = {c: pydata[c][i] for c in names if pydata[c][i] is not None}
        out.append(json.dumps(obj, separators=(",", ":"), default=str))
    return pa.array(out, pa.large_string())


def encode_csv(t: pa.Table, cols: Sequence[str] | None = None,
               *, delimiter: str = ",") -> pa.Array:
    """One CSV line per row (no header); fields containing the
    delimiter/quotes/newlines are quoted per RFC 4180."""
    names = _cols(t, cols)
    parts = []
    for c in names:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        needs_quote = pc.or_(
            pc.match_substring(s, delimiter),
            pc.or_(pc.match_substring(s, '"'), pc.match_substring(s, "\n")),
        )
        quoted = pc.binary_join_element_wise(
            pa.scalar('"'),
            pc.replace_substring(s, pattern='"', replacement='""'),
            pa.scalar('"'), pa.scalar(""),
        )
        parts.append(pc.if_else(needs_quote, quoted, s))
    return pc.binary_join_element_wise(*parts, pa.scalar(delimiter))
