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


def encode_logfmt(t: pa.Table, cols: Sequence[str] | None = None,
                  *, kv_sep: str = "=", field_sep: str = " ") -> pa.Array:
    """``key=value`` pairs, space-separated; values with spaces are
    double-quoted; null fields are omitted — the logfmt encoder's
    public behavior.  Vectorized: per-column string casts + quoting
    masks, one final element-wise join."""
    # values containing the configured delimiters must quote too —
    # with field_delimiter="," an unquoted value "a,b" reads back as
    # two fields (reference encoder quotes on delimiter occurrence);
    # default field_sep " " is already inside \s, default kv_sep "="
    # is unambiguous unquoted (logfmt splits on the FIRST kv_sep).
    import re as _re

    quote_pat = '[\\s"\\\\\x1e]'
    for sep in (kv_sep, field_sep):
        if sep not in ("=", " "):
            quote_pat += f"|{_re.escape(sep)}"
    parts = []
    for c in _cols(t, cols):
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.cast(col, pa.string())
        # quote whenever any escaping is involved, so decode is
        # unambiguous; escape ORDER matters (backslash first)
        needs_quote = pc.fill_null(pc.match_substring_regex(
            s, quote_pat), False)
        esc = pc.replace_substring(s, pattern="\\", replacement="\\\\")
        esc = pc.replace_substring(esc, pattern='"', replacement='\\"')
        # logfmt is line-oriented: embedded newlines must escape or the
        # record spans lines (line-count = record-count invariant)
        esc = pc.replace_substring(esc, pattern="\n", replacement="\\n")
        esc = pc.replace_substring(esc, pattern="\r", replacement="\\r")
        esc = pc.replace_substring(esc, pattern="\x1e", replacement="\\x1e")
        quoted = pc.binary_join_element_wise(
            pa.scalar('"'), esc, pa.scalar('"'), pa.scalar(""),
        )
        val = pc.if_else(needs_quote, quoted, s)
        pair = pc.binary_join_element_wise(pa.scalar(c + kv_sep), val,
                                           pa.scalar(""))
        # null value -> empty pair (dropped by the final join of non-empties)
        parts.append(pc.fill_null(pair, ""))
    # join on a sentinel (ASCII RS), collapse SEPARATOR runs left by
    # omitted (null) fields, then map separators to spaces — a plain
    # space-run collapse would corrupt quoted values containing runs of
    # spaces (found by the encode->parse roundtrip fuzz)
    joined = pc.binary_join_element_wise(*parts, pa.scalar("\x1e"))
    joined = pc.replace_substring_regex(joined, pattern="\x1e+",
                                        replacement="\x1e")
    joined = pc.replace_substring_regex(joined, pattern="^\x1e|\x1e$",
                                        replacement="")
    return pc.replace_substring(joined, pattern="\x1e",
                                replacement=field_sep)


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


def encode_text(t: pa.Table, message_col: str = "message") -> pa.Array:
    """Raw message passthrough (text serializer,
    lib/codecs/src/encoding/format/text.rs): the message column cast to
    string; null -> empty line."""
    col = t[message_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(pc.cast(col, pa.string()), "")


def encode_gelf(
    t: pa.Table,
    *,
    host_col: str = "host",
    message_col: str = "message",
    timestamp_col: str | None = "ts",
    level_col: str | None = None,
    extra_cols: Sequence[str] | None = None,
) -> pa.Array:
    """GELF 1.1 payloads (lib/codecs/src/encoding/format/gelf.rs):
    ``version``/``host``/``short_message`` mandatory (defaulted when the
    column is null/absent), ``timestamp`` as epoch seconds, any extra
    column serialized with the ``_``-prefix GELF requires for additional
    fields."""
    n = t.num_rows
    names = set(t.column_names)
    hosts = (t[host_col].to_pylist() if host_col in names else [None] * n)
    msgs = (t[message_col].to_pylist() if message_col in names else [None] * n)
    ts = None
    if timestamp_col and timestamp_col in names:
        col = t[timestamp_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            ts = [None if v is None else v / 1e6
                  for v in pc.cast(col, pa.int64()).to_pylist()]
        else:
            ts = col.to_pylist()
    levels = (t[level_col].to_pylist()
              if level_col and level_col in names else None)
    extras = {c: t[c].to_pylist()
              for c in (extra_cols or []) if c in names}
    out = []
    for i in range(n):
        obj = {
            "version": "1.1",
            "host": hosts[i] if hosts[i] is not None else "unknown",
            "short_message": msgs[i] if msgs[i] is not None else "",
        }
        if ts is not None and ts[i] is not None:
            obj["timestamp"] = ts[i]
        if levels is not None and levels[i] is not None:
            obj["level"] = levels[i]
        for c, vals in extras.items():
            if vals[i] is not None:
                obj["_" + c] = vals[i]
        out.append(json.dumps(obj, separators=(",", ":"), default=str))
    return pa.array(out, pa.large_string())


_SYSLOG_NILVALUE = "-"


def encode_syslog(
    t: pa.Table,
    *,
    rfc: str = "rfc5424",
    facility: int = 1,
    severity_col: str | None = None,
    default_severity: int = 6,
    host_col: str = "host",
    app_col: str | None = None,
    ts_col: str = "ts",
    message_col: str = "message",
) -> pa.Array:
    """Syslog lines (lib/codecs/src/encoding/format/syslog.rs):
    ``pri = facility*8 + severity``; RFC 5424 emits
    ``<pri>1 TS HOST APP - - - MSG`` (RFC3339 timestamps), RFC 3164
    ``<pri>MMM dd HH:MM:SS HOST APP: MSG``.  Vectorized (string kernels
    only)."""
    n = t.num_rows
    names = set(t.column_names)

    def scol(name, default):
        if name and name in names:
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.fill_null(pc.cast(col, pa.string()), default)
        return pa.array([default] * n, pa.string())

    if severity_col and severity_col in names:
        sev = pc.fill_null(pc.cast(t[severity_col], pa.int64()),
                           default_severity)
    else:
        sev = pa.array([default_severity] * n, pa.int64())
    pri = pc.cast(pc.add(sev, facility * 8), pa.string())
    host = scol(host_col, _SYSLOG_NILVALUE)
    app = scol(app_col, _SYSLOG_NILVALUE)
    msg = scol(message_col, "")
    tscol = t[ts_col] if ts_col in names else None
    if tscol is not None and isinstance(tscol, pa.ChunkedArray):
        tscol = tscol.combine_chunks()
    if rfc in ("rfc5424", "5424"):
        if tscol is not None and pa.types.is_timestamp(tscol.type):
            stamp = pc.strftime(tscol, format="%Y-%m-%dT%H:%M:%S.%fZ")
        else:
            stamp = scol(ts_col, _SYSLOG_NILVALUE)
        return pc.binary_join_element_wise(
            "<", pri, ">1 ", stamp, " ", host, " ", app, " - - - ", msg, "")
    if rfc in ("rfc3164", "3164"):
        if tscol is not None and pa.types.is_timestamp(tscol.type):
            stamp = pc.strftime(tscol, format="%b %d %H:%M:%S")
        else:
            stamp = scol(ts_col, "")
        return pc.binary_join_element_wise(
            "<", pri, ">", stamp, " ", host, " ", app, ": ", msg, "")
    raise ValueError(f"unknown syslog rfc {rfc!r}")


def _cef_escape_header(col):
    s = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    return pc.replace_substring(s, pattern="|", replacement="\\|")


def _cef_escape_ext(col):
    s = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    return pc.replace_substring(s, pattern="=", replacement="\\=")


def encode_cef(
    t: pa.Table,
    *,
    device_vendor: str,
    device_product: str,
    device_version: str,
    event_class_id_col: str,
    name_col: str,
    severity_col: str,
    extension_cols: Sequence[str] = (),
) -> pa.Array:
    """CEF lines (lib/codecs/src/encoding/format/cef.rs): literal header
    ``CEF:0|vendor|product|version|class|name|severity|`` with ``|``/
    ``\\`` escaped, extensions as ``k=v`` with ``=``/``\\`` escaped.
    Vectorized string kernels; null extensions omit the pair."""
    def s(col_name):
        col = t[col_name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.fill_null(pc.cast(col, pa.string()), "")

    head = pc.binary_join_element_wise(
        "CEF:0|" + device_vendor.replace("\\", "\\\\").replace("|", "\\|")
        + "|" + device_product.replace("\\", "\\\\").replace("|", "\\|")
        + "|" + device_version.replace("\\", "\\\\").replace("|", "\\|") + "|",
        _cef_escape_header(s(event_class_id_col)), "|",
        _cef_escape_header(s(name_col)), "|",
        _cef_escape_header(s(severity_col)), "|", "")
    parts = []
    for c in extension_cols:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sc = pc.cast(col, pa.string())
        pair = pc.binary_join_element_wise(
            pa.scalar(c + "="), _cef_escape_ext(sc), pa.scalar(""))
        parts.append(pc.fill_null(pair, ""))
    if not parts:
        return head
    ext = pc.binary_join_element_wise(*parts, pa.scalar(" ")) if len(parts) > 1 \
        else parts[0]
    ext = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(ext, pattern=" {2,}", replacement=" "))
    return pc.binary_join_element_wise(head, ext, "")


def encode_avro(t: pa.Table, *, schema, cols=None) -> pa.Array:
    """Avro binary-datum serializer (lib/codecs/src/encoding/format/
    avro.rs: one `to_avro_datum` per event against a JSON schema) on
    the pure-Python codec in functions/avro.py."""
    from vector_ray.functions.avro import encode_avro_rows

    return encode_avro_rows(t, schema, cols=cols)


def encode_protobuf(t: pa.Table, *, schema=None, desc_file=None,
                    message_type=None, cols=None) -> pa.Array:
    """Protobuf serializer (lib/codecs/src/encoding/format/protobuf.rs)
    on the pure-Python wire codec in functions/protobuf.py — one
    length-free wire message per row (framing is the sink's job, as in
    the reference).  Accepts either an inline ``schema`` dict
    (field name -> (number, type[, "repeated"])) or a compiled
    ``desc_file`` + ``message_type`` pair, mirroring the reference's
    ``desc_file``/``message_type`` encoder options."""
    from vector_ray.functions.protobuf import encode_protobuf_rows

    registry = None
    if schema is None:
        if desc_file is None or message_type is None:
            raise ValueError(
                "encode_protobuf needs schema= or desc_file=+message_type=")
        from vector_ray.functions.stdlib_extra import _proto_schema
        schema, registry = _proto_schema(desc_file, message_type)
    return encode_protobuf_rows(t, schema, cols=cols, registry=registry)
