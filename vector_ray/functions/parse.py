"""Vectorized parse kernels — the VRL stdlib subset over Arrow columns.

Each function mirrors the corresponding VRL function registered by the
``remap`` transform (reference: src/transforms/remap.rs:208-212 pulls in
``vrl::stdlib::all()``; function list under
website/cue/reference/remap/functions/).  All kernels are
column-in/columns-out and avoid per-row Python except where a true JSON
parse is required (and then only over the masked row subset).
"""

from __future__ import annotations

import json
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.functions.grok import grok_to_regex


def parse_regex(col: pa.ChunkedArray | pa.Array, pattern: str) -> pa.StructArray:
    """VRL ``parse_regex``: named-group extraction; null where no match.

    Returns a struct array with one field per named group.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.extract_regex(col, pattern=pattern)


def parse_grok(col, pattern: str, extra: dict[str, str] | None = None) -> pa.StructArray:
    """VRL ``parse_grok``: grok pattern → regex → extract."""
    return parse_regex(col, grok_to_regex(pattern, extra))


def parse_json_fields(
    col,
    keys: Sequence[str],
    types: dict[str, pa.DataType] | None = None,
    *,
    with_masks: bool = False,
):
    """VRL ``parse_json`` restricted to scalar top-level keys.

    Parses only rows that syntactically can be JSON objects (first
    non-space char '{'); other rows yield nulls.  Per-row ``json.loads``
    runs only over that masked subset (C-accelerated; the non-JSON rows
    never pay it).  Dotted keys descend into nested objects.

    With ``with_masks=True`` returns ``(fields, attempted, ok)`` where
    ``attempted`` marks rows that looked like JSON objects and ``ok``
    marks rows that actually parsed to a dict — the inputs to remap's
    error policy.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    types = types or {}
    n = len(col)
    starts = pc.starts_with(pc.utf8_ltrim_whitespace(col), "{")
    mask = pc.fill_null(starts, False).to_numpy(zero_copy_only=False)
    ok = np.zeros(n, dtype=bool)
    idx = np.nonzero(mask)[0]
    outs: dict[str, list] = {k: [None] * n for k in keys}
    if len(idx):
        texts = col.take(pa.array(idx)).to_pylist()
        key_paths = [(k, k.split(".")) for k in keys]
        loads = json.loads
        for i, t in zip(idx, texts):
            try:
                obj = loads(t)
            except (ValueError, TypeError):
                continue
            if not isinstance(obj, dict):
                continue
            ok[int(i)] = True
            for k, path in key_paths:
                v = obj
                for p in path:
                    if isinstance(v, dict):
                        v = v.get(p)
                    else:
                        v = None
                        break
                if isinstance(v, (dict, list)):
                    v = json.dumps(v, separators=(",", ":"))
                outs[k][int(i)] = v
    fields = {
        k: pa.array(vals, type=types.get(k, pa.string()))
        if k in types
        else pa.array([None if v is None else str(v) for v in vals], pa.string())
        for k, vals in outs.items()
    }
    if with_masks:
        return fields, pa.array(mask), pa.array(ok)
    return fields


def parse_key_value(
    col, keys: Sequence[str], *, sep: str = "=", word: str = r"[^\s]*"
) -> dict[str, pa.Array]:
    """VRL ``parse_key_value`` / ``parse_logfmt`` for known keys.

    One vectorized regex extraction per requested key — quoted values
    (``key="two words"``, escapes ``\\"``/``\\\\`` resolved) or a bare
    word.  Unknown keys are simply absent (null).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = {}
    for k in keys:
        # quoted alternative FIRST so `key="a b"` never half-matches as
        # the bare word `"a` (found by the encode->parse roundtrip
        # fuzz); one raw capture, then vectorized unquote+unescape
        pat = (rf"(?:^|\s){k}{sep}"
               rf"(?P<v>\"(?:[^\"\\]|\\.)*\"|{word})")
        s = pc.extract_regex(col, pattern=pat)
        raw = pc.struct_field(s, "v")
        is_quoted = pc.fill_null(pc.match_substring_regex(
            raw, r'^"(?:[^"\\]|\\.)*"$'), False)
        inner = pc.replace_substring_regex(raw, pattern=r'^"|"$',
                                           replacement="")
        # one-pass unescape via sentinel: \\ must not re-combine with a
        # following n/r/" (e.g. `a\\nb` is backslash+n, not newline)
        inner = pc.replace_substring(inner, pattern="\\\\",
                                     replacement="\x00")
        inner = pc.replace_substring(inner, pattern='\\"', replacement='"')
        inner = pc.replace_substring(inner, pattern="\\n", replacement="\n")
        inner = pc.replace_substring(inner, pattern="\\r", replacement="\r")
        inner = pc.replace_substring(inner, pattern="\\x1e",
                                     replacement="\x1e")
        inner = pc.replace_substring(inner, pattern="\x00",
                                     replacement="\\")
        out[k] = pc.if_else(is_quoted, inner, raw)
    return out


def parse_timestamp(col, fmt: str = "%Y-%m-%dT%H:%M:%S", unit: str = "us") -> pa.Array:
    """VRL ``parse_timestamp``: strptime; null on parse failure."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.strptime(col, format=fmt, unit=unit, error_is_null=True)


def parse_int(col) -> pa.Array:
    """VRL ``parse_int``/``to_int`` with null-on-error semantics.
    Non-string inputs follow VRL's documented coercions: integers pass
    through, floats truncate toward zero, booleans → 0/1, timestamps →
    unix seconds (vrl stdlib to_int.md)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t):
        return pc.cast(col, pa.int64())
    if pa.types.is_floating(t):
        return pc.cast(pc.trunc(col), pa.int64())
    if pa.types.is_boolean(t):
        return pc.cast(col, pa.int64())
    if pa.types.is_timestamp(t):
        # Normalize unit first: raw int64 payload depends on s/ms/us/ns.
        us = pc.cast(pc.cast(col, pa.timestamp("us", tz=t.tz)), pa.int64())
        return pc.divide(us, 1_000_000)
    # cast errors → null: pre-mask with a digits regex
    ok = pc.fill_null(pc.match_substring_regex(col, r"^[+-]?\d+$"), False)
    masked = pc.if_else(ok, col, pa.scalar(None, pa.string()))
    return pc.cast(masked, pa.int64())


def parse_float(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_floating(t):
        return pc.cast(col, pa.float64())
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return pc.cast(col, pa.float64())
    if pa.types.is_timestamp(t):
        # VRL to_float on timestamps: fractional unix seconds.
        us = pc.cast(pc.cast(col, pa.timestamp("us", tz=t.tz)), pa.int64())
        return pc.divide(pc.cast(us, pa.float64()), 1_000_000.0)
    ok = pc.fill_null(pc.match_substring_regex(col, r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), False)
    masked = pc.if_else(ok, col, pa.scalar(None, pa.string()))
    return pc.cast(masked, pa.float64())


def extract_regex_masked(col, pattern: str, mask) -> dict[str, pa.Array]:
    """``parse_regex`` restricted to rows where ``mask`` is true.

    The regex runs only over the candidate subset (``take`` + extract),
    and results scatter back to full length via a null-index ``take`` —
    rows outside the mask (and non-matching candidates) are null.  On
    mixed corpora where a shape covers a fraction of rows this cuts the
    kernel cost proportionally.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = mask.to_numpy(zero_copy_only=False) if not isinstance(mask, np.ndarray) else mask
    idx = np.nonzero(m)[0]
    n = len(col)
    if len(idx) == 0:
        return {}, pa.array(np.zeros(n, dtype=bool))
    sub = col.take(pa.array(idx))
    g = pc.extract_regex(sub, pattern=pattern)
    ok_sub = pc.is_valid(g)
    # scatter: pos[i] = rank of i among candidates, null elsewhere
    pos = np.cumsum(m) - 1
    pos_idx = pa.array(pos, pa.int64(), mask=~m)
    fields = {}
    for field in g.type:
        fields[field.name] = pc.struct_field(g, field.name).take(pos_idx)
    ok_full = np.zeros(n, dtype=bool)
    ok_full[idx] = ok_sub.to_numpy(zero_copy_only=False)
    return fields, pa.array(ok_full)


def discover_kv_keys(col, *, sep: str = "=", sample: int = 1000,
                     max_keys: int = 64) -> list[str]:
    """Key discovery for schema-less ``parse_key_value`` calls: scan a
    bounded SAMPLE of rows for ``word=`` keys (first-seen order) so the
    vectorized per-key extraction can run without a caller-supplied
    key list.  Columnar model note: the output schema is the sampled
    key set — keys first appearing outside the sample are absent
    (documented divergence from row-wise VRL's per-event maps)."""
    import re as _re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = min(len(col), sample)
    rx = _re.compile(rf"(?:^|\s)([A-Za-z_][\w.]*){_re.escape(sep)}")
    seen: dict[str, None] = {}
    for v in col.slice(0, n).to_pylist():
        if v is None:
            continue
        for m in rx.finditer(v):
            if m.group(1) not in seen:
                seen[m.group(1)] = None
                if len(seen) >= max_keys:
                    return list(seen)
    return list(seen)


def discover_json_keys(col, *, sample: int = 1000,
                       max_keys: int = 64) -> list[str]:
    """Top-level key discovery for schema-less ``parse_json`` calls
    (same bounded-sample model as ``discover_kv_keys``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = min(len(col), sample)
    seen: dict[str, None] = {}
    for v in col.slice(0, n).to_pylist():
        if v is None or not v.lstrip().startswith("{"):
            continue
        try:
            obj = json.loads(v)
        except (ValueError, TypeError):
            continue
        if isinstance(obj, dict):
            for k in obj:
                if k not in seen:
                    seen[k] = None
                    if len(seen) >= max_keys:
                        return list(seen)
    return list(seen)
