"""VRL-subset program compiler — config-borne remap programs.

Vector's remap transform takes a VRL program string (``source``,
src/transforms/remap.rs:53-158) executed per event.  This compiles the
practically-used subset into a VECTORIZED batch program compatible with
``stages.remap`` (``fn(table) -> (table, err_mask, err_msg)``):

Statements (newline/;-separated, ``#`` comments)::

    . = parse_grok!(.text, "<grok pattern>")   # merge struct into columns
    . = parse_key_value!(.text, "k1", "k2")    # ditto
    .lvl = downcase(.level)                    # assignment from expr
    .latency = to_int!(.latency_ms)            # fallible: error -> row error
    .tag = "static"                            # literal assignment
    .combined = upcase(.role)                  # function of a path
    del(.tmp)                                  # drop a column
    abort_if(.level == null)                   # explicit per-row error
    abort                                      # unconditional (drop all)
    .lat = to_int(.latency_ms) ?? 0            # error-coalescing default

Error semantics match remap: a row where any ``!``-marked (fallible)
call fails carries the error mask; remap's policy then keeps the
original / drops / reroutes (remap.rs:556-633).  Non-fallible calls
null out failures silently (VRL's error-coalescing ``??`` analogue).

Functions exposed: parse_grok, parse_regex, parse_key_value,
parse_json (scalar keys), parse_timestamp, parse_int/to_int,
parse_float/to_float, to_string, upcase, downcase, strip_whitespace,
replace, truncate, md5, sha2, encode_base64, decode_base64,
format_timestamp, ip_aton, parse_duration, parse_bytes.
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.functions import codecs, datetime_fns, ip, strings
from vector_ray.functions import parse as parse_fns
from vector_ray.functions import parse_logs
from vector_ray.functions.grok import grok_to_regex


class VrlError(ValueError):
    pass


# name -> (fn(col, *args) -> (values, ok_mask|None))
def _wrap_simple(fn):
    def run(col, *args):
        return fn(col, *args), None
    return run


def _wrap_fallible(fn):
    """fn returns values with nulls on failure; ok = value valid OR input null."""
    def run(col, *args):
        vals = fn(col, *args)
        ok = pc.or_(pc.is_valid(vals), pc.is_null(col))
        return vals, ok
    return run


def _parse_grok_struct(col, pattern):
    rx = grok_to_regex(pattern)
    g = pc.extract_regex(col if not isinstance(col, pa.ChunkedArray) else col.combine_chunks(),
                         pattern=rx)
    return g, pc.is_valid(g)


def _parse_regex_struct(col, pattern):
    g = parse_fns.parse_regex(col, pattern)
    return g, pc.is_valid(g)


def _parse_kv_struct(col, *keys):
    fields = parse_fns.parse_key_value(col, list(keys))
    arrays = [fields[k] for k in keys]
    st = pa.StructArray.from_arrays(arrays, names=list(keys))
    return st, None


def _parse_json_struct(col, *keys):
    fields, attempted, ok = parse_fns.parse_json_fields(col, list(keys), with_masks=True)
    st = pa.StructArray.from_arrays([fields[k] for k in keys], names=list(keys))
    full_ok = pc.or_(ok, pc.invert(attempted))  # non-JSON rows are not errors
    return st, full_ok


FUNCTIONS: dict[str, Callable] = {
    "parse_grok": _parse_grok_struct,
    "parse_regex": _parse_regex_struct,
    "parse_key_value": _parse_kv_struct,
    "parse_logfmt": _parse_kv_struct,
    "parse_json": _parse_json_struct,
    "parse_timestamp": _wrap_fallible(parse_fns.parse_timestamp),
    "parse_int": _wrap_fallible(parse_fns.parse_int),
    "to_int": _wrap_fallible(parse_fns.parse_int),
    "parse_float": _wrap_fallible(parse_fns.parse_float),
    "to_float": _wrap_fallible(parse_fns.parse_float),
    "parse_duration": _wrap_fallible(parse_logs.parse_duration),
    "parse_bytes": _wrap_fallible(parse_logs.parse_bytes),
    "to_string": _wrap_simple(lambda c: pc.cast(c, pa.string())),
    "upcase": _wrap_simple(strings.upcase),
    "downcase": _wrap_simple(strings.downcase),
    "strip_whitespace": _wrap_simple(strings.strip_whitespace),
    "replace": _wrap_simple(strings.replace),
    "truncate": _wrap_simple(strings.truncate),
    "md5": _wrap_simple(codecs.md5),
    "sha2": _wrap_simple(codecs.sha2),
    "encode_base64": _wrap_simple(codecs.encode_base64),
    "decode_base64": _wrap_fallible(codecs.decode_base64),
    "format_timestamp": _wrap_simple(datetime_fns.format_timestamp),
    "ip_aton": _wrap_fallible(ip.ip_aton),
}

_STMT_RE = re.compile(
    r"""^\s*(?:
        (?P<del>del\(\s*\.(?P<delpath>[\w.]+)\s*\))
      | (?P<abort>abort_if\((?P<abortcond>.*)\)|abort)
      | (?P<target>\.|\.[\w.]+)\s*=\s*(?P<expr>.+)
    )\s*$""",
    re.X,
)

_CALL_RE = re.compile(r"^(?P<name>[A-Za-z_][\w]*)(?P<bang>!?)\((?P<args>.*)\)$")


def _split_args(s: str) -> list[str]:
    out, depth, cur, in_str, q = [], 0, "", False, ""
    for ch in s:
        if in_str:
            cur += ch
            if ch == q:
                in_str = False
            continue
        if ch in "\"'":
            in_str, q = True, ch
            cur += ch
        elif ch == "(":
            depth += 1
            cur += ch
        elif ch == ")":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            out.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


def _eval_arg(src: str, batch: pa.Table):
    src = src.strip()
    if src.startswith("."):
        parts = src[1:].split(".")
        name = parts[0]
        if name not in batch.column_names:
            return pa.nulls(batch.num_rows, pa.string())
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for part in parts[1:]:  # struct descent, matching conditions._Field
            try:
                col = pc.struct_field(col, part)
            except (pa.ArrowInvalid, KeyError):
                return pa.nulls(batch.num_rows, pa.string())
        return col
    if (src.startswith('"') and src.endswith('"')) or (
        src.startswith("'") and src.endswith("'")
    ):
        return src[1:-1]
    if re.fullmatch(r"-?\d+", src):
        return int(src)
    if re.fullmatch(r"-?\d+\.\d+", src):
        return float(src)
    if src == "true":
        return True
    if src == "false":
        return False
    if src == "null":
        return None
    raise VrlError(f"unsupported argument {src!r}")


class VrlProgram:
    """Compiled program usable as stages.remap's ``program``."""

    def __init__(self, source: str):
        self.source = source
        self.statements = []
        for raw_line in source.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line:
                continue
            for stmt in line.split(";"):
                stmt = stmt.strip()
                if not stmt:
                    continue
                guard = None
                gm = re.match(r"^if\s*\((?P<cond>.*)\)\s*\{(?P<body>.*)\}\s*$", stmt)
                if gm:
                    from vector_ray.conditions import compile_condition

                    guard = compile_condition(gm.group("cond"))
                    stmt = gm.group("body").strip()
                m = _STMT_RE.match(stmt)
                if not m:
                    raise VrlError(f"cannot parse statement {stmt!r}")
                if m.group("del"):
                    if guard is not None:
                        raise VrlError("if-guard supports assignments only")
                    self.statements.append(("del", m.group("delpath")))
                elif m.group("abort"):
                    from vector_ray.conditions import ALWAYS_PASS, compile_condition

                    cond_src = m.group("abortcond")
                    self.statements.append(
                        ("abort",
                         ALWAYS_PASS if cond_src is None
                         else compile_condition(cond_src))
                    )
                else:
                    expr = m.group("expr").strip()
                    call = _CALL_RE.match(expr)
                    if call and call.group("name") not in FUNCTIONS:
                        raise VrlError(f"unknown function {call.group('name')!r}")
                    self.statements.append(
                        ("assign", m.group("target"), expr, guard))

    def __call__(self, batch: pa.Table):
        n = batch.num_rows
        err = pa.array([False] * n)
        for stmt in self.statements:
            if stmt[0] == "del":
                if stmt[1] in batch.column_names:
                    batch = batch.drop_columns([stmt[1]])
                continue
            if stmt[0] == "abort":
                err = pc.or_(err, stmt[1](batch))
                continue
            _, target, expr, guard = stmt
            fallback_src = None
            if "??" in expr:
                expr, _, fb = expr.partition("??")
                expr, fallback_src = expr.strip(), fb.strip()
            call = _CALL_RE.match(expr)
            if call:
                name = call.group("name")
                if name not in FUNCTIONS:
                    raise VrlError(f"unknown function {name!r}")
                args = [_eval_arg(a, batch) for a in _split_args(call.group("args"))]
                vals, ok = FUNCTIONS[name](*args)
                if call.group("bang") and ok is not None:
                    if isinstance(ok, pa.ChunkedArray):
                        ok = ok.combine_chunks()
                    stmt_err = pc.fill_null(pc.invert(ok), False)
                    if guard is not None:
                        # rows the guard excludes never ran the statement
                        stmt_err = pc.and_(stmt_err, guard(batch))
                    err = pc.or_(err, stmt_err)
            else:
                vals = _eval_arg(expr, batch)
                if not isinstance(vals, (pa.Array, pa.ChunkedArray)):
                    vals = pa.array([vals] * n)
            if fallback_src is not None and not pa.types.is_struct(
                vals.type if isinstance(vals, (pa.Array, pa.ChunkedArray)) else pa.string()
            ):
                fb = _eval_arg(fallback_src, batch)
                if isinstance(fb, (pa.Array, pa.ChunkedArray)):
                    vals = pc.if_else(pc.is_valid(vals), vals, fb)
                else:
                    vals = pc.fill_null(vals, fb)
            if guard is not None:
                gmask = guard(batch)
                if target != "." and target[1:] in batch.column_names:
                    existing = batch[target[1:]]
                    if isinstance(existing, pa.ChunkedArray):
                        existing = existing.combine_chunks()
                else:
                    existing = pa.nulls(
                        n,
                        vals.type if isinstance(vals, (pa.Array, pa.ChunkedArray))
                        else pa.string(),
                    )
                if not isinstance(vals, (pa.Array, pa.ChunkedArray)):
                    vals = pa.array([vals] * n)
                if pa.types.is_struct(vals.type):
                    raise VrlError("if-guard does not support `. =` struct merge")
                vals = pc.if_else(gmask, pc.cast(vals, existing.type)
                                  if existing.type != vals.type else vals, existing)
            batch = _assign(batch, target, vals)
        msg = pc.if_else(err, pa.scalar("vrl program error", pa.string()),
                         pa.scalar(None, pa.string()))
        return batch, err, msg


def _assign(batch: pa.Table, target: str, vals) -> pa.Table:
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if target == ".":
        if not pa.types.is_struct(vals.type):
            raise VrlError(". = <expr> requires a struct-returning expr")
        for f in vals.type:
            col = pc.struct_field(vals, f.name)
            batch = _set(batch, f.name, col)
        return batch
    name = target[1:]
    if "." in name:
        raise VrlError("nested assignment targets not supported; use flat columns")
    return _set(batch, name, vals)


def _set(batch: pa.Table, name: str, col) -> pa.Table:
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name, col)
    return batch.append_column(name, col)


def compile_vrl(source: str) -> VrlProgram:
    return VrlProgram(source)
