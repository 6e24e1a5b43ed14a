"""VRL-subset program compiler — config-borne remap programs.

Vector's remap transform executes a VRL program per event
(src/transforms/remap.rs:53-158; exec semantics :556-633).  This
compiles the practically-used subset into a VECTORIZED batch program
compatible with ``stages.remap`` (``fn(table) -> (table, err_mask,
err_msg)``) — statements run over whole Arrow batches under an
active-row MASK, so control flow costs one boolean kernel, not a
Python branch per row.

Supported language (round 2 — full recursive-descent parser)::

    . = parse_grok!(.text, "<grok pattern>")   # merge struct into columns
    .lvl = downcase(.level)                    # assignment from expr
    .lat = to_int!(.latency_ms)                # fallible: error -> row error
    .lat = to_int(.latency_ms) ?? 0            # ?? is an expression
    .attrs.env = "prod"                        # nested-path targets
    .score = .a * 2 + 1                        # arithmetic, string +
    tmp = upcase(.role); .role = tmp           # local variables
    if .lvl == "error" {                       # if / else if / else
        .sev = "high"
    } else if starts_with(.lvl, "warn") {
        .sev = "med"
    } else {
        .sev = "low"
    }
    del(.tmp)                                  # drop column (under if: null)
    abort_if(.level == null)                   # explicit per-row error
    abort                                      # error every active row
    .tags = filter(.tags) -> |i, v| { v != "x" }    # enumeration closures
    .tags = map_values(.tags) -> |v| { upcase(v) }  # (arrays run vectorized
    .obj  = map_keys(.obj) -> |k| { downcase(k) }   #  in flattened space;
    for_each(.obj) -> |k, v| { acc = acc + k }      #  objects per field)

Error semantics match remap: a row where any ``!``-marked (fallible)
call fails carries the error mask; remap's policy then keeps the
original / drops / reroutes (remap.rs:556-633).  Non-fallible calls
null out failures silently; ``expr ?? fallback`` replaces errored/null
rows with the fallback and clears their error.  Conditions evaluate
null -> false (src/conditions/vrl.rs:115-127).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.functions import codecs, datetime_fns, ip, strings
from vector_ray.functions import parse as parse_fns
from vector_ray.functions import parse_logs
from vector_ray.functions.grok import grok_to_regex


class VrlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# function registry: name -> fn(col, *args) -> (values, ok_mask|None)
# ---------------------------------------------------------------------------

def _wrap_simple(fn):
    def run(col, *args, **kwargs):
        return fn(col, *args, **kwargs), None
    return run


def _wrap_fallible(fn):
    """fn returns values with nulls on failure; ok = value valid OR input null."""
    def run(col, *args, **kwargs):
        vals = fn(col, *args, **kwargs)
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
    ks = list(keys)
    if not ks:
        # schema-less call: discover keys from a bounded sample
        # (parse_key_value.cue returns every key; the columnar schema
        # comes from the sampled key set)
        ks = parse_fns.discover_kv_keys(col)
        if not ks:
            n = len(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col)
            return pa.nulls(n, pa.struct([])), None
    fields = parse_fns.parse_key_value(col, ks)
    arrays = [fields[k] for k in ks]
    st = pa.StructArray.from_arrays(arrays, names=ks)
    return st, None


def _parse_json_struct(col, *keys):
    ks = list(keys)
    if not ks:
        # schema-less call: discover top-level keys from a sample
        ks = parse_fns.discover_json_keys(col)
        if not ks:
            n = len(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col)
            return pa.nulls(n, pa.struct([])), None
    fields, attempted, ok = parse_fns.parse_json_fields(col, ks,
                                                        with_masks=True)
    st = pa.StructArray.from_arrays([fields[k] for k in ks], names=ks)
    full_ok = pc.or_(ok, pc.invert(attempted))  # non-JSON rows are not errors
    return st, full_ok


def _dict_struct(fn, valid_field: str):
    """wrap a parse_logs-style dict-returning parser into a
    struct-returning VRL function; ok = the anchor field extracted."""
    def run(col, *args):
        fields = fn(col, *args)
        names = list(fields)
        arrs = []
        for k in names:
            v = fields[k]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            arrs.append(v)
        st = pa.StructArray.from_arrays(arrs, names=names)
        ok = pc.is_valid(fields[valid_field])
        return st, ok
    return run


def _parse_groks_struct(col, patterns, *more):
    """parse_groks: list-of-patterns first-match-wins (VRL passes the
    pattern array as one argument)."""
    if isinstance(patterns, (pa.Array, pa.ChunkedArray)):
        pats = _const_list(patterns)
    elif isinstance(patterns, (list, tuple)):
        pats = list(patterns)
    else:
        pats = [patterns, *more]
    fields, ok = parse_logs.parse_groks(col, [str(p) for p in pats])
    names = list(fields)
    st = pa.StructArray.from_arrays(
        [fields[k] if not isinstance(fields[k], pa.ChunkedArray)
         else fields[k].combine_chunks() for k in names], names=names)
    return st, ok


FUNCTIONS: dict[str, Callable] = {
    "parse_grok": _parse_grok_struct,
    "parse_groks": _parse_groks_struct,
    "parse_syslog": _dict_struct(parse_logs.parse_syslog, "host"),
    "parse_common_log": _dict_struct(parse_logs.parse_common_log, "host"),
    "parse_apache_log": _dict_struct(parse_logs.parse_apache_log, "host"),
    "parse_nginx_log": _dict_struct(parse_logs.parse_nginx_log, "client"),
    "parse_cef": _dict_struct(parse_logs.parse_cef, "deviceVendor"),
    "parse_user_agent": _dict_struct(parse_logs.parse_user_agent,
                                     "device_category"),
    "parse_klog": _dict_struct(parse_logs.parse_klog, "file"),
    "parse_glog": _dict_struct(parse_logs.parse_glog, "file"),
    "parse_linux_authorization": _dict_struct(
        parse_logs.parse_linux_authorization, "host"),
    "parse_aws_vpc_flow_log": _dict_struct(
        parse_logs.parse_aws_vpc_flow_log, "account_id"),
    "parse_aws_alb_log": _dict_struct(parse_logs.parse_aws_alb_log, "elb"),
    "parse_csv": _wrap_simple(parse_logs.parse_csv),
    "parse_tokens": _wrap_simple(parse_logs.parse_tokens),
    "parse_url": _dict_struct(parse_logs.parse_url, "host"),
    "parse_xml": _wrap_fallible(parse_logs.parse_xml),
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
    # ---- round-2 stdlib breadth: the vectorized kernels already in
    # functions/ registered for program use (website/cue/reference/
    # remap/functions inventory names) ----
    "capitalize": _wrap_simple(strings.capitalize),
    "slice": _wrap_simple(strings.slice_),
    "split": _wrap_simple(strings.split),
    "join": _wrap_simple(strings.join),
    "strip_ansi_escape_codes": _wrap_simple(strings.strip_ansi_escape_codes),
    "snakecase": _wrap_simple(strings.snakecase),
    "kebabcase": _wrap_simple(strings.kebabcase),
    "camelcase": _wrap_simple(strings.camelcase),
    "redact": _wrap_simple(strings.redact),
    "sieve": _wrap_simple(strings.sieve),
    "sha1": _wrap_simple(codecs.sha1),
    "sha3": _wrap_simple(codecs.sha3),
    "hmac": _wrap_simple(codecs.hmac_sha256),
    "uuid_v5": _wrap_simple(codecs.uuid_v5),
    "encode_base16": _wrap_simple(codecs.encode_base16),
    "decode_base16": _wrap_fallible(codecs.decode_base16),
    "encode_percent": _wrap_simple(codecs.encode_percent),
    "decode_percent": _wrap_fallible(codecs.decode_percent),
    "encode_gzip": _wrap_simple(codecs.encode_gzip),
    "decode_gzip": _wrap_fallible(codecs.decode_gzip),
    "encode_zlib": _wrap_simple(codecs.encode_zlib),
    "decode_zlib": _wrap_fallible(codecs.decode_zlib),
    "to_unix_timestamp": _wrap_simple(datetime_fns.to_unix_timestamp),
    "from_unix_timestamp": _wrap_fallible(datetime_fns.from_unix_timestamp),
    "round": _wrap_simple(datetime_fns.round_num),
    "abs": _wrap_simple(datetime_fns.abs_num),
    "mod": _wrap_simple(datetime_fns.mod_num),
    "ip_ntoa": _wrap_fallible(ip.ip_ntoa),
    "ip_cidr_contains": _wrap_simple(ip.ip_cidr_contains),
    "ip_subnet": _wrap_fallible(ip.ip_subnet),
    "ip_to_ipv6": _wrap_fallible(ip.ip_to_ipv6),
    "ipv6_to_ipv4": _wrap_fallible(ip.ipv6_to_ipv4),
    "ip_pton": _wrap_fallible(ip.ip_pton),
    "ip_ntop": _wrap_fallible(ip.ip_ntop),
    "encode_punycode": _wrap_fallible(codecs.encode_punycode),
    "decode_punycode": _wrap_fallible(codecs.decode_punycode),
    "decode_mime_q": _wrap_fallible(codecs.decode_mime_q),
    "encode_charset": _wrap_fallible(codecs.encode_charset),
    "decode_charset": _wrap_fallible(codecs.decode_charset),
}

# collection kernels operate on list columns — same registry, usable
# once a program holds a list value (e.g. from split())
from vector_ray.functions import collections as _collections  # noqa: E402

FUNCTIONS.update({
    "flatten": _wrap_simple(_collections.flatten_list),
    "compact": _wrap_simple(_collections.compact_list),
    "unique": _wrap_simple(_collections.unique_list),
    "chunks": _wrap_simple(_collections.chunks_list),
})

# ---- round-2 stdlib breadth, batch 2: type predicates/assertions,
# collection kernels, syslog tables, formatting, misc (functions/
# stdlib_extra.py; names per website/cue/reference/remap/functions) ----
from vector_ray.functions import stdlib_extra as _extra  # noqa: E402


def _const_list(x):
    """A constant array-literal argument arrives as an n-length Arrow
    list column; collapse it back to one Python list."""
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if isinstance(x, pa.Array) and (
            pa.types.is_list(x.type) or pa.types.is_large_list(x.type)):
        return x[0].as_py() if len(x) else []
    return x


FUNCTIONS.update({
    # type predicates
    "is_integer": _wrap_simple(_extra.is_integer),
    "is_float": _wrap_simple(_extra.is_float),
    "is_boolean": _wrap_simple(_extra.is_boolean),
    "is_array": _wrap_simple(_extra.is_array),
    "is_object": _wrap_simple(_extra.is_object),
    "is_timestamp": _wrap_simple(_extra.is_timestamp),
    "is_regex": _wrap_simple(_extra.is_regex),
    "is_empty": _wrap_simple(_extra.is_empty),
    "is_nullish": _wrap_simple(_extra.is_nullish),
    "is_ipv4": _wrap_simple(_extra.is_ipv4),
    "is_ipv6": _wrap_simple(_extra.is_ipv6),
    "is_json": _wrap_simple(_extra.is_json),
    # type assertions (fallible: whole column errors on type mismatch)
    "bool": _extra.assert_bool,
    "int": _extra.assert_int,
    "float": _extra.assert_float,
    "string": _extra.assert_string,
    "timestamp": _extra.assert_timestamp,
    "array": _extra.assert_array,
    "object": _extra.assert_object,
    "to_bool": _wrap_fallible(_extra.to_bool),
    # collections
    "keys": _wrap_simple(_extra.keys_),
    "values": _wrap_simple(_extra.values_),
    "merge": _wrap_simple(_extra.merge_objects),
    "push": _wrap_simple(lambda c, item: _extra.push_(c, item)),
    "append": _wrap_simple(_extra.append_),
    "get": _wrap_simple(lambda c, p: _extra.get_(c, _const_list(p))),
    "remove": _wrap_simple(lambda c, p: _extra.remove_(c, _const_list(p))),
    "unflatten": _wrap_simple(_extra.unflatten_),
    "zip": _wrap_simple(_extra.zip_),
    # strings / matching
    "find": _wrap_simple(_extra.find_),
    "contains_all": _wrap_simple(
        lambda c, subs: _extra.contains_all(c, _const_list(subs))),
    "match_any": _wrap_simple(
        lambda c, pats: _extra.match_any(c, _const_list(pats))),
    "match_array": _wrap_simple(_extra.match_array),
    "pascalcase": _wrap_simple(_extra.pascalcase),
    "screamingsnakecase": _wrap_simple(_extra.screamingsnakecase),
    "format_int": _wrap_simple(_extra.format_int),
    "format_number": _wrap_simple(_extra.format_number),
    # syslog tables
    "to_syslog_level": _wrap_fallible(_extra.to_syslog_level),
    "to_syslog_severity": _wrap_fallible(_extra.to_syslog_severity),
    "to_syslog_facility": _wrap_fallible(_extra.to_syslog_facility),
    # misc
    "crc": _wrap_simple(_extra.crc_),
    "now": lambda *a: (_extra.now_(), None),
    "uuid_v4": _wrap_simple(_extra.uuid_v4),
    "get_hostname": lambda *a: (_extra.get_hostname(), None),
    "get_timezone_name": lambda *a: (_extra.get_timezone_name(), None),
    "get_env_var": lambda name: (_extra.get_env_var(name), None),
    "log": _wrap_simple(_extra.log_),
    "random_int": _wrap_simple(_extra.random_int),
    "random_float": _wrap_simple(_extra.random_float),
    "random_bool": _wrap_simple(_extra.random_bool),
    # batch 4: crypto / assertions / regex-uuid-bytes misc
    "encrypt": _wrap_fallible(_extra.encrypt_),
    "decrypt": _wrap_fallible(_extra.decrypt_),
    "assert": _extra.assert_,
    "assert_eq": _extra.assert_eq,
    "to_regex": _wrap_simple(_extra.to_regex),
    "uuid_v7": _wrap_simple(_extra.uuid_v7),
    "random_bytes": _wrap_simple(_extra.random_bytes),
    "object_from_array": _wrap_simple(_extra.object_from_array),
    "encode_snappy": _wrap_simple(_extra.encode_snappy),
    "decode_snappy": _wrap_simple(_extra.decode_snappy),
    "encode_zstd": _wrap_simple(_extra.encode_zstd),
    "decode_zstd": _wrap_simple(_extra.decode_zstd),
    # batch 5: inventory tail
    "ceil": _wrap_simple(_extra.ceil_),
    "floor": _wrap_simple(_extra.floor_),
    "set": _wrap_simple(lambda c, p, v: _extra.set_path(c, _const_list(p), v)),
    "seahash": _wrap_simple(_extra.seahash_),
    "community_id": _wrap_fallible(_extra.community_id),
    "parse_etld": _wrap_simple(_extra.parse_etld),
    "uuid_from_friendly_id": _wrap_fallible(_extra.uuid_from_friendly_id),
    "set_semantic_meaning": _wrap_simple(_extra.set_semantic_meaning),
    "encode_proto": _wrap_simple(_extra.encode_proto),
    "parse_proto": _wrap_simple(_extra.parse_proto),
    "parse_dnstap": _wrap_simple(_extra.parse_dnstap),
    "parse_ruby_hash": _wrap_fallible(_extra.parse_ruby_hash),
    "parse_regex_all": _wrap_simple(
        lambda c, p: _parse_regex_all(c, p)),
    "parse_aws_cloudwatch_log_subscription_message": _dict_struct(
        _extra.parse_aws_cloudwatch_log_subscription_message, "owner"),
    "parse_influxdb": _dict_struct(
        lambda c, **kw: parse_logs.parse_influxdb(c, **kw), "measurement"),
    "parse_query_string": None,  # replaced below (struct builder)
})


def _parse_regex_all(col, pattern) -> pa.Array:
    """parse_regex_all.cue: every match's capture groups as a list of
    strings per match (list<list<string>>); quote-grammar-free, but
    multi-match extraction is per-row by nature."""
    if isinstance(pattern, tuple) and pattern and pattern[0] == "__regex__":
        pattern = pattern[1]
    creg = re.compile(str(pattern))
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in pc.cast(col, pa.string()).to_pylist():
        if v is None:
            out.append(None)
            continue
        out.append([list(m.groups()) if creg.groups else [m.group(0)]
                    for m in creg.finditer(v)])
    return pa.array(out, pa.list_(pa.list_(pa.string())))


def _parse_query_string_struct(col, keys):
    ks = [str(k) for k in _const_list(keys)]
    fields = parse_logs.parse_query_string(col, ks)
    return pa.StructArray.from_arrays(
        [fields[k] if not isinstance(fields[k], pa.ChunkedArray)
         else fields[k].combine_chunks() for k in ks], names=ks), None


FUNCTIONS["parse_query_string"] = _parse_query_string_struct

# VRL calls with no column argument that still need the batch length:
# a null column of the right length is prepended at call time
_NEEDS_N = {"uuid_v4", "uuid_v7", "random_int", "random_float",
            "random_bool", "random_bytes"}

# boolean/value helpers usable inside expressions (condition parity,
# src/conditions/vrl.rs + website/cue/reference/remap/functions)
_PRED_FUNCS = {"exists", "is_null", "is_string", "contains", "starts_with",
               "ends_with", "match", "includes", "length", "strlen",
               "is_log", "is_metric", "is_trace", "match_datadog_query"}

# enumeration functions taking a closure (`fn(x) -> |k, v| { ... }`);
# VRL closure semantics per website/cue/reference/remap/functions/
# {map_values,map_keys,filter,for_each}.cue
_CLOSURE_FUNCS = {"map_values", "map_keys", "filter", "for_each",
                  "replace_with"}

# functions needing the execution context (enrichment registry rides on
# the compiled program: module state does not cross Ray worker
# boundaries, so tables are captured at compile time and serialized
# with the program — a broadcast-small side, like the enrich stage)
_CTX_FUNCS = {"get_enrichment_table_record", "find_enrichment_table_records"}

# whole-event encoders: `encode_json(.)` serializes the event — in the
# columnar model "." IS the batch, so these receive ctx.batch (or a
# struct column when called on one)
_ENCODE_FUNCS = {"encode_json", "encode_key_value", "encode_logfmt",
                 "tag_types_externally"}

# program-scoped secret store (get_secret.cue / set_secret.cue /
# remove_secret.cue); secrets ride on the compiled program like tables
_SECRET_FUNCS = {"get_secret", "set_secret", "remove_secret"}


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""(?:
        (?P<ws>[ \t\r]+)
      | (?P<comment>\#[^\n]*)
      | (?P<nl>\n)
      | (?P<op>\?\?|\|\||&&|==|!=|<=|>=|->|[<>!=(){},;+\-*/\[\]:|])
      | (?P<regex>r"(?:[^"\\]|\\.)*")
      | (?P<dstr>"(?:[^"\\]|\\.)*")
      | (?P<sstr>'(?:[^'\\]|\\.)*')
      | (?P<num>\d+\.\d+|\d+)
      | (?P<path>\.(?:[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.X,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise VrlError(f"bad token at offset {pos} in VRL source: "
                           f"{src[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("nl", "op", "regex", "dstr", "sstr", "num", "path", "word"):
            v = m.group(kind)
            if v is not None:
                out.append(("sep", v) if kind == "nl" else (kind, v))
                break
    out.append(("eof", ""))
    return out


_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
                "'": "'", "0": "\0", "{": "{", "}": "}"}


def _unquote(s: str) -> str:
    """Unescape a quoted VRL string literal on the str itself with the
    reference escape set (\\n \\t \\r \\\\ \\" \\' \\0 \\u{...} —
    lib/vrl string-literal unescaping).  The previous
    encode().decode('unicode_escape') reinterpreted UTF-8 bytes as
    latin-1, mojibaking every non-ASCII literal ("café" -> 'cafÃ©')."""
    s = s[1:-1]
    if "\\" not in s:
        return s
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == "u" and i + 2 < n and s[i + 2] == "{":
            j = s.find("}", i + 3)
            if j != -1:
                try:
                    out.append(chr(int(s[i + 3:j], 16)))
                    i = j + 1
                    continue
                except ValueError:
                    pass
        if e in _STR_ESCAPES:
            out.append(_STR_ESCAPES[e])
        else:  # unknown escape: keep verbatim (VRL would reject at
            out.append(c)  # compile; verbatim is the lossless choice)
            out.append(e)
        i += 2
    return "".join(out)


def _unquote_regex(s: str) -> str:
    """r"..." literals have raw-string semantics: only \\" unescapes
    (the one sequence needed to embed a quote); every other backslash
    passes through untouched to the regex engine — running the string
    unescaper here collapsed \\\\ and warned on \\d."""
    return s[1:-1].replace('\\"', '"')


# ---------------------------------------------------------------------------
# AST: tuples ("kind", ...)
#   expr: ("lit", v) ("path", [parts]) ("var", name)
#         ("call", name, bang, [args]) ("bin", op, l, r) ("not", x)
#         ("neg", x) ("coalesce", l, r)
#   stmt: ("assign", target, expr)   target = ("path", parts) | ("var", name)
#         ("merge", expr)            # . = <struct expr>
#         ("del", parts) ("abort", cond_expr|None) ("if", [(cond, stmts)...], else_stmts)
# ---------------------------------------------------------------------------

_CMP_OPS = {"==", "!=", "<", "<=", ">", ">="}


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        if self.i < len(self.toks) - 1:
            self.i += 1
        return t

    def skip_seps(self):
        while self.peek()[0] == "sep" or self.peek() == ("op", ";"):
            self.next()

    def expect(self, kind: str, val: str | None = None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise VrlError(f"expected {val or kind}, got {t[1]!r}")
        return t

    # ---- statements ----

    def parse_program(self) -> list:
        stmts = []
        self.skip_seps()
        while self.peek()[0] != "eof":
            stmts.append(self.parse_stmt())
            self.skip_seps()
        return stmts

    def parse_block(self) -> list:
        self.expect("op", "{")
        stmts = []
        self.skip_seps()
        while self.peek() != ("op", "}"):
            if self.peek()[0] == "eof":
                raise VrlError("unterminated block")
            stmts.append(self.parse_stmt())
            self.skip_seps()
        self.next()  # }
        return stmts

    def parse_stmt(self):
        kind, val = self.peek()
        if kind == "word" and val == "if":
            return self.parse_if()
        if kind == "word" and val == "del":
            self.next()
            self.expect("op", "(")
            p = self.expect("path")
            self.expect("op", ")")
            return ("del", [x for x in p[1][1:].split(".") if x])
        if kind == "word" and val == "abort_if":
            self.next()
            self.expect("op", "(")
            cond = self.parse_expr()
            self.expect("op", ")")
            return ("abort", cond)
        if kind == "word" and val == "abort":
            self.next()
            return ("abort", None)
        if kind == "path":
            nxt = self.peek(1)
            if nxt == ("op", "="):
                target = self.next()[1]
                self.next()  # =
                expr = self.parse_expr()
                parts = [x for x in target[1:].split(".") if x]
                if not parts:
                    return ("merge", expr)
                return ("assign", ("path", parts), expr)
        if kind == "word" and self.peek(1) == ("op", "=") and val not in (
            "if", "else", "del", "abort", "abort_if", "true", "false", "null"
        ):
            name = self.next()[1]
            self.next()  # =
            return ("assign", ("var", name), self.parse_expr())
        # bare expression statement (closure bodies' value position,
        # side-effecting calls like for_each(...))
        return ("expr", self.parse_expr())

    def parse_if(self):
        self.expect("word", "if")
        # optional parens around the condition (both VRL styles appear)
        cond = self.parse_expr()
        self.skip_seps_inline()
        then = self.parse_block()
        arms = [(cond, then)]
        else_stmts: list = []
        self.skip_seps_inline()
        while self.peek() == ("word", "else"):
            self.next()
            self.skip_seps_inline()
            if self.peek() == ("word", "if"):
                self.next()
                c2 = self.parse_expr()
                self.skip_seps_inline()
                arms.append((c2, self.parse_block()))
                self.skip_seps_inline()
            else:
                else_stmts = self.parse_block()
                break
        return ("if", arms, else_stmts)

    def skip_seps_inline(self):
        while self.peek()[0] == "sep":
            self.next()

    # ---- expressions (precedence low -> high) ----

    def parse_expr(self):
        return self.parse_coalesce()

    def parse_coalesce(self):
        left = self.parse_or()
        while self.peek() == ("op", "??"):
            self.next()
            left = ("coalesce", left, self.parse_or())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.peek() == ("op", "||"):
            self.next()
            left = ("bin", "||", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.peek() == ("op", "&&"):
            self.next()
            left = ("bin", "&&", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        if self.peek()[0] == "op" and self.peek()[1] in _CMP_OPS:
            op = self.next()[1]
            return ("bin", op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = ("bin", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            left = ("bin", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.peek() == ("op", "!"):
            self.next()
            return ("not", self.parse_unary())
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        """member access (`var.field.sub`) and integer indexing
        (`expr[0]`) on any primary."""
        e = self.parse_primary()
        while True:
            kind, val = self.peek()
            # member access binds only to var/member/index bases: call
            # parsing consumes trailing newlines while probing for a
            # closure arrow, so a path here after a call is the NEXT
            # statement, not a projection
            if kind == "path" and e[0] in ("var", "member", "index"):
                self.next()
                parts = [x for x in val[1:].split(".") if x]
                e = ("member", e, parts)
            elif (kind, val) == ("op", "[") and self.peek(1)[0] == "num" \
                    and self.peek(2) == ("op", "]"):
                self.next()
                idx = int(self.next()[1])
                self.next()  # ]
                e = ("index", e, idx)
            else:
                break
        return e

    def parse_primary(self):
        kind, val = self.peek()
        if kind == "op" and val == "(":
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
            return e
        if kind == "op" and val == "[":
            self.next()
            items = []
            self.skip_seps_inline()
            while self.peek() != ("op", "]"):
                items.append(self.parse_expr())
                self.skip_seps_inline()
                if self.peek() == ("op", ","):
                    self.next()
                    self.skip_seps_inline()
            self.next()  # ]
            return ("array", items)
        if kind == "op" and val == "{":
            self.next()
            pairs = []
            self.skip_seps_inline()
            while self.peek() != ("op", "}"):
                kt = self.next()
                if kt[0] in ("dstr", "sstr"):
                    key = _unquote(kt[1])
                elif kt[0] == "word":
                    key = kt[1]
                else:
                    raise VrlError(f"bad object key {kt[1]!r}")
                self.expect("op", ":")
                pairs.append((key, self.parse_expr()))
                self.skip_seps_inline()
                if self.peek() == ("op", ","):
                    self.next()
                    self.skip_seps_inline()
            self.next()  # }
            return ("object", pairs)
        if kind == "path":
            self.next()
            return ("path", [x for x in val[1:].split(".") if x])
        if kind == "dstr" or kind == "sstr":
            self.next()
            return ("lit", _unquote(val))
        if kind == "regex":
            self.next()
            return ("lit", ("__regex__", _unquote_regex(val[1:])))
        if kind == "num":
            self.next()
            return ("lit", float(val) if "." in val else int(val))
        if kind == "word":
            if val in ("true", "false"):
                self.next()
                return ("lit", val == "true")
            if val == "null":
                self.next()
                return ("lit", None)
            # call or variable reference
            if self.peek(1) == ("op", "!") or self.peek(1) == ("op", "("):
                name = self.next()[1]
                bang = False
                if self.peek() == ("op", "!"):
                    self.next()
                    bang = True
                self.expect("op", "(")
                args = []
                kwargs = []
                self.skip_seps_inline()
                while self.peek() != ("op", ")"):
                    # named argument: `iv: expr` (VRL keyword-arg style)
                    if self.peek()[0] == "word" and self.peek(1) == ("op", ":"):
                        kname = self.next()[1]
                        self.next()  # :
                        kwargs.append((kname, self.parse_expr()))
                    else:
                        args.append(self.parse_expr())
                    self.skip_seps_inline()
                    if self.peek() == ("op", ","):
                        self.next()
                        self.skip_seps_inline()
                self.next()  # )
                closure = None
                self.skip_seps_inline()
                if self.peek() == ("op", "->"):
                    self.next()
                    self.skip_seps_inline()
                    self.expect("op", "|")
                    params = []
                    while self.peek() != ("op", "|"):
                        params.append(self.expect("word")[1])
                        if self.peek() == ("op", ","):
                            self.next()
                    self.next()  # |
                    self.skip_seps_inline()
                    body = self.parse_block()
                    closure = ("closure", params, body)
                if name not in FUNCTIONS and name not in _PRED_FUNCS \
                        and name not in _CLOSURE_FUNCS \
                        and name not in _CTX_FUNCS \
                        and name not in _ENCODE_FUNCS \
                        and name not in _SECRET_FUNCS:
                    raise VrlError(f"unknown function {name!r}")
                if closure is None and name in _CLOSURE_FUNCS:
                    raise VrlError(f"{name} requires a closure: "
                                   f"{name}(x) -> |k, v| {{ ... }}")
                return ("call", name, bang, args, closure, kwargs)
            self.next()
            return ("var", val)
        raise VrlError(f"unexpected token {val!r}")


# ---------------------------------------------------------------------------
# evaluator — vectorized under an active-row mask
# ---------------------------------------------------------------------------

def _as_array(v, n: int, like_type=None) -> pa.Array:
    if isinstance(v, pa.ChunkedArray):
        return v.combine_chunks()
    if isinstance(v, pa.Array):
        return v
    if v is None:
        return pa.nulls(n, like_type or pa.string())
    return pa.array([v] * n)


def _false(n: int) -> pa.Array:
    return pa.array(np.zeros(n, dtype=bool))


def _bool_mask(vals, n: int) -> pa.Array:
    """condition semantics: null / non-boolean error -> False."""
    arr = _as_array(vals, n, pa.bool_())
    if not pa.types.is_boolean(arr.type):
        raise VrlError("condition must be boolean")
    return pc.fill_null(arr, False)


def _descend(batch: pa.Table, parts: list[str], n: int):
    if not parts or parts[0] not in batch.column_names:
        return pa.nulls(n, pa.string())
    col = batch[parts[0]]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for part in parts[1:]:
        try:
            col = pc.struct_field(col, part)
        except (pa.ArrowInvalid, KeyError):
            return pa.nulls(n, pa.string())
    return col


def _unify(a: pa.Array, b):
    """cast b (array or scalar) toward a's type for if_else."""
    n = len(a)
    barr = _as_array(b, n, a.type)
    if barr.type != a.type:
        try:
            barr = pc.cast(barr, a.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            a = pc.cast(a, pa.string())
            barr = pc.cast(barr, pa.string())
    return a, barr


class _Ctx:
    def __init__(self, batch: pa.Table, tables: dict | None = None,
                 secrets: dict | None = None):
        self.batch = batch
        self.n = batch.num_rows
        self.err = _false(batch.num_rows)
        self.vars: dict = {}
        self.tables: dict = tables or {}
        self.secrets: dict = secrets if secrets is not None else {}


def _eval(node, ctx: _Ctx):
    """returns (values, err_mask) — err_mask is rows whose evaluation
    FAILED (only fallible calls produce one; None = no errors)."""
    kind = node[0]
    n = ctx.n
    if kind == "lit":
        return node[1], None
    if kind == "path":
        return _descend(ctx.batch, node[1], n), None
    if kind == "var":
        if node[1] not in ctx.vars:
            raise VrlError(f"undefined variable {node[1]!r}")
        return ctx.vars[node[1]], None
    if kind == "not":
        v, e = _eval(node[1], ctx)
        return pc.invert(_bool_mask(v, n)), e
    if kind == "neg":
        v, e = _eval(node[1], ctx)
        if isinstance(v, (int, float)):
            return -v, e
        return pc.negate(_as_array(v, n, pa.float64())), e
    if kind == "coalesce":
        lv, lerr = _eval(node[1], ctx)
        rv, rerr = _eval(node[2], ctx)
        la = _as_array(lv, n)
        good = pc.is_valid(la)
        if lerr is not None:
            good = pc.and_(good, pc.invert(pc.fill_null(lerr, False)))
        la, ra = _unify(la, rv)
        return pc.if_else(good, la, ra), rerr
    if kind == "bin":
        return _eval_bin(node, ctx)
    if kind == "call":
        return _eval_call(node, ctx)
    if kind == "member":
        base, err = _eval(node[1], ctx)
        col = _as_array(base, n)
        for part in node[2]:
            try:
                col = pc.struct_field(col, part)
            except (pa.ArrowInvalid, KeyError):
                return pa.nulls(n, pa.string()), err
        return col, err
    if kind == "index":
        base, err = _eval(node[1], ctx)
        col = _as_array(base, n)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            return pc.list_element(col, node[2]), err
        raise VrlError("indexing requires an array value")
    if kind == "array":
        vals = [_eval(item, ctx)[0] for item in node[1]]
        if all(not isinstance(v, (pa.Array, pa.ChunkedArray)) for v in vals):
            return pa.array([vals] * n), None
        # column-bearing array literal: interleave per row into a list
        arrs = [_as_array(v, n) for v in vals]
        common = arrs[0].type
        for a in arrs[1:]:
            if a.type != common:
                common = pa.string()
                break
        arrs = [pc.cast(a, common) for a in arrs]
        k = len(arrs)
        concat = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrs])
        # output position p = i*k + j holds arrs[j][i] = concat[j*n + i]
        p = np.arange(n * k)
        flat = concat.take(pa.array((p % k) * n + p // k))
        offsets = pa.array(np.arange(0, n * k + 1, k, dtype=np.int32))
        return pa.ListArray.from_arrays(offsets, flat), None
    if kind == "object":
        names = [k for k, _v in node[1]]
        arrs = [_as_array(_eval(v, ctx)[0], n) for _k, v in node[1]]
        arrs = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in arrs]
        return pa.StructArray.from_arrays(arrs, names=names), None
    raise AssertionError(kind)


def _eval_bin(node, ctx: _Ctx):
    _, op, lnode, rnode = node
    n = ctx.n
    lv, lerr = _eval(lnode, ctx)
    rv, rerr = _eval(rnode, ctx)
    err = None
    if lerr is not None or rerr is not None:
        err = pc.or_(lerr if lerr is not None else _false(n),
                     rerr if rerr is not None else _false(n))
    if op in ("&&", "||"):
        lm, rm = _bool_mask(lv, n), _bool_mask(rv, n)
        return (pc.and_(lm, rm) if op == "&&" else pc.or_(lm, rm)), err
    if op in _CMP_OPS:
        la = _as_array(lv, n)
        if rv is None:
            m = pc.is_null(la)
            return (m if op == "==" else pc.invert(m)), err
        la, ra = _unify(la, rv)
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
        try:
            return fn(la, ra), err
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
            raise VrlError(f"cannot compare: {e}")
    # arithmetic / string +
    la = _as_array(lv, n, None if lv is not None else pa.float64())
    la, ra = _unify(la, rv)
    if op == "+" and (pa.types.is_string(la.type) or pa.types.is_large_string(la.type)):
        return pc.binary_join_element_wise(
            pc.cast(la, pa.string()), pc.cast(ra, pa.string()), ""), err
    fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
          "/": pc.divide}[op]
    try:
        return fn(la, ra), err
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
        raise VrlError(f"arithmetic error: {e}")


def _eval_call(node, ctx: _Ctx):
    _, name, bang, argnodes, closure, kwargnodes = node
    n = ctx.n
    args = []
    for a in argnodes:
        v, _e = _eval(a, ctx)
        args.append(v)
    kwargs = {}
    for kname, knode in kwargnodes:
        v, _e = _eval(knode, ctx)
        kwargs[kname] = _lit_of(knode, v)
    if closure is not None:
        if kwargs.get("recursive"):
            raise VrlError(f"{name}: recursive iteration is not "
                           "supported (columnar schemas are flat; "
                           "flatten/unflatten cover the nesting cases)")
        return _eval_closure(name, args, closure, ctx)
    if name in _CTX_FUNCS:
        return _enrich_call(name, argnodes, args, ctx)
    if name in _ENCODE_FUNCS:
        return _encode_call(name, argnodes, args, ctx, kwargs)
    if name in _SECRET_FUNCS:
        return _secret_call(name, argnodes, args, ctx)
    if name in _PRED_FUNCS:
        return _eval_pred(name, argnodes, args, ctx), None
    if name in _NEEDS_N:
        args = [pa.nulls(n, pa.string()), *args]
    vals, ok = FUNCTIONS[name](*args, **kwargs)
    if ok is None:
        return vals, None
    if isinstance(ok, pa.ChunkedArray):
        ok = ok.combine_chunks()
    err = pc.fill_null(pc.invert(ok), False)
    return vals, err


def _eval_pred(name, argnodes, args, ctx: _Ctx):
    n = ctx.n
    a0 = _as_array(args[0], n) if args else None
    if name == "exists":
        return pc.is_valid(a0)
    if name == "is_null":
        return pc.is_null(a0)
    if name == "is_string":
        return pa.array([pa.types.is_string(a0.type)] * n)
    if name in ("length", "strlen"):
        return pc.utf8_length(pc.cast(a0, pa.string()))
    if name == "contains":
        return pc.fill_null(pc.match_substring(
            pc.cast(a0, pa.string()), str(_lit_of(argnodes[1], args[1]))), False)
    if name == "starts_with":
        return pc.fill_null(pc.starts_with(
            pc.cast(a0, pa.string()), pattern=str(_lit_of(argnodes[1], args[1]))), False)
    if name == "ends_with":
        return pc.fill_null(pc.ends_with(
            pc.cast(a0, pa.string()), pattern=str(_lit_of(argnodes[1], args[1]))), False)
    if name == "match":
        pat = _lit_of(argnodes[1], args[1])
        if isinstance(pat, tuple) and pat[0] == "__regex__":
            pat = pat[1]
        return pc.fill_null(pc.match_substring_regex(
            pc.cast(a0, pa.string()), str(pat)), False)
    if name == "includes":
        want = _lit_of(argnodes[1], args[1])
        return pc.fill_null(pc.is_in(a0, value_set=pa.array([want])), False)
    if name == "match_datadog_query":
        # match_datadog_query.cue: the object argument is the event —
        # columnar events ARE the batch, so the query runs over ctx.batch
        q = _lit_of(argnodes[-1], args[-1])
        return pc.fill_null(_dd_query(str(q))(ctx.batch), False)
    if name in ("is_log", "is_metric", "is_trace"):
        # parity with conditions IsLog/IsMetric/IsTrace
        # (src/conditions/mod.rs:23-48): metric-shaped batches carry a
        # metric kind column (`mtype`, or `metric_kind` after
        # metric_to_log's prefixing), trace-shaped ones a `ttype`
        # marker; logs are everything else
        cols = ctx.batch.column_names
        is_m = "mtype" in cols or "metric_kind" in cols
        is_t = "ttype" in cols
        want = {"is_log": not is_m and not is_t,
                "is_metric": is_m, "is_trace": is_t}[name]
        return pa.array([want] * n)
    raise VrlError(f"unknown predicate {name!r}")


def _lit_of(node, evaluated):
    if node[0] == "lit":
        return node[1]
    return evaluated


# ---------------------------------------------------------------------------
# enrichment lookups (get_enrichment_table_record.cue /
# find_enrichment_table_records.cue; lib/enrichment/src/lib.rs:39-68).
# Vectorized: the criteria object's fields concatenate into one key
# string per row, matched against the table's key strings with a single
# index_in; the table-side index builds once per (table, fields) and
# caches on the FileTable instance.
# ---------------------------------------------------------------------------

_SEP = "\x00"


def _enrich_index(table, fields: tuple[str, ...], case_sensitive: bool):
    cache = getattr(table, "_vrl_cache", None)
    if cache is None:
        cache = table._vrl_cache = {}
    key = (fields, case_sensitive)
    if key in cache:
        return cache[key]
    seen: dict[str, int] = {}
    for i, row in enumerate(table.rows):
        parts = []
        for f in fields:
            v = row.get(f)
            if v is None:
                break
            v = str(v)
            parts.append(v.lower() if not case_sensitive else v)
        else:
            seen.setdefault(_SEP.join(parts), i)
    keys = pa.array(list(seen), pa.string())
    cols = {c: pa.array([table.rows[i].get(c) for i in seen.values()])
            for c in table.columns}
    cache[key] = (keys, cols)
    return keys, cols


def _enrich_call(name, argnodes, args, ctx: _Ctx):
    tname = _lit_of(argnodes[0], args[0])
    if not isinstance(tname, str):
        raise VrlError("enrichment table name must be a string literal")
    table = ctx.tables.get(tname)
    if table is None:
        raise VrlError(f"unknown enrichment table {tname!r} (compile the "
                       f"program with tables={{...}})")
    if len(argnodes) < 2 or argnodes[1][0] != "object":
        raise VrlError(f"{name} takes an object of criteria")
    crit_fields = [k for k, _v in argnodes[1][1]]
    crit_cols = [pc.cast(_as_array(_eval(v, ctx)[0], ctx.n), pa.string())
                 for _k, v in argnodes[1][1]]
    case_sensitive = True
    if len(args) > 3:
        cs = _lit_of(argnodes[3], args[3])
        case_sensitive = bool(cs) if cs is not None else True
    if hasattr(table, "lookup_batch"):
        # mmdb/geoip table (src/enrichment_tables/mmdb.rs:112-135):
        # exactly one equality condition whose value is the IP
        if len(crit_cols) != 1:
            raise VrlError("mmdb enrichment tables take exactly one "
                           "IP condition")
        select = None
        if len(args) > 2 and not (argnodes[2][0] == "lit" and args[2] is None):
            sel = _const_list(args[2])
            if sel:
                select = [str(s) for s in sel]
        cols_py, found_list = table.lookup_batch(
            crit_cols[0].to_pylist(), select)
        st = pa.StructArray.from_arrays(
            [pa.array(v) for v in cols_py.values()], names=list(cols_py))
        found = pa.array(found_list, pa.bool_())
        if name == "get_enrichment_table_record":
            return st, pc.invert(found)
        counts = np.asarray(found, dtype=np.int64)
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)])
                           .astype(np.int32))
        return pa.ListArray.from_arrays(offsets, st.filter(found)), None
    keys, cols = _enrich_index(table, tuple(crit_fields), case_sensitive)
    if not case_sensitive:
        crit_cols = [pc.utf8_lower(c) for c in crit_cols]
    batch_key = crit_cols[0] if len(crit_cols) == 1 else \
        pc.binary_join_element_wise(*crit_cols, _SEP)
    idx = pc.index_in(batch_key, value_set=keys)
    found = pc.is_valid(idx)
    select = None
    if len(args) > 2:
        sel = _const_list(args[2]) if not (
            argnodes[2][0] == "lit" and args[2] is None) else None
        if sel:
            select = [str(s) for s in sel]
    names = select or list(cols)
    vals = [cols[c].take(idx) for c in names]
    st = pa.StructArray.from_arrays(vals, names=names)
    if name == "get_enrichment_table_record":
        return st, pc.invert(found)  # no-match is the VRL failure
    # find_*: array of matching records; first-match columnar model
    counts = np.asarray(found, dtype=np.int64)
    offsets = pa.array(np.concatenate([[0], np.cumsum(counts)])
                       .astype(np.int32))
    inner = st.filter(found)
    return pa.ListArray.from_arrays(offsets, inner), None


def _vrl_type_tag(t: pa.DataType) -> str:
    """tag_types_externally.cue's external type names for Arrow types."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_struct(t):
        return "object"
    return "string"


def _encode_call(name, argnodes, args, ctx: _Ctx, kwargs=None):
    kwargs = kwargs or {}
    from vector_ray.functions import encode as _encode

    if argnodes and argnodes[0] == ("path", []):
        t = ctx.batch  # encode the whole event
    else:
        col = _as_array(args[0], ctx.n)
        if not pa.types.is_struct(col.type):
            raise VrlError(f"{name} requires an object (or `.`)")
        t = pa.table({f.name: _as_array(pc.struct_field(col, f.name), ctx.n)
                      for f in col.type})
    if name == "tag_types_externally":
        # wrap every field in a one-field struct named by its type
        # (tag_types_externally.cue); uniform column types make this
        # exactly expressible in the columnar model
        fields = []
        for fname in t.column_names:
            col = t[fname]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            tagged = pa.StructArray.from_arrays(
                [col], names=[_vrl_type_tag(col.type)])
            fields.append((fname, tagged))
        return pa.StructArray.from_arrays(
            [v for _k, v in fields], names=[k for k, _v in fields]), None
    if name == "encode_json":
        return _encode.encode_json(t), None
    # encode_key_value.cue: custom delimiters pass into the encoder
    # (post-processing would corrupt quoted values containing spaces —
    # the exact bug class the roundtrip fuzz guards against)
    return _encode.encode_logfmt(
        t,
        kv_sep=str(kwargs.get("key_value_delimiter", "=")),
        field_sep=str(kwargs.get("field_delimiter", " "))), None


def _secret_call(name, argnodes, args, ctx: _Ctx):
    key = str(_lit_of(argnodes[0], args[0])) if argnodes else ""
    if name == "get_secret":
        v = ctx.secrets.get(key)
        ok = pa.array(np.full(ctx.n, v is not None))
        return (pa.nulls(ctx.n, pa.string()) if v is None
                else pa.array([v] * ctx.n)), pc.invert(ok)
    if name == "set_secret":
        val = _lit_of(argnodes[1], args[1]) if len(argnodes) > 1 else None
        if isinstance(val, (pa.Array, pa.ChunkedArray)):
            val = _as_array(val, ctx.n)[0].as_py() if len(val) else None
        ctx.secrets[key] = val
        return pa.nulls(ctx.n, pa.string()), None
    ctx.secrets.pop(key, None)  # remove_secret
    return pa.nulls(ctx.n, pa.string()), None


_DD_CACHE: dict[str, Callable] = {}


def _dd_query(q: str):
    fn = _DD_CACHE.get(q)
    if fn is None:
        from vector_ray.datadog_search import compile_datadog_search
        fn = _DD_CACHE[q] = compile_datadog_search(q)
    return fn


# ---------------------------------------------------------------------------
# closures — vectorized enumeration (map_values / map_keys / filter /
# for_each per website/cue/reference/remap/functions/*.cue).
#
# Arrays (list columns) iterate in FLAT space: the list values are
# flattened once, the closure body runs vectorized over the flat
# array, and the result is re-wrapped with the original offsets —
# one kernel pass regardless of row count.  Paths and parent
# variables referenced inside an array closure are broadcast to flat
# space via take(parent_indices).  Objects (struct columns) iterate
# per FIELD: the closure runs once per field with the key bound as a
# constant and the value as the full column (mutations to parent-
# scope variables persist, matching VRL scoping).
#
# Documented divergences from row-wise VRL (flat-space model):
#  * `filter` over an object nulls non-matching rows of a field (and
#    drops the field only when no row matches) — columnar schemas
#    cannot drop a key per-row.
#  * parent-scope variable MUTATIONS inside an ARRAY closure do not
#    propagate back (cross-element accumulation has no columnar
#    analogue; use length/unique/flatten for those cases).
# ---------------------------------------------------------------------------

_MISSING = object()


def _null_rows(col: pa.Array) -> pa.Array | None:
    if col.null_count == 0:
        return None
    return pc.is_null(col)


def _shadow(ctx: _Ctx, bindings: dict):
    saved = {k: ctx.vars.get(k, _MISSING) for k in bindings}
    ctx.vars.update(bindings)
    return saved


def _unshadow(ctx: _Ctx, saved: dict, pre_keys: set):
    for k, v in saved.items():
        if v is _MISSING:
            ctx.vars.pop(k, None)
        else:
            ctx.vars[k] = v
    # closure-local variables are scoped to the block (map_values.cue)
    for k in [k for k in ctx.vars if k not in pre_keys and k not in saved]:
        del ctx.vars[k]


def _exec_body_value(body, ctx: _Ctx):
    """Run closure body statements; return the final expression's value
    (None if the body ends in a non-expression statement)."""
    last = None
    for s in body:
        if s[0] == "expr":
            last, err = _eval(s[1], ctx)
            if err is not None and s[1][0] == "call" and s[1][2]:  # bang
                ctx.err = pc.or_(ctx.err, pc.fill_null(err, False))
        else:
            _exec_stmt(s, ctx, None)
            last = None
    return last


def _eval_closure(name, args, closure, ctx: _Ctx):
    _, params, body = closure
    if name == "replace_with":
        return _closure_replace_with(args, params, body, ctx)
    col = args[0]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        raise VrlError(f"{name} requires an array or object value")
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        return _closure_list(name, col, params, body, ctx)
    if pa.types.is_struct(col.type):
        return _closure_struct(name, col, params, body, ctx)
    raise VrlError(f"{name} requires an array or object value, "
                   f"got {col.type}")


def _closure_replace_with(args, params, body, ctx: _Ctx):
    """replace_with.cue: replace every regex match with the closure's
    value; the closure receives an object
    ``{string: <whole match>, captures: [<group>, ...]}``.

    Execution model: one ROUND per match ordinal.  Each round, the next
    match per row is found with the compiled regex (string scan only —
    no user code in the loop), then the closure body evaluates ONCE,
    vectorized over all rows that matched this round.  Scan offsets
    advance past each replacement exactly like ``re.sub``, so
    replacements never re-match."""
    if len(params) != 1:
        raise VrlError("replace_with closure takes |match|")
    col = _as_array(args[0], ctx.n)
    pat = args[1]
    if isinstance(pat, tuple) and pat and pat[0] == "__regex__":
        pat = pat[1]
    if not isinstance(pat, str):
        raise VrlError("replace_with pattern must be a regex or string "
                       "literal")
    creg = re.compile(pat)
    n = ctx.n
    cur: list = pc.cast(col, pa.string()).to_pylist()
    offsets = [0] * n
    active = [i for i, s in enumerate(cur) if s is not None]
    pre_keys = set(ctx.vars)
    rounds = 0
    while active and rounds < 1000:
        rounds += 1
        hit_rows, wholes, caps_per_row = [], [], []
        spans = {}
        for i in active:
            m = creg.search(cur[i], offsets[i])
            if m is None:
                continue
            hit_rows.append(i)
            wholes.append(m.group(0))
            caps_per_row.append([g if g is not None else None
                                 for g in m.groups()])
            spans[i] = m.span()
        if not hit_rows:
            break
        k = len(hit_rows)
        ncaps = creg.groups
        cap_arrays = [pa.array([c[j] for c in caps_per_row], pa.string())
                      for j in range(ncaps)]
        if ncaps:
            flat = pa.concat_arrays(cap_arrays)
            # row-interleave: captures of row r are flat[j*k + r]
            p = np.arange(k * ncaps)
            cap_list = pa.ListArray.from_arrays(
                pa.array(np.arange(0, k * ncaps + 1, ncaps, dtype=np.int32)),
                flat.take(pa.array((p % ncaps) * k + p // ncaps)))
        else:
            cap_list = pa.ListArray.from_arrays(
                pa.array(np.zeros(k + 1, dtype=np.int32)),
                pa.array([], pa.string()))
        match_obj = pa.StructArray.from_arrays(
            [pa.array(wholes, pa.string()), cap_list],
            names=["string", "captures"])
        sub = _Ctx(ctx.batch.take(pa.array(hit_rows, pa.int64())),
                   ctx.tables, ctx.secrets)
        for kk, v in ctx.vars.items():
            if isinstance(v, (pa.Array, pa.ChunkedArray)) and len(v) == n:
                sub.vars[kk] = _as_array(v, n).take(
                    pa.array(hit_rows, pa.int64()))
            else:
                sub.vars[kk] = v
        sub.vars[params[0]] = match_obj
        result = _exec_body_value(body, sub)
        repl = pc.cast(_as_array(result, k), pa.string()).to_pylist()
        nxt = []
        for idx, i in enumerate(hit_rows):
            st, en = spans[i]
            r = repl[idx] if repl[idx] is not None else ""
            cur[i] = cur[i][:st] + r + cur[i][en:]
            offsets[i] = st + len(r) + (1 if en == st else 0)
            if offsets[i] <= len(cur[i]):
                nxt.append(i)
        active = nxt
    return pa.array(cur, pa.string()), None


def _closure_list(name, col: pa.Array, params, body, ctx: _Ctx):
    n = ctx.n
    flat = col.flatten()
    parent = pc.list_parent_indices(col)
    parent_np = np.asarray(parent)
    counts_np = np.asarray(pc.fill_null(pc.list_value_length(col), 0),
                           dtype=np.int64)
    row_start = np.concatenate([[0], np.cumsum(counts_np)[:-1]])

    sub = _Ctx.__new__(_Ctx)
    sub.batch = ctx.batch.take(parent)
    sub.n = len(flat)
    sub.err = _false(sub.n)
    sub.vars = {}
    sub.tables = ctx.tables
    sub.secrets = ctx.secrets
    for k, v in ctx.vars.items():
        if isinstance(v, (pa.Array, pa.ChunkedArray)) and len(v) == n:
            sub.vars[k] = _as_array(v, n).take(parent)
        else:
            sub.vars[k] = v
    if name == "map_values":
        if len(params) != 1:
            raise VrlError("map_values closure takes |value|")
        sub.vars[params[0]] = flat
    else:  # filter / for_each: |index, value|
        if len(params) != 2:
            raise VrlError(f"{name} closure over an array takes "
                           "|index, value|")
        idx = pa.array(np.arange(len(flat)) - row_start[parent_np],
                       pa.int64())
        sub.vars[params[0]] = idx
        sub.vars[params[1]] = flat

    result = _exec_body_value(body, sub)
    # element errors fold to their row
    err_rows = None
    sub_err = np.asarray(sub.err)
    if sub_err.any():
        hit = np.zeros(n, dtype=bool)
        np.logical_or.at(hit, parent_np[sub_err], True)
        err_rows = pa.array(hit)

    if name == "for_each":
        return col, err_rows
    if name == "filter":
        mask = np.asarray(pc.fill_null(_bool_mask(result, sub.n), False))
        new_counts = np.bincount(parent_np[mask], minlength=n)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32))
        kept = flat.filter(pa.array(mask))
        return pa.ListArray.from_arrays(
            offsets, kept, mask=_null_rows(col)), err_rows
    # map_values
    new_flat = _as_array(result, sub.n)
    offsets = pa.array(np.concatenate([[0], np.cumsum(counts_np)]),
                       pa.int32())
    return pa.ListArray.from_arrays(
        offsets, new_flat, mask=_null_rows(col)), err_rows


def _closure_struct(name, col: pa.Array, params, body, ctx: _Ctx):
    n = ctx.n
    fields = [(f.name, pc.struct_field(col, f.name)) for f in col.type]
    pre_keys = set(ctx.vars)
    err_acc = None

    if name == "map_keys":
        if len(params) != 1:
            raise VrlError("map_keys closure takes |key|")
        new_names = []
        tiny = _Ctx(ctx.batch.slice(0, min(1, n)), ctx.tables, ctx.secrets)
        for fname, _v in fields:
            saved = _shadow(tiny, {params[0]: pa.array([fname])})
            out = _exec_body_value(body, tiny)
            _unshadow(tiny, saved, pre_keys)
            arr = _as_array(out, 1)
            new_names.append(arr[0].as_py() if len(arr) else fname)
        return pa.StructArray.from_arrays(
            [_as_array(v, n) for _k, v in fields], names=new_names), None

    out_fields: list[tuple[str, pa.Array]] = []
    for fname, fcol in fields:
        fcol = _as_array(fcol, n)
        if name == "map_values":
            bind = {params[0]: fcol}
        else:  # filter / for_each: |key, value|
            if len(params) != 2:
                raise VrlError(f"{name} closure over an object takes "
                               "|key, value|")
            bind = {params[0]: pa.array([fname] * n), params[1]: fcol}
        saved = _shadow(ctx, bind)
        before_err = ctx.err
        ctx.err = _false(n)
        result = _exec_body_value(body, ctx)
        err_acc = ctx.err if err_acc is None else pc.or_(err_acc, ctx.err)
        ctx.err = before_err
        _unshadow(ctx, saved, pre_keys)
        if name == "map_values":
            out_fields.append((fname, _as_array(result, n)))
        elif name == "filter":
            mask = pc.fill_null(_bool_mask(result, n), False)
            if not pc.any(mask).as_py():
                continue  # no row keeps this key: drop the field
            out_fields.append(
                (fname, pc.if_else(mask, fcol, pa.nulls(n, fcol.type))))
    if pc.any(err_acc).as_py() if err_acc is not None else False:
        err = err_acc
    else:
        err = None
    if name == "for_each":
        return col, err
    if not out_fields:
        return pa.nulls(n, pa.struct([])), err
    return pa.StructArray.from_arrays(
        [v for _k, v in out_fields], names=[k for k, _v in out_fields]), err


# ---------------------------------------------------------------------------
# masked assignment machinery
# ---------------------------------------------------------------------------

def _set(batch: pa.Table, name: str, col) -> pa.Table:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if name in batch.column_names:
        return batch.set_column(batch.schema.get_field_index(name), name, col)
    return batch.append_column(name, col)


def _struct_set(col: pa.Array | None, parts: list[str], vals: pa.Array,
                n: int) -> pa.Array:
    """Rebuild a struct column with ``parts`` (depth>=1) replaced."""
    name = parts[0]
    if col is not None and isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    existing_fields: dict[str, pa.Array] = {}
    if col is not None and pa.types.is_struct(col.type):
        for f in col.type:
            existing_fields[f.name] = pc.struct_field(col, f.name)
    if len(parts) == 1:
        existing_fields[name] = vals
    else:
        child = existing_fields.get(name)
        existing_fields[name] = _struct_set(child, parts[1:], vals, n)
    names = list(existing_fields)
    return pa.StructArray.from_arrays(
        [_as_array(existing_fields[k], n) for k in names], names=names)


def _masked(new: pa.Array, existing: pa.Array | None, mask, n: int) -> pa.Array:
    if mask is None:
        return new
    if existing is None:
        existing = pa.nulls(n, new.type)
    new2, ex2 = _unify(new, existing)
    return pc.if_else(mask, new2, ex2)


class VrlProgram:
    """Compiled program usable as stages.remap's ``program``."""

    def __init__(self, source: str, tables: dict | None = None,
                 secrets: dict | None = None):
        self.source = source
        self.tables = dict(tables or {})
        self.secrets = dict(secrets or {})
        self.statements = _Parser(source).parse_program()
        _check_vars(self.statements, set())

    def __call__(self, batch: pa.Table):
        ctx = _Ctx(batch, self.tables, dict(self.secrets))
        _exec_stmts(self.statements, ctx, None)
        msg = pc.if_else(ctx.err, pa.scalar("vrl program error", pa.string()),
                         pa.scalar(None, pa.string()))
        return ctx.batch, ctx.err, msg


def _check_vars(stmts, defined: set):
    """Compile-time undefined-variable check (VRL compiles per-program;
    an unresolved ident is a compile error, not a runtime one)."""
    for s in stmts:
        kind = s[0]
        if kind == "assign":
            _check_expr_vars(s[2], defined)
            if s[1][0] == "var":
                defined.add(s[1][1])
        elif kind == "merge":
            _check_expr_vars(s[1], defined)
        elif kind == "abort":
            if s[1] is not None:
                _check_expr_vars(s[1], defined)
        elif kind == "if":
            for cond, arm in s[1]:
                _check_expr_vars(cond, defined)
                _check_vars(arm, defined)
            _check_vars(s[2], defined)
        elif kind == "expr":
            _check_expr_vars(s[1], defined)


def _check_expr_vars(node, defined: set):
    kind = node[0]
    if kind == "var":
        if node[1] not in defined:
            raise VrlError(f"undefined variable {node[1]!r}")
    elif kind == "call":
        for a in node[3]:
            _check_expr_vars(a, defined)
        if node[4] is not None:
            inner = set(defined) | set(node[4][1])
            _check_vars(node[4][2], inner)
        for _k, v in node[5]:
            _check_expr_vars(v, defined)
    elif kind == "bin":
        _check_expr_vars(node[2], defined)
        _check_expr_vars(node[3], defined)
    elif kind == "coalesce":
        _check_expr_vars(node[1], defined)
        _check_expr_vars(node[2], defined)
    elif kind in ("not", "neg"):
        _check_expr_vars(node[1], defined)
    elif kind == "array":
        for item in node[1]:
            _check_expr_vars(item, defined)
    elif kind == "object":
        for _k, v in node[1]:
            _check_expr_vars(v, defined)
    elif kind in ("member", "index"):
        _check_expr_vars(node[1], defined)


# ---- statement execution under mask (None = all rows active) ----

def _exec_stmts(stmts, ctx: _Ctx, mask):
    for s in stmts:
        _exec_stmt(s, ctx, mask)


def _exec_stmt(s, ctx: _Ctx, mask):
    kind = s[0]
    if kind == "del":
        _exec_del(s[1], ctx, mask)
    elif kind == "abort":
        if s[1] is None:
            hit = mask if mask is not None else pa.array(
                np.ones(ctx.n, dtype=bool))
        else:
            v, _e = _eval(s[1], ctx)
            hit = _bool_mask(v, ctx.n)
            if mask is not None:
                hit = pc.and_(hit, mask)
        ctx.err = pc.or_(ctx.err, hit)
    elif kind == "if":
        _exec_if(s, ctx, mask)
    elif kind == "merge":
        _exec_merge(s[1], ctx, mask)
    elif kind == "assign":
        _exec_assign(s[1], s[2], ctx, mask)
    elif kind == "expr":
        # side-effecting expression statement (for_each, bare calls)
        _v, err = _eval(s[1], ctx)
        if err is not None and s[1][0] == "call" and s[1][2]:  # bang
            hit = err if mask is None else pc.and_(
                pc.fill_null(err, False), mask)
            ctx.err = pc.or_(ctx.err, pc.fill_null(hit, False))
    else:
        raise AssertionError(kind)


def _exec_if(node, ctx: _Ctx, mask):
    _, arms, else_stmts = node
    remaining = mask  # rows not yet captured by an arm
    for cond, stmts in arms:
        v, _e = _eval(cond, ctx)
        m = _bool_mask(v, ctx.n)
        if remaining is not None:
            m = pc.and_(m, remaining)
        _exec_stmts(stmts, ctx, m)
        not_m = pc.invert(m)
        remaining = not_m if remaining is None else pc.and_(remaining, not_m)
    if else_stmts:
        _exec_stmts(else_stmts, ctx, remaining)


def _exec_del(parts, ctx: _Ctx, mask):
        name = parts[0]
        if name not in ctx.batch.column_names:
            return
        if len(parts) == 1:
            if mask is None:
                ctx.batch = ctx.batch.drop_columns([name])
            else:
                # per-row delete has no columnar analogue; null the rows
                col = ctx.batch[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                nulled = pc.if_else(mask, pa.nulls(ctx.n, col.type), col)
                ctx.batch = _set(ctx.batch, name, nulled)
            return
        col = ctx.batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_struct(col.type):
            return
        kept = [(f.name, pc.struct_field(col, f.name)) for f in col.type
                if f.name != parts[1]]
        if len(parts) > 2:
            raise VrlError("del supports at most 2 path levels")
        if not kept:
            if mask is None:
                ctx.batch = ctx.batch.drop_columns([name])
            return
        rebuilt = pa.StructArray.from_arrays(
            [_as_array(v, ctx.n) for _k, v in kept], names=[k for k, _v in kept])
        if mask is not None:
            rebuilt = pc.if_else(mask, rebuilt, col) if rebuilt.type == col.type \
                else rebuilt  # field-set change: apply to all (documented)
        ctx.batch = _set(ctx.batch, name, rebuilt)


def _exec_merge(expr, ctx: _Ctx, mask):
        vals, err = _eval(expr, ctx)
        vals = _as_array(vals, ctx.n)
        if not pa.types.is_struct(vals.type):
            raise VrlError(". = <expr> requires a struct-returning expr")
        bang = expr[0] == "call" and expr[2]
        if bang and err is not None:
            hit = err if mask is None else pc.and_(err, mask)
            ctx.err = pc.or_(ctx.err, hit)
        for f in vals.type:
            col = pc.struct_field(vals, f.name)
            existing = None
            if f.name in ctx.batch.column_names:
                existing = ctx.batch[f.name]
                if isinstance(existing, pa.ChunkedArray):
                    existing = existing.combine_chunks()
            ctx.batch = _set(ctx.batch, f.name,
                             _masked(col, existing, mask, ctx.n))

def _exec_assign(target, expr, ctx: _Ctx, mask):
        vals, err = _eval(expr, ctx)
        bang = expr[0] == "call" and expr[2]
        if bang and err is not None:
            hit = err if mask is None else pc.and_(err, mask)
            ctx.err = pc.or_(ctx.err, hit)
        vals = _as_array(vals, ctx.n)
        if target[0] == "var":
            ctx.vars[target[1]] = vals if mask is None else _masked(
                vals, ctx.vars.get(target[1]), mask, ctx.n)
            return
        parts = target[1]
        if len(parts) == 1:
            existing = None
            if parts[0] in ctx.batch.column_names:
                existing = ctx.batch[parts[0]]
                if isinstance(existing, pa.ChunkedArray):
                    existing = existing.combine_chunks()
            ctx.batch = _set(ctx.batch, parts[0],
                             _masked(vals, existing, mask, ctx.n))
            return
        # nested target: rebuild the top-level struct column
        top = parts[0]
        col = ctx.batch[top].combine_chunks() if (
            top in ctx.batch.column_names
            and isinstance(ctx.batch[top], pa.ChunkedArray)
        ) else (ctx.batch[top] if top in ctx.batch.column_names else None)
        leaf_existing = _descend(ctx.batch, parts, ctx.n) \
            if top in ctx.batch.column_names else None
        leafed = _masked(vals, leaf_existing, mask, ctx.n)
        rebuilt = _struct_set(col, parts[1:], leafed, ctx.n)
        ctx.batch = _set(ctx.batch, top, rebuilt)


def compile_vrl(source: str, tables: dict | None = None,
                secrets: dict | None = None) -> VrlProgram:
    return VrlProgram(source, tables, secrets)
