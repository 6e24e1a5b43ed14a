"""Datadog Search Syntax conditions → vectorized Arrow boolean masks.

Reference: src/conditions/datadog_search.rs (the `EventFilter` matcher
semantics and its test corpus) over the public Datadog log search
syntax <https://docs.datadoghq.com/logs/explorer/search_syntax/>.

Field resolution mirrors the reference's `Field` enum:

- bare terms / quoted phrases — word-boundary match on the DEFAULT
  field ``message``;
- ``@attr`` — attribute: the ``attr`` column (dots descend structs);
  numeric columns compare numerically, strings lexicographically;
- reserved names (``host source status service trace_id message
  timestamp tags``) — same-named column, exact string match;
- anything else (``key:value``) — a TAG: matched against a
  ``tags`` list<string> column holding ``key:value`` entries.

Value forms: plain (``*`` wildcards; ``\\`` escapes), quoted phrases,
inclusive ``[a TO b]`` / exclusive ``{a TO b}`` ranges (``*`` =
unbounded), comparisons ``>n >=n <n <=n``, ``_exists_:f`` /
``_missing_:f``.  Boolean operators ``OR``/``||``, ``AND``/``&&`` and
juxtaposition (implicit AND), ``NOT`` / ``-`` negation, parentheses,
and grouped values ``@f:(v1 OR v2)``.

Everything evaluates per batch with pyarrow/numpy kernels; a missing
column or null row matches FALSE (reference: matchers return false on
missing/mistyped fields; negation then applies at the boolean level).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

RESERVED = {"host", "source", "status", "service", "trace_id",
            "message", "timestamp", "tags"}
DEFAULT_FIELD = "message"


class DatadogSearchError(ValueError):
    pass


# ---------------------------------------------------------------------------
# lexer: emits ( ) OR AND NOT and raw term strings (escapes preserved)
# ---------------------------------------------------------------------------

def _lex(src: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            toks.append(("op", c))
            i += 1
            continue
        if c == "-":
            toks.append(("op", "-"))
            i += 1
            continue
        # scan one term: respects \-escapes, quotes, [..] {..} and (..)
        j, depth, buf = i, 0, []
        in_q = False
        while j < n:
            ch = src[j]
            if ch == "\\" and j + 1 < n:
                buf.append(ch)
                buf.append(src[j + 1])
                j += 2
                continue
            if ch == '"':
                in_q = not in_q
                buf.append(ch)
                j += 1
                continue
            if in_q:
                buf.append(ch)
                j += 1
                continue
            if ch in "[{(":
                depth += 1
            elif ch in "]})":
                if depth == 0:
                    break
                depth -= 1
            elif ch.isspace() and depth == 0:
                break
            buf.append(ch)
            j += 1
        term = "".join(buf)
        i = j
        if term in ("OR", "||"):
            toks.append(("op", "OR"))
        elif term in ("AND", "&&"):
            toks.append(("op", "AND"))
        elif term == "NOT":
            toks.append(("op", "NOT"))
        elif term:
            toks.append(("term", term))
    toks.append(("eof", ""))
    return toks


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _strip_quotes(s: str) -> tuple[str, bool]:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1], True
    return s, False


# ---------------------------------------------------------------------------
# column access
# ---------------------------------------------------------------------------

def _column(t: pa.Table, path: str):
    parts = path.split(".")
    if parts[0] not in t.column_names:
        return None
    col = t[parts[0]]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for p in parts[1:]:
        if not pa.types.is_struct(col.type):
            return None
        try:
            col = pc.struct_field(col, p)
        except (pa.ArrowInvalid, KeyError):
            return None
    return col


def _false(n: int) -> pa.Array:
    return pa.array(np.zeros(n, dtype=bool))


def _fill(m) -> pa.Array:
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    return pc.fill_null(m, False)


def _any_tag(t: pa.Table, elem_fn: Callable[[pa.Array], pa.Array]) -> pa.Array:
    """True where ANY element of the ``tags`` list column matches."""
    n = t.num_rows
    col = _column(t, "tags")
    if col is None or not (pa.types.is_list(col.type)
                           or pa.types.is_large_list(col.type)):
        return _false(n)
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    m = _fill(elem_fn(pc.cast(flat, pa.string()))).to_numpy(zero_copy_only=False)
    out = np.zeros(n, dtype=bool)
    if len(parents):
        out[parents[m]] = True
    return pa.array(out)


def _split_wild(raw: str) -> list[str]:
    """split on UN-escaped ``*`` only; each literal part is unescaped."""
    parts, cur, i = [], [], 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            cur.append(raw[i + 1])
            i += 2
            continue
        if ch == "*":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _word_regex(parts: list[str]) -> str:
    """word-boundary regex with ``*`` -> ``.*`` (vrl word_regex analogue)."""
    return r"\b" + ".*".join(re.escape(p) for p in parts) + r"\b"


def _wildcard_regex(parts: list[str]) -> str:
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"


def _str_match(col, regex: str, n: int) -> pa.Array:
    if col is None:
        return _false(n)
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        try:
            col = pc.cast(col, pa.string())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return _false(n)
    return _fill(pc.match_substring_regex(col, regex))


def _num(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return None


def _scalar_equals(col, value: str, n: int) -> pa.Array:
    """attribute equality: numeric columns compare numerically when the
    query value parses as a number; otherwise string equality."""
    if col is None:
        return _false(n)
    if pa.types.is_boolean(col.type):
        if value in ("true", "false"):
            return _fill(pc.equal(col, value == "true"))
        return _false(n)
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        v = _num(value)
        if v is None:
            return _false(n)
        return _fill(pc.equal(col, pa.scalar(float(v), pa.float64())
                              if pa.types.is_floating(col.type) else v))
    try:
        return _fill(pc.equal(pc.cast(col, pa.string()), value))
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return _false(n)


def _scalar_compare(col, op: str, value: str, n: int,
                    force_string: bool = False) -> pa.Array:
    """numeric compare for numeric columns vs numeric bound; otherwise
    lexicographic string compare (reference `compare` semantics)."""
    if col is None:
        return _false(n)
    fns = {">": pc.greater, ">=": pc.greater_equal,
           "<": pc.less, "<=": pc.less_equal}
    fn = fns[op]
    v = None if force_string else _num(value)
    if v is not None and (pa.types.is_integer(col.type)
                          or pa.types.is_floating(col.type)):
        return _fill(fn(col, v))
    try:
        return _fill(fn(pc.cast(col, pa.string()), value))
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return _false(n)


# ---------------------------------------------------------------------------
# term compiler: (field, value) -> mask fn
# ---------------------------------------------------------------------------

def _field_kind(field: str) -> tuple[str, str]:
    if field.startswith("@"):
        return "attr", field[1:]
    if field in RESERVED:
        return "reserved", field
    return "tag", field


def _compile_value_match(kind: str, name: str, raw_value: str):
    """one field:value (or bare value with kind='default') -> mask fn"""
    stripped, quoted = _strip_quotes(raw_value)
    parts = [_unescape(stripped)] if quoted else _split_wild(stripped)
    value = _unescape(stripped) if quoted else "".join(parts)

    # ranges ----------------------------------------------------------------
    rng = re.match(r"^([\[{])\s*(.+?)\s+TO\s+(.+?)\s*([\]}])$", raw_value)
    if rng:
        inclusive = rng.group(1) == "["
        lo, _ = _strip_quotes(rng.group(2))
        hi, _ = _strip_quotes(rng.group(3))
        lo_q = rng.group(2).startswith('"')
        hi_q = rng.group(3).startswith('"')

        def range_mask(t: pa.Table) -> pa.Array:
            n = t.num_rows
            ops = (">=", "<=") if inclusive else (">", "<")
            if kind == "tag":
                def elem(flat):
                    pref = name + ":"
                    is_key = pc.starts_with(flat, pattern=pref)
                    vals = pc.utf8_slice_codeunits(flat, len(pref))
                    m = is_key
                    if lo != "*":
                        m = pc.and_(m, _fill(
                            pc.greater_equal(vals, lo) if ops[0] == ">="
                            else pc.greater(vals, lo)))
                    if hi != "*":
                        m = pc.and_(m, _fill(
                            pc.less_equal(vals, hi) if ops[1] == "<="
                            else pc.less(vals, hi)))
                    return m
                return _any_tag(t, elem)
            col = _column(t, name if kind != "default" else DEFAULT_FIELD)
            if col is None:
                return _false(n)
            m = _fill(pc.is_valid(col))
            if lo != "*":
                m = pc.and_(m, _scalar_compare(col, ops[0], lo, n,
                                               force_string=lo_q))
            if hi != "*":
                m = pc.and_(m, _scalar_compare(col, ops[1], hi, n,
                                               force_string=hi_q))
            return m
        return range_mask

    # comparisons ------------------------------------------------------------
    cmpm = re.match(r"^(>=|<=|>|<)(.+)$", raw_value)
    if cmpm:
        op, cv = cmpm.group(1), _unescape(_strip_quotes(cmpm.group(2))[0])

        def cmp_mask(t: pa.Table) -> pa.Array:
            n = t.num_rows
            if kind == "tag":
                def elem(flat):
                    pref = name + ":"
                    is_key = pc.starts_with(flat, pattern=pref)
                    vals = pc.utf8_slice_codeunits(flat, len(pref))
                    fns = {">": pc.greater, ">=": pc.greater_equal,
                           "<": pc.less, "<=": pc.less_equal}
                    return pc.and_(is_key, _fill(fns[op](vals, cv)))
                return _any_tag(t, elem)
            col = _column(t, name if kind != "default" else DEFAULT_FIELD)
            return _scalar_compare(col, op, cv, n)
        return cmp_mask

    has_wild = len(parts) > 1

    def mask(t: pa.Table) -> pa.Array:
        n = t.num_rows
        if kind == "default":
            col = _column(t, DEFAULT_FIELD)
            return _str_match(col, _word_regex(parts), n)
        if name == "tags":
            # literal `tags:` matches whole elements by equality
            def elem(flat):
                return pc.equal(flat, value)
            return _any_tag(t, elem)
        if kind == "tag":
            if has_wild:
                rx = _wildcard_regex([f"{name}:{parts[0]}"] + parts[1:])

                def elem(flat):
                    return pc.match_substring_regex(flat, rx)
            else:
                target = f"{name}:{value}"

                def elem(flat):
                    return pc.equal(flat, target)
            return _any_tag(t, elem)
        col = _column(t, name)
        if col is None:
            return _false(n)
        if has_wild:
            return _str_match(col, _wildcard_regex(parts), n)
        if kind == "reserved":
            try:
                return _fill(pc.equal(pc.cast(col, pa.string()), value))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return _false(n)
        return _scalar_equals(col, value, n)
    return mask


def _compile_exists(field: str, missing: bool):
    kind, name = _field_kind(field)

    def mask(t: pa.Table) -> pa.Array:
        n = t.num_rows
        if kind == "tag":
            def elem(flat):
                return pc.or_(pc.equal(flat, name),
                              pc.starts_with(flat, pattern=name + ":"))
            m = _any_tag(t, elem)
        else:
            col = _column(t, name)
            m = _fill(pc.is_valid(col)) if col is not None else _false(n)
        return pc.invert(m) if missing else m
    return mask


def _compile_term(term: str):
    # _exists_ / _missing_
    if term.startswith("_exists_:"):
        return _compile_exists(term[len("_exists_:"):], missing=False)
    if term.startswith("_missing_:"):
        return _compile_exists(term[len("_missing_:"):], missing=True)
    # split field:value on the first un-escaped colon OUTSIDE quotes
    field = None
    depth = 0
    for i, ch in enumerate(term):
        if ch == "\\":
            continue
        if i and term[i - 1] == "\\":
            continue
        if ch == '"':
            depth ^= 1
        elif ch == ":" and depth == 0:
            field, value = term[:i], term[i + 1:]
            break
    if field is None:
        # bare term: default-field word match (or bare range)
        return _compile_value_match("default", DEFAULT_FIELD, term)
    # grouped values: field:(v1 OR v2)
    if value.startswith("(") and value.endswith(")"):
        inner = value[1:-1]
        parts = re.split(r"\s+(?:OR|\|\|)\s+", inner.replace("\n", " ").strip())
        kind, name = _field_kind(field)
        fns = [_compile_value_match(kind, name, p.strip()) for p in parts if p.strip()]

        def mask(t: pa.Table) -> pa.Array:
            out = _false(t.num_rows)
            for f in fns:
                out = pc.or_(out, f(t))
            return out
        return mask
    kind, name = _field_kind(field)
    return _compile_value_match(kind, name, value)


# ---------------------------------------------------------------------------
# boolean grammar
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        if self.i < len(self.toks) - 1:
            self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.peek()[0] != "eof":
            raise DatadogSearchError(f"trailing tokens at {self.peek()[1]!r}")
        return node

    def parse_or(self):
        operands = [self.parse_and()]
        while self.peek() == ("op", "OR"):
            self.next()
            operands.append(self.parse_and())
        if len(operands) == 1:
            return operands[0]
        # Lucene-style boolean clauses (reference corpus:
        # "-@field:value1 OR -@field:value2" fails field=value2):
        # negated operands are PROHIBITED — they AND in as NOT x —
        # while plain operands OR together as optional clauses.
        should = [o for o in operands if o[0] != "not"]
        must_not = [o[1] for o in operands if o[0] == "not"]
        return ("bool", should, must_not)

    def parse_and(self):
        left = self.parse_unary()
        while True:
            k, v = self.peek()
            if (k, v) == ("op", "AND"):
                self.next()
                left = ("and", left, self.parse_unary())
            elif k == "term" or (k == "op" and v in ("(", "NOT", "-")):
                left = ("and", left, self.parse_unary())  # juxtaposition
            else:
                return left

    def parse_unary(self):
        k, v = self.peek()
        if (k, v) in (("op", "NOT"), ("op", "-")):
            self.next()
            return ("not", self.parse_unary())
        if (k, v) == ("op", "("):
            self.next()
            node = self.parse_or()
            if self.peek() != ("op", ")"):
                raise DatadogSearchError("missing )")
            self.next()
            return node
        if k == "term":
            self.next()
            return ("term", _compile_term(v))
        raise DatadogSearchError(f"unexpected token {v!r}")


def _eval(node, t: pa.Table) -> pa.Array:
    kind = node[0]
    if kind == "term":
        return _fill(node[1](t))
    if kind == "not":
        return pc.invert(_eval(node[1], t))
    if kind == "and":
        return pc.and_(_eval(node[1], t), _eval(node[2], t))
    if kind == "bool":
        _, should, must_not = node
        if should:
            m = _eval(should[0], t)
            for s in should[1:]:
                m = pc.or_(m, _eval(s, t))
        else:
            m = pa.array(np.ones(t.num_rows, dtype=bool))
        for x in must_not:
            m = pc.and_(m, pc.invert(_eval(x, t)))
        return m
    raise AssertionError(kind)


class DatadogSearch:
    """Compiled query: ``cond(batch) -> BooleanArray`` (no nulls)."""

    def __init__(self, source: str):
        self.source = source
        src = source.strip()
        self._node = ("term", lambda t: pa.array([True] * t.num_rows)) \
            if src in ("", "*") else _Parser(src).parse()

    def __call__(self, batch: pa.Table) -> pa.Array:
        return _eval(self._node, batch)

    def __repr__(self):
        return f"DatadogSearch({self.source!r})"


def compile_datadog_search(source: str) -> DatadogSearch:
    return DatadogSearch(source)
