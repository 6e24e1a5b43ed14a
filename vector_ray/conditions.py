"""Condition mini-language → vectorized Arrow boolean masks.

Vector evaluates per-event predicates via ``AnyCondition`` — a bare
string is shorthand for a VRL boolean expression
(reference: src/conditions/mod.rs:23-48,188-216).  The rebuild compiles
the VRL-boolean subset needed by filter/route/sample/throttle into
pyarrow.compute expressions evaluated once per batch.

Semantics preserved:
- a condition must be boolean; non-boolean is a compile error
  (reference: src/conditions/vrl.rs:115-127);
- a runtime error (e.g. missing field / null operand) evaluates to
  **false** for that event (same file) — we model this by filling null
  slots of the final mask with False.

Grammar (precedence low→high)::

    or    := and ('||' and)*
    and   := unary ('&&' unary)*
    unary := '!' unary | comparison
    cmp   := primary (('=='|'!='|'<'|'<='|'>'|'>=') primary)?
    primary := '(' or ')' | func '(' args ')' | path | literal
    path  := '.' ident ('.' ident)*          # struct descent on dots
    func  := exists | is_null | contains | starts_with | ends_with
             | match | length | includes
    literal := 'true' | 'false' | 'null' | number | 'single' | "double" | r"regex"

Compiled form: ``Callable[[pa.Table], pa.ChunkedArray[bool]]`` with no
nulls (errors → False).
"""

from __future__ import annotations

import re
from typing import Callable, Union

import pyarrow as pa
import pyarrow.compute as pc

MaskFn = Callable[[pa.Table], pa.ChunkedArray]
AnyCondition = Union[str, MaskFn, "Condition"]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<op>\|\||&&|==|!=|<=|>=|<|>|!|\(|\)|,)
      | (?P<regex>r"(?:[^"\\]|\\.)*")
      | (?P<dstr>"(?:[^"\\]|\\.)*")
      | (?P<sstr>'(?:[^'\\]|\\.)*')
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<path>\.[A-Za-z_][\w.]*)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.X,
)

_FUNCS = {"exists", "is_null", "contains", "starts_with", "ends_with", "match",
          "match_any", "length", "strlen", "includes", "to_string",
          "is_log", "is_metric", "is_trace"}


class ConditionError(ValueError):
    pass


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise ConditionError(f"bad token at {pos!r} in {src!r}")
        pos = m.end()
        for kind in ("op", "regex", "dstr", "sstr", "num", "path", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _unquote(s: str) -> str:
    return s[1:-1].encode().decode("unicode_escape")


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0
        self.src = src

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val and v != val):
            raise ConditionError(f"expected {kind or val}, got {k}:{v!r} in {self.src!r}")
        self.i += 1
        return v

    def parse(self):
        node = self.or_expr()
        self.eat("eof")
        if not node.boolean:
            raise ConditionError(f"condition must resolve to boolean: {self.src!r}")
        return node

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == ("op", "||"):
            self.eat()
            left = _Bool2("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.unary()
        while self.peek() == ("op", "&&"):
            self.eat()
            left = _Bool2("and", left, self.unary())
        return left

    def unary(self):
        if self.peek() == ("op", "!"):
            self.eat()
            return _Not(self.unary())
        return self.cmp()

    def cmp(self):
        left = self.primary()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.eat()
            return _Cmp(v, left, self.primary())
        return left

    def primary(self):
        k, v = self.peek()
        if (k, v) == ("op", "("):
            self.eat()
            node = self.or_expr()
            self.eat("op", ")")
            return node
        if k == "path":
            self.eat()
            return _Field(v[1:])
        if k == "num":
            self.eat()
            return _Lit(float(v) if "." in v else int(v))
        if k in ("dstr", "sstr"):
            self.eat()
            return _Lit(_unquote(v))
        if k == "regex":
            self.eat()
            return _Lit(v[2:-1], is_regex=True)  # raw: no escape processing
        if k == "word":
            self.eat()
            if v == "true":
                return _Lit(True)
            if v == "false":
                return _Lit(False)
            if v == "null":
                return _Lit(None)
            if v in _FUNCS:
                self.eat("op", "(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_expr())
                    while self.peek() == ("op", ","):
                        self.eat()
                        args.append(self.or_expr())
                self.eat("op", ")")
                return _Func(v, args)
            raise ConditionError(f"unknown identifier {v!r} in {self.src!r}")
        raise ConditionError(f"unexpected {k}:{v!r} in {self.src!r}")


class _Node:
    boolean = False

    def eval(self, batch: pa.Table):
        raise NotImplementedError


class _Field(_Node):
    def __init__(self, path: str):
        self.parts = path.split(".")

    def eval(self, batch: pa.Table):
        name = self.parts[0]
        if name not in batch.column_names:
            return pa.nulls(batch.num_rows)  # missing field → nulls → False
        col = batch[name]
        for part in self.parts[1:]:
            try:
                col = pc.struct_field(col, part)
            except (pa.ArrowInvalid, KeyError):
                return pa.nulls(batch.num_rows)
        return col


class _Lit(_Node):
    def __init__(self, v, is_regex=False):
        self.v = v
        self.is_regex = is_regex
        self.boolean = isinstance(v, bool)

    def eval(self, batch: pa.Table):
        return pa.scalar(self.v)


class _Cmp(_Node):
    boolean = True
    _OPS = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
            "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}

    def __init__(self, op, l, r):
        self.op, self.l, self.r = op, l, r

    def eval(self, batch):
        lv, rv = self.l.eval(batch), self.r.eval(batch)
        # null literal comparisons: `.f == null` means is_null (VRL-ish)
        if isinstance(self.r, _Lit) and self.r.v is None:
            m = pc.is_null(lv)
            return m if self.op == "==" else pc.invert(m)
        try:
            return self._OPS[self.op](lv, rv)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
            # type-mismatched comparison = runtime error → false per event
            return pa.nulls(batch.num_rows, pa.bool_())


class _Bool2(_Node):
    boolean = True

    def __init__(self, op, l, r):
        self.op, self.l, self.r = op, l, r
        if not (l.boolean and r.boolean):
            raise ConditionError("&&/|| operands must be boolean")

    def eval(self, batch):
        l = _to_bool(self.l.eval(batch), batch.num_rows)
        r = _to_bool(self.r.eval(batch), batch.num_rows)
        return pc.or_(l, r) if self.op == "or" else pc.and_(l, r)


class _Not(_Node):
    boolean = True

    def __init__(self, x):
        if not x.boolean:
            raise ConditionError("! operand must be boolean")
        self.x = x

    def eval(self, batch):
        return pc.invert(_to_bool(self.x.eval(batch), batch.num_rows))


class _Func(_Node):
    def __init__(self, name, args):
        self.name, self.args = name, args
        self.boolean = name in ("exists", "is_null", "contains", "starts_with",
                                "ends_with", "match", "match_any", "includes",
                                "is_log", "is_metric", "is_trace")

    def eval(self, batch):
        a = self.args
        n = batch.num_rows
        if self.name in ("is_log", "is_metric", "is_trace"):
            # Condition enum IsLog/IsMetric/IsTrace
            # (src/conditions/mod.rs:23-48): in the columnar model
            # metric rows carry an `mtype` column and trace rows a
            # `ttype` column; logs are everything else
            cols = batch.column_names
            if self.name == "is_metric":
                want = "mtype" in cols
            elif self.name == "is_trace":
                want = "ttype" in cols
            else:
                want = "mtype" not in cols and "ttype" not in cols
            return pa.array([want] * n, pa.bool_())
        if self.name == "exists":
            v = a[0].eval(batch)
            return pc.is_valid(v) if not isinstance(v, pa.Scalar) else pa.array([v.is_valid] * n)
        if self.name == "is_null":
            return pc.is_null(a[0].eval(batch))
        if self.name in ("length", "strlen"):
            return pc.utf8_length(a[0].eval(batch))
        if self.name == "to_string":
            return pc.cast(a[0].eval(batch), pa.string())
        val = a[0].eval(batch)
        if self.name == "contains":
            return pc.match_substring(val, _lit_str(a[1]))
        if self.name == "starts_with":
            return pc.starts_with(val, _lit_str(a[1]))
        if self.name == "ends_with":
            return pc.ends_with(val, _lit_str(a[1]))
        if self.name == "match":
            return pc.match_substring_regex(val, _lit_str(a[1]))
        if self.name == "match_any":
            masks = [pc.match_substring_regex(val, _lit_str(x)) for x in a[1:]]
            out = masks[0]
            for m in masks[1:]:
                out = pc.or_kleene(out, m)
            return out
        if self.name == "includes":
            return pc.is_in(val, value_set=pa.array([x.v for x in a[1:]]))
        raise ConditionError(f"unimplemented function {self.name}")


def _lit_str(node) -> str:
    if not isinstance(node, _Lit) or not isinstance(node.v, str):
        raise ConditionError("expected string literal argument")
    return node.v


def _to_bool(v, n):
    """Resolve an operand to a concrete boolean array: null (= per-event
    runtime error, src/conditions/vrl.rs:115-127) becomes False BEFORE
    any surrounding boolean operator sees it, so `!(error)` is true."""
    if isinstance(v, pa.Scalar):
        return pa.array([bool(v.as_py())] * n, pa.bool_())
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    return pc.fill_null(pc.cast(v, pa.bool_()), False)


def _full_vrl_condition(src: str):
    """Compile a condition via the full VRL compiler (vrl.py): the
    expression runs as `res = <expr>` and the mask is the result column
    with null -> false (src/conditions/vrl.rs:115-127 semantics)."""
    import pyarrow.compute as pc

    from vector_ray.vrl import VrlError, compile_vrl

    try:
        prog = compile_vrl(f"__cond__ = {src}\n.__cond__ = __cond__")
    except VrlError as e:
        raise ConditionError(f"cannot compile condition {src!r}: {e}")

    def fn(batch: pa.Table):
        out, _err, _msg = prog(batch)
        col = out["__cond__"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not pa.types.is_boolean(col.type):
            raise ConditionError(f"condition {src!r} is not boolean")
        return pc.fill_null(col, False)

    return fn


class Condition:
    """Compiled condition: ``cond(batch) -> BooleanArray`` (no nulls)."""

    def __init__(self, source: AnyCondition):
        if isinstance(source, Condition):
            self.source, self._node, self._fn = source.source, source._node, source._fn
        elif isinstance(source, dict):
            # typed condition config (src/conditions/mod.rs:23-48):
            # {type: vrl|datadog_search, source: "..."}
            ctype = source.get("type", "vrl")
            csrc = source.get("source", "")
            if ctype == "datadog_search":
                from vector_ray.datadog_search import compile_datadog_search

                self.source = f"datadog_search:{csrc}"
                self._node, self._fn = None, compile_datadog_search(csrc)
            elif ctype in ("vrl", "is_log", "is_metric", "is_trace"):
                self.source = csrc if ctype == "vrl" else ctype
                try:
                    self._node = _Parser(self.source).parse()
                    self._fn = None
                except ConditionError:
                    # fall back to the FULL VRL compiler for expressions
                    # beyond the fast boolean subset (stdlib predicates,
                    # closures, member access); evaluate the expression
                    # as a program assigning a result column
                    self._node, self._fn = None, _full_vrl_condition(csrc)
            else:
                raise ConditionError(f"unknown condition type {ctype!r}")
        elif callable(source):
            self.source, self._node, self._fn = f"<callable {source!r}>", None, source
        else:
            self.source = source
            self._node = _Parser(source).parse()
            self._fn = None

    def __call__(self, batch: pa.Table):
        if self._fn is not None:
            mask = self._fn(batch)
        else:
            mask = self._node.eval(batch)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        # runtime error / null ⇒ false (src/conditions/vrl.rs:115-127)
        return pc.fill_null(pc.cast(mask, pa.bool_()), False)

    def __repr__(self):
        return f"Condition({self.source!r})"


def compile_condition(source: AnyCondition) -> Condition:
    return Condition(source)


# ---- constant conditions (src/conditions/mod.rs AlwaysPass/AlwaysFail) ----
ALWAYS_PASS = Condition(lambda t: pa.array([True] * t.num_rows))
ALWAYS_FAIL = Condition(lambda t: pa.array([False] * t.num_rows))
