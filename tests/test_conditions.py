"""Condition compiler semantics vs src/conditions/ (SURVEY §2.2)."""

import pyarrow as pa
import pytest

from vector_ray.conditions import Condition, ConditionError

T = pa.table(
    {
        "role": ["user", "assistant", None, "tool"],
        "level": ["error", "info", "error", None],
        "n": [1, 2, 3, None],
        "text": ["hello world", "JSON {x}", "", None],
    }
)


def m(src):
    return Condition(src)(T).to_pylist()


def test_eq():
    assert m('.role == "assistant"') == [False, True, False, False]


def test_ne_null_is_false():
    # null operand = runtime error => false (src/conditions/vrl.rs:115-127)
    assert m('.level != "info"') == [True, False, True, False]


def test_numeric_cmp():
    assert m(".n >= 2") == [False, True, True, False]


def test_bool_algebra():
    assert m('.role == "user" || .level == "error"') == [True, False, True, False]
    assert m('.role == "user" && .level == "error"') == [True, False, False, False]
    assert m('!(.role == "user")') == [False, True, True, True]


def test_exists():
    assert m("exists(.role)") == [True, True, False, True]
    assert m("exists(.missing)") == [False, False, False, False]


def test_is_null():
    assert m("is_null(.n)") == [False, False, False, True]
    assert m(".n == null") == [False, False, False, True]


def test_string_funcs():
    assert m('contains(.text, "world")') == [True, False, False, False]
    assert m('starts_with(.text, "hello")') == [True, False, False, False]
    assert m('ends_with(.text, "}")') == [False, True, False, False]
    assert m(r'match(.text, r"^J\w+")') == [False, True, False, False]


def test_includes():
    assert m('includes(.role, "user", "tool")') == [True, False, False, True]


def test_missing_column_false():
    assert m('.nope == "x"') == [False, False, False, False]


def test_non_boolean_rejected():
    # non-boolean condition is a compile error (vrl.rs:115-127 panics)
    with pytest.raises(ConditionError):
        Condition(".n")
    with pytest.raises(ConditionError):
        Condition('"just a string"')


def test_callable_condition():
    import pyarrow.compute as pc

    c = Condition(lambda t: pc.equal(t["role"], "user"))
    assert c(T).to_pylist() == [True, False, False, False]


def test_type_mismatch_is_false():
    assert m('.n == "2"') == [False, False, False, False]


def test_is_log_is_metric():
    logs = pa.table({"x": [1, 2]})
    metrics = pa.table({"mtype": ["counter"], "value": [1.0]})
    assert Condition("is_log()")(logs).to_pylist() == [True, True]
    assert Condition("is_log()")(metrics).to_pylist() == [False]
    assert Condition("is_metric()")(metrics).to_pylist() == [True]
    assert Condition("is_metric()")(logs).to_pylist() == [False, False]
