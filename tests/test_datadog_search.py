"""DatadogSearch condition corpus — mirrors the reference's pass/fail
check table (src/conditions/datadog_search.rs get_checks()) over
single-row Arrow batches."""

import pyarrow as pa
import pytest

from vector_ray.datadog_search import compile_datadog_search


def ev(**cols):
    """single-row event table; tags passed as list[str]."""
    arrays, names = [], []
    for k, v in cols.items():
        names.append(k)
        if isinstance(v, list):
            arrays.append(pa.array([v], pa.list_(pa.string())))
        else:
            arrays.append(pa.array([v]))
    if not names:
        return pa.table({"__empty": pa.array([None], pa.string())})
    return pa.table(dict(zip(names, arrays)))


# (source, pass event, fail event) — transliterated from the reference
CHECKS = [
    ("_exists_:a", ev(tags=["a:foo"]), ev(tags=["b:foo"])),
    ("_exists_:a-b", ev(tags=["a-b:foo"]), ev(tags=["ab:foo"])),
    ("NOT _exists_:a", ev(tags=["b:foo"]), ev(tags=["a:foo"])),
    ("-_exists_:a", ev(tags=["b:foo"]), ev(tags=["a:foo"])),
    ("_exists_:@b", ev(b="foo"), ev(a="foo")),
    ("NOT _exists_:@b", ev(a="foo"), ev(b="foo")),
    ("-_exists_:@b", ev(a="foo"), ev(b="foo")),
    ("_missing_:a", ev(), ev(tags=["a:foo"])),
    ("NOT _missing_:a", ev(tags=["a:foo"]), ev()),
    ("-_missing_:a", ev(tags=["a:foo"]), ev()),
    ("_missing_:@b", ev(a="foo"), ev(b="foo")),
    ("NOT _missing_:@b", ev(b="foo"), ev(a="foo")),
    ("-_missing_:@b", ev(b="foo"), ev(a="foo")),
    # keywords (default field = message, word-boundary)
    ("bla", ev(message="bla"), ev()),
    ("foo", ev(message='{"key": "foo"}'), ev()),
    ("bar", ev(message='{"nested": {"value": ["foo", "bar"]}}'), ev()),
    ("NOT bla", ev(message="nothing"), ev(message="bla")),
    ("-bla", ev(message="nothing"), ev(message="bla")),
    ('"bla"', ev(message="bla"), ev()),
    ('NOT "bla"', ev(), ev(message="bla")),
    ('-"bla"', ev(), ev(message="bla")),
    # tags / reserved
    ("a:bla", ev(tags=["a:bla"]), ev(tags=["b:bla"])),
    ("host:foo", ev(host="foo"), ev(tags=["host:foo"])),
    ("host:foo", ev(host="foo"), ev(host="foobar")),
    ("host:foo", ev(host="foo"), ev(host='{"value": "foo"}')),
    ("NOT a:bla", ev(tags=["b:bla"]), ev(tags=["a:bla"])),
    ("NOT host:foo", ev(tags=["host:fo  o"]), ev(host="foo")),
    ("-a:bla", ev(tags=["b:bla"]), ev(tags=["a:bla"])),
    ("-trace_id:foo", ev(), ev(trace_id="foo")),
    ('a:"bla"', ev(tags=["a:bla"]), ev(a="bla")),
    ('NOT a:"bla"', ev(a="bla"), ev(tags=["a:bla"])),
    ('-a:"bla"', ev(a="bla"), ev(tags=["a:bla"])),
    # attributes
    ("@a:true", ev(a=True), ev(a=False)),
    ("NOT @a:false", ev(a=True), ev(a=False)),
    ("@a:bla", ev(a="bla"), ev(tags=["a:bla"])),
    ("NOT @a:bla", ev(tags=["a:bla"]), ev(a="bla")),
    ("@a:b", ev(a="b"), ev(a="c")),
    (r"@a:va\/lue", ev(a="va/lue"), ev(a="value")),
    (r"@a:va\&&lue", ev(a="va&&lue"), ev(a="value")),
    (r"@a:va\ lue", ev(a="va lue"), ev(a="value")),
    (r"@a:va\||lue", ev(a="va||lue"), ev(a="value")),
    (r"@a:va\(lue", ev(a="va(lue"), ev(a="value")),
    (r"@a:va\*lue", ev(a="va*lue"), ev(a="value")),
    ("@a:va/lue", ev(a="va/lue"), ev(a="value")),
    ("-@a:bla", ev(tags=["a:bla"]), ev(a="bla")),
    ('@a:"bla"', ev(a="bla"), ev(tags=["a:bla"])),
    ('NOT @a:"bla"', ev(tags=["a:bla"]), ev(a="bla")),
    ("@a:200", ev(a=200), ev(tags=["a:200"])),
    ("-@a:200", ev(a=199), ev(a=200)),
    ("@a:0.75", ev(a=0.75), ev(tags=["a:0.75"])),
    ("-@a:0.75", ev(a=0.74), ev(a=0.75)),
    # wildcards (default field)
    ("*bla", ev(message="foobla"), ev(message="blafoo")),
    ("NOT *bla", ev(message="blafoo"), ev(message="foobla")),
    ("-*bla", ev(message="blafoo"), ev(message="foobla")),
    ("bla*", ev(message="blafoo"), ev(message="foobla")),
    ("NOT bla*", ev(message="foobla"), ev(message="blafoo")),
    ("*b*la*", ev(message="foobla"), ev()),
    ("NOT *b*la*", ev(), ev(message="foobla")),
    # wildcards (tags)
    ("a:*bla", ev(tags=["a:foobla"]), ev(tags=["a:blafoo"])),
    ("NOT a:*bla", ev(tags=["a:blafoo"]), ev(tags=["a:foobla"])),
    ("b:bla*", ev(tags=["b:blabop"]), ev(tags=["b:bopbla"])),
    ("c:*b*la*", ev(tags=["c:foobla"]), ev(custom='{"title": "foobla"}')),
    # wildcards (attributes)
    ("@a:*bla", ev(a="foobla"), ev(tags=["a:foobla"])),
    ("NOT @a:*bla", ev(tags=["a:foobla"]), ev(a="foobla")),
    ("@b:bla*", ev(b="blabop"), ev(tags=["b:blabop"])),
    ("@c:*b*la*", ev(c="foobla"), ev(tags=["c:foobla"])),
    # literal tags field
    ("tags:a", ev(tags=["a", "b", "c"]), ev(tags=["d", "e", "f"])),
    ("NOT tags:a", ev(tags=["d", "e", "f"]), ev(tags=["a", "b", "c"])),
    # ranges (default field, lexicographic on strings)
    ("[1 TO 10]", ev(message="1"), ev(message="2")),
    ("NOT [1 TO 10]", ev(message="2"), ev(message="1")),
    ("[50 TO *]", ev(message="6"), ev(message="40")),
    ("[* TO 50]", ev(message="3"), ev(message="6")),
    ("[* TO *]", ev(message="foo"), ev()),
    # ranges (tags)
    ("a:[1 TO 10]", ev(tags=["a:1"]), ev(tags=["a:2"])),
    ("a:[50 TO *]", ev(tags=["a:6"]), ev(tags=["a:40"])),
    ("a:[* TO 50]", ev(tags=["a:400"]), ev(tags=["a:600"])),
    ("a:[* TO *]", ev(tags=["a:test"]), ev(tags=["b:test"])),
    ("NOT a:[1 TO 10]", ev(tags=["a:2"]), ev(tags=["a:1"])),
    # ranges (attributes: numeric vs lexicographic)
    ("@b:[1 TO 10]", ev(b=5), ev(b=11)),
    ("@b:[1 TO 100]", ev(b="10"), ev(b="2")),
    ("NOT @b:[1 TO 10]", ev(b=11), ev(b=5)),
    ("@b:[a TO z]", ev(b="c"), ev(b=5)),
    ('@b:["1" TO "100"]', ev(b="10"), ev(b="2")),
    ('NOT @b:["1" TO "100"]', ev(b="2"), ev(b="10")),
    # exclusive ranges
    ("f:{1 TO 100}", ev(tags=["f:10"]), ev(tags=["f:1"])),
    ("f:{1 TO 100}", ev(tags=["f:10"]), ev(tags=["f:100"])),
    ("NOT f:{1 TO 100}", ev(tags=["f:1"]), ev(tags=["f:10"])),
    ("@f:{1 TO 100}", ev(f=50), ev(f=1)),
    ("@f:{1 TO 100}", ev(f=50), ev(f=100)),
    ("NOT @f:{1 TO 100}", ev(f=1), ev(f=50)),
    # boolean composition
    ("@field:(value1 OR value2)", ev(field="value1"), ev(field="value")),
    ("@field:value1 OR @field:value2", ev(field="value1"), ev(field="value")),
    ("-@field:value1 OR -@field:value2", ev(field="value"), ev(field="value2")),
    ("@field:value @field2:value2",
     ev(field="value", field2="value2"), ev(field="value", field2="value3")),
    ("@field:(value1 OR \n value2)", ev(field="value1"), ev(field="value")),
    ("NOT (@field:true AND @field2:value2)",
     ev(field=False, field2="value2"), ev(field=True, field2="value2")),
]


@pytest.mark.parametrize("source,ok,bad", CHECKS,
                         ids=[c[0] for c in CHECKS])
def test_reference_corpus(source, ok, bad):
    cond = compile_datadog_search(source)
    assert cond(ok).to_pylist() == [True], f"{source!r} should pass"
    assert cond(bad).to_pylist() == [False], f"{source!r} should fail"


def test_condition_dict_dispatch():
    from vector_ray.conditions import compile_condition

    t = pa.table({"message": ["hello world", "bye"],
                  "status": ["error", "info"]})
    c = compile_condition({"type": "datadog_search", "source": "status:error"})
    assert c(t).to_pylist() == [True, False]
    c2 = compile_condition({"type": "vrl", "source": '.status == "info"'})
    assert c2(t).to_pylist() == [False, True]


def test_batch_vectorized_multi_row():
    t = pa.table({
        "message": ["request failed", "ok", None],
        "status": ["error", "info", "warn"],
        "tags": pa.array([["env:prod", "az:1"], ["env:dev"], None],
                         pa.list_(pa.string())),
        "latency": [300, 20, 90],
    })
    assert compile_datadog_search("status:error OR env:dev")(t).to_pylist() \
        == [True, True, False]
    assert compile_datadog_search("failed")(t).to_pylist() == [True, False, False]
    assert compile_datadog_search("@latency:>100")(t).to_pylist() \
        == [True, False, False]
    assert compile_datadog_search("@latency:[20 TO 100]")(t).to_pylist() \
        == [False, True, True]
    assert compile_datadog_search("-env:prod")(t).to_pylist() \
        == [False, True, True]
