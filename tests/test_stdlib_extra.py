"""Round-2 stdlib breadth (functions/stdlib_extra.py via the VRL
function table); names/semantics per website/cue/reference/remap/
functions/*.cue."""

import pyarrow as pa
import pytest

from vector_ray.vrl import VrlError, compile_vrl


def _t():
    return pa.table({
        "s": ["Hello World", "foo_bar", ""],
        "n": pa.array([42, 7, 255], pa.int64()),
        "f": pa.array([1234.5, 0.125, -3.0], pa.float64()),
        "ip": ["10.1.2.3", "::1", "nope"],
        "js": ['{"a":1}', "junk", "[1,2]"],
        "tags": [["a", "b"], ["c"], []],
        "more": [["x"], ["y", "z"], ["w"]],
        "obj": pa.array([{"u": "1", "v": "2"}] * 3),
        "sev": pa.array([3, 6, 99], pa.int64()),
        "lvl": ["error", "warn", "unknown"],
    })


def test_type_predicates():
    out, _, _ = compile_vrl("""
.ii = is_integer(.n)
.ff = is_float(.f)
.ia = is_array(.tags)
.io = is_object(.obj)
.ie = is_empty(.s)
.inl = is_nullish(.s)
.v4 = is_ipv4(.ip)
.v6 = is_ipv6(.ip)
.ij = is_json(.js)
""")(_t())
    assert out["ii"].to_pylist() == [True] * 3
    assert out["ff"].to_pylist() == [True] * 3
    assert out["ia"].to_pylist() == [True] * 3
    assert out["io"].to_pylist() == [True] * 3
    assert out["ie"].to_pylist() == [False, False, True]
    assert out["inl"].to_pylist() == [False, False, True]
    assert out["v4"].to_pylist() == [True, False, False]
    assert out["v6"].to_pylist() == [False, True, False]
    assert out["ij"].to_pylist() == [True, False, True]


def test_type_assertions():
    t = _t()
    out, err, _ = compile_vrl(".x = int!(.n)")(t)
    assert out["x"].to_pylist() == [42, 7, 255]
    assert not any(err.to_pylist())
    _, err2, _ = compile_vrl(".x = int!(.s)")(t)
    assert all(err2.to_pylist())  # wrong-typed column errors every row
    out3, _, _ = compile_vrl('.x = to_bool(.lvl) ?? false')(
        pa.table({"lvl": ["true", "no", "bogus"]}))
    assert out3["x"].to_pylist() == [True, False, False]


def test_collections_keys_values_merge():
    out, _, _ = compile_vrl("""
.k = keys(.obj)
.v = values(.obj)
.m = merge(.obj, {"v": "9", "w": "3"})
""")(_t())
    assert out["k"].to_pylist()[0] == ["u", "v"]
    assert out["v"].to_pylist()[0] == ["1", "2"]
    assert out["m"].to_pylist()[0] == {"u": "1", "v": "9", "w": "3"}


def test_collections_push_append_zip():
    out, _, _ = compile_vrl("""
.p = push(.tags, "END")
.a = append(.tags, .more)
.z = zip(.tags, .more)
""")(_t())
    assert out["p"].to_pylist() == [["a", "b", "END"], ["c", "END"], ["END"]]
    assert out["a"].to_pylist() == [["a", "b", "x"], ["c", "y", "z"], ["w"]]
    assert out["z"].to_pylist() == [[["a", "x"]], [["c", "y"]], []]


def test_collections_get_remove_unflatten():
    t = pa.table({"o": pa.array([{"a.b": "1", "a.c": "2", "d": "3"}] * 2,
                                pa.struct([("a.b", pa.string()),
                                           ("a.c", pa.string()),
                                           ("d", pa.string())]))})
    out, _, _ = compile_vrl("""
.g = get(.o, ["d"])
.r = remove(.o, ["d"])
.u = unflatten(.o)
""")(t)
    assert out["g"].to_pylist() == ["3", "3"]
    assert out["r"].to_pylist()[0] == {"a.b": "1", "a.c": "2"}
    assert out["u"].to_pylist()[0] == {"a.b": None, "a.c": None,
                                       "d": "3", "a": {"b": "1", "c": "2"}} \
        or out["u"].to_pylist()[0] == {"d": "3", "a": {"b": "1", "c": "2"}}


def test_string_matching():
    out, _, _ = compile_vrl("""
.i = find(.s, "o")
.ca = contains_all(.s, ["o", "l"])
.ma = match_any(.s, ["^Hello", "^zzz"])
.mr = match_array(.tags, "^a$")
""")(_t())
    assert out["i"].to_pylist() == [4, 1, -1]
    assert out["ca"].to_pylist() == [True, False, False]
    assert out["ma"].to_pylist() == [True, False, False]
    assert out["mr"].to_pylist() == [True, False, False]


def test_case_and_format():
    out, _, _ = compile_vrl("""
.pc = pascalcase(.s)
.sc = screamingsnakecase(.s)
.hex = format_int(.n, 16)
.fn = format_number(.f, 2)
""")(_t())
    assert out["pc"].to_pylist() == ["HelloWorld", "FooBar", ""]
    assert out["sc"].to_pylist() == ["HELLO_WORLD", "FOO_BAR", ""]
    assert out["hex"].to_pylist() == ["2a", "7", "ff"]
    assert out["fn"].to_pylist() == ["1,234.50", "0.12", "-3.00"]


def test_syslog_tables():
    out, _, _ = compile_vrl("""
.lv = to_syslog_level(.sev)
.sv = to_syslog_severity(.lvl)
.fa = to_syslog_facility(.sev)
""")(_t())
    assert out["lv"].to_pylist() == ["err", "info", None]
    assert out["sv"].to_pylist() == [3, 4, None]
    assert out["fa"].to_pylist() == ["daemon", "lpr", None]


def test_misc_value_functions():
    out, _, _ = compile_vrl("""
.c = crc(.s)
.u = uuid_v4()
.h = get_hostname()
.ts = now()
""")(_t())
    import zlib
    assert out["c"].to_pylist()[0] == str(zlib.crc32(b"Hello World"))
    us = out["u"].to_pylist()
    assert len(set(us)) == 3 and all(len(u) == 36 and u[14] == "4" for u in us)
    assert all(isinstance(h, str) and h for h in out["h"].to_pylist())
    assert pa.types.is_timestamp(out.schema.field("ts").type)


def test_match_datadog_query_function():
    t = pa.table({"status": ["error", "info", "error"],
                  "service": ["web", "web", "db"]})
    out, _, _ = compile_vrl(
        '.hit = match_datadog_query(., "status:error AND service:web")')(t)
    assert out["hit"].to_pylist() == [True, False, False]
