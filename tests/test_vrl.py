"""VRL-subset program compiler (config-borne remap source strings)."""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.remap import remap
from vector_ray.vrl import VrlError, compile_vrl


def _batch():
    return pa.table({
        "conv_id": ["c"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "text": [
            "2024-01-01T00:00:00Z level=ERROR tool=bash latency_ms=7 msg=x",
            "free text",
            "2024-01-01T00:00:01Z level=info tool=web latency_ms=9 msg=y",
            "also free",
        ],
        "role": ["User", "Assistant", "Tool", "System"],
    })


GROK = "%{TIMESTAMP_ISO8601:gts} level=%{WORD:lvl} tool=%{NOTSPACE:gtool} latency_ms=%{INT:lat} msg=%{GREEDYDATA:gmsg}"


def test_assign_merge_and_functions():
    prog = compile_vrl(f"""
# parse then normalize
. = parse_grok!(.text, "{GROK}")
.lvl = downcase(.lvl)
.lat = to_int!(.lat)
.role = downcase(.role)
.tag = "static"
del(.gts)
""")
    out, err, _ = prog(_batch())
    assert out["lvl"].to_pylist() == ["error", None, "info", None]
    assert out["lat"].to_pylist() == [7, None, 9, None]
    assert out["role"].to_pylist() == ["user", "assistant", "tool", "system"]
    assert out["tag"].to_pylist() == ["static"] * 4
    assert "gts" not in out.column_names
    # grok! marks non-matching rows as errors
    assert err.to_pylist() == [False, True, False, True]


def test_fallible_vs_infallible():
    t = pa.table({"v": ["5", "x", None]})
    out, err, _ = compile_vrl(".n = to_int(.v)")(t)
    assert out["n"].to_pylist() == [5, None, None]
    assert err.to_pylist() == [False, False, False]  # no bang: silent null
    out, err, _ = compile_vrl(".n = to_int!(.v)")(t)
    # bang: parse failure is an error; null input is not (VRL coalesces)
    assert err.to_pylist() == [False, True, False]


def test_abort_if():
    t = pa.table({"lvl": ["info", "debug"]})
    _, err, _ = compile_vrl('abort_if(.lvl == "debug")')(t)
    assert err.to_pylist() == [False, True]


def test_parse_json_statement():
    t = pa.table({"text": ['{"a": "1"}', "junk", '{"broken']})
    out, err, _ = compile_vrl('. = parse_json!(.text, "a")')(t)
    assert out["a"].to_pylist() == ["1", None, None]
    assert err.to_pylist() == [False, False, True]  # only true JSON failures


def test_bad_statement_rejected():
    with pytest.raises(VrlError):
        compile_vrl(".x = while(true)")
    with pytest.raises(VrlError):
        compile_vrl("something weird")


def test_vrl_in_topology():
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml("""
sources:
  t: {type: transcripts, sf_dir: /root/testdata/sf0.001}
transforms:
  norm:
    type: remap
    inputs: [t]
    source: |
      .role = upcase(.role)
      .tool_hash = md5(.tool)
sinks:
  out: {type: blackhole, inputs: [norm]}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 6000


def test_vrl_with_remap_stage_error_policy():
    ds = rd.from_arrow(_batch())
    prog = compile_vrl(f'. = parse_grok!(.text, "{GROK}")')
    res = remap(ds, prog, drop_on_error=True, reroute_dropped=True)
    assert res.primary.count() == 2
    assert res.dropped.count() == 2


def test_coalescing_operator():
    t = pa.table({"v": ["5", "x", None]})
    out, err, _ = compile_vrl(".n = to_int(.v) ?? 0")(t)
    assert out["n"].to_pylist() == [5, 0, 0]
    assert err.to_pylist() == [False, False, False]
    out2, _, _ = compile_vrl('.w = .missing ?? "dflt"')(t)
    assert out2["w"].to_pylist() == ["dflt"] * 3


def test_bare_abort():
    t = pa.table({"x": [1, 2]})
    _, err, _ = compile_vrl("abort")(t)
    assert err.to_pylist() == [True, True]


def test_if_guarded_assignment():
    t = pa.table({"lvl": ["error", "info", None], "n": [1, 2, 3]})
    out, err, _ = compile_vrl('if (.lvl == "error") { .alert = "page" }')(t)
    assert out["alert"].to_pylist() == ["page", None, None]
    assert err.to_pylist() == [False, False, False]
    # overwrite-under-guard keeps the prior value elsewhere
    out2, _, _ = compile_vrl('.sev = "low"\nif (.lvl == "error") { .sev = "high" }')(t)
    assert out2["sev"].to_pylist() == ["high", "low", "low"]


def test_if_guarded_del_nulls_matching_rows():
    # per-row delete has no columnar analogue: the guarded rows are
    # nulled, others keep their value (round-2 semantics)
    t = pa.table({"x": [1, 2, 1], "y": ["a", "b", "c"]})
    out, _, _ = compile_vrl("if (.x == 1) { del(.y) }")(t)
    assert out["y"].to_pylist() == [None, "b", None]


def test_if_else_chain():
    t = pa.table({"lvl": ["error", "warning", "info", None]})
    out, _, _ = compile_vrl("""
if .lvl == "error" {
    .sev = "high"
} else if starts_with(.lvl, "warn") {
    .sev = "med"
} else {
    .sev = "low"
}
""")(t)
    assert out["sev"].to_pylist() == ["high", "med", "low", "low"]


def test_nested_assignment_target():
    t = pa.table({"a": [1, 2]})
    out, _, _ = compile_vrl('.attrs.env = "prod"\n.attrs.ver = .a')(t)
    assert out["attrs"].to_pylist() == [
        {"env": "prod", "ver": 1}, {"env": "prod", "ver": 2}]


def test_local_variables():
    t = pa.table({"role": ["user", "tool"]})
    out, _, _ = compile_vrl("tmp = upcase(.role)\n.role = tmp")(t)
    assert out["role"].to_pylist() == ["USER", "TOOL"]


def test_arithmetic_and_string_concat():
    t = pa.table({"n": [2, 3], "s": ["a", "b"]})
    out, _, _ = compile_vrl('.m = .n * 2 + 1\n.t = .s + "!"')(t)
    assert out["m"].to_pylist() == [5, 7]
    assert out["t"].to_pylist() == ["a!", "b!"]


def test_coalesce_inside_expression():
    t = pa.table({"v": ["5", "x"]})
    out, _, _ = compile_vrl(".n = (to_int(.v) ?? 0) + 1")(t)
    assert out["n"].to_pylist() == [6, 1]


def test_abort_inside_if_marks_only_branch_rows():
    t = pa.table({"lvl": ["debug", "info"]})
    _, err, _ = compile_vrl('if .lvl == "debug" { abort }')(t)
    assert err.to_pylist() == [True, False]


def test_guarded_fallible_error_scoped_to_branch():
    t = pa.table({"kind": ["num", "junk"], "v": ["nope", "nope"]})
    # the fallible to_int! only runs (and only errors) on kind=="num" rows
    _, err, _ = compile_vrl('if .kind == "num" { .n = to_int!(.v) }')(t)
    assert err.to_pylist() == [True, False]


def test_nested_path_argument():
    t = pa.table({"o": pa.array([{"x": "5"}, {"x": "nope"}, None],
                  pa.struct([("x", pa.string())]))})
    out, err, _ = compile_vrl(".v = to_int(.o.x)")(t)
    assert out["v"].to_pylist() == [5, None, None]


def test_stdlib_breadth_round2():
    t = pa.table({
        "s": ["Hello World", "foo_bar baz"],
        "n": pa.array([-3.7, 2.2], pa.float64()),
        "ip": ["10.1.2.3", "192.168.0.9"],
        "csv": ["a,b,a", "x,y,z"],
    })
    prog = compile_vrl("""
.cap = capitalize(.s)
.snake = snakecase(.s)
.kebab = kebabcase(.s)
.h = sha1(.s)
.b16 = encode_base16(.s)
.rt = decode_base16(.b16)
.absn = abs(.n)
.rounded = round(.n)
.in_net = ip_cidr_contains(.ip, "10.0.0.0/8")
.net = ip_subnet!(.ip, 24)
.parts = split(.csv, ",")
.uniq = unique(.parts)
.rejoined = join(.parts, "|")
""")
    out, err, _ = prog(t)
    assert out["cap"].to_pylist() == ["Hello world", "Foo_bar baz"]
    assert out["snake"].to_pylist() == ["hello_world", "foo_bar_baz"]
    assert out["kebab"].to_pylist() == ["hello-world", "foo-bar-baz"]
    assert out["rt"].to_pylist() == ["Hello World", "foo_bar baz"]
    assert out["absn"].to_pylist() == [3.7, 2.2]
    assert out["rounded"].to_pylist() == [-4.0, 2.0]
    assert out["in_net"].to_pylist() == [True, False]
    assert out["net"].to_pylist() == ["10.1.2.0", "192.168.0.0"]
    assert out["parts"].to_pylist() == [["a", "b", "a"], ["x", "y", "z"]]
    assert out["uniq"].to_pylist() == [["a", "b"], ["x", "y", "z"]]
    assert out["rejoined"].to_pylist() == ["a|b|a", "x|y|z"]
    assert not any(err.to_pylist())


def test_array_and_object_literals():
    t = pa.table({"n": pa.array([1, 2], pa.int64()), "s": ["a", "b"]})
    out, err, _ = compile_vrl("""
.consts = [10, 20, 30]
.mixed = [.n, 99]
.obj = {"env": "prod", "num": .n, "tag": .s}
""")(t)
    assert out["consts"].to_pylist() == [[10, 20, 30], [10, 20, 30]]
    assert out["mixed"].to_pylist() == [[1, 99], [2, 99]]
    assert out["obj"].to_pylist() == [
        {"env": "prod", "num": 1, "tag": "a"},
        {"env": "prod", "num": 2, "tag": "b"},
    ]
    assert not any(err.to_pylist())


def test_object_literal_merge():
    t = pa.table({"n": pa.array([5], pa.int64())})
    out, _, _ = compile_vrl('. = {"a": .n, "b": "x"}')(t)
    assert out["a"].to_pylist() == [5]
    assert out["b"].to_pylist() == ["x"]


# ---------------------------------------------------------------------------
# closures — map_values / map_keys / filter / for_each
# (website/cue/reference/remap/functions/{map_values,filter,...}.cue)
# ---------------------------------------------------------------------------

def _tags_table():
    return pa.table({
        "tags": [["foo", "bar", "foo", "baz"], ["x", "foo"], None, []],
        "attrs": pa.array([{"a": "p", "b": "q"}] * 4),
        "n": pa.array([1, 2, 3, 4], pa.int64()),
    })


def test_closure_filter_array():
    # filter.cue example: drop elements equal to "foo"
    out, err, _ = compile_vrl(
        '.tags = filter(.tags) -> |_index, value| { value != "foo" }'
    )(_tags_table())
    assert out["tags"].to_pylist() == [["bar", "baz"], ["x"], None, []]
    assert not any(err.to_pylist())


def test_closure_filter_array_by_index():
    out, _, _ = compile_vrl(
        '.first2 = filter(.tags) -> |i, v| { i < 2 }'
    )(_tags_table())
    assert out["first2"].to_pylist() == [["foo", "bar"], ["x", "foo"], None, []]


def test_closure_map_values_array():
    out, _, _ = compile_vrl(
        '.tags = map_values(.tags) -> |v| { upcase(v) }'
    )(_tags_table())
    assert out["tags"].to_pylist() == [
        ["FOO", "BAR", "FOO", "BAZ"], ["X", "FOO"], None, []]


def test_closure_array_sees_parent_scope():
    # paths and parent variables broadcast into flat space
    out, _, _ = compile_vrl("""
pref = "t-"
.tags = map_values(.tags) -> |v| { pref + v + to_string(.n) }
""")(_tags_table())
    assert out["tags"].to_pylist()[0] == ["t-foo1", "t-bar1", "t-foo1", "t-baz1"]
    assert out["tags"].to_pylist()[1] == ["t-x2", "t-foo2"]


def test_closure_map_values_object():
    # map_values.cue example: upcase all values
    out, _, _ = compile_vrl(
        '.attrs = map_values(.attrs) -> |v| { upcase(v) }'
    )(_tags_table())
    assert out["attrs"].to_pylist()[0] == {"a": "P", "b": "Q"}


def test_closure_map_keys_object():
    # map_keys.cue example: upcase all keys
    out, _, _ = compile_vrl(
        '.attrs = map_keys(.attrs) -> |k| { upcase(k) }'
    )(_tags_table())
    assert out["attrs"].to_pylist()[0] == {"A": "p", "B": "q"}


def test_closure_filter_object_drops_unmatched_key():
    out, _, _ = compile_vrl(
        '.attrs = filter(.attrs) -> |k, v| { k == "a" }'
    )(_tags_table())
    assert out["attrs"].to_pylist()[0] == {"a": "p"}


def test_closure_for_each_object_accumulates():
    # for_each.cue: parent-scope mutations persist for object iteration
    out, _, _ = compile_vrl("""
acc = ""
for_each(.attrs) -> |k, v| { acc = acc + k + "=" + v + ";" }
.kv = acc
""")(_tags_table())
    assert out["kv"].to_pylist()[0] == "a=p;b=q;"


def test_closure_bang_error_folds_to_row():
    t = pa.table({"xs": [["1", "2"], ["3", "oops"], ["7"]]})
    out, err, _ = compile_vrl(
        '.ns = map_values!(.xs) -> |v| { to_int!(v) }'
    )(t)
    assert err.to_pylist() == [False, True, False]
    assert out["ns"].to_pylist()[0] == [1, 2]


def test_closure_local_vars_scoped():
    with pytest.raises(VrlError):
        compile_vrl("""
.x = map_values(.tags) -> |v| { inner = v; v }
.y = inner
""")


def test_closure_param_arity_checked():
    t = _tags_table()
    with pytest.raises(VrlError):
        compile_vrl('.x = filter(.tags) -> |v| { v != "a" }')(t)
    with pytest.raises(VrlError):
        compile_vrl('.x = map_values(.tags)')


def test_replace_with_closure():
    # replace_with.cue: closure receives {string, captures}; all
    # matches replaced, replacements never re-matched
    t = pa.table({"msg": ["card=1234 and card=9876 ok", "no cards here",
                          "card=5555", None]})
    out, err, _ = compile_vrl(
        '.msg = replace_with(.msg, r"card=(\\d+)") -> |m| '
        '{ "card=[" + m.captures[0] + "]" }')(t)
    assert out["msg"].to_pylist() == [
        "card=[1234] and card=[9876] ok", "no cards here",
        "card=[5555]", None]
    assert not any(err.to_pylist())


def test_replace_with_whole_match_and_postfix():
    out, _, _ = compile_vrl(
        '.m = replace_with(.m, r"[a-z]+") -> |mm| { upcase(mm.string) + "!" }'
    )(pa.table({"m": ["a1 bb22"]}))
    assert out["m"].to_pylist() == ["A!1 BB!22"]


def test_member_and_index_postfix():
    t = pa.table({"tags": [["x", "y"], ["z"]],
                  "o": pa.array([{"a": {"b": "v1"}}, {"a": {"b": "v2"}}])})
    out, _, _ = compile_vrl("""
tmp = .o
.deep = tmp.a.b
arr = .tags
.first = arr[0]
""")(t)
    assert out["deep"].to_pylist() == ["v1", "v2"]
    assert out["first"].to_pylist() == ["x", "z"]


def test_string_literal_escapes_non_ascii():
    """Regression: encode().decode('unicode_escape') mojibake'd every
    non-ASCII literal ("café" -> 'cafÃ©') because UTF-8 bytes were
    reinterpreted as latin-1."""
    t = pa.table({"x": ["a", "b"]})
    out, _, _ = compile_vrl('.tag = "café ☕"')(t)
    assert out["tag"].to_pylist() == ["café ☕"] * 2
    out, _, _ = compile_vrl('.tag = "line1\\nline2\\t\\"q\\" \\\\ \\u{1F600}"')(t)
    assert out["tag"].to_pylist() == ['line1\nline2\t"q" \\ \U0001F600'] * 2


def test_regex_literal_raw_semantics():
    """r"..." keeps backslash sequences verbatim (raw-string semantics):
    \\d must survive as a regex class, \\\\ must not collapse."""
    t = pa.table({"x": ["a1 b22", "no digits"]})
    out, _, _ = compile_vrl(r'.m = match(.x, r"\d+")')(t)
    assert out["m"].to_pylist() == [True, False]
    t2 = pa.table({"x": ["a\\b", "ab"]})
    out, _, _ = compile_vrl(r'.m = match(.x, r"a\\b")')(t2)
    assert out["m"].to_pylist() == [True, False]


def test_to_int_to_float_numeric_coercions():
    """VRL to_int/to_float on non-string inputs (vrl stdlib
    to_int.md coercions): float truncates toward zero, int/bool cast,
    timestamp -> unix seconds."""
    import pyarrow as pa

    from vector_ray.vrl import compile_vrl

    prog = compile_vrl("""
.i = to_int(.f)
.j = to_int(.n)
.k = to_int(.b)
.s = to_int(.ts)
.x = to_float(.n)
""")
    t = pa.table({
        "f": pa.array([185.22, -2.9, 0.0]),
        "n": pa.array([7, -3, 0], pa.int32()),
        "b": pa.array([True, False, True]),
        "ts": pa.array([1_500_000_000_000_000, 0, 2_000_000_123_456_789],
                       pa.timestamp("us")),
    })
    out, _, _ = prog(t)
    assert out["i"].to_pylist() == [185, -2, 0]      # trunc toward zero
    assert out["j"].to_pylist() == [7, -3, 0]
    assert out["k"].to_pylist() == [1, 0, 1]
    assert out["s"].to_pylist() == [1_500_000_000, 0, 2_000_000_123]
    assert out["x"].to_pylist() == [7.0, -3.0, 0.0]


def test_to_int_to_float_timestamp_units():
    """to_int(ts) is unix SECONDS regardless of the column's storage
    unit (s/ms/us/ns all normalize); to_float(ts) is fractional unix
    seconds (vrl stdlib to_float.md)."""
    from vector_ray.functions.parse import parse_float, parse_int

    for unit, raw in (("s", 1_500_000_000),
                      ("ms", 1_500_000_000_000),
                      ("us", 1_500_000_000_000_000),
                      ("ns", 1_500_000_000_000_000_000)):
        col = pa.array([raw], pa.timestamp(unit))
        assert parse_int(col).to_pylist() == [1_500_000_000], unit
        assert parse_float(col).to_pylist() == [1_500_000_000.0], unit
    # fractional seconds survive to_float
    half = pa.array([1_500_000_000_500_000], pa.timestamp("us"))
    assert parse_float(half).to_pylist() == [1_500_000_000.5]
