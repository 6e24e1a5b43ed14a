"""json_paths deserializer — reference-documented behaviors
(lib/codecs/src/decoding/format/json_paths.rs tests, re-expressed)."""

import pytest

from vector_ray.functions.json_paths import (compile_paths,
                                             decode_json_paths,
                                             json_paths_events_table,
                                             normalize_path_key)


def test_identity_operation():
    ev = decode_json_paths('{"meta": {"source": "foo"}}',
                           {"meta": "identity"})
    assert ev == [("meta", {"source": "foo"})]


def test_explode_operation():
    ev = decode_json_paths(
        '{"results": {"records": [{"log": "bar"}, {"log": "baz"}]}}',
        {"results.records": "explode"})
    assert ev == [("results.records", {"log": "bar"}),
                  ("results.records", {"log": "baz"})]


def test_bytes_operation():
    ev = decode_json_paths('{"tail": "foo bar baz"}', {"tail": "bytes"})
    assert ev == [("tail", "foo bar baz")]


def test_bytes_stringifies_containers():
    ev = decode_json_paths('{"tail": {"a": 1}}', {"tail": "bytes"})
    assert ev == [("tail", '{"a":1}')]


def test_order_preservation():
    ev = decode_json_paths(
        '{"meta": {"source": "foo"}, '
        '"results": {"records": [{"log": "bar"}, {"log": "baz"}]}, '
        '"tail": "foo bar baz"}',
        {"meta": "identity", "results.records": "explode",
         "tail": "bytes"})
    assert [e[0] for e in ev] == [
        "meta", "results.records", "results.records", "tail"]


def test_multiple_concatenated_json():
    ev = decode_json_paths(
        '{"meta": {"source": "first"}, "results": {"records": '
        '[{"log": "a"}]}}{"meta": {"source": "second"}, "results": '
        '{"records": [{"log": "b"}, {"log": "c"}]}}',
        {"meta": "identity", "results.records": "explode"})
    assert [e[0] for e in ev] == [
        "meta", "results.records", "meta",
        "results.records", "results.records"]
    assert ev[0][1] != ev[2][1]


def test_newline_delimited_json():
    lines = "\n".join(
        '{"meta": {"source": "line%d"}, "results": {"records": '
        '[{"log": "x"}]}}' % i for i in range(3))
    ev = decode_json_paths(lines, {"meta": "identity",
                                   "results.records": "explode"})
    assert len(ev) == 6
    for i in range(3):
        assert ev[2 * i][0] == "meta"
        assert ev[2 * i + 1][0] == "results.records"


def test_explode_on_non_array_emits_nothing():
    ev = decode_json_paths('{"user": {"id": 1, "name": "Alice"}}',
                           {"user": "explode"})
    assert ev == []


def test_explode_primitive_and_mixed_arrays():
    ev = decode_json_paths('{"numbers": [1, 2, 3]}',
                           {"numbers": "explode"})
    assert ev == [("numbers", 1), ("numbers", 2), ("numbers", 3)]
    ev = decode_json_paths('{"mixed": [1, "two", true, null]}',
                           {"mixed": "explode"})
    assert [e[1] for e in ev] == [1, "two", True, None]


def test_identity_for_array_emits_elements_and_array():
    # elements share the array's path, so identity on an array path
    # emits every element AND the full array (reference
    # test_identity_for_array finds the full-array event among 6)
    ev = decode_json_paths('{"items": [1, 2, 3, 4, 5]}',
                           {"items": "identity"})
    assert len(ev) == 6
    assert ev[-1] == ("items", [1, 2, 3, 4, 5])
    assert [e[1] for e in ev[:5]] == [1, 2, 3, 4, 5]


def test_multiple_arrays_at_same_depth():
    ev = decode_json_paths('{"array1": [1, 2], "array2": [3, 4, 5]}',
                           {"array1": "explode", "array2": "explode"})
    assert len(ev) == 5
    assert sum(1 for e in ev if e[0] == "array1") == 2
    assert sum(1 for e in ev if e[0] == "array2") == 3


def test_explode_deeply_nested_element_objects():
    ev = decode_json_paths(
        '{"events": [{"id": 1, "user": {"name": "Alice", '
        '"profile": {"age": 30}}}]}',
        {"events": "explode"})
    assert len(ev) == 1
    assert ev[0][1]["user"]["profile"]["age"] == 30


def test_root_identity():
    ev = decode_json_paths('{"a": 1}', {".": "identity"})
    assert ev == [("", {"a": 1})]


def test_path_key_normalization():
    assert normalize_path_key(".") == ""
    assert normalize_path_key("") == ""
    assert normalize_path_key(".meta") == "meta"
    assert normalize_path_key("meta") == "meta"
    assert normalize_path_key(".a.b") == "a.b"
    # equivalence: .meta ≡ meta
    a = decode_json_paths('{"meta":{"x":1},"a":{"b":42}}',
                          {".meta": "identity"})
    b = decode_json_paths('{"meta":{"x":1},"a":{"b":42}}',
                          {"meta": "identity"})
    assert a == b


def test_duplicate_normalized_keys_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        compile_paths({".meta": "identity", "meta": "explode"})


def test_empty_config_rejected():
    with pytest.raises(ValueError, match="at least one"):
        compile_paths({})


def test_unknown_operation_rejected():
    with pytest.raises(ValueError, match="unknown json_paths"):
        compile_paths({"a": "implode"})


def test_bad_json_raises():
    with pytest.raises(ValueError):
        decode_json_paths('{invalid json}', {"data": "explode"})


def test_torn_trailing_document_raises():
    # batch engine: every row is a complete capture — a torn trailing
    # document is an error (the reference's cross-frame state is a
    # streaming-transport concern)
    with pytest.raises(ValueError):
        decode_json_paths('{"items": [1', {"items": "explode"})


def test_empty_frame():
    assert decode_json_paths("", {"a": "identity"}) == []
    assert decode_json_paths(b"", {"a": "identity"}) == []


def test_lossy_utf8():
    ev = decode_json_paths(b'{"tail": "ok"}', {"tail": "bytes"})
    assert ev == [("tail", "ok")]


def test_events_table():
    import pyarrow as pa
    col = pa.array(['{"meta": {"s": 1}, "recs": [10, 20]}',
                    None,
                    '{"recs": [30]}'])
    t = json_paths_events_table(col, {"meta": "identity",
                                      "recs": "explode"})
    assert t.column_names == ["row_idx", "event_idx", "expr", "data"]
    assert t["row_idx"].to_pylist() == [0, 0, 0, 2]
    assert t["expr"].to_pylist() == ["meta", "recs", "recs", "recs"]
    assert t["data"].to_pylist() == ['{"s":1}', "10", "20", "30"]
