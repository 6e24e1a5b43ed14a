"""Property tests (hypothesis): the flat-space numpy collection
kernels and vectorized closures must agree with the obvious per-row
Python reference on arbitrary ragged inputs."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_ray.functions import stdlib_extra as ex
from vector_ray.vrl import compile_vrl

_texts = st.text(alphabet="abcXYZ0 _", max_size=8)
_row = st.lists(_texts, max_size=6)
_rows = st.lists(_row, min_size=1, max_size=20)


def _lists(rows):
    return pa.array(rows, pa.list_(pa.string()))


@settings(max_examples=60, deadline=None)
@given(_rows, _texts)
def test_push_matches_python(rows, item):
    got = ex.push_(_lists(rows), item).to_pylist()
    assert got == [r + [item] for r in rows]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_row, _row), min_size=1, max_size=20))
def test_append_matches_python(pairs):
    a = _lists([p[0] for p in pairs])
    b = _lists([p[1] for p in pairs])
    got = ex.append_(a, b).to_pylist()
    assert got == [p[0] + p[1] for p in pairs]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_row, _row), min_size=1, max_size=20))
def test_zip_matches_python(pairs):
    a = _lists([p[0] for p in pairs])
    b = _lists([p[1] for p in pairs])
    got = ex.zip_(a, b).to_pylist()
    want = [[[x, y] for x, y in zip(p[0], p[1])] for p in pairs]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(_rows)
def test_closure_filter_matches_python(rows):
    t = pa.table({"xs": _lists(rows)})
    out, _, _ = compile_vrl(
        '.ys = filter(.xs) -> |i, v| { v != "" }')(t)
    assert out["ys"].to_pylist() == [[v for v in r if v != ""] for r in rows]


@settings(max_examples=60, deadline=None)
@given(_rows)
def test_closure_map_values_matches_python(rows):
    t = pa.table({"xs": _lists(rows)})
    out, _, _ = compile_vrl(
        '.ys = map_values(.xs) -> |v| { upcase(v) }')(t)
    assert out["ys"].to_pylist() == [[v.upper() for v in r] for r in rows]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab=&x1", max_size=12), min_size=1,
                max_size=15))
def test_parse_csv_unquoted_matches_split(vals):
    import pyarrow.compute as pc

    from vector_ray.functions.parse_logs import parse_csv

    col = pa.array(vals, pa.string())
    got = parse_csv(col).to_pylist()
    assert got == [v.split(",") for v in vals]


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(alphabet='ab "\\=\n\r\t_0', max_size=14),
                min_size=1, max_size=10))
def test_logfmt_encode_parse_roundtrip(vals):
    """Every value must survive encode_logfmt -> parse_key_value exactly
    (quoting, backslash/quote/newline escapes), and every encoded
    record must stay on one line."""
    from vector_ray.functions.encode import encode_logfmt
    from vector_ray.functions.parse import parse_key_value

    t = pa.table({"k": pa.array(vals, pa.string()),
                  "z": [str(i) for i in range(len(vals))]})
    enc = encode_logfmt(t)
    assert all("\n" not in (x or "") and "\r" not in (x or "")
               for x in enc.to_pylist())
    back = parse_key_value(enc, ["k", "z"])
    assert back["k"].to_pylist() == vals
    assert back["z"].to_pylist() == [str(i) for i in range(len(vals))]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet='ab ",\n\t_0', max_size=14),
                min_size=1, max_size=10))
def test_csv_encode_parse_roundtrip(vals):
    from vector_ray.functions.encode import encode_csv
    from vector_ray.functions.parse_logs import parse_csv

    t = pa.table({"a": pa.array(vals, pa.string()),
                  "b": [str(i) for i in range(len(vals))]})
    enc = encode_csv(t)
    back = parse_csv(enc).to_pylist()
    assert [r[0] for r in back] == vals
    assert [r[1] for r in back] == [str(i) for i in range(len(vals))]
