"""SQL set operations (stages/setops.set_op) vs DuckDB — bag
semantics, NULL-equality, and multi-block layouts."""
import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.setops import set_op


def _run(left_rows, right_rows, columns, op, all_, blocks=3):
    l = rd.from_arrow(pa.Table.from_pylist(left_rows)).repartition(blocks)
    r = rd.from_arrow(pa.Table.from_pylist(right_rows)).repartition(blocks)
    got = set_op(l, r, columns=columns, op=op, all=all_).to_pandas()
    return got.sort_values(columns).reset_index(drop=True)


def _sql(left_rows, right_rows, columns, kw):
    con = duckdb.connect()
    con.register("l", pd.DataFrame(left_rows))
    con.register("r", pd.DataFrame(right_rows))
    cols = ", ".join(columns)
    want = con.sql(
        f"SELECT {cols} FROM l {kw} SELECT {cols} FROM r").df()
    con.close()
    return want.sort_values(columns).reset_index(drop=True)


L = ([{"k": "a", "v": 1}] * 3 + [{"k": "b", "v": 2}] * 2
     + [{"k": "c", "v": 3}] + [{"k": "d", "v": 4}] * 4)
R = ([{"k": "a", "v": 1}] * 1 + [{"k": "b", "v": 2}] * 5
     + [{"k": "e", "v": 9}] * 2)


@pytest.mark.parametrize("op,all_,kw", [
    ("intersect", False, "INTERSECT"),
    ("intersect", True, "INTERSECT ALL"),
    ("except", False, "EXCEPT"),
    ("except", True, "EXCEPT ALL"),
])
def test_bag_semantics_match_duckdb(ray_session, op, all_, kw):
    got = _run(L, R, ["k", "v"], op, all_)
    want = _sql(L, R, ["k", "v"], kw)
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()))


def test_nulls_compare_equal(ray_session):
    # SQL set ops treat NULL = NULL as a match (unlike joins)
    l = [{"k": None, "v": 1}, {"k": None, "v": 1}, {"k": "a", "v": None},
         {"k": "a", "v": 2}]
    r = [{"k": None, "v": 1}, {"k": "a", "v": None}]
    got = _run(l, r, ["k", "v"], "intersect", True, blocks=2)
    want = _sql(l, r, ["k", "v"], "INTERSECT ALL")
    assert len(got) == len(want) == 2
    got_set = set(map(tuple,
                      got.astype(object).where(pd.notna(got), None).values))
    want_set = set(map(tuple,
                       want.astype(object).where(pd.notna(want), None).values))
    assert got_set == want_set

    got_e = _run(l, r, ["k", "v"], "except", True, blocks=2)
    want_e = _sql(l, r, ["k", "v"], "EXCEPT ALL")
    assert len(got_e) == len(want_e) == 2


def test_except_distinct_right_only_rows_never_appear(ray_session):
    got = _run(L, R, ["k"], "except", False)
    assert got["k"].tolist() == ["c", "d"]


def test_single_column_and_block_layouts(ray_session):
    for blocks in (1, 7):
        got = _run(L, R, ["k"], "intersect", True, blocks=blocks)
        want = _sql(L, R, ["k"], "INTERSECT ALL")
        pd.testing.assert_frame_equal(
            got, want.astype(got.dtypes.to_dict()))


def test_bad_op_raises(ray_session):
    l = rd.from_arrow(pa.Table.from_pylist(L))
    with pytest.raises(ValueError):
        set_op(l, l, columns=["k"], op="union")


def test_differential_fuzz_vs_duckdb(ray_session):
    """Seeded random tables (with nulls) through all 4 modes; DuckDB
    computes the same op on the same frames.  Multisets must match
    exactly (NaN-safe object compare)."""
    import numpy as np

    rng = np.random.default_rng(2024)
    for trial in range(6):
        nl, nr = rng.integers(5, 200, 2)
        def mk(n):
            k = rng.choice(["a", "b", "c", None], size=n,
                           p=[.4, .3, .2, .1])
            v = rng.integers(0, 5, n).astype(object)
            v[rng.random(n) < 0.1] = None
            return [{"k": kk, "v": vv} for kk, vv in zip(k, v)]
        lrows, rrows = mk(nl), mk(nr)
        op = ("intersect", "except")[trial % 2]
        al = bool(trial % 3)
        kw = (("INTERSECT" if op == "intersect" else "EXCEPT")
              + (" ALL" if al else ""))
        got = _run(lrows, rrows, ["k", "v"], op, al,
                   blocks=int(rng.integers(1, 6)))
        want = _sql(lrows, rrows, ["k", "v"], kw)
        assert len(got) == len(want), (trial, kw, len(got), len(want))
        g = sorted(map(tuple, got.astype(object).where(
            pd.notna(got), None).values), key=repr)
        w = sorted(map(tuple, want.astype(object).where(
            pd.notna(want), None).values), key=repr)
        assert g == w, (trial, kw)
