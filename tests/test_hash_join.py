"""stages/hash_join.py: union-shuffle + per-partition acero join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.stages.hash_join import hash_partition_join


@pytest.fixture
def sides():
    rng = np.random.default_rng(21)
    L = pd.DataFrame({
        "k": rng.integers(0, 40, 300),
        "c": rng.integers(0, 3, 300),
        "lx": np.arange(300),
        "name": [f"l{i}" for i in range(300)],   # clashes with right
    })
    R = pd.DataFrame({
        "k": rng.integers(0, 40, 150),
        "c": rng.integers(0, 3, 150),
        "name": [f"r{i}" for i in range(150)],
        "ry": np.arange(150),
    })
    return L, R


def _ds(df, n):
    return rd.from_pandas(df).repartition(n)


def test_inner_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 5), _ds(R, 3), on=["k", "c"], how="inner",
        num_partitions=7).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="inner",
                  suffixes=("", "_r"))
    assert sorted(got.columns) == sorted(exp.columns)
    key = ["k", "c", "lx", "ry"]
    assert (sorted(map(tuple, got[key].to_numpy().tolist()))
            == sorted(map(tuple, exp[key].to_numpy().tolist())))
    # clashing non-key column got the suffix; values line up per pair
    m = got.set_index(["lx", "ry"])
    e = exp.set_index(["lx", "ry"])
    assert m["name_r"].to_dict() == e["name_r"].to_dict()


def test_left_anti_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 4), _ds(R, 2), on=["k", "c"], how="left_anti",
        num_partitions=5).to_pandas()
    m = L.merge(R[["k", "c"]].drop_duplicates(), on=["k", "c"],
                how="left", indicator=True)
    exp = m[m["_merge"] == "left_only"]
    assert sorted(got["lx"]) == sorted(exp["lx"])
    assert list(got.columns) == list(L.columns)


def test_string_keys_and_empty_right(ray_session):
    L = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    R = pd.DataFrame({"k": ["b"], "w": [9]})
    got = hash_partition_join(_ds(L, 2), _ds(R, 1), on=["k"],
                              how="inner", num_partitions=3).to_pandas()
    assert got[["k", "v", "w"]].values.tolist() == [["b", 2, 9]]
    anti = hash_partition_join(
        _ds(L, 2), _ds(R[R["k"] == "zz"], 1), on=["k"],
        how="left_anti", num_partitions=3).to_pandas()
    assert sorted(anti["k"]) == ["a", "b", "c"]


def test_null_keys_never_match(ray_session):
    L = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                      "v": [1, 2, 3]})
    R = pd.DataFrame({"k": pd.array([None, 3], dtype="Int64"),
                      "w": [8, 9]})
    got = hash_partition_join(_ds(L, 2), _ds(R, 1), on=["k"],
                              how="inner", num_partitions=2).to_pandas()
    assert got[["v", "w"]].values.tolist() == [[3, 9]]


def test_left_outer_and_semi(ray_session, sides):
    L, R = sides
    outer = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="left_outer",
        num_partitions=6).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="left", suffixes=("", "_r"))
    assert len(outer) == len(exp)
    assert sorted(outer["lx"]) == sorted(exp["lx"])
    assert int(outer["ry"].isna().sum()) == int(exp["ry"].isna().sum())

    semi = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="left_semi",
        num_partitions=6).to_pandas()
    matched = L.merge(R[["k", "c"]].drop_duplicates(), on=["k", "c"])
    assert sorted(semi["lx"]) == sorted(matched["lx"])
    assert list(semi.columns) == list(L.columns)


def test_right_on_different_key_names(ray_session):
    L = pd.DataFrame({"a": [1, 2, 3, 4], "v": list("wxyz")})
    R = pd.DataFrame({"b": [2, 4, 4], "w": [20, 40, 41]})
    got = hash_partition_join(
        _ds(L, 2), _ds(R, 2), on=["a"], right_on=["b"], how="inner",
        num_partitions=3).to_pandas().sort_values(["a", "w"])
    assert got[["a", "v", "w"]].values.tolist() == [
        [2, "x", 20], [4, "z", 40], [4, "z", 41]]
    assert "b" not in got.columns


def test_full_outer_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="full_outer",
        num_partitions=6).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="outer", suffixes=("", "_r"))
    assert len(got) == len(exp)
    # left rows all present; right-only rows carry keys + payload
    assert sorted(got["lx"].dropna()) == sorted(exp["lx"].dropna())
    assert int(got["lx"].isna().sum()) == int(exp["lx"].isna().sum())
    assert int(got["ry"].isna().sum()) == int(exp["ry"].isna().sum())
    ronly = got[got["lx"].isna()]
    assert ronly["k"].notna().all()  # full-outer keys coalesce
