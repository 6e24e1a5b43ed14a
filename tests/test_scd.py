"""SCD2 interval build (stages/scd.py): DuckDB lag/lead replay,
layout invariance incl. runs spanning many tiny blocks, known values,
string + int values."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.scd import scd2_intervals


def _tbl(seed=21, n=3000, n_keys=25, n_vals=4):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "v": pa.array(np.array(["a", "b", "c", "d"])[
            rng.integers(0, n_vals, n)]),
        "ts": pa.array(rng.integers(0, 10_000_000, n),
                       pa.timestamp("us")),
        "id": pa.array(np.arange(n, dtype=np.int64))})


_SQL = """
WITH w AS (
  SELECT k, v, epoch_us(ts) AS ts, id,
         lag(v) OVER (PARTITION BY k ORDER BY ts, id) AS pv
  FROM t),
c AS (SELECT k, v, ts, id FROM w WHERE pv IS NULL OR pv <> v),
f AS (SELECT k, v, ts AS valid_from,
        lead(ts) OVER (PARTITION BY k ORDER BY ts, id) AS valid_to
      FROM c)
SELECT k, v, valid_from, valid_to FROM f
ORDER BY k, valid_from
"""


def _run(t, parts):
    out = scd2_intervals(rd.from_arrow(t).repartition(parts),
                         keys=["k"], ts_col="ts", value_col="v",
                         tiebreak=["id"])
    return (out.to_pandas().sort_values(["k", "valid_from"])
            .reset_index(drop=True))


class TestScd2:
    @pytest.mark.parametrize("parts", [1, 9])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = _run(t, parts)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_SQL).df()
        got["valid_to"] = got["valid_to"].astype("float64")
        want["valid_to"] = want["valid_to"].astype("float64")
        pd.testing.assert_frame_equal(got, want)

    def test_run_spanning_many_blocks(self):
        # one key, constant value across 40 rows shredded into 20
        # blocks -> exactly ONE interval survives the boundary chain
        t = pa.table({
            "k": pa.array([1] * 40 + [2] * 3, pa.int64()),
            "v": pa.array(["x"] * 40 + ["x", "y", "x"]),
            "ts": pa.array(np.arange(43, dtype=np.int64),
                           pa.timestamp("us")),
            "id": pa.array(np.arange(43, dtype=np.int64))})
        got = _run(t, 20)
        assert got[got["k"] == 1].shape[0] == 1
        r = got[got["k"] == 1].iloc[0]
        assert r["valid_from"] == 0 and pd.isna(r["valid_to"])
        assert got[got["k"] == 2]["v"].tolist() == ["x", "y", "x"]
        assert got[got["k"] == 2]["valid_to"].tolist()[:2] == [41, 42]

    def test_known(self):
        t = pa.table({
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "v": pa.array(["a", "a", "b", "a"]),
            "ts": pa.array([10, 20, 30, 40], pa.timestamp("us")),
            "id": pa.array([0, 1, 2, 3], pa.int64())})
        got = _run(t, 2)
        assert got["v"].tolist() == ["a", "b", "a"]
        assert got["valid_from"].tolist() == [10, 30, 40]
        assert got["valid_to"].tolist()[:2] == [30, 40]
        assert pd.isna(got["valid_to"].iloc[2])

    def test_int_values(self):
        t = pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([7, 7, 9], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "id": pa.array([0, 1, 2], pa.int64())})
        got = _run(t, 1)
        assert got["v"].tolist() == [7, 9]

    def test_empty(self):
        t = pa.table({
            "k": pa.array([], pa.int64()),
            "v": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "id": pa.array([], pa.int64())})
        out = scd2_intervals(rd.from_arrow(t), keys=["k"],
                             ts_col="ts", value_col="v",
                             tiebreak=["id"])
        assert out.count() == 0
