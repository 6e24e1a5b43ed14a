"""Benford first-digit deviation (stats.benford_deviation): DuckDB
integer replay, Benford-conforming vs uniform data, zero/negative
handling, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import BENFORD_MICRO, benford_deviation

_SQL = """
WITH d AS (
  SELECT k, CAST(substr(CAST(abs(v) AS VARCHAR), 1, 1) AS BIGINT)
           AS fd
  FROM t WHERE abs(v) > 0),
c AS (
  SELECT k,
         {sums}
  FROM d GROUP BY 1)
SELECT k, o1,o2,o3,o4,o5,o6,o7,o8,o9,
       (o1+o2+o3+o4+o5+o6+o7+o8+o9)::BIGINT AS n,
       greatest({devs})::BIGINT AS benford_dev_num
FROM c ORDER BY k
""".format(
    sums=",\n         ".join(
        f"sum(CASE WHEN fd = {d} THEN 1 ELSE 0 END)::BIGINT AS o{d}"
        for d in range(1, 10)),
    devs=", ".join(
        f"abs(1000000*o{d} - (o1+o2+o3+o4+o5+o6+o7+o8+o9)"
        f"*{BENFORD_MICRO[d-1]})" for d in range(1, 10)))


def _run(t, parts):
    out = benford_deviation(rd.from_arrow(t).repartition(parts),
                            keys=["k"], value_col="v")
    return (out.to_pandas().sort_values("k")
            .reset_index(drop=True).astype({"k": "int64"}))


class TestBenford:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(31)
        n = 4000
        t = pa.table({
            "k": pa.array(rng.integers(0, 5, n), pa.int64()),
            "v": pa.array(rng.integers(-10_000, 10_000, n),
                          pa.int64())})
        got = _run(t, parts)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_SQL).df()
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"))

    def test_benford_vs_uniform(self):
        rng = np.random.default_rng(7)
        n = 20_000
        # log-uniform magnitudes conform to Benford; uniform doesn't
        conforming = np.floor(10 ** rng.uniform(0, 6, n)).astype(
            np.int64)
        uniform = rng.integers(1, 10 ** 6, n)
        t = pa.table({
            "k": pa.array([0] * n + [1] * n, pa.int64()),
            "v": pa.array(np.concatenate([conforming, uniform]))})
        got = _run(t, 4).set_index("k")
        dev = got["benford_dev_num"] / (got["n"] * 1_000_000)
        assert dev.loc[0] < 0.01
        assert dev.loc[1] > 0.10

    def test_all_zero_key_dropped(self):
        t = pa.table({
            "k": pa.array([0, 0, 1], pa.int64()),
            "v": pa.array([0, 0, 42], pa.int64())})
        got = _run(t, 2)
        assert got["k"].tolist() == [1]
        assert got["o4"].tolist() == [1] and got["n"].tolist() == [1]
