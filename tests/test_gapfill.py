"""Time-bucket gap fill + LOCF (stages/gapfill.py): DuckDB replay over
random layouts, layout invariance, known values, edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.gapfill import gap_fill


def _tbl(seed=7, n=4000, n_keys=30, span=2_500_000_000):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "ts": pa.array(rng.integers(0, span, n), pa.timestamp("us")),
        "v": pa.array(rng.integers(-50, 100, n), pa.int64())})


def _sql(every, agg="SUM"):
    return f"""
    WITH a AS (SELECT k, epoch_us(ts) // {every} AS b,
                      {agg}(v)::BIGINT AS v
               FROM t GROUP BY 1, 2),
    bounds AS (SELECT k, min(b) mn, max(b) mx FROM a GROUP BY 1),
    s AS (SELECT k, unnest(generate_series(mn, mx)) AS b FROM bounds),
    j AS (SELECT s.k, s.b, a.v FROM s LEFT JOIN a USING (k, b)),
    f AS (SELECT k, b * {every} AS bucket_us,
            last_value(v IGNORE NULLS)
              OVER (PARTITION BY k ORDER BY b) AS value,
            CAST(v IS NULL AS BIGINT) AS filled FROM j)
    SELECT k, bucket_us, value, filled FROM f
    ORDER BY k, bucket_us
    """


def _run(t, every, parts, agg="sum"):
    out = gap_fill(rd.from_arrow(t).repartition(parts), keys=["k"],
                   ts_col="ts", value_col="v", every_us=every,
                   agg=agg)
    return (out.to_pandas()
            .sort_values(["k", "bucket_us"])
            .reset_index(drop=True).astype("int64"))


class TestGapFill:
    @pytest.mark.parametrize("parts", [1, 4, 9])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = _run(t, 100_000_000, parts)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_sql(100_000_000)).df().astype("int64")
        pd.testing.assert_frame_equal(got, want)

    @pytest.mark.parametrize("agg,sqlagg", [("max", "MAX"),
                                            ("min", "MIN")])
    def test_agg_modes(self, agg, sqlagg):
        t = _tbl(seed=11, n=900, n_keys=9)
        got = _run(t, 200_000_000, 3, agg=agg)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_sql(200_000_000, sqlagg)).df() \
            .astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_layout_invariance(self):
        t = _tbl(seed=3, n=2500, n_keys=5, span=4_000_000_000)
        a = _run(t, 50_000_000, 1)
        b = _run(t, 50_000_000, 11)
        pd.testing.assert_frame_equal(a, b)

    def test_known(self):
        # key 1: buckets 0, 3 -> fills 1, 2 with value 10
        t = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([5, 35], pa.timestamp("us")),
            "v": pa.array([10, 7], pa.int64())})
        got = _run(t, 10, 1)
        want = pd.DataFrame({
            "k": [1, 1, 1, 1],
            "bucket_us": [0, 10, 20, 30],
            "value": [10, 10, 10, 7],
            "filled": [0, 1, 1, 0]}).astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_single_bucket_keys_no_fill(self):
        t = pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "ts": pa.array([5, 7], pa.timestamp("us")),
            "v": pa.array([1, 2], pa.int64())})
        got = _run(t, 1000, 2)
        assert got["filled"].sum() == 0
        assert len(got) == 2

    def test_empty_input(self):
        t = pa.table({
            "k": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "v": pa.array([], pa.int64())})
        out = gap_fill(rd.from_arrow(t), keys=["k"], ts_col="ts",
                       value_col="v", every_us=1000)
        assert out.count() == 0

    def test_negative_ts_floor(self):
        # floor (not trunc) bucketing for pre-epoch timestamps
        t = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array([-25, 15], pa.timestamp("us")),
            "v": pa.array([4, 6], pa.int64())})
        got = _run(t, 10, 1)
        assert got["bucket_us"].tolist() == [-30, -20, -10, 0, 10]
        assert got["value"].tolist() == [4, 4, 4, 4, 6]
        assert got["filled"].tolist() == [0, 1, 1, 1, 0]
