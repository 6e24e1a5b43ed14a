"""Rolling ROWS-frame order statistics (stages/rolling.py): DuckDB
window-median/min/max replay, run-spanning-blocks chain, layout
invariance, W=1 degenerate."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.rolling import rolling_stat


def _tbl(seed=17, n=2500, n_keys=12):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64())})


def _sql(stat, w):
    frame = f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW"
    if stat == "median":
        e = (f"CAST(round(2 * median(v) OVER (PARTITION BY k "
             f"ORDER BY o {frame})) AS BIGINT)")
        col = "roll_median2"
    else:
        e = (f"CAST({stat}(v) OVER (PARTITION BY k ORDER BY o "
             f"{frame}) AS BIGINT)")
        col = f"roll_{stat}"
    return f"SELECT k, o, v, {e} AS {col} FROM t ORDER BY k, o", col


def _run(t, w, stat, parts):
    out = rolling_stat(rd.from_arrow(t).repartition(parts),
                       keys=["k"], order_by=["o"], value_col="v",
                       window=w, stat=stat)
    return (out.to_pandas().sort_values(["k", "o"])
            .reset_index(drop=True).astype("int64"))


class TestRolling:
    @pytest.mark.parametrize("stat", ["median", "min", "max"])
    @pytest.mark.parametrize("w", [1, 4, 7])
    def test_duckdb_replay(self, stat, w):
        t = _tbl()
        got = _run(t, w, stat, 6)
        sql, col = _sql(stat, w)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(sql).df().astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_run_spanning_many_blocks(self):
        # a single key shredded into 25 tiny blocks: the W-1 carry
        # chain must hand each block its true preceding rows
        n = 100
        t = pa.table({
            "k": pa.array([1] * n, pa.int64()),
            "o": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array((np.arange(n, dtype=np.int64) * 37) % 101)})
        got = _run(t, 8, "median", 25)
        sql, col = _sql("median", 8)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(sql).df().astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_layout_invariance(self):
        t = _tbl(seed=3, n=1200, n_keys=4)
        pd.testing.assert_frame_equal(
            _run(t, 5, "median", 1), _run(t, 5, "median", 13))

    def test_empty(self):
        t = pa.table({"k": pa.array([], pa.int64()),
                      "o": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
        out = rolling_stat(rd.from_arrow(t), keys=["k"],
                           order_by=["o"], value_col="v", window=4)
        assert out.count() == 0
