"""grouped_weighted_median: DuckDB windowed-cumsum replay, layout
invariance, unit weights = lower median, single-row groups."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import grouped_weighted_median

SQL = """
WITH r AS (SELECT k, v, id,
    sum(w) OVER (PARTITION BY k ORDER BY v, id
                 ROWS UNBOUNDED PRECEDING) AS cw,
    sum(w) OVER (PARTITION BY k) AS tw FROM t),
f AS (SELECT k, v, row_number() OVER (PARTITION BY k
                                      ORDER BY v, id) AS rn
      FROM r WHERE 2 * cw >= tw)
SELECT k, CAST(v AS BIGINT) AS wmedian FROM f WHERE rn = 1 ORDER BY k
"""


def _tbl(seed, n=4000, n_keys=9, wmax=10):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array([f"g{x}" for x in rng.integers(0, n_keys, n)]),
        "v": pa.array(rng.integers(-1000, 1000, n).astype(np.int64)),
        "w": pa.array(rng.integers(1, wmax, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
    })


def _run(t, parts):
    return (grouped_weighted_median(
        rd.from_arrow(t).repartition(parts), key="k", value_col="v",
        weight_col="w", tiebreak="id")
        .to_pandas().sort_values("k").reset_index(drop=True))


class TestWeightedMedian:
    @pytest.mark.parametrize("seed", [3, 19])
    @pytest.mark.parametrize("parts", [1, 11])
    def test_duckdb_replay(self, seed, parts):
        t = _tbl(seed)
        con = duckdb.connect()
        con.register("t", t)
        pd.testing.assert_frame_equal(_run(t, parts),
                                      con.execute(SQL).df())

    def test_unit_weights_are_lower_median(self):
        t = _tbl(7)
        t = t.set_column(t.column_names.index("w"), "w",
                         pa.array(np.ones(t.num_rows, np.int64)))
        got = _run(t, 5)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute("""
          SELECT k, CAST(quantile_disc(v, 0.5) AS BIGINT) AS wmedian
          FROM t GROUP BY k ORDER BY k""").df()
        pd.testing.assert_frame_equal(got, want)

    def test_heavy_row_dominates(self):
        t = pa.table({"k": pa.array(["a", "a", "a"]),
                      "v": pa.array([1, 2, 100], pa.int64()),
                      "w": pa.array([1, 1, 10], pa.int64()),
                      "id": pa.array([0, 1, 2], pa.int64())})
        assert _run(t, 1)["wmedian"].tolist() == [100]

    def test_single_row_groups(self):
        t = pa.table({"k": pa.array(["a", "b"]),
                      "v": pa.array([5, -3], pa.int64()),
                      "w": pa.array([4, 9], pa.int64()),
                      "id": pa.array([0, 1], pa.int64())})
        got = _run(t, 2)
        assert got["wmedian"].tolist() == [5, -3]
