"""Spearman rank correlation (stats.spearman_corr): scipy-free brute
check on monotone data, DuckDB row_number replay, layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import spearman_corr


def _tbl(seed=13, n=2000, n_keys=6):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "x": pa.array(rng.integers(-100, 100, n), pa.int64()),
        "y": pa.array(rng.integers(-100, 100, n), pa.int64()),
        "id": pa.array(np.arange(n, dtype=np.int64))})


_SQL = """
WITH r AS (
  SELECT k,
         row_number() OVER (PARTITION BY k ORDER BY x, id) AS rx,
         row_number() OVER (PARTITION BY k ORDER BY y, id) AS ry
  FROM t),
s AS (SELECT k, count(*)::BIGINT AS n,
             CAST(sum(rx) AS BIGINT) sx, CAST(sum(ry) AS BIGINT) sy,
             CAST(sum(rx*rx) AS BIGINT) sxx,
             CAST(sum(ry*ry) AS BIGINT) syy,
             CAST(sum(rx*ry) AS BIGINT) sxy
      FROM r GROUP BY 1)
SELECT k, n,
       CAST(round(1000000.0 * (CAST(n*sxy - sx*sy AS DOUBLE)
         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                * CAST(n*syy - sy*sy AS DOUBLE)))) AS BIGINT)
         AS spearman_micro
FROM s ORDER BY k
"""


def _run(t, parts):
    out = spearman_corr(rd.from_arrow(t).repartition(parts),
                        keys=["k"], x="x", y="y", tiebreak="id")
    return (out.to_pandas().sort_values("k")
            .reset_index(drop=True).astype("int64"))


class TestSpearman:
    @pytest.mark.parametrize("parts", [1, 8])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = _run(t, parts)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_SQL).df().astype("int64")
        pd.testing.assert_frame_equal(got, want)

    def test_perfect_monotone(self):
        # y strictly increasing in x (no ties) -> rho = 1;
        # y strictly decreasing -> rho = -1
        n = 50
        up = pa.table({"k": pa.array([0] * n, pa.int64()),
                       "x": pa.array(np.arange(n, dtype=np.int64)),
                       "y": pa.array(np.arange(n, dtype=np.int64) ** 2),
                       "id": pa.array(np.arange(n, dtype=np.int64))})
        got = _run(up, 3)
        assert got["spearman_micro"].tolist() == [1_000_000]
        dn = up.set_column(2, "y", pa.array(
            -(np.arange(n, dtype=np.int64) ** 2)))
        got = _run(dn, 3)
        assert got["spearman_micro"].tolist() == [-1_000_000]

    def test_layout_invariance(self):
        t = _tbl(seed=4, n=1500, n_keys=3)
        pd.testing.assert_frame_equal(_run(t, 1), _run(t, 9))
