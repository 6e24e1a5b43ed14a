"""Group-median NULL imputation (stats.impute_group_median): DuckDB
quantile_cont replay, all-null group stays null, layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import impute_group_median


def _tbl(seed=2, n=500):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 900, n).astype(np.float64)
    v[rng.random(n) < 0.2] = np.nan
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 6, n).astype(str)),
        "v": pa.array([None if np.isnan(x) else int(x) for x in v],
                      pa.int64()),
    })


class TestImpute:
    @pytest.mark.parametrize("parts", [1, 6])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = {r["id"]: r["imputed_2x"] for r in impute_group_median(
            rd.from_arrow(t).repartition(parts), key="k",
            value_col="v").take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            WITH m AS (SELECT k, CAST(2*quantile_cont(v, 0.5)
                         AS BIGINT) AS med2
                       FROM t WHERE v IS NOT NULL GROUP BY k)
            SELECT id, COALESCE(2*v, med2) FROM t JOIN m USING (k)
        """).fetchall())
        assert got == want

    def test_all_null_group_stays_null(self):
        t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                      "k": pa.array(["a", "a", "z"]),
                      "v": pa.array([4, None, None], pa.int64())})
        got = {r["id"]: r["imputed_2x"] for r in impute_group_median(
            rd.from_arrow(t), key="k", value_col="v").take_all()}
        assert got == {0: 8, 1: 8, 2: None}

    def test_entirely_null_value_column(self):
        # Every value null: was an ArrowTypeError crash (null-typed
        # key array into index_in) — now an all-null out column.
        t = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                      "k": pa.array(["a", "b", "a"]),
                      "v": pa.array([None, None, None], pa.int64())})
        got = {r["id"]: r["imputed_2x"] for r in impute_group_median(
            rd.from_arrow(t), key="k", value_col="v").take_all()}
        assert got == {0: None, 1: None, 2: None}
