"""Grouped Gini coefficient (stats.grouped_gini): DuckDB replay,
known values (perfect equality → 0), hostile layouts, zero guard."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import grouped_gini


def _got(t, parts=1):
    ds = rd.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return {r["k"]: r["gini_micro"] for r in grouped_gini(
        ds, keys=["k"], x="v").take_all()}


class TestGini:
    @pytest.mark.parametrize("parts", [1, 8])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(17)
        t = pa.table({
            "k": pa.array(rng.integers(0, 6, 900).astype(str)),
            "v": pa.array(rng.integers(0, 5000, 900).astype(np.int64)),
        })
        got = _got(t, parts)
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            WITH r AS (SELECT k, v, row_number() OVER
                         (PARTITION BY k ORDER BY v) AS rn FROM t),
            a AS (SELECT k, sum(rn * v)::BIGINT AS S,
                         sum(v)::BIGINT AS T, count(*)::BIGINT AS n
                  FROM r GROUP BY k)
            SELECT k, CAST(round(1000000.0 *
                     ((2*S - (n+1)*T) / (n*T))) AS BIGINT)
            FROM a""").fetchall())
        assert got == want

    def test_perfect_equality_is_zero(self):
        t = pa.table({"k": pa.array(["a"] * 50),
                      "v": pa.array([7] * 50, pa.int64())})
        assert _got(t)["a"] == 0

    def test_concentration_increases(self):
        even = pa.table({"k": pa.array(["a"] * 10),
                         "v": pa.array([10] * 10, pa.int64())})
        skew = pa.table({"k": pa.array(["a"] * 10),
                         "v": pa.array([0] * 9 + [100], pa.int64())})
        assert _got(skew)["a"] > _got(even)["a"]
        assert _got(skew)["a"] == 900000   # (n-1)/n × 1e6

    def test_zero_total_null(self):
        t = pa.table({"k": pa.array(["z"] * 3),
                      "v": pa.array([0, 0, 0], pa.int64())})
        assert _got(t)["z"] is None
