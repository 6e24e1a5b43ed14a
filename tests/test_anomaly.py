"""Rolling anomaly flags (stages/anomaly.rolling_anomaly): DuckDB
window-frame replay of the integer cross-multiplied z-test, a planted
spike, warm-up suppression, hostile layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.anomaly import rolling_anomaly


def _tbl(n=600, seed=6):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 5, n).astype(str)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(90, 110, n).astype(np.int64)),
    })


def _sql(w, k, min_rows):
    return f"""
    SELECT i, CASE WHEN m >= {min_rows}
                    AND (m*v - s)*(m*v - s) > {k * k} * (m*ss - s*s)
              THEN 1 ELSE 0 END AS f
    FROM (
      SELECT i, v,
        count(*)  OVER tw AS m,
        COALESCE(sum(v)   OVER tw, 0) AS s,
        COALESCE(sum(v*v) OVER tw, 0) AS ss
      FROM t
      WINDOW tw AS (PARTITION BY k ORDER BY i
                    ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING))
    """


class TestRollingAnomaly:
    @pytest.mark.parametrize("parts", [1, 9])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = {r["i"]: r["is_anomaly"] for r in rolling_anomaly(
            rd.from_arrow(t).repartition(parts),
            keys=["k"], order_by=["i"], value_col="v",
            window=8, k_sigma=3, min_rows=3).take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql(_sql(8, 3, 3)).fetchall())
        assert got == want
        assert sum(got.values()) > 0      # the test exercises both arms

    def test_planted_spike(self):
        v = [100] * 30 + [100000] + [100] * 9
        t = pa.table({"k": pa.array(["a"] * 40),
                      "i": pa.array(np.arange(40, dtype=np.int64)),
                      "v": pa.array(v, pa.int64())})
        got = {r["i"]: r["is_anomaly"] for r in rolling_anomaly(
            rd.from_arrow(t), keys=["k"], order_by=["i"],
            value_col="v", window=10, k_sigma=3).take_all()}
        assert got[30] == 1
        # constant baseline rows never flag (zero variance, x == mean)
        assert all(got[i] == 0 for i in range(30))

    def test_warmup_never_flags(self):
        t = pa.table({"k": pa.array(["a"] * 4),
                      "i": pa.array(np.arange(4, dtype=np.int64)),
                      "v": pa.array([1, 1000, 1, 1000], pa.int64())})
        got = {r["i"]: r["is_anomaly"] for r in rolling_anomaly(
            rd.from_arrow(t), keys=["k"], order_by=["i"],
            value_col="v", window=10, min_rows=4).take_all()}
        assert all(v == 0 for v in got.values())
