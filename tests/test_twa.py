"""Time-weighted average (stats.time_weighted_avg): DuckDB replay,
known step function, single-event null, layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import time_weighted_avg


class TestTWA:
    @pytest.mark.parametrize("parts", [1, 5])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(25)
        n = 600
        t = pa.table({
            "k": pa.array(rng.integers(0, 7, n).astype(str)),
            "ts": pa.array(rng.choice(10_000, n, replace=False)
                           .astype(np.int64)),
            "v": pa.array(rng.integers(0, 500, n).astype(np.int64)),
        })
        got = {r["k"]: r["twa_micro"] for r in time_weighted_avg(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            ts_col="ts", value_col="v").take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            WITH w AS (SELECT k, v,
                 lead(ts) OVER (PARTITION BY k ORDER BY ts, v) - ts
                   AS dt FROM t),
            a AS (SELECT k, sum(v * dt)::BIGINT AS num,
                         sum(dt)::BIGINT AS den
                  FROM w WHERE dt IS NOT NULL GROUP BY k)
            SELECT k, CASE WHEN den = 0 THEN NULL
                      ELSE CAST(round(1000000.0 * (num / den))
                                AS BIGINT) END
            FROM a""").fetchall())
        assert got == want

    def test_known_step(self):
        # v=10 for 3 ticks, v=40 for 1 tick -> (30+40)/4 = 17.5
        t = pa.table({"k": pa.array(["a"] * 3),
                      "ts": pa.array([0, 3, 4], pa.int64()),
                      "v": pa.array([10, 40, 99], pa.int64())})
        got = time_weighted_avg(rd.from_arrow(t), keys=["k"],
                                ts_col="ts", value_col="v").take_all()
        assert got[0]["twa_micro"] == 17_500_000

    def test_single_event_null(self):
        t = pa.table({"k": pa.array(["z"]),
                      "ts": pa.array([5], pa.int64()),
                      "v": pa.array([7], pa.int64())})
        got = time_weighted_avg(rd.from_arrow(t), keys=["k"],
                                ts_col="ts", value_col="v").take_all()
        assert got[0]["twa_micro"] is None
