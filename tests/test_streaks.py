"""Gaps-and-islands max streaks (paths.max_streak): DuckDB replay,
known values, duplicate tolerance, hostile layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.paths import max_streak


class TestMaxStreak:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(19)
        t = pa.table({
            "u": pa.array(rng.integers(0, 15, 1200).astype(np.int64)),
            "d": pa.array(rng.integers(0, 40, 1200).astype(np.int64)),
        })
        got = {r["u"]: r["max_streak"] for r in max_streak(
            rd.from_arrow(t).repartition(parts), key="u",
            seq_col="d", num_partitions=4).take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            WITH dd AS (SELECT DISTINCT u, d FROM t),
            r AS (SELECT u, d, row_number() OVER
                    (PARTITION BY u ORDER BY d) AS rn FROM dd),
            c AS (SELECT u, d - rn AS island, count(*)::BIGINT AS len
                  FROM r GROUP BY u, d - rn)
            SELECT u, max(len) FROM c GROUP BY u""").fetchall())
        assert got == want

    def test_known(self):
        # user 1: days 3,4,5, 9, 11,12 -> streak 3; dup day ignored
        t = pa.table({"u": pa.array([1] * 7 + [2], pa.int64()),
                      "d": pa.array([3, 4, 5, 5, 9, 11, 12, 100],
                                    pa.int64())})
        got = {r["u"]: r["max_streak"] for r in max_streak(
            rd.from_arrow(t), key="u", seq_col="d",
            num_partitions=2).take_all()}
        assert got == {1: 3, 2: 1}
