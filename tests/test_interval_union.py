"""Interval-union coverage (windows.interval_union_length): brute
force on random overlapping intervals, DuckDB replay, known values."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.windows import interval_union_length


def _brute(ivals):
    pts = set()
    for s, e in ivals:
        pts.update(range(s, e))
    return len(pts)


def _tbl(seed=4, n=400):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 300, n).astype(np.int64)
    ln = rng.integers(1, 40, n).astype(np.int64)
    return pa.table({
        "u": pa.array(rng.integers(0, 8, n).astype(np.int64)),
        "s": pa.array(s), "e": pa.array(s + ln)})


class TestIntervalUnion:
    @pytest.mark.parametrize("parts", [1, 6])
    def test_brute_force(self, parts):
        t = _tbl()
        got = {r["u"]: r["covered"] for r in interval_union_length(
            rd.from_arrow(t).repartition(parts), key="u",
            start_col="s", end_col="e").take_all()}
        per = {}
        for u, s, e in zip(t["u"].to_pylist(), t["s"].to_pylist(),
                           t["e"].to_pylist()):
            per.setdefault(u, []).append((s, e))
        assert got == {u: _brute(iv) for u, iv in per.items()}

    def test_duckdb_replay(self):
        t = _tbl(seed=9, n=700)
        got = {r["u"]: r["covered"] for r in interval_union_length(
            rd.from_arrow(t).repartition(3), key="u",
            start_col="s", end_col="e").take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            WITH r AS (SELECT u, s, e,
                 max(e) OVER (PARTITION BY u ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS pm FROM t)
            SELECT u, CAST(sum(greatest(0,
                 e - greatest(s, COALESCE(pm, s)))) AS BIGINT)
            FROM r GROUP BY u""").fetchall())
        assert got == want

    def test_known(self):
        # [0,10) ∪ [5,15) ∪ [20,25) = 20
        t = pa.table({"u": pa.array([1, 1, 1], pa.int64()),
                      "s": pa.array([0, 5, 20], pa.int64()),
                      "e": pa.array([10, 15, 25], pa.int64())})
        got = {r["u"]: r["covered"] for r in interval_union_length(
            rd.from_arrow(t), key="u", start_col="s",
            end_col="e").take_all()}
        assert got == {1: 20}
