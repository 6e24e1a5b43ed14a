"""running_minmax (sorted_ops) + CUSUM change-point flags
(anomaly.cusum_flags): DuckDB window replays, a planted level shift,
sequential-recursion equivalence, hostile layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.anomaly import cusum_flags
from vector_ray.stages.sorted_ops import running_minmax


def _tbl(n=700, seed=14, lo=-50, hi=50):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 6, n).astype(str)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(lo, hi, n).astype(np.int64)),
    })


class TestRunningMinMax:
    @pytest.mark.parametrize("parts", [1, 3, 17])
    @pytest.mark.parametrize("op", ["min", "max"])
    def test_duckdb_replay(self, parts, op):
        t = _tbl()
        got = {r["i"]: r[f"run_{op}"] for r in running_minmax(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            order_by=["i"], value_col="v", op=op).take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql(f"""
            SELECT i, {op}(v) OVER (PARTITION BY k ORDER BY i
              ROWS UNBOUNDED PRECEDING) FROM t""").fetchall())
        assert got == want

    def test_empty(self):
        t = pa.table({"k": pa.array([], pa.string()),
                      "i": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
        assert running_minmax(rd.from_arrow(t), keys=["k"],
                              order_by=["i"],
                              value_col="v").count() == 0


class TestCusum:
    def _local(self, rows, k_ref, h):
        """The textbook sequential recursion."""
        state: dict = {}
        out = {}
        for key, i, v in sorted(rows):
            c = max(0, state.get(key, 0) + (v - k_ref))
            state[key] = c
            out[i] = (c, 1 if c > h else 0)
        return out

    @pytest.mark.parametrize("parts", [1, 9])
    def test_matches_sequential_recursion(self, parts):
        t = _tbl(500, seed=3)
        rows = list(zip(t["k"].to_pylist(), t["i"].to_pylist(),
                        t["v"].to_pylist()))
        got = {r["i"]: (r["cusum"], r["cusum_alarm"])
               for r in cusum_flags(
                   rd.from_arrow(t).repartition(parts), keys=["k"],
                   order_by=["i"], value_col="v", k_ref=5,
                   h=120).take_all()}
        assert got == self._local(rows, 5, 120)

    def test_duckdb_replay(self):
        t = _tbl(600, seed=21)
        got = {r["i"]: r["cusum"] for r in cusum_flags(
            rd.from_arrow(t).repartition(4), keys=["k"],
            order_by=["i"], value_col="v", k_ref=3, h=100).take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = dict(con.sql("""
            SELECT i, P - LEAST(0, min(P) OVER
              (PARTITION BY k ORDER BY i ROWS UNBOUNDED PRECEDING))
            FROM (SELECT k, i, sum(v - 3) OVER (PARTITION BY k
                    ORDER BY i ROWS UNBOUNDED PRECEDING) AS P
                  FROM t)""").fetchall())
        assert got == want

    def test_planted_level_shift(self):
        v = [10] * 40 + [25] * 20        # mean shifts at i=40
        t = pa.table({"k": pa.array(["a"] * 60),
                      "i": pa.array(np.arange(60, dtype=np.int64)),
                      "v": pa.array(v, pa.int64())})
        got = {r["i"]: r["cusum_alarm"] for r in cusum_flags(
            rd.from_arrow(t), keys=["k"], order_by=["i"],
            value_col="v", k_ref=12, h=50).take_all()}
        assert all(got[i] == 0 for i in range(40))   # pre-shift quiet
        assert got[59] == 1                          # alarm after shift
        first = min(i for i, f in got.items() if f)
        assert 40 <= first <= 46                     # fires promptly
