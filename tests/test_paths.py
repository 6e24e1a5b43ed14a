"""Markov transition counts (stages/paths.transition_counts): DuckDB
lag() replay, run-crossing boundary pairs at hostile layouts, known
values."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.paths import transition_counts


def _tbl(n=800, seed=12):
    rng = np.random.default_rng(seed)
    return pa.table({
        "u": pa.array(rng.integers(0, 9, n).astype(str)),
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array(rng.choice(list("ABCD"), n)),
    })


class TestTransitions:
    @pytest.mark.parametrize("parts", [1, 3, 17])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = transition_counts(
            rd.from_arrow(t).repartition(parts),
            key="u", order_by=["i"], state_col="s")
        gd = {(p, c): n for p, c, n in
              zip(got["prev"].to_pylist(), got["curr"].to_pylist(),
                  got["n"].to_pylist())}
        con = duckdb.connect()
        con.register("t", t)
        want = {(p, c): n for p, c, n in con.sql("""
            SELECT prev, s, count(*) FROM (
              SELECT s, lag(s) OVER (PARTITION BY u ORDER BY i) AS prev
              FROM t)
            WHERE prev IS NOT NULL GROUP BY 1, 2""").fetchall()}
        assert gd == want

    def test_known(self):
        t = pa.table({"u": ["a", "a", "a", "b", "b"],
                      "i": pa.array([1, 2, 3, 1, 2], pa.int64()),
                      "s": ["x", "y", "x", "x", "x"]})
        got = transition_counts(rd.from_arrow(t), key="u",
                                order_by=["i"], state_col="s")
        gd = {(p, c): n for p, c, n in
              zip(got["prev"].to_pylist(), got["curr"].to_pylist(),
                  got["n"].to_pylist())}
        assert gd == {("x", "y"): 1, ("y", "x"): 1, ("x", "x"): 1}

    def test_empty(self):
        t = pa.table({"u": pa.array([], pa.string()),
                      "i": pa.array([], pa.int64()),
                      "s": pa.array([], pa.string())})
        assert transition_counts(rd.from_arrow(t), key="u",
                                 order_by=["i"],
                                 state_col="s").num_rows == 0
