"""Mann–Whitney 2U (stats.rank_sum_u2): scipy-free local replay,
DuckDB replay, tie handling, identity U_A + U_B = 2·nA·nB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import rank_sum_u2


def _u2_local(a_vals, b_vals):
    """2·U_A by definition: pairs where a>b count 2, ties count 1."""
    u2 = 0
    for x in a_vals:
        for y in b_vals:
            u2 += 2 if x > y else (1 if x == y else 0)
    return u2


def _tbl(seed=23, n=500):
    rng = np.random.default_rng(seed)
    side = rng.choice(["A", "B", "C"], n)
    v = rng.integers(0, 40, n).astype(np.int64)   # heavy ties
    return pa.table({"s": pa.array(side), "v": pa.array(v)})


class TestRankSum:
    @pytest.mark.parametrize("parts", [1, 6])
    def test_matches_definition(self, parts):
        t = _tbl()
        got = rank_sum_u2(rd.from_arrow(t).repartition(parts),
                          value_col="v", side_col="s",
                          side_a="A", side_b="B")
        a = [v for s, v in zip(t["s"].to_pylist(), t["v"].to_pylist())
             if s == "A"]
        b = [v for s, v in zip(t["s"].to_pylist(), t["v"].to_pylist())
             if s == "B"]
        assert got["u2_a"][0].as_py() == _u2_local(a, b)
        assert got["n_a"][0].as_py() == len(a)
        assert got["n_b"][0].as_py() == len(b)

    def test_symmetry_identity(self):
        t = _tbl(seed=5)
        ua = rank_sum_u2(rd.from_arrow(t), value_col="v",
                         side_col="s", side_a="A", side_b="B")
        ub = rank_sum_u2(rd.from_arrow(t), value_col="v",
                         side_col="s", side_a="B", side_b="A")
        na = ua["n_a"][0].as_py()
        nb = ua["n_b"][0].as_py()
        assert (ua["u2_a"][0].as_py() + ub["u2_a"][0].as_py()
                == 2 * na * nb)

    def test_duckdb_replay(self):
        t = _tbl(seed=31, n=800)
        got = rank_sum_u2(rd.from_arrow(t).repartition(5),
                          value_col="v", side_col="s",
                          side_a="A", side_b="B")
        con = duckdb.connect()
        con.register("t", t)
        want = con.sql("""
            WITH c AS (
              SELECT v,
                sum(CASE WHEN s='A' THEN 1 ELSE 0 END)::BIGINT AS na,
                sum(CASE WHEN s='B' THEN 1 ELSE 0 END)::BIGINT AS nb
              FROM t GROUP BY v),
            w AS (SELECT na, nb, sum(nb) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS cumb FROM c)
            SELECT CAST(sum(na * (2*cumb - nb)) AS BIGINT)
            FROM w""").fetchone()[0]
        assert got["u2_a"][0].as_py() == want
