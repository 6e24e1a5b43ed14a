"""Chi-square independence (stats.chi2_independence): DuckDB replay
incl. zero cells, independence → ~0, known 2x2 value, layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import chi2_independence


def _sql():
    return """
    WITH cells AS (SELECT a, b, count(*)::BIGINT AS o FROM t GROUP BY 1,2),
    rt AS (SELECT a, sum(o)::BIGINT AS r FROM cells GROUP BY a),
    ct AS (SELECT b, sum(o)::BIGINT AS c FROM cells GROUP BY b),
    nn AS (SELECT sum(o)::BIGINT AS n FROM cells),
    grid AS (SELECT rt.a, ct.b, rt.r, ct.c, COALESCE(cells.o, 0) AS o
             FROM rt CROSS JOIN ct
             LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
    SELECT CAST(sum(CAST(round(1000000.0 *
             (((o*n - r*c)*(o*n - r*c)) / (1.0*n*r*c))) AS BIGINT))
           AS BIGINT) AS chi2_micro
    FROM grid CROSS JOIN nn
    """


class TestChi2:
    @pytest.mark.parametrize("parts", [1, 6])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(9)
        t = pa.table({
            "a": pa.array(rng.choice(list("xyz"), 2000)),
            "b": pa.array(rng.choice(list("PQRS"), 2000)),
        })
        got = chi2_independence(
            rd.from_arrow(t).repartition(parts), a_col="a", b_col="b")
        con = duckdb.connect()
        con.register("t", t)
        want = con.sql(_sql()).fetchone()[0]
        assert got["chi2_micro"][0].as_py() == want
        assert got["dof"][0].as_py() == 6

    def test_known_2x2(self):
        # perfectly dependent: chi2 = n
        t = pa.table({"a": pa.array(["u"] * 10 + ["v"] * 10),
                      "b": pa.array(["1"] * 10 + ["2"] * 10)})
        got = chi2_independence(rd.from_arrow(t), a_col="a", b_col="b")
        assert got["chi2_micro"][0].as_py() == 20_000_000   # chi2 = 20
        assert got["dof"][0].as_py() == 1

    def test_independent_is_zero(self):
        # uniform product table: chi2 exactly 0
        a = [x for x in "uv" for _ in range(10)]
        b = ["1", "2"] * 10
        t = pa.table({"a": pa.array(a), "b": pa.array(b)})
        got = chi2_independence(rd.from_arrow(t), a_col="a", b_col="b")
        assert got["chi2_micro"][0].as_py() == 0
