"""Two-sample KS statistic (stats.ks_statistic): brute-force ECDF
replay, DuckDB replay, identical-samples zero, layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import ks_statistic


def _tbl(seed=7, n=600):
    rng = np.random.default_rng(seed)
    s = rng.choice(["A", "B"], n)
    v = np.where(s == "A",
                 rng.integers(0, 50, n),
                 rng.integers(10, 60, n)).astype(np.int64)
    return pa.table({"s": pa.array(s), "v": pa.array(v)})


def _local(a, b):
    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = 0
    for v in vals:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best


class TestKS:
    @pytest.mark.parametrize("parts", [1, 5])
    def test_matches_definition(self, parts):
        t = _tbl()
        got = ks_statistic(rd.from_arrow(t).repartition(parts),
                           value_col="v", side_col="s",
                           side_a="A", side_b="B")
        a = [v for s, v in zip(t["s"].to_pylist(), t["v"].to_pylist())
             if s == "A"]
        b = [v for s, v in zip(t["s"].to_pylist(), t["v"].to_pylist())
             if s == "B"]
        assert got["ks_num"][0].as_py() == _local(a, b)
        assert got["n_a"][0].as_py() == len(a)

    def test_identical_distributions_zero(self):
        v = list(range(30)) * 2
        s = ["A"] * 30 + ["B"] * 30
        t = pa.table({"s": pa.array(s), "v": pa.array(v, pa.int64())})
        got = ks_statistic(rd.from_arrow(t), value_col="v",
                           side_col="s", side_a="A", side_b="B")
        assert got["ks_num"][0].as_py() == 0

    def test_duckdb_replay(self):
        t = _tbl(seed=13, n=900)
        got = ks_statistic(rd.from_arrow(t).repartition(4),
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
            tot AS (SELECT sum(na)::BIGINT AS ta,
                           sum(nb)::BIGINT AS tb FROM c),
            w AS (SELECT
                sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS ca,
                sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS cb
              FROM c)
            SELECT CAST(max(abs(ca * tb - cb * ta)) AS BIGINT)
            FROM w CROSS JOIN tot""").fetchone()[0]
        assert got["ks_num"][0].as_py() == want
