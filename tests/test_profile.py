"""Dataset profile (stages/profile.py): DuckDB replay over int and
string columns incl. nulls, hostile layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.profile import profile


def _tbl(seed=3, n=900):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 400, n).astype(np.int64)
    s = rng.choice(["x", "y", "zz", None], n, p=[0.4, 0.3, 0.2, 0.1])
    return pa.table({"i": pa.array(ids),
                     "s": pa.array(s, pa.string())})


class TestProfile:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = {(r["column"], r["metric"]): r["value"] for r in
               profile(rd.from_arrow(t).repartition(parts),
                       ["i", "s"], num_partitions=3).to_pylist()}
        con = duckdb.connect()
        con.register("t", t)
        want = {}
        for c in ("i", "s"):
            r = con.sql(f"""
                SELECT count({c})::VARCHAR,
                       (count(*) - count({c}))::VARCHAR,
                       count(DISTINCT {c})::VARCHAR,
                       min({c})::VARCHAR, max({c})::VARCHAR
                FROM t""").fetchone()
            want[(c, "rows")], want[(c, "nulls")] = r[0], r[1]
            want[(c, "distinct")] = r[2]
            want[(c, "min")], want[(c, "max")] = r[3], r[4]
        assert got == want

    def test_all_null_column(self):
        t = pa.table({"x": pa.array([None, None], pa.string())})
        got = {(r["column"], r["metric"]): r["value"]
               for r in profile(rd.from_arrow(t), ["x"],
                                num_partitions=2).to_pylist()}
        assert got[("x", "rows")] == "0"
        assert got[("x", "nulls")] == "2"
        assert got[("x", "distinct")] == "0"
        assert got[("x", "min")] == ""
