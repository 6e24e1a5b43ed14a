"""Per-group quota sampling (ml/mixing.cap_per_group): DuckDB
row_number replay, quota respected, small groups untouched, hostile
layouts."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.mixing import cap_per_group


def _tbl(n=400, seed=8):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.integers(0, 7, n).astype(str)),
    })


class TestCapPerGroup:
    @pytest.mark.parametrize("parts", [1, 6])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = sorted(r["id"] for r in cap_per_group(
            rd.from_arrow(t).repartition(parts),
            group_col="g", id_col="id", cap=20).take_all())
        con = duckdb.connect()
        con.register("t", t)
        want = sorted(r[0] for r in con.sql("""
            SELECT id FROM (
              SELECT id, row_number() OVER (PARTITION BY g ORDER BY
                ('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT, id)
                AS rn FROM t)
            WHERE rn <= 20""").fetchall())
        assert got == want

    def test_quota_and_small_groups(self):
        t = pa.table({"id": pa.array(np.arange(30, dtype=np.int64)),
                      "g": pa.array(["big"] * 25 + ["small"] * 5)})
        rows = cap_per_group(rd.from_arrow(t), group_col="g",
                             id_col="id", cap=10).take_all()
        per = {}
        for r in rows:
            per[r["g"]] = per.get(r["g"], 0) + 1
        assert per == {"big": 10, "small": 5}

    def test_deterministic(self):
        t = _tbl(120, seed=1)
        a = sorted(r["id"] for r in cap_per_group(
            rd.from_arrow(t).repartition(3), group_col="g",
            id_col="id", cap=5).take_all())
        b = sorted(r["id"] for r in cap_per_group(
            rd.from_arrow(t).repartition(11), group_col="g",
            id_col="id", cap=5).take_all())
        assert a == b
