"""Grouped bit/bool aggregates (stats.grouped_bitops): DuckDB replay
on random data, known values, hostile layouts, empty input."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import grouped_bitops


def _tbl(n=3000, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, 12, n).astype(str)),
        "v": pa.array(rng.integers(0, 1 << 40, n).astype(np.int64)),
        "f": pa.array(rng.integers(0, 2, n).astype(np.int64)),
    })


class TestBitops:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        out = grouped_bitops(
            rd.from_arrow(t).repartition(parts),
            keys=["k"], x="v", flag="f", num_partitions=3).take_all()
        got = {r["k"]: (r["band"], r["bor"], r["bxor"],
                        r["bool_and"], r["bool_or"]) for r in out}
        con = duckdb.connect()
        con.register("t", t)
        want = {r[0]: tuple(r[1:]) for r in con.sql("""
            SELECT k, CAST(bit_and(v) AS BIGINT),
                   CAST(bit_or(v) AS BIGINT),
                   CAST(bit_xor(v) AS BIGINT),
                   CAST(min(f) AS BIGINT), CAST(max(f) AS BIGINT)
            FROM t GROUP BY k""").fetchall()}
        assert got == want

    def test_known_values(self):
        t = pa.table({"k": pa.array(["a", "a", "b"]),
                      "v": pa.array([0b1100, 0b1010, 0b1], pa.int64()),
                      "f": pa.array([1, 1, 0], pa.int64())})
        out = {r["k"]: r for r in grouped_bitops(
            rd.from_arrow(t), keys=["k"], x="v", flag="f",
            num_partitions=2).take_all()}
        assert out["a"]["band"] == 0b1000
        assert out["a"]["bor"] == 0b1110
        assert out["a"]["bxor"] == 0b0110
        assert out["a"]["bool_and"] == 1 and out["b"]["bool_or"] == 0

    def test_no_flag(self):
        t = _tbl(200, seed=5)
        out = grouped_bitops(rd.from_arrow(t), keys=["k"], x="v",
                             num_partitions=2).take_all()
        assert out and "bool_and" not in out[0]

    def test_empty(self):
        t = pa.table({"k": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
        assert grouped_bitops(rd.from_arrow(t), keys=["k"], x="v",
                              num_partitions=2).count() == 0
