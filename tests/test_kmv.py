"""KMV (k-minimum-values) distinct sketch: exact regime below k,
integer estimator at capacity, mergeability, bit-exact DuckDB md5
replay (the same oracle-parity convention as HLL/Count-Min)."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.sketch import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_merge,
    kmv_sketch,
)


def _md5_u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def _ds(vals, parts=3):
    t = pa.table({"v": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t)
    return ds.repartition(parts)


class TestKMV:
    def test_exact_below_k(self):
        sk = kmv_sketch(_ds(list(range(50)) * 3), ["v"], k=256)
        assert kmv_estimate(sk, 256) == 50

    def test_capacity_matches_local_replay(self):
        vals = [i * 7 for i in range(1000)]
        sk = kmv_sketch(_ds(vals), ["v"], k=64)
        assert len(sk) == 64
        want = np.array(sorted({_md5_u64(str(v)) for v in vals})[:64],
                        dtype=np.uint64)
        assert np.array_equal(sk, want)
        assert kmv_estimate(sk, 64) == (63 << 64) // int(want[63])

    def test_estimate_accuracy(self):
        n = 5000
        sk = kmv_sketch(_ds(list(range(n)), parts=7), ["v"], k=256)
        est = kmv_estimate(sk, 256)
        assert abs(est - n) / n < 0.2      # ~1/sqrt(k) ≈ 6% expected

    def test_merge_equals_union_sketch(self):
        a = kmv_sketch(_ds(list(range(0, 800))), ["v"], k=128)
        b = kmv_sketch(_ds(list(range(400, 1200))), ["v"], k=128)
        u = kmv_sketch(_ds(list(range(0, 1200))), ["v"], k=128)
        assert np.array_equal(kmv_merge([a, b], 128), u)

    def test_intersect_estimate_sane(self):
        a = kmv_sketch(_ds(list(range(0, 1000))), ["v"], k=256)
        b = kmv_sketch(_ds(list(range(500, 1500))), ["v"], k=256)
        est = kmv_intersect_estimate(a, b, 256)
        assert abs(est - 500) / 500 < 0.35

    def test_duckdb_replay_bit_exact(self):
        vals = [i * 13 + 1 for i in range(700)]
        sk = kmv_sketch(_ds(vals), ["v"], k=64)
        con = duckdb.connect()
        con.register("t", pa.table({"v": pa.array(vals, pa.int64())}))
        got = con.sql("""
            WITH h AS (SELECT DISTINCT
                ('0x' || substr(md5(v::VARCHAR), 1, 16))::UBIGINT AS hv
                FROM t),
            k AS (SELECT hv FROM h ORDER BY hv LIMIT 64)
            SELECT CAST((63::HUGEINT * 18446744073709551616::HUGEINT)
                        // max(hv)::HUGEINT AS BIGINT) AS est
            FROM k""").fetchone()[0]
        assert got == kmv_estimate(sk, 64)

    def test_composite_key(self):
        t = pa.table({"u": pa.array([1, 1, 2], pa.int64()),
                      "b": pa.array([5, 6, 5], pa.int64())})
        sk = kmv_sketch(rd.from_arrow(t), ["u", "b"], k=16)
        want = sorted(_md5_u64(s) for s in ("1:5", "1:6", "2:5"))
        assert sk.tolist() == want

    def test_empty(self):
        sk = kmv_sketch(_ds([]), ["v"], k=32)
        assert len(sk) == 0 and kmv_estimate(sk, 32) == 0
