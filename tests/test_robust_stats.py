"""Robust grouped stats (stages/stats.grouped_median_mad /
grouped_trimmed_mean) — exact vs a DuckDB replay on odd/even group
sizes, negatives and interpolated (half-unit) medians."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.stats import grouped_median_mad, grouped_trimmed_mean


def _fixture():
    rng = np.random.default_rng(7)
    n = 4001  # odd total; per-group sizes mixed odd/even
    key = rng.choice(["a", "b", "c"], size=n)
    val = rng.integers(-500, 500, size=n).astype(np.int64)
    return pa.table({"k": key, "v": val})


def test_median_mad_matches_duckdb():
    t = _fixture()
    got = grouped_median_mad(rd.from_arrow(t), key="k", value_col="v")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH m AS (
          SELECT k, CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2,
                 CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY k)
        SELECT t.k,
               any_value(m.med2) AS med_half,
               CAST(2 * quantile_cont(abs(2 * t.v - m.med2), 0.5)
                    AS BIGINT) AS mad_quarter,
               any_value(m.n) AS n
        FROM t JOIN m ON t.k = m.k GROUP BY t.k ORDER BY t.k
    """).df()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["med_half"].tolist() == want["med_half"].tolist()
    assert got["mad_quarter"].tolist() == want["mad_quarter"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_median_mad_known_values():
    # group x: [1,2,3,4] -> median 2.5 (med_half 5),
    #          devs |2v-5| = [3,1,1,3] -> median 2 -> mad_quarter 4
    t = pa.table({"k": ["x"] * 4 + ["y"] * 3,
                  "v": [1, 2, 3, 4, -10, 0, 10]})
    got = grouped_median_mad(rd.from_arrow(t), key="k", value_col="v")
    row = got.set_index("k")
    assert row.loc["x", "med_half"] == 5
    assert row.loc["x", "mad_quarter"] == 4
    assert row.loc["y", "med_half"] == 0    # median 0
    assert row.loc["y", "mad_quarter"] == 40  # MAD 10


def test_trimmed_mean_matches_duckdb():
    t = _fixture()
    got = grouped_trimmed_mean(rd.from_arrow(t), key="k", value_col="v")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        WITH b AS (
          SELECT k, quantile_disc(v, 0.1) AS lo,
                 quantile_disc(v, 0.9) AS hi
          FROM t GROUP BY k)
        SELECT t.k, CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(t.v) AS BIGINT) AS sum_kept,
               CAST(round(avg(t.v) * 10000) AS BIGINT) AS micro
        FROM t JOIN b ON t.k = b.k
        WHERE t.v BETWEEN b.lo AND b.hi
        GROUP BY t.k ORDER BY t.k
    """).df()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["n_kept"].tolist() == want["n_kept"].tolist()
    assert got["sum_kept"].tolist() == want["sum_kept"].tolist()
    assert got["trimmed_mean_micro"].tolist() == want["micro"].tolist()
