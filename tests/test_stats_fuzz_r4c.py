"""Seeded differential fuzz for the continuation statistics wave:
gini / bitops / twa / ranksum / ks / chi2 / cusum / running_minmax /
streaks / coverage vs DuckDB over random shapes and layouts (the
window-fuzz pattern — half-micro rounding ties and layout-dependent
carries are exactly what multi-seed sweeps catch)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _data(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(150, 900))
    nk = int(rng.integers(2, 9))
    return pa.table({
        "k": pa.array(rng.integers(0, nk, n).astype(str)),
        "ki": pa.array(rng.integers(0, nk, n).astype(np.int64)),
        "i": pa.array(rng.choice(50_000, n, replace=False)
                      .astype(np.int64)),
        "v": pa.array(rng.integers(-300, 2_000, n).astype(np.int64)),
        "vp": pa.array(rng.integers(0, 2_000, n).astype(np.int64)),
        "s": pa.array(rng.choice(list("AB"), n)),
    }), int(rng.choice([1, 3, 11]))


@pytest.mark.parametrize("seed", [41, 42, 43, 44, 45])
class TestStatsFuzz:
    def test_gini(self, seed):
        from vector_ray.stages.stats import grouped_gini
        t, parts = _data(seed)
        got = {r["k"]: r["gini_micro"] for r in grouped_gini(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            x="vp").take_all()}
        con = duckdb.connect(); con.register("t", t)
        want = dict(con.sql("""
            WITH r AS (SELECT k, vp, row_number() OVER
                 (PARTITION BY k ORDER BY vp) AS rn FROM t),
            a AS (SELECT k, sum(rn*vp)::BIGINT S, sum(vp)::BIGINT T,
                         count(*)::BIGINT n FROM r GROUP BY k)
            SELECT k, CASE WHEN T = 0 THEN NULL ELSE
              CAST(round(1000000.0*((2*S-(n+1)*T)/(n*T))) AS BIGINT)
              END FROM a""").fetchall())
        assert got == want

    def test_bitops(self, seed):
        from vector_ray.stages.stats import grouped_bitops
        t, parts = _data(seed)
        got = {r["k"]: (r["band"], r["bor"], r["bxor"])
               for r in grouped_bitops(
                   rd.from_arrow(t).repartition(parts), keys=["k"],
                   x="vp", num_partitions=3).take_all()}
        con = duckdb.connect(); con.register("t", t)
        want = {r[0]: tuple(r[1:]) for r in con.sql("""
            SELECT k, CAST(bit_and(vp) AS BIGINT),
                   CAST(bit_or(vp) AS BIGINT),
                   CAST(bit_xor(vp) AS BIGINT)
            FROM t GROUP BY k""").fetchall()}
        assert got == want

    def test_twa(self, seed):
        from vector_ray.stages.stats import time_weighted_avg
        t, parts = _data(seed)
        got = {r["k"]: r["twa_micro"] for r in time_weighted_avg(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            ts_col="i", value_col="v").take_all()}
        con = duckdb.connect(); con.register("t", t)
        want = dict(con.sql("""
            WITH w AS (SELECT k, v, lead(i) OVER
                 (PARTITION BY k ORDER BY i, v) - i AS dt FROM t),
            a AS (SELECT k, sum(v*dt)::BIGINT num, sum(dt)::BIGINT den
                  FROM w WHERE dt IS NOT NULL GROUP BY k)
            SELECT k, CASE WHEN den = 0 THEN NULL ELSE
              CAST(round(1000000.0*(num/den)) AS BIGINT) END
            FROM a""").fetchall())
        assert got == want

    def test_ranksum_ks(self, seed):
        from vector_ray.stages.stats import ks_statistic, rank_sum_u2
        t, parts = _data(seed)
        ds = rd.from_arrow(t).repartition(parts)
        u = rank_sum_u2(ds, value_col="v", side_col="s",
                        side_a="A", side_b="B")
        ks = ks_statistic(rd.from_arrow(t).repartition(parts),
                          value_col="v", side_col="s",
                          side_a="A", side_b="B")
        con = duckdb.connect(); con.register("t", t)
        wu = con.sql("""
            WITH c AS (SELECT v,
               sum(CASE WHEN s='A' THEN 1 ELSE 0 END)::BIGINT na,
               sum(CASE WHEN s='B' THEN 1 ELSE 0 END)::BIGINT nb
               FROM t GROUP BY v),
            w AS (SELECT na, nb, sum(nb) OVER (ORDER BY v
                ROWS UNBOUNDED PRECEDING) cumb FROM c)
            SELECT CAST(sum(na*(2*cumb-nb)) AS BIGINT)
            FROM w""").fetchone()[0]
        wks = con.sql("""
            WITH c AS (SELECT v,
               sum(CASE WHEN s='A' THEN 1 ELSE 0 END)::BIGINT na,
               sum(CASE WHEN s='B' THEN 1 ELSE 0 END)::BIGINT nb
               FROM t GROUP BY v),
            tot AS (SELECT sum(na)::BIGINT ta, sum(nb)::BIGINT tb
                    FROM c),
            w AS (SELECT sum(na) OVER (ORDER BY v ROWS UNBOUNDED
                    PRECEDING) ca,
                  sum(nb) OVER (ORDER BY v ROWS UNBOUNDED
                    PRECEDING) cb FROM c)
            SELECT CAST(max(abs(ca*tb - cb*ta)) AS BIGINT)
            FROM w CROSS JOIN tot""").fetchone()[0]
        assert u["u2_a"][0].as_py() == wu
        assert ks["ks_num"][0].as_py() == wks

    def test_cusum_runminmax(self, seed):
        from vector_ray.stages.anomaly import cusum_flags
        from vector_ray.stages.sorted_ops import running_minmax
        t, parts = _data(seed)
        k_ref, h = 400, 5_000
        got = {r["i"]: r["cusum"] for r in cusum_flags(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            order_by=["i"], value_col="v", k_ref=k_ref,
            h=h).take_all()}
        rm = {r["i"]: r["run_max"] for r in running_minmax(
            rd.from_arrow(t).repartition(parts), keys=["k"],
            order_by=["i"], value_col="v", op="max").take_all()}
        con = duckdb.connect(); con.register("t", t)
        want = dict(con.sql(f"""
            SELECT i, P - LEAST(0, min(P) OVER (PARTITION BY k
              ORDER BY i ROWS UNBOUNDED PRECEDING))
            FROM (SELECT k, i, sum(v - {k_ref}) OVER (PARTITION BY k
              ORDER BY i ROWS UNBOUNDED PRECEDING) P FROM t)
            """).fetchall())
        wrm = dict(con.sql("""
            SELECT i, max(v) OVER (PARTITION BY k ORDER BY i
              ROWS UNBOUNDED PRECEDING) FROM t""").fetchall())
        assert got == want
        assert rm == wrm

    def test_streaks_coverage(self, seed):
        from vector_ray.stages.paths import max_streak
        from vector_ray.stages.windows import interval_union_length
        t, parts = _data(seed)
        days = pa.table({"u": t["ki"],
                         "d": pa.array(
                             (t["vp"].to_numpy() % 60).astype(
                                 np.int64))})
        got = {r["u"]: r["max_streak"] for r in max_streak(
            rd.from_arrow(days).repartition(parts), key="u",
            seq_col="d", num_partitions=3).take_all()}
        iv = pa.table({"u": t["ki"], "s": t["i"],
                       "e": pa.array(t["i"].to_numpy()
                                     + t["vp"].to_numpy() + 1)})
        cov = {r["u"]: r["covered"] for r in interval_union_length(
            rd.from_arrow(iv).repartition(parts), key="u",
            start_col="s", end_col="e").take_all()}
        con = duckdb.connect()
        con.register("days", days); con.register("iv", iv)
        want = dict(con.sql("""
            WITH dd AS (SELECT DISTINCT u, d FROM days),
            r AS (SELECT u, d, row_number() OVER (PARTITION BY u
                    ORDER BY d) rn FROM dd),
            c AS (SELECT u, count(*)::BIGINT len FROM r
                  GROUP BY u, d - rn)
            SELECT u, max(len) FROM c GROUP BY u""").fetchall())
        wcov = dict(con.sql("""
            WITH r AS (SELECT u, s, e, max(e) OVER (PARTITION BY u
                 ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) pm FROM iv)
            SELECT u, CAST(sum(greatest(0,
                 e - greatest(s, COALESCE(pm, s)))) AS BIGINT)
            FROM r GROUP BY u""").fetchall())
        assert got == want
        assert cov == wcov
