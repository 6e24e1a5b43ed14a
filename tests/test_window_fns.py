"""window_functions: pandas parity, carry chains across blocks, nulls."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.stages.window_fns import window_functions


def _expected(df: pd.DataFrame, w: int) -> pd.DataFrame:
    df = df.sort_values(["k", "ts", "id"]).reset_index(drop=True)
    g = df.groupby("k", sort=False)["v"]
    out = df.copy()
    out["rn"] = g.cumcount() + 1
    out["lag_value"] = g.shift(1)
    out["lead_value"] = g.shift(-1)
    out["cum_value"] = g.cumsum()
    out["roll_value"] = g.rolling(w, min_periods=1).sum().reset_index(
        level=0, drop=True)
    return out


def _run(df: pd.DataFrame, w: int, nblocks: int) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(nblocks)
    got = window_functions(
        ds, keys=["k"], order_by=["ts", "id"], value_col="v",
        rolling_window=w,
    ).to_pandas()
    return got.sort_values(["k", "ts", "id"]).reset_index(drop=True)


@pytest.mark.parametrize("nblocks", [1, 3, 17])
def test_int_parity_many_blocks(ray_session, nblocks):
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),       # few keys → long runs span blocks
        "ts": rng.permutation(n),
        "id": np.arange(n),
        "v": rng.integers(-50, 50, n).astype("int64"),
    })
    w = 4
    got = _run(df, w, nblocks)
    exp = _expected(df, w)
    assert got["rn"].tolist() == exp["rn"].tolist()
    assert got["cum_value"].tolist() == exp["cum_value"].astype(int).tolist()
    assert got["roll_value"].tolist() == exp["roll_value"].astype(int).tolist()
    # lag/lead: nullable int64 vs pandas float-with-NaN
    for col in ("lag_value", "lead_value"):
        g = got[col].astype("float64").where(got[col].notna(), np.nan)
        assert np.allclose(g, exp[col], equal_nan=True)


def test_float_values_and_single_row_runs(ray_session):
    # every key appears once: lag/lead all null, rn=1, cum=roll=v
    df = pd.DataFrame({
        "k": np.arange(20), "ts": np.zeros(20, dtype=int),
        "id": np.arange(20), "v": np.linspace(-1.5, 2.5, 20),
    })
    got = _run(df, 3, 5)
    assert (got["rn"] == 1).all()
    assert got["lag_value"].isna().all()
    assert got["lead_value"].isna().all()
    assert np.allclose(got["cum_value"], got["v"])
    assert np.allclose(got["roll_value"], got["v"])


def test_rolling_window_1_is_identity(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2], "ts": [1, 2, 3, 1, 2],
        "id": range(5), "v": [10, 20, 30, 40, 50],
    })
    got = _run(df, 1, 2)
    assert got["roll_value"].tolist() == got["v"].tolist()


# --- stratified sampling (stages/sample.stratified_sample) ---------------

def test_stratified_sample_exact_ceil(ray_session):
    import pandas as pd
    from vector_ray.stages.sample import stratified_sample

    df = pd.DataFrame({
        "id": np.arange(103),
        "grp": ["a"] * 50 + ["b"] * 31 + ["c"] * 21 + ["d"] * 1,
    })
    out = stratified_sample(
        rd.from_pandas(df).repartition(4), keys=["grp"], frac=(1, 4),
        id_col="id").to_pandas()
    got = out.groupby("grp").size().to_dict()
    assert got == {"a": 13, "b": 8, "c": 6, "d": 1}  # ceil(n/4), min 1
    # deterministic: same rows every run
    out2 = stratified_sample(
        rd.from_pandas(df).repartition(9), keys=["grp"], frac=(1, 4),
        id_col="id").to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])


def test_stratified_sample_full_fraction(ray_session):
    import pandas as pd
    from vector_ray.stages.sample import stratified_sample

    df = pd.DataFrame({"id": np.arange(20), "grp": ["x"] * 20})
    out = stratified_sample(rd.from_pandas(df), keys=["grp"],
                            frac=(1, 1), id_col="id").to_pandas()
    assert sorted(out["id"]) == list(range(20))


# --- exact grouped quantiles (stages/quantile_exact.py) ------------------

def test_grouped_quantiles_match_numpy(ray_session):
    import pandas as pd
    from vector_ray.stages.quantile_exact import grouped_quantiles

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 500),
        "v": rng.integers(-1000, 1000, 500),
    })
    got = grouped_quantiles(
        rd.from_pandas(df).repartition(7), keys=["g"], value_col="v",
        qs={"p25": (1, 4), "p50": (1, 2), "p99": (99, 100)})
    for _, row in got.iterrows():
        vals = np.sort(df[df["g"] == row["g"]]["v"].to_numpy())
        n = len(vals)
        assert row["n"] == n
        for name, (num, den) in (("p25", (1, 4)), ("p50", (1, 2)),
                                 ("p99", (99, 100))):
            idx = -(-num * n // den) - 1  # ceil(q*n) - 1
            assert row[name] == vals[idx], (row["g"], name)


def test_grouped_quantiles_singleton_and_ties(ray_session):
    import pandas as pd
    from vector_ray.stages.quantile_exact import grouped_quantiles

    df = pd.DataFrame({"g": ["x"] * 6 + ["solo"],
                       "v": [5, 5, 5, 1, 9, 5, 42]})
    got = grouped_quantiles(
        rd.from_pandas(df).repartition(3), keys=["g"], value_col="v",
        qs={"p50": (1, 2)}).set_index("g")
    assert got.loc["x", "p50"] == 5      # ties collapse to the value
    assert got.loc["solo", "p50"] == 42
    assert got.loc["solo", "n"] == 1


# --- event-time RANGE-frame rolling sum ----------------------------------

def test_time_range_sum_with_peers(ray_session):
    import pandas as pd
    from vector_ray.stages.window_fns import time_range_sum

    # key x: ts 0,10,10,15,30 with window 10 — peers at ts=10 must get
    # the SAME sum (RANGE includes all peers of the current ts)
    df = pd.DataFrame({
        "k": ["x"] * 5 + ["y"] * 2,
        "ts": [0, 10, 10, 15, 30, 5, 100],
        "id": range(7),
        "v": [1, 2, 4, 8, 16, 32, 64],
    })
    got = time_range_sum(
        rd.from_pandas(df).repartition(3), keys=["k"], ts_col="ts",
        value_col="v", preceding=10, tiebreak="id",
    ).to_pandas().sort_values("id")
    # x: ts0 -> 1; ts10 peers -> 1+2+4=7 BOTH; ts15 -> 2+4+8=14
    # (ts0 out: 15-10=5 > 0); ts30 -> 16; y: 32, 64
    assert got["range_sum"].tolist() == [1, 7, 7, 14, 16, 32, 64]


def test_time_range_sum_matches_pandas_rolling(ray_session):
    import pandas as pd
    from vector_ray.stages.window_fns import time_range_sum

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n),
        "ts": rng.integers(0, 2000, n),
        "id": np.arange(n),
        "v": rng.integers(1, 100, n),
    })
    got = time_range_sum(
        rd.from_pandas(df).repartition(5), keys=["k"], ts_col="ts",
        value_col="v", preceding=50, tiebreak="id",
    ).to_pandas()
    m = got.set_index("id")["range_sum"].to_dict()
    for _, r in df.iterrows():
        win = df[(df["k"] == r["k"]) & (df["ts"] >= r["ts"] - 50)
                 & (df["ts"] <= r["ts"])]
        assert m[r["id"]] == win["v"].sum(), r["id"]


def test_time_range_sum_fused_equals_asof_hostile_layouts(ray_session):
    """Fused frame-start (one exchange, carry-chained searchsorted)
    must equal the asof fallback exactly — including a hot key
    spanning many blocks, exact-ts peers, and windows crossing block
    boundaries."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import time_range_sum

    rng = np.random.default_rng(11)
    n = 30_000
    # one hot key = 50% of rows; ts with many exact-duplicate peers
    k = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 40, n))
    ts = rng.integers(0, 5_000, n) * 10  # peers guaranteed
    v = rng.integers(-5, 100, n)
    tbl = pa.table({
        "k": pa.array(k.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64)),
        "v": pa.array(v.astype(np.int64)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    })
    for nb in (1, 3, 17, 64):
        ds = rd.from_arrow(tbl).repartition(nb)
        out = {}
        for impl in ("fused", "asof"):
            r = time_range_sum(ds, keys=["k"], ts_col="ts",
                               value_col="v", preceding=500,
                               out_col="s", impl=impl).to_pandas()
            out[impl] = (r[["rid", "s"]].sort_values("rid")
                         .reset_index(drop=True))
        pd.testing.assert_frame_equal(out["fused"], out["asof"]), nb
    # brute-force truth on a small slice
    small = tbl.slice(0, 800).to_pandas()
    got = time_range_sum(rd.from_arrow(tbl.slice(0, 800)).repartition(5),
                         keys=["k"], ts_col="ts", value_col="v",
                         preceding=500, out_col="s").to_pandas()
    got = got.set_index("rid")["s"]
    for _, row in small.sample(60, random_state=0).iterrows():
        m = (small["k"] == row["k"]) & (small["ts"] <= row["ts"]) \
            & (small["ts"] >= row["ts"] - 500)
        assert got[row["rid"]] == small.loc[m, "v"].sum()


def test_rank_dense_rank_vs_duckdb_hostile_layouts(ray_session):
    """rank()/dense_rank() with a hot key and heavy ties: tie groups
    straddle sorted blocks, exercising the carried tie-group-start and
    dense-count chain."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(42)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.25, 0.25, 0.5], size=n)),
        "o": pa.array(rng.integers(0, 40, size=n)),
        "v": pa.array(rng.integers(0, 100, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, o, rank() OVER w AS rnk, dense_rank() OVER w AS drk"
        " FROM t WINDOW w AS (PARTITION BY k ORDER BY o)").df()
    wg = (want.groupby(["k", "o"])
          .agg(rnk=("rnk", "first"), drk=("drk", "first")).reset_index())

    for blocks in (1, 3, 17, 64):
        out = window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["o"], value_col="v",
            rank_col="rnk", dense_rank_col="drk").to_pandas()
        og = (out.groupby(["k", "o"])
              .agg(rnk=("rnk", "first"), drk=("drk", "first"),
                   rmax=("rnk", "max"), dmax=("drk", "max"))
              .reset_index())
        # rank constant within a tie group regardless of layout
        assert (og.rnk == og.rmax).all() and (og.drk == og.dmax).all()
        m = og.merge(wg, on=["k", "o"], suffixes=("_g", "_w"))
        assert (m.rnk_g == m.rnk_w).all(), blocks
        assert (m.drk_g == m.drk_w).all(), blocks


def test_rank_nulls_are_peers(ray_session):
    """SQL ORDER BY peers: NULL order values tie with each other and
    sort last (Ray sort + DuckDB default agree)."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    t = pa.table({
        "k": pa.array(["a"] * 6),
        "o": pa.array([None, None, 1, 1, 2, None], pa.int64()),
        "v": pa.array([1] * 6, pa.int64()),
    })
    out = window_functions(
        rd.from_arrow(t).repartition(3), keys=["k"], order_by=["o"],
        value_col="v", rank_col="rnk", dense_rank_col="drk").to_pandas()
    by_o = out.sort_values("o", na_position="last")
    assert list(by_o.rnk) == [1, 1, 3, 4, 4, 4]
    assert list(by_o.drk) == [1, 1, 2, 3, 3, 3]


def test_ntile_percent_rank_vs_duckdb(ray_session):
    """Partition totals via the backward run-continuation chain: ntile
    over a total order, percent_rank over heavy ties, all layouts."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(7)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.2, 0.2, 0.6], size=n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "b": pa.array(rng.integers(0, 25, size=n)),
        "v": pa.array(rng.integers(0, 100, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, o, ntile(5) OVER (PARTITION BY k ORDER BY o) nt,"
        " round(percent_rank() OVER (PARTITION BY k ORDER BY b)"
        "       * 1000000) pr"
        " FROM t").df().sort_values(["k", "o"]).reset_index(drop=True)
    for blocks in (1, 3, 17):
        o1 = window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["o"], value_col="v", ntile=5)
        o2 = window_functions(
            o1, keys=["k"], order_by=["b"], value_col="v",
            rn_col="rn2", lag_col="lag2", lead_col="lead2",
            cum_col="cum2", roll_col="roll2",
            rank_col="r2", percent_rank_col="pr")
        got = (o2.to_pandas().sort_values(["k", "o"])
               .reset_index(drop=True))
        assert (got.ntile == want.nt).all(), blocks
        assert ((got.pr * 1000000).round() == want.pr).all(), blocks


def test_ntile_single_and_small_partitions(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    # T < N: every row its own tile; T == 1: percent_rank is 0
    t = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "o": pa.array([1, 2, 5], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    out = (window_functions(
        rd.from_arrow(t).repartition(2), keys=["k"], order_by=["o"],
        value_col="v", ntile=5, percent_rank_col="pr", rank_col="r")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    assert list(out.ntile) == [1, 2, 1]
    assert list(out.pr) == [0.0, 1.0, 0.0]


def test_cume_dist_first_value_vs_duckdb(ray_session):
    """cume_dist bit-matches under heavy ties (third backward chain:
    leading-tie-group counts); first_value is partition-constant and
    comes from the first tie group."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.2, 0.2, 0.6], size=n)),
        "b": pa.array(rng.integers(0, 25, size=n)),
        "v": pa.array(rng.integers(0, 100, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, b, round(cume_dist() OVER w * 1000000) cd FROM t"
        " WINDOW w AS (PARTITION BY k ORDER BY b)").df()
    wg = want.groupby(["k", "b"]).agg(cd=("cd", "first")).reset_index()
    fg = (t.to_pandas().groupby("k")
          .apply(lambda d: set(d[d.b == d.b.min()].v),
                 include_groups=False).to_dict())
    for blocks in (1, 3, 17):
        out = window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["b"], value_col="v", rank_col="r",
            cume_dist_col="cd", first_value_col="fv").to_pandas()
        og = (out.groupby(["k", "b"])
              .agg(cd=("cd", "first"), cmin=("cd", "min"),
                   cmax=("cd", "max")).reset_index())
        assert ((og.cmax - og.cmin).abs() < 1e-12).all()
        og["cdm"] = (og.cd * 1000000).round()
        m = og.merge(wg, on=["k", "b"], suffixes=("_g", "_w"))
        assert (m.cdm == m.cd_w).all(), blocks
        assert (out.groupby("k").fv.nunique() == 1).all()
        assert all(r.fv in fg[r.k]
                   for r in out.drop_duplicates("k").itertuples())


def test_lag_lead_arbitrary_offset_vs_duckdb(ray_session):
    """lag(v, 7) / lead(v, 7): the tail carry and the accumulated
    backward head chain serve any offset at any layout (64 blocks over
    4k rows forces runs spanning many tiny blocks)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(13)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.1, 0.1, 0.8], size=n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, o, coalesce(lag(v, 7) OVER w, -1) lg,"
        " coalesce(lead(v, 7) OVER w, -1) ld FROM t"
        " WINDOW w AS (PARTITION BY k ORDER BY o)"
    ).df().sort_values(["k", "o"]).reset_index(drop=True)
    for blocks in (1, 17, 64):
        out = (window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["o"], value_col="v",
            lag_offset=7, lead_offset=7)
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
        assert (out.lag_value.fillna(-1).astype(int) == want.lg).all()
        assert (out.lead_value.fillna(-1).astype(int) == want.ld).all()


def test_nth_value_vs_duckdb(ray_session):
    """nth_value(v, 5): forward run-head carry serves runs spanning
    blocks; null until the frame holds 5 rows."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(17)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.1, 0.1, 0.8], size=n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, o, coalesce(nth_value(v, 5) OVER w, -1) nv FROM t"
        " WINDOW w AS (PARTITION BY k ORDER BY o)"
    ).df().sort_values(["k", "o"]).reset_index(drop=True)
    for blocks in (1, 17, 64):
        out = (window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["o"], value_col="v", nth_value=5)
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
        assert (out.nth_value.fillna(-1).astype(int) == want.nv).all()


@pytest.mark.parametrize("seed", [101, 202])
def test_window_family_differential_fuzz(ray_session, seed):
    """All twelve window functions vs DuckDB on a seeded random table
    with a random hostile layout (tiny blocks force runs and tie
    groups to span many blocks)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 2500))
    nk = int(rng.integers(1, 30))
    t = pa.table({
        "k": pa.array(rng.integers(0, nk, n).astype(str)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "b": pa.array(rng.integers(0, max(2, n // 100), n)),
        "v": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    lagk = int(rng.integers(1, 9))
    leadk = int(rng.integers(1, 9))
    nthk = int(rng.integers(1, 6))
    ntl = int(rng.integers(2, 8))
    want = con.execute(f"""
SELECT k, o,
  row_number() OVER wt rn, coalesce(lag(v,{lagk}) OVER wt,-9999) lg,
  coalesce(lead(v,{leadk}) OVER wt,-9999) ld,
  sum(v) OVER (wt ROWS UNBOUNDED PRECEDING) cm,
  sum(v) OVER (wt ROWS 3 PRECEDING) rl,
  ntile({ntl}) OVER wt nt,
  coalesce(nth_value(v,{nthk}) OVER wt,-9999) nv,
  first_value(v) OVER wt fv,
  rank() OVER wb rk, dense_rank() OVER wb dr,
  round(percent_rank() OVER wb*1e6) pr,
  round(cume_dist() OVER wb*1e6) cd
FROM t WINDOW wt AS (PARTITION BY k ORDER BY o),
             wb AS (PARTITION BY k ORDER BY b)
""").df().sort_values(["k", "o"]).reset_index(drop=True)
    blocks = int(rng.integers(1, 70))
    o1 = window_functions(
        rd.from_arrow(t).repartition(blocks), keys=["k"],
        order_by=["o"], value_col="v", rolling_window=4,
        lag_offset=lagk, lead_offset=leadk, ntile=ntl,
        nth_value=nthk, first_value_col="fv")
    o2 = window_functions(
        o1, keys=["k"], order_by=["b"], value_col="v",
        rn_col="rn2", lag_col="lag2", lead_col="lead2",
        cum_col="cum2", roll_col="roll2", rank_col="rk",
        dense_rank_col="dr", percent_rank_col="pr",
        cume_dist_col="cd")
    got = o2.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert (got.rn.values == want.rn.values).all()
    assert (got.lag_value.fillna(-9999).astype(int).values
            == want.lg.values).all()
    assert (got.lead_value.fillna(-9999).astype(int).values
            == want.ld.values).all()
    assert (got.cum_value.values == want.cm.astype(int).values).all()
    assert (got.roll_value.values == want.rl.astype(int).values).all()
    assert (got.ntile.values == want.nt.values).all()
    assert (got.nth_value.fillna(-9999).astype(int).values
            == want.nv.values).all()
    assert (got.fv.values == want.fv.values).all()
    assert (got.rk.values == want.rk.values).all()
    assert (got.dr.values == want.dr.values).all()
    # half-away quantization on BOTH sides (DuckDB round; banker's
    # flips on exact half-micros, e.g. partition size 129)
    import numpy as _np

    def _ha(s):
        m = s.values * 1e6
        return _np.where(m >= 0, _np.floor(m + 0.5),
                         _np.ceil(m - 0.5))
    assert (_ha(got.pr) == want.pr.values).all()
    assert (_ha(got.cd) == want.cd.values).all()


def test_last_value_full_partition_vs_duckdb(ray_session):
    """last_value over the full partition: backward final-value chain
    (the run's end may be blocks later)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.window_fns import window_functions

    rng = np.random.default_rng(23)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "hot"],
                                 p=[0.1, 0.1, 0.8], size=n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, size=n), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, o, last_value(v) OVER (PARTITION BY k ORDER BY o"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) lv"
        " FROM t").df().sort_values(["k", "o"]).reset_index(drop=True)
    for blocks in (1, 17, 64):
        out = (window_functions(
            rd.from_arrow(t).repartition(blocks), keys=["k"],
            order_by=["o"], value_col="v", last_value_col="lv")
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
        assert (out.lv.values == want.lv.values).all(), blocks


def test_time_range_sum_two_sided_matches_bruteforce(ray_session):
    """following= frames across hostile layouts: asymmetric bounds,
    exact-ts peers, a hot key spanning many blocks — brute-force
    reference over the whole frame [ts-p, ts+f]."""
    import pandas as pd
    from vector_ray.stages.window_fns import time_range_sum

    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.6, 0, rng.integers(1, 5, n)),
        "ts": rng.integers(0, 300, n),        # dense -> many peers
        "id": np.arange(n),
        "v": rng.integers(1, 100, n),
    })
    for parts in (1, 3, 17):
        got = time_range_sum(
            rd.from_pandas(df).repartition(parts), keys=["k"],
            ts_col="ts", value_col="v", preceding=20, following=35,
            tiebreak="id", out_col="s",
        ).to_pandas().set_index("id")["s"].to_dict()
        for _, r in df.iterrows():
            win = df[(df["k"] == r["k"]) & (df["ts"] >= r["ts"] - 20)
                     & (df["ts"] <= r["ts"] + 35)]
            assert got[r["id"]] == win["v"].sum(), (parts, r["id"])


def test_time_range_sum_following_zero_equals_one_sided(ray_session):
    import pandas as pd
    from vector_ray.stages.window_fns import time_range_sum

    rng = np.random.default_rng(5)
    n = 200
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "ts": rng.integers(0, 500, n),
        "id": np.arange(n),
        "v": rng.integers(1, 50, n),
    })
    a = time_range_sum(
        rd.from_pandas(df).repartition(4), keys=["k"], ts_col="ts",
        value_col="v", preceding=30, tiebreak="id",
    ).to_pandas().set_index("id")["range_sum"]
    b = time_range_sum(
        rd.from_pandas(df).repartition(4), keys=["k"], ts_col="ts",
        value_col="v", preceding=30, following=0, tiebreak="id",
    ).to_pandas().set_index("id")["range_sum"]
    assert a.sort_index().tolist() == b.sort_index().tolist()
