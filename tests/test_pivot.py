"""stages/pivot.py: long→wide and wide→long reshapes."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.stages.pivot import pivot, unpivot


@pytest.fixture
def long_df():
    rng = np.random.default_rng(23)
    return pd.DataFrame({
        "g": rng.integers(0, 20, 400),
        "cat": rng.choice(list("abcd"), 400),
        "v": rng.integers(-50, 50, 400),
    })


def test_pivot_sum_matches_pandas(ray_session, long_df):
    got = pivot(rd.from_pandas(long_df).repartition(6), keys=["g"],
                pivot_col="cat", value_col="v",
                columns=list("abc")).to_pandas()  # 'd' NOT declared
    exp = (long_df[long_df["cat"].isin(list("abc"))]
           .pivot_table(index="g", columns="cat", values="v",
                        aggfunc="sum", fill_value=0)
           .reindex(columns=list("abc"), fill_value=0))
    # groups with only 'd' rows still appear (they exist in groupby
    # output with all-zero declared columns)? No: they collapse away
    # in widen's isin filter — compare on the intersection
    got = got.set_index("g").sort_index()
    for g in exp.index:
        for c in "abc":
            assert got.loc[g, c] == exp.loc[g, c], (g, c)


@pytest.mark.parametrize("agg", ["count", "min", "max", "mean"])
def test_pivot_other_aggs(ray_session, long_df, agg):
    got = pivot(rd.from_pandas(long_df).repartition(5), keys=["g"],
                pivot_col="cat", value_col="v",
                columns=list("ab"), agg=agg).to_pandas()
    sub = long_df[long_df["cat"].isin(list("ab"))]
    fn = {"count": "count", "min": "min", "max": "max",
          "mean": "mean"}[agg]
    exp = sub.pivot_table(index="g", columns="cat", values="v",
                          aggfunc=fn)
    got = got.set_index("g").sort_index()
    for g in exp.index:
        for c in "ab":
            e = exp.loc[g, c] if c in exp.columns else np.nan
            v = got.loc[g, c]
            if pd.isna(e):
                # absent combinations: count/min/max pivots fill 0 via
                # the sum-combine; mean yields NaN
                assert (np.isnan(v) if agg == "mean" else v == 0)
            elif agg == "mean":
                assert np.isclose(v, e)
            else:
                assert v == e, (g, c, agg)


def test_unpivot_roundtrip(ray_session, long_df):
    wide = pivot(rd.from_pandas(long_df).repartition(4), keys=["g"],
                 pivot_col="cat", value_col="v", columns=list("abcd"))
    back = unpivot(wide, keys=["g"], value_cols=list("abcd"),
                   var_col="cat", value_col="v").to_pandas()
    exp = (long_df.groupby(["g", "cat"])["v"].sum().reset_index())
    m = back.merge(exp, on=["g", "cat"], how="left",
                   suffixes=("", "_exp"))
    m["v_exp"] = m["v_exp"].fillna(0)
    assert (m["v"] == m["v_exp"]).all()
    assert len(back) == wide.count() * 4


def test_rollup_levels(ray_session, long_df):
    from vector_ray.stages.pivot import rollup

    got = rollup(rd.from_pandas(long_df).repartition(4),
                 keys=["cat", "g"], value_col="v").to_pandas()
    total = long_df["v"].sum()
    # grand total
    gt = got[got["grouping_level"] == 2]
    assert len(gt) == 1 and gt["v"].iloc[0] == total
    assert (gt[["cat", "g"]].values == "__all__").all()
    # per-cat level sums to the total
    l1 = got[got["grouping_level"] == 1]
    assert l1["v"].sum() == total and (l1["g"] == "__all__").all()
    exp_cat = long_df.groupby("cat")["v"].sum()
    assert dict(zip(l1["cat"], l1["v"])) == exp_cat.to_dict()
    # finest level matches pandas groupby (keys stringified)
    l0 = got[got["grouping_level"] == 0]
    exp0 = long_df.groupby(["cat", "g"])["v"].sum().reset_index()
    m = {(r["cat"], str(r["g"])): r["v"] for _, r in exp0.iterrows()}
    assert dict(zip(zip(l0["cat"], l0["g"]), l0["v"])) == m


def test_pivot_layout_sweep_strict_vs_duckdb(ray_session):
    """Driver-faithful compare (value hash over name-sorted columns,
    dtype-sensitive) across block layouts — guards the round-3 driver
    red row: DuckDB sum(BIGINT) is HUGEINT (float64 in .df()) unless
    the oracle casts, and pandas pivot_table promoted int64→float64
    whenever a block's cell grid had holes (layout-dependent)."""
    import duckdb
    import hashlib
    import pyarrow as pa
    import pyarrow.compute as pc

    path = "/root/testdata/sf0.001/events.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    from vector_ray import oracle

    want = con.sql(oracle.SQL_PIVOT_EVENTS).df()

    def vhash(df):
        df = (df.reindex(sorted(df.columns), axis=1)
              .sort_values(sorted(df.columns)).reset_index(drop=True))
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    assert all(str(want[c].dtype) == "int64" for c in want.columns)
    kinds = ["click", "error", "purchase", "signup", "view"]

    def cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "value_cents",
            pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                    pa.int64()))

    for nb in (1, 7, 64):
        ds = rd.read_parquet(
            path, columns=["user_id", "event_type", "value"],
            override_num_blocks=nb,
        ).map_batches(cents, batch_format="pyarrow", batch_size=None)
        got = pivot(ds, keys=["user_id"], pivot_col="event_type",
                    value_col="value_cents", columns=kinds).to_pandas()
        assert all(str(got[c].dtype) == "int64" for c in got.columns), nb
        assert vhash(got) == vhash(want), nb


def test_cube_and_grouping_sets(ray_session):
    import pyarrow as pa

    from vector_ray.stages.pivot import cube, grouping_sets

    t = pa.table({
        "a": pa.array(["x", "x", "y"]),
        "b": pa.array(["p", "q", "p"]),
        "v": pa.array([1, 2, 4], pa.int64()),
    })
    out = (cube(rd.from_arrow(t), keys=["a", "b"], value_col="v")
           .to_pandas().sort_values(["grouping_id", "a", "b"])
           .reset_index(drop=True))
    want = pd.DataFrame({
        "a": ["x", "x", "y", "x", "y", "__all__", "__all__", "__all__"],
        "b": ["p", "q", "p", "__all__", "__all__", "p", "q", "__all__"],
        "v": [1, 2, 4, 3, 4, 5, 2, 7],
        "grouping_id": [0, 0, 0, 1, 1, 2, 2, 3],
    })
    assert out.astype(object).equals(want.astype(object))

    # GROUPING SETS ((a, b), ()) — just the two requested sets
    gs = (grouping_sets(rd.from_arrow(t), keys=["a", "b"],
                        value_col="v", masks=[0, 3])
          .to_pandas().sort_values(["grouping_id", "a", "b"])
          .reset_index(drop=True))
    assert list(gs.grouping_id.unique()) == [0, 3]
    assert len(gs) == 4
    assert gs[gs.grouping_id == 3].v.iloc[0] == 7
