"""asof_join (stages/asof.py) vs pandas.merge_asof across strategies,
tolerance, by-keys, join modes, and block-boundary carries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.asof import asof_join


def _mk(seed, n_left, n_right, n_keys):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.choice(np.arange(10_000), n_left, replace=False).astype("int64"),
        "lv": np.arange(n_left, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": rng.choice(np.arange(10_000, 20_000), n_right,
                         replace=False).astype("int64"),
        "rv": np.arange(n_right, dtype="int64") * 10,
    })
    # overlap the ranges so matches exist in both directions
    right["ts"] = right["ts"] - 10_000
    return left, right


def _expected(left, right, strategy, tolerance=None, by=("k",)):
    out = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by=list(by) if by else None, direction=strategy,
        tolerance=tolerance, suffixes=("", "_r"),
    )
    return out


def _got(left, right, strategy, tolerance=None, by=("k",), how="left",
         blocks=6):
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(blocks)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(blocks)
    res = asof_join(lds, rds, on="ts", by=by, strategy=strategy,
                    tolerance=tolerance, how=how).to_pandas()
    return res


def _cmp(got, want):
    keys = [c for c in ("k", "ts") if c in got.columns]
    g = got.sort_values(keys).reset_index(drop=True)
    w = want.sort_values(keys).reset_index(drop=True)
    w = w[g.columns]
    for c in g.columns:
        gv = g[c].astype("float64")
        wv = w[c].astype("float64")
        assert gv.equals(wv), (c, g[~(gv.eq(wv) | (gv.isna() & wv.isna()))])


@pytest.mark.parametrize("strategy", ["backward", "forward"])
def test_matches_pandas_merge_asof(ray_session, strategy):
    left, right = _mk(7, 300, 200, 12)
    got = _got(left, right, strategy)
    want = _expected(left, right, strategy)
    # merge_asof keeps the right ts only via suffix when names collide
    want = want.rename(columns={"ts_r": "ts_r"})
    got = got.drop(columns=["ts_r"])
    _cmp(got, want[got.columns])


@pytest.mark.parametrize("strategy", ["backward", "forward"])
def test_tolerance(ray_session, strategy):
    left, right = _mk(11, 250, 150, 8)
    got = _got(left, right, strategy, tolerance=40).drop(columns=["ts_r"])
    want = _expected(left, right, strategy, tolerance=40)
    _cmp(got, want[got.columns])


def test_no_by_keys_global_asof(ray_session):
    left, right = _mk(3, 120, 80, 1)
    left = left.drop(columns=["k"])
    right = right.drop(columns=["k"])
    got = _got(left, right, "backward", by=()).drop(columns=["ts_r"])
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                         on="ts", direction="backward", suffixes=("", "_r"))
    _cmp(got, want[got.columns])


def test_inner_drops_unmatched(ray_session):
    left, right = _mk(5, 200, 60, 20)
    outer = _got(left, right, "backward", how="left")
    inner = _got(left, right, "backward", how="inner")
    assert len(inner) == outer["rv"].notna().sum()
    assert inner["rv"].notna().all()


def test_ties_are_inclusive(ray_session):
    left = pd.DataFrame({"k": [1, 1], "ts": [100, 200],
                         "lv": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "ts": [100, 200],
                          "rv": [7, 8]})
    got = _got(left, right, "backward", blocks=1)
    by_ts = dict(zip(got["ts"], got["rv"]))
    assert by_ts == {100: 7, 200: 8}
    got_f = _got(left, right, "forward", blocks=1)
    by_ts = dict(zip(got_f["ts"], got_f["rv"]))
    assert by_ts == {100: 7, 200: 8}


def test_block_boundary_carry(ray_session):
    # one hot key spanning many blocks: every left row's match sits in
    # an EARLIER block, exercising the driver chain scan
    left = pd.DataFrame({"k": np.zeros(400, dtype="int64"),
                         "ts": (np.arange(400) * 10 + 5).astype("int64"),
                         "lv": np.arange(400, dtype="int64")})
    right = pd.DataFrame({"k": np.zeros(40, dtype="int64"),
                          "ts": (np.arange(40) * 100).astype("int64"),
                          "rv": np.arange(40, dtype="int64")})
    got = _got(left, right, "backward", blocks=16)
    want = pd.merge_asof(left, right, on="ts", by="k",
                         direction="backward", suffixes=("", "_r"))
    _cmp(got.drop(columns=["ts_r"]), want[["k", "ts", "lv", "rv"]])
    # exact expectation: left ts 10i+5 matches right ts 100*(i//10)
    assert (got.sort_values("ts")["rv"].to_numpy()
            == np.arange(400) // 10).all()


def test_null_on_never_matches(ray_session):
    left = pd.DataFrame({"k": [1, 1], "ts": pd.array([100, None],
                                                     dtype="Int64"),
                         "lv": [0, 1]})
    right = pd.DataFrame({"k": [1], "ts": pd.array([50], dtype="Int64"),
                          "rv": [9]})
    got = _got(left, right, "backward", blocks=1)
    m = {lv: rv for lv, rv in zip(got["lv"], got["rv"])}
    assert m[0] == 9 and pd.isna(m[1])


def test_timestamp_tolerance_seconds(ray_session):
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame({"k": [1, 1],
                         "ts": [base + pd.Timedelta(seconds=30),
                                base + pd.Timedelta(seconds=500)],
                         "lv": [0, 1]})
    right = pd.DataFrame({"k": [1], "ts": [base], "rv": [5]})
    got = _got(left, right, "backward", tolerance=60.0, blocks=1)
    m = {lv: rv for lv, rv in zip(got["lv"], got["rv"])}
    assert m[0] == 5 and pd.isna(m[1])


def test_nearest_matches_pandas(ray_session):
    left, right = _mk(13, 300, 200, 10)
    got = _got(left, right, "nearest").drop(columns=["ts_r"])
    want = _expected(left, right, "nearest")
    _cmp(got, want[got.columns])


def test_nearest_with_tolerance(ray_session):
    left, right = _mk(17, 250, 120, 6)
    got = _got(left, right, "nearest", tolerance=35).drop(columns=["ts_r"])
    want = _expected(left, right, "nearest", tolerance=35)
    _cmp(got, want[got.columns])


def test_nearest_tie_goes_backward(ray_session):
    left = pd.DataFrame({"k": [1], "ts": [100], "lv": [0]})
    right = pd.DataFrame({"k": [1, 1], "ts": [95, 105], "rv": [7, 8]})
    got = _got(left, right, "nearest", blocks=1)
    assert got["rv"].tolist() == [7]


def test_nearest_forward_carry_across_blocks(ray_session):
    # left rows whose nearest right sits FORWARD in a later block:
    # rights all at the end of the domain, lefts just before them
    left = pd.DataFrame({"k": np.zeros(100, dtype="int64"),
                         "ts": (np.arange(100) * 10).astype("int64"),
                         "lv": np.arange(100, dtype="int64")})
    right = pd.DataFrame({"k": np.zeros(3, dtype="int64"),
                          "ts": np.array([400, 700, 995], dtype="int64"),
                          "rv": np.array([0, 1, 2], dtype="int64")})
    got = _got(left, right, "nearest", blocks=16)
    want = pd.merge_asof(left, right, on="ts", by="k",
                         direction="nearest", suffixes=("", "_r"))
    _cmp(got.drop(columns=["ts_r"]), want[["k", "ts", "lv", "rv"]])
