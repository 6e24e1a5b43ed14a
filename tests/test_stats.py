"""Grouped correlation/regression (stages/stats.py)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import grouped_corr


def _run(t, blocks=None):
    ds = rd.from_arrow(t)
    if blocks:
        ds = ds.repartition(blocks)
    return (grouped_corr(ds, keys=["k"], x="x", y="y").to_pandas()
            .sort_values("k").reset_index(drop=True))


def test_matches_numpy_corr():
    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], size=n)),
        "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
        "y": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    out = _run(t)
    df = t.to_pandas()
    for _, row in out.iterrows():
        g = df[df.k == row.k]
        r = np.corrcoef(g.x, g.y)[0, 1]
        assert abs(row.corr_micro / 1e6 - r) < 2e-6
        slope = np.polyfit(g.x, g.y, 1)[0]
        assert abs(row.slope_micro / 1e6 - slope) < 2e-6


@pytest.mark.parametrize("blocks", [1, 3, 17])
def test_layout_invariant(blocks):
    rng = np.random.default_rng(9)
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], size=500)),
        "x": pa.array(rng.integers(0, 100, 500), pa.int64()),
        "y": pa.array(rng.integers(0, 100, 500), pa.int64()),
    })
    assert _run(t, blocks).equals(_run(t))


def test_zero_variance_is_null():
    t = pa.table({
        "k": pa.array(["a"] * 5),
        "x": pa.array([7] * 5, pa.int64()),      # constant x
        "y": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = _run(t)
    assert out.corr_micro.isna().all()
    assert out.slope_micro.isna().all()


def test_intercept_r2_match_numpy():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(21)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], size=n)),
        "x": pa.array(rng.integers(0, 500, n), pa.int64()),
        "y": pa.array(rng.integers(0, 500, n), pa.int64()),
    })
    out = _run(t)
    df = t.to_pandas()
    for _, row in out.iterrows():
        g = df[df.k == row.k]
        slope, inter = np.polyfit(g.x, g.y, 1)
        r = np.corrcoef(g.x, g.y)[0, 1]
        assert abs(row.intercept_micro / 1e6 - inter) < 5e-4
        assert abs(row.r2_micro / 1e6 - r * r) < 2e-6
