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


def _run_moments(t, blocks=5):
    import ray.data as rd

    from vector_ray.stages.stats import grouped_moments

    ds = rd.from_arrow(t).repartition(blocks)
    return (grouped_moments(ds, keys=["k"], x="x")
            .to_pandas().sort_values("k").reset_index(drop=True))


def test_moments_match_numpy():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], size=n)),
        "x": pa.array(rng.integers(0, 100, n), pa.int64()),
    })
    out = _run_moments(t)
    df = t.to_pandas()
    for _, row in out.iterrows():
        g = df[df.k == row.k].x.to_numpy().astype(float)
        m = g.mean()
        m2 = ((g - m) ** 2).mean()
        g1 = ((g - m) ** 3).mean() / m2 ** 1.5
        g2 = ((g - m) ** 4).mean() / m2 ** 2 - 3.0
        assert abs(row.skew_micro / 1e6 - g1) < 1e-4
        assert abs(row.kurt_micro / 1e6 - g2) < 1e-4


def test_moments_block_layout_invariant():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(11)
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], size=999)),
        "x": pa.array(rng.integers(0, 50, 999), pa.int64()),
    })
    base = _run_moments(t, blocks=1)
    for blocks in (3, 17):
        other = _run_moments(t, blocks=blocks)
        assert base.equals(other)


def test_moments_zero_variance_is_null():
    import pyarrow as pa

    t = pa.table({"k": ["a"] * 5 + ["b"] * 3,
                  "x": [7] * 5 + [1, 2, 3]})
    out = _run_moments(t, blocks=2)
    a = out[out.k == "a"].iloc[0]
    assert a.skew_micro is None or a.isna().skew_micro
    b = out[out.k == "b"].iloc[0]
    assert b.skew_micro == 0  # symmetric 1,2,3


def test_moments_fuzz_vs_duckdb_hugeint_replay():
    """Seeded random groups through the exact SQL expression the
    oracle uses — guards the 2-3-IEEE-op determinism claim."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    rng = np.random.default_rng(99)
    for trial in range(4):
        n = int(rng.integers(50, 2000))
        t = pa.table({
            "k": pa.array(rng.choice(list("abcde"), size=n)),
            "x": pa.array(rng.integers(-300, 300, n), pa.int64()),
        })
        got = _run_moments(t, blocks=int(rng.integers(1, 8)))
        con = duckdb.connect()
        con.register("tt", t.to_pandas())
        want = con.sql("""
WITH s AS (
  SELECT k, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s1,
         CAST(sum(x*x) AS HUGEINT) AS s2,
         CAST(sum(x*x*x) AS HUGEINT) AS s3,
         CAST(sum(x*x*x*x) AS HUGEINT) AS s4
  FROM tt GROUP BY k),
m AS (SELECT *, n*s2 - s1*s1 AS b,
        n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS a,
        n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1
          - 3*(n*s2-s1*s1)*(n*s2-s1*s1) AS d
      FROM s)
SELECT k,
  CAST(round(1e6 * (CAST(a AS DOUBLE) /
       (CAST(b AS DOUBLE) * sqrt(CAST(b AS DOUBLE))))) AS BIGINT)
    AS skew_micro,
  CAST(round(1e6 * (CAST(d AS DOUBLE) /
       (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)))) AS BIGINT)
    AS kurt_micro
FROM m ORDER BY k
""").df()
        con.close()
        got = got.sort_values("k").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got.skew_micro.astype("int64"),
            want.skew_micro.astype("int64"), check_names=False)
        pd.testing.assert_series_equal(
            got.kurt_micro.astype("int64"),
            want.kurt_micro.astype("int64"), check_names=False)
