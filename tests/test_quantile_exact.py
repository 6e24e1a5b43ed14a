"""Interpolated (percentile_cont) grouped quantiles (stages/quantile_exact.py interp=)."""
def test_interp_matches_numpy_percentile(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.quantile_exact import grouped_quantiles

    rng = np.random.default_rng(31)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], size=n)),
        "x": pa.array(rng.integers(0, 10_000, n), pa.int64()),
    })
    out = grouped_quantiles(
        rd.from_arrow(t).repartition(6), keys=["k"], value_col="x",
        interp={"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)})
    df = t.to_pandas()
    for _, row in out.iterrows():
        g = df[df.k == row.k].x.to_numpy()
        for name, q in (("p50", 50), ("p90", 90), ("p99", 99)):
            want = np.percentile(g, q, method="linear")
            assert abs(row[name] / 1e6 - want) < 2e-6, (row.k, name)


def test_interp_and_disc_together_single_row_groups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.quantile_exact import grouped_quantiles

    t = pa.table({"k": ["a", "a", "a", "b"], "x": [10, 20, 30, 7]})
    out = grouped_quantiles(
        rd.from_arrow(t).repartition(2), keys=["k"], value_col="x",
        qs={"p50_disc": (1, 2)}, interp={"p50_cont": (1, 2)})
    a = out[out.k == "a"].iloc[0]
    assert a.p50_disc == 20 and a.p50_cont == 20_000_000
    b = out[out.k == "b"].iloc[0]
    assert b.p50_disc == 7 and b.p50_cont == 7_000_000  # n=1 edge
