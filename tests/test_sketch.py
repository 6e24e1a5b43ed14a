"""DDSketch quantile sketch — accuracy + mergeability."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.sketch import DDSketch, aggregate_quantile_sketch

SF = "/root/testdata/sf0.001"


def test_sketch_relative_accuracy():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3, 1.5, size=50_000)
    sk = DDSketch(alpha=0.01)
    sk.add_array(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        got = sk.quantile(q)
        assert abs(got - exact) / exact < 0.02, (q, got, exact)


def test_sketch_merge_equals_single():
    rng = np.random.default_rng(8)
    a, b = rng.exponential(10, 10_000), rng.exponential(10, 10_000)
    s1 = DDSketch(0.01); s1.add_array(a)
    s2 = DDSketch(0.01); s2.add_array(b)
    merged = s1.merge(s2)
    whole = DDSketch(0.01); whole.add_array(np.concatenate([a, b]))
    assert merged.count == whole.count == 20_000
    for q in (0.5, 0.95):
        assert merged.quantile(q) == pytest.approx(whole.quantile(q))


def test_sketch_zero_and_empty():
    sk = DDSketch(0.01)
    assert np.isnan(sk.quantile(0.5))
    sk.add_array(np.array([0.0, 0.0, 5.0]))
    assert sk.quantile(0.0) == 0.0
    assert sk.count == 3


def test_aggregate_quantile_sketch_vs_exact():
    import duckdb

    out = (
        aggregate_quantile_sketch(
            rd.read_parquet(f"{SF}/events.parquet"),
            series_keys=["event_type"], value_col="value",
            quantiles=(0.5, 0.9), alpha=0.005,
        )
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    exact = duckdb.sql(f"""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               count(*) AS n
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1""").df()
    assert out["count"].tolist() == exact["n"].tolist()
    for col in ("p50", "p90"):
        rel = (out[col] - exact[col]).abs() / exact[col]
        assert (rel < 0.05).all(), rel.tolist()
