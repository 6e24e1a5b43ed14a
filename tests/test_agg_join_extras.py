"""Set/histogram aggregate modes + Dataset.join enrichment."""

import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def ts_us(*vals):
    return pa.array(list(vals), pa.timestamp("us"))


def test_aggregate_distinct_set():
    from vector_ray.stages.aggregate import aggregate_distinct

    t = pa.table({
        "etype": ["a"] * 4 + ["b"] * 2,
        "user": [1, 2, 1, 3, 9, 9],
        "ts": ts_us(0, 1, 2, 3, 0, 1),
    })
    out = aggregate_distinct(
        rd.from_arrow(t), series_keys=["etype"], value_col="user",
        interval_ms=10_000,
    ).to_pandas().sort_values("etype")
    assert out["value"].tolist() == [3, 1]


def test_aggregate_distinct_matches_duckdb():
    import duckdb

    from vector_ray.stages.aggregate import aggregate_distinct

    ds = rd.read_parquet(f"{SF}/events.parquet")
    out = (
        aggregate_distinct(ds, series_keys=["event_type"], value_col="user_id",
                           interval_ms=86_400_000)
        .to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    )
    want = duckdb.sql(f"""
        SELECT event_type,
               (epoch_us(ts) // 86400000000) * 86400000000 AS window_start,
               count(DISTINCT user_id)::BIGINT AS value
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
        ORDER BY 1, 2""").df()
    assert out["value"].tolist() == want["value"].tolist()


def test_aggregate_histogram():
    from vector_ray.stages.aggregate import aggregate_histogram

    t = pa.table({
        "etype": ["a"] * 5,
        "v": [0.5, 1.5, 2.5, 10.0, 100.0],
        "ts": ts_us(0, 1, 2, 3, 4),
    })
    out = aggregate_histogram(
        rd.from_arrow(t), series_keys=["etype"], value_col="v",
        buckets=[1.0, 5.0, 50.0], interval_ms=10_000,
    ).to_pandas()
    row = out.iloc[0]
    # buckets: <=1: {0.5,1.0?} 0.5,1.5? le semantics: searchsorted left ->
    # b0: v<=1 -> 0.5; b1: 1<v<=5 -> 1.5,2.5; b2: 5<v<=50 -> 10; b3: >50 -> 100
    assert [row["b0"], row["b1"], row["b2"], row["b3"]] == [1, 2, 1, 1]
    assert row["count"] == 5
    assert row["sum"] == pytest.approx(114.5)


def test_enrich_join():
    from vector_ray.enrichment.join import enrich_join

    left = rd.from_items([
        {"k": "a", "x": 1}, {"k": "b", "x": 2}, {"k": "zz", "x": 3},
    ])
    right = rd.from_items([
        {"k": "a", "cat": "alpha", "junk": 0},
        {"k": "b", "cat": "beta", "junk": 0},
    ])
    out = (
        enrich_join(left, right, on=["k"], select=["cat"], num_partitions=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["cat"].tolist()[:2] == ["alpha", "beta"]
    assert out["cat"].isna().tolist() == [False, False, True]
    assert "junk" not in out.columns


def test_enrich_join_vs_duckdb():
    import duckdb

    from vector_ray.enrichment.join import enrich_join

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = rd.read_parquet(f"{SF}/customer.parquet")
    # join keys must share a name: rename custkey first
    cust2 = cust.rename_columns({"c_custkey": "o_custkey"})
    out = enrich_join(orders, cust2, on=["o_custkey"],
                      select=["c_mktsegment"], join_type="inner",
                      num_partitions=4).to_pandas()
    want = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey
    """).fetchone()[0]
    assert len(out) == want
