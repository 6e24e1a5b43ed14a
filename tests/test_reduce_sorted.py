"""reduce_sorted must match reduce_stage for mergeable strategies."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.01"


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_reduce_sorted_matches_map_groups():
    from vector_ray.stages.reduce import reduce_stage
    from vector_ray.stages.sorted_ops import reduce_sorted

    cols = ["user_id", "event_type", "value", "ts", "event_id"]
    a = reduce_stage(
        rd.read_parquet(f"{SF}/events.parquet", columns=cols),
        group_by=["user_id"],
        merge_strategies={"value": "sum", "event_type": "concat", "event_id": "min"},
        order_by=["ts", "event_id"],
    ).to_pandas()
    b = reduce_sorted(
        rd.read_parquet(f"{SF}/events.parquet", columns=cols),
        group_by=["user_id"],
        merge_strategies={"value": "sum", "event_type": "concat", "event_id": "min"},
        order_by=["ts", "event_id"],
    ).to_pandas()
    a, b = _norm(a), _norm(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert (a[c] - b[c]).abs().max() < 1e-6
        else:
            assert a[c].tolist() == b[c].tolist(), c


def test_reduce_sorted_spanning_runs():
    """A hot key spanning multiple blocks must chain-merge correctly."""
    from vector_ray.stages.sorted_ops import reduce_sorted

    n = 4000
    t = pa.table({
        "g": ["hot"] * n + ["a", "a", "b"],
        "i": pa.array(list(range(n)) + [0, 1, 0], pa.int64()),
        "v": pa.array([1] * n + [10, 20, 5], pa.int64()),
        "ts": pa.array(list(range(n)) + [0, 1, 0], pa.timestamp("us")),
    })
    out = (
        reduce_sorted(
            rd.from_arrow(t).repartition(9),
            group_by=["g"],
            merge_strategies={"v": "sum", "i": "max"},
            order_by=["i"],
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    got = out.set_index("g")
    assert got.loc["hot", "v"] == n
    assert got.loc["hot", "i"] == n - 1
    assert got.loc["hot", "events"] == n
    assert got.loc["a", "v"] == 30
    assert got.loc["b", "v"] == 5
    # timestamp window: first + _end last
    assert got.loc["hot", "ts"].value == 0
    assert got.loc["hot", "ts_end"] == pd.Timestamp(n - 1, unit="us")


def test_reduce_sorted_rejects_non_mergeable():
    from vector_ray.stages.sorted_ops import reduce_sorted

    with pytest.raises(ValueError, match="mergeable"):
        reduce_sorted(
            rd.from_items([{"g": 1, "x": [1]}]),
            group_by=["g"],
            merge_strategies={"x": "shortest_array"},
            order_by=["g"],
        )
