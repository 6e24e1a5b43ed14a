"""Skew-safe partitioning + window operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def ts_us(*vals):
    return pa.array(list(vals), pa.timestamp("us"))


# ---------------- partitioning / skew ----------------

def _skewed_table():
    rows = []
    for c, ln in (("hot", 500), ("a", 5), ("b", 7)):
        for i in range(ln):
            rows.append({"conv_id": c, "turn_idx": i, "latency_ms": i % 10})
    t = pa.table({
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "latency_ms": pa.array([r["latency_ms"] for r in rows], pa.int64()),
    })
    return t


def test_detect_hot_keys():
    from vector_ray.state.partitioning import detect_hot_keys

    ds = rd.from_arrow(_skewed_table())
    assert detect_hot_keys(ds, "conv_id", hot_threshold=100) == ["hot"]


def test_salted_partition_spreads_hot_key():
    from vector_ray.state.partitioning import PARTITION_COL, add_salted_partition

    ds = rd.from_arrow(_skewed_table())
    out = add_salted_partition(
        ds, hot_keys=["hot"], num_partitions=16, salt_span=32
    ).to_pandas()
    hot_parts = out[out["conv_id"] == "hot"][PARTITION_COL].nunique()
    cold_parts = out[out["conv_id"] == "a"][PARTITION_COL].nunique()
    assert hot_parts >= 8      # 500 turns / span 32 -> ~16 salts
    assert cold_parts == 1     # unsalted keys stay co-located


def test_salted_partition_deterministic():
    from vector_ray.state.partitioning import PARTITION_COL, add_salted_partition

    a = add_salted_partition(rd.from_arrow(_skewed_table()), hot_keys=["hot"]).to_pandas()
    b = add_salted_partition(rd.from_arrow(_skewed_table()), hot_keys=["hot"]).to_pandas()
    assert (a[PARTITION_COL] == b[PARTITION_COL]).all()


def test_salted_reduce_matches_unsalted():
    from vector_ray.state.partitioning import reduce_by_conversation_salted

    ds = rd.from_arrow(_skewed_table())
    out = (
        reduce_by_conversation_salted(ds, hot_threshold=100, salt_span=64)
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    df = _skewed_table().to_pandas()
    want = (
        df.groupby("conv_id")
        .agg(turns=("turn_idx", "size"), value_sum=("latency_ms", "sum"),
             turn_min=("turn_idx", "min"), turn_max=("turn_idx", "max"))
        .reset_index().sort_values("conv_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"turns": "int64", "value_sum": "int64"}),
        want.astype({"turns": "int64", "value_sum": "int64"}),
        check_dtype=False,
    )


# ---------------- windows ----------------

def test_sessionize_gaps():
    from vector_ray.stages.windows import sessionize

    t = pa.table({
        "k": ["u"] * 5,
        "id": [0, 1, 2, 3, 4],
        "ts": ts_us(0, 10_000_000, 4_000_000_000, 4_005_000_000, 9_000_000_000),
    })
    out = sessionize(rd.from_arrow(t), key="k", gap_secs=3600.0,
                     order_by=["id"]).to_pandas().sort_values("id")
    assert out["session_id"].tolist() == [0, 0, 1, 1, 2]


def test_session_stats():
    from vector_ray.stages.windows import session_stats

    t = pa.table({
        "k": ["u"] * 4,
        "id": [0, 1, 2, 3],
        "ts": ts_us(0, 1_000_000, 9_000_000_000, 9_001_000_000),
    })
    out = session_stats(rd.from_arrow(t), key="k", gap_secs=3600.0,
                        order_by=["id"]).to_pandas().sort_values("session_id")
    assert out["events"].tolist() == [2, 2]


def test_sliding_window_count():
    from vector_ray.stages.windows import sliding_window_count

    # events at 0s, 30s, 90s; window 60s slide 30s
    t = pa.table({"k": ["x"] * 3, "ts": ts_us(0, 30_000_000, 90_000_000)})
    out = sliding_window_count(rd.from_arrow(t), key="k", window_secs=60,
                               slide_secs=30).to_pandas()
    got = dict(zip(out["window_start"], out["events"]))
    # windows: [-30,30):1 ... compute: ev0 in ws {0,-30}; ev30 in {30,0}; ev90 in {90,60}
    assert got == {-30_000_000: 1, 0: 2, 30_000_000: 1, 60_000_000: 1, 90_000_000: 1}


def test_sessionize_starts_when():
    from vector_ray.stages.windows import sessionize_by_condition
    import ray.data as rd

    t = pa.table({
        "k": ["c"] * 5,
        "i": [0, 1, 2, 3, 4],
        "evt": ["handoff", "x", "handoff", "x", "x"],
    })
    out = sessionize_by_condition(
        rd.from_arrow(t), key="k", condition='.evt == "handoff"',
        mode="starts_when", order_by=["i"],
    ).to_pandas().sort_values("i")
    assert out["session_id"].tolist() == [0, 0, 1, 1, 1]


def test_sessionize_ends_when():
    from vector_ray.stages.windows import sessionize_by_condition
    import ray.data as rd

    t = pa.table({
        "k": ["c"] * 5,
        "i": [0, 1, 2, 3, 4],
        "evt": ["x", "done", "x", "done", "x"],
    })
    out = sessionize_by_condition(
        rd.from_arrow(t), key="k", condition='.evt == "done"',
        mode="ends_when", order_by=["i"],
    ).to_pandas().sort_values("i")
    assert out["session_id"].tolist() == [0, 0, 1, 1, 2]
