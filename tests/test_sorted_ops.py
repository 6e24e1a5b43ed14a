"""Sorted-run scale paths must match the map_groups implementations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.01"


def _norm(df, cols=None):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_rank_basic():
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    t = pa.table({"k": ["a", "a", "b", "a", "b"], "o": [2, 1, 1, 3, 2]})
    out = add_group_rank(rd.from_arrow(t), ["k"], ["o"]).to_pandas()
    out = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert out[RANK_COL].tolist() == [0, 1, 2, 0, 1]


def test_rank_with_mask():
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    t = pa.table({"k": ["a"] * 5, "o": [0, 1, 2, 3, 4],
                  "m": [True, False, True, True, False]})
    out = add_group_rank(rd.from_arrow(t), ["k"], ["o"],
                         count_mask_col="m").to_pandas().sort_values("o")
    assert out[RANK_COL].tolist() == [0, -1, 1, 2, -1]


def test_rank_across_blocks():
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    # one hot key spanning many blocks
    n = 5000
    t = pa.table({"k": ["hot"] * n + ["cold"] * 10,
                  "o": list(range(n)) + list(range(10))})
    ds = rd.from_arrow(t).repartition(13)
    out = add_group_rank(ds, ["k"], ["o"]).to_pandas()
    hot = out[out["k"] == "hot"].sort_values("o")
    assert hot[RANK_COL].tolist() == list(range(n))


def test_throttle_sorted_matches_map_groups():
    from vector_ray.stages.sorted_ops import throttle_sorted
    from vector_ray.stages.throttle import throttle_stage

    ds1 = rd.read_parquet(f"{SF}/events.parquet")
    ds2 = rd.read_parquet(f"{SF}/events.parquet")
    a = throttle_stage(ds1, threshold=5, window_secs=3600.0,
                       key_field="event_type", order_by=["event_id"]).to_pandas()
    b = throttle_sorted(ds2, threshold=5, window_secs=3600.0,
                        key_field="event_type", order_by=["event_id"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_throttle_sorted_exclude():
    from vector_ray.stages.sorted_ops import throttle_sorted

    t = pa.table({"k": ["a"] * 4, "id": [0, 1, 2, 3], "lvl": ["x", "x", "imp", "x"],
                  "ts": pa.array([0, 1, 2, 3], pa.timestamp("us"))})
    out = throttle_sorted(rd.from_arrow(t), threshold=1, window_secs=10.0,
                          key_field="k", order_by=["id"],
                          exclude='.lvl == "imp"').to_pandas()
    assert sorted(out["id"]) == [0, 2]


def test_sample_sorted_matches_map_groups():
    from vector_ray.stages.sample import sample_modulo
    from vector_ray.stages.sorted_ops import sample_modulo_sorted
    from vector_ray.pipelines.flagship import read_transcripts

    a = sample_modulo(
        read_transcripts(SF, columns=["conv_id", "turn_idx", "role"]),
        rate=10, group_by=["role"], order_by=["conv_id", "turn_idx"],
    ).to_pandas()
    b = sample_modulo_sorted(
        read_transcripts(SF, columns=["conv_id", "turn_idx", "role"]),
        rate=10, group_by=["role"], order_by=["conv_id", "turn_idx"],
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(a), _norm(b))


def test_sample_sorted_exclude():
    from vector_ray.stages.sorted_ops import sample_modulo_sorted

    t = pa.table({
        "conv_id": ["a"] * 6,
        "turn_idx": pa.array(range(6), pa.int32()),
        "role": ["user", "system", "user", "user", "system", "user"],
    })
    out = sample_modulo_sorted(
        rd.from_arrow(t), rate=2, group_by=None,
        order_by=["conv_id", "turn_idx"], exclude='.role == "system"',
    ).to_pandas()
    assert sorted(out["turn_idx"]) == [0, 1, 3, 4]
    assert out.set_index("turn_idx")["sample_rate"].to_dict() == {0: 2, 1: 1, 3: 2, 4: 1}


def test_sessionize_sorted_matches_map_groups():
    from vector_ray.stages.windows import sessionize
    from vector_ray.stages.sorted_ops import sessionize_sorted

    ds1 = rd.read_parquet(f"{SF}/events.parquet")
    ds2 = rd.read_parquet(f"{SF}/events.parquet").repartition(11)
    a = sessionize(ds1, key="user_id", gap_secs=3600.0,
                   order_by=["event_id"]).to_pandas()
    b = sessionize_sorted(ds2, key="user_id", gap_secs=3600.0,
                          order_by=["event_id"]).to_pandas()
    a = a.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    b = b.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    assert a["session_id"].tolist() == b["session_id"].tolist()


def test_sessionize_sorted_cross_block_sessions():
    from vector_ray.stages.sorted_ops import sessionize_sorted

    # one key whose sessions straddle many small blocks
    n = 3000
    ts = []
    cur = 0
    for i in range(n):
        cur += 10_000_000_000 if i % 500 == 499 else 1_000_000  # gap every 500
        ts.append(cur)
    t = pa.table({"k": ["u"] * n, "i": list(range(n)),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    out = sessionize_sorted(rd.from_arrow(t).repartition(17), key="k",
                            gap_secs=3600.0, order_by=["i"]).to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    import numpy as np

    # row i opens a new session when ITS ts added the big gap (i%500==499)
    want = np.cumsum([1 if i % 500 == 499 else 0 for i in range(n)])
    assert out["session_id"].tolist() == want.tolist()


def test_sessionize_by_condition_sorted_matches_grouped():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.windows import sessionize_by_condition

    rng = np.random.default_rng(3)
    n = 20_000
    t = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 500, n)]),
        "i": pa.array(np.arange(n), pa.int64()),
        "msg": pa.array(np.where(rng.random(n) < 0.1, "START", "x")),
    })
    ds = rd.from_arrow(t)
    for mode in ("starts_when", "ends_when"):
        a = sessionize_by_condition(
            ds, key="k", condition='.msg == "START"', mode=mode,
            order_by=["i"], impl="sorted",
        ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
        b = sessionize_by_condition(
            ds, key="k", condition='.msg == "START"', mode=mode,
            order_by=["i"], impl="grouped",
        ).to_pandas().sort_values(["k", "i"]).reset_index(drop=True)
        b = b[a.columns]
        assert a["session_id"].tolist() == b["session_id"].tolist(), mode


def test_aggregate_diff_sorted_matches_grouped():
    """The segmented-shift diff tail (default) must equal the
    per-series map_groups fallback at multi-series, multi-block scale
    (run boundaries crossing block boundaries included)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.aggregate import aggregate_stage

    rng = np.random.default_rng(11)
    n = 4000
    series = [f"s{i % 97}" for i in range(n)]
    t = pa.table({
        "etype": series,
        "value": rng.normal(100, 20, n),
        "ts": pa.array((np.arange(n, dtype=np.int64) * 3_333_333),
                       pa.timestamp("us")),
    })
    ds = rd.from_arrow(t).repartition(12)
    kw = dict(series_keys=["etype"], value_col="value",
              interval_ms=10_000, mode="diff")
    srt = (aggregate_stage(ds, impl="sorted", **kw).to_pandas()
           .sort_values(["etype", "window_start"]).reset_index(drop=True))
    grp = (aggregate_stage(ds, impl="grouped", **kw).to_pandas()
           .sort_values(["etype", "window_start"]).reset_index(drop=True))
    assert list(srt.columns) == list(grp.columns)
    assert len(srt) == len(grp) and len(srt) > 0
    assert np.allclose(srt["value"], grp["value"], atol=1e-9)
    assert (srt["etype"] == grp["etype"]).all()


def test_concat_sorted_equals_reduce_sorted(ray_session):
    """The vectorized concat specialization matches the generic pandas
    collapse across layouts (runs straddling blocks included)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.sorted_ops import concat_sorted, reduce_sorted

    rng = np.random.default_rng(2)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.choice([f"g{i}" for i in range(150)], size=n)),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array([f"w{i % 37}" for i in range(n)], pa.string()),
        "m": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    for blocks in (1, 3, 17):
        a = (concat_sorted(
            rd.from_arrow(t).repartition(blocks), group_by=["k"],
            value_col="v", order_by=["o"], sep="|", sum_cols=["m"])
            .to_pandas().sort_values("k").reset_index(drop=True))
        b = (reduce_sorted(
            rd.from_arrow(t).repartition(blocks), group_by=["k"],
            merge_strategies={"v": "concat_raw", "m": "sum"},
            order_by=["o"], timestamp_fields=())
            .to_pandas().sort_values("k").reset_index(drop=True))
        assert len(a) == len(b)
        assert (a.v.str.replace("|", "", regex=False) == b.v).all()
        assert (a.m == b.m).all() and (a.events == b.events).all()
