"""Unit tests for sample/dedupe/reduce/aggregate/throttle/cardinality/
log_to_metric/hash_replace — mirroring the reference's Rust unit cases
(FIXTURES.md §F5 edge cases)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.aggregate import aggregate_stage
from vector_ray.stages.cardinality import tag_cardinality_limit
from vector_ray.stages.dedupe import dedupe_exact, fingerprint
from vector_ray.stages.hash_replace import hash_replace
from vector_ray.stages.log_metric import MetricSpec, log_to_metric, metric_to_log
from vector_ray.stages.reduce import reduce_stage
from vector_ray.stages.sample import sample_modulo, sample_hash
from vector_ray.stages.throttle import throttle_stage


def ts_us(*vals):
    return pa.array(list(vals), pa.timestamp("us"))


# ---------------- sample ----------------

def test_sample_modulo_every_rate_th():
    t = pa.table({
        "conv_id": ["a"] * 10,
        "turn_idx": pa.array(range(10), pa.int32()),
    })
    out = sample_modulo(rd.from_arrow(t), rate=3, group_by=None,
                        order_by=["conv_id", "turn_idx"]).to_pandas()
    assert sorted(out["turn_idx"]) == [0, 3, 6, 9]
    assert (out["sample_rate"] == 3).all()


def test_sample_modulo_per_group():
    t = pa.table({
        "conv_id": ["a"] * 4 + ["b"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3] * 2, pa.int32()),
    })
    out = sample_modulo(rd.from_arrow(t), rate=2, group_by=["conv_id"]).to_pandas()
    assert sorted(map(tuple, out[["conv_id", "turn_idx"]].values.tolist())) == [
        ("a", 0), ("a", 2), ("b", 0), ("b", 2)]


def test_sample_exclude_bypasses_counter():
    t = pa.table({
        "conv_id": ["a"] * 6,
        "turn_idx": pa.array(range(6), pa.int32()),
        "role": ["user", "system", "user", "user", "system", "user"],
    })
    out = sample_modulo(
        rd.from_arrow(t), rate=2, group_by=None,
        order_by=["conv_id", "turn_idx"], exclude='.role == "system"',
    ).to_pandas()
    # sampled stream is turns [0,2,3,5] -> keep 0th,2nd of those = 0,3
    # excluded (system) rows 1,4 always kept with rate 1
    assert sorted(out["turn_idx"]) == [0, 1, 3, 4]
    assert out.set_index("turn_idx")["sample_rate"].to_dict() == {0: 2, 1: 1, 3: 2, 4: 1}


def test_sample_hash_deterministic():
    t = pa.table({"k": [f"u{i}" for i in range(200)]})
    a = sample_hash(rd.from_arrow(t), rate=4, key_field="k").to_pandas()
    b = sample_hash(rd.from_arrow(t), rate=4, key_field="k").to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])
    assert 0 < len(a) < 200


# ---------------- dedupe ----------------

def test_dedupe_type_aware():
    # "1" (string) vs 1 (int) must NOT dedupe (dedupe/transform.rs:56-68)
    t1 = pa.table({"v": pa.array(["1"]), "conv_id": ["a"], "turn_idx": pa.array([0], pa.int32())})
    fp_str = fingerprint(t1, ["v"])[0].as_py()
    t2 = pa.table({"v": pa.array([1]), "conv_id": ["a"], "turn_idx": pa.array([0], pa.int32())})
    fp_int = fingerprint(t2, ["v"])[0].as_py()
    assert fp_str != fp_int


def test_dedupe_null_slot_distinct():
    t = pa.table({"v": pa.array(["", None])})
    fps = fingerprint(t, ["v"]).to_pylist()
    assert fps[0] != fps[1]  # empty string != missing


def test_dedupe_keep_first():
    t = pa.table({
        "conv_id": ["a", "a", "b", "b"],
        "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
        "k": ["x", "x", "x", "y"],
        "payload": ["p0", "p1", "p2", "p3"],
    })
    out = dedupe_exact(rd.from_arrow(t), ["k"]).to_pandas().sort_values("k")
    # fingerprint 'x' -> first by (conv_id, turn_idx) = ("a",0)
    assert out["payload"].tolist() == ["p0", "p3"]


# ---------------- reduce ----------------

def test_reduce_strategies():
    t = pa.table({
        "conv_id": ["c", "c", "c"],
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "n": [1, 2, 3],
        "s": ["a", "b", "a"],
        "keep": ["first", "mid", "last"],
        "ts": ts_us(100, 200, 300),
    })
    out = reduce_stage(
        rd.from_arrow(t),
        group_by=["conv_id"],
        merge_strategies={"n": "sum", "s": "concat", "keep": "retain"},
        order_by=["turn_idx"],
    ).to_pandas()
    row = out.iloc[0]
    assert row["n"] == 6
    assert row["s"] == "a b a"
    assert row["keep"] == "last"
    assert row["events"] == 3
    # timestamp window merger: first kept + _end last (merge_strategy.rs:436-460)
    assert row["ts"] == pd.Timestamp("1970-01-01 00:00:00.000100")
    assert row["ts_end"] == pd.Timestamp("1970-01-01 00:00:00.000300")


def test_reduce_more_strategies():
    t = pa.table({
        "g": ["g"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "arr": ["x", "y", "x", "z"],
        "lines": ["l1", "l2", "l1", "l3"],
    })
    out = reduce_stage(
        rd.from_arrow(t),
        group_by=["g"],
        merge_strategies={"arr": "flat_unique", "lines": "concat_newline"},
        order_by=["turn_idx"],
        timestamp_fields=(),
    ).to_pandas()
    row = out.iloc[0]
    assert list(row["arr"]) == ["x", "y", "z"]
    assert row["lines"] == "l1\nl2\nl1\nl3"


# ---------------- aggregate ----------------

def _metric_rows():
    return pa.table({
        "name": ["m"] * 6,
        "etype": ["a", "a", "a", "b", "b", "b"],
        "kind": ["incremental"] * 3 + ["absolute"] * 3,
        "value": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
        "ts": ts_us(1_000_000, 2_000_000, 12_000_000, 1_000_000, 2_000_000, 3_000_000),
    })


def test_aggregate_sum_windows():
    out = aggregate_stage(
        rd.from_arrow(_metric_rows()), series_keys=["etype"], value_col="value",
        interval_ms=10_000, mode="sum", kind_col="kind",
    ).to_pandas().sort_values("window_start")
    # only incremental rows; window 0 has 1+2, window 10s has 3
    assert out["value"].tolist() == [3.0, 3.0]


def test_aggregate_latest():
    out = aggregate_stage(
        rd.from_arrow(_metric_rows()), series_keys=["etype"], value_col="value",
        interval_ms=10_000, mode="latest", kind_col="kind",
    ).to_pandas()
    assert out["value"].tolist() == [30.0]  # absolute series 'b', last by ts


def test_aggregate_mean_stdev_count():
    rows = pa.table({
        "etype": ["a"] * 4, "kind": ["absolute"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0], "ts": ts_us(1, 2, 3, 4),
    })
    mean = aggregate_stage(rd.from_arrow(rows), series_keys=["etype"],
                           value_col="value", mode="mean", kind_col="kind").to_pandas()
    assert mean["value"].tolist() == [2.5]
    sd = aggregate_stage(rd.from_arrow(rows), series_keys=["etype"],
                         value_col="value", mode="stdev", kind_col="kind").to_pandas()
    assert sd["value"].iloc[0] == pytest.approx(np.std([1, 2, 3, 4]))
    cnt = aggregate_stage(rd.from_arrow(rows), series_keys=["etype"],
                          value_col="value", mode="count", kind_col="kind").to_pandas()
    assert cnt["value"].tolist() == [4]


def test_aggregate_summary_matches_individual_modes():
    """mode="summary" (sum+count+mean from one pass / one shuffle) must
    equal the per-mode results, across multiple blocks."""
    rng = np.random.default_rng(7)
    n = 400
    rows = pa.table({
        "etype": rng.choice(["a", "b", "c"], n).tolist(),
        "value": rng.integers(0, 100, n).astype(float).tolist(),
        "ts": ts_us(*rng.integers(0, 40, n).tolist()),
    })
    ds = rd.from_arrow(rows).repartition(8)
    summ = aggregate_stage(
        ds, series_keys=["etype"], value_col="value",
        interval_ms=10_000, mode="summary",
    ).to_pandas().sort_values(["etype", "window_start"]).reset_index(drop=True)
    for mode, col in (("sum", "sum"), ("count", "count"), ("mean", "mean")):
        one = aggregate_stage(
            rd.from_arrow(rows).repartition(8), series_keys=["etype"],
            value_col="value", interval_ms=10_000, mode=mode,
        ).to_pandas().sort_values(
            ["etype", "window_start"]).reset_index(drop=True)
        np.testing.assert_allclose(summ[col].to_numpy(dtype=float),
                                   one["value"].to_numpy(dtype=float))


def test_aggregate_diff():
    rows = pa.table({
        "etype": ["a"] * 3, "kind": ["absolute"] * 3,
        "value": [10.0, 25.0, 45.0],
        "ts": ts_us(1_000_000, 11_000_000, 21_000_000),
    })
    out = aggregate_stage(rd.from_arrow(rows), series_keys=["etype"],
                          value_col="value", interval_ms=10_000, mode="diff",
                          kind_col="kind").to_pandas().sort_values("window_start")
    assert out["value"].tolist() == [15.0, 20.0]


# ---------------- throttle ----------------

def test_throttle_head_per_window():
    t = pa.table({
        "k": ["a"] * 5 + ["b"] * 2,
        "id": list(range(7)),
        "ts": ts_us(0, 1, 2, 1_000_001, 1_000_002, 0, 1),
    })
    out = throttle_stage(rd.from_arrow(t), threshold=2, window_secs=1.0,
                         key_field="k", order_by=["id"]).to_pandas()
    # key a window0: ids 0,1 kept (2 dropped); window1: 3,4 kept; key b: both
    assert sorted(out["id"]) == [0, 1, 3, 4, 5, 6]


def test_throttle_exclude():
    t = pa.table({
        "k": ["a"] * 4, "id": [0, 1, 2, 3], "lvl": ["x", "x", "imp", "x"],
        "ts": ts_us(0, 1, 2, 3),
    })
    out = throttle_stage(rd.from_arrow(t), threshold=1, window_secs=10.0,
                         key_field="k", order_by=["id"],
                         exclude='.lvl == "imp"').to_pandas()
    assert sorted(out["id"]) == [0, 2]


# ---------------- tag_cardinality_limit ----------------

def test_cardinality_drop_tag():
    t = pa.table({
        "tag": ["a", "b", "c", "a", "d"],
        "ts": ts_us(0, 1, 2, 3, 4),
    })
    out = tag_cardinality_limit(rd.from_arrow(t), ["tag"], value_limit=2,
                                order_col="ts").to_pandas().sort_values("ts")
    # first-seen order: a,b allowed; c,d dropped to null
    assert out["tag"].where(pd.notna(out["tag"]), None).tolist() == ["a", "b", None, "a", None]


def test_cardinality_drop_event():
    t = pa.table({"tag": ["a", "b", "c", "a"], "ts": ts_us(0, 1, 2, 3)})
    out = tag_cardinality_limit(rd.from_arrow(t), ["tag"], value_limit=2,
                                order_col="ts", action="drop_event").to_pandas()
    assert sorted(out["tag"]) == ["a", "a", "b"]


# ---------------- log_to_metric / metric_to_log ----------------

def test_log_to_metric_counter_and_gauge():
    t = pa.table({
        "event_type": ["x", "y"],
        "value": [5.0, None],
        "ts": ts_us(0, 1),
    })
    out = log_to_metric(
        rd.from_arrow(t),
        [
            MetricSpec("counter", "events_total", tags={"etype": "event_type"}),
            MetricSpec("gauge", "val", field="value", tags={"etype": "event_type"}),
        ],
    ).to_pandas()
    counters = out[out["mtype"] == "counter"]
    gauges = out[out["mtype"] == "gauge"]
    assert len(counters) == 2 and (counters["value"] == 1.0).all()
    assert counters["kind"].unique().tolist() == ["incremental"]
    assert len(gauges) == 1 and gauges["value"].iloc[0] == 5.0  # null gauge dropped


def test_metric_to_log_roundtrip():
    t = pa.table({
        "etype": ["x"], "value": [1.0], "ts": ts_us(0),
    })
    m = log_to_metric(rd.from_arrow(t), [MetricSpec("counter", "c", tags={"etype": "etype"})])
    logs = metric_to_log(m).to_pandas()
    assert "metric_name" in logs.columns and "metric_value" in logs.columns


# ---------------- hash_replace ----------------

def test_hash_replace():
    import hashlib

    t = pa.table({"tool": ["bash", "bash", "web", None], "id": [0, 1, 2, 3]})
    out = hash_replace(rd.from_arrow(t), ["tool"]).to_pandas().sort_values("id")
    assert "tool" not in out.columns
    assert out["tool_hash"].iloc[0] == hashlib.md5(b"bash").hexdigest()
    assert out["tool_hash"].iloc[0] == out["tool_hash"].iloc[1]
    assert out["tool_hash"].iloc[2] != out["tool_hash"].iloc[0]
    assert out["tool_hash"].iloc[3] is None or pd.isna(out["tool_hash"].iloc[3])


def test_cardinality_probabilistic_matches_exact():
    from vector_ray.stages.cardinality import (
        tag_cardinality_limit,
        tag_cardinality_limit_probabilistic,
    )

    t = pa.table({
        "tag": [f"v{i % 20}" for i in range(200)],
        "ts": ts_us(*range(200)),
    })
    exact = tag_cardinality_limit(
        rd.from_arrow(t), ["tag"], value_limit=5, order_col="ts"
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    prob = tag_cardinality_limit_probabilistic(
        rd.from_arrow(t), ["tag"], value_limit=5, order_col="ts"
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    # at this size the Bloom has ~no false positives -> identical
    assert exact["tag"].where(pd.notna(exact["tag"]), None).tolist() == \
        prob["tag"].where(pd.notna(prob["tag"]), None).tolist()


def test_bloom_filter_one_sided():
    from vector_ray.stages.cardinality import BloomFilter

    bf = BloomFilter(size_bits=1 << 16)
    for v in ("a", "b", "c"):
        bf.add(v)
    assert all(v in bf for v in ("a", "b", "c"))  # no false negatives
    misses = sum(1 for i in range(1000) if f"zz{i}" in bf)
    assert misses < 5  # tiny false-positive rate at this load


def test_log_to_metric_histogram_observations():
    from vector_ray.stages.aggregate import aggregate_histogram
    from vector_ray.stages.log_metric import MetricSpec, log_to_metric

    t = pa.table({"latency": [0.5, 2.0, 80.0, None],
                  "ts": ts_us(0, 1, 2, 3)})
    m = log_to_metric(
        rd.from_arrow(t),
        [MetricSpec("histogram", "latency_hist", field="latency")],
    )
    rows = m.to_pandas()
    assert len(rows) == 3  # null observation dropped
    assert rows["kind"].unique().tolist() == ["incremental"]
    hist = aggregate_histogram(
        m, series_keys=["name"], value_col="value",
        buckets=[1.0, 10.0], interval_ms=10_000,
    ).to_pandas().iloc[0]
    assert [hist["b0"], hist["b1"], hist["b2"]] == [1, 1, 1]
    assert hist["sum"] == pytest.approx(82.5)
