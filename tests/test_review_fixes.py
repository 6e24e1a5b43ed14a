"""Regression tests for the round-1 self-review findings."""

import glob
import os

import pyarrow as pa
import pytest
import ray.data as rd


def test_reroute_without_drop_keeps_all_rows():
    """drop_on_error=false means NOTHING is dropped: error rows forward
    unmodified and the dropped port is empty (remap.rs keep-original)."""
    from vector_ray.pipelines.flagship import transcript_parse_program
    from vector_ray.stages.remap import remap

    t = pa.table({
        "conv_id": ["c"] * 2, "turn_idx": pa.array([0, 1], pa.int32()),
        "text": pa.array(["level= tool latency_ms=oops {broken json x",
                          "free text"], pa.large_string()),
        "role": ["user", "user"], "tool": ["", ""],
        "ts": pa.array([0, 1], pa.timestamp("us")),
    })
    res = remap(rd.from_arrow(t), transcript_parse_program,
                drop_on_error=False, reroute_dropped=True)
    assert res.primary.count() == 2     # error row kept in primary
    assert res.dropped.count() == 0     # nothing dropped -> nothing rerouted


def test_dropped_annotations_string_typed_on_empty_blocks():
    from vector_ray.model import DROPPED_REASON
    from vector_ray.pipelines.flagship import transcript_parse_program
    from vector_ray.stages.remap import remap

    # 2 blocks, only one contains an error row: schema must unify
    t = pa.table({
        "conv_id": ["a", "b"], "turn_idx": pa.array([0, 0], pa.int32()),
        "text": pa.array(["free text", "level= tool latency_ms=x {broken y"],
                         pa.large_string()),
        "role": ["user", "user"], "tool": ["", ""],
        "ts": pa.array([0, 1], pa.timestamp("us")),
    })
    ds = rd.from_arrow(t).repartition(2)
    dropped = remap(ds, transcript_parse_program, drop_on_error=True,
                    reroute_dropped=True).dropped
    out = dropped.to_pandas()
    assert len(out) == 1 and out[DROPPED_REASON].iloc[0] == "error"


def test_vrl_guarded_fallible_error_scoped_to_guard():
    from vector_ray.vrl import compile_vrl

    t = pa.table({"kind": ["num", "text"], "x": ["12", "not-a-number"]})
    _, err, _ = compile_vrl('if (.kind == "num") { .v = to_int!(.x) }')(t)
    # the text row never ran the guarded statement -> no error
    assert err.to_pylist() == [False, False]
    t2 = pa.table({"kind": ["num", "num"], "x": ["12", "bad"]})
    _, err2, _ = compile_vrl('if (.kind == "num") { .v = to_int!(.x) }')(t2)
    assert err2.to_pylist() == [False, True]


def test_crash_resume_cleans_stale_files(tmp_path):
    from vector_ray.sinks.parquet import write_partitioned

    out = str(tmp_path / "sink")
    ds = rd.from_items([{"a": i} for i in range(10)])
    # simulate a crashed attempt: files exist but NO manifest entry
    os.makedirs(out, exist_ok=True)
    rd.from_items([{"a": 999}]).write_parquet(out)
    assert glob.glob(f"{out}/*.parquet")

    n = write_partitioned(ds, out, partition_id="all")
    assert n == 10
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 10                # stale file removed, no dup rows
    assert 999 not in back["a"].tolist()


def test_sample_hash_excluded_rows_rate_one():
    from vector_ray.stages.sample import sample_hash

    t = pa.table({"k": [f"u{i}" for i in range(50)],
                  "lvl": (["error"] + ["info"] * 9) * 5})
    out = sample_hash(rd.from_arrow(t), rate=50, key_field="k",
                      exclude='.lvl == "error"').to_pandas()
    excl = out[out["lvl"] == "error"]
    assert len(excl) == 5                       # all excluded rows kept
    assert (excl["sample_rate"] == 1).all()     # annotated unsampled
    assert (out[out["lvl"] != "error"]["sample_rate"] == 50).all()


def test_log_to_metric_set_null_field_dropped():
    from vector_ray.stages.log_metric import MetricSpec, log_to_metric

    t = pa.table({"user": ["u1", None], "ts": pa.array([0, 1], pa.timestamp("us"))})
    out = log_to_metric(
        rd.from_arrow(t), [MetricSpec("set", "users", field="user")]
    ).to_pandas()
    assert len(out) == 1  # null source field emits no metric row


def test_compact_list_trailing_empty():
    from vector_ray.functions.collections import compact_list

    col = pa.array([[1, None], []])
    assert compact_list(col).to_pylist() == [[1], []]


def test_reduce_sorted_literal_first_with_nulls():
    from vector_ray.stages.sorted_ops import reduce_sorted

    t = pa.table({"g": ["a", "a"], "i": [0, 1], "v": [None, "x"]})
    out = reduce_sorted(rd.from_arrow(t), group_by=["g"],
                        merge_strategies={}, order_by=["i"],
                        timestamp_fields=()).to_pandas()
    # literal first (null), NOT pandas' null-skipping "first" ('x')
    assert out["v"].iloc[0] is None or pa.compute.is_null(
        pa.array([out["v"].iloc[0]]))[0].as_py()
