"""reduce flush knobs — starts_when / ends_when / max_events
(reference: src/transforms/reduce/config.rs:31-121)."""

import pyarrow as pa
import ray.data as rd

from vector_ray.stages.reduce import reduce_stage


def _ds():
    # one group "u", messages in order
    return rd.from_arrow(pa.table({
        "user": ["u"] * 6,
        "i": pa.array(range(6), pa.int64()),
        "msg": ["start a", "x", "start b", "y", "z", "end"],
        "n": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    }))


def test_starts_when_opens_new_reduction():
    out = reduce_stage(
        _ds(), group_by=["user"],
        merge_strategies={"msg": "concat", "n": "sum"},
        order_by=["i"], timestamp_fields=(),
        starts_when='starts_with(.msg, "start")',
    ).to_pandas().sort_values("i").reset_index(drop=True)
    assert out["msg"].tolist() == ["start a x", "start b y z end"]
    assert out["n"].tolist() == [3, 18]
    assert out["events"].tolist() == [2, 4]


def test_ends_when_closes_after_match():
    ds = rd.from_arrow(pa.table({
        "user": ["u"] * 5,
        "i": pa.array(range(5), pa.int64()),
        "msg": ["a", "END", "b", "c", "END"],
    }))
    out = reduce_stage(
        ds, group_by=["user"], merge_strategies={"msg": "concat"},
        order_by=["i"], timestamp_fields=(),
        ends_when='.msg == "END"',
    ).to_pandas().sort_values("i").reset_index(drop=True)
    assert out["msg"].tolist() == ["a END", "b c END"]


def test_max_events_chunks():
    out = reduce_stage(
        _ds(), group_by=["user"],
        merge_strategies={"msg": "concat", "n": "sum"},
        order_by=["i"], timestamp_fields=(), max_events=4,
    ).to_pandas().sort_values("i").reset_index(drop=True)
    assert out["msg"].tolist() == ["start a x start b y", "z end"]
    assert out["n"].tolist() == [10, 11]


def test_starts_when_plus_max_events():
    out = reduce_stage(
        _ds(), group_by=["user"],
        merge_strategies={"msg": "concat"},
        order_by=["i"], timestamp_fields=(),
        starts_when='starts_with(.msg, "start")', max_events=2,
    ).to_pandas().sort_values("i").reset_index(drop=True)
    # sessions [start a, x] and [start b, y, z, end]; the second chunks at 2
    assert out["msg"].tolist() == ["start a x", "start b y", "z end"]


def test_flush_markers_not_in_output():
    out = reduce_stage(
        _ds(), group_by=["user"], merge_strategies={"n": "sum"},
        order_by=["i"], timestamp_fields=(), max_events=3,
    ).to_pandas()
    assert not any(c.startswith("__reduce") for c in out.columns)
