"""Snapshot diff (stages/diff_snapshots.py): status derivation,
null-safe change compare, keep='changes'."""
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.diff_snapshots import snapshot_diff


def _run(old_rows, new_rows, keep="all", blocks=3):
    o = rd.from_arrow(pa.Table.from_pylist(old_rows)).repartition(blocks)
    n = rd.from_arrow(pa.Table.from_pylist(new_rows)).repartition(blocks)
    got = snapshot_diff(o, n, key=["k"], compare=["v", "w"],
                        keep=keep).to_pandas()
    if got.empty:
        return got
    return got.sort_values("k").reset_index(drop=True)


OLD = [
    {"k": 1, "v": 10, "w": "a"},
    {"k": 2, "v": 20, "w": "b"},
    {"k": 3, "v": 30, "w": None},
    {"k": 4, "v": None, "w": "d"},
]
NEW = [
    {"k": 2, "v": 20, "w": "b"},          # same
    {"k": 3, "v": 30, "w": "CHANGED"},    # null -> value = changed
    {"k": 4, "v": None, "w": "d"},        # null == null = same
    {"k": 5, "v": 50, "w": "e"},          # added
]


def test_statuses(ray_session):
    got = _run(OLD, NEW)
    by_k = dict(zip(got.k, got.status))
    assert by_k == {1: "removed", 2: "same", 3: "changed",
                    4: "same", 5: "added"}
    row5 = got[got.k == 5].iloc[0]
    assert pd.isna(row5.v) and row5.v_new == 50
    row1 = got[got.k == 1].iloc[0]
    assert row1.v == 10 and pd.isna(row1.v_new)


def test_keep_changes_drops_same(ray_session):
    got = _run(OLD, NEW, keep="changes")
    assert set(got.status) == {"added", "removed", "changed"}
    assert set(got.k) == {1, 3, 5}


def test_identical_snapshots_all_same(ray_session):
    got = _run(OLD, OLD)
    assert (got.status == "same").all()
    assert len(_run(OLD, OLD, keep="changes")) == 0
