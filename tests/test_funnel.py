"""Funnel analysis (stages/funnel.py): strict-ordering semantics and
layout invariance."""
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.funnel import funnel

ROWS = [
    (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
    (2, 5, "click"), (2, 15, "view"), (2, 25, "click"),
    (3, 8, "view"),
    (4, 9, "purchase"),                 # never starts
    (5, 1, "view"), (5, 2, "purchase"),  # skips click
    (6, 7, "view"), (6, 7, "click"),     # equal ts NOT strictly after
]


def _tbl():
    return pa.table({"user_id": [r[0] for r in ROWS],
                     "ts": [r[1] for r in ROWS],
                     "event_type": [r[2] for r in ROWS]})


def _run(blocks):
    return funnel(rd.from_arrow(_tbl()).repartition(blocks),
                  entity_col="user_id", ts_col="ts",
                  step_col="event_type",
                  steps=["view", "click", "purchase"]).to_pandas()


def test_funnel_semantics(ray_session):
    out = _run(4).set_index("user_id")
    assert out.loc[1].stage == 3 and out.loc[1].t_2 == 30
    # pre-view click ignored, later click counts
    assert out.loc[2].stage == 2 and out.loc[2].t_1 == 25
    assert out.loc[3].stage == 1
    assert 4 not in out.index                 # never did step 0
    assert out.loc[5].stage == 1              # purchase without click
    assert out.loc[6].stage == 1              # ts must strictly grow


def test_funnel_layout_invariant(ray_session):
    a = _run(1)
    b = _run(7)
    assert a.equals(b)


def test_cohort_retention(ray_session):
    from vector_ray.stages.funnel import cohort_retention

    # bucket=10: user 1 cohort 0 active buckets {0,1,3}; user 2
    # cohort 1 active {1,1,2} (dup in-bucket counts once)
    t = pa.table({
        "user_id": [1, 1, 1, 2, 2, 2],
        "ts": [5, 15, 35, 12, 18, 25],
    })
    out = cohort_retention(
        rd.from_arrow(t).repartition(3), entity_col="user_id",
        ts_col="ts", bucket=10,
    ).to_pandas().sort_values(["cohort", "offset"]).reset_index(
        drop=True)
    got = {(r.cohort, r.offset): r.n_active for r in out.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}
