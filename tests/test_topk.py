"""Global top-k (stages/topk.py)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.topk import global_topk


@pytest.mark.parametrize("blocks", [1, 3, 17])
def test_matches_full_sort(ray_session, blocks):
    rng = np.random.default_rng(5)
    t = pa.table({
        "id": pa.array(range(2000), pa.int64()),
        "v": pa.array(rng.integers(0, 500, 2000), pa.int64()),
    })
    out = (global_topk(rd.from_arrow(t).repartition(blocks), k=25,
                       keys=["v", "id"], descending=[True, False])
           .to_pandas())
    want = (t.to_pandas().sort_values(["v", "id"],
                                      ascending=[False, True])
            .head(25).reset_index(drop=True))
    got = (out.sort_values(["v", "id"], ascending=[False, True])
           .reset_index(drop=True))
    assert got.equals(want)


def test_k_larger_than_data(ray_session):
    t = pa.table({"id": pa.array([3, 1, 2], pa.int64())})
    out = global_topk(rd.from_arrow(t), k=10, keys=["id"]).to_pandas()
    assert sorted(out.id) == [1, 2, 3]
