"""Empty-input hardening sweep: every continuation-session operator
must handle 0-row datasets (with schema) without crashing — Ray
passes empty blocks through un-UDF'd with stale schemas, the repo's
top historical bug source."""
import pyarrow as pa
import ray.data as rd


def _empty(schema: dict):
    return rd.from_arrow(pa.table(
        {k: pa.array([], t) for k, t in schema.items()}))


def test_set_op_empty_sides(ray_session):
    from vector_ray.stages.setops import set_op

    e = _empty({"k": pa.string()})
    full = rd.from_arrow(pa.table({"k": ["a", "b"]}))
    for left, right in ((e, full), (full, e), (e, e)):
        for op in ("intersect", "except"):
            out = set_op(left, right, columns=["k"], op=op,
                         all=True).to_pandas()
            if op == "except" and left is full and right is e:
                assert len(out) == 2
            elif left is e:
                assert len(out) == 0


def test_snapshot_diff_empty_sides(ray_session):
    from vector_ray.stages.diff_snapshots import snapshot_diff

    e = _empty({"k": pa.int64(), "v": pa.int64()})
    full = rd.from_arrow(pa.table({"k": [1], "v": [2]}))
    out = snapshot_diff(full, e, key=["k"], compare=["v"]).to_pandas()
    assert out.status.tolist() == ["removed"]
    out2 = snapshot_diff(e, full, key=["k"], compare=["v"]).to_pandas()
    assert out2.status.tolist() == ["added"]


def test_funnel_and_retention_empty(ray_session):
    from vector_ray.stages.funnel import cohort_retention, funnel

    e = _empty({"user_id": pa.int64(), "ts": pa.int64(),
                "event_type": pa.string()})
    out = funnel(e, entity_col="user_id", ts_col="ts",
                 step_col="event_type", steps=["a", "b"])
    assert out.num_rows == 0
    ret = cohort_retention(
        _empty({"user_id": pa.int64(), "ts": pa.int64()}),
        entity_col="user_id", ts_col="ts", bucket=10).to_pandas()
    assert len(ret) == 0


def test_moments_and_corr_empty(ray_session):
    from vector_ray.stages.stats import grouped_corr, grouped_moments

    e = _empty({"k": pa.string(), "x": pa.int64(), "y": pa.int64()})
    assert len(grouped_moments(e, keys=["k"], x="x").to_pandas()) == 0
    assert len(grouped_corr(e, keys=["k"], x="x",
                            y="y").to_pandas()) == 0


def test_bpe_and_sampling_empty(ray_session):
    from vector_ray.ml.bpe import apply_merges, pair_counts, to_symbols
    from vector_ray.ml.mixing import uniform_k_sample

    e = _empty({"doc_id": pa.string(), "text": pa.string()})
    seqs = to_symbols(e)
    assert len(pair_counts(seqs).to_pandas()) == 0
    assert len(apply_merges(seqs, ["a b"]).to_pandas()) == 0
    assert len(uniform_k_sample(e, k=5).to_pandas()) == 0


def test_pq_empty_codes(ray_session):
    import numpy as np

    from vector_ray.ml.pq import pq_encode, pq_search

    books = np.zeros((2, 4, 2))
    e = _empty({"vec_id": pa.int64(),
                "embedding": pa.list_(pa.float32())})
    codes = pq_encode(e, books)
    assert len(codes.to_pandas()) == 0
    top = pq_search(codes.materialize(), np.zeros(4), books, k=3)
    assert top.num_rows == 0
