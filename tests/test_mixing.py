"""Deterministic source mixing (ml/mixing.py)."""
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.mixing import mix_sources


def _ds(srcs, blocks=None):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(srcs)), pa.int64()),
        "source": pa.array(srcs, pa.string()),
    }))
    return ds.repartition(blocks) if blocks else ds


def test_binding_source_fully_consumed():
    # equal weights, unequal availability: the scarce source binds
    srcs = ["a"] * 10 + ["b"] * 100
    out = mix_sources(_ds(srcs), weights={"a": 1, "b": 1}).to_pandas()
    by = out.groupby("source").size()
    assert by.get("a", 0) == 10          # thr = denom -> all kept
    assert by.get("b", 0) < 100          # subsampled toward 10


def test_unweighted_sources_dropped():
    out = mix_sources(_ds(["a", "b", "c"] * 5),
                      weights={"a": 1}).to_pandas()
    assert set(out.source) == {"a"}
    assert len(out) == 5


def test_zero_row_weighted_source_empties_mix():
    out = mix_sources(_ds(["a"] * 5),
                      weights={"a": 1, "ghost": 1}).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_layout_invariant_membership(blocks):
    srcs = (["a"] * 40 + ["b"] * 25 + ["c"] * 60)
    base = (mix_sources(_ds(srcs), weights={"a": 2, "b": 1, "c": 3})
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    out = (mix_sources(_ds(srcs, blocks=blocks),
                       weights={"a": 2, "b": 1, "c": 3})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.equals(base)


def test_fast_hash_path_runs():
    srcs = ["a"] * 50 + ["b"] * 50
    out = mix_sources(_ds(srcs), weights={"a": 1, "b": 1},
                      hash="fast").to_pandas()
    assert set(out.source) == {"a", "b"}
    assert len(out) == 100               # equal parts, equal counts


def test_weighted_sample_monotone_and_deterministic():
    import numpy as np
    import pyarrow as pa

    from vector_ray.ml.mixing import weighted_sample

    rng = np.random.default_rng(4)
    n = 2000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "w": pa.array(rng.integers(0, 2_000_000, n), pa.int64()),
    })
    ds = rd.from_arrow(t)
    out = weighted_sample(ds, weight_col="w", rate=(1, 1)).to_pandas()
    df = t.to_pandas()
    # weight >= denom -> always kept
    always = df[df.w >= 1_000_000]
    assert set(always.doc_id).issubset(set(out.doc_id))
    # zero weight -> never kept
    assert not (set(df[df.w == 0].doc_id) & set(out.doc_id))
    # deterministic across layouts
    out2 = (weighted_sample(rd.from_arrow(t).repartition(7),
                            weight_col="w", rate=(1, 1))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out2.equals(out.sort_values("doc_id").reset_index(drop=True))
    # aggregate keep rate tracks mean(weight)/denom
    expected = (df.w.clip(upper=1_000_000) / 1_000_000).mean()
    assert abs(len(out) / n - expected) < 0.05


def test_uniform_k_sample_stable_across_layouts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.ml.mixing import uniform_k_sample

    t = pa.table({"doc_id": [f"d{i}" for i in range(500)],
                  "x": list(range(500))})
    outs = []
    for blocks in (1, 4, 9):
        out = uniform_k_sample(
            rd.from_arrow(t).repartition(blocks), k=25
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    assert len(outs[0]) == 25
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    assert "__sample_hash" not in outs[0].columns
