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
