"""Span-level corpus dedup (ml/span_dedup.py)."""
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.span_dedup import span_dedup


def _ds(rows, ids=None, blocks=None):
    ids = list(range(len(rows))) if ids is None else ids
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))
    return ds.repartition(blocks) if blocks else ds


def _run(ds, **kw):
    return (span_dedup(ds, **kw).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_unique_docs_pass_through():
    rows = ["a b c d", "e f g h", "i j k"]
    out = _run(_ds(rows), window=2)
    assert list(out.doc_id) == [0, 1, 2]
    assert list(out.text) == rows
    assert list(out.spans_kept) == [2, 2, 2]
    assert list(out.n_tokens) == [4, 4, 3]


def test_duplicate_span_dropped_first_survives():
    # doc 1 repeats doc 0's first span; its own tail span survives
    out = _run(_ds(["a b c d", "a b z z"]), window=2)
    assert list(out.text) == ["a b c d", "z z"]
    assert list(out.spans_kept) == [2, 1]


def test_fully_duplicate_doc_vanishes():
    out = _run(_ds(["a b c d", "a b c d"]), window=2)
    assert list(out.doc_id) == [0]
    assert list(out.text) == ["a b c d"]


def test_within_doc_repeat_dedups():
    # the same span repeated inside ONE doc also dedups (chunk_idx
    # order breaks the tie)
    out = _run(_ds(["x y x y x y"]), window=2)
    assert list(out.text) == ["x y"]
    assert list(out.spans_kept) == [1]


def test_short_trailing_span_distinct_from_full():
    # "a b" (full window) vs trailing "a" — different spans, both kept
    out = _run(_ds(["a b a"]), window=2)
    assert list(out.text) == ["a b a"]


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_layout_invariance(blocks):
    rows = ["w%d x%d y z common tail span here" % (i % 5, i % 3)
            for i in range(40)]
    base = _run(_ds(rows), window=4)
    out = _run(_ds(rows, blocks=blocks), window=4)
    assert out.equals(base)
