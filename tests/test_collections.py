"""VRL collection functions + unnest + determinism-at-any-parallelism."""

import pyarrow as pa
import ray.data as rd

from vector_ray.functions import collections as c


def test_flatten_list():
    col = pa.array([[[1, 2], [3]], [[4]], [[]]])
    assert c.flatten_list(col).to_pylist() == [[1, 2, 3], [4], []]


def test_compact_list():
    col = pa.array([[1, None, 2], [None], [3]])
    assert c.compact_list(col).to_pylist() == [[1, 2], [], [3]]


def test_unique_list():
    col = pa.array([["a", "b", "a", "c"], [], None])
    assert c.unique_list(col).to_pylist() == [["a", "b", "c"], [], None]


def test_chunks_list():
    col = pa.array([[1, 2, 3, 4, 5]])
    assert c.chunks_list(col, 2).to_pylist() == [[[1, 2], [3, 4], [5]]]


def test_merge_json():
    a = pa.array(['{"x": 1, "n": {"a": 1}}'])
    b = pa.array(['{"y": 2, "n": {"b": 2}}'])
    assert c.merge_json(a, b).to_pylist() == ['{"n":{"b":2},"x":1,"y":2}']
    assert c.merge_json(a, b, deep=True).to_pylist() == \
        ['{"n":{"a":1,"b":2},"x":1,"y":2}']


def test_unnest():
    t = pa.table({"id": [1, 2, 3], "vals": [["a", "b"], [], ["c"]]})
    out = c.unnest(rd.from_arrow(t), "vals").to_pandas().sort_values(["id", "vals"])
    assert list(zip(out["id"], out["vals"])) == [(1, "a"), (1, "b"), (3, "c")]


def test_parse_deterministic_across_block_structures():
    """SURVEY §5(d): different parallelism/block splits must produce
    byte-identical sorted output."""
    from vector_ray.data.transcripts import ensure_transcripts
    from vector_ray.pipelines.flagship import transcript_parse_program
    from vector_ray.stages.remap import remap

    path = ensure_transcripts("/root/testdata/sf0.001")

    def run(nblocks):
        ds = rd.read_parquet(path, override_num_blocks=nblocks)
        out = remap(ds, transcript_parse_program).labeled
        return (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    a, b = run(2), run(7)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
