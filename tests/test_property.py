"""Property-based tests (hypothesis) — the reference's proptest layer
analogue (SURVEY §5: proptest/arbitrary on vrl + buffers).

Each property pits a distributed implementation against a plain pandas
oracle on randomized inputs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

KEYS = st.sampled_from(["a", "b", "c", "hot"])


@st.composite
def keyed_frames(draw, max_rows=60):
    n = draw(st.integers(1, max_rows))
    keys = draw(st.lists(KEYS, min_size=n, max_size=n))
    return pd.DataFrame({
        "k": keys,
        "o": list(range(n)),
        "v": draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n)),
    })


@settings(max_examples=15, deadline=None)
@given(keyed_frames(), st.integers(1, 5))
def test_sorted_rank_matches_pandas_cumcount(df, nblocks):
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    ds = rd.from_pandas(df).repartition(min(nblocks, len(df)))
    out = add_group_rank(ds, ["k"], ["o"]).to_pandas().sort_values("o")
    want = df.sort_values("o").groupby("k").cumcount()
    assert out[RANK_COL].tolist() == want.tolist()


@settings(max_examples=15, deadline=None)
@given(keyed_frames(), st.integers(2, 4))
def test_sample_modulo_matches_oracle(df, rate):
    from vector_ray.stages.sample import sample_modulo

    out = sample_modulo(rd.from_pandas(df), rate=rate, group_by=["k"],
                        order_by=["o"]).to_pandas()
    want = df.sort_values("o")
    want = want[want.groupby("k").cumcount() % rate == 0]
    assert sorted(out["o"]) == sorted(want["o"])


@settings(max_examples=15, deadline=None)
@given(keyed_frames())
def test_dedupe_keep_first_matches_drop_duplicates(df):
    from vector_ray.stages.dedupe import dedupe_exact

    out = dedupe_exact(rd.from_pandas(df), ["k", "v"], order_by=["o"]).to_pandas()
    want = df.sort_values("o").drop_duplicates(subset=["k", "v"], keep="first")
    assert sorted(out["o"]) == sorted(want["o"])


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), min_size=1, max_size=50))
def test_fingerprint_equality_iff_value_equality(vals):
    """Two rows share a fingerprint iff their (type, value) match —
    the dedupe cache-entry contract (dedupe/transform.rs:49-68)."""
    from vector_ray.stages.dedupe import fingerprint

    t = pa.table({"v": pa.array(vals, pa.string())})
    fps = fingerprint(t, ["v"]).to_pylist()
    for i, a in enumerate(vals):
        for j, b in enumerate(vals):
            assert (fps[i] == fps[j]) == (a == b), (a, b)
