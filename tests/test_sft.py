"""ml/sft.py: conversation → SFT pair explosion."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.ml.sft import conversation_pairs


def _conv_df():
    rows = []
    for c in range(12):
        for t in range(1 + c % 5):
            role = "user" if t % 2 == 0 else "assistant"
            rows.append((f"c{c:02d}", t, role, f"t{c}_{t}"))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                       "role", "text"])


def _expected(df):
    out = []
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id"):
        prior = []
        for _, r in g.iterrows():
            if r["role"] == "assistant" and prior:
                out.append((conv, r["turn_idx"], "\n".join(prior),
                            r["text"]))
            prior.append(r["text"])
    return sorted(out)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_pairs_match_reference(ray_session, nblocks):
    df = _conv_df()
    got = conversation_pairs(
        rd.from_pandas(df.sample(frac=1, random_state=3))
        .repartition(nblocks)).to_pandas()
    assert sorted(map(tuple, got[["conv_id", "turn_idx", "context",
                                  "target"]].itertuples(index=False))
                  ) == _expected(df)


def test_opening_assistant_turn_emits_nothing(ray_session):
    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "turn_idx": [0, 1, 0],
        "role": ["assistant", "user", "assistant"],
        "text": ["hi", "yo", "orphan"],
    })
    got = conversation_pairs(rd.from_pandas(df)).to_pandas()
    assert len(got) == 0
