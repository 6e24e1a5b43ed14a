"""Gopher repetition filters (ml/repetition.py)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.repetition import repetition_filter, repetition_stats


def _stats(rows, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))
    return (repetition_stats(ds, **kw).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_clean_doc_keeps():
    out = _stats(["a b c d e f g h i j k l m n o p"])
    r = out.iloc[0]
    assert r.n_tokens == 16
    assert r.top2_cnt == 1          # every 2-gram unique
    assert r.dup5_chars == 0
    assert bool(r.rep_keep)


def test_top2_repetition_drops():
    # "x y" occurs 8 times in 16 tokens -> covers way over 20% chars
    out = _stats([" ".join(["x y"] * 8)])
    r = out.iloc[0]
    assert r.top2_cnt >= 8
    assert r.top2_chars == 3        # "x y" (separator counted)
    assert not bool(r.rep_keep)


def test_dup5_repetition():
    # a 6-token phrase repeated 4 times -> every 5-gram inside it dups
    phrase = "one two three four five six"
    out = _stats([" ".join([phrase] * 4) + " tailword unique here now"])
    r = out.iloc[0]
    assert r.dup5_chars > 0
    assert not bool(r.rep_keep)


def test_tiebreak_longest_then_lexicographic():
    # two 2-grams with count 2: "aa bb" (len 5) and "c d" (len 3):
    # longer gram wins the tie
    out = _stats(["aa bb c d aa bb c d zz"])
    r = out.iloc[0]
    assert r.top2_cnt == 2
    assert r.top2_chars == 5


def test_short_and_empty_docs():
    out = _stats(["solo", "", "two words"])
    assert list(out.top2_cnt) == [0, 0, 1]
    assert list(out.dup5_chars) == [0, 0, 0]
    # a 2-token doc's single 2-gram covers 100% of its chars — the raw
    # Gopher threshold drops it (real pipelines also min-length gate)
    assert list(out.rep_keep) == [True, True, False]
    # split("") yields one empty token on both engines
    assert list(out.n_tokens) == [1, 1, 2]


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_layout_invariance(blocks):
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "x"]
    rows = [" ".join(rng.choice(words, size=rng.integers(1, 40)))
            for _ in range(50)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string()),
    })).repartition(blocks)
    out = (repetition_stats(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    base = _stats(rows)
    assert out.equals(base)


def test_filter_returns_survivor_ids():
    rows = ["a b c d e f g h", " ".join(["x y"] * 8)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))
    kept = repetition_filter(ds).to_pandas()
    assert list(kept.doc_id) == [10]
