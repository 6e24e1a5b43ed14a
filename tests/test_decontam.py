"""ml/decontam.py: benchmark n-gram overlap removal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.ml.decontam import benchmark_gram_set, decontaminate


@pytest.fixture
def corpus():
    return pd.DataFrame({
        "doc_id": range(8),
        "text": [
            "the quick brown fox jumps",        # 0: bench
            "a quick brown dog sits",           # 1: no shared 3-gram
            "see the quick brown fox run",      # 2: shares "the quick brown"
            "totally unrelated words here",     # 3: clean
            "short one",                        # 4: 2-gram doc, bench short
            "short one",                        # 5: identical to 4
            "",                                 # 6: empty — never dirty
            "quick brown fox",                  # 7: shares bench 3-gram
        ],
    })


def _run(corpus, bench_ids, n=3, **kw):
    ds = rd.from_pandas(corpus).repartition(3)
    bench = rd.from_pandas(
        corpus[corpus["doc_id"].isin(bench_ids)][["text"]])
    return decontaminate(ds, bench, n=n, **kw).to_pandas()


def test_filter_semantics(ray_session, corpus):
    out = _run(corpus, bench_ids=[0, 4])
    # dirty: 0 (is bench), 2 & 7 (share "quick brown fox"/"the quick
    # brown"), 4 & 5 (whole-sequence short-doc gram "short one")
    assert sorted(out["doc_id"]) == [1, 3, 6]


def test_annotate_counts(ray_session, corpus):
    out = _run(corpus, bench_ids=[0], annotate=True).set_index("doc_id")
    assert bool(out.loc[0, "contaminated"])          # self-overlap
    assert not bool(out.loc[6, "contaminated"])      # empty doc clean
    assert out.loc[2, "ngram_hits"] == 2             # the/quick/brown, quick/brown/fox
    assert out.loc[7, "ngram_hits"] == 1
    assert len(out) == len(corpus)                   # annotate keeps rows


def test_prebuilt_gram_set_reuse(ray_session, corpus):
    bench = rd.from_pandas(corpus[corpus["doc_id"] == 0][["text"]])
    ref = benchmark_gram_set(bench, n=3)
    ds = rd.from_pandas(corpus).repartition(2)
    a = decontaminate(ds, ref, n=3).to_pandas()
    b = decontaminate(ds, ref, n=3).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 7 not in set(a["doc_id"])


def test_empty_benchmark_keeps_everything(ray_session, corpus):
    out = _run(corpus, bench_ids=[])
    assert sorted(out["doc_id"]) == list(range(8))
