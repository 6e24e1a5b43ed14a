"""Distributed BPE (ml/bpe.py): pair counts vs a naive reference,
train determinism across block layouts, documented one-pass merge
semantics."""
from collections import Counter

import pyarrow as pa
import ray.data as rd

from vector_ray.ml.bpe import (apply_merges, pair_counts, to_symbols,
                               token_count, top_pairs, train_bpe)

DOCS = ["the theme", "then the cat sat", "banana bandana", "aaaa",
        "", "to be or not to be", "the thin thing", "\nx y\n"]


def _ds(blocks=3):
    return rd.from_arrow(pa.table(
        {"doc_id": list(range(len(DOCS))), "text": DOCS}
    )).repartition(blocks)


def _naive_pairs(docs):
    c = Counter()
    for d in docs:
        syms = list(d.replace(" ", "▁"))
        for a, b in zip(syms, syms[1:]):
            c[f"{a} {b}"] += 1
    return c


def test_pair_counts_match_naive(ray_session):
    got = pair_counts(to_symbols(_ds())).to_pandas()
    want = _naive_pairs(DOCS)
    assert dict(zip(got.pair, got.n)) == dict(want)


def test_top_pairs_total_order(ray_session):
    top = top_pairs(to_symbols(_ds()), k=4).to_pandas()
    want = sorted(_naive_pairs(DOCS).items(),
                  key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(top.pair, top.n)) == want


def test_train_deterministic_across_layouts(ray_session):
    m1 = train_bpe(_ds(blocks=1), num_merges=6)
    m5 = train_bpe(_ds(blocks=5), num_merges=6)
    assert m1 == m5
    assert [m["rank"] for m in m1] == list(range(len(m1)))
    assert all(m["count"] >= 2 for m in m1)


def test_apply_one_pass_semantics(ray_session):
    # documented divergence from fixpoint BPE: one left-to-right pass
    ds = rd.from_arrow(pa.table({"text": ["aaaa"]}))
    out = apply_merges(to_symbols(ds), ["a a"]).to_pandas()
    assert out.seq.iloc[0] == "aa a a"
    # a second application of the SAME rule converges further
    out2 = apply_merges(apply_merges(to_symbols(ds), ["a a"]),
                        ["a a"]).to_pandas()
    assert out2.seq.iloc[0] == "aa aa"


def test_apply_edge_merges_and_token_count(ray_session):
    ds = rd.from_arrow(pa.table({"text": ["the", "", "t"]}))
    out = token_count(apply_merges(
        to_symbols(ds), ["t h", "th e"])).to_pandas()
    assert out.seq.tolist() == ["the", "", "t"]
    assert out.n_tokens.tolist() == [1, 0, 1]


def test_learned_merges_compress(ray_session):
    merges = train_bpe(_ds(), num_merges=8)
    pairs = [m["pair"] for m in merges]
    before = token_count(to_symbols(_ds())).to_pandas()
    after = token_count(apply_merges(to_symbols(_ds()),
                                     pairs)).to_pandas()
    assert after.n_tokens.sum() < before.n_tokens.sum()
    assert (after.n_tokens <= before.n_tokens).all()
