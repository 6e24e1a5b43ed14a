"""n-gram Jaccard set-similarity join (ml/ngram_join.py): prefix
filter exactness vs brute force, short-doc semantics, empty-block
schema stabilization."""

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",   # near-dup of 0
    "the quick brown fox jumps over the lazy dog",   # exact dup of 0
    "completely different content about ray data engines",
    "ray data engines process completely different content",
    "short doc",
    "short doc",                                     # dup of 5 (<3 tokens)
    "",                                              # token-less: never pairs
]


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": TEXTS,
    }))


def _brute(threshold):
    from vector_ray.ml.ngram_join import _distinct_doc_shingles

    def sset(s):
        _, h, _ = _distinct_doc_shingles([s], 3)
        return set(h.tolist())

    tbp = round(threshold * 10000)
    out = []
    for a, b in itertools.combinations(range(len(TEXTS)), 2):
        sa, sb = sset(TEXTS[a]), sset(TEXTS[b])
        i = len(sa & sb)
        u = len(sa) + len(sb) - i
        if u and i * 10000 >= tbp * u:
            out.append((a, b, (20000 * i + u) // (2 * u)))
    return out


def test_pairs_match_brute_force():
    from vector_ray.ml.ngram_join import ngram_jaccard_pairs

    got = ngram_jaccard_pairs(_ds(), threshold=0.5)
    assert [tuple(r) for r in got.itertuples(index=False)] == _brute(0.5)
    # exact dups carry 10000 bp; near-dup of 0/1 is strictly below
    bp = {(r.a, r.b): r.jaccard_bp for r in got.itertuples(index=False)}
    assert bp[(0, 2)] == 10000 and bp[(5, 6)] == 10000
    assert 5000 <= bp[(0, 1)] < 10000


def test_higher_threshold_is_subset():
    from vector_ray.ml.ngram_join import ngram_jaccard_pairs

    lo = ngram_jaccard_pairs(_ds(), threshold=0.5)
    hi = ngram_jaccard_pairs(_ds(), threshold=0.95)
    lo_set = {(r.a, r.b) for r in lo.itertuples(index=False)}
    hi_set = {(r.a, r.b) for r in hi.itertuples(index=False)}
    assert hi_set <= lo_set
    assert hi_set == {(0, 2), (5, 6)}  # only the exact copies survive
    assert [tuple(r) for r in hi.itertuples(index=False)] == _brute(0.95)


def test_prefix_rows_never_drop_true_pairs():
    # prefix-filter lemma spot check: every brute-force pair must share
    # at least one prefix token on BOTH sides
    from vector_ray.ml.ngram_join import (_prefix_rows,
                                          _sample_token_ranks)

    fh, fr = _sample_token_ranks(_ds(), text_col="text", n=3,
                                 freq_sample=100, freq_top=16)
    ids, toks = _prefix_rows(TEXTS, np.arange(len(TEXTS)), n=3,
                             threshold=0.5, freq_hashes=fh, freq_ranks=fr)
    prefix = {}
    for i, t in zip(ids, toks):
        prefix.setdefault(int(i), set()).add(int(t))
    for a, b, _bp in _brute(0.5):
        assert prefix[a] & prefix[b], (a, b)


def test_drop_empty_blocks_schema_stabilizes():
    from vector_ray.stages.blocks import drop_empty_blocks

    full = pa.table({"a": pa.array([1, 2], pa.int64()),
                     "b": pa.array([3, 4], pa.int64())})
    ds = rd.from_arrow([full.slice(0, 0), full, full.slice(0, 0)])
    # a map over empty blocks emits stale/zero-column schemas (Ray
    # skips the UDF); dropping empties restores joinability
    mapped = ds.map_batches(lambda t: t.select(["a", "b"]),
                            batch_format="pyarrow", batch_size=None)
    stable = drop_empty_blocks(mapped)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                   "x": ["p", "q"]}))
    j = stable.join(docs, "inner", 2, on=("a",), right_on=("doc_id",))
    assert j.count() == 2


def test_cross_dedup(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.ml.ngram_join import cross_dedup

    corpus = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "an entirely different document about trains",
                 "the quick brown fox jumps over the lazy cat",
                 "short"],
    }))
    ref = rd.from_arrow(pa.table({
        "doc_id": [0],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    out = cross_dedup(corpus, ref, threshold=0.6).to_pandas()
    # doc 0 exact match dropped; doc 2 near-dup (6/8 shared 3-grams =
    # 0.75... vs union) dropped at 0.6; 1 and 3 survive
    assert sorted(out.doc_id.tolist()) == [1, 3]
