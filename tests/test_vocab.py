"""ml/vocab.py: token counts, per-doc tf, df, top-terms ranking."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.ml.vocab import (
    doc_freq,
    doc_term_freq,
    tf_idf,
    token_counts,
    top_terms,
)


@pytest.fixture
def docs_df():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(60)]
    texts[5] = ""                       # empty doc
    texts[6] = "solo"                   # singleton token
    texts[7] = "a  b"                   # double space → empty token
    return pd.DataFrame({"doc_id": np.arange(60), "text": texts})


def _ref_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in t.split(" ") if w)
    return c


def test_token_counts_matches_counter(ray_session, docs_df):
    got = token_counts(rd.from_pandas(docs_df).repartition(5)).to_pandas()
    ref = _ref_counts(docs_df["text"])
    assert dict(zip(got["token"], got["cnt"])) == dict(ref)


def test_token_counts_top_n_tiebreak(ray_session, docs_df):
    got = token_counts(rd.from_pandas(docs_df).repartition(3),
                       top_n=5).to_pandas()
    ref = sorted(_ref_counts(docs_df["text"]).items(),
                 key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["token"], got["cnt"])) == ref


def test_doc_term_freq_and_df(ray_session, docs_df):
    ds = rd.from_pandas(docs_df).repartition(4)
    tf = doc_term_freq(ds).materialize()
    tf_pd = tf.to_pandas()
    # per-doc tf equals a Counter over that doc
    for doc_id in (0, 5, 6, 7):
        text = docs_df.loc[doc_id, "text"]
        ref = Counter(w for w in text.split(" ") if w)
        sub = tf_pd[tf_pd["doc_id"] == doc_id]
        assert dict(zip(sub["token"], sub["tf"])) == dict(ref)
    df_pd = doc_freq(tf).to_pandas()
    ref_df = Counter()
    for t in docs_df["text"]:
        ref_df.update(set(w for w in t.split(" ") if w))
    assert dict(zip(df_pd["token"], df_pd["df"])) == dict(ref_df)


def test_top_terms_rank_is_deterministic(ray_session, docs_df):
    got = top_terms(rd.from_pandas(docs_df).repartition(4),
                    k=2).to_pandas()
    assert set(got.columns) == {"doc_id", "token", "tf", "df", "rank"}
    assert got["rank"].isin([1, 2]).all()
    # rank 1 of a doc dominates rank 2 under (tf desc, df asc, token asc)
    for _, g in got.groupby("doc_id"):
        g = g.sort_values("rank")
        if len(g) == 2:
            a, b = g.iloc[0], g.iloc[1]
            assert (-a["tf"], a["df"], a["token"]) < (
                -b["tf"], b["df"], b["token"])
    # empty doc contributes no rows; singleton doc exactly one
    assert 5 not in set(got["doc_id"])
    assert (got["doc_id"] == 6).sum() == 1


def test_tf_idf_scores(ray_session, docs_df):
    got = tf_idf(rd.from_pandas(docs_df).repartition(4)).to_pandas()
    n = len(docs_df)
    expect = got["tf"] * np.log(n / got["df"])
    assert np.allclose(got["tfidf"], expect)
    solo = got[got["token"] == "solo"]
    assert len(solo) == 1 and solo["df"].iloc[0] == 1


# --- bigram LM scoring (ml/lm_score.py) -----------------------------------

def test_lm_score_matches_reference(ray_session):
    from math import log

    from vector_ray.ml.lm_score import lm_score

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b c", "a b", "c c c", "solo"],
    })
    got = lm_score(rd.from_pandas(docs).repartition(3),
                   micro=False).to_pandas().set_index("doc_id")

    # reference counts over the whole corpus
    pairs = []
    for t in docs["text"]:
        ws = t.split(" ")
        pairs += list(zip(ws, ws[1:]))
    from collections import Counter
    cb, cu = Counter(pairs), Counter(p[0] for p in pairs)

    def ref(t):
        ws = t.split(" ")
        return sum(log(cb[(a, b)] / cu[a]) for a, b in zip(ws, ws[1:]))

    for d in (0, 1, 2):
        assert np.isclose(got.loc[d, "logprob"], ref(docs.loc[d, "text"]))
        assert got.loc[d, "n_bigrams"] == len(docs.loc[d, "text"].split()) - 1
    assert 3 not in got.index          # single-token doc: no bigram
