"""inverted_index: DuckDB posting-list replay, cap semantics
(n_kept ≤ cap while df stays exact), layout invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.vocab import inverted_index


def _docs(seed=23, n=400, vocab=60):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(words[j] for j in
                      rng.integers(0, vocab, rng.integers(3, 30)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts)})


def _sql(cap):
    return f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, token FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         FROM t) WHERE token <> ''),
    dfreq AS (SELECT token, count(*)::BIGINT AS df FROM pairs
              GROUP BY token),
    r AS (SELECT token, doc_id, row_number() OVER
            (PARTITION BY token ORDER BY doc_id) AS rn FROM pairs),
    p AS (SELECT token,
                 string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
                   AS postings,
                 count(*)::BIGINT AS n_kept
          FROM r WHERE rn <= {cap} GROUP BY token)
    SELECT p.token, p.postings, p.n_kept, dfreq.df
    FROM p JOIN dfreq USING (token) ORDER BY token"""


class TestInvertedIndex:
    @pytest.mark.parametrize("parts", [1, 8])
    @pytest.mark.parametrize("cap", [4, 1000])
    def test_duckdb_replay(self, parts, cap):
        t = _docs()
        got = (inverted_index(rd.from_arrow(t).repartition(parts),
                              max_postings=cap)
               .to_pandas().sort_values("token")
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(_sql(cap)).df()
        pd.testing.assert_frame_equal(got, want)

    def test_cap_bounds_postings_not_df(self):
        t = _docs()
        got = inverted_index(rd.from_arrow(t).repartition(4),
                             max_postings=4).to_pandas()
        assert (got["n_kept"] <= 4).all()
        assert (got["df"] >= got["n_kept"]).all()
        # frequent tokens keep full df but capped postings
        hot = got[got["df"] > 4]
        assert len(hot) > 0
        assert (hot["n_kept"] == 4).all()
        assert (hot["postings"].str.count(",") == 3).all()
