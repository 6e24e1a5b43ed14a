"""fuzzy_pairs (Levenshtein ≤ 1 deletion-neighborhood join) and
grouped_share (ratio_to_report): DuckDB replay, blocking completeness
vs brute force, verify-stage false-positive rejection."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.fuzzy import _lev_le1, fuzzy_pairs
from vector_ray.stages.stats import grouped_share


class TestLevLe1:
    @pytest.mark.parametrize("a,b,d", [
        ("abc", "abc", 0), ("abc", "abd", 1), ("abc", "ab", 1),
        ("abc", "xabc", 1), ("abc", "axbc", 1), ("abc", "abcd", 1),
        ("abc", "xyz", None), ("abc", "a", None), ("", "", 0),
        ("", "x", 1), ("xbc", "bcy", None), ("ab", "ba", None),
    ])
    def test_cases(self, a, b, d):
        assert _lev_le1(a, b) == d
        assert _lev_le1(b, a) == d


def _codes(seed=31, n=600):
    rng = np.random.default_rng(seed)
    codes = [f"w{rng.integers(0, 40)}x{rng.integers(0, 6)}"
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(codes)})


SQL_PAIRS = """
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM t a JOIN t b
  ON a.doc_id < b.doc_id AND levenshtein(a.text, b.text) <= 1
ORDER BY a, b"""


class TestFuzzyPairs:
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, parts):
        t = _codes()
        got = (fuzzy_pairs(rd.from_arrow(t).repartition(parts))
               .to_pandas().sort_values(["a", "b"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(SQL_PAIRS).df()
        pd.testing.assert_frame_equal(got, want)

    def test_false_positive_rejected(self):
        # 'xbc' and 'bcy' share the deletion variant 'bc' but are at
        # distance 2 — the verify stage must drop them
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["xbc", "bcy"])})
        got = fuzzy_pairs(rd.from_arrow(t)).to_pandas()
        assert len(got) == 0

    def test_long_strings_dropped(self):
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a" * 100, "a" * 100])})
        got = fuzzy_pairs(rd.from_arrow(t), max_len=8).to_pandas()
        assert len(got) == 0


class TestGroupedShare:
    @pytest.mark.parametrize("parts", [1, 9])
    def test_duckdb_replay(self, parts):
        rng = np.random.default_rng(3)
        n = 3000
        t = pa.table({
            "i": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array([f"k{v}" for v in rng.integers(0, 7, n)]),
            "v": pa.array(rng.integers(1, 5000, n).astype(np.int64))})
        got = (grouped_share(rd.from_arrow(t).repartition(parts),
                             key="k", value_col="v")
               .to_pandas().sort_values("i").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute("""
          SELECT i, k, v,
                 CAST(round(1000000.0 * (CAST(v AS DOUBLE) /
                      CAST(sum(v) OVER (PARTITION BY k) AS DOUBLE)))
                   AS BIGINT) AS share_micro
          FROM t ORDER BY i""").df()
        pd.testing.assert_frame_equal(got, want)

    def test_shares_sum_to_one(self):
        t = pa.table({"i": pa.array([0, 1, 2], pa.int64()),
                      "k": pa.array(["a"] * 3),
                      "v": pa.array([1, 1, 1], pa.int64())})
        got = grouped_share(rd.from_arrow(t), key="k",
                            value_col="v").to_pandas()
        assert abs(got["share_micro"].sum() - 1_000_000) <= 2
