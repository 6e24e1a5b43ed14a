"""sequence_match (MATCH_RECOGNIZE-lite regex over ordered per-key
state strings) and assign_splits (deterministic train/val/test) —
DuckDB replay, layout invariance, edge semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.mixing import assign_splits
from vector_ray.stages.paths import sequence_match

ALPHA = {"login": "l", "fail": "f", "ok": "k", "buy": "b"}


def _events(seed=7, n=4000, n_keys=40):
    rng = np.random.default_rng(seed)
    states = np.array(list(ALPHA) + ["noise"])
    return pa.table({
        "k": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "o": pa.array(rng.permutation(n).astype(np.int64)),
        "st": pa.array(states[rng.integers(0, len(states), n)]),
    })


def _sql_seq(pattern):
    case = " ".join(f"WHEN '{s}' THEN '{c}'" for s, c in ALPHA.items())
    return f"""
    WITH s AS (SELECT k, o, CASE st {case} ELSE '_' END AS sym FROM t),
    q AS (SELECT k, string_agg(sym, '' ORDER BY o) AS seq
          FROM s GROUP BY k)
    SELECT k, CAST(len(regexp_extract_all(seq, '{pattern}')) AS BIGINT)
             AS n_matches,
           CAST(CASE WHEN len(regexp_extract_all(seq, '{pattern}')) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS matched
    FROM q"""


class TestSequenceMatch:
    @pytest.mark.parametrize("pattern", ["lf*k", "f{2,}", "l[fk]*b"])
    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_replay(self, pattern, parts):
        t = _events()
        got = (sequence_match(
            rd.from_arrow(t).repartition(parts), key="k",
            order_by=["o"], state_col="st", pattern=pattern,
            alphabet=ALPHA)
            .to_pandas().sort_values("k").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", t)
        want = (con.execute(_sql_seq(pattern)).df()
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_non_overlapping_counts(self):
        # RE2 scan semantics: 'ff' in 'ffff' matches twice, not thrice
        t = pa.table({"k": pa.array([1] * 4, pa.int64()),
                      "o": pa.array([0, 1, 2, 3], pa.int64()),
                      "st": pa.array(["fail"] * 4)})
        got = sequence_match(rd.from_arrow(t), key="k", order_by=["o"],
                             state_col="st", pattern="ff",
                             alphabet=ALPHA).to_pandas()
        assert got["n_matches"].tolist() == [2]

    def test_unmapped_state_breaks_match(self):
        t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                      "o": pa.array([0, 1, 2], pa.int64()),
                      "st": pa.array(["login", "noise", "ok"])})
        got = sequence_match(rd.from_arrow(t), key="k", order_by=["o"],
                             state_col="st", pattern="lk",
                             alphabet=ALPHA).to_pandas()
        assert got["matched"].tolist() == [0]

    def test_multichar_symbol_rejected(self):
        with pytest.raises(ValueError):
            sequence_match(rd.from_arrow(_events()), key="k",
                           order_by=["o"], state_col="st", pattern="x",
                           alphabet={"login": "lo"})


class TestAssignSplits:
    def test_md5_replay_and_partition_stability(self):
        ids = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        outs = []
        for parts in (1, 13):
            outs.append(assign_splits(
                rd.from_arrow(ids).repartition(parts),
                splits=(("train", 8), ("val", 1), ("test", 1)))
                .to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        con = duckdb.connect()
        con.register("t", ids)
        want = con.execute("""
          SELECT doc_id,
            CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT
                      % 1000000 < 800000 THEN 'train'
                 WHEN ('0x' || substr(md5(doc_id::VARCHAR),1,8))::BIGINT
                      % 1000000 < 900000 THEN 'val'
                 ELSE 'test' END AS split
          FROM t ORDER BY doc_id""").df()
        pd.testing.assert_frame_equal(outs[0], want)

    def test_membership_stable_under_growth(self):
        # adding rows never moves an existing row between splits
        small = pa.table({"doc_id": pa.array(range(500), pa.int64())})
        big = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
        a = (assign_splits(rd.from_arrow(small)).to_pandas()
             .set_index("doc_id")["split"])
        b = (assign_splits(rd.from_arrow(big)).to_pandas()
             .set_index("doc_id")["split"])
        assert (b.loc[a.index] == a).all()

    def test_fast_hash_covers_all_splits(self):
        t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
        out = assign_splits(rd.from_arrow(t), hash="fast",
                            splits=(("train", 2), ("val", 1),
                                    ("test", 1))).to_pandas()
        vc = out["split"].value_counts()
        assert set(vc.index) == {"train", "val", "test"}
        assert vc["train"] > vc["val"] and vc["train"] > vc["test"]

    def test_bad_splits_rejected(self):
        with pytest.raises(ValueError):
            assign_splits(rd.from_arrow(
                pa.table({"doc_id": pa.array([1], pa.int64())})),
                splits=(("train", 0),))
