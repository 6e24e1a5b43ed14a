"""winsorize_group: DuckDB least/greatest quantile_disc replay,
layout invariance, unknown-group passthrough, all-data-empty."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.stats import winsorize_group


def _tbl(seed=11, n=3000, n_keys=6):
    rng = np.random.default_rng(seed)
    return pa.table({
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array([f"k{v}" for v in rng.integers(0, n_keys, n)]),
        "v": pa.array(rng.integers(-10_000, 10_000, n).astype(np.int64)),
    })


SQL = """
WITH b AS (SELECT k, quantile_disc(v, 0.05) lo,
                  quantile_disc(v, 0.95) hi FROM t GROUP BY k)
SELECT i, t.k, v, least(greatest(v, lo), hi) AS winsorized
FROM t JOIN b USING (k) ORDER BY i"""


class TestWinsorize:
    @pytest.mark.parametrize("parts", [1, 9])
    def test_duckdb_replay(self, parts):
        t = _tbl()
        got = (winsorize_group(rd.from_arrow(t).repartition(parts),
                               key="k", value_col="v")
               .to_pandas().sort_values("i").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(SQL).df()
        want.columns = ["i", "k", "v", "winsorized"]
        pd.testing.assert_frame_equal(got, want)

    def test_bounds_clip_only_tails(self):
        t = _tbl()
        out = winsorize_group(rd.from_arrow(t), key="k",
                              value_col="v").to_pandas()
        changed = (out["winsorized"] != out["v"]).mean()
        assert 0 < changed < 0.2          # ~10% of rows clipped
        # clipping is idempotent: re-winsorize changes nothing more
        t2 = pa.table({"i": pa.array(out["i"]), "k": pa.array(out["k"]),
                       "v": pa.array(out["winsorized"])})
        out2 = winsorize_group(rd.from_arrow(t2), key="k",
                               value_col="v").to_pandas()
        assert (out2["winsorized"] == out2["v"]).all()

    def test_empty_input(self):
        t = _tbl().slice(0, 0)
        out = winsorize_group(rd.from_arrow(t), key="k",
                              value_col="v").to_pandas()
        # fully-empty datasets lose schema in Ray (documented trap);
        # the contract here is no crash + zero rows
        assert len(out) == 0
