"""Empty-input hardening sweep for the round-4-continuation wave:
every new operator must survive a zero-row (typed) input without
crashing and return zero rows."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _empty(schema: dict):
    return rd.from_arrow(pa.table(
        {k: pa.array([], t) for k, t in schema.items()}))


class TestEmptyInputs:
    def test_gini(self):
        from vector_ray.stages.stats import grouped_gini
        ds = _empty({"k": pa.string(), "v": pa.int64()})
        assert grouped_gini(ds, keys=["k"], x="v").count() == 0

    def test_bitops(self):
        from vector_ray.stages.stats import grouped_bitops
        ds = _empty({"k": pa.string(), "v": pa.int64()})
        assert grouped_bitops(ds, keys=["k"], x="v",
                              num_partitions=2).count() == 0

    def test_chi2(self):
        from vector_ray.stages.stats import chi2_independence
        ds = _empty({"a": pa.string(), "b": pa.string()})
        assert chi2_independence(ds, a_col="a", b_col="b").num_rows == 0

    def test_ranksum(self):
        from vector_ray.stages.stats import rank_sum_u2
        ds = _empty({"s": pa.string(), "v": pa.int64()})
        out = rank_sum_u2(ds, value_col="v", side_col="s",
                          side_a="A", side_b="B")
        assert out["u2_a"][0].as_py() == 0

    def test_ks(self):
        from vector_ray.stages.stats import ks_statistic
        ds = _empty({"s": pa.string(), "v": pa.int64()})
        out = ks_statistic(ds, value_col="v", side_col="s",
                           side_a="A", side_b="B")
        assert out["ks_num"][0].as_py() == 0

    def test_twa(self):
        from vector_ray.stages.stats import time_weighted_avg
        ds = _empty({"k": pa.string(), "ts": pa.int64(),
                     "v": pa.int64()})
        assert time_weighted_avg(ds, keys=["k"], ts_col="ts",
                                 value_col="v").count() == 0

    def test_coverage(self):
        from vector_ray.stages.windows import interval_union_length
        ds = _empty({"u": pa.int64(), "s": pa.int64(),
                     "e": pa.int64()})
        assert interval_union_length(ds, key="u", start_col="s",
                                     end_col="e").count() == 0

    def test_streaks(self):
        from vector_ray.stages.paths import max_streak
        ds = _empty({"u": pa.int64(), "d": pa.int64()})
        assert max_streak(ds, key="u", seq_col="d",
                          num_partitions=2).count() == 0

    def test_cap_per_group(self):
        from vector_ray.ml.mixing import cap_per_group
        ds = _empty({"g": pa.string(), "id": pa.int64()})
        assert cap_per_group(ds, group_col="g", id_col="id",
                             cap=3).count() == 0

    def test_expect(self):
        from vector_ray.stages.expect import expect
        ds = _empty({"v": pa.float64()})
        res = expect(ds, [{"name": "r", "condition": ".v >= 0.0"}])
        assert res.passed.count() == 0
        assert res.quarantined.count() == 0

    def test_profile(self):
        from vector_ray.stages.profile import profile
        ds = _empty({"x": pa.int64()})
        out = profile(ds, ["x"], num_partitions=2)
        got = {(r["column"], r["metric"]): r["value"]
               for r in out.to_pylist()}
        assert got[("x", "rows")] == "0"
        assert got[("x", "distinct")] == "0"

    def test_anomaly_and_cusum(self):
        from vector_ray.stages.anomaly import cusum_flags, rolling_anomaly
        ds = _empty({"k": pa.string(), "i": pa.int64(),
                     "v": pa.int64()})
        assert rolling_anomaly(ds, keys=["k"], order_by=["i"],
                               value_col="v").count() == 0
        assert cusum_flags(ds, keys=["k"], order_by=["i"],
                           value_col="v", k_ref=0, h=10).count() == 0

    def test_kmv(self):
        from vector_ray.stages.sketch import kmv_estimate, kmv_sketch
        ds = _empty({"v": pa.int64()})
        sk = kmv_sketch(ds, ["v"], k=16)
        assert kmv_estimate(sk, 16) == 0

    def test_zorder(self):
        from vector_ray.stages.zorder import column_ranges
        ds = _empty({"x": pa.int64()})
        with pytest.raises(ValueError):
            column_ranges(ds, ["x"])

    def test_incremental_no_files(self, tmp_path):
        from vector_ray.stages.incremental import incremental_aggregate
        out = incremental_aggregate([], str(tmp_path / "s"),
                                    keys=["k"], value_col="v")
        assert out.num_rows == 0

    def test_transitions(self):
        from vector_ray.stages.paths import transition_counts
        ds = _empty({"u": pa.string(), "i": pa.int64(),
                     "s": pa.string()})
        assert transition_counts(ds, key="u", order_by=["i"],
                                 state_col="s").num_rows == 0

    def test_running_minmax(self):
        from vector_ray.stages.sorted_ops import running_minmax
        ds = _empty({"k": pa.string(), "i": pa.int64(),
                     "v": pa.int64()})
        assert running_minmax(ds, keys=["k"], order_by=["i"],
                              value_col="v").count() == 0
