"""Incremental aggregation (stages/incremental.py): two-step run
equals full recompute bit-for-bit, already-seen files are skipped,
crash between partials write and state commit stays idempotent."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vector_ray.stages.incremental import incremental_aggregate


def _shards(tmp_path, n_shards=4, rows=600, seed=4):
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n_shards):
        t = pa.table({
            "k": pa.array(rng.integers(0, 6, rows).astype(str)),
            "v": pa.array(rng.integers(0, 1000, rows).astype(np.int64)),
        })
        p = str(tmp_path / f"shard_{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def _asdict(t: pa.Table):
    return {k: (s, n) for k, s, n in
            zip(t["k"].to_pylist(), t["s"].to_pylist(),
                t["n"].to_pylist())}


class TestIncremental:
    def test_two_step_equals_full(self, tmp_path):
        files = _shards(tmp_path)
        sd_inc = str(tmp_path / "state_inc")
        sd_full = str(tmp_path / "state_full")

        first = incremental_aggregate(files[:2], sd_inc,
                                      keys=["k"], value_col="v")
        assert sum(first["n"].to_pylist()) == 1200
        second = incremental_aggregate(files, sd_inc,
                                       keys=["k"], value_col="v")
        full = incremental_aggregate(files, sd_full,
                                     keys=["k"], value_col="v")
        assert _asdict(second) == _asdict(full)
        st = json.load(open(os.path.join(sd_inc, "state.json")))
        assert st["version"] == 2 and len(st["processed"]) == 4

    def test_rerun_with_no_new_files_is_pure_read(self, tmp_path):
        files = _shards(tmp_path, 2)
        sd = str(tmp_path / "state")
        a = incremental_aggregate(files, sd, keys=["k"], value_col="v")
        v_before = json.load(open(os.path.join(sd, "state.json")))["version"]
        b = incremental_aggregate(files, sd, keys=["k"], value_col="v")
        v_after = json.load(open(os.path.join(sd, "state.json")))["version"]
        assert _asdict(a) == _asdict(b)
        assert v_before == v_after == 1     # no state churn

    def test_crash_before_state_commit_idempotent(self, tmp_path):
        """partials_v2 written but state.json still at v1 → the rerun
        reprocesses the same new files and converges identically."""
        files = _shards(tmp_path, 3)
        sd = str(tmp_path / "state")
        incremental_aggregate(files[:1], sd, keys=["k"], value_col="v")
        # simulate the crash: stale partials_v2 exists, state at v1
        os.makedirs(os.path.join(sd, "partials_v2"), exist_ok=True)
        pq.write_table(pa.table({"k": pa.array(["ZZZ"]),
                                 "s": pa.array([999], pa.int64()),
                                 "n": pa.array([1], pa.int64())}),
                       os.path.join(sd, "partials_v2", "junk.parquet"))
        got = incremental_aggregate(files, sd, keys=["k"], value_col="v")
        full = incremental_aggregate(files, str(tmp_path / "f"),
                                     keys=["k"], value_col="v")
        assert _asdict(got) == _asdict(full)     # junk wiped, not merged

    def test_prep_applied(self, tmp_path):
        files = _shards(tmp_path, 2)
        sd = str(tmp_path / "state")

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({"k": t["k"],
                             "v": pc.multiply(t["v"], 2)})

        got = incremental_aggregate(files, sd, keys=["k"],
                                    value_col="v", prep=prep)
        plain = incremental_aggregate(files, str(tmp_path / "p"),
                                      keys=["k"], value_col="v")
        gd, pd_ = _asdict(got), _asdict(plain)
        assert all(gd[k][0] == 2 * pd_[k][0] for k in pd_)
