"""Zone-map file pruning (sinks/parquet.py): footer min/max stats in
the manifest, whole-file skipping under conjunctive predicates,
always-safe semantics."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from vector_ray.sinks.parquet import (prune_files, read_pruned,
                                      write_partitioned)


def _write(tmp_path, n=10_000, blocks=8):
    rng = np.random.default_rng(4)
    t = pa.table({
        "k": pa.array(rng.choice(["a", "b"], size=n)),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    })
    # sort by v so each output file covers a disjoint range
    ds = rd.from_arrow(t).sort("v").repartition(blocks)
    out = str(tmp_path / "sink")
    write_partitioned(ds, out, sink_name="zm", stats_cols=["v"])
    return out, t


def test_stats_recorded_and_pruning_correct(ray_session, tmp_path):
    out, t = _write(tmp_path)
    kept, total = prune_files(out, [("v", ">=", 9_000)])
    assert len(total) >= 4
    assert 0 < len(kept) < len(total)

    got = (read_pruned(out, predicate=[("v", ">=", 9_000)])
           .map_batches(lambda b: b.filter(
               pc.greater_equal(b["v"], 9_000)),
               batch_format="pyarrow", batch_size=None)
           .to_pandas().sort_values("v").reset_index(drop=True))
    want = t.to_pandas().query("v >= 9000").sort_values(
        "v").reset_index(drop=True)
    assert got.v.tolist() == want.v.tolist()


def test_equality_and_range_conjunction(ray_session, tmp_path):
    out, _ = _write(tmp_path)
    kept_eq, total = prune_files(out, [("v", "=", 5)])
    assert len(kept_eq) == 1
    kept_conj, _ = prune_files(
        out, [("v", ">", 2_000), ("v", "<", 2_100)])
    assert len(kept_conj) == 1


def test_absent_stats_keep_everything(ray_session, tmp_path):
    out, _ = _write(tmp_path)
    kept, total = prune_files(out, [("missing_col", ">", 1)])
    assert kept == total


def test_all_pruned_raises(ray_session, tmp_path):
    out, _ = _write(tmp_path)
    import pytest

    with pytest.raises(ValueError):
        read_pruned(out, predicate=[("v", ">", 10**9)])


def test_resume_skips_completed_write(ray_session, tmp_path):
    out, t = _write(tmp_path)
    # second write with the same partition_id must be a no-op skip
    ds = rd.from_arrow(t.slice(0, 10))
    n = write_partitioned(ds, out, sink_name="zm", stats_cols=["v"])
    assert n == t.num_rows  # recorded count, not the 10-row rewrite


def test_zone_predicate_yaml_source(ray_session, tmp_path):
    out, t = _write(tmp_path)
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  pruned:
    type: parquet
    path: "{out}"
    zone_predicate: [["v", ">=", 9000]]
transforms:
  exact:
    type: filter
    inputs: [pruned]
    condition: ".v >= 9000"
sinks:
  outp:
    type: parquet
    inputs: [exact]
    path: "{tmp_path}/pruned_out"
""")
    res = run_topology(topo)
    assert res.sink_counts["outp"] == 1000


def test_write_metrics_recorded(ray_session, tmp_path):
    import json

    out, t = _write(tmp_path)
    m = json.load(open(f"{out}/_manifest.json"))
    metrics = m["partitions"]["all"]["metrics"]
    assert metrics["files"] >= 1
    assert metrics["bytes"] > 0
    assert metrics["wall_s"] >= 0
