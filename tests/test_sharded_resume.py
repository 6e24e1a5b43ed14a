"""Shard-level resumable topology runs (per-partition lineage)."""

import json
import os

import pytest

from vector_ray.topology import Topology
from vector_ray.topology.runner import run_topology_sharded
from vector_ray.state.manifest import RunManifest

SF = "/root/testdata/sf0.1"

YAML = """
sources:
  t: {{type: transcripts, sf_dir: "{sf}"}}
transforms:
  parse: {{type: remap, inputs: [t], program: transcript_parse}}
  only_errors: {{type: filter, inputs: [parse], condition: '.level == "error"'}}
sinks:
  out: {{type: parquet, inputs: [only_errors], path: "{out}"}}
"""


def test_sharded_run_and_resume(tmp_path):
    out = str(tmp_path / "errors")
    topo = Topology.from_yaml(YAML.format(sf=SF, out=out))

    res1 = run_topology_sharded(topo, num_shards=2)
    assert res1.sink_counts["out"] > 0
    root = RunManifest(out)
    assert root.completed_partitions() == ["shard-00000", "shard-00001"]
    t_first = {}
    with open(os.path.join(out, "_manifest.json")) as f:
        t_first = {k: v["completed_at"] for k, v in json.load(f)["partitions"].items()}

    # rerun: both shards must be SKIPPED (manifest timestamps unchanged)
    res2 = run_topology_sharded(topo, num_shards=2)
    assert res2.sink_counts["out"] == res1.sink_counts["out"]
    with open(os.path.join(out, "_manifest.json")) as f:
        t_second = {k: v["completed_at"] for k, v in json.load(f)["partitions"].items()}
    assert t_first == t_second  # no rewrite happened

    # shard outputs land under shard= dirs
    assert os.path.isdir(os.path.join(out, "shard=00000"))
    assert os.path.isdir(os.path.join(out, "shard=00001"))

    # total row count equals the unsharded pipeline's count
    import duckdb
    from vector_ray import oracle

    tpath, _ = oracle.oracle_paths(SF)
    want = duckdb.sql(
        oracle.parsed_cte(tpath) + "SELECT count(*) FROM p WHERE level = 'error'"
    ).fetchone()[0]
    assert res1.sink_counts["out"] == want


def test_partial_resume_after_interruption(tmp_path):
    out = str(tmp_path / "errors")
    topo = Topology.from_yaml(YAML.format(sf=SF, out=out))
    full = run_topology_sharded(topo, num_shards=2)

    # simulate a crash that lost shard-00001's manifest entry: it must
    # be recomputed while shard-00000 is skipped
    m = RunManifest(out)
    first_count = m.row_count("shard-00000")
    with open(m.path) as f:
        data = json.load(f)
    t0 = data["partitions"]["shard-00000"]["completed_at"]
    del data["partitions"]["shard-00001"]
    with open(m.path, "w") as f:
        json.dump(data, f)

    res = run_topology_sharded(topo, num_shards=2)
    assert res.sink_counts["out"] == full.sink_counts["out"]
    with open(m.path) as f:
        data2 = json.load(f)
    assert data2["partitions"]["shard-00000"]["completed_at"] == t0  # untouched
    assert "shard-00001" in data2["partitions"]  # recomputed
