"""csv/json sinks, strftime template partitioning, snapshot enricher."""

import glob
import json
import os

import pyarrow as pa
import ray.data as rd

from vector_ray.topology import Topology, run_topology

SF = "/root/testdata/sf0.001"


def test_csv_json_sinks(tmp_path):
    topo = Topology.from_yaml(f"""
sources:
  t: {{type: transcripts, sf_dir: "{SF}", columns: [conv_id, turn_idx, role]}}
transforms:
  few: {{type: filter, inputs: [t], condition: '.turn_idx == 0'}}
sinks:
  c: {{type: csv, inputs: [few], path: "{tmp_path}/csv_out"}}
  j: {{type: json, inputs: [few], path: "{tmp_path}/json_out"}}
""")
    res = run_topology(topo)
    assert res.sink_counts["c"] == res.sink_counts["j"] > 0
    assert glob.glob(f"{tmp_path}/csv_out/*.csv")
    assert glob.glob(f"{tmp_path}/json_out/*.json")


def test_strftime_partitioned_parquet(tmp_path):
    topo = Topology.from_yaml(f"""
sources:
  t: {{type: transcripts, sf_dir: "{SF}"}}
sinks:
  out:
    type: parquet
    inputs: [t]
    path: "{tmp_path}/by_day"
    strftime_partitions:
      - {{col: ts, fmt: "%Y-%m-%d", as: day}}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 6000
    days = glob.glob(f"{tmp_path}/by_day/day=*")
    assert len(days) >= 2  # conv starts spread over >1 day
    # rows are recoverable with the partition column
    back = rd.read_parquet(f"{tmp_path}/by_day")
    assert back.count() == 6000


def test_snapshot_enricher(tmp_path):
    from vector_ray.enrichment.snapshot import enrich_snapshot

    snap_file = tmp_path / "meta.json"
    snap_file.write_text(json.dumps(
        {"instance_id": "i-0123", "region": "us-east-1", "extra": "x"}))
    ds = rd.from_items([{"id": 1}, {"id": 2}])
    out = enrich_snapshot(
        ds, str(snap_file), fields=["instance_id", "region"],
        prefix="meta_", concurrency=1,
    ).to_pandas()
    assert out["meta_instance_id"].tolist() == ["i-0123", "i-0123"]
    assert out["meta_region"].tolist() == ["us-east-1"] * 2
    assert "meta_extra" not in out.columns
