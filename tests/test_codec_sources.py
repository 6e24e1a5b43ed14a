"""Topology source types for the round-5 format decoders
(native / strata / json_paths) — end-to-end YAML → parquet."""

import json
import struct

import pyarrow.parquet as pq

from vector_ray.topology import Topology, run_topology


def test_native_source_metric_projection(tmp_path, ray_session):
    from vector_ray.functions.native_proto import encode_native

    frames = [
        encode_native([("metric", {"name": f"m{i}", "kind": "absolute",
                                   "counter": {"value": float(i)}})])
        for i in range(4)
    ] + [encode_native([("log", {"msg": "skip me"})])]
    cap = tmp_path / "cap.native"
    with open(cap, "wb") as f:
        for fr in frames:
            f.write(struct.pack(">I", len(fr)) + fr)

    topo = Topology.from_yaml(f"""
sources:
  ev:
    type: native
    path: "{cap}"
    project: metrics
sinks:
  out:
    type: parquet
    inputs: [ev]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 4  # the log frame is projected out
    t = pq.read_table(f"{tmp_path}/out")
    assert sorted(t["name"].to_pylist()) == ["m0", "m1", "m2", "m3"]
    assert sorted(t["value"].to_pylist()) == [0.0, 1.0, 2.0, 3.0]


def test_strata_source(tmp_path, ray_session):
    body = ('{"bucket":"bb"}\n'
            '{"eid":1,"level":"info"}\n{"eid":2,"level":"error"}\n')
    (tmp_path / "a.strata").write_text(body)

    topo = Topology.from_yaml(f"""
sources:
  ev:
    type: strata
    path: "{tmp_path}/a.strata"
sinks:
  out:
    type: parquet
    inputs: [ev]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 2
    rows = [json.loads(p) for p in
            pq.read_table(f"{tmp_path}/out")["payload"].to_pylist()]
    assert all(r["strata_file_header"]["bucket"] == "bb" for r in rows)
    assert sorted(r["eid"] for r in rows) == [1, 2]


def test_json_paths_source(tmp_path, ray_session):
    (tmp_path / "a.ndjson").write_text(
        '{"meta": {"s": 1}, "recs": [10, 20]}\n{"recs": [30]}\n')

    topo = Topology.from_yaml(f"""
sources:
  ev:
    type: json_paths
    path: "{tmp_path}/a.ndjson"
    paths:
      .meta: identity
      recs: explode
sinks:
  out:
    type: parquet
    inputs: [ev]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 4
    t = pq.read_table(f"{tmp_path}/out")
    got = sorted(zip(t["expr"].to_pylist(), t["data"].to_pylist()))
    assert got == [("meta", '{"s":1}'), ("recs", "10"),
                   ("recs", "20"), ("recs", "30")]
