"""ORC source/sink (sources/orc.py) roundtrips + topology type."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.sources.orc import read_orc, write_orc


def test_orc_roundtrip_and_pruning(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    t = pa.table({
        "a": pa.array(np.arange(1000), pa.int64()),
        "b": pa.array(rng.choice(["x", "y"], 1000)),
        "c": pa.array(rng.normal(size=1000)),
    })
    out = str(tmp_path / "orc")
    n = write_orc(rd.from_arrow(t).repartition(4), out)
    assert n == 1000

    back = read_orc(f"{out}", columns=["a", "b"]).to_pandas()
    assert len(back) == 1000
    assert sorted(back.columns) == ["a", "b"]
    assert sorted(back.a.tolist()) == list(range(1000))


def test_orc_topology_source(ray_session, tmp_path):
    t = pa.table({"user_id": [1, 2, 3], "v": [10, 20, 30]})
    out = str(tmp_path / "orc2")
    write_orc(rd.from_arrow(t), out)

    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  src:
    type: orc
    path: "{out}/*.orc"
    columns: [user_id, v]
sinks:
  outp:
    type: parquet
    inputs: [src]
    path: "{tmp_path}/pq"
""")
    res = run_topology(topo)
    assert res.sink_counts["outp"] == 3
