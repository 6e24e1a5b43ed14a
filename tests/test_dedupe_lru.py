"""Windowed-LRU dedupe — the reference's cache.num_events semantics
(dedupe/transform.rs:77-88): hit -> drop + refresh recency; eviction ->
re-emission on the next occurrence."""

import pyarrow as pa
import ray.data as rd

from vector_ray.stages.dedupe import dedupe_exact, dedupe_lru


def _seq(values):
    return rd.from_arrow(pa.table({
        "a": values,
        "i": pa.array(range(len(values)), pa.int64()),
    }))


def test_lru_reemits_after_eviction():
    # cache of 2: A B C evicts A, so the 4th event (A) re-emits
    ds = _seq(["A", "B", "C", "A"])
    out = dedupe_lru(ds, ["a"], cache_size=2, order_by=["i"]).to_pandas()
    assert sorted(out["i"]) == [0, 1, 2, 3]
    # exact-global would drop the second A
    exact = dedupe_exact(ds, ["a"], order_by=["i"]).to_pandas()
    assert sorted(exact["i"]) == [0, 1, 2]


def test_lru_hit_refreshes_recency():
    # cache 2: A B A(hit, refresh -> [B, A]) C(evicts B) B(re-emit)
    ds = _seq(["A", "B", "A", "C", "B"])
    out = dedupe_lru(ds, ["a"], cache_size=2, order_by=["i"]).to_pandas()
    assert sorted(out["i"]) == [0, 1, 3, 4]


def test_lru_within_capacity_equals_exact():
    vals = ["x", "y", "x", "z", "y", "w", "x"]
    ds = _seq(vals)
    lru = dedupe_lru(ds, ["a"], cache_size=100, order_by=["i"]).to_pandas()
    exact = dedupe_exact(ds, ["a"], order_by=["i"]).to_pandas()
    assert sorted(lru["i"]) == sorted(exact["i"])


def test_lru_partitioned_hit_consistency():
    # partitioned mode: same fingerprint always lands in one partition,
    # so within-capacity behavior still drops every repeat
    vals = [f"k{i % 5}" for i in range(40)]
    ds = _seq(vals)
    out = dedupe_lru(ds, ["a"], cache_size=100, order_by=["i"],
                     num_partitions=4).to_pandas()
    assert len(out) == 5
    assert sorted(out["a"]) == sorted({f"k{i}" for i in range(5)})
    # survivors are each key's FIRST occurrence
    assert sorted(out["i"]) == [0, 1, 2, 3, 4]


def test_lru_via_topology_config(tmp_path):
    import pyarrow.parquet as pq

    from vector_ray.topology import Topology, run_topology

    t = pa.table({"a": ["A", "B", "C", "A"],
                  "i": pa.array(range(4), pa.int64())})
    pq.write_table(t, tmp_path / "events.parquet")
    topo = Topology.from_yaml(f"""
sources:
  s: {{type: parquet, path: "{tmp_path}/events.parquet"}}
transforms:
  d:
    type: dedupe
    inputs: [s]
    fields: [a]
    order_by: [i]
    cache: {{num_events: 2}}
sinks:
  out: {{type: blackhole, inputs: [d]}}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 4  # all four survive (A re-emitted)
