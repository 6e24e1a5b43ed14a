"""Data-quality expectations (stages/expect.py): pass/quarantine
split, failed-rule tags in declaration order, all-pass rule, YAML
two-port component."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.expect import expect


def _tbl():
    return pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, -5.0, 900.0, 50.0]),
        "kind": pa.array(["a", "b", "zz", "a"]),
    })


RULES = [
    {"name": "v_nonneg", "condition": ".v >= 0.0"},
    {"name": "v_lt_500", "condition": ".v < 500.0"},
    {"name": "known_kind", "condition": '.kind == "a" || .kind == "b"'},
]


class TestExpect:
    def test_split_and_tags(self):
        res = expect(rd.from_arrow(_tbl()).repartition(2), RULES)
        passed = {r["id"] for r in res.passed.take_all()}
        quar = {r["id"]: r["failed_rules"]
                for r in res.quarantined.take_all()}
        assert passed == {1, 4}
        assert quar == {2: "v_nonneg", 3: "v_lt_500,known_kind"}

    def test_passed_drops_tag_column(self):
        res = expect(rd.from_arrow(_tbl()), RULES)
        assert "failed_rules" not in res.passed.schema().names
        assert "failed_rules" in res.quarantined.schema().names

    def test_yaml_component(self, tmp_path):
        import duckdb

        from vector_ray.topology import Topology, run_topology

        sf = "/root/testdata/sf0.001"
        topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: {sf}/events.parquet
    columns: [event_id, user_id, value]
transforms:
  checked:
    type: expect
    inputs: [events]
    rules:
      - name: small_user
        condition: ".user_id < 100"
      - name: v_lt_300
        condition: ".value < 300.0"
sinks:
  ok_out:
    type: parquet
    inputs: [checked.passed]
    path: "{tmp_path}/ok"
  bad_out:
    type: parquet
    inputs: [checked.quarantine]
    path: "{tmp_path}/bad"
""")
        res = run_topology(topo)
        sc = res.sink_counts
        want_bad = duckdb.sql(f"""
            SELECT count(*) FROM '{sf}/events.parquet'
            WHERE NOT (user_id < 100) OR NOT (value < 300)
        """).fetchone()[0]
        n = duckdb.sql(f"SELECT count(*) FROM "
                       f"'{sf}/events.parquet'").fetchone()[0]
        assert sc["bad_out"] == want_bad
        assert sc["ok_out"] == n - want_bad
