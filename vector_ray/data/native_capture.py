"""Deterministic native_json NDJSON capture fixture.

A vector→vector interop capture generated from the events table:
every event becomes one native_json frame — ``event_id % 7 == 0``
rows become LOG events (they must be excluded by the metric
projection), the rest metrics alternating counter/gauge and
incremental/absolute.  All values integer-derived so the DuckDB
oracle reproduces the projected table from the SAME parquet without
touching the capture bytes."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

NATIVE_FIXTURE_VERSION = 1
SHARDS = 4


def native_line(event_id: int, user_id: int, event_type: str) -> str:
    if event_id % 7 == 0:
        return json.dumps(
            {"log": {"message": f"evt {event_id}", "app": event_type}},
            separators=(",", ":"))
    mtype = "gauge" if event_id % 5 == 0 else "counter"
    m = {
        "name": event_type,
        "namespace": f"e{event_id}",
        "kind": "incremental" if event_id % 2 == 0 else "absolute",
        mtype: {"value": user_id * 3 + 1},
    }
    return json.dumps({"metric": m}, separators=(",", ":"))


def ensure_native_json_fixture(sf_dir: str) -> list[str]:
    from vector_ray.model import scratch_dir

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(scratch_dir(),
                     f"native_json_v{NATIVE_FIXTURE_VERSION}", sf_tag)
    paths = [os.path.join(d, f"capture-{i}.ndjson")
             for i in range(SHARDS)]
    done = os.path.join(d, ".done")
    if os.path.exists(done):
        return paths
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "event_type"])
    bufs = [[] for _ in range(SHARDS)]
    for e, u, ty in zip(t["event_id"].to_pylist(),
                        t["user_id"].to_pylist(),
                        t["event_type"].to_pylist()):
        bufs[e % SHARDS].append(native_line(e, u, ty))
    os.makedirs(d, exist_ok=True)
    for p, lines in zip(paths, bufs):
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, p)
    open(done, "w").close()
    return paths
