"""Deterministic octet-counted syslog capture fixture.

Builds an RFC 6587 octet-counting framed syslog file set from the
events parquet table at a scale dir: every event becomes one RFC
3164-ish line whose fields are integer-derived from (event_id,
user_id, event_type) — no floats, so the DuckDB oracle reproduces the
exact parsed values from the SAME parquet without touching the
capture bytes.  Sharded into SHARDS files (one framing task per file)
and cached under the scratch dir.

Line shape (parse_syslog's RFC 3164 grammar):
    <pri>Feb {d:2d} {hh:02}:{mm:02}:{ss:02} h{user_id} {event_type}[{pid}]: evt {event_id}
with pri = user_id % 192, pid = event_id % 65536, and the timestamp
seconds = event_id % 86400, day = 1 + event_id % 27.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

SYSLOG_FIXTURE_VERSION = 1
SHARDS = 4


def syslog_line(event_id: int, user_id: int, event_type: str) -> str:
    pri = user_id % 192
    day = 1 + event_id % 27
    s = event_id % 86400
    pid = event_id % 65536
    return (f"<{pri}>Feb {day:2d} "
            f"{s // 3600:02d}:{(s // 60) % 60:02d}:{s % 60:02d} "
            f"h{user_id} {event_type}[{pid}]: evt {event_id}")


def ensure_syslog_octet_fixture(sf_dir: str) -> list[str]:
    """Generate-and-cache the framed capture; returns shard paths."""
    from vector_ray.model import scratch_dir

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(scratch_dir(),
                     f"syslog_octet_v{SYSLOG_FIXTURE_VERSION}", sf_tag)
    paths = [os.path.join(d, f"capture-{i}.log") for i in range(SHARDS)]
    done = os.path.join(d, ".done")
    if os.path.exists(done):
        return paths
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "event_type"])
    eids = t["event_id"].to_pylist()
    uids = t["user_id"].to_pylist()
    types = t["event_type"].to_pylist()
    bufs = [bytearray() for _ in range(SHARDS)]
    for e, u, ty in zip(eids, uids, types):
        line = syslog_line(e, u, ty).encode()
        b = bufs[e % SHARDS]
        b += str(len(line)).encode()
        b += b" "
        b += line
    os.makedirs(d, exist_ok=True)
    for p, b in zip(paths, bufs):
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(b))
        os.replace(tmp, p)
    open(done, "w").close()
    return paths
