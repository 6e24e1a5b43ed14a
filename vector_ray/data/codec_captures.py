"""Deterministic capture fixtures for the round-5 format decoders
(json_paths / strata / binary native) — all generated from the events
table with integer-derived values, so the DuckDB oracle reproduces
every decoded field from the SAME parquet without touching the
capture bytes (a decode bug cannot cancel out)."""

from __future__ import annotations

import json
import os
import struct

import pyarrow.parquet as pq

CAPTURE_FIXTURE_VERSION = 1
SHARDS = 4


def _fixture_dir(sf_dir: str, name: str) -> str:
    from vector_ray.model import scratch_dir

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(scratch_dir(),
                        f"{name}_v{CAPTURE_FIXTURE_VERSION}", sf_tag)


def _events_cols(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "user_id", "event_type"])
    return zip(t["event_id"].to_pylist(), t["user_id"].to_pylist(),
               t["event_type"].to_pylist())


def _write_shards(d: str, paths: list[str], bufs, *,
                  binary: bool = False) -> None:
    os.makedirs(d, exist_ok=True)
    for p, content in zip(paths, bufs):
        tmp = p + ".tmp"
        mode = "wb" if binary else "w"
        with open(tmp, mode) as f:
            if binary:
                f.write(b"".join(content))
            else:
                f.write("\n".join(content) + "\n")
        os.replace(tmp, p)
    open(os.path.join(d, ".done"), "w").close()


# ------------------------------------------------------------ json_paths

def json_paths_doc(event_id: int, user_id: int, event_type: str) -> str:
    recs = [{"eid": event_id, "seq": j,
             "cents": (user_id * 7 + j * 13) % 1000}
            for j in range(1 + event_id % 3)]
    return json.dumps({
        "meta": {"eid": event_id, "user": user_id, "etype": event_type},
        "recs": recs,
        "tail": f"{event_id}:done",
    }, separators=(",", ":"))


def ensure_json_paths_fixture(sf_dir: str) -> list[str]:
    d = _fixture_dir(sf_dir, "json_paths")
    paths = [os.path.join(d, f"capture-{i}.ndjson") for i in range(SHARDS)]
    if os.path.exists(os.path.join(d, ".done")):
        return paths
    bufs: list[list[str]] = [[] for _ in range(SHARDS)]
    for e, u, ty in _events_cols(sf_dir):
        bufs[e % SHARDS].append(json_paths_doc(e, u, ty))
    _write_shards(d, paths, bufs)
    return paths


# ---------------------------------------------------------------- strata

def strata_header(shard: int) -> str:
    return json.dumps({"bucket": f"b{shard}", "region": "us-east-1"},
                      separators=(",", ":"))


def strata_line(event_id: int, user_id: int) -> str:
    return json.dumps({
        "eid": event_id,
        "level": "error" if event_id % 11 == 0 else "info",
        "cents": user_id * 3 + 1,
    }, separators=(",", ":"))


def ensure_strata_fixture(sf_dir: str, *,
                          snappy: bool = False) -> list[str]:
    """Strata capture files: first line = shard header, rest = NDJSON
    log lines.  ``snappy=True`` writes the strata_snappy on-disk form
    (header line + ONE raw snappy block of the log lines)."""
    name = "strata_snappy" if snappy else "strata"
    d = _fixture_dir(sf_dir, name)
    ext = "snappy" if snappy else "strata"
    paths = [os.path.join(d, f"capture-{i}.{ext}") for i in range(SHARDS)]
    if os.path.exists(os.path.join(d, ".done")):
        return paths
    bufs: list[list[str]] = [[] for _ in range(SHARDS)]
    for e, u, _ty in _events_cols(sf_dir):
        bufs[e % SHARDS].append(strata_line(e, u))
    if snappy:
        import pyarrow as pa
        blobs = []
        for i, lines in enumerate(bufs):
            body = ("\n".join(lines) + "\n").encode()
            blobs.append([
                (strata_header(i) + "\n").encode(),
                pa.Codec("snappy").compress(body, asbytes=True)])
        _write_shards(d, paths, blobs, binary=True)
    else:
        _write_shards(d, paths,
                      [[strata_header(i)] + lines
                       for i, lines in enumerate(bufs)])
    return paths


# ---------------------------------------------------- native (protobuf)

def ensure_native_proto_fixture(sf_dir: str) -> list[str]:
    """Binary native capture with the SAME event content as the
    native_json fixture (data/native_capture.native_line), so the two
    formats share one oracle: u32-BE length-prefixed EventArray
    frames, one event per frame."""
    from vector_ray.data.native_capture import native_line
    from vector_ray.functions.native_proto import encode_native

    d = _fixture_dir(sf_dir, "native_proto")
    paths = [os.path.join(d, f"capture-{i}.native") for i in range(SHARDS)]
    if os.path.exists(os.path.join(d, ".done")):
        return paths
    bufs: list[list[bytes]] = [[] for _ in range(SHARDS)]
    for e, u, ty in _events_cols(sf_dir):
        kind, inner = next(iter(json.loads(native_line(e, u, ty)).items()))
        frame = encode_native([(kind, inner)])
        bufs[e % SHARDS].append(struct.pack(">I", len(frame)) + frame)
    _write_shards(d, paths, bufs, binary=True)
    return paths
