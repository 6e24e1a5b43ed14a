"""``demo_logs`` source — deterministic synthetic log lines.

Reference (src/sources/demo_logs.rs OutputFormat): ``shuffle`` (lines
list, optional sequence prefix), ``apache_common``, ``apache_error``,
``syslog`` (RFC5424), ``bsd_syslog`` (RFC3164), ``json``.  The rebuild
generates the same shapes DETERMINISTICALLY (seeded; the reference is
random — divergence documented, batch pipelines need reproducible
inputs) and returns a Ray Dataset of ``{message, ts}`` rows built with
vectorized numpy/pyarrow — the natural "generate blocks in parallel"
Ray source shape (``from_arrow_refs`` over per-shard tables).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

_USERS = np.array(["alice", "bob", "carol", "dave", "-"])
_METHODS = np.array(["GET", "POST", "PUT", "DELETE", "HEAD"])
_PATHS = np.array(["/", "/index.html", "/api/v1/items", "/static/app.js",
                   "/login", "/health"])
_STATUS = np.array([200, 200, 200, 301, 404, 500])
_APPS = np.array(["nginx", "api", "worker", "cron"])
_ERR_MSGS = np.array([
    "File does not exist", "Directory index forbidden",
    "Invalid method in request", "Client sent malformed request",
])

_EPOCH_US = 1_700_000_000_000_000  # fixed base so output is reproducible


def _base_arrays(n: int, seed: int):
    rng = np.random.default_rng(seed)
    ts_us = _EPOCH_US + np.sort(rng.integers(0, 86_400_000_000, size=n))
    return rng, ts_us


def _strf(ts_us: np.ndarray, fmt: str) -> pa.Array:
    col = pa.array(ts_us, pa.timestamp("us"))
    import pyarrow.compute as pc

    return pc.strftime(col, format=fmt)


def generate_lines(n: int, fmt: str, *, seed: int = 42,
                   lines: list[str] | None = None,
                   sequence: bool = False) -> pa.Table:
    """One deterministic batch of ``n`` log lines of the given format."""
    import pyarrow.compute as pc

    rng, ts_us = _base_arrays(n, seed)
    ts = pa.array(ts_us, pa.timestamp("us"))

    def join(*parts):
        parts = [p if isinstance(p, pa.Array) else
                 pa.array([str(p)] * n, pa.string()) for p in parts]
        return pc.binary_join_element_wise(*parts, "")

    def pick(arr):
        return pa.array(arr[rng.integers(0, len(arr), n)])

    if fmt == "shuffle":
        if not lines:
            raise ValueError("shuffle format needs a non-empty lines list")
        base = np.asarray(lines)[rng.integers(0, len(lines), n)]
        if sequence:
            msg = pa.array([f"{i} {s}" for i, s in enumerate(base)], pa.string())
        else:
            msg = pa.array(base, pa.string())
    elif fmt == "apache_common":
        ip = pa.array([f"10.{a}.{b}.{c}" for a, b, c in
                       rng.integers(0, 256, (n, 3))], pa.string())
        size = pa.array(rng.integers(100, 50_000, n).astype(str))
        status = pa.array(_STATUS[rng.integers(0, len(_STATUS), n)].astype(str))
        msg = join(ip, " - ", pick(_USERS), " [",
                   _strf(ts_us, "%d/%b/%Y:%H:%M:%S +0000"), '] "',
                   pick(_METHODS), " ", pick(_PATHS), ' HTTP/1.1" ',
                   status, " ", size)
    elif fmt == "apache_error":
        pid = pa.array(rng.integers(100, 9999, n).astype(str))
        msg = join("[", _strf(ts_us, "%a %b %d %H:%M:%S %Y"), "] [error] [pid ",
                   pid, "] ", pick(_ERR_MSGS))
    elif fmt == "syslog":
        pri = pa.array(rng.integers(8, 192, n).astype(str))
        pid = pa.array(rng.integers(100, 9999, n).astype(str))
        msg = join("<", pri, ">1 ", _strf(ts_us, "%Y-%m-%dT%H:%M:%S.%fZ"),
                   " host", pa.array(rng.integers(1, 9, n).astype(str)), " ",
                   pick(_APPS), " ", pid, " ID", pid, " - event happened")
    elif fmt == "bsd_syslog":
        pri = pa.array(rng.integers(8, 192, n).astype(str))
        pid = pa.array(rng.integers(100, 9999, n).astype(str))
        msg = join("<", pri, ">", _strf(ts_us, "%b %d %H:%M:%S"), " host",
                   pa.array(rng.integers(1, 9, n).astype(str)), " ",
                   pick(_APPS), "[", pid, "]: event happened")
    elif fmt == "json":
        ip = pa.array([f"10.{a}.{b}.{c}" for a, b, c in
                       rng.integers(0, 256, (n, 3))], pa.string())
        status = pa.array(_STATUS[rng.integers(0, len(_STATUS), n)].astype(str))
        msg = join('{"host":"', ip, '","method":"', pick(_METHODS),
                   '","path":"', pick(_PATHS), '","status":', status,
                   ',"ts":"', _strf(ts_us, "%Y-%m-%dT%H:%M:%SZ"), '"}')
    else:
        raise ValueError(f"unknown demo_logs format {fmt!r}")
    return pa.table({"message": pc.cast(msg, pa.string()), "ts": ts})


def demo_logs(
    n: int,
    fmt: str = "json",
    *,
    seed: int = 42,
    lines: list[str] | None = None,
    sequence: bool = False,
    num_shards: int = 8,
) -> Dataset:
    """Deterministic demo-log Dataset: ``num_shards`` blocks generated
    IN PARALLEL as Ray tasks (each shard seeds ``seed + shard`` so the
    whole dataset is reproducible at any shard count)."""

    @ray.remote
    def shard(count: int, s: int) -> pa.Table:
        return generate_lines(count, fmt, seed=s, lines=lines,
                              sequence=sequence)

    per = [n // num_shards + (1 if i < n % num_shards else 0)
           for i in range(num_shards)]
    refs = [shard.remote(c, seed + i) for i, c in enumerate(per) if c > 0]
    return rd.from_arrow_refs(refs)
