"""VRL date/number function subset — format_timestamp,
to/from_unix_timestamp, ceil/floor/round — as pyarrow.compute kernels.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def format_timestamp(col, fmt: str = "%Y-%m-%dT%H:%M:%SZ"):
    # arrow's %S prints fractional seconds; truncate to whole seconds
    # first so the output matches strftime conventions
    col = pc.cast(_arr(col), pa.timestamp("s"), safe=False)  # truncate subseconds
    return pc.strftime(col, format=fmt)


def to_unix_timestamp(col, unit: str = "seconds"):
    us = pc.cast(_arr(col), pa.int64())
    div = {"seconds": 1_000_000, "milliseconds": 1_000, "microseconds": 1}[unit]
    return pc.divide(us, div) if div == 1 else pc.cast(
        pc.floor(pc.divide(us, float(div))), pa.int64()
    )


def from_unix_timestamp(col, unit: str = "seconds"):
    mul = {"seconds": 1_000_000, "milliseconds": 1_000, "microseconds": 1}[unit]
    us = pc.multiply(pc.cast(_arr(col), pa.int64()), mul)
    return pc.cast(us, pa.timestamp("us"))


def ceil_ts(col, interval_secs: float):
    """Round a timestamp UP to the interval boundary (VRL has numeric
    ceil; the timestamp variant is what windowing needs)."""
    us = pc.cast(_arr(col), pa.int64())
    iv = int(interval_secs * 1_000_000)
    up = pc.multiply(pc.cast(pc.ceil(pc.divide(us, float(iv))), pa.int64()), iv)
    return pc.cast(up, pa.timestamp("us"))


def floor_ts(col, interval_secs: float):
    us = pc.cast(_arr(col), pa.int64())
    iv = int(interval_secs * 1_000_000)
    dn = pc.multiply(pc.cast(pc.floor(pc.divide(us, float(iv))), pa.int64()), iv)
    return pc.cast(dn, pa.timestamp("us"))


def round_num(col, ndigits: int = 0):
    return pc.round(_arr(col), ndigits=ndigits)


def abs_num(col):
    return pc.abs(_arr(col))


def mod_num(col, divisor: int):
    # arrow has no modulo kernel for all types; x - floor(x/d)*d
    x = _arr(col)
    q = pc.cast(pc.floor(pc.divide(pc.cast(x, pa.float64()), float(divisor))), pa.int64())
    return pc.subtract(pc.cast(x, pa.int64()), pc.multiply(q, divisor))
