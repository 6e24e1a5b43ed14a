"""Z-order (Morton) clustering — multi-column data locality for
zone-map pruning.

No reference counterpart (the reference is a FIFO streaming engine
with no storage layout control); this is the standard lakehouse
technique: map each clustering column to a ``bits``-wide integer code
over its global [min, max] range, bit-interleave the codes into one
Morton key, and sort by it.  Rows close in EVERY clustered dimension
land in the same files, so the parquet sink's per-file min/max zone
maps (sinks/parquet.write_partitioned ``stats_cols`` +
``read_pruned``) prune multi-dimensional predicates instead of only
the leading sort column.

All arithmetic is integer — code = ((v − min) · (2^bits − 1)) //
(max − min), interleave = Σ_j ((code >> j) & 1) << (j·ncols + c) — so
the key replays bit-exactly in DuckDB SQL (oracle.sql_zorder_events)
and is deterministic at any parallelism.

Scale shape: the range pass is per-block min/max partials combined on
the driver (2 ints per column per block); the key itself is one
vectorized ``map_batches``; the sort is the same single exchange any
clustering write pays.  ``bits`` is clamped so ncols·bits ≤ 63 (the
key stays int64) and the scale product runs in uint64 space, so
column ranges up to 2^47 are safe at the default 16 bits.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

ZKEY_COL = "__zkey"


def column_ranges(ds: Dataset, cols: Sequence[str]) -> dict:
    """Global (min, max) per column: per-block partials (2 ints each)
    combined on the driver — never a groupby for a scalar row."""
    cols = list(cols)

    def partial(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = pc.cast(t[c], pa.int64())
            out[c + "_min"] = pa.array(
                [pc.min(v).as_py() if t.num_rows else None], pa.int64())
            out[c + "_max"] = pa.array(
                [pc.max(v).as_py() if t.num_rows else None], pa.int64())
        return pa.table(out)

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    rng = {}
    for c in cols:
        lo = [r[c + "_min"] for r in rows if r.get(c + "_min") is not None]
        hi = [r[c + "_max"] for r in rows if r.get(c + "_max") is not None]
        if not lo:
            raise ValueError(f"column_ranges: no rows for {c!r}")
        rng[c] = (min(lo), max(hi))
    return rng


def zorder_codes(values: np.ndarray, vmin: int, vmax: int,
                 bits: int) -> np.ndarray:
    """Scale int64 values to [0, 2^bits) over the global range —
    integer floor division, replayed verbatim in SQL."""
    top = (1 << bits) - 1
    if vmax <= vmin:
        return np.zeros(len(values), dtype=np.uint64)
    shifted = (values.astype(np.int64) - np.int64(vmin)).astype(np.uint64)
    return (shifted * np.uint64(top)) // np.uint64(vmax - vmin)


def interleave_bits(codes: list, bits: int) -> np.ndarray:
    """Morton interleave: bit j of column c lands at j·ncols + c."""
    ncols = len(codes)
    out = np.zeros(len(codes[0]), dtype=np.uint64)
    one = np.uint64(1)
    for c, code in enumerate(codes):
        for j in range(bits):
            out |= ((code >> np.uint64(j)) & one) << np.uint64(
                j * ncols + c)
    return out


def add_zorder_key(
    ds: Dataset,
    cols: Sequence[str],
    *,
    bits: int = 16,
    ranges: dict | None = None,
    key_col: str = ZKEY_COL,
) -> Dataset:
    """Append the int64 Morton key column (one vectorized pass)."""
    cols = list(cols)
    bits = min(int(bits), 63 // len(cols))
    if ranges is None:
        ranges = column_ranges(ds, cols)
    rng = {c: ranges[c] for c in cols}

    def add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(key_col, pa.array([], pa.int64()))
        codes = []
        for c in cols:
            v = pc.cast(t[c], pa.int64()).to_numpy(zero_copy_only=False)
            codes.append(zorder_codes(v, rng[c][0], rng[c][1], bits))
        z = interleave_bits(codes, bits).astype(np.int64)
        return t.append_column(key_col, pa.array(z))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


def cluster_by_zorder(
    ds: Dataset,
    cols: Sequence[str],
    *,
    bits: int = 16,
    keep_key: bool = False,
) -> Dataset:
    """Sort the dataset by the Morton key of ``cols`` — one range
    exchange, after which every output file's zone maps are tight in
    ALL clustered dimensions."""
    from vector_ray.stages.blocks import presort

    keyed = add_zorder_key(ds, cols, bits=bits)
    out = presort(keyed).sort(ZKEY_COL)
    if keep_key:
        return out

    def drop(t: pa.Table) -> pa.Table:
        return (t.drop_columns([ZKEY_COL])
                if ZKEY_COL in t.column_names else t)

    return out.map_batches(drop, batch_format="pyarrow", batch_size=None)
