"""Time-bucket gap filling with last-observation-carried-forward.

The timeseries-database staple (TimescaleDB ``time_bucket_gapfill`` +
``locf``, InfluxDB ``fill(previous)``): bucket each key's events to a
fixed interval, aggregate per bucket, then EMIT every bucket between
the key's first and last observation — missing buckets carry the last
observed value forward and are marked ``filled = 1``.

Scale plan (the sorted-run chain shape, sorted_ops.py module doc):

  1. one (keys, bucket) aggregation exchange — integer sums, map-side
     partial combine inside the block task;
  2. one sort by (key, bucket);
  3. per block, VECTORIZED gap expansion: for each adjacent same-key
     bucket pair the ``b_prev+1 .. b-1`` range materializes via
     ``np.repeat`` + offset arithmetic (no Python per gap), values via
     LOCF takes — generated rows are created INSIDE the block task and
     stay in the object store;
  4. block-boundary gaps (a key run spanning two blocks) come from an
     O(#blocks) driver chain of (last key, last bucket, last value)
     carries — the driver never sees row data, and the boundary range
     itself is generated in the downstream task.

Values are caller-quantized int64 so the whole operator is exact and
layout-independent (bit-identical at any parallelism).

Reference behavior analogue: vector has no batch gap-fill transform —
this is part of the rebuild-gained analytics surface (SURVEY §2.9),
motivated by the reference's metrics pipelines (aggregate/log_to_metric
produce regular series that downstream dashboards gap-fill).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import drop_empty_blocks, presort
from vector_ray.stages.sorted_ops import (_KEY_COL, _adj_new_run,
                                          _combined_key, _key_arr)


def gap_fill(
    ds: Dataset,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    every_us: int,
    agg: str = "sum",
    bucket_col: str = "bucket_us",
    out_col: str = "value",
    filled_col: str = "filled",
) -> Dataset:
    """Bucket ``ts_col`` to ``every_us`` microseconds per ``keys``,
    aggregate int64 ``value_col`` per bucket (``agg`` = sum|max|min),
    and fill every missing bucket in each key's [min, max] bucket range
    with the previous bucket's aggregated value (LOCF).

    Output columns: keys + ``bucket_col`` (int64 bucket start in epoch
    microseconds) + ``out_col`` (int64) + ``filled_col`` (int64 0/1).
    """
    if agg not in ("sum", "max", "min"):
        raise ValueError("agg must be sum|max|min")
    keys = list(keys)
    B = "__gf_b"
    V = "__gf_v"

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: t[k] for k in keys if k in t.column_names}
            cols[B] = pa.array([], pa.int64())
            cols[V] = pa.array([], pa.int64())
            return pa.table(cols)
        tu = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bi = np.floor_divide(tu, every_us)  # true floor, negative-safe
        base = pa.table({**{k: t[k] for k in keys},
                         B: pa.array(bi, pa.int64()),
                         V: pc.cast(t[value_col], pa.int64())})
        g = base.group_by(keys + [B]).aggregate([(V, agg)])
        return g.rename_columns(keys + [B, V])

    agg_ds = (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
              .groupby(keys + [B]))
    if agg == "sum":
        agg_ds = agg_ds.sum(V)
        vname = f"sum({V})"
    elif agg == "max":
        agg_ds = agg_ds.max(V)
        vname = f"max({V})"
    else:
        agg_ds = agg_ds.min(V)
        vname = f"min({V})"

    def add_key(t: pa.Table) -> pa.Table:
        t = t.rename_columns(keys + [B, V])
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    sorted_ds = (
        presort(drop_empty_blocks(agg_ds)
                .map_batches(add_key, batch_format="pyarrow",
                             batch_size=None))
        .sort([_KEY_COL, B])
        .materialize())
    refs = sorted_ds.to_arrow_refs()

    def _expand(t: pa.Table, prev_b: np.ndarray, prev_v: np.ndarray,
                gaps: np.ndarray) -> pa.Table:
        """Emit gap rows: for row i with gaps[i] > 0, buckets
        prev_b[i]+1 .. prev_b[i]+gaps[i] valued prev_v[i]."""
        n = t.num_rows
        total = int(gaps.sum())
        idx = np.repeat(np.arange(n), gaps)
        starts = np.cumsum(gaps) - gaps
        off = np.arange(total) - np.repeat(starts, gaps)
        gb = prev_b[idx] + 1 + off
        gv = prev_v[idx]
        kt = t.select(keys).take(pa.array(idx, pa.int64()))
        return pa.table({**{k: kt[k] for k in keys},
                         B: pa.array(gb, pa.int64()),
                         V: pa.array(gv, pa.int64()),
                         filled_col: pa.array(
                             np.ones(total, np.int64))})

    @ray.remote(num_returns=2)
    def pass_a(t: pa.Table):
        n = t.num_rows
        if n == 0 or _KEY_COL not in t.column_names:
            return None, None
        key = _key_arr(t, _KEY_COL)
        b = t[B].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[V].to_numpy(zero_copy_only=False).astype(np.int64)
        new_run = _adj_new_run(key, n)
        prev_b = np.empty(n, np.int64)
        prev_b[0] = 0
        prev_b[1:] = b[:-1]
        prev_v = np.empty(n, np.int64)
        prev_v[0] = 0
        prev_v[1:] = v[:-1]
        gaps = np.where(new_run, 0, b - prev_b - 1)
        real = pa.table({**{k: t[k] for k in keys},
                         B: t[B], V: t[V],
                         filled_col: pa.array(
                             np.zeros(n, np.int64))})
        if gaps.sum() > 0:
            # gap rows append unsorted — downstream consumers of
            # gap_fill treat the result as an unordered Dataset
            merged = pa.concat_tables([real, _expand(t, prev_b,
                                                     prev_v, gaps)])
        else:
            merged = real
        bound = (key[0].as_py(), int(b[0]),
                 key[-1].as_py(), int(b[-1]), int(v[-1]))
        return merged, bound

    a_refs, bounds = [], []
    for r in refs:
        o, bnd = pass_a.remote(r)
        a_refs.append(o)
        bounds.append(bnd)
    bounds = ray.get(bounds)

    # driver chain: carry the previous block's (key, bucket, value)
    carries: list = []
    ck, cb, cv = None, None, None
    for bnd in bounds:
        if bnd is None:
            carries.append(None)
            continue
        fk, fb, lk, lb, lv = bnd
        if ck is not None and ck == fk and fb - cb > 1:
            carries.append((cb, cv, fb))
        else:
            carries.append(None)
        ck, cb, cv = lk, lb, lv

    @ray.remote
    def pass_b(t: pa.Table, cin):
        if cin is None:
            return t
        cb_, cv_, fb_ = cin
        total = fb_ - cb_ - 1
        kt = t.select(keys).take(
            pa.array(np.zeros(total, np.int64)))
        gap_t = pa.table({**{k: kt[k] for k in keys},
                          B: pa.array(
                              np.arange(cb_ + 1, fb_), pa.int64()),
                          V: pa.array(
                              np.full(total, cv_, np.int64)),
                          filled_col: pa.array(
                              np.ones(total, np.int64))})
        return pa.concat_tables([gap_t, t])

    out_refs = [pass_b.remote(a, c)
                for a, bnd, c in zip(a_refs, bounds, carries)
                if bnd is not None]

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or B not in t.column_names:
            return pa.table({**{k: pa.array([], pa.string())
                                for k in keys},
                             bucket_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64()),
                             filled_col: pa.array([], pa.int64())})
        return pa.table({**{k: t[k] for k in keys},
                         bucket_col: pc.multiply(
                             t[B], pa.scalar(every_us, pa.int64())),
                         out_col: t[V],
                         filled_col: t[filled_col]})

    if not out_refs:
        # fully-empty input: one typed empty block (string-typed keys
        # — the input carried no key dtype to copy)
        return rd.from_arrow(finish(pa.table({})))
    return rd.from_arrow_refs(out_refs).map_batches(
        finish, batch_format="pyarrow", batch_size=None)
