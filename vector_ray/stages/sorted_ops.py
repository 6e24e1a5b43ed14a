"""Sorted-run operators — the scale path for per-key positional logic.

``groupby().map_groups`` costs one Python call per group, which dies at
high key cardinality (measured 82× on dedupe).  The alternative for
positional per-key semantics (first-N, every-Nth, rank) is:

  1. global ``sort(keys + order_by)`` (the same exchange a groupby pays);
  2. per-block VECTORIZED segmented cumsum/rank within key runs;
  3. a driver-side chain scan over per-block run summaries (first key,
     first-run count, last key, last-run count, whether the block is a
     single run) that yields each block's carry-in offset — O(#blocks)
     tiny rows on the driver, never row data.

``add_group_rank`` materializes the sorted dataset once (the sort
output) and returns blocks with a ``__rank`` column = 0-based position
of the row within its key group (optionally counting only rows where
``count_mask_col`` is true — excluded rows get rank -1).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

RANK_COL = "__rank"
_KEY_COL = "__run_key"


def _combined_key(t: pa.Table, keys: Sequence[str]) -> pa.Array:
    parts = []
    for k in keys:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.fill_null(pc.cast(col, pa.string()), "\x00null"))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, pa.scalar("\x1f"))


def add_group_rank(
    ds: Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    *,
    count_mask_col: str | None = None,
) -> Dataset:
    """Sort by (keys, order_by) and attach ``__rank`` per key group."""
    keys = list(keys)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    sorted_ds = (
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None)
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        key = t[_KEY_COL]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        first_k, last_k = key[0].as_py(), key[-1].as_py()
        if count_mask_col is not None:
            counted = pc.fill_null(pc.cast(t[count_mask_col], pa.bool_()), False)
            counted = counted.combine_chunks() if isinstance(counted, pa.ChunkedArray) else counted
            cnt = counted.to_numpy(zero_copy_only=False)
        else:
            cnt = np.ones(n, dtype=bool)
        kn = key.to_numpy(zero_copy_only=False)
        first_run_end = n if first_k == last_k else int(np.argmax(kn != first_k))
        last_run_start = 0 if first_k == last_k else n - int(np.argmax(kn[::-1] != last_k))
        return {
            "first_key": first_k,
            "last_key": last_k,
            "first_run_count": int(cnt[:first_run_end].sum()),
            "last_run_count": int(cnt[last_run_start:].sum()),
            "single_run": first_k == last_k,
            "total_count": int(cnt.sum()),
        }

    sums = ray.get([summary.remote(r) for r in refs])

    # chain scan: carry (key, accumulated count of the trailing run)
    carry_in: list[int] = []
    carry_key, carry_cnt = None, 0
    for s in sums:
        if s is None:
            carry_in.append(0)
            continue
        offset = carry_cnt if s["first_key"] == carry_key else 0
        carry_in.append(offset)
        if s["single_run"]:
            if s["first_key"] == carry_key:
                carry_cnt += s["total_count"]
            else:
                carry_key, carry_cnt = s["first_key"], s["total_count"]
        else:
            carry_key, carry_cnt = s["last_key"], s["last_run_count"]

    @ray.remote
    def rank_block(t: pa.Table, offset: int):
        n = t.num_rows
        if n == 0:
            return t.append_column(RANK_COL, pa.array([], pa.int64()))
        key = t[_KEY_COL]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        kn = key.to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = kn[1:] != kn[:-1]
        if count_mask_col is not None:
            counted_col = pc.fill_null(pc.cast(t[count_mask_col], pa.bool_()), False)
            if isinstance(counted_col, pa.ChunkedArray):
                counted_col = counted_col.combine_chunks()
            counted = counted_col.to_numpy(zero_copy_only=False)
        else:
            counted = np.ones(n, dtype=bool)
        # segmented cumsum of `counted` with reset at run starts
        c = np.cumsum(counted)
        run_id = np.cumsum(new_run) - 1
        # value of c at the last index BEFORE each run start
        run_start_idx = np.nonzero(new_run)[0]
        base_at_start = np.where(run_start_idx > 0, c[run_start_idx - 1], 0)
        seg = c - base_at_start[run_id]
        rank = seg - 1  # 0-based among counted rows; uncounted share prior rank
        rank = np.where(counted, rank, -1)
        # carry-in applies only to the FIRST run
        rank = np.where((run_id == 0) & counted, rank + offset, rank)
        return t.drop_columns([_KEY_COL]).append_column(
            RANK_COL, pa.array(rank.astype(np.int64))
        )

    out_refs = [rank_block.remote(r, carry_in[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def throttle_sorted(
    ds: Dataset,
    *,
    threshold: int,
    window_secs: float,
    key_field: str | None = None,
    ts_col: str = "ts",
    order_by: Sequence[str] = (),
    exclude=None,
) -> Dataset:
    """Sorted-rank throttle: keep rank < threshold per (key, window);
    excluded rows always pass and never consume budget."""
    from vector_ray.conditions import compile_condition

    window_us = int(window_secs * 1_000_000)
    excl = compile_condition(exclude) if exclude is not None else None

    def mark(t: pa.Table) -> pa.Table:
        w = pc.multiply(
            pc.floor(pc.divide(pc.cast(t[ts_col], pa.int64()), float(window_us))),
            float(window_us),
        )
        t = t.append_column("__window", pc.cast(w, pa.int64()))
        incl = (
            pc.invert(excl(t)) if excl is not None
            else pa.array([True] * t.num_rows)
        )
        return t.append_column("__counted", incl)

    keys = ([key_field] if key_field else []) + ["__window"]
    ranked = add_group_rank(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        keys, [ts_col] + list(order_by), count_mask_col="__counted",
    )

    def keep(t: pa.Table) -> pa.Table:
        r = t[RANK_COL]
        mask = pc.or_(pc.less(r, threshold), pc.equal(r, -1))
        return t.filter(mask).drop_columns(["__window", "__counted", RANK_COL])

    return ranked.map_batches(keep, batch_format="pyarrow", batch_size=None)


def sample_modulo_sorted(
    ds: Dataset,
    *,
    rate: int,
    group_by: Sequence[str] | None = None,
    order_by: Sequence[str],
    exclude=None,
    sample_rate_key: str = "sample_rate",
) -> Dataset:
    """Sorted-rank modulo sampling (sample_modulo semantics, scale path)."""
    from vector_ray.conditions import compile_condition

    excl = compile_condition(exclude) if exclude is not None else None

    def mark(t: pa.Table) -> pa.Table:
        incl = (
            pc.invert(excl(t)) if excl is not None
            else pa.array([True] * t.num_rows)
        )
        t = t.append_column("__counted", incl)
        if not group_by:
            t = t.append_column("__g", pa.array([0] * t.num_rows, pa.int8()))
        return t

    keys = list(group_by) if group_by else ["__g"]
    ranked = add_group_rank(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        keys, list(order_by), count_mask_col="__counted",
    )

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        r = t[RANK_COL].to_numpy(zero_copy_only=False)
        excluded = r == -1
        mask = excluded | (r % rate == 0)
        out = t.filter(pa.array(mask))
        rr = out[RANK_COL].to_numpy(zero_copy_only=False)
        rates = np.where(rr == -1, 1, rate).astype(np.int64)
        drop = ["__counted", RANK_COL] + (["__g"] if not group_by else [])
        return out.drop_columns(drop).append_column(
            sample_rate_key, pa.array(rates)
        )

    return ranked.map_batches(keep, batch_format="pyarrow", batch_size=None)
